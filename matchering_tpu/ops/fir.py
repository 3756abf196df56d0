"""Linear-phase FIR synthesis from a magnitude curve (JAX).

Reference ``matchering/stage_helpers/match_frequencies.py:98-99``:
``fir = ifftshift(irfft(curve)) * hann(len(fir))`` — a zero-phase impulse
response rotated to linear phase and windowed with a symmetric Hann.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import fftpack


def hann_symmetric(n: int, dtype) -> jax.Array:
    """``scipy.signal.windows.hann(n)`` (symmetric):
    0.5 - 0.5*cos(2*pi*k/(n-1))."""
    k = jnp.arange(n, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * k / (n - 1))


def fir_from_magnitude(curve: jax.Array, fft_size: int) -> jax.Array:
    """Magnitude curve (fft_size//2+1,) -> windowed linear-phase FIR
    (fft_size,)."""
    impulse = fftpack.irfft(curve, n=fft_size)
    impulse = jnp.fft.ifftshift(impulse)
    return impulse * hann_symmetric(fft_size, impulse.dtype)
