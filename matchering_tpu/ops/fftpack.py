"""FFT helpers with a TPU-safe inverse-real-FFT path.

The TPU backend in this environment compiles ``jnp.fft.rfft`` and the
complex-to-complex ``ifft`` in seconds, but ``jnp.fft.irfft`` is broken
there: standalone it raises ``UNIMPLEMENTED`` at runtime, and embedded in a
larger program it adds minutes of compile time through a fallback path
(measured: 124-170 s for a (63, 131072) batch that computes in 0.6 ms).

``irfft`` here therefore routes through the mathematically identical
Hermitian extension + c2c ``ifft`` + real part everywhere except on CPU,
where the native split-radix real transform is faster and bit-accurate to
numpy (the float64 oracle tests run on CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

rfft = jnp.fft.rfft


def _use_native_irfft() -> bool:
    return jax.default_backend() == "cpu"


def irfft(spectrum: jax.Array, n: int, axis: int = -1) -> jax.Array:
    """``jnp.fft.irfft(spectrum, n, axis)`` for even ``n``."""
    if _use_native_irfft():
        return jnp.fft.irfft(spectrum, n=n, axis=axis)
    if axis != -1:
        spectrum = jnp.moveaxis(spectrum, axis, -1)
    bins = n // 2 + 1
    s = spectrum[..., :bins]
    tail = jnp.conj(s[..., -2:0:-1])
    # keep the reversed segment out of the pad/concat fusion: the TPU
    # fusion emitter's ReverseInput transform CHECK-fails on the resulting
    # window (pad_low == bins) when this graph is vmapped (observed crash:
    # fusion_emitter.cc "window.pad_low[i] == 0 (65537 vs. 0)" compiling a
    # B>=2 batched master; the barrier materializes `tail` instead)
    tail = jax.lax.optimization_barrier(tail)
    full = jnp.concatenate([s, tail], axis=-1)
    out = jnp.real(jnp.fft.ifft(full, axis=-1)).astype(
        jnp.finfo(spectrum.dtype).dtype
    )
    if axis != -1:
        out = jnp.moveaxis(out, -1, axis)
    return out
