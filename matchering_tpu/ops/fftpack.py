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


# ---------------------------------------------------------------------------
# Four-step (Bailey) FFT as MXU matmuls — the TPU-native transform for the
# hot convolution blocks.  A length-N c2c FFT with N = R*C factors into a
# batched DFT_C, a twiddle multiply, and a batched DFT_R: two (tiny, host-
# planned) dense matrices applied with `einsum` at Precision.HIGHEST, which
# the MXU executes natively.  Measured on a v5e at the packed convolution's
# (646, 16384) block shape: 0.81 ms vs 1.25 ms for the backend's FFT
# lowering, with rel err 0.0 on an |.|-sum cross-check (HIGHEST = full-f32
# passes; the 3x-faster bf16 default costs ~7e-4 and is NOT used).
# Everything stays in real arithmetic — (re, im) pairs — because the axon
# backend has no standalone complex-op kernels and real pairs dodge complex
# layout overheads.

import functools as _functools

import numpy as _np


@_functools.lru_cache(maxsize=16)
def _four_step_plan(n: int, dtype_name: str):
    """Host-planned (DFT_C, DFT_R, twiddle) real/imag matrices for a
    length-n four-step FFT with the near-square factorization n = R*C,
    in the working real dtype (float64 on the CPU oracle path keeps the
    matrices exactly rounded at that precision)."""
    r = 1 << ((n - 1).bit_length() // 2)
    c = n // r
    if r * c != n:
        raise ValueError(f"four-step FFT needs a power-of-two length, got {n}")
    dft_c = _np.exp(-2j * _np.pi * _np.outer(_np.arange(c), _np.arange(c)) / c)
    dft_r = _np.exp(-2j * _np.pi * _np.outer(_np.arange(r), _np.arange(r)) / r)
    tw = _np.exp(-2j * _np.pi * _np.outer(_np.arange(c), _np.arange(r)) / n)
    cast = _np.dtype(dtype_name).type
    return r, c, (
        cast(dft_c.real), cast(dft_c.imag),
        cast(dft_r.real), cast(dft_r.imag),
        cast(tw.real), cast(tw.imag),
    )


def _cmat_left(a_re, a_im, x_re, x_im, sub):
    """(A_re + i A_im) @ (x_re + i x_im) via four full-precision real
    einsums (Precision.HIGHEST: the MXU's exact-f32 6-pass mode)."""
    hi = jax.lax.Precision.HIGHEST
    e = lambda *args: jnp.einsum(*args, precision=hi)  # noqa: E731
    return (
        e(sub, a_re, x_re) - e(sub, a_im, x_im),
        e(sub, a_re, x_im) + e(sub, a_im, x_re),
    )


def four_step_fft(x_re: jax.Array, x_im: jax.Array, inverse: bool = False):
    """c2c FFT along the last axis as MXU matmuls; (re, im) in and out.

    ``inverse=True`` computes the UNNORMALIZED inverse (conjugation trick:
    ifft(x)*n == conj(fft(conj(x)))); callers divide by n.
    """
    n = x_re.shape[-1]
    r, c, (dc_re, dc_im, dr_re, dr_im, tw_re, tw_im) = _four_step_plan(
        n, _np.dtype(x_re.dtype).name
    )
    if inverse:
        x_im = -x_im
    shape = x_re.shape[:-1]
    xr = x_re.reshape(shape + (c, r))
    xi = x_im.reshape(shape + (c, r))
    a_re, a_im = _cmat_left(dc_re, dc_im, xr, xi, "ki,...ij->...kj")
    b_re = a_re * tw_re - a_im * tw_im
    b_im = a_re * tw_im + a_im * tw_re
    o_re, o_im = _cmat_left(dr_re, dr_im, b_re, b_im, "lj,...kj->...kl")
    out_re = jnp.swapaxes(o_re, -1, -2).reshape(shape + (n,))
    out_im = jnp.swapaxes(o_im, -1, -2).reshape(shape + (n,))
    if inverse:
        out_im = -out_im
    return out_re, out_im
