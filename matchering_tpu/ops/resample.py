"""Polyphase band-limited resampler (host-planned, MXU-applied).

TPU-native replacement for ``resampy.resample`` (kaiser_best) as used by the
reference's checker (``matchering/checker.py:42``).  resampy evaluates a
tabulated Kaiser-windowed sinc per output sample with linear interpolation
between table entries — a scalar inner loop JIT-compiled by numba.  Here the
observation is that for integer sample rates the ratio is rational, so there
are only ``L = sr_new / gcd`` distinct filter phases: the host walks
resampy's exact table arithmetic (same table, same quantized index stepping,
same edge truncation by zero padding) once per phase and emits a dense
polyphase weight matrix.  The device then computes each group of ``L*c``
outputs as one matmul between that static matrix and a strided window of the
input — batched MXU work with ~1.5-2x read amplification and zero scalar
code.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# resampy's kaiser_best design constants
_NUM_ZEROS = 64
_PRECISION = 9
_ROLLOFF = 0.9475937167399596
_KAISER_BETA = 14.769656459379492


@functools.lru_cache(maxsize=4)
def _half_window() -> tuple[np.ndarray, np.ndarray]:
    """One-sided interpolation table and its forward differences
    (resampy ``filters.sinc_window`` with the kaiser_best parameters)."""
    num_bits = 2**_PRECISION
    n = num_bits * _NUM_ZEROS
    taps = np.arange(-n, n + 1) / num_bits
    sinc_win = _ROLLOFF * np.sinc(_ROLLOFF * taps)
    interp_win = (np.kaiser(2 * n + 1, _KAISER_BETA) * sinc_win)[n:]
    interp_delta = np.zeros_like(interp_win)
    interp_delta[:-1] = np.diff(interp_win)
    return interp_win, interp_delta


class ResamplePlan(NamedTuple):
    sr_in: int
    sr_out: int
    up: int  # output phases per window (L)
    down: int  # input samples consumed per L outputs (M)
    c: int  # window grouping factor
    reach: int  # max tap offset on either side of the center sample
    weights: np.ndarray  # (c*up, c*down + 2*reach + 1) float64


@functools.lru_cache(maxsize=32)
def plan_resample(sr_in: int, sr_out: int) -> ResamplePlan:
    g = math.gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    interp_win, interp_delta = _half_window()
    num_bits = 2**_PRECISION
    nwin = interp_win.shape[0]

    scale = min(1.0, sr_out / sr_in)
    index_step = int(scale * num_bits)
    reach = int(np.ceil(nwin / max(index_step, 1)))

    # group enough windows that each matmul strip consumes >=256 inputs
    c = max(1, -(-256 // down))
    width = c * down + 2 * reach + 1
    weights = np.zeros((c * up, width), dtype=np.float64)

    for m in range(c * up):
        t = m * down / up  # output time in input-sample units
        n0 = int(t)
        frac = scale * (t - n0)
        index_frac = frac * num_bits
        offset = int(index_frac)
        eta = index_frac - offset
        # left wing: taps at input samples n0, n0-1, ...
        i_max = (nwin - offset + index_step - 1) // index_step
        for i in range(i_max):
            idx = offset + i * index_step
            if idx >= nwin:
                break
            w = interp_win[idx] + eta * interp_delta[idx]
            weights[m, reach + n0 - i] += w
        # right wing: taps at input samples n0+1, n0+2, ...
        frac2 = scale - frac
        index_frac2 = frac2 * num_bits
        offset2 = int(index_frac2)
        eta2 = index_frac2 - offset2
        k_max = (nwin - offset2 + index_step - 1) // index_step
        for k in range(k_max):
            idx = offset2 + k * index_step
            if idx >= nwin:
                break
            w = interp_win[idx] + eta2 * interp_delta[idx]
            col = reach + n0 + 1 + k
            if col < width:
                weights[m, col] += w

    if scale < 1.0:
        weights *= scale  # resampy multiplies the output by scale on downsample

    return ResamplePlan(
        sr_in=sr_in, sr_out=sr_out, up=up, down=down, c=c, reach=reach, weights=weights
    )


# The polyphase weight matrix has up = sr_out/gcd rows per group; for
# near-coprime rate pairs (44100 -> 44101: up = 44101) it would be
# gigabytes.  Above this cap the rate pair routes to the windowed
# per-output evaluation below (host-side, bounded memory).
_PLAN_BYTES_CAP = 1 << 25  # 32 MB


def _plan_bytes(sr_in: int, sr_out: int) -> int:
    """Size of the polyphase weight matrix, computed without building it."""
    g = math.gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    num_bits = 2**_PRECISION
    nwin = _half_window()[0].shape[0]
    index_step = int(min(1.0, sr_out / sr_in) * num_bits)
    reach = int(np.ceil(nwin / max(index_step, 1)))
    c = max(1, -(-256 // down))
    return (c * up) * (c * down + 2 * reach + 1) * 8


def _resample_windowed(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Per-output windowed evaluation of the same kaiser_best arithmetic
    (resampy's own scheme: float time register, quantized table index with
    linear interpolation, wings truncated at the signal edges), vectorized
    over output chunks on the host.  O(window) memory for any rate ratio —
    the fallback for rate pairs whose polyphase plan would not fit."""
    interp_win, interp_delta = _half_window()
    num_bits = 2**_PRECISION
    scale = min(1.0, sr_out / sr_in)
    win, delta = (
        (interp_win * scale, interp_delta * scale)
        if scale < 1.0
        else (interp_win, interp_delta)
    )
    index_step = int(scale * num_bits)
    nwin = win.shape[0]
    n = x.shape[0]
    n_out = int(np.ceil(n * sr_out / sr_in))
    time_increment = sr_in / sr_out
    max_taps = nwin // max(index_step, 1) + 1
    y = np.zeros((n_out,) + x.shape[1:], dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    expand = (slice(None),) + (None,) * (x.ndim - 1)

    for j0 in range(0, n_out, 1 << 16):
        m = np.arange(j0, min(j0 + (1 << 16), n_out))
        time_register = m * time_increment
        n0 = time_register.astype(np.int64)
        frac = scale * (time_register - n0)
        acc = np.zeros((m.size,) + x.shape[1:], dtype=np.float64)
        for sign, base_frac, start in ((-1, frac, n0), (+1, scale - frac, n0 + 1)):
            index_frac = base_frac * num_bits
            offset = index_frac.astype(np.int64)
            eta = index_frac - offset
            count = (nwin - offset) // index_step  # resampy's wing tap count
            for i in range(max_taps):
                src = start + sign * i
                valid = (i < count) & (src >= 0) & (src < n)
                if not valid.any():
                    break
                idx = np.minimum(offset + i * index_step, nwin - 1)
                w = np.where(valid, win[idx] + eta * delta[idx], 0.0)
                acc += w[expand] * x[np.clip(src, 0, n - 1)]
        y[j0 : j0 + m.size] = acc
    return y


def resample(x: jax.Array, sr_in: int, sr_out: int) -> jax.Array:
    """Resample along axis 0. x: (n,) or (n, channels).

    Output length is ``ceil(n * sr_out / sr_in)`` (resampy convention), and
    samples beyond either edge of the input are treated as zero (resampy
    truncates the filter wings at the edges, which is equivalent).
    """
    if sr_in == sr_out:
        return x
    if _plan_bytes(sr_in, sr_out) > _PLAN_BYTES_CAP:
        out = _resample_windowed(np.asarray(x), sr_in, sr_out)
        return jnp.asarray(out.astype(np.asarray(x).dtype))
    plan = plan_resample(sr_in, sr_out)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    n = x.shape[0]
    n_out = int(np.ceil(n * sr_out / sr_in))

    block_in = plan.c * plan.down
    block_out = plan.c * plan.up
    nblocks = -(-n_out // block_out)
    width = plan.weights.shape[1]

    # window b reads input samples [b*block_in - reach, b*block_in + block_in + reach]
    from .blocks import overlapping_blocks

    parts = -(-width // block_in)
    pad_left = plan.reach
    pad_right = max(0, (nblocks - 1 + parts) * block_in - pad_left - n)
    padded = jnp.pad(x, ((pad_left, pad_right), (0, 0)))
    windows = overlapping_blocks(padded, nblocks, block_in, width)

    # cast on host first: jnp.asarray would warn when float64 is unavailable
    weight_dtype = np.dtype(x.dtype)
    if weight_dtype == np.float64 and not jax.config.jax_enable_x64:
        weight_dtype = np.dtype(np.float32)
    w = jnp.asarray(plan.weights.astype(weight_dtype))
    out = jnp.einsum("bwc,ow->boc", windows, w)  # (nblocks, block_out, ch)
    out = out.reshape(nblocks * block_out, x.shape[1])[:n_out]
    return out[:, 0] if squeeze else out
