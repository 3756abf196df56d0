"""Elementwise / reduction DSP kernels (JAX).

TPU-native counterpart of the reference kernel library
(``matchering/dsp.py:25-152``).  All functions are pure, shape-static and
jit-safe; reductions that the reference implements with boolean fancy
indexing are expressed here as masked arithmetic (identical numerics, static
shapes — see ``loudest_piece_stats``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Channel transforms


def lr_to_ms(array: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Stereo (n, 2) -> mid/side pair of (n,) arrays.

    mid = (L + R) / 2, side = (L - R) / 2 (reference ``dsp.py:57-64``).
    """
    mid = (array[:, 0] + array[:, 1]) * 0.5
    side = mid - array[:, 1]
    return mid, side


def ms_to_lr(mid: jax.Array, side: jax.Array) -> jax.Array:
    """Mid/side -> stereo (n, 2): L = mid + side, R = mid - side
    (reference ``dsp.py:67-68``)."""
    return jnp.stack([mid + side, mid - side], axis=-1)


def mono_to_stereo(array: jax.Array) -> jax.Array:
    return jnp.repeat(array, repeats=2, axis=1)


# ---------------------------------------------------------------------------
# Gain / amplitude


def amplify(array: jax.Array, gain) -> jax.Array:
    return array * gain


def clip(array: jax.Array, to: float = 1.0) -> jax.Array:
    return jnp.clip(array, -to, to)


def flip(array: jax.Array) -> jax.Array:
    return 1.0 - array


def max_mix(*arrays) -> jax.Array:
    out = arrays[0]
    for a in arrays[1:]:
        out = jnp.maximum(out, a)
    return out


def rectify(array: jax.Array, threshold: float) -> jax.Array:
    """Cross-channel peak envelope floored at ``threshold`` and normalized to
    it (reference ``dsp.py:117-121``): output >= 1, equal to 1 where the
    signal does not exceed the threshold."""
    peak = jnp.max(jnp.abs(array), axis=1)
    return jnp.maximum(peak, threshold) / threshold


def normalize(
    array: jax.Array, threshold: float, epsilon: float, normalize_clipped: bool
) -> Tuple[jax.Array, jax.Array]:
    """Peak-normalize to ``threshold`` (reference ``dsp.py:89-100``).

    Quiet material (peak < threshold) is boosted so its peak lands exactly on
    the threshold; material at/above the threshold is left untouched unless
    ``normalize_clipped`` is set, in which case it is attenuated onto the
    threshold too.  Returns the scaled array and the scalar coefficient that
    was divided out.
    """
    max_value = jnp.max(jnp.abs(array))
    coefficient = jnp.maximum(epsilon, max_value / threshold)
    if not normalize_clipped:
        coefficient = jnp.where(max_value < threshold, coefficient, 1.0)
    return array / coefficient, coefficient


def fade(array: jax.Array, fade_size: int) -> jax.Array:
    """Linear fade-in/out over ``fade_size`` samples (reference
    ``dsp.py:146-152``).  ``fade_size`` is static."""
    n = array.shape[0]
    ramp_in = jnp.linspace(0.0, 1.0, fade_size, dtype=array.dtype)
    shape = (fade_size,) + (1,) * (array.ndim - 1)
    ramp_in = ramp_in.reshape(shape)
    head = array[:fade_size] * ramp_in
    tail = array[n - fade_size :] * ramp_in[::-1]
    return jnp.concatenate([head, array[fade_size : n - fade_size], tail], axis=0)


# ---------------------------------------------------------------------------
# RMS statistics


def rms(array: jax.Array) -> jax.Array:
    """Root mean square of a 1-D array (reference ``dsp.py:76-77``)."""
    return jnp.sqrt(jnp.dot(array, array) / array.shape[0])


def unfold(array: jax.Array, piece_size: int, divisions: int) -> jax.Array:
    """(n,) -> (divisions, piece_size), truncating the tail
    (reference ``dsp.py:71-73``)."""
    return array[: piece_size * divisions].reshape(divisions, piece_size)


def batch_rms(pieces: jax.Array) -> jax.Array:
    """Per-row RMS of a (divisions, piece_size) array (reference
    ``dsp.py:80-86`` — there a batched matmul; here a fused reduction)."""
    return jnp.sqrt(jnp.mean(jnp.square(pieces), axis=-1))


_CHUNK = 4096


def piece_rms_flat(array: jax.Array, piece_size: int, divisions: int) -> jax.Array:
    """Per-piece RMS straight from the flat signal — equal to
    ``batch_rms(unfold(array, piece_size, divisions))`` up to summation
    order.

    The unfold form reduces over rows of width ``piece_size`` — an
    arbitrary odd number that the XLA TPU compiler takes *minutes* to tile
    (measured: 285 s compile for (13, 610615) row sums vs ~1 s for aligned
    shapes).  Here the energy is summed over aligned (m, 4096) chunks and
    each piece total is assembled from the chunk cumulative sum plus two
    boundary partial-chunk corrections, whose offsets are host-static.
    """
    dtype = array.dtype
    n_used = piece_size * divisions
    m = -(-n_used // _CHUNK)
    energy = jnp.square(array[:n_used])
    chunks = jnp.pad(energy, (0, m * _CHUNK - n_used)).reshape(m, _CHUNK)
    chunk_sums = jnp.sum(chunks, axis=1)
    cum = jnp.concatenate([jnp.zeros((1,), dtype), jnp.cumsum(chunk_sums)])

    # boundary b_p = p * piece_size sits in chunk j_p at offset o_p (static)
    import numpy as _np

    bounds = _np.arange(divisions + 1) * piece_size
    j = bounds // _CHUNK
    o = bounds % _CHUNK
    # partial_p = sum of chunk j_p entries [0, o_p)
    # static row picks (tiny loop over div+1 boundaries — no gather op)
    boundary_chunks = jnp.stack(
        [chunks[int(min(jj, m - 1))] for jj in j]
    )  # (div+1, CHUNK)
    masks = jnp.asarray(
        (_np.arange(_CHUNK)[None, :] < o[:, None]).astype(bool)
    )
    partial = jnp.sum(jnp.where(masks, boundary_chunks, 0.0), axis=1)

    j_arr = jnp.asarray(j)
    totals = (cum[j_arr[1:]] - cum[j_arr[:-1]]) - partial[:-1] + partial[1:]
    return jnp.sqrt(totals / piece_size)


def piece_rms_dynamic(
    array: jax.Array, piece_size: jax.Array, divisions: jax.Array, div_max: int
) -> Tuple[jax.Array, jax.Array]:
    """:func:`piece_rms_flat` with *traced* piece geometry — the per-track
    division of a bucket-padded batch entry (reference exact-length analysis:
    ``matchering/stage_helpers/match_levels.py:47-59``).

    Same chunked summation as the static form (identical numerics for the
    valid pieces); boundaries are dynamic indices into the chunk cumulative
    sum plus masked partial-chunk corrections — a (div_max+1)-row gather,
    never a full-signal gather.  Returns ``(rmses, valid)`` of shape
    ``(div_max,)``; entries with index >= divisions are meaningless and
    flagged 0 in ``valid``.
    """
    dtype = array.dtype
    n = array.shape[0]
    m = -(-n // _CHUNK)
    n_used = piece_size * divisions
    energy = jnp.square(array) * (jnp.arange(n) < n_used)
    chunks = jnp.pad(energy, (0, m * _CHUNK - n)).reshape(m, _CHUNK)
    chunk_sums = jnp.sum(chunks, axis=1)
    cum = jnp.concatenate([jnp.zeros((1,), dtype), jnp.cumsum(chunk_sums)])

    bounds = jnp.arange(div_max + 1) * piece_size  # (div_max+1,) traced
    j = jnp.minimum(bounds // _CHUNK, m)
    o = bounds % _CHUNK
    rows = chunks[jnp.minimum(j, m - 1)]  # (div_max+1, _CHUNK) small gather
    masks = jnp.arange(_CHUNK)[None, :] < o[:, None]
    partial = jnp.sum(jnp.where(masks, rows, 0.0), axis=1)

    totals = (cum[j[1:]] - cum[j[:-1]]) - partial[:-1] + partial[1:]
    rmses = jnp.sqrt(jnp.maximum(totals, 0.0) / piece_size)
    valid = (jnp.arange(div_max) < divisions).astype(dtype)
    return rmses, valid


def masked_rms(values: jax.Array, mask: jax.Array) -> jax.Array:
    """RMS over the entries selected by ``mask``: sqrt(sum(mask*v^2)/sum(mask)).

    Static-shape replacement for the reference's boolean-index-then-rms
    (``match_levels.py:62-71``): identical numerics for any 0/1 mask.
    """
    weight = jnp.sum(mask)
    total = jnp.sum(jnp.square(values) * mask)
    return jnp.sqrt(total / jnp.maximum(weight, 1))


def loudest_piece_stats(rmses: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Loudest-piece mask and match RMS (reference ``match_levels.py:62-71``).

    A piece is "loudest" when its RMS >= the RMS of all piece RMSes; the
    match RMS is the RMS of the selected pieces' RMSes.
    Returns (mask float array of shape (divisions,), match_rms scalar).
    """
    average_rms = rms(rmses)
    mask = (rmses >= average_rms).astype(rmses.dtype)
    return mask, masked_rms(rmses, mask)


def loudest_piece_stats_masked(
    rmses: jax.Array, valid: jax.Array, divisions: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """:func:`loudest_piece_stats` over the ``valid``-flagged prefix of a
    dynamically divided track: the average RMS divides by the traced
    ``divisions`` count and invalid pieces can neither be selected nor
    contribute to the match RMS."""
    average_rms = jnp.sqrt(jnp.sum(jnp.square(rmses) * valid) / divisions)
    mask = ((rmses >= average_rms) * valid).astype(rmses.dtype)
    return mask, masked_rms(rmses, mask)


# ---------------------------------------------------------------------------
# Peak statistics


def pcm_int_scale(dtype) -> float:
    """Full-scale divisor for an integer PCM dtype — the libsndfile
    convention the whole framework uses (int16 -> 2^15, int32 -> 2^31)."""
    return float(1 << (jnp.dtype(dtype).itemsize * 8 - 1))


def to_working_float(x: jax.Array, dtype) -> jax.Array:
    """Cast to the working float dtype; integer PCM codes scale by
    ``pcm_int_scale`` — the on-device half of raw-PCM staging (the host
    keeps int16/int32 payloads, halving H2D bytes vs float32)."""
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.integer):
        scale = 1.0 / pcm_int_scale(x.dtype)
        return x.astype(dtype) * jnp.asarray(scale, dtype)
    return x.astype(dtype)


def count_max_peaks(array: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Global peak magnitude and how many samples sit at it, using
    ``np.isclose`` tolerances (reference ``dsp.py:49-54``).  Integer PCM
    inputs are scaled to full-scale floats on device first, so the
    reported peak is in the same [-1, 1] domain as float sources."""
    array = jnp.asarray(array)
    if jnp.issubdtype(array.dtype, jnp.integer):
        array = to_working_float(array, jnp.result_type(float))
    max_value = jnp.max(jnp.abs(array))
    atol, rtol = 1e-8, 1e-5
    tol = atol + rtol * max_value
    near = jnp.abs(jnp.abs(array) - max_value) <= tol
    return max_value, jnp.sum(near)
