"""Framed spectrum analysis (JAX).

TPU-native replacement for the reference's ``scipy.signal.stft``-based
average spectrum (``matchering/stage_helpers/match_frequencies.py:30-42``):
non-overlapping boxcar frames of ``fft_size`` samples, rFFT magnitude scaled
by ``1/fft_size`` (scipy's boxcar window normalization), averaged over all
frames of the selected pieces.

The reference gathers the loudest pieces (ragged) and averages; here every
piece contributes its per-piece frame average and the piece axis is reduced
with the loudest-piece mask — numerically identical because every piece
yields the same number of full frames (tail samples are dropped, matching
``boundary=None, padded=False``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def framed_magnitude_mean(pieces: jax.Array, fft_size: int) -> jax.Array:
    """Per-piece mean boxcar |rFFT|/fft_size spectrum.

    pieces: (divisions, piece_size) -> (divisions, fft_size//2 + 1)
    """
    divisions, piece_size = pieces.shape
    frames_per_piece = piece_size // fft_size
    frames = pieces[:, : frames_per_piece * fft_size].reshape(
        divisions, frames_per_piece, fft_size
    )
    specs = jnp.abs(jnp.fft.rfft(frames, axis=-1)) / fft_size
    return jnp.mean(specs, axis=1)


def masked_average_spectrum(
    pieces: jax.Array, mask: jax.Array, fft_size: int
) -> jax.Array:
    """Average |rFFT| spectrum over the frames of the mask-selected pieces
    (reference ``match_frequencies.py:30-42`` over the loudest pieces).

    mask: (divisions,) 0/1 weights.  Returns (fft_size//2 + 1,).
    """
    per_piece = framed_magnitude_mean(pieces, fft_size)
    weight = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(per_piece * mask[:, None], axis=0) / weight


def masked_average_spectrum_dynamic(
    array: jax.Array,
    mask: jax.Array,
    piece_size: jax.Array,
    div_max: int,
    fft_size: int,
    fpp_max: int,
) -> jax.Array:
    """:func:`masked_average_spectrum_flat` with *traced* piece geometry —
    exact-length analysis of a bucket-padded batch entry (reference
    ``match_frequencies.py:30-42`` framed from each true piece start).

    Frames are fetched as one static-size ``dynamic_slice`` per piece slot
    (the compile-friendly form on this backend — a flat index gather over
    the signal is not), reshaped to the aligned (fpp_max, fft_size) grid;
    frames past each piece's true ``piece_size // fft_size`` count and
    pieces past the division count carry zero weight.  ``mask`` must
    already be zero for invalid pieces (``loudest_piece_stats_masked``).
    """
    dtype = array.dtype
    slice_len = fpp_max * fft_size
    padded = jnp.concatenate([array, jnp.zeros((slice_len,), dtype)])
    frames = jnp.stack(
        [
            jax.lax.dynamic_slice(padded, (p * piece_size,), (slice_len,)).reshape(
                fpp_max, fft_size
            )
            for p in range(div_max)
        ]
    )  # (div_max, fpp_max, fft_size)
    specs = jnp.abs(jnp.fft.rfft(frames, axis=-1)) / fft_size
    frames_per_piece = piece_size // fft_size
    frame_valid = (jnp.arange(fpp_max) < frames_per_piece).astype(dtype)
    weights = mask[:, None] * frame_valid[None, :]
    total = jnp.sum(specs * weights[:, :, None], axis=(0, 1))
    selected = jnp.maximum(jnp.sum(mask), 1.0)
    return total / (selected * jnp.maximum(frames_per_piece, 1))


def masked_average_spectrum_flat(
    array: jax.Array, mask: jax.Array, piece_size: int, divisions: int, fft_size: int
) -> jax.Array:
    """:func:`masked_average_spectrum` straight from the flat signal,
    without materializing the (divisions, piece_size) unfold — piece_size is
    an arbitrary odd width whose row layout the XLA TPU compiler tiles
    pathologically slowly; per-piece *static* slices reshaped to the
    aligned (frames, fft_size) grid compile in seconds."""
    frames_per_piece = piece_size // fft_size
    used = frames_per_piece * fft_size
    frames = jnp.concatenate(
        [
            jax.lax.slice(array, (p * piece_size,), (p * piece_size + used,)).reshape(
                frames_per_piece, fft_size
            )
            for p in range(divisions)
        ]
    )  # (divisions * frames_per_piece, fft_size)
    specs = jnp.abs(jnp.fft.rfft(frames, axis=-1)) / fft_size
    weights = jnp.repeat(mask, frames_per_piece)
    total = jnp.sum(specs * weights[:, None], axis=0)
    selected = jnp.maximum(jnp.sum(mask), 1.0)
    return total / (selected * frames_per_piece)


def masked_average_spectrum_flat_pair(
    signal_a: jax.Array,
    signal_b: jax.Array,
    mask: jax.Array,
    piece_size: int,
    divisions: int,
    fft_size: int,
):
    """Both channels' :func:`masked_average_spectrum_flat` through ONE
    complex FFT per frame batch: ``z = a + i*b`` rides a single c2c
    transform and the two magnitude spectra are recovered with the
    Hermitian split done entirely in REAL arithmetic on half-length
    slices —
        |A_k| = sqrt((R+Rr)^2 + (I-Ir)^2) / 2
        |B_k| = sqrt((I+Ir)^2 + (R-Rr)^2) / 2
    with (R, I) = (Re, Im) of fft(z) and (Rr, Ir) the index-reversed-with-
    wrap halves.  This matters because the backend lowers ``rfft`` as a
    FULL-size complex transform anyway (PROBE_FFT.json), so packing halves
    the transform count of the analysis stage's hottest block; the real-
    arithmetic split avoids the full-size complex reversed copies that made
    the r4 packed probe LOSE (PROBE_ANALYSIS.json packed_spectrum_x2pairs).

    Returns ``(spectrum_a, spectrum_b)``, each ``(fft_size//2 + 1,)`` —
    numerically the reference's averaged |STFT| over the mask-selected
    pieces (``match_frequencies.py:30-42``) for each channel.
    """
    frames_per_piece = piece_size // fft_size
    used = frames_per_piece * fft_size

    def frames_of(x):
        return jnp.concatenate(
            [
                jax.lax.slice(x, (p * piece_size,), (p * piece_size + used,)).reshape(
                    frames_per_piece, fft_size
                )
                for p in range(divisions)
            ]
        )

    z = jax.lax.complex(frames_of(signal_a), frames_of(signal_b))
    Z = jnp.fft.fft(z, axis=-1)
    R, I = jnp.real(Z), jnp.imag(Z)
    half = fft_size // 2 + 1

    def rev_half(X):
        # X[(n-k) % n] for k = 0..n/2; the reversed window is barriered out
        # of pad/concat fusions (TPU fusion-emitter guard, as in
        # ops/fftpack.irfft and ops/convolve)
        tail = X[..., :0:-1]
        tail = jax.lax.optimization_barrier(tail)
        return jnp.concatenate([X[..., :1], tail], axis=-1)[..., :half]

    Rh, Ih = R[..., :half], I[..., :half]
    Rr, Ir = rev_half(R), rev_half(I)
    scale = 0.5 / fft_size
    mag_a = jnp.sqrt(jnp.square(Rh + Rr) + jnp.square(Ih - Ir)) * scale
    mag_b = jnp.sqrt(jnp.square(Ih + Ir) + jnp.square(Rh - Rr)) * scale

    weights = jnp.repeat(mask, frames_per_piece)
    selected = jnp.maximum(jnp.sum(mask), 1.0) * frames_per_piece
    return (
        jnp.sum(mag_a * weights[:, None], axis=0) / selected,
        jnp.sum(mag_b * weights[:, None], axis=0) / selected,
    )


def masked_average_spectrum_dynamic_pair(
    signal_a: jax.Array,
    signal_b: jax.Array,
    mask: jax.Array,
    piece_size: jax.Array,
    div_max: int,
    fft_size: int,
    fpp_max: int,
):
    """Both channels' :func:`masked_average_spectrum_dynamic` through one
    complex FFT per frame batch — the packed form (see
    :func:`masked_average_spectrum_flat_pair`) with *traced* piece
    geometry, for bucket-padded batch entries."""
    dtype = signal_a.dtype
    slice_len = fpp_max * fft_size

    def frames_of(x):
        padded = jnp.concatenate([x, jnp.zeros((slice_len,), dtype)])
        return jnp.stack(
            [
                jax.lax.dynamic_slice(padded, (p * piece_size,), (slice_len,)).reshape(
                    fpp_max, fft_size
                )
                for p in range(div_max)
            ]
        )  # (div_max, fpp_max, fft_size)

    z = jax.lax.complex(frames_of(signal_a), frames_of(signal_b))
    Z = jnp.fft.fft(z, axis=-1)
    R, I = jnp.real(Z), jnp.imag(Z)
    half = fft_size // 2 + 1

    def rev_half(X):
        tail = X[..., :0:-1]
        tail = jax.lax.optimization_barrier(tail)
        return jnp.concatenate([X[..., :1], tail], axis=-1)[..., :half]

    Rh, Ih = R[..., :half], I[..., :half]
    Rr, Ir = rev_half(R), rev_half(I)
    scale = 0.5 / fft_size
    mag_a = jnp.sqrt(jnp.square(Rh + Rr) + jnp.square(Ih - Ir)) * scale
    mag_b = jnp.sqrt(jnp.square(Ih + Ir) + jnp.square(Rh - Rr)) * scale

    frames_per_piece = piece_size // fft_size
    frame_valid = (jnp.arange(fpp_max) < frames_per_piece).astype(dtype)
    weights = mask[:, None] * frame_valid[None, :]
    selected = jnp.maximum(jnp.sum(mask), 1.0) * jnp.maximum(frames_per_piece, 1)
    return (
        jnp.sum(mag_a * weights[:, :, None], axis=(0, 1)) / selected,
        jnp.sum(mag_b * weights[:, :, None], axis=(0, 1)) / selected,
    )
