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
