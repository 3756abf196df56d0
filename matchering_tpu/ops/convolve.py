"""Long FIR convolution via overlap-save block FFT (JAX).

TPU-native replacement for the reference's full-track
``scipy.signal.fftconvolve(x, fir, "same")``
(``matchering/stage_helpers/match_frequencies.py:104-119``) — the hottest
operation of the whole pipeline.  Instead of one giant FFT over the track,
the signal is cut into overlapping blocks of a hardware-friendly power-of-two
size and processed as one *batched* rFFT -> spectral multiply -> irFFT — the
exact same linear convolution (overlap-save is exact, not an approximation),
but expressed as large batched FFTs that XLA pipelines well on TPU, bounded
VMEM working set, and trivially shardable across the time axis (each block
only needs ``taps-1`` halo samples from its left neighbor — see
``parallel/timeshard.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import fftpack


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


_CONV_CHUNK = 128  # blocks per mapped FFT batch (~bounded HBM working set)


def fft_convolve_same(
    x: jax.Array, fir: jax.Array, block_fft: int = 1 << 16
) -> jax.Array:
    """``scipy.signal.fftconvolve(x, fir, mode="same")`` for 1-D inputs.

    For short signals a single FFT is used; otherwise overlap-save blocks
    of ``block_fft`` points (raised automatically if ``fir`` needs more
    room than ``block_fft // 2``).  The 2^16 default is measured on a v5e
    chip for the production 4096-tap FIR over a 3-min track: 6.8 ms vs
    9.3 ms at 2^17 and 16.3 ms at 2^18 (identical outputs).
    """
    n = x.shape[0]
    taps = fir.shape[0]
    if taps > block_fft // 2:
        block_fft = _next_pow2(2 * taps)
    full = n + taps - 1
    start = (taps - 1) // 2  # "same" keeps the centered n samples

    single = _next_pow2(full)
    if single <= block_fft:
        spec = jnp.fft.rfft(x, n=single) * jnp.fft.rfft(fir, n=single)
        out = fftpack.irfft(spec, n=single)
        return out[start : start + n]

    from .blocks import overlapping_blocks

    nfft = block_fft
    # Discard a 128-aligned prefix per block (>= taps-1 covers the circular
    # wrap).  Alignment matters for the XLA *compiler*: the overlapping
    # block matrix is built from two shifted reshapes (no gathers — TPU
    # gather compiles are pathologically slow), and 128-multiple lane
    # splits compile ~25x faster than odd ones (measured: 6 s vs 148 s for
    # a 180 s track).
    discard = -(-(taps - 1) // 128) * 128
    hop = nfft - discard  # new samples consumed per block
    nblocks = -(-full // hop)

    # Block b covers full-convolution outputs [b*hop, b*hop + hop), reading
    # padded samples [b*hop, b*hop + nfft) where padded has `discard` leading
    # zeros; pad the tail so every reshape part is in-bounds.
    padded = jnp.pad(x, (discard, (nblocks + 1) * hop - n - discard))
    blocks = overlapping_blocks(padded, nblocks, hop, nfft)

    h = jnp.fft.rfft(fir, n=nfft)

    def per_block(block):
        spec = jnp.fft.rfft(block) * h
        return fftpack.irfft(spec, n=nfft)[discard:]

    if nblocks > 2 * _CONV_CHUNK:
        # bound the FFT working set: the full (nblocks, nfft) spectrum
        # batch peaks at ~5 live copies, which OOMs 60-min tracks; chunked
        # mapping keeps peak memory at ~chunk * nfft * a-few
        segs = jax.lax.map(per_block, blocks, batch_size=_CONV_CHUNK)
    else:
        segs = jax.vmap(per_block)(blocks)
    out = segs.reshape(-1)  # drop circular wrap, keep hop each
    return out[start : start + n]


def _convolve_blocked_packed2(
    signals: jax.Array, firs: jax.Array, block_fft: int
) -> jax.Array:
    """Overlap-save 'same' convolution of a channel PAIR through one
    transform per block: ``z = ch0 + i*ch1`` (both channels ride one c2c),
    with the per-channel filter-and-repack collapsed algebraically to
    ``Q = Z*(h0+h1)/2 + conj(Z_rev)*(h0-h1)/2`` so one inverse transform
    returns ch0 in the real part and ch1 in the imaginary part.

    The transforms run as four-step (Bailey) FFTs on the MXU
    (``fftpack.four_step_fft``): two host-planned DFT matrices applied as
    full-precision einsums — measured 0.81 ms vs 1.25 ms for the backend's
    FFT lowering at the production (646, 16384) block shape, bit-equal on
    an |.|-sum cross-check.  Everything is real arithmetic ((re, im)
    pairs): the axon backend has no standalone complex kernels and real
    pairs dodge complex layout overheads.  Matches
    ``scipy.signal.fftconvolve(x, fir, "same")`` per channel to ~eps.
    """
    from . import fftpack
    from .blocks import overlapping_blocks

    n = signals.shape[1]
    taps = firs.shape[1]
    full = n + taps - 1
    start = (taps - 1) // 2
    nfft = block_fft
    discard = -(-(taps - 1) // 128) * 128  # see fft_convolve_same
    hop = nfft - discard
    nblocks = -(-full // hop)

    pad = (discard, (nblocks + 1) * hop - n - discard)
    blocks_re = overlapping_blocks(jnp.pad(signals[0], pad), nblocks, hop, nfft)
    blocks_im = overlapping_blocks(jnp.pad(signals[1], pad), nblocks, hop, nfft)

    # Hermitian FIR spectra (tiny: one nfft-point transform per channel,
    # once per call), combined into the sum/difference filter pair
    zero = jnp.zeros((nfft - taps,), firs.dtype)
    h0_re, h0_im = fftpack.four_step_fft(
        jnp.concatenate([firs[0], zero]), jnp.zeros((nfft,), firs.dtype)
    )
    h1_re, h1_im = fftpack.four_step_fft(
        jnp.concatenate([firs[1], zero]), jnp.zeros((nfft,), firs.dtype)
    )
    hs_re, hs_im = 0.5 * (h0_re + h1_re), 0.5 * (h0_im + h1_im)
    hd_re, hd_im = 0.5 * (h0_re - h1_re), 0.5 * (h0_im - h1_im)
    inv_n = 1.0 / nfft

    def per_block(args):
        b_re, b_im = args
        z_re, z_im = fftpack.four_step_fft(b_re, b_im)

        def rev(x):
            # x[(nfft - k) % nfft]; the reversed segment is barriered out
            # of the pad/concat fusion (the TPU fusion emitter CHECK-fails
            # on reverse-input windows under vmap — same guard as
            # fftpack.irfft)
            tail = x[..., :0:-1]
            tail = jax.lax.optimization_barrier(tail)
            return jnp.concatenate([x[..., :1], tail], axis=-1)

        zm_re, zm_im = rev(z_re), -rev(z_im)
        q_re = z_re * hs_re - z_im * hs_im + zm_re * hd_re - zm_im * hd_im
        q_im = z_re * hs_im + z_im * hs_re + zm_re * hd_im + zm_im * hd_re
        o_re, o_im = fftpack.four_step_fft(q_re, q_im, inverse=True)
        return jnp.stack([o_re * inv_n, o_im * inv_n])[:, discard:]

    if nblocks > 2 * _CONV_CHUNK:
        segs = jax.lax.map(per_block, (blocks_re, blocks_im), batch_size=_CONV_CHUNK)
    else:
        segs = jax.vmap(per_block)((blocks_re, blocks_im))
    out = jnp.moveaxis(segs, 1, 0).reshape(2, -1)
    out = out[:, start : start + n]
    return out.astype(signals.dtype)


# Per-path block defaults, both measured on a v5e for the production
# 4096-tap FIR over a 3-min track: the per-channel overlap-save is fastest
# at 2^16 (6.8 ms vs 9.3 at 2^17), the packed stereo path at 2^14
# (3.17 ms vs 3.51 at 2^15 and 5.59 at 2^16 — smaller c2c blocks keep the
# transform + Hermitian split resident).
_PACKED_BLOCK = 1 << 14

# The packed path un-packs with a full-track (nblocks, 2, hop) transpose
# (~2 extra track copies of HBM); past this many full-convolution samples
# (~1 GB of copies) that tipped the 60-min 96 kHz master over the 16 GB
# chip (measured r5 OOM) — beyond it, the memory-lean per-channel
# overlap-save runs instead.
_PACKED_TOTAL_LIMIT = 1 << 27


def fft_convolve_same_batch(
    signals: jax.Array, firs: jax.Array, block_fft: int | None = None
) -> jax.Array:
    """Batched 'same' convolution: signals (c, n) with firs (c, taps).

    Channel pairs route through :func:`_convolve_blocked_packed2` (both
    channels in one complex transform — half the FFTs); other channel
    counts, long-form inputs past ``_PACKED_TOTAL_LIMIT`` and the short
    single-FFT path fall back to the per-channel form.  ``block_fft=None``
    picks the measured per-path default."""
    n = signals.shape[1]
    taps = firs.shape[1]
    pack_block = block_fft or _PACKED_BLOCK
    chan_block = block_fft or (1 << 16)
    if taps > pack_block // 2:
        pack_block = _next_pow2(2 * taps)
    full = n + taps - 1
    if (
        signals.shape[0] == 2
        and _next_pow2(full) > pack_block
        and full <= _PACKED_TOTAL_LIMIT
    ):
        return _convolve_blocked_packed2(signals, firs, pack_block)
    # per-channel fallback as a PYTHON loop, not vmap: vmapping the chunked
    # lax.map branch multiplies generated code ~26x (871 MB of on-device
    # program text for a 60-min stereo track vs 34 MB per channel — a
    # measured r5 HBM-OOM contributor), and sequential channels let XLA
    # reuse the block buffers
    return jnp.stack(
        [
            fft_convolve_same(signals[c], firs[c], chan_block)
            for c in range(signals.shape[0])
        ]
    )
