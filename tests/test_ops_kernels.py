"""Unit parity tests for the DSP kernel library vs scipy/numpy oracles.

The reference implementation delegates its hot kernels to scipy/numpy
(SURVEY.md §2.2); scipy is available here, so each JAX kernel is checked
directly against the same scipy call the reference makes.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal
from scipy.ndimage import maximum_filter1d

from matchering_tpu.ops import basics, convolve, fir, iir, sliding, spectrum


class TestBasics:
    def test_lr_ms_roundtrip(self, rng):
        x = rng.randn(1000, 2)
        mid, side = basics.lr_to_ms(jnp.asarray(x))
        mid_ref = (x[:, 0] + x[:, 1]) / 2
        side_ref = (x[:, 0] - x[:, 1]) / 2
        np.testing.assert_allclose(np.asarray(mid), mid_ref, atol=1e-12)
        np.testing.assert_allclose(np.asarray(side), side_ref, atol=1e-12)
        back = basics.ms_to_lr(mid, side)
        np.testing.assert_allclose(np.asarray(back), x, atol=1e-12)

    def test_rms_and_batch_rms(self, rng):
        x = rng.randn(777)
        expected = np.sqrt(x @ x / x.shape[0])
        np.testing.assert_allclose(float(basics.rms(jnp.asarray(x))), expected, rtol=1e-12)
        pieces = rng.randn(5, 321)
        expected_b = np.sqrt(np.einsum("ij,ij->i", pieces, pieces) / 321)
        np.testing.assert_allclose(
            np.asarray(basics.batch_rms(jnp.asarray(pieces))), expected_b, rtol=1e-12
        )

    def test_loudest_piece_stats_matches_boolean_indexing(self, rng):
        rmses = np.abs(rng.randn(23))
        avg = np.sqrt(rmses @ rmses / rmses.shape[0])
        sel = rmses[rmses >= avg]
        expected = np.sqrt(sel @ sel / sel.shape[0])
        mask, match_rms = basics.loudest_piece_stats(jnp.asarray(rmses))
        np.testing.assert_allclose(float(match_rms), expected, rtol=1e-12)
        np.testing.assert_array_equal(np.asarray(mask), (rmses >= avg).astype(float))

    @pytest.mark.parametrize("normalize_clipped", [False, True])
    def test_normalize(self, rng, normalize_clipped):
        threshold, eps = 0.9981, 1e-6
        for scale in (0.3, 1.5):
            x = rng.randn(1000, 2) * scale / 3
            maxv = np.abs(x).max()
            coeff = 1.0
            if maxv < threshold or normalize_clipped:
                coeff = max(eps, maxv / threshold)
            out, c = basics.normalize(jnp.asarray(x), threshold, eps, normalize_clipped)
            np.testing.assert_allclose(float(c), coeff, rtol=1e-12)
            np.testing.assert_allclose(np.asarray(out), x / coeff, rtol=1e-12)

    def test_rectify(self, rng):
        x = rng.randn(500, 2) * 0.8
        threshold = 0.5
        r = np.abs(x).max(1)
        r[r <= threshold] = threshold
        r = r / threshold
        np.testing.assert_allclose(
            np.asarray(basics.rectify(jnp.asarray(x), threshold)), r, rtol=1e-12
        )

    def test_count_max_peaks(self):
        x = np.array([[0.5, -1.0], [1.0, 0.3], [-1.0, 0.2], [0.9999999, 0.0]])
        maxv, count = basics.count_max_peaks(jnp.asarray(x))
        ref_max = np.abs(x).max()
        ref_count = np.count_nonzero(
            np.isclose(x, ref_max) | np.isclose(x, -ref_max)
        )
        assert float(maxv) == ref_max
        assert int(count) == ref_count

    def test_fade(self, rng):
        x = rng.randn(100, 2)
        out = np.asarray(basics.fade(jnp.asarray(x), 10))
        ramp = np.linspace(0, 1, 10)
        np.testing.assert_allclose(out[:10], x[:10] * ramp[:, None], atol=1e-12)
        np.testing.assert_allclose(out[-10:], x[-10:] * ramp[::-1][:, None], atol=1e-12)
        np.testing.assert_allclose(out[10:-10], x[10:-10], atol=1e-15)


class TestSlidingMax:
    @pytest.mark.parametrize("size", [1, 3, 4, 44, 45, 89, 128])
    def test_matches_ndimage(self, rng, size):
        x = rng.randn(2000)
        expected = maximum_filter1d(x, size=size)
        got = np.asarray(sliding.max_filter1d(jnp.asarray(x), size))
        np.testing.assert_array_equal(got, expected)

    @pytest.mark.parametrize("window", [44, 45, 89])
    def test_attack_mode(self, rng, window):
        x = np.abs(rng.randn(5000))
        odd = window if window % 2 else window + 1
        expected = maximum_filter1d(x, size=2 * odd - 1)
        got = np.asarray(sliding.sliding_max_attack(jnp.asarray(x), window))
        np.testing.assert_array_equal(got, expected)

    @pytest.mark.parametrize("window", [44, 45])
    def test_hold_mode(self, rng, window):
        x = np.abs(rng.randn(5000))
        half = (window - 1) // 2
        padded = np.pad(x, (half, 0))
        expected = maximum_filter1d(padded, size=window)[:-half]
        got = np.asarray(sliding.sliding_max_hold(jnp.asarray(x), window))
        assert got.shape == expected.shape
        np.testing.assert_array_equal(got, expected)


class TestIIR:
    def test_butter1_matches_scipy(self):
        for cutoff in (7.0, 800.0 / 3000.0):
            b, a = signal.butter(1, cutoff, fs=44100)
            f = iir.butter1_coefficients(cutoff, 44100)
            np.testing.assert_allclose([f.b0, f.b1], b, rtol=1e-12)
            np.testing.assert_allclose([1.0, f.a1], a, rtol=1e-12)

    def test_lfilter_first_order(self, rng):
        x = rng.randn(10000)
        b, a = signal.butter(1, 7.0, fs=44100)
        expected = signal.lfilter(b, a, x)
        f = iir.butter1_coefficients(7.0, 44100)
        got = np.asarray(iir.lfilter_first_order(f, jnp.asarray(x)))
        np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-12)

    def test_lfilter_zi(self):
        c = math.exp(-2.0 / 44)
        f = iir.FirstOrderFilter(b0=1 - c, b1=0.0, a1=-c)
        expected = signal.lfilter_zi([1 - c], [1, -c])[0]
        np.testing.assert_allclose(f.zi(), expected, rtol=1e-12)

    def test_filtfilt_first_order(self, rng):
        x = np.abs(rng.randn(8000))
        c = math.exp(-2.0 / 44)
        b, a = [1 - c], [1, -c]
        expected = signal.filtfilt(b, a, x)
        f = iir.FirstOrderFilter(b0=1 - c, b1=0.0, a1=-c)
        got = np.asarray(iir.filtfilt_first_order(f, jnp.asarray(x)))
        np.testing.assert_allclose(got, expected, rtol=1e-8, atol=1e-10)

    def test_lfilter_with_zi(self, rng):
        x = rng.randn(500)
        b, a = signal.butter(1, 0.05)
        zi = signal.lfilter_zi(b, a) * x[0]
        expected, _ = signal.lfilter(b, a, x, zi=zi)
        f = iir.FirstOrderFilter(b0=b[0], b1=b[1], a1=a[1])
        got = np.asarray(iir.lfilter_first_order(f, jnp.asarray(x), zi=float(zi[0])))
        np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-12)

    @pytest.mark.parametrize("n", [5000, 200000])
    def test_vmapped_scan_matches_per_row(self, rng, n):
        """The custom batching rule (batch folded into block rows — the
        vmapped-farm memory-layout fix) must be numerically identical to
        scanning each row separately, across both the short and the blocked
        two-level paths."""
        pole = 0.999962
        drives = rng.randn(4, n)
        want = np.stack(
            [np.asarray(iir.scan_first_order(jnp.asarray(d), pole)) for d in drives]
        )
        got = np.asarray(
            jax.vmap(lambda d: iir.scan_first_order(d, pole))(jnp.asarray(drives))
        )
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    @pytest.mark.parametrize("n", [5000, 200000])
    def test_vmapped_ds_scan_matches_per_row(self, rng, n):
        pole = 0.999962
        drives = rng.randn(3, n).astype(np.float32)
        per_row = [
            iir.scan_first_order_ds(jnp.asarray(d), jnp.zeros_like(jnp.asarray(d)), pole)
            for d in drives
        ]
        want_h = np.stack([np.asarray(h) for h, _ in per_row])
        want_l = np.stack([np.asarray(l) for _, l in per_row])
        got_h, got_l = jax.vmap(
            lambda d: iir.scan_first_order_ds(d, jnp.zeros_like(d), pole)
        )(jnp.asarray(drives))
        np.testing.assert_array_equal(np.asarray(got_h), want_h)
        np.testing.assert_array_equal(np.asarray(got_l), want_l)

    @pytest.mark.parametrize("pole", [0.9997, 0.999962, 0.9999915])
    def test_refined_ds_scan_accuracy(self, rng, pole):
        """The iterative-refinement compensated-scan engine (default) must
        hold ~double accuracy at the limiter's near-unit poles: the defect
        equation of a linear recurrence is exact, so the plain scan's error
        only ever applies to the ~1e-7-relative residual.  Gate well above
        the float32 collapse floor the pipeline actually consumes."""
        n = 200_000
        d = rng.randn(n).astype(np.float32)
        ref = np.asarray(iir.scan_first_order(jnp.asarray(d.astype(np.float64)), pole))
        h, l = iir.scan_first_order_ds(
            jnp.asarray(d), jnp.zeros(n, np.float32), pole
        )
        got = np.asarray(h, np.float64) + np.asarray(l, np.float64)
        err = ref - got
        snr = 10 * np.log10(np.sum(ref**2) / max(np.sum(err**2), 1e-300))
        assert snr > 180.0, f"refined ds scan SNR {snr:.1f} dB at pole {pole}"

    def test_refined_matches_ladder_engine(self, rng, monkeypatch):
        """Both compensated-scan engines solve the same recurrence: their
        collapsed outputs must agree to the f32 collapse floor."""
        pole = 0.999962
        n = 150_000
        d = jnp.asarray(rng.randn(n).astype(np.float32))
        zero = jnp.zeros(n, np.float32)
        monkeypatch.setenv("MATCHERING_TPU_DS_ENGINE", "refine")
        h_r, l_r = iir.scan_first_order_ds(d, zero, pole)
        refined = np.asarray(h_r, np.float64) + np.asarray(l_r, np.float64)
        monkeypatch.setenv("MATCHERING_TPU_DS_ENGINE", "ladder")
        h_d, l_d = iir.scan_first_order_ds(d, zero, pole)
        ladder = np.asarray(h_d, np.float64) + np.asarray(l_d, np.float64)
        scale = np.max(np.abs(ladder))
        np.testing.assert_allclose(refined, ladder, atol=2e-7 * scale, rtol=0)

    def test_vmapped_scan_mega_path(self, rng):
        """The sequential mega-block mode under vmap (per-track ds carries
        across lax.scan steps)."""
        old = iir._SEQUENTIAL_LIMIT
        try:
            iir._SEQUENTIAL_LIMIT = 1 << 17
            pole = 0.9997
            n = (1 << 17) + 12345  # forces the mega path with the test limit
            drives = rng.randn(2, n)
            want = np.stack(
                [np.asarray(iir.scan_first_order(jnp.asarray(d), pole)) for d in drives]
            )
            got = np.asarray(
                jax.vmap(lambda d: iir.scan_first_order(d, pole))(jnp.asarray(drives))
            )
            np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

            f32 = drives.astype(np.float32)
            per_row = [
                iir.scan_first_order_ds(
                    jnp.asarray(d), jnp.zeros_like(jnp.asarray(d)), pole
                )
                for d in f32
            ]
            want_h = np.stack([np.asarray(h) for h, _ in per_row])
            got_h, _ = jax.vmap(
                lambda d: iir.scan_first_order_ds(d, jnp.zeros_like(d), pole)
            )(jnp.asarray(f32))
            np.testing.assert_array_equal(np.asarray(got_h), want_h)
        finally:
            iir._SEQUENTIAL_LIMIT = old


class TestSpectrum:
    def test_masked_average_matches_scipy_stft(self, rng):
        fft_size = 256
        piece_size = 1000  # 3 full frames, tail dropped
        pieces = rng.randn(7, piece_size)
        mask = np.array([1, 0, 1, 1, 0, 0, 1], dtype=float)
        selected = pieces[mask.astype(bool)]
        *_, specs = signal.stft(
            selected,
            44100,
            window="boxcar",
            nperseg=fft_size,
            noverlap=0,
            boundary=None,
            padded=False,
        )
        expected = np.abs(specs).mean((0, 2))
        got = np.asarray(
            spectrum.masked_average_spectrum(
                jnp.asarray(pieces), jnp.asarray(mask), fft_size
            )
        )
        np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-14)


class TestFir:
    def test_hann_matches_scipy(self):
        expected = signal.windows.hann(4096)
        got = np.asarray(fir.hann_symmetric(4096, jnp.float64))
        np.testing.assert_allclose(got, expected, atol=1e-12)

    def test_fir_synthesis(self, rng):
        fft_size = 512
        curve = np.abs(rng.randn(fft_size // 2 + 1)) + 0.1
        expected = np.fft.ifftshift(np.fft.irfft(curve)) * signal.windows.hann(fft_size)
        got = np.asarray(fir.fir_from_magnitude(jnp.asarray(curve), fft_size))
        np.testing.assert_allclose(got, expected, atol=1e-12)


class TestConvolve:
    @pytest.mark.parametrize("n", [1000, 5000, 300000])
    def test_matches_fftconvolve_same(self, rng, n):
        x = rng.randn(n)
        h = rng.randn(257)
        expected = signal.fftconvolve(x, h, "same")
        got = np.asarray(
            convolve.fft_convolve_same(jnp.asarray(x), jnp.asarray(h), block_fft=1 << 14)
        )
        np.testing.assert_allclose(got, expected, rtol=1e-7, atol=1e-8)

    def test_long_fir_auto_raises_block(self, rng):
        """A FIR longer than block_fft // 2 transparently raises the block
        size instead of producing a wrong overlap-save decomposition."""
        x = rng.randn(200000)
        h = rng.randn(40000)
        expected = signal.fftconvolve(x, h, "same")
        got = np.asarray(
            convolve.fft_convolve_same(jnp.asarray(x), jnp.asarray(h), block_fft=1 << 14)
        )
        np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-7)

    def test_even_fir_alignment(self, rng):
        x = rng.randn(4096)
        h = rng.randn(512)  # even taps — 'same' centering must match scipy
        expected = signal.fftconvolve(x, h, "same")
        got = np.asarray(
            convolve.fft_convolve_same(jnp.asarray(x), jnp.asarray(h), block_fft=1 << 12)
        )
        np.testing.assert_allclose(got, expected, rtol=1e-7, atol=1e-8)

    @pytest.mark.parametrize(
        "n,taps",
        [
            (100001, 257),   # odd signal length
            (100000, 4096),  # even length, production tap count
            (60000, 8191),   # odd taps near block_fft // 2 (block 1<<14)
            (60000, 8192),   # even taps exactly at block_fft // 2
        ],
    )
    def test_packed2_matches_fftconvolve_same(self, rng, n, taps):
        """The packed stereo overlap-save path (both channels through one c2c
        per block) must match scipy per channel, including odd lengths and
        taps right at the block-size boundary."""
        x = rng.randn(2, n)
        h = rng.randn(2, taps)
        expected = np.stack(
            [signal.fftconvolve(x[c], h[c], "same") for c in range(2)]
        )
        got = np.asarray(
            convolve._convolve_blocked_packed2(
                jnp.asarray(x), jnp.asarray(h), block_fft=1 << 14
            )
        )
        np.testing.assert_allclose(got, expected, rtol=1e-7, atol=1e-8)

    def test_packed2_chunked_map_branch(self, rng, monkeypatch):
        """Force the lax.map branch (nblocks > 2 * _CONV_CHUNK) that in
        production only long-form tracks reach, and check it is exact."""
        monkeypatch.setattr(convolve, "_CONV_CHUNK", 4)
        x = rng.randn(2, 120000)
        h = rng.randn(2, 1025)
        expected = np.stack(
            [signal.fftconvolve(x[c], h[c], "same") for c in range(2)]
        )
        got = np.asarray(
            convolve._convolve_blocked_packed2(
                jnp.asarray(x), jnp.asarray(h), block_fft=1 << 12
            )
        )
        np.testing.assert_allclose(got, expected, rtol=1e-7, atol=1e-8)

    def test_batch_dispatch_pairs_vs_fallback(self, rng, monkeypatch):
        """fft_convolve_same_batch routes stereo long inputs through the
        packed path and everything else through vmapped per-channel
        overlap-save — both must agree with scipy."""
        h = rng.randn(2, 513)
        for n in (2000, 90000):  # short single-FFT path and blocked path
            x = rng.randn(2, n)
            expected = np.stack(
                [signal.fftconvolve(x[c], h[c], "same") for c in range(2)]
            )
            got = np.asarray(
                convolve.fft_convolve_same_batch(
                    jnp.asarray(x), jnp.asarray(h), block_fft=1 << 13
                )
            )
            np.testing.assert_allclose(got, expected, rtol=1e-7, atol=1e-8)
        # 3-channel input cannot pack — per-channel fallback
        x3 = rng.randn(3, 90000)
        h3 = rng.randn(3, 513)
        expected = np.stack(
            [signal.fftconvolve(x3[c], h3[c], "same") for c in range(3)]
        )
        got = np.asarray(
            convolve.fft_convolve_same_batch(
                jnp.asarray(x3), jnp.asarray(h3), block_fft=1 << 13
            )
        )
        np.testing.assert_allclose(got, expected, rtol=1e-7, atol=1e-8)

    def test_packed2_chunk_boundary_exact_multiple(self, rng):
        """nblocks an exact multiple of the hop (no ragged tail block)."""
        taps = 129
        block = 1 << 12
        discard = -(-(taps - 1) // 128) * 128
        hop = block - discard
        n = 8 * hop - taps + 1  # full = 8 * hop exactly
        x = rng.randn(2, n)
        h = rng.randn(2, taps)
        expected = np.stack(
            [signal.fftconvolve(x[c], h[c], "same") for c in range(2)]
        )
        got = np.asarray(
            convolve._convolve_blocked_packed2(
                jnp.asarray(x), jnp.asarray(h), block_fft=block
            )
        )
        np.testing.assert_allclose(got, expected, rtol=1e-7, atol=1e-8)


class TestFlatAnalysisOps:
    def test_piece_rms_flat_matches_unfold(self, rng):
        from matchering_tpu.ops.basics import batch_rms, piece_rms_flat, unfold

        for n, piece, div in [(7938000, 610615, 13), (100000, 9999, 10), (50000, 50000, 1)]:
            x = jnp.asarray(rng.randn(n))
            expected = np.asarray(batch_rms(unfold(x, piece, div)))
            got = np.asarray(piece_rms_flat(x, piece, div))
            np.testing.assert_allclose(got, expected, rtol=1e-12)

    def test_masked_spectrum_flat_matches_unfold(self, rng):
        from matchering_tpu.ops.basics import unfold
        from matchering_tpu.ops.spectrum import (
            masked_average_spectrum,
            masked_average_spectrum_flat,
        )

        n, piece, div, fft_size = 8 * 3000, 2900, 8, 512
        x = jnp.asarray(rng.randn(n))
        mask = jnp.asarray((rng.rand(div) > 0.4).astype(np.float64))
        expected = np.asarray(
            masked_average_spectrum(unfold(x, piece, div), mask, fft_size)
        )
        got = np.asarray(masked_average_spectrum_flat(x, mask, piece, div, fft_size))
        np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-12)

    def test_hermitian_irfft_matches_native(self, rng):
        from unittest import mock

        from matchering_tpu.ops import fftpack

        spec = jnp.asarray(rng.randn(7, 129) + 1j * rng.randn(7, 129))
        expected = np.fft.irfft(np.asarray(spec), n=256, axis=-1)
        with mock.patch.object(fftpack, "_use_native_irfft", lambda: False):
            got = np.asarray(fftpack.irfft(spec, n=256, axis=-1))
        np.testing.assert_allclose(got, expected, atol=1e-12)

    def test_sequential_mega_scan_matches_parallel(self, rng):
        from matchering_tpu.ops import iir

        x = jnp.asarray(rng.randn(300000))
        filt = iir.butter1_coefficients(7.0, 44100)
        expected = np.asarray(iir.lfilter_first_order(filt, x))
        old = iir._SEQUENTIAL_LIMIT
        try:
            iir._SEQUENTIAL_LIMIT = 1 << 17
            got = np.asarray(iir.lfilter_first_order(filt, x))
        finally:
            iir._SEQUENTIAL_LIMIT = old
        np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-12)

    def test_ds_sequential_mega_scan_matches_parallel(self, rng):
        """The compensated f32 scan's sequential mega-block mode must equal
        its fully parallel form (same ds arithmetic, different blocking)."""
        from matchering_tpu.ops import iir

        x = jnp.asarray(rng.randn(300000).astype(np.float32))
        filt = iir.butter1_coefficients(7.0, 44100)  # pole ~0.999
        expected = np.asarray(iir.lfilter_first_order(filt, x))
        old = iir._SEQUENTIAL_LIMIT
        try:
            iir._SEQUENTIAL_LIMIT = 1 << 17
            got = np.asarray(iir.lfilter_first_order(filt, x))
        finally:
            iir._SEQUENTIAL_LIMIT = old
        np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-7)

    def test_longform_f32_holds_ds_accuracy(self, rng, snr):
        """VERDICT r1 item 2: a >=64M-sample float32 signal (above
        _SEQUENTIAL_LIMIT, i.e. the long-form mega-block mode) through the
        limiter's near-unit-pole hold and release filters must stay >100 dB
        vs the float64 oracle — the ds scan may not silently fall back to
        naive float32 (reference numerics: matchering/limiter/hyrax.py:61-75
        at any length)."""
        from matchering_tpu.ops import iir

        n = 1 << 26  # 67.1M samples ≈ 25 min at 44.1k — above the 2^25 limit
        x64 = rng.randn(n)
        x32 = jnp.asarray(x64.astype(np.float32))
        for cutoff in (7.0, 800.0 / 3000.0):
            filt = iir.butter1_coefficients(cutoff, 44100)
            assert abs(filt.pole) > iir._DS_POLE_THRESHOLD
            expected = signal.lfilter([filt.b0, filt.b1], [1.0, filt.a1], x64)
            got = np.asarray(iir.lfilter_first_order(filt, x32))
            assert got.dtype == np.float32
            measured = snr(expected, got)
            assert measured > 100.0, (cutoff, measured)


def test_ds_pole_powers_matches_float64():
    """The runtime outer-product ds pole powers (the HLO-literal fix) match
    direct float64 exponentiation to ~double precision."""
    from matchering_tpu.ops import iir

    pole = 0.9999623444444  # the limiter release regime
    for n in (1000, 40000, 100000):
        hi, lo = iir.ds_pole_powers(pole, n, jnp.float32)
        got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        want = np.float64(pole) ** np.arange(1, n + 1)
        rel = np.abs(got - want) / want
        assert rel.max() < 1e-12, (n, rel.max())


class TestPackedPairSpectrum:
    def test_matches_per_channel_form(self, rng):
        from matchering_tpu.ops.spectrum import (
            masked_average_spectrum_flat,
            masked_average_spectrum_flat_pair,
        )

        fft_size = 256
        piece, divs = 2000, 7
        n = piece * divs
        a = rng.randn(n)
        b = rng.randn(n)
        mask = (rng.rand(divs) > 0.4).astype(np.float64)
        want_a = np.asarray(
            masked_average_spectrum_flat(jnp.asarray(a), jnp.asarray(mask), piece, divs, fft_size)
        )
        want_b = np.asarray(
            masked_average_spectrum_flat(jnp.asarray(b), jnp.asarray(mask), piece, divs, fft_size)
        )
        got_a, got_b = masked_average_spectrum_flat_pair(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask), piece, divs, fft_size
        )
        np.testing.assert_allclose(np.asarray(got_a), want_a, rtol=1e-10, atol=1e-13)
        np.testing.assert_allclose(np.asarray(got_b), want_b, rtol=1e-10, atol=1e-13)

    def test_matches_scipy_stft_oracle(self, rng):
        """Direct parity with the reference's averaged |STFT| semantics
        (scipy boxcar frames, noverlap=0) for the packed pair form."""
        fft_size = 128
        piece, divs = 1000, 5
        n = piece * divs
        a = rng.randn(n)
        b = rng.randn(n)
        mask = np.array([1.0, 0.0, 1.0, 1.0, 0.0])

        def oracle(x):
            specs = []
            for p in range(divs):
                if mask[p] == 0:
                    continue
                seg = x[p * piece : p * piece + (piece // fft_size) * fft_size]
                fr = seg.reshape(-1, fft_size)
                specs.append(np.abs(np.fft.rfft(fr, axis=-1)) / fft_size)
            return np.concatenate(specs).mean(axis=0)

        from matchering_tpu.ops.spectrum import masked_average_spectrum_flat_pair

        got_a, got_b = masked_average_spectrum_flat_pair(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask), piece, divs, fft_size
        )
        np.testing.assert_allclose(np.asarray(got_a), oracle(a), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(got_b), oracle(b), rtol=1e-10)

    def test_dynamic_pair_matches_dynamic(self, rng):
        from matchering_tpu.ops.spectrum import (
            masked_average_spectrum_dynamic,
            masked_average_spectrum_dynamic_pair,
        )

        fft_size = 128
        div_max, fpp_max = 6, 9
        piece = jnp.asarray(1000)  # traced geometry: 7 full frames per piece
        n = 6 * 1000
        a = rng.randn(n)
        b = rng.randn(n)
        mask = np.array([1.0, 1.0, 0.0, 1.0, 0.0, 1.0])
        want_a = np.asarray(
            masked_average_spectrum_dynamic(
                jnp.asarray(a), jnp.asarray(mask), piece, div_max, fft_size, fpp_max
            )
        )
        want_b = np.asarray(
            masked_average_spectrum_dynamic(
                jnp.asarray(b), jnp.asarray(mask), piece, div_max, fft_size, fpp_max
            )
        )
        got_a, got_b = masked_average_spectrum_dynamic_pair(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask), piece, div_max,
            fft_size, fpp_max,
        )
        np.testing.assert_allclose(np.asarray(got_a), want_a, rtol=1e-10, atol=1e-13)
        np.testing.assert_allclose(np.asarray(got_b), want_b, rtol=1e-10, atol=1e-13)


class TestMemoryBoundDispatch:
    """Pin the r5 memory-bound routing decisions: the packed FFT forms OOMed
    a 16 GB chip at 60-min 96 kHz scale (compile-time for the conv un-pack
    transpose, runtime for the spectra working set), so both dispatchers
    must fall back per-channel past their bounds."""

    def test_conv_packs_below_total_limit_only(self, rng, monkeypatch):
        calls = []
        orig = convolve._convolve_blocked_packed2

        def spy(signals, firs, block_fft):
            calls.append(block_fft)
            return orig(signals, firs, block_fft)

        monkeypatch.setattr(convolve, "_convolve_blocked_packed2", spy)
        h = jnp.asarray(rng.randn(2, 513))

        x = jnp.asarray(rng.randn(2, 100_000))
        convolve.fft_convolve_same_batch(x, h)
        assert calls == [convolve._PACKED_BLOCK]  # packed, at its own default

        calls.clear()
        big_n = convolve._PACKED_TOTAL_LIMIT + 10  # past the HBM bound
        big = jax.ShapeDtypeStruct((2, big_n), jnp.float32)
        hs = jax.ShapeDtypeStruct((2, 4096), jnp.float32)
        jax.eval_shape(convolve.fft_convolve_same_batch, big, hs)
        assert calls == []  # long-form routes per-channel

    def test_spectra_pack_below_limit_only(self):
        import matchering_tpu as mg
        from matchering_tpu import stages
        from matchering_tpu.ops import spectrum as spec_mod

        config = mg.Config()
        calls = []
        orig = spec_mod.masked_average_spectrum_flat_pair

        def spy(*a, **k):
            calls.append("packed")
            return orig(*a, **k)

        import unittest.mock as mock

        with mock.patch.object(spec_mod, "masked_average_spectrum_flat_pair", spy):
            with mock.patch.object(
                stages.spectrum, "masked_average_spectrum_flat_pair", spy
            ):
                n_small = 60 * 44100
                div = stages._Division.static(n_small, config.max_piece_size)
                x = jax.ShapeDtypeStruct((n_small,), jnp.float32)
                m = jax.ShapeDtypeStruct((div.divisions,), jnp.float32)
                jax.eval_shape(
                    lambda a, b, mm: stages._masked_spectrum_pair(a, b, mm, div, config),
                    x, x, m,
                )
                assert calls == ["packed"]

                calls.clear()
                n_big = 60 * 60 * 96000  # the 60-min 96 kHz shape
                cfg96 = mg.Config(internal_sample_rate=96000, max_length=2 * 3600)
                div_big = stages._Division.static(n_big, cfg96.max_piece_size)
                xb = jax.ShapeDtypeStruct((n_big,), jnp.float32)
                mb = jax.ShapeDtypeStruct((div_big.divisions,), jnp.float32)
                jax.eval_shape(
                    lambda a, b, mm: stages._masked_spectrum_pair(a, b, mm, div_big, cfg96),
                    xb, xb, mb,
                )
                assert calls == []  # long-form routes per-channel


class TestPoleGate:
    """The r5 pole-distance gate: compensation only engages near the unit
    circle — the limiter's hold pole runs plain, its release pole refine."""

    def test_gates_hold_not_release(self):
        hold = iir.butter1_coefficients(7.0, 44100)
        release = iir.butter1_coefficients(800.0 / 3000.0, 44100)
        assert iir._plain_suffices(hold.pole)
        assert not iir._plain_suffices(release.pole)

    def test_env_opt_out(self, monkeypatch):
        monkeypatch.setenv("MATCHERING_TPU_DS_POLE_GATE", "0")
        hold = iir.butter1_coefficients(7.0, 44100)
        assert not iir._plain_suffices(hold.pole)

    def test_gated_scan_matches_f64(self, rng):
        """The gated (plain) path at the hold pole must still track the
        exact recurrence to well beyond audio precision."""
        from scipy import signal as ssignal

        pole = iir.butter1_coefficients(7.0, 44100).pole
        d = (0.02 + 0.01 * np.abs(rng.randn(200000))).astype(np.float32)
        want = ssignal.lfilter([1.0], [1.0, -pole], d.astype(np.float64))
        hi, lo = jax.jit(
            lambda h: iir.scan_first_order_ds(h, jnp.zeros_like(h), pole)
        )(jnp.asarray(d))
        got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        err = want - got
        snr = 10 * np.log10(np.sum(want**2) / np.sum(err**2))
        assert snr > 120.0, snr
