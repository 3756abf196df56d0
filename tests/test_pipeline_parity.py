"""End-to-end parity: our jitted mastering graph vs the reference pipeline.

The reference (sergree/matchering, mounted read-only) is executed as a
black-box float64 oracle via the ``reference_matchering`` fixture; our
pipeline runs in float64 on CPU.  The acceptance gate is SNR of our rendered
variants against the oracle's (BASELINE.md: "mastered WAVs within reference
SNR bound").
"""

import numpy as np
import pytest

import matchering_tpu as mg


def make_track(rng, seconds, sr=44100, kind="target"):
    """Synthetic but music-like stereo material: amplitude-modulated sweeps +
    noise so piecewise RMS statistics and spectra are non-trivial."""
    n = int(seconds * sr)
    t = np.arange(n) / sr
    if kind == "target":
        base = 0.22 * np.sin(2 * np.pi * 220 * t) + 0.1 * np.sin(
            2 * np.pi * (900 + 140 * np.sin(2 * np.pi * 0.1 * t)) * t
        )
        noise = 0.04 * rng.randn(n)
        left = base + noise
        right = 0.8 * base + 0.05 * rng.randn(n) + 0.06 * np.sin(2 * np.pi * 55 * t)
    else:
        base = 0.5 * np.sin(2 * np.pi * 180 * t) + 0.25 * np.sin(2 * np.pi * 2500 * t)
        noise = 0.08 * rng.randn(n)
        left = base + noise
        right = base - 0.5 * noise + 0.1 * np.sin(2 * np.pi * 95 * t)
    # slow loudness envelope so "loudest pieces" selection is meaningful
    env = 0.55 + 0.45 * np.sin(2 * np.pi * t / max(seconds, 1e-9) * 1.7) ** 2
    track = np.stack([left * env, right * env], axis=1)
    peak = np.abs(track).max()
    return (track / peak * (0.72 if kind == "target" else 0.93)).astype(np.float64)


@pytest.fixture(scope="module")
def tracks():
    rng = np.random.RandomState(1234)
    return make_track(rng, 20.0, kind="target"), make_track(rng, 17.0, kind="ref")


def run_ours(target, reference, config, **needs):
    out = mg.master_graph(target, reference, config, **needs)
    return out


class TestMasterParity:
    def test_full_chain_default_variant(self, tracks, reference_matchering, snr):
        target, reference = tracks
        ref_cfg = reference_matchering.Config()
        ref_result, _, _ = reference_matchering.stages.main(
            target.copy(), reference.copy(), ref_cfg, True, False, False
        )

        cfg = mg.Config(dtype="float64")
        ours = run_ours(target, reference, cfg, need_default=True)
        got = np.asarray(ours.result)

        assert got.shape == ref_result.shape
        value = snr(ref_result, got)
        assert value > 70.0, f"limited variant SNR too low: {value:.1f} dB"

    def test_no_limiter_variants(self, tracks, reference_matchering, snr):
        target, reference = tracks
        ref_cfg = reference_matchering.Config()
        _, ref_nl, ref_nln = reference_matchering.stages.main(
            target.copy(), reference.copy(), ref_cfg, False, True, True
        )

        cfg = mg.Config(dtype="float64")
        ours = run_ours(
            target,
            reference,
            cfg,
            need_default=False,
            need_no_limiter=True,
            need_no_limiter_normalized=True,
        )
        v1 = snr(ref_nl, np.asarray(ours.result_no_limiter))
        v2 = snr(ref_nln, np.asarray(ours.result_no_limiter_normalized))
        assert v1 > 70.0, f"no-limiter SNR {v1:.1f} dB"
        assert v2 > 70.0, f"no-limiter-normalized SNR {v2:.1f} dB"

    def test_nondefault_config_sweep(self, tracks, reference_matchering, snr):
        """edited_config.py-style sweep: fft size / threshold / lowess."""
        target, reference = tracks
        ref_cfg = reference_matchering.Config(
            fft_size=8192, threshold=0.9, lowess_frac=0.06
        )
        ref_result, _, _ = reference_matchering.stages.main(
            target.copy(), reference.copy(), ref_cfg, True, False, False
        )
        cfg = mg.Config(dtype="float64", fft_size=8192, threshold=0.9, lowess_frac=0.06)
        ours = run_ours(target, reference, cfg, need_default=True)
        value = snr(ref_result, np.asarray(ours.result))
        assert value > 70.0, f"sweep SNR {value:.1f} dB"


class TestLimiterParity:
    def test_limiter_standalone(self, reference_matchering, snr):
        rng = np.random.RandomState(7)
        sr = 44100
        t = np.arange(6 * sr) / sr
        envelope = 1.0 + 0.4 * np.sin(2 * np.pi * 0.5 * t)
        wave = np.sin(2 * np.pi * 440 * t) * envelope
        array = np.stack([wave, 0.9 * wave + 0.02 * rng.randn(t.size)], axis=1)

        ref_cfg = reference_matchering.Config()
        expected = reference_matchering.limiter.limit(array.copy(), ref_cfg)

        got = np.asarray(mg.limit(array, mg.Config(dtype="float64")))
        value = snr(expected, got)
        assert value > 80.0, f"limiter SNR {value:.1f} dB"

    def test_limiter_passthrough_below_threshold(self, reference_matchering):
        rng = np.random.RandomState(3)
        array = 0.4 * rng.randn(44100, 2).clip(-1, 1) * 0.5
        got = np.asarray(mg.limit(array, mg.Config(dtype="float64")))
        np.testing.assert_allclose(got, array, atol=0.0)

    def test_limiter_high_order_filters(self, reference_matchering, snr):
        """Non-default Butterworth orders run through the SOS cascade path."""
        sr = 44100
        t = np.arange(3 * sr) / sr
        wave = 1.2 * np.sin(2 * np.pi * 440 * t) * (1 + 0.3 * np.sin(2 * np.pi * t))
        array = np.stack([wave, wave], axis=1)

        lim = dict(hold_filter_order=2, release_filter_order=2)
        ref_cfg = reference_matchering.Config(
            limiter=reference_matchering.defaults.LimiterConfig(**lim)
        )
        expected = reference_matchering.limiter.limit(array.copy(), ref_cfg)
        got = np.asarray(
            mg.limit(array, mg.Config(dtype="float64", limiter=mg.LimiterConfig(**lim)))
        )
        value = snr(expected, got)
        assert value > 70.0, f"order-2 limiter SNR {value:.1f} dB"


class TestLowessParity:
    def test_ops_lowess_matches_oracle(self, snr):
        import oracle_lowess

        from matchering_tpu.ops import lowess as jlowess

        rng = np.random.RandomState(11)
        n = 8193
        y = np.cumsum(rng.randn(n)) / 40.0 + np.sin(np.linspace(0, 20, n))
        expected = oracle_lowess.lowess(
            y, np.linspace(0, 1, n), frac=0.0375, it=0, delta=0.001
        )[:, 1]
        import jax.numpy as jnp

        got = np.asarray(jlowess.smooth(jnp.asarray(y), 0.0375, 0, 0.001))
        value = snr(expected, got)
        assert value > 100.0, f"lowess SNR {value:.1f} dB"


class TestConfigSweep:
    """edited_config.py-style sweep breadth (BASELINE.md: 'SNR bound vs
    reference across configs')."""

    @pytest.mark.parametrize(
        "kwargs",
        [
            dict(fft_size=2048),
            dict(lin_log_oversampling=2),
            dict(rms_correction_steps=2),
            dict(lowess_it=1),
            dict(threshold=0.7079),
        ],
        ids=["fft2048", "oversample2", "rms2", "lowess_it1", "threshold-3db"],
    )
    def test_sweep_case(self, tracks, reference_matchering, snr, kwargs):
        target, reference = tracks
        ref_cfg = reference_matchering.Config(**kwargs)
        ref_result, _, _ = reference_matchering.stages.main(
            target.copy(), reference.copy(), ref_cfg, True, False, False
        )
        cfg = mg.Config(dtype="float64", **kwargs)
        ours = run_ours(target, reference, cfg, need_default=True)
        value = snr(ref_result, np.asarray(ours.result))
        assert value > 70.0, f"{kwargs} SNR {value:.1f} dB"

    def test_custom_limiter_times(self, tracks, reference_matchering, snr):
        target, reference = tracks
        lim = dict(attack=2.0, hold=0.5, release=1500.0)
        ref_cfg = reference_matchering.Config(
            limiter=reference_matchering.defaults.LimiterConfig(**lim)
        )
        ref_result, _, _ = reference_matchering.stages.main(
            target.copy(), reference.copy(), ref_cfg, True, False, False
        )
        cfg = mg.Config(dtype="float64", limiter=mg.LimiterConfig(**lim))
        ours = run_ours(target, reference, cfg, need_default=True)
        value = snr(ref_result, np.asarray(ours.result))
        assert value > 70.0, f"custom limiter SNR {value:.1f} dB"


class TestProcessErrors:
    def test_empty_results(self, tmp_path):
        with pytest.raises(RuntimeError, match="empty"):
            mg.process("a.wav", "b.wav", [])

    def test_missing_file_raises_coded_error(self, tmp_path):
        out = mg.pcm16(str(tmp_path / "out.wav"))
        with pytest.raises(mg.ModuleError):
            mg.process(str(tmp_path / "missing.wav"), str(tmp_path / "m2.wav"), [out])

    def test_equal_inputs_rejected(self, tmp_path):
        from matchering_tpu.io import wav as wavio

        rng = np.random.RandomState(0)
        x = np.clip(rng.randn(50000, 2) * 0.3, -1, 1)
        p1, p2 = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
        wavio.write(p1, x, 44100, "FLOAT")
        wavio.write(p2, x, 44100, "FLOAT")
        with pytest.raises(mg.ModuleError):
            mg.process(p1, p2, [mg.pcm16(str(tmp_path / "out.wav"))])


class TestEdgeLengths:
    @pytest.mark.parametrize("seconds", [0.2, 1.0])
    def test_short_tracks(self, reference_matchering, snr, seconds):
        """Tracks barely above fft_size: divisions=1, single analysis piece."""
        rng = np.random.RandomState(77)
        target = make_track(rng, seconds, kind="target")
        reference = make_track(rng, seconds + 0.13, kind="ref")
        ref_cfg = reference_matchering.Config()
        ref_result, _, _ = reference_matchering.stages.main(
            target.copy(), reference.copy(), ref_cfg, True, False, False
        )
        cfg = mg.Config(dtype="float64")
        ours = run_ours(target, reference, cfg, need_default=True)
        value = snr(ref_result, np.asarray(ours.result))
        assert value > 70.0, f"short track ({seconds}s) SNR {value:.1f} dB"

    def test_exact_piece_multiple(self, reference_matchering, snr):
        """Length exactly k * max_piece_size hits the divisions=k+1 branch."""
        rng = np.random.RandomState(78)
        target = make_track(rng, 30.0, kind="target")[: 2 * 661500]
        reference = make_track(rng, 17.0, kind="ref")
        ref_cfg = reference_matchering.Config()
        ref_result, _, _ = reference_matchering.stages.main(
            target.copy(), reference.copy(), ref_cfg, True, False, False
        )
        cfg = mg.Config(dtype="float64")
        ours = run_ours(target, reference, cfg, need_default=True)
        value = snr(ref_result, np.asarray(ours.result))
        assert value > 70.0, f"exact-multiple SNR {value:.1f} dB"


class TestUntestedKnobs:
    """VERDICT r3 item 7: `lowess_exact` and non-default internal sample
    rates were config surface without coverage."""

    def test_lowess_exact_matches_oracle_delta_zero(
        self, tracks, reference_matchering, snr
    ):
        """`lowess_exact=True` computes LOWESS at every grid point — the
        reference equivalent is `lowess_delta=0` (`matchering/defaults.py:77`,
        `dsp.py:103-106`)."""
        target, reference = tracks
        ref_cfg = reference_matchering.Config(lowess_delta=0.0)
        ref_result, _, _ = reference_matchering.stages.main(
            target.copy(), reference.copy(), ref_cfg, True, False, False
        )
        cfg = mg.Config(dtype="float64", lowess_exact=True)
        ours = run_ours(target, reference, cfg, need_default=True)
        value = snr(ref_result, np.asarray(ours.result))
        assert value > 70.0, f"lowess_exact SNR {value:.1f} dB"

    def test_lowess_exact_close_to_delta_path(self, tracks, snr):
        """delta-skipping is an approximation of the exact fit: the two
        full-chain outputs must agree closely (the delta interpolation error
        is far below the matching tolerances)."""
        target, reference = tracks
        exact = run_ours(
            target, reference, mg.Config(dtype="float64", lowess_exact=True),
            need_default=True,
        )
        approx = run_ours(
            target, reference, mg.Config(dtype="float64"), need_default=True
        )
        value = snr(np.asarray(exact.result), np.asarray(approx.result))
        assert value > 40.0, f"exact vs delta paths diverged: {value:.1f} dB"

    def test_internal_sample_rate_48k_full_chain(self, reference_matchering, snr):
        """Full-chain oracle parity at `internal_sample_rate=48000`
        (`matchering/defaults.py:64`): every grid (piece sizes, FFT bins,
        limiter time constants) re-parameterizes on the internal rate.
        Tracks are generated at 48 kHz so neither side needs to resample
        (the oracle's resampy is a raising stub)."""
        rng = np.random.RandomState(4242)
        target = make_track(rng, 15.0, sr=48000, kind="target")
        reference = make_track(rng, 13.0, sr=48000, kind="ref")
        ref_cfg = reference_matchering.Config(internal_sample_rate=48000)
        ref_result, _, _ = reference_matchering.stages.main(
            target.copy(), reference.copy(), ref_cfg, True, False, False
        )
        cfg = mg.Config(dtype="float64", internal_sample_rate=48000)
        ours = run_ours(target, reference, cfg, need_default=True)
        value = snr(ref_result, np.asarray(ours.result))
        assert value > 70.0, f"48k internal SNR {value:.1f} dB"
