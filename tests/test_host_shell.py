"""Host-shell coverage: codecs, loader/saver, resampler, checker, preview,
config validation, results — the reference's L4/L5 surface (SURVEY.md §1).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import matchering_tpu as mg
from matchering_tpu.io import aiff, codecs, wav
from matchering_tpu.io.native import binding as native
from matchering_tpu.ops import resample as rs


class TestWavCodec:
    @pytest.mark.parametrize(
        "subtype,tol",
        [
            ("PCM_16", 2**-15),
            ("PCM_24", 2**-23),
            ("PCM_32", 2**-31),
            ("FLOAT", 1e-7),
            ("DOUBLE", 0.0),
        ],
    )
    def test_roundtrip(self, tmp_path, rng, subtype, tol):
        x = np.clip(rng.randn(1000, 2) * 0.3, -1, 1)
        path = str(tmp_path / "rt.wav")
        wav.write(path, x, 44100, subtype)
        y, sr = wav.read(path)
        assert sr == 44100 and y.shape == x.shape
        assert np.abs(y - x).max() <= tol + 1e-12

    def test_native_matches_numpy(self, tmp_path, rng):
        if not native.available():
            pytest.skip("native codec not built")
        x = np.clip(rng.randn(777, 2) * 0.5, -1, 1)
        path = str(tmp_path / "n.wav")
        for subtype in ("PCM_16", "PCM_24", "PCM_32", "FLOAT"):
            native.write_wav(path, np.ascontiguousarray(x), 44100, subtype)
            y_native, sr1 = native.read_wav(path)
            y_numpy, sr2 = wav.read(path)
            assert sr1 == sr2 == 44100
            np.testing.assert_array_equal(y_native, y_numpy)

    def test_mono_and_unknown_format(self, tmp_path, rng):
        x = np.clip(rng.randn(500, 1) * 0.3, -1, 1)
        path = str(tmp_path / "m.wav")
        wav.write(path, x, 22050, "PCM_16")
        y, sr = codecs.read(path)
        assert y.shape == (500, 1) and sr == 22050

        bad = str(tmp_path / "bad.bin")
        with open(bad, "wb") as f:
            f.write(b"\x12" * 64)
        with pytest.raises(RuntimeError, match="unknown format"):
            codecs.read(bad)


class TestAiffCodec:
    @pytest.mark.parametrize("subtype", ["PCM_16", "PCM_24", "PCM_32"])
    def test_roundtrip(self, tmp_path, rng, subtype):
        x = np.clip(rng.randn(640, 2) * 0.4, -1, 1)
        path = str(tmp_path / "rt.aiff")
        aiff.write(path, x, 48000, subtype)
        y, sr = aiff.read(path)
        assert sr == 48000
        assert np.abs(y - x).max() < 2**-14


class TestResults:
    def test_pcm_helpers(self, tmp_path):
        r = mg.pcm16(str(tmp_path / "a.wav"))
        assert r.subtype == "PCM_16" and r.use_limiter and r.normalize
        assert mg.pcm24(str(tmp_path / "b.wav")).subtype == "PCM_24"
        with pytest.raises(TypeError):
            mg.Result(str(tmp_path / "c.xyz"), "PCM_16")
        with pytest.raises(TypeError):
            mg.Result(str(tmp_path / "d.wav"), "NOT_A_SUBTYPE")


class TestConfigValidation:
    @pytest.mark.parametrize(
        "kwargs",
        [
            dict(fft_size=1000),
            dict(threshold=1.5),
            dict(min_value=0.5),
            dict(max_piece_size=0.01),
            dict(lowess_frac=0.0),
            dict(rms_correction_steps=-1),
        ],
    )
    def test_rejects(self, kwargs):
        with pytest.raises(ValueError):
            mg.Config(**kwargs)

    def test_seconds_to_samples_baking(self):
        cfg = mg.Config()
        assert cfg.max_piece_size == 15 * 44100
        assert cfg.preview_size == 30 * 44100
        assert cfg.preview_fade_size == 44100


def resampy_oracle(x, sr_orig, sr_new):
    """Direct float64 per-output-sample evaluation of the resampy 0.4.2
    kaiser_best algorithm (the reference's resampler, ``checker.py:42``) —
    written from the published algorithm, used only as a test oracle."""
    interp_win, interp_delta = rs._half_window()
    num_bits = 2**rs._PRECISION
    scale = min(1.0, sr_new / sr_orig)
    if scale < 1.0:
        interp_win = interp_win * scale
        interp_delta = interp_delta * scale
    index_step = int(scale * num_bits)
    nwin = interp_win.shape[0]
    n_out = int(np.ceil(x.shape[0] * sr_new / sr_orig))
    time_increment = sr_orig / sr_new
    y = np.zeros((n_out,) + x.shape[1:])
    n_orig = x.shape[0]
    for t in range(n_out):
        time_register = t * time_increment
        n = int(time_register)
        frac = scale * (time_register - n)
        index_frac = frac * num_bits
        offset = int(index_frac)
        eta = index_frac - offset
        i_max = min(n + 1, (nwin - offset) // index_step)
        for i in range(i_max):
            weight = interp_win[offset + i * index_step] + eta * interp_delta[
                offset + i * index_step
            ]
            y[t] += weight * x[n - i]
        frac = scale - frac
        index_frac = frac * num_bits
        offset = int(index_frac)
        eta = index_frac - offset
        k_max = min(n_orig - n - 1, (nwin - offset) // index_step)
        for k in range(k_max):
            weight = interp_win[offset + k * index_step] + eta * interp_delta[
                offset + k * index_step
            ]
            y[t] += weight * x[n + k + 1]
    return y


class TestResample:
    @pytest.mark.parametrize("sr_pair", [(48000, 44100), (22050, 44100), (44100, 96000)])
    def test_matches_resampy_algorithm(self, rng, snr, sr_pair):
        sr_in, sr_out = sr_pair
        x = rng.randn(4000, 2) * 0.5
        expected = resampy_oracle(x, sr_in, sr_out)
        got = np.asarray(rs.resample(x.astype(np.float64), sr_in, sr_out))
        assert got.shape == expected.shape
        value = snr(expected, got)
        assert value > 90.0, f"resample SNR {value:.1f} dB"

    def test_identity(self, rng):
        x = rng.randn(100, 2)
        assert rs.resample(x, 44100, 44100) is x

    def test_near_coprime_ratio_bounded_memory(self, rng, snr):
        """VERDICT r1 item 9: 44100 -> 44101 must not materialize the
        (44101 x ~44000) polyphase plan; the windowed fallback stays exact
        vs the direct oracle."""
        assert rs._plan_bytes(44100, 44101) > rs._PLAN_BYTES_CAP
        x = rng.randn(4000, 2) * 0.5
        expected = resampy_oracle(x, 44100, 44101)
        got = np.asarray(rs.resample(jnp.asarray(x), 44100, 44101))
        assert got.shape == expected.shape
        value = snr(expected, got)
        assert value > 120.0, f"windowed resample SNR {value:.1f} dB"

    def test_windowed_path_matches_plan_path(self, rng, snr):
        """Both execution paths implement the same arithmetic: force the
        windowed path onto a normal ratio and compare with the MXU plan."""
        x = rng.randn(3000, 2) * 0.5
        plan_out = np.asarray(rs.resample(jnp.asarray(x), 22050, 44100))
        win_out = rs._resample_windowed(x, 22050, 44100)
        assert plan_out.shape == win_out.shape
        value = snr(win_out, plan_out)
        assert value > 110.0, value

    def test_sine_preservation(self, snr):
        sr_in, sr_out = 48000, 44100
        t = np.arange(sr_in) / sr_in
        x = np.sin(2 * np.pi * 1000 * t)[:, None]
        y = np.asarray(rs.resample(x, sr_in, sr_out))[:, 0]
        t_out = np.arange(y.shape[0]) / sr_out
        expected = np.sin(2 * np.pi * 1000 * t_out)
        margin = 200  # ignore edge transients
        value = snr(expected[margin:-margin], y[margin:-margin])
        assert value > 60.0, f"sine through resampler SNR {value:.1f} dB"


class TestChecker:
    def test_mono_to_stereo_and_limits(self):
        cfg = mg.Config()
        mono = np.zeros((50000, 1))
        out, sr = mg.check(mono, 44100, cfg, "target")
        assert out.shape == (50000, 2) and sr == 44100

        with pytest.raises(mg.ModuleError):
            mg.check(np.zeros((100, 2)), 44100, cfg, "target")  # too short
        with pytest.raises(mg.ModuleError):
            mg.check(np.zeros((50000, 3)), 44100, cfg, "reference")  # 3 ch
        long = np.zeros((int(cfg.max_length * 44100) + 1, 2))
        with pytest.raises(mg.ModuleError):
            mg.check(long, 44100, cfg, "target")

    def test_resamples_to_internal_rate(self):
        cfg = mg.Config()
        x = np.random.RandomState(0).randn(48000, 2) * 0.1
        out, sr = mg.check(x, 48000, cfg, "reference")
        assert sr == 44100
        assert out.shape[0] == int(np.ceil(48000 * 44100 / 48000))

    def test_equality_check(self):
        x = np.random.RandomState(0).randn(9000, 2)
        with pytest.raises(mg.ModuleError):
            mg.check_equality(x, x.copy())
        mg.check_equality(x, x + 1e-3)  # different -> fine


class TestPreviewParity:
    def test_matches_reference(self, reference_matchering, monkeypatch, snr):
        from test_pipeline_parity import make_track

        rng = np.random.RandomState(21)
        target = make_track(rng, 95.0, kind="target")
        result = make_track(rng, 95.0, kind="ref") * 0.9

        captured_ref = {}
        monkeypatch.setattr(
            reference_matchering.preview_creator,
            "save",
            lambda file, piece, sr, subtype, name="x": captured_ref.__setitem__(
                name, np.array(piece)
            ),
        )
        ref_cfg = reference_matchering.Config()
        pt = reference_matchering.pcm16("/tmp/_pt.wav")
        pr = reference_matchering.pcm16("/tmp/_pr.wav")
        reference_matchering.preview_creator.create_preview(
            target.copy(), result.copy(), ref_cfg, pt, pr
        )

        captured = {}
        import matchering_tpu.preview as prev

        monkeypatch.setattr(
            prev,
            "save",
            lambda file, piece, sr, subtype, name="x": captured.__setitem__(
                name, np.array(piece)
            ),
        )
        cfg = mg.Config(dtype="float64")
        prev.create_preview(target, result, cfg, mg.pcm16("/tmp/_pt2.wav"), mg.pcm16("/tmp/_pr2.wav"))

        for ref_key, our_key in [
            ("target preview", "target preview"),
            ("result preview", "result preview"),
        ]:
            expected = captured_ref[ref_key]
            got = captured[our_key]
            assert got.shape == expected.shape
            value = snr(expected, got)
            assert value > 100.0, f"{ref_key} SNR {value:.1f} dB"


class TestBatchPath:
    def test_master_batch_matches_single(self, snr):
        from test_pipeline_parity import make_track

        import jax

        from matchering_tpu.parallel import batch as pbatch

        rng = np.random.RandomState(31)
        t1 = make_track(rng, 8.0, kind="target")
        t2 = make_track(rng, 8.0, kind="target") * 0.7
        r1 = make_track(rng, 8.0, kind="ref")
        r2 = make_track(rng, 8.0, kind="ref") * 0.8
        cfg = mg.Config(dtype="float64")

        out = pbatch.master_batch(
            np.stack([t1, t2]), np.stack([r1, r2]), cfg, need_default=True
        )
        for i, (t, r) in enumerate([(t1, r1), (t2, r2)]):
            single = mg.master_graph(t, r, cfg, need_default=True)
            value = snr(np.asarray(single.result), np.asarray(out.result[i]))
            assert value > 140.0, f"pair {i} SNR {value:.1f} dB"


class TestFlacCodec:
    @pytest.mark.parametrize("subtype,tol", [("PCM_16", 2**-15), ("PCM_24", 2**-23)])
    def test_roundtrip(self, tmp_path, rng, subtype, tol):
        if not native.available():
            pytest.skip("native codec not built")
        x = np.clip(rng.randn(9000, 2) * 0.4, -1, 1)
        path = str(tmp_path / "rt.flac")
        native.write_flac(path, x, 48000, subtype)
        y, sr = codecs.read(path)
        assert sr == 48000 and y.shape == x.shape
        assert np.abs(y - x).max() <= tol + 1e-12

    def test_result_descriptor_accepts_flac(self, tmp_path):
        if not native.available():
            pytest.skip("native codec not built")
        r = mg.Result(str(tmp_path / "out.flac"), "PCM_24", use_limiter=False)
        assert r.subtype == "PCM_24"

    def test_smaller_than_raw_for_tonal_audio(self, tmp_path):
        if not native.available():
            pytest.skip("native codec not built")
        import os

        t = np.arange(44100) / 44100.0
        x = np.stack([0.5 * np.sin(2 * np.pi * 440 * t)] * 2, axis=1)
        path = str(tmp_path / "sine.flac")
        native.write_flac(path, x, 44100, "PCM_16")
        assert os.path.getsize(path) < x.size * 2 * 0.5
        y, _ = codecs.read(path)
        assert np.abs(y - x).max() <= 2**-15 + 1e-12

    def test_mono_and_odd_length(self, tmp_path, rng):
        if not native.available():
            pytest.skip("native codec not built")
        x = np.clip(rng.randn(4097, 1) * 0.3, -1, 1)  # crosses a frame boundary
        path = str(tmp_path / "m.flac")
        native.write_flac(path, x, 22050, "PCM_16")
        y, sr = codecs.read(path)
        assert sr == 22050 and y.shape == (4097, 1)
        assert np.abs(y - x).max() <= 2**-15 + 1e-12


class TestAifcFloat:
    def test_float_roundtrip_preserves_over_0db(self, tmp_path, rng):
        x = rng.randn(4000, 2) * 1.5  # deliberately exceeds full scale
        path = str(tmp_path / "f.aiff")
        aiff.write(path, x, 44100, "FLOAT")
        y, sr = codecs.read(path)
        assert sr == 44100
        np.testing.assert_allclose(y, x, atol=1e-6)
        assert np.abs(y).max() > 1.0  # float samples are not clipped


class TestCompileCacheDefault:
    """The persistent compile cache must be on by default for plain library
    entry points (the reference has no compile step — cold-start parity),
    with an env opt-out and respect for a user-configured cache dir."""

    def _reset(self, monkeypatch):
        import jax

        from matchering_tpu import utils

        monkeypatch.setattr(utils, "_compile_cache_checked", False)
        monkeypatch.delenv("MATCHERING_TPU_NO_COMPILE_CACHE", raising=False)
        monkeypatch.delenv("MATCHERING_TPU_CACHE_DIR", raising=False)
        return jax, utils

    def test_default_on(self, monkeypatch):
        jax, utils = self._reset(monkeypatch)
        prior = jax.config.jax_compilation_cache_dir
        jax.config.update("jax_compilation_cache_dir", None)
        try:
            utils.ensure_compile_cache()
            assert jax.config.jax_compilation_cache_dir
        finally:
            jax.config.update("jax_compilation_cache_dir", prior)

    def test_env_opt_out(self, monkeypatch):
        jax, utils = self._reset(monkeypatch)
        monkeypatch.setenv("MATCHERING_TPU_NO_COMPILE_CACHE", "1")
        prior = jax.config.jax_compilation_cache_dir
        jax.config.update("jax_compilation_cache_dir", None)
        try:
            utils.ensure_compile_cache()
            assert jax.config.jax_compilation_cache_dir is None
        finally:
            jax.config.update("jax_compilation_cache_dir", prior)

    def test_respects_user_cache_dir(self, monkeypatch, tmp_path):
        jax, utils = self._reset(monkeypatch)
        prior = jax.config.jax_compilation_cache_dir
        user = str(tmp_path / "user_cache")
        jax.config.update("jax_compilation_cache_dir", user)
        try:
            utils.ensure_compile_cache()
            assert jax.config.jax_compilation_cache_dir == user
        finally:
            jax.config.update("jax_compilation_cache_dir", prior)

    def test_process_configures_cache(self, monkeypatch, tmp_path, rng):
        """A plain ``mg.process()`` run configures the cache — no bench
        script needed (VERDICT r3 weak item 4)."""
        jax, utils = self._reset(monkeypatch)
        calls = []
        monkeypatch.setattr(
            utils, "enable_compile_cache", lambda *a, **k: calls.append(a)
        )
        # earlier suite tests legitimately leave the cache configured — this
        # test asserts the fresh-process behavior, so start unconfigured
        prior = jax.config.jax_compilation_cache_dir
        jax.config.update("jax_compilation_cache_dir", None)
        n = 44100
        t = str(tmp_path / "t.wav")
        r = str(tmp_path / "r.wav")
        wav.write(t, np.clip(rng.randn(n, 2) * 0.1, -1, 1), 44100, "FLOAT")
        wav.write(r, np.clip(rng.randn(n, 2) * 0.5, -1, 1), 44100, "FLOAT")
        try:
            mg.process(t, r, [mg.pcm16(str(tmp_path / "out.wav"))], mg.Config())
        finally:
            jax.config.update("jax_compilation_cache_dir", prior)
        assert calls, "process() never configured the persistent compile cache"


class TestStageTimingDebug:
    def test_main_emits_wall_clock_line(self, rng):
        """Runtime stage-timing parity with the reference's convolution
        timer (``match_frequencies.py:111-114``): a debug handler must see
        one wall-clock line for the fused mastering dispatch."""
        from matchering_tpu import stages

        lines = []
        mg.log(debug_handler=lines.append)
        try:
            n = 3 * 44100
            target = jnp.asarray(rng.randn(n, 2) * 0.1)
            reference = jnp.asarray(np.clip(rng.randn(n, 2) * 0.5, -0.9, 0.9))
            stages.main(target, reference, mg.Config(max_piece_size=1.0))
        finally:
            mg.log()
        timing = [l for l in lines if "took" in str(l) and " s" in str(l)]
        assert timing, f"no timing debug line in {lines!r}"
