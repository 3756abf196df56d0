"""Production-dtype quality gates (VERDICT r1 item 7).

The TPU runs the chain in float32; the suite must pin its quality against
the float64 oracle on CPU — not leave it to manual TPU drives.  bfloat16 is
deliberately not a config option (XLA's RFFT rejects it and an 8-bit
mantissa is ~40 dB — far below audio quality); the config test pins the
rejection.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import matchering_tpu as mg


@pytest.fixture(scope="module")
def pair():
    sr = 44100
    n = 60 * sr
    r = np.random.RandomState(5)
    env = 0.5 + 0.5 * np.sin(np.arange(n) / sr * 1.3)[:, None]
    target = np.clip(0.25 * r.randn(n, 2) * env, -1, 1)
    reference = np.clip(0.85 * r.randn(n, 2) * env, -1, 1)
    return target, reference


def _run(pair, dtype, **needs):
    target, reference = pair
    out = mg.master(
        jnp.asarray(target), jnp.asarray(reference), mg.Config(dtype=dtype), **needs
    )
    return out


class TestFloat32FullChain:
    def test_limited_master_above_95db(self, pair, snr):
        o64 = np.asarray(_run(pair, "float64").result, dtype=np.float64)
        o32 = np.asarray(_run(pair, "float32").result, dtype=np.float64)
        measured = snr(o64, o32)
        assert measured > 95.0, measured

    def test_no_limiter_variants_above_95db(self, pair, snr):
        needs = dict(
            need_default=False,
            need_no_limiter=True,
            need_no_limiter_normalized=True,
        )
        o64 = _run(pair, "float64", **needs)
        o32 = _run(pair, "float32", **needs)
        for key in ("result_no_limiter", "result_no_limiter_normalized"):
            measured = snr(
                np.asarray(getattr(o64, key), dtype=np.float64),
                np.asarray(getattr(o32, key), dtype=np.float64),
            )
            assert measured > 95.0, (key, measured)


def test_bfloat16_rejected():
    with pytest.raises(ValueError):
        mg.Config(dtype="bfloat16")


def test_integer_pcm_inputs_convert_on_device(pair=None):
    """int16/int32 inputs are accepted by the mastering graph and convert
    to float ON DEVICE with the libsndfile full-scale convention — the
    long-form H2D staging fix (half the tunnel bytes for 16-bit masters).
    Must be bit-identical to pre-converted float input."""
    sr = 44100
    n = 5 * sr
    r = np.random.RandomState(11)
    t = np.clip(0.3 * r.randn(n, 2), -1, 1)
    ref = np.clip(0.7 * r.randn(n, 2), -1, 1)
    t16 = (t * 32768).clip(-32768, 32767).astype(np.int16)
    r32 = (ref * 2147483648).clip(-2147483648, 2147483647).astype(np.int32)
    cfg = mg.Config(dtype="float32")
    o_float = np.asarray(
        mg.master(
            t16.astype(np.float32) / 32768.0,
            r32.astype(np.float64).astype(np.float32) / 2147483648.0,
            cfg,
        ).result
    )
    o_int = np.asarray(mg.master(t16, r32, cfg).result)
    np.testing.assert_array_equal(o_float, o_int)


class TestIntPcmStaging:
    """VERDICT r4 item 5 — raw integer PCM rides the host->device link.

    The loader keeps int16/int32 WAV payloads, ``process()`` stages them
    unscaled, and the graph converts on device; output must be
    bit-identical to the float64 decode path."""

    def test_wav_read_raw_int_matches_scaled(self, tmp_path):
        from matchering_tpu.io import wav

        rng = np.random.RandomState(21)
        x = np.clip(0.5 * rng.randn(4096, 2), -1, 1)
        for subtype, dtype, scale in (
            ("PCM_16", np.int16, 1 << 15),
            ("PCM_24", np.int32, 1 << 31),  # widened codes: /2^31 == /2^23
            ("PCM_32", np.int32, 1 << 31),
        ):
            path = str(tmp_path / f"x_{subtype}.wav")
            wav.write(path, x, 44100, subtype)
            floats, sr_f = wav.read(path)
            ints, sr_i = wav.read(path, raw_int=True)
            assert (sr_f, sr_i) == (44100, 44100)
            assert ints.dtype == dtype
            np.testing.assert_array_equal(ints.astype(np.float64) / scale, floats)
        # float WAVs ignore the flag
        path = str(tmp_path / "x_float.wav")
        wav.write(path, x, 44100, "FLOAT")
        got, _ = wav.read(path, raw_int=True)
        assert got.dtype == np.float64

    def test_checker_passes_ints_through_at_internal_rate(self):
        from matchering_tpu.checker import check

        rng = np.random.RandomState(22)
        ints = (np.clip(0.4 * rng.randn(44100 * 2, 2), -1, 1) * 32767).astype(np.int16)
        out, rate = check(ints, 44100, mg.Config(), "target")
        assert out.dtype == np.int16 and rate == 44100
        # resampling forces the float conversion (device resampler needs floats)
        out48, rate48 = check(ints, 48000, mg.Config(), "reference")
        assert np.issubdtype(out48.dtype, np.floating) and rate48 == 44100

    def test_checker_equality_spots_int_vs_float_same_track(self):
        from matchering_tpu.checker import check_equality
        from matchering_tpu.log import ModuleError

        rng = np.random.RandomState(23)
        ints = (np.clip(0.4 * rng.randn(9000, 2), -1, 1) * 32767).astype(np.int16)
        floats = ints.astype(np.float64) / 32768.0
        with pytest.raises(ModuleError):
            check_equality(ints, floats)

    def test_process_stages_integer_buffers_bit_identical(self, tmp_path, monkeypatch):
        import matchering_tpu.core as core
        from matchering_tpu.io import wav
        from matchering_tpu.io import loader as loader_mod

        sr = 44100
        n = 5 * sr
        rng = np.random.RandomState(24)
        t = np.clip(0.3 * rng.randn(n, 2), -1, 1)
        ref = np.clip(0.8 * rng.randn(n, 2), -1, 1)
        tp, rp = str(tmp_path / "t.wav"), str(tmp_path / "r.wav")
        wav.write(tp, t, sr, "PCM_16")
        wav.write(rp, ref, sr, "PCM_16")

        staged = []
        orig_render = core.render_variants

        def spy(target, reference, config, keys):
            staged.append((np.asarray(target).dtype, np.asarray(reference).dtype))
            return orig_render(target, reference, config, keys)

        monkeypatch.setattr(core, "render_variants", spy)

        out_int = str(tmp_path / "out_int.wav")
        mg.process(tp, rp, [mg.pcm16(out_int)], mg.Config())
        assert staged == [(np.dtype(np.int16), np.dtype(np.int16))]

        # same run with the loader pinned to float64 decodes
        orig_load = loader_mod.load
        monkeypatch.setattr(
            core,
            "load",
            lambda f, role, tmp, raw_int=True: orig_load(f, role, tmp, raw_int=False),
        )
        staged.clear()
        out_float = str(tmp_path / "out_float.wav")
        mg.process(tp, rp, [mg.pcm16(out_float)], mg.Config())
        assert staged[0][0] == np.dtype(np.float64)

        with open(out_int, "rb") as a, open(out_float, "rb") as b:
            assert a.read() == b.read()

    def test_process_with_preview_accepts_int_target(self, tmp_path):
        from matchering_tpu.io import wav

        sr = 44100
        n = 5 * sr
        rng = np.random.RandomState(25)
        wav.write(
            str(tmp_path / "t.wav"),
            np.clip(0.3 * rng.randn(n, 2), -1, 1), sr, "PCM_16",
        )
        wav.write(
            str(tmp_path / "r.wav"),
            np.clip(0.8 * rng.randn(n, 2), -1, 1), sr, "PCM_16",
        )
        mg.process(
            str(tmp_path / "t.wav"),
            str(tmp_path / "r.wav"),
            [mg.pcm16(str(tmp_path / "out.wav"))],
            mg.Config(),
            preview_target=mg.pcm16(str(tmp_path / "pt.wav")),
            preview_result=mg.pcm16(str(tmp_path / "pr.wav")),
        )
        for name in ("out.wav", "pt.wav", "pr.wav"):
            assert (tmp_path / name).exists()
