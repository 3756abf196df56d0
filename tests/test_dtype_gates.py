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
