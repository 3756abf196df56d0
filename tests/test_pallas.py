"""Pallas kernel parity (interpret mode on CPU; the real chip is exercised
by bench/validation drives)."""

from unittest import mock

import jax.numpy as jnp
import numpy as np
import pytest

import matchering_tpu.ops.pallas_envelope as pe
from matchering_tpu.ops import basics, sliding


@pytest.fixture
def interpreted():
    """Run pallas_call in interpreter mode so the kernel logic is testable
    without TPU hardware."""
    orig = pe.pl.pallas_call

    def interp(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    with mock.patch.object(pe.pl, "pallas_call", interp):
        yield


class TestLimiterFrontEnd:
    @pytest.mark.parametrize("n", [33000, 65536, 70001])
    def test_matches_unfused_ops(self, interpreted, rng, n):
        x = jnp.asarray(rng.randn(n, 2) * 0.6)
        threshold = 0.998138427734375
        gain, slided = pe.limiter_front_end(x, threshold, 44)

        expected_gain = basics.flip(1.0 / basics.rectify(x, threshold))
        expected_slided = sliding.sliding_max_attack(expected_gain, 44)
        np.testing.assert_allclose(np.asarray(gain), np.asarray(expected_gain), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(slided), np.asarray(expected_slided), atol=1e-12
        )

    def test_quiet_signal_zero_gain(self, interpreted, rng):
        x = jnp.asarray(rng.randn(40000, 2) * 0.1)
        gain, slided = pe.limiter_front_end(x, 0.9981, 44)
        assert float(jnp.max(jnp.abs(gain))) == 0.0
        assert float(jnp.max(jnp.abs(slided))) == 0.0
