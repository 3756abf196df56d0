"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths can
be validated without TPU hardware (SURVEY.md §4), and with x64 enabled so
float64 oracle comparisons are meaningful.
"""

import os

# The image exports JAX_PLATFORMS=axon (the TPU tunnel); tests must run on
# CPU, so overwrite rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0xC0FFEE)


def snr_db(reference: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-error ratio in dB between two arrays."""
    reference = np.asarray(reference, dtype=np.float64)
    test = np.asarray(test, dtype=np.float64)
    err = reference - test
    denom = np.sum(err * err)
    if denom == 0:
        return np.inf
    return 10.0 * np.log10(np.sum(reference * reference) / denom)


@pytest.fixture
def snr():
    return snr_db
