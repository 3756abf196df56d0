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


# ---------------------------------------------------------------------------
# Reference-as-oracle: import sergree/matchering from /root/reference with
# stub modules for its unavailable deps (statsmodels -> our direct-loop
# LOWESS oracle, resampy/soundfile -> inert shims).  The reference tree is
# read-only and nothing from it is copied into this repo; it is executed as a
# black-box numerical oracle only.
#
# Off this box (public CI), the oracle is the published package instead:
# ``pip install matchering==2.0.6`` brings the real statsmodels/resampy/
# soundfile along, so no stubs are needed and the parity claims stay
# reproducible outside the dev environment (VERDICT r3 item 8).


@pytest.fixture(scope="session")
def reference_matchering():
    import sys
    import types

    # MATCHERING_TPU_ORACLE=published forces the public-CI codepath (the
    # installed ``matchering`` package, no dev-box stubs) even when the
    # /root/reference mount exists — used to reproduce the oracle-parity
    # CI job locally (tools_oracle_ci_local.sh).
    force_published = os.environ.get("MATCHERING_TPU_ORACLE") == "published"
    if force_published or not os.path.isdir("/root/reference/matchering"):
        try:
            import matchering as published  # the PyPI oracle, if installed

            return published
        except ImportError:
            pass
        pytest.skip(
            "reference oracle not available (install matchering==2.0.6 or "
            "mount /root/reference to run the parity tests)"
        )

    import oracle_lowess

    if "matchering" not in sys.modules:
        sm = types.ModuleType("statsmodels")
        sm_api = types.ModuleType("statsmodels.api")
        sm_np = types.ModuleType("statsmodels.nonparametric")
        sm_lo = types.ModuleType("statsmodels.nonparametric.smoothers_lowess")
        sm_lo.lowess = oracle_lowess.lowess
        sm_np.lowess = oracle_lowess.lowess
        sm_api.nonparametric = sm_np

        class _NP:
            lowess = staticmethod(oracle_lowess.lowess)

        sm.nonparametric = _NP()
        sm.api = sm_api
        sys.modules.setdefault("statsmodels", sm)
        sys.modules.setdefault("statsmodels.api", sm_api)
        sys.modules.setdefault("statsmodels.nonparametric", sm_np)
        sys.modules.setdefault(
            "statsmodels.nonparametric.smoothers_lowess", sm_lo
        )

        def _unavailable(*_a, **_k):
            raise RuntimeError("resampy stub called — test must not resample")

        rs = types.ModuleType("resampy")
        rs.resample = _unavailable
        sys.modules.setdefault("resampy", rs)

        sf = types.ModuleType("soundfile")
        sf.check_format = lambda *_a, **_k: True
        sf.read = _unavailable
        sf.write = _unavailable
        sys.modules.setdefault("soundfile", sf)

        sys.path.insert(0, "/root/reference")

    import matchering

    return matchering
