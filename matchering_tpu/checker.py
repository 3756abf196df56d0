"""Input conditioning: bounds, channel layout, rate conversion, heuristics.

Behavioral contract (matches reference ``matchering/checker.py:31-142``):
tracks outside the configured length window are rejected, mono becomes
stereo, >2 channels is an error, off-rate audio is resampled to the internal
rate, and the TARGET gets clipping/limiting advisories.  The heavy steps run
on device: polyphase resampling (``ops.resample``; the reference delegates to
``resampy``, ``checker.py:42``) and peak counting
(``ops.basics.count_max_peaks``).

Structure: the role-dependent event codes live in one ``_RolePolicy`` table
and a linear pipeline of conditioning steps consults it — no per-call-site
code ternaries.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

from .config import Config
from .log import Code, ModuleError, debug, info, warning
from .ops import basics, resample
from .utils import time_str


@dataclass(frozen=True)
class _RolePolicy:
    """Event codes and behaviors attached to one input role."""

    name: str
    too_long: Code
    too_short: Code
    mono: Code
    too_many_channels: Code
    resample_event: object  # zero-arg callable firing the role's resample code
    heuristics: bool  # clipping/limiter advisories run for the TARGET only


_POLICIES = {
    "TARGET": _RolePolicy(
        name="TARGET",
        too_long=Code.ERROR_TARGET_LENGTH_IS_EXCEEDED,
        too_short=Code.ERROR_TARGET_LENGTH_IS_TOO_SMALL,
        mono=Code.INFO_TARGET_IS_MONO,
        too_many_channels=Code.ERROR_TARGET_NUM_OF_CHANNELS_IS_EXCEEDED,
        resample_event=lambda: warning(Code.WARNING_TARGET_IS_RESAMPLED),
        heuristics=True,
    ),
    "REFERENCE": _RolePolicy(
        name="REFERENCE",
        too_long=Code.ERROR_REFERENCE_LENGTH_LENGTH_IS_EXCEEDED,
        too_short=Code.ERROR_REFERENCE_LENGTH_LENGTH_TOO_SMALL,
        mono=Code.INFO_REFERENCE_IS_MONO,
        too_many_channels=Code.ERROR_REFERENCE_NUM_OF_CHANNELS_IS_EXCEEDED,
        resample_event=lambda: info(Code.INFO_REFERENCE_IS_RESAMPLED),
        heuristics=False,
    ),
}


def _bound_length(
    array: np.ndarray, sample_rate: int, config: Config, policy: _RolePolicy
) -> None:
    samples = array.shape[0]
    debug(
        f"{policy.name} duration: {time_str(samples, sample_rate)} "
        f"({samples} samples at {sample_rate} Hz)"
    )
    if samples > config.max_length * sample_rate:
        raise ModuleError(policy.too_long)
    if samples < config.min_track_samples(sample_rate):
        raise ModuleError(policy.too_short)


def _to_stereo(array: np.ndarray, policy: _RolePolicy) -> np.ndarray:
    channels = array.shape[1]
    if channels == 2:
        return array
    if channels == 1:
        info(policy.mono)
        return np.repeat(array, repeats=2, axis=1)
    raise ModuleError(policy.too_many_channels)


def _int_to_float(array: np.ndarray) -> np.ndarray:
    """Host-side full-scale conversion for staged integer PCM — only used
    on paths that genuinely need float values on host (resampling)."""
    if np.issubdtype(array.dtype, np.integer):
        return array.astype(np.float64) / basics.pcm_int_scale(array.dtype)
    return array


def _to_internal_rate(
    array: np.ndarray, sample_rate: int, config: Config, policy: _RolePolicy
) -> Tuple[np.ndarray, int]:
    internal = config.internal_sample_rate
    if sample_rate == internal:
        return array, sample_rate
    debug(f"Rate conversion for {policy.name}: {sample_rate} -> {internal} Hz")
    converted = np.asarray(resample.resample(_int_to_float(array), sample_rate, internal))
    policy.resample_event()
    return converted, internal


def _peak_heuristics(array: np.ndarray, config: Config) -> None:
    """Advisory-only analysis of the peak population: many samples pinned at
    an identical maximum suggest clipping (when that maximum is full scale)
    or an upstream limiter (when it is not)."""
    peak, pinned = basics.count_max_peaks(array)
    peak, pinned = float(peak), int(pinned)
    if pinned <= config.clipping_samples_threshold:
        return
    at_full_scale = abs(peak - 1.0) <= 1e-8 + 1e-5  # np.isclose(peak, 1.0)
    if at_full_scale:
        warning(Code.WARNING_TARGET_IS_CLIPPING)
    elif pinned > config.limited_samples_threshold:
        warning(Code.WARNING_TARGET_LIMITER_IS_APPLIED)


def check(
    array: np.ndarray, sample_rate: int, config: Config, name: str
) -> Tuple[np.ndarray, int]:
    """Condition one input track for the mastering graph: bound its length,
    force stereo, convert to the internal rate, and (for the TARGET) emit
    peak-population advisories."""
    policy = _POLICIES[name.upper()]
    _bound_length(array, sample_rate, config, policy)
    array = _to_stereo(array, policy)
    array, sample_rate = _to_internal_rate(array, sample_rate, config, policy)
    if policy.heuristics:
        _peak_heuristics(array, config)
    return array, sample_rate


def check_equality(target: np.ndarray, reference: np.ndarray) -> None:
    """Matching a track against itself is meaningless; reject it
    (reference ``checker.py:140-142``).  Staged integer PCM compares in the
    float domain so e.g. the same track as PCM_16 WAV (staged as int16)
    and as FLAC (decoded to float) is still recognized as equal."""
    if target.shape == reference.shape and np.allclose(
        _int_to_float(target), _int_to_float(reference)
    ):
        raise ModuleError(Code.ERROR_TARGET_EQUALS_REFERENCE)
