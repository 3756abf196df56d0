"""Input validation and preprocessing (reference ``matchering/checker.py``).

Host-driven control flow (lengths, channel layout, warnings are inherently
data/metadata-dependent and happen once per file) with device compute for the
two heavy steps: polyphase resampling (``ops.resample`` — the reference uses
``resampy``, ``checker.py:42``) and peak counting (``ops.basics.count_max_peaks``).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .config import Config
from .log import Code, ModuleError, debug, info, warning
from .ops import basics, resample
from .utils import time_str


def _check_length(
    array: np.ndarray,
    sample_rate: int,
    max_length: float,
    min_length: int,
    name: str,
    error_code_max: Code,
    error_code_min: Code,
) -> None:
    length = array.shape[0]
    debug(f"{name} audio length: {length} samples ({time_str(length, sample_rate)})")
    if length > max_length:
        raise ModuleError(error_code_max)
    if length < min_length:
        raise ModuleError(error_code_min)


def _check_channels(
    array: np.ndarray, info_code_mono: Code, error_code_not_stereo: Code
) -> np.ndarray:
    if array.shape[1] == 1:
        info(info_code_mono)
        return np.repeat(array, repeats=2, axis=1)
    if array.shape[1] != 2:
        raise ModuleError(error_code_not_stereo)
    return array


def _check_clipping_limiting(array: np.ndarray, config: Config) -> None:
    max_value, max_count = basics.count_max_peaks(array)
    max_value, max_count = float(max_value), int(max_count)
    if max_count > config.clipping_samples_threshold:
        if abs(max_value - 1.0) <= 1e-8 + 1e-5:  # np.isclose(max_value, 1.0)
            warning(Code.WARNING_TARGET_IS_CLIPPING)
        elif max_count > config.limited_samples_threshold:
            warning(Code.WARNING_TARGET_LIMITER_IS_APPLIED)


def check(
    array: np.ndarray, sample_rate: int, config: Config, name: str
) -> Tuple[np.ndarray, int]:
    """Validate and normalize one input track (reference ``checker.py:90-137``):
    length bounds -> mono-to-stereo -> resample to the internal rate ->
    clipping/limiting heuristics (TARGET only)."""
    name = name.upper()
    is_target = name == "TARGET"

    _check_length(
        array,
        sample_rate,
        config.max_length * sample_rate,
        config.min_track_samples(sample_rate),
        name,
        Code.ERROR_TARGET_LENGTH_IS_EXCEEDED
        if is_target
        else Code.ERROR_REFERENCE_LENGTH_LENGTH_IS_EXCEEDED,
        Code.ERROR_TARGET_LENGTH_IS_TOO_SMALL
        if is_target
        else Code.ERROR_REFERENCE_LENGTH_LENGTH_TOO_SMALL,
    )

    array = _check_channels(
        array,
        Code.INFO_TARGET_IS_MONO if is_target else Code.INFO_REFERENCE_IS_MONO,
        Code.ERROR_TARGET_NUM_OF_CHANNELS_IS_EXCEEDED
        if is_target
        else Code.ERROR_REFERENCE_NUM_OF_CHANNELS_IS_EXCEEDED,
    )

    if sample_rate != config.internal_sample_rate:
        debug(
            f"Resampling {name} audio from {sample_rate} Hz "
            f"to {config.internal_sample_rate} Hz..."
        )
        array = np.asarray(
            resample.resample(array, sample_rate, config.internal_sample_rate)
        )
        (warning if is_target else info)(
            Code.WARNING_TARGET_IS_RESAMPLED
            if is_target
            else Code.INFO_REFERENCE_IS_RESAMPLED
        )
        sample_rate = config.internal_sample_rate

    if is_target:
        _check_clipping_limiting(array, config)

    return array, sample_rate


def check_equality(target: np.ndarray, reference: np.ndarray) -> None:
    """Reject TARGET == REFERENCE (reference ``checker.py:140-142``)."""
    if target.shape == reference.shape and np.allclose(target, reference):
        raise ModuleError(Code.ERROR_TARGET_EQUALS_REFERENCE)
