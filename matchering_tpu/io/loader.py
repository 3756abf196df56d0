"""Audio ingestion: native decoders first, transcoding as a safety net.

Behavioral contract (matches reference ``matchering/loader.py:30-74``): any
container the built-in codecs understand decodes directly; anything else is
handed to an ``ffmpeg`` subprocess that rewrites it into a temporary WAV
(with the lossy-source advisory for the appropriate role), and a coded
``ModuleError`` fires only after every strategy is exhausted.

Structure is a decode chain: each strategy either returns ``(audio, rate)``
or ``None`` to let the next one try.
"""

from __future__ import annotations

import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from ..log import Code, ModuleError, debug, info, warning
from ..utils import random_file
from . import codecs

_LOAD_ERRORS = {"TARGET": Code.ERROR_TARGET_LOADING, "REFERENCE": Code.ERROR_REFERENCE_LOADING}
_LOSSY_EVENTS = {
    "TARGET": lambda: warning(Code.WARNING_TARGET_IS_LOSSY),
    "REFERENCE": lambda: info(Code.INFO_REFERENCE_IS_LOSSY),
}


def _is_unknown_container(error: Exception) -> bool:
    """True when the native codec layer rejected the *container*, i.e.
    transcoding could still succeed (as opposed to e.g. a truncated file)."""
    text = str(error)
    return "unknown format" in text or "Format not recognised" in text


def _decode_native(file: str, role: str, temp_folder: str, raw_int: bool):
    try:
        decoded = codecs.read(file, raw_int=raw_int)
    except (RuntimeError, OSError) as error:
        debug(error)
        return None if _is_unknown_container(error) else _raise_load_error(role)
    if codecs.is_lossy_container(file):
        _LOSSY_EVENTS[role]()
    return decoded


def _decode_via_ffmpeg(file: str, role: str, temp_folder: str, raw_int: bool):
    """Transcode with ffmpeg into a temp WAV, decode that, clean up."""
    debug(f"Unknown container — transcoding '{file}' through ffmpeg")
    staging = os.path.join(temp_folder, random_file(prefix="temp"))
    try:
        subprocess.check_call(
            ["ffmpeg", "-i", file, staging],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
    except FileNotFoundError:
        debug("no ffmpeg binary on PATH — cannot transcode unknown containers")
        return None
    except subprocess.CalledProcessError:
        debug(f"ffmpeg could not produce a WAV from '{file}'")
        return None
    try:
        # ffmpeg's staging WAV is typically pcm_s16le — raw staging applies
        decoded = codecs.read(staging, raw_int=raw_int)
    except (RuntimeError, OSError) as error:
        # ffmpeg produced a WAV flavor our codecs cannot parse — stay inside
        # the decode-chain contract (coded ModuleError, not a raw exception)
        debug(error)
        return None
    finally:
        if os.path.exists(staging):
            os.remove(staging)
    _LOSSY_EVENTS[role]()
    return decoded


def _raise_load_error(role: str):
    raise ModuleError(_LOAD_ERRORS[role])


_DECODE_CHAIN = (_decode_native, _decode_via_ffmpeg)


def load(
    file: str, file_type: str, temp_folder: str, raw_int: bool = False
) -> Tuple[np.ndarray, int]:
    """Decode ``file`` into a float (n, ch) array + sample rate.

    ``file_type`` names the track's role ("target"/"reference") and selects
    which coded events fire on failure or lossy input.

    ``raw_int=True`` keeps integer-PCM WAV payloads as unscaled int16/int32
    codes (see ``codecs.read``): ``process()`` stages those to the device
    as-is — half the bytes of float32 over the slow host->device link —
    and the mastering graph converts on device with the identical
    ``/ 2**(bits-1)`` convention, so output is bit-identical either way.
    """
    role = file_type.upper()
    debug(f"Decoding the {role} track from '{file}'")
    decoded: Optional[Tuple[np.ndarray, int]] = None
    for strategy in _DECODE_CHAIN:
        decoded = strategy(file, role, temp_folder, raw_int)
        if decoded is not None:
            break
    if decoded is None:
        _raise_load_error(role)
    debug(f"{role} decoded: {decoded[0].shape[0]} samples at {decoded[1]} Hz")
    return decoded
