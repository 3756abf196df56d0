"""ctypes binding for the native C++ WAV codec.

The native backend (``codec.cpp``) accelerates bulk PCM <-> float conversion
and file I/O for the host shell; the numpy codecs remain as a always-available
fallback.  Build with ``python -m matchering_tpu.io.native.build`` (uses g++;
no pybind11 required).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_NAME = "libmtpu_codec.so"
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False

_SUBTYPE_IDS = {"PCM_16": 0, "PCM_24": 1, "PCM_32": 2, "FLOAT": 3}


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), _LIB_NAME)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    path = _lib_path()
    if not os.path.exists(path):
        # first-use auto-build so FLAC (native-only) works from a clean
        # clone; opt out with MATCHERING_TPU_NO_AUTOBUILD=1
        if os.environ.get("MATCHERING_TPU_NO_AUTOBUILD") == "1":
            return None
        try:
            from .build import build

            build(verbose=False)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.mtpu_wav_probe.restype = ctypes.c_int
        lib.mtpu_wav_probe.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_longlong),  # frames
            ctypes.POINTER(ctypes.c_int),  # channels
            ctypes.POINTER(ctypes.c_int),  # sample rate
        ]
        lib.mtpu_wav_read.restype = ctypes.c_int
        lib.mtpu_wav_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_longlong,
        ]
        lib.mtpu_wav_write.restype = ctypes.c_int
        lib.mtpu_wav_write.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_longlong,  # frames
            ctypes.c_int,  # channels
            ctypes.c_int,  # sample rate
            ctypes.c_int,  # subtype id
        ]
        lib.mtpu_flac_probe.restype = ctypes.c_int
        lib.mtpu_flac_probe.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_longlong),  # frames
            ctypes.POINTER(ctypes.c_int),  # channels
            ctypes.POINTER(ctypes.c_int),  # sample rate
            ctypes.POINTER(ctypes.c_int),  # bits per sample
        ]
        lib.mtpu_flac_read.restype = ctypes.c_longlong
        lib.mtpu_flac_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_longlong,
        ]
        lib.mtpu_flac_write.restype = ctypes.c_int
        lib.mtpu_flac_write.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_longlong,  # frames
            ctypes.c_int,  # channels
            ctypes.c_int,  # sample rate
            ctypes.c_int,  # bits per sample
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    lib = _load()
    assert lib is not None
    frames = ctypes.c_longlong()
    channels = ctypes.c_int()
    rate = ctypes.c_int()
    rc = lib.mtpu_wav_probe(
        path.encode(), ctypes.byref(frames), ctypes.byref(channels), ctypes.byref(rate)
    )
    if rc != 0:
        raise RuntimeError(f"unknown format: '{os.path.basename(path)}' (rc={rc})")
    out = np.empty((frames.value, channels.value), dtype=np.float64)
    rc = lib.mtpu_wav_read(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        frames.value * channels.value,
    )
    if rc != 0:
        raise RuntimeError(f"native WAV read failed (rc={rc})")
    return out, rate.value


def write_wav(path: str, array: np.ndarray, sample_rate: int, subtype: str) -> None:
    lib = _load()
    assert lib is not None
    array = np.ascontiguousarray(array, dtype=np.float64)
    if array.ndim == 1:
        array = array[:, None]
    rc = lib.mtpu_wav_write(
        path.encode(),
        array.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        array.shape[0],
        array.shape[1],
        sample_rate,
        _SUBTYPE_IDS[subtype],
    )
    if rc != 0:
        raise RuntimeError(f"native WAV write failed (rc={rc})")


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    """Decode a FLAC file via the native codec -> (float64 (n, ch), rate)."""
    lib = _load()
    assert lib is not None
    frames = ctypes.c_longlong()
    channels = ctypes.c_int()
    rate = ctypes.c_int()
    bps = ctypes.c_int()
    rc = lib.mtpu_flac_probe(
        path.encode(),
        ctypes.byref(frames),
        ctypes.byref(channels),
        ctypes.byref(rate),
        ctypes.byref(bps),
    )
    if rc != 0:
        raise RuntimeError(f"unknown format: '{os.path.basename(path)}' (rc={rc})")

    def _decode(capacity: int) -> Tuple[np.ndarray, int]:
        buf = np.empty((capacity, channels.value), dtype=np.float64)
        n = lib.mtpu_flac_read(
            path.encode(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            capacity,
        )
        if n < 0:
            raise RuntimeError(f"native FLAC decode failed (rc={n})")
        return buf, n

    # STREAMINFO total_samples is advisory (0 = unknown, RFC 9639) and
    # attacker-controlled: allocate from it only when the implied buffer is
    # plausible against the file size.  Legit FLAC decompresses to at most a
    # few times the file size (our f64 buffer is 8 bytes/sample vs >= 2 on
    # disk), so 64x file size is already generous; a crafted small file
    # claiming billions of samples now caps at megabytes instead of the old
    # 16 GiB absolute bound.  Pathological cases (all-digital-silence tracks
    # compress ~500x) fail the gate harmlessly: they decode via the growing
    # buffer below.
    claimed = frames.value
    file_bytes = os.path.getsize(path)
    plausible = 0 < claimed and claimed * channels.value * 8 <= max(
        1 << 26, file_bytes * 64
    )
    if plausible:
        out, n = _decode(claimed)
        return out[:n], rate.value
    capacity = max(file_bytes // max(channels.value, 1), 1 << 16)
    while True:
        out, n = _decode(capacity)
        if n < capacity:
            return out[:n].copy(), rate.value
        capacity *= 4


def write_flac(path: str, array: np.ndarray, sample_rate: int, subtype: str) -> None:
    """Encode float64 (n, ch) audio as FLAC (PCM_16 or PCM_24)."""
    lib = _load()
    assert lib is not None
    bps = {"PCM_16": 16, "PCM_24": 24}[subtype]
    array = np.ascontiguousarray(array, dtype=np.float64)
    if array.ndim == 1:
        array = array[:, None]
    rc = lib.mtpu_flac_write(
        path.encode(),
        array.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        array.shape[0],
        array.shape[1],
        sample_rate,
        bps,
    )
    if rc != 0:
        raise RuntimeError(f"native FLAC write failed (rc={rc})")
