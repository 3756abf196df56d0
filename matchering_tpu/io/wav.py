"""RIFF/WAVE container codec (pure numpy host path).

Replaces the ``soundfile.read``/``soundfile.write`` calls of the reference
(``matchering/loader.py:35``, ``matchering/saver.py:32``) for the WAV format:
reads PCM 16/24/32, IEEE float/double (including WAVE_FORMAT_EXTENSIBLE),
writes PCM_16/PCM_24/PCM_32/FLOAT/DOUBLE.  Arrays are float64 frames with
shape ``(n, channels)`` (``always_2d`` semantics).
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

from . import pcm

WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_IEEE_FLOAT = 0x0003
WAVE_FORMAT_EXTENSIBLE = 0xFFFE


class WavFormatError(RuntimeError):
    pass


def _iter_chunks(buf: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", buf, pos)
        body = pos + 8
        yield cid, body, min(size, end - body)
        pos = body + size + (size & 1)  # chunks are word-aligned


def read(path: str) -> Tuple[np.ndarray, int]:
    """Read a WAV file -> (float64 array of shape (n, channels), sample_rate)."""
    with open(path, "rb") as f:
        buf = f.read()
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise WavFormatError("unknown format: not a RIFF/WAVE stream")

    fmt = None
    data = None
    for cid, body, size in _iter_chunks(buf, 12, len(buf)):
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", buf, body)
            if fmt[0] == WAVE_FORMAT_EXTENSIBLE and size >= 40:
                # SubFormat GUID's first two bytes carry the actual format tag
                (sub_tag,) = struct.unpack_from("<H", buf, body + 24)
                fmt = (sub_tag,) + fmt[1:]
        elif cid == b"data":
            data = buf[body : body + size]
    if fmt is None or data is None:
        raise WavFormatError("unknown format: missing fmt/data chunk")

    tag, channels, sample_rate, _brate, _balign, bits = fmt
    if channels < 1:
        raise WavFormatError("invalid channel count")

    if tag == WAVE_FORMAT_PCM:
        decoder = {16: pcm.decode_pcm16, 24: pcm.decode_pcm24, 32: pcm.decode_pcm32}.get(bits)
    elif tag == WAVE_FORMAT_IEEE_FLOAT:
        decoder = {32: pcm.decode_float, 64: pcm.decode_double}.get(bits)
    else:
        decoder = None
    if decoder is None:
        raise WavFormatError(f"unsupported WAV encoding: tag={tag} bits={bits}")

    frame_bytes = channels * (bits // 8)
    usable = (len(data) // frame_bytes) * frame_bytes
    samples = decoder(data[:usable])
    return samples.reshape(-1, channels), sample_rate


def write(path: str, array: np.ndarray, sample_rate: int, subtype: str = "PCM_16") -> None:
    """Write a float array of shape (n, channels) as a WAV file."""
    array = np.asarray(array)
    if array.ndim == 1:
        array = array[:, None]
    if subtype not in pcm.ENCODERS:
        raise WavFormatError(f"unsupported WAV subtype: {subtype}")

    channels = array.shape[1]
    bits = pcm.SUBTYPES[subtype] * 8
    tag = WAVE_FORMAT_IEEE_FLOAT if subtype in ("FLOAT", "DOUBLE") else WAVE_FORMAT_PCM
    payload = pcm.ENCODERS[subtype](array.reshape(-1))

    block_align = channels * (bits // 8)
    byte_rate = sample_rate * block_align
    fmt_body = struct.pack("<HHIIHH", tag, channels, sample_rate, byte_rate, block_align, bits)
    # float WAVs conventionally carry a fact chunk with the frame count
    fact = (
        struct.pack("<4sII", b"fact", 4, array.shape[0])
        if tag == WAVE_FORMAT_IEEE_FLOAT
        else b""
    )
    chunks = (
        struct.pack("<4sI", b"fmt ", len(fmt_body))
        + fmt_body
        + fact
        + struct.pack("<4sI", b"data", len(payload))
        + payload
    )
    if len(payload) & 1:
        chunks += b"\x00"
    with open(path, "wb") as f:
        f.write(struct.pack("<4sI4s", b"RIFF", 4 + len(chunks), b"WAVE"))
        f.write(chunks)
