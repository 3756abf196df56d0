"""Ogg Opus decode via the system libopus — no ffmpeg binary needed.

The reference reads .opus uploads natively through libsndfile
(``matchering/loader.py:35``); this repo previously routed them to the
ffmpeg subprocess fallback, which fails on ffmpeg-less hosts.  The usual
native route, libopusfile, is absent on typical minimal images — but the
raw codec ``libopus`` is almost always present (pulled in by every media
stack).  So: demux the Ogg container in pure Python (the framing layer is
just lacing tables — RFC 3533) and hand each packet to
``opus_decode_float`` / ``opus_multistream_decode_float`` over ctypes.

Implements RFC 7845 (Ogg encapsulation of Opus): OpusHead parsing
(channel count, pre-skip, output gain, channel mapping families 0/1),
OpusTags skipping, 48 kHz decode, pre-skip trim and end-trim from the last
page's granule position.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import struct
from typing import List, Optional, Tuple

import numpy as np

_MAX_FRAME = 5760  # 120 ms at 48 kHz — the largest Opus frame

_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    name = ctypes.util.find_library("opus") or "libopus.so.0"
    try:
        lib = ctypes.CDLL(name)
    except OSError:
        _lib_failed = True
        return None
    c_int, c_int32, c_ubyte_p = ctypes.c_int, ctypes.c_int32, ctypes.POINTER(ctypes.c_ubyte)
    c_float_p = ctypes.POINTER(ctypes.c_float)
    lib.opus_decoder_create.restype = ctypes.c_void_p
    lib.opus_decoder_create.argtypes = [c_int32, c_int, ctypes.POINTER(c_int)]
    lib.opus_decode_float.restype = c_int
    lib.opus_decode_float.argtypes = [ctypes.c_void_p, c_ubyte_p, c_int32, c_float_p, c_int, c_int]
    lib.opus_decoder_destroy.argtypes = [ctypes.c_void_p]
    lib.opus_multistream_decoder_create.restype = ctypes.c_void_p
    lib.opus_multistream_decoder_create.argtypes = [
        c_int32, c_int, c_int, c_int, c_ubyte_p, ctypes.POINTER(c_int),
    ]
    lib.opus_multistream_decode_float.restype = c_int
    lib.opus_multistream_decode_float.argtypes = [
        ctypes.c_void_p, c_ubyte_p, c_int32, c_float_p, c_int, c_int,
    ]
    lib.opus_multistream_decoder_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _first_packet(buf: bytes) -> bytes:
    """The first packet of the first Ogg page (enough for magic sniffing)."""
    if len(buf) < 28 or buf[:4] != b"OggS":
        return b""
    nsegs = buf[26]
    body = 27 + nsegs
    first_len = 0
    for lace in buf[27 : 27 + nsegs]:
        first_len += lace
        if lace < 255:
            break
    return buf[body : body + first_len]


def is_opus(path: str) -> bool:
    """True when the file is an Ogg stream whose first packet is OpusHead."""
    try:
        with open(path, "rb") as f:
            head = f.read(1024)
    except OSError:
        return False
    return _first_packet(head)[:8] == b"OpusHead"


def _demux_ogg(buf: bytes) -> Tuple[List[bytes], int]:
    """Assemble Ogg packets (RFC 3533 lacing) -> (packets, last granulepos)."""
    packets: List[bytes] = []
    partial = b""
    granule = 0
    pos = 0
    while pos + 27 <= len(buf):
        if buf[pos : pos + 4] != b"OggS":
            break
        header_type = buf[pos + 5]
        (page_granule,) = struct.unpack_from("<q", buf, pos + 6)
        nsegs = buf[pos + 26]
        lacing = buf[pos + 27 : pos + 27 + nsegs]
        body = pos + 27 + nsegs
        if not (header_type & 0x01):  # not a continuation: drop any orphan
            partial = b""
        seg_pos = body
        for lace in lacing:
            partial += buf[seg_pos : seg_pos + lace]
            seg_pos += lace
            if lace < 255:
                packets.append(partial)
                partial = b""
        if page_granule >= 0:
            granule = page_granule
        pos = seg_pos
    return packets, granule


class _OpusHead:
    def __init__(self, packet: bytes):
        if packet[:8] != b"OpusHead" or len(packet) < 19:
            raise RuntimeError("unknown format: malformed OpusHead")
        (self.version, self.channels, self.pre_skip, _input_rate, gain_q8,
         self.mapping_family) = struct.unpack_from("<BBHIhB", packet, 8)
        if self.channels < 1:
            raise RuntimeError("unknown format: invalid Opus channel count")
        self.gain = 10.0 ** (gain_q8 / (20.0 * 256.0))
        if self.mapping_family == 0:
            self.streams = 1
            self.coupled = 1 if self.channels == 2 else 0
            self.mapping = bytes(range(self.channels))
        else:
            if len(packet) < 21 + self.channels:
                raise RuntimeError("unknown format: malformed Opus channel mapping")
            self.streams, self.coupled = struct.unpack_from("<BB", packet, 19)
            self.mapping = packet[21 : 21 + self.channels]


def read_opus(path: str) -> Tuple[np.ndarray, int]:
    """Decode an Ogg Opus file -> (float64 (n, ch) array, 48000)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libopus is not available on this host")
    with open(path, "rb") as f:
        buf = f.read()
    packets, granule = _demux_ogg(buf)
    if not packets or packets[0][:8] != b"OpusHead":
        raise RuntimeError(f"unknown format: '{os.path.basename(path)}'")
    head = _OpusHead(packets[0])
    audio = packets[1:]
    if audio and audio[0][:8] == b"OpusTags":
        audio = audio[1:]

    err = ctypes.c_int(0)
    multistream = head.mapping_family != 0
    if multistream:
        mapping = (ctypes.c_ubyte * head.channels).from_buffer_copy(head.mapping)
        dec = lib.opus_multistream_decoder_create(
            48000, head.channels, head.streams, head.coupled, mapping, ctypes.byref(err)
        )
        decode, destroy = lib.opus_multistream_decode_float, lib.opus_multistream_decoder_destroy
    else:
        dec = lib.opus_decoder_create(48000, head.channels, ctypes.byref(err))
        decode, destroy = lib.opus_decode_float, lib.opus_decoder_destroy
    if not dec or err.value != 0:
        raise RuntimeError(f"opus decoder init failed (rc={err.value})")

    try:
        frame = np.empty(_MAX_FRAME * head.channels, dtype=np.float32)
        frame_p = frame.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        chunks = []
        for pkt in audio:
            if not pkt:
                continue
            data = (ctypes.c_ubyte * len(pkt)).from_buffer_copy(pkt)
            n = decode(dec, data, len(pkt), frame_p, _MAX_FRAME, 0)
            if n < 0:
                raise RuntimeError(f"opus packet decode failed (rc={n})")
            chunks.append(frame[: n * head.channels].reshape(n, head.channels).copy())
    finally:
        destroy(dec)

    if not chunks:
        raise RuntimeError(f"unknown format: '{os.path.basename(path)}' (no audio)")
    pcm = np.concatenate(chunks, axis=0).astype(np.float64)
    # RFC 7845 §4: trim the encoder pre-skip, and end-trim to the final
    # granule position (granules count 48 kHz samples incl. pre-skip)
    end = granule if 0 < granule <= pcm.shape[0] else pcm.shape[0]
    pcm = pcm[min(head.pre_skip, end) : end]
    if head.gain != 1.0:
        pcm *= head.gain
    return pcm, 48000
