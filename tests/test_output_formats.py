"""Output-format completeness (VERDICT r1 item 8): ffmpeg write fallback for
containers the native codecs don't cover, and first-use auto-build of the
native FLAC codec.  ffmpeg is absent in this environment, so the transcode
plumbing is exercised through a stub binary that performs the copy.
"""

import os
import stat
import sys

import numpy as np
import pytest

from matchering_tpu.io import codecs
from matchering_tpu.io.native import binding as native
from matchering_tpu.io.native import mp3 as mp3lib
from matchering_tpu.io.native import vorbis as vorbislib
from matchering_tpu.results import Result


@pytest.fixture
def no_lossy_libs(monkeypatch):
    """Simulate a host without libvorbis/libmpg123 (and restore after)."""
    monkeypatch.setattr(vorbislib, "_libs", None)
    monkeypatch.setattr(vorbislib, "_load_failed", True)
    monkeypatch.setattr(mp3lib, "_lib", None)
    monkeypatch.setattr(mp3lib, "_lib_failed", True)
    monkeypatch.setattr(mp3lib, "_lame", None)
    monkeypatch.setattr(mp3lib, "_lame_failed", True)


@pytest.fixture
def fake_ffmpeg(tmp_path, monkeypatch):
    """A stand-in ffmpeg: copies the staged WAV to the output path (the
    output then carries WAV bytes, which codecs.read decodes by magic —
    letting the round trip assert exact samples)."""
    script = tmp_path / "ffmpeg"
    script.write_text(
        "#!%s\nimport shutil, sys\n"
        "args = sys.argv[1:]\n"
        "src = args[args.index('-i') + 1]\n"
        "shutil.copy(src, args[-1])\n" % sys.executable
    )
    script.chmod(script.stat().st_mode | stat.S_IXUSR)
    monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}{os.environ['PATH']}")
    return script


class TestFfmpegWriteFallback:
    def test_format_table_requires_ffmpeg(self, monkeypatch, tmp_path, no_lossy_libs):
        # with neither the system codec libraries nor ffmpeg, lossy formats
        # are honestly reported unsupported
        monkeypatch.setenv("PATH", str(tmp_path))  # nothing on PATH
        assert not codecs.check_format("OGG", "VORBIS")
        assert not codecs.check_format("MP3", "MPEG_LAYER_III")
        with pytest.raises(TypeError):
            Result("out.ogg", "VORBIS")

    def test_ogg_write_falls_back_to_ffmpeg(
        self, fake_ffmpeg, tmp_path, rng, no_lossy_libs
    ):
        """Hosts without libvorbis still write OGG through the ffmpeg
        transcode plumbing (the stub copies the staged WAV, so the bytes
        roundtrip exactly)."""
        assert codecs.check_format("OGG", "VORBIS")
        result = Result(str(tmp_path / "out.ogg"), "VORBIS")
        audio = np.clip(0.5 * rng.randn(44100, 2), -0.9, 0.9)
        codecs.write(result.file, audio, 44100, result.subtype)
        decoded, sr = codecs.read(result.file)
        assert sr == 44100
        np.testing.assert_allclose(decoded, audio, atol=1e-12)

    @pytest.mark.parametrize(
        "name, subtype", [("x.mp3", "MPEG_LAYER_III"), ("x.caf", "PCM_24")]
    )
    def test_other_ffmpeg_formats_accepted(
        self, fake_ffmpeg, tmp_path, name, subtype, no_lossy_libs
    ):
        result = Result(str(tmp_path / name), subtype)
        codecs.write(result.file, np.zeros((1000, 2)), 44100, result.subtype)
        assert os.path.getsize(result.file) > 0

    def test_bad_subtype_rejected(self, fake_ffmpeg):
        with pytest.raises(TypeError):
            Result("out.ogg", "PCM_16")  # OGG carries VORBIS only


class TestNativeLossyCodecs:
    """VERDICT r2 item 6: OGG/Vorbis (and MP3) decode with NO ffmpeg binary,
    via ctypes bindings to the system libvorbis/libmpg123; the lossy-source
    advisory codes still fire."""

    @staticmethod
    def _sine_pair(n=44100):
        t = np.arange(n) / 44100.0
        return np.stack(
            [0.5 * np.sin(2 * np.pi * 440 * t), 0.5 * np.sin(2 * np.pi * 660 * t)], 1
        )

    @staticmethod
    def _aligned_snr(want, got):
        """SNR after compensating the codec's encoder delay (lossy codecs
        prepend priming samples)."""
        best, delay = np.inf, 0
        probe = want[2000:10000]  # skip the codec's fade-in region
        for lag in range(0, 5000):
            seg = got[lag + 2000 : lag + 10000]
            if len(seg) < len(probe):
                break
            e = float(np.sum((seg - probe) ** 2))
            if e < best:
                best, delay = e, lag
        m = min(len(got) - delay, len(want))
        err = got[delay : delay + m] - want[:m]
        return 10 * np.log10(np.sum(want[:m] ** 2) / np.sum(err**2))

    def test_ogg_roundtrip_without_ffmpeg(self, tmp_path, monkeypatch):
        if not vorbislib.available():
            pytest.skip("libvorbis not on this host")
        monkeypatch.setenv("PATH", str(tmp_path))  # prove: no ffmpeg involved
        audio = self._sine_pair()
        path = str(tmp_path / "rt.ogg")
        codecs.write(path, audio, 44100, "VORBIS")
        decoded, sr = codecs.read(path)
        assert sr == 44100 and decoded.shape[1] == 2
        assert self._aligned_snr(audio, decoded) > 15.0  # lossy, tonal

    def test_mp3_roundtrip_without_ffmpeg(self, tmp_path, monkeypatch):
        if not (mp3lib.available() and mp3lib.write_available()):
            pytest.skip("libmpg123/libmp3lame not on this host")
        monkeypatch.setenv("PATH", str(tmp_path))
        audio = self._sine_pair()
        path = str(tmp_path / "rt.mp3")
        codecs.write(path, audio, 44100, "MPEG_LAYER_III")
        decoded, sr = codecs.read(path)
        assert sr == 44100 and decoded.shape[1] == 2
        assert self._aligned_snr(audio, decoded) > 40.0  # 320 kbps CBR

    @pytest.mark.parametrize(
        "role, expect_code",
        [("target", "WARNING_TARGET_IS_LOSSY"), ("reference", "INFO_REFERENCE_IS_LOSSY")],
    )
    def test_loader_advisory_fires_for_native_lossy(
        self, tmp_path, monkeypatch, role, expect_code
    ):
        if not vorbislib.available():
            pytest.skip("libvorbis not on this host")
        import matchering_tpu as mg
        from matchering_tpu.io.loader import load
        from matchering_tpu.log import Code

        monkeypatch.setenv("PATH", str(tmp_path))  # no ffmpeg anywhere
        path = str(tmp_path / "in.ogg")
        codecs.write(path, self._sine_pair(), 44100, "VORBIS")
        seen = []
        mg.log(
            warning_handler=lambda m: seen.append(("w", m)),
            info_handler=lambda m: seen.append(("i", m)),
            show_codes=True,
        )
        try:
            decoded, sr = load(path, role, str(tmp_path))
        finally:
            mg.log()
        assert sr == 44100 and decoded.shape[0] > 0
        code = getattr(Code, expect_code)
        assert any(str(int(code)) in str(m) for _, m in seen), seen

    def test_unavailable_libs_degrade_to_unknown_format(
        self, tmp_path, monkeypatch, no_lossy_libs
    ):
        path = str(tmp_path / "x.ogg")
        with open(path, "wb") as f:
            f.write(b"OggS" + b"\x00" * 64)
        with pytest.raises(RuntimeError, match="unknown format"):
            codecs.read(path)


class TestFlacStreaminfoEdges:
    """ADVICE r1: STREAMINFO total_samples is advisory and attacker
    controlled — 0 (unknown length, legal per RFC 9639) must decode via the
    growing-buffer path, and an absurd claimed count must not drive a
    multi-GB allocation."""

    @staticmethod
    def _patched_flac(tmp_path, rng, total_samples_bytes):
        audio = np.clip(0.4 * rng.randn(30000, 2), -0.9, 0.9)
        path = str(tmp_path / "edge.flac")
        native.write_flac(path, np.ascontiguousarray(audio), 44100, "PCM_16")
        blob = bytearray(open(path, "rb").read())
        # STREAMINFO starts at byte 8; total_samples is the low nibble of
        # relative byte 13 plus bytes 14..17
        blob[21] = (blob[21] & 0xF0) | total_samples_bytes[0]
        blob[22:26] = bytes(total_samples_bytes[1:])
        open(path, "wb").write(bytes(blob))
        return path, audio

    def test_unknown_length_decodes(self, tmp_path, rng):
        path, audio = self._patched_flac(tmp_path, rng, [0, 0, 0, 0, 0])
        decoded, sr = native.read_flac(path)
        assert sr == 44100 and decoded.shape == audio.shape
        np.testing.assert_allclose(decoded, audio, atol=2.0 / (1 << 15))

    def test_absurd_claimed_length_bounded(self, tmp_path, rng):
        path, audio = self._patched_flac(tmp_path, rng, [0x0F, 0xFF, 0xFF, 0xFF, 0xFF])
        decoded, sr = native.read_flac(path)  # ~2^36 claimed; must not OOM
        assert sr == 44100 and decoded.shape == audio.shape
        np.testing.assert_allclose(decoded, audio, atol=2.0 / (1 << 15))


class TestNativeAutoBuild:
    def test_flac_codec_builds_on_first_use(self, tmp_path, monkeypatch):
        lib = native._lib_path()
        moved = str(tmp_path / "stashed.so")
        assert os.path.exists(lib), "native codec should be prebuilt for tests"
        os.rename(lib, moved)
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_load_attempted", False)
        try:
            assert native.available()  # triggers the g++ auto-build
            assert os.path.exists(lib)
            out = str(tmp_path / "x.flac")
            audio = np.clip(0.4 * np.random.RandomState(3).randn(5000, 2), -0.9, 0.9)
            native.write_flac(out, np.ascontiguousarray(audio), 44100, "PCM_16")
            decoded, sr = codecs.read(out)
            assert sr == 44100 and decoded.shape == audio.shape
        finally:
            if not os.path.exists(lib):
                os.rename(moved, lib)
            monkeypatch.setattr(native, "_lib", None)
            monkeypatch.setattr(native, "_load_attempted", False)

    def test_autobuild_opt_out(self, tmp_path, monkeypatch):
        lib = native._lib_path()
        moved = str(tmp_path / "stashed.so")
        os.rename(lib, moved)
        monkeypatch.setenv("MATCHERING_TPU_NO_AUTOBUILD", "1")
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_load_attempted", False)
        try:
            assert not native.available()
        finally:
            os.rename(moved, lib)
            monkeypatch.setattr(native, "_lib", None)
            monkeypatch.setattr(native, "_load_attempted", False)


class TestG711Subtypes:
    """ALAW/ULAW WAV subtypes — part of libsndfile's format matrix the
    reference accepts via ``sf.check_format`` (``matchering/results.py:29-34``)."""

    @pytest.mark.parametrize("subtype", ["ALAW", "ULAW"])
    def test_wav_roundtrip(self, tmp_path, subtype):
        from matchering_tpu.io import wav

        rng = np.random.RandomState(11)
        x = np.clip(rng.randn(4000, 2) * 0.3, -1, 1)
        path = str(tmp_path / "g711.wav")
        wav.write(path, x, 44100, subtype)
        y, sr = codecs.read(path)  # dispatch must fall back to the numpy codec
        assert sr == 44100 and y.shape == x.shape
        # G.711 is 8-bit log-companded: ~2.4% max error at the top segment
        assert np.abs(y - x).max() < 0.04
        assert np.abs(y - x).mean() < 0.005

    @pytest.mark.parametrize("subtype", ["ALAW", "ULAW"])
    def test_decode_matches_itu_tables(self, subtype):
        """Decode tables must match the canonical ITU-T G.711 expansion
        (validated bit-exact against CPython's audioop when present)."""
        audioop = pytest.importorskip("audioop")
        from matchering_tpu.io import pcm

        codes = bytes(range(256))
        ours = (pcm.DECODERS[subtype](codes) * 32768).astype(np.int32)
        raw = audioop.alaw2lin(codes, 2) if subtype == "ALAW" else audioop.ulaw2lin(codes, 2)
        theirs = np.frombuffer(raw, dtype="<i2").astype(np.int32)
        np.testing.assert_array_equal(ours, theirs)

    def test_result_descriptor_accepts_g711(self, tmp_path):
        r = Result(str(tmp_path / "out.wav"), "ULAW", use_limiter=False)
        assert r.subtype == "ULAW"


class TestRF64:
    def test_read_rf64_with_ds64_sizes(self, tmp_path):
        """RF64 (EBU Tech 3306): riff/data sizes are 0xFFFFFFFF sentinels and
        the true 64-bit sizes live in the ds64 chunk."""
        import struct

        rng = np.random.RandomState(7)
        x = np.clip(rng.randn(3000, 2) * 0.5, -1, 1)
        from matchering_tpu.io import pcm, wav

        payload = pcm.encode_pcm16(x.reshape(-1))
        fmt_body = struct.pack("<HHIIHH", 1, 2, 48000, 48000 * 4, 4, 16)
        ds64_body = struct.pack("<qqqI", 0, len(payload), x.shape[0], 0)
        chunks = (
            struct.pack("<4sI", b"ds64", len(ds64_body)) + ds64_body
            + struct.pack("<4sI", b"fmt ", len(fmt_body)) + fmt_body
            + struct.pack("<4sI", b"data", 0xFFFFFFFF) + payload
        )
        path = str(tmp_path / "big.wav")
        with open(path, "wb") as f:
            f.write(struct.pack("<4sI4s", b"RF64", 0xFFFFFFFF, b"WAVE"))
            f.write(chunks)
        y, sr = codecs.read(path)
        assert sr == 48000 and y.shape == x.shape
        np.testing.assert_allclose(y, x, atol=2**-15)

    def test_ds64_data_size_honored_when_data_not_last(self, tmp_path):
        """The ds64 data size must bound the data chunk even when trailing
        bytes follow it."""
        import struct

        x = np.linspace(-0.5, 0.5, 2000)[:, None].repeat(2, 1)
        from matchering_tpu.io import pcm, wav

        payload = pcm.encode_pcm16(x.reshape(-1))
        fmt_body = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)
        ds64_body = struct.pack("<qqqI", 0, len(payload), x.shape[0], 0)
        chunks = (
            struct.pack("<4sI", b"ds64", len(ds64_body)) + ds64_body
            + struct.pack("<4sI", b"fmt ", len(fmt_body)) + fmt_body
            + struct.pack("<4sI", b"data", 0xFFFFFFFF) + payload + b"JUNKJUNK"
        )
        path = str(tmp_path / "big2.wav")
        with open(path, "wb") as f:
            f.write(struct.pack("<4sI4s", b"RF64", 0xFFFFFFFF, b"WAVE"))
            f.write(chunks)
        y, sr = codecs.read(path)
        assert y.shape == x.shape


class TestW64:
    """Sony Wave64 — the reference reads/writes it natively via libsndfile
    (``matchering/loader.py:35``); here it is a pure numpy codec (io/w64.py)."""

    @pytest.mark.parametrize(
        "subtype, tol",
        [
            ("PCM_16", 2**-15),
            ("PCM_24", 2**-23),
            ("PCM_32", 2**-31),
            ("FLOAT", 2**-24),
            ("DOUBLE", 1e-15),
        ],
    )
    def test_roundtrip(self, tmp_path, rng, subtype, tol):
        from matchering_tpu.io import w64

        x = np.clip(rng.randn(5000, 2) * 0.4, -1, 1)
        path = str(tmp_path / "t.w64")
        w64.write(path, x, 44100, subtype)
        y, sr = codecs.read(path)  # magic dispatch, not extension
        assert sr == 44100 and y.shape == x.shape
        np.testing.assert_allclose(y, x, atol=tol)

    def test_codecs_write_dispatch_and_format_table(self, tmp_path, monkeypatch):
        monkeypatch.setenv("PATH", str(tmp_path))  # no ffmpeg anywhere
        assert codecs.check_format("W64", "PCM_24")
        assert codecs.check_format("W64", "DOUBLE")
        x = np.linspace(-0.5, 0.5, 3000)[:, None].repeat(2, 1)
        r = Result(str(tmp_path / "out.w64"), "PCM_24")
        codecs.write(r.file, x, 96000, r.subtype)
        y, sr = codecs.read(r.file)
        assert sr == 96000
        np.testing.assert_allclose(y, x, atol=2**-23)

    def test_chunk_alignment_is_8_bytes(self, tmp_path):
        """A frame count that makes the data chunk size odd mod 8 must still
        produce a parseable file (chunks pad to 8-byte boundaries)."""
        from matchering_tpu.io import w64

        x = np.ones((1001, 1)) * 0.25
        path = str(tmp_path / "odd.w64")
        w64.write(path, x, 22050, "PCM_16")
        y, sr = w64.read(path)
        assert y.shape == (1001, 1) and sr == 22050


class TestCAF:
    """Apple Core Audio Format — reference parity via libsndfile
    (``matchering/loader.py:35``); pure numpy codec (io/caf.py)."""

    @pytest.mark.parametrize(
        "subtype, tol",
        [
            ("PCM_16", 2**-15),
            ("PCM_24", 2**-23),
            ("FLOAT", 2**-24),
            ("DOUBLE", 1e-15),
            ("ALAW", 0.04),
            ("ULAW", 0.04),
        ],
    )
    def test_roundtrip(self, tmp_path, rng, subtype, tol):
        from matchering_tpu.io import caf

        x = np.clip(rng.randn(4000, 2) * 0.3, -1, 1)
        path = str(tmp_path / "t.caf")
        caf.write(path, x, 48000, subtype)
        y, sr = codecs.read(path)
        assert sr == 48000 and y.shape == x.shape
        np.testing.assert_allclose(y, x, atol=tol)

    def test_little_endian_lpcm_read(self, tmp_path):
        """CAF carries an endianness flag; little-endian lpcm must decode."""
        import struct

        from matchering_tpu.io import pcm

        x = np.linspace(-0.9, 0.9, 2000)[:, None].repeat(2, 1)
        payload = pcm.encode_pcm16(x.reshape(-1))  # little-endian
        desc = struct.pack(">d4sIIIII", 44100.0, b"lpcm", 2, 4, 1, 2, 16)
        path = str(tmp_path / "le.caf")
        with open(path, "wb") as f:
            f.write(b"caff" + struct.pack(">HH", 1, 0))
            f.write(b"desc" + struct.pack(">q", len(desc)) + desc)
            f.write(b"data" + struct.pack(">qI", 4 + len(payload), 0) + payload)
        y, sr = codecs.read(path)
        assert sr == 44100
        np.testing.assert_allclose(y, x, atol=2**-15)

    def test_unknown_data_size_reads_to_eof(self, tmp_path):
        """A data chunk size of -1 means 'to end of file' (streamed CAFs)."""
        import struct

        from matchering_tpu.io import pcm

        x = np.linspace(-0.5, 0.5, 1500)[:, None].repeat(2, 1)
        payload = pcm.encode_pcm16(x.reshape(-1), big_endian=True)
        desc = struct.pack(">d4sIIIII", 44100.0, b"lpcm", 0, 4, 1, 2, 16)
        path = str(tmp_path / "eof.caf")
        with open(path, "wb") as f:
            f.write(b"caff" + struct.pack(">HH", 1, 0))
            f.write(b"desc" + struct.pack(">q", len(desc)) + desc)
            f.write(b"data" + struct.pack(">q", -1) + struct.pack(">I", 0) + payload)
        y, sr = codecs.read(path)
        assert y.shape == x.shape
        np.testing.assert_allclose(y, x, atol=2**-15)

    def test_codecs_write_dispatch_and_format_table(self, tmp_path, monkeypatch):
        monkeypatch.setenv("PATH", str(tmp_path))  # no ffmpeg anywhere
        assert codecs.check_format("CAF", "PCM_24")
        assert codecs.check_format("CAF", "FLOAT")
        x = np.zeros((800, 2))
        r = Result(str(tmp_path / "out.caf"), "FLOAT")
        codecs.write(r.file, x, 44100, r.subtype)
        y, sr = codecs.read(r.file)
        assert y.shape == x.shape


def _encode_oggopus(path, audio, pre_skip_override=None):
    """Test-only OggOpus encoder: libopus packets + hand-rolled Ogg pages
    (RFC 3533 framing, RFC 7845 headers).  48 kHz float input, family 0."""
    import ctypes
    import ctypes.util
    import struct

    lib = ctypes.CDLL(ctypes.util.find_library("opus") or "libopus.so.0")
    lib.opus_encoder_create.restype = ctypes.c_void_p
    lib.opus_encoder_create.argtypes = [
        ctypes.c_int32, ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int)
    ]
    lib.opus_encode_float.restype = ctypes.c_int32
    lib.opus_encode_float.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int32,
    ]
    lib.opus_encoder_destroy.argtypes = [ctypes.c_void_p]

    # Ogg CRC32: poly 0x04C11DB7, MSB-first, zero init, no final xor
    table = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        r = np.uint32(i << 24)
        for _ in range(8):
            r = np.uint32(((int(r) << 1) ^ (0x04C11DB7 if int(r) & 0x80000000 else 0)) & 0xFFFFFFFF)
        table[i] = r

    def crc(data):
        r = 0
        for b in data:
            r = ((r << 8) & 0xFFFFFFFF) ^ int(table[((r >> 24) ^ b) & 0xFF])
        return r

    seq = [0]

    def page(packets, granule, header_type):
        lacing = b""
        body = b""
        for p in packets:
            lacing += bytes([255] * (len(p) // 255) + [len(p) % 255])
            body += p
        hdr = struct.pack(
            "<4sBBqIII B", b"OggS", 0, header_type, granule, 0xBEEF, seq[0], 0, len(lacing)
        ) + lacing
        seq[0] += 1
        full = hdr + body
        c = crc(full)
        return full[:22] + struct.pack("<I", c) + full[26:]

    ch = audio.shape[1]
    err = ctypes.c_int(0)
    enc = lib.opus_encoder_create(48000, ch, 2049, ctypes.byref(err))  # APPLICATION_AUDIO
    assert enc and err.value == 0
    look = ctypes.c_int32(312 if pre_skip_override is None else pre_skip_override)
    try:  # variadic ctl: OPUS_GET_LOOKAHEAD_REQUEST = 4027; pointer args
        # must be wrapped explicitly or ctypes truncates them to c_int
        lib.opus_encoder_ctl(ctypes.c_void_p(enc), ctypes.c_int(4027), ctypes.byref(look))
    except Exception:
        pass
    pre_skip = int(look.value)

    # pad to cover n + pre_skip decoded samples: the codec delays its output
    # by pre_skip, so the tail only flushes through extra trailing frames
    n = audio.shape[0]
    frames = np.zeros(((n + pre_skip + 959) // 960 * 960, ch), dtype=np.float32)
    frames[:n] = audio
    out = (ctypes.c_ubyte * 4096)()
    pages = []
    head = b"OpusHead" + struct.pack("<BBHIhB", 1, ch, pre_skip, 48000, 0, 0)
    tags = b"OpusTags" + struct.pack("<I", 4) + b"test" + struct.pack("<I", 0)
    pages.append(page([head], 0, 0x02))  # BOS
    pages.append(page([tags], 0, 0))
    pkts = []
    try:
        for i in range(0, frames.shape[0], 960):
            block = np.ascontiguousarray(frames[i : i + 960])
            nb = lib.opus_encode_float(
                enc, block.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 960, out, 4096
            )
            assert nb > 0
            pkts.append(bytes(out[:nb]))
    finally:
        lib.opus_encoder_destroy(enc)
    for i, p in enumerate(pkts):
        last = i == len(pkts) - 1
        # granule counts raw decoded samples (incl. the pre-skip region);
        # the final page's is clamped to pre_skip + true length, which is
        # how RFC 7845 signals end trimming
        granule = (pre_skip + n) if last else (i + 1) * 960
        pages.append(page([p], granule, 0x04 if last else 0))
    with open(path, "wb") as f:
        f.write(b"".join(pages))
    return pre_skip


class TestOpusRead:
    """Ogg Opus decode via libopus ctypes (io/native/opus.py) — the
    reference decodes .opus through libsndfile (``matchering/loader.py:35``);
    previously this repo needed an ffmpeg binary for it."""

    @pytest.fixture(autouse=True)
    def _need_libopus(self):
        from matchering_tpu.io.native import opus

        if not opus.available():
            pytest.skip("libopus not present on this host")

    def test_decode_sine(self, tmp_path):
        from matchering_tpu.io.native import opus

        t = np.arange(48000 * 2) / 48000.0
        x = np.stack(
            [0.5 * np.sin(2 * np.pi * 440 * t), 0.5 * np.sin(2 * np.pi * 554 * t)], axis=1
        )
        path = str(tmp_path / "tone.opus")
        _encode_oggopus(path, x)
        assert opus.is_opus(path)
        y, sr = codecs.read(path)  # dispatch must pick opus, not vorbis
        assert sr == 48000
        assert y.shape == x.shape  # granule end-trim recovers the exact length
        # lossy codec: gate on normalized correlation per channel
        for c in range(2):
            a, b = x[:, c], y[:, c]
            corr = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
            assert corr > 0.97, f"channel {c} correlation {corr}"

    def test_lossy_advisory_and_loader(self, tmp_path):
        """The loader must decode .opus natively and fire the lossy event."""
        from matchering_tpu.io import loader

        t = np.arange(24000) / 48000.0
        x = np.stack([0.3 * np.sin(2 * np.pi * 220 * t)] * 2, axis=1)
        path = str(tmp_path / "up.opus")
        _encode_oggopus(path, x)
        assert codecs.is_lossy_container(path)
        y, sr = loader.load(path, "target", str(tmp_path))
        assert sr == 48000 and y.shape[0] == x.shape[0]

    def test_mono(self, tmp_path):
        from matchering_tpu.io.native import opus

        t = np.arange(9600) / 48000.0
        x = (0.4 * np.sin(2 * np.pi * 330 * t))[:, None]
        path = str(tmp_path / "mono.opus")
        _encode_oggopus(path, x)
        y, sr = opus.read_opus(path)
        assert y.shape == x.shape and sr == 48000


class TestOpusWrite:
    """Native Ogg Opus ENCODE (io/native/opus.py write_opus) — closes the
    last ffmpeg dependency: the reference writes .opus through libsndfile
    (``matchering/saver.py:32``)."""

    @pytest.fixture(autouse=True)
    def _need_encoder(self):
        from matchering_tpu.io.native import opus

        if not opus.write_available():
            pytest.skip("libopus encoder not present on this host")

    def test_roundtrip_48k(self, tmp_path):
        from matchering_tpu.io.native import opus

        sr = 48000
        n = 2 * sr
        t = np.arange(n) / sr
        x = np.stack(
            [0.5 * np.sin(2 * np.pi * 440 * t), 0.5 * np.sin(2 * np.pi * 554 * t)], 1
        )
        path = str(tmp_path / "rt.opus")
        opus.write_opus(path, x, sr)
        assert opus.is_opus(path)
        y, rate = opus.read_opus(path)
        assert rate == 48000 and y.shape == x.shape  # exact length: end-trim works
        err = x - y
        snr = 10 * np.log10(np.sum(x**2) / np.sum(err**2))
        assert snr > 25.0, snr  # lossy codec, but recognizably the signal

    def test_44k_input_resamples_to_48k(self, tmp_path):
        from matchering_tpu.io.native import opus

        sr = 44100
        n = sr  # 1 s
        x = np.stack([0.4 * np.sin(2 * np.pi * 440 * np.arange(n) / sr)] * 2, 1)
        path = str(tmp_path / "rt44.opus")
        opus.write_opus(path, x, sr)
        y, rate = opus.read_opus(path)
        assert rate == 48000
        assert y.shape[0] == n * 48000 // 44100

    def test_ogg_crc_matches_libogg(self, tmp_path):
        """Our pure-Python Ogg CRC must agree with libogg's (via a page the
        vorbis writer muxed through ogg_stream_flush)."""
        import struct

        from matchering_tpu.io.native import opus, vorbis

        if not vorbis.available():
            pytest.skip("libvorbis/libogg not present")
        sr = 44100
        x = np.stack([0.3 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)] * 2, 1)
        path = str(tmp_path / "crc.ogg")
        vorbis.write_ogg(path, x, sr)
        buf = open(path, "rb").read()
        pos, checked = 0, 0
        while pos + 27 <= len(buf) and buf[pos : pos + 4] == b"OggS":
            nsegs = buf[pos + 26]
            body_len = sum(buf[pos + 27 : pos + 27 + nsegs])
            page = bytearray(buf[pos : pos + 27 + nsegs + body_len])
            stored = struct.unpack_from("<I", page, 22)[0]
            struct.pack_into("<I", page, 22, 0)
            assert opus._ogg_crc(bytes(page)) == stored
            checked += 1
            pos += 27 + nsegs + body_len
        assert checked >= 3

    def test_codecs_dispatch_and_result_spec(self, tmp_path, monkeypatch):
        monkeypatch.setenv("PATH", str(tmp_path))  # prove no ffmpeg involved
        assert codecs.check_format("OPUS", "OPUS")
        r = Result(str(tmp_path / "master.opus"), "OPUS")
        x = np.zeros((48000, 2))
        x[:, 0] = 0.1 * np.sin(2 * np.pi * 330 * np.arange(48000) / 48000)
        codecs.write(r.file, x, 48000, r.subtype)
        y, sr = codecs.read(r.file)
        assert sr == 48000 and y.shape == x.shape


class TestOggMuxEdges:
    def test_lacing_255_boundary_roundtrips(self):
        """Packets whose length is an exact multiple of 255 need a 0-lace
        terminator (RFC 3533); the mux's pages must demux back exactly."""
        from matchering_tpu.io.native import opus

        for length in (0, 1, 254, 255, 256, 510, 1000):
            pkt = bytes(range(256)) * 4
            pkt = pkt[:length]
            page = opus._ogg_page([pkt], 7, 42, 0, 0x02)
            # demux with the read-side parser
            packets, granule = opus._demux_ogg(page)
            assert packets == [pkt], length
            assert granule == 7

    def test_multi_packet_page_roundtrip(self):
        from matchering_tpu.io.native import opus

        pkts = [b"a" * 10, b"b" * 255, b"c" * 300, b""]
        page = opus._ogg_page(pkts, 99, 1, 3, 0x00)
        got, granule = opus._demux_ogg(page)
        assert got == pkts and granule == 99
