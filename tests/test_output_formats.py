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
from matchering_tpu.results import Result


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
    def test_format_table_requires_ffmpeg(self, monkeypatch, tmp_path):
        monkeypatch.setenv("PATH", str(tmp_path))  # nothing on PATH
        assert not codecs.check_format("OGG", "VORBIS")
        with pytest.raises(TypeError):
            Result("out.ogg", "VORBIS")

    def test_ogg_vorbis_result_roundtrip(self, fake_ffmpeg, tmp_path, rng):
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
    def test_other_ffmpeg_formats_accepted(self, fake_ffmpeg, tmp_path, name, subtype):
        result = Result(str(tmp_path / name), subtype)
        codecs.write(result.file, np.zeros((1000, 2)), 44100, result.subtype)
        assert os.path.getsize(result.file) > 0

    def test_bad_subtype_rejected(self, fake_ffmpeg):
        with pytest.raises(TypeError):
            Result("out.ogg", "PCM_16")  # OGG carries VORBIS only


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
