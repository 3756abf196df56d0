"""CLI surface (python -m matchering_tpu) — the reference delegates this to
the external matchering-cli repo; here it is part of the package."""

import numpy as np
import pytest

import matchering_tpu as mg
from matchering_tpu.__main__ import build_parser, main
from matchering_tpu.io import codecs, wav as wavio


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    sr = 44100
    t = np.arange(10 * sr) / sr
    rng = np.random.RandomState(0)
    tgt = np.stack([0.3 * np.sin(2 * np.pi * 220 * t) + 0.02 * rng.randn(t.size)] * 2, 1)
    ref = np.stack([0.7 * np.sign(np.sin(2 * np.pi * 110 * t))] * 2, 1)
    tp, rp = str(d / "t.wav"), str(d / "r.wav")
    wavio.write(tp, tgt, sr, "PCM_16")
    wavio.write(rp, ref, sr, "PCM_16")
    return d, tp, rp


class TestParser:
    def test_defaults(self):
        args = build_parser().parse_args(["t.wav", "r.wav", "o.wav"])
        assert args.bit == "16" and not args.no_limiter and not args.quiet

    def test_flags(self):
        args = build_parser().parse_args(
            ["t.wav", "r.wav", "o.flac", "-b", "24", "--no_limiter", "--quiet"]
        )
        assert args.bit == "24" and args.no_limiter and args.quiet


class TestCliRuns:
    def test_basic_master(self, files):
        d, tp, rp = files
        out = str(d / "out.wav")
        assert main([tp, rp, out, "--quiet"]) == 0
        y, sr = codecs.read(out)
        assert sr == 44100 and y.shape[0] == 10 * 44100

    def test_no_limiter_flac(self, files):
        d, tp, rp = files
        out = str(d / "out.flac")
        assert main([tp, rp, out, "-b", "24", "--no_limiter", "--quiet"]) == 0
        y, sr = codecs.read(out)
        assert sr == 44100
        # normalized no-limiter variant peaks at the threshold
        assert abs(np.abs(y).max() - mg.Config().threshold) < 1e-3
