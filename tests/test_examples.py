"""Smoke-run the example scripts end-to-end (VERDICT r1 weak item 8).

Each example accepts [target, reference, out_prefix] argv and must run to
completion, producing its output files, when pointed at real (generated)
WAVs.  They execute in-process via runpy so they inherit the CPU test
backend and the shared jit cache.
"""

import os
import runpy
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def wav_pair(tmp_path_factory):
    from matchering_tpu.io import wav as wavio

    folder = tmp_path_factory.mktemp("examples")
    sr = 44100
    n = 8 * sr
    r = np.random.RandomState(7)
    t = np.arange(n) / sr
    target = (0.25 * np.sin(2 * np.pi * 220 * t) + 0.05 * r.randn(n))[:, None]
    target = np.repeat(target, 2, axis=1)
    reference = (0.8 * np.sign(np.sin(2 * np.pi * 110 * t)) + 0.02 * r.randn(n))[
        :, None
    ]
    reference = np.clip(np.repeat(reference, 2, axis=1), -0.98, 0.98)
    tgt = str(folder / "target.wav")
    ref = str(folder / "reference.wav")
    wavio.write(tgt, target, sr, "PCM_16")
    wavio.write(ref, reference, sr, "PCM_16")
    return tgt, ref, folder


@pytest.mark.parametrize(
    "script, outputs",
    [
        ("basic.py", ["{p}_16bit.wav", "{p}_24bit.wav"]),
        (
            "with_preview.py",
            ["{p}_16bit.wav", "{p}_preview_before.flac", "{p}_preview_after.flac"],
        ),
        (
            "advanced_results.py",
            ["{p}_16bit.wav", "{p}_no_limiter.flac", "{p}_no_limiter_raw_level.aiff"],
        ),
        ("edited_config.py", ["{p}_16bit.wav", "{p}_24bit.wav"]),
        ("advanced_text_output.py", ["{p}_16bit.wav"]),
    ],
)
def test_example_runs(wav_pair, tmp_path, monkeypatch, script, outputs):
    import matchering_tpu as mg

    tgt, ref, _ = wav_pair
    prefix = str(tmp_path / "out")
    path = os.path.join(REPO, "examples", script)
    monkeypatch.setattr(sys, "argv", [path, tgt, ref, prefix])
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        mg.log()  # restore the silent default handlers
    for out in outputs:
        produced = out.format(p=prefix)
        assert os.path.exists(produced), produced
        assert os.path.getsize(produced) > 1000, produced


def test_farm_example_runs(wav_pair, tmp_path, monkeypatch):
    import matchering_tpu as mg

    tgt, ref, _ = wav_pair
    path = os.path.join(REPO, "examples", "tpu_mastering_farm.py")
    monkeypatch.setattr(sys, "argv", [path, tgt, ref, tgt, ref, str(tmp_path)])
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        mg.log()
    for i in range(2):
        out = str(tmp_path / f"master_{i}.wav")
        assert os.path.exists(out) and os.path.getsize(out) > 1000
