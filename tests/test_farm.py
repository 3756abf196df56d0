"""End-to-end ``process_batch`` (VERDICT r1 item 6): >=3 mixed-length file
pairs through one farm dispatch — loads, checks, buckets, masters at true
lengths, trims, saves, previews — and each job's files match what the
single-pair ``process()`` writes for the same pair.
"""

import os

import numpy as np
import pytest

import matchering_tpu as mg
from matchering_tpu.io import codecs, wav as wavio


@pytest.fixture(scope="module")
def file_pairs(tmp_path_factory):
    folder = tmp_path_factory.mktemp("farm")
    sr = 44100
    pairs = []
    for i, (t_sec, r_sec) in enumerate([(9.0, 11.0), (14.0, 12.5), (20.0, 16.0)]):
        r = np.random.RandomState(100 + i)

        def mk(seconds, amp):
            n = int(seconds * sr)
            env = 0.5 + 0.5 * np.sin(np.arange(n) / sr * 1.5)[:, None]
            return np.clip(amp * r.randn(n, 2) * env, -0.99, 0.99)

        tp = str(folder / f"t{i}.wav")
        rp = str(folder / f"r{i}.wav")
        wavio.write(tp, mk(t_sec, 0.22), sr, "PCM_16")
        wavio.write(rp, mk(r_sec, 0.8), sr, "PCM_16")
        pairs.append((tp, rp))
    return folder, pairs


def test_process_batch_matches_process(file_pairs, tmp_path, snr):
    folder, pairs = file_pairs
    cfg = mg.Config(dtype="float64")

    jobs = []
    for i, (tp, rp) in enumerate(pairs):
        jobs.append(
            mg.PairJob(
                target=tp,
                reference=rp,
                results=[
                    mg.pcm16(str(tmp_path / f"batch{i}.wav")),
                    mg.Result(
                        str(tmp_path / f"batch{i}_raw.wav"),
                        "FLOAT",
                        use_limiter=False,
                        normalize=False,
                    ),
                ],
                preview_target=(
                    mg.pcm16(str(tmp_path / "p_t.flac")) if i == 1 else None
                ),
                preview_result=(
                    mg.pcm16(str(tmp_path / "p_r.flac")) if i == 1 else None
                ),
            )
        )
    mg.process_batch(jobs, cfg)

    for i, (tp, rp) in enumerate(pairs):
        single = str(tmp_path / f"single{i}.wav")
        single_raw = str(tmp_path / f"single{i}_raw.wav")
        mg.process(
            tp,
            rp,
            [
                mg.pcm16(single),
                mg.Result(single_raw, "FLOAT", use_limiter=False, normalize=False),
            ],
            cfg,
        )
        for batch_file, single_file, gate in [
            (str(tmp_path / f"batch{i}.wav"), single, 80.0),
            (str(tmp_path / f"batch{i}_raw.wav"), single_raw, 110.0),
        ]:
            got, gsr = codecs.read(batch_file)
            want, wsr = codecs.read(single_file)
            assert gsr == wsr == 44100
            assert got.shape == want.shape, (batch_file, got.shape, want.shape)
            measured = snr(want, got)
            assert measured > gate, (batch_file, measured)

    for preview in ["p_t.flac", "p_r.flac"]:
        path = str(tmp_path / preview)
        assert os.path.exists(path) and os.path.getsize(path) > 1000


def test_process_batch_on_mesh_pads_job_count(file_pairs, tmp_path, snr):
    """3 jobs over an 8-row pairs mesh: the batch is transparently padded
    to the mesh and every real job still gets its file."""
    from matchering_tpu.parallel.mesh import single_axis_mesh

    folder, pairs = file_pairs
    cfg = mg.Config(dtype="float64")
    jobs = [
        mg.PairJob(
            target=tp,
            reference=rp,
            results=[mg.pcm16(str(tmp_path / f"mesh{i}.wav"))],
        )
        for i, (tp, rp) in enumerate(pairs)
    ]
    mg.process_batch(jobs, cfg, mesh=single_axis_mesh("pairs"))
    for i, (tp, rp) in enumerate(pairs):
        out, sr = codecs.read(str(tmp_path / f"mesh{i}.wav"))
        assert sr == 44100 and out.shape[0] > 0


def test_process_batch_rejects_empty_and_outputless(tmp_path, file_pairs):
    _, pairs = file_pairs
    with pytest.raises(RuntimeError):
        mg.process_batch([])
    with pytest.raises(RuntimeError):
        mg.process_batch([mg.PairJob(target=pairs[0][0], reference=pairs[0][1])])


def test_dispatch_strategies_agree(file_pairs, tmp_path, snr):
    """Explicit dispatch="vmapped" (no mesh) and the pipelined default
    produce the same mastered files; bogus strategies are rejected."""
    folder, pairs = file_pairs
    cfg = mg.Config(dtype="float64")

    def run(tag, **kw):
        jobs = [
            mg.PairJob(
                target=tp,
                reference=rp,
                results=[mg.pcm16(str(tmp_path / f"{tag}{i}.wav"))],
            )
            for i, (tp, rp) in enumerate(pairs)
        ]
        mg.process_batch(jobs, cfg, **kw)

    run("pipe", dispatch="pipelined")
    run("vmap", dispatch="vmapped")
    for i in range(len(pairs)):
        a, _ = codecs.read(str(tmp_path / f"pipe{i}.wav"))
        b, _ = codecs.read(str(tmp_path / f"vmap{i}.wav"))
        assert a.shape == b.shape
        assert snr(a, b) > 120.0, (i, snr(a, b))

    with pytest.raises(ValueError):
        run("bad", dispatch="sideways")
    with pytest.raises(ValueError):
        # pipelined runs whole pairs on single devices — a time axis (pairs
        # spanning devices) is the one mesh shape it cannot serve
        from matchering_tpu.parallel.mesh import make_mesh

        run("badmesh", dispatch="pipelined", mesh=make_mesh(pairs=2, time=4))
    with pytest.raises(ValueError, match="pairs"):
        # any mesh without a 'pairs' axis is rejected up front with a clear
        # message (it used to fall through to an opaque unpacking error)
        from matchering_tpu.parallel.mesh import single_axis_mesh

        run("noaxis", mesh=single_axis_mesh("time"))


def test_pipelined_round_robin_over_mesh_devices(file_pairs, tmp_path, snr):
    """VERDICT r2 item 1: pipelined dispatch with a pairs-only mesh
    round-robins whole pairs over the mesh devices (each chip runs the
    measured-fastest single-chip strategy) and every job's file matches the
    single-pair ``process()`` output."""
    from matchering_tpu.parallel.mesh import single_axis_mesh

    folder, pairs = file_pairs
    cfg = mg.Config(dtype="float64")
    mesh = single_axis_mesh("pairs")  # all 8 virtual devices
    jobs = [
        mg.PairJob(
            target=tp,
            reference=rp,
            results=[mg.pcm16(str(tmp_path / f"rr{i}.wav"))],
        )
        for i, (tp, rp) in enumerate(pairs)
    ]
    mg.process_batch(jobs, cfg, mesh=mesh, dispatch="pipelined")
    for i, (tp, rp) in enumerate(pairs):
        single = str(tmp_path / f"rr_single{i}.wav")
        mg.process(tp, rp, [mg.pcm16(single)], cfg)
        got, gsr = codecs.read(str(tmp_path / f"rr{i}.wav"))
        want, wsr = codecs.read(single)
        assert gsr == wsr and got.shape == want.shape
        measured = snr(want, got)
        assert measured > 120.0, (i, measured)


def test_master_pairs_devices_land_on_their_devices(file_pairs, snr):
    """The round-robin actually places pair i's program on devices[i % n]."""
    import jax

    from matchering_tpu.parallel.batch import master_pairs

    sr = 44100
    r = np.random.RandomState(5)
    n = 6 * sr
    targets = [np.clip(r.randn(n, 2) * 0.2, -1, 1) for _ in range(4)]
    references = [np.clip(r.randn(n, 2) * 0.7, -1, 1) for _ in range(4)]
    devices = jax.devices()[:2]
    outs = master_pairs(
        targets, references, mg.Config(dtype="float64"), devices=devices
    )
    for i, out in enumerate(outs):
        placed = list(out.result.devices())
        assert placed == [devices[i % 2]], (i, placed)
    # and the numerics equal the default-device dispatch
    base = master_pairs(targets, references, mg.Config(dtype="float64"))
    for got, want in zip(outs, base):
        assert snr(np.asarray(want.result), np.asarray(got.result)) > 200.0


def test_process_batch_on_2d_farm_mesh(file_pairs, tmp_path, snr):
    """A (pairs=2, time=4) mesh routes through the 2-D master_farm: jobs
    are padded to the pairs rows, time-sharded inside, and every job's
    file still matches the single-pair master."""
    from matchering_tpu.parallel.mesh import make_mesh

    folder, pairs = file_pairs
    cfg = mg.Config(dtype="float64")
    jobs = [
        mg.PairJob(
            target=tp,
            reference=rp,
            results=[mg.pcm16(str(tmp_path / f"farm2d{i}.wav"))],
        )
        for i, (tp, rp) in enumerate(pairs)
    ]
    mg.process_batch(jobs, cfg, mesh=make_mesh(pairs=2, time=4))
    for i, (tp, rp) in enumerate(pairs):
        single = str(tmp_path / f"farm2d_single{i}.wav")
        mg.process(tp, rp, [mg.pcm16(single)], cfg)
        got, gsr = codecs.read(str(tmp_path / f"farm2d{i}.wav"))
        want, wsr = codecs.read(single)
        assert gsr == wsr and got.shape == want.shape
        measured = snr(want, got)
        assert measured > 80.0, (i, measured)


def test_process_batch_stages_uniform_int_pcm(tmp_path, monkeypatch):
    """File-ingesting batches of integer-PCM WAVs keep the int16 payload
    through bucket_pad (uniform dtype), and mixed-dtype batches fall back
    to scaled float64 — never raw codes promoted unscaled."""
    import matchering_tpu.farm as farm
    from matchering_tpu.io import wav
    from matchering_tpu.parallel import batch as batch_mod

    sr, n = 44100, 5 * 44100
    rng = np.random.RandomState(31)
    paths = {}
    for name, subtype in (
        ("t0", "PCM_16"), ("r0", "PCM_16"), ("t1", "PCM_16"), ("r1", "FLOAT"),
    ):
        x = np.clip(0.4 * rng.randn(n, 2), -1, 1)
        p = str(tmp_path / f"{name}.wav")
        wav.write(p, x, sr, subtype)
        paths[name] = p

    staged = []
    orig = batch_mod.bucket_pad

    def spy(arrays, **kw):
        staged.append([a.dtype for a in arrays])
        return orig(arrays, **kw)

    monkeypatch.setattr(batch_mod, "bucket_pad", spy)

    jobs = [
        mg.PairJob(
            target=paths["t0"],
            reference=paths["r0"],
            results=[mg.pcm16(str(tmp_path / "o0.wav"))],
        ),
        mg.PairJob(
            target=paths["t1"],
            reference=paths["r1"],
            results=[mg.pcm16(str(tmp_path / "o1.wav"))],
        ),
    ]
    mg.process_batch(jobs, mg.Config())
    assert (tmp_path / "o0.wav").exists() and (tmp_path / "o1.wav").exists()
    t_dtypes, r_dtypes = staged
    # targets all PCM_16 -> raw ints stay; references mixed -> all float64
    assert t_dtypes == [np.dtype(np.int16)] * 2
    assert r_dtypes == [np.dtype(np.float64)] * 2

    # parity: batch output tracks the single process() output for pair 0
    # (the batch runs the bucket-padded dynamic-length graph, so outputs
    # agree to SNR, not bit-for-bit — same gate as TestBatchFiles)
    from matchering_tpu.io import codecs

    single = str(tmp_path / "single0.wav")
    mg.process(paths["t0"], paths["r0"], [mg.pcm16(single)], mg.Config())
    a, _ = codecs.read(single)
    b, _ = codecs.read(str(tmp_path / "o0.wav"))
    err = a - b
    snr = 10 * np.log10(np.sum(a**2) / max(np.sum(err**2), 1e-300))
    assert snr > 80.0, snr
