"""Multi-host execution scaffolding (SURVEY.md §5.8 — all-new design; the
reference is a single numpy process).

Layout doctrine: the ``pairs`` axis is embarrassingly parallel, so it maps
to the *outer* interconnect (across hosts / DCN); the ``time`` axis carries
halo exchange and carried scans, so it maps to the *inner* interconnect
(a host's own chips / ICI).  :func:`global_mesh` builds exactly that
process-major device grid once :func:`initialize` has brought the cluster
up.

Usage, one process per host::

    from matchering_tpu.parallel import launch
    launch.initialize(coordinator_address="host0:8476",
                      num_processes=N, process_id=i)   # or env-driven
    mesh = launch.global_mesh(time=jax.local_device_count())
    out = launch.master_batch_distributed(local_targets, local_references,
                                          t_lens, r_lens, config, mesh)
    # each process encodes the pairs it owns:
    for shard_index, result in launch.local_results(out.result):
        ...

On TPU pods, ``initialize()`` with no arguments picks the cluster topology
up from the environment (the standard ``jax.distributed`` auto-detection).
A 2-process CPU self-test of this exact flow runs via::

    python -m matchering_tpu.parallel.launch selftest --processes 2

(spawns the workers, checks N-process output == single-process output).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

_COORD_ENV = "MATCHERING_TPU_COORDINATOR"


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Bring up the multi-process runtime (idempotent).

    Arguments fall back to the environment: ``MATCHERING_TPU_COORDINATOR``
    plus the standard ``jax.distributed`` variables; with everything absent
    and a cloud TPU environment, JAX auto-detects the topology.  On a
    single process this is a no-op.
    """
    import jax

    if jax.distributed.is_initialized():
        return
    coordinator_address = coordinator_address or os.environ.get(_COORD_ENV)
    if coordinator_address is None and num_processes is None:
        # nothing to do for explicit single-process use; cloud TPU
        # environments auto-detect via initialize() with no arguments only
        # when the env advertises a cluster
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def global_mesh(pairs: Optional[int] = None, time: int = 1):
    """A ``(pairs, time)`` mesh over every device in the cluster,
    process-major: each process's local devices fill whole consecutive
    ``pairs`` rows, so the pairs axis crosses hosts (DCN) only between
    processes and the time axis stays on one host's chips (ICI)."""
    import jax
    from jax.sharding import Mesh

    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devices)
    if n % time:
        raise ValueError(f"time={time} does not divide {n} devices")
    if pairs is None:
        pairs = n // time
    if pairs * time != n:
        raise ValueError(f"mesh {pairs}x{time} != {n} devices")
    local = jax.local_device_count()
    if time > local:
        raise ValueError(
            f"time={time} exceeds {local} local devices — the time axis "
            "must stay within one host (ICI)"
        )
    if local % time:
        raise ValueError(
            f"time={time} does not divide the {local} local devices — a "
            "pairs row would straddle two hosts, putting time-axis halo "
            "exchange on DCN and breaking the process-major row ownership "
            "that local_pair_slice relies on"
        )
    grid = np.asarray(devices).reshape(pairs, time)
    return Mesh(grid, axis_names=("pairs", "time"))


def local_pair_slice(mesh, total_pairs: int) -> Tuple[int, int]:
    """[start, stop) of the batch rows this process owns under ``mesh``'s
    pairs axis (process-major by construction)."""
    import jax

    pairs = mesh.shape["pairs"]
    if total_pairs % pairs:
        raise ValueError(f"{total_pairs} pairs do not tile the {pairs}-row mesh")
    per_row = total_pairs // pairs
    rows_per_proc = pairs // jax.process_count()
    start = jax.process_index() * rows_per_proc * per_row
    return start, start + rows_per_proc * per_row


def master_batch_distributed(
    targets_local: np.ndarray,
    references_local: np.ndarray,
    target_lengths_local: Sequence[int],
    reference_lengths_local: Sequence[int],
    config=None,
    mesh=None,
    need_default: bool = True,
    need_no_limiter: bool = False,
    need_no_limiter_normalized: bool = False,
):
    """Data-parallel mastering across processes: every process passes the
    bucket-padded pairs it owns (identical bucket shapes everywhere — see
    :func:`agree_bucket`), the global batch is assembled from the local
    shards, and one jitted program runs over the whole mesh.  Returns the
    global ``MasterOutput``; pull out the locally-owned results with
    :func:`local_results`."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..config import Config
    from .batch import _master_vmapped

    config = config or Config()
    if mesh is None:
        mesh = global_mesh()
    data_sharding = NamedSharding(mesh, P("pairs", None, None))
    length_sharding = NamedSharding(mesh, P("pairs"))
    targets = jax.make_array_from_process_local_data(data_sharding, targets_local)
    references = jax.make_array_from_process_local_data(
        data_sharding, references_local
    )
    t_lens = jax.make_array_from_process_local_data(
        length_sharding, np.asarray(target_lengths_local, np.int32)
    )
    r_lens = jax.make_array_from_process_local_data(
        length_sharding, np.asarray(reference_lengths_local, np.int32)
    )

    from ..ops import smoothing

    interp_ops = smoothing.operator_arrays_for_config(config)
    return _master_vmapped(
        targets,
        references,
        t_lens,
        r_lens,
        interp_ops,
        config,
        need_default,
        need_no_limiter,
        need_no_limiter_normalized,
    )


def local_results(global_array) -> List[Tuple[int, np.ndarray]]:
    """(global batch row, host array) for every output row this process
    owns — the save-side counterpart of the host-sharded load.

    Works for pure pairs sharding (each shard carries whole rows) and for
    the 2-D ``(pairs, time)`` farm, where a row arrives as ``time`` shards
    that are stitched back together along the sample axis (the time axis is
    local to one host by :func:`global_mesh` construction, so every owned
    row is fully addressable)."""
    pieces = {}
    for shard in global_array.addressable_shards:
        row0 = shard.index[0].start or 0
        col0 = (shard.index[1].start or 0) if len(shard.index) > 1 else 0
        data = np.asarray(shard.data)
        for i in range(data.shape[0]):
            pieces.setdefault(row0 + i, {})[col0] = data[i]
    rows = []
    for row, chunks in sorted(pieces.items()):
        parts = [chunks[c] for c in sorted(chunks)]
        rows.append((row, parts[0] if len(parts) == 1 else np.concatenate(parts)))
    return rows


def master_farm_distributed(
    targets_local: np.ndarray,
    references_local: np.ndarray,
    target_lengths_global: Sequence[int],
    reference_lengths_global: Sequence[int],
    config=None,
    mesh=None,
    need_default: bool = True,
    need_no_limiter: bool = False,
    need_no_limiter_normalized: bool = False,
):
    """The 2-D ``(pairs, time)`` farm across processes: pairs cross hosts
    (DCN), time blocks stay on each host's local chips (ICI).

    Every process passes the bucket-padded pairs it owns
    (:func:`local_pair_slice` rows of the global batch) plus the *global*
    length lists (small host metadata every job submitter knows); the global
    batch is assembled from the local shards and runs through the
    time-sharded ``timeshard.master_farm`` body.  Returns the global
    ``MasterOutput`` — pull owned rows with :func:`local_results`, which
    stitches each row's time shards back together."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..config import Config
    from .timeshard import master_farm

    config = config or Config()
    if mesh is None:
        mesh = global_mesh(time=jax.local_device_count())
    data_sharding = NamedSharding(mesh, P("pairs", None, None))
    targets = jax.make_array_from_process_local_data(data_sharding, targets_local)
    references = jax.make_array_from_process_local_data(
        data_sharding, references_local
    )
    return master_farm(
        targets,
        references,
        config,
        mesh=mesh,
        need_default=need_default,
        need_no_limiter=need_no_limiter,
        need_no_limiter_normalized=need_no_limiter_normalized,
        target_lengths=target_lengths_global,
        reference_lengths=reference_lengths_global,
    )


def agree_bucket(local_max_length: int, multiple: int = 1 << 18) -> int:
    """Global bucket length: all-gather each process's longest track and
    round the global maximum up to ``multiple`` — every process must pad to
    the same shape before :func:`master_batch_distributed`."""
    import jax

    if jax.process_count() == 1:
        longest = local_max_length
    else:
        from jax.experimental import multihost_utils

        longest = int(
            np.max(multihost_utils.process_allgather(np.int64(local_max_length)))
        )
    return -(-longest // multiple) * multiple


# ---------------------------------------------------------------------------
# Self-test: N CPU processes vs the single-process answer


def _selftest_worker(
    process_id: int,
    num_processes: int,
    port: int,
    time: int = 1,
    pairs: Optional[int] = None,
    dtype: str = "float64",
    check: Optional[int] = None,
    encode: int = 0,
    report_path: Optional[str] = None,
) -> None:
    """One CPU worker of the distributed selftest.

    Defaults reproduce the original selftest (one pair per mesh row,
    ~3-5 s float64 tracks, every pair checked).  The scale knobs run the
    BASELINE acceptance configs (1024-pair farm): ``pairs`` overrides the
    global batch size with short (~0.6-1 s) tracks, ``check`` limits the
    single-process oracle comparison to an evenly-sampled subset (the full
    check is O(pairs) single-pair graphs), ``encode`` writes that many
    sampled owned results to WAV (ownership + encode proof), and
    ``report_path`` makes each process dump a JSON row with wall times."""
    import time as _time

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    import jax.numpy as jnp

    from ..config import Config
    from ..stages import master_graph
    from .batch import bucket_pad

    config = Config(dtype=dtype)
    sr = config.internal_sample_rate
    scale_mode = pairs is not None
    total_pairs = pairs if scale_mode else len(jax.devices()) // time
    if scale_mode:
        secs = [0.6 + 0.05 * (i % 8) for i in range(total_pairs)]
    else:
        secs = [3.0 + 0.7 * i for i in range(total_pairs)]

    np_dtype = np.dtype(dtype)

    def synth(seed: int, seconds: float, amp: float) -> np.ndarray:
        r = np.random.RandomState(seed)
        n = int(seconds * sr)
        env = 0.5 + 0.5 * np.sin(np.arange(n) / sr * 2.0)[:, None]
        return np.clip(amp * r.randn(n, 2) * env, -0.99, 0.99).astype(np_dtype)

    targets = [synth(10 + i, secs[i], 0.25) for i in range(total_pairs)]
    references = [synth(50 + i, secs[-1 - i], 0.85) for i in range(total_pairs)]
    multiple = 1 << 15 if scale_mode else 1 << 16
    t_all, t_lens = bucket_pad(targets, multiple=multiple)
    r_all, r_lens = bucket_pad(references, multiple=multiple)

    mesh = global_mesh(time=time)
    start, stop = local_pair_slice(mesh, total_pairs)
    t_start = _time.perf_counter()
    if time > 1:
        # pairs cross the processes (DCN), time blocks stay on this
        # process's devices (ICI) — the exact configuration the
        # global_mesh row-straddle guards exist for (VERDICT r2 item 5)
        out = master_farm_distributed(
            t_all[start:stop],
            r_all[start:stop],
            t_lens,
            r_lens,
            config,
            mesh,
        )
    else:
        out = master_batch_distributed(
            t_all[start:stop],
            r_all[start:stop],
            t_lens[start:stop],
            r_lens[start:stop],
            config,
            mesh,
        )

    owned = local_results(out.result)
    # force materialization of every owned row before stopping the clock
    n_owned = len(owned)
    wall_s = _time.perf_counter() - t_start

    # float64 keeps the original exactness gate; float32 compares against
    # the float64 single-process graph, so the gate is the f32 pipeline's
    # accuracy floor (the dtype-gate suite holds it above 95 dB)
    gate_db = 100.0 if dtype == "float64" else 90.0
    oracle_config = Config(dtype="float64")
    if check is None:
        checked = list(range(n_owned))
    else:
        stride = max(1, n_owned // max(1, check))
        checked = list(range(0, n_owned, stride))[:check]

    failures = []
    snrs = []
    for k in checked:
        row, got = owned[k]
        expected = np.asarray(
            master_graph(
                jnp.asarray(targets[row], jnp.float64),
                jnp.asarray(references[row], jnp.float64),
                oracle_config,
            ).result
        )
        err = expected - got[: t_lens[row]]
        denom = float(np.sum(err * err))
        snr = np.inf if denom == 0 else 10.0 * np.log10(np.sum(expected**2) / denom)
        snrs.append(snr)
        print(f"[proc {process_id}] pair {row}: {snr:.1f} dB", flush=True)
        if snr < gate_db:
            failures.append((row, snr))

    encoded = []
    if encode:
        import tempfile

        from ..io.saver import save

        enc_dir = tempfile.mkdtemp(prefix=f"mtpu_farm_p{process_id}_")
        stride = max(1, n_owned // encode)
        for k in list(range(0, n_owned, stride))[:encode]:
            row, got = owned[k]
            path = os.path.join(enc_dir, f"pair{row:04d}.wav")
            save(path, got[: t_lens[row]], sr, "PCM_16", "result")
            encoded.append(path)
        print(f"[proc {process_id}] encoded {len(encoded)} results", flush=True)

    if report_path:
        import json

        row_report = {
            "process": process_id,
            "processes": num_processes,
            "devices_per_process": jax.local_device_count(),
            "time_axis": time,
            "total_pairs": total_pairs,
            "owned_pairs": n_owned,
            "bucket_samples": int(t_all.shape[1]),
            "dtype": dtype,
            "wall_s": round(wall_s, 2),
            "audio_seconds_total": round(float(np.sum(secs)), 1),
            "checked": len(checked),
            "min_snr_db": round(min(snrs), 1) if snrs else None,
            "encoded": encoded,
        }
        with open(f"{report_path}.proc{process_id}.json", "w") as f:
            json.dump(row_report, f, indent=2)
            f.write("\n")

    if failures:
        raise SystemExit(f"[proc {process_id}] SELFTEST FAILED: {failures}")
    print(f"[proc {process_id}] SELFTEST OK", flush=True)


def run_selftest(
    num_processes: int = 2,
    devices_per_process: int = 2,
    time: int = 1,
    pairs: Optional[int] = None,
    dtype: str = "float64",
    check: Optional[int] = None,
    encode: int = 0,
    report_path: Optional[str] = None,
    timeout: float = 600,
) -> None:
    """Spawn ``num_processes`` CPU workers and verify the distributed farm
    reproduces the single-process master for every pair.

    ``time`` > 1 exercises the 2-D farm: pairs sharded across the processes
    while each pair's time blocks shard over that process's own devices
    (e.g. ``--processes 2 --devices_per_process 4 --time 2`` builds a
    (pairs=4, time=2) mesh with rows crossing the process boundary).

    The scale knobs (``pairs``/``dtype``/``check``/``encode``/
    ``report_path``) run the BASELINE acceptance configs — e.g.
    ``pairs=1024, dtype="float32", check=8, encode=2`` is the 1024-pair
    multi-host farm proof (short tracks, sampled oracle check, sampled
    WAV encode, per-process JSON rows)."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(
        os.environ,
        XLA_FLAGS=f"--xla_force_host_platform_device_count={devices_per_process}",
    )
    extra = []
    if pairs is not None:
        extra += ["--pairs", str(pairs)]
    if dtype != "float64":
        extra += ["--dtype", dtype]
    if check is not None:
        extra += ["--check", str(check)]
    if encode:
        extra += ["--encode", str(encode)]
    if report_path:
        extra += ["--report_path", report_path]
    workers = [
        subprocess.Popen(
            [
                sys.executable,
                "-m",
                "matchering_tpu.parallel.launch",
                "worker",
                "--process_id",
                str(i),
                "--processes",
                str(num_processes),
                "--port",
                str(port),
                "--time",
                str(time),
                *extra,
            ],
            env=env,
        )
        for i in range(num_processes)
    ]
    try:
        codes = [w.wait(timeout=timeout) for w in workers]
    except subprocess.TimeoutExpired:
        for w in workers:
            if w.poll() is None:
                w.kill()
        raise SystemExit("selftest timed out — killed remaining workers")
    if any(codes):
        raise SystemExit(f"selftest worker exit codes: {codes}")
    print(
        f"multi-host selftest passed ({num_processes} processes, time={time})"
    )


def main(argv: Optional[Sequence[str]] = None) -> int:
    import argparse

    parser = argparse.ArgumentParser(
        prog="python -m matchering_tpu.parallel.launch",
        description="multi-host scaffolding: cluster self-test / worker entry",
    )
    parser.add_argument("command", choices=["selftest", "worker"])
    parser.add_argument("--processes", type=int, default=2)
    parser.add_argument("--devices_per_process", type=int, default=2)
    parser.add_argument("--process_id", type=int, default=0)
    parser.add_argument("--port", type=int, default=0)
    parser.add_argument(
        "--time",
        type=int,
        default=1,
        help="time-axis size of the (pairs, time) mesh (must divide each "
        "process's local device count)",
    )
    parser.add_argument(
        "--pairs",
        type=int,
        default=None,
        help="scale mode: global batch size with short tracks (the BASELINE "
        "1024-pair farm config)",
    )
    parser.add_argument("--dtype", default="float64")
    parser.add_argument(
        "--check",
        type=int,
        default=None,
        help="check only this many evenly-sampled owned pairs against the "
        "single-process float64 oracle (default: all)",
    )
    parser.add_argument(
        "--encode",
        type=int,
        default=0,
        help="encode this many sampled owned results to WAV (ownership proof)",
    )
    parser.add_argument("--report_path", default=None)
    parser.add_argument("--timeout", type=float, default=600)
    args = parser.parse_args(argv)
    if args.command == "selftest":
        run_selftest(
            args.processes,
            args.devices_per_process,
            args.time,
            pairs=args.pairs,
            dtype=args.dtype,
            check=args.check,
            encode=args.encode,
            report_path=args.report_path,
            timeout=args.timeout,
        )
    else:
        _selftest_worker(
            args.process_id,
            args.processes,
            args.port,
            args.time,
            pairs=args.pairs,
            dtype=args.dtype,
            check=args.check,
            encode=args.encode,
            report_path=args.report_path,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
