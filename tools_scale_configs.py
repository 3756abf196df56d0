"""BASELINE scale configs, measured (VERDICT r4 item 3).

Three acceptance configs from BASELINE.md that had never been executed:

* ``weakscale`` (CPU, single process): throughput of the sharded vmapped
  batch at pairs = 1/2/4/8 on a virtual CPU device mesh with one pair per
  device — the weak-scaling proxy available without N real chips.  The
  host has a fixed core budget shared by all virtual devices, so the
  reported efficiency is a LOWER bound on the algorithmic efficiency
  (per-pair work is independent; only the final assembly syncs).
* ``batch64`` (real TPU): the with_preview.py 64-pair batch — pipelined
  per-pair dispatch of the full chain *plus preview selection* on one
  chip, inputs staged up front, per-rep perturbation scalars so neither
  XLA nor the tunnel can memoize repeats.
* ``farm1024`` is run through the launch CLI (see SCALING.md):
  ``python -m matchering_tpu.parallel.launch selftest --processes 2
  --devices_per_process 4 --pairs 1024 --dtype float32 --check 8
  --encode 2 --report_path /tmp/farm1024``.

Results append to SCALE_CONFIGS.json.

Usage (from /root/repo):
    python tools_scale_configs.py weakscale     # CPU, ~minutes
    python tools_scale_configs.py batch64       # ONE TPU job at a time
"""

import json
import os
import sys
import time

import numpy as np

_OUT = "SCALE_CONFIGS.json"


def _write(key, row):
    data = {}
    if os.path.exists(_OUT):
        with open(_OUT) as f:
            data = json.load(f)
    data[key] = row
    with open(_OUT, "w") as f:
        json.dump(data, f, indent=2)
        f.write("\n")
    print("wrote", _OUT, key, flush=True)


def weakscale():
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import matchering_tpu as mg
    from matchering_tpu.parallel.batch import bucket_pad, master_batch

    seconds, sr = 10, 44100
    config = mg.Config(dtype="float32")
    rng = np.random.RandomState(7)

    def synth(seed, amp):
        r = np.random.RandomState(seed)
        n = seconds * sr
        env = 0.5 + 0.5 * np.sin(np.arange(n) / sr * 2.0)[:, None]
        return np.clip(amp * r.randn(n, 2) * env, -0.99, 0.99).astype(np.float32)

    rows = {}
    t1 = None
    for k in (1, 2, 4, 8):
        devices = np.asarray(jax.devices()[:k]).reshape(k, 1)
        mesh = Mesh(devices, axis_names=("pairs", "time"))
        targets = [synth(10 + i, 0.25) for i in range(k)]
        references = [synth(50 + i, 0.85) for i in range(k)]
        t_all, t_lens = bucket_pad(targets, multiple=1 << 16)
        r_all, r_lens = bucket_pad(references, multiple=1 << 16)
        sharding = NamedSharding(mesh, P("pairs", None, None))
        t_dev = jax.device_put(t_all, sharding)
        r_dev = jax.device_put(r_all, sharding)

        def run():
            out = master_batch(
                t_dev,
                r_dev,
                config,
                mesh,
                target_lengths=t_lens,
                reference_lengths=r_lens,
            )
            np.asarray(out.result)  # materialize = sync

        run()  # compile + warm
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            reps.append(time.perf_counter() - t0)
        reps.sort()
        wall = reps[len(reps) // 2]
        thr = k * seconds / wall
        if t1 is None:
            t1 = wall
        rows[str(k)] = {
            "pairs": k,
            "wall_s": round(wall, 3),
            "audio_sec_per_s": round(thr, 1),
            "weak_efficiency": round(t1 / wall, 3),
        }
        print(rows[str(k)], flush=True)
    _write(
        "weakscale_cpu_virtual",
        {
            "method": "one pair per virtual CPU device, vmapped+sharded batch; "
            "efficiency = T(1)/T(k); host cores are shared by all virtual "
            "devices so this lower-bounds the algorithmic efficiency",
            "host_cores": os.cpu_count(),
            "seconds_per_pair": seconds,
            "rows": rows,
        },
    )


def batch64():
    import jax
    import jax.numpy as jnp

    import matchering_tpu as mg
    from bench import make_pair
    from matchering_tpu.preview import _cut_pieces, _loudest_window_index
    from matchering_tpu.ops import smoothing
    from matchering_tpu.utils import enable_compile_cache

    enable_compile_cache()
    B, seconds, sr = 64, 180, 44100
    REPS = 3
    config = mg.Config()
    device = jax.devices()[0]
    # production operator pair (LOWESS folded) — see operator_arrays_for_config
    interp_ops = smoothing.operator_arrays_for_config(config)

    @jax.jit
    def graph(target, reference, ops, s):
        target = target * (1.0 + 1e-7 * s)
        out = mg.master_graph(
            target, reference, config, need_default=True, interp_ops=ops
        )
        # with_preview.py parity: select the loudest preview window and cut
        # the faded target/result pieces inside the same program
        index = _loudest_window_index(
            out.result, config.preview_size, config.preview_analysis_step
        )
        tp, rp = _cut_pieces(
            target,
            out.result,
            index,
            config.preview_size,
            config.preview_analysis_step,
            config.preview_fade_size,
            config.threshold,
        )
        return jnp.sum(jnp.abs(out.result)) + jnp.sum(tp) + jnp.sum(rp)

    print(f"staging {B} pairs ({B * seconds * sr * 2 * 2 * 4 / 1e9:.1f} GB)…",
          flush=True)
    t0 = time.perf_counter()
    staged = []
    sync = jax.jit(lambda a: jnp.sum(a[:: 1 << 20]))
    for i in range(B):
        t, r = make_pair(seconds, sr, 1000 + i)
        td = jax.device_put(t, device)
        rd = jax.device_put(r, device)
        float(sync(td))
        float(sync(rd))
        staged.append((td, rd))
        if i % 16 == 15:
            print(f"  staged {i + 1}/{B}", flush=True)
    stage_s = time.perf_counter() - t0

    agg = jax.jit(lambda *hs: sum(hs))

    def run(rep):
        s = jnp.asarray(float(rep), jnp.float32)
        handles = [graph(t, r, interp_ops, s) for t, r in staged]
        # one aggregated fetch: B per-pair scalar fetches cost B tunnel
        # round-trips (~10 ms each — see bench.py / BENCH_EXTRA_r05)
        return float(agg(*handles))

    t0 = time.perf_counter()
    run(0)  # compile + warm
    warm_s = time.perf_counter() - t0
    times = []
    for rep in range(1, REPS + 1):
        t0 = time.perf_counter()
        run(rep)
        times.append(time.perf_counter() - t0)
    times.sort()
    median = times[len(times) // 2]
    row = {
        "config": "BASELINE with_preview batch: 64 pairs, 3-min 44.1 kHz, "
        "full chain + in-graph preview selection, pipelined on one chip",
        "device": str(device),
        "stage_s": round(stage_s, 1),
        "compile_warm_s": round(warm_s, 1),
        "times_s": [round(t, 3) for t in times],
        "median_s": round(median, 3),
        "pairs_per_s": round(B / median, 1),
        "audio_sec_per_s": round(B * seconds / median, 1),
    }
    print(row, flush=True)
    _write("batch64_tpu_pipelined", row)


if __name__ == "__main__":
    {"weakscale": weakscale, "batch64": batch64}[sys.argv[1]]()
