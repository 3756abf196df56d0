"""Same-run A/B: compensated-scan engines (ds ladder vs iterative refine).

Runs BOTH engines in one process on the real chip (VERDICT r4 bench-honesty
rule: never present cross-run deltas as wins), measuring with the
device-time method of tools_roofline2.py (repeat-K fori_loop, dispatch RTT
cancels) plus the pipelined 8-pair throughput loop of bench.py:

* ds-kernel device time (7.9M-sample near-unit-pole lfilter)
* limiter stage device time
* fused full-chain device time
* pipelined 8-pair throughput (the headline metric)

Engines are switched via MATCHERING_TPU_DS_ENGINE (read at trace time) with
``jax.clear_caches()`` between — the persistent compile cache keeps warm
graph recompiles cheap.  Results stream to AB_REFINE.json incrementally so
a killed run keeps finished rows.

Usage (from /root/repo, ONE TPU job at a time):
    python tools_ab_refine.py
"""

import json
import os
import time

import numpy as np

from bench import make_pair

_K = 8
_OUT = "AB_REFINE.json"


def _median(fn, reps=7):
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    runs.sort()
    return runs[len(runs) // 2]


def main(seconds=180, sr=44100):
    import jax
    import jax.numpy as jnp

    import matchering_tpu as mg
    from matchering_tpu.ops import basics, iir, smoothing
    from matchering_tpu.utils import enable_compile_cache

    enable_compile_cache()
    config = mg.Config()
    device = jax.devices()[0]

    report = {
        "device": str(device),
        "method": "same-process A/B; device time via repeat-K fori_loop "
        "(RTT cancels); throughput via the bench.py pipelined loop",
        "workload": {"seconds_audio": seconds, "sample_rate": sr, "B": 8},
        "K": _K,
        "engines": {},
    }

    def flush():
        with open(_OUT, "w") as f:
            json.dump(report, f, indent=2)
            f.write("\n")

    target, reference = make_pair(seconds, sr, 42)
    n = target.shape[0]
    t_dev = jax.device_put(target, device)
    r_dev = jax.device_put(reference, device)
    tm = jax.block_until_ready(jnp.asarray((target[:, 0] + target[:, 1]) / 2.0))
    env = jax.block_until_ready(jnp.abs(tm) + 0.5)
    interp_ops = smoothing.interpolation_operator_arrays(
        config.internal_sample_rate,
        config.fft_size,
        config.lin_log_oversampling,
        jnp.dtype(config.dtype),
    )

    B = 8
    REPS = 3
    base = [make_pair(seconds, sr, 42 + i) for i in range(B)]
    reps_staged = []
    for rep in range(REPS + 1):
        scale = 1.0 + 0.003 * rep
        reps_staged.append(
            [
                (
                    jax.device_put(t * scale, device),
                    jax.device_put(r * (2.0 - scale), device),
                )
                for t, r in base
            ]
        )
    sync = jax.jit(lambda a: jnp.sum(a[:: 1 << 20]))
    for pairs in reps_staged:
        for t, r in pairs:
            float(sync(t))
            float(sync(r))

    def perturb(x, s):
        return x * (1.0 + 1e-7 * s)

    def measure_device(fn, args):
        def looped(k_static, s0, *a):
            def body(_, s):
                return fn(s, *a)

            return jax.lax.fori_loop(0, k_static, body, s0)

        s0 = jnp.asarray(1.0, jnp.float32)
        run1 = jax.jit(lambda s, *a: looped(1, s, *a)).lower(s0, *args).compile()
        runK = jax.jit(lambda s, *a: looped(_K, s, *a)).lower(s0, *args).compile()
        float(run1(s0, *args))
        float(runK(s0, *args))
        w1 = _median(lambda: float(run1(s0, *args)))
        wK = _median(lambda: float(runK(s0, *args)))
        dev = max((wK - w1) / (_K - 1), 1e-9)
        return {
            "wall_1_ms": round(w1 * 1e3, 2),
            "wall_K_ms": round(wK * 1e3, 2),
            "device_ms": round(dev * 1e3, 3),
        }

    release_pole = 0.9999

    def k_ds_scan(s, x):
        f = iir.FirstOrderFilter(b0=1.0 - release_pole, b1=0.0, a1=-release_pole)
        return jnp.sum(iir.lfilter_first_order(f, perturb(x, s)))

    def stage_limiter(s, x):
        return jnp.sum(jnp.abs(mg.limit(perturb(x, s), config)))

    def fused(s, t, r, ops):
        out = mg.master_graph(
            perturb(t, s), r, config, need_default=True, interp_ops=ops
        )
        return jnp.sum(jnp.abs(out.result))

    result2d = jax.block_until_ready(
        jnp.stack([tm, tm * 0.5], axis=1)
    )  # stereo-shaped limiter input

    for engine in ("ladder", "refine"):
        os.environ["MATCHERING_TPU_DS_ENGINE"] = engine
        jax.clear_caches()
        rows = {}
        print(f"--- engine={engine}", flush=True)

        t0 = time.perf_counter()
        rows["kernel_ds_scan_7_9M"] = measure_device(k_ds_scan, (env,))
        print("  ds kernel", rows["kernel_ds_scan_7_9M"], flush=True)
        rows["limiter_stage"] = measure_device(stage_limiter, (result2d,))
        print("  limiter", rows["limiter_stage"], flush=True)
        rows["fused_full_chain"] = measure_device(fused, (t_dev, r_dev, interp_ops))
        print("  fused", rows["fused_full_chain"], flush=True)
        rows["compile_wall_s"] = round(time.perf_counter() - t0, 1)

        graph = jax.jit(
            lambda t, r, ops: jnp.sum(
                jnp.abs(
                    mg.master_graph(
                        t, r, config, need_default=True, interp_ops=ops
                    ).result
                )
            )
        )

        def run(pairs):
            handles = [graph(t, r, interp_ops) for t, r in pairs]
            return [float(h) for h in handles]

        run(reps_staged[0])  # compile + warm
        times = []
        for pairs in reps_staged[1:]:
            start = time.perf_counter()
            run(pairs)
            times.append(time.perf_counter() - start)
        times.sort()
        median = times[len(times) // 2]
        rows["pipelined_8pair"] = {
            "times_s": [round(t, 3) for t in times],
            "median_s": round(median, 3),
            "audio_sec_per_s": round(B * seconds / median, 1),
        }
        print("  pipelined", rows["pipelined_8pair"], flush=True)
        report["engines"][engine] = rows
        flush()

    lad = report["engines"]["ladder"]
    ref = report["engines"]["refine"]
    report["delta"] = {
        "fused_device_ms": [
            lad["fused_full_chain"]["device_ms"],
            ref["fused_full_chain"]["device_ms"],
        ],
        "pipelined_audio_sec_per_s": [
            lad["pipelined_8pair"]["audio_sec_per_s"],
            ref["pipelined_8pair"]["audio_sec_per_s"],
        ],
    }
    flush()
    print("wrote", _OUT, flush=True)


if __name__ == "__main__":
    main()
