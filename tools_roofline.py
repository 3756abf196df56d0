"""Roofline / MFU accounting for the mastering chain on one TPU chip.

VERDICT r2 item 4: the perf story was realtime factors only — nothing said
what fraction of the chip the 56 ms fused program actually uses, or which
stages are bandwidth-bound.  This tool measures each stage (and the fused
program) with within-run medians, pulls FLOP and HBM-byte counts from XLA's
own cost model (``compiled.cost_analysis()``), and reports achieved
GFLOP/s / GB/s against the chip's peaks.

Peaks used for the v5e (TPU v5 lite) roofline:
  * HBM bandwidth  819 GB/s
  * MXU bf16       197 TFLOP/s   (f32 via MXU ~1/4 of that)
  * VPU f32        ~ 7.5 TFLOP/s (vector units; FFT butterflies and scans
                                  run here, not on the MXU)

The mastering chain is FFT/scan-heavy float32 — the relevant ceilings are
HBM bandwidth and the VPU, not the bf16 MXU number.

Usage (from /root/repo, one TPU job at a time):
    python tools_roofline.py            # writes ROOFLINE.json
"""

import json
import time

import numpy as np

from tools_record_bench import _make_pair

_PEAKS = {
    "hbm_gbps": 819.0,
    "vpu_f32_gflops": 7500.0,
    "mxu_bf16_gflops": 197000.0,
}


def _median_time(callable_sync, reps=7):
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        callable_sync()
        runs.append(time.perf_counter() - t0)
    runs.sort()
    return runs[len(runs) // 2]


def _cost(compiled):
    try:
        c = compiled.cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return {
            "flops": float(c.get("flops", float("nan"))),
            "bytes": float(c.get("bytes accessed", float("nan"))),
        }
    except Exception as err:  # cost model may be absent on some backends
        return {"flops": float("nan"), "bytes": float("nan"), "error": str(err)}


def main(seconds=180, sr=44100):
    import jax
    import jax.numpy as jnp

    import matchering_tpu as mg
    from matchering_tpu.ops import basics, convolve, smoothing
    from matchering_tpu.stages import _Division, _analyze_levels, _matching_fir
    from matchering_tpu.utils import enable_compile_cache

    enable_compile_cache()
    config = mg.Config()
    target, reference = _make_pair(seconds, sr)
    t_dev = jax.device_put(target)
    r_dev = jax.device_put(reference)
    interp_ops = smoothing.interpolation_operator_arrays(
        config.internal_sample_rate,
        config.fft_size,
        config.lin_log_oversampling,
        jnp.dtype(config.dtype),
    )

    # --- the same stage split as tools_record_bench.bench_stages ---
    def stage_analysis(t, r, ops):
        r, _ = basics.normalize(r, config.threshold, config.min_value, False)
        t_div = _Division.static(t.shape[0], config.max_piece_size)
        r_div = _Division.static(r.shape[0], config.max_piece_size)
        tm, ts = basics.lr_to_ms(t)
        rm, rs = basics.lr_to_ms(r)
        t_mask, t_rms = _analyze_levels(tm, t_div)
        r_mask, r_rms = _analyze_levels(rm, r_div)
        coeff = r_rms / jnp.maximum(config.min_value, t_rms)
        mid_fir = _matching_fir(tm, rm, t_div, r_div, t_mask, r_mask, coeff, config, ops)
        side_fir = _matching_fir(ts, rs, t_div, r_div, t_mask, r_mask, coeff, config, ops)
        return jnp.sum(mid_fir) + jnp.sum(side_fir), (
            tm * coeff,
            ts * coeff,
            mid_fir,
            side_fir,
            r_rms,
        )

    def stage_convolve(tm, ts, mid_fir, side_fir):
        conv = convolve.fft_convolve_same_batch(
            jnp.stack([tm, ts]), jnp.stack([mid_fir, side_fir])
        )
        return jnp.sum(jnp.abs(conv)), conv

    def stage_correction(conv, r_rms):
        result_mid = conv[0]
        result = basics.ms_to_lr(result_mid, conv[1])
        t_div = _Division.static(result_mid.shape[0], config.max_piece_size)
        for _ in range(config.rms_correction_steps):
            clipped = basics.clip(result_mid)
            rmses = basics.piece_rms_flat(clipped, t_div.piece_size, t_div.divisions)
            _, match = basics.loudest_piece_stats(rmses)
            c = r_rms / jnp.maximum(config.min_value, match)
            result_mid = result_mid * c
            result = result * c
        return jnp.sum(jnp.abs(result)), result

    def stage_limiter(result):
        return jnp.sum(jnp.abs(mg.limit(result, config)))

    def fused(t, r, ops):
        out = mg.master_graph(t, r, config, need_default=True, interp_ops=ops)
        return jnp.sum(jnp.abs(out.result))

    report = {
        "device": str(jax.devices()[0]),
        "workload": {"seconds_audio": seconds, "sample_rate": sr, "dtype": "float32"},
        "peaks": _PEAKS,
        "stages": {},
    }

    def run_stage(name, fn, *args):
        compiled = jax.jit(fn).lower(*args).compile()
        out = compiled(*args)
        first = jax.tree.leaves(out)[0]
        float(first)  # force completion (block_until_ready lies on axon)
        median = _median_time(lambda: float(jax.tree.leaves(compiled(*args))[0]))
        cost = _cost(compiled)
        entry = {"wall_ms": round(median * 1e3, 2), **cost}
        if np.isfinite(cost["flops"]):
            entry["achieved_gflops"] = round(cost["flops"] / median / 1e9, 1)
            entry["vpu_f32_fraction"] = round(
                entry["achieved_gflops"] / _PEAKS["vpu_f32_gflops"], 3
            )
        if np.isfinite(cost["bytes"]):
            entry["achieved_gbps"] = round(cost["bytes"] / median / 1e9, 1)
            entry["hbm_fraction"] = round(entry["achieved_gbps"] / _PEAKS["hbm_gbps"], 3)
        report["stages"][name] = entry
        print(name, json.dumps(entry), flush=True)
        return out

    _, carry = run_stage("analysis_and_fir", stage_analysis, t_dev, r_dev, interp_ops)
    tm, ts, mid_fir, side_fir, r_rms = carry
    _, conv = run_stage("convolution", stage_convolve, tm, ts, mid_fir, side_fir)
    _, result = run_stage("rms_correction_x4", stage_correction, conv, r_rms)
    run_stage("limiter", stage_limiter, result)
    run_stage("fused_full_chain", fused, t_dev, r_dev, interp_ops)

    # dispatch RTT floor of this tunneled backend: an empty-ish program
    tiny = jax.jit(lambda x: jnp.sum(x)).lower(jnp.zeros((8,), jnp.float32)).compile()
    z = jax.device_put(jnp.zeros((8,), jnp.float32))
    float(tiny(z))
    report["dispatch_rtt_ms"] = round(_median_time(lambda: float(tiny(z))) * 1e3, 2)

    with open("ROOFLINE.json", "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print("wrote ROOFLINE.json", flush=True)


if __name__ == "__main__":
    main()
