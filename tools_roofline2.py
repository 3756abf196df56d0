"""Device-time roofline for the mastering chain (v3, VERDICT r4 item 4).

The r3 roofline divided *pre-fusion* cost-model bytes by *RTT-inclusive*
wall times; subtracting the measured ~35 ms dispatch RTT made the implied
bandwidth exceed the chip's physical peak — the byte count overcounts true
HBM traffic and the wall overcounts device time.  This tool fixes both:

* **Device time** is measured with a repeat-K loop *inside one program*:
  ``lax.fori_loop`` applies the stage body K times with a scalar data
  dependence chained between iterations (so XLA cannot hoist or dead-code
  the body, and the tunnel cannot memoize identical dispatches).  Per-iter
  device time = (wall(K) - wall(1)) / (K - 1): the dispatch RTT and any
  host overhead cancel exactly.
* **Bytes** are reported as a *range*: a streaming lower bound (each
  stage's inputs read once + outputs written once — no algorithm can do
  less) and the XLA cost model's pre-fusion upper bound.  The honest
  fraction-of-peak is therefore also a range.
* **Kernel micro-rows** price the ladder scans directly (the r3 open
  question): one plain and one double-single ``scan_first_order`` over the
  production 7.9M-sample envelope, plus the sliding maxima — so the
  "~200 track-passes" cost-model claim is replaced by a measured number.

v3 over v2 (VERDICT r4 items 4 and 7):

* below-timer-resolution rows are FLAGGED instead of divided through (the
  v2 ``sliding_max_attack`` row published gbps_lower = 6.4e7 from a 0.0 ms
  denominator);
* kernel micro-rows repeat 64x inside the device loop (vs 8x) so sub-0.1 ms
  kernels resolve;
* same-run A/B sections price the r4 rewrites: packed stereo convolution
  vs per-channel overlap-save, and folded smoothing operators vs the
  separate device-LOWESS path.

Usage (from /root/repo, ONE TPU job at a time):
    python tools_roofline2.py            # writes ROOFLINE.json (v3)
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

_K = 8        # repeat count inside the device loop (stage rows)
_K_KERNEL = 64  # kernel micro-rows: tiny kernels need more reps to resolve
_TIMER_RESOLUTION_S = 5e-4  # wall-clock jitter floor on this host


def _median(fn, reps=7):
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    runs.sort()
    return runs[len(runs) // 2]


def _cost_bytes(compiled):
    try:
        c = compiled.cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("bytes accessed", float("nan")))
    except Exception:
        return float("nan")


def main(seconds=180, sr=44100):
    import jax
    import jax.numpy as jnp

    import matchering_tpu as mg
    from matchering_tpu.ops import basics, convolve, iir, sliding, smoothing
    from matchering_tpu.stages import _Division, _analyze_levels, _matching_fir
    from matchering_tpu.utils import enable_compile_cache, ms_to_samples

    enable_compile_cache()
    config = mg.Config()
    target, reference = _make_pair(seconds, sr)
    t_dev = jax.device_put(target)
    r_dev = jax.device_put(reference)
    n = target.shape[0]
    # the PRODUCTION operator pair (LOWESS folded in) — the v3 first run
    # accidentally measured every stage row with the unfolded pair, hiding
    # 5.3 ms of fold win inside the fused row; the A/B section below keeps
    # both variants explicitly
    interp_ops = smoothing.operator_arrays_for_config(config)

    report = {
        "device": str(jax.devices()[0]),
        "method": (
            "repeat-K fori_loop inside one program, scalar dependence chained "
            "between iterations; per-iter device time = (wall_K - wall_1)/(K-1); "
            "bytes = [streaming lower bound, XLA cost model upper bound]"
        ),
        "workload": {"seconds_audio": seconds, "sample_rate": sr, "dtype": "float32"},
        "peaks": _PEAKS,
        "K": _K,
        "version": 3,
        "stages": {},
        "kernels": {},
        "ab": {},
    }

    def measure(section, name, fn, args, bytes_lower, flops=None, k=None):
        """fn(scalar, *args) -> scalar checksum; repeated k times on device
        with the scalar chained through, so iterations are truly sequential."""
        k = k or _K

        def looped(k_static, s0, *a):
            def body(_, s):
                return fn(s, *a)

            return jax.lax.fori_loop(0, k_static, body, s0)

        s0 = jnp.asarray(1.0, jnp.float32)
        run1 = jax.jit(lambda s, *a: looped(1, s, *a)).lower(s0, *args).compile()
        runK = jax.jit(lambda s, *a: looped(k, s, *a)).lower(s0, *args).compile()
        float(run1(s0, *args))
        float(runK(s0, *args))
        w1 = _median(lambda: float(run1(s0, *args)))
        wK = _median(lambda: float(runK(s0, *args)))
        delta = wK - w1
        dev = max(delta / (k - 1), 1e-9)
        bytes_model = _cost_bytes(jax.jit(lambda s, *a: fn(s, *a)).lower(s0, *args).compile())
        entry = {
            "K": k,
            "wall_1_ms": round(w1 * 1e3, 2),
            "wall_K_ms": round(wK * 1e3, 2),
            "device_ms": round(dev * 1e3, 3),
            "bytes_lower": bytes_lower,
            "bytes_model": bytes_model,
        }
        if delta < _TIMER_RESOLUTION_S:
            # the K-rep delta is inside wall-clock jitter: publishing
            # bytes/dev would be nonsense (the v2 sliding_max_attack bug)
            entry["below_timer_resolution"] = True
            entry["device_ms_upper"] = round(_TIMER_RESOLUTION_S / (k - 1) * 1e3, 3)
        else:
            entry["gbps_lower"] = round(bytes_lower / dev / 1e9, 1)
            entry["hbm_fraction_lower"] = round(
                bytes_lower / dev / 1e9 / _PEAKS["hbm_gbps"], 3
            )
            if np.isfinite(bytes_model):
                entry["gbps_model"] = round(bytes_model / dev / 1e9, 1)
                entry["hbm_fraction_model"] = round(
                    bytes_model / dev / 1e9 / _PEAKS["hbm_gbps"], 3
                )
            if flops:
                entry["gflops"] = round(flops / dev / 1e9, 1)
        report[section][name] = entry
        print(name, json.dumps(entry), flush=True)
        return entry

    B = 4  # bytes per f32
    # ---- stage bodies (perturbed by the chained scalar s: a relative
    # 1e-7 scale keeps numerics identical-in-kind but defeats hoisting) ----
    def perturb(x, s):
        return x * (1.0 + 1e-7 * s)

    def stage_analysis(s, t, r, ops):
        # mirrors master_graph's production flow: packed-pair spectra +
        # FIR-from-spectra (stages.py stage 1-2)
        from matchering_tpu.stages import _fir_from_spectra, _masked_spectrum_pair

        t = perturb(t, s)
        r, _ = basics.normalize(r, config.threshold, config.min_value, False)
        t_div = _Division.static(t.shape[0], config.max_piece_size)
        r_div = _Division.static(r.shape[0], config.max_piece_size)
        tm, ts = basics.lr_to_ms(t)
        rm, rs = basics.lr_to_ms(r)
        t_mask, t_rms = _analyze_levels(tm, t_div)
        r_mask, r_rms = _analyze_levels(rm, r_div)
        coeff = r_rms / jnp.maximum(config.min_value, t_rms)
        t_mid_fft, t_side_fft = _masked_spectrum_pair(tm, ts, t_mask, t_div, config)
        r_mid_fft, r_side_fft = _masked_spectrum_pair(rm, rs, r_mask, r_div, config)
        mid_fir = _fir_from_spectra(t_mid_fft * coeff, r_mid_fft, config, ops)
        side_fir = _fir_from_spectra(t_side_fft * coeff, r_side_fft, config, ops)
        return jnp.sum(mid_fir) + jnp.sum(side_fir)

    # read target + reference (2ch each), write two small FIRs
    measure(
        "stages", "analysis_and_fir", stage_analysis, (t_dev, r_dev, interp_ops),
        bytes_lower=(2 * n + 2 * n) * B,
    )

    tm, ts = basics.lr_to_ms(t_dev)
    fir_shape = config.fft_size
    mid_fir = jnp.ones((fir_shape,), jnp.float32) / fir_shape
    side_fir = mid_fir

    def stage_convolve(s, a, b, f1, f2):
        conv = convolve.fft_convolve_same_batch(
            jnp.stack([perturb(a, s), b]), jnp.stack([f1, f2])
        )
        return jnp.sum(jnp.abs(conv))

    measure(
        "stages", "convolution", stage_convolve, (tm, ts, mid_fir, side_fir),
        bytes_lower=(2 * n + 2 * n) * B,
    )

    # jit the prep convolution: eagerly, the packed path's complex ops hit
    # UNIMPLEMENTED standalone-kernel gaps on the axon backend
    conv = jax.block_until_ready(
        jax.jit(convolve.fft_convolve_same_batch)(
            jnp.stack([tm, ts]), jnp.stack([mid_fir, side_fir])
        )
    )
    r_rms = jnp.asarray(0.2, jnp.float32)

    def stage_correction(s, c, rr):
        result_mid = perturb(c[0], s)
        result = basics.ms_to_lr(result_mid, c[1])
        t_div = _Division.static(result_mid.shape[0], config.max_piece_size)
        for _ in range(config.rms_correction_steps):
            clipped = basics.clip(result_mid)
            rmses = basics.piece_rms_flat(clipped, t_div.piece_size, t_div.divisions)
            _, match = basics.loudest_piece_stats(rmses)
            cc = rr / jnp.maximum(config.min_value, match)
            result_mid = result_mid * cc
            result = result * cc
        return jnp.sum(jnp.abs(result))

    measure(
        "stages", "rms_correction_x4", stage_correction, (conv, r_rms),
        # 4 reads of mid for piece RMS + result built and rescaled
        bytes_lower=(4 * n + 2 * n + 2 * n) * B,
    )

    result = jax.block_until_ready(basics.ms_to_lr(conv[0], conv[1]))

    def stage_limiter(s, x):
        return jnp.sum(jnp.abs(mg.limit(perturb(x, s), config)))

    measure(
        "stages", "limiter", stage_limiter, (result,),
        # read (n,2), write (n,2); envelope chain >= 1 extra mono pass
        bytes_lower=(2 * n + 2 * n + n) * B,
    )

    def fused(s, t, r, ops):
        out = mg.master_graph(perturb(t, s), r, config, need_default=True, interp_ops=ops)
        return jnp.sum(jnp.abs(out.result))

    measure(
        "stages", "fused_full_chain", fused, (t_dev, r_dev, interp_ops),
        bytes_lower=(2 * n + 2 * n + 2 * n) * B,
    )

    # ---- kernel micro-rows: price the ladder scans directly ----
    env = jax.block_until_ready(jnp.abs(tm) + 0.5)

    def k_plain_scan(s, x):
        return jnp.sum(iir.scan_first_order(perturb(x, s), 0.95))

    measure("kernels", "ladder_scan_plain_7_9M", k_plain_scan, (env,),
            bytes_lower=2 * n * B, k=_K_KERNEL)

    release_pole = 0.9999  # near-unit -> double-single path
    def k_ds_scan(s, x):
        f = iir.FirstOrderFilter(b0=1.0 - release_pole, b1=0.0, a1=-release_pole)
        return jnp.sum(iir.lfilter_first_order(f, perturb(x, s)))

    measure("kernels", "ladder_scan_ds_7_9M", k_ds_scan, (env,),
            bytes_lower=2 * n * B, k=_K_KERNEL)

    attack = ms_to_samples(config.limiter.attack, config.internal_sample_rate)
    hold = ms_to_samples(config.limiter.hold, config.internal_sample_rate)

    def k_slide_attack(s, x):
        return jnp.sum(sliding.sliding_max_attack(perturb(x, s), attack))

    measure("kernels", "sliding_max_attack", k_slide_attack, (env,),
            bytes_lower=2 * n * B, k=_K_KERNEL)

    def k_slide_hold(s, x):
        return jnp.sum(sliding.sliding_max_hold(perturb(x, s), hold))

    measure("kernels", "sliding_max_hold", k_slide_hold, (env,),
            bytes_lower=2 * n * B, k=_K_KERNEL)

    def k_filtfilt(s, x):
        smoother = iir.one_pole_filter(
            config.limiter.attack_filter_coefficient, attack
        )
        return jnp.sum(iir.filtfilt_first_order(smoother, perturb(x, s)))

    measure("kernels", "filtfilt_attack_smoother", k_filtfilt, (env,),
            bytes_lower=3 * n * B, k=_K_KERNEL)

    # ---- same-run A/Bs for the r4 rewrites (VERDICT r4 item 4) ----
    def conv_packed(s, a, b, f1, f2):
        out = convolve._convolve_blocked_packed2(
            jnp.stack([perturb(a, s), b]), jnp.stack([f1, f2]), block_fft=1 << 16
        )
        return jnp.sum(jnp.abs(out))

    def conv_per_channel(s, a, b, f1, f2):
        out = jax.vmap(convolve.fft_convolve_same, in_axes=(0, 0, None))(
            jnp.stack([perturb(a, s), b]), jnp.stack([f1, f2]), 1 << 16
        )
        return jnp.sum(jnp.abs(out))

    measure("ab", "conv_stereo_packed2", conv_packed,
            (tm, ts, mid_fir, side_fir), bytes_lower=(2 * n + 2 * n) * B)
    measure("ab", "conv_stereo_per_channel", conv_per_channel,
            (tm, ts, mid_fir, side_fir), bytes_lower=(2 * n + 2 * n) * B)

    unfolded_ops = smoothing.interpolation_operator_arrays(
        config.internal_sample_rate,
        config.fft_size,
        config.lin_log_oversampling,
        jnp.dtype(config.dtype),
    )
    folded_ops = smoothing.operator_arrays_for_config(config)
    measure("ab", "analysis_fir_folded_lowess", stage_analysis,
            (t_dev, r_dev, folded_ops), bytes_lower=(2 * n + 2 * n) * B)
    measure("ab", "analysis_fir_device_lowess", stage_analysis,
            (t_dev, r_dev, unfolded_ops), bytes_lower=(2 * n + 2 * n) * B)

    # dispatch RTT floor (tiny program), for reference
    tiny = jax.jit(lambda x: jnp.sum(x)).lower(jnp.zeros((8,), jnp.float32)).compile()
    z = jax.device_put(jnp.zeros((8,), jnp.float32))
    float(tiny(z))
    report["dispatch_rtt_ms"] = round(_median(lambda: float(tiny(z))) * 1e3, 2)

    with open("ROOFLINE.json", "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print("wrote ROOFLINE.json (v3)", flush=True)


if __name__ == "__main__":
    main()
