"""Record the extended bench artifacts (VERDICT r1 item 10).

Writes a BENCH_EXTRA_r*.json artifact (see --out) with driver-verifiable
numbers for: the single-pair flagship, a batch-size sweep, a per-stage
breakdown, and (with --longform) the 60-min 96 kHz single-chip master.

All timings follow the repo's TPU measurement doctrine: inputs staged on
device outside timed regions (the tunnel H2D is ~25 MB/s), every timed
program reduced to a host-fetched checksum (block_until_ready does not
synchronize on this backend), median of 3 runs on perturbed inputs (so no
layer can memoize).
"""

import argparse
import json
import time

import numpy as np


def _checksum_time(fn, variants):
    """Compile on variants[0], then median wall time over the rest."""
    fn(*variants[0])
    times = []
    for pair in variants[1:]:
        t0 = time.perf_counter()
        fn(*pair)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def _make_pair(seconds, sr, seed=42):
    rng = np.random.RandomState(seed)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    env = 0.6 + 0.4 * np.sin(2 * np.pi * t * 0.25) ** 2
    target = np.stack(
        [
            (0.4 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.randn(n)) * env,
            (0.38 * np.sin(2 * np.pi * 221 * t) + 0.05 * rng.randn(n)) * env,
        ],
        axis=1,
    ).astype(np.float32)
    reference = np.stack(
        [
            (0.7 * np.sign(np.sin(2 * np.pi * 110 * t)) + 0.05 * rng.randn(n)) * env,
            (0.7 * np.sign(np.sin(2 * np.pi * 110 * t)) + 0.05 * rng.randn(n)) * env,
        ],
        axis=1,
    ).astype(np.float32)
    return target, reference


def bench_single(jax, jnp, mg, config, seconds=180, sr=44100):
    target, reference = _make_pair(seconds, sr)
    from matchering_tpu.ops import smoothing

    # thread the smoothing operators as runtime args (closing over them
    # bakes ~134 MB of dense literals into the HLO)
    interp_ops = smoothing.interpolation_operator_arrays(
        config.internal_sample_rate,
        config.fft_size,
        config.lin_log_oversampling,
        jnp.dtype(config.dtype),
    )

    @jax.jit
    def graph(t, r, ops):
        out = mg.master_graph(t, r, config, need_default=True, interp_ops=ops)
        return jnp.sum(jnp.abs(out.result))

    variants = [
        (
            jax.device_put(target * (1.0 + 0.01 * i)),
            jax.device_put(reference * (1.0 - 0.01 * i)),
        )
        for i in range(4)
    ]
    median = _checksum_time(lambda t, r: float(graph(t, r, interp_ops)), variants)
    return {
        "seconds_audio": seconds,
        "wall_s": round(median, 4),
        "realtime_factor": round(seconds / median, 1),
    }


def bench_batch_sweep(jax, jnp, mg, config, seconds=180, sr=44100, sizes=(1, 2, 4, 8)):
    from matchering_tpu.parallel import batch as pbatch

    target, reference = _make_pair(seconds, sr)
    out = {}
    for B in sizes:
        targets = np.stack([target * (1 + 0.02 * i) for i in range(B)])
        references = np.stack([reference * (1 - 0.01 * i) for i in range(B)])

        def run(tb, rb):
            res = pbatch.master_batch(tb, rb, config)
            return float(jnp.sum(jnp.abs(res.result)))

        variants = [
            (
                jax.device_put(jnp.asarray(targets * (1 + 0.001 * i))),
                jax.device_put(jnp.asarray(references)),
            )
            for i in range(4)
        ]
        median = _checksum_time(run, variants)
        out[str(B)] = {
            "wall_s": round(median, 4),
            "pairs_per_s": round(B / median, 2),
            "audio_sec_per_s": round(B * seconds / median, 1),
        }
        print(f"batch B={B}: {out[str(B)]}", flush=True)
    return out


def bench_stages(jax, jnp, mg, config, seconds=180, sr=44100):
    """Per-stage wall times, each stage as its own dispatch (the production
    path fuses them — the sum here exceeds the fused total by design)."""
    from matchering_tpu.ops import basics, convolve, smoothing
    from matchering_tpu.stages import _Division, _analyze_levels, _matching_fir

    target, reference = _make_pair(seconds, sr)
    t_dev = jax.device_put(target)
    r_dev = jax.device_put(reference)
    interp_ops = smoothing.interpolation_operator_arrays(
        config.internal_sample_rate,
        config.fft_size,
        config.lin_log_oversampling,
        jnp.dtype(config.dtype),
    )

    @jax.jit
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
        return jnp.sum(mid_fir) + jnp.sum(side_fir), (tm * coeff, ts * coeff, mid_fir, side_fir, r_rms)

    @jax.jit
    def stage_convolve(tm, ts, mid_fir, side_fir):
        conv = convolve.fft_convolve_same_batch(
            jnp.stack([tm, ts]), jnp.stack([mid_fir, side_fir])
        )
        return jnp.sum(jnp.abs(conv)), conv

    @jax.jit
    def stage_correction(conv, r_rms):
        result_mid = conv[0]
        result = basics.ms_to_lr(result_mid, conv[1])
        t_div = _Division.static(result_mid.shape[0], config.max_piece_size)
        from matchering_tpu.ops.basics import loudest_piece_stats, piece_rms_flat

        for _ in range(config.rms_correction_steps):
            clipped = basics.clip(result_mid)
            rmses = piece_rms_flat(clipped, t_div.piece_size, t_div.divisions)
            _, match = loudest_piece_stats(rmses)
            c = r_rms / jnp.maximum(config.min_value, match)
            result_mid = result_mid * c
            result = result * c
        return jnp.sum(jnp.abs(result)), result

    @jax.jit
    def stage_limiter(result):
        return jnp.sum(jnp.abs(mg.limit(result, config)))

    timings = {}

    def timeit(name, fn, *args):
        float(jax.tree.leaves(fn(*args))[0])  # compile
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            float(jax.tree.leaves(out)[0])
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[1], 4)
        return out

    _, carry = timeit("analysis_and_fir", stage_analysis, t_dev, r_dev, interp_ops)
    tm, ts, mid_fir, side_fir, r_rms = carry
    _, conv = timeit("convolution", stage_convolve, tm, ts, mid_fir, side_fir)
    _, result = timeit("rms_correction_x4", stage_correction, conv, r_rms)
    timeit("limiter", stage_limiter, result)
    return timings


def bench_longform(jax, jnp, mg, minutes=60, sr=96000, ref_seconds=180):
    """60-min 96 kHz single-chip long-form master (the memory-lean flagship
    path: donation + chunked conv + hierarchical sequential scan).

    The reference track is a realistic 3-minute master, not another hour of
    audio (analysis only needs the reference's loudest pieces).  ``master``
    donates its input buffers, so the warm run re-stages the target — the
    staging cost is timed separately from compute (the tunnel H2D path here
    is ~8 MB/s and a production input pipeline overlaps it)."""
    config = mg.Config(internal_sample_rate=sr, max_length=2 * 3600)
    seconds = minutes * 60
    n = seconds * sr
    rng = np.random.RandomState(3)
    # build in chunks to bound host memory
    t = np.arange(n, dtype=np.float64) / sr
    env = (0.6 + 0.4 * np.sin(2 * np.pi * t * 0.05) ** 2).astype(np.float32)
    del t
    target = np.stack([env * 0.4] * 2, axis=1)
    target += (0.05 * rng.randn(n, 2)).astype(np.float32)
    del env
    n_ref = ref_seconds * sr
    t_ref = np.arange(n_ref) / sr
    reference = np.stack(
        [(0.7 * np.sign(np.sin(2 * np.pi * 98 * t_ref))).astype(np.float32)] * 2,
        axis=1,
    )
    reference += (0.05 * rng.randn(n_ref, 2)).astype(np.float32)
    del t_ref

    def stage(arr):
        t0 = time.perf_counter()
        dev = jax.device_put(arr)
        float(jax.jit(lambda a: jnp.sum(a[:: 1 << 20]))(dev))  # sync
        return dev, time.perf_counter() - t0

    t_dev, h2d_t = stage(target)
    r_dev, h2d_r = stage(reference)

    def run(t_in, r_in):
        t0 = time.perf_counter()
        out = mg.master(t_in, r_in, config, need_default=True)
        checksum = float(
            jax.jit(lambda a: jnp.sum(jnp.abs(a[:: 1 << 10])))(out.result)
        )
        dt = time.perf_counter() - t0
        del out
        return checksum, dt

    checksum, first_s = run(t_dev, r_dev)  # donation consumed t_dev/r_dev
    # distinct warm-run input (x1.01) so no layer of the tunneled backend
    # can memoize the identical computation
    np.multiply(target, 1.01, out=target)
    t_dev, h2d_t2 = stage(target)
    r_dev, _ = stage(reference)
    checksum, warm_s = run(t_dev, r_dev)

    # --- int16-PCM staging (VERDICT r4 items 2c/5): quantize the target to
    # int16, then master it staged BOTH ways — the raw int16 codes (half
    # the H2D bytes) and the float32 of the same codes.  Checksums must
    # match bit-identically (the graph converts ints on device with the
    # same full-scale convention), and the H2D walls give the measured
    # staging delta over the tunnel. ---
    np.clip(target, -0.999969, 0.999969, out=target)  # int16 headroom
    t_i16 = np.clip(np.rint(target * 32768.0), -32768, 32767).astype(np.int16)
    t_dev_int, h2d_int = stage(t_i16)
    r_dev, _ = stage(reference)
    checksum_int, int_run_s = run(t_dev_int, r_dev)
    t_f32 = t_i16.astype(np.float32) / 32768.0
    del t_i16
    t_dev_f, h2d_f = stage(t_f32)
    del t_f32
    r_dev, _ = stage(reference)
    checksum_f, float_run_s = run(t_dev_f, r_dev)
    return {
        "minutes_audio": minutes,
        "sample_rate": sr,
        "reference_seconds": ref_seconds,
        "h2d_staging_s": round(h2d_t + h2d_r, 1),
        "first_run_s": round(first_s, 1),
        "warm_run_s": round(warm_s, 1),
        "realtime_factor_warm": round(seconds / warm_s, 1),
        "checksum": checksum,
        "int16_staging": {
            "h2d_int16_s": round(h2d_int, 1),
            "h2d_float32_s": round(h2d_f, 1),
            "h2d_speedup": round(h2d_f / h2d_int, 2),
            "run_int16_s": round(int_run_s, 1),
            "run_float32_s": round(float_run_s, 1),
            "checksum_int16": checksum_int,
            "checksum_float32": checksum_f,
            "bit_identical": checksum_int == checksum_f,
        },
    }


def _load_artifact(path):
    """Existing artifact to merge into; tolerate a missing or corrupt file
    (e.g. a previous run killed mid-write)."""
    try:
        with open(path) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--longform", action="store_true")
    parser.add_argument(
        "--longform-only",
        action="store_true",
        help="run only the long-form bench and merge it into an existing --out",
    )
    parser.add_argument("--out", default="BENCH_EXTRA_r03.json")
    parser.add_argument("--skip-sweep", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import matchering_tpu as mg
    from matchering_tpu.utils import enable_compile_cache

    enable_compile_cache()
    config = mg.Config()

    if args.longform_only:
        artifact = _load_artifact(args.out)
        artifact.setdefault("device", str(jax.devices()[0]))
        artifact["longform_60min_96k"] = bench_longform(jax, jnp, mg)
        print("longform:", artifact["longform_60min_96k"], flush=True)
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=2)
            f.write("\n")
        print(f"wrote {args.out}")
        return

    # merge into an existing artifact — keep longform/dispatch sections
    artifact = _load_artifact(args.out)
    artifact["device"] = str(jax.devices()[0])
    artifact["single_pair_180s_44k"] = bench_single(jax, jnp, mg, config)
    print("single:", artifact["single_pair_180s_44k"], flush=True)
    artifact["per_stage_180s_44k"] = bench_stages(jax, jnp, mg, config)
    print("stages:", artifact["per_stage_180s_44k"], flush=True)
    if not args.skip_sweep:
        artifact["batch_sweep_180s_44k"] = bench_batch_sweep(jax, jnp, mg, config)
    if args.longform:
        artifact["longform_60min_96k"] = bench_longform(jax, jnp, mg)
        print("longform:", artifact["longform_60min_96k"], flush=True)

    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)
        f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
