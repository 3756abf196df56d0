"""Probe: which dynamic-length component costs what at compile time (TPU).

VERDICT r2 item 3 — the bucketed serving graph (Config(length_bucketing=N))
cold-compiled ~13 min at a 1M bucket on this backend's remote compile
service and was abandoned at 8M.  This tool compiles each dynamic-geometry
component in isolation (fresh HLO => genuinely cold) and times it, so the
re-engineering targets the measured hog instead of a guess.

Usage (from /root/repo, one TPU job at a time):
    python tools_probe_dynamic.py rms 1048576
    python tools_probe_dynamic.py spectrum 1048576
    python tools_probe_dynamic.py limiter 1048576
    python tools_probe_dynamic.py full 1048576
    python tools_probe_dynamic.py all 1048576
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20

    import jax
    import jax.numpy as jnp

    from matchering_tpu.config import Config
    from matchering_tpu.limiter import limit
    from matchering_tpu.ops import basics, spectrum

    config = Config()
    mps = config.max_piece_size
    div_max = n // mps + 1
    fpp_max = mps // config.fft_size + 1
    results = {}

    out_path = f"/tmp/probe_dynamic_{which}_{n}.json"

    def timed(name, fn, *args):
        t0 = time.time()
        lowered = jax.jit(fn).lower(*args)
        t1 = time.time()
        compiled = lowered.compile()
        t2 = time.time()
        results[name] = {
            "trace_lower_s": round(t1 - t0, 2),
            "compile_s": round(t2 - t1, 2),
            "hlo_bytes": len(lowered.as_text()),
        }
        print(name, json.dumps(results[name]), flush=True)
        # bank each component as it lands — remote compiles can take tens
        # of minutes and a killed run must not lose finished measurements
        with open(out_path, "w") as f:
            json.dump({"n": n, "results": results}, f, indent=1)
        return compiled

    shape_sig = jax.ShapeDtypeStruct((n,), jnp.float32)
    len_sig = jax.ShapeDtypeStruct((), jnp.int32)
    stereo_sig = jax.ShapeDtypeStruct((n, 2), jnp.float32)

    if which in ("rms", "all"):

        def rms_probe(x, length):
            d = length // mps + 1
            rmses, valid = basics.piece_rms_dynamic(x, length // d, d, div_max)
            return basics.loudest_piece_stats_masked(rmses, valid, d)

        timed("piece_rms_dynamic", rms_probe, shape_sig, len_sig)

    if which in ("spectrum", "all"):

        def spec_probe(x, length):
            d = length // mps + 1
            mask = jnp.ones((div_max,), jnp.float32)
            return spectrum.masked_average_spectrum_dynamic(
                x, mask, length // d, div_max, config.fft_size, fpp_max
            )

        timed("masked_average_spectrum_dynamic", spec_probe, shape_sig, len_sig)

    if which in ("limiter", "all"):
        timed(
            "limiter_truncated",
            lambda a, length: limit(a, config, length=length),
            stereo_sig,
            len_sig,
        )

    if which == "parts":
        # decompose the truncated limiter: which piece is remote-compile
        # hostile at large n?  (local XLA compiles the whole thing in ~6 s)
        from matchering_tpu.ops import iir, sliding
        from matchering_tpu.utils import ms_to_samples

        fs = config.internal_sample_rate
        attack = ms_to_samples(config.limiter.attack, fs)
        hold = ms_to_samples(config.limiter.hold, fs)
        smoother = iir.one_pole_filter(
            config.limiter.attack_filter_coefficient, attack
        )
        # cheapest-first so a hang on one component still banks the others
        timed(
            "scan_first_order",
            lambda x: iir.scan_first_order(x, 0.999962),
            shape_sig,
        )
        timed(
            "scan_first_order_ds",
            lambda x: iir.scan_first_order_ds(x, jnp.zeros_like(x), 0.999962)[0],
            shape_sig,
        )
        timed(
            "sliding_attack_static",
            lambda x: sliding.sliding_max_attack(x, attack),
            shape_sig,
        )
        timed(
            "sliding_hold_static",
            lambda x: sliding.sliding_max_hold(x, hold),
            shape_sig,
        )
        timed(
            "filtfilt_static",
            lambda x: iir.filtfilt_first_order(smoother, x),
            shape_sig,
        )
        timed(
            "butter_hold_static",
            lambda x: iir.butter_lowpass(
                config.limiter.hold_filter_order,
                config.limiter.hold_filter_coefficient,
                fs,
                x,
            ),
            shape_sig,
        )
        timed(
            "sliding_attack_truncated",
            lambda x, l: sliding.sliding_max_attack_truncated(x, attack, l),
            shape_sig,
            len_sig,
        )
        timed(
            "filtfilt_truncated",
            lambda x, l: iir.filtfilt_first_order_truncated(smoother, x, l),
            shape_sig,
            len_sig,
        )
        timed("limiter_static", lambda a: limit(a, config), stereo_sig)

    if which in ("full", "all"):
        from matchering_tpu.ops import smoothing
        from matchering_tpu.stages import master_graph

        interp_ops = smoothing.interpolation_operator_arrays(
            config.internal_sample_rate,
            config.fft_size,
            config.lin_log_oversampling,
            jnp.float32,
        )

        def full_probe(t, r, tl, rl, ops):
            return master_graph(
                t, r, config, interp_ops=ops, target_length=tl, reference_length=rl
            ).result

        ops_sig = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), interp_ops
        )
        timed("full_dynamic_graph", full_probe, stereo_sig, stereo_sig, len_sig, len_sig, ops_sig)

    with open(out_path, "w") as f:
        json.dump({"n": n, "results": results}, f, indent=1)
    print("WROTE", out_path, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
