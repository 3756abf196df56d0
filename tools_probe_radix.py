"""Within-run A/B: radix-2 vs radix-4 shift-ladder scans on the TPU.

The ladder scan (ops/iir.py _ladder_scan) does ceil(log2(n)) full passes
over the signal; a radix-4 step fuses three shifted multiply-adds into one
pass (window grows 4x per step), halving HBM traffic per scan.  The
limiter runs five IIR passes per channel, all bandwidth-bound, so this
measures the production-relevant composite: five chained ladder scans at
the 3-min track length, plain and double-single, both radices, warm
within-run medians (the shared chip's cross-run variance swamps small
deltas; see BENCH_EXTRA_r02.json cross_run_variance_note).

Usage (from /root/repo): python tools_probe_radix.py
"""

import json
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from matchering_tpu.ops import iir
    from matchering_tpu.utils import enable_compile_cache

    enable_compile_cache()

    n = 180 * 44100
    pole = 0.999962
    block = 1 << 15

    def ladder(u, p, radix, nn=None):
        nn = nn or u.shape[-1]
        y = u
        shift = 1
        while shift < nn:
            acc = y
            for j in range(1, radix):
                s = j * shift
                if s >= nn:
                    break
                c = jnp.asarray(float(np.float64(p)) ** s, u.dtype)
                pad = [(0, 0)] * (u.ndim - 1) + [(s, 0)]
                acc = acc + c * jnp.pad(y, pad)[..., :nn]
            y = acc
            shift *= radix
        return y

    def blocked(u, p, radix):
        nb = -(-u.shape[0] // block)
        b = jnp.pad(u, (0, nb * block - u.shape[0])).reshape(nb, block)
        local = ladder(b, p, radix)
        # carry chain with pole^block coefficients
        y = local[:, -1]
        shift = 1
        while shift < nb:
            acc = y
            for j in range(1, radix):
                s = j * shift
                if s >= nb:
                    break
                c = jnp.asarray(float(np.float64(p)) ** (block * s), u.dtype)
                acc = acc + c * jnp.pad(y, (s, 0))[:nb]
            y = acc
            shift *= radix
        powers, _ = iir._pole_powers(p, block, u.dtype)
        cin = jnp.concatenate([jnp.zeros((1,), u.dtype), y[:-1]])
        return (local + powers[None, :] * cin[:, None]).reshape(-1)[: u.shape[0]]

    def five(u, radix):
        y = u
        for _ in range(5):
            y = blocked(jax.lax.optimization_barrier(y), pole, radix)
        return jnp.sum(y)

    rng = np.random.RandomState(3)
    x0 = jax.device_put(jnp.asarray(rng.randn(n).astype(np.float32) * 0.01))
    results = {}
    for radix in (2, 4, 8):
        fn = jax.jit(lambda u, r=radix: five(u, r))
        t0 = time.time()
        float(fn(x0))
        compile_s = time.time() - t0
        times = []
        for i in range(7):
            xi = x0 * (1.0 + 0.001 * (i + 1))  # defeat tunnel memoization
            xi.block_until_ready()
            t0 = time.perf_counter()
            float(fn(xi))
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        results[f"radix{radix}"] = {
            "compile_s": round(compile_s, 2),
            "five_scans_warm_ms": round(med * 1e3, 2),
        }
        print(f"radix{radix}", json.dumps(results[f"radix{radix}"]), flush=True)
        with open("/tmp/probe_radix.json", "w") as f:
            json.dump(results, f, indent=1)

    # correctness cross-check on host
    xs = np.asarray(x0[:100000])
    r2 = np.asarray(blocked(jnp.asarray(xs), pole, 2))
    r4 = np.asarray(blocked(jnp.asarray(xs), pole, 4))
    print("radix2 vs radix4 max|d|:", float(np.abs(r2 - r4).max()), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
