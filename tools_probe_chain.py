"""Minimal repro + fix probe: chained scans vs optimization_barrier (TPU).

Measured at 8M samples on the remote compile service (tools_probe_dynamic
"parts" mode): ONE blocked ds scan compiles in 4.5 s, but
``filtfilt_first_order`` — two scans chained through a reverse — did not
return in >21 min, and neither did the static/truncated limiter (4 chained
scans).  Hypothesis: the service's scheduling/fusion pass goes superlinear
when two multi-stage associative-scan pyramids land in one fusion region;
``lax.optimization_barrier`` between the passes should restore additive
compile cost.  This probe measures, at a given n:

    chain2_plain    y = scan(reverse(scan(x)))         (expect: hostile)
    chain2_barrier  same with optimization_barrier     (expect: ~2x one scan)

Each component compiles in its own fresh program; results bank to
/tmp/probe_chain_<n>.json after every step.  Components run
cheapest-expected-first; run under `timeout` so a hang self-terminates.

Usage: python tools_probe_chain.py 8388608 [barrier_only]
"""

import json
import sys
import time


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 23
    barrier_only = len(sys.argv) > 2 and sys.argv[2] == "barrier_only"

    import jax
    import jax.numpy as jnp

    from matchering_tpu.ops import iir

    pole = 0.999962
    results = {}
    out_path = f"/tmp/probe_chain_{n}.json"

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
        with open(out_path, "w") as f:
            json.dump({"n": n, "results": results}, f, indent=1)
        return compiled

    sig = jax.ShapeDtypeStruct((n,), jnp.float32)

    def one_ds(x):
        h, l = iir.scan_first_order_ds(x, jnp.zeros_like(x), pole)
        return h + l

    def chain2_barrier(x):
        y = one_ds(x)
        y = jax.lax.optimization_barrier(y)
        return one_ds(y[::-1])[::-1]

    def chain2_plain(x):
        y = one_ds(x)
        return one_ds(y[::-1])[::-1]

    timed("one_ds_scan", one_ds, sig)
    timed("chain2_barrier", chain2_barrier, sig)
    if not barrier_only:
        timed("chain2_plain", chain2_plain, sig)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
