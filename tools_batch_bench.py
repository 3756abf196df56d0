"""Batch (data-parallel) mastering throughput on one chip.

The farm metric: pairs mastered per second with the vmapped batch path —
dispatch overhead amortizes across the batch, so per-pair cost approaches
pure compute.  (Multi-chip scaling multiplies this by the pairs axis size;
cross-pair communication is zero.)
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import matchering_tpu as mg
    from matchering_tpu.parallel import batch as pbatch
    from matchering_tpu.utils import enable_compile_cache

    enable_compile_cache()

    seconds, sr = 180, 44100
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rng = np.random.RandomState(7)
    n = seconds * sr
    t = np.arange(n) / sr
    base_t = (0.4 * np.sin(2 * np.pi * 220 * t) + 0.04 * rng.randn(n)).astype(np.float32)
    base_r = (0.7 * np.sign(np.sin(2 * np.pi * 110 * t)) + 0.04 * rng.randn(n)).astype(
        np.float32
    )
    targets = np.stack(
        [np.stack([base_t * (1 + 0.02 * i)] * 2, axis=1) for i in range(B)]
    )
    references = np.stack(
        [np.stack([base_r * (1 - 0.01 * i)] * 2, axis=1) for i in range(B)]
    )
    config = mg.Config()

    def run(tb, rb):
        out = pbatch.master_batch(tb, rb, config)
        return float(jnp.sum(jnp.abs(out.result)))

    # stage ONE batch on device outside the timed region (the tunnel H2D
    # path runs at ~25 MB/s — at B=16 even a single (t, r) batch is ~2 GB)
    # and derive the anti-memoization perturbations on device: the tunnel
    # memoizes byte-identical computations, so every timed rep must differ.
    tb0 = jax.device_put(jnp.asarray(targets))
    rb0 = jax.device_put(jnp.asarray(references))
    scale = jax.jit(lambda b, s: b * s)
    variants = [(scale(tb0, 1 + 0.001 * i), rb0) for i in range(4)]
    for tb, rb in variants:
        tb.block_until_ready()

    t0 = time.perf_counter()
    run(*variants[0])
    print(f"batch B={B} compile+run: {time.perf_counter() - t0:.1f}s", flush=True)

    times = []
    for tb, rb in variants[1:]:
        t0 = time.perf_counter()
        run(tb, rb)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[1]
    print(
        f"batch B={B} run: {med:.3f}s -> {B * seconds / med:.0f} audio-sec/sec, "
        f"{B / med:.1f} pairs/sec",
        flush=True,
    )


if __name__ == "__main__":
    main()
