"""Farm dispatch-strategy experiment: vmapped batch vs per-pair dispatch.

The recorded batch sweep (BENCH_EXTRA_r02.json) shows the vmapped batch at
~11-13 pairs/s while the single-pair fused program runs in ~62 ms wall
(~16 pairs/s serial) of which ~30 ms is the tunnel dispatch RTT.  Hypothesis:
same-bucket pairs dispatched as *independent* single-pair programs, fetched
only after all are enqueued, overlap dispatch RTT with device compute and
beat both (JAX dispatch is asynchronous; the device queue stays busy).

Three strategies over the same B pairs, all inputs pre-staged on device:

  serial    dispatch pair i, fetch its checksum, then dispatch pair i+1
  pipelined dispatch all B, then fetch all B checksums
  vmapped   one (B, n, 2) batched program (the current master_batch path)

Prints one JSON line per strategy.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import matchering_tpu as mg
    from matchering_tpu.parallel import batch as pbatch
    from matchering_tpu.utils import enable_compile_cache

    enable_compile_cache()

    seconds, sr, B = 180, 44100, 8
    rng = np.random.RandomState(11)
    n = seconds * sr
    t = np.arange(n) / sr
    base_t = (0.4 * np.sin(2 * np.pi * 220 * t) + 0.04 * rng.randn(n)).astype(
        np.float32
    )
    base_r = (
        0.7 * np.sign(np.sin(2 * np.pi * 110 * t)) + 0.04 * rng.randn(n)
    ).astype(np.float32)
    config = mg.Config()

    pairs = [
        (
            jax.device_put(
                jnp.asarray(np.stack([base_t * (1 + 0.015 * i)] * 2, axis=1))
            ),
            jax.device_put(
                jnp.asarray(np.stack([base_r * (1 - 0.01 * i)] * 2, axis=1))
            ),
        )
        for i in range(B)
    ]
    batch_t = jax.device_put(jnp.stack([p[0] for p in pairs]))
    batch_r = jax.device_put(jnp.stack([p[1] for p in pairs]))
    for p in pairs:
        p[0].block_until_ready()

    @jax.jit
    def graph(target, reference):
        out = mg.master_graph(target, reference, config, need_default=True)
        return jnp.sum(jnp.abs(out.result))

    def vmapped():
        out = pbatch.master_batch(batch_t, batch_r, config)
        return float(jnp.sum(jnp.abs(out.result)))

    def serial():
        return [float(graph(*p)) for p in pairs]

    def pipelined():
        handles = [graph(*p) for p in pairs]
        return [float(h) for h in handles]

    results = {}
    for name, fn in [
        ("serial", serial),
        ("pipelined", pipelined),
        ("vmapped", vmapped),
    ]:
        fn()  # compile / warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        med = sorted(times)[1]
        results[name] = {
            "wall_s": round(med, 4),
            "pairs_per_s": round(B / med, 2),
            "audio_sec_per_s": round(B * seconds / med, 1),
        }
        print(json.dumps({"strategy": name, "B": B, **results[name]}), flush=True)


if __name__ == "__main__":
    main()
