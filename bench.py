"""Benchmark: full-chain mastering throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload mirrors the reference's headline use (BASELINE.md /
``examples/basic.py``): a ~3-minute stereo 44.1 kHz target/reference pair
through the complete chain — level match, FIR EQ via overlap-save block FFT,
4-step RMS correction, Hyrax limiter.  The metric is realtime factor
(audio-seconds mastered per wall second); the reference publishes no numbers,
so vs_baseline is measured against the BASELINE.json north-star of 50x
realtime per chip.
"""

import json
import time

import numpy as np


def make_pair(seconds: int, sr: int):
    rng = np.random.RandomState(42)
    n = seconds * sr
    t = np.arange(n) / sr
    env = 0.6 + 0.4 * np.sin(2 * np.pi * t * 0.25) ** 2
    target = np.stack(
        [
            (0.4 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.randn(n)) * env,
            (0.38 * np.sin(2 * np.pi * 221 * t) + 0.05 * rng.randn(n)) * env,
        ],
        axis=1,
    )
    reference = np.stack(
        [
            (0.7 * np.sign(np.sin(2 * np.pi * 110 * t)) + 0.05 * rng.randn(n)) * env,
            (0.7 * np.sign(np.sin(2 * np.pi * 110 * t)) + 0.05 * rng.randn(n)) * env,
        ],
        axis=1,
    )
    return target.astype(np.float32), reference.astype(np.float32)


def main():
    import jax

    import matchering_tpu as mg
    from matchering_tpu.utils import enable_compile_cache

    enable_compile_cache()

    seconds, sr = 180, 44100
    target, reference = make_pair(seconds, sr)
    config = mg.Config()

    device = jax.devices()[0]
    # distinct inputs per timed run so no layer (including the remote TPU
    # tunnel) can memoize identical computations
    variants = [
        (
            jax.device_put(target * (1.0 + 0.01 * i), device),
            jax.device_put(reference * (1.0 - 0.01 * i), device),
        )
        for i in range(4)
    ]

    import jax.numpy as jnp

    @jax.jit
    def graph(target, reference):
        out = mg.master_graph(target, reference, config, need_default=True)
        # reduce to one scalar inside the program: fetching it to the host
        # is the only reliable synchronization on the tunneled TPU backend
        # (block_until_ready returns before execution completes there)
        return jnp.sum(jnp.abs(out.result))

    def run(pair):
        return float(graph(pair[0], pair[1]))

    run(variants[0])  # compile
    times = []
    for pair in variants[1:]:
        start = time.perf_counter()
        run(pair)
        times.append(time.perf_counter() - start)

    times.sort()
    median = times[len(times) // 2]
    realtime_factor = seconds / median
    print(
        json.dumps(
            {
                "metric": "full-chain mastering realtime factor (1 chip)",
                "value": round(realtime_factor, 2),
                "unit": "audio-sec/sec",
                "vs_baseline": round(realtime_factor / 50.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
