"""On-chip verification + timing of the fused Pallas limiter front-end.

Run with MATCHERING_TPU_PALLAS=1 (arranges the scoped-VMEM headroom via
package import — see ops/pallas_envelope.py).  Verifies the kernel against
the unfused XLA ops on the real backend and records fused-vs-XLA timings
to PALLAS_BENCH.json.

Timing doctrine: both paths are dispatched as their own jitted programs
(the fused one IS ``limiter_front_end``'s own jit — reusing its compile
cache entry), synchronized by a tiny shared checksum program, medians over
perturbed inputs.
"""

import json
import time

import numpy as np
import jax, jax.numpy as jnp

import matchering_tpu  # noqa: F401  (sets LIBTPU_INIT_ARGS under MATCHERING_TPU_PALLAS=1)
from matchering_tpu.utils import enable_compile_cache

enable_compile_cache()
from matchering_tpu.ops import basics, sliding
from matchering_tpu.ops.pallas_envelope import limiter_front_end

n = 180 * 44100
thr = 0.998138427734375
attack = 44

x_np = (np.random.RandomState(1).randn(n, 2) * 0.6).astype(np.float32)
variants = [jax.device_put((x_np * (1.0 + 0.01 * i)).astype(np.float32)) for i in range(4)]


@jax.jit
def checksum(a, b):
    return jnp.sum(a[:: 1 << 10]) + jnp.sum(b[:: 1 << 10])


@jax.jit
def unfused(x):
    gain = basics.flip(1.0 / basics.rectify(x, thr))
    slided = sliding.sliding_max_attack(gain, attack)
    return gain, slided


def timed(fn):
    t0 = time.perf_counter()
    float(checksum(*fn(variants[0])))
    compile_s = time.perf_counter() - t0
    times = []
    for v in variants[1:]:
        t0 = time.perf_counter()
        float(checksum(*fn(v)))
        times.append(time.perf_counter() - t0)
    times.sort()
    return compile_s, times[len(times) // 2]


fused_compile, fused_run = timed(lambda v: limiter_front_end(v, thr, attack))
print(f"pallas fused: compile(+run) {fused_compile:.1f}s, warm {fused_run*1e3:.1f}ms", flush=True)
unfused_compile, unfused_run = timed(unfused)
print(f"xla unfused: compile(+run) {unfused_compile:.1f}s, warm {unfused_run*1e3:.1f}ms", flush=True)

# exactness on chip
x = variants[0]
gain, slided = limiter_front_end(x, thr, attack)
exp_gain, exp_slided = unfused(x)
gain_err = float(jnp.max(jnp.abs(gain - exp_gain)))
slided_err = float(jnp.max(jnp.abs(slided - exp_slided)))
print("gain err", gain_err, "slided err", slided_err, flush=True)

with open("PALLAS_BENCH.json", "w") as f:
    json.dump(
        {
            "track_seconds": 180,
            "samples": n,
            "fused_warm_ms": round(fused_run * 1e3, 2),
            "unfused_warm_ms": round(unfused_run * 1e3, 2),
            "gain_max_err": gain_err,
            "slided_max_err": slided_err,
            "note": (
                "each timing = one program dispatch + one checksum dispatch + "
                "host scalar fetch over the tunneled backend (~30 ms RTT each); "
                "scoped-vmem headroom flag required for the fused kernel "
                "(see ops/pallas_envelope.py)"
            ),
        },
        f,
        indent=2,
    )
    f.write("\n")
print("wrote PALLAS_BENCH.json")
