import time
import numpy as np
import jax, jax.numpy as jnp
from matchering_tpu.utils import enable_compile_cache
enable_compile_cache()
from matchering_tpu.ops import basics, sliding
from matchering_tpu.ops.pallas_envelope import limiter_front_end

n = 180*44100
x = jnp.asarray((np.random.RandomState(1).randn(n, 2)*0.6).astype(np.float32))
thr = 0.998138427734375
t0=time.perf_counter()
gain, slided = limiter_front_end(x, thr, 44)
s = float(jnp.sum(gain)+jnp.sum(slided))
print("pallas compile+run", time.perf_counter()-t0, flush=True)
t0=time.perf_counter()
gain, slided = limiter_front_end(x, thr, 44)
s = float(jnp.sum(gain)+jnp.sum(slided))
print("pallas run", time.perf_counter()-t0, flush=True)
exp_gain = basics.flip(1.0/basics.rectify(x, thr))
exp_slided = sliding.sliding_max_attack(exp_gain, 44)
print("gain err", float(jnp.max(jnp.abs(gain-exp_gain))), "slided err", float(jnp.max(jnp.abs(slided-exp_slided))), flush=True)
