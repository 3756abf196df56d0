import time
import numpy as np
import jax, jax.numpy as jnp
import matchering_tpu as mg
from matchering_tpu.utils import enable_compile_cache
enable_compile_cache()

sr = 96000
n = 3600*sr
t = np.arange(n, dtype=np.float64)/sr
x = (0.3*np.sin(2*np.pi*220*t)).astype(np.float32)
tgt = np.stack([x, 0.95*x], 1); del t, x
ref_t = np.arange(200*sr)/sr
ref = np.stack([(0.6*np.sign(np.sin(2*np.pi*98*ref_t))).astype(np.float32)]*2, 1)
cfg = mg.Config(internal_sample_rate=sr, max_length=3600.0+1)

t0=time.time()
tgt_d = jax.device_put(tgt); ref_d = jax.device_put(ref)
tgt_d.block_until_ready()
# force actual transfer completion with a computation
s = float(jnp.sum(tgt_d[:10]))
print(f"device_put 2.76GB: {time.time()-t0:.2f}s", flush=True)

def run(td, rd):
    out = mg.master(td, rd, cfg, need_default=True)
    s = float(jnp.sum(jnp.abs(out.result)))
    del out
    return s

t0=time.time(); run(tgt_d, ref_d); print(f"master (device inputs, cold-ish): {time.time()-t0:.1f}s", flush=True)
# donation invalidated tgt_d! re-put
tgt_d = jax.device_put(tgt); ref_d = jax.device_put(ref)
t0=time.time(); run(tgt_d, ref_d); print(f"master (device inputs, warm): {time.time()-t0:.2f}s", flush=True)
tgt_d = jax.device_put(tgt); ref_d = jax.device_put(ref)
t0=time.time(); run(tgt_d, ref_d); print(f"master (device inputs, warm2): {time.time()-t0:.2f}s", flush=True)
print("done", flush=True)
