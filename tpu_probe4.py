import time
import numpy as np
import jax, jax.numpy as jnp

def bench(name, fn, *args):
    t0 = time.perf_counter()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t1 = time.perf_counter()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t2 = time.perf_counter()
    print(f"{name}: compile+run {t1-t0:.2f}s, run {t2-t1:.4f}s", flush=True)
    return out

from matchering_tpu.ops import sliding, convolve
import matchering_tpu as mg

n = 180*44100
x = jnp.asarray(np.random.RandomState(1).randn(n).astype(np.float32)*0.3)
bench("van_herk chunked 8M w89", lambda a: sliding.max_filter1d(a, 89), x)
h = jnp.asarray(np.random.randn(4096).astype(np.float32))
bench("conv reshape 8M", lambda a: convolve.fft_convolve_same(a, h), x)
arr = jnp.stack([1.2*x, 1.1*x], axis=1)
cfg = mg.Config()
bench("limiter 8M", lambda a: mg.limit(a, cfg), arr)

tgt = jnp.stack([0.5*x, 0.45*x], axis=1)
ref = jnp.asarray(np.random.RandomState(2).randn(160*44100, 2).astype(np.float32)*0.4)
def master(t, r):
    return mg.master_graph(t, r, cfg, need_default=True).result
bench("FULL MASTER 180s", master, tgt, ref)
print("probe4 done", flush=True)
