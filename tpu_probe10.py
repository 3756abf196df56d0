import time
import numpy as np
import jax, jax.numpy as jnp

def bench(name, fn, *args):
    t0 = time.perf_counter()
    r = jax.jit(fn)(*args); v = float(jnp.sum(r))
    t1 = time.perf_counter()
    r = jax.jit(fn)(*args); v = float(jnp.sum(r))
    t2 = time.perf_counter()
    print(f"{name}: compile+run {t1-t0:.2f}s, run {t2-t1:.4f}s", flush=True)

n = 180*44100
x = jnp.asarray(np.random.RandomState(1).randn(n).astype(np.float32)*0.3)
div, piece = 13, 610615

bench("sum 2d aligned (1938,4096)", lambda a: jnp.sum(jnp.square(jnp.pad(a,(0,1938*4096-n)).reshape(1938,4096)), axis=1), x)
bench("reshape odd, no reduce", lambda a: jnp.square(a[:div*piece].reshape(div, piece))[:, ::7].sum(axis=1), x)
bench("rowsum odd (13,610615)", lambda a: jnp.sum(jnp.square(a[:div*piece].reshape(div, piece)), axis=1), x)
print("done", flush=True)
