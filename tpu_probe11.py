import time
import numpy as np
import jax, jax.numpy as jnp
from matchering_tpu.utils import enable_compile_cache
enable_compile_cache()

def bench(name, fn, *args):
    t0 = time.perf_counter()
    r = jax.jit(fn)(*args); v = float(jnp.sum(r))
    t1 = time.perf_counter()
    ts = []
    for _ in range(3):
        t2 = time.perf_counter()
        r = jax.jit(fn)(*args); v = float(jnp.sum(r))
        ts.append(time.perf_counter()-t2)
    print(f"{name}: compile+run {t1-t0:.2f}s, run {sorted(ts)[1]:.4f}s", flush=True)

n = 180*44100
x = jnp.asarray(np.random.RandomState(1).randn(n).astype(np.float32)*0.01)
pole = 0.999962

def _affine(p, q):
    return p[0]*q[0], q[0]*p[1]+q[1]

def scan_of_blocks(drive, block):
    nb = -(-n // block)
    padded = jnp.pad(drive, (0, nb*block - n))
    blocks = padded.reshape(nb, block)
    powers = jnp.asarray(np.float64(pole) ** np.arange(1, block+1), jnp.float32)
    a_block = jnp.asarray(np.float64(pole)**block, jnp.float32)
    pole_f = jnp.float32(pole)
    def step(carry, db):
        poles = jnp.broadcast_to(pole_f, db.shape)
        _, local = jax.lax.associative_scan(_affine, (poles, db))
        y = local + powers * carry
        return a_block*carry + local[-1], y
    _, ys = jax.lax.scan(step, jnp.zeros((), jnp.float32), blocks)
    return ys.reshape(-1)[:n]

def two_level(drive, block):
    nb = -(-n // block)
    padded = jnp.pad(drive, (0, nb*block - n))
    blocks = padded.reshape(nb, block)
    pole_f = jnp.float32(pole)
    poles = jnp.broadcast_to(pole_f, blocks.shape)
    _, local = jax.lax.associative_scan(_affine, (poles, blocks), axis=1)
    powers = jnp.asarray(np.float64(pole) ** np.arange(1, block+1), jnp.float32)
    a_block = jnp.asarray(np.float64(pole)**block, jnp.float32)
    a_vec = jnp.broadcast_to(a_block, (nb,))
    _, carries = jax.lax.associative_scan(_affine, (a_vec, local[:, -1]))
    carry_in = jnp.concatenate([jnp.zeros((1,), jnp.float32), carries[:-1]])
    return (local + powers[None,:] * carry_in[:,None]).reshape(-1)[:n]

import functools
bench("scan-of-blocks 32768", functools.partial(scan_of_blocks, block=32768), x)
bench("scan-of-blocks 131072", functools.partial(scan_of_blocks, block=131072), x)
bench("two-level parallel 32768", functools.partial(two_level, block=32768), x)
ref = np.asarray(scan_of_blocks(x, 32768))
got = np.asarray(two_level(x, 32768))
print("agree:", np.max(np.abs(ref-got)), flush=True)
print("done", flush=True)
