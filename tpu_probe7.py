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

n = 180*44100
x = jnp.asarray(np.random.RandomState(1).randn(n).astype(np.float32)*0.3)
taps = 4096
h = jnp.asarray(np.random.randn(taps).astype(np.float32))
nfft = 1 << 17
hop = nfft - taps
full = n + taps - 1
nb = -(-full // hop)
print("nb:", nb, flush=True)

blk = jnp.asarray(np.random.randn(nb, nfft).astype(np.float32))
bench("rfft batch (63,131072)", lambda b: jnp.fft.rfft(b, axis=-1), blk)
bench("rfft+irfft batch", lambda b: jnp.fft.irfft(jnp.fft.rfft(b, axis=-1) * jnp.fft.rfft(h, n=nfft)[None,:], n=nfft, axis=-1), blk)

def blocks_only(a):
    padded = jnp.pad(a, (taps, (nb + 1) * hop - n - taps))
    body = padded[: nb * hop].reshape(nb, hop)
    tails = padded[hop : hop + nb * hop].reshape(nb, hop)[:, :taps]
    return jnp.concatenate([body, tails], axis=1).sum()
bench("blocks only", blocks_only, x)

def conv_aligned(a):
    padded = jnp.pad(a, (taps, (nb + 1) * hop - n - taps))
    body = padded[: nb * hop].reshape(nb, hop)
    tails = padded[hop : hop + nb * hop].reshape(nb, hop)[:, :taps]
    blocks = jnp.concatenate([body, tails], axis=1)
    H = jnp.fft.rfft(h, n=nfft)
    segs = jnp.fft.irfft(jnp.fft.rfft(blocks, axis=-1) * H[None, :], n=nfft, axis=-1)
    out = segs[:, taps:].reshape(-1)
    s = (taps - 1)//2
    return out[s:s+n]
bench("conv_aligned fresh", conv_aligned, x)
print("done", flush=True)
