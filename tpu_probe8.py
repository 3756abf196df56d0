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

nfft = 1 << 17
nb = 63
S = jnp.asarray((np.random.randn(nb, nfft//2+1) + 1j*np.random.randn(nb, nfft//2+1)).astype(np.complex64))
bench("ifft c2c (63,131072)", lambda s: jnp.fft.ifft(jnp.pad(s, ((0,0),(0,nfft//2-1))), axis=-1), S)

def herm_irfft(s):
    # irfft via c2c ifft of the Hermitian extension
    tail = jnp.conj(s[:, -2:0:-1])
    full = jnp.concatenate([s, tail], axis=1)
    return jnp.real(jnp.fft.ifft(full, axis=-1))
o = bench("herm-ifft irfft", herm_irfft, S)
ref = jnp.fft.irfft(S, n=nfft, axis=-1)  # compiles irfft (slow?) - time it
t0=time.perf_counter(); jax.block_until_ready(ref); t1=time.perf_counter()
print(f"true irfft compile+run: {t1-t0:.2f}s, match {float(jnp.max(jnp.abs(o-ref))):.2e}", flush=True)
print("done", flush=True)
