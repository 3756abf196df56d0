import time
import numpy as np
import jax, jax.numpy as jnp

def bench(name, fn, *args):
    t0 = time.perf_counter()
    r = jax.jit(fn)(*args)
    v = float(jnp.sum(r)) if hasattr(r, 'shape') else float(r)
    t1 = time.perf_counter()
    r = jax.jit(fn)(*args); v = float(jnp.sum(r)) if hasattr(r, 'shape') else float(r)
    t2 = time.perf_counter()
    print(f"{name}: compile+run {t1-t0:.2f}s, run {t2-t1:.4f}s", flush=True)

import matchering_tpu as mg
from matchering_tpu.ops import basics, spectrum, smoothing, lowess, fir
from matchering_tpu import stages

cfg = mg.Config()
n = 180*44100
x = jnp.asarray(np.random.RandomState(1).randn(n).astype(np.float32)*0.3)
div, piece = stages.piece_division(n, cfg.max_piece_size)
print("div/piece:", div, piece, flush=True)

pieces = basics.unfold(x, piece, div)
bench("analysis: unfold+rms+mask", lambda a: basics.loudest_piece_stats(basics.batch_rms(basics.unfold(a, piece, div)))[1], x)
mask = jnp.ones((div,), jnp.float32)
bench("masked spectrum", lambda p: spectrum.masked_average_spectrum(p, mask, cfg.fft_size), pieces)
curve = jnp.asarray(np.abs(np.random.randn(cfg.fft_size//2+1)).astype(np.float32)+0.1)
bench("smoothing (interp+lowess)", lambda c: smoothing.smooth_exponentially(c, 44100, cfg.fft_size, 4, cfg.lowess_frac, 0, cfg.lowess_delta), curve)
y = jnp.asarray(np.random.randn((cfg.fft_size//2)*4+1).astype(np.float32))
bench("lowess alone", lambda a: lowess.smooth(a, cfg.lowess_frac, 0, cfg.lowess_delta), y)
bench("fir synth", lambda c: fir.fir_from_magnitude(c, cfg.fft_size), curve)
print("done", flush=True)
