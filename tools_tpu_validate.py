"""Two-phase TPU-vs-oracle validation + long-form run.

Phase tpu:  run the f32 master on the real TPU, save outputs.
Phase cpu:  run the f64 master on CPU, compare SNR.
Phase long: 60-min 96 kHz long-form master on the TPU (completes = pass).
"""
import sys, time
import numpy as np

def gen_pair(seconds, sr):
    rng = np.random.RandomState(99)
    n = int(seconds*sr)
    t = np.arange(n)/sr
    env = 0.6+0.4*np.sin(2*np.pi*0.21*t)**2
    tgt = np.stack([(0.35*np.sin(2*np.pi*220*t)+0.05*rng.randn(n))*env,
                    (0.33*np.sin(2*np.pi*219*t)+0.05*rng.randn(n))*env], 1)
    ref = np.stack([(0.6*np.sign(np.sin(2*np.pi*98*t))+0.06*rng.randn(n))*env,
                    (0.6*np.sign(np.sin(2*np.pi*98*t))+0.06*rng.randn(n))*env], 1)
    return tgt, ref

phase = sys.argv[1]
if phase == "tpu":
    import jax
    import matchering_tpu as mg
    from matchering_tpu.utils import enable_compile_cache
    enable_compile_cache()
    tgt, ref = gen_pair(30, 44100)
    out = mg.master(tgt.astype(np.float32), ref.astype(np.float32), mg.Config(), need_default=True)
    res = np.asarray(out.result)
    np.save("/tmp/tpu_master_out.npy", res)
    print("tpu phase done", res.shape, float(np.abs(res).max()), flush=True)
elif phase == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import matchering_tpu as mg
    tgt, ref = gen_pair(30, 44100)
    out = mg.master(tgt, ref, mg.Config(dtype="float64"), need_default=True)
    expected = np.asarray(out.result)
    got = np.load("/tmp/tpu_master_out.npy")
    err = expected - got
    snr = 10*np.log10(np.sum(expected**2)/np.sum(err**2))
    print(f"TPU f32 vs CPU f64 oracle SNR: {snr:.1f} dB", flush=True)
    assert snr > 60, "TPU numerics too far off"
elif phase == "long":
    import jax
    import jax.numpy as jnp
    import matchering_tpu as mg
    from matchering_tpu.utils import enable_compile_cache
    enable_compile_cache()
    sr = 96000
    n = 3600*sr
    # build on host in chunks to limit RAM
    t = np.arange(n, dtype=np.float64)/sr
    x = (0.3*np.sin(2*np.pi*220*t)).astype(np.float32)
    tgt = np.stack([x, 0.95*x], 1)
    del t, x
    ref_t = np.arange(200*sr)/sr
    ref = np.stack([(0.6*np.sign(np.sin(2*np.pi*98*ref_t))).astype(np.float32)]*2, 1)
    cfg = mg.Config(internal_sample_rate=sr, max_length=3600.0+1)
    t0 = time.time()
    out = mg.master(tgt, ref, cfg, need_default=True)
    s = float(jnp.sum(jnp.abs(out.result)))
    dt = time.time()-t0
    print(f"long-form 60min@96k: compile+run {dt:.1f}s, checksum {s:.3e}", flush=True)
    del out  # free the 2.8 GB result before the timed warm run
    t0 = time.time()
    out = mg.master(tgt*1.01, ref, cfg, need_default=True)
    s = float(jnp.sum(jnp.abs(out.result)))
    del out
    dt = time.time()-t0
    print(f"long-form warm run: {dt:.2f}s -> {3600/dt:.0f}x realtime, checksum {s:.3e}", flush=True)
