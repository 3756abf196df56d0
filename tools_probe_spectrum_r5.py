"""Probe: cutting the analysis stage's spectrum cost (VERDICT r4 item 7).

Post-r4, analysis+FIR is the largest device-time bucket (~8-10.5 ms of the
~23 ms fused chain, ROOFLINE.json v3), and within it the four masked
framed spectra (target/reference x mid/side) are the largest sub-block
(4.12 ms, PROBE_ANALYSIS.json).  The r4 packed probe (complex Hermitian
split materializing full-size complex intermediates) LOST (5.54 ms) — this
probe tries the two cheaper forms:

* ``batched1``: all four channels' frames through ONE rfft call (pure
  batching — wins if per-call overhead dominates);
* ``packed_real``: mid + i*side per track through one c2c, with the
  Hermitian split done entirely in REAL arithmetic on half-length slices
  (never materializes a full-size complex reversed copy):
      |A_k| = sqrt((R+Rr)^2 + (I-Ir)^2)/2
      |B_k| = sqrt((I+Ir)^2 + (R-Rr)^2)/2
  where (R, I) = (Re, Im) of fft(mid + i*side) and (Rr, Ir) their
  index-reversed-with-wrap halves.

Each variant is cross-checked against the production form before timing.
Results append to PROBE_SPECTRUM_R5.json.

Usage (from /root/repo, ONE TPU job at a time):
    python tools_probe_spectrum_r5.py
"""

import json
import time

import numpy as np


def main(seconds=180, sr=44100):
    import jax
    import jax.numpy as jnp

    import matchering_tpu as mg
    from matchering_tpu.ops import basics
    from matchering_tpu.ops.spectrum import masked_average_spectrum_flat
    from matchering_tpu.stages import _Division
    from matchering_tpu.utils import enable_compile_cache
    from tools_record_bench import _make_pair

    enable_compile_cache()
    config = mg.Config()
    fft_size = config.fft_size
    target, reference = _make_pair(seconds, sr)
    t_dev = jax.device_put(target)
    r_dev = jax.device_put(reference)

    division = _Division.static(target.shape[0], config.max_piece_size)
    piece, divs = division.piece_size, division.divisions
    fpp = piece // fft_size

    prep = jax.jit(
        lambda t, r: (
            basics.lr_to_ms(t) + basics.lr_to_ms(r)
        )
    )
    tm, ts, rm, rs = jax.block_until_ready(prep(t_dev, r_dev))
    mask_t = jnp.ones((divs,), tm.dtype)
    mask_r = jnp.ones((divs,), tm.dtype)

    K = 16
    report = {"device": str(jax.devices()[0]), "K": K, "fft_size": fft_size,
              "frames": divs * fpp, "rows": {}}

    def measure(name, fn, args):
        def looped(k, s0, *a):
            return jax.lax.fori_loop(0, k, lambda _, s: fn(s, *a), s0)

        s0 = jnp.asarray(1.0, jnp.float32)
        run1 = jax.jit(lambda s, *a: looped(1, s, *a)).lower(s0, *args).compile()
        runK = jax.jit(lambda s, *a: looped(K, s, *a)).lower(s0, *args).compile()
        float(run1(s0, *args)); float(runK(s0, *args))

        def median(f, reps=7):
            xs = []
            for _ in range(reps):
                t0 = time.perf_counter(); f(); xs.append(time.perf_counter() - t0)
            xs.sort(); return xs[len(xs) // 2]

        w1 = median(lambda: float(run1(s0, *args)))
        wK = median(lambda: float(runK(s0, *args)))
        dev = max((wK - w1) / (K - 1), 1e-9)
        row = {"wall_1_ms": round(w1 * 1e3, 2), "device_ms": round(dev * 1e3, 3)}
        report["rows"][name] = row
        print(name, row, flush=True)

    def perturb(x, s):
        return x * (1.0 + 1e-7 * s)

    # ---- production form: 4 separate masked spectra ----
    def spec4(s, a, b, c, d, m1, m2):
        return (
            jnp.sum(masked_average_spectrum_flat(perturb(a, s), m1, piece, divs, fft_size))
            + jnp.sum(masked_average_spectrum_flat(b, m1, piece, divs, fft_size))
            + jnp.sum(masked_average_spectrum_flat(c, m2, piece, divs, fft_size))
            + jnp.sum(masked_average_spectrum_flat(d, m2, piece, divs, fft_size))
        )

    # ---- variant 1: one rfft over all four channels' frames ----
    def frames_of(x):
        used = fpp * fft_size
        return jnp.concatenate(
            [
                jax.lax.slice(x, (p * piece,), (p * piece + used,)).reshape(fpp, fft_size)
                for p in range(divs)
            ]
        )

    def batched1(s, a, b, c, d, m1, m2):
        frames = jnp.stack([frames_of(perturb(a, s)), frames_of(b),
                            frames_of(c), frames_of(d)])  # (4, F, fft)
        specs = jnp.abs(jnp.fft.rfft(frames, axis=-1)) / fft_size
        w1 = jnp.repeat(m1, fpp)
        w2 = jnp.repeat(m2, fpp)
        sel1 = jnp.maximum(jnp.sum(m1), 1.0) * fpp
        sel2 = jnp.maximum(jnp.sum(m2), 1.0) * fpp
        avg = (
            jnp.sum(specs[0] * w1[:, None], axis=0) / sel1,
            jnp.sum(specs[1] * w1[:, None], axis=0) / sel1,
            jnp.sum(specs[2] * w2[:, None], axis=0) / sel2,
            jnp.sum(specs[3] * w2[:, None], axis=0) / sel2,
        )
        return sum(jnp.sum(v) for v in avg)

    # ---- variant 2: packed pair per track, real-arithmetic split ----
    def packed_pair_specs(mid, side, m):
        z = jax.lax.complex(frames_of(mid), frames_of(side))  # (F, fft)
        Z = jnp.fft.fft(z, axis=-1)
        R, I = jnp.real(Z), jnp.imag(Z)
        half = fft_size // 2 + 1

        def rev_half(X):
            # X[(n-k) % n] for k = 0..n/2, built from real arrays only; the
            # reversed window is barriered out of pad/concat fusions (the
            # TPU fusion emitter guard used across ops/)
            tail = X[..., :0:-1]
            tail = jax.lax.optimization_barrier(tail)
            return jnp.concatenate([X[..., :1], tail], axis=-1)[..., :half]

        Rh, Ih = R[..., :half], I[..., :half]
        Rr, Ir = rev_half(R), rev_half(I)
        mag_m = jnp.sqrt(jnp.square(Rh + Rr) + jnp.square(Ih - Ir)) * (0.5 / fft_size)
        mag_s = jnp.sqrt(jnp.square(Ih + Ir) + jnp.square(Rh - Rr)) * (0.5 / fft_size)
        w = jnp.repeat(m, fpp)
        sel = jnp.maximum(jnp.sum(m), 1.0) * fpp
        return (
            jnp.sum(mag_m * w[:, None], axis=0) / sel,
            jnp.sum(mag_s * w[:, None], axis=0) / sel,
        )

    def packed2(s, a, b, c, d, m1, m2):
        am, as_ = packed_pair_specs(perturb(a, s), b, m1)
        bm, bs = packed_pair_specs(c, d, m2)
        return jnp.sum(am) + jnp.sum(as_) + jnp.sum(bm) + jnp.sum(bs)

    # ---- cross-checks before timing ----
    want_m = jax.jit(lambda a, m: masked_average_spectrum_flat(a, m, piece, divs, fft_size))(tm, mask_t)
    want_s = jax.jit(lambda a, m: masked_average_spectrum_flat(a, m, piece, divs, fft_size))(ts, mask_t)
    got_m, got_s = jax.jit(lambda a, b, m: packed_pair_specs(a, b, m))(tm, ts, mask_t)
    err = float(
        jnp.maximum(
            jnp.max(jnp.abs(got_m - want_m)) / jnp.max(jnp.abs(want_m)),
            jnp.max(jnp.abs(got_s - want_s)) / jnp.max(jnp.abs(want_s)),
        )
    )
    report["rows"]["xcheck_packed_real"] = {"rel_err": err}
    print("packed_real err:", err, flush=True)
    assert err < 1e-5, err

    args = (tm, ts, rm, rs, mask_t, mask_r)
    measure("masked_spectrum_x4_production", spec4, args)
    measure("batched_one_rfft", batched1, args)
    measure("packed_real_x2", packed2, args)

    with open("PROBE_SPECTRUM_R5.json", "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print("wrote PROBE_SPECTRUM_R5.json", flush=True)


if __name__ == "__main__":
    main()
