"""On-chip probe: real-FFT strategies for the convolution/analysis stages.

The backend's ``jnp.fft.irfft`` is broken (UNIMPLEMENTED / minute-scale
fallback compiles), so ``ops.fftpack.irfft`` Hermitian-extends to a FULL-size
complex ifft — 2x the arithmetic and complex-array bandwidth a real inverse
transform needs.  The classic half-complex packing gets the real transforms
back: rfft of real n via complex fft of n/2 (pack even/odd samples into
re/im) + O(n) twiddle recombination, irfft via the inverse recombination +
complex ifft of n/2.  This probe device-times (repeat-K fori_loop, RTT
cancels — method of tools_roofline2.py) every variant at the production
shapes, and cross-checks each new path against the existing one on chip.

Shapes: (121, 65536) = the 3-min overlap-save conv blocks;
(1937, 4096) = the analysis STFT frames.

Usage (from /root/repo, ONE TPU job at a time):
    python tools_probe_fft.py
"""

import json
import time

import numpy as np

_K = 8
_OUT = "PROBE_FFT.json"


def _median(fn, reps=7):
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    runs.sort()
    return runs[len(runs) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from matchering_tpu.utils import enable_compile_cache

    enable_compile_cache()

    report = {"device": str(jax.devices()[0]), "K": _K, "rows": {}}

    def flush():
        with open(_OUT, "w") as f:
            json.dump(report, f, indent=2)
            f.write("\n")

    def measure(name, fn, args, extra=None):
        def looped(k_static, s0, *a):
            def body(_, s):
                return fn(s, *a)

            return jax.lax.fori_loop(0, k_static, body, s0)

        s0 = jnp.asarray(1.0, jnp.float32)
        t0 = time.perf_counter()
        run1 = jax.jit(lambda s, *a: looped(1, s, *a)).lower(s0, *args).compile()
        runK = jax.jit(lambda s, *a: looped(_K, s, *a)).lower(s0, *args).compile()
        compile_s = time.perf_counter() - t0
        float(run1(s0, *args))
        float(runK(s0, *args))
        w1 = _median(lambda: float(run1(s0, *args)))
        wK = _median(lambda: float(runK(s0, *args)))
        dev = max((wK - w1) / (_K - 1), 1e-9)
        row = {
            "device_ms": round(dev * 1e3, 3),
            "wall_1_ms": round(w1 * 1e3, 2),
            "compile_s": round(compile_s, 1),
        }
        if extra:
            row.update(extra)
        report["rows"][name] = row
        print(name, json.dumps(row), flush=True)
        flush()
        return row

    def perturb(x, s):
        return x * (1.0 + 1e-7 * s)

    # ---- half-complex kernels (jnp) ----
    def rfft_half(x):
        n = x.shape[-1]
        m = n // 2
        pairs = x.reshape(x.shape[:-1] + (m, 2))
        z = jax.lax.complex(pairs[..., 0], pairs[..., 1])
        Z = jnp.fft.fft(z, axis=-1)
        Zk = jnp.concatenate([Z, Z[..., :1]], axis=-1)
        Zmk = jnp.conj(jnp.concatenate([Z[..., :1], Z[..., ::-1]], axis=-1))
        k = jnp.arange(m + 1)
        W = jnp.exp(-2j * jnp.pi * k / n).astype(Z.dtype)
        return 0.5 * (Zk + Zmk) - 0.5j * W * (Zk - Zmk)

    def irfft_half(S, n):
        m = n // 2
        Sk = S[..., :m]
        Smk = jnp.conj(S[..., m:0:-1])
        k = jnp.arange(m)
        W = jnp.exp(2j * jnp.pi * k / n).astype(S.dtype)
        Z = 0.5 * (Sk + Smk) + 0.5j * (W * (Sk - Smk))
        z = jnp.fft.ifft(Z, axis=-1)
        out = jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1)
        return out.reshape(S.shape[:-1] + (n,)).astype(jnp.float32)

    def irfft_herm(S, n):
        tail = jnp.conj(S[..., -2:0:-1])
        tail = jax.lax.optimization_barrier(tail)
        full = jnp.concatenate([S, tail], axis=-1)
        return jnp.real(jnp.fft.ifft(full, axis=-1)).astype(jnp.float32)

    rng = np.random.default_rng(0)
    for rows, n in [(121, 65536), (1937, 4096)]:
        tag = f"{rows}x{n}"
        x = jax.device_put(rng.standard_normal((rows, n)).astype(np.float32))
        spec = jax.block_until_ready(jnp.fft.rfft(x, axis=-1))

        # on-chip cross-checks (relative max error between paths); jitted —
        # eager op-by-op dispatch hits UNIMPLEMENTED kernels on this backend
        err_r = float(
            jax.jit(
                lambda a, sp: jnp.max(jnp.abs(rfft_half(a) - sp))
                / jnp.max(jnp.abs(sp))
            )(x, spec)
        )
        err_i = float(
            jax.jit(
                lambda sp, a: jnp.max(jnp.abs(irfft_half(sp, n) - irfft_herm(sp, n)))
                / jnp.max(jnp.abs(a))
            )(spec, x)
        )
        print(f"{tag}: rfft_half err {err_r:.2e}, irfft_half err {err_i:.2e}",
              flush=True)
        report["rows"][f"xcheck_{tag}"] = {
            "rfft_half_rel_err": err_r,
            "irfft_half_rel_err": err_i,
        }

        measure(f"rfft_native_{tag}",
                lambda s, a: jnp.sum(jnp.abs(jnp.fft.rfft(perturb(a, s), axis=-1))),
                (x,))
        measure(f"rfft_half_{tag}",
                lambda s, a: jnp.sum(jnp.abs(rfft_half(perturb(a, s)))),
                (x,))
        zc = jax.block_until_ready(spec[..., : n // 2])
        measure(f"cfft_half_{tag}",
                lambda s, a: jnp.sum(jnp.abs(jnp.fft.fft(a * (1.0 + 1e-7 * s), axis=-1))),
                (zc,))
        measure(f"irfft_herm_{tag}",
                lambda s, a: jnp.sum(jnp.abs(irfft_herm(a * (1.0 + 1e-7 * s), n))),
                (spec,))
        measure(f"irfft_half_{tag}",
                lambda s, a: jnp.sum(jnp.abs(irfft_half(a * (1.0 + 1e-7 * s), n))),
                (spec,))

    flush()
    print("wrote", _OUT, flush=True)


if __name__ == "__main__":
    main()
