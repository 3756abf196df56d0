"""On-chip breakdown of the analysis_and_fir stage (10.1 ms device in
ROOFLINE.json) — which sub-part is worth attacking.

Rows (repeat-K device times, production 3-min shapes):
  * lr_to_ms + normalize
  * piece RMS + loudest stats (x2 signals)
  * masked average spectrum (x4 signals)
  * packed masked spectrum (mid + i*side through one c2c fft) x2
  * smoothing matmuls + lowess (x2)
  * fir synthesis (x2)

Usage (from /root/repo, ONE TPU job at a time):
    python tools_probe_analysis.py
"""

import json
import time

import numpy as np

from tools_record_bench import _make_pair

_K = 8
_OUT = "PROBE_ANALYSIS.json"


def _median(fn, reps=7):
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    runs.sort()
    return runs[len(runs) // 2]


def main(seconds=180, sr=44100):
    import jax
    import jax.numpy as jnp

    import matchering_tpu as mg
    from matchering_tpu.ops import basics, fir, smoothing, spectrum
    from matchering_tpu.stages import _Division, _analyze_levels, _masked_spectrum
    from matchering_tpu.utils import enable_compile_cache

    enable_compile_cache()
    config = mg.Config()
    target, reference = _make_pair(seconds, sr)
    t_dev = jax.device_put(target)
    r_dev = jax.device_put(reference)
    report = {"device": str(jax.devices()[0]), "K": _K, "rows": {}}

    def flush():
        with open(_OUT, "w") as f:
            json.dump(report, f, indent=2)
            f.write("\n")

    def measure(name, fn, args):
        def looped(k_static, s0, *a):
            def body(_, s):
                return fn(s, *a)

            return jax.lax.fori_loop(0, k_static, body, s0)

        s0 = jnp.asarray(1.0, jnp.float32)
        run1 = jax.jit(lambda s, *a: looped(1, s, *a)).lower(s0, *args).compile()
        runK = jax.jit(lambda s, *a: looped(_K, s, *a)).lower(s0, *args).compile()
        float(run1(s0, *args))
        float(runK(s0, *args))
        w1 = _median(lambda: float(run1(s0, *args)))
        wK = _median(lambda: float(runK(s0, *args)))
        dev = max((wK - w1) / (_K - 1), 1e-9)
        row = {"device_ms": round(dev * 1e3, 3), "wall_1_ms": round(w1 * 1e3, 2)}
        report["rows"][name] = row
        print(name, json.dumps(row), flush=True)
        flush()
        return row

    def perturb(x, s):
        return x * (1.0 + 1e-7 * s)

    division = _Division.static(target.shape[0], config.max_piece_size)

    measure(
        "normalize_and_ms",
        lambda s, t, r: (
            lambda tm_ts, rm_rs: jnp.sum(tm_ts[0]) + jnp.sum(rm_rs[1])
        )(
            basics.lr_to_ms(perturb(t, s)),
            basics.lr_to_ms(
                basics.normalize(r, config.threshold, config.min_value, False)[0]
            ),
        ),
        (t_dev, r_dev),
    )

    tm, ts_ = basics.lr_to_ms(t_dev)
    rm, rs_ = basics.lr_to_ms(r_dev)
    tm = jax.block_until_ready(tm)

    measure(
        "levels_x2",
        lambda s, a, b: _analyze_levels(perturb(a, s), division)[1]
        + _analyze_levels(b, division)[1],
        (tm, rm),
    )

    mask = jax.block_until_ready(
        jax.jit(lambda a: _analyze_levels(a, division)[0])(tm)
    )

    measure(
        "masked_spectrum_x4",
        lambda s, a, b, c, d, m: jnp.sum(
            _masked_spectrum(perturb(a, s), m, division, config)
        )
        + jnp.sum(_masked_spectrum(b, m, division, config))
        + jnp.sum(_masked_spectrum(c, m, division, config))
        + jnp.sum(_masked_spectrum(d, m, division, config)),
        (tm, ts_, rm, rs_, mask),
    )

    # packed variant: mid + i*side through ONE c2c fft, |spectra| via
    # Hermitian split — two signals per transform
    def packed_masked_spectrum(mid, side, m):
        fft_size = config.fft_size
        piece, divs = division.piece_size, division.divisions
        fpp = piece // fft_size
        z = jax.lax.complex(
            mid[: divs * piece], side[: divs * piece]
        ).reshape(divs, piece)[:, : fpp * fft_size].reshape(divs, fpp, fft_size)
        Z = jnp.fft.fft(z, axis=-1)
        half = Z[..., : fft_size // 2 + 1]
        # conj(Z[(n-k) % n]) for k=0..n/2
        revs = jnp.conj(
            jnp.concatenate([Z[..., :1], Z[..., :0:-1]], axis=-1)[
                ..., : fft_size // 2 + 1
            ]
        )
        spec_m = jnp.abs(0.5 * (half + revs)) / fft_size
        spec_s = jnp.abs(-0.5j * (half - revs)) / fft_size
        w = jnp.maximum(jnp.sum(m), 1.0)
        avg_m = jnp.sum(jnp.mean(spec_m, axis=1) * m[:, None], axis=0) / w
        avg_s = jnp.sum(jnp.mean(spec_s, axis=1) * m[:, None], axis=0) / w
        return avg_m, avg_s

    # cross-check vs the per-channel form
    am, as_ = jax.jit(lambda a, b, m: packed_masked_spectrum(a, b, m))(tm, ts_, mask)
    wm = jax.jit(lambda a, m: _masked_spectrum(a, m, division, config))(tm, mask)
    ws = jax.jit(lambda a, m: _masked_spectrum(a, m, division, config))(ts_, mask)
    err = float(
        jnp.maximum(
            jnp.max(jnp.abs(am - wm)) / jnp.max(jnp.abs(wm)),
            jnp.max(jnp.abs(as_ - ws)) / jnp.max(jnp.abs(ws)),
        )
    )
    report["rows"]["xcheck_packed_spectrum"] = {"rel_err": err}
    print("packed spectrum err", err, flush=True)

    measure(
        "packed_spectrum_x2pairs",
        lambda s, a, b, c, d, m: jnp.sum(
            packed_masked_spectrum(perturb(a, s), b, m)[0]
        )
        + jnp.sum(packed_masked_spectrum(c, d, m)[1]),
        (tm, ts_, rm, rs_, mask),
    )

    interp_ops = smoothing.interpolation_operator_arrays(
        config.internal_sample_rate,
        config.fft_size,
        config.lin_log_oversampling,
        jnp.dtype(config.dtype),
    )
    match_fft = jax.block_until_ready(wm / jnp.maximum(config.min_value, ws))

    def smooth2(s, v):
        v = perturb(v, s)
        a = smoothing.smooth_exponentially(
            v,
            config.internal_sample_rate,
            config.fft_size,
            config.lin_log_oversampling,
            config.lowess_frac,
            config.lowess_it,
            config.lowess_delta,
            operators=interp_ops,
        )
        b = smoothing.smooth_exponentially(
            v * 1.0001,
            config.internal_sample_rate,
            config.fft_size,
            config.lin_log_oversampling,
            config.lowess_frac,
            config.lowess_it,
            config.lowess_delta,
            operators=interp_ops,
        )
        return jnp.sum(a) + jnp.sum(b)

    measure("smoothing_x2", smooth2, (match_fft,))

    measure(
        "fir_synthesis_x2",
        lambda s, v: jnp.sum(fir.fir_from_magnitude(perturb(v, s), config.fft_size))
        + jnp.sum(fir.fir_from_magnitude(v * 1.0001, config.fft_size)),
        (match_fft,),
    )

    flush()
    print("wrote", _OUT, flush=True)


if __name__ == "__main__":
    main()
