"""Minimal repro + factor isolation: chained scans on the remote compiler (TPU).

Measured at 8M samples on the remote compile service (tools_probe_dynamic
"parts" mode): ONE blocked ds scan compiles in ~3 s, a barrier-separated
scan→reverse→scan chain in 4.4 s — but ``filtfilt_first_order`` (the same
two scans, with drive building, odd extension and a fence on every scan
*input*) did not return in two 5-9 min attempts with the service otherwise
idle.  So input fences alone do not keep the cost additive; something that
fuses with a scan's *output* (the reverse, the next drive build, the edge
scatters) or the misaligned extended length (n+12) is the trigger.

RESOLVED (r3): the probe matrix showed every ``associative_scan``-pyramid
variant at the 1M shape costs ~60 s (any pole, fence, or wrapper) while the
analytic Hillis-Steele shift ladder compiles in 0.6 s — the production
scans now run as radix-4 ladders (``ops/iir.py _ladder_scan`` /
``_ds_scan_zero_state``; adoption A/B in tools_probe_radix.py).

Each mode compiles ONE component in a fresh process (run under ``timeout``
so a hang self-terminates) and banks its result to
/tmp/probe_chain_<n>.json (merged across runs):

    one          one ds scan (control)
    entry        scan→reverse→scan, relying on the entry fences only
    outfence     same, plus an explicit barrier on scan 1's output
    misaligned   outfence variant at n+12 samples (blocked-scan pad path)
    scatter      one ds scan whose drive is built with .at[].add scatters
    filtfilt     iir.filtfilt_first_order with the limiter smoother
    filtfilt1m   the same at n = 1M (scaling reference)

Usage: python tools_probe_chain.py <n> <mode>
"""

import json
import sys
import time


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 23
    mode = sys.argv[2] if len(sys.argv) > 2 else "one"

    import jax
    import jax.numpy as jnp

    from matchering_tpu.config import Config
    from matchering_tpu.ops import iir
    from matchering_tpu.utils import ms_to_samples

    pole = 0.999962
    out_path = f"/tmp/probe_chain_{n}.json"
    try:
        with open(out_path) as f:
            results = json.load(f)["results"]
    except (FileNotFoundError, json.JSONDecodeError):
        results = {}

    def timed(name, fn, *args):
        t0 = time.time()
        lowered = jax.jit(fn).lower(*args)
        t1 = time.time()
        compiled = lowered.compile()
        t2 = time.time()
        results[name] = {
            "trace_lower_s": round(t1 - t0, 2),
            "compile_s": round(t2 - t1, 2),
            "hlo_bytes": len(lowered.as_text()),
        }
        print(name, json.dumps(results[name]), flush=True)
        with open(out_path, "w") as f:
            json.dump({"n": n, "results": results}, f, indent=1)
        return compiled

    def one_ds(x):
        h, l = iir.scan_first_order_ds(x, jnp.zeros_like(x), pole)
        return h + l

    sig = jax.ShapeDtypeStruct((n,), jnp.float32)

    if mode in ("rowscan_flat", "ladder_flat", "rowscan_corr"):
        # reshape-boundary bisect: the bare 2-D rowscan compiles in 1.2 s
        # but the full impl (same pyramid between flat-1M reshape
        # boundaries, plus carry/correction) takes 66 s — isolate whether
        # the flat boundaries or the carry/correction arm the slow pass
        rows, block = 32, 32768
        p = 0.9558
        sig1m = jax.ShapeDtypeStruct((rows * block,), jnp.float32)
        import numpy as _np

        def rowscan2d(b):
            poles = jnp.broadcast_to(jnp.asarray(p, b.dtype), b.shape)
            _, y = jax.lax.associative_scan(
                iir._affine_combine, (poles, b), axis=1
            )
            return y

        def ladder2d(b):
            y = b
            shift = 1
            while shift < block:
                coeff = jnp.asarray(_np.float64(p) ** shift, jnp.float32)
                y = y + coeff * jnp.pad(y, ((0, 0), (shift, 0)))[:, :block]
                shift *= 2
            return y

        if mode == "rowscan_flat":
            timed(
                "rowscan_flat_1m",
                lambda x: rowscan2d(x.reshape(rows, block)).reshape(-1),
                sig1m,
            )
        elif mode == "ladder_flat":
            timed(
                "ladder_flat_1m",
                lambda x: ladder2d(x.reshape(rows, block)).reshape(-1),
                sig1m,
            )
        else:
            # 2-D in/out rowscan + the carry chain and correction
            sig2d = jax.ShapeDtypeStruct((rows, block), jnp.float32)

            def corr(b):
                powers, a_block = iir._pole_powers(p, block, b.dtype)
                local = rowscan2d(b)
                _, carries = jax.lax.associative_scan(
                    iir._affine_combine,
                    (jnp.broadcast_to(a_block, (rows,)), local[:, -1]),
                )
                carry_in = jnp.concatenate(
                    [jnp.zeros((1,), b.dtype), carries[:-1]]
                )
                return local + powers[None, :] * carry_in[:, None]

            timed("rowscan_corr_2d", corr, sig2d)
    elif mode in ("impl", "wrapped"):
        # wrapper bisect: _scan_first_order_impl (two-level, no custom_vmap
        # wrapper, no input fence) vs the public scan_first_order — a fresh
        # pole value keeps any server-side memoization honest
        sig1m = jax.ShapeDtypeStruct((1 << 20,), jnp.float32)
        if mode == "impl":
            timed(
                "plain_impl_1m",
                lambda x: iir._scan_first_order_impl(x, 0.9557),
                sig1m,
            )
        else:
            timed(
                "plain_wrapped_1m",
                lambda x: iir.scan_first_order(x, 0.9557),
                sig1m,
            )
    elif mode in ("rowscan", "rowscan_ds", "ladder"):
        # bisect the plain-scan 60 s: just the per-row associative scan on
        # the (32, 32768) block view (plain 2-tuple vs ds 4-tuple combine),
        # and the analytic Hillis-Steele ladder (candidate fix: coefficients
        # are host scalars p^(2^s), no second scan operand at all)
        rows, block = 32, 32768
        sig2d = jax.ShapeDtypeStruct((rows, block), jnp.float32)
        p = 0.9556

        def rowscan(b):
            poles = jnp.broadcast_to(jnp.float32(p), b.shape)
            _, y = jax.lax.associative_scan(
                iir._affine_combine, (poles, b), axis=1
            )
            return y

        def rowscan_ds(b):
            ph = jnp.broadcast_to(jnp.float32(p), b.shape)
            pl = jnp.zeros_like(b)
            _, _, uh, ul = jax.lax.associative_scan(
                iir._ds_combine, (ph, pl, b, jnp.zeros_like(b)), axis=1
            )
            return uh + ul

        def ladder(b):
            import numpy as _np

            y = b
            shift = 1
            while shift < block:
                coeff = jnp.asarray(_np.float64(p) ** shift, jnp.float32)
                y = y + coeff * jnp.pad(y, ((0, 0), (shift, 0)))[:, :block]
                shift *= 2
            return y

        timed(f"{mode}_32x32768", {"rowscan": rowscan,
                                   "rowscan_ds": rowscan_ds,
                                   "ladder": ladder}[mode], sig2d)
    elif mode == "plainfence":
        # plain blocked scan at 1M with an optimization_barrier on the
        # broadcast constant-pole array: if this kills the ~60 s compile,
        # the remote compiler is constant-folding the coefficient half of
        # the scan pyramid (log-stages of full-size constant products)
        sig1m = jax.ShapeDtypeStruct((1 << 20,), jnp.float32)

        def fenced(x):
            return iir.scan_first_order(x, jax.lax.optimization_barrier(
                jnp.float32(0.9556)))

        timed("plain_scan_1m_fencedpole", fenced, sig1m)
    elif mode == "plainladder":
        # analytic Hillis-Steele ladder: no constant arrays in the scan at
        # all (coefficients are host scalars p^(2^s)) — candidate fix
        sig1m = jax.ShapeDtypeStruct((1 << 20,), jnp.float32)
        timed(
            "plain_scan_1m_ladder",
            lambda x: iir.scan_first_order(x, 0.9556),
            sig1m,
        )
    elif mode.startswith("plain:"):
        # plain (non-ds) blocked scan at 1M with a given pole — isolates
        # whether the pole VALUE (power-table underflow to denormals/zeros
        # for fast poles) is what the remote compiler chokes on
        p = float(mode.split(":", 1)[1])
        sig1m = jax.ShapeDtypeStruct((1 << 20,), jnp.float32)
        timed(
            f"plain_scan_1m_pole{p}",
            lambda x: iir.scan_first_order(x, p),
            sig1m,
        )
    elif mode == "one":
        timed("one_ds_scan", one_ds, sig)
    elif mode == "one_lo":
        # nontrivial lo drive: with lo=zeros XLA constant-folds half the
        # double-single pyramid away; this measures the full ds arithmetic
        def one_lo(x):
            h, l = iir.scan_first_order_ds(x, x * 1e-8, pole)
            return h + l

        timed("one_ds_scan_real_lo", one_lo, sig)
    elif mode == "one_lo_1m":

        def one_lo(x):
            h, l = iir.scan_first_order_ds(x, x * 1e-8, pole)
            return h + l

        timed(
            "one_ds_scan_real_lo_1m",
            one_lo,
            jax.ShapeDtypeStruct((1 << 20,), jnp.float32),
        )
    elif mode == "entry":
        timed("chain2_entryfence", lambda x: one_ds(one_ds(x)[::-1])[::-1], sig)
    elif mode == "outfence":

        def chain(x):
            y = jax.lax.optimization_barrier(one_ds(x))
            return one_ds(y[::-1])[::-1]

        timed("chain2_outfence", chain, sig)
    elif mode == "misaligned":
        sig12 = jax.ShapeDtypeStruct((n + 12,), jnp.float32)

        def chain(x):
            y = jax.lax.optimization_barrier(one_ds(x))
            return one_ds(y[::-1])[::-1]

        timed("chain2_misaligned", chain, sig12)
    elif mode == "scatter":

        def scat(x):
            drive = 0.007 * x
            drive = drive.at[1:].add(0.006 * x[:-1])
            drive = drive.at[0].add(0.5 * x[0])
            return one_ds(drive)

        timed("scan_scatter_drive", scat, sig)
    elif mode in ("filtfilt", "filtfilt1m"):
        config = Config()
        fs = config.internal_sample_rate
        attack = ms_to_samples(config.limiter.attack, fs)
        smoother = iir.one_pole_filter(
            config.limiter.attack_filter_coefficient, attack
        )
        if mode == "filtfilt1m":
            sig = jax.ShapeDtypeStruct((1 << 20,), jnp.float32)
        timed(
            f"filtfilt_{mode[8:] or '8m'}",
            lambda x: iir.filtfilt_first_order(smoother, x),
            sig,
        )
    elif mode.startswith("lf"):
        # bisect filtfilt's 69 s (at 1M!) cost: one lfilter pass with/without
        # the b1 term and zi scatter, and chained passes without the odd
        # extension — all at 1M where the full filtfilt is measurable.
        config = Config()
        fs = config.internal_sample_rate
        attack = ms_to_samples(config.limiter.attack, fs)
        smoother = iir.one_pole_filter(
            config.limiter.attack_filter_coefficient, attack
        )
        sig = jax.ShapeDtypeStruct((1 << 20,), jnp.float32)
        if mode == "lf_zi":
            timed(
                "lfilter_zi_1m",
                lambda x: iir.lfilter_first_order(smoother, x, zi=0.5),
                sig,
            )
        elif mode == "lf_nozi":
            timed(
                "lfilter_nozi_1m",
                lambda x: iir.lfilter_first_order(smoother, x),
                sig,
            )
        elif mode == "lf_chain_noext":

            def chain(x):
                y = iir.lfilter_first_order(smoother, x, zi=smoother.zi() * x[0])
                return iir.lfilter_first_order(
                    smoother, y[::-1], zi=smoother.zi() * y[-1]
                )[::-1]

            timed("lfilter_chain_noext_1m", chain, sig)
        elif mode == "lf_chain_nozi":

            def chain(x):
                y = iir.lfilter_first_order(smoother, x)
                return iir.lfilter_first_order(smoother, y[::-1])[::-1]

            timed("lfilter_chain_nozi_1m", chain, sig)
        else:
            raise SystemExit(f"unknown mode {mode}")
    else:
        raise SystemExit(f"unknown mode {mode}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
