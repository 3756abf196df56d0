"""On-chip SNR validation of the compensated-scan engines (VERDICT r4 item 1).

The r4 round switched the default compensated-scan engine from the
double-single ladder to one step of iterative refinement over the plain f32
ladder scan (``ops/iir.py _refined_ds``) — but its >=216 dB accuracy claim
was CPU-only.  The refinement residual depends on error-free transforms
surviving the TPU compiler: a reassociation would silently collapse f32
full-chain accuracy from ~104 dB to ~70 dB.  This tool measures, ON CHIP:

* ``kernel <engine>`` — SNR of ``scan_first_order_ds`` against the exact
  float64 recurrence (scipy lfilter) at the limiter's two production poles
  (hold: butter(1, 7 Hz); release: butter(1, 800/3000 Hz) — the near-unit
  pole where naive f32 floors at ~70 dB), 2^23 samples (~3.2 min track).
* ``master <engine>`` — the full f32 mastering chain on a 30 s pair
  (same fixture as tools_tpu_validate.py), output saved for the oracle.
* ``oracle`` — CPU float64 full-chain oracle; writes SNR_ONCHIP_r05.json
  merging every row produced by the phases above.

Run each phase as a separate process (the engine choice is baked in at
trace time; MATCHERING_TPU_DS_ENGINE must be set in the environment before
the phase starts):

    MATCHERING_TPU_DS_ENGINE=refine /opt/venv/bin/python tools_r5_snr.py kernel refine
    MATCHERING_TPU_DS_ENGINE=ladder /opt/venv/bin/python tools_r5_snr.py kernel ladder
    MATCHERING_TPU_DS_ENGINE=refine /opt/venv/bin/python tools_r5_snr.py master refine
    MATCHERING_TPU_DS_ENGINE=ladder /opt/venv/bin/python tools_r5_snr.py master ladder
    /opt/venv/bin/python tools_r5_snr.py oracle
"""
import json
import os
import sys

import numpy as np

ROWS_PATH = "/tmp/r5_snr_rows.jsonl"
OUT_PATH = "SNR_ONCHIP_r05.json"


def gen_pair(seconds, sr):
    """Same fixture as tools_tpu_validate.py (seed 99)."""
    rng = np.random.RandomState(99)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    env = 0.6 + 0.4 * np.sin(2 * np.pi * 0.21 * t) ** 2
    tgt = np.stack(
        [
            (0.35 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.randn(n)) * env,
            (0.33 * np.sin(2 * np.pi * 219 * t) + 0.05 * rng.randn(n)) * env,
        ],
        1,
    )
    ref = np.stack(
        [
            (0.6 * np.sign(np.sin(2 * np.pi * 98 * t)) + 0.06 * rng.randn(n)) * env,
            (0.6 * np.sign(np.sin(2 * np.pi * 98 * t)) + 0.06 * rng.randn(n)) * env,
        ],
        1,
    )
    return tgt, ref


def append_row(row):
    with open(ROWS_PATH, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("ROW", json.dumps(row), flush=True)


def snr_db(expected64, got64):
    err = expected64 - got64
    return float(10 * np.log10(np.sum(expected64**2) / np.sum(err**2)))


def limiter_poles(fs=44100.0):
    """The two production first-order Butterworth poles (hold 7 Hz, release
    800/3000 Hz — reference hyrax.py:61-75) plus their b coefficients."""
    from scipy import signal

    out = {}
    for name, cutoff in (("hold_7hz", 7.0), ("release_0p267hz", 800.0 / 3000.0)):
        b, a = signal.butter(1, cutoff, fs=fs)
        out[name] = (b.astype(np.float64), a.astype(np.float64))
    return out


def phase_kernel(engine):
    assert os.environ.get("MATCHERING_TPU_DS_ENGINE", "refine") == engine
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from matchering_tpu.ops import iir
    from matchering_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from scipy import signal

    n = 1 << 23  # ~3.2 min at 44.1 kHz
    rng = np.random.RandomState(7)
    # a limiter-like drive: smooth positive gain envelope with spikes
    t = np.arange(n) / 44100.0
    d64 = 0.02 + 0.01 * np.sin(2 * np.pi * 0.37 * t) ** 2 + 0.002 * np.abs(
        rng.randn(n)
    )
    d32 = d64.astype(np.float32)

    backend = jax.default_backend()
    for name, (b, a) in limiter_poles().items():
        pole = float(-a[1])
        # exact f64 recurrence y[i] = d[i] + pole*y[i-1] on the f32-rounded
        # drive (what the chip actually integrates)
        y64 = signal.lfilter([1.0], [1.0, -pole], d32.astype(np.float64))

        dh = jnp.asarray(d32)
        dl = jnp.zeros_like(dh)
        yh, yl = jax.jit(lambda h, l: iir.scan_first_order_ds(h, l, pole))(dh, dl)
        got = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
        plain = np.asarray(
            jax.jit(lambda h: iir.scan_first_order(h, pole))(dh), np.float64
        )
        append_row(
            {
                "row": f"kernel_scan_ds_{name}",
                "engine": engine,
                "backend": backend,
                "n": n,
                "pole": pole,
                "snr_db": round(snr_db(y64, got), 1),
                "plain_f32_snr_db": round(snr_db(y64, plain), 1),
            }
        )


def phase_master(engine):
    assert os.environ.get("MATCHERING_TPU_DS_ENGINE", "refine") == engine
    import jax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import matchering_tpu as mg
    from matchering_tpu.utils import enable_compile_cache

    enable_compile_cache()
    tgt, ref = gen_pair(30, 44100)
    out = mg.master(
        tgt.astype(np.float32), ref.astype(np.float32), mg.Config(), need_default=True
    )
    res = np.asarray(out.result)
    np.save(f"/tmp/r5_master_{engine}.npy", res)
    print(
        f"master[{engine}] on {jax.default_backend()}: shape {res.shape}, "
        f"peak {float(np.abs(res).max()):.6f}",
        flush=True,
    )


def phase_oracle():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import matchering_tpu as mg

    tgt, ref = gen_pair(30, 44100)
    out = mg.master(tgt, ref, mg.Config(dtype="float64"), need_default=True)
    expected = np.asarray(out.result)

    rows = []
    if os.path.exists(OUT_PATH):  # keep rows from earlier phases/runs
        with open(OUT_PATH) as f:
            rows = json.load(f).get("rows", [])
    if os.path.exists(ROWS_PATH):
        with open(ROWS_PATH) as f:
            rows += [json.loads(line) for line in f if line.strip()]
    graph_rev = (
        os.popen("git -C /root/repo rev-parse --short HEAD 2>/dev/null").read().strip()
    )
    for engine in ("refine", "ladder"):
        path = f"/tmp/r5_master_{engine}.npy"
        if not os.path.exists(path):
            continue
        got = np.load(path).astype(np.float64)
        rows.append(
            {
                "row": "full_chain_master_30s",
                "engine": engine,
                "backend": "tpu (saved output)",
                "graph": graph_rev,
                "snr_db": round(snr_db(expected, got), 1),
                "oracle": "cpu float64 full chain, same fixture",
            }
        )
    doc = {
        "what": "on-chip SNR validation of the compensated-scan engines "
        "(VERDICT r4 item 1): scan_first_order_ds at the limiter poles vs "
        "the exact f64 recurrence, and the full f32 mastering chain vs the "
        "f64 CPU oracle",
        "rows": rows,
    }
    with open(OUT_PATH, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc, indent=1), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "kernel":
        phase_kernel(sys.argv[2])
    elif mode == "master":
        phase_master(sys.argv[2])
    elif mode == "oracle":
        phase_oracle()
    else:
        raise SystemExit(f"unknown mode {mode}")
