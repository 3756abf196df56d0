"""IIR filtering as parallel prefix scans (JAX).

The only truly sequential computations in the whole mastering chain are the
limiter's five first-order IIR passes (reference
``matchering/limiter/hyrax.py:48-75``).  On TPU we express each linear
recurrence ``y[i] = u[i] + p * y[i-1]`` as an O(log n)-depth parallel
prefix: a Hillis-Steele shift ladder with host-scalar ``p^(2^k)``
coefficients for static poles (see :func:`_ladder_scan` for why not
``associative_scan`` on this backend), fully vectorizable and
block-decomposable for time sharding (the per-block carry is a single
affine map, see ``parallel/timeshard.py``).

Semantics reproduced exactly:

* ``lfilter_first_order`` — ``scipy.signal.lfilter(b, a, x)`` for first-order
  (b0, b1) / (1, a1) filters, zero initial state, optional DF2T ``zi``.
* ``filtfilt_first_order`` — ``scipy.signal.filtfilt(b, a, x)`` with its
  default odd-extension padding (padlen = 3 * max(len(a), len(b)) = 6) and
  ``lfilter_zi`` initial conditions (reference ``hyrax.py:48-53`` relies on
  these defaults).
* ``butter1_coefficients`` — host-side first-order Butterworth design, equal
  to ``scipy.signal.butter(1, wn, fs=fs)``.

Filter coefficients are host-side Python floats (static); only the signal is
on device.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class FirstOrderFilter(NamedTuple):
    """Transfer function b = (b0, b1), a = (1, a1), all host floats."""

    b0: float
    b1: float
    a1: float

    @property
    def pole(self) -> float:
        return -self.a1

    def zi(self) -> float:
        """Steady-state DF2T initial condition, equal to
        ``scipy.signal.lfilter_zi(b, a)`` for a first-order section:
        the single state value z satisfying the step-response fixed point
        z = b1 - a1*(b0 + z) ... solved: z = (b1 - a1*b0) / (1 + a1)."""
        return (self.b1 - self.a1 * self.b0) / (1.0 + self.a1)


def one_pole_filter(coefficient: float, time_samples: float) -> FirstOrderFilter:
    """The limiter's attack smoother: b = [1-c], a = [1, -c] with
    c = exp(coefficient / time_samples) (reference ``hyrax.py:48-50``)."""
    c = math.exp(coefficient / time_samples)
    return FirstOrderFilter(b0=1.0 - c, b1=0.0, a1=-c)


def butter1_coefficients(cutoff_hz: float, fs: float) -> FirstOrderFilter:
    """First-order digital Butterworth low-pass via bilinear transform,
    identical to ``scipy.signal.butter(1, cutoff_hz, fs=fs)``:

        warped = tan(pi * cutoff / fs);  k = warped / (1 + warped)
        b = [k, k],  a = [1, (warped - 1) / (warped + 1)]
    """
    warped = math.tan(math.pi * cutoff_hz / fs)
    k = warped / (1.0 + warped)
    a1 = (warped - 1.0) / (warped + 1.0)
    return FirstOrderFilter(b0=k, b1=k, a1=a1)


def _affine_combine(left, right):
    """Compose affine maps y -> a*y + u: (a2,u2) o (a1,u1) = (a1*a2, a2*u1+u2)."""
    a1, u1 = left
    a2, u2 = right
    return a1 * a2, a2 * u1 + u2


_SCAN_BLOCK = 1 << 15
_SEQUENTIAL_LIMIT = 1 << 25  # above this, trade scan parallelism for memory
_SEQ_MEGA_ROWS = 128  # sequential mega-block = rows * _SCAN_BLOCK (~4M) samples


_POWER_COLS = 256  # host-literal length for the runtime power outer product


def _fence(x):
    """``optimization_barrier`` on every scan's drive input.

    Two blocked-scan pyramids in one fusion region send the remote TPU
    compile service superlinear: at 8M samples ONE ds scan compiles in
    ~4.5 s but ``filtfilt`` (forward scan -> reverse -> backward scan) did
    not return in >21 min — and with a barrier between the passes the pair
    compiles in ~4.4 s (tools_probe_chain.py).  Fencing each scan's input
    keeps every pyramid its own region; the scan consumes a materialized
    full-length array either way, so runtime cost is nil (A/B'd on chip).
    """
    return jax.lax.optimization_barrier(x)


def _ladder_scan(u: jax.Array, pole: float, stride: int = 1) -> jax.Array:
    """Inclusive first-order scan ``y[i] = u[i] + pole**stride * y[i-1]``
    along the last axis via the Hillis-Steele shift ladder: ceil(log2(n))
    shifted multiply-adds with host-scalar coefficients ``pole**(stride*2^k)``.

    Exists because this backend's remote compile service has a pathological
    pass on ``associative_scan`` pyramids at some shapes: the blocked plain
    scan at 1M samples compiled in ~60 s for EVERY pole value, fence, and
    wrapper variant probed, while this ladder — the same inclusive scan as
    plain shifted multiply-adds — compiled in 0.6 s at the same shape
    (tools_probe_chain.py, probe_chain_1048576.json).  The ladder does
    log2(block) full passes (~15 x 4 MB at the 32768 block: sub-ms of HBM
    traffic) versus the pyramid's ~2 passes — a negligible runtime tax for
    a two-orders-of-magnitude compile win.

    Coefficients are computed on the host with an *integer* exponent so
    negative poles stay exact (float exponents of negative bases are nan),
    correctly rounded once per level.  Host-float poles only — traced poles
    keep the associative-scan path.

    Steps are radix-4: each level fuses three shifted multiply-adds into
    one pass (the window grows 4x per step), halving passes/HBM traffic
    vs radix-2 — and, measured on chip, removing a residual compile cliff:
    five chained radix-2 ladders at the 3-min track length cold-compiled
    in 125 s on the remote service vs 5.2 s radix-4 at identical warm
    runtime and f32-ulp-identical output (tools_probe_radix.py).
    """
    import numpy as _np

    n = u.shape[-1]
    dtype = u.dtype
    y = u
    shift = 1
    while shift < n:
        acc = y
        for j in range(1, 4):
            s = j * shift
            if s >= n:
                break
            coeff = float(_np.float64(pole)) ** int(stride * s)
            pad = [(0, 0)] * (u.ndim - 1) + [(s, 0)]
            acc = acc + jnp.asarray(coeff, dtype) * jnp.pad(y, pad)[..., :n]
        y = acc
        shift *= 4
    return y


def _pole_powers(pole, block: int, dtype):
    """(pole^1..pole^block, pole^block).  For a host-float pole the powers
    are computed in float64 and correctly rounded per factor — the naive
    f32 ``pole ** i`` loses ~i*eps relative accuracy, which for the
    limiter's near-unit release pole is 1e-3 at block size 32768.

    Long vectors are built *at runtime* as an outer product of two
    <= _POWER_COLS-entry host vectors: a direct length-``block`` host array
    becomes a 256 KB dense literal in the HLO text, and six of those made
    the truncated limiter a 2.3 MB program (slow on this backend's remote
    compile service).  The product of two correctly-rounded factors costs
    one extra rounding (~1 ulp) — far below the scan's own error."""
    import numpy as _np

    if not isinstance(pole, (int, float)):
        pole_arr = jnp.asarray(pole, dtype=dtype)
        powers = pole_arr ** jnp.arange(1, block + 1, dtype=dtype)
        return powers, powers[-1]
    a_block = jnp.asarray(_np.float64(pole) ** block, dtype=dtype)
    if block <= _POWER_COLS:
        p64 = _np.float64(pole) ** _np.arange(1, block + 1)
        return jnp.asarray(p64, dtype=dtype), a_block
    cols = _POWER_COLS
    rows = -(-block // cols)
    col64 = _np.float64(pole) ** _np.arange(1, cols + 1)
    row64 = _np.float64(pole) ** (cols * _np.arange(rows, dtype=_np.float64))
    outer = jnp.asarray(row64, dtype=dtype)[:, None] * jnp.asarray(
        col64, dtype=dtype
    )[None, :]
    return outer.reshape(-1)[:block], a_block


def scan_first_order(drive: jax.Array, pole) -> jax.Array:
    """Solve y[i] = drive[i] + pole * y[i-1], y[-1] = 0.

    ``pole`` is ideally a host float (static), in which case every level
    runs the :func:`_ladder_scan` shift ladder (O(log n) depth, host-scalar
    coefficients).  Long signals use a two-level decomposition — per-block
    ladders over a (nblocks, block) view, a ladder over the nblocks affine
    block summaries, and a broadcast carry correction
    ``y = local + pole^(i+1) * carry_in``.  Traced poles fall back to
    ``associative_scan`` pyramids in the same blocking.

    The blocked ladder form exists for the XLA *compiler* as much as the
    machine: on this backend's remote compile service a flat associative
    scan over 1M samples hit a ~60 s pathological pass for every pole /
    fence / wrapper variant probed, while the identical math as shifted
    multiply-adds compiles in 0.6 s (tools_probe_chain.py) — and the
    aligned 2-D layout runs no slower.

    Under ``vmap`` a custom batching rule folds the batch dimension into the
    *rows* of the 2-D block view instead of letting the mapped axis ride
    along as a small leading dim: XLA laid the naively vmapped scan
    intermediates out batch-minor, lane-padding B=16 to 128 (8.2x memory —
    a 31.4 GB OOM on a 16 GB chip, ``BENCH_EXTRA_r02.json``).  The folded
    form keeps every large intermediate in the same (many_rows, block)
    shape class the single-pair path runs.
    """
    scan = jax.custom_batching.custom_vmap(
        lambda d: _scan_first_order_impl(d, pole)
    )

    @scan.def_vmap
    def _rule(axis_size, in_batched, d):  # noqa: ANN001 - jax rule signature
        if not in_batched[0]:
            d = jnp.broadcast_to(d, (axis_size,) + d.shape)
        return _scan_first_order_batched(d, pole), True

    return scan(_fence(drive))


def _scan_first_order_impl(drive: jax.Array, pole) -> jax.Array:
    dtype = drive.dtype
    n = drive.shape[0]
    if n <= 2 * _SCAN_BLOCK:
        if isinstance(pole, (int, float)):
            return _ladder_scan(drive, pole)
        pole_arr = jnp.asarray(pole, dtype=dtype)
        poles = jnp.broadcast_to(pole_arr, drive.shape)
        _, y = jax.lax.associative_scan(_affine_combine, (poles, drive))
        return y

    block = _SCAN_BLOCK
    nblocks = -(-n // block)
    padded = jnp.pad(drive, (0, nblocks * block - n))
    blocks = padded.reshape(nblocks, block)
    powers, a_block = _pole_powers(pole, block, dtype)

    if n > _SEQUENTIAL_LIMIT:
        # memory-lean mode for very long tracks: a sequential lax.scan over
        # ~4M-sample mega-blocks (the fully parallel form peaks at ~3x the
        # signal size, which OOMs hour-long 96 kHz masters), each mega-block
        # solved with the parallel two-level decomposition so the loop has
        # only ~n/4M iterations (thousands of tiny steps are latency-bound).
        rows = _SEQ_MEGA_ROWS
        mega = rows * block
        nmega = -(-n // mega)
        padded = jnp.pad(drive, (0, nmega * mega - n))
        megas = padded.reshape(nmega, rows, block)
        import numpy as _np

        # pole^(r*block + c+1) for the carry broadcast, as a runtime outer
        # product row[r] * powers[c] of two small vectors: a host-built
        # (rows, block) matrix would embed a multi-MB dense literal in the
        # HLO per filter pass — six of them made the 60-min program 200+ MB
        # of constants (minutes of serialization, and over the remote
        # compile service's request size limit).  The extra f32 multiply
        # costs ~1 ulp on coefficients, far below the scan's own error.
        if isinstance(pole, (int, float)):
            row64 = _np.float64(pole) ** (block * _np.arange(rows, dtype=_np.float64))
            row_powers = jnp.asarray(row64, dtype=dtype)  # (rows,)
            a_mega = jnp.asarray(_np.float64(pole) ** mega, dtype=dtype)
        else:
            row_powers = jnp.asarray(pole, dtype=dtype) ** (
                jnp.arange(rows, dtype=dtype) * block
            )
            a_mega = jnp.asarray(pole, dtype=dtype) ** mega

        def step(carry, drive_mega):
            y0 = _two_level_zero_state(drive_mega, pole, powers, a_block, dtype)
            y = y0 + (row_powers * carry)[:, None] * powers[None, :]
            return a_mega * carry + y0[-1, -1], y

        _, ys = jax.lax.scan(step, jnp.zeros((), dtype), megas)
        return ys.reshape(-1)[:n]

    local = _two_level_zero_state(blocks, pole, powers, a_block, dtype)
    return local.reshape(-1)[:n]


def _scan_first_order_batched(drive: jax.Array, pole) -> jax.Array:
    """Batched zero-state scan over (B, n) drives with the batch dim folded
    into the block rows — the ``vmap`` rule of :func:`scan_first_order`.

    Every large intermediate is (B*rows, block): per-row local scans don't
    couple rows, so batching is free; only the carry chain is per-track,
    and it runs over the tiny (B, rows) summary array.  The mega
    (sequential) path folds the same way inside each ``lax.scan`` step.
    """
    dtype = drive.dtype
    B, n = drive.shape
    if n <= 2 * _SCAN_BLOCK:
        if isinstance(pole, (int, float)):
            return _ladder_scan(drive, pole)
        pole_arr = jnp.asarray(pole, dtype=dtype)
        poles = jnp.broadcast_to(pole_arr, drive.shape)
        _, y = jax.lax.associative_scan(_affine_combine, (poles, drive), axis=1)
        return y

    block = _SCAN_BLOCK
    nblocks = -(-n // block)
    powers, a_block = _pole_powers(pole, block, dtype)

    if n > _SEQUENTIAL_LIMIT:
        rows = _SEQ_MEGA_ROWS
        mega = rows * block
        nmega = -(-n // mega)
        padded = jnp.pad(drive, ((0, 0), (0, nmega * mega - n)))
        # scan steps over the mega axis; each step sees (B*rows, block)
        megas = jnp.moveaxis(padded.reshape(B, nmega, rows, block), 1, 0)
        import numpy as _np

        if isinstance(pole, (int, float)):
            row64 = _np.float64(pole) ** (block * _np.arange(rows, dtype=_np.float64))
            row_powers = jnp.asarray(row64, dtype=dtype)
            a_mega = jnp.asarray(_np.float64(pole) ** mega, dtype=dtype)
        else:
            row_powers = jnp.asarray(pole, dtype=dtype) ** (
                jnp.arange(rows, dtype=dtype) * block
            )
            a_mega = jnp.asarray(pole, dtype=dtype) ** mega

        def step(carry, drive_mega):  # carry: (B,), drive_mega: (B, rows, block)
            flat = drive_mega.reshape(B * rows, block)
            y0 = _two_level_batched_zero_state(
                flat, B, pole, powers, a_block, dtype
            )
            cin = (carry[:, None] * row_powers[None, :]).reshape(B * rows)
            y = y0 + cin[:, None] * powers[None, :]
            new_carry = a_mega * carry + y0.reshape(B, rows, block)[:, -1, -1]
            return new_carry, y.reshape(B, rows, block)

        _, ys = jax.lax.scan(step, jnp.zeros((B,), dtype), megas)
        return jnp.moveaxis(ys, 0, 1).reshape(B, -1)[:, :n]

    padded = jnp.pad(drive, ((0, 0), (0, nblocks * block - n)))
    flat = padded.reshape(B * nblocks, block)
    local = _two_level_batched_zero_state(flat, B, pole, powers, a_block, dtype)
    return local.reshape(B, -1)[:, :n]


def _two_level_batched_zero_state(flat, B, pole, powers, a_block, dtype):
    """Zero-entry-state solution over a (B*rows, block) drive view where
    carries must not cross the B track boundaries.  Local scans are shared;
    the carry chain runs per track over the (B, rows) summaries.

    Host-float poles run the :func:`_ladder_scan` form throughout (the
    associative-scan pyramid trips a ~60 s pathological pass in this
    backend's remote compiler at 1M-sample shapes — see the ladder's
    docstring); traced poles keep the pyramid."""
    rows = flat.shape[0] // B
    block = flat.shape[1]
    if isinstance(pole, (int, float)):
        local = _ladder_scan(flat, pole)
        carries = _ladder_scan(local[:, -1].reshape(B, rows), pole, stride=block)
    else:
        poles = jnp.broadcast_to(jnp.asarray(pole, dtype=dtype), flat.shape)
        _, local = jax.lax.associative_scan(_affine_combine, (poles, flat), axis=1)
        a_vec = jnp.broadcast_to(a_block, (B, rows))
        _, carries = jax.lax.associative_scan(
            _affine_combine, (a_vec, local[:, -1].reshape(B, rows)), axis=1
        )
    carry_in = jnp.concatenate(
        [jnp.zeros((B, 1), dtype), carries[:, :-1]], axis=1
    ).reshape(B * rows)
    return local + powers[None, :] * carry_in[:, None]


def _two_level_zero_state(blocks, pole, powers, a_block, dtype):
    """Zero-entry-state solution over a (rows, block) drive view: parallel
    per-row local scans + a scan over the row affine summaries + broadcast
    carry correction.  Host-float poles use :func:`_ladder_scan` for both
    levels (compile-friendly on this backend); traced poles keep the
    associative-scan pyramid."""
    rows, block = blocks.shape
    if isinstance(pole, (int, float)):
        local = _ladder_scan(blocks, pole)
        carries = _ladder_scan(local[:, -1], pole, stride=block)
    else:
        poles = jnp.broadcast_to(jnp.asarray(pole, dtype=dtype), blocks.shape)
        _, local = jax.lax.associative_scan(
            _affine_combine, (poles, blocks), axis=1
        )
        a_vec = jnp.broadcast_to(a_block, (rows,))
        _, carries = jax.lax.associative_scan(
            _affine_combine, (a_vec, local[:, -1])
        )
    carry_in = jnp.concatenate([jnp.zeros((1,), dtype), carries[:-1]])
    return local + powers[None, :] * carry_in[:, None]


# ---------------------------------------------------------------------------
# Double-single (compensated) scan for near-unit poles in float32
#
# A first-order recurrence with pole p stored in float32 accumulates a
# relative error of ~k * eps32 in the p^k terms; for the limiter's release
# filter (p ≈ 0.999962, decay length ~26k samples) that saturates around
# 3e-4 — the float32 pipeline's accuracy floor (~70 dB).  Two engines restore
# ~double accuracy:
#
# * "refine" (default): one step of iterative refinement over the *plain*
#   f32 ladder scan — y0 = scan(d); r = d + p*shift(y0) - y0 computed
#   exactly with error-free transforms (one elementwise pass); e = scan(r);
#   return two_sum(y0, e).  The linear recurrence makes the defect equation
#   exact: y - y0 = scan(r), so the only error is the plain scan's own
#   (~135 dB relative) applied to the tiny residual (~1e-7 of the signal) —
#   measured >=216 dB vs float64 across the limiter pole/length matrix
#   (tools in /tmp/proto_refine.py history; gated by
#   tests/test_ops_kernels.py).  Cost: ~2.2 plain passes.  On chip the ds
#   ladder measured 3.5 ms vs 0.19 ms plain at 7.9M samples (ROOFLINE.json
#   r4) — the refinement claws back ~18x on the limiter's two dominant
#   kernels.
# * "ladder": every ladder multiply-add carried in double-single (Dekker
#   EFT) arithmetic end to end — measured ~284 dB, kept as the reference
#   engine and selectable with MATCHERING_TPU_DS_ENGINE=ladder.

_DS_POLE_THRESHOLD = 0.99  # use the compensated scan beyond this pole


# Compensation is only worth its ~5x cost when the pole is close enough to
# 1 that plain-f32 error accumulation (random-walk, amplified ~1/(1-p))
# bites.  Below this distance the plain scan already measures ~144 dB at
# the limiter's hold pole ON CHIP (SNR_ONCHIP_r05.json plain_f32 rows) and
# the full f32 chain is bit-for-SNR identical with or without compensation
# there (119.7 dB either way on the CPU 30 s fixture); the release pole
# (1-p ≈ 3.8e-5) stays compensated.  MATCHERING_TPU_DS_POLE_GATE=0 forces
# every ds scan through the compensated engine.
_DS_POLE_GATE_DISTANCE = 5e-4


def _plain_suffices(pole: float) -> bool:
    import os

    if os.environ.get("MATCHERING_TPU_DS_POLE_GATE", "1") == "0":
        return False
    return (1.0 - abs(float(pole))) > _DS_POLE_GATE_DISTANCE


def _ds_engine() -> str:
    import os

    return os.environ.get("MATCHERING_TPU_DS_ENGINE", "refine")


def _refined_ds(drive_hi, drive_lo, pole, scan_impl):
    """One iterative-refinement step over the plain scan engine; returns a
    normalized (hi, lo) float32 pair summing to the compensated solution of
    ``y[i] = drive_hi[i] + drive_lo[i] + pole * y[i-1]`` (zero entry state).

    ``scan_impl`` is the plain zero-state engine matching the drive's rank
    (:func:`_scan_first_order_impl` for 1-D, :func:`_scan_first_order_batched`
    for (B, n)).  The residual is computed against the exact recurrence with
    the pole held as a correctly-rounded float32 pair, so ladder coefficient
    rounding and scan accumulation error are both captured; the second scan
    is fenced (see :func:`_fence` — chained pyramids in one fusion region
    trip the remote compiler)."""
    import numpy as _np

    dtype = drive_hi.dtype
    p64 = _np.float64(pole)
    ph_f = _np.float32(p64)
    ph = jnp.asarray(ph_f, dtype)
    pl = jnp.asarray(_np.float32(p64 - _np.float64(ph_f)), dtype)

    y0 = scan_impl(drive_hi + drive_lo, pole)
    pad = [(0, 0)] * (y0.ndim - 1) + [(1, 0)]
    prev = jnp.pad(y0, pad)[..., : y0.shape[-1]]
    t, e1 = _two_prod(ph, prev)
    s1, e2 = _two_sum(t, drive_hi)
    s2, e3 = _two_sum(s1, -y0)
    r = s2 + ((((e1 + e2) + e3) + drive_lo) + pl * prev)
    e = scan_impl(_fence(r), pole)
    # returned UNNORMALIZED: y0 + e is the compensated solution, and every
    # consumer either collapses the pair (same f32 rounding either way) or
    # runs ds ops that accept arbitrary pairs — skipping the two_sum saves
    # a full-track normalize pass per scan
    return y0, e


def _two_sum(a, b):
    s = a + b
    v = s - a
    return s, (a - (s - v)) + (b - v)


def _split32(a):
    c = a * 4097.0  # 2^12 + 1 for float32
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split32(a)
    bh, bl = _split32(b)
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def _ds_add(x, y):
    s, e = _two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    s2, e2 = _two_sum(s, e)
    return s2, e2


def _ds_mul(x, y):
    p, e = _two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    s, e2 = _two_sum(p, e)
    return s, e2


def _ds_combine(left, right):
    """Affine composition over double-single coefficients:
    (a, u) pairs with a = (ah, al), u = (uh, ul)."""
    a1h, a1l, u1h, u1l = left
    a2h, a2l, u2h, u2l = right
    ah, al = _ds_mul((a1h, a1l), (a2h, a2l))
    uh, ul = _ds_add(_ds_mul((a2h, a2l), (u1h, u1l)), (u2h, u2l))
    return ah, al, uh, ul


def _ds_const(value_f64, dtype, shape=()):
    import numpy as _np

    hi = _np.asarray(value_f64, dtype=_np.float32).astype(_np.float64)
    lo = _np.asarray(value_f64 - hi, dtype=_np.float32)
    h = jnp.broadcast_to(jnp.asarray(hi, dtype=dtype), shape)
    l = jnp.broadcast_to(jnp.asarray(lo, dtype=dtype), shape)
    return h, l


def _ds_pows0(pole: float, stride: float, m: int, dtype):
    """``pole**(stride * (0..m-1))`` as a runtime ds pair, recursively built
    from host vectors of <= _POWER_COLS entries each (multi-level outer
    product).  Every level costs one ~eps32^2 ds multiply."""
    import numpy as _np

    if m <= _POWER_COLS:
        return _ds_const(
            _np.float64(pole) ** (stride * _np.arange(m, dtype=_np.float64)),
            dtype,
            (m,),
        )
    cols = _POWER_COLS
    ch, cl = _ds_const(
        _np.float64(pole) ** (stride * _np.arange(cols, dtype=_np.float64)),
        dtype,
        (cols,),
    )
    rows = -(-m // cols)
    rh, rl = _ds_pows0(pole, stride * cols, rows, dtype)
    mh, ml = _ds_mul((rh[:, None], rl[:, None]), (ch[None, :], cl[None, :]))
    return mh.reshape(-1)[:m], ml.reshape(-1)[:m]


def ds_pole_powers(pole: float, n: int, dtype):
    """``pole**(1..n)`` as a runtime ds pair (hi, lo).

    Built as a multi-level outer product of <= _POWER_COLS-entry host
    vectors evaluated on device: a direct length-``n`` host array would
    embed O(n) dense literals in the HLO (a 345M-sample shard put 4x
    full-length constants = gigabytes of program text into the sharded
    limiter; even the 32k per-block vectors were 256 KB of text *each* —
    six of them made the truncated limiter a 2.3 MB program).  ``_ds_mul``
    of the correctly-rounded factor pairs keeps ~double precision
    (~eps32^2 per level, <= 4 levels for any realistic n).
    """
    import numpy as _np

    h0, l0 = _ds_pows0(pole, 1.0, n, dtype)
    ph, pl = _ds_const(_np.float64(pole), dtype)
    return _ds_mul((h0, l0), (ph, pl))


def _ds_scan_zero_state(drive_hi, drive_lo, pole, stride: int = 1):
    """Compensated inclusive scan ``y[i] = u[i] + pole**stride * y[i-1]``
    along the last axis as a double-single Hillis-Steele shift ladder.

    Same rationale as :func:`_ladder_scan` (the associative-scan pyramid
    trips a pathological remote-compile pass and emits ~10x the HLO), with
    every step's multiply-add carried in ds arithmetic.  The per-level
    coefficient ``pole**(stride*2^k)`` is split from one host float64 —
    correctly rounded, tighter than the pyramid's accumulated ds products
    of the base pole.  ``pole`` must be a host float (every ds caller's
    contract already)."""
    import numpy as _np

    n = drive_hi.shape[-1]
    dtype = drive_hi.dtype
    yh, yl = drive_hi, drive_lo
    shift = 1
    while shift < n:
        ah, al = yh, yl
        for j in range(1, 4):  # radix-4, see _ladder_scan
            s = j * shift
            if s >= n:
                break
            c64 = float(_np.float64(pole)) ** int(stride * s)
            ch, cl = _ds_const(c64, dtype)
            pad = [(0, 0)] * (drive_hi.ndim - 1) + [(s, 0)]
            sh = jnp.pad(yh, pad)[..., :n]
            sl = jnp.pad(yl, pad)[..., :n]
            ah, al = _ds_add((ah, al), _ds_mul((ch, cl), (sh, sl)))
        yh, yl = ah, al
        shift *= 4
    return yh, yl


def _ds_two_level(bh, bl, pole, dtype):
    """Zero-entry-state ds solution over a (rows, block) drive view:
    per-row ds scans + a ds scan over the row affine summaries + broadcast
    carry correction.  Returns (y_hi, y_lo) of shape (rows, block)."""
    import numpy as _np

    rows, block = bh.shape
    local_h, local_l = _ds_scan_zero_state(bh, bl, pole)

    pw_h, pw_l = ds_pole_powers(pole, block, dtype)  # runtime, literal-free

    # carry chain over row summaries: same recurrence with pole**block
    c_h, c_l = _ds_scan_zero_state(
        local_h[:, -1], local_l[:, -1], pole, stride=block
    )
    zero = jnp.zeros((1,), dtype)
    cin_h = jnp.concatenate([zero, c_h[:-1]])
    cin_l = jnp.concatenate([zero, c_l[:-1]])

    corr = _ds_mul((pw_h[None, :], pw_l[None, :]), (cin_h[:, None], cin_l[:, None]))
    return _ds_add((local_h, local_l), corr)


def scan_first_order_ds(drive_hi: jax.Array, drive_lo: jax.Array, pole: float):
    """Compensated solve of y[i] = drive[i] + pole*y[i-1] (zero entry state)
    for float32 signals; returns (y_hi, y_lo).  ``pole`` is a host float
    carried to ~double precision as a float32 pair.

    Long signals (n > _SEQUENTIAL_LIMIT) use the same sequential mega-block
    decomposition as :func:`scan_first_order` — a ``lax.scan`` over ~4M-sample
    mega-blocks with a double-single carry, each mega-block solved with the
    parallel ds two-level form — so hour-long float32 masters keep ~double
    accuracy instead of falling off the ds cliff (the naive f32 scan floors
    at ~70 dB for the limiter's near-unit release pole).

    Under ``vmap`` a custom batching rule folds the batch into the block
    rows (see :func:`scan_first_order`) — the naive vmapped layout was the
    B=16 farm OOM (batch-minor lane padding, ``BENCH_EXTRA_r02.json``)."""
    scan = jax.custom_batching.custom_vmap(
        lambda dh, dl: _scan_first_order_ds_impl(dh, dl, pole)
    )

    @scan.def_vmap
    def _rule(axis_size, in_batched, dh, dl):  # noqa: ANN001 - jax rule signature
        hi_b, lo_b = in_batched
        if not hi_b:
            dh = jnp.broadcast_to(dh, (axis_size,) + dh.shape)
        if not lo_b:
            dl = jnp.broadcast_to(dl, (axis_size,) + dl.shape)
        return _scan_first_order_ds_batched(dh, dl, pole), (True, True)

    return scan(*_fence((drive_hi, drive_lo)))


def _scan_first_order_ds_impl(drive_hi: jax.Array, drive_lo: jax.Array, pole: float):
    import numpy as _np

    if _plain_suffices(pole):
        y = _scan_first_order_impl(drive_hi + drive_lo, pole)
        return y, jnp.zeros_like(y)
    if _ds_engine() == "refine":
        return _refined_ds(drive_hi, drive_lo, pole, _scan_first_order_impl)

    dtype = drive_hi.dtype
    n = drive_hi.shape[0]

    if n <= 2 * _SCAN_BLOCK:
        return _ds_scan_zero_state(drive_hi, drive_lo, pole)

    block = _SCAN_BLOCK

    if n > _SEQUENTIAL_LIMIT:
        rows = _SEQ_MEGA_ROWS
        mega = rows * block
        nmega = -(-n // mega)
        pad = nmega * mega - n
        mh = jnp.pad(drive_hi, (0, pad)).reshape(nmega, rows, block)
        ml = jnp.pad(drive_lo, (0, pad)).reshape(nmega, rows, block)

        # pole^(r*block + c+1) for the carry broadcast, as a ds outer
        # product of small runtime-built ds vectors (a host (rows, block)
        # matrix would embed two multi-MB dense literals per filter in the
        # HLO — see scan_first_order; even flat 32k vectors cost 256 KB of
        # program text each).  _ds_mul of the ~eps32^2-accurate factor
        # pairs keeps ~double precision.
        row64 = _np.float64(pole) ** (block * _np.arange(rows, dtype=_np.float64))
        pcol_h, pcol_l = ds_pole_powers(pole, block, dtype)
        prow_h, prow_l = _ds_const(row64, dtype, (rows,))
        mp_h, mp_l = _ds_mul(
            (prow_h[:, None], prow_l[:, None]), (pcol_h[None, :], pcol_l[None, :])
        )
        am_h, am_l = _ds_const(_np.float64(pole) ** mega, dtype)

        def step(carry, drives):
            dh, dl = drives
            ch, cl = carry
            y0h, y0l = _ds_two_level(dh, dl, pole, dtype)
            corr_h, corr_l = _ds_mul((mp_h, mp_l), (ch, cl))
            yh, yl = _ds_add((y0h, y0l), (corr_h, corr_l))
            new_c = _ds_add(_ds_mul((am_h, am_l), (ch, cl)), (y0h[-1, -1], y0l[-1, -1]))
            return new_c, (yh, yl)

        zero = jnp.zeros((), dtype)
        _, (ys_h, ys_l) = jax.lax.scan(step, (zero, zero), (mh, ml))
        return ys_h.reshape(-1)[:n], ys_l.reshape(-1)[:n]

    nblocks = -(-n // block)
    pad = nblocks * block - n
    bh = jnp.pad(drive_hi, (0, pad)).reshape(nblocks, block)
    bl = jnp.pad(drive_lo, (0, pad)).reshape(nblocks, block)
    y_h, y_l = _ds_two_level(bh, bl, pole, dtype)
    return y_h.reshape(-1)[:n], y_l.reshape(-1)[:n]


def _scan_first_order_ds_batched(drive_hi, drive_lo, pole: float):
    """Batched compensated scan over (B, n) drives — the ``vmap`` rule of
    :func:`scan_first_order_ds`.  Same batch-into-rows folding as
    :func:`_scan_first_order_batched`; carries stay per track."""
    import numpy as _np

    if _plain_suffices(pole):
        y = _scan_first_order_batched(drive_hi + drive_lo, pole)
        return y, jnp.zeros_like(y)
    if _ds_engine() == "refine":
        return _refined_ds(drive_hi, drive_lo, pole, _scan_first_order_batched)

    dtype = drive_hi.dtype
    B, n = drive_hi.shape

    if n <= 2 * _SCAN_BLOCK:
        return _ds_scan_zero_state(drive_hi, drive_lo, pole)

    block = _SCAN_BLOCK

    if n > _SEQUENTIAL_LIMIT:
        rows = _SEQ_MEGA_ROWS
        mega = rows * block
        nmega = -(-n // mega)
        pad = nmega * mega - n
        mh = jnp.moveaxis(
            jnp.pad(drive_hi, ((0, 0), (0, pad))).reshape(B, nmega, rows, block), 1, 0
        )
        ml = jnp.moveaxis(
            jnp.pad(drive_lo, ((0, 0), (0, pad))).reshape(B, nmega, rows, block), 1, 0
        )
        row64 = _np.float64(pole) ** (block * _np.arange(rows, dtype=_np.float64))
        pcol_h, pcol_l = ds_pole_powers(pole, block, dtype)
        prow_h, prow_l = _ds_const(row64, dtype, (rows,))
        am_h, am_l = _ds_const(_np.float64(pole) ** mega, dtype)

        def step(carry, drives):  # carry: ds pair of (B,)
            dh, dl = drives
            ch, cl = carry
            flat_h = dh.reshape(B * rows, block)
            flat_l = dl.reshape(B * rows, block)
            y0h, y0l = _ds_two_level_batched(
                flat_h, flat_l, B, pole, dtype
            )
            # carry correction pole^(r*block+c+1)*carry_b, kept 2-D:
            # cin[b,r] = prow[r]*carry[b], then corr = pcol ⊗ cin_flat
            cin_h, cin_l = _ds_mul(
                (prow_h[None, :], prow_l[None, :]), (ch[:, None], cl[:, None])
            )
            cin_h, cin_l = cin_h.reshape(B * rows), cin_l.reshape(B * rows)
            corr_h, corr_l = _ds_mul(
                (pcol_h[None, :], pcol_l[None, :]), (cin_h[:, None], cin_l[:, None])
            )
            yh, yl = _ds_add((y0h, y0l), (corr_h, corr_l))
            last_h = y0h.reshape(B, rows, block)[:, -1, -1]
            last_l = y0l.reshape(B, rows, block)[:, -1, -1]
            new_c = _ds_add(_ds_mul((am_h, am_l), (ch, cl)), (last_h, last_l))
            return new_c, (yh.reshape(B, rows, block), yl.reshape(B, rows, block))

        zero = jnp.zeros((B,), dtype)
        _, (ys_h, ys_l) = jax.lax.scan(step, (zero, zero), (mh, ml))
        ys_h = jnp.moveaxis(ys_h, 0, 1).reshape(B, -1)[:, :n]
        ys_l = jnp.moveaxis(ys_l, 0, 1).reshape(B, -1)[:, :n]
        return ys_h, ys_l

    nblocks = -(-n // block)
    pad = nblocks * block - n
    bh = jnp.pad(drive_hi, ((0, 0), (0, pad))).reshape(B * nblocks, block)
    bl = jnp.pad(drive_lo, ((0, 0), (0, pad))).reshape(B * nblocks, block)
    y_h, y_l = _ds_two_level_batched(bh, bl, B, pole, dtype)
    return y_h.reshape(B, -1)[:, :n], y_l.reshape(B, -1)[:, :n]


def _ds_two_level_batched(bh, bl, B, pole, dtype):
    """Zero-entry-state ds solution over a (B*rows, block) drive view with
    per-track carry chains over the (B, rows) summaries."""
    import numpy as _np

    rows = bh.shape[0] // B
    block = bh.shape[1]
    local_h, local_l = _ds_scan_zero_state(bh, bl, pole)

    pw_h, pw_l = ds_pole_powers(pole, block, dtype)  # runtime, literal-free

    # per-track carry chains over the (B, rows) summaries, pole**block
    c_h, c_l = _ds_scan_zero_state(
        local_h[:, -1].reshape(B, rows),
        local_l[:, -1].reshape(B, rows),
        pole,
        stride=block,
    )
    zero = jnp.zeros((B, 1), dtype)
    cin_h = jnp.concatenate([zero, c_h[:, :-1]], axis=1).reshape(B * rows)
    cin_l = jnp.concatenate([zero, c_l[:, :-1]], axis=1).reshape(B * rows)

    corr = _ds_mul((pw_h[None, :], pw_l[None, :]), (cin_h[:, None], cin_l[:, None]))
    return _ds_add((local_h, local_l), corr)


def lfilter_first_order(
    filt: FirstOrderFilter, x: jax.Array, zi: jax.Array | float | None = None
) -> jax.Array:
    """``scipy.signal.lfilter([b0, b1], [1, a1], x, zi=[zi])`` (output only).

    DF2T semantics: y[0] = b0*x[0] + zi, then
    y[i] = b0*x[i] + b1*x[i-1] - a1*y[i-1].

    float32 signals with a near-unit pole route through the compensated
    double-single scan (~100 dB better than naive float32 for the
    limiter's hold/release filters); float64 and fast poles use the plain
    blocked scan.
    """
    dtype = x.dtype
    use_ds = dtype == jnp.float32 and abs(filt.pole) > _DS_POLE_THRESHOLD
    if not use_ds:
        drive = filt.b0 * x
        if filt.b1 != 0.0:
            drive = drive.at[1:].add(filt.b1 * x[:-1])
        if zi is not None:
            drive = drive.at[0].add(jnp.asarray(zi, dtype=dtype))
        return scan_first_order(drive, filt.pole)

    import numpy as _np

    b0h, b0l = _ds_const(_np.float64(filt.b0), dtype)
    dh, dl = _two_prod(b0h, x)
    dl = dl + b0l * x
    if filt.b1 != 0.0:
        b1h, b1l = _ds_const(_np.float64(filt.b1), dtype)
        prev = jnp.concatenate([jnp.zeros((1,), dtype), x[:-1]])
        ph, plo = _two_prod(b1h, prev)
        plo = plo + b1l * prev
        dh, dl = _ds_add((dh, dl), (ph, plo))
    if zi is not None:
        dh = dh.at[0].add(jnp.asarray(zi, dtype=dtype))
    y_h, y_l = scan_first_order_ds(dh, dl, filt.pole)
    return y_h + y_l


def _scan_drive_routed(drive: jax.Array, pole: float) -> jax.Array:
    """Zero-entry-state scan of a pre-built drive, routed through the
    compensated double-single path for float32 near-unit poles (the same
    routing rule as :func:`lfilter_first_order`)."""
    if drive.dtype == jnp.float32 and abs(pole) > _DS_POLE_THRESHOLD:
        y_h, y_l = scan_first_order_ds(drive, jnp.zeros_like(drive), pole)
        return y_h + y_l
    return scan_first_order(drive, pole)


def filtfilt_first_order_truncated(
    filt: FirstOrderFilter, x: jax.Array, length: jax.Array
) -> jax.Array:
    """``scipy.signal.filtfilt(b, a, x[:length])`` on a zero-padded buffer,
    with ``length`` a *traced* scalar — the per-track true length of a
    bucket-padded batch entry (reference semantics:
    ``matchering/limiter/hyrax.py:48-53`` evaluated at the exact track
    length).  Output entries at positions >= length are zero.

    Mechanism: the forward pass is ordinary (causal — identical on
    [0, length) to the true-length run).  The backward (anti-causal) pass
    must *start* from scipy's odd-extension initial conditions at the
    dynamic boundary, so the 6 tail-extension samples and their forward/
    backward warm-up are computed exactly from two small ``dynamic_slice``
    windows, and the resulting backward entry state is injected into the
    reversed scan as a one-hot drive impulse at position ``length - 1``
    (drives beyond the boundary are masked to zero, so the injected state
    arrives unmodified).  Everything stays static-shaped and vmap-safe.
    """
    padlen = 6
    dtype = x.dtype
    n = x.shape[0]
    b0 = jnp.asarray(filt.b0, dtype)
    b1 = jnp.asarray(filt.b1, dtype)
    a1 = jnp.asarray(filt.a1, dtype)
    zi_coef = jnp.asarray(filt.zi(), dtype)

    # forward pass over [head odd extension | x]; causal, so valid on [0, L)
    head = 2.0 * x[0] - x[padlen:0:-1]
    ext_in = jnp.concatenate([head, x])
    y_fwd = lfilter_first_order(filt, ext_in, zi=filt.zi() * ext_in[0])[padlen:]

    # tail odd extension from x[L-7 .. L-1] (requires length >= 7)
    xs = jax.lax.dynamic_slice(x, (length - 7,), (7,))
    tail_ext = 2.0 * xs[6] - xs[5::-1]  # x[L-2], x[L-3], ..., x[L-7] flipped

    # forward DF2T state at L-1 recovered from the output: z = b1*x - a1*y
    y_last = jax.lax.dynamic_slice(y_fwd, (length - 1,), (1,))[0]
    state = b1 * xs[6] - a1 * y_last
    y_ext = []
    for k in range(padlen):
        yk = b0 * tail_ext[k] + state
        state = b1 * tail_ext[k] - a1 * yk
        y_ext.append(yk)

    # backward warm-up over the 6 extension outputs (scipy: zi * y_rev[0])
    state = zi_coef * y_ext[-1]
    for k in range(padlen - 1, -1, -1):
        yb = b0 * y_ext[k] + state
        state = b1 * y_ext[k] - a1 * yb

    # reversed scan over the masked forward output with the state injected
    idx = jnp.arange(n)
    y_masked = jnp.where(idx < length, y_fwd, 0.0)
    rev = y_masked[::-1]
    drive = b0 * rev
    if filt.b1 != 0.0:
        drive = drive.at[1:].add(b1 * rev[:-1])
    drive = drive + jnp.where(idx == n - length, state, 0.0)
    y_rev = _scan_drive_routed(drive, filt.pole)
    out = y_rev[::-1]
    return jnp.where(idx < length, out, 0.0)


def filtfilt_first_order(filt: FirstOrderFilter, x: jax.Array) -> jax.Array:
    """``scipy.signal.filtfilt(b, a, x)`` for a first-order filter with the
    scipy defaults: odd extension of padlen=6 samples on both ends and
    ``lfilter_zi`` state scaling."""
    padlen = 6
    # odd extension: 2*x[edge] - x[reflected]
    head = 2.0 * x[0] - x[padlen:0:-1]
    tail = 2.0 * x[-1] - x[-2 : -padlen - 2 : -1]
    ext = jnp.concatenate([head, x, tail])
    zi = filt.zi()
    y = lfilter_first_order(filt, ext, zi=zi * ext[0])
    y = lfilter_first_order(filt, y[::-1], zi=zi * y[-1])[::-1]
    return y[padlen:-padlen]


# ---------------------------------------------------------------------------
# General order-n filters (non-default hold/release orders)


def butter_coefficients(order: int, cutoff_hz: float, fs: float):
    """Digital Butterworth low-pass design, identical to
    ``scipy.signal.butter(order, cutoff_hz, fs=fs)``.  Host-side only —
    returns (b, a) as tuples of Python floats."""
    if order == 1:
        f = butter1_coefficients(cutoff_hz, fs)
        return (f.b0, f.b1), (1.0, f.a1)
    from scipy import signal as _signal  # host-side design math only

    b, a = _signal.butter(order, cutoff_hz, fs=fs)
    return tuple(float(v) for v in b), tuple(float(v) for v in a)


def butter_lowpass(order: int, cutoff_hz: float, fs: float, x: jax.Array) -> jax.Array:
    """Apply an order-``order`` Butterworth low-pass with zero initial state,
    matching ``scipy.signal.lfilter(*scipy.signal.butter(order, f, fs=fs), x)``.

    Order 1 uses the exact closed-form design; higher orders run as a cascade
    of second-order sections (``scipy.signal.butter(..., output='sos')``,
    host-side design only) — each biquad is a 2x2 affine matrix scan, which
    stays well-conditioned where a single order-n companion scan would lose
    precision (poles near the unit circle).
    """
    if order == 1:
        f = butter1_coefficients(cutoff_hz, fs)
        return lfilter_first_order(f, x)
    from scipy import signal as _signal  # host-side design math only

    sos = _signal.butter(order, cutoff_hz, fs=fs, output="sos")
    for section in sos:
        b0, b1, b2, a0, a1, a2 = (float(v) for v in section)
        x = lfilter((b0, b1, b2), (a0, a1, a2), x)
    return x


def lfilter(b, a, x: jax.Array) -> jax.Array:
    """``scipy.signal.lfilter(b, a, x)`` with zero initial state, any order.

    Transposed direct-form II.  The internal state vector
    ``s[i] = (z1[i], ..., zn[i])`` obeys the causal linear recurrence

        z_k[i] = z_{k+1}[i-1] - a_k*z1[i-1] + (b_k - a_k*b0)*x[i]
        z_n[i] =              - a_n*z1[i-1] + (b_n - a_n*b0)*x[i]

    (obtained by substituting ``y[i] = b0*x[i] + z1[i-1]`` into the DF2T
    update equations), i.e. ``s[i] = A s[i-1] + B x[i]`` — solved with one
    ``associative_scan`` over (A, B·x[i]) affine pairs of (n, n) matrices,
    O(n^2) per sample at O(log N) depth.  ``b``/``a`` are host floats.
    """
    b = [float(v) for v in b]
    a = [float(v) for v in a]
    a0 = a[0]
    b = [v / a0 for v in b]
    a = [v / a0 for v in a]
    n = max(len(a), len(b)) - 1
    if n == 1:
        return lfilter_first_order(
            FirstOrderFilter(
                b0=b[0],
                b1=b[1] if len(b) > 1 else 0.0,
                a1=a[1] if len(a) > 1 else 0.0,
            ),
            x,
        )
    import numpy as _np

    bp = _np.zeros(n + 1)
    bp[: len(b)] = b
    ap = _np.zeros(n + 1)
    ap[: len(a)] = a

    A = _np.zeros((n, n))
    Bv = _np.empty(n)
    for k in range(1, n + 1):
        A[k - 1, 0] -= ap[k]
        if k < n:
            A[k - 1, k] += 1.0
        Bv[k - 1] = bp[k] - ap[k] * bp[0]

    dtype = x.dtype
    A_j = jnp.asarray(A, dtype=dtype)
    B_j = jnp.asarray(Bv, dtype=dtype)
    drives = x[:, None] * B_j[None, :]
    A_rep = jnp.broadcast_to(A_j, (x.shape[0], n, n))

    def combine(left, right):
        a1, u1 = left
        a2, u2 = right
        return a2 @ a1, jnp.einsum("...ij,...j->...i", a2, u1) + u2

    _, s = jax.lax.associative_scan(combine, (A_rep, drives))
    z1_prev = jnp.concatenate([jnp.zeros((1,), dtype=dtype), s[:-1, 0]])
    return bp[0] * x + z1_prev


# ---------------------------------------------------------------------------
# Block-parallel building blocks (used by the time-sharded path)


def block_scan_summary(
    drive: jax.Array, pole: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Local scan plus this block's affine carry map.

    Returns (local_solution_with_zero_entry_state, (A, U)) where the true
    block output is ``local + A_prefix * carry_in`` and the block composes
    into the chain as carry_out = A * carry_in + U.
    """
    local = scan_first_order(drive, pole)
    n = drive.shape[0]
    a_total = jnp.asarray(pole, dtype=drive.dtype) ** n
    return local, (a_total, local[-1])
