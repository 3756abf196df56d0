"""Data-parallel mastering of (target, reference) pair batches.

The mastering-farm configuration from BASELINE.md (``with_preview.py`` 64-pair
batch, 1024-pair pod scale): independent pairs are sharded over the ``pairs``
mesh axis with ``NamedSharding`` and the whole batch runs as one jitted
``vmap`` of the mastering graph — zero cross-pair communication, so scaling
is limited only by input pipeline and per-chip throughput.

Shape contract: one compiled executable per (batch_shape, config).  Pairs in
a batch share the padded *bucket* shape (t_len, r_len); callers bucket tracks
by length (``bucket_pad``) exactly like any production serving batcher.  True
per-track lengths ride along as traced ``(B,)`` arrays: piece division,
analysis windows and the limiter boundary all use each track's exact length,
so batch entry i reproduces the single-pair master of unpadded pair i (the
reference analyzes the exact track length — ``match_levels.py:47-59``).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..stages import MasterOutput, master_graph


@functools.partial(
    jax.jit,
    static_argnames=(
        "config",
        "need_default",
        "need_no_limiter",
        "need_no_limiter_normalized",
    ),
)
def _master_vmapped(
    targets: jax.Array,
    references: jax.Array,
    target_lengths,
    reference_lengths,
    interp_ops,
    config: Config,
    need_default: bool,
    need_no_limiter: bool,
    need_no_limiter_normalized: bool,
) -> MasterOutput:
    def one(t, r, tl, rl):
        return master_graph(
            t,
            r,
            config,
            need_default=need_default,
            need_no_limiter=need_no_limiter,
            need_no_limiter_normalized=need_no_limiter_normalized,
            interp_ops=interp_ops,
            target_length=tl,
            reference_length=rl,
        )

    if target_lengths is None:
        return jax.vmap(
            lambda t, r: one(t, r, None, None), in_axes=(0, 0)
        )(targets, references)
    return jax.vmap(one, in_axes=(0, 0, 0, 0))(
        targets, references, target_lengths, reference_lengths
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "config",
        "need_default",
        "need_no_limiter",
        "need_no_limiter_normalized",
    ),
)
def _master_single(
    target: jax.Array,
    reference: jax.Array,
    target_length,
    reference_length,
    interp_ops,
    config: Config,
    need_default: bool,
    need_no_limiter: bool,
    need_no_limiter_normalized: bool,
) -> MasterOutput:
    return master_graph(
        target,
        reference,
        config,
        need_default=need_default,
        need_no_limiter=need_no_limiter,
        need_no_limiter_normalized=need_no_limiter_normalized,
        interp_ops=interp_ops,
        target_length=target_length,
        reference_length=reference_length,
    )


def master_pairs(
    targets: Sequence,
    references: Sequence,
    config: Config = Config(),
    need_default: bool = True,
    need_no_limiter: bool = False,
    need_no_limiter_normalized: bool = False,
    target_lengths: Optional[Sequence[int]] = None,
    reference_lengths: Optional[Sequence[int]] = None,
    devices: Optional[Sequence] = None,
) -> List[MasterOutput]:
    """Master same-bucket pairs as *pipelined independent dispatches*:
    every pair is enqueued before any result is fetched, so the dispatch
    round-trip overlaps device compute.

    On the single-chip serving path this beats one big vmapped program —
    measured 31.6 pairs/s vs 20.4 at B=8 on a 3-min bucket
    (``BENCH_EXTRA_r02.json``): the batched program serializes its stages
    across the whole batch while independent programs keep the chip busy
    back-to-back.

    ``devices`` (optional) round-robins the pairs over multiple chips: pair
    ``i``'s inputs are committed to ``devices[i % n]`` and its program runs
    there, so N chips each run the measured-fastest single-chip dispatch
    strategy concurrently — the highest-throughput farm configuration
    (vmapped sharding was ~1.5x slower per chip).  One executable is
    compiled per device (identical program text — the persistent compile
    cache makes repeat compiles cheap); results stay on their devices until
    consumed.  The vmapped path (:func:`master_batch`) remains the surface
    for meshes with a ``time`` axis, where single pairs span devices.

    All pairs must share one padded bucket shape per role (one compiled
    executable per device — true lengths ride as traced scalars).  Returns
    one ``MasterOutput`` per pair, in order.
    """
    if len(targets) != len(references):
        raise ValueError("targets and references differ in count")
    if (target_lengths is None) != (reference_lengths is None):
        raise ValueError("pass both target_lengths and reference_lengths, or neither")
    if target_lengths is None:
        target_lengths = [t.shape[0] for t in targets]
        reference_lengths = [r.shape[0] for r in references]
    from ..ops import smoothing
    from ..utils import ensure_compile_cache

    ensure_compile_cache()

    interp_ops = smoothing.operator_arrays_for_config(config)
    if devices is not None:
        devices = list(devices)
        # stage the shared smoothing operators once per device, not per pair
        ops_on = [jax.device_put(interp_ops, d) for d in devices]

        def place(value, i):
            return jax.device_put(value, devices[i % len(devices)])

    else:
        ops_on = [interp_ops]

        def place(value, i):
            return jnp.asarray(value) if hasattr(value, "shape") else value

    outs = []
    for i, (t, r, tl, rl) in enumerate(
        zip(targets, references, target_lengths, reference_lengths)
    ):
        outs.append(
            _master_single(
                place(jnp.asarray(t), i),
                place(jnp.asarray(r), i),
                place(jnp.int32(tl), i),
                place(jnp.int32(rl), i),
                ops_on[i % len(ops_on)],
                config,
                need_default,
                need_no_limiter,
                need_no_limiter_normalized,
            )
        )
    return outs


def master_batch(
    targets: jax.Array,
    references: jax.Array,
    config: Config = Config(),
    mesh: Optional[Mesh] = None,
    need_default: bool = True,
    need_no_limiter: bool = False,
    need_no_limiter_normalized: bool = False,
    target_lengths=None,
    reference_lengths=None,
) -> MasterOutput:
    """Master a batch of pairs: targets (B, n, 2) x references (B, m, 2).

    With a mesh, the batch axis is sharded over the ``pairs`` mesh axis
    before dispatch; without one, the batch runs on the default device.

    ``target_lengths`` / ``reference_lengths`` ((B,) int arrays, optional):
    true per-track lengths of bucket-padded entries (``bucket_pad``).  When
    given, every entry is analyzed/limited at its exact length, so batch
    entry i equals the single-pair master of the unpadded pair i (samples
    beyond the true length come back zero — trim host-side).  Without them
    the bucket length is the analysis length (only correct for tracks that
    exactly fill the bucket).
    """
    if (target_lengths is None) != (reference_lengths is None):
        raise ValueError("pass both target_lengths and reference_lengths, or neither")
    if mesh is not None:
        pspec = P("pairs", None, None)
        targets = jax.device_put(targets, NamedSharding(mesh, pspec))
        references = jax.device_put(references, NamedSharding(mesh, pspec))
        if target_lengths is not None:
            lspec = NamedSharding(mesh, P("pairs"))
            target_lengths = jax.device_put(
                np.asarray(target_lengths, np.int32), lspec
            )
            reference_lengths = jax.device_put(
                np.asarray(reference_lengths, np.int32), lspec
            )
    elif target_lengths is not None:
        target_lengths = jnp.asarray(target_lengths, jnp.int32)
        reference_lengths = jnp.asarray(reference_lengths, jnp.int32)
    from ..ops import smoothing
    from ..utils import ensure_compile_cache

    ensure_compile_cache()

    interp_ops = smoothing.operator_arrays_for_config(config)
    return _master_vmapped(
        targets,
        references,
        target_lengths,
        reference_lengths,
        interp_ops,
        config,
        need_default,
        need_no_limiter,
        need_no_limiter_normalized,
    )


def bucket_pad(
    tracks: Sequence[np.ndarray], multiple: int = 1 << 18
) -> Tuple[np.ndarray, List[int]]:
    """Zero-pad a list of (n_i, 2) tracks to a shared bucket length.

    Returns the stacked (B, n_pad, 2) batch and the true lengths.  Zero
    padding is RMS-neutral only approximately (it adds silent tail to the
    analysis); production callers should bucket by similar length to bound
    the distortion, as with any padded-batch serving system.
    """
    lengths = [t.shape[0] for t in tracks]
    n_pad = -(-max(lengths) // multiple) * multiple
    batch = np.zeros((len(tracks), n_pad, tracks[0].shape[1]), dtype=tracks[0].dtype)
    for i, t in enumerate(tracks):
        batch[i, : t.shape[0]] = t
    return batch, lengths
