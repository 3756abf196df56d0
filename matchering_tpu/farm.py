"""Batch mastering driver — many (target, reference) pairs in one dispatch.

The data-parallel counterpart of :func:`matchering_tpu.core.process`
(reference semantics per pair: ``matchering/core.py:32-121``; the batching
itself has no reference equivalent — SURVEY.md §5.8/§7.6).  Each job is
decoded and conditioned exactly like the single-pair path, the batch is
bucket-padded and dispatched as one vmapped XLA program over the ``pairs``
mesh axis, every track is analyzed and limited at its *true* length
(``master_graph``'s dynamic-length path), and outputs are trimmed back to
their true lengths before encoding — so each job's files are identical to
what ``process()`` would have produced, at farm throughput.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np

from .checker import check, check_equality
from .config import Config
from .core import _assert_graph_ready, _variant_key
from .io import load, save
from .log import Code, ModuleError, debug, debug_line, info
from .preview import create_preview
from .results import Result
from .utils import ensure_compile_cache, get_temp_folder


@dataclass(frozen=True)
class PairJob:
    """One mastering job: a target/reference file pair plus the outputs it
    wants (same descriptors as the single-pair API)."""

    target: str
    reference: str
    results: List[Result] = field(default_factory=list)
    preview_target: Optional[Result] = None
    preview_result: Optional[Result] = None


def process_batch(
    jobs: Sequence[PairJob],
    config: Config = Config(),
    mesh=None,
    bucket_multiple: Optional[int] = None,
    dispatch: str = "auto",
) -> None:
    """Master every job in one bucketed batch.

    All jobs share one padded bucket per role (pad to the longest track,
    rounded up to ``bucket_multiple`` — defaults to
    ``config.length_bucketing`` when set, else 2^18 samples) and therefore
    one compiled executable; callers batching at production scale should
    group jobs of similar duration so padding stays bounded.  ``mesh``
    (optional, with a ``pairs`` axis — ``parallel.make_mesh``) shards the
    batch across devices.

    ``dispatch`` picks the device-dispatch strategy: ``"pipelined"``
    enqueues every pair as an independent program — fastest per chip
    (measured 31.6 vs 20.4 pairs/s at B=8, ``BENCH_EXTRA_r02.json``) — and
    with a pairs-only ``mesh`` round-robins the pairs over its devices so
    every chip runs that fastest strategy concurrently.  ``"vmapped"`` runs
    one batched program whose batch dimension is sharded over the mesh's
    ``pairs`` axis; it is required when the mesh has a ``time`` axis
    (single pairs spanning devices).  ``"auto"`` = pipelined everywhere
    except time-sharded meshes.
    """
    from .parallel.batch import bucket_pad, master_batch, master_pairs

    if bucket_multiple is None:
        bucket_multiple = config.length_bucketing or (1 << 18)
    if mesh is not None and "pairs" not in mesh.shape:
        raise ValueError(
            "process_batch shards jobs over a 'pairs' mesh axis, but the "
            f"provided mesh has axes {tuple(mesh.axis_names)} — build it "
            "with parallel.make_mesh (pairs[, time])"
        )
    if dispatch == "auto":
        time_sharded = mesh is not None and mesh.shape.get("time", 1) > 1
        dispatch = "vmapped" if time_sharded else "pipelined"
    if dispatch not in ("vmapped", "pipelined"):
        raise ValueError(f"unknown dispatch strategy '{dispatch}'")
    if dispatch == "pipelined" and mesh is not None and mesh.shape.get("time", 1) > 1:
        raise ValueError(
            "pipelined dispatch runs whole pairs on single devices — it "
            "composes with a pairs-only mesh (round-robin), not a time axis"
        )

    jobs = list(jobs)
    if not jobs:
        raise RuntimeError("The job list is empty")
    for job in jobs:
        if not job.results and not (job.preview_target or job.preview_result):
            raise RuntimeError(f"Job '{job.target}' requests no outputs")

    debug(f"matchering_tpu farm: {len(jobs)} pairs in one dispatch")
    debug_line()
    ensure_compile_cache()
    info(Code.INFO_LOADING)

    targets, references = [], []
    for job in jobs:
        anchor = job.results or [
            r for r in (job.preview_target, job.preview_result) if r is not None
        ]
        temp_folder = config.temp_folder or get_temp_folder(anchor)
        # integer-PCM sources keep their raw int16/int32 payload (half the
        # H2D bytes; the graph converts on device) — see core._ingest
        target_track = check(
            *load(job.target, "target", temp_folder, raw_int=True), config, "target"
        )
        reference_track = check(
            *load(job.reference, "reference", temp_folder, raw_int=True),
            config,
            "reference",
        )
        if not config.allow_equality:
            check_equality(target_track[0], reference_track[0])
        _assert_graph_ready((target_track, reference_track), config)
        targets.append(target_track[0])
        references.append(reference_track[0])

    def _uniform_stageable(arrays):
        """bucket_pad stacks a role's tracks into ONE array; mixed dtypes
        would promote raw integer codes to floats WITHOUT scaling, so raw
        staging only survives when a whole role is one integer dtype —
        otherwise convert ints to float64 host-side (values identical)."""
        if len({a.dtype for a in arrays}) == 1:
            return arrays
        from .checker import _int_to_float

        return [_int_to_float(a) for a in arrays]

    targets = _uniform_stageable(targets)
    references = _uniform_stageable(references)

    # union of variants over all jobs: the graph renders a variant once for
    # the whole batch, jobs pick what they asked for
    wanted = {_variant_key(r) for job in jobs for r in job.results}
    wanted |= {"limited"} if not wanted else set()

    t_batch, t_lens = bucket_pad(targets, multiple=bucket_multiple)
    r_batch, r_lens = bucket_pad(references, multiple=bucket_multiple)

    # a mesh shards the batch over its pairs rows — round the job count up
    # by repeating the last pair (extra outputs are simply not encoded);
    # pipelined dispatch round-robins whole pairs instead and needs no pad
    if mesh is not None and dispatch == "vmapped" and "pairs" in mesh.shape:
        rows = mesh.shape["pairs"]
        short = -len(jobs) % rows
        if short:
            t_batch = np.concatenate([t_batch, np.repeat(t_batch[-1:], short, 0)])
            r_batch = np.concatenate([r_batch, np.repeat(r_batch[-1:], short, 0)])
            t_lens = list(t_lens) + [t_lens[-1]] * short
            r_lens = list(r_lens) + [r_lens[-1]] * short
    debug(
        f"buckets: targets {t_batch.shape}, references {r_batch.shape} "
        f"(true lengths {t_lens} / {r_lens})"
    )

    if dispatch == "pipelined":
        outs = master_pairs(
            list(t_batch),
            list(r_batch),
            config,
            need_default="limited" in wanted,
            need_no_limiter="raw" in wanted,
            need_no_limiter_normalized="normalized" in wanted,
            target_lengths=t_lens,
            reference_lengths=r_lens,
            devices=None if mesh is None else list(mesh.devices.flat),
        )
        variants = {
            "limited": [o.result for o in outs],
            "raw": [o.result_no_limiter for o in outs],
            "normalized": [o.result_no_limiter_normalized for o in outs],
        }
        variants = {k: (None if v[0] is None else v) for k, v in variants.items()}
    else:
        if mesh is not None and mesh.shape.get("time", 1) > 1:
            # 2-D (pairs, time) mesh: the pod-scale farm — data parallel
            # over pairs, sequence parallel over time blocks
            from .parallel.timeshard import master_farm as batched
        else:
            batched = master_batch
        out = batched(
            t_batch,
            r_batch,
            config,
            mesh=mesh,
            need_default="limited" in wanted,
            need_no_limiter="raw" in wanted,
            need_no_limiter_normalized="normalized" in wanted,
            target_lengths=t_lens,
            reference_lengths=r_lens,
        )
        variants = {
            "limited": out.result,
            "raw": out.result_no_limiter,
            "normalized": out.result_no_limiter_normalized,
        }

    debug_line()
    info(Code.INFO_EXPORTING)
    for i, job in enumerate(jobs):
        length = t_lens[i]
        for result in job.results:
            rendered = variants[_variant_key(result)]
            if rendered is None:  # unreachable: wanted covered every key
                raise ModuleError(Code.ERROR_VALIDATION)
            save(
                result.file,
                np.asarray(rendered[i][:length]),
                config.internal_sample_rate,
                result.subtype,
            )
        if job.preview_target or job.preview_result:
            # the preview source is the first variant THIS job rendered
            # (reference ``core.py:111-118`` — the batch-wide union may
            # include variants the job never asked for); preview-only jobs
            # fall back to any rendered variant in the same priority order
            job_wanted = {_variant_key(r) for r in job.results}
            order = [
                k for k in ("limited", "raw", "normalized") if k in job_wanted
            ] or ["limited", "raw", "normalized"]
            for key in order:
                if variants[key] is not None:
                    create_preview(
                        targets[i],
                        np.asarray(variants[key][i][:length]),
                        config,
                        job.preview_target,
                        job.preview_result,
                    )
                    break

    debug_line()
    info(Code.INFO_COMPLETED)
