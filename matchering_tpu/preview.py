"""Preview rendering (reference ``matchering/preview_creator.py:30-94``).

Finds the loudest ``preview_size`` window of the mastered result on a
``preview_analysis_step`` grid and cuts matching target/result snippets with
linear fades.  The window search is a jitted strided-RMS argmax; the reference
does the same with ``as_strided`` views (``dsp.py:128-142``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .io import save
from .log import Code, debug, debug_line, info
from .ops import basics
from .results import Result
from .utils import time_str


def _window_count(n: int, window: int, step: int) -> int:
    return 1 if window > n else (n - window) // step + 1


@functools.partial(jax.jit, static_argnames=("window", "step"))
def _loudest_window_index(result: jax.Array, window: int, step: int) -> jax.Array:
    """argmax over strided windows of the result's RMS
    (reference ``preview_creator.py:47-54``, where windows are ``as_strided``
    views).  Materializing (count, window, 2) windows would be GBs for a
    full track, so the window energies are assembled from per-step segment
    sums: window b = steps b .. b+window//step-1 plus a width-(window%step)
    partial — O(n) work, no gathers."""
    n = result.shape[0]
    count = _window_count(n, window, step)
    if count == 1:
        return jnp.asarray(0)
    energy = jnp.sum(jnp.square(result), axis=1)  # per-sample, both channels
    nseg = n // step
    seg = jnp.sum(energy[: nseg * step].reshape(nseg, step), axis=1)
    k, r = divmod(window, step)
    # sum of k consecutive segments starting at b, for b in [0, count)
    cums = jnp.concatenate([jnp.zeros((1,), energy.dtype), jnp.cumsum(seg)])
    sums = cums[k : k + count] - cums[:count]
    if r:
        # remainder of window b: energy[(b+k)*step : (b+k)*step + r), for
        # b in [0, count) — a shifted reshape starting at k*step
        tail = energy[k * step :]
        tail = jnp.pad(tail, (0, count * step - tail.shape[0])) if (
            tail.shape[0] < count * step
        ) else tail[: count * step]
        sums = sums + jnp.sum(tail.reshape(count, step)[:, :r], axis=1)
    return jnp.argmax(sums)


@functools.partial(jax.jit, static_argnames=("window", "step", "fade_size", "threshold"))
def _cut_pieces(
    target: jax.Array,
    result: jax.Array,
    index: jax.Array,
    window: int,
    step: int,
    fade_size: int,
    threshold: float,
) -> Tuple[jax.Array, jax.Array]:
    target = basics.clip(target, threshold)
    n = result.shape[0]
    if window > n:
        return target, result
    start = index * step
    target_piece = jax.lax.dynamic_slice(target, (start, 0), (window, target.shape[1]))
    result_piece = jax.lax.dynamic_slice(result, (start, 0), (window, result.shape[1]))
    if window != n and fade_size > 0:
        target_piece = basics.fade(target_piece, fade_size)
        result_piece = basics.fade(result_piece, fade_size)
    return target_piece, result_piece


def create_preview(
    target: np.ndarray,
    result: np.ndarray,
    config: Config,
    preview_target: Optional[Result],
    preview_result: Optional[Result],
) -> None:
    debug_line()
    info(Code.INFO_MAKING_PREVIEWS)

    window = config.preview_size
    step = config.preview_analysis_step
    debug(
        f"The maximum duration of the preview is "
        f"{window / config.internal_sample_rate} seconds, "
        f"with the analysis step of {step / config.internal_sample_rate} seconds"
    )

    result = jnp.asarray(result)
    index = _loudest_window_index(result, window, step)

    n = result.shape[0]
    piece_len = min(window, n)
    fade_size = (
        min(config.preview_fade_size, int(piece_len // config.preview_fade_coefficient))
        if piece_len != n
        else 0
    )
    # staged integer-PCM targets convert on device (same full-scale
    # convention as the mastering graph) before the float-domain clip/fade
    target_piece, result_piece = _cut_pieces(
        basics.to_working_float(jnp.asarray(target), result.dtype),
        result,
        index,
        window,
        step,
        fade_size,
        config.threshold,
    )

    begin = step * int(index) if piece_len != n else 0
    debug(
        f"The best part to preview: "
        f"{time_str(begin, config.internal_sample_rate)} "
        f"- {time_str(begin + piece_len, config.internal_sample_rate)}"
    )

    if preview_target:
        save(
            preview_target.file,
            np.asarray(target_piece),
            config.internal_sample_rate,
            preview_target.subtype,
            "target preview",
        )
    if preview_result:
        save(
            preview_result.file,
            np.asarray(result_piece),
            config.internal_sample_rate,
            preview_result.subtype,
            "result preview",
        )
