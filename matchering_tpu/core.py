"""Single-pair mastering driver.

``process()`` is the host-side shell around the jitted mastering graph: it
decodes and conditions both tracks, runs ``stages.main`` (one XLA program on
the accelerator), and encodes whichever output variants the caller asked
for, optionally with previews.  Behavioral contract — the coded event
stream, validation rules and variant semantics — matches reference
``matchering/core.py:32-121``; the decomposition below is this framework's
own.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .checker import check, check_equality
from .config import Config
from .io import load, save
from .log import Code, ModuleError, debug, debug_line, info
from .preview import create_preview
from .results import Result
from .stages import main as stages_main
from .utils import ensure_compile_cache, get_temp_folder


def _ingest(path: str, role: str, config: Config, temp_folder: str):
    """Decode one file and run the conditioning pipeline on it.

    Integer-PCM WAV sources keep their raw int16/int32 payload
    (``raw_int=True``): unless resampling forces a float conversion, the
    integer buffer is what ``render_variants`` stages to the device —
    half the H2D bytes of float32 — and the graph converts on device
    (bit-identical output; see ``stages.master_graph``)."""
    audio, rate = load(path, role, temp_folder, raw_int=True)
    return check(audio, rate, config, role)


def _assert_graph_ready(tracks, config: Config) -> None:
    """Post-conditioning invariants the graph relies on.  The checker
    should have established all of these; a violation here is a bug, hence
    the generic validation code (reference ``core.py:69-74``)."""
    for audio, rate in tracks:
        ready = (
            rate == config.internal_sample_rate
            and audio.ndim == 2
            and audio.shape[1] == 2
            and audio.shape[0] > config.fft_size
        )
        if not ready:
            raise ModuleError(Code.ERROR_VALIDATION)


def _variant_key(result: Result) -> str:
    """Which rendered variant a Result descriptor wants."""
    if result.use_limiter:
        return "limited"
    return "normalized" if result.normalize else "raw"


def render_variants(
    target_audio: np.ndarray, reference_audio: np.ndarray, config: Config, keys
) -> dict:
    """Run the mastering graph, rendering exactly the variants in ``keys``.

    Returns a dict mapping variant key -> array (missing keys absent).
    """
    keys = set(keys)
    limited, raw, normalized = stages_main(
        target_audio,
        reference_audio,
        config,
        need_default="limited" in keys,
        need_no_limiter="raw" in keys,
        need_no_limiter_normalized="normalized" in keys,
    )
    rendered = {"limited": limited, "raw": raw, "normalized": normalized}
    return {k: v for k, v in rendered.items() if v is not None}


def process(
    target: str,
    reference: str,
    results: List[Result],
    config: Config = Config(),
    preview_target: Optional[Result] = None,
    preview_result: Optional[Result] = None,
) -> None:
    debug("matchering_tpu — TPU-native audio matching & mastering")
    debug_line()
    ensure_compile_cache()
    info(Code.INFO_LOADING)

    if isinstance(results, Result):
        results = [results]
    if not results:
        raise RuntimeError("The result list is empty")

    temp_folder = config.temp_folder or get_temp_folder(results)

    target_track = _ingest(target, "target", config, temp_folder)
    reference_track = _ingest(reference, "reference", config, temp_folder)

    if not config.allow_equality:
        check_equality(target_track[0], reference_track[0])
    _assert_graph_ready((target_track, reference_track), config)

    wanted = {_variant_key(r) for r in results}
    variants = render_variants(target_track[0], reference_track[0], config, wanted)

    debug_line()
    info(Code.INFO_EXPORTING)
    for result in results:
        save(
            result.file,
            np.asarray(variants[_variant_key(result)]),
            config.internal_sample_rate,
            result.subtype,
        )

    if preview_target or preview_result:
        # any rendered variant serves as the preview source, preferring the
        # limited one (reference ``core.py:112-118``)
        for key in ("limited", "raw", "normalized"):
            if key in variants:
                create_preview(
                    target_track[0],
                    variants[key],
                    config,
                    preview_target,
                    preview_result,
                )
                break

    debug_line()
    info(Code.INFO_COMPLETED)
