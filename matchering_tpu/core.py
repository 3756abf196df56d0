"""Top-level orchestrator (reference ``matchering/core.py:32-121``).

``process()`` is the host-side shell: load -> check -> validate -> run the
jitted mastering graph (``stages.master``) -> save the requested variants ->
optionally render previews.  All DSP happens in one XLA program on the
accelerator; this module only moves bytes and raises coded errors.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .checker import check, check_equality
from .config import Config
from .io import load, save
from .log import Code, ModuleError, debug, debug_line, info
from .preview import create_preview
from .results import Result
from .stages import main as stages_main
from .utils import get_temp_folder


def process(
    target: str,
    reference: str,
    results: List[Result],
    config: Config = Config(),
    preview_target: Optional[Result] = None,
    preview_result: Optional[Result] = None,
) -> None:
    debug("TPU-native matchering: https://github.com/sergree/matchering capabilities")
    debug_line()
    info(Code.INFO_LOADING)

    if not results:
        raise RuntimeError("The result list is empty")
    if isinstance(results, Result):
        results = [results]

    temp_folder = config.temp_folder if config.temp_folder else get_temp_folder(results)

    target_audio, target_sample_rate = load(target, "target", temp_folder)
    target_audio, target_sample_rate = check(
        target_audio, target_sample_rate, config, "target"
    )

    reference_audio, reference_sample_rate = load(reference, "reference", temp_folder)
    reference_audio, reference_sample_rate = check(
        reference_audio, reference_sample_rate, config, "reference"
    )

    if not config.allow_equality:
        check_equality(target_audio, reference_audio)

    if (
        not (
            target_sample_rate
            == reference_sample_rate
            == config.internal_sample_rate
        )
        or not (target_audio.shape[1] == reference_audio.shape[1] == 2)
        or not (
            target_audio.shape[0] > config.fft_size
            and reference_audio.shape[0] > config.fft_size
        )
    ):
        raise ModuleError(Code.ERROR_VALIDATION)

    result, result_no_limiter, result_no_limiter_normalized = stages_main(
        target_audio,
        reference_audio,
        config,
        need_default=any(r.use_limiter for r in results),
        need_no_limiter=any(not r.use_limiter and not r.normalize for r in results),
        need_no_limiter_normalized=any(
            not r.use_limiter and r.normalize for r in results
        ),
    )

    debug_line()
    info(Code.INFO_EXPORTING)

    for required in results:
        if required.use_limiter:
            correct_result = result
        elif required.normalize:
            correct_result = result_no_limiter_normalized
        else:
            correct_result = result_no_limiter
        save(
            required.file,
            np.asarray(correct_result),
            config.internal_sample_rate,
            required.subtype,
        )

    if preview_target or preview_result:
        preview_source = next(
            item
            for item in [result, result_no_limiter, result_no_limiter_normalized]
            if item is not None
        )
        create_preview(
            target_audio, preview_source, config, preview_target, preview_result
        )

    debug_line()
    info(Code.INFO_COMPLETED)
