"""Command-line interface: ``python -m matchering_tpu target ref result``.

The reference delegates this to an external repo (matchering-cli,
``README.md:146``); here it is built in, with the same shape of interface:
positional target / reference / result plus flags for bit depth, limiter
bypass and normalization.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="python -m matchering_tpu",
        description=(
            "TPU-native audio matching & mastering: make TARGET sound like "
            "REFERENCE (RMS, frequency response, peak amplitude, stereo width)."
        ),
    )
    parser.add_argument("target", help="the track to master")
    parser.add_argument("reference", help="the reference track to match")
    parser.add_argument("result", help="output file (.wav or .aiff)")
    parser.add_argument(
        "-b",
        "--bit",
        choices=["16", "24", "32f"],
        default="16",
        help="output bit depth (default: 16)",
    )
    parser.add_argument(
        "--no_limiter",
        action="store_true",
        help="disable the brickwall limiter (output may exceed 0 dB)",
    )
    parser.add_argument(
        "--dont_normalize",
        action="store_true",
        help="with --no_limiter: skip peak normalization of the result",
    )
    parser.add_argument(
        "--preview_target", help="write a loudest-section preview of the target"
    )
    parser.add_argument(
        "--preview_result", help="write a loudest-section preview of the result"
    )
    parser.add_argument(
        "--time_sharded",
        action="store_true",
        help="shard the track's time axis across all local devices",
    )
    parser.add_argument(
        "--length_bucketing",
        type=int,
        metavar="N",
        help="pad tracks to a multiple of N samples and analyze at the true "
        "length, so one compiled program serves every track in a bucket",
    )
    parser.add_argument("-q", "--quiet", action="store_true", help="silence output")
    parser.add_argument(
        "--debug", action="store_true", help="print debug diagnostics too"
    )
    return parser


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)

    import matchering_tpu as mg

    if not args.quiet:
        if args.debug:
            mg.log(print)
        else:
            mg.log(info_handler=print, warning_handler=print)

    subtype = {"16": "PCM_16", "24": "PCM_24", "32f": "FLOAT"}[args.bit]
    result = mg.Result(
        args.result,
        subtype,
        use_limiter=not args.no_limiter,
        normalize=not args.dont_normalize,
    )
    preview_target = mg.pcm16(args.preview_target) if args.preview_target else None
    preview_result = mg.pcm16(args.preview_result) if args.preview_result else None

    if args.time_sharded:
        if args.length_bucketing:
            parser.error(
                "--length_bucketing applies to the single-device graph; "
                "--time_sharded derives its shapes from the shard grid"
            )
        # same host shell as mg.process (temp folder, equality check,
        # validation, previews) with the mastering graph swapped for the
        # time-sharded executor
        import numpy as np

        from .core import _assert_graph_ready
        from .io import load
        from .parallel import timeshard
        from .utils import get_temp_folder

        config = mg.Config()
        temp_folder = config.temp_folder or get_temp_folder([result])
        target_track = mg.check(
            *load(args.target, "target", temp_folder), config, "target"
        )
        reference_track = mg.check(
            *load(args.reference, "reference", temp_folder), config, "reference"
        )
        if not config.allow_equality:
            mg.check_equality(target_track[0], reference_track[0])
        _assert_graph_ready((target_track, reference_track), config)

        out = timeshard.master_sharded(
            target_track[0],
            reference_track[0],
            config,
            need_default=not args.no_limiter,
            need_no_limiter=args.no_limiter and args.dont_normalize,
            need_no_limiter_normalized=args.no_limiter and not args.dont_normalize,
        )
        if not args.no_limiter:
            rendered = out.result
        elif args.dont_normalize:
            rendered = out.result_no_limiter
        else:
            rendered = out.result_no_limiter_normalized
        rendered = np.asarray(rendered)
        mg.save(args.result, rendered, config.internal_sample_rate, subtype)
        if preview_target or preview_result:
            mg.create_preview(
                target_track[0], rendered, config, preview_target, preview_result
            )
    else:
        mg.process(
            target=args.target,
            reference=args.reference,
            results=[result],
            config=mg.Config(length_bucketing=args.length_bucketing),
            preview_target=preview_target,
            preview_result=preview_result,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
