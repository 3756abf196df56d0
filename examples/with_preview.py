"""Mastering run that also renders before/after preview snippets.

Usage: python examples/with_preview.py [target] [reference] [out_prefix]
(behavioral counterpart of the reference's examples/with_preview.py)

The two preview files hold the loudest ``preview_size`` seconds of the
input and of the master — a quick A/B without opening the full tracks.
"""

import sys

import matchering_tpu as mg

target, reference, prefix = (
    sys.argv[1:4] if len(sys.argv) >= 4 else ("my_song.wav", "some_popular_song.wav", "my_song_master")
)

# only surface warnings; progress/debug stay silent
mg.log(warning_handler=print)

mg.process(
    target=target,
    reference=reference,
    results=[
        mg.pcm16(f"{prefix}_16bit.wav"),
        mg.pcm24(f"{prefix}_24bit.wav"),
    ],
    preview_target=mg.pcm16(f"{prefix}_preview_before.flac"),
    preview_result=mg.pcm16(f"{prefix}_preview_after.flac"),
)
