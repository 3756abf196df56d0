"""Smallest possible run: master one track against one reference.

Usage: python examples/basic.py [target] [reference] [out_prefix]
(behavioral counterpart of the reference's examples/basic.py)
"""

import sys

import matchering_tpu as mg

target, reference, prefix = (
    sys.argv[1:4] if len(sys.argv) >= 4 else ("my_song.wav", "some_popular_song.wav", "my_song_master")
)

# route the coded progress stream to stdout; omit for a silent run
mg.log(print)

# one call: decode, analyze, match, limit, encode
mg.process(
    target=target,
    reference=reference,
    results=[
        mg.pcm16(f"{prefix}_16bit.wav"),
        mg.pcm24(f"{prefix}_24bit.wav"),
    ],
)
