"""Overriding the processing configuration.

Usage: python examples/edited_config.py [target] [reference] [out_prefix]
(behavioral counterpart of the reference's examples/edited_config.py)

``Config`` carries every tunable; construct one with only the fields you
want to change.  This run masters at 96 kHz, admits half-hour tracks, backs
the brickwall threshold off to -3 dB, and computes in float32 (the TPU
production dtype).
"""

import sys

import matchering_tpu as mg

target, reference, prefix = (
    sys.argv[1:4] if len(sys.argv) >= 4 else ("my_song.wav", "some_popular_song.wav", "my_song_master")
)

tweaked = mg.Config(
    max_length=30 * 60,  # seconds; default admits 15 minutes
    internal_sample_rate=96000,  # default 44100
    threshold=0.7079,  # linear amplitude ~= -3 dB; default -0.01 dB
    temp_folder="/tmp",  # staging area for codec conversions
    preview_size=15,  # seconds of preview; default 30
    allow_equality=True,  # permit target == reference
    dtype="float32",  # on-device precision (TPU-native extra)
)

mg.process(
    target=target,
    reference=reference,
    results=[
        mg.pcm16(f"{prefix}_16bit.wav"),
        mg.pcm24(f"{prefix}_24bit.wav"),
    ],
    config=tweaked,
)
