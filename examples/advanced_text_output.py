"""Custom log handlers.

Usage: python examples/advanced_text_output.py [target] [reference] [out_prefix]
(behavioral counterpart of the reference's examples/advanced_text_output.py)
"""

import sys
from datetime import datetime

import matchering_tpu as mg

target, reference, prefix = (
    sys.argv[1:4] if len(sys.argv) >= 4 else ("my_song.wav", "some_popular_song.wav", "my_song_master")
)


# A basic text output function that also prints the current datetime
def my_print(text):
    print(f"{datetime.now()}: {text}")


# The information output will be marked with a prefix
def info(text):
    my_print(f"INFO: {text}")


# The warning output will be highlighted with exclamation marks
def warning(text):
    my_print(f"! {text} !")


# Debug output stays plain
def debug(text):
    my_print(text)


mg.log(
    info_handler=info,
    warning_handler=warning,
    debug_handler=debug,
    # Show the machine-readable four-digit codes next to the text
    # (LOG_CODES.md semantics, same numbering as the reference)
    show_codes=True,
)

mg.process(
    target=target,
    reference=reference,
    results=[mg.pcm16(f"{prefix}_16bit.wav")],
)
