"""Build the native codec shared library with g++.

Usage: ``python -m matchering_tpu.io.native.build``
"""

from __future__ import annotations

import os
import subprocess
import sys


def build(verbose: bool = True) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = [os.path.join(here, "codec.cpp"), os.path.join(here, "flac.cpp")]
    out = os.path.join(here, "libmtpu_codec.so")
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        *src,
        "-o",
        out,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.check_call(cmd)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.exit(0)
