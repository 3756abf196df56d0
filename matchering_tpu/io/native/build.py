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
    staging = f"{out}.tmp.{os.getpid()}"  # atomic publish; parallel builds race safely
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        *src,
        "-o",
        staging,
    ]
    if verbose:
        print(" ".join(cmd).replace(staging, out))
    try:
        subprocess.check_call(cmd)
        os.replace(staging, out)
    finally:
        if os.path.exists(staging):
            os.remove(staging)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.exit(0)
