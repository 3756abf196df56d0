"""Audio ingestion with graceful codec fallback.

Parity with reference ``matchering/loader.py:30-74``: try the built-in
codecs first; on an unknown container, shell out to ``ffmpeg`` to transcode
into a temp WAV (emitting the lossy-source warning), and raise the coded
loading error if everything fails.
"""

from __future__ import annotations

import os
import subprocess
from typing import Tuple

import numpy as np

from ..log import Code, ModuleError, debug, info, warning
from ..utils import random_file
from . import codecs


def load(file: str, file_type: str, temp_folder: str) -> Tuple[np.ndarray, int]:
    file_type = file_type.upper()
    sound, sample_rate = None, None
    debug(f"Loading the {file_type} file: '{file}'...")
    try:
        sound, sample_rate = codecs.read(file)
    except (RuntimeError, OSError) as e:
        debug(e)
        text = str(e)
        if "unknown format" in text or "Format not recognised" in text:
            sound, sample_rate = _load_with_ffmpeg(file, file_type, temp_folder)
    if sound is None or sample_rate is None:
        raise ModuleError(
            Code.ERROR_TARGET_LOADING
            if file_type == "TARGET"
            else Code.ERROR_REFERENCE_LOADING
        )
    debug(f"The {file_type} file is loaded")
    return sound, sample_rate


def _load_with_ffmpeg(file: str, file_type: str, temp_folder: str):
    sound, sample_rate = None, None
    debug(f"Trying to load '{file}' with ffmpeg...")
    temp_file = os.path.join(temp_folder, random_file(prefix="temp"))
    try:
        subprocess.check_call(
            ["ffmpeg", "-i", file, temp_file],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        sound, sample_rate = codecs.read(temp_file)
        if file_type == "TARGET":
            warning(Code.WARNING_TARGET_IS_LOSSY)
        else:
            info(Code.INFO_REFERENCE_IS_LOSSY)
        os.remove(temp_file)
    except FileNotFoundError:
        debug(
            "ffmpeg is not found in the system! "
            "Download, install and add it to PATH: https://www.ffmpeg.org/download.html"
        )
    except subprocess.CalledProcessError:
        debug(f"ffmpeg cannot convert '{file}' to .wav!")
    return sound, sample_rate
