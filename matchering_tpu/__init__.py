"""matchering_tpu — TPU-native audio matching & mastering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
sergree/matchering (reference ``matchering/__init__.py:31-36``): given a
TARGET track and a professionally mastered REFERENCE track, produce a
mastered TARGET with the reference's RMS, frequency response, peak amplitude
and stereo width.

Public API parity with the reference::

    import matchering_tpu as mg
    mg.process(target="song.wav", reference="ref.wav",
               results=[mg.pcm16("out.wav")])

plus TPU-native extensions: the pure jittable graph (``mg.master``), the
standalone limiter (``mg.limit``), kernel library (``mg.ops``) and the
multi-device sharding tools (``matchering_tpu.parallel``).
"""

__version__ = "0.1.0"
__title__ = "matchering_tpu"

import os as _os

if _os.environ.get("MATCHERING_TPU_PALLAS") == "1":
    # must happen before the TPU backend initializes: this backend
    # stack-allocates Pallas outputs in scoped VMEM and the fused limiter
    # front-end needs the raised limit (see ops/pallas_envelope.py)
    from .utils import enable_pallas_vmem_headroom as _pallas_headroom

    _pallas_headroom()

from . import ops
from .checker import check, check_equality
from .config import Config, LimiterConfig
from .core import process
from .farm import PairJob, process_batch
from .io import load, save
from .limiter import limit
from .log import Code, ModuleError
from .log import set_handlers as log
from .preview import create_preview
from .results import Result, pcm16, pcm24, pcm32f
from .stages import MasterOutput, master, master_graph

__all__ = [
    "Code",
    "Config",
    "LimiterConfig",
    "MasterOutput",
    "ModuleError",
    "PairJob",
    "Result",
    "check",
    "check_equality",
    "create_preview",
    "limit",
    "load",
    "log",
    "master",
    "master_graph",
    "ops",
    "pcm16",
    "pcm24",
    "pcm32f",
    "process",
    "process_batch",
    "save",
]
