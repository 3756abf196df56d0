"""Host-side audio I/O: codecs, loader, saver.

Covers reference components #5 (loader), #6 (saver) and the libsndfile codec
capability the reference gets through ``soundfile``.
"""

from . import aiff, codecs, pcm, wav
from .loader import load
from .saver import save

__all__ = ["aiff", "codecs", "pcm", "wav", "load", "save"]
