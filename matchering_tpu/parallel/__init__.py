"""Multi-device execution: pair batching (dp) and time-block sharding (sp).

The reference is a single numpy process with no parallelism of any kind
(SURVEY.md §2.2, §5.8) — everything here is new TPU-native design:

* ``mesh``      — device-mesh construction helpers;
* ``batch``     — data-parallel mastering of (target, reference) pair batches
                  over the ``pairs`` mesh axis;
* ``timeshard`` — sequence parallelism for single long tracks: the time axis
                  is sharded across the ``time`` mesh axis under
                  ``shard_map``, with ``ppermute`` halo exchange for
                  overlap-save convolution / sliding maxima, carried
                  associative scans for the limiter IIR stages, and
                  ``psum``/``all_gather`` for global piece-RMS statistics,
                  averaged spectra and peaks.
"""

from . import batch, mesh, timeshard
from .batch import master_batch
from .mesh import make_mesh
from .timeshard import master_sharded

__all__ = [
    "batch",
    "make_mesh",
    "master_batch",
    "master_sharded",
    "mesh",
    "timeshard",
]
