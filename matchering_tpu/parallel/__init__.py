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
                  averaged spectra and peaks;
* ``launch``    — multi-host scaffolding: ``jax.distributed`` bring-up,
                  process-major global meshes (pairs→DCN, time→ICI),
                  host-sharded batch assembly, and an N-process CPU
                  self-test (``python -m matchering_tpu.parallel.launch
                  selftest``).
"""

from . import batch, launch, mesh, timeshard
from .batch import master_batch, master_pairs
from .launch import global_mesh, initialize, master_batch_distributed
from .mesh import make_mesh
from .timeshard import master_sharded

__all__ = [
    "batch",
    "global_mesh",
    "initialize",
    "launch",
    "make_mesh",
    "master_batch",
    "master_batch_distributed",
    "master_pairs",
    "master_sharded",
    "mesh",
    "timeshard",
]
