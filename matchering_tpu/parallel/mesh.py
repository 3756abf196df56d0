"""Device-mesh construction for the mastering farm.

The natural mesh for this workload is 2-D:

* ``pairs`` — data parallelism over independent (target, reference) pairs
  (embarrassingly parallel, zero cross-pair communication — lay it out on
  the slower/outer interconnect dimension, DCN at multi-host scale);
* ``time``  — sequence parallelism over time blocks of a single track
  (halo exchange + small collectives — keep it on ICI).

The reference has no equivalent (single numpy process); see SURVEY.md §5.8.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    pairs: int = 1,
    time: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(pairs, time)`` mesh from ``pairs * time`` devices.

    Device order follows ``jax.devices()`` so that the ``time`` axis (which
    carries the halo traffic) maps to adjacent devices.
    """
    if devices is None:
        devices = jax.devices()
    needed = pairs * time
    if len(devices) < needed:
        raise ValueError(
            f"mesh ({pairs} pairs x {time} time) needs {needed} devices, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[:needed]).reshape(pairs, time)
    return Mesh(grid, axis_names=("pairs", "time"))


def single_axis_mesh(axis: str, size: Optional[int] = None) -> Mesh:
    """1-D mesh over all (or ``size``) local devices, named ``axis``."""
    devices = jax.devices()
    if size is not None:
        devices = devices[:size]
    return Mesh(np.asarray(devices), axis_names=(axis,))
