"""Overlapping-window extraction without gathers.

TPU-native replacement for the reference's ``as_strided`` sliding windows
(``matchering/dsp.py:128-139``) and every strided-block need in the pipeline
(overlap-save convolution, polyphase resampling, preview window search).

XLA on TPU compiles large gathers / vmapped ``dynamic_slice`` stacks orders
of magnitude slower than it runs them (measured: >10 min compile for a
(61, 131072) gather that executes in ms).  But a matrix of overlapping
windows ``W[b] = x[b*hop : b*hop + width]`` is always expressible as
``ceil(width / hop)`` *disjoint* reshapes of shifted copies, concatenated
along the window axis — pure layout ops that compile instantly:

    part k = x[k*hop : k*hop + nblocks*hop].reshape(nblocks, hop)
    W = concat(parts, axis=1)[:, :width]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def overlapping_blocks(
    x: jax.Array, nblocks: int, hop: int, width: int
) -> jax.Array:
    """(n,) or (n, c) -> (nblocks, width[, c]) with W[b] = x[b*hop : b*hop+width].

    ``x`` must be long enough: n >= (nblocks - 1 + ceil(width/hop)) * hop;
    callers pad.  All three window parameters are static.
    """
    parts_needed = -(-width // hop)
    need = (nblocks - 1 + parts_needed) * hop
    if x.shape[0] < need:
        raise ValueError(
            f"overlapping_blocks needs {need} samples, got {x.shape[0]} "
            f"(nblocks={nblocks}, hop={hop}, width={width})"
        )
    trailing = x.shape[1:]
    parts = []
    for k in range(parts_needed):
        cols = min(hop, width - k * hop)
        part = x[k * hop : (k * hop + nblocks * hop)].reshape(
            (nblocks, hop) + trailing
        )
        # slice each part to its needed columns BEFORE concatenating — an
        # oversized concat-then-slice stalls the XLA TPU layout passes for
        # minutes at these shapes
        parts.append(part[:, :cols] if cols != hop else part)
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
