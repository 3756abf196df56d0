"""Matching-curve smoothing: lin->log resample, LOWESS, log->lin resample.

TPU-native replacement for the reference's ``__smooth_exponentially``
(``matchering/stage_helpers/match_frequencies.py:45-75``).  Both cubic-spline
resampling steps interpolate between *static* frequency grids that depend
only on (sample_rate, fft_size, oversampling) — and cubic-spline
interpolation at fixed query points is a linear map of the data values.  So
the host precomputes the two dense interpolation operators once per config
(float64, via scipy — bit-identical to the reference's ``interp1d`` — by
probing the identity matrix) and the device applies them as single matmuls
on the MXU.  The LOWESS step between them runs via ``ops.lowess``.

Boundary semantics preserved exactly: the smoothed curve's DC bin is zeroed
and bin 1 keeps its unsmoothed value (``match_frequencies.py:73-74``), which
also means the log->lin extrapolation below the log grid's lowest frequency
(bins 0 and 1) never influences the result.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import lowess


@functools.lru_cache(maxsize=8)
def _grids(sample_rate: int, fft_size: int, oversampling: int) -> Tuple[np.ndarray, np.ndarray]:
    nyquist = sample_rate * 0.5
    grid_linear = nyquist * np.linspace(0, 1, fft_size // 2 + 1)
    grid_logarithmic = nyquist * np.logspace(
        np.log10(4 / fft_size), 0, (fft_size // 2) * oversampling + 1
    )
    return grid_linear, grid_logarithmic


@functools.lru_cache(maxsize=8)
def interpolation_operators(
    sample_rate: int, fft_size: int, oversampling: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(lin->log, log->lin) dense cubic-interpolation matrices (float64).

    Built by evaluating scipy's ``interp1d(kind="cubic")`` on the identity —
    whatever spline boundary rules scipy uses, the operators reproduce them
    exactly, column by column.
    """
    from scipy import interpolate

    grid_linear, grid_logarithmic = _grids(sample_rate, fft_size, oversampling)
    nl = grid_linear.shape[0]
    ng = grid_logarithmic.shape[0]

    to_log = interpolate.interp1d(grid_linear, np.eye(nl), "cubic", axis=0)(
        grid_logarithmic
    )  # (ng, nl)
    to_lin = interpolate.interp1d(
        grid_logarithmic, np.eye(ng), "cubic", axis=0, fill_value="extrapolate"
    )(grid_linear)  # (nl, ng)
    return np.ascontiguousarray(to_log), np.ascontiguousarray(to_lin)


@functools.lru_cache(maxsize=8)
def interpolation_operator_arrays(
    sample_rate: int, fft_size: int, oversampling: int, dtype, lowess_params=None
):
    """The two dense interpolation operators as *device arrays*, for passing
    into jitted programs as runtime arguments.  Embedded as trace-time
    constants they are ~134 MB of HLO literal (fft_size 4096, float32),
    which the TPU compile service chews on for tens of seconds; as
    arguments they cost nothing.

    ``lowess_params = (frac, it, delta)`` additionally FOLDS the it=0
    LOWESS smoother into the operator pair (``lowess.linear_operator``):
    the returned matrices are then ``F @ to_log`` and ``to_lin @ W`` with
    anchor-count inner dimension, and :func:`smooth_exponentially` skips
    the separate LOWESS op (detected by shape — see there).  This removes
    the (anchors, k) device gather (2.36 ms/call on a v5e vs ~0.05 ms for
    the folded matmuls) AND shrinks the argument matrices ~8x.  No fold
    for ``it > 0`` (data-dependent reweighting) or ``delta == 0``
    (``lowess_exact``: the dense anchor matrix would be (ng, ng) ~268 MB)."""
    import jax as _jax

    to_log, to_lin = interpolation_operators(sample_rate, fft_size, oversampling)
    if lowess_params is not None:
        frac, it, delta = lowess_params
        if it == 0 and delta > 0:
            W, F = lowess.linear_operator(to_log.shape[0], float(frac), float(delta))
            to_log = F @ to_log
            to_lin = to_lin @ W
    return (
        _jax.device_put(jnp.asarray(to_log, dtype=dtype)),
        _jax.device_put(jnp.asarray(to_lin, dtype=dtype)),
    )


def operator_arrays_for_config(config):
    """:func:`interpolation_operator_arrays` for a ``Config`` — the one
    call every production entry point should use: it threads the LOWESS
    parameters so the it=0 smoother folds into the operator pair (the
    TPU-gather fix; see :func:`interpolation_operator_arrays`)."""
    return interpolation_operator_arrays(
        config.internal_sample_rate,
        config.fft_size,
        config.lin_log_oversampling,
        jnp.dtype(config.dtype),
        lowess_params=(
            config.lowess_frac,
            config.lowess_it,
            0.0 if config.lowess_exact else config.lowess_delta,
        ),
    )


def smooth_exponentially(
    matching_fft: jax.Array,
    sample_rate: int,
    fft_size: int,
    oversampling: int,
    lowess_frac: float,
    lowess_it: int,
    lowess_delta: float,
    operators=None,
) -> jax.Array:
    """Smooth a matching spectrum on a log-frequency grid.

    matching_fft: (fft_size//2 + 1,) -> same shape.  ``operators`` may carry
    the (lin->log, log->lin) matrices as traced arrays; when None they are
    baked in as constants (fine on CPU).
    """
    dtype = matching_fft.dtype
    ng = (fft_size // 2) * oversampling + 1  # full log-grid size
    lowess_folded = False
    if operators is not None:
        a_log, a_lin = operators
        a_log = a_log.astype(dtype)
        a_lin = a_lin.astype(dtype)
        # folded operators (see interpolation_operator_arrays) carry the
        # it=0 LOWESS inside: their inner dimension is the anchor count,
        # a strict subset of the log grid whenever delta > 0
        lowess_folded = a_log.shape[0] != ng
    else:
        to_log, to_lin = interpolation_operators(sample_rate, fft_size, oversampling)
        a_log = jnp.asarray(to_log, dtype=dtype)
        a_lin = jnp.asarray(to_lin, dtype=dtype)

    on_log_grid = a_log @ matching_fft
    if lowess_folded:
        filtered_log = on_log_grid
    else:
        filtered_log = lowess.smooth(
            on_log_grid, lowess_frac, lowess_it, lowess_delta
        )
    filtered = a_lin @ filtered_log

    filtered = filtered.at[0].set(0.0)
    filtered = filtered.at[1].set(matching_fft[1])
    return filtered
