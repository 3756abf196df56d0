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
    sample_rate: int, fft_size: int, oversampling: int, dtype
):
    """The two dense interpolation operators as *device arrays*, for passing
    into jitted programs as runtime arguments.  Embedded as trace-time
    constants they are ~134 MB of HLO literal (fft_size 4096, float32),
    which the TPU compile service chews on for tens of seconds; as
    arguments they cost nothing."""
    import jax as _jax

    to_log, to_lin = interpolation_operators(sample_rate, fft_size, oversampling)
    return (
        _jax.device_put(jnp.asarray(to_log, dtype=dtype)),
        _jax.device_put(jnp.asarray(to_lin, dtype=dtype)),
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
    if operators is not None:
        a_log, a_lin = operators
        a_log = a_log.astype(dtype)
        a_lin = a_lin.astype(dtype)
    else:
        to_log, to_lin = interpolation_operators(sample_rate, fft_size, oversampling)
        a_log = jnp.asarray(to_log, dtype=dtype)
        a_lin = jnp.asarray(to_lin, dtype=dtype)

    on_log_grid = a_log @ matching_fft
    filtered_log = lowess.smooth(on_log_grid, lowess_frac, lowess_it, lowess_delta)
    filtered = a_lin @ filtered_log

    filtered = filtered.at[0].set(0.0)
    filtered = filtered.at[1].set(matching_fft[1])
    return filtered
