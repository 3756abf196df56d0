"""IIR filtering as parallel prefix scans (JAX).

The only truly sequential computations in the whole mastering chain are the
limiter's five first-order IIR passes (reference
``matchering/limiter/hyrax.py:48-75``).  On TPU we express each linear
recurrence ``y[i] = u[i] + p * y[i-1]`` as a ``jax.lax.associative_scan``
over affine maps ``(p, u)`` — O(n) work at O(log n) depth, fully
vectorizable, and block-decomposable for time sharding (the per-block carry
is a single affine map, see ``parallel/timeshard.py``).

Semantics reproduced exactly:

* ``lfilter_first_order`` — ``scipy.signal.lfilter(b, a, x)`` for first-order
  (b0, b1) / (1, a1) filters, zero initial state, optional DF2T ``zi``.
* ``filtfilt_first_order`` — ``scipy.signal.filtfilt(b, a, x)`` with its
  default odd-extension padding (padlen = 3 * max(len(a), len(b)) = 6) and
  ``lfilter_zi`` initial conditions (reference ``hyrax.py:48-53`` relies on
  these defaults).
* ``butter1_coefficients`` — host-side first-order Butterworth design, equal
  to ``scipy.signal.butter(1, wn, fs=fs)``.

Filter coefficients are host-side Python floats (static); only the signal is
on device.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class FirstOrderFilter(NamedTuple):
    """Transfer function b = (b0, b1), a = (1, a1), all host floats."""

    b0: float
    b1: float
    a1: float

    @property
    def pole(self) -> float:
        return -self.a1

    def zi(self) -> float:
        """Steady-state DF2T initial condition, equal to
        ``scipy.signal.lfilter_zi(b, a)`` for a first-order section:
        the single state value z satisfying the step-response fixed point
        z = b1 - a1*(b0 + z) ... solved: z = (b1 - a1*b0) / (1 + a1)."""
        return (self.b1 - self.a1 * self.b0) / (1.0 + self.a1)


def one_pole_filter(coefficient: float, time_samples: float) -> FirstOrderFilter:
    """The limiter's attack smoother: b = [1-c], a = [1, -c] with
    c = exp(coefficient / time_samples) (reference ``hyrax.py:48-50``)."""
    c = math.exp(coefficient / time_samples)
    return FirstOrderFilter(b0=1.0 - c, b1=0.0, a1=-c)


def butter1_coefficients(cutoff_hz: float, fs: float) -> FirstOrderFilter:
    """First-order digital Butterworth low-pass via bilinear transform,
    identical to ``scipy.signal.butter(1, cutoff_hz, fs=fs)``:

        warped = tan(pi * cutoff / fs);  k = warped / (1 + warped)
        b = [k, k],  a = [1, (warped - 1) / (warped + 1)]
    """
    warped = math.tan(math.pi * cutoff_hz / fs)
    k = warped / (1.0 + warped)
    a1 = (warped - 1.0) / (warped + 1.0)
    return FirstOrderFilter(b0=k, b1=k, a1=a1)


def _affine_combine(left, right):
    """Compose affine maps y -> a*y + u: (a2,u2) o (a1,u1) = (a1*a2, a2*u1+u2)."""
    a1, u1 = left
    a2, u2 = right
    return a1 * a2, a2 * u1 + u2


def scan_first_order(drive: jax.Array, pole: jax.Array) -> jax.Array:
    """Solve y[i] = drive[i] + pole * y[i-1], y[-1] = 0, via associative scan."""
    poles = jnp.broadcast_to(jnp.asarray(pole, dtype=drive.dtype), drive.shape)
    _, y = jax.lax.associative_scan(_affine_combine, (poles, drive))
    return y


def lfilter_first_order(
    filt: FirstOrderFilter, x: jax.Array, zi: jax.Array | float | None = None
) -> jax.Array:
    """``scipy.signal.lfilter([b0, b1], [1, a1], x, zi=[zi])`` (output only).

    DF2T semantics: y[0] = b0*x[0] + zi, then
    y[i] = b0*x[i] + b1*x[i-1] - a1*y[i-1].
    """
    dtype = x.dtype
    drive = filt.b0 * x
    if filt.b1 != 0.0:
        drive = drive.at[1:].add(filt.b1 * x[:-1])
    if zi is not None:
        drive = drive.at[0].add(jnp.asarray(zi, dtype=dtype))
    return scan_first_order(drive, jnp.asarray(-filt.a1, dtype=dtype))


def filtfilt_first_order(filt: FirstOrderFilter, x: jax.Array) -> jax.Array:
    """``scipy.signal.filtfilt(b, a, x)`` for a first-order filter with the
    scipy defaults: odd extension of padlen=6 samples on both ends and
    ``lfilter_zi`` state scaling."""
    padlen = 6
    # odd extension: 2*x[edge] - x[reflected]
    head = 2.0 * x[0] - x[padlen:0:-1]
    tail = 2.0 * x[-1] - x[-2 : -padlen - 2 : -1]
    ext = jnp.concatenate([head, x, tail])
    zi = filt.zi()
    y = lfilter_first_order(filt, ext, zi=zi * ext[0])
    y = lfilter_first_order(filt, y[::-1], zi=zi * y[-1])[::-1]
    return y[padlen:-padlen]


# ---------------------------------------------------------------------------
# Block-parallel building blocks (used by the time-sharded path)


def block_scan_summary(
    drive: jax.Array, pole: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Local scan plus this block's affine carry map.

    Returns (local_solution_with_zero_entry_state, (A, U)) where the true
    block output is ``local + A_prefix * carry_in`` and the block composes
    into the chain as carry_out = A * carry_in + U.
    """
    local = scan_first_order(drive, pole)
    n = drive.shape[0]
    a_total = jnp.asarray(pole, dtype=drive.dtype) ** n
    return local, (a_total, local[-1])
