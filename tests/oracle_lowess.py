"""Direct-loop LOWESS oracle (Cleveland 1979) for parity testing.

A deliberately simple O(n*k) numpy implementation of locally weighted
scatterplot smoothing with tricube weights, delta-skipping and bisquare
robustness iterations — the algorithm statsmodels'
``nonparametric.lowess`` implements in Cython (the reference calls it at
``matchering/dsp.py:103-106``).  statsmodels itself is not installed in this
environment, so this oracle serves two roles:

1. unit-test oracle for ``matchering_tpu.ops.lowess`` (an independent
   implementation — agreement checks the vectorized planning logic);
2. stand-in for statsmodels when the reference pipeline is executed as the
   end-to-end oracle (see ``conftest.reference_matchering``), so that
   end-to-end comparisons isolate every pipeline stage *except* LOWESS
   internals.

Assumes sorted, strictly increasing, duplicate-free ``exog`` — always true
for the pipeline's ``linspace(0, 1, n)`` grid.
"""

from __future__ import annotations

import numpy as np


def _fit_point(x: np.ndarray, y: np.ndarray, i: int, left: int, k: int, rw) -> float:
    """Weighted linear fit over window [left, left+k) evaluated at x[i]."""
    xw = x[left : left + k]
    yw = y[left : left + k]
    dist = np.abs(xw - x[i])
    radius = dist.max()
    if radius <= 0:
        w = np.ones_like(xw)
    else:
        w = np.clip(dist / radius, 0.0, 1.0)
        w = (1.0 - w**3) ** 3
    if rw is not None:
        w = w * rw[left : left + k]
    wsum = w.sum()
    if wsum <= 0:
        return float(yw.mean())
    w = w / wsum
    xbar = (w * xw).sum()
    var = (w * (xw - xbar) ** 2).sum()
    mean = (w * yw).sum()
    if var <= 1e-12 * max(xbar * xbar, 1.0):
        return float(mean)
    beta = (w * (xw - xbar) * yw).sum() / var
    return float(mean + beta * (x[i] - xbar))


def _window_for(x: np.ndarray, i: int, left: int, k: int) -> int:
    """Advance the k-point window so it is the k nearest neighbours of x[i]."""
    n = x.shape[0]
    while left + k - 1 < n - 1 and (x[left + k] - x[i]) < (x[i] - x[left]):
        left += 1
    while left > i:
        left -= 1
    while left + k - 1 < i:
        left += 1
    return left


def lowess(
    endog: np.ndarray,
    exog: np.ndarray,
    frac: float = 2.0 / 3.0,
    it: int = 3,
    delta: float = 0.0,
    **_ignored,
) -> np.ndarray:
    """statsmodels-compatible signature; returns the (n, 2) [x, smoothed]."""
    x = np.asarray(exog, dtype=np.float64)
    y = np.asarray(endog, dtype=np.float64)
    n = x.shape[0]
    k = max(2, min(int(frac * n + 1e-10), n))

    rw = None
    out = np.empty(n)
    for _iteration in range(it + 1):
        left = 0
        last_fit_i = -1
        last_fit_val = 0.0
        i = 0
        while i < n:
            left = _window_for(x, i, left, k)
            val = _fit_point(x, y, i, left, k, rw)
            if last_fit_i < 0:
                out[i] = val
            else:
                # linear interpolation across the delta-skipped span
                span = x[i] - x[last_fit_i]
                for j in range(last_fit_i + 1, i):
                    t = (x[j] - x[last_fit_i]) / span
                    out[j] = (1.0 - t) * last_fit_val + t * val
                out[i] = val
            last_fit_i, last_fit_val = i, val
            if i == n - 1:
                break
            # delta skipping: next fit at the last point within x[i] + delta
            cut = x[i] + delta
            j = i + 1
            while j < n and x[j] <= cut:
                j += 1
            i = max(i + 1, j - 1)

        if _iteration == it:
            break
        resid = np.abs(y - out)
        s = np.median(resid)
        if s <= 0:
            rw = np.ones(n)
        else:
            rw = np.clip(resid / (6.0 * s), 0.0, 1.0)
            rw = (1.0 - rw**2) ** 2

    return np.column_stack([x, out])
