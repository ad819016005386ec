"""Generalized ESD and Seasonal ESD (S-ESD / S-H-ESD), from scratch.

The reference delegates to the ``sesd`` package (catch.py:1608-1624 uses
``sesd.generalized_esd``; catch.py:1655-1678 uses ``sesd.seasonal_esd``),
which implements the NIST Generalized Extreme Studentized Deviate test
(https://www.itl.nist.gov/div898/handbook/eda/section3/eda35h3.htm) and
the Twitter S-ESD/S-H-ESD procedure (Hochenbaum, Vallis & Kejariwal,
arXiv:1704.07706, cited at catch.py:1645).  Neither sesd nor scipy exists
in this environment, so both are implemented from the published
algorithms:

- ``generalized_esd``: iteratively remove the max studentized deviate
  (mean/std, or median/MAD when ``hybrid``) and compare against the
  critical value λ_i = (m-1)·t / sqrt(m·(m-2+t²)) with
  t = t_ppf(1 - α/(2m), m-2) for current masked size m.
- ``seasonal_esd``: residual R = ts - STL.seasonal - median(ts), then
  ``generalized_esd`` on R.

Returns positional indices into the input array, like sesd.
"""

from __future__ import annotations

import math

import numpy as np

from .special import t_ppf
from .stl import stl

__all__ = ["generalized_esd", "seasonal_esd", "esd_critical_value"]


from functools import lru_cache


@lru_cache(maxsize=65536)
def esd_critical_value(size: int, alpha: float) -> float:
    """NIST critical value for the current (masked) sample size.

    Cached: the inverse-t (via inverse incomplete beta) costs ~ms and the
    iterative ESD asks for sizes n, n-1, ..., n-k — identical across the
    many same-length series a detector actor processes."""
    if size <= 2:
        return math.inf
    t = t_ppf(1.0 - alpha / (2.0 * size), size - 2)
    return (size - 1) * t / math.sqrt(size * (size - 2.0 + t * t))


def _test_statistic(values: np.ndarray, mask: np.ndarray, hybrid: bool
                    ) -> tuple[int, float]:
    """(index, score) of the largest studentized deviate among unmasked.
    (Reference semantics; the iterative driver below keeps compacted
    active arrays instead of re-masking — same math, ~3x less work.)"""
    active = values[~mask]
    if hybrid:
        center = np.median(active)
        spread = np.median(np.abs(active - center))
    else:
        center = active.mean()
        spread = active.std()  # ddof=0, as numpy/sesd default
    with np.errstate(divide="ignore", invalid="ignore"):
        scores = np.abs(values - center) / spread
    scores[mask] = -np.inf
    idx = int(np.argmax(scores))
    return idx, float(scores[idx])


def generalized_esd(
    ts: np.ndarray,
    max_anomalies: int,
    alpha: float = 0.05,
    hybrid: bool = False,
) -> list[int]:
    """Positional indices of detected anomalies (NIST Generalized ESD).

    The iteration maintains compacted (values, original-index) arrays and
    deletes the removed element each round, so every pass computes the
    center/spread/scores over exactly the active sample — identical math
    to masking the full array (the non-hybrid spread uses the same
    two-pass mean/std as ndarray.std, no incremental-sum drift), at a
    third of the allocations."""
    values = np.asarray(ts, dtype=np.float64).ravel()
    n = values.size
    max_anomalies = int(min(max_anomalies, n - 3)) if n > 3 else 0
    if max_anomalies <= 0:
        return []
    active = values.copy()
    orig_idx = np.arange(n)
    candidates: list[int] = []
    num_outliers = 0
    with np.errstate(divide="ignore", invalid="ignore"):
        for curr in range(max_anomalies):
            if hybrid:
                center = np.median(active)
                d = np.abs(active - center)
                spread = np.median(d)
            else:
                center = active.mean()
                d = np.abs(active - center)
                spread = np.sqrt(np.dot(d, d) / active.size)  # ddof=0
            scores = d / spread
            local = int(np.argmax(scores))
            score = float(scores[local])
            if not np.isfinite(score):
                break
            lam = esd_critical_value(n - curr, alpha)
            candidates.append(int(orig_idx[local]))
            active = np.delete(active, local)
            orig_idx = np.delete(orig_idx, local)
            if score > lam:
                num_outliers = curr + 1
    return candidates[:num_outliers]


def seasonal_esd(
    ts: np.ndarray,
    periodicity: int | None = None,
    max_anomalies: int = 10,
    alpha: float = 0.05,
    hybrid: bool = False,
    seasonal: int = 7,
) -> list[int]:
    """S-ESD / S-H-ESD: STL seasonal removal + median adjustment + ESD."""
    values = np.asarray(ts, dtype=np.float64).ravel()
    n = values.size
    period = int(periodicity) if periodicity else max(int(0.2 * n), 2)
    result = stl(values, period=period, seasonal=seasonal)
    residual = values - result.seasonal - np.median(values)
    return generalized_esd(residual, max_anomalies=max_anomalies,
                           alpha=alpha, hybrid=hybrid)
