"""Shapiro–Wilk normality test (Royston AS R94) + Monte-Carlo gate.

The reference uses ``scipy.stats.shapiro`` directly (catch.py:1718, ESD
dispatch) and wraps it in ``scipy.stats.monte_carlo_test(..., rvs=norm.rvs,
n_resamples=10000, alternative='greater')`` (catch.py:1168-1187) to choose
between z-score and MAD flagging for STL residuals.  Neither scipy nor
sesd is installed here, so both are implemented from the published
algorithms:

- W statistic and analytic p-value: Royston (1995), Applied Statistics
  algorithm AS R94 (the same algorithm scipy wraps).
- Monte-Carlo p-value: proportion of null-resample statistics >= observed
  ((count + 1) / (n_resamples + 1), scipy's definition), null = standard
  normal samples of the same length.

Because 10,000 resamples per series is the reference's CPU hot spot
(BASELINE.md hot spot 2), ``MonteCarloShapiro`` caches the simulated null
distribution **per sample size** — in the Ray engine one instance lives in
each detector actor (built once in ``__init__``), so repeated series of
the same length pay the simulation once per actor, not once per series.
"""

from __future__ import annotations

import numpy as np

from ..errors import DataValidationError
from .special import norm_cdf, norm_ppf

__all__ = ["shapiro_w", "shapiro", "MonteCarloShapiro"]


def _sw_coefficients(n: int) -> np.ndarray:
    """Royston's approximate optimal weights a_i for sample size n."""
    m = norm_ppf((np.arange(1, n + 1) - 0.375) / (n + 0.25))
    ssq_m = float(np.sum(m * m))
    c = m / np.sqrt(ssq_m)
    u = 1.0 / np.sqrt(n)
    a = m.copy()
    if n > 5:
        a_n = (
            c[-1]
            + 0.221157 * u
            - 0.147981 * u**2
            - 2.071190 * u**3
            + 4.434685 * u**4
            - 2.706056 * u**5
        )
        a_n1 = (
            c[-2]
            + 0.042981 * u
            - 0.293762 * u**2
            - 1.752461 * u**3
            + 5.682633 * u**4
            - 3.582633 * u**5
        )
        phi = (ssq_m - 2.0 * m[-1] ** 2 - 2.0 * m[-2] ** 2) / (
            1.0 - 2.0 * a_n**2 - 2.0 * a_n1**2
        )
        a = m / np.sqrt(phi)
        a[-1], a[0] = a_n, -a_n
        a[-2], a[1] = a_n1, -a_n1
    elif n > 3:
        a_n = (
            c[-1]
            + 0.221157 * u
            - 0.147981 * u**2
            - 2.071190 * u**3
            + 4.434685 * u**4
            - 2.706056 * u**5
        )
        phi = (ssq_m - 2.0 * m[-1] ** 2) / (1.0 - 2.0 * a_n**2)
        a = m / np.sqrt(phi)
        a[-1], a[0] = a_n, -a_n
    else:  # n == 3
        a = np.array([-np.sqrt(0.5), 0.0, np.sqrt(0.5)])
    return a


def shapiro_w(x: np.ndarray) -> float:
    """The W statistic alone (used as the Monte-Carlo test statistic)."""
    arr = np.sort(np.asarray(x, dtype=np.float64).ravel())
    arr = arr[~np.isnan(arr)]
    n = arr.size
    if n < 3:
        raise DataValidationError("Shapiro-Wilk requires at least 3 observations")
    a = _sw_coefficients(n)
    num = float(np.dot(a, arr)) ** 2
    den = float(np.sum((arr - arr.mean()) ** 2))
    if den == 0.0:
        return 1.0
    return min(num / den, 1.0)


def shapiro(x: np.ndarray) -> tuple[float, float]:
    """(W, p) with Royston's analytic p-value (AS R94 normalization)."""
    arr = np.asarray(x, dtype=np.float64).ravel()
    arr = arr[~np.isnan(arr)]
    n = arr.size
    w = shapiro_w(arr)
    if n == 3:
        pi6 = 6.0 / np.pi
        stqr = np.arcsin(np.sqrt(0.75))
        p = pi6 * (np.arcsin(np.sqrt(w)) - stqr)
        return w, float(min(max(p, 0.0), 1.0))
    lw = np.log1p(-w)  # ln(1 - W)
    if n <= 11:
        g = -2.273 + 0.459 * n
        mu = 0.5440 - 0.39978 * n + 0.025054 * n**2 - 0.0006714 * n**3
        sigma = np.exp(1.3822 - 0.77857 * n + 0.062767 * n**2 - 0.0020322 * n**3)
        if g - lw <= 0:
            return w, 0.0
        z = (-np.log(g - lw) - mu) / sigma
    else:
        y = np.log(n)
        mu = -1.5861 - 0.31082 * y - 0.083751 * y**2 + 0.0038915 * y**3
        sigma = np.exp(-0.4803 - 0.082676 * y + 0.0030302 * y**2)
        z = (lw - mu) / sigma
    p = 1.0 - norm_cdf(z)
    return w, float(p)


class MonteCarloShapiro:
    """Monte-Carlo Shapiro–Wilk gate with a per-sample-size null cache.

    ``test(data)`` reproduces ``stats.monte_carlo_test(data, norm.rvs,
    shapiro_statistic, n_resamples=10000, alternative='greater')``
    (catch.py:1184-1185): p = (#{null W >= observed W} + 1) / (R + 1).

    The null distribution of W depends only on len(data), so it is
    simulated once per length and cached.  A fixed seed keeps flags
    reproducible run-to-run (engine determinism requirement).
    """

    def __init__(self, n_resamples: int = 10000, seed: int = 42,
                 max_cache_sizes: int = 64, analytic_above: int = 500):
        self.n_resamples = n_resamples
        self.seed = seed
        self.max_cache_sizes = max_cache_sizes
        # For long series the 10k-resample null costs O(R·n·log n) time and
        # O(R·n) memory (n=17520 → a 1.4 GB matrix) while the MC p-value
        # converges to Royston's analytic one; above this cutoff use the
        # analytic p (documented divergence from catch.py:1184-1185 — same
        # gate decision, bounded cost per actor).
        self.analytic_above = analytic_above
        self._cache: dict[int, np.ndarray] = {}

    def _null(self, n: int) -> np.ndarray:
        null = self._cache.get(n)
        if null is None:
            rng = np.random.default_rng(self.seed + n)
            samples = rng.standard_normal((self.n_resamples, n))
            # Vectorized W over all resamples: sort rows, fixed weights.
            samples.sort(axis=1)
            a = _sw_coefficients(n)
            num = (samples @ a) ** 2
            den = np.sum((samples - samples.mean(axis=1, keepdims=True)) ** 2, axis=1)
            null = num / den
            if len(self._cache) >= self.max_cache_sizes:
                self._cache.pop(next(iter(self._cache)))
            self._cache[n] = null
        return null

    def test(self, data: np.ndarray) -> tuple[float, float]:
        arr = np.asarray(data, dtype=np.float64).ravel()
        arr = arr[~np.isnan(arr)]
        n = arr.size
        if n < 3:
            raise DataValidationError("Monte-Carlo Shapiro requires >= 3 observations")
        if n > self.analytic_above:
            # alternative='greater' p = P(W_null >= W_obs); Royston's
            # analytic p is P(W_null <= W_obs), so the gate-preserving
            # analytic equivalent is its complement.
            w, p_royston = shapiro(arr)
            return w, float(1.0 - p_royston)
        w = shapiro_w(arr)
        null = self._null(n)
        # alternative='greater': large statistic counts against the null
        p = (np.count_nonzero(null >= w) + 1.0) / (self.n_resamples + 1.0)
        return w, float(p)
