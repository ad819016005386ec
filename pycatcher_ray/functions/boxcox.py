"""Box-Cox power transform with MLE lambda, from scratch.

Mirrors ``scipy.stats.boxcox`` / ``scipy.special.inv_boxcox`` as used by
the reference's multiplicative STL/MSTL paths (catch.py:1078,
catch.py:1138-1142): transform strictly-positive data with the
log-likelihood-maximizing lambda, and invert residuals back.

The lambda search maximizes the standard Box-Cox profile log-likelihood
  llf(λ) = (λ-1)·Σ log x  -  n/2 · log(var(y_λ))
via golden-section search on [-5, 5] (scipy uses Brent; the optimum is
unimodal so golden section reaches the same λ to ~1e-8).
"""

from __future__ import annotations

import math

import numpy as np

from ..errors import DataValidationError

__all__ = ["boxcox_transform", "boxcox", "inv_boxcox", "boxcox_llf", "boxcox_mle_lambda"]


def boxcox_transform(x: np.ndarray, lmbda: float) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    if lmbda == 0.0:
        return np.log(x)
    return (np.power(x, lmbda) - 1.0) / lmbda


def inv_boxcox(y: np.ndarray, lmbda: float) -> np.ndarray:
    y = np.asarray(y, dtype=np.float64)
    if lmbda == 0.0:
        return np.exp(y)
    return np.power(lmbda * y + 1.0, 1.0 / lmbda)


def boxcox_llf(lmbda: float, x: np.ndarray) -> float:
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    y = boxcox_transform(x, lmbda)
    var = np.var(y)
    if var <= 0 or not np.isfinite(var):
        return -math.inf
    return float((lmbda - 1.0) * np.sum(np.log(x)) - n / 2.0 * math.log(var))


def boxcox_mle_lambda(x: np.ndarray, lo: float = -5.0, hi: float = 5.0) -> float:
    x = np.asarray(x, dtype=np.float64)
    if x.size == 0:
        raise DataValidationError("Box-Cox input cannot be empty")
    if np.nanmin(x) <= 0:
        raise DataValidationError("Box-Cox requires strictly positive data")
    gr = (math.sqrt(5.0) - 1.0) / 2.0
    a, b = lo, hi
    c = b - gr * (b - a)
    d = a + gr * (b - a)
    fc, fd = boxcox_llf(c, x), boxcox_llf(d, x)
    for _ in range(200):
        if b - a < 1e-9:
            break
        if fc > fd:
            b, d, fd = d, c, fc
            c = b - gr * (b - a)
            fc = boxcox_llf(c, x)
        else:
            a, c, fc = c, d, fd
            d = a + gr * (b - a)
            fd = boxcox_llf(d, x)
    return 0.5 * (a + b)


def boxcox(x: np.ndarray) -> tuple[np.ndarray, float]:
    """(transformed, lambda) like ``scipy.stats.boxcox(x)``."""
    lmbda = boxcox_mle_lambda(x)
    return boxcox_transform(x, lmbda), lmbda
