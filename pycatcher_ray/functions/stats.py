"""Core vectorized statistics kernels (numpy), matching reference semantics.

Each kernel documents the reference behaviour it reproduces with a
file:line citation into ``/root/reference`` so conformance is auditable:

- ``iqr_bounds`` / ``iqr_mask``: pandas linear-interpolation quantiles and
  the strict ``< lower | > upper`` outlier predicate
  (catch.py:150-157 ``find_outliers_iqr``).
- ``zscore``: population std (ddof=0) with NaN-skipping mean/std, exactly
  ``(x - np.mean(x)) / np.std(x)`` on a pandas Series (catch.py:186).
- ``mad_mask``: Iglewicz–Hoaglin modified z-score
  ``|0.6745 (x - med)/MAD| > 3.5`` — the semantics of pyod's
  ``MAD(threshold=3.5)`` used at catch.py:225-231.
- ``acf_fft`` / ``ssacf``: statsmodels ``acf(fft=True)`` default-nlags
  autocorrelation and the Σacf² model-selection score (catch.py:365-369).
- ``sum_of_squares``: flatten + Σx² (catch.py:319-323).
- ``rolling_mean``: pandas ``Series.rolling(w).mean()`` (NaN head).
"""

from __future__ import annotations

import numpy as np

from ..errors import DataValidationError

__all__ = [
    "quantile_linear",
    "quantile_cont",
    "iqr_bounds",
    "iqr_mask",
    "zscore",
    "mad_sigma",
    "modified_zscore",
    "mad_mask",
    "acf_fft",
    "ssacf",
    "sum_of_squares",
    "rolling_mean",
]


def _as_float_array(x, name: str = "input") -> np.ndarray:
    arr = np.asarray(x, dtype=np.float64).ravel()
    if arr.size == 0:
        raise DataValidationError(f"{name} cannot be None or empty")
    return arr


def quantile_linear(x: np.ndarray, q: float) -> float:
    """Pandas-default quantile: linear interpolation, NaNs skipped."""
    arr = np.asarray(x, dtype=np.float64).ravel()
    arr = arr[~np.isnan(arr)]
    if arr.size == 0:
        return float("nan")
    return float(np.quantile(arr, q))  # numpy 'linear' == pandas default


def quantile_cont(x: np.ndarray, q) -> np.ndarray | float:
    """SQL ``quantile_cont`` bit-parity quantile.

    Same linear-interpolation definition as numpy's, but computed with
    the TWO-PRODUCT form ``(1−frac)·lo + frac·hi`` that DuckDB uses —
    identified empirically (0/400 bitwise mismatches vs DuckDB 1.0 on
    adversarial (values, q); the plain lerp ``lo + frac·(hi − lo)`` and
    numpy's symmetric form each differ in the last bit on ~30% of
    adversarial cases, found by the hypothesis cross-engine property
    test).  A last-bit difference is enough to flip a round(…, 4) on a
    .00005 boundary when an engine result is hash-compared against a
    SQL oracle.  Use THIS for oracle-checked outputs;
    ``quantile_linear`` keeps numpy/pandas parity for the
    reference-conformant detector paths."""
    arr = np.sort(np.asarray(x, dtype=np.float64).ravel())
    arr = arr[~np.isnan(arr)] if np.isnan(arr).any() else arr
    qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
    if arr.size == 0:
        out = np.full(qs.size, np.nan)
        return out if np.ndim(q) else float("nan")
    pos = qs * (arr.size - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, arr.size - 1)
    frac = pos - lo
    out = (1.0 - frac) * arr[lo] + frac * arr[hi]
    return out if np.ndim(q) else float(out[0])


def iqr_bounds(x, k: float = 1.5) -> tuple[float, float]:
    """(Q1 - k*IQR, Q3 + k*IQR) with pandas-interpolation quartiles."""
    q1 = quantile_linear(x, 0.25)
    q3 = quantile_linear(x, 0.75)
    iqr = q3 - q1
    return q1 - k * iqr, q3 + k * iqr


def iqr_mask(x, k: float = 1.5) -> np.ndarray:
    """Boolean outlier mask; strict inequalities per catch.py:157."""
    arr = np.asarray(x, dtype=np.float64)
    lo, hi = iqr_bounds(arr, k)
    with np.errstate(invalid="ignore"):
        return (arr < lo) | (arr > hi)


def zscore(x) -> np.ndarray:
    """(x - mean)/std with population std (ddof=0), NaNs skipped in the
    moments but propagated elementwise (catch.py:186)."""
    arr = _as_float_array(x, "residuals")
    mean = np.nanmean(arr)
    std = np.nanstd(arr)  # ddof=0
    with np.errstate(invalid="ignore", divide="ignore"):
        return (np.asarray(x, dtype=np.float64) - mean) / std


def mad_sigma(x) -> tuple[float, float]:
    """(median, MAD) of the non-NaN values."""
    arr = np.asarray(x, dtype=np.float64).ravel()
    arr = arr[~np.isnan(arr)]
    med = float(np.median(arr))
    mad = float(np.median(np.abs(arr - med)))
    return med, mad


def modified_zscore(x) -> np.ndarray:
    """Iglewicz–Hoaglin modified z-score 0.6745*(x-med)/MAD.

    When MAD == 0 (constant data) the score is 0 where x == median and
    +/-inf elsewhere, matching pyod's MAD behaviour of flagging nothing
    for strictly constant data.
    """
    arr = np.asarray(x, dtype=np.float64)
    med, mad = mad_sigma(arr)
    with np.errstate(invalid="ignore", divide="ignore"):
        z = 0.6745 * (arr - med) / mad
        z = np.where(arr == med, 0.0, z)
    return z


def mad_mask(x, threshold: float = 3.5) -> np.ndarray:
    """|modified z| > threshold (pyod MAD(threshold=3.5), catch.py:231)."""
    arr = _as_float_array(x, "residuals")
    z = modified_zscore(np.asarray(x, dtype=np.float64))
    with np.errstate(invalid="ignore"):
        return np.abs(z) > threshold


def acf_fft(x: np.ndarray, nlags: int | None = None) -> np.ndarray:
    """Autocorrelation function via FFT, statsmodels ``acf(fft=True)``:
    demean, biased autocovariance, normalized by acovf[0]; default nlags
    = min(int(10*log10(n)), n-1)."""
    arr = np.asarray(x, dtype=np.float64).ravel()
    arr = arr[~np.isnan(arr)]
    n = arr.size
    if n == 0:
        raise DataValidationError("ACF input cannot be empty")
    if nlags is None:
        nlags = min(int(10 * np.log10(n)), n - 1) if n > 1 else 0
    d = arr - arr.mean()
    nfft = 1 << int(np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(d, nfft)
    acov = np.fft.irfft(f * np.conj(f), nfft)[: nlags + 1].real / n
    if acov[0] == 0:
        out = np.zeros(nlags + 1)
        out[0] = 1.0
        return out
    return acov / acov[0]


def ssacf(residuals: np.ndarray) -> float:
    """Sum of squared ACF values of the residuals — the add-vs-mul model
    selection score (catch.py:365-369)."""
    return float(np.sum(np.square(acf_fft(residuals))))


def sum_of_squares(arr: np.ndarray) -> float:
    """Flatten then sum of squares (catch.py:319-323)."""
    if arr is None:
        raise DataValidationError("Input array cannot be None")
    a = np.asarray(arr)
    if a.size == 0:
        raise DataValidationError("Input array cannot be empty")
    if not np.issubdtype(a.dtype, np.number):
        raise DataValidationError("Input array must contain numeric values")
    return float(np.sum(np.square(a.astype(np.float64).ravel())))


def rolling_mean(x: np.ndarray, window: int) -> np.ndarray:
    """Pandas ``rolling(window).mean()``: first window-1 entries NaN; any
    NaN inside a window yields NaN (min_periods=window)."""
    arr = np.asarray(x, dtype=np.float64).ravel()
    n = arr.size
    out = np.full(n, np.nan)
    if window <= 0 or n < window:
        return out
    nan_flag = np.isnan(arr)
    filled = np.where(nan_flag, 0.0, arr)
    csum = np.cumsum(filled)
    cnan = np.cumsum(nan_flag.astype(np.int64))
    wsum = csum[window - 1 :].copy()
    wsum[1:] -= csum[: n - window]
    wnan = cnan[window - 1 :].copy()
    wnan[1:] -= cnan[: n - window]
    vals = wsum / window
    vals[wnan > 0] = np.nan
    out[window - 1 :] = vals
    return out
