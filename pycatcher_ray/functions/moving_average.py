"""Moving-average outlier detection kernels.

Reproduces the reference's moving-average path (catch.py:745-947) without
sklearn:

- ``time_series_split``: sklearn ``TimeSeriesSplit(n_splits=5)`` expanding
  splits (catch.py:789) — test_size = n // (n_splits+1), fold i trains on
  [0, n - (n_splits-i)*test_size) and tests on the next test_size rows.
- ``rmse_for_window``: per fold, rolling-mean over the *test* slice, drop
  NaN head, RMSE(test values vs their MA); mean over folds, NaN if no
  usable fold (catch.py:792-808).
- ``optimal_window_size``: argmin of the mean RMSE over windows 2..20
  (catch.py:849-871), NaN-aware.
- ``moving_average_outlier_mask``: rolling mean at the optimal window,
  z-score of the MA (NaN-skipping moments, ddof=0), flag |z| > 2
  (catch.py:928-934).
"""

from __future__ import annotations

import numpy as np

from ..errors import DataValidationError
from .stats import rolling_mean

__all__ = [
    "time_series_split",
    "rmse_for_window",
    "optimal_window_size",
    "moving_average_outlier_mask",
]


def time_series_split(n: int, n_splits: int = 5):
    """Yield (train_end, test_start, test_end) index bounds per fold."""
    if n < n_splits + 1:
        raise DataValidationError(
            f"Cannot have number of folds={n_splits + 1} greater than the number of samples={n}"
        )
    test_size = n // (n_splits + 1)
    for i in range(n_splits):
        test_start = n - (n_splits - i) * test_size
        yield test_start, test_start, test_start + test_size


def rmse_for_window(values: np.ndarray, window: int, n_splits: int = 5) -> float:
    if not isinstance(window, (int, np.integer)):
        raise TypeError("Window size must be an integer")
    if window <= 0:
        raise ValueError("Window size must be greater than 0")
    arr = np.asarray(values, dtype=np.float64).ravel()
    scores = []
    for _, test_start, test_end in time_series_split(arr.size, n_splits):
        test = arr[test_start:test_end]
        ma = rolling_mean(test, window)
        ok = ~np.isnan(ma) & ~np.isnan(test)
        if ok.any():
            scores.append(float(np.sqrt(np.mean((test[ok] - ma[ok]) ** 2))))
    return float(np.mean(scores)) if scores else float("nan")


def optimal_window_size(values: np.ndarray, lo: int = 2, hi: int = 20,
                        n_splits: int = 5) -> int:
    arr = np.asarray(values, dtype=np.float64).ravel()
    if arr.size == 0:
        raise DataValidationError("Input DataFrame cannot have zero rows")
    rmses = []
    for w in range(lo, hi + 1):
        try:
            rmses.append(rmse_for_window(arr, w, n_splits))
        except Exception:
            rmses.append(float("nan"))
    rmses = np.asarray(rmses)
    if np.all(np.isnan(rmses)):
        raise ValueError("All RMSE values are NaN. Check your data for issues.")
    return int(lo + np.nanargmin(rmses))


def moving_average_outlier_mask(values: np.ndarray, window: int | None = None,
                                z_threshold: float = 2.0) -> np.ndarray:
    """Boolean mask of moving-average outliers (catch.py:928-934)."""
    arr = np.asarray(values, dtype=np.float64).ravel()
    if window is None:
        window = optimal_window_size(arr)
    ma = rolling_mean(arr, int(window))
    mean = np.nanmean(ma)
    std = np.nanstd(ma)  # ddof=0
    with np.errstate(invalid="ignore", divide="ignore"):
        z = (ma - mean) / std
        return np.abs(z) > z_threshold
