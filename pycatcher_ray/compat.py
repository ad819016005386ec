"""pycatcher-compatible API surface over pandas DataFrames.

Every public function of the reference (``/root/reference/src/pycatcher``,
re-exported in its ``__init__.py:26-130``) is provided here with the same
name, input contract (first column = date, last column = numeric feature),
dispatch rules, return contract (outlier rows, the exact
``"No outliers found."`` / ``"No Outliers Today!"`` strings, ``None``
paths) and error taxonomy — implemented on this package's from-scratch
numpy kernels, NOT by porting the reference's code (the reference runs on
statsmodels/scipy/sesd/pyod/sklearn, none of which exist here).

These single-series functions are also the per-group kernels the Ray
engine runs inside its detector actor pool (``pycatcher_ray.stages.
detect``): one pycatcher "DataFrame" == one ``(source)`` series of the
rolled-up ``(bucket_start, value)`` table.

Documented divergences from the reference (see SURVEY.md §2.1 quirks):

- pandas >= 2.2 renamed frequency aliases ('M'→'ME', 'Q'→'QE', 'A'→'YE',
  'H'→'h').  The reference pattern-matches the old literals, so monthly
  data silently falls through to IQR on modern pandas; we normalize
  aliases first so the documented dispatch table actually applies.
- irregular series (``inferred_freq is None``) raise ``TimeSeriesError``
  instead of crashing in ``regex.match(None)`` (catch.py:571).
- ``detect_outliers_classic`` accepts both 'MS' and 'M' months (the
  reference accepts only 'MS' there but both in the STL/MSTL paths).
- "today" checks take an injectable ``now`` parameter (defaulting to the
  wall clock like the reference) so distributed runs are deterministic.
"""

from __future__ import annotations

import re as _re
from typing import Union

import numpy as np
import pandas as pd

from .errors import DataValidationError, TimeSeriesError
from .functions.boxcox import boxcox, inv_boxcox
from .functions.decompose import DecomposeResult, seasonal_decompose
from .functions.esd import generalized_esd as _generalized_esd
from .functions.esd import seasonal_esd as _seasonal_esd
from .functions.moving_average import (
    optimal_window_size as _optimal_window_size,
    rmse_for_window as _rmse_for_window,
)
from .functions.shapiro import MonteCarloShapiro, shapiro as _shapiro
from .functions.stats import iqr_bounds, mad_mask, ssacf as _ssacf
from .functions.stl import STLResult, mstl as _mstl, stl as _stl

__all__ = [
    "check_and_convert_date",
    "find_outliers_iqr",
    "anomaly_zscore",
    "anomaly_mad",
    "get_residuals",
    "sum_of_squares",
    "get_ssacf",
    "detect_outliers_classic",
    "decompose_and_detect",
    "detect_outliers_iqr",
    "calculate_rmse",
    "calculate_optimal_window_size",
    "detect_outliers_moving_average",
    "detect_outliers_stl",
    "detect_outliers_stl_extended",
    "generate_outliers_stl",
    "check_normal_distribution_monte_carlo",
    "detect_outliers_mstl",
    "detect_outliers_mstl_extended",
    "generate_outliers_mstl",
    "detect_ts_frequency",
    "generate_outliers_generalized_esd",
    "generate_outliers_seasonal_esd",
    "detect_outliers_esd",
    "detect_outliers_today_classic",
    "detect_outliers_latest_classic",
    "detect_outliers_today_stl",
    "detect_outliers_latest_stl",
    "detect_outliers_today_mstl",
    "detect_outliers_latest_mstl",
    "detect_outliers_today_esd",
    "detect_outliers_latest_esd",
    "build_decomposition_results",
    "build_iqr_plot_data",
    "build_monthwise_plot_data",
    "create_app",
    "build_iqr_plot",
    "build_monthwise_plot",
    "build_outliers_plot_classic",
    "build_outliers_plot_stl",
    "build_outliers_plot_mstl",
    "build_outliers_plot_esd",
    "build_outliers_plot_moving_average",
    "build_seasonal_plot_classic",
    "generate_seasonal_plot_classic",
    "build_seasonal_plot_stl",
    "build_seasonal_plot_mstl",
    "plot_seasonal",
    "conduct_stationarity_check",
]

# Shared Monte-Carlo Shapiro gate with per-length null cache (the
# reference recomputes 10k resamples per call, catch.py:1184-1185 — the
# cache is this engine's main single-series speedup).
_MC_SHAPIRO = MonteCarloShapiro(n_resamples=10000, seed=42)

# The reference's week regex (catch.py:549): char class W-Z a-z.
_WEEK_RE = _re.compile(r"[W-Za-z]")

# statsmodels freq_to_period equivalents, used by seasonal_decompose in
# the classic path (catch.py:628-647 lets statsmodels infer the period
# from the DatetimeIndex frequency).
_FREQ_TO_PERIOD = {"A": 1, "Q": 4, "M": 12, "W": 52, "D": 7, "B": 5, "H": 24}

_ALIAS_MAP = {"ME": "M", "QE": "Q", "YE": "A", "Y": "A", "h": "H", "AS": "A",
              "YS": "A", "QS": "Q", "BM": "M", "BME": "M"}


def _normalized_freq(freq: str | None) -> str | None:
    """Collapse a pandas inferred_freq to the reference's literal tokens."""
    if freq is None:
        return None
    head = freq.split("-")[0]
    return _ALIAS_MAP.get(head, head)


def _to_pandas(df):
    """Container duck-typing, extending the reference's Spark support
    (catch.py:510-518 accepts anything with .toPandas()): also accepts a
    Ray Dataset (.to_pandas()) or a pyarrow Table, so single-series
    results of engine pipelines drop straight into the compat API."""
    if df is None or isinstance(df, pd.DataFrame):
        return df
    if hasattr(df, "toPandas"):
        return df.toPandas()
    if hasattr(df, "to_pandas"):
        return df.to_pandas()
    return df


def _validate_frame(df, require_columns: bool = True) -> pd.DataFrame:
    if df is None:
        raise DataValidationError("Input DataFrame cannot be None")
    df = _to_pandas(df)
    if not isinstance(df, pd.DataFrame):
        raise DataValidationError("Input must be a pandas DataFrame")
    if len(df.index) == 0:
        raise DataValidationError("Input DataFrame cannot have zero rows")
    if require_columns and len(df.columns) == 0:
        raise DataValidationError("DataFrame must contain at least one value column")
    return df


# --------------------------------------------------------------- ingest


def check_and_convert_date(df: pd.DataFrame) -> pd.DataFrame:
    """Parse column 0 to datetime, set as index, drop NaNs
    (catch.py:85-121)."""
    df = _validate_frame(df)
    try:
        if not isinstance(df.index, pd.DatetimeIndex):
            dates = pd.to_datetime(df.iloc[:, 0])
            df = df.set_index(dates).dropna()
        else:
            df = df.dropna()
    except DataValidationError:
        raise
    except Exception as exc:
        raise DataValidationError(
            f"Failed to convert first column to datetime format: {exc}"
        ) from exc
    return df


# ------------------------------------------------------------ base stats


def find_outliers_iqr(df: pd.DataFrame) -> pd.DataFrame:
    """Rows outside [Q1-1.5IQR, Q3+1.5IQR] of the last column
    (catch.py:124-165)."""
    if df is None or (isinstance(df, pd.DataFrame) and df.empty):
        raise DataValidationError("Input DataFrame cannot be None or empty")
    df = _to_pandas(df)
    try:
        values = pd.to_numeric(df.iloc[:, -1])
    except (ValueError, TypeError) as exc:
        raise DataValidationError("Last column must contain numeric values") from exc
    df = df.copy()
    df.iloc[:, -1] = values
    lo, hi = iqr_bounds(values.to_numpy(dtype=np.float64))
    mask = (values < lo) | (values > hi)
    return df[mask.to_numpy()]


def anomaly_zscore(residuals: Union[np.ndarray, pd.Series]):
    """z = (x - mean)/std with numpy-on-pandas semantics: NaN-skipping
    moments, population std (catch.py:168-193)."""
    if residuals is None or (
        isinstance(residuals, (np.ndarray, pd.Series)) and len(residuals) == 0
    ):
        raise DataValidationError("Input residuals cannot be None or empty")
    if isinstance(residuals, pd.Series):
        mean = residuals.mean()
        std = residuals.std(ddof=0)
    else:
        arr = np.asarray(residuals, dtype=np.float64)
        mean = np.mean(arr)
        std = np.std(arr)
    return (residuals - mean) / std


def anomaly_mad(residuals: Union[np.ndarray, pd.Series]) -> np.ndarray:
    """Boolean mask, modified z-score > 3.5 (pyod MAD semantics,
    catch.py:196-238)."""
    if residuals is None or (
        isinstance(residuals, (np.ndarray, pd.Series)) and len(residuals) == 0
    ):
        raise DataValidationError("Input residuals cannot be None or empty")
    arr = (
        residuals.to_numpy(dtype=np.float64)
        if isinstance(residuals, pd.Series)
        else np.asarray(residuals, dtype=np.float64)
    ).ravel()
    return mad_mask(arr)


def get_residuals(model) -> pd.Series:
    """Extract ``.resid`` and drop NaNs (catch.py:241-286)."""
    if model is None:
        raise DataValidationError("Input model cannot be None")
    resid = getattr(model, "resid", None)
    if resid is None:
        raise DataValidationError("Model does not contain residuals")
    series = pd.Series(np.asarray(resid, dtype=np.float64)).dropna()
    if series.empty:
        raise DataValidationError("No residuals found after NaN removal")
    return series


def sum_of_squares(array: np.ndarray) -> float:
    """Flatten + sum of squares (catch.py:289-330)."""
    from .functions.stats import sum_of_squares as _sos

    return _sos(array)


def get_ssacf(residuals, type: str = "") -> float:  # noqa: A002 (reference signature)
    """Sum of squared ACF of residuals (catch.py:333-376)."""
    if residuals is None or len(residuals) == 0:
        raise DataValidationError("Input residuals cannot be None or empty")
    return _ssacf(np.asarray(residuals, dtype=np.float64))


# ---------------------------------------------------------- classic path


def detect_outliers_iqr(df: pd.DataFrame) -> Union[pd.DataFrame, str]:
    """IQR wrapper: numeric coercion + empty → "No outliers found."
    (catch.py:694-742)."""
    if df is None:
        raise DataValidationError("Input DataFrame cannot be None")
    df_pandas = _validate_frame(df)
    try:
        df_pandas = df_pandas.copy()
        df_pandas.iloc[:, -1] = pd.to_numeric(df_pandas.iloc[:, -1])
    except (ValueError, TypeError) as exc:
        raise DataValidationError("Last column must contain numeric values") from exc
    outliers = find_outliers_iqr(df_pandas)
    if outliers.empty:
        return "No outliers found."
    return outliers


def decompose_and_detect(df_pandas: pd.DataFrame, period: int | None = None
                         ) -> Union[pd.DataFrame, str]:
    """Additive + multiplicative classical decomposition, Σacf² model
    selection, MAD flagging (catch.py:589-691)."""
    if df_pandas is None:
        raise DataValidationError("Input DataFrame cannot be None")
    if len(df_pandas.index) == 0:
        raise DataValidationError("Input DataFrame cannot have zero rows")
    values = df_pandas.iloc[:, -1]
    if not np.issubdtype(values.dtype, np.number):
        raise DataValidationError("Last column must contain numeric values")
    if period is None:
        freq = _normalized_freq(
            df_pandas.index.inferred_freq
            if isinstance(df_pandas.index, pd.DatetimeIndex)
            else None
        )
        period = _FREQ_TO_PERIOD.get(freq or "", None)
        if period is None:
            raise TimeSeriesError(
                "cannot infer decomposition period from index frequency"
            )
    arr = values.to_numpy(dtype=np.float64)
    try:
        decomposition_add = seasonal_decompose(arr, period=period, model="additive")
        decomposition_mul = seasonal_decompose(arr, period=period, model="multiplicative")
    except TimeSeriesError:
        raise
    except Exception as exc:
        raise TimeSeriesError(f"decomposition failed: {exc}") from exc
    residuals_add = get_residuals(decomposition_add)
    residuals_mul = get_residuals(decomposition_mul)
    ssacf_add = get_ssacf(residuals_add, type="Additive")
    ssacf_mul = get_ssacf(residuals_mul, type="Multiplicative")
    if ssacf_add < ssacf_mul:
        is_outlier = anomaly_mad(residuals_add)
    else:
        is_outlier = anomaly_mad(residuals_mul)
    df_outliers = df_pandas[is_outlier]
    if df_outliers.empty:
        return "No outliers found."
    return df_outliers


def detect_outliers_classic(df) -> Union[pd.DataFrame, str]:
    """Dispatcher (catch.py:488-586): date-index, uniqueness gate, route
    by inferred frequency/length to decomposition or IQR."""
    if df is None:
        raise DataValidationError("Input DataFrame cannot be None")
    df_pandas = _validate_frame(df)
    df_pandas = check_and_convert_date(df_pandas)
    if not df_pandas.index.is_unique:
        raise DataValidationError(
            "Duplicate date index values detected. Check your data."
        )
    freq = _normalized_freq(df_pandas.index.inferred_freq)
    n = len(df_pandas.index)
    route_decompose = (
        (freq == "D" and n >= 730)
        or (freq == "B" and n >= 520)
        or (freq in ("MS", "M") and n >= 24)
        or (freq == "Q" and n >= 8)
        or (freq is not None and _WEEK_RE.match(freq) and n >= 104)
    )
    if route_decompose:
        return decompose_and_detect(df_pandas)
    return detect_outliers_iqr(df_pandas)


# --------------------------------------------------------- moving average


def calculate_rmse(df: pd.DataFrame, window_size: int) -> float:
    """5-fold TimeSeriesSplit rolling-mean RMSE (catch.py:745-810)."""
    if df is None:
        raise DataValidationError("Input DataFrame cannot be None")
    if not isinstance(window_size, (int, np.integer)) or isinstance(window_size, bool):
        raise TypeError("Window size must be an integer")
    if window_size <= 0:
        raise ValueError("Window size must be greater than 0")
    df_pandas = _validate_frame(df)
    values = pd.to_numeric(df_pandas.iloc[:, -1]).to_numpy(dtype=np.float64)
    return _rmse_for_window(values, int(window_size))


def calculate_optimal_window_size(df: pd.DataFrame) -> int:
    """Grid search windows 2..20, argmin mean RMSE (catch.py:813-877)."""
    if df is None:
        raise DataValidationError("Input DataFrame cannot be None")
    df_pandas = _validate_frame(df)
    values = pd.to_numeric(df_pandas.iloc[:, -1]).to_numpy(dtype=np.float64)
    return _optimal_window_size(values)


def detect_outliers_moving_average(df: pd.DataFrame):
    """Optimal-window rolling mean, z-score of the MA, |z| > 2
    (catch.py:880-947).  Returns first two columns of the flagged rows
    (reset index) or None when nothing is flagged."""
    if df is None:
        raise DataValidationError("Input DataFrame cannot be None")
    df_pandas = _validate_frame(df)
    window = calculate_optimal_window_size(df_pandas)
    try:
        values = pd.to_numeric(df_pandas.iloc[:, -1])
    except (ValueError, TypeError) as exc:
        raise DataValidationError(
            "Last column must be convertible to numeric values"
        ) from exc
    ma = values.rolling(window=int(window)).mean()
    z_scores = anomaly_zscore(ma)
    outliers = df_pandas[np.abs(z_scores) > 2]
    if outliers.empty:
        return None
    return_outliers = outliers.iloc[:, :2].reset_index(drop=True)
    return return_outliers


# ------------------------------------------------------------------ STL


def _stl_dispatch_period(freq: str | None, n: int) -> int | None:
    """detect_outliers_stl period table (catch.py:1012-1048)."""
    if freq == "H" and n >= 17520:
        return 24
    if freq == "D" and n >= 730:
        return 365
    if freq == "B" and n >= 520:
        return 365
    if freq in ("MS", "M") and n >= 24:
        return 12
    if freq == "Q" and n >= 8:
        return 4
    if freq == "A" and n >= 2:
        return 1
    if freq is not None and _WEEK_RE.match(freq) and n >= 104:
        return 52
    return None


def check_normal_distribution_monte_carlo(data) -> tuple[float, float]:
    """Shapiro-Wilk Monte-Carlo normality gate (catch.py:1168-1187)."""
    return _MC_SHAPIRO.test(np.asarray(data, dtype=np.float64))


def generate_outliers_stl(df, type, seasonal, period) -> pd.DataFrame:  # noqa: A002
    """STL fit (Box-Cox for multiplicative), Shapiro-MC gate, z-score or
    MAD flagging (catch.py:1099-1165)."""
    values = df.iloc[:, -1].to_numpy(dtype=np.float64)
    if type == "additive":
        result = _stl(values, period=period, seasonal=seasonal)
        residuals = pd.Series(result.resid)
    else:
        transformed, lmbda = boxcox(values)
        result = _stl(transformed, period=period, seasonal=seasonal)
        residuals = pd.Series(inv_boxcox(result.resid, lmbda))
    residuals_clean = residuals.to_numpy()
    residuals_clean = residuals_clean[~np.isnan(residuals_clean)]
    _stat, p_value = check_normal_distribution_monte_carlo(residuals_clean)
    alpha = 0.05
    if p_value > alpha:
        z_scores = anomaly_zscore(residuals)
        outliers = df[np.abs(z_scores.to_numpy()) > 2]
    else:
        is_outlier = anomaly_mad(residuals)
        outliers = df[is_outlier]
    return outliers


def detect_outliers_stl_extended(df, detected_period) -> Union[pd.DataFrame, str]:
    """Box-Cox multiplicative vs additive STL, lower residual variance
    wins (catch.py:1057-1096)."""
    derived_seasonal = detected_period + ((detected_period % 2) == 0)  # force odd
    values = df.iloc[:, -1].to_numpy(dtype=np.float64)
    transformed, _lmbda = boxcox(values)
    result_mul = _stl(transformed, period=detected_period, seasonal=derived_seasonal)
    result_add = _stl(values, period=detected_period, seasonal=derived_seasonal)
    if np.var(result_mul.resid) > np.var(result_add.resid):
        model_type = "multiplicative"
    else:
        model_type = "additive"
    df_outliers = generate_outliers_stl(df, model_type, derived_seasonal, detected_period)
    return_outliers = df_outliers.iloc[:, :2].reset_index(drop=True)
    return return_outliers


def detect_outliers_stl(df) -> Union[pd.DataFrame, str]:
    """STL dispatcher (catch.py:950-1054)."""
    if df is None:
        raise DataValidationError("Input DataFrame cannot be None")
    df_pandas = _validate_frame(df)
    df_stl = df_pandas.copy()
    try:
        if not isinstance(df_stl.index, pd.DatetimeIndex):
            df_stl = df_stl.set_index(pd.to_datetime(df_stl.iloc[:, 0])).dropna()
    except Exception as exc:
        raise DataValidationError(
            "Failed to convert first column to datetime format"
        ) from exc
    if not df_stl.index.is_unique:
        raise DataValidationError(
            "Duplicate date index values detected. Check your data."
        )
    freq = _normalized_freq(df_stl.index.inferred_freq)
    n = len(df_stl.index)
    period = _stl_dispatch_period(freq, n)
    if period is None:
        return detect_outliers_iqr(df_pandas)
    # numeric gate before fitting (reference surfaces an error from STL)
    if not np.issubdtype(df_stl.iloc[:, -1].dtype, np.number):
        try:
            df_stl.iloc[:, -1] = pd.to_numeric(df_stl.iloc[:, -1])
        except (ValueError, TypeError) as exc:
            raise DataValidationError(
                "Last column must contain numeric values"
            ) from exc
    return detect_outliers_stl_extended(df_stl, period)


# ----------------------------------------------------------------- MSTL


def _mstl_dispatch_periods(freq: str | None, n: int):
    """detect_outliers_mstl period table (catch.py:1231-1277)."""
    if freq == "H" and n >= 17520:
        return (24, 168)
    if freq == "D" and n >= 730:
        return (7, 365)
    if freq == "B" and n >= 520:
        return (5, 365)
    if freq in ("MS", "M") and n >= 24:
        return 12
    if freq == "Q" and n >= 8:
        return (4, 12)
    if freq == "A" and n >= 2:
        return 1
    if freq is not None and _WEEK_RE.match(freq) and n >= 104:
        return 52
    return None


def generate_outliers_mstl(df, type, period) -> pd.DataFrame:  # noqa: A002
    """MSTL fit, Shapiro-MC gate, z-score or MAD (catch.py:1322-1388)."""
    values = df.iloc[:, -1].to_numpy(dtype=np.float64)
    if type == "additive":
        result = _mstl(values, periods=period)
        residuals = pd.Series(result.resid)
    else:
        transformed, lmbda = boxcox(values)
        result = _mstl(transformed, periods=period)
        residuals = pd.Series(inv_boxcox(result.resid, lmbda))
    residuals_clean = residuals.to_numpy()
    residuals_clean = residuals_clean[~np.isnan(residuals_clean)]
    _stat, p_value = check_normal_distribution_monte_carlo(residuals_clean)
    if p_value > 0.05:
        z_scores = anomaly_zscore(residuals)
        outliers = df[np.abs(z_scores.to_numpy()) > 2]
    else:
        is_outlier = anomaly_mad(residuals)
        outliers = df[is_outlier]
    return outliers


def detect_outliers_mstl_extended(df, derived_period) -> Union[pd.DataFrame, str]:
    """Box-Cox mul vs add MSTL, lower residual variance wins
    (catch.py:1283-1319)."""
    values = df.iloc[:, -1].to_numpy(dtype=np.float64)
    transformed, _lmbda = boxcox(values)
    result_mul = _mstl(transformed, periods=derived_period)
    result_add = _mstl(values, periods=derived_period)
    if np.var(result_mul.resid) > np.var(result_add.resid):
        model_type = "multiplicative"
    else:
        model_type = "additive"
    df_outliers = generate_outliers_mstl(df, model_type, derived_period)
    return_outliers = df_outliers.iloc[:, :2].reset_index(drop=True)
    return return_outliers


def detect_outliers_mstl(df) -> Union[pd.DataFrame, str]:
    """MSTL dispatcher (catch.py:1190-1280)."""
    if df is None:
        raise DataValidationError("Input DataFrame cannot be None")
    df_pandas = _validate_frame(df)
    df_mstl = df_pandas.copy()
    try:
        if not isinstance(df_mstl.index, pd.DatetimeIndex):
            df_mstl = df_mstl.set_index(pd.to_datetime(df_mstl.iloc[:, 0])).dropna()
    except Exception as exc:
        raise DataValidationError(
            "Failed to convert first column to datetime format"
        ) from exc
    if not df_mstl.index.is_unique:
        raise DataValidationError(
            "Duplicate date index values detected. Check your data."
        )
    freq = _normalized_freq(df_mstl.index.inferred_freq)
    n = len(df_mstl.index)
    periods = _mstl_dispatch_periods(freq, n)
    if periods is None:
        return detect_outliers_iqr(df_pandas)
    return detect_outliers_mstl_extended(df_mstl, periods)


# ------------------------------------------------------------------ ESD


def detect_ts_frequency(df) -> int | None:
    """Frequency→period detection (catch.py:1508-1591)."""
    df_pandas = _validate_frame(df)
    df_ts = df_pandas.copy()
    if not isinstance(df_ts.index, pd.DatetimeIndex):
        df_ts = df_ts.set_index(pd.to_datetime(df_ts.iloc[:, 0])).dropna()
    if not df_ts.index.is_unique:
        return None
    freq = _normalized_freq(df_ts.index.inferred_freq)
    n = len(df_ts.index)
    return _stl_dispatch_period(freq, n)


def generate_outliers_generalized_esd(df, hybrid) -> Union[pd.DataFrame, None]:
    """NIST Generalized ESD over the last column (catch.py:1594-1635)."""
    n = len(df)
    max_outliers = n // 20
    series = np.asarray(df.iloc[:, -1], dtype=np.float64)
    outliers_indices = _generalized_esd(
        series, max_anomalies=max_outliers, alpha=0.05, hybrid=hybrid
    )
    if len(outliers_indices) == 0:
        return None
    mask = np.zeros(n, dtype=bool)
    mask[np.asarray(outliers_indices, dtype=np.int64)] = True
    return df[mask]


def generate_outliers_seasonal_esd(df, hybrid) -> Union[pd.DataFrame, None]:
    """S-ESD / S-H-ESD (catch.py:1638-1689)."""
    n = len(df)
    max_outliers = n // 20
    detected_period = detect_ts_frequency(df)
    series = np.asarray(df.iloc[:, -1], dtype=np.float64)
    outliers_indices = _seasonal_esd(
        series,
        periodicity=detected_period,
        max_anomalies=max_outliers,
        alpha=0.05,
        hybrid=hybrid,
    )
    if len(outliers_indices) == 0:
        return None
    mask = np.zeros(n, dtype=bool)
    mask[np.asarray(outliers_indices, dtype=np.int64)] = True
    return df[mask]


def detect_outliers_esd(df) -> Union[pd.DataFrame, None]:
    """Shapiro-gated Generalized vs Seasonal ESD (catch.py:1692-1752)."""
    df_pandas = _to_pandas(df)
    _stat, p = _shapiro(np.asarray(df_pandas.iloc[:, -1], dtype=np.float64))
    alpha = 0.05
    if p > alpha:
        return_outliers = generate_outliers_generalized_esd(df_pandas, hybrid=False)
    else:
        return_outliers = generate_outliers_seasonal_esd(df_pandas, hybrid=True)
    if return_outliers is None:
        return None
    df_outliers = return_outliers.iloc[:, :2].reset_index(drop=True)
    return df_outliers


# ------------------------------------------------------- today / latest


def _today_wrapper(df, detect_fn, now=None):
    if df is None:
        raise DataValidationError("Input DataFrame cannot be None")
    df = _validate_frame(df)
    df_outliers = detect_fn(df)
    if df_outliers is None or isinstance(df_outliers, str) or df_outliers.empty:
        return "No Outliers Today!"
    df_last_outlier = df_outliers.tail(1)
    idx = pd.to_datetime(df_last_outlier.iloc[:, 0] if not isinstance(
        df_last_outlier.index, pd.DatetimeIndex) else df_last_outlier.index)
    last_outlier_date = pd.Timestamp(np.asarray(idx)[-1]).strftime("%Y-%m-%d")
    current_date = (pd.Timestamp.now() if now is None else pd.Timestamp(now)).strftime(
        "%Y-%m-%d"
    )
    if last_outlier_date == current_date:
        return df_last_outlier
    return "No Outliers Today!"


def _latest_wrapper(df, detect_fn):
    if df is None:
        raise DataValidationError("Input DataFrame cannot be None")
    df = _validate_frame(df)
    df_outliers = detect_fn(df)
    if df_outliers is None or isinstance(df_outliers, str) or df_outliers.empty:
        return pd.DataFrame()
    return df_outliers.tail(1)


def detect_outliers_today_classic(df, now=None):
    return _today_wrapper(df, detect_outliers_classic, now)


def detect_outliers_latest_classic(df):
    return _latest_wrapper(df, detect_outliers_classic)


def detect_outliers_today_stl(df, now=None):
    return _today_wrapper(df, detect_outliers_stl, now)


def detect_outliers_latest_stl(df):
    return _latest_wrapper(df, detect_outliers_stl)


def detect_outliers_today_mstl(df, now=None):
    return _today_wrapper(df, detect_outliers_mstl, now)


def detect_outliers_latest_mstl(df):
    return _latest_wrapper(df, detect_outliers_mstl)


def detect_outliers_today_esd(df, now=None):
    return _today_wrapper(df, detect_outliers_esd, now)


def detect_outliers_latest_esd(df):
    return _latest_wrapper(df, detect_outliers_esd)


# ---------------------------------------------------------- diagnostics


def conduct_stationarity_check(series) -> dict:
    """ADF + KPSS stationarity check (diagnostics.py:262-319).

    The reference prints verdicts and returns None; the engine returns
    the typed verdict dict (stats, p-values, booleans) — same decisions
    at the 5% level, usable output.
    """
    import numpy as np

    from .functions.stationarity import stationarity_verdict

    if series is None:
        raise DataValidationError("Input series cannot be None")
    if isinstance(series, pd.DataFrame):
        series = series.iloc[:, -1]
    arr = np.asarray(pd.to_numeric(pd.Series(series)), dtype=float)
    if arr.size == 0:
        raise DataValidationError("Input series cannot be empty")
    return stationarity_verdict(arr)


def build_decomposition_results(df) -> pd.DataFrame:
    """Decomposition table ['seasonal','trend','residuals',
    'actual_values'] from the Σacf²-selected classical model
    (diagnostics.py:322-388).  Requires >= 2 years of daily data."""
    df_pandas = _validate_frame(df)
    df_pandas = check_and_convert_date(df_pandas)
    if len(df_pandas) / 365.25 < 2.0:
        raise DataValidationError(
            "Time-series data must contain at least 2 years of data"
        )
    freq = _normalized_freq(df_pandas.index.inferred_freq)
    period = _FREQ_TO_PERIOD.get(freq or "D", 7)
    arr = df_pandas.iloc[:, -1].to_numpy(dtype=np.float64)
    res_add = seasonal_decompose(arr, period=period, model="additive")
    res_mul = seasonal_decompose(arr, period=period, model="multiplicative")
    if _ssacf(res_add.resid) < _ssacf(res_mul.resid):
        chosen: DecomposeResult = res_add
    else:
        chosen = res_mul
    return pd.DataFrame(
        {
            "seasonal": chosen.seasonal,
            "trend": chosen.trend,
            "residuals": chosen.resid,
            "actual_values": chosen.observed,
        },
        index=df_pandas.index,
    )


def _box_stats(values: np.ndarray) -> dict:
    """Matplotlib/seaborn boxplot statistics (the DATA of sns.boxplot):
    quartiles, 1.5·IQR whiskers clamped to the most extreme points
    inside the fences, mean (showmeans=True), and the fliers count."""
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    if v.size == 0:
        raise DataValidationError("Input DataFrame cannot have zero rows")
    from .functions.stats import quantile_cont

    q1, med, q3 = quantile_cont(v, [0.25, 0.5, 0.75])
    iqr = q3 - q1
    lo_fence, hi_fence = q1 - 1.5 * iqr, q3 + 1.5 * iqr
    inside = v[(v >= lo_fence) & (v <= hi_fence)]
    return {
        "q1": float(q1),
        "median": float(med),
        "q3": float(q3),
        "lo_whisker": float(inside.min()),
        "hi_whisker": float(inside.max()),
        "mean_value": float(v.mean()),
        "n": int(v.size),
        "n_outliers": int(((v < lo_fence) | (v > hi_fence)).sum()),
    }


def build_iqr_plot_data(df) -> pd.DataFrame:
    """The data behind diagnostics.build_iqr_plot (diagnostics.py:196-234,
    a seaborn boxplot of the value column with showmeans=True) as a
    one-row DataFrame — the headless plot product (plot RENDERING is the
    declared out-of-scope surface; the numbers it draws are not)."""
    df_pandas = _validate_frame(df)
    values = pd.to_numeric(df_pandas.iloc[:, -1]).to_numpy()
    return pd.DataFrame([_box_stats(values)])


def build_monthwise_plot_data(df) -> pd.DataFrame:
    """The data behind diagnostics.build_monthwise_plot
    (diagnostics.py:237-260, per-Month-Year boxplots): one boxplot-stat
    row per calendar month, index = Period('M') like the reference's
    'Month-Year' axis."""
    df_pandas = _validate_frame(df)
    months = pd.to_datetime(df_pandas.iloc[:, 0]).dt.to_period("M")
    values = pd.to_numeric(df_pandas.iloc[:, -1])
    rows = {m: _box_stats(g.to_numpy())
            for m, g in values.groupby(months)}
    out = pd.DataFrame.from_dict(rows, orient="index")
    out.index.name = "Month-Year"
    return out.sort_index()


def create_app():
    """Reference export parity (webapp.py create_app): the engine's
    stdlib WSGI app with the upload + JSON-endpoint surface."""
    from .serving import create_app as _create_app

    return _create_app()


# ------------------------------------------------ plot-surface parity
# The reference's build_*_plot functions return matplotlib figures;
# matplotlib is a rendering concern this engine does not ship, so each
# function returns the DATA the figure would draw (documented divergence
# — same detector/decomposition math, no raster output).


def _outliers_overlay(df, detect_fn) -> pd.DataFrame:
    """Series + outlier mask — the data of the reference's outlier
    overlay plots (diagnostics.py:391-1113 family)."""
    df_pandas = _validate_frame(df)
    dated = check_and_convert_date(df_pandas)
    out = detect_fn(df)
    flagged = set()
    if isinstance(out, pd.DataFrame) and len(out):
        first = out.columns[0]
        flagged = set(pd.to_datetime(out[first]) if not isinstance(
            out.index, pd.DatetimeIndex) else out.index)
        if not flagged:
            flagged = set(pd.to_datetime(out.iloc[:, 0]))
    res = pd.DataFrame(
        {"value": dated.iloc[:, -1].to_numpy()}, index=dated.index
    )
    res["is_outlier"] = [ts in flagged for ts in res.index]
    return res


def build_iqr_plot(df) -> pd.DataFrame:
    """Data of diagnostics.build_iqr_plot (boxplot stats)."""
    return build_iqr_plot_data(df)


def build_monthwise_plot(df) -> pd.DataFrame:
    """Data of diagnostics.build_monthwise_plot (per-month box stats)."""
    return build_monthwise_plot_data(df)


def build_outliers_plot_classic(df) -> pd.DataFrame:
    """Data of diagnostics.build_outliers_plot_classic:449."""
    return _outliers_overlay(df, detect_outliers_classic)


def build_outliers_plot_stl(df) -> pd.DataFrame:
    """Data of diagnostics.build_outliers_plot_stl:515."""
    return _outliers_overlay(df, detect_outliers_stl)


def build_outliers_plot_mstl(df) -> pd.DataFrame:
    """Data of diagnostics.build_outliers_plot_mstl:769."""
    return _outliers_overlay(df, detect_outliers_mstl)


def build_outliers_plot_esd(df) -> pd.DataFrame:
    """Data of diagnostics.build_outliers_plot_esd:1039."""
    return _outliers_overlay(df, detect_outliers_esd)


def build_outliers_plot_moving_average(df) -> pd.DataFrame:
    """Data of diagnostics.build_outliers_plot_moving_average:391."""
    return _outliers_overlay(df, detect_outliers_moving_average)


def build_seasonal_plot_classic(df) -> pd.DataFrame:
    """Data of diagnostics.build_seasonal_plot_classic:58 — the chosen
    classical decomposition's components."""
    return build_decomposition_results(df)


def generate_seasonal_plot_classic(df, detected_period) -> pd.DataFrame:
    """Data of diagnostics.generate_seasonal_plot_classic:147 (explicit
    period)."""
    df_pandas = _validate_frame(df)
    dated = check_and_convert_date(df_pandas)
    arr = dated.iloc[:, -1].to_numpy(dtype=np.float64)
    res = seasonal_decompose(arr, period=int(detected_period),
                             model="additive")
    return pd.DataFrame(
        {
            "seasonal": res.seasonal,
            "trend": res.trend,
            "residuals": res.resid,
            "actual_values": res.observed,
        },
        index=dated.index,
    )


def _stl_components(df, fit) -> pd.DataFrame:
    df_pandas = _validate_frame(df)
    dated = check_and_convert_date(df_pandas)
    arr = dated.iloc[:, -1].to_numpy(dtype=np.float64)
    res = fit(arr, len(dated))
    seasonal = res.seasonal
    if isinstance(seasonal, dict):  # MSTL: sum the per-period components
        seasonal = res.seasonal_sum
    elif getattr(seasonal, "ndim", 1) > 1:
        seasonal = np.asarray(seasonal).sum(axis=0)
    return pd.DataFrame(
        {
            "seasonal": seasonal,
            "trend": res.trend,
            "residuals": res.resid,
            "actual_values": res.observed,
        },
        index=dated.index,
    )


def build_seasonal_plot_stl(df) -> pd.DataFrame:
    """Data of diagnostics.build_seasonal_plot_stl:647."""
    def fit(arr, n):
        freq = _normalized_freq(
            check_and_convert_date(_validate_frame(df)).index.inferred_freq
        )
        period = _FREQ_TO_PERIOD.get(freq or "D", 7)
        seasonal = period + (period % 2 == 0)
        return _stl(arr, period=period, seasonal=seasonal)

    return _stl_components(df, fit)


def build_seasonal_plot_mstl(df) -> pd.DataFrame:
    """Data of diagnostics.build_seasonal_plot_mstl:908."""
    def fit(arr, n):
        freq = _normalized_freq(
            check_and_convert_date(_validate_frame(df)).index.inferred_freq
        )
        periods = _mstl_dispatch_periods(freq, n) or (7,)
        usable = tuple(p for p in periods if n >= 2 * p) or (periods[0],)
        return _mstl(arr, periods=usable)

    return _stl_components(df, fit)


def plot_seasonal(res, axes, title):
    """Pure matplotlib renderer in the reference (diagnostics.py:31-55);
    this engine produces plot DATA, not rasters."""
    raise NotImplementedError(
        "plot_seasonal renders matplotlib axes; use the build_*_plot "
        "functions' returned DataFrames with your own plotting stack"
    )


def _choose_stl_model(values: np.ndarray, detected_period: int):
    """Reference model selection (diagnostics.py:597-640): Box-Cox
    multiplicative vs additive STL, HIGHER transformed-scale residual
    variance selects multiplicative (the catch.py:1084 quirk
    direction, mirrored from detect_outliers_stl_extended)."""
    derived_seasonal = detected_period + ((detected_period % 2) == 0)
    transformed, lmbda = boxcox(values)
    result_mul = _stl(transformed, period=detected_period,
                      seasonal=derived_seasonal)
    result_add = _stl(values, period=detected_period,
                      seasonal=derived_seasonal)
    if np.var(result_mul.resid) > np.var(result_add.resid):
        return "multiplicative", derived_seasonal, result_mul
    return "additive", derived_seasonal, result_add


def generate_outlier_plot_stl(df, detected_period) -> pd.DataFrame:
    """Data of diagnostics.generate_outlier_plot_stl:597 (explicit
    period): model-select, flag via the STL rule, return the outlier
    rows the reference scatters (plot DATA, not a raster)."""
    df_pandas = _validate_frame(df)
    dated = check_and_convert_date(df_pandas)
    values = dated.iloc[:, -1].to_numpy(dtype=np.float64)
    model_type, derived_seasonal, _res = _choose_stl_model(
        values, int(detected_period))
    return generate_outliers_stl(dated, model_type, derived_seasonal,
                                 int(detected_period))


def generate_outlier_plot_mstl(df, derived_period) -> pd.DataFrame:
    """Data of diagnostics.generate_outlier_plot_mstl:861 (explicit
    period(s)): MSTL model-select then the MSTL flag rule."""
    df_pandas = _validate_frame(df)
    dated = check_and_convert_date(df_pandas)
    values = dated.iloc[:, -1].to_numpy(dtype=np.float64)
    transformed, _lmbda = boxcox(values)
    result_mul = _mstl(transformed, periods=derived_period)
    result_add = _mstl(values, periods=derived_period)
    model_type = ("multiplicative"
                  if np.var(result_mul.resid) > np.var(result_add.resid)
                  else "additive")
    return generate_outliers_mstl(dated, model_type, derived_period)


def _components_frame(res, index) -> pd.DataFrame:
    seasonal = res.seasonal
    if isinstance(seasonal, dict):  # MSTL: sum the per-period components
        seasonal = res.seasonal_sum
    return pd.DataFrame(
        {
            "seasonal": seasonal,
            "trend": res.trend,
            "residuals": res.resid,
            "actual_values": res.observed,
        },
        index=index,
    )


def generate_seasonal_plot_stl(df, detected_period) -> pd.DataFrame:
    """Data of diagnostics.generate_seasonal_plot_stl:729 (explicit
    period): the CHOSEN model's decomposition components.  Reference
    quirk mirrored: when the multiplicative model wins, the reference
    plots the TRANSFORMED-scale decomposition — so does this table."""
    df_pandas = _validate_frame(df)
    dated = check_and_convert_date(df_pandas)
    values = dated.iloc[:, -1].to_numpy(dtype=np.float64)
    _model, _seasonal, res = _choose_stl_model(values, int(detected_period))
    return _components_frame(res, dated.index)


def generate_seasonal_plot_mstl(df, derived_period) -> pd.DataFrame:
    """Data of diagnostics.generate_seasonal_plot_mstl:1001 (explicit
    period(s)); same transformed-scale quirk as the STL twin."""
    df_pandas = _validate_frame(df)
    dated = check_and_convert_date(df_pandas)
    values = dated.iloc[:, -1].to_numpy(dtype=np.float64)
    transformed, _lmbda = boxcox(values)
    result_mul = _mstl(transformed, periods=derived_period)
    result_add = _mstl(values, periods=derived_period)
    res = (result_mul
           if np.var(result_mul.resid) > np.var(result_add.resid)
           else result_add)
    return _components_frame(res, dated.index)


def setup_logger():
    """Reference logger config (catch.py:21-46): stream handler with
    the funcName:lineno format, level from PYCATCHER_LOG_LEVEL
    (default WARNING), handler suppressed at CRITICAL."""
    import logging
    import os

    log = logging.getLogger("pycatcher_ray")
    if log.handlers:
        log.handlers.clear()
    formatter = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - "
        "%(funcName)s:%(lineno)d - %(message)s")
    handler = logging.StreamHandler()
    handler.setFormatter(formatter)
    log_level = os.environ.get("PYCATCHER_LOG_LEVEL", "WARNING").upper()
    log.setLevel(getattr(logging, log_level, logging.WARNING))
    if log_level != "CRITICAL":
        log.addHandler(handler)
    return log
