"""Classical seasonal decomposition, from scratch in numpy.

Reproduces the semantics of ``statsmodels.tsa.seasonal_decompose`` as used
by the reference at catch.py:628-647 (``decompose_and_detect``): centered
moving-average trend (period+1 window with half end-weights for even
periods), ``extrapolate_trend='freq'`` linear end-extrapolation, periodic
nan-mean seasonal demeaned (additive) or de-scaled (multiplicative), and
residual = detrended - seasonal (add) / detrended / seasonal (mul).

statsmodels itself is NOT available in this environment; this is a
reimplementation from the published algorithm (classical X-11-style
decomposition), validated by the ported reference test assertions.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..errors import TimeSeriesError

__all__ = ["DecomposeResult", "seasonal_decompose", "select_model_ssacf"]


@dataclass
class DecomposeResult:
    observed: np.ndarray
    trend: np.ndarray
    seasonal: np.ndarray
    resid: np.ndarray

    def table(self) -> dict[str, np.ndarray]:
        """Column layout matching diagnostics.py:376-385
        (['seasonal','trend','residuals','actual_values'])."""
        return {
            "seasonal": self.seasonal,
            "trend": self.trend,
            "residuals": self.resid,
            "actual_values": self.observed,
        }


def _centered_ma(x: np.ndarray, period: int) -> np.ndarray:
    """Centered moving average trend; even periods use a period+1 window
    with half weights at the ends (classical decomposition filter)."""
    n = x.size
    if period % 2 == 0:
        filt = np.full(period + 1, 1.0 / period)
        filt[0] = filt[-1] = 0.5 / period
    else:
        filt = np.full(period, 1.0 / period)
    k = filt.size
    trend = np.full(n, np.nan)
    if n >= k:
        conv = np.convolve(x, filt[::-1], mode="valid")
        lo = (k - 1) // 2
        trend[lo : lo + conv.size] = conv
    return trend


def _extrapolate_trend(trend: np.ndarray, npoints: int) -> np.ndarray:
    """Linear least-squares extrapolation of the trend ends over the
    ``npoints`` closest valid points (extrapolate_trend='freq')."""
    out = trend.copy()
    valid = np.flatnonzero(~np.isnan(out))
    if valid.size == 0:
        raise TimeSeriesError("trend is all-NaN; series shorter than two periods")
    front, back = valid[0], valid[-1]
    front_last = min(front + npoints, back + 1)
    back_first = max(front, back + 1 - npoints)
    if front > 0:
        xs = np.arange(front, front_last, dtype=np.float64)
        if xs.size >= 2:
            k, b = np.polyfit(xs, out[front:front_last], 1)
        else:
            k, b = 0.0, out[front]
        xf = np.arange(0, front, dtype=np.float64)
        out[:front] = k * xf + b
    if back < out.size - 1:
        xs = np.arange(back_first, back + 1, dtype=np.float64)
        if xs.size >= 2:
            k, b = np.polyfit(xs, out[back_first : back + 1], 1)
        else:
            k, b = 0.0, out[back]
        xf = np.arange(back + 1, out.size, dtype=np.float64)
        out[back + 1 :] = k * xf + b
    return out


def seasonal_decompose(
    x: np.ndarray,
    period: int,
    model: str = "additive",
    extrapolate_trend: int | str = "freq",
) -> DecomposeResult:
    arr = np.asarray(x, dtype=np.float64).ravel()
    n = arr.size
    if n < 2 * period:
        raise TimeSeriesError(
            f"series has {n} observations; need at least two full periods ({2 * period})"
        )
    mul = model.lower().startswith("m")
    if mul and np.nanmin(arr) <= 0:
        raise TimeSeriesError(
            "Multiplicative seasonality is not appropriate for zero and negative values"
        )
    trend = _centered_ma(arr, period)
    if extrapolate_trend == "freq":
        npoints = period
    else:
        npoints = int(extrapolate_trend or 0)
    if npoints > 0:
        trend = _extrapolate_trend(trend, npoints)

    detrended = arr / trend if mul else arr - trend
    period_averages = np.array(
        [np.nanmean(detrended[i::period]) for i in range(period)]
    )
    if mul:
        period_averages /= np.mean(period_averages)
    else:
        period_averages -= np.mean(period_averages)
    seasonal = np.tile(period_averages, n // period + 1)[:n]
    resid = detrended / seasonal if mul else detrended - seasonal
    return DecomposeResult(observed=arr, trend=trend, seasonal=seasonal, resid=resid)


def select_model_ssacf(resid_add: np.ndarray, resid_mul: np.ndarray) -> str:
    """Model selection by smaller sum-of-squared-ACF of the residuals
    (catch.py:662-670): strictly-less additive wins, ties go
    multiplicative (mirrors ``if ssacf_add < ssacf_mul``)."""
    from .stats import ssacf

    return "additive" if ssacf(resid_add) < ssacf(resid_mul) else "multiplicative"
