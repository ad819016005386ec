"""STL / MSTL (Seasonal-Trend decomposition by LOESS), from scratch.

Implements the Cleveland et al. (1990) STL procedure in numpy — the
algorithm behind ``statsmodels.tsa.STL`` used by the reference at
catch.py:1076-1081 / 1117-1142 (STL) and catch.py:1300-1314 / 1340-1385
(MSTL).  statsmodels is not available in this environment; conformance is
at the assertion level of the ported reference tests (planted outliers
flagged, add-vs-mul selection direction), per SURVEY.md §5.

Defaults mirror the original R ``stl``: seasonal LOESS degree 0
(``s.degree=0`` — a degree-1 seasonal fit on the reference's 2-point
cycle-subseries, e.g. 730 daily points at period 365, interpolates
exactly and absorbs planted spikes into the seasonal, defeating
detection), trend/low-pass degree 1, trend window = smallest odd >=
1.5*period/(1 - 1.5/seasonal), low-pass window = smallest odd > period,
2 inner iterations, 0 robustness iterations (robust=False), and MSTL
seasonal windows 7 + 4*(1..K) with 2 outer iterations (1 when a single
period).

Performance: for the non-robust case every interior LOESS fit on a
uniform grid with a symmetric window reduces to a fixed-kernel weighted
moving average (the degree-1 slope term cancels by symmetry), so the hot
smooths are a single ``np.convolve`` plus explicit boundary fits —
O(n·q) work only at the q edge points.  This is what makes per-series
STL cheap enough to run in a Ray actor pool over millions of series.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..errors import TimeSeriesError

__all__ = ["STLResult", "stl", "mstl", "MSTLResult"]


@dataclass
class STLResult:
    observed: np.ndarray
    trend: np.ndarray
    seasonal: np.ndarray
    resid: np.ndarray


@dataclass
class MSTLResult:
    observed: np.ndarray
    trend: np.ndarray
    seasonal: dict[int, np.ndarray]  # period -> seasonal component
    resid: np.ndarray

    @property
    def seasonal_sum(self) -> np.ndarray:
        out = np.zeros_like(self.observed)
        for s in self.seasonal.values():
            out += s
        return out


def _next_odd(x: float) -> int:
    v = int(np.ceil(x))
    return v if v % 2 == 1 else v + 1


def _tricube(u: np.ndarray) -> np.ndarray:
    w = np.clip(1.0 - np.abs(u) ** 3, 0.0, None) ** 3
    return w


def _wls_fit_at(xw: np.ndarray, yw: np.ndarray, w: np.ndarray, x0: float,
                degree: int) -> float:
    """Weighted least-squares polynomial fit evaluated at x0."""
    sw = w.sum()
    if sw <= 0:
        return float(np.mean(yw))
    if degree == 0:
        return float(np.dot(w, yw) / sw)
    xc = xw - x0
    swx = np.dot(w, xc)
    swx2 = np.dot(w, xc * xc)
    swy = np.dot(w, yw)
    swxy = np.dot(w, xc * yw)
    det = sw * swx2 - swx * swx
    if abs(det) < 1e-12 * max(sw * swx2, 1e-300):
        return float(swy / sw)
    # intercept at x0 of the local line
    return float((swx2 * swy - swx * swxy) / det)


def _loess_point(y: np.ndarray, i: float, q: int, degree: int,
                 rho: np.ndarray | None) -> float:
    """LOESS fit at (possibly exterior) position ``i`` on the uniform grid
    0..n-1 using the q nearest observations."""
    n = y.size
    qq = min(q, n)
    # nearest qq points to i on an integer grid: a contiguous window
    left = int(np.clip(np.round(i) - (qq - 1) // 2, 0, n - qq))
    # slide window so it truly contains the qq nearest points
    while left > 0 and (i - (left - 1)) < ((left + qq - 1) - i):
        left -= 1
    while left + qq < n and ((left + qq) - i) < (i - left):
        left += 1
    idx = np.arange(left, left + qq)
    dist = np.abs(idx - i)
    lam = dist.max()
    if q > n:
        lam *= q / n
    if lam <= 0:
        lam = 1.0
    w = _tricube(dist / lam)
    if rho is not None:
        w = w * rho[idx]
    return _wls_fit_at(idx.astype(np.float64), y[idx], w, float(i), degree)


_EDGE_COEF_CACHE: dict[tuple[int, int, int, int, str], np.ndarray] = {}


def _edge_coefs(n: int, q: int, degree: int, ext: int,
                side: str) -> np.ndarray:
    """Fit-coefficient rows for the boundary positions of a length-n
    uniform-grid LOESS (rho=None): near an edge the qq nearest points are
    the fixed prefix/suffix window, so each position's weighted-LS fit is
    a dot product with a position-dependent coefficient row.  All rows
    for one (n, q, degree, ext, side) are built in one broadcasted shot
    and cached — detection runs thousands of same-length series, so the
    boundary fits amortize to two small matvecs per smooth instead of
    ~2h Python-level ``_loess_point`` calls."""
    key = (n, q, degree, ext, side)
    W = _EDGE_COEF_CACHE.get(key)
    if W is not None:
        return W
    qq = min(q, n)
    h = (q - 1) // 2
    if side == "left":
        pos = np.arange(-ext, min(h, n), dtype=np.float64)
        xs = np.arange(qq, dtype=np.float64)
    elif side == "right":
        pos = np.arange(n - h, n + ext, dtype=np.float64)
        xs = np.arange(n - qq, n, dtype=np.float64)
    else:  # "full": q >= n, every position fits over the whole series
        pos = np.arange(-ext, n + ext, dtype=np.float64)
        xs = np.arange(n, dtype=np.float64)
    dist = np.abs(xs[None, :] - pos[:, None])
    lam = dist.max(axis=1) if qq else np.zeros(pos.size)
    if q > n:
        lam = lam * (q / n)
    lam = np.where(lam <= 0, 1.0, lam)
    w = _tricube(dist / lam[:, None])
    sw = w.sum(axis=1)
    if degree == 0:
        W = w / sw[:, None]
    else:
        xc = xs[None, :] - pos[:, None]
        swx = (w * xc).sum(axis=1)
        swx2 = (w * xc * xc).sum(axis=1)
        det = sw * swx2 - swx * swx
        bad = np.abs(det) < 1e-12 * np.maximum(sw * swx2, 1e-300)
        with np.errstate(divide="ignore", invalid="ignore"):
            W = w * (swx2[:, None] - swx[:, None] * xc) / det[:, None]
        if bad.any():
            W[bad] = w[bad] / sw[bad, None]
    W = np.ascontiguousarray(W)
    _EDGE_COEF_CACHE[key] = W
    return W


def loess_smooth(y: np.ndarray, q: int, degree: int = 1,
                 rho: np.ndarray | None = None,
                 ext: int = 0, jump: int = 1) -> np.ndarray:
    """LOESS-smooth a uniformly spaced series at every position, plus
    ``ext`` extrapolated positions before and after (for STL's
    cycle-subseries extension).  Returns length n + 2*ext.

    Fast paths: (a) without robustness weights the symmetric tricube
    degree-1 fit equals a fixed-kernel average → one convolution for all
    interior points; (b) ``jump`` > 1 evaluates every jump-th position
    and linearly interpolates between them — R ``stl``'s
    s.jump/t.jump/l.jump mechanism (default ceil(window/10) there),
    which bounds the Python-level boundary fits for huge windows.
    """
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if q % 2 == 0:
        q += 1
    out = np.empty(n + 2 * ext)
    h = (q - 1) // 2

    if jump > 1 and n > 2:
        xs = np.unique(np.r_[np.arange(0, n, jump), n - 1])
        vals = np.array([_loess_point(y, float(i), q, degree, rho) for i in xs])
        out[ext : ext + n] = np.interp(np.arange(n), xs, vals)
        boundary = []
    elif rho is None and q < n:
        # interior kernel: offsets -h..h, lambda = h (weight 0 at edges)
        d = np.arange(-h, h + 1, dtype=np.float64)
        lam = max(h, 1)
        kern = _tricube(d / lam)
        kern /= kern.sum()
        interior = np.convolve(y, kern[::-1], mode="valid")  # positions h..n-1-h
        out[ext + h : ext + n - h] = interior
        # boundary + extension fits: cached coefficient matvecs over the
        # fixed prefix/suffix windows (see _edge_coefs)
        qq = min(q, n)
        out[: ext + min(h, n)] = _edge_coefs(n, q, degree, ext, "left") @ y[:qq]
        out[ext + n - h :] = _edge_coefs(n, q, degree, ext, "right") @ y[n - qq:]
        return out
    elif rho is None:
        # q >= n: every fit sees the whole series
        out[:] = _edge_coefs(n, q, degree, ext, "full") @ y
        return out
    else:
        boundary = list(range(n))

    for i in boundary:
        out[ext + i] = _loess_point(y, float(i), q, degree, rho)
    for e in range(1, ext + 1):
        out[ext - e] = _loess_point(y, float(-e), q, degree, rho)
        out[n - 1 + ext + e] = _loess_point(y, float(n - 1 + e), q, degree, rho)
    return out


_SUBSERIES_W_CACHE: dict[tuple[int, int, int], np.ndarray] = {}


def _subseries_weights(m: int, q: int, degree: int) -> np.ndarray:
    """(m+2, m) LOESS design matrix for a length-m subseries whose
    window q covers all points, evaluated at x0 = -1, 0..m-1, m — each
    row reproduces ``_loess_point`` exactly, so the whole cycle-subseries
    smoothing collapses to one matmul when every subseries has the same
    length (the period ~ n/2 reference cases: 730 daily/period 365,
    24 monthly/period 12, 2880 minutes/period 1440)."""
    key = (m, q, degree)
    W = _SUBSERIES_W_CACHE.get(key)
    if W is not None:
        return W
    xs = np.arange(m, dtype=np.float64)
    W = np.empty((m + 2, m))
    for row, x0 in enumerate([-1.0, *xs, float(m)]):
        dist = np.abs(xs - x0)
        lam = dist.max()
        if q > m:
            lam *= q / m
        if lam <= 0:
            lam = 1.0
        w = _tricube(dist / lam)
        sw = w.sum()
        if degree == 0 or m < 2:
            W[row] = w / sw
        else:
            xc = xs - x0
            swx = np.dot(w, xc)
            swx2 = np.dot(w, xc * xc)
            det = sw * swx2 - swx * swx
            if abs(det) < 1e-12 * max(sw * swx2, 1e-300):
                W[row] = w / sw
            else:
                W[row] = w * (swx2 - swx * xc) / det
    _SUBSERIES_W_CACHE[key] = W
    return W


def _ma(x: np.ndarray, w: int) -> np.ndarray:
    """Simple moving average, length len(x) - w + 1."""
    c = np.cumsum(np.concatenate(([0.0], x)))
    return (c[w:] - c[:-w]) / w


def stl(
    y: np.ndarray,
    period: int,
    seasonal: int = 7,
    trend: int | None = None,
    low_pass: int | None = None,
    seasonal_deg: int = 0,
    trend_deg: int = 1,
    low_pass_deg: int = 1,
    robust: bool = False,
    inner_iter: int | None = None,
    outer_iter: int | None = None,
) -> STLResult:
    y = np.asarray(y, dtype=np.float64).ravel()
    n = y.size
    if period < 2:
        raise TimeSeriesError("period must be >= 2")
    if n < 2 * period:
        raise TimeSeriesError(
            f"series has {n} observations; STL needs >= 2 full periods ({2 * period})"
        )
    if np.isnan(y).any():
        raise TimeSeriesError("STL input must not contain NaN")
    if seasonal % 2 == 0:
        seasonal += 1
    if trend is None:
        trend = _next_odd(1.5 * period / (1.0 - 1.5 / seasonal))
    if low_pass is None:
        low_pass = _next_odd(period + 1e-9)
        if low_pass <= period:
            low_pass += 2
    ni = inner_iter if inner_iter is not None else (1 if robust else 2)
    no = outer_iter if outer_iter is not None else (15 if robust else 0)

    T = np.zeros(n)
    S = np.zeros(n)
    rho: np.ndarray | None = None

    for _outer in range(no + 1):
        for _inner in range(ni):
            # 1. detrend
            D = y - T
            # 2. cycle-subseries smoothing with 1-step extension each side
            C = np.empty(n + 2 * period)
            m_all = n // period
            if rho is None and n % period == 0 and seasonal >= m_all:
                # uniform subseries fully covered by the window: one
                # matmul replaces period× per-point LOESS fits
                D2 = D.reshape(m_all, period).T          # (period, m)
                W = _subseries_weights(m_all, seasonal, seasonal_deg)
                sm_all = D2 @ W.T                        # (period, m+2)
                C.reshape(m_all + 2, period)[:] = sm_all.T
            else:
                for k in range(period):
                    sub = D[k::period]
                    sub_rho = rho[k::period] if rho is not None else None
                    sm = loess_smooth(sub, seasonal, seasonal_deg, sub_rho, ext=1)
                    m = sub.size
                    # place at positions k, k+period, ... in the extended grid
                    C[k::period][: m + 2] = sm
            # 3. low-pass filter of C: MA(p) ∘ MA(p) ∘ MA(3) ∘ loess(nl)
            # jump (R stl's t.jump/l.jump, default ceil(window/10) there)
            # only when the window is boundary-dominated — the interior
            # convolution path is exact and faster for small windows
            l_jump = max(1, low_pass // 10) if low_pass > n // 2 else 1
            t_jump = max(1, trend // 10) if trend > n // 2 else 1
            L = _ma(_ma(_ma(C, period), period), 3)
            L = loess_smooth(L, low_pass, low_pass_deg, None, jump=l_jump)
            # 4. seasonal
            S = C[period : period + n] - L
            # 5. trend from deseasonalized
            T = loess_smooth(y - S, trend, trend_deg, rho, jump=t_jump)
        R = y - T - S
        if _outer < no:
            # robustness weights: bisquare of |R| / (6 * median|R|)
            s = 6.0 * np.median(np.abs(R))
            if s <= 0:
                rho = np.ones(n)
            else:
                u = np.clip(np.abs(R) / s, 0.0, 1.0)
                rho = (1.0 - u * u) ** 2
    return STLResult(observed=y, trend=T, seasonal=S, resid=y - T - S)


def mstl(
    y: np.ndarray,
    periods: int | tuple[int, ...] | list[int],
    windows: tuple[int, ...] | None = None,
    iterate: int = 2,
    stl_kwargs: dict | None = None,
) -> MSTLResult:
    """MSTL (Bandara, Hyndman & Bergmeir 2021): iterated per-period STL.

    Periods are deduplicated/sorted ascending and periods >= n/2 dropped,
    as statsmodels does; default seasonal windows are 7 + 4*(1..K).
    """
    y = np.asarray(y, dtype=np.float64).ravel()
    n = y.size
    if isinstance(periods, int):
        periods = (periods,)
    ps = sorted({int(p) for p in periods})
    ps = [p for p in ps if p >= 2 and n >= 2 * p]
    if not ps:
        raise TimeSeriesError("no usable period (all periods too long for series)")
    k = len(ps)
    if windows is None:
        windows = tuple(7 + 4 * np.arange(1, k + 1))
    if k == 1:
        iterate = 1
    stl_kwargs = stl_kwargs or {}

    seasonals = {p: np.zeros(n) for p in ps}
    deseas = y.copy()
    last = None
    for _ in range(iterate):
        for i, p in enumerate(ps):
            deseas = deseas + seasonals[p]
            last = stl(deseas, period=p, seasonal=int(windows[i]), **stl_kwargs)
            seasonals[p] = last.seasonal
            deseas = deseas - seasonals[p]
    trend = last.trend
    resid = deseas - trend
    return MSTLResult(observed=y, trend=trend, seasonal=seasonals, resid=resid)
