"""Scalar special functions needed by the detectors, from scratch.

The sandbox has no scipy, so the handful of distribution functions the
reference leans on (``scipy.stats.norm``, ``scipy.stats.t.ppf`` inside
``sesd.generalized_esd``, ``scipy.stats.shapiro``'s normal quantiles) are
implemented here from published algorithms:

- normal PPF: Acklam's rational approximation (|rel err| < 1.15e-9).
- normal CDF: complementary error function via ``math.erfc``.
- regularized incomplete beta + inverse: continued fraction (Lentz) +
  Newton, as in Numerical Recipes §6.4 (public algorithm).
- Student-t PPF: from the inverse incomplete beta.

All are numpy-vectorized where the callers need arrays; the t-PPF is used
once per ESD iteration (scalar), so scalar speed is irrelevant.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "norm_ppf",
    "norm_cdf",
    "norm_sf",
    "betainc",
    "betaincinv",
    "t_ppf",
    "t_sf",
]

# ---------------------------------------------------------------- normal

_ACKLAM_A = (
    -3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
    1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00,
)
_ACKLAM_B = (
    -5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
    6.680131188771972e01, -1.328068155288572e01,
)
_ACKLAM_C = (
    -7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
    -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00,
)
_ACKLAM_D = (
    7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
    3.754408661907416e00,
)


def _norm_ppf_scalar(p: float) -> float:
    if p <= 0.0:
        return -math.inf
    if p >= 1.0:
        return math.inf
    a, b, c, d = _ACKLAM_A, _ACKLAM_B, _ACKLAM_C, _ACKLAM_D
    p_low = 0.02425
    if p < p_low:
        q = math.sqrt(-2.0 * math.log(p))
        x = (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0
        )
    elif p <= 1.0 - p_low:
        q = p - 0.5
        r = q * q
        x = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
            ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1.0
        )
    else:
        q = math.sqrt(-2.0 * math.log(1.0 - p))
        x = -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0
        )
    # One Halley refinement step using erfc for near machine precision.
    e = 0.5 * math.erfc(-x / math.sqrt(2.0)) - p
    u = e * math.sqrt(2.0 * math.pi) * math.exp(x * x / 2.0)
    return x - u / (1.0 + x * u / 2.0)


_norm_ppf_vec = np.vectorize(_norm_ppf_scalar, otypes=[np.float64])


def norm_ppf(p):
    """Inverse standard normal CDF (Acklam + one Halley step)."""
    if np.isscalar(p):
        return _norm_ppf_scalar(float(p))
    return _norm_ppf_vec(np.asarray(p, dtype=np.float64))


_erfc_vec = np.vectorize(math.erfc, otypes=[np.float64])


def norm_cdf(x):
    """Standard normal CDF."""
    arr = np.asarray(x, dtype=np.float64)
    out = 0.5 * _erfc_vec(-arr / math.sqrt(2.0))
    return float(out) if np.isscalar(x) else out


def norm_sf(x):
    """Standard normal survival function 1 - CDF(x)."""
    arr = np.asarray(x, dtype=np.float64)
    out = 0.5 * _erfc_vec(arr / math.sqrt(2.0))
    return float(out) if np.isscalar(x) else out


# ------------------------------------------------- incomplete beta (reg.)


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (Lentz's method)."""
    max_iter = 300
    eps = 3e-16
    fpmin = 1e-300
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < fpmin:
        d = fpmin
    d = 1.0 / d
    h = d
    for m in range(1, max_iter + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < fpmin:
            d = fpmin
        c = 1.0 + aa / c
        if abs(c) < fpmin:
            c = fpmin
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < fpmin:
            d = fpmin
        c = 1.0 + aa / c
        if abs(c) < fpmin:
            c = fpmin
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < eps:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta function I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def betaincinv(a: float, b: float, p: float) -> float:
    """Inverse of ``betainc`` in x, via bisection + Newton polish."""
    if p <= 0.0:
        return 0.0
    if p >= 1.0:
        return 1.0
    lo, hi = 0.0, 1.0
    x = 0.5
    for _ in range(200):
        fx = betainc(a, b, x) - p
        if fx > 0.0:
            hi = x
        else:
            lo = x
        # Newton step using the beta pdf as derivative
        try:
            ln_pdf = (
                math.lgamma(a + b)
                - math.lgamma(a)
                - math.lgamma(b)
                + (a - 1.0) * math.log(x)
                + (b - 1.0) * math.log1p(-x)
            )
            pdf = math.exp(ln_pdf)
        except ValueError:
            pdf = 0.0
        if pdf > 0.0:
            x_new = x - fx / pdf
        else:
            x_new = 0.5 * (lo + hi)
        if not (lo < x_new < hi):
            x_new = 0.5 * (lo + hi)
        if abs(x_new - x) < 1e-14:
            x = x_new
            break
        x = x_new
    return x


# ------------------------------------------------------------- Student t


def t_ppf(p: float, df: float) -> float:
    """Student-t inverse CDF (used by the Generalized ESD critical values)."""
    if df <= 0:
        raise ValueError("df must be positive")
    if p == 0.5:
        return 0.0
    tail = min(p, 1.0 - p)
    x = betaincinv(df / 2.0, 0.5, 2.0 * tail)
    x = min(max(x, 1e-300), 1.0)
    t = math.sqrt(df * (1.0 - x) / x)
    return -t if p < 0.5 else t


def t_sf(t: float, df: float) -> float:
    """Student-t survival function P(T > t)."""
    if t == 0.0:
        return 0.5
    x = df / (df + t * t)
    p = 0.5 * betainc(df / 2.0, 0.5, x)
    return p if t > 0 else 1.0 - p
