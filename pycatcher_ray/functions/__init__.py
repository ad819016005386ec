"""From-scratch numeric kernels used by the engine's detector stages."""

from .boxcox import boxcox, boxcox_mle_lambda, boxcox_transform, inv_boxcox
from .decompose import DecomposeResult, seasonal_decompose, select_model_ssacf
from .esd import esd_critical_value, generalized_esd, seasonal_esd
from .gorilla import decode_chunk, encode_chunk, encode_chunk_vectorized
from .moving_average import (
    moving_average_outlier_mask,
    optimal_window_size,
    rmse_for_window,
    time_series_split,
)
from .shapiro import MonteCarloShapiro, shapiro, shapiro_w
from .special import betainc, betaincinv, norm_cdf, norm_ppf, norm_sf, t_ppf, t_sf
from .stats import (
    acf_fft,
    iqr_bounds,
    iqr_mask,
    mad_mask,
    mad_sigma,
    modified_zscore,
    quantile_linear,
    rolling_mean,
    ssacf,
    sum_of_squares,
    zscore,
)
from .stl import MSTLResult, STLResult, mstl, stl

__all__ = [
    "boxcox", "boxcox_mle_lambda", "boxcox_transform", "inv_boxcox",
    "DecomposeResult", "seasonal_decompose", "select_model_ssacf",
    "esd_critical_value", "generalized_esd", "seasonal_esd",
    "decode_chunk", "encode_chunk", "encode_chunk_vectorized",
    "moving_average_outlier_mask", "optimal_window_size",
    "rmse_for_window", "time_series_split",
    "MonteCarloShapiro", "shapiro", "shapiro_w",
    "betainc", "betaincinv", "norm_cdf", "norm_ppf", "norm_sf", "t_ppf", "t_sf",
    "acf_fft", "iqr_bounds", "iqr_mask", "mad_mask", "mad_sigma",
    "modified_zscore", "quantile_linear", "rolling_mean", "ssacf",
    "sum_of_squares", "zscore",
    "MSTLResult", "STLResult", "mstl", "stl",
]
