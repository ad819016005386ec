"""Distributed anomaly detection: pack series → actor-pool detectors.

Per SURVEY.md §4, every pycatcher detector is whole-series math
(quantiles, decompositions, iterative ESD), so the detect stage is
*per-series-sequential, across-series-parallel*:

1. ``pack_series``: ``groupby(key).map_groups`` gathers each series into
   ONE row with list columns (bucket epoch-seconds + float values),
   sorted by time inside the group.  Series length is bounded by tier
   retention, so a packed row is small (<= ~43k points at the 1m tier).
2. ``DetectorActor``: a callable CLASS run via
   ``map_batches(cls, concurrency=N)`` — the actor pool.  Per-actor state
   initialised once in ``__init__`` (the reference pays it per call):
   the Monte-Carlo Shapiro null-distribution cache keyed by series
   length (catch.py:1184-1185 hot spot).

Output: one row per (series, flagged bucket, method) with the score —
the engine's typed replacement for the reference's untyped
DataFrame-or-string returns (SURVEY.md §1.1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import TIERS, EngineConfig
from ..functions.boxcox import boxcox, inv_boxcox
from ..functions.esd import generalized_esd, seasonal_esd
from ..functions.moving_average import moving_average_outlier_mask
from ..functions.shapiro import MonteCarloShapiro
from ..functions.stats import iqr_mask, mad_mask, modified_zscore, zscore
from ..functions.decompose import seasonal_decompose
from ..functions.stl import mstl, stl

__all__ = ["pack_series", "DetectorActor", "detect", "detect_series"]


def _fill_series(ts: np.ndarray, vals: np.ndarray, gapfill_method: str,
                 bucket_seconds: int) -> tuple[np.ndarray, np.ndarray]:
    """Densify one sorted series onto its regular bucket grid."""
    grid = np.arange(ts[0], ts[-1] + bucket_seconds, bucket_seconds)
    if grid.size == ts.size:
        return ts, vals
    dense = np.full(grid.size, np.nan)
    dense[(ts - ts[0]) // bucket_seconds] = vals
    if gapfill_method == "locf":
        idx = np.maximum.accumulate(
            np.where(~np.isnan(dense), np.arange(grid.size), 0)
        )
        dense = dense[idx]
    else:  # linear
        nans = np.isnan(dense)
        dense[nans] = np.interp(grid[nans], grid[~nans], dense[~nans])
    return grid, dense


def pack_series(rollup_ds, key_col: str, value_col: str = "sum_value",
                gapfill_method: str | None = None,
                bucket_seconds: int | None = None,
                num_shards: int | None = None):
    """One row per key: (key, n, ts list<int64 epoch-s>, values list<f64>).

    The exchange groups by ``hash(key) % num_shards`` (stages/shard.py),
    NOT one Ray group per key — at 10^6 sources a per-key groupby pays
    ~0.3 ms of Python dispatch per series before any packing happens.
    Inside a shard, one vectorized sort + boundary scan packs every
    series with numpy slices.

    With ``gapfill_method`` set ('linear' | 'locf'), missing buckets are
    filled INSIDE the same pass — the detectors need a dense regular
    grid, and fusing the fill here avoids a second full groupby shuffle
    of the tier table (the standalone gapfill stage remains for
    pipelines that persist the filled series)."""
    from .shard import compute_shards, sharded_map_groups

    src = rollup_ds.select_columns([key_col, "bucket_start", value_col])
    if num_shards is None:
        # the packed output's block count bounds the DOWNSTREAM detector
        # scan's task parallelism — size for compute, not pack rows
        src = src.materialize()
        num_shards = compute_shards(src.count())

    def pack_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "bucket_start"], kind="stable")
        keys = g[key_col].to_numpy()
        ts_all = (
            g["bucket_start"].astype("datetime64[s]").astype("int64")
        ).to_numpy()
        vals_all = g[value_col].to_numpy(dtype=np.float64)
        change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(keys)]))
        out_key, out_n, out_ts, out_vals = [], [], [], []
        for s, e in zip(starts, ends):
            ts, vals = ts_all[s:e], vals_all[s:e]
            if gapfill_method and bucket_seconds and ts.size > 1:
                ts, vals = _fill_series(ts, vals, gapfill_method,
                                        bucket_seconds)
            out_key.append(keys[s])
            out_n.append(len(ts))
            out_ts.append(ts)
            out_vals.append(vals)
        return pd.DataFrame(
            {"key": out_key, "n": out_n, "ts": out_ts, "values": out_vals}
        )

    return sharded_map_groups(src, key_col, pack_shard,
                              num_shards=num_shards)


def detect_series(
    ts: np.ndarray,
    values: np.ndarray,
    methods: tuple[str, ...],
    cfg: EngineConfig,
    period: int,
    mstl_periods: tuple[int, ...],
    mc: MonteCarloShapiro,
) -> list[tuple[np.ndarray, str, np.ndarray]]:
    """Run the configured detectors on one series.

    Returns one (flag_indices, method, scores_at_indices) triple per
    method that flagged anything — arrays, not per-flag tuples, so the
    caller gathers with one fancy-index.  Kernel semantics mirror the
    reference paths (see pycatcher_ray.compat); periods come from tier
    config instead of frequency inference.
    """
    out: list[tuple[np.ndarray, str, np.ndarray]] = []
    n = values.size

    def emit(name: str, mask_or_idx, scores: np.ndarray) -> None:
        idx = (np.nonzero(mask_or_idx)[0]
               if mask_or_idx.dtype == bool else mask_or_idx)
        if idx.size:
            out.append((idx.astype(np.int64), name, scores[idx]))

    def _stl_like(name: str, fit) -> None:
        """shared scoring: Box-Cox mul vs add, MC-Shapiro gate, z or MAD
        (catch.py:1057-1165 semantics)."""
        try:
            if np.nanmin(values) > 0:
                transformed, lam = boxcox(values)
                res_mul = fit(transformed)
            else:
                res_mul = None
            res_add = fit(values)
            # reference quirk (catch.py:1084, mirrored in compat
            # detect_outliers_stl_extended): the MULTIPLICATIVE model is
            # chosen when its transformed-scale residual variance is
            # HIGHER than additive's; its residuals are then
            # back-transformed for flagging (catch.py:1139)
            if res_mul is not None and np.var(res_mul.resid) > np.var(res_add.resid):
                resid = inv_boxcox(res_mul.resid, lam)
            else:
                resid = res_add.resid
        except Exception:
            return
        clean = resid[~np.isnan(resid)]
        if clean.size < 3:
            return
        _stat, p = mc.test(clean)
        if p > cfg.esd_alpha:
            z = zscore(resid)
            mask = np.abs(z) > cfg.z_threshold
            scores = z
        else:
            scores = modified_zscore(resid)
            mask = np.abs(scores) > cfg.mad_threshold
        emit(name, mask, scores)

    for method in methods:
        if method == "iqr":
            emit("iqr", iqr_mask(values), modified_zscore(values))
        elif method == "zscore":
            z = zscore(values)
            emit("zscore", np.abs(z) > cfg.z_threshold, z)
        elif method == "mad":
            z = modified_zscore(values)
            emit("mad", np.abs(z) > cfg.mad_threshold, z)
        elif method == "classic":
            if n < 2 * period:
                continue
            try:
                res_add = seasonal_decompose(values, period=period, model="additive")
                from ..functions.stats import ssacf

                resid = res_add.resid
                if np.nanmin(values) > 0:
                    res_mul = seasonal_decompose(
                        values, period=period, model="multiplicative"
                    )
                    if ssacf(res_mul.resid) < ssacf(resid):
                        resid = res_mul.resid
            except Exception:
                continue
            scores = modified_zscore(resid)
            emit("classic", np.abs(scores) > cfg.mad_threshold, scores)
        elif method == "stl":
            if n < 2 * period:
                continue
            seasonal = period + (period % 2 == 0)
            _stl_like("stl", lambda v: stl(v, period=period, seasonal=seasonal))
        elif method == "mstl":
            usable = [p for p in mstl_periods if n >= 2 * p]
            if not usable:
                continue
            _stl_like("mstl", lambda v: mstl(v, periods=tuple(usable)))
        elif method == "esd":
            max_anom = n // 20
            if max_anom < 1:
                continue
            try:
                from ..functions.shapiro import shapiro

                _w, p = shapiro(values) if n >= 3 else (1.0, 1.0)
                if p > cfg.esd_alpha:
                    idxs = generalized_esd(values, max_anom, cfg.esd_alpha,
                                           hybrid=False)
                elif n >= 2 * period:
                    idxs = seasonal_esd(values, periodicity=period,
                                        max_anomalies=max_anom,
                                        alpha=cfg.esd_alpha, hybrid=True)
                else:
                    idxs = generalized_esd(values, max_anom, cfg.esd_alpha,
                                           hybrid=True)
            except Exception:
                continue
            if idxs:
                emit("esd", np.asarray(idxs, dtype=np.int64),
                     modified_zscore(values))
        elif method == "moving_average":
            try:
                mask = moving_average_outlier_mask(values,
                                                   window=cfg.ma_window)
            except Exception:
                continue
            emit("moving_average", mask, zscore(values))
    return out


# worker-process-global Monte-Carlo Shapiro cache for the task-based
# detect path: the null distribution depends only on (n_resamples, seed,
# series length), so a per-process singleton gives task workers the same
# build-once semantics an actor gets from __init__ — without paying actor
# creation.  Bounded: MonteCarloShapiro caps its own per-length cache.
_MC_BY_CFG: dict[tuple[int, int], MonteCarloShapiro] = {}


def _mc_for(cfg: EngineConfig) -> MonteCarloShapiro:
    key = (cfg.mc_resamples, cfg.seed)
    mc = _MC_BY_CFG.get(key)
    if mc is None:
        mc = _MC_BY_CFG[key] = MonteCarloShapiro(
            n_resamples=cfg.mc_resamples, seed=cfg.seed
        )
    return mc


def detect_batch(
    batch: pd.DataFrame,
    *,
    cfg: EngineConfig,
    period: int,
    mstl_periods: tuple[int, ...],
    methods: tuple[str, ...],
    mc: MonteCarloShapiro,
) -> "pa.Table":
    """Run the detectors over one batch of packed series → flag rows.
    Shared kernel for both execution carriers (task pool / actor pool)."""
    import pyarrow as pa

    per_series = []
    for _, row in batch.iterrows():
        ts = np.asarray(row["ts"], dtype=np.int64)
        vals = np.asarray(row["values"], dtype=np.float64)
        flags = detect_series(ts, vals, methods, cfg, period, mstl_periods, mc)
        for idxs, method, scores in flags:
            per_series.append(
                (row["key"], ts[idxs], vals[idxs],
                 [method] * len(idxs), scores)
            )

    return _flag_table(per_series)


class DetectorActor:
    """Stateful detector stage: one instance per pool actor.

    ``__init__`` (once per actor): builds the Monte-Carlo Shapiro cache.
    ``__call__`` (per batch of packed series): runs the configured
    detectors and emits flag rows.
    """

    def __init__(self, cfg: EngineConfig | None = None, tier: str = "1h",
                 methods: tuple[str, ...] | None = None):
        self.cfg = cfg or EngineConfig()
        spec = TIERS[tier]
        self.period = spec.period
        self.mstl_periods = spec.mstl_periods
        self.methods = tuple(methods or self.cfg.detectors)
        self.mc = MonteCarloShapiro(
            n_resamples=self.cfg.mc_resamples, seed=self.cfg.seed
        )

    def __call__(self, batch: pd.DataFrame) -> "pa.Table":
        return detect_batch(
            batch, cfg=self.cfg, period=self.period,
            mstl_periods=self.mstl_periods, methods=self.methods, mc=self.mc,
        )


def _flag_table(per_series) -> "pa.Table":
    import pyarrow as pa

    if per_series:
        keys = np.concatenate(
            [np.repeat(k, len(t)) for k, t, _, _, _ in per_series]
        )
        buckets = np.concatenate([t for _, t, _, _, _ in per_series])
        values_out = np.concatenate([v for _, _, v, _, _ in per_series])
        methods_out = [m for _, _, _, ms, _ in per_series for m in ms]
        scores_out = np.concatenate([s for _, _, _, _, s in per_series])
    else:
        keys = np.array([], dtype=str)
        buckets = np.array([], dtype=np.int64)
        values_out = np.array([], dtype=np.float64)
        methods_out = []
        scores_out = np.array([], dtype=np.float64)

    # emit an Arrow table so downstream Project/rename stages operate
    # on Arrow blocks (and the flags table stays zero-copy)
    return pa.table(
        {
            "key": pa.array(keys, type=pa.string()),
            "bucket_start": pa.array(
                buckets.astype(np.int64), type=pa.int64()
            ).cast(pa.timestamp("s")),
            "value": pa.array(values_out),
            "method": pa.array(methods_out, type=pa.string()),
            "score": pa.array(scores_out),
        }
    )


def detect(rollup_ds, key_col: str, *, tier: str = "1h",
           cfg: EngineConfig | None = None,
           methods: tuple[str, ...] | None = None,
           value_col: str = "sum_value",
           gapfill_method: str | None = None,
           use_actors: bool | None = None,
           num_shards: int | None = None):
    """rollup table → flag rows, via pack (+fused gap-fill) + detector pool.

    Two execution carriers for the same ``detect_batch`` kernel:

    - tasks (default, ``cfg.detect_use_actors=False``): plain
      ``map_batches(fn)`` over Ray's prestarted worker processes, with the
      MC-Shapiro cache as a per-worker-process singleton (``_mc_for``).
      Measured on this host: 32 fresh actor processes cost ~12 s of
      spin-up (cold imports under slow first-touch page faults) vs 6 s
      total for the identical scan on tasks.  Tasks are also
      work-conserving — no CPU reservation by an idle pool.
    - actor pool (``use_actors=True``): ``map_batches(DetectorActor,
      concurrency=N)``.  The right carrier when per-worker state is
      genuinely expensive to build or memory-heavy (bounded to N copies),
      e.g. short-series tiers where the MC null simulation runs (n ≤ 500)
      and the per-length null matrices are worth confining to N actors.
    """
    cfg = cfg or EngineConfig()
    if use_actors is None:
        use_actors = cfg.detect_use_actors
    # num_shards: callers that already know the tier's row count pass
    # compute_shards(n) so pack_series skips its materialize+count pass
    packed = pack_series(rollup_ds, key_col, value_col,
                         gapfill_method=gapfill_method,
                         bucket_seconds=TIERS[tier].seconds,
                         num_shards=num_shards)
    if use_actors:
        return packed.map_batches(
            DetectorActor,
            fn_constructor_kwargs={"cfg": cfg, "tier": tier,
                                   "methods": methods},
            batch_format="pandas",
            batch_size=cfg.detect_batch_series,
            concurrency=cfg.detect_concurrency,
            num_cpus=1,
        )
    spec = TIERS[tier]
    methods_t = tuple(methods or cfg.detectors)

    def run(batch: pd.DataFrame) -> "pa.Table":
        return detect_batch(
            batch, cfg=cfg, period=spec.period,
            mstl_periods=spec.mstl_periods, methods=methods_t,
            mc=_mc_for(cfg),
        )

    return packed.map_batches(
        run,
        batch_format="pandas",
        batch_size=cfg.detect_batch_series,
        num_cpus=1,
    )
