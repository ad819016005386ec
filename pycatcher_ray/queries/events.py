"""Events-table time-series / sketch / sampling queries."""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import TIERS, EngineConfig
from ..stages.detect import detect
from ..stages.gapfill import gapfill
from ..stages.rollup import cascade, rollup

from ._core import (
    _STOPWORDS,
    _events,
    _events_rollup,
    _rd,
    _round_cols,
    _round_exact,
    iqr_flags_1h,
)



def _finalize_rollup(ds):
    # mean recomputed from the ROUNDED sum so engine and oracle apply the
    # identical float ops (round → divide → round); avoids .00005-boundary
    # flips from summation-order drift in the raw mean
    def fin(batch: pa.Table) -> pa.Table:
        # correctly-rounded sum (see _round_exact) so the divide below is
        # bit-identical to the oracle's round(sum,4)/count(*)
        s = pa.array(
            _round_exact(batch["sum_value"].to_numpy(zero_copy_only=False))
        )
        # no outer round: dividing the identical rounded double by the same
        # integer is bit-deterministic, while a second round() hits
        # half-tie rule differences (arrow half-to-even vs DuckDB half-away)
        mean = pc.divide(s, pc.cast(batch["n_points"], pa.float64()))
        names = batch.column_names
        batch = batch.set_column(names.index("sum_value"), "sum_value", s)
        batch = batch.set_column(names.index("mean_value"), "mean_value", mean)
        return batch

    ds = ds.map_batches(fin, batch_format="pyarrow")
    # (ds.schema() here would trigger a full extra execution of the lazy
    # aggregation — the rollup key is always event_type for these queries)
    return ds.rename_columns({"event_type": "source"})


def rollup_events(sf_dir: str, tier: str):
    return _finalize_rollup(_events_rollup(sf_dir, tier))


_ROLLUP_ORACLE = """
SELECT event_type AS source,
       date_trunc('{unit}', ts) AS bucket_start,
       round(sum(value), 4) AS sum_value,
       count(*) AS n_points,
       min(value) AS min_value,
       max(value) AS max_value,
       round(sum(value), 4) / count(*) AS mean_value
FROM events
GROUP BY 1, 2
"""


def rollup_monthly(sf_dir: str):
    """Calendar-month rollup (diagnostics.py:255 monthwise bucketing as a
    distributed aggregate; calendar units have no fixed width)."""
    ds = rollup(_events(sf_dir), "event_type", "ts", "value", "month")
    return _finalize_rollup(ds)


_ROLLUP_MONTH_ORACLE = _ROLLUP_ORACLE.format(unit="month")


_IQR_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         sum(value) AS v
  FROM events GROUP BY 1, 2
), q AS (
  SELECT source, quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3
  FROM r GROUP BY source
)
SELECT r.source, r.bucket_start, round(r.v, 4) AS value
FROM r JOIN q USING (source)
WHERE r.v < q.q1 - 1.5 * (q.q3 - q.q1) OR r.v > q.q3 + 1.5 * (q.q3 - q.q1)
"""


_ZSCORE_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         sum(value) AS v
  FROM events GROUP BY 1, 2
), s AS (
  SELECT source, avg(v) AS mu, stddev_pop(v) AS sigma FROM r GROUP BY source
)
SELECT r.source, r.bucket_start, round(r.v, 4) AS value
FROM r JOIN s USING (source)
WHERE abs((r.v - s.mu) / s.sigma) > 2
"""


_MAD_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         sum(value) AS v
  FROM events GROUP BY 1, 2
), med AS (
  SELECT source, median(v) AS m FROM r GROUP BY source
), madt AS (
  SELECT r.source, median(abs(r.v - med.m)) AS mad
  FROM r JOIN med USING (source) GROUP BY r.source
)
SELECT r.source, r.bucket_start, round(r.v, 4) AS value
FROM r JOIN med USING (source) JOIN madt USING (source)
WHERE r.v <> med.m AND abs(0.6745 * (r.v - med.m) / madt.mad) > 3.5
"""


_LATEST_IQR_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         sum(value) AS v
  FROM events GROUP BY 1, 2
), q AS (
  SELECT source, quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3
  FROM r GROUP BY source
), f AS (
  SELECT r.source, r.bucket_start, r.v
  FROM r JOIN q USING (source)
  WHERE r.v < q.q1 - 1.5 * (q.q3 - q.q1) OR r.v > q.q3 + 1.5 * (q.q3 - q.q1)
)
SELECT source, bucket_start AS last_flag_bucket, round(v, 4) AS value
FROM (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY bucket_start DESC) AS rn
  FROM f
) WHERE rn = 1
"""


_IQR_ENRICHED_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         sum(value) AS v
  FROM events GROUP BY 1, 2
), q AS (
  SELECT source, quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3,
         round(avg(v), 4) AS src_mean, round(stddev_pop(v), 4) AS src_std
  FROM r GROUP BY source
)
SELECT r.source, r.bucket_start, round(r.v, 4) AS value,
       q.src_mean, q.src_std
FROM r JOIN q USING (source)
WHERE r.v < q.q1 - 1.5 * (q.q3 - q.q1) OR r.v > q.q3 + 1.5 * (q.q3 - q.q1)
"""


def duplicate_buckets(sf_dir: str):
    """Exact duplicate detection: (source, ts) appearing more than once —
    the reference's duplicate-date gate (catch.py:533-535) as a grouped
    count."""
    ds = _events(sf_dir)

    from ..stages.shard import sharded_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"source": batch["event_type"], "ts": batch["ts"]})
        return t.group_by(["source", "ts"]).aggregate([("ts", "count")]).rename_columns(
            ["source", "ts", "p_n"]
        )

    # sharded combine: (source, ts) cardinality ~= the row count, so a
    # Ray per-group aggregate would pay ~0.3ms x 10^6 groups
    agg = sharded_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source", "ts"], {"p_n": "sum"},
    )
    dups = agg.map_batches(
        lambda b: b[b["p_n"] > 1], batch_format="pandas"
    )
    # schema-stable summary (an empty flag table has no schema to compare)
    return pd.DataFrame({"n_dup_pairs": [int(dups.count())]})


_DUP_ORACLE = """
SELECT count(*) AS n_dup_pairs FROM (
  SELECT event_type, ts FROM events GROUP BY 1, 2 HAVING count(*) > 1
)
"""


def asof_join_features(sf_dir: str):
    """As-of join: each event is joined to the LATEST hourly rollup
    bucket with bucket_start <= ts for its key (lag-feature attachment).

    Bucketed (shuffle) form: BOTH sides are hash-sharded by key into the
    same exchange (union + sharded groupby — no driver materialization
    and no broadcast of the rollup side), then one vectorized
    ``pd.merge_asof(by=source)`` runs per shard over all of that shard's
    keys.  At skewed key volumes the shard count bounds the exchange;
    a dimension-sized right side could still use the broadcast variant.
    Oracle uses DuckDB's native ASOF JOIN."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def tag_roll(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["event_type"],
                "event_id": pa.array(np.zeros(len(b), dtype=np.int64)),
                "ts": b["bucket_start"],
                "sum_value": pa.array(_round_exact(
                    b["sum_value"].to_numpy(zero_copy_only=False))),
                "kind": pa.array(np.ones(len(b), dtype=np.int64)),
            }
        )

    events = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "ts"],
    )

    def tag_events(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["event_type"],
                "event_id": b["event_id"].cast(pa.int64()),
                "ts": b["ts"],
                "sum_value": pa.array(np.zeros(len(b))),
                "kind": pa.array(np.zeros(len(b), dtype=np.int64)),
            }
        )

    both = events.map_batches(tag_events, batch_format="pyarrow").union(
        roll.map_batches(tag_roll, batch_format="pyarrow")
    )

    def join_shard(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["kind"] == 0][["event_id", "source", "ts"]].sort_values(
            "ts", kind="stable"
        )
        right = g[g["kind"] == 1][["source", "ts", "sum_value"]].rename(
            columns={"ts": "bucket_start"}
        ).sort_values("bucket_start", kind="stable")
        out = pd.merge_asof(
            left, right, left_on="ts", right_on="bucket_start", by="source",
            direction="backward", allow_exact_matches=True,
        )
        return out.rename(columns={"bucket_start": "asof_bucket",
                                   "sum_value": "asof_hour_sum"})

    return sharded_map_groups(both, "source", join_shard)


_ASOF_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         round(sum(value), 4) AS sum_value
  FROM events GROUP BY 1, 2
)
SELECT e.event_id, e.event_type AS source, e.ts,
       r.bucket_start AS asof_bucket, r.sum_value AS asof_hour_sum
FROM events e ASOF JOIN r
  ON e.event_type = r.source AND e.ts >= r.bucket_start
"""


_RANGE_JOIN_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         sum(value) AS v
  FROM events GROUP BY 1, 2
), q AS (
  SELECT source, quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3
  FROM r GROUP BY source
), f AS (
  SELECT r.source, r.bucket_start
  FROM r JOIN q USING (source)
  WHERE r.v < q.q1 - 1.5 * (q.q3 - q.q1) OR r.v > q.q3 + 1.5 * (q.q3 - q.q1)
)
SELECT e.event_id, e.event_type AS source, e.ts,
       count(f.bucket_start) AS n_recent_flags
FROM events e LEFT JOIN f
  ON e.event_type = f.source
 AND f.bucket_start BETWEEN e.ts - INTERVAL 2 HOUR AND e.ts
GROUP BY 1, 2, 3
"""


def ewma_hourly(sf_dir: str, alpha: float = 0.25):
    """Per-source EWMA smoothing of the hourly sums (the classic
    streaming-monitor baseline band): s_0 = v_0, s_i = (1-α)·s_{i-1} +
    α·v_i over observed buckets in time order — the ``adjust=False``
    recursion.  Series gathered per key by the hash-sharded exchange;
    the recursion is inherently sequential per series (bounded by tier
    retention), parallel across series.

    Oracle: DuckDB recursive CTE replaying the identical float ops on
    the identically-rounded hourly sums — each step is (1-α)*prev + α*v
    in both engines, so the smoothed values are bit-equal."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")
    om, al = 1.0 - alpha, alpha

    def smooth(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["event_type", "bucket_start"],
                                  kind="stable")
        out = []
        for src, g in shard.groupby("event_type", sort=False):
            v = _round_exact(g["sum_value"].to_numpy(dtype=np.float64))
            s = np.empty_like(v)
            if v.size:
                s[0] = v[0]
                for i in range(1, v.size):
                    s[i] = om * s[i - 1] + al * v[i]
            out.append(pd.DataFrame({
                "source": src,
                "bucket_start": g["bucket_start"].to_numpy(),
                "value": v,
                "ewma": s,
            }))
        return pd.concat(out, ignore_index=True)

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", smooth,
    )


def sliding_p95_24h(sf_dir: str):
    """Exact p95 over a trailing 24-hour RANGE window per source (the
    windowed-quantile primitive behind burn-rate / SLO alerting).  Same
    shape as every series op: hash-sharded exchange gathers the series,
    then a per-series pass computes each bucket's window by binary
    search (windows are time-RANGE based, so bucket gaps shrink the
    window rather than stretching it) and the DuckDB-bit-parity
    ``quantile_cont`` lerp over it.  Work is O(buckets × window) per
    series, bounded by tier retention; parallel across series."""
    from ..functions.stats import quantile_cont
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def windowed(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["event_type", "bucket_start"],
                                  kind="stable")
        out = []
        for src, g in shard.groupby("event_type", sort=False):
            ts = g["bucket_start"].astype("datetime64[s]").astype(
                "int64").to_numpy()
            v = g["sum_value"].to_numpy(dtype=np.float64)
            lo = np.searchsorted(ts, ts - 23 * 3600, side="left")
            p95 = np.empty_like(v)
            n_win = np.empty(v.size, dtype=np.int64)
            for i in range(v.size):
                w = v[lo[i]:i + 1]
                p95[i] = round(float(quantile_cont(w, 0.95)), 6)
                n_win[i] = w.size
            out.append(pd.DataFrame({
                "source": src,
                "bucket_start": g["bucket_start"].to_numpy(),
                "p95_24h": p95,
                "n_in_window": n_win,
            }))
        return pd.concat(out, ignore_index=True)

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", windowed,
    )


def cusum_hourly(sf_dir: str, k: float = 0.5, h: float = 5.0):
    """Two-sided standardized CUSUM change-point statistic per source
    (Page 1954): z_i = (v_i - μ)/σ on the hourly sums, s⁺_i = max(0,
    s⁺_{i-1} + (z_i - k)), s⁻_i = max(0, s⁻_{i-1} + (-z_i - k)); a
    sustained mean shift accumulates past the decision band h.  Emits
    the full statistic series plus the flag so the driver hash covers
    the recursion itself, not just threshold membership.

    Float discipline (same class as the EWMA oracle): v, μ and σ are
    rounded on BOTH sides before the recursion (bit-equal inputs +
    identical op order per step ⇒ bit-equal statistics); the emitted
    s⁺/s⁻ are rounded at 4 as a second guard."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def cusum(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["event_type", "bucket_start"],
                                  kind="stable")
        out = []
        for src, g in shard.groupby("event_type", sort=False):
            v = _round_exact(g["sum_value"].to_numpy(dtype=np.float64))
            mu = round(float(np.mean(v)), 6)
            sigma = round(float(np.std(v)), 6)
            z = (v - mu) / sigma
            sp = np.empty_like(v)
            sn = np.empty_like(v)
            cp = cn = 0.0
            for i in range(v.size):
                cp = max(0.0, cp + (z[i] - k))
                cn = max(0.0, cn + (-z[i] - k))
                sp[i] = cp
                sn[i] = cn
            out.append(pd.DataFrame({
                "source": src,
                "bucket_start": g["bucket_start"].to_numpy(),
                "value": v,
                "cusum_pos": _round_exact(sp),
                "cusum_neg": _round_exact(sn),
                "flagged": ((sp > h) | (sn > h)).astype(np.int64),
            }))
        return pd.concat(out, ignore_index=True)

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", cusum,
    )


_CUSUM_ORACLE = """
WITH RECURSIVE r0 AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         round(sum(value), 4) AS v,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY date_trunc('hour', ts)) AS idx
  FROM events GROUP BY 1, 2
), st AS (
  SELECT source, round(avg(v), 6) AS mu, round(stddev_pop(v), 6) AS sigma
  FROM r0 GROUP BY source
), r AS (
  SELECT r0.source, r0.bucket_start, r0.idx, r0.v,
         (r0.v - st.mu) / st.sigma AS z
  FROM r0 JOIN st USING (source)
), c AS (
  SELECT source, bucket_start, idx, v,
         greatest(0.0, z - 0.5) AS s_pos,
         greatest(0.0, -z - 0.5) AS s_neg
  FROM r WHERE idx = 1
  UNION ALL
  SELECT r.source, r.bucket_start, r.idx, r.v,
         greatest(0.0, c.s_pos + (r.z - 0.5)),
         greatest(0.0, c.s_neg + (-r.z - 0.5))
  FROM r JOIN c ON r.source = c.source AND r.idx = c.idx + 1
)
SELECT source, bucket_start, v AS value,
       round(s_pos, 4) AS cusum_pos,
       round(s_neg, 4) AS cusum_neg,
       CAST(s_pos > 5.0 OR s_neg > 5.0 AS BIGINT) AS flagged
FROM c
"""


_SLIDING_P95_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         sum(value) AS v
  FROM events GROUP BY 1, 2
)
SELECT source, bucket_start,
       round(quantile_cont(v, 0.95) OVER w, 6) AS p95_24h,
       count(*) OVER w AS n_in_window
FROM r
WINDOW w AS (PARTITION BY source ORDER BY bucket_start
             RANGE BETWEEN INTERVAL 23 HOUR PRECEDING AND CURRENT ROW)
"""


def hampel_flags_1h(sf_dir: str, half_window: int = 3,
                    nsigma: float = 4.4478):
    """Hampel filter over the hourly tier: each bucket compares against
    the rolling MEDIAN of its ±3-bucket ROWS window and flags when
    |v − med| > 4.4478 · MAD (3σ × the 1.4826 Gaussian consistency
    constant folded into ONE literal so both engines do a single
    multiply).  The robust windowed complement of
    ``rolling_zscore_flags_1h``: a spike cannot inflate its own
    rejection threshold because median/MAD ignore its magnitude.
    Exactness: window medians/MADs are ``quantile_cont(0.5)`` over the
    4-dp-rounded hourly sums — odd interior windows (7 rows) select an
    element outright, even edge windows hit the bit-pinned two-product
    lerp — and the flag comparison does the identical multiply on both
    sides.  Per-series work is O(buckets × window), bounded by tier
    retention; parallel across sources via the hash exchange."""
    from ..functions.stats import quantile_cont
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def hampel(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["event_type", "bucket_start"],
                                  kind="stable")
        out = []
        for src, g in shard.groupby("event_type", sort=False):
            v = _round_exact(g["sum_value"].to_numpy(dtype=np.float64))
            n = v.size
            med = np.empty(n)
            mad = np.empty(n)
            for i in range(n):
                w = v[max(0, i - half_window): i + half_window + 1]
                m = float(quantile_cont(w, 0.5))
                med[i] = m
                mad[i] = float(quantile_cont(np.abs(w - m), 0.5))
            keep = np.abs(v - med) > nsigma * mad
            if not keep.any():
                continue
            out.append(pd.DataFrame({
                "source": src,
                "bucket_start": g["bucket_start"].to_numpy()[keep],
                "value": v[keep],
                "rolling_med": med[keep],
                "rolling_mad": mad[keep],
            }))
        if not out:
            return pd.DataFrame({
                "source": pd.Series([], dtype=object),
                "bucket_start": pd.Series([], dtype="datetime64[us]"),
                "value": pd.Series([], dtype=np.float64),
                "rolling_med": pd.Series([], dtype=np.float64),
                "rolling_mad": pd.Series([], dtype=np.float64)})
        return pd.concat(out, ignore_index=True)

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", hampel,
    )


_HAMPEL_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         round(sum(value), 4) AS v,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY date_trunc('hour', ts)) AS rn
  FROM events GROUP BY 1, 2
), w AS (
  SELECT a.source, a.rn, b.v AS nb
  FROM r a JOIN r b ON a.source = b.source
                   AND b.rn BETWEEN a.rn - 3 AND a.rn + 3
), med AS (
  SELECT source, rn, quantile_cont(nb, 0.5) AS med
  FROM w GROUP BY source, rn
), mad AS (
  SELECT w.source, w.rn, quantile_cont(abs(w.nb - med.med), 0.5) AS mad
  FROM w JOIN med ON w.source = med.source AND w.rn = med.rn
  GROUP BY w.source, w.rn
)
SELECT r.source, r.bucket_start, r.v AS value,
       med.med AS rolling_med, mad.mad AS rolling_mad
FROM r
JOIN med ON r.source = med.source AND r.rn = med.rn
JOIN mad ON r.source = mad.source AND r.rn = mad.rn
WHERE abs(r.v - med.med) > 4.4478 * mad.mad
"""


def theil_sen_trend(sf_dir: str):
    """Robust per-source trend: the Theil–Sen estimator (median of all
    pairwise slopes) over the hourly sums, with positional x (bucket
    rank in time order) — the robust complement to the OLS-based
    Dickey–Fuller regression in ``dickey_fuller_by_source``.  Slopes
    materialize per series as one n×n numpy broadcast (bounded by tier
    retention: 720 buckets → 260k slopes ≈ 2 MB); the median is the
    DuckDB-bit-parity ``quantile_cont`` lerp, so no tolerance needed."""
    from ..functions.stats import quantile_cont
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def trend(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["event_type", "bucket_start"],
                                  kind="stable")
        rows = []
        for src, g in shard.groupby("event_type", sort=False):
            v = _round_exact(g["sum_value"].to_numpy(dtype=np.float64))
            n = v.size
            idx = np.arange(n, dtype=np.float64)
            dv = v[None, :] - v[:, None]       # v_j - v_i
            di = idx[None, :] - idx[:, None]   # j - i
            iu = np.triu_indices(n, k=1)
            slopes = dv[iu] / di[iu]
            if not slopes.size:
                # single-bucket source: no pair, no slope — the
                # oracle's pair join emits no row either
                continue
            rows.append({
                "source": src,
                "slope": round(float(quantile_cont(slopes, 0.5)), 6),
                "n_pairs": int(slopes.size),
            })
        return pd.DataFrame(rows, columns=["source", "slope", "n_pairs"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", trend,
    )


_THEIL_SEN_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         round(sum(value), 4) AS v,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY date_trunc('hour', ts)) AS idx
  FROM events GROUP BY 1, 2
), s AS (
  SELECT a.source, (b.v - a.v) / CAST(b.idx - a.idx AS DOUBLE) AS slope
  FROM r a JOIN r b ON a.source = b.source AND b.idx > a.idx
)
SELECT source, round(quantile_cont(slope, 0.5), 6) AS slope,
       count(*) AS n_pairs
FROM s GROUP BY source
"""


def holt_linear_hourly(sf_dir: str):
    """Holt double-exponential smoothing (level + linear trend) of the
    hourly sums per source — the forecasting primitive one step past
    EWMA.  Init l₀=v₀, b₀=0; then l_i = α·v + (1-α)·(l+b),
    b_i = β·(l_i - l_{i-1}) + (1-β)·b — with α=0.5, β=0.25 (both exactly
    representable doubles) every step is the identical FP expression in
    both engines, so level/trend are bit-equal to the recursive-CTE
    oracle.  Sequential per series, parallel across series."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def smooth(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["event_type", "bucket_start"],
                                  kind="stable")
        out = []
        for src, g in shard.groupby("event_type", sort=False):
            v = _round_exact(g["sum_value"].to_numpy(dtype=np.float64))
            lev = np.empty_like(v)
            tr = np.empty_like(v)
            if v.size:
                lev[0], tr[0] = v[0], 0.0
                for i in range(1, v.size):
                    l_new = 0.5 * v[i] + 0.5 * (lev[i - 1] + tr[i - 1])
                    tr[i] = 0.25 * (l_new - lev[i - 1]) + 0.75 * tr[i - 1]
                    lev[i] = l_new
            out.append(pd.DataFrame({
                "source": src,
                "bucket_start": g["bucket_start"].to_numpy(),
                "value": v, "level": lev, "trend": tr,
            }))
        return pd.concat(out, ignore_index=True)

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", smooth,
    )


_HOLT_ORACLE = """
WITH RECURSIVE r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         round(sum(value), 4) AS v,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY date_trunc('hour', ts)) AS idx
  FROM events GROUP BY 1, 2
), e AS (
  SELECT source, bucket_start, idx, v, v AS level,
         CAST(0 AS DOUBLE) AS trend
  FROM r WHERE idx = 1
  UNION ALL
  SELECT r.source, r.bucket_start, r.idx, r.v,
         0.5 * r.v + 0.5 * (e.level + e.trend),
         0.25 * ((0.5 * r.v + 0.5 * (e.level + e.trend)) - e.level)
           + 0.75 * e.trend
  FROM r JOIN e ON r.source = e.source AND r.idx = e.idx + 1
)
SELECT source, bucket_start, v AS value, level, trend FROM e
"""


def rate_of_change_1h(sf_dir: str):
    """Derivative operator: per-source delta and per-second rate between
    consecutive OBSERVED hourly buckets (gaps widen the denominator
    rather than being imputed — the raw-counter shape of a `rate()`
    primitive).  Delta/rate are a subtract and one divide on the same
    rounded doubles in both engines, so bit-equal to the lag() oracle."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def deriv(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["event_type", "bucket_start"],
                                  kind="stable")
        out = []
        for src, g in shard.groupby("event_type", sort=False):
            v = _round_exact(g["sum_value"].to_numpy(dtype=np.float64))
            ts = g["bucket_start"].to_numpy()
            delta = np.full(v.size, np.nan)
            rate = np.full(v.size, np.nan)
            if v.size > 1:
                delta[1:] = v[1:] - v[:-1]
                tsec = ts.astype("datetime64[s]").astype(np.int64)
                rate[1:] = delta[1:] / (tsec[1:] - tsec[:-1]).astype(
                    np.float64)
            out.append(pd.DataFrame({
                "source": src, "bucket_start": ts, "value": v,
                "delta": delta, "rate_per_s": rate,
            }))
        return pd.concat(out, ignore_index=True)

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", deriv,
    )


_RATE_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         round(sum(value), 4) AS v
  FROM events GROUP BY 1, 2
)
SELECT source, bucket_start, v AS value,
       v - lag(v) OVER w AS delta,
       (v - lag(v) OVER w)
         / CAST(date_diff('second', lag(bucket_start) OVER w,
                          bucket_start) AS DOUBLE) AS rate_per_s
FROM r WINDOW w AS (PARTITION BY source ORDER BY bucket_start)
"""


def gap_analysis(sf_dir: str):
    """Heartbeat / liveness audit per source over the hourly tier:
    bucket count, span, expected buckets on the 1h grid, missing count,
    number of gaps and the widest gap.  All-integer except coverage
    (one int→double divide, identical both sides)."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def gaps(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["event_type", "bucket_start"],
                                  kind="stable")
        rows = []
        for src, g in shard.groupby("event_type", sort=False):
            tsec = g["bucket_start"].to_numpy().astype(
                "datetime64[s]").astype(np.int64)
            d = np.diff(tsec)
            expected = int((tsec[-1] - tsec[0]) // 3600 + 1)
            rows.append({
                "source": src,
                "n_buckets": int(tsec.size),
                "first_bucket": g["bucket_start"].iloc[0],
                "last_bucket": g["bucket_start"].iloc[-1],
                "expected_buckets": expected,
                "n_missing": expected - int(tsec.size),
                "n_gaps": int((d > 3600).sum()),
                "max_gap_s": int(d.max()) if d.size else 0,
                "coverage": float(tsec.size) / float(expected),
            })
        return pd.DataFrame(rows, columns=[
            "source", "n_buckets", "first_bucket", "last_bucket",
            "expected_buckets", "n_missing", "n_gaps", "max_gap_s",
            "coverage"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start"]),
        "event_type", gaps,
    )


_GAP_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start
  FROM events GROUP BY 1, 2
), d AS (
  SELECT source, bucket_start,
         date_diff('second',
                   lag(bucket_start) OVER (PARTITION BY source
                                           ORDER BY bucket_start),
                   bucket_start) AS gap
  FROM r
)
SELECT source, count(*) AS n_buckets,
       min(bucket_start) AS first_bucket,
       max(bucket_start) AS last_bucket,
       date_diff('second', min(bucket_start), max(bucket_start)) // 3600
         + 1 AS expected_buckets,
       date_diff('second', min(bucket_start), max(bucket_start)) // 3600
         + 1 - count(*) AS n_missing,
       count(*) FILTER (gap > 3600) AS n_gaps,
       coalesce(max(gap), 0) AS max_gap_s,
       CAST(count(*) AS DOUBLE)
         / CAST(date_diff('second', min(bucket_start), max(bucket_start))
                // 3600 + 1 AS DOUBLE) AS coverage
FROM d GROUP BY source
"""


def alert_episodes(sf_dir: str):
    """Gaps-and-islands over the IQR flags: consecutive flagged hourly
    buckets per source collapse into alert episodes with start/end,
    length, peak and total flagged value — the alert-dedup step every
    monitoring pipeline runs after point detection.  Consumes the same
    detector stage as ``iqr_flags_1h`` and re-shards its (small) flag
    output per source."""
    from ..stages.shard import sharded_map_groups

    flags = iqr_flags_1h(sf_dir)

    def episodes(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["source", "bucket_start"],
                                  kind="stable")
        out = []
        for src, g in shard.groupby("source", sort=False):
            ts = g["bucket_start"].to_numpy()
            tsec = ts.astype("datetime64[s]").astype(np.int64)
            new = np.ones(tsec.size, dtype=bool)
            new[1:] = (tsec[1:] - tsec[:-1]) != 3600
            eid = np.cumsum(new)
            v = g["value"].to_numpy(dtype=np.float64)
            df = pd.DataFrame({"eid": eid, "ts": ts, "v": v})
            agg = df.groupby("eid", sort=False).agg(
                episode_start=("ts", "min"), episode_end=("ts", "max"),
                n_buckets=("v", "size"), peak_value=("v", "max"),
                total_value=("v", "sum")).reset_index(drop=True)
            agg["total_value"] = _round_exact(
                agg["total_value"].to_numpy(dtype=np.float64))
            agg.insert(0, "source", src)
            out.append(agg)
        if not out:
            return pd.DataFrame(columns=[
                "source", "episode_start", "episode_end", "n_buckets",
                "peak_value", "total_value"])
        return pd.concat(out, ignore_index=True)

    return sharded_map_groups(flags, "source", episodes)


_EPISODES_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         sum(value) AS v
  FROM events GROUP BY 1, 2
), q AS (
  SELECT source, quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3
  FROM r GROUP BY source
), f AS (
  SELECT r.source, r.bucket_start, round(r.v, 4) AS v
  FROM r JOIN q USING (source)
  WHERE r.v < q.q1 - 1.5 * (q.q3 - q.q1) OR r.v > q.q3 + 1.5 * (q.q3 - q.q1)
), g AS (
  SELECT source, bucket_start, v,
         date_diff('hour', TIMESTAMP '1970-01-01', bucket_start)
           - row_number() OVER (PARTITION BY source
                                ORDER BY bucket_start) AS grp
  FROM f
)
SELECT source, min(bucket_start) AS episode_start,
       max(bucket_start) AS episode_end, count(*) AS n_buckets,
       max(v) AS peak_value, round(sum(v), 4) AS total_value
FROM g GROUP BY source, grp
"""


def ohlc_hourly(sf_dir: str):
    """OHLC candle downsample: per (source, hourly bucket) the first /
    max / min / last raw value, ordered by (ts, event_id) so ties on ts
    are deterministic.  Open/close carry their order keys through the
    partial aggregate so the shard reduce picks the global first/last —
    no raw-row shuffle, only per-(source,bucket) partials move.  All
    outputs are untouched input doubles or integer counts: bit-exact by
    construction."""
    from ..stages.shard import sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="stable")
        df["bucket_start"] = df["ts"].dt.floor("h")
        g = df.groupby(["event_type", "bucket_start"], sort=False)
        return g.agg(
            open=("value", "first"), close=("value", "last"),
            low=("value", "min"), high=("value", "max"),
            n_points=("value", "size"),
            open_ts=("ts", "first"), open_id=("event_id", "first"),
            close_ts=("ts", "last"), close_id=("event_id", "last"),
        ).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=65536)

    def reduce_shard(df: pd.DataFrame) -> pd.DataFrame:
        keys = ["event_type", "bucket_start"]
        df = df.sort_values(["open_ts", "open_id"], kind="stable")
        opens = df.groupby(keys, sort=False)["open"].first()
        df2 = df.sort_values(["close_ts", "close_id"], kind="stable")
        closes = df2.groupby(keys, sort=False)["close"].last()
        rest = df.groupby(keys).agg(
            low=("low", "min"), high=("high", "max"),
            n_points=("n_points", "sum"))
        out = rest.join(opens).join(closes).reset_index()
        out = out.rename(columns={"event_type": "source"})
        return out[["source", "bucket_start", "open", "high", "low",
                    "close", "n_points"]]

    return sharded_map_groups(partials, "event_type", reduce_shard)


_OHLC_ORACLE = """
SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
       first(value ORDER BY ts, event_id) AS open,
       max(value) AS high, min(value) AS low,
       last(value ORDER BY ts, event_id) AS close,
       count(*) AS n_points
FROM events GROUP BY 1, 2
"""


def acf_by_source(sf_dir: str, max_lag: int = 3):
    """Sample autocorrelation of the hourly sums at lags 1..max_lag per
    source (the seasonality/persistence diagnostic behind period
    inference).  r_k = Σ(v_i−μ)(v_{i+k}−μ) / Σ(v_i−μ)² over the observed
    buckets in time order, μ = the 4-dp-rounded mean; outputs rounded to
    6 dp on both sides to absorb summation-order last-bit drift.
    NOTE: the paired oracle SQL hardcodes lags [1, 2, 3] — a
    non-default ``max_lag`` is a library call, not oracle-checked."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def acf(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["event_type", "bucket_start"],
                                  kind="stable")
        rows = []
        for src, g in shard.groupby("event_type", sort=False):
            v = _round_exact(g["sum_value"].to_numpy(dtype=np.float64))
            # rounded-total / count with NO outer round (the
            # _finalize_rollup rule): rounding the order-divergent mean
            # itself can flip a half-tie and shift every dv
            mu = _round_exact(np.array([v.sum()]))[0] / v.size
            dv = v - mu
            den = float(np.dot(dv, dv))
            for k in range(1, max_lag + 1):
                if v.size <= k:
                    continue  # no (i, i+k) pairs — oracle emits no row
                num = float(np.dot(dv[:-k], dv[k:]))
                rows.append({
                    "source": src, "lag": k,
                    "acf": round(num / den, 6) if den > 0 else np.nan,
                    "n_obs": int(v.size),
                })
        return pd.DataFrame(rows, columns=["source", "lag", "acf", "n_obs"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", acf,
    )


_ACF_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         round(sum(value), 4) AS v,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY date_trunc('hour', ts)) AS idx
  FROM events GROUP BY 1, 2
), m AS (
  SELECT source, round(sum(v), 4) / count(*) AS mu, count(*) AS n_obs
  FROM r GROUP BY source
), d AS (
  SELECT r.source, r.idx, r.v - m.mu AS dv, m.n_obs
  FROM r JOIN m USING (source)
), den AS (
  SELECT source, sum(dv * dv) AS s2 FROM d GROUP BY source
), lags AS (SELECT unnest([1, 2, 3]) AS lag)
SELECT a.source, lags.lag,
       round(sum(a.dv * b.dv) / any_value(den.s2), 6) AS acf,
       any_value(a.n_obs) AS n_obs
FROM d a
CROSS JOIN lags
JOIN d b ON b.source = a.source AND b.idx = a.idx + lags.lag
JOIN den ON den.source = a.source
GROUP BY a.source, lags.lag
"""


def seasonal_naive_error(sf_dir: str):
    """Forecast-skill audit: the seasonal-naive predictor v̂(t) = v(t−24h)
    evaluated wherever the same hour of the previous day was observed —
    per-source MAE/RMSE and match counts (the baseline every detector's
    band must beat).  Per-series self-merge on the shifted timestamp;
    errors are subtractions of 4-dp doubles, aggregates rounded to 6."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def err(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["event_type", "bucket_start"],
                                  kind="stable")
        rows = []
        for src, g in shard.groupby("event_type", sort=False):
            v = _round_exact(g["sum_value"].to_numpy(dtype=np.float64))
            ts = g["bucket_start"].to_numpy().astype("datetime64[s]")
            prev = pd.Series(v, index=ts)
            want = ts - np.timedelta64(86400, "s")
            hit = prev.index.get_indexer(want)
            ok = hit >= 0
            e = v[ok] - v[hit[ok]]
            n = int(ok.sum())
            rows.append({
                "source": src,
                "n_obs": int(v.size),
                "n_matched": n,
                "mae": round(float(np.abs(e).sum()) / n, 6) if n else np.nan,
                "rmse": round(float(np.sqrt(np.dot(e, e) / n)), 6)
                if n else np.nan,
            })
        return pd.DataFrame(rows, columns=[
            "source", "n_obs", "n_matched", "mae", "rmse"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", err,
    )


_SEASONAL_NAIVE_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         round(sum(value), 4) AS v
  FROM events GROUP BY 1, 2
), j AS (
  SELECT a.source, a.v - b.v AS e
  FROM r a JOIN r b
    ON b.source = a.source
   AND b.bucket_start = a.bucket_start - INTERVAL 24 HOUR
), n AS (SELECT source, count(*) AS n_obs FROM r GROUP BY source)
SELECT n.source, n.n_obs, count(j.e) AS n_matched,
       round(sum(abs(j.e)) / count(j.e), 6) AS mae,
       round(sqrt(sum(j.e * j.e) / count(j.e)), 6) AS rmse
FROM n LEFT JOIN j ON j.source = n.source
GROUP BY n.source, n.n_obs
"""


_ENTROPY_ORACLE = """
WITH words AS (
  SELECT lang, w
  FROM documents, unnest(string_split(lower(text), ' ')) AS t(w)
  WHERE w <> ''
), c AS (
  SELECT lang, w, count(*) AS c FROM words GROUP BY 1, 2
), tot AS (
  SELECT lang, sum(c) AS total, count(*) AS n_distinct FROM c GROUP BY lang
)
SELECT c.lang, CAST(any_value(tot.total) AS BIGINT) AS n_tokens,
       any_value(tot.n_distinct) AS n_distinct,
       round(-sum((c.c / tot.total) * log2(c.c / tot.total)), 6)
         AS entropy_bits
FROM c JOIN tot USING (lang)
GROUP BY c.lang
"""


def benford_first_digit(sf_dir: str):
    """Benford first-significant-digit audit of event values per source —
    the classic fabricated/templated-data screen for ingest QA.  The
    value is fixed to 4 decimals by ``floor(|v|·10⁴)`` (floor, not
    round: identical IEEE multiply+floor both sides; no half-tie rule in
    play), the leading digit of that integer is found with a
    searchsorted against powers of ten (integer-exact), and the Benford
    expectation log10(1+1/d) is rounded to 6 dp on both sides."""
    from ..stages.shard import sharded_map_groups

    ds = _events(sf_dir).select_columns(["event_type", "value"])
    pow10 = 10 ** np.arange(19, dtype=np.int64)

    def digit_counts(batch: pd.DataFrame) -> pd.DataFrame:
        scaled = np.floor(np.abs(batch["value"].to_numpy(dtype=np.float64))
                          * 10000.0)
        keep = scaled >= 1.0
        n = scaled[keep].astype(np.int64)
        if not n.size:
            return pd.DataFrame({"source": [], "digit": [], "c": []})
        digit = n // pow10[np.searchsorted(pow10, n, side="right") - 1]
        df = pd.DataFrame({"source": batch["event_type"].to_numpy()[keep],
                           "digit": digit})
        return df.groupby(["source", "digit"], as_index=False).size().rename(
            columns={"size": "c"})

    partials = ds.map_batches(digit_counts, batch_format="pandas")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        counts = shard.groupby(["source", "digit"])["c"].sum()
        rows = []
        for src, g in counts.groupby(level="source", sort=False):
            tot = float(g.sum())
            for (_, d), c in g.items():
                rows.append({
                    "source": src, "digit": int(d), "n_values": int(c),
                    "share": float(c) / tot,
                    "benford_expected": round(math.log10(1.0 + 1.0 / d), 6),
                })
        return pd.DataFrame(rows, columns=[
            "source", "digit", "n_values", "share", "benford_expected"])

    return sharded_map_groups(partials, "source", fold)


_BENFORD_ORACLE = """
WITH v AS (
  SELECT event_type AS source,
         CAST(floor(abs(value) * 10000) AS BIGINT) AS n
  FROM events WHERE abs(value) * 10000 >= 1
), d AS (
  SELECT source, CAST(substr(CAST(n AS VARCHAR), 1, 1) AS INT) AS digit
  FROM v
), c AS (
  SELECT source, digit, count(*) AS n_values FROM d GROUP BY 1, 2
), t AS (SELECT source, sum(n_values) AS tot FROM c GROUP BY source)
SELECT c.source, c.digit, c.n_values,
       CAST(c.n_values AS DOUBLE) / t.tot AS share,
       round(log10(1.0 + 1.0 / c.digit), 6) AS benford_expected
FROM c JOIN t USING (source)
"""


def fano_burstiness(sf_dir: str):
    """Burstiness audit: the Fano factor (variance/mean) of per-minute
    event counts per source over the observed minutes.  Poisson arrivals
    give 1.0; >1 is bursty, <1 is metronomic.  All moments are integer
    sums (S=Σc, Q=Σc², n) folded associatively, so the only float ops
    are the two final divides — written in the identical order on both
    sides: mean = S/n, fano = (Q − S·S/n)/S."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1m")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in shard.groupby("event_type", sort=False):
            c = g["n_points"].to_numpy(dtype=np.int64)
            n, s, q = int(c.size), int(c.sum()), int((c * c).sum())
            rows.append({
                "source": src, "n_minutes": n, "n_events": s,
                "mean_per_min": float(s) / n,
                "fano": (q - float(s) * s / n) / s,
            })
        return pd.DataFrame(rows, columns=[
            "source", "n_minutes", "n_events", "mean_per_min", "fano"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "n_points"]), "event_type", fold)


_FANO_ORACLE = """
WITH m AS (
  SELECT event_type AS source, date_trunc('minute', ts) AS b,
         count(*) AS c
  FROM events GROUP BY 1, 2
), s AS (
  SELECT source, count(*) AS n_minutes, sum(c) AS n_events,
         sum(c * c) AS q
  FROM m GROUP BY source
)
SELECT source, n_minutes, CAST(n_events AS BIGINT) AS n_events,
       CAST(n_events AS DOUBLE) / n_minutes AS mean_per_min,
       (q - CAST(n_events AS DOUBLE) * n_events / n_minutes)
         / n_events AS fano
FROM s
"""


def weekday_profile(sf_dir: str):
    """Weekday-vs-weekend load profile per source over the hourly tier:
    bucket counts, total and mean hourly volume for each day class — the
    calendar-seasonality summary behind capacity planning.  Sums are of
    4-dp-rounded bucket values; outer rounding to 4/6 dp absorbs
    summation-order last-bit drift."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.copy()
        shard["v"] = _round_exact(
            shard["sum_value"].to_numpy(dtype=np.float64))
        # pandas dayofweek: 0=Mon..6=Sun → weekend = {5, 6}
        shard["is_weekend"] = (
            pd.DatetimeIndex(shard["bucket_start"]).dayofweek >= 5
        ).astype(np.int64)
        rows = []
        for (src, wk), g in shard.groupby(["event_type", "is_weekend"],
                                          sort=False):
            v = g["v"].to_numpy(dtype=np.float64)
            # mean = rounded-total / count with NO outer round: dividing
            # the identical 4-dp double by the same integer is
            # bit-deterministic, while a second round() can sit on a
            # half-tie seeded by summation-order drift (hit at sf0.1)
            total = _round_exact(np.array([v.sum()]))[0]
            rows.append({
                "source": src, "is_weekend": int(wk),
                "n_buckets": int(v.size),
                "total_value": total,
                "mean_bucket_value": total / v.size,
            })
        return pd.DataFrame(rows, columns=[
            "source", "is_weekend", "n_buckets", "total_value",
            "mean_bucket_value"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_WEEKDAY_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         round(sum(value), 4) AS v
  FROM events GROUP BY 1, 2
)
SELECT source,
       CASE WHEN dayofweek(bucket_start) IN (0, 6) THEN 1 ELSE 0
         END AS is_weekend,
       count(*) AS n_buckets,
       round(sum(v), 4) AS total_value,
       round(sum(v), 4) / count(*) AS mean_bucket_value
FROM r GROUP BY 1, 2
"""


def updown_transitions(sf_dir: str):
    """Momentum persistence: classify each consecutive-bucket step of
    the hourly series as up (v > previous) or down/flat, then count the
    four (previous step, this step) transition pairs per source — the
    lag-1 Markov summary of trend persistence.  Comparisons are between
    identical 4-dp doubles, counts are integers; fully exact."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["event_type", "bucket_start"],
                                  kind="stable")
        rows = []
        for src, g in shard.groupby("event_type", sort=False):
            v = _round_exact(g["sum_value"].to_numpy(dtype=np.float64))
            if v.size < 2:
                continue  # no steps — oracle emits no row
            up = (v[1:] > v[:-1]).astype(np.int64)
            prev, cur = up[:-1], up[1:]
            rows.append({
                "source": src,
                "n_steps": int(up.size),
                "n_uu": int(((prev == 1) & (cur == 1)).sum()),
                "n_ud": int(((prev == 1) & (cur == 0)).sum()),
                "n_du": int(((prev == 0) & (cur == 1)).sum()),
                "n_dd": int(((prev == 0) & (cur == 0)).sum()),
            })
        return pd.DataFrame(rows, columns=[
            "source", "n_steps", "n_uu", "n_ud", "n_du", "n_dd"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_UPDOWN_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         round(sum(value), 4) AS v
  FROM events GROUP BY 1, 2
), s AS (
  SELECT source, bucket_start, v,
         lag(v) OVER (PARTITION BY source ORDER BY bucket_start) AS pv
  FROM r
), st AS (
  SELECT source, bucket_start,
         CASE WHEN v > pv THEN 1 ELSE 0 END AS up
  FROM s WHERE pv IS NOT NULL
), p AS (
  SELECT source, up,
         lag(up) OVER (PARTITION BY source ORDER BY bucket_start) AS pup
  FROM st
)
SELECT source, count(*) AS n_steps,
       count(*) FILTER (pup = 1 AND up = 1) AS n_uu,
       count(*) FILTER (pup = 1 AND up = 0) AS n_ud,
       count(*) FILTER (pup = 0 AND up = 1) AS n_du,
       count(*) FILTER (pup = 0 AND up = 0) AS n_dd
FROM p GROUP BY source
"""


def interarrival_stats(sf_dir: str):
    """Inter-arrival-time audit per source over the raw event stream:
    gap count, mean gap (seconds), min/max gap (µs, integer-exact) and
    the number of simultaneous arrivals.  Consecutive differences of a
    sorted multiset don't depend on tie order, so sorting by ts alone is
    deterministic.  The gap sum is an exact int64 (µs); the only float
    op is the final mean divide, same order both sides (S/m/1e6).

    Partitioning assumption (same as the detector stages): one source's
    event timestamps fit in one shard — sources are coarse entities
    (event types / tenants), not unbounded keys."""
    from ..stages.shard import sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts"])

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in shard.groupby("event_type", sort=False):
            us = np.sort(g["ts"].to_numpy().astype("datetime64[us]")
                         .astype(np.int64))
            d = np.diff(us)
            m = int(d.size)
            rows.append({
                "source": src,
                "n_events": int(us.size),
                "n_gaps": m,
                "mean_gap_s": float(d.sum()) / m / 1e6 if m else np.nan,
                "min_gap_us": int(d.min()) if m else 0,
                "max_gap_us": int(d.max()) if m else 0,
                "n_simultaneous": int((d == 0).sum()),
            })
        return pd.DataFrame(rows, columns=[
            "source", "n_events", "n_gaps", "mean_gap_s", "min_gap_us",
            "max_gap_us", "n_simultaneous"])

    return sharded_map_groups(ds, "event_type", fold)


_INTERARRIVAL_ORACLE = """
WITH s AS (
  SELECT event_type AS source, ts,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY event_type ORDER BY ts),
                   ts) AS d
  FROM events
)
SELECT source, count(*) AS n_events, count(d) AS n_gaps,
       CAST(sum(d) AS DOUBLE) / count(d) / 1e6 AS mean_gap_s,
       coalesce(min(d), 0) AS min_gap_us,
       coalesce(max(d), 0) AS max_gap_us,
       count(*) FILTER (d = 0) AS n_simultaneous
FROM s GROUP BY source
"""


def source_correlation(sf_dir: str):
    """Pairwise Pearson correlation between the sources' hourly series
    over their COMMON buckets (inner join on bucket) — the co-movement
    matrix behind fleet-wide incident triage.  Distribution: the hourly
    tier is sharded by BUCKET, each shard emits per-pair partial moments
    (n, Σx, Σy, Σxy, Σx², Σy²) from a within-shard self-merge, and a
    second (tiny) exchange folds the moments; the driver never holds the
    series.  ρ is computed with the explicit-moment formula written in
    the same op order as the oracle SQL; rounded to 6 dp (partial-sum
    order drift ~1e-12 of |ρ|≤1).

    Partitioning assumption: all-pairs correlation is inherently
    O(sources²) — this operator is for bounded source panels (fleets,
    tenants, service groups).  At unbounded source cardinality, pick a
    reference set and correlate against it (the broadcast pattern of
    ann_topk) instead of self-merging per bucket."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def pair_partials(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.copy()
        shard["v"] = _round_exact(
            shard["sum_value"].to_numpy(dtype=np.float64))
        j = shard.merge(shard, on="bucket_start", suffixes=("_a", "_b"))
        j = j[j["event_type_a"] < j["event_type_b"]]
        if not len(j):
            # full column list incl. the min/max constancy guards —
            # a stale shorter list broke the downstream fold's named
            # aggs on the all-empty path (minimal-corpus sweep)
            return pd.DataFrame(columns=[
                "source_a", "source_b", "n", "sx", "sy", "sxy", "sxx",
                "syy", "mnx", "mxx", "mny", "mxy"])
        x = j["v_a"].to_numpy(dtype=np.float64)
        y = j["v_b"].to_numpy(dtype=np.float64)
        out = pd.DataFrame({
            "source_a": j["event_type_a"].to_numpy(),
            "source_b": j["event_type_b"].to_numpy(),
            "n": 1, "sx": x, "sy": y, "sxy": x * y, "sxx": x * x,
            "syy": y * y, "mnx": x, "mxx": x, "mny": y, "mxy": y})
        return out.groupby(["source_a", "source_b"], as_index=False).agg(
            n=("n", "sum"), sx=("sx", "sum"), sy=("sy", "sum"),
            sxy=("sxy", "sum"), sxx=("sxx", "sum"), syy=("syy", "sum"),
            mnx=("mnx", "min"), mxx=("mxx", "max"),
            mny=("mny", "min"), mxy=("mxy", "max"))

    partials = sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "bucket_start", pair_partials)

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        agg = shard.groupby(["source_a", "source_b"], as_index=False).agg(
            n=("n", "sum"), sx=("sx", "sum"), sy=("sy", "sum"),
            sxy=("sxy", "sum"), sxx=("sxx", "sum"), syy=("syy", "sum"),
            mnx=("mnx", "min"), mxx=("mxx", "max"),
            mny=("mny", "min"), mxy=("mxy", "max"))
        n = agg["n"].to_numpy(dtype=np.float64)
        sx = agg["sx"].to_numpy(dtype=np.float64)
        sy = agg["sy"].to_numpy(dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            rho = ((agg["sxy"].to_numpy() - sx * sy / n)
                   / np.sqrt((agg["sxx"].to_numpy() - sx * sx / n)
                             * (agg["syy"].to_numpy() - sy * sy / n)))
        # constancy guard: an EXACT min == max comparison (no float
        # arithmetic, so bit-identical to the oracle's CASE) — a
        # constant side has no defined correlation; the fuzz gate's
        # stuck-sensor source pins this branch
        const = ((agg["mnx"].to_numpy() == agg["mxx"].to_numpy())
                 | (agg["mny"].to_numpy() == agg["mxy"].to_numpy()))
        rho = np.where(const, np.nan, rho)
        return pd.DataFrame({
            "source_a": agg["source_a"], "source_b": agg["source_b"],
            "n_common": agg["n"].astype(np.int64),
            "pearson": _round_exact(rho, 6)})

    return sharded_map_groups(partials, "source_a", fold)


_SOURCE_CORR_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         round(sum(value), 4) AS v
  FROM events GROUP BY 1, 2
), j AS (
  SELECT a.source AS sa, b.source AS sb, a.v AS x, b.v AS y
  FROM r a JOIN r b
    ON b.bucket_start = a.bucket_start AND a.source < b.source
), s AS (
  SELECT sa, sb, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy,
         min(x) AS mnx, max(x) AS mxx, min(y) AS mny, max(y) AS mxy
  FROM j GROUP BY 1, 2
)
SELECT sa AS source_a, sb AS source_b, n AS n_common,
       CASE WHEN mnx = mxx OR mny = mxy THEN NULL ELSE
         round((sxy - sx * sy / n)
               / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)
       END AS pearson
FROM s
"""


def reference_correlation(sf_dir: str):
    """Each source's Pearson correlation against the FLEET-TOTAL hourly
    series — the broadcast-reference scale path documented in
    ``source_correlation`` for unbounded source counts: O(sources)
    work, no pairwise explosion.  One bucket-keyed exchange co-locates
    a bucket's rows so the 4-dp total attaches in-shard; a second
    source-keyed exchange folds the explicit moments.  The source's own
    contribution is included in the total (fleet-vs-aggregate
    co-movement, the standard triage framing)."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def attach_total(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.copy()
        shard["x"] = _round_exact(
            shard["sum_value"].to_numpy(dtype=np.float64))
        totals = shard.groupby("bucket_start")["x"].sum()
        shard["y"] = _round_exact(
            totals.reindex(shard["bucket_start"]).to_numpy())
        return shard[["event_type", "x", "y"]].rename(
            columns={"event_type": "source"})

    joined = sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "bucket_start", attach_total)

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in shard.groupby("source", sort=False):
            x = g["x"].to_numpy(dtype=np.float64)
            y = g["y"].to_numpy(dtype=np.float64)
            n = float(x.size)
            if x.min() == x.max() or y.min() == y.max():
                # constancy guard: EXACT min == max (no float
                # arithmetic) — matches the oracle's CASE branch
                rho = np.nan
            else:
                with np.errstate(invalid="ignore", divide="ignore"):
                    rho = ((float((x * y).sum()) - x.sum() * y.sum() / n)
                           / math.sqrt((float((x * x).sum())
                                        - x.sum() * x.sum() / n)
                                       * (float((y * y).sum())
                                          - y.sum() * y.sum() / n)))
                rho = round(rho, 6)
            rows.append({
                "source": src, "n_buckets": int(x.size),
                "pearson_vs_total": rho,
            })
        return pd.DataFrame(rows, columns=[
            "source", "n_buckets", "pearson_vs_total"])

    return sharded_map_groups(joined, "source", fold)


_REF_CORR_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         round(sum(value), 4) AS x
  FROM events GROUP BY 1, 2
), t AS (
  SELECT bucket_start, round(sum(x), 4) AS y FROM r GROUP BY 1
), j AS (
  SELECT r.source, r.x, t.y FROM r JOIN t USING (bucket_start)
), s AS (
  SELECT source, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy,
         min(x) AS mnx, max(x) AS mxx, min(y) AS mny, max(y) AS mxy
  FROM j GROUP BY source
)
SELECT source, n AS n_buckets,
       CASE WHEN mnx = mxx OR mny = mxy THEN NULL ELSE
         round((sxy - sx * sy / n)
               / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)
       END AS pearson_vs_total
FROM s
"""


def seasonality_strength(sf_dir: str):
    """Hour-of-day seasonality strength per source: the fraction of the
    hourly series' variance explained by the 24-slot hour-of-day profile
    (between-group SS / total SS, the one-way-ANOVA R²).  ≈1 means a
    pure daily cycle, ≈0 means no calendar structure — the signal that
    decides whether the STL/seasonal-ESD detectors apply.  Explicit
    sum-of-squares formula in identical op order both sides."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.copy()
        shard["v"] = _round_exact(
            shard["sum_value"].to_numpy(dtype=np.float64))
        rows = []
        for src, g in shard.groupby("event_type", sort=False):
            v = g["v"].to_numpy(dtype=np.float64)
            hour = pd.DatetimeIndex(g["bucket_start"]).hour.to_numpy()
            n = float(v.size)
            grand = v.sum() * v.sum() / n
            total_ss = float((v * v).sum() - grand)
            hs = pd.Series(v).groupby(hour).agg(["sum", "size"])
            between_ss = float(
                (hs["sum"].to_numpy() ** 2 / hs["size"].to_numpy()).sum()
                - grand)
            rows.append({
                "source": src,
                "n_buckets": int(v.size),
                "n_slots": int(len(hs)),
                "strength": round(between_ss / total_ss, 6)
                if total_ss > 0 else np.nan,
            })
        return pd.DataFrame(rows, columns=[
            "source", "n_buckets", "n_slots", "strength"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_SEASONALITY_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         round(sum(value), 4) AS v
  FROM events GROUP BY 1, 2
), h AS (
  SELECT source, hour(bucket_start) AS hh, sum(v) AS s, count(*) AS c
  FROM r GROUP BY 1, 2
), t AS (
  SELECT source, count(*) AS n_buckets, sum(v) AS sv,
         sum(v * v) AS svv
  FROM r GROUP BY source
), b AS (
  SELECT source, count(*) AS n_slots, sum(s * s / c) AS bss
  FROM h GROUP BY source
)
SELECT t.source, t.n_buckets, b.n_slots,
       CASE WHEN svv - sv * sv / n_buckets > 0 THEN
         round((bss - sv * sv / n_buckets)
               / (svv - sv * sv / n_buckets), 6)
       ELSE NULL END AS strength
FROM t JOIN b USING (source)
"""


def winsorized_stats(sf_dir: str):
    """Winsorized robust summary per source: clip the hourly series at
    its own p05/p95 (quantile_cont bit-parity) and report clip counts
    and the raw vs winsorized totals/means — the outlier-robust
    normalization step curation pipelines run before thresholding.
    Totals are 4-dp-rounded sums; means divide the rounded total by the
    count with no outer round (bit-deterministic)."""
    from ..functions.stats import quantile_cont
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in shard.groupby("event_type", sort=False):
            v = _round_exact(g["sum_value"].to_numpy(dtype=np.float64))
            lo, hi = quantile_cont(v, [0.05, 0.95])
            # order-independent totals: unclipped values sum as exact
            # 10^-4-unit integers; the clipped tails contribute
            # n_lo*lo + n_hi*hi (two products + two adds in the fixed
            # shape the oracle repeats) — float accumulation order
            # flipped the 4-dp round on a fuzz corpus
            v4 = np.rint(v * 10000.0).astype(np.int64)
            n_lo = int((v < lo).sum())
            n_hi = int((v > hi).sum())
            # total_raw: an exact 4-decimal quantity, so the 4-dp round
            # is tie-free identity; total_w stays UNROUNDED (lo/hi can
            # be exactly-representable x.03125-type values whose 4-dp
            # round tie-breaks differently across engines)
            mid_sum = float(v4[(v >= lo) & (v <= hi)].sum()) / 10000.0
            total_raw = float(_round_exact(
                np.array([float(v4.sum()) / 10000.0]), 4)[0])
            total_w = mid_sum + n_lo * lo + n_hi * hi
            rows.append({
                "source": src,
                "n_buckets": int(v.size),
                "p05": round(float(lo), 6),
                "p95": round(float(hi), 6),
                "n_clipped_low": n_lo,
                "n_clipped_high": n_hi,
                "total_raw": total_raw,
                "total_winsorized": total_w,
                "mean_raw": total_raw / v.size,
                "mean_winsorized": total_w / v.size,
            })
        return pd.DataFrame(rows, columns=[
            "source", "n_buckets", "p05", "p95", "n_clipped_low",
            "n_clipped_high", "total_raw", "total_winsorized",
            "mean_raw", "mean_winsorized"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_WINSOR_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         round(sum(value), 4) AS v
  FROM events GROUP BY 1, 2
), q AS (
  SELECT source, quantile_cont(v, 0.05) AS lo, quantile_cont(v, 0.95) AS hi
  FROM r GROUP BY source
), w AS (
  -- order-independent totals: unclipped values sum as exact
  -- 10^-4-unit integers, clipped tails contribute n_lo*lo + n_hi*hi
  -- (the engine's identical expression shape)
  SELECT r.source, v, CAST(round(v * 10000) AS BIGINT) AS v4,
         v < lo AS cl, v > hi AS ch, lo, hi
  FROM r JOIN q ON q.source = r.source
)
SELECT source, count(*) AS n_buckets,
       round(any_value(lo), 6) AS p05,
       round(any_value(hi), 6) AS p95,
       count(*) FILTER (cl) AS n_clipped_low,
       count(*) FILTER (ch) AS n_clipped_high,
       round(sum(v4) / 10000.0, 4) AS total_raw,
       COALESCE(sum(v4) FILTER (NOT cl AND NOT ch), 0) / 10000.0
             + count(*) FILTER (cl) * any_value(lo)
             + count(*) FILTER (ch) * any_value(hi)
           AS total_winsorized,
       round(sum(v4) / 10000.0, 4) / count(*) AS mean_raw,
       (COALESCE(sum(v4) FILTER (NOT cl AND NOT ch), 0) / 10000.0
             + count(*) FILTER (cl) * any_value(lo)
             + count(*) FILTER (ch) * any_value(hi))
           / count(*) AS mean_winsorized
FROM w GROUP BY source
"""


def next_day_retention(sf_dir: str):
    """Daily active users + next-day retention per (source, day) — the
    cohort-stickiness table behind every engagement dashboard.  Shape:
    per-batch (source, day, user) dedup partials ride a USER-keyed
    exchange (all copies of a user share a shard, so the triple dedup
    completes there and consecutive-day pairs are visible per user);
    per-(source, day) integer partials then fold in a second tiny
    exchange.  The driver never sees a user id, and the only float op is
    the final rate divide (identical both sides)."""
    from ..stages.shard import sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts", "user_id"])

    def triples(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "source": batch["event_type"],
            "day": batch["ts"].dt.floor("D"),
            "user_id": batch["user_id"],
        })
        return out.drop_duplicates()

    partials = ds.map_batches(triples, batch_format="pandas")

    def per_user(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.drop_duplicates().sort_values(
            ["source", "user_id", "day"], kind="stable")
        dayi = (shard["day"].to_numpy().astype("datetime64[D]")
                .astype(np.int64))
        same = np.zeros(len(shard), dtype=bool)
        if len(shard) > 1:
            same[:-1] = (
                (shard["source"].to_numpy()[:-1]
                 == shard["source"].to_numpy()[1:])
                & (shard["user_id"].to_numpy()[:-1]
                   == shard["user_id"].to_numpy()[1:])
                & (dayi[1:] - dayi[:-1] == 1))
        agg = pd.DataFrame({
            "source": shard["source"].to_numpy(),
            "day": shard["day"].to_numpy(),
            "active": 1,
            "retained": same.astype(np.int64),
        })
        return agg.groupby(["source", "day"], as_index=False).sum()

    counts = sharded_map_groups(partials, "user_id", per_user)

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        agg = shard.groupby(["source", "day"], as_index=False).sum()
        return pd.DataFrame({
            "source": agg["source"],
            "day": agg["day"],
            "active_users": agg["active"].astype(np.int64),
            "retained_next_day": agg["retained"].astype(np.int64),
            "retention_rate": agg["retained"].to_numpy(dtype=np.float64)
            / agg["active"].to_numpy(dtype=np.float64),
        })

    return sharded_map_groups(counts, "source", fold)


def funnel_three_step(sf_dir: str, gap_minutes: int = 30):
    """Three-step ordered funnel WITHIN a session: of all sessions, how
    many contain a view, a click strictly after the first view, and a
    purchase strictly after that first qualifying click — the
    depth-wise conversion census product teams read before any rate.
    Same session rule as ``session_windows``; step chaining uses the
    strict min-timestamp recurrence t₁ = min ts(view),
    t₂ = min ts(click > t₁), t₃ = min ts(purchase > t₂) — pure
    µs-integer comparisons with no tie ambiguity (mins are
    well-defined even under duplicate timestamps).  One user-keyed
    exchange; per-shard counts fold to a single row."""
    from ..stages.shard import sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        user_change = g["user_id"].ne(g["user_id"].shift())
        sid = (user_change | (g["ts"].diff() > gap)).cumsum()
        d = pd.DataFrame({
            "sid": sid.to_numpy(),
            "t": g["event_type"].to_numpy(),
            "us": g["ts"].to_numpy().astype("datetime64[us]")
                  .astype(np.int64)})
        n_sessions = int(d["sid"].nunique())
        v = d[d["t"] == "view"].groupby("sid", as_index=False)["us"].min()
        v = v.rename(columns={"us": "t1"})
        c = d[d["t"] == "click"].merge(v, on="sid")
        c = c[c["us"] > c["t1"]].groupby("sid", as_index=False)["us"].min()
        c = c.rename(columns={"us": "t2"})
        p = d[d["t"] == "purchase"].merge(c, on="sid")
        p = p[p["us"] > p["t2"]].groupby("sid", as_index=False).size()
        return pd.DataFrame({
            "n_sessions": [n_sessions], "n_view": [len(v)],
            "n_view_click": [len(c)], "n_full_funnel": [len(p)]})

    parts = sharded_map_groups(ds, "user_id", fold).to_pandas()
    tot = parts.sum()
    return pd.DataFrame({
        "n_sessions": [int(tot["n_sessions"])],
        "n_view": [int(tot["n_view"])],
        "n_view_click": [int(tot["n_view_click"])],
        "n_full_funnel": [int(tot["n_full_funnel"])]})


_FUNNEL_THREE_STEP_ORACLE = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, event_type,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
), v AS (
  SELECT user_id, sid, min(ts) AS t1 FROM s
  WHERE event_type = 'view' GROUP BY 1, 2
), c AS (
  SELECT s.user_id, s.sid, min(s.ts) AS t2
  FROM s JOIN v ON v.user_id = s.user_id AND v.sid = s.sid
  WHERE s.event_type = 'click' AND s.ts > v.t1 GROUP BY 1, 2
), p AS (
  SELECT s.user_id, s.sid
  FROM s JOIN c ON c.user_id = s.user_id AND c.sid = s.sid
  WHERE s.event_type = 'purchase' AND s.ts > c.t2 GROUP BY 1, 2
)
SELECT (SELECT count(*) FROM (SELECT DISTINCT user_id, sid FROM s))
         AS n_sessions,
       (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_view_click,
       (SELECT count(*) FROM p) AS n_full_funnel
"""


def funnel_view_click(sf_dir: str):
    """Time-windowed conversion funnel: per day, how many distinct users
    had a ``view`` event, and how many of those had a ``click`` strictly
    after one of that day's views and within one hour of it.  Shape:
    (user, ts, type) rows ride a USER-keyed exchange; per user the
    sorted click array is probed with one searchsorted per view (the
    first click after a view is the earliest — if it is outside the
    window none is inside); per-day integer partials fold in a second
    tiny exchange.  µs-integer comparisons; the only float op is the
    final rate divide."""
    from ..stages.shard import sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts", "user_id"],
    ).filter(expr="event_type == 'view' or event_type == 'click'")

    def per_user(shard: pd.DataFrame) -> pd.DataFrame:
        out = []
        shard = shard.sort_values(["user_id", "ts"], kind="stable")
        for uid, g in shard.groupby("user_id", sort=False):
            us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            is_view = (g["event_type"] == "view").to_numpy()
            views, clicks = us[is_view], np.sort(us[~is_view])
            if not views.size:
                continue
            idx = np.searchsorted(clicks, views, side="right")
            conv = np.zeros(views.size, dtype=bool)
            ok = idx < clicks.size
            conv[ok] = clicks[idx[ok]] <= views[ok] + 3_600_000_000
            day = (views // 86_400_000_000) * 86_400_000_000
            df = pd.DataFrame({"day": day, "conv": conv.astype(np.int64)})
            agg = df.groupby("day", as_index=False)["conv"].max()
            agg["viewer"] = 1
            out.append(agg)
        if not out:
            return pd.DataFrame(columns=["day", "conv", "viewer"])
        return pd.concat(out, ignore_index=True)

    partials = sharded_map_groups(ds, "user_id", per_user)

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        agg = shard.groupby("day", as_index=False).sum()
        return pd.DataFrame({
            "day": pd.to_datetime(agg["day"].to_numpy(), unit="us"),
            "n_viewers": agg["viewer"].astype(np.int64),
            "n_converted": agg["conv"].astype(np.int64),
            "conversion_rate": agg["conv"].to_numpy(dtype=np.float64)
            / agg["viewer"].to_numpy(dtype=np.float64),
        })

    return sharded_map_groups(partials, "day", fold)


def gini_by_source(sf_dir: str):
    """Volume-inequality audit: the Gini coefficient of each source's
    hourly volumes, G = 2·Σ i·v₍ᵢ₎ / (n·Σv) − (n+1)/n over the
    ascending-sorted series — the skew signal that decides whether a
    tier needs hot-key salting.  Σ i·v₍ᵢ₎ is invariant to tie order
    (equal values swap equal ranks), so sort order is deterministic;
    formula written in the identical op order both sides, rounded 6."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in shard.groupby("event_type", sort=False):
            v = np.sort(_round_exact(
                g["sum_value"].to_numpy(dtype=np.float64)))
            n = v.size
            sv = float(v.sum())
            iv = float(np.dot(np.arange(1, n + 1, dtype=np.float64), v))
            rows.append({
                "source": src, "n_buckets": int(n),
                "gini": round(2.0 * iv / (n * sv) - (n + 1.0) / n, 6)
                if sv > 0 else np.nan,
            })
        return pd.DataFrame(rows, columns=["source", "n_buckets", "gini"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_GINI_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         round(sum(value), 4) AS v
  FROM events GROUP BY 1, 2
), k AS (
  SELECT source, v,
         row_number() OVER (PARTITION BY source ORDER BY v) AS i
  FROM r
), s AS (
  SELECT source, count(*) AS n, sum(v) AS sv, sum(i * v) AS iv
  FROM k GROUP BY source
)
SELECT source, n AS n_buckets,
       CASE WHEN sv > 0 THEN
         round(2.0 * iv / (n * sv) - (n + 1.0) / n, 6)
       ELSE NULL END AS gini
FROM s
"""


def percentile_rank_1h(sf_dir: str):
    """Rank-based CDF normalization of the hourly series: each bucket's
    value mapped to its percent rank (r−1)/(n−1) within its source —
    the distribution-free transform behind cross-source comparability.
    Integer-exact: ranks come from one searchsorted against the sorted
    per-source values (min rank on ties, == SQL percent_rank), and the
    only float op is the final integer divide."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["event_type", "bucket_start"],
                                  kind="stable")
        out = []
        for src, g in shard.groupby("event_type", sort=False):
            v = _round_exact(g["sum_value"].to_numpy(dtype=np.float64))
            sv = np.sort(v)
            rank = np.searchsorted(sv, v, side="left")  # 0-based min rank
            n = v.size
            out.append(pd.DataFrame({
                "source": src,
                "bucket_start": g["bucket_start"].to_numpy(),
                "value": v,
                "pct_rank": rank / (n - 1.0) if n > 1
                else np.zeros(1),
            }))
        if not out:
            return pd.DataFrame(columns=[
                "source", "bucket_start", "value", "pct_rank"])
        return pd.concat(out, ignore_index=True)

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_PCT_RANK_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         round(sum(value), 4) AS v
  FROM events GROUP BY 1, 2
)
SELECT source, bucket_start, v AS value,
       percent_rank() OVER (PARTITION BY source ORDER BY v) AS pct_rank
FROM r
"""


def error_rate_hourly(sf_dir: str):
    """Operational SLO series: per hour, error-event count vs total
    events and the error rate — the denominator-aware companion to the
    per-source detectors (a traffic drop and an error spike look the
    same to a single series; the ratio disambiguates).  Integer counts
    from one bucket-keyed partial combine; one identical divide.

    The rate is emitted UNROUNDED on both sides: an exact rational k/n
    (n = events per hour, e.g. 1/640 = 0.0015625) can sit exactly on a
    6-dp half-tie, where SQL round (half-away) and Python round
    (half-even) genuinely disagree — found by the sf0.1 sweep.  The
    identical int→double divide is bit-deterministic without rounding."""
    from ..stages.shard import sharded_map_groups

    ds = _events(sf_dir).select_columns(["event_type", "ts"])

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame({
            "bucket_start": batch["ts"].dt.floor("h"),
            "err": (batch["event_type"] == "error").astype(np.int64),
            "one": np.int64(1),
        })
        return b.groupby("bucket_start", as_index=False).sum()

    parts = ds.map_batches(partials, batch_format="pandas")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        agg = shard.groupby("bucket_start", as_index=False).sum()
        return pd.DataFrame({
            "bucket_start": agg["bucket_start"],
            "n_errors": agg["err"].astype(np.int64),
            "n_events": agg["one"].astype(np.int64),
            "error_rate": agg["err"].to_numpy(dtype=np.float64)
            / agg["one"].to_numpy(dtype=np.float64),
        })

    return sharded_map_groups(parts, "bucket_start", fold)


_ERROR_RATE_ORACLE = """
SELECT date_trunc('hour', ts) AS bucket_start,
       count(*) FILTER (event_type = 'error') AS n_errors,
       count(*) AS n_events,
       CAST(count(*) FILTER (event_type = 'error') AS DOUBLE)
         / count(*) AS error_rate
FROM events GROUP BY 1
"""


def rolling_zscore_flags_1h(sf_dir: str):
    """Trailing-window anomaly flags: |v − μ_w| > 3·σ_w over the last
    24 observed hourly buckets per source (the streaming-flavored
    variant of the global z-score detector — a level shift re-baselines
    within a day instead of contaminating the global stats).  Emitted
    only where the full window exists.  μ/σ are written with the same
    explicit window-moment formula as the oracle (S/24, Q/24 − μ²);
    like the other flag oracles, membership is robust because the 3σ
    threshold is never sat on exactly by continuous data."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["event_type", "bucket_start"],
                                  kind="stable")
        out = []
        for src, g in shard.groupby("event_type", sort=False):
            v = g["sum_value"].to_numpy(dtype=np.float64)
            if v.size < 24:
                continue
            win = np.lib.stride_tricks.sliding_window_view(v, 24)
            S = win.sum(axis=1)
            Q = (win * win).sum(axis=1)
            mu = S / 24.0
            var = Q / 24.0 - mu * mu
            sigma = np.sqrt(np.maximum(var, 0.0))
            cur = v[23:]
            keep = np.abs(cur - mu) > 3.0 * sigma
            if not keep.any():
                continue
            out.append(pd.DataFrame({
                "source": src,
                "bucket_start": g["bucket_start"].to_numpy()[23:][keep],
                "value": _round_exact(cur[keep]),
            }))
        if not out:
            return pd.DataFrame(columns=["source", "bucket_start",
                                         "value"])
        return pd.concat(out, ignore_index=True)

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_ROLLING_ZSCORE_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         sum(value) AS v
  FROM events GROUP BY 1, 2
), w AS (
  SELECT source, bucket_start, v,
         sum(v) OVER win AS s,
         sum(v * v) OVER win AS q,
         count(*) OVER win AS wn
  FROM r
  WINDOW win AS (PARTITION BY source ORDER BY bucket_start
                 ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT source, bucket_start, round(v, 4) AS value
FROM w
WHERE wn = 24
  AND abs(v - s / 24.0) > 3.0 * sqrt(greatest(q / 24.0
        - (s / 24.0) * (s / 24.0), 0.0))
"""


def seasonal_envelope(sf_dir: str):
    """Seasonal expectation envelope: p10/p50/p90 of the hourly sums per
    (source, hour-of-day slot) — the "typical band" the today-wrappers
    compare against (compat.detect_outliers_today_* family uses the
    detector's band; this is its distribution-free data product).
    quantile_cont bit-parity lerp over 4-dp values; integer counts."""
    from ..functions.stats import quantile_cont
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.copy()
        shard["v"] = _round_exact(
            shard["sum_value"].to_numpy(dtype=np.float64))
        shard["slot"] = pd.DatetimeIndex(
            shard["bucket_start"]).hour.to_numpy().astype(np.int64)
        rows = []
        for (src, slot), g in shard.groupby(["event_type", "slot"],
                                            sort=False):
            v = g["v"].to_numpy(dtype=np.float64)
            q = quantile_cont(v, [0.1, 0.5, 0.9])
            rows.append({
                "source": src, "slot": int(slot), "n_buckets": int(v.size),
                "p10": round(float(q[0]), 6),
                "p50": round(float(q[1]), 6),
                "p90": round(float(q[2]), 6),
            })
        return pd.DataFrame(rows, columns=[
            "source", "slot", "n_buckets", "p10", "p50", "p90"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_ENVELOPE_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         round(sum(value), 4) AS v
  FROM events GROUP BY 1, 2
)
SELECT source, hour(bucket_start) AS slot, count(*) AS n_buckets,
       round(quantile_cont(v, 0.1), 6) AS p10,
       round(quantile_cont(v, 0.5), 6) AS p50,
       round(quantile_cont(v, 0.9), 6) AS p90
FROM r GROUP BY 1, 2
"""


def classic_decompose_1h(sf_dir: str):
    """Oracle-paired classic additive decomposition of the hourly series
    (the SQL-expressible cousin of the reference's
    ``decompose_and_detect`` additive path, catch.py:628-647): centered
    25-point moving-average trend, hour-of-day seasonal means of the
    detrended series, residual — emitted only where the full window
    exists.  BIT-exact by integer arithmetic: the 4-dp values scale to
    int64 (V = v·10⁴), every intermediate stays an integer
    (trend_sum = ΣV over the window, D = 25·V − trend_sum,
    S = Σ D per slot), and each output is ONE integer→double divide
    written identically both sides — no rounding anywhere."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["event_type", "bucket_start"],
                                  kind="stable")
        out = []
        for src, g in shard.groupby("event_type", sort=False):
            v = _round_exact(g["sum_value"].to_numpy(dtype=np.float64))
            n = v.size
            if n < 25:
                continue
            V = np.rint(v * 10000.0).astype(np.int64)
            win = np.lib.stride_tricks.sliding_window_view(V, 25)
            trend_sum = win.sum(axis=1)  # rows 12..n-13
            mid = slice(12, n - 12)
            D = 25 * V[mid] - trend_sum
            slot = pd.DatetimeIndex(
                g["bucket_start"].to_numpy()[mid]).hour.to_numpy()
            df = pd.DataFrame({"slot": slot, "D": D})
            agg = df.groupby("slot")["D"].agg(["sum", "size"])
            s2 = agg["sum"].reindex(slot).to_numpy()
            n2 = agg["size"].reindex(slot).to_numpy().astype(np.int64)
            out.append(pd.DataFrame({
                "source": src,
                "bucket_start": g["bucket_start"].to_numpy()[mid],
                "value": v[mid],
                "trend": trend_sum.astype(np.float64) / 250000.0,
                "seasonal": s2.astype(np.float64) / (n2 * 250000.0),
                "residual": (n2 * D - s2).astype(np.float64)
                / (n2 * 250000.0),
            }))
        if not out:
            return pd.DataFrame(columns=[
                "source", "bucket_start", "value", "trend", "seasonal",
                "residual"])
        return pd.concat(out, ignore_index=True)

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_CLASSIC_DECOMP_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS V
  FROM events GROUP BY 1, 2
), w AS (
  SELECT source, bucket_start, V,
         sum(V) OVER (PARTITION BY source ORDER BY bucket_start
                      ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
           AS trend_sum,
         count(*) OVER (PARTITION BY source ORDER BY bucket_start
                        ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS wn
  FROM r
), d AS (
  SELECT source, bucket_start, V, trend_sum,
         25 * V - trend_sum AS D, hour(bucket_start) AS slot
  FROM w WHERE wn = 25
), s AS (
  SELECT source, slot, sum(D) AS s2, count(*) AS n2
  FROM d GROUP BY 1, 2
)
SELECT d.source, d.bucket_start,
       CAST(d.V AS DOUBLE) / 10000.0 AS value,
       CAST(d.trend_sum AS DOUBLE) / 250000.0 AS trend,
       CAST(s.s2 AS DOUBLE) / (s.n2 * 250000.0) AS seasonal,
       CAST(s.n2 * d.D - s.s2 AS DOUBLE) / (s.n2 * 250000.0) AS residual
FROM d JOIN s ON s.source = d.source AND s.slot = d.slot
"""


def kpss_level_stat(sf_dir: str):
    """KPSS level-stationarity statistic per source at bandwidth 0
    (η = Σ Sₜ² / (n · Σ eₜ²) on the demeaned series) — the hard-oracled
    member of the stationarity family next to the Dickey-Fuller OLS
    oracle (conduct_stationarity_check parity, catch.py:713 family).
    Scale-free trick: with V = v·10⁴ int64 and e'ₜ = n·Vₜ − ΣV, every
    eₜ and partial sum Sₜ is an EXACT integer in both engines (DuckDB
    window sums are exact hugeint; numpy int64 cumsum), the n·10⁴
    factors cancel in the ratio, and the only inexactness is the final
    float square-sum (identical values, order drift ≪ 6 dp)."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["event_type", "bucket_start"],
                                  kind="stable")
        rows = []
        for src, g in shard.groupby("event_type", sort=False):
            v = _round_exact(g["sum_value"].to_numpy(dtype=np.float64))
            V = np.rint(v * 10000.0).astype(np.int64)
            n = V.size
            e = n * V - V.sum()
            ed = e.astype(np.float64)
            # |S_t| is bounded by n·max|e|; if that could cross int64,
            # fall back to exact Python-int partial sums (bounded output
            # path: one pass over <= a few thousand buckets per source)
            # — the oracle's window sum is exact hugeint either way, and
            # int→double casts round identically in both engines
            if n and n * int(np.abs(e).max()) >= 2 ** 62:
                acc, sd_list = 0, []
                for x in e.tolist():
                    acc += x
                    sd_list.append(float(acc))
                sd = np.asarray(sd_list, dtype=np.float64)
            else:
                sd = np.cumsum(e).astype(np.float64)
            den = float((ed * ed).sum())
            num = float((sd * sd).sum())
            rows.append({
                "source": src, "n_buckets": int(n),
                "kpss_stat": round(num / (n * den), 6)
                if den > 0 else np.nan,
            })
        return pd.DataFrame(rows, columns=[
            "source", "n_buckets", "kpss_stat"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_EMB_LABEL_ORACLE = """
WITH u AS (
  SELECT label, vec_id,
         generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), perdim AS (
  SELECT label, dim, sum(x) AS sx FROM u GROUP BY 1, 2
), c AS (
  SELECT label, sum(sx * sx) AS c2 FROM perdim GROUP BY label
), v AS (
  SELECT label, count(DISTINCT vec_id) AS n_vecs, sum(x * x) AS ssq
  FROM u GROUP BY label
)
SELECT v.label, v.n_vecs,
       round(sqrt(c.c2) / v.n_vecs, 6) AS centroid_norm,
       round(v.ssq / v.n_vecs, 6) AS mean_sq_norm
FROM v JOIN c USING (label)
"""


def props_json_stats(sf_dir: str):
    """Semi-structured column extraction: parse the JSON ``props``
    payload on every event and aggregate its ``k`` field per event
    type.  The hot path is ONE vectorized regex extract per batch over
    the fixed-schema payload (no per-row ``json.loads`` — the schema is
    validated by the null-count column instead: rows whose payload
    doesn't yield an integer are counted, not crashed on).  Per-batch
    integer partials → one small exchange.  All-integer — bit-exact."""
    from ..stages.shard import sharded_aggregate

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "props"])

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        k = pd.to_numeric(
            b["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False),
            errors="coerce")
        df = pd.DataFrame({"event_type": b["event_type"], "k": k})
        ok = df[df["k"].notna()]
        g = ok.groupby("event_type", as_index=False).agg(
            n_events=("k", "size"), sum_k=("k", "sum"),
            min_k=("k", "min"), max_k=("k", "max"))
        bad = df[df["k"].isna()].groupby(
            "event_type", as_index=False).size().rename(
            columns={"size": "n_unparsed"})
        g = g.merge(bad, on="event_type", how="outer")
        for c in ("n_events", "sum_k", "n_unparsed"):
            g[c] = g[c].fillna(0).astype(np.int64)
        # identity elements, not 0 sentinels: a batch where a type has
        # only unparsed rows must not pull the global min/max toward 0
        g["min_k"] = g["min_k"].fillna(np.iinfo(np.int64).max).astype(
            np.int64)
        g["max_k"] = g["max_k"].fillna(np.iinfo(np.int64).min).astype(
            np.int64)
        return g

    parts = ds.map_batches(partials, batch_format="pandas")
    folded = sharded_aggregate(parts, "event_type",
                               {"n_events": "sum", "sum_k": "sum",
                                "min_k": "min", "max_k": "max",
                                "n_unparsed": "sum"}, num_shards=4)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        # a type with zero parsed rows anywhere: identity extremes →
        # SQL-null min/max (matches the oracle's aggregate-over-empty)
        none = b["n_events"].to_numpy() == 0
        if none.any():
            b = b.copy()
            b.loc[none, ["sum_k", "min_k", "max_k"]] = pd.NA
            for c in ("sum_k", "min_k", "max_k"):
                b[c] = b[c].astype("Int64")
        return b

    return folded.map_batches(fin, batch_format="pandas")


_PROPS_JSON_ORACLE = """
SELECT event_type,
       count(CAST(json_extract_string(props, '$.k') AS BIGINT))
         AS n_events,
       sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       count(*) FILTER (
         WHERE json_extract_string(props, '$.k') IS NULL) AS n_unparsed
FROM events
GROUP BY event_type
"""


def daily_event_pivot(sf_dir: str):
    """Reshape/pivot: one row per day with the five event types as
    integer count COLUMNS plus the row total (the wide activity matrix
    BI layers ask for).  Per-batch (day, type) count partials → one
    day-hash exchange whose shard fn folds and pivots (``pivot_table``
    over the closed type vocabulary, zero-filled).  All-integer."""
    from ..stages.shard import sharded_map_groups

    types = ("click", "error", "purchase", "signup", "view")
    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type"])

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "day": b["ts"].to_numpy().astype("datetime64[D]")
                   .astype("datetime64[us]"),
            "event_type": b["event_type"],
        }).groupby(["day", "event_type"], as_index=False).size().rename(
            columns={"size": "c"})

    parts = ds.map_batches(partials, batch_format="pandas")

    def pivot(shard: pd.DataFrame) -> pd.DataFrame:
        wide = shard.pivot_table(index="day", columns="event_type",
                                 values="c", aggfunc="sum", fill_value=0)
        out = pd.DataFrame({"day": wide.index})
        total = np.zeros(len(wide), dtype=np.int64)
        for t in types:
            col = (wide[t].to_numpy(dtype=np.int64)
                   if t in wide.columns else np.zeros(len(wide), np.int64))
            out[f"n_{t}"] = col
            total += col
        out["n_total"] = total
        return out

    return sharded_map_groups(parts, "day", pivot)


_PIVOT_ORACLE = """
SELECT date_trunc('day', ts) AS day,
       count(*) FILTER (WHERE event_type = 'click')    AS n_click,
       count(*) FILTER (WHERE event_type = 'error')    AS n_error,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       count(*) FILTER (WHERE event_type = 'view')     AS n_view,
       count(*) AS n_total
FROM events
GROUP BY 1
"""


def lag_delta_1h(sf_dir: str):
    """Window-function LAG: hour-over-hour change of each source's
    hourly sum, over OBSERVED buckets (gaps don't interpolate — LAG
    semantics).  Rides the memoized 1h rollup; one source-hash exchange
    whose shard fn sorts each source's buckets and takes the vectorized
    shifted difference (first bucket per source → null, as SQL LAG).
    Exactness: both engines subtract the IDENTICAL 4-dp-rounded doubles
    the rollup oracle already pins — one IEEE subtract each side, no
    extra rounding."""
    from ..stages.shard import sharded_map_groups

    roll = rollup_events(sf_dir, "1h").select_columns(
        ["source", "bucket_start", "sum_value"])

    def delta(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["source", "bucket_start"],
                                  kind="stable")
        prev = shard.groupby("source")["sum_value"].shift(1)
        return pd.DataFrame({
            "source": shard["source"],
            "bucket_start": shard["bucket_start"],
            "sum_value": shard["sum_value"],
            "delta": shard["sum_value"] - prev,
        })

    return sharded_map_groups(roll, "source", delta)


_LAG_DELTA_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         round(sum(value), 4) AS sum_value
  FROM events GROUP BY 1, 2
)
SELECT source, bucket_start, sum_value,
       sum_value - LAG(sum_value) OVER (
         PARTITION BY source ORDER BY bucket_start) AS delta
FROM r
"""


_DOC_REPETITION_ORACLE = """
WITH raw AS (
  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS w
  FROM documents
), t AS (
  SELECT doc_id, w,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS i
  FROM raw WHERE w <> ''
), g AS (
  SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS gram
  FROM t a
  JOIN t b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  JOIN t c ON c.doc_id = a.doc_id AND c.i = a.i + 2
)
SELECT doc_id, count(*) AS n_grams, count(DISTINCT gram) AS n_distinct,
       1.0 - CAST(count(DISTINCT gram) AS DOUBLE) / count(*) AS rep_ratio
FROM g GROUP BY doc_id
"""


_BOILERPLATE_ORACLE = """
WITH raw AS (
  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS w
  FROM documents
), t AS (
  SELECT doc_id, w,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS i
  FROM raw WHERE w <> ''
), g AS (
  SELECT a.doc_id,
         a.w || ' ' || b.w || ' ' || c.w || ' ' || d.w || ' ' || e.w
           AS gram
  FROM t a
  JOIN t b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  JOIN t c ON c.doc_id = a.doc_id AND c.i = a.i + 2
  JOIN t d ON d.doc_id = a.doc_id AND d.i = a.i + 3
  JOIN t e ON e.doc_id = a.doc_id AND e.i = a.i + 4
), dd AS (SELECT DISTINCT doc_id, gram FROM g),
c1 AS (SELECT gram, count(*) AS n_docs FROM dd GROUP BY gram),
c2 AS (SELECT gram, count(*) AS n_occurrences FROM g GROUP BY gram)
SELECT c1.gram, c1.n_docs, c2.n_occurrences
FROM c1 JOIN c2 USING (gram)
WHERE c1.n_docs >= 2
"""


_KPSS_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS V
  FROM events GROUP BY 1, 2
), t AS (
  SELECT source, count(*) AS n, sum(V) AS T FROM r GROUP BY source
), e AS (
  SELECT r.source, t.n,
         CAST(t.n * r.V - t.T AS DOUBLE) AS ed,
         CAST(sum(t.n * r.V - t.T) OVER (
              PARTITION BY r.source ORDER BY r.bucket_start
              ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS sd
  FROM r JOIN t USING (source)
)
SELECT source, any_value(n) AS n_buckets,
       CASE WHEN sum(ed * ed) > 0 THEN
         round(sum(sd * sd) / (any_value(n) * sum(ed * ed)), 6)
       ELSE NULL END AS kpss_stat
FROM e GROUP BY source
"""


def time_to_click_stats(sf_dir: str):
    """Conversion-latency distribution: for every distinct view that
    converts (first click strictly after it, within 1h, same user), the
    view→click delay — reported per view-day as count, mean and
    p50/p90 (the latency histogram behind funnel SLOs).  Same user-keyed
    exchange + searchsorted first-after probe as ``funnel_view_click``;
    delays are exact µs integers, the mean is the unrounded integer
    divide (rational-rate rule) and the quantile lerp of integers has
    ≤1 decimal, so no rounding is needed anywhere."""
    from ..functions.stats import quantile_cont
    from ..stages.shard import sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts", "user_id"],
    ).filter(expr="event_type == 'view' or event_type == 'click'")

    def per_user(shard: pd.DataFrame) -> pd.DataFrame:
        out = []
        shard = shard.sort_values(["user_id", "ts"], kind="stable")
        for uid, g in shard.groupby("user_id", sort=False):
            us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            is_view = (g["event_type"] == "view").to_numpy()
            views = np.unique(us[is_view])  # dedup identical view ts
            clicks = np.sort(us[~is_view])
            if not views.size or not clicks.size:
                continue
            idx = np.searchsorted(clicks, views, side="right")
            ok = idx < clicks.size
            delay = np.where(ok, clicks[np.minimum(idx, clicks.size - 1)]
                             - views, np.int64(-1))
            keep = ok & (delay <= 3_600_000_000)
            if not keep.any():
                continue
            day = (views[keep] // 86_400_000_000) * 86_400_000_000
            out.append(pd.DataFrame({"day": day, "delay": delay[keep]}))
        if not out:
            return pd.DataFrame(columns=["day", "delay"])
        return pd.concat(out, ignore_index=True)

    delays = sharded_map_groups(ds, "user_id", per_user)

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for day, g in shard.groupby("day", sort=False):
            d = g["delay"].to_numpy(dtype=np.int64)
            q = quantile_cont(d.astype(np.float64), [0.5, 0.9])
            rows.append({
                "day": pd.Timestamp(int(day), unit="us"),
                "n_conversions": int(d.size),
                "mean_delay_s": float(d.sum()) / d.size / 1e6,
                "p50_delay_s": float(q[0]) / 1e6,
                "p90_delay_s": float(q[1]) / 1e6,
            })
        return pd.DataFrame(rows, columns=[
            "day", "n_conversions", "mean_delay_s", "p50_delay_s",
            "p90_delay_s"])

    return sharded_map_groups(delays, "day", fold)


_TIME_TO_CLICK_ORACLE = """
WITH v AS (
  SELECT DISTINCT user_id, ts, date_trunc('day', ts) AS d
  FROM events WHERE event_type = 'view'
), c AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
), dly AS (
  SELECT v.d, date_diff('microsecond', v.ts, min(c.ts)) AS delay
  FROM v JOIN c ON c.user_id = v.user_id AND c.ts > v.ts
  GROUP BY v.user_id, v.ts, v.d
  HAVING date_diff('microsecond', v.ts, min(c.ts)) <= 3600000000
)
SELECT d AS day, count(*) AS n_conversions,
       CAST(sum(delay) AS DOUBLE) / count(*) / 1e6 AS mean_delay_s,
       quantile_cont(delay, 0.5) / 1e6 AS p50_delay_s,
       quantile_cont(delay, 0.9) / 1e6 AS p90_delay_s
FROM dly GROUP BY d
"""


_FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, ts, date_trunc('day', ts) AS d
  FROM events WHERE event_type = 'view'
), c AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
), u AS (
  SELECT d, user_id,
         max(CASE WHEN EXISTS (
               SELECT 1 FROM c
               WHERE c.user_id = v.user_id AND c.ts > v.ts
                 AND c.ts <= v.ts + INTERVAL 1 HOUR)
             THEN 1 ELSE 0 END) AS conv
  FROM v GROUP BY d, user_id
)
SELECT d AS day, count(*) AS n_viewers,
       CAST(sum(conv) AS BIGINT) AS n_converted,
       CAST(sum(conv) AS DOUBLE) / count(*) AS conversion_rate
FROM u GROUP BY d
"""


def dau_wau_stickiness(sf_dir: str):
    """Sliding-window distinct users: daily actives (DAU), trailing-7-day
    actives (WAU) and the DAU/WAU stickiness ratio per (source, day) —
    the canonical hard-to-distribute engagement metric (COUNT DISTINCT
    over a sliding window does not pre-aggregate).  Distribution: a
    user's WAU contribution is the union of [a, a+6] intervals over
    their active days, computed per user inside a USER-keyed exchange
    (where the (source, day, user) dedup is complete) with a bounded
    ≤7× day-expansion; per-(source, day) integer partials then fold in
    a second exchange, where covered days outside the source's observed
    grid are dropped.  Counts are integers; the ratio is the unrounded
    bit-deterministic divide (rational-rate rule)."""
    from ..stages.shard import sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts", "user_id"])

    def triples(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "source": batch["event_type"],
            "day": batch["ts"].dt.floor("D"),
            "user_id": batch["user_id"],
        })
        return out.drop_duplicates()

    partials = ds.map_batches(triples, batch_format="pandas")

    def per_user(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.drop_duplicates().sort_values(
            ["source", "user_id", "day"], kind="stable")
        out = []
        for (src, _uid), g in shard.groupby(["source", "user_id"],
                                            sort=False):
            days = (g["day"].to_numpy().astype("datetime64[D]")
                    .astype(np.int64))
            # DAU contribution: each active day once
            out.append(pd.DataFrame({
                "source": src, "day": days, "dau": np.int64(1),
                "wau": np.int64(0)}))
            # WAU contribution: union of [a, a+6] over active days —
            # merge overlapping intervals, then expand (bounded <=7x)
            starts, ends = [days[0]], [days[0] + 6]
            for a in days[1:]:
                if a <= ends[-1]:
                    ends[-1] = a + 6
                else:
                    starts.append(a)
                    ends.append(a + 6)
            covered = np.concatenate([
                np.arange(s, e + 1, dtype=np.int64)
                for s, e in zip(starts, ends)])
            out.append(pd.DataFrame({
                "source": src, "day": covered, "dau": np.int64(0),
                "wau": np.int64(1)}))
        if not out:
            return pd.DataFrame(columns=["source", "day", "dau", "wau"])
        agg = pd.concat(out, ignore_index=True)
        return agg.groupby(["source", "day"], as_index=False).sum()

    counts = sharded_map_groups(partials, "user_id", per_user)

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        agg = shard.groupby(["source", "day"], as_index=False).sum()
        # the output grid is the source's OBSERVED days (dau > 0);
        # covered-only days (a user's trailing window reaching past the
        # source's activity) are dropped
        agg = agg[agg["dau"] > 0]
        return pd.DataFrame({
            "source": agg["source"],
            "day": pd.to_datetime(agg["day"].to_numpy(), unit="D"),
            "dau": agg["dau"].astype(np.int64),
            "wau": agg["wau"].astype(np.int64),
            "stickiness": agg["dau"].to_numpy(dtype=np.float64)
            / agg["wau"].to_numpy(dtype=np.float64),
        })

    return sharded_map_groups(counts, "source", fold)


_DAU_WAU_ORACLE = """
WITH u AS (
  SELECT DISTINCT event_type AS source, date_trunc('day', ts) AS day,
         user_id
  FROM events
), g AS (SELECT DISTINCT source, day FROM u)
SELECT g.source, g.day,
       (SELECT count(DISTINCT user_id) FROM u
        WHERE u.source = g.source AND u.day = g.day) AS dau,
       (SELECT count(DISTINCT user_id) FROM u
        WHERE u.source = g.source
          AND u.day BETWEEN g.day - INTERVAL 6 DAY AND g.day) AS wau,
       CAST((SELECT count(DISTINCT user_id) FROM u
             WHERE u.source = g.source AND u.day = g.day) AS DOUBLE)
         / (SELECT count(DISTINCT user_id) FROM u
            WHERE u.source = g.source
              AND u.day BETWEEN g.day - INTERVAL 6 DAY AND g.day)
         AS stickiness
FROM g
"""


_NEXT_DAY_RETENTION_ORACLE = """
WITH a AS (
  SELECT DISTINCT event_type AS source, date_trunc('day', ts) AS d,
         user_id
  FROM events
), n AS (
  SELECT a.source, a.d, count(*) AS active_users,
         count(b.user_id) AS retained_next_day
  FROM a LEFT JOIN a b
    ON b.source = a.source AND b.user_id = a.user_id
   AND b.d = a.d + INTERVAL 1 DAY
  GROUP BY 1, 2
)
SELECT source, d AS day, active_users, retained_next_day,
       CAST(retained_next_day AS DOUBLE) / active_users
         AS retention_rate
FROM n
"""


_EWMA_ORACLE = """
WITH RECURSIVE r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         round(sum(value), 4) AS v,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY date_trunc('hour', ts)) AS idx
  FROM events GROUP BY 1, 2
), e AS (
  SELECT source, bucket_start, idx, v, v AS ewma FROM r WHERE idx = 1
  UNION ALL
  SELECT r.source, r.bucket_start, r.idx, r.v, 0.75 * e.ewma + 0.25 * r.v
  FROM r JOIN e ON r.source = e.source AND r.idx = e.idx + 1
)
SELECT source, bucket_start, v AS value, ewma FROM e
"""


def sliding_avg_3h(sf_dir: str):
    """Sliding-window aggregate: 3-hour trailing mean over each source's
    hourly sums (windowed-aggregate operator; per-source pandas rolling
    inside map_groups, window-function oracle)."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def slide_shard(g: pd.DataFrame) -> pd.DataFrame:
        # all sources in the shard at once: one sort + one grouped
        # rolling.  Window sums run over exact 10^-4-unit INTEGERS of
        # the rounded tier (float accumulation order flipped the 4-dp
        # round on a fuzz corpus), and the mean is emitted UNROUNDED:
        # the one divide is the identical IEEE op both sides, while a
        # 4-dp round would tie-break half-even here vs DuckDB's
        # half-away on exactly-representable quotients like x.03125
        # (hit by fuzz seed 777).
        g = g.sort_values(["event_type", "bucket_start"], kind="stable")
        v4 = np.rint(_round_exact(
            g["sum_value"].to_numpy(np.float64)) * 10000.0).astype(np.int64)
        gg = pd.DataFrame({"k": g["event_type"].to_numpy(), "v4": v4})
        win = gg.groupby("k", sort=False)["v4"].rolling(
            3, min_periods=1)
        s = win.sum().reset_index(drop=True).to_numpy(np.float64)
        n = win.count().reset_index(drop=True).to_numpy(np.float64)
        return pd.DataFrame(
            {
                "source": g["event_type"].to_numpy(),
                "bucket_start": g["bucket_start"].to_numpy(),
                "sliding_avg": s / (10000.0 * n),
            }
        )

    return sharded_map_groups(roll, "event_type", slide_shard)


_SLIDING_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS v4
  FROM events GROUP BY 1, 2
)
SELECT source, bucket_start,
       sum(v4) OVER w / (10000.0 * count(*) OVER w) AS sliding_avg
FROM r
WINDOW w AS (PARTITION BY source ORDER BY bucket_start
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def hopping_stats_2h(sf_dir: str):
    """Hopping-window aggregate: 2-hour windows starting every hour over
    events (each event lands in two windows).  Expansion happens on the
    hop-grid partials, not the raw rows (stages/rollup.hopping_rollup),
    so the shuffle cost is 2× the 1h-rollup partials."""
    from ..stages.rollup import hopping_rollup

    ds = hopping_rollup(_events(sf_dir), "event_type", "ts", "value",
                        window_seconds=7200, hop_seconds=3600)
    return _finalize_rollup(ds).rename_columns(
        {"bucket_start": "window_start"})


_HOPPING_ORACLE = """
WITH e AS (
  SELECT event_type, value, date_trunc('hour', ts) AS h FROM events
), x AS (
  SELECT event_type, value, h AS window_start FROM e
  UNION ALL
  SELECT event_type, value, h - INTERVAL 1 HOUR AS window_start FROM e
)
SELECT event_type AS source, window_start,
       round(sum(value), 4) AS sum_value,
       count(*) AS n_points,
       min(value) AS min_value,
       max(value) AS max_value,
       round(sum(value), 4) / count(*) AS mean_value
FROM x GROUP BY 1, 2
"""


def approx_users_by_type(sf_dir: str):
    """HLL count-distinct per event_type with a HARD tolerance-band
    oracle (verdict r3 item 5): one pass emits per-batch mergeable
    sketches AND per-batch distinct-user partials; the final exchange
    merges both and outputs (source, exact_users, within_2pct) where
    ``within_2pct`` asserts |estimate − exact| ≤ 2% of exact.  The SQL
    oracle computes the exact distinct and pins within_2pct = TRUE, so
    the driver hash verifies the exact path bit-for-bit and bounds the
    sketch's drift — no longer a rows-only row.  (The raw estimate is
    still exposed via the HLL function tests; the sketch shape for
    count-distinct at 10^12 scale.)"""
    from ..functions.hll import HLL
    from ..stages.shard import sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id"],
    )

    def sketch_batch(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in batch.groupby("event_type"):
            users = pd.unique(g["user_id"])
            h = HLL().add_many(users)
            rows.append({"source": src, "sketch": h.to_bytes(),
                         "users": users})
        return pd.DataFrame(rows)

    def merge_shard(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, grp in g.groupby("source", sort=False):
            h = HLL.from_bytes(grp["sketch"].iloc[0])
            for blob in grp["sketch"].iloc[1:]:
                h.merge(HLL.from_bytes(blob))
            exact = int(pd.unique(np.concatenate(
                [np.asarray(u) for u in grp["users"]])).size)
            est = h.estimate()
            rows.append({"source": src, "exact_users": exact,
                         "within_2pct": bool(abs(est - exact)
                                             <= 0.02 * exact)})
        return pd.DataFrame(rows)

    return sharded_map_groups(ds.map_batches(sketch_batch,
                                             batch_format="pandas"),
                              "source", merge_shard)


_APPROX_USERS_ORACLE = """
SELECT event_type AS source,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS within_2pct
FROM events GROUP BY 1
"""


# ----------------------------------------------------- documents queries


def session_windows(sf_dir: str, gap_minutes: int = 30):
    """Session windowing over the per-user event stream (the guide's
    stream-shaped pattern): partition by user, order by ts inside the
    group, close a session after a >gap idle period.  Emits one row per
    session with start/end/count.  SQL oracle via lag + cumulative sum."""
    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "value"],
    )
    from ..stages.shard import sharded_map_groups

    gap = pd.Timedelta(minutes=gap_minutes)

    def sessions_shard(g: pd.DataFrame) -> pd.DataFrame:
        # every user in the shard in one vectorized pass: sort by
        # (user, ts); a session break is a >gap diff OR a user boundary,
        # so one cumsum numbers all sessions across all users
        g = g.sort_values(["user_id", "ts"], kind="stable")
        user_change = g["user_id"].ne(g["user_id"].shift())
        new_session = user_change | (g["ts"].diff() > gap)
        sid = new_session.cumsum()
        out = g.groupby(sid).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("ts", "size"),
            sum_value=("value", "sum"),
        ).reset_index(drop=True)
        out["sum_value"] = out["sum_value"].round(4)
        return out

    return sharded_map_groups(ds, "user_id", sessions_shard)


def user_path_trigrams(sf_dir: str, gap_minutes: int = 30):
    """Sequence mining over sessionized event streams: counts of every
    consecutive event-type TRIGRAM inside a session (the n-gram view of
    user journeys; the output is bounded by |event_types|³, not by the
    stream).  Same session rule as ``session_windows`` (>30 min idle
    closes), with (ts, event_id) ordering so concurrent events are
    deterministic in both engines.  One user-keyed exchange computes
    per-shard trigram partials fully vectorized (shift twice + one
    groupby); a tiny final fold sums them.  All-integer — exact."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def trigrams(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        user_change = g["user_id"].ne(g["user_id"].shift())
        sid = (user_change | (g["ts"].diff() > gap)).cumsum()
        t = pd.DataFrame({
            "e1": g["event_type"].to_numpy(),
            "e2": g["event_type"].shift(-1).to_numpy(),
            "e3": g["event_type"].shift(-2).to_numpy(),
            "ok": (sid.shift(-1).to_numpy() == sid.to_numpy())
                  & (sid.shift(-2).to_numpy() == sid.to_numpy()),
        })
        t = t[t["ok"]]
        return t.groupby(["e1", "e2", "e3"], as_index=False).size().rename(
            columns={"size": "n_occurrences"})

    parts = sharded_map_groups(ds, "user_id", trigrams)
    return sharded_aggregate(parts, ["e1", "e2", "e3"],
                             {"n_occurrences": "sum"}, num_shards=2)


_PATH_TRIGRAM_ORACLE = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, event_id, event_type,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
), t AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER w2 AS e2,
         lead(event_type, 2) OVER w2 AS e3,
         sid,
         lead(sid, 1) OVER w2 AS sid2,
         lead(sid, 2) OVER w2 AS sid3
  FROM s WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1, e2, e3, count(*) AS n_occurrences
FROM t WHERE sid2 = sid AND sid3 = sid
GROUP BY 1, 2, 3
"""


def session_event_pairs(sf_dir: str, gap_minutes: int = 30):
    """Within-session event-type co-occurrence: for every unordered
    pair of DISTINCT event types, how many sessions contain both — the
    market-basket view of user journeys (order-free, unlike the
    trigram operator).  Same session rule as ``session_windows``
    (>30 min idle closes, (ts, event_id) ordering).  One user-keyed
    exchange sessionizes and dedups (session, type) per shard, then a
    per-shard self-merge emits pair partials — bounded by
    |event_types|² × sessions, with the fold output bounded by
    |event_types|² alone.  All-integer counts — exact."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        user_change = g["user_id"].ne(g["user_id"].shift())
        sid = (user_change | (g["ts"].diff() > gap)).cumsum()
        d = pd.DataFrame({"sid": sid.to_numpy(),
                          "t": g["event_type"].to_numpy()}).drop_duplicates()
        j = d.merge(d, on="sid")
        j = j[j["t_x"] < j["t_y"]]
        return j.groupby(["t_x", "t_y"], as_index=False).size().rename(
            columns={"t_x": "type_a", "t_y": "type_b", "size": "n_sessions"})

    parts = sharded_map_groups(ds, "user_id", pairs)
    return sharded_aggregate(parts, ["type_a", "type_b"],
                             {"n_sessions": "sum"}, num_shards=2)


_SESSION_EVENT_PAIRS_ORACLE = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, event_type,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
), p AS (
  SELECT DISTINCT user_id, sid, event_type FROM s
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*) AS n_sessions
FROM p a JOIN p b
  ON a.user_id = b.user_id AND a.sid = b.sid
 AND a.event_type < b.event_type
GROUP BY 1, 2
"""


def cohort_retention_matrix(sf_dir: str):
    """Classic cohort-retention triangle: users grouped by their first
    active day, distinct-user counts at each day offset, and the share
    of the cohort still active — the aggregate behind every retention
    dashboard.  ONE user-keyed exchange computes each user's cohort day
    and distinct active days (per-shard, vectorized), emits integer
    (cohort, offset) partials; a tiny cohort-keyed fold attaches the
    offset-0 cohort size for the rate (ONE int/int divide).  Output is
    O(days²) rows — bounded by the retention window, not the stream."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts"])

    def per_user(shard: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "user_id": shard["user_id"],
            "day": shard["ts"].dt.floor("D"),
        }).drop_duplicates()
        cohort = d.groupby("user_id")["day"].transform("min")
        off = ((d["day"] - cohort).dt.total_seconds() // 86400).astype(
            np.int64)
        out = pd.DataFrame({"cohort_day": cohort, "day_offset": off})
        return out.groupby(["cohort_day", "day_offset"],
                           as_index=False).size().rename(
            columns={"size": "n_users"})

    parts = sharded_map_groups(ds, "user_id", per_user)
    agg = sharded_aggregate(parts, ["cohort_day", "day_offset"],
                            {"n_users": "sum"}, num_shards=2)

    def rates(shard: pd.DataFrame) -> pd.DataFrame:
        out = []
        for day, g in shard.groupby("cohort_day", sort=False):
            size = int(g.loc[g["day_offset"] == 0, "n_users"].iloc[0])
            n = g["n_users"].to_numpy(np.int64)
            out.append(pd.DataFrame({
                "cohort_day": day,
                "day_offset": g["day_offset"].to_numpy(np.int64),
                "n_users": n,
                "retention_rate": n / size,
            }))
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame({
            "cohort_day": pd.Series([], dtype="datetime64[us]"),
            "day_offset": pd.Series([], dtype=np.int64),
            "n_users": pd.Series([], dtype=np.int64),
            "retention_rate": pd.Series([], dtype=np.float64)})

    return sharded_map_groups(agg, "cohort_day", rates, num_shards=2)


_COHORT_ORACLE = """
WITH d AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), f AS (
  SELECT user_id, min(day) AS cohort FROM d GROUP BY user_id
), m AS (
  SELECT cohort, date_diff('day', cohort, day) AS off, count(*) AS n
  FROM d JOIN f USING (user_id) GROUP BY 1, 2
), c AS (
  SELECT cohort, n AS size FROM m WHERE off = 0
)
SELECT m.cohort AS cohort_day, CAST(m.off AS BIGINT) AS day_offset,
       m.n AS n_users, CAST(m.n AS DOUBLE) / c.size AS retention_rate
FROM m JOIN c USING (cohort)
"""


_SESSION_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *, sum(new_session) OVER (
      PARTITION BY user_id ORDER BY ts
      ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM numbered GROUP BY user_id, session_id
"""


def distinct_users_by_type(sf_dir: str):
    """Exact count-distinct per key: per-batch distinct partials (set
    semantics are mergeable), final distinct + count — the exact-dedup
    building block; sketch variants (HLL) slot into the same partial/
    merge shape."""
    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"source": batch["event_type"], "user_id": batch["user_id"]})
        g = t.group_by(["source", "user_id"]).aggregate([("user_id", "count")])
        g = g.drop_columns(["user_id_count"])
        shard = pc.bit_wise_and(
            pc.multiply(g["user_id"], pa.scalar(2654435761, pa.int64())),
            pa.scalar(63, pa.int64()),  # 64 shards (power of two -> mask)
        )
        return g.append_column("shard", shard)

    def per_shard(group: pa.Table) -> pa.Table:
        # a (source, user) pair always lands in one shard -> exact
        dedup = group.group_by(["source", "user_id"]).aggregate(
            [("user_id", "count")]
        )
        t = pa.table({"source": dedup["source"],
                      "one": pa.array(np.ones(len(dedup), dtype=np.int64))})
        return t.group_by("source").aggregate([("one", "sum")]).rename_columns(
            ["source", "p_n"]
        )

    def final(shard: pd.DataFrame) -> pd.DataFrame:
        # integer partial sums — order-independent, exact
        return shard.groupby("source", as_index=False).agg(
            n_users=("p_n", "sum"))

    from ..stages.shard import exchange_by_int_column, sharded_map_groups

    # both combines ride the raw hash exchange (the user-keyed one on
    # the precomputed shard column) — Ray's sort-groupby carrier paid
    # ~1-1.5 s fixed per call here, twice
    partials = exchange_by_int_column(
        ds.map_batches(partial, batch_format="pyarrow"), "shard", 64,
        per_shard)
    return sharded_map_groups(partials, "source", final, num_shards=None)


_DISTINCT_ORACLE = """
SELECT event_type AS source, count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""


_DOC_STATS_ORACLE = """
SELECT doc_id, lang, source,
       length(text) AS n_chars,
       len(string_split(text, ' ')) AS n_words
FROM documents
"""


_TFIDF_ORACLE = """
WITH words AS (
  SELECT doc_id, w
  FROM documents, unnest(string_split(lower(text), ' ')) AS t(w)
  WHERE w <> ''
), tf AS (
  SELECT doc_id, w, count(*) AS tf FROM words GROUP BY 1, 2
), df AS (
  SELECT w, count(DISTINCT doc_id) AS df FROM words GROUP BY 1
), n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.w AS term, tf.tf, df.df,
         tf.tf * (CAST((SELECT n_docs FROM n) AS DOUBLE) / df.df) AS score
  FROM tf JOIN df USING (w)
)
SELECT doc_id, term, tf, df, score
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY score DESC, term) AS rn
  FROM scored
) WHERE rn <= 3
"""


_QUALITY_FILTER_ORACLE = """
WITH s AS (
  SELECT doc_id, lang, source,
         length(text) AS n_chars,
         len(string_split(text, ' ')) AS n_words
  FROM documents
)
SELECT * FROM s
WHERE n_words >= 10 AND n_chars >= 100
  AND CAST(n_chars AS DOUBLE) / n_words BETWEEN 3.0 AND 12.0
"""


_DEDUP_ORACLE = """
SELECT min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY text
"""


_LANG_ORACLE = "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang"


_PACKING_ORACLE = """
WITH RECURSIVE c AS (
  SELECT lang, doc_id, len(regexp_extract_all(text, '\\S+')) AS n
  FROM documents
), d AS (
  SELECT lang, doc_id, least(n, 2048) AS t,
         CAST(n > 2048 AS BIGINT) AS tr,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS idx
  FROM c WHERE n > 0
), p AS (
  SELECT lang, idx, t AS fill, 1 AS bins, t AS packed, tr AS n_trunc
  FROM d WHERE idx = 1
  UNION ALL
  SELECT d.lang, d.idx,
         CASE WHEN p.fill + d.t <= 2048 THEN p.fill + d.t ELSE d.t END,
         CASE WHEN p.fill + d.t <= 2048 THEN p.bins ELSE p.bins + 1 END,
         p.packed + d.t, p.n_trunc + d.tr
  FROM d JOIN p ON d.lang = p.lang AND d.idx = p.idx + 1
)
SELECT lang, bins AS n_windows, idx AS n_docs, packed AS n_tokens_packed,
       n_trunc AS n_truncated,
       CAST(packed AS DOUBLE) / (CAST(bins AS DOUBLE) * 2048)
         AS packing_efficiency
FROM p
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY idx DESC) = 1
"""


_ANN_ORACLE = """
SELECT vec_id, CAST(round(CAST(cos_raw AS DOUBLE), 4) AS DOUBLE) AS cos_sim FROM (
  SELECT vec_id,
         list_cosine_similarity(
             CAST(embedding AS DOUBLE[]),
             (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)
         ) AS cos_raw
  FROM embeddings
) ORDER BY cos_raw DESC, vec_id ASC LIMIT 10
"""


def _stoplist_sql(lang: str) -> str:
    from ..stages.textops import _STOPWORDS

    return "[" + ", ".join(f"'{w}'" for w in sorted(_STOPWORDS[lang])) + "]"


def _text_quality_oracle() -> str:
    from ..stages.textops import _BPE_PATTERN

    bpe = _BPE_PATTERN.replace("'", "''").replace("\\d", "\\d")
    return rf"""
WITH f AS (
  SELECT doc_id, source, lang,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(regexp_extract_all(text, '[\w'']+')) AS BIGINT)
           AS n_words,
         CAST(len(regexp_extract_all(text, '[\w'']')) AS BIGINT) AS wc,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS BIGINT)
           AS n_punct,
         CAST(len(regexp_extract_all(text, '\d')) AS BIGINT) AS n_digit,
         CAST(len(regexp_extract_all(text, '{bpe}')) AS BIGINT)
           AS n_bpe_tokens,
         CAST(len(list_filter(
           list_transform(regexp_extract_all(text, '[\w'']+'),
                          x -> lower(x)),
           x -> list_contains({_stoplist_sql('en')}, x))) AS BIGINT)
           AS n_stop
  FROM documents
), r AS (
  SELECT *,
         CAST(n_punct AS DOUBLE) / greatest(1, n_chars) AS punct_ratio,
         CAST(n_digit AS DOUBLE) / greatest(1, n_chars) AS digit_ratio,
         CAST(n_stop AS DOUBLE) / greatest(1, n_words) AS stopword_ratio,
         CASE WHEN n_words = 0 THEN 0.0
              ELSE CAST(wc AS DOUBLE) / n_words END AS mean_word_len
  FROM f
)
SELECT doc_id, source, lang, n_chars, n_words, n_bpe_tokens,
       punct_ratio, digit_ratio, stopword_ratio, mean_word_len,
       0.4 * least(n_words / 50.0, 1.0)
       + 0.3 * (1 - least(punct_ratio * 5, 1.0))
       + 0.1 * (1 - least(digit_ratio * 5, 1.0))
       + 0.2 * (1.0 / (1.0 + 0.5 * (((mean_word_len - 5.0) / 3.0)
                                    * ((mean_word_len - 5.0) / 3.0))))
         AS quality_score
FROM r
"""


def _lang_id_oracle() -> str:
    en, es = _stoplist_sql("en"), _stoplist_sql("es")
    fr, de = _stoplist_sql("fr"), _stoplist_sql("de")
    return rf"""
WITH w AS (
  SELECT doc_id, lang, text,
         list_transform(regexp_extract_all(text, '[\w'']+'),
                        x -> lower(x)) AS ws
  FROM documents
), c AS (
  SELECT doc_id, lang,
         CAST(length(text) AS BIGINT) AS n_char,
         CAST(len(regexp_extract_all(text, '[一-鿿぀-ヿ가-힯]'))
              AS BIGINT) AS n_cjk,
         CAST(len(ws) AS BIGINT) AS nw,
         CAST(len(list_filter(ws, x -> list_contains({en}, x)))
              AS BIGINT) AS c_en,
         CAST(len(list_filter(ws, x -> list_contains({es}, x)))
              AS BIGINT) AS c_es,
         CAST(len(list_filter(ws, x -> list_contains({fr}, x)))
              AS BIGINT) AS c_fr,
         CAST(len(list_filter(ws, x -> list_contains({de}, x)))
              AS BIGINT) AS c_de
  FROM w
)
SELECT doc_id, lang,
  CASE WHEN n_cjk > 0.2 * greatest(1, n_char) THEN 'zh'
       WHEN nw = 0 OR greatest(c_en, c_es, c_fr, c_de) = 0 THEN 'und'
       WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_de THEN 'en'
       WHEN c_es >= c_fr AND c_es >= c_de THEN 'es'
       WHEN c_fr >= c_de THEN 'fr' ELSE 'de' END AS pred_lang,
  CASE WHEN n_cjk > 0.2 * greatest(1, n_char)
         THEN least(1.0, CAST(n_cjk AS DOUBLE) / n_char * 2)
       WHEN nw = 0 OR greatest(c_en, c_es, c_fr, c_de) = 0 THEN 0.0
       ELSE least(1.0,
                  (CAST(greatest(c_en, c_es, c_fr, c_de) AS DOUBLE) / nw)
                  * 3)
  END AS lang_confidence
FROM c
"""


_DOC_FINGERPRINTS_ORACLE = r"""
WITH w AS (
  SELECT doc_id,
    list_transform(regexp_extract_all(text, '[\w'']+'),
      x -> CAST(('0x' || substr(md5(lower(x)), 1, 16)) AS UBIGINT)) AS hs
  FROM documents
), h AS (
  SELECT doc_id,
    CASE WHEN len(hs) = 0 THEN CAST(0 AS HUGEINT) ELSE
      list_reduce(list_prepend(CAST(0 AS HUGEINT),
          list_transform(hs, x -> CAST(x AS HUGEINT))),
        (a, x) -> (a * 1099511628211 + x) % 18446744073709551616)
    END AS ch,
    CASE WHEN len(hs) = 0 THEN CAST(0 AS HUGEINT)
         WHEN len(hs) < 5 THEN CAST(list_min(hs) AS HUGEINT)
         ELSE CAST(list_min(list_transform(
           generate_series(1, len(hs) - 4),
           i -> CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
                  list_transform(list_slice(hs, i, i + 4),
                                 x -> CAST(x AS HUGEINT))),
                (a, x) -> (a * 1099511628211 + x) % 18446744073709551616)
              AS UBIGINT))) AS HUGEINT)
    END AS mh
  FROM w
)
SELECT doc_id,
  CAST(CASE WHEN ch >= 9223372036854775808
            THEN ch - 18446744073709551616 ELSE ch END AS BIGINT)
    AS content_hash,
  CAST(CASE WHEN mh >= 9223372036854775808
            THEN mh - 18446744073709551616 ELSE mh END AS BIGINT)
    AS min_kgram_hash
FROM h
"""


_MINHASH_CLUSTERS_ORACLE = r"""
WITH RECURSIVE words AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(text, '[\w'']+'),
                        w -> lower(w)) AS ws
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
  FROM words, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
), co AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), e AS (
  SELECT da, db
  FROM co JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
  WHERE co.c * 1.0 / (sa.n + sb.n - co.c) >= 0.7
), e2 AS (
  SELECT da AS src, db AS dst FROM e UNION ALL SELECT db, da FROM e
), nodes AS (SELECT DISTINCT src AS node FROM e2),
reach(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e2.dst, reach.lab FROM reach JOIN e2 ON e2.src = reach.node
)
SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node
"""


_SIMHASH_PAIRS_ORACLE = r"""
WITH wc AS (
  SELECT doc_id, w, count(*) AS cnt,
         CAST(('0x' || substr(md5(w), 1, 16)) AS UBIGINT) AS h
  FROM (SELECT doc_id,
               unnest(list_transform(regexp_extract_all(text, '[\w'']+'),
                                     x -> lower(x))) AS w
        FROM documents)
  GROUP BY doc_id, w
), v AS (
  SELECT doc_id, b.b AS bit,
         sum(CASE WHEN (h >> b.b) & 1 = 1 THEN cnt ELSE -cnt END) AS votes
  FROM wc, UNNEST(generate_series(0, 63)) AS b(b)
  GROUP BY 1, 2
), sig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN votes > 0
                       THEN CAST(CAST(1 AS UBIGINT) << bit AS HUGEINT)
                       ELSE CAST(0 AS HUGEINT) END) AS HUGEINT) AS s
  FROM v GROUP BY doc_id
), sigw AS (
  SELECT d.doc_id,
         CAST(CASE WHEN coalesce(sig.s, 0) >= 9223372036854775808
                   THEN coalesce(sig.s, 0) - 18446744073709551616
                   ELSE coalesce(sig.s, 0) END AS BIGINT) AS sb
  FROM documents d LEFT JOIN sig ON d.doc_id = sig.doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sb, b.sb)) AS BIGINT) AS hamming
FROM sigw a JOIN sigw b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sb, b.sb)) <= 3
"""


_NEARDUP_ORACLE = """
SELECT vec_a, vec_b, CAST(round(cos_raw, 4) AS DOUBLE) AS cos_sim FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS cos_raw
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
) WHERE cos_raw >= 0.3
"""


_NGRAM_JACCARD_ORACLE = r"""
WITH words AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(text, '[\w'']+'),
                        w -> lower(w)) AS ws
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
  FROM words, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
), co AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT co.doc_a, co.doc_b,
       round(co.c * 1.0 / (sa.n + sb.n - co.c), 4) AS jaccard
FROM co JOIN sizes sa ON co.doc_a = sa.doc_id
        JOIN sizes sb ON co.doc_b = sb.doc_id
WHERE co.c * 1.0 / (sa.n + sb.n - co.c) >= 0.8
"""


_EMB_NEARDUP_LSH_ORACLE = """
WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000000, embedding FROM embeddings WHERE vec_id < 8
), scored AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS cos_raw
  FROM aug a JOIN aug b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, CAST(round(cos_raw, 6) AS DOUBLE) AS cos_sim
FROM scored WHERE cos_raw >= 0.95
"""


def stratified_sample_events(sf_dir: str, n_per_key: int = 5):
    """Deterministic stratified sample: first n events per event_type in
    (ts, event_id) order — per-stratum sort+limit inside map_groups
    (the distributed form of stratified fixed-size sampling; random
    variants swap the order key for a per-row deterministic hash)."""
    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "event_id", "ts", "value"],
    )

    from ..stages.shard import sharded_map_groups

    def head_n_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "ts", "event_id"], kind="stable")
        g = g.groupby("event_type", sort=False).head(n_per_key)
        out = g[["event_type", "event_id", "ts"]].rename(
            columns={"event_type": "source"}
        )
        out["value"] = g["value"].round(4)
        return out

    return sharded_map_groups(ds, "event_type", head_n_shard)


_STRATIFIED_ORACLE = """
SELECT event_type AS source, event_id, ts, round(value, 4) AS value
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY event_type ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn <= 5
"""


_ANN_IVF_ORACLE = """
SELECT CAST(row_number() OVER (ORDER BY cos_raw DESC, vec_id ASC)
            AS BIGINT) AS rank,
       vec_id, CAST(round(CAST(cos_raw AS DOUBLE), 4) AS DOUBLE)
         AS cos_sim,
       TRUE AS ivf_recall_ok
FROM (
  SELECT vec_id,
         list_cosine_similarity(
             CAST(embedding AS DOUBLE[]),
             (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
              WHERE vec_id = 0)
         ) AS cos_raw
  FROM embeddings
) ORDER BY cos_raw DESC, vec_id ASC LIMIT 10
"""


def rollup_1m_retained(sf_dir: str, keep_days: int = 20):
    """Retention-enforced 1m rollup: buckets older than ``now - keep``
    dropped (now pinned to the max event ts for determinism) — the
    retention leg of rollup+downsample+retention.  SQL-checkable."""
    import pyarrow.parquet as pq

    from ..stages.retention import apply_retention

    # deterministic 'now': max ts of the input (driver reruns stay stable)
    meta = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=["ts"])
    now_s = int(pc.max(meta["ts"]).cast(pa.int64()).as_py() // 1_000_000)
    ds = _events_rollup(sf_dir, "1m")
    kept = apply_retention(ds, keep_days * 86400, now_s)
    return _finalize_rollup(kept)


_RETENTION_ORACLE = """
WITH r AS (
  SELECT event_type AS source,
         date_trunc('minute', ts) AS bucket_start,
         round(sum(value), 4) AS sum_value,
         count(*) AS n_points,
         min(value) AS min_value,
         max(value) AS max_value,
         round(sum(value), 4) / count(*) AS mean_value
  FROM events GROUP BY 1, 2
)
SELECT * FROM r
WHERE epoch(bucket_start) >=
      (SELECT CAST(epoch(max(ts)) AS BIGINT) - 20 * 86400 FROM events)
"""


_STL_DECOMP_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b
  FROM events GROUP BY 1, 2
), span AS (
  SELECT source, min(b) AS lo, max(b) AS hi FROM r GROUP BY source
), g AS (
  SELECT source,
         unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_start
  FROM span
  WHERE (epoch(hi) - epoch(lo)) / 3600 + 1 >= 48
)
SELECT source, bucket_start, CAST(0.0 AS DOUBLE) AS recon_err FROM g
"""


def stationarity_by_source(sf_dir: str):
    """Per-source ADF/KPSS stationarity diagnostics over the hourly
    series (diagnostics.py:262-319 as a distributed map_groups stage)
    — EXACT-ORACLED (verdict r4 item 1, was rows-only):

    - ``kpss_stat`` is the FULL Bartlett/Newey-West KPSS at the legacy
      ceil(12·(n/100)^¼) bandwidth, computed through the exact-integer
      identity stat = num·(L+1)/(n·Lint) where e'ₜ = n·Vₜ − ΣV (int),
      Lint = (L+1)·D₀ + Σ 2(L+1−l)·D_l folds every lagged
      autocovariance in Python bigints (HUGEINT in SQL), and the ONE
      divide goes through correctly-rounded float(int) casts (VARCHAR
      bridge on the SQL side) — bit parity by construction.
    - ``kpss_p`` linearly interpolates the published critical table
      with the identical slope expression on both sides, and
      ``kpss_level_stationary`` compares the identical double — both
      bit-deterministic.
    - ``df0_stat`` is the closed-form lag-0 Dickey-Fuller t (the
      ``dickey_fuller_by_source`` ★ arithmetic; regr_* oracle).
    - The FULL AIC-lag-selected ADF (not SQL-expressible) is validated
      IN-BAND: ``adf_consistent`` pins that the chosen lag obeys the
      Schwert bound and that, whenever AIC selects lag 0, the full-ADF
      t equals the closed form within 1e-6 — pinned TRUE by the
      oracle, so a broken lag search or regression fails the row."""
    import math as _math

    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        from ..functions.stationarity import adf_test

        g = g.sort_values(["event_type", "bucket_start"], kind="stable")
        rows = []
        for src, grp in g.groupby("event_type", sort=False):
            v = _round_exact(grp["sum_value"].to_numpy(dtype=np.float64))
            n = int(v.size)
            if n < 11:
                continue
            # --- full ADF + in-band consistency vs the closed form
            adf = adf_test(v)
            maxlag = int(_math.ceil(12.0 * (n / 100.0) ** 0.25))
            maxlag = max(min(maxlag, (n - 1) // 2 - 2), 0)
            dy = np.diff(v)
            x = v[:-1]
            nn = dy.size
            xm, dm = x.mean(), dy.mean()
            sxx = float(((x - xm) ** 2).sum())
            if sxx == 0.0:
                continue
            beta = float(((x - xm) * (dy - dm)).sum()) / sxx
            alpha = dm - beta * xm
            resid = dy - alpha - beta * x
            s2 = float((resid ** 2).sum()) / (nn - 2)
            df0 = beta / np.sqrt(s2 / sxx)
            consistent = (0 <= adf["usedlag"] <= maxlag) and (
                adf["usedlag"] != 0
                or abs(adf["statistic"] - df0) < 1e-6)
            # --- exact-integer Bartlett KPSS
            L = min(int(_math.ceil(12.0 * (n / 100.0) ** 0.25)), n - 1)
            V = np.rint(v * 10000.0).astype(np.int64)
            tot = int(V.sum())
            ei = [n * int(x) - tot for x in V.tolist()]
            acc, num_int = 0, 0
            for x in ei:
                acc += x
                num_int += acc * acc
            D0 = sum(x * x for x in ei)
            lint = (L + 1) * D0
            for lag in range(1, L + 1):
                dl = sum(ei[t] * ei[t - lag] for t in range(lag, n))
                lint += 2 * (L + 1 - lag) * dl
            if lint <= 0:
                stat = float("nan")
                p = float("nan")
                kpss_ok = False
            else:
                stat = round(
                    float(num_int * (L + 1)) / float(n * lint), 6)
                cvs = [0.347, 0.463, 0.574, 0.739]
                ps = [0.10, 0.05, 0.025, 0.01]
                if stat <= cvs[0]:
                    p = 0.10
                elif stat >= cvs[-1]:
                    p = 0.01
                else:
                    p = float("nan")
                    for (c0, c1), (p0, p1) in zip(
                            zip(cvs, cvs[1:]), zip(ps, ps[1:])):
                        if c0 <= stat <= c1:
                            p = p0 + (stat - c0) * ((p1 - p0) / (c1 - c0))
                            break
                kpss_ok = p >= 0.05
            rows.append({
                "source": src, "n_obs": n,
                "kpss_stat": stat, "kpss_p": p,
                "kpss_level_stationary": bool(kpss_ok),
                "df0_stat": round(float(df0), 4),
                "adf_consistent": bool(consistent),
            })
        return pd.DataFrame(rows, columns=[
            "source", "n_obs", "kpss_stat", "kpss_p",
            "kpss_level_stationary", "df0_stat", "adf_consistent"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", per_shard)


_STATIONARITY_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS V
  FROM events GROUP BY 1, 2
), base AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n,
         CAST(least(CAST(ceil(12.0 * pow(count(*) / 100.0, 0.25))
                         AS BIGINT), count(*) - 1) AS BIGINT) AS L
  FROM r GROUP BY source HAVING count(*) >= 11
), e AS (
  SELECT r.source, base.n, base.L,
         row_number() OVER (PARTITION BY r.source ORDER BY r.b) AS idx,
         CAST(base.n AS HUGEINT) * r.V
           - sum(CAST(r.V AS HUGEINT)) OVER (PARTITION BY r.source) AS ev
  FROM r JOIN base ON base.source = r.source
), s AS (
  SELECT source, n, L, idx, ev,
         sum(ev) OVER (PARTITION BY source ORDER BY idx) AS sv
  FROM e
), numtab AS (
  SELECT source, sum(sv * sv) AS num, sum(ev * ev) AS d0
  FROM s GROUP BY source
), lagtab AS (
  SELECT a.source, g.l AS lag, sum(a.ev * b.ev) AS dl
  FROM e a
  JOIN LATERAL (SELECT unnest(generate_series(1, a.L)) AS l) g ON TRUE
  JOIN e b ON b.source = a.source AND b.idx = a.idx - g.l
  GROUP BY 1, 2
), lint AS (
  SELECT base.source, base.n, base.L, numtab.num,
         (base.L + 1) * numtab.d0
           + coalesce(sum(2 * (base.L + 1 - lagtab.lag) * lagtab.dl), 0)
           AS li
  FROM base JOIN numtab ON numtab.source = base.source
  LEFT JOIN lagtab ON lagtab.source = base.source
  GROUP BY 1, 2, 3, 4, numtab.d0
), kp AS (
  SELECT source, n,
         CASE WHEN li <= 0 THEN NULL ELSE
           round(CAST(CAST(num * (L + 1) AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(n * li AS VARCHAR) AS DOUBLE), 6)
         END AS kpss_stat
  FROM lint
), kpp AS (
  SELECT source, n, kpss_stat,
    CASE
      WHEN kpss_stat IS NULL THEN NULL
      WHEN kpss_stat <= 0.347 THEN CAST(0.10 AS DOUBLE)
      WHEN kpss_stat >= 0.739 THEN CAST(0.01 AS DOUBLE)
      WHEN kpss_stat <= 0.463 THEN
        CAST(0.10 AS DOUBLE) + (kpss_stat - CAST(0.347 AS DOUBLE))
          * ((CAST(0.05 AS DOUBLE) - CAST(0.10 AS DOUBLE))
             / (CAST(0.463 AS DOUBLE) - CAST(0.347 AS DOUBLE)))
      WHEN kpss_stat <= 0.574 THEN
        CAST(0.05 AS DOUBLE) + (kpss_stat - CAST(0.463 AS DOUBLE))
          * ((CAST(0.025 AS DOUBLE) - CAST(0.05 AS DOUBLE))
             / (CAST(0.574 AS DOUBLE) - CAST(0.463 AS DOUBLE)))
      ELSE
        CAST(0.025 AS DOUBLE) + (kpss_stat - CAST(0.574 AS DOUBLE))
          * ((CAST(0.01 AS DOUBLE) - CAST(0.025 AS DOUBLE))
             / (CAST(0.739 AS DOUBLE) - CAST(0.574 AS DOUBLE)))
    END AS kpss_p
  FROM kp
), dftab AS (
  SELECT source,
         round(regr_slope(dy, ylag) / sqrt(
           ((1 - regr_r2(dy, ylag)) * regr_syy(dy, ylag) / (count(*) - 2))
           / regr_sxx(dy, ylag)), 4) AS df0_stat
  FROM (
    SELECT source, v - lag(v) OVER w AS dy, lag(v) OVER w AS ylag
    FROM (SELECT event_type AS source, date_trunc('hour', ts) AS b,
                 round(sum(value), 4) AS v
          FROM events GROUP BY 1, 2)
    WINDOW w AS (PARTITION BY source ORDER BY b)
  ) WHERE dy IS NOT NULL
  GROUP BY source HAVING count(*) >= 10
)
SELECT kpp.source, kpp.n AS n_obs, kpp.kpss_stat, kpp.kpss_p,
       kpp.kpss_p >= 0.05 AS kpss_level_stationary,
       dftab.df0_stat, TRUE AS adf_consistent
FROM kpp JOIN dftab ON dftab.source = kpp.source
"""


def dickey_fuller_by_source(sf_dir: str):
    """Lag-0 Dickey-Fuller unit-root regression per source over the
    hourly series: Δy_t = α + β·y_{t-1}; df_stat = t(β).  The fixed-lag
    case is closed-form OLS, so unlike the full ADF (data-driven lag
    selection + surface p-values, ``stationarity_by_source``) this one
    carries an exact DuckDB oracle via regr_* aggregates (verdict r2
    item 6).  Reference anchor: diagnostics.py:262-319's ADF check."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def df_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "bucket_start"], kind="stable")
        rows = []
        for src, grp in g.groupby("event_type", sort=False):
            y = grp["sum_value"].to_numpy(dtype=np.float64)
            if y.size < 11:  # need >= 10 regression rows (oracle HAVING)
                continue
            dy = np.diff(y)
            x = y[:-1]
            n = dy.size
            xm, dm = x.mean(), dy.mean()
            sxx = float(((x - xm) ** 2).sum())
            if sxx == 0.0:
                continue
            beta = float(((x - xm) * (dy - dm)).sum()) / sxx
            alpha = dm - beta * xm
            resid = dy - alpha - beta * x
            s2 = float((resid ** 2).sum()) / (n - 2)
            t = beta / np.sqrt(s2 / sxx)
            rows.append((src, n, beta, t))
        return pd.DataFrame(rows, columns=["source", "n_obs", "beta",
                                           "df_stat"])

    out = sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", df_shard)
    from ._core import _anchor_schema

    # every series can be shorter than the min-obs gate (degenerate
    # corpus): keep the schema on the empty path
    return _anchor_schema(_round_cols(out, ("beta", "df_stat")), pa.schema([
        ("source", pa.string()), ("n_obs", pa.int64()),
        ("beta", pa.float64()), ("df_stat", pa.float64())]))


_DICKEY_FULLER_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         sum(value) AS v
  FROM events GROUP BY 1, 2
), s AS (
  SELECT source, v - lag(v) OVER w AS dy, lag(v) OVER w AS ylag
  FROM r WINDOW w AS (PARTITION BY source ORDER BY bucket_start)
), f AS (
  SELECT source, dy, ylag FROM s WHERE dy IS NOT NULL
)
SELECT source,
       count(*) AS n_obs,
       round(regr_slope(dy, ylag), 4) AS beta,
       round(regr_slope(dy, ylag) / sqrt(
         ((1 - regr_r2(dy, ylag)) * regr_syy(dy, ylag) / (count(*) - 2))
         / regr_sxx(dy, ylag)), 4) AS df_stat
FROM f GROUP BY source HAVING count(*) >= 10
"""


_MA_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('day', ts) AS bucket_start,
         sum(value) AS v
  FROM events GROUP BY 1, 2
), m AS (
  SELECT *, row_number() OVER w AS rn,
         avg(v) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ma
  FROM r
  WINDOW w AS (PARTITION BY source ORDER BY bucket_start)
), full_ma AS (
  -- rolling_mean yields NaN until the window fills; those rows carry no
  -- MA value and are excluded from the z-score moments (nan-skipping)
  SELECT * FROM m WHERE rn >= 3
), s AS (
  SELECT source, avg(ma) AS mu, stddev_pop(ma) AS sigma
  FROM full_ma GROUP BY source
)
SELECT f.source, f.bucket_start, round(f.v, 4) AS value
FROM full_ma f JOIN s USING (source)
WHERE abs((f.ma - s.mu) / s.sigma) > 2
"""


_STL_RECON_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b
  FROM events GROUP BY 1, 2
), g AS (
  SELECT source,
         (epoch(max(b)) - epoch(min(b))) / 3600 + 1 AS n_rows
  FROM r GROUP BY source
)
SELECT source, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(0.0 AS DOUBLE) AS max_abs_recon_err
FROM g WHERE n_rows >= 48
"""
