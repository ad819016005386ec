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
    _events_rollup,
)
from .events2 import (
    _hourly_int_units,
)



def flag_persistence(sf_dir: str):
    """Alert persistence (the alert-fatigue metric): per source, over
    consecutive OBSERVED daily buckets, the conditional rate of a
    daily IQR flag given yesterday flagged vs given yesterday was
    quiet — a detector whose flags clump (p_after_flag ≫
    p_after_quiet) is tracking regimes, not isolated spikes, and its
    alerts should be debounced.  The flag rule is the oracle-pinned
    IQR fence; day adjacency is exact integer epoch-day arithmetic;
    rates are ONE int/int divide each (NULL when a denominator is 0).
    One source-keyed exchange over the O(sources × days) daily tier."""
    from ..functions.stats import quantile_cont
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1d")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, _bs, xs, y4 in _hourly_int_units(shard):
            # xs are epoch-HOURS of the day buckets — convert to days
            day = xs // 24
            # the bit-pinned two-product-lerp quantile over exact ints
            q1 = quantile_cont(y4.astype(np.float64), 0.25)
            q3 = quantile_cont(y4.astype(np.float64), 0.75)
            lo_f = q1 - 1.5 * (q3 - q1)
            hi_f = q3 + 1.5 * (q3 - q1)
            yv = y4.astype(np.float64)
            flag = (yv < lo_f) | (yv > hi_f)
            order = np.argsort(day, kind="stable")
            dsrt, fsrt = day[order], flag[order]
            adj = np.flatnonzero(np.diff(dsrt) == 1)
            if len(adj) == 0:
                continue  # no adjacent-day pairs -> no oracle row
            prev_f, next_f = fsrt[adj], fsrt[adj + 1]
            n_after_flag = int(prev_f.sum())
            n_after_quiet = int((~prev_f).sum())
            ff = int((prev_f & next_f).sum())
            qf = int((~prev_f & next_f).sum())
            rows.append({
                "source": src,
                "n_pairs": np.int64(len(adj)),
                "n_after_flag": np.int64(n_after_flag),
                "n_flag_after_flag": np.int64(ff),
                "n_flag_after_quiet": np.int64(qf),
                "p_after_flag": (ff / n_after_flag
                                 if n_after_flag else np.nan),
                "p_after_quiet": (qf / n_after_quiet
                                  if n_after_quiet else np.nan)})
        return pd.DataFrame(rows, columns=[
            "source", "n_pairs", "n_after_flag", "n_flag_after_flag",
            "n_flag_after_quiet", "p_after_flag", "p_after_quiet"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold, num_shards=4)


_FLAG_PERSISTENCE_ORACLE = """
WITH r AS (
  SELECT event_type AS source,
         CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY event_type, date_trunc('day', ts)
), q AS (
  SELECT source, quantile_cont(y * 1.0, 0.25) AS q1,
         quantile_cont(y * 1.0, 0.75) AS q3
  FROM r GROUP BY source
), f AS (
  SELECT r.source, r.day,
         (r.y * 1.0 < q.q1 - 1.5 * (q.q3 - q.q1)
          OR r.y * 1.0 > q.q3 + 1.5 * (q.q3 - q.q1)) AS flag
  FROM r JOIN q USING (source)
), p AS (
  SELECT source, day, flag,
         lag(day) OVER (PARTITION BY source ORDER BY day) AS pd,
         lag(flag) OVER (PARTITION BY source ORDER BY day) AS pf
  FROM f
), a AS (
  SELECT source,
         count(*) AS n_pairs,
         sum(CASE WHEN pf THEN 1 ELSE 0 END) AS n_after_flag,
         sum(CASE WHEN pf AND flag THEN 1 ELSE 0 END)
           AS n_flag_after_flag,
         sum(CASE WHEN NOT pf AND flag THEN 1 ELSE 0 END)
           AS n_flag_after_quiet
  FROM p WHERE pd = day - 1 GROUP BY 1
)
SELECT source, CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(n_after_flag AS BIGINT) AS n_after_flag,
       CAST(n_flag_after_flag AS BIGINT) AS n_flag_after_flag,
       CAST(n_flag_after_quiet AS BIGINT) AS n_flag_after_quiet,
       CASE WHEN n_after_flag > 0 THEN
         CAST(n_flag_after_flag AS DOUBLE) / n_after_flag END
         AS p_after_flag,
       CASE WHEN n_pairs - n_after_flag > 0 THEN
         CAST(n_flag_after_quiet AS DOUBLE) / (n_pairs - n_after_flag)
         END AS p_after_quiet
FROM a
"""
