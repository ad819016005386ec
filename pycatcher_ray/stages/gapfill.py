"""Gap-fill stage: dense bucket grid per series, LOCF + linear interpolation.

The reference hard-errors or mis-dispatches on irregular series
(``inferred_freq is None`` crashes at catch.py:571); the engine instead
makes the grid explicit: every series is re-indexed onto its tier's dense
bucket grid, missing buckets are filled (linear interpolation or
last-observation-carried-forward), and a ``fill_method`` column records
provenance ('observed' | 'linear' | 'locf') so detectors can ignore or
down-weight synthetic points.

Runs on the hash-sharded exchange (``groupby(hash(key) % B)``,
stages/shard.py) — one Ray group per SHARD, every series in the shard
filled by a pandas pass, ordered by bucket inside the series (never
relies on global order).  Series length is bounded by tier retention
(SURVEY.md §4), so a shard always fits one task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["gapfill_group", "gapfill"]

_FILL_COLS = ("sum_value", "n_points", "min_value", "max_value", "mean_value")


def gapfill_group(g: pd.DataFrame, *, key_col: str, bucket_seconds: int,
                  method: str = "linear",
                  value_cols: tuple[str, ...] = _FILL_COLS) -> pd.DataFrame:
    """Fill one series' missing buckets between its min and max bucket."""
    g = g.sort_values("bucket_start")
    buckets = g["bucket_start"].to_numpy()
    if len(g) == 0:
        return g.assign(fill_method=pd.Series([], dtype=str))
    step = np.timedelta64(bucket_seconds, "s")
    grid = np.arange(buckets[0], buckets[-1] + step, step)
    out = pd.DataFrame({"bucket_start": grid})
    out[key_col] = g[key_col].iloc[0]
    merged = out.merge(g, on=[key_col, "bucket_start"], how="left")
    observed = ~merged[value_cols[0]].isna()
    for col in value_cols:
        if col not in merged:
            continue
        if method == "locf":
            merged[col] = merged[col].ffill()
        else:
            merged[col] = merged[col].interpolate(method="linear", limit_direction="forward")
    merged["fill_method"] = np.where(observed, "observed", method)
    cols = [key_col, "bucket_start", *[c for c in value_cols if c in merged],
            "fill_method"]
    return merged[cols]


def gapfill(rollup_ds, key_col: str, bucket_seconds: int,
            method: str = "linear", num_shards: int | None = None):
    from .shard import sharded_map_groups

    def fill_shard(shard: pd.DataFrame) -> pd.DataFrame:
        frames = [
            gapfill_group(g, key_col=key_col, bucket_seconds=bucket_seconds,
                          method=method)
            for _, g in shard.groupby(key_col, sort=False)
        ]
        return pd.concat(frames, ignore_index=True)

    return sharded_map_groups(rollup_ds, key_col, fill_shard,
                              num_shards=num_shards)
