"""Rollup + cascading continuous aggregates (1m → 1h → 1d).

The engine's monitored signal is the reference's "count/total per period"
feature (catch.py README contract) generalized to
``value per (key, time-bucket)`` — for the native input, ``n_tok`` per
``(source, minute)``.

Scale design (SURVEY.md §4):

- **Partial aggregation before the shuffle.**  Each ``map_batches`` call
  pre-aggregates its batch with a pyarrow ``Table.group_by`` (one output
  row per key per batch), so the all-to-all ``groupby`` exchange moves
  per-batch partials, not raw rows.  For a hot Zipf source this is the
  combiner-style skew defense: a source with 10^6 rows/bucket still
  contributes exactly one partial row per batch.
- **Cascade re-aggregation.**  1h is computed from the 1m output and 1d
  from 1h (sum-of-sums, min-of-mins, ...), never re-reading raw input.
- **Column pruning.**  Callers read only (key, ts, value) — the wide
  ``tokens`` arrays never enter the shuffle.

Output schema per tier: (key, bucket_start: timestamp,
sum_value, n_points, min_value, max_value, mean_value).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["bucket_column", "rollup", "cascade", "hopping_rollup",
           "rollup_tiers"]

_UNIT_FOR_SECONDS = {60: "minute", 3600: "hour", 86400: "day"}

# calendar units (month/quarter/year) have no fixed width; pass the unit
# string instead of seconds for those (diagnostics.py:255 monthwise parity)
_CALENDAR_UNITS = {"month", "quarter", "year", "week"}


def bucket_column(ts: pa.ChunkedArray | pa.Array, bucket_seconds):
    """Floor a timestamp column to the bucket grid, keeping timestamp type.

    ``bucket_seconds`` is either a fixed width in seconds or a calendar
    unit name ('month', 'quarter', 'year', 'week')."""
    if isinstance(bucket_seconds, str):
        if bucket_seconds not in _CALENDAR_UNITS:
            raise ValueError(f"unknown calendar unit {bucket_seconds!r}")
        return pc.floor_temporal(ts, unit=bucket_seconds)
    unit = _UNIT_FOR_SECONDS.get(bucket_seconds)
    if unit is not None:
        return pc.floor_temporal(ts, unit=unit)
    # arbitrary width: integer arithmetic on the raw epoch value.  Arrow's
    # integer divide truncates toward zero, which would round pre-1970
    # (negative-epoch) timestamps UP into the wrong bucket; shifting
    # negatives down by (divisor-1) first turns truncation into floor
    # division without leaving int64 (float floor would lose ns precision).
    raw = ts.cast(pa.int64())  # timestamps cast to epoch in their unit
    unit_div = {"s": 1, "ms": 1000, "us": 1_000_000, "ns": 1_000_000_000}[
        ts.type.unit
    ]
    divisor = bucket_seconds * unit_div
    adj = pc.if_else(
        pc.less(raw, 0), pc.subtract(raw, divisor - 1), raw
    )
    return pc.multiply(pc.divide(adj, divisor), divisor).cast(ts.type)


def _partial(batch: pa.Table, key_col: str, ts_col: str, value_col: str,
             bucket_seconds: int) -> pa.Table:
    buck = bucket_column(batch[ts_col], bucket_seconds)
    t = pa.table(
        {
            key_col: batch[key_col],
            "bucket_start": buck,
            "v": batch[value_col].cast(pa.float64()),
        }
    )
    g = t.group_by([key_col, "bucket_start"]).aggregate(
        [("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max")]
    )
    return g.rename_columns(
        [key_col, "bucket_start", "p_sum", "p_n", "p_min", "p_max"]
    )


def _partial_from_rollup(batch: pa.Table, key_col: str, bucket_seconds: int
                         ) -> pa.Table:
    buck = bucket_column(batch["bucket_start"], bucket_seconds)
    t = pa.table(
        {
            key_col: batch[key_col],
            "bucket_start": buck,
            "p_sum": batch["sum_value"],
            "p_n": batch["n_points"],
            "p_min": batch["min_value"],
            "p_max": batch["max_value"],
        }
    )
    g = t.group_by([key_col, "bucket_start"]).aggregate(
        [("p_sum", "sum"), ("p_n", "sum"), ("p_min", "min"), ("p_max", "max")]
    )
    return g.rename_columns(
        [key_col, "bucket_start", "p_sum", "p_n", "p_min", "p_max"]
    )


def _finalize(key_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        mean = pc.divide(batch["sum_value"], pc.cast(batch["n_points"], pa.float64()))
        return pa.table(
            {
                key_col: batch[key_col],
                "bucket_start": batch["bucket_start"],
                "sum_value": batch["sum_value"],
                "n_points": batch["n_points"],
                "min_value": batch["min_value"],
                "max_value": batch["max_value"],
                "mean_value": mean,
            }
        )

    return fn


def _combine_partials(t: pa.Table, key_col: str) -> pa.Table:
    g = t.select([key_col, "bucket_start", "p_sum", "p_n", "p_min", "p_max"]
                 ).group_by([key_col, "bucket_start"]).aggregate(
        [("p_sum", "sum"), ("p_n", "sum"), ("p_min", "min"), ("p_max", "max")]
    )
    return g.rename_columns(
        [key_col, "bucket_start", "p_sum", "p_n", "p_min", "p_max"]
    )


def _final_aggregate(partials, key_col: str, num_buckets: int | None = None):
    """Bucketed final combine.

    Ray's ``groupby().aggregate()`` runs a Python loop per output group
    (~0.3 ms/group — 80k groups cost ~25 s), so the exchange here groups
    by ``hash(key, bucket_start) % B`` instead: the all-to-all has only
    B groups, and each group's combine is ONE vectorized pyarrow
    ``group_by`` (C++).  B bounds parallelism and skew: buckets are
    hash-uniform, and the per-batch partial combine has already collapsed
    duplicate keys, so bucket sizes are ~|output|/B regardless of hot
    keys — this is the salted two-stage aggregation of SURVEY.md §4.
    The exchange itself is the raw split/reduce hash shuffle
    (stages/shard.py) — Ray's sort-based groupby cost ~1-1.5 s fixed on
    this path.  ``num_buckets=None`` (default) right-sizes B from the
    partial-row count: a fixed 64-way fan cost ~0.5 s of pure task
    overhead per CASCADE tier whose input is a few thousand rows, and
    under-parallelized the 10⁶-partial 1m tier.
    """

    def combine(group: pa.Table) -> pa.Table:
        out = _combine_partials(group, key_col).rename_columns(
            [key_col, "bucket_start", "sum_value", "n_points", "min_value",
             "max_value"]
        )
        return _finalize(key_col)(out)

    from .shard import sharded_map_groups

    return sharded_map_groups(partials, [key_col, "bucket_start"], combine,
                              num_shards=num_buckets,
                              batch_format="pyarrow")


def rollup(ds, key_col: str, ts_col: str, value_col: str, bucket_seconds: int,
           batch_size: int | None = None):
    """Raw rows → per-(key, bucket) aggregate (partial + final)."""
    partials = ds.map_batches(
        lambda b: _partial(b, key_col, ts_col, value_col, bucket_seconds),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    return _final_aggregate(partials, key_col)


def cascade(rollup_ds, key_col: str, bucket_seconds: int,
            batch_size: int | None = None):
    """Re-aggregate a finer rollup into a coarser tier (sum of sums)."""
    partials = rollup_ds.map_batches(
        lambda b: _partial_from_rollup(b, key_col, bucket_seconds),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    return _final_aggregate(partials, key_col)


def hopping_rollup(ds, key_col: str, ts_col: str, value_col: str,
                   window_seconds: int, hop_seconds: int,
                   batch_size: int | None = None):
    """Hopping (overlapping) windowed aggregate: per-(key, window_start)
    stats where windows of ``window_seconds`` start every ``hop_seconds``
    (window = hop is a plain tumbling rollup).

    Scale shape: each batch is first combined on the *hop* grid (one
    partial row per key per hop bucket — the same combiner-before-shuffle
    defense as ``rollup``), and only those partials are replicated
    ``window/hop`` times with shifted window starts.  The all-to-all
    exchange therefore moves ``window/hop × |hop partials|`` rows, never
    ``window/hop × |raw rows|``; duplicate (key, window_start) pairs from
    different hop buckets merge in the bucketed final combine."""
    if window_seconds % hop_seconds:
        raise ValueError("window_seconds must be a multiple of hop_seconds")
    n_win = window_seconds // hop_seconds

    def partial(batch: pa.Table) -> pa.Table:
        g = _partial(batch, key_col, ts_col, value_col, hop_seconds)
        if n_win == 1:
            return g
        base = g["bucket_start"]
        unit_div = {"s": 1, "ms": 1000, "us": 1_000_000,
                    "ns": 1_000_000_000}[base.type.unit]
        pieces = []
        for k in range(n_win):
            shifted = pc.subtract(
                base.cast(pa.int64()),
                pa.scalar(k * hop_seconds * unit_div, pa.int64()),
            ).cast(base.type)
            pieces.append(g.set_column(
                g.column_names.index("bucket_start"), "bucket_start", shifted
            ))
        return pa.concat_tables(pieces)

    partials = ds.map_batches(
        partial,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    return _final_aggregate(partials, key_col)


def rollup_tiers(ds, key_col: str, ts_col: str, value_col: str,
                 tier_seconds: dict[str, int], batch_size: int | None = None):
    """Compute all tiers as a cascade keyed by ascending bucket width.

    Returns {tier_name: Dataset}.  The finest tier aggregates raw rows;
    every coarser tier re-aggregates the previous tier's output.
    """
    ordered = sorted(tier_seconds.items(), key=lambda kv: kv[1])
    out: dict[str, object] = {}
    prev = None
    for name, secs in ordered:
        if prev is None:
            out[name] = rollup(ds, key_col, ts_col, value_col, secs, batch_size)
        else:
            out[name] = cascade(out[prev], key_col, secs, batch_size)
        prev = name
    return out
