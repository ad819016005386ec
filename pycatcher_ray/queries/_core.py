"""Shared helpers for the queries package (mechanical split of queries.py, r5)."""

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

ROUND = 4

# --------------------------------------------------------------- helpers


def _rd():
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    return rd


def _events(sf_dir: str):
    return _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts", "value"],
    )


def _round_exact(values, ndigits: int = ROUND) -> np.ndarray:
    """Correctly-rounded decimal rounding (Python's round semantics),
    matching SQL round() to the last ULP.  Arrow's pc.round and numpy's
    np.round both scale-multiply-round-divide, which can land one ULP
    off the nearest double of the true decimal — invisible until a
    downstream division sits exactly on a half-tie of the comparison
    rounding (found by the sf0.1 sweep).

    Vectorized (verdict r2 item 8): np.round everywhere, then Python's
    correctly-rounded round() ONLY for elements whose scaled value sits
    within drift distance of a .5 tie — the only place the two can
    disagree.  The suspicious set is O(ties), not O(rows)."""
    arr = np.asarray(values, dtype=np.float64)
    flat = arr.ravel()
    out = np.round(flat, ndigits)
    with np.errstate(invalid="ignore", over="ignore"):
        scaled = flat * (10.0 ** ndigits)
        # distance of the scaled value from the nearest half-integer tie;
        # scale-multiply drift is a few ULPs of `scaled`, so anything
        # farther than the relative threshold rounds identically both ways
        tie_dist = np.abs(scaled - np.floor(scaled) - 0.5)
        thresh = np.abs(scaled) * 1e-12 + 1e-9
        suspicious = np.nonzero((tie_dist < thresh) & np.isfinite(flat))[0]
    for i in suspicious:
        out[i] = round(float(flat[i]), ndigits)
    return out.reshape(arr.shape)


def _round_cols(ds, cols: tuple[str, ...], ndigits: int = ROUND):
    def fn(batch: pa.Table) -> pa.Table:
        for c in cols:
            if c in batch.column_names:
                idx = batch.column_names.index(c)
                rounded = _round_exact(
                    batch[c].to_numpy(zero_copy_only=False), ndigits
                )
                batch = batch.set_column(idx, c, pa.array(rounded))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")


# Per-process memo of shared intermediate Datasets (verdict r3 item 1:
# the driver's correctness gate runs ~100 queries in one process and
# most start from the same rollup — re-deriving it per query re-reads
# the parquet and re-runs the exchange every time).  Datasets are
# immutable and the sharded exchange executes eagerly, so a cached
# entry is materialized blocks in the object store; consumers stack
# their own lazy ops on top.  Keyed by (name, abspath) — tiny at gate
# scale (a rollup tier is 10^3-10^5 rows).
_DS_MEMO: dict[tuple, object] = {}


def _memo_ds(key: tuple, build):
    ds = _DS_MEMO.get(key)
    if ds is None:
        ds = _DS_MEMO[key] = build()
    return ds


def _events_rollup(sf_dir: str, tier: str):
    """Cascaded rollup over events: 1m from raw, 1h from 1m, 1d from 1h
    (each tier built from the previous tier's memoized output)."""
    sf_dir = os.path.abspath(sf_dir)
    if tier == "1m":
        return _memo_ds(("ev_roll", sf_dir, "1m"), lambda: rollup(
            _events(sf_dir), "event_type", "ts", "value", 60))
    if tier == "1h":
        return _memo_ds(("ev_roll", sf_dir, "1h"), lambda: cascade(
            _events_rollup(sf_dir, "1m"), "event_type", 3600))
    if tier == "1d":
        return _memo_ds(("ev_roll", sf_dir, "1d"), lambda: cascade(
            _events_rollup(sf_dir, "1h"), "event_type", 86400))
    raise ValueError(f"unknown tier {tier!r}")


def _ds_to_pandas(ds) -> pd.DataFrame:
    """``Dataset.to_pandas`` that KEEPS the column list on 0-row
    datasets (Ray's own returns a colless frame even when the schema
    is intact — found by the minimal-corpus sweep); required wherever
    a driver-side fold indexes columns of a possibly-empty result."""
    df = ds.to_pandas()
    if len(df.columns):
        return df
    sch = ds.schema(fetch_if_missing=True)
    if sch is None or not getattr(sch, "names", None):
        return df
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base.empty_table().to_pandas()
    return pd.DataFrame({n: pd.Series([], dtype=object)
                         for n in sch.names})


from ..stages.shard import anchor_schema as _anchor_schema  # noqa: E402,F401


_FLAG_SCHEMA = pa.schema([
    ("source", pa.string()),
    ("bucket_start", pa.timestamp("s")),
    ("value", pa.float64()),
])


def _flags(sf_dir: str, tier: str, method: str, **cfg_overrides):
    """Run the detector actor-pool stage with one method over the events
    rollup; emit (source, bucket_start, value) flag rows."""
    from ..config import auto_concurrency

    cfg = EngineConfig(detect_concurrency=auto_concurrency(cap=8),
                       detect_batch_series=4, **cfg_overrides)
    roll = _events_rollup(sf_dir, tier)
    flags = detect(roll, "event_type", tier=tier, cfg=cfg, methods=(method,))
    out = flags.select_columns(["key", "bucket_start", "value"]).rename_columns(
        {"key": "source"}
    )
    return _anchor_schema(_round_cols(out, ("value",)), _FLAG_SCHEMA)


def iqr_flags_1h(sf_dir: str):
    return _flags(sf_dir, "1h", "iqr")


# --------------------------------------------- tokens-native (rows-only)

_SF_ROWS = {"sf0.001": 6_000, "sf0.01": 60_000, "sf0.1": 600_000}


def _cast_npoints_double(ds):
    """Stable gap-fill schema: n_points is always float64.  Without gaps
    the pandas merge keeps int64, with gaps interpolation makes it float —
    the same query must not change schema with the data."""

    def fn(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("n_points")
        return batch.set_column(
            i, "n_points", pc.cast(batch["n_points"], pa.float64())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 (Steele et al., the JDK SplittableRandom
    finalizer) over uint64 — the engine's deterministic row-hash for
    consistent sampling.  Bit-exact reproducible in ANSI SQL via HUGEINT
    mod-2^64 arithmetic (see _HASH_SAMPLE_ORACLE), so hash-derived
    sampling decisions are oracle-checkable, not rows-only."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _sql_mulmod64(a: str, c: int) -> str:
    """(a * c) mod 2^64 in DuckDB HUGEINT without INT128 overflow:
    split a into 32-bit halves so every product stays under 2^96."""
    return (f"((({a}) % 4294967296) * {c} + "
            f"(((({a}) // 4294967296) * {c}) % 4294967296) * 4294967296) "
            f"% 18446744073709551616")


# per-language keep rates for mixture_sample_docs — powers of two so the
# thresholds rate×2^64 are exact integers in BOTH engines
_MIXTURE_RATES = {"en": (1, 2), "zh": (1, 4), "es": (1, 8), "de": (1, 8),
                  "fr": (1, 16)}
_MIXTURE_DEFAULT = (1, 16)


_STOPWORDS = (
    "the", "of", "and", "a", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
    "or", "from", "not", "but", "have",
)


_MJ_PERMS = 16


# deliberately TIGHT (64 bits) so real false positives occur at every
# test scale and the fp-counting path is genuinely exercised
_BLOOM_BITS, _BLOOM_ROWS, _BLOOM_REF = 64, 3, "src0"
