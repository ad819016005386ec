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
    _MIXTURE_DEFAULT,
    _MIXTURE_RATES,
    _events_rollup,
    _rd,
    _round_exact,
    _sql_mulmod64,
)
from .events import (
    _finalize_rollup,
)



_MSTL_RECON_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b
  FROM events GROUP BY 1, 2
), g AS (
  SELECT source,
         (epoch(max(b)) - epoch(min(b))) / 3600 + 1 AS n_rows
  FROM r GROUP BY source
)
SELECT source, CAST(n_rows AS BIGINT) AS n_rows,
       CAST((CASE WHEN n_rows >= 48 THEN 1 ELSE 0 END)
            + (CASE WHEN n_rows >= 336 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_periods_used,
       CAST(0.0 AS DOUBLE) AS max_abs_recon_err
FROM g WHERE n_rows >= 48
"""


def gapfill_locf_1h(sf_dir: str):
    """LOCF gap-fill over the hourly events series with fill provenance
    — the gap-fill leg of the north rule with a hard SQL oracle (the
    dense grid + last-observation carry is expressible with
    generate_series + IGNORE NULLS window)."""
    from ..stages.gapfill import gapfill

    roll = _events_rollup(sf_dir, "1h")
    filled = gapfill(roll.rename_columns({"event_type": "source"}),
                     "source", 3600, method="locf")

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "bucket_start": b["bucket_start"],
                "sum_value": pa.array(_round_exact(
                    b["sum_value"].to_numpy(zero_copy_only=False))),
                "fill_method": b["fill_method"],
            }
        )

    return filled.map_batches(fin, batch_format="pyarrow")


_GAPFILL_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         sum(value) AS v
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT source, min(b) AS b0, max(b) AS b1 FROM r GROUP BY source
), grid AS (
  SELECT source, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS b
  FROM bounds
)
SELECT g.source, g.b AS bucket_start,
       round(last_value(r.v IGNORE NULLS) OVER (
           PARTITION BY g.source ORDER BY g.b
           ROWS UNBOUNDED PRECEDING), 4) AS sum_value,
       CASE WHEN r.v IS NULL THEN 'locf' ELSE 'observed' END AS fill_method
FROM grid g LEFT JOIN r ON g.source = r.source AND g.b = r.b
"""


def p95_hourly_by_source(sf_dir: str):
    """Exact per-source p50/p95 of the hourly sums: series gathered per
    key by the hash-sharded exchange, numpy linear-interpolation
    quantiles (== SQL quantile_cont) inside the shard.  The
    sketch-shaped approximate variant for 10^9-key cardinality is the
    same partial/merge pattern as approx_users_by_type (HLL)."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    from ..functions.stats import quantile_cont

    def quant(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, grp in g.groupby("event_type", sort=False):
            v = grp["sum_value"].to_numpy(dtype=np.float64)
            rows.append({
                "source": src,
                # round at 6: the exact quantile of d-decimal sums has
                # <= d+2 decimals, so no half-tie is possible there
                "p50": round(quantile_cont(v, 0.5), 6),
                "p95": round(quantile_cont(v, 0.95), 6),
                "n_buckets": int(v.size),
            })
        return pd.DataFrame(rows, columns=["source", "p50", "p95",
                                           "n_buckets"])

    return sharded_map_groups(roll, "event_type", quant)


_P95_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         sum(value) AS v
  FROM events GROUP BY 1, 2
)
SELECT source,
       round(quantile_cont(v, 0.5), 6) AS p50,
       round(quantile_cont(v, 0.95), 6) AS p95,
       count(*) AS n_buckets
FROM r GROUP BY source
"""


def monthwise_box_stats(sf_dir: str):
    """The reference's month-wise boxplot (diagnostics.py:237-260) as a
    distributed DATA product: per (source, month) boxplot statistics —
    quartiles, 1.5·IQR whiskers clamped to in-fence extremes, mean,
    flier count — computed in the hash-sharded exchange, fully
    SQL-oracle-checked."""
    from ..functions.stats import quantile_cont
    from ..stages.shard import sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts", "value"],
    )

    def stats_shard(g: pd.DataFrame) -> pd.DataFrame:
        months = g["ts"].dt.to_period("M").dt.to_timestamp()
        rows = []
        for (src, month), grp in g.groupby([g["event_type"], months],
                                           sort=False):
            v = grp["value"].to_numpy(dtype=np.float64)
            # quantile_cont for SQL bit-parity; round at 6 decimals,
            # where the ≤5-decimal exact quantile values cannot tie
            # (round-half-even vs SQL round-half-away differ ON ties —
            # found by the randomized differential test)
            q1, med, q3 = (round(float(x), 6)
                           for x in quantile_cont(v, [0.25, 0.5, 0.75]))
            iqr = q3 - q1
            lo_f, hi_f = q1 - 1.5 * iqr, q3 + 1.5 * iqr
            inside = v[(v >= lo_f) & (v <= hi_f)]
            rows.append({
                "source": src, "month": month,
                "q1": q1, "median": med, "q3": q3,
                "lo_whisker": round(float(inside.min()), 4),
                "hi_whisker": round(float(inside.max()), 4),
                # mean from the ROUNDED sum (bit-deterministic divide,
                # same trick as the rollup finalize)
                "mean_value": round(float(np.sum(v)), 4) / v.size,
                "n": int(v.size),
                "n_outliers": int(((v < lo_f) | (v > hi_f)).sum()),
            })
        return pd.DataFrame(rows, columns=["source", "month", "q1",
                                           "median", "q3", "lo_whisker",
                                           "hi_whisker", "mean_value",
                                           "n", "n_outliers"])

    return sharded_map_groups(ds, "event_type", stats_shard)


_MONTHWISE_BOX_ORACLE = """
WITH m AS (
  SELECT event_type AS source, date_trunc('month', ts) AS month,
         value AS v
  FROM events
), q AS (
  SELECT source, month,
         round(quantile_cont(v, 0.25), 6) AS q1,
         round(quantile_cont(v, 0.5), 6) AS med,
         round(quantile_cont(v, 0.75), 6) AS q3,
         round(sum(v), 4) / count(*) AS mv, count(*) AS n
  FROM m GROUP BY 1, 2
)
SELECT m.source, m.month,
       q.q1 AS q1, q.med AS median, q.q3 AS q3,
       round(min(m.v) FILTER (m.v >= q.q1 - 1.5 * (q.q3 - q.q1)), 4)
           AS lo_whisker,
       round(max(m.v) FILTER (m.v <= q.q3 + 1.5 * (q.q3 - q.q1)), 4)
           AS hi_whisker,
       q.mv AS mean_value, q.n AS n,
       count(*) FILTER (m.v < q.q1 - 1.5 * (q.q3 - q.q1)
                        OR m.v > q.q3 + 1.5 * (q.q3 - q.q1)) AS n_outliers
FROM m JOIN q USING (source, month)
GROUP BY m.source, m.month, q.q1, q.med, q.q3, q.mv, q.n
"""


def _tdigest_quantiles_full(sf_dir: str, eps: float = 0.02):
    """t-digest per-source quantile sketch WITH in-band verification
    (the full table behind ``approx_p95_by_source``): one pass emits
    per-(batch, source) mergeable sketches alongside the raw value
    partials; the source-keyed exchange merges the digests AND computes
    the exact bit-deterministic quantiles (``quantile_cont``, the
    DuckDB-parity kernel), then asserts the sketch estimate sits inside
    the exact rank window [q−eps, q+eps] — the rank-accuracy guarantee
    t-digest actually makes (value-space tolerances are meaningless on
    heavy tails)."""
    from ..functions.stats import quantile_cont
    from ..functions.tdigest import TDigest
    from ..stages.shard import sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value"],
    )

    def sketch_batch(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in batch.groupby("event_type", sort=False):
            vals = g["value"].to_numpy(dtype=np.float64)
            rows.append({
                "source": src,
                "sketch": TDigest().add_many(vals).to_bytes(),
                "values": vals,
            })
        return pd.DataFrame(rows)

    def merge_shard(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, grp in g.groupby("source", sort=False):
            td = TDigest.from_bytes(grp["sketch"].iloc[0])
            for blob in grp["sketch"].iloc[1:]:
                td.merge(TDigest.from_bytes(blob))
            v = np.concatenate([np.asarray(u) for u in grp["values"]])
            row = {"source": src}
            vs = np.sort(v)
            n1 = vs.size - 1
            for q, name in ((0.5, "p50"), (0.95, "p95")):
                approx = td.quantile(q)
                # rank band widened to the ENCLOSING order statistics:
                # at tiny n the pure +/-eps rank window is narrower
                # than one inter-point gap, failing even a perfect
                # sketch (t-digest's interpolation differs from
                # quantile_cont's) — found by the minimal-corpus
                # sweep; at scale the widening is < 1 rank, far
                # inside the sketch's error budget
                lo = vs[max(0, int(np.floor((q - eps) * n1)))]
                hi = vs[min(n1, int(np.ceil((q + eps) * n1)))]
                row[f"approx_{name}"] = approx
                row[f"exact_{name}"] = quantile_cont(v, q)
                row[f"{name}_in_rank_band"] = bool(
                    lo - 1e-9 <= approx <= hi + 1e-9)
            rows.append(row)
        return pd.DataFrame(rows, columns=[
            "source", "approx_p50", "exact_p50", "p50_in_rank_band",
            "approx_p95", "exact_p95", "p95_in_rank_band"])

    return sharded_map_groups(ds.map_batches(sketch_batch,
                                             batch_format="pandas"),
                              "source", merge_shard)


def approx_p95_by_source(sf_dir: str):
    """Per-source quantiles via mergeable t-digest sketches with a HARD
    tolerance-band oracle (the verdict-r3 HLL pattern): emits
    (source, exact_p50, exact_p95, p50_in_rank_band, p95_in_rank_band)
    where the exact quantiles are bit-deterministic against DuckDB's
    ``quantile_cont`` and the booleans pin the sketch estimate inside
    the exact [q−0.02, q+0.02] rank window.  The raw estimates stay
    exposed via ``_tdigest_quantiles_full`` (accuracy pytest + library
    surface); the sketch is the 10^12-row scale path, the exact twin
    rides the same exchange."""
    full = _tdigest_quantiles_full(sf_dir)

    def slim(b: pd.DataFrame) -> pd.DataFrame:
        return b[["source", "exact_p50", "p50_in_rank_band",
                  "exact_p95", "p95_in_rank_band"]]

    return full.map_batches(slim, batch_format="pandas")


_APPROX_P95_ORACLE = """
SELECT event_type AS source,
       quantile_cont(value, 0.5) AS exact_p50,
       TRUE AS p50_in_rank_band,
       quantile_cont(value, 0.95) AS exact_p95,
       TRUE AS p95_in_rank_band
FROM events GROUP BY 1
"""


def top_users_by_type(sf_dir: str, k: int = 3):
    """Grouped top-k: the k users with the largest summed value per
    event_type.  Partial (user, type) aggregation per batch, sharded
    final combine, then per-type top-k inside the shard — no global
    sort.  Deterministic tiebreak by user_id."""
    from ray.data.aggregate import Sum

    from ..stages.shard import sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id", "value"],
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"source": b["event_type"], "user_id": b["user_id"],
                      "v": b["value"]})
        return t.group_by(["source", "user_id"]).aggregate(
            [("v", "sum")]
        ).rename_columns(["source", "user_id", "p_v"])

    totals = ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["source", "user_id"]
    ).aggregate(Sum("p_v", alias_name="total_value"))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "total_value", "user_id"],
                          ascending=[True, False, True], kind="stable")
        out = g.groupby("source", sort=False).head(k).copy()
        out["total_value"] = out["total_value"].round(4)
        return out[["source", "user_id", "total_value"]]

    # one shard holds every (source, user) total of its sources: the
    # totals table is one row per pair, so the per-type top-k is exact
    return sharded_map_groups(totals, "source", topk)


_TOP_USERS_ORACLE = """
WITH totals AS (
  SELECT event_type AS source, user_id, sum(value) AS tv
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY source ORDER BY tv DESC, user_id ASC) AS rn
  FROM totals
)
SELECT source, user_id, round(tv, 4) AS total_value
FROM ranked WHERE rn <= 3
"""


def approx_top_users_by_type(sf_dir: str, k: int = 3,
                             cap: int = 256,
                             _zero_err_for_test: bool = False):
    """Heavy-hitter sketch top-k with the sketch GUARANTEE asserted
    in-band (the ``approx_users_by_type`` pattern, verdict r4 item 1):
    ONE query runs BOTH the Space-Saving sketch path (per-batch
    partials per event_type, merged per type — the mergeable-sketch
    scale path that avoids the user-keyed exchange) AND the exact
    (source, user) totals, and emits per exact-top-k row two booleans
    the DuckDB oracle pins TRUE — ``sketch_topk_consistent`` (the
    sketch top-k contains this user WHENEVER the sketch's own
    Metwally separation condition est−err ≥ est_{k+1} certifies its
    top-k — the scale-safe implication form; an absolute containment
    pin fails legitimately once error mass swallows the top-k gap)
    and ``within_error_bound`` (exact ≤ approx ≤ exact + err for
    tracked entries, the Space-Saving bound).  total_value /
    rank are value-pinned bit-for-bit by the SQL top-k, so a sketch
    regression (wrong merge, eviction bug, broken bound) turns a
    driver-green row into a hard FAIL instead of a rows-only pass.
    Scale shape: sketch partials are O(cap·sources·batches); the exact
    side is the already-★ ``top_users_by_type`` partial+exchange; the
    driver folds only O(cap·sources) sketch rows."""
    import json as _json

    from ray.data.aggregate import Sum

    from ..functions.heavyhitters import SpaceSaving
    from ..stages.shard import sharded_map_groups


    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id", "value"],
    )

    def sketch_batch(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in batch.groupby("event_type", sort=False):
            ss = SpaceSaving(cap).add_many(
                g["user_id"].to_numpy(), g["value"].to_numpy()
            )
            rows.append({
                "source": src,
                "sketch": _json.dumps(
                    [(int(i), c, e) for i, c, e in ss.to_items()]
                ),
            })
        return pd.DataFrame(rows)

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        ss = SpaceSaving.from_items(cap, _json.loads(g["sketch"].iloc[0]))
        for blob in g["sketch"].iloc[1:]:
            ss.merge(SpaceSaving.from_items(cap, _json.loads(blob)))
        items = ss.to_items()
        return pd.DataFrame({
            "source": [g["source"].iloc[0]] * len(items),
            "user_id": [int(i) for i, _, _ in items],
            "approx_total": [float(c) for _, c, _ in items],
            "err_bound": [float(e) for _, _, e in items],
        })

    # bounded: O(cap × sources) sketch rows
    sk = ds.map_batches(sketch_batch, batch_format="pandas").groupby(
        "source").map_groups(merge_group, batch_format="pandas").to_pandas()
    if _zero_err_for_test:
        # negative-test knob (tests/test_inband_guards.py): broken
        # error accounting makes the separation condition spuriously
        # certify a small sketch's top-k, so sketch_topk_consistent
        # must flip False — the bug class the implication pin catches
        sk = sk.assign(err_bound=0.0)

    # exact path — the top_users_by_type partial + (source,user) exchange
    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"source": b["event_type"], "user_id": b["user_id"],
                      "v": b["value"]})
        return t.group_by(["source", "user_id"]).aggregate(
            [("v", "sum")]).rename_columns(["source", "user_id", "p_v"])

    totals = ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["source", "user_id"]).aggregate(Sum("p_v", alias_name="tv"))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "tv", "user_id"],
                          ascending=[True, False, True], kind="stable")
        out = g.groupby("source", sort=False).head(k).copy()
        out["rank"] = out.groupby("source", sort=False).cumcount() + 1
        return out[["source", "user_id", "tv", "rank"]]

    exact = sharded_map_groups(totals, "source", topk).to_pandas()

    sk_items = {s: gg for s, gg in sk.groupby("source")}
    out_rows = []
    for _, row in exact.iterrows():
        s, uid = row["source"], int(row["user_id"])
        tv = float(row["tv"])
        g = sk_items.get(s)
        consistent = False
        within = True  # the error bound is a claim about TRACKED entries
        if g is not None:
            gs = g.sort_values(["approx_total", "user_id"],
                               ascending=[False, True], kind="stable")
            ests = gs["approx_total"].to_numpy(np.float64)
            errs = gs["err_bound"].to_numpy(np.float64)
            top_ids = set(gs["user_id"].head(k).astype(np.int64))
            in_topk = uid in top_ids
            # Metwally separation: the sketch GUARANTEES its top-k is
            # the true top-k only when every top-k lower bound
            # (est - err) clears the (k+1)-th estimate.  Containment
            # is pinned under that condition; an unseparated sketch
            # (error mass swallowed the gap) may legitimately miss a
            # borderline member at ANY fixed cap, so the absolute pin
            # was scale-unsafe (failed at sf0.1).
            # certification floor: an untracked item's true total is
            # bounded by the (k+1)-th estimate AND — when the sketch
            # is at capacity, i.e. items were ever evicted — by the
            # eviction floor min(est).  A sketch with cap <= k can
            # never certify (floor = its own min est), which keeps
            # the implication honestly vacuous for tiny caps.
            nxt = float(ests[k]) if len(ests) > k else 0.0
            floor = nxt
            if len(ests) >= cap:
                floor = max(floor, float(ests.min()))
            separated = bool(
                (ests[:k] - errs[:k] >= floor - 1e-9).all())
            consistent = in_topk or not separated
            hit = g[g["user_id"] == uid]
            if len(hit):
                ap = float(hit["approx_total"].iloc[0])
                eb = float(hit["err_bound"].iloc[0])
                # guarantee: approx is an upper bound, off by <= err
                within = (ap + 1e-9 >= tv) and (ap - eb <= tv + 1e-9)
        out_rows.append({
            "source": s, "user_id": uid, "rank": int(row["rank"]),
            "total_value": round(tv, 4),
            "sketch_topk_consistent": bool(consistent),
            "within_error_bound": bool(within)})
    return pd.DataFrame(out_rows, columns=[
        "source", "user_id", "rank", "total_value",
        "sketch_topk_consistent", "within_error_bound"])


_APPROX_TOP_USERS_ORACLE = """
WITH totals AS (
  SELECT event_type AS source, user_id, sum(value) AS tv
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY source ORDER BY tv DESC, user_id ASC) AS rn
  FROM totals
)
SELECT source, user_id, CAST(rn AS BIGINT) AS rank,
       round(tv, 4) AS total_value,
       TRUE AS sketch_topk_consistent, TRUE AS within_error_bound
FROM ranked WHERE rn <= 3
"""


def chunks_downsample_1h(sf_dir: str):
    """Downsample-on-read from compressed storage: the 1m events rollup
    is Gorilla-encoded into chunk blobs, then DECODED in a distributed
    pass and re-aggregated to the 1h tier — the read path of a
    compressed retention tier, oracle-checked end to end (encode →
    decode → cascade must reproduce DuckDB's hourly sums exactly)."""
    from ..functions.gorilla import decode_chunk
    from ..stages.compress import compress

    roll = _events_rollup(sf_dir, "1m")
    chunks = compress(roll, "event_type", 60, TIERS["1m"].chunk_buckets)

    def decode(batch: pd.DataFrame) -> pd.DataFrame:
        keys, hours, vals = [], [], []
        for key, blob in zip(batch["key"], batch["chunk"]):
            ts, v = decode_chunk(blob)
            keys.append(np.repeat(key, ts.size))
            hours.append(ts - (ts % 3600))
            vals.append(v)
        if not keys:
            return pd.DataFrame({"source": [], "hour_s": [], "v": []})
        return pd.DataFrame(
            {
                "source": np.concatenate(keys),
                "hour_s": np.concatenate(hours),
                "v": np.concatenate(vals),
            }
        )

    decoded = chunks.map_batches(decode, batch_format="pandas", batch_size=64)

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"source": b["source"], "hour_s": b["hour_s"],
                      "v": b["v"]})
        g = t.group_by(["source", "hour_s"]).aggregate(
            [("v", "sum"), ("v", "count")]
        )
        return g.rename_columns(["source", "hour_s", "p_sum", "p_n"])

    from ray.data.aggregate import Sum

    agg = decoded.map_batches(partial, batch_format="pyarrow").groupby(
        ["source", "hour_s"]
    ).aggregate(Sum("p_sum", alias_name="sum_value"),
                Sum("p_n", alias_name="n_minutes"))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "bucket_start": pc.multiply(
                    b["hour_s"], pa.scalar(1, pa.int64())
                ).cast(pa.timestamp("s")),
                "sum_value": pa.array(_round_exact(
                    b["sum_value"].to_numpy(zero_copy_only=False))),
                "n_minutes": b["n_minutes"],
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


_CHUNKS_DOWNSAMPLE_ORACLE = """
WITH m AS (
  SELECT event_type AS source, date_trunc('minute', ts) AS mb,
         sum(value) AS v
  FROM events GROUP BY 1, 2
)
SELECT source, date_trunc('hour', mb) AS bucket_start,
       round(sum(v), 4) AS sum_value, count(*) AS n_minutes
FROM m GROUP BY 1, 2
"""


def media_features(sf_dir: str):
    """Multimodal pipeline: synth REAL media payloads (valid PNG/WAV) →
    actor-pool stdlib decode (stages/multimodal.py) → per-mime
    aggregation of the decoded features (audio duration from the WAV
    headers+frames, pixel statistics from the inflated PNG scanlines)."""
    from ..stages.multimodal import decode_features, synth_media_table

    media = _rd().from_arrow(synth_media_table(512, seed=42))
    feats = decode_features(media)

    def summarize(batch: pd.DataFrame) -> pd.DataFrame:
        f = np.stack(batch["features"].to_numpy())
        batch = batch.assign(
            # feature layout (multimodal.MediaDecoder): PNG f[3]=pixel
            # mean; WAV f[3]=duration seconds
            primary=f[:, 3],
        )
        g = batch.groupby("mime", as_index=False).agg(
            p_bytes=("n_bytes", "sum"),
            p_n=("n_bytes", "count"),
            p_primary=("primary", "sum"),
        )
        return g

    from ray.data.aggregate import Sum

    agg = feats.map_batches(summarize, batch_format="pandas").groupby(
        "mime"
    ).aggregate(Sum("p_bytes", alias_name="total_bytes"),
                Sum("p_n", alias_name="n_media"),
                Sum("p_primary", alias_name="sum_primary"))

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        # audio/wav -> mean clip duration (s); image/png -> mean pixel level
        b["avg_primary_feature"] = (b["sum_primary"] / b["n_media"]).round(4)
        return b.drop(columns=["sum_primary"])

    return agg.map_batches(fin, batch_format="pandas")


_HASH_SAMPLE_ORACLE = f"""
WITH s1 AS (
  SELECT doc_id, lang, source,
         (CAST(doc_id AS HUGEINT) + 11400714819323198485)
           % 18446744073709551616 AS z
  FROM documents
), s2 AS (
  SELECT doc_id, lang, source,
         {_sql_mulmod64("xor(z, z // 1073741824)", 0xBF58476D1CE4E5B9)} AS z
  FROM s1
), s3 AS (
  SELECT doc_id, lang, source,
         {_sql_mulmod64("xor(z, z // 134217728)", 0x94D049BB133111EB)} AS z
  FROM s2
), h AS (
  SELECT doc_id, lang, source, xor(z, z // 2147483648) AS h FROM s3
)
SELECT doc_id, lang, source, CAST(h AS BIGINT) AS h64
FROM h WHERE h < 2305843009213693952
"""


_DOC_CAP_ORACLE = """
SELECT source, doc_id, lang, n_chars, rk FROM (
  SELECT source, doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
  FROM documents
) WHERE rk <= 20
"""


_VOCAB_STATS_ORACLE = r"""
WITH words AS (
  SELECT source,
         unnest(list_transform(regexp_extract_all(text, '[\w'']+'),
                               w -> lower(w))) AS w
  FROM documents
), agg AS (
  SELECT source, count(*) AS n_tokens, count(DISTINCT w) AS n_distinct
  FROM words GROUP BY source
), d AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
)
SELECT d.source, d.n_docs,
       coalesce(agg.n_tokens, 0) AS n_tokens,
       coalesce(agg.n_distinct, 0) AS n_distinct_words,
       CASE WHEN coalesce(agg.n_tokens, 0) > 0
            THEN CAST(agg.n_distinct AS DOUBLE) / agg.n_tokens
            ELSE 0.0 END AS ttr
FROM d LEFT JOIN agg USING (source)
"""


_VOCAB_JACCARD_ORACLE = r"""
WITH words AS (
  SELECT DISTINCT source,
         unnest(list_transform(regexp_extract_all(text, '[\w'']+'),
                               w -> lower(w))) AS w
  FROM documents
), cnt AS (
  SELECT source, count(*) AS n FROM words GROUP BY source
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS inter
  FROM words a JOIN words b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, inter AS shared_words,
       ca.n AS vocab_a, cb.n AS vocab_b,
       CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) AS jaccard
FROM pairs
JOIN cnt ca ON source_a = ca.source
JOIN cnt cb ON source_b = cb.source
"""


def sax_daily_words(sf_dir: str):
    """SAX symbolization (Lin et al. 2003) of the hourly tier: each
    source's hourly sums z-normalize against the source's own
    mean/stddev and discretize into a 4-letter alphabet at the Gaussian
    breakpoints ±0.6745/0, then concatenate into one motif WORD per
    (source, day) — the standard symbolic index for motif/novelty
    mining over fleets of series.  Cross-engine determinism: sums work
    in integer 1e-4 units, so the z<0 comparison is INTEGER-exact
    (D = v4·n − S), and the ±0.6745·σ comparisons put float drift
    (~1e-16) against an irrational boundary — the same argument as the
    zscore family.  Shape: per-batch integer moment partials → tiny
    source fold → broadcast to a map stage → one (source, day)-keyed
    exchange builds the words."""
    import ray

    from ..stages.shard import sharded_aggregate, sharded_map_groups

    roll = _events_rollup(sf_dir, "1h").select_columns(
        ["event_type", "bucket_start", "sum_value"])

    def v4_of(batch: pd.DataFrame) -> np.ndarray:
        v = _round_exact(batch["sum_value"].to_numpy(dtype=np.float64))
        return np.rint(v * 1e4).astype(np.int64)

    def moment_partials(batch: pd.DataFrame) -> pd.DataFrame:
        v4 = v4_of(batch)
        g = pd.DataFrame({"source": batch["event_type"], "v4": v4,
                          "q": v4.astype(np.float64) ** 2})
        out = g.groupby("source", as_index=False).agg(
            n=("v4", "size"), S=("v4", "sum"), Qf=("q", "sum"))
        return out

    moments = sharded_aggregate(
        roll.map_batches(moment_partials, batch_format="pandas"),
        ["source"], {"n": "sum", "S": "sum", "Qf": "sum"}, num_shards=4,
    ).to_pandas().set_index("source")  # one row per source — driver-sized
    mom_ref = ray.put(moments)

    def symbolize(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(mom_ref)
        src = batch["event_type"]
        n = src.map(m["n"]).to_numpy(dtype=np.int64)
        S = src.map(m["S"]).to_numpy(dtype=np.int64)
        Qf = src.map(m["Qf"]).to_numpy(dtype=np.float64)
        v4 = v4_of(batch)
        D = (v4 * n - S).astype(np.float64)  # exact ints < 2^53
        sigma2 = n.astype(np.float64) * Qf - S.astype(np.float64) * \
            S.astype(np.float64)
        T = 0.6745 * np.sqrt(np.maximum(sigma2, 0.0))
        sym = np.full(len(v4), "d", dtype=object)
        sym[D < T] = "c"
        sym[D < 0] = "b"
        sym[D < -T] = "a"
        sym[sigma2 <= 0] = "c"
        return pd.DataFrame({
            "source": src.to_numpy(),
            "bucket_start": batch["bucket_start"],
            "day": batch["bucket_start"].dt.floor("D"),
            "sym": sym,
        })

    syms = roll.map_batches(symbolize, batch_format="pandas")

    def words(shard: pd.DataFrame) -> pd.DataFrame:
        s = shard.sort_values(["source", "day", "bucket_start"],
                              kind="stable")
        g = s.groupby(["source", "day"], sort=False)
        out = g.agg(n_obs=("sym", "size"),
                    word=("sym", "".join)).reset_index()
        return out

    return sharded_map_groups(syms, ["source", "day"], words)


_SAX_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS v4
  FROM events GROUP BY 1, 2
), m AS (
  SELECT source, count(*) AS n, sum(v4) AS S,
         sum(CAST(v4 AS DOUBLE) * v4) AS Qf
  FROM r GROUP BY source
), sy AS (
  SELECT r.source, r.bucket_start,
         CASE
           WHEN CAST(m.n AS DOUBLE) * m.Qf
                - CAST(m.S AS DOUBLE) * CAST(m.S AS DOUBLE) <= 0 THEN 'c'
           WHEN r.v4 * m.n - m.S
                < -(0.6745 * sqrt(CAST(m.n AS DOUBLE) * m.Qf
                    - CAST(m.S AS DOUBLE) * CAST(m.S AS DOUBLE))) THEN 'a'
           WHEN r.v4 * m.n - m.S < 0 THEN 'b'
           WHEN r.v4 * m.n - m.S
                < 0.6745 * sqrt(CAST(m.n AS DOUBLE) * m.Qf
                    - CAST(m.S AS DOUBLE) * CAST(m.S AS DOUBLE)) THEN 'c'
           ELSE 'd'
         END AS sym
  FROM r JOIN m USING (source)
)
SELECT source, date_trunc('day', bucket_start) AS day,
       count(*) AS n_obs,
       string_agg(sym, '' ORDER BY bucket_start) AS word
FROM sy GROUP BY 1, 2
"""


_NGRAM_CONTAINMENT_ORACLE = r"""
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
       co.c * 1.0 / least(sa.n, sb.n) AS containment
FROM co JOIN sizes sa ON co.doc_a = sa.doc_id
        JOIN sizes sb ON co.doc_b = sb.doc_id
WHERE co.c * 1.0 / least(sa.n, sb.n) >= 0.9
"""


def _mixture_threshold_sql() -> str:
    cases = " ".join(
        f"WHEN '{k}' THEN {(2**64 * a) // b}"
        for k, (a, b) in _MIXTURE_RATES.items())
    dflt = (2**64 * _MIXTURE_DEFAULT[0]) // _MIXTURE_DEFAULT[1]
    return f"CASE lang {cases} ELSE {dflt} END"


_MIXTURE_SAMPLE_ORACLE = f"""
WITH s1 AS (
  SELECT doc_id, lang, source,
         (CAST(doc_id AS HUGEINT) + 11400714819323198485)
           % 18446744073709551616 AS z
  FROM documents
), s2 AS (
  SELECT doc_id, lang, source,
         {_sql_mulmod64("xor(z, z // 1073741824)", 0xBF58476D1CE4E5B9)} AS z
  FROM s1
), s3 AS (
  SELECT doc_id, lang, source,
         {_sql_mulmod64("xor(z, z // 134217728)", 0x94D049BB133111EB)} AS z
  FROM s2
)
SELECT doc_id, lang, source
FROM s3 WHERE xor(z, z // 2147483648) < {_mixture_threshold_sql()}
"""


_BIGRAM_PMI_ORACLE = r"""
WITH words AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(text, '[\w'']+'),
                        w -> lower(w)) AS ws
  FROM documents
), uni AS (
  SELECT ws[i] AS w, count(*) AS c
  FROM words, UNNEST(generate_series(1, len(ws))) AS t(i)
  GROUP BY 1
), tot AS (
  SELECT sum(c) AS n FROM uni
), bi AS (
  SELECT ws[i] AS w1, ws[i+1] AS w2, count(*) AS co
  FROM words, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
  GROUP BY 1, 2
)
SELECT bi.w1, bi.w2, bi.co, u1.c AS c1, u2.c AS c2,
       CAST(bi.co * tot.n AS DOUBLE) / (u1.c * u2.c) AS pmi_ratio
FROM bi, tot
JOIN uni u1 ON bi.w1 = u1.w
JOIN uni u2 ON bi.w2 = u2.w
WHERE bi.co >= 5
"""


# --------------------------------------------- trend / changepoint / runs


def _hourly_int_units(shard: pd.DataFrame):
    """Per-source iterator over the hourly tier in EXACT integer units:
    yields (source, bucket_starts, x_hours int64, y4 int64) with y4 =
    round(round(sum,4)·10⁴) — the same int-unit trick as
    ``kpss_level_stat`` so engine and SQL window arithmetic are both
    exact-integer and therefore bit-identical."""
    shard = shard.sort_values(["event_type", "bucket_start"], kind="stable")
    for src, g in shard.groupby("event_type", sort=False):
        v = _round_exact(g["sum_value"].to_numpy(dtype=np.float64))
        y4 = np.rint(v * 10000.0).astype(np.int64)
        xs = (g["bucket_start"].to_numpy().astype("datetime64[s]")
              .astype(np.int64) // 3600)
        yield src, g["bucket_start"], xs, y4


def ols_trend_by_source(sf_dir: str):
    """Per-source OLS trend slope of the hourly sums vs time — the
    drift detector behind capacity planning (does this source's volume
    trend up?).  Exactness: with x = epoch-hours (int) and y = 10⁻⁴
    units (int), slope = (nΣxy − ΣxΣy)/(nΣxx − ΣxΣx) has EXACT integer
    numerator and denominator; the engine computes them in arbitrary-
    precision Python ints over per-source shifted x (the identity
    n·Σ(x+c)y − Σ(x+c)Σy = nΣxy − ΣxΣy holds exactly in ℤ, so shifting
    never changes the integers) while the oracle uses HUGEINT on
    absolute hours; both emit the identical double divide.  One
    source-keyed exchange over the hourly tier; per-source series are
    bounded (buckets), never the raw corpus."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, _bs, xs, y4 in _hourly_int_units(shard):
            x = (xs - xs.min()).tolist()
            y = y4.tolist()
            n = len(y)
            sx, sy = sum(x), sum(y)
            sxy = sum(a * b for a, b in zip(x, y))
            sxx = sum(a * a for a in x)
            num, den = n * sxy - sx * sy, n * sxx - sx * sx
            rows.append({
                "source": src, "n_buckets": n,
                "slope_per_hour": (float(num) / float(den)) / 10000.0
                if den > 0 else np.nan,
            })
        return pd.DataFrame(rows, columns=[
            "source", "n_buckets", "slope_per_hour"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_OLS_TREND_ORACLE = """
WITH r AS (
  SELECT event_type AS source,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS x,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), s AS (
  SELECT source, count(*) AS n,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx
  FROM r GROUP BY source
)
SELECT source, n AS n_buckets,
       CASE WHEN n * sxx - sx * sx > 0 THEN
         CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
           / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) / 10000.0
       ELSE NULL END AS slope_per_hour
FROM s
"""


def cusum_changepoint(sf_dir: str):
    """CUSUM level-shift changepoint per source: the bucket where the
    cumulative deviation from the series mean peaks (argmax of
    |Σ_{j≤i} v_j − (i/n)·Σv|), plus the peak statistic — the classic
    offline changepoint locator.  Scale-free int trick: multiplying
    through by n makes every statistic n·P_i − i·T an EXACT integer
    (Python bigint in the engine, HUGEINT window sums in the oracle);
    ties on the max take the earliest bucket on both sides.  One
    source-keyed exchange; series stay bounded per source."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, bs, _xs, y4 in _hourly_int_units(shard):
            n = int(y4.size)
            abs_sum = int(np.abs(y4).sum())
            total = int(y4.sum())
            if n * abs_sum < 2 ** 62:  # n·P_i and i·T bounded by n·Σ|y|
                P = np.cumsum(y4)
                stat_v = np.abs(
                    n * P - np.arange(1, n + 1, dtype=np.int64) * total)
                best_i = int(np.argmax(stat_v))  # first max = earliest tie
                best = int(stat_v[best_i])
            else:  # exact Python-int fallback (KPSS pattern)
                best, best_i, acc = -1, 0, 0
                for i, v in enumerate(y4.tolist(), start=1):
                    acc += v
                    stat = abs(n * acc - i * total)
                    if stat > best:
                        best, best_i = stat, i - 1
            rows.append({
                "source": src, "n_buckets": n,
                "changepoint_bucket": bs.iloc[best_i],
                "cusum_stat": float(best) / float(n) / 10000.0,
            })
        return pd.DataFrame(rows, columns=[
            "source", "n_buckets", "changepoint_bucket", "cusum_stat"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_CUSUM_CHANGEPOINT_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), t AS (
  SELECT source, count(*) AS n, sum(CAST(y AS HUGEINT)) AS total
  FROM r GROUP BY source
), c AS (
  SELECT r.source, r.bucket_start, t.n,
         abs(t.n * sum(CAST(r.y AS HUGEINT)) OVER (
               PARTITION BY r.source ORDER BY r.bucket_start
               ROWS UNBOUNDED PRECEDING)
             - row_number() OVER (
               PARTITION BY r.source ORDER BY r.bucket_start) * t.total
         ) AS stat
  FROM r JOIN t USING (source)
)
SELECT source, n AS n_buckets, bucket_start AS changepoint_bucket,
       CAST(CAST(stat AS VARCHAR) AS DOUBLE)
         / CAST(n AS DOUBLE) / 10000.0 AS cusum_stat
FROM c
QUALIFY row_number() OVER (
  PARTITION BY source ORDER BY stat DESC, bucket_start ASC) = 1
"""


_RUN_LENGTHS_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         sum(value) AS v
  FROM events GROUP BY 1, 2
), q AS (
  SELECT source, quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3
  FROM r GROUP BY source
), f AS (
  SELECT r.source, r.bucket_start,
         CAST(epoch(r.bucket_start) AS BIGINT) // 3600 AS h
  FROM r JOIN q USING (source)
  WHERE r.v < q.q1 - 1.5 * (q.q3 - q.q1) OR r.v > q.q3 + 1.5 * (q.q3 - q.q1)
), g AS (
  SELECT source, bucket_start, h,
         h - row_number() OVER (PARTITION BY source ORDER BY h) AS grp
  FROM f
), runs AS (
  SELECT source, count(*) AS run_hours, min(bucket_start) AS run_start
  FROM g GROUP BY source, grp
)
SELECT source, run_hours, run_start FROM runs
QUALIFY row_number() OVER (
  PARTITION BY source ORDER BY run_hours DESC, run_start ASC) = 1
"""


def minute_spike_census(sf_dir: str):
    """Spike census at the FINEST retention tier: per source, how many
    1-minute buckets exceed 5× the source's median minute volume, plus
    the largest spike ratio — the ingestion-burst profile that sizes
    the 1m tier's skew handling.  The spike test is the PURE-INTEGER
    compare 2·v > 5·(m_lo + m_hi) over the two middle order statistics
    (no interpolated median, no float threshold); only the reported
    max ratio is one divide.  One source-keyed exchange over the 1m
    tier."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1m")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["event_type", "bucket_start"],
                                  kind="stable")
        rows = []
        for src, g in shard.groupby("event_type", sort=False):
            v = _round_exact(g["sum_value"].to_numpy(dtype=np.float64))
            y4 = np.rint(v * 10000.0).astype(np.int64)
            n = int(y4.size)
            srt = np.sort(y4)
            m2 = int(srt[(n - 1) // 2]) + int(srt[n // 2])
            spikes = 2 * y4 > 5 * m2
            ratio = (float(2 * int(y4.max())) / float(m2)
                     if m2 > 0 else np.nan)
            rows.append({
                "source": src, "n_minutes": n,
                "n_spikes": int(spikes.sum()),
                "max_over_median": ratio})
        return pd.DataFrame(rows, columns=[
            "source", "n_minutes", "n_spikes", "max_over_median"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_MINUTE_SPIKE_ORACLE = """
WITH r AS (
  SELECT event_type AS source,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY event_type, date_trunc('minute', ts)
), m AS (
  SELECT source, list_sort(list(y)) AS arr, count(*) AS n,
         max(y) AS mx
  FROM r GROUP BY 1
), mm AS (
  SELECT source, n, mx,
         arr[CAST((n - 1) // 2 AS BIGINT) + 1]
           + arr[CAST(n // 2 AS BIGINT) + 1] AS m2
  FROM m
)
SELECT mm.source, mm.n AS n_minutes,
       (SELECT count(*) FROM r
        WHERE r.source = mm.source AND 2 * r.y > 5 * mm.m2) AS n_spikes,
       CASE WHEN mm.m2 > 0 THEN
         CAST(2 * mm.mx AS DOUBLE) / CAST(mm.m2 AS DOUBLE)
       ELSE NULL END AS max_over_median
FROM mm
"""


_VOCAB_GINI_ORACLE = r"""
WITH words AS (
  SELECT source,
         unnest(list_transform(regexp_extract_all(text, '[\w'']+'),
                               w -> lower(w))) AS w
  FROM documents
), c AS (
  SELECT source, w, count(*) AS c FROM words GROUP BY 1, 2
), r AS (
  SELECT source, c,
         row_number() OVER (PARTITION BY source ORDER BY c) AS rn,
         count(*) OVER (PARTITION BY source) AS n,
         sum(c) OVER (PARTITION BY source) AS tot
  FROM c
)
SELECT source, n AS n_distinct_words, CAST(tot AS BIGINT) AS n_tokens,
       CAST(CAST(sum((2 * rn - n - 1) * c) AS BIGINT) AS DOUBLE)
         / CAST(CAST(n * tot AS BIGINT) AS DOUBLE) AS vocab_gini
FROM r GROUP BY source, n, tot
"""


_DEBOUNCED_FLAGS_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         sum(value) AS v
  FROM events GROUP BY 1, 2
), q AS (
  SELECT source, quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3
  FROM r GROUP BY source
), f AS (
  SELECT r.source, r.bucket_start, round(r.v, 4) AS value,
         CAST(epoch(r.bucket_start) AS BIGINT) // 3600 AS h
  FROM r JOIN q USING (source)
  WHERE r.v < q.q1 - 1.5 * (q.q3 - q.q1) OR r.v > q.q3 + 1.5 * (q.q3 - q.q1)
)
SELECT source, bucket_start, value FROM (
  SELECT source, bucket_start, value,
         lag(h) OVER w = h - 1 AS adj_prev,
         lead(h) OVER w = h + 1 AS adj_next
  FROM f WINDOW w AS (PARTITION BY source ORDER BY h)
) WHERE COALESCE(adj_prev, FALSE) OR COALESCE(adj_next, FALSE)
"""


def pettitt_changepoint(sf_dir: str):
    """Pettitt rank-based changepoint per source: the bucket where the
    Mann-Whitney-style statistic U_t = Σ_{i≤t}Σ_{j>t} sgn(v_i − v_j)
    peaks in absolute value — the non-parametric complement to
    cusum_changepoint (level shifts that a mean-based CUSUM misses
    under heavy tails).  ENTIRELY integer: with y in 10⁻⁴ units,
    U_t = Σ_{s≤t} D_s where D_s = #{j: y_j < y_s} − #{j: y_j > y_s}
    (two vectorized searchsorted passes), so the argmax — earliest
    bucket on ties — and the peak |U| are bit-deterministic; no divide
    at all.  One source-keyed exchange; per-source series bounded by
    the bucket count, never the corpus."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, bs, _xs, y4 in _hourly_int_units(shard):
            n = int(y4.size)
            srt = np.sort(y4)
            lt = np.searchsorted(srt, y4, side="left").astype(np.int64)
            gt = n - np.searchsorted(srt, y4, side="right").astype(np.int64)
            u = np.cumsum(lt - gt)          # |U| ≤ n²/4 ≪ 2⁶³
            stat = np.abs(u)
            best = int(np.argmax(stat))     # first max = earliest tie
            rows.append({
                "source": src, "n_buckets": n,
                "changepoint_bucket": bs.iloc[best],
                "u_stat": int(stat[best]),
            })
        return pd.DataFrame(rows, columns=[
            "source", "n_buckets", "changepoint_bucket", "u_stat"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_PETTITT_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), nn AS (
  SELECT source, count(*) AS n FROM r GROUP BY 1
), cnt AS (
  SELECT source, y, count(*) AS c FROM r GROUP BY 1, 2
), cum AS (
  SELECT source, y, c,
         COALESCE(sum(c) OVER (PARTITION BY source ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lt
  FROM cnt
), d AS (
  SELECT r.source, r.bucket_start,
         CAST(cum.lt - (nn.n - cum.lt - cum.c) AS BIGINT) AS dd
  FROM r JOIN cum ON r.source = cum.source AND r.y = cum.y
       JOIN nn ON r.source = nn.source
), u AS (
  SELECT source, bucket_start,
         sum(dd) OVER (PARTITION BY source ORDER BY bucket_start
                       ROWS UNBOUNDED PRECEDING) AS uu
  FROM d
)
SELECT u.source, nn.n AS n_buckets, u.bucket_start AS changepoint_bucket,
       CAST(abs(uu) AS BIGINT) AS u_stat
FROM u JOIN nn ON u.source = nn.source
QUALIFY row_number() OVER (
  PARTITION BY u.source ORDER BY abs(uu) DESC, u.bucket_start ASC) = 1
"""


def spearman_trend(sf_dir: str):
    """Spearman rank correlation of the hourly sums against time per
    source — the monotonic-trend strength that complements the OLS
    slope (magnitude-free) and Mann-Kendall (normalized to [−1, 1]).
    Exactness: time ranks are 1..n (buckets are distinct) and value
    ranks use average-rank ties DOUBLED so both rank vectors are
    integers (avg-rank×2 = 2·minrank + tiecount − 1); the Pearson
    moments over those integer ranks fold in Python bigints (HUGEINT
    in the oracle), and ρ is the ONE shared IEEE expression
    num / (√dx · √dy) over correctly-rounded casts (VARCHAR-bridged in
    SQL past 2⁵³).  One source-keyed exchange, bounded series."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        import math
        rows = []
        for src, _bs, _xs, y4 in _hourly_int_units(shard):
            n = int(y4.size)
            srt = np.sort(y4)
            lt = np.searchsorted(srt, y4, side="left").astype(np.int64)
            c = (np.searchsorted(srt, y4, side="right").astype(np.int64)
                 - lt)
            ry = (2 * lt + c + 1).tolist()       # avg-rank ×2, exact int
            rx = [2 * (i + 1) for i in range(n)]  # time rank ×2
            sx, sy = sum(rx), sum(ry)
            sxy = sum(a * b for a, b in zip(rx, ry))
            sxx = sum(a * a for a in rx)
            syy = sum(b * b for b in ry)
            num = n * sxy - sx * sy
            dx, dy = n * sxx - sx * sx, n * syy - sy * sy
            rho = (float(num) / (math.sqrt(float(dx)) * math.sqrt(float(dy)))
                   if dx > 0 and dy > 0 else np.nan)
            rows.append({"source": src, "n_buckets": n,
                         "spearman_rho": rho})
        return pd.DataFrame(rows, columns=[
            "source", "n_buckets", "spearman_rho"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_SPEARMAN_TREND_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), rk AS (
  SELECT source,
         2 * row_number() OVER (
             PARTITION BY source ORDER BY bucket_start) AS rx,
         2 * rank() OVER (PARTITION BY source ORDER BY y)
           + count(*) OVER (PARTITION BY source, y) - 1 AS ry
  FROM r
), s AS (
  SELECT source, count(*) AS n,
         sum(CAST(rx AS HUGEINT)) AS sx, sum(CAST(ry AS HUGEINT)) AS sy,
         sum(CAST(rx AS HUGEINT) * ry) AS sxy,
         sum(CAST(rx AS HUGEINT) * rx) AS sxx,
         sum(CAST(ry AS HUGEINT) * ry) AS syy
  FROM rk GROUP BY 1
)
SELECT source, n AS n_buckets,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
         CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
         / (sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE))
            * sqrt(CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)))
       ELSE NULL END AS spearman_rho
FROM s
"""


def runs_test_by_source(sf_dir: str):
    """Wald-Wolfowitz runs census per source: counts of hourly buckets
    above / below the source median and the number of sign RUNS in
    bucket order — few long runs = trending/regime-switching, many
    short runs = oscillating.  Median-free exactness: the sign of each
    point is decided by the PURE-INTEGER compare 2·y vs (m_lo + m_hi),
    the two middle order statistics of the 10⁻⁴-unit values (no
    quantile interpolation anywhere); exact-median points drop, and a
    source whose every point equals the median emits no row (both
    engines).  All outputs are integers.  One source-keyed exchange."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, _bs, _xs, y4 in _hourly_int_units(shard):
            n = int(y4.size)
            srt = np.sort(y4)
            m2 = int(srt[(n - 1) // 2]) + int(srt[n // 2])
            sg = np.sign(2 * y4 - m2)
            nz = sg[sg != 0]
            if nz.size == 0:
                continue
            rows.append({
                "source": src,
                "n_pos": int((nz > 0).sum()),
                "n_neg": int((nz < 0).sum()),
                "n_runs": 1 + int((np.diff(nz) != 0).sum()),
            })
        return pd.DataFrame(rows, columns=[
            "source", "n_pos", "n_neg", "n_runs"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_RUNS_TEST_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), m AS (
  SELECT source, list_sort(list(y)) AS arr, count(*) AS n
  FROM r GROUP BY 1
), mm AS (
  SELECT source,
         arr[CAST((n - 1) // 2 AS BIGINT) + 1]
           + arr[CAST(n // 2 AS BIGINT) + 1] AS m2
  FROM m
), s AS (
  SELECT r.source, r.bucket_start,
         CASE WHEN 2 * r.y > mm.m2 THEN 1
              WHEN 2 * r.y < mm.m2 THEN -1 ELSE 0 END AS sg
  FROM r JOIN mm ON r.source = mm.source
), f AS (
  SELECT source, bucket_start, sg FROM s WHERE sg <> 0
), nz AS (
  SELECT source, sg,
         lag(sg) OVER (PARTITION BY source ORDER BY bucket_start) AS prev
  FROM f
)
SELECT source,
       count(*) FILTER (WHERE sg = 1) AS n_pos,
       count(*) FILTER (WHERE sg = -1) AS n_neg,
       1 + count(*) FILTER (WHERE prev IS NOT NULL AND sg <> prev) AS n_runs
FROM nz GROUP BY source
"""


_WORD_LEN_ORACLE = r"""
WITH words AS (
  SELECT lang, unnest(regexp_extract_all(text, '[\w'']+')) AS w
  FROM documents
)
SELECT lang, count(*) AS n_words,
       CAST(sum(length(w)) AS DOUBLE) / count(*) AS avg_word_len
FROM words GROUP BY lang
"""


_CHAR_TRIGRAM_ORACLE = """
WITH tri AS (
  SELECT lang, substr(text, CAST(i AS BIGINT), 3) AS tri
  FROM documents,
       UNNEST(generate_series(1, length(text) - 2)) AS s(i)
  WHERE length(text) >= 3
), c AS (
  SELECT lang, tri, count(*) AS cnt FROM tri GROUP BY 1, 2
)
SELECT lang, tri, cnt FROM c
QUALIFY row_number() OVER (
  PARTITION BY lang ORDER BY cnt DESC, tri ASC) <= 20
"""


_AFFIX_FP_ORACLE = """
WITH fp AS (
  SELECT substr(text, 1, 32) AS pre,
         substr(text, greatest(length(text) - 31, 1), 32) AS suf,
         length(text) AS n
  FROM documents
), c AS (
  SELECT pre, suf, n, count(*) AS cluster_size FROM fp GROUP BY 1, 2, 3
)
SELECT cluster_size, count(*) AS n_groups
FROM c WHERE cluster_size >= 2 GROUP BY 1
"""


_DOC_LEN_Q_ORACLE = """
SELECT source, count(*) AS n_docs,
       quantile_cont(n_chars, 0.25) AS p25,
       quantile_cont(n_chars, 0.50) AS p50,
       quantile_cont(n_chars, 0.75) AS p75
FROM documents GROUP BY source
"""


def dominant_acf_lag(sf_dir: str, max_lag: int = 48):
    """Dominant seasonality period per source: the lag k ∈ [1, 48] that
    maximizes the hourly series' autocovariance — period inference
    behind the STL/MSTL period choice (daily-seasonal sources peak at
    24).  EXACT argmax trick: with e_i = n·V_i − T (the KPSS integer
    demeaning, V in 10⁻⁴ units), the autocovariance numerator
    Σ e_i·e_{i+k} is an EXACT integer (Python bigint / HUGEINT — the
    products reach ~10²⁶, past int64 by design), so the argmax and its
    tie-break (smallest lag) are bit-deterministic on both engines; the
    reported peak ACF is the one double divide num/den.  One
    source-keyed exchange; O(n·max_lag) integer ops per source."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, _bs, _xs, y4 in _hourly_int_units(shard):
            n = int(y4.size)
            if n < 2:
                continue  # no lagged pairs at all — oracle emits no row
            total = int(y4.sum())
            e = [n * int(v) - total for v in y4.tolist()]
            den = sum(x * x for x in e)
            best_lag, best_num = 0, None
            for k in range(1, min(max_lag, n - 1) + 1):
                num = sum(a * b for a, b in zip(e[:-k], e[k:]))
                if best_num is None or num > best_num:
                    best_lag, best_num = k, num
            rows.append({
                "source": src, "lag_hours": best_lag,
                "acf_peak": float(best_num) / float(den)
                if den > 0 else np.nan,
                "n_obs": n,
            })
        return pd.DataFrame(rows, columns=[
            "source", "lag_hours", "acf_peak", "n_obs"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_DOMINANT_ACF_ORACLE = """
WITH r AS (
  SELECT event_type AS source,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS V,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY date_trunc('hour', ts)) AS idx
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), t AS (
  SELECT source, count(*) AS n, sum(CAST(V AS HUGEINT)) AS total
  FROM r GROUP BY source
), e AS (
  SELECT r.source, r.idx, t.n, t.n * CAST(r.V AS HUGEINT) - t.total AS ev
  FROM r JOIN t USING (source)
), den AS (
  SELECT source, sum(ev * ev) AS s2, any_value(n) AS n_obs
  FROM e GROUP BY source
), lags AS (
  SELECT unnest(range(1, 49)) AS lag
), nums AS (
  SELECT a.source, lags.lag, sum(a.ev * b.ev) AS num
  FROM e a CROSS JOIN lags
  JOIN e b ON b.source = a.source AND b.idx = a.idx + lags.lag
  GROUP BY a.source, lags.lag
)
SELECT nums.source, nums.lag AS lag_hours,
       CASE WHEN den.s2 > 0 THEN
         CAST(CAST(nums.num AS VARCHAR) AS DOUBLE)
           / CAST(CAST(den.s2 AS VARCHAR) AS DOUBLE)
       ELSE NULL END AS acf_peak,
       den.n_obs AS n_obs
FROM nums JOIN den ON den.source = nums.source
QUALIFY row_number() OVER (
  PARTITION BY nums.source ORDER BY nums.num DESC, nums.lag ASC) = 1
"""


def pacf_lag2_by_source(sf_dir: str):
    """Partial autocorrelation at lag 2 per source (Durbin-Levinson
    φ₂₂ = (r₂ − r₁²)/(1 − r₁²)) — the AR-order probe that separates a
    true 2-hour memory from one-lag carry-over, complementing
    dominant_acf_lag's period inference.  The three autocovariance
    numerators c₀, c₁, c₂ over the integer-demeaned series
    (e = n·V − ΣV, the KPSS trick) are EXACT (Python bigint / HUGEINT,
    ~10²⁶); the degenerate guards are exact-integer compares (c₀ = 0
    constant series; |c₁| = c₀ perfect lag-1 correlation — NOT c₀²=c₁²,
    which would overflow HUGEINT); φ₂₂ itself is the identical IEEE
    expression over VARCHAR-bridged correctly-rounded casts on both
    engines.  One source-keyed exchange, bounded series."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, _bs, _xs, y4 in _hourly_int_units(shard):
            n = int(y4.size)
            if n < 3:
                continue
            total = int(y4.sum())
            e = [n * int(v) - total for v in y4.tolist()]
            c0 = sum(x * x for x in e)
            c1 = sum(a * b for a, b in zip(e[:-1], e[1:]))
            c2 = sum(a * b for a, b in zip(e[:-2], e[2:]))
            if c0 == 0 or abs(c1) == c0:
                pacf = np.nan
            else:
                r1 = float(c1) / float(c0)
                r2 = float(c2) / float(c0)
                pacf = (r2 - r1 * r1) / (1.0 - r1 * r1)
            rows.append({"source": src, "n_obs": n, "pacf_lag2": pacf})
        return pd.DataFrame(rows, columns=["source", "n_obs", "pacf_lag2"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_PACF_LAG2_ORACLE = """
WITH r AS (
  SELECT event_type AS source,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS V,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY date_trunc('hour', ts)) AS idx
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), t AS (
  SELECT source, count(*) AS n, sum(CAST(V AS HUGEINT)) AS total
  FROM r GROUP BY source
), e AS (
  SELECT r.source, r.idx, t.n, t.n * CAST(r.V AS HUGEINT) - t.total AS ev
  FROM r JOIN t USING (source)
), c0 AS (
  SELECT source, any_value(n) AS n, sum(ev * ev) AS c0
  FROM e GROUP BY source
), c1 AS (
  SELECT a.source, sum(a.ev * b.ev) AS c1
  FROM e a JOIN e b ON b.source = a.source AND b.idx = a.idx + 1
  GROUP BY 1
), c2 AS (
  SELECT a.source, sum(a.ev * b.ev) AS c2
  FROM e a JOIN e b ON b.source = a.source AND b.idx = a.idx + 2
  GROUP BY 1
)
SELECT c0.source, c0.n AS n_obs,
       CASE WHEN c0.c0 > 0 AND abs(c1.c1) <> c0.c0 THEN
         ((CAST(CAST(c2.c2 AS VARCHAR) AS DOUBLE)
             / CAST(CAST(c0.c0 AS VARCHAR) AS DOUBLE))
          - (CAST(CAST(c1.c1 AS VARCHAR) AS DOUBLE)
               / CAST(CAST(c0.c0 AS VARCHAR) AS DOUBLE))
            * (CAST(CAST(c1.c1 AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(c0.c0 AS VARCHAR) AS DOUBLE)))
         / (1.0 - (CAST(CAST(c1.c1 AS VARCHAR) AS DOUBLE)
                     / CAST(CAST(c0.c0 AS VARCHAR) AS DOUBLE))
                  * (CAST(CAST(c1.c1 AS VARCHAR) AS DOUBLE)
                       / CAST(CAST(c0.c0 AS VARCHAR) AS DOUBLE)))
       ELSE NULL END AS pacf_lag2
FROM c0 JOIN c1 USING (source) JOIN c2 USING (source)
WHERE c0.n >= 3
"""


# ------------------------------------------- local structure detectors


def peak_hours(sf_dir: str):
    """Local-maximum detection over the hourly tier: buckets strictly
    greater than BOTH sequence neighbors per source (reference parity:
    the spike candidates the decompose-and-detect family flags;
    catch.py's detectors score deviations — this is the shape primitive
    under them).  Neighbors are the previous/next OBSERVED bucket in
    bucket order (the same windows the oracle's lag/lead see), so the
    comparison is exact-integer on 10⁻⁴-unit values and parity is
    bit-for-bit.  One source-keyed exchange; vectorized per source."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for src, bs, _xs, y4 in _hourly_int_units(shard):
            if y4.size < 3:
                continue
            mid = y4[1:-1]
            mask = (mid > y4[:-2]) & (mid > y4[2:])
            if not mask.any():
                continue
            idx = np.flatnonzero(mask) + 1
            frames.append(pd.DataFrame({
                "source": src,
                "bucket_start": bs.to_numpy()[idx],
                "value": y4[idx] / 10000.0}))
        if not frames:
            return pd.DataFrame({
                "source": pd.Series([], dtype=object),
                "bucket_start": pd.Series([], dtype="datetime64[ns]"),
                "value": pd.Series([], dtype=np.float64)})
        return pd.concat(frames, ignore_index=True)

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_PEAK_HOURS_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), w AS (
  SELECT source, bucket_start, y,
         lag(y) OVER win AS yp, lead(y) OVER win AS yn
  FROM r WINDOW win AS (PARTITION BY source ORDER BY bucket_start)
)
SELECT source, bucket_start, CAST(y AS DOUBLE) / 10000.0 AS value
FROM w
WHERE yp IS NOT NULL AND yn IS NOT NULL AND y > yp AND y > yn
"""


def variance_ratio_by_day(sf_dir: str):
    """Per-(source, day) heteroscedasticity screen: the ratio of the
    day's population variance of hourly sums to the source's overall
    variance — days whose ratio spikes carry regime shifts or bursts
    the mean-based detectors miss.  Exactness: with y in 10⁻⁴ integer
    units, var = (nΣy² − (Σy)²)/n², so the ratio's numerator
    (n_d·S2_d − S1_d²)·N² and denominator n_d²·(N·S2 − S1²) are EXACT
    integers (Python bigints in the engine, HUGEINT in the oracle) and
    the single double divide is bit-identical.  One source-keyed
    exchange; per-source series bounded by bucket count."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, bs, _xs, y4 in _hourly_int_units(shard):
            y = [int(v) for v in y4.tolist()]
            n_all = len(y)
            s1 = sum(y)
            s2 = sum(v * v for v in y)
            den_src = n_all * s2 - s1 * s1
            days = bs.dt.floor("D")
            dfd = pd.DataFrame({"day": days.to_numpy(), "y": y})
            for day, g in dfd.groupby("day", sort=False):
                gy = g["y"].tolist()
                nd = len(gy)
                d1 = sum(gy)
                d2 = sum(v * v for v in gy)
                num = (nd * d2 - d1 * d1) * n_all * n_all
                den = nd * nd * den_src
                rows.append({
                    "source": src, "day": day, "n_hours": nd,
                    "var_ratio": float(num) / float(den)
                    if den_src > 0 else np.nan})
        return pd.DataFrame(rows, columns=[
            "source", "day", "n_hours", "var_ratio"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_VAR_RATIO_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), s AS (
  SELECT source, count(*) AS n,
         sum(CAST(y AS HUGEINT)) AS s1,
         sum(CAST(y AS HUGEINT) * y) AS s2
  FROM r GROUP BY source
), d AS (
  SELECT source, date_trunc('day', bucket_start) AS day,
         count(*) AS nd,
         sum(CAST(y AS HUGEINT)) AS d1,
         sum(CAST(y AS HUGEINT) * y) AS d2
  FROM r GROUP BY 1, 2
)
SELECT d.source, d.day, d.nd AS n_hours,
       CASE WHEN s.n * s.s2 - s.s1 * s.s1 > 0 THEN
         CAST(CAST((d.nd * d.d2 - d.d1 * d.d1) * s.n * s.n
                   AS VARCHAR) AS DOUBLE)
           / CAST(CAST(d.nd * d.nd * (s.n * s.s2 - s.s1 * s.s1)
                       AS VARCHAR) AS DOUBLE)
       ELSE NULL END AS var_ratio
FROM d JOIN s USING (source)
"""


def longest_flat_run(sf_dir: str):
    """Longest run of hour-adjacent buckets with an IDENTICAL value per
    source (gaps-and-islands on both hour continuity and 10⁻⁴-unit
    equality) — the stuck-sensor / pipeline-freeze data-quality check.
    All-integer comparisons, earliest start on run-length ties; one
    source-keyed exchange."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, bs, xs, y4 in _hourly_int_units(shard):
            brk = (np.diff(xs) != 1) | (np.diff(y4) != 0)
            starts = np.concatenate([[0], np.flatnonzero(brk) + 1])
            bounds = np.append(starts, xs.size)
            lens = np.diff(bounds)
            best = int(np.argmax(lens))  # first max = earliest start
            i0 = int(starts[best])
            rows.append({
                "source": src, "flat_hours": int(lens[best]),
                "run_start": bs.iloc[i0],
                "value": y4[i0] / 10000.0})
        return pd.DataFrame(rows, columns=[
            "source", "flat_hours", "run_start", "value"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_FLAT_RUN_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS h,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY 1, 2, 3
), w AS (
  SELECT source, bucket_start, h, y,
         CASE WHEN h - lag(h) OVER win = 1 AND y = lag(y) OVER win
              THEN 0 ELSE 1 END AS brk
  FROM r WINDOW win AS (PARTITION BY source ORDER BY h)
), g AS (
  SELECT source, bucket_start, y,
         sum(brk) OVER (PARTITION BY source ORDER BY h
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM w
), runs AS (
  SELECT source, grp, count(*) AS flat_hours,
         min(bucket_start) AS run_start, any_value(y) AS y
  FROM g GROUP BY source, grp
)
SELECT source, flat_hours, run_start, CAST(y AS DOUBLE) / 10000.0 AS value
FROM runs
QUALIFY row_number() OVER (
  PARTITION BY source ORDER BY flat_hours DESC, run_start ASC) = 1
"""


_ZIPF_HEAD_ORACLE = r"""
WITH words AS (
  SELECT source,
         unnest(list_transform(regexp_extract_all(text, '[\w'']+'),
                               w -> lower(w))) AS w
  FROM documents
), c AS (
  SELECT source, w, count(*) AS c FROM words GROUP BY 1, 2
), t AS (
  SELECT source, count(*) AS n_tokens FROM words GROUP BY source
), top AS (
  SELECT source, w, c,
         row_number() OVER (PARTITION BY source
                            ORDER BY c DESC, w ASC) AS rn
  FROM c
)
SELECT t.source, t.n_tokens,
       sum(top.c) AS head10_tokens,
       CAST(sum(top.c) AS DOUBLE) / t.n_tokens AS head10_coverage,
       min(CASE WHEN rn = 1 THEN w END) AS top_word
FROM top JOIN t USING (source)
WHERE rn <= 10
GROUP BY t.source, t.n_tokens
"""


_STOPWORD_ORACLE = r"""
WITH words AS (
  SELECT source,
         unnest(list_transform(regexp_extract_all(text, '[\w'']+'),
                               w -> lower(w))) AS w
  FROM documents
)
SELECT source, count(*) AS n_tokens,
       coalesce(sum(CASE WHEN w IN (
         'the','of','and','a','to','in','is','it','that','for',
         'on','with','as','was','at','by','an','be','this','are',
         'or','from','not','but','have') THEN 1 ELSE 0 END), 0)
         AS n_stopwords,
       CAST(coalesce(sum(CASE WHEN w IN (
         'the','of','and','a','to','in','is','it','that','for',
         'on','with','as','was','at','by','an','be','this','are',
         'or','from','not','but','have') THEN 1 ELSE 0 END), 0)
         AS DOUBLE) / count(*) AS stopword_share
FROM words GROUP BY source
"""


_CONTAMINATION_ORACLE = """
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
docs AS (SELECT doc_id, source FROM documents),
m AS (SELECT min(source) AS ms FROM documents),
bg AS (
  SELECT DISTINCT gram FROM dd JOIN docs USING (doc_id), m
  WHERE docs.source = m.ms
)
SELECT dd.doc_id, docs.source, count(*) AS n_shared_grams
FROM dd JOIN bg USING (gram) JOIN docs USING (doc_id), m
WHERE docs.source <> m.ms
GROUP BY dd.doc_id, docs.source
"""


_EMB_QUANT_ORACLE = """
WITH u AS (
  SELECT generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
)
SELECT dim, min(x) AS min_v, max(x) AS max_v,
       (max(x) - min(x)) / 255.0 AS scale
FROM u GROUP BY dim ORDER BY dim
"""


def bollinger_breaks_1h(sf_dir: str, window: int = 24):
    """Bollinger-band breaks over the hourly tier: buckets whose value
    sits more than 2σ from the mean of the previous ``window`` OBSERVED
    buckets (the rolling-control-chart cousin of the z-score detector,
    reference parity: catch.py's moving-average family uses the same
    trailing-window deviation idea).  Exactness: with y in 10⁻⁴ integer
    units, |y − S1/w| > 2σ ⟺ (y·w − S1)² > 4·(w·S2 − S1²) — both sides
    EXACT integers (Python bigints / HUGEINT; (y·w−S1)² overflows int64
    at sf0.1 magnitudes, so the engine folds in arbitrary-precision
    ints), zero float arithmetic, bit-for-bit parity.  Only full
    windows flag (count == window, the oracle's ROWS frame).  One
    source-keyed exchange; per-source rolling sums are O(n)."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")
    w = int(window)

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, bs, _xs, y4 in _hourly_int_units(shard):
            if y4.size <= w:
                continue
            y = [int(v) for v in y4.tolist()]
            s1 = sum(y[:w])
            s2 = sum(v * v for v in y[:w])
            bsv = bs.to_numpy()
            for i in range(w, len(y)):
                d = y[i] * w - s1
                if d * d > 4 * (w * s2 - s1 * s1):
                    rows.append({
                        "source": src,
                        "bucket_start": bsv[i],
                        "value": y[i] / 10000.0,
                        "direction": 1 if d > 0 else -1})
                out_v, in_v = y[i - w], y[i]
                s1 += in_v - out_v
                s2 += in_v * in_v - out_v * out_v
        return pd.DataFrame(rows, columns=[
            "source", "bucket_start", "value", "direction"]).astype(
            {"direction": np.int64}) if rows else pd.DataFrame({
                "source": pd.Series([], dtype=object),
                "bucket_start": pd.Series([], dtype="datetime64[ns]"),
                "value": pd.Series([], dtype=np.float64),
                "direction": pd.Series([], dtype=np.int64)})

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_BOLLINGER_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), w AS (
  SELECT source, bucket_start, y,
         sum(CAST(y AS HUGEINT)) OVER win AS s1,
         sum(CAST(y AS HUGEINT) * y) OVER win AS s2,
         count(*) OVER win AS cnt
  FROM r WINDOW win AS (PARTITION BY source ORDER BY bucket_start
                        ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT source, bucket_start, CAST(y AS DOUBLE) / 10000.0 AS value,
       CASE WHEN CAST(y AS HUGEINT) * 24 > s1 THEN 1 ELSE -1 END
         AS direction
FROM w
WHERE cnt = 24
  AND (CAST(y AS HUGEINT) * 24 - s1) * (CAST(y AS HUGEINT) * 24 - s1)
      > 4 * (24 * s2 - s1 * s1)
"""


def mean_crossings(sf_dir: str):
    """Mean-crossing count per source over the hourly tier — the
    oscillation-rate screen (a series that rarely crosses its mean is
    trending or stuck; one that crosses constantly is noise-dominated).
    Exactness: the deviation d_i = y_i·n − S1 is an EXACT integer
    (Python bigint / HUGEINT), and a crossing is d_i·d_{i+1} < 0
    between consecutive OBSERVED buckets — zero floats, zero-deviation
    buckets excluded by the strict product on both sides."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, _bs, _xs, y4 in _hourly_int_units(shard):
            y = [int(v) for v in y4.tolist()]
            n = len(y)
            s1 = sum(y)
            d = [v * n - s1 for v in y]
            rows.append({
                "source": src, "n_buckets": n,
                "crossings": sum(
                    1 for a, b in zip(d[:-1], d[1:]) if a * b < 0)})
        return pd.DataFrame(rows, columns=[
            "source", "n_buckets", "crossings"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_MEAN_CROSSINGS_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), s AS (
  SELECT source, count(*) AS n, sum(CAST(y AS HUGEINT)) AS s1
  FROM r GROUP BY source
), d AS (
  SELECT r.source, s.n,
         CAST(r.y AS HUGEINT) * s.n - s.s1 AS dev,
         lag(CAST(r.y AS HUGEINT) * s.n - s.s1)
           OVER (PARTITION BY r.source ORDER BY r.bucket_start) AS prev
  FROM r JOIN s USING (source)
)
SELECT source, any_value(n) AS n_buckets,
       count(*) FILTER (dev * prev < 0) AS crossings
FROM d GROUP BY source
"""


def day_over_day_growth(sf_dir: str):
    """Per-(source, day) daily volume + growth ratio vs the previous
    OBSERVED day — the capacity-planning day-over-day monitor.  Daily
    sums fold from the hourly tier's 10⁻⁴-unit integers (exact), the
    growth ratio is ONE double divide of the two integer-unit values
    (bit-identical across engines), NULL when there is no prior day or
    the prior day sums to exactly zero."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, bs, _xs, y4 in _hourly_int_units(shard):
            days = bs.dt.floor("D").to_numpy()
            order = np.argsort(days, kind="stable")
            days, yo = days[order], y4[order]
            uniq, starts = np.unique(days, return_index=True)
            bounds = np.append(starts, yo.size)
            sums = [int(sum(int(v) for v in yo[bounds[i]:bounds[i + 1]]))
                    for i in range(uniq.size)]
            for i, (day, dsum) in enumerate(zip(uniq, sums)):
                prev = sums[i - 1] if i > 0 else None
                rows.append({
                    "source": src, "day": day,
                    "day_sum": dsum / 10000.0,
                    "growth": (float(dsum) / float(prev)
                               if prev not in (None, 0) else np.nan)})
        return pd.DataFrame(rows, columns=[
            "source", "day", "day_sum", "growth"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_DAY_GROWTH_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), d AS (
  SELECT source, date_trunc('day', bucket_start) AS day,
         sum(CAST(y AS HUGEINT)) AS dsum
  FROM r GROUP BY 1, 2
), w AS (
  SELECT source, day, dsum,
         lag(dsum) OVER (PARTITION BY source ORDER BY day) AS prev
  FROM d
)
SELECT source, day, CAST(dsum AS DOUBLE) / 10000.0 AS day_sum,
       CASE WHEN prev IS NOT NULL AND prev != 0
            THEN CAST(dsum AS DOUBLE) / CAST(prev AS DOUBLE)
            ELSE NULL END AS growth
FROM w
"""


_WORD_REPETITION_ORACLE = """
SELECT doc_id, source,
       len(string_split(text, ' ')) AS n_words,
       len(list_distinct(string_split(text, ' '))) AS n_distinct,
       CAST(len(string_split(text, ' '))
            - len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         / len(string_split(text, ' ')) AS dup_ratio
FROM documents
"""


def burst_window_5m(sf_dir: str):
    """Peak 5-minute burst per source: the sliding window of 5
    consecutive minutes (anchored at each OBSERVED minute bucket) with
    the largest event count — the rate-limiter / incident-triage view
    the per-minute tier exists for.  Per source the sparse minute axis
    is swept with ONE vectorized searchsorted over cumulative counts
    (no dense grid, no per-window loop); all-integer, earliest window
    start pinned on count ties both sides."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1m")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in shard.groupby("event_type", sort=False):
            g = g.sort_values("bucket_start", kind="stable")
            m = (g["bucket_start"].to_numpy().astype("datetime64[s]")
                 .astype(np.int64) // 60)
            c = g["n_points"].to_numpy(dtype=np.int64)
            cs = np.concatenate([[0], np.cumsum(c)])
            j = np.searchsorted(m, m + 5, side="left")
            win = cs[j] - cs[:-1]
            best = int(np.argmax(win))  # first max = earliest start
            rows.append({
                "source": src,
                "window_start": g["bucket_start"].to_numpy()[best],
                "n_events_5m": int(win[best])})
        return pd.DataFrame(rows, columns=[
            "source", "window_start", "n_events_5m"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "n_points"]),
        "event_type", fold)


_BURST_5M_ORACLE = """
WITH m AS (
  SELECT event_type AS source,
         date_trunc('minute', ts) AS bucket_start,
         CAST(epoch(date_trunc('minute', ts)) AS BIGINT) // 60 AS mm,
         count(*) AS c
  FROM events GROUP BY 1, 2, 3
), w AS (
  SELECT source, bucket_start, mm,
         sum(c) OVER (PARTITION BY source ORDER BY mm
                      RANGE BETWEEN CURRENT ROW AND 4 FOLLOWING) AS s
  FROM m
)
SELECT source, bucket_start AS window_start,
       CAST(s AS BIGINT) AS n_events_5m
FROM w
QUALIFY row_number() OVER (
  PARTITION BY source ORDER BY s DESC, mm ASC) = 1
"""


def user_type_diversity(sf_dir: str):
    """Distribution of per-user event-type diversity: how many users
    touched exactly N distinct event types — the engagement-breadth
    histogram (the Q13 double-aggregate shape on the events table).
    Per batch rows dedup to distinct (user, type) partials BEFORE the
    exchange; one user-keyed exchange finishes the global distinct and
    emits per-N integer histogram partials; a tiny second exchange
    folds them.  All-integer — bit-exact."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["user_id", "event_type"])

    pairs = ds.map_batches(partial, batch_format="pandas")

    def histo(shard: pd.DataFrame) -> pd.DataFrame:
        u = shard.drop_duplicates(["user_id", "event_type"])
        n_types = u.groupby("user_id", sort=False).size()
        out = (pd.DataFrame({"n_types": n_types.to_numpy()})
               .groupby("n_types", as_index=False).size()
               .rename(columns={"size": "n_users"}))
        out["n_types"] = out["n_types"].astype(np.int64)
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    parts = sharded_map_groups(pairs, "user_id", histo)
    return sharded_aggregate(parts, "n_types", {"n_users": "sum"},
                             num_shards=2)


_USER_DIVERSITY_ORACLE = """
WITH u AS (
  SELECT user_id, count(DISTINCT event_type) AS n_types
  FROM events GROUP BY user_id
)
SELECT n_types, count(*) AS n_users FROM u GROUP BY n_types
"""


_KMEANS_ASSIGN_ORACLE = """
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS qv
  FROM embeddings
), c AS (
  SELECT vec_id AS cid, dim, qv FROM q
  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
), d AS (
  SELECT q.vec_id, c.cid,
         sum((q.qv - c.qv) * (q.qv - c.qv)) AS dist_i
  FROM q JOIN c USING (dim) GROUP BY 1, 2
), a AS (
  SELECT vec_id, cid, dist_i, row_number() OVER (
      PARTITION BY vec_id ORDER BY dist_i, cid) AS rn
  FROM d
)
SELECT cid AS centroid_id, count(*) AS n_vecs,
       CAST(sum(dist_i) AS DOUBLE) / count(*) AS mean_sq_dist
FROM a WHERE rn = 1 GROUP BY 1
"""


_CENTROID_MARGIN_ORACLE = """
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS qv
  FROM embeddings
), c AS (
  SELECT vec_id AS cid, dim, qv FROM q
  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
), d AS (
  SELECT q.vec_id, c.cid,
         sum((q.qv - c.qv) * (q.qv - c.qv)) AS dist_i
  FROM q JOIN c USING (dim) GROUP BY 1, 2
), a AS (
  SELECT vec_id, cid, dist_i, row_number() OVER (
      PARTITION BY vec_id ORDER BY dist_i, cid) AS rn
  FROM d
), p AS (
  SELECT a1.vec_id, a1.cid, a1.dist_i AS d1, a2.dist_i AS d2
  FROM a a1 JOIN a a2 ON a1.vec_id = a2.vec_id
  WHERE a1.rn = 1 AND a2.rn = 2
)
SELECT cid AS centroid_id, count(*) AS n_vecs,
       count(*) FILTER (WHERE 4 * d2 < 5 * d1) AS n_ambiguous
FROM p GROUP BY 1
"""


_COSINE_PAIR_ORACLE = """
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS qv
  FROM embeddings
), p AS (
  SELECT a.vec_id // 2 AS pk,
         sum(a.qv * b.qv) AS dot,
         sum(a.qv * a.qv) AS na, sum(b.qv * b.qv) AS nb
  FROM q a JOIN q b
    ON b.vec_id = a.vec_id + 1 AND a.vec_id % 2 = 0 AND a.dim = b.dim
  GROUP BY 1
)
SELECT CAST(floor(20.0 * (
         CAST(CAST(dot AS VARCHAR) AS DOUBLE)
         / (sqrt(CAST(CAST(na AS VARCHAR) AS DOUBLE))
            * sqrt(CAST(CAST(nb AS VARCHAR) AS DOUBLE))))) AS BIGINT)
         AS bucket,
       count(*) AS n_pairs
FROM p WHERE na > 0 AND nb > 0
GROUP BY 1
"""


_PQ_ASSIGN_ORACLE = """
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS qv
  FROM embeddings
), ss AS (
  SELECT len(embedding) // 4 AS s FROM embeddings LIMIT 1
), c AS (
  SELECT vec_id AS cid, dim, qv FROM q
  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)
), d AS (
  SELECT q.vec_id, (q.dim - 1) // ss.s AS subspace, c.cid,
         sum((q.qv - c.qv) * (q.qv - c.qv)) AS dist_i
  FROM q CROSS JOIN ss JOIN c ON c.dim = q.dim
  GROUP BY 1, 2, 3
), a AS (
  SELECT vec_id, subspace, cid, dist_i, row_number() OVER (
      PARTITION BY vec_id, subspace ORDER BY dist_i, cid) AS rn
  FROM d
)
SELECT subspace, cid AS code, count(*) AS n_vecs,
       CAST(sum(dist_i) AS BIGINT) AS sum_sq_dist
FROM a WHERE rn = 1 GROUP BY 1, 2
"""


_EMB_DOCLEN_CORR_ORACLE = """
WITH q AS (
  SELECT vec_id, CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                      AS BIGINT) AS qv
  FROM embeddings
), nrm AS (
  SELECT vec_id, sum(CAST(qv AS HUGEINT) * qv) AS y FROM q GROUP BY 1
), j AS (
  SELECT d.source, CAST(d.n_chars AS HUGEINT) AS x, nrm.y
  FROM documents d JOIN nrm ON nrm.vec_id = d.doc_id
), s AS (
  SELECT source, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM j GROUP BY 1
)
SELECT source, n AS n_docs,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
         CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
         / (sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE))
            * sqrt(CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)))
       ELSE NULL END AS len_norm_corr
FROM s
"""


_LABEL_SEPARATION_ORACLE = """
WITH u AS (
  SELECT label, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS qv
  FROM embeddings
), s AS (
  SELECT label, dim, sum(qv) AS sv FROM u GROUP BY 1, 2
), n AS (
  SELECT label, count(*) AS n FROM embeddings GROUP BY 1
), p AS (
  SELECT a.label AS label_a, b.label AS label_b,
         na.n AS n_a, nb.n AS n_b,
         sum(CAST(a.sv * nb.n - b.sv * na.n AS HUGEINT)
             * CAST(a.sv * nb.n - b.sv * na.n AS HUGEINT)) AS num
  FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label
  JOIN n na ON na.label = a.label
  JOIN n nb ON nb.label = b.label
  GROUP BY 1, 2, 3, 4
)
SELECT label_a, label_b, n_a, n_b,
       CAST(CAST(num AS VARCHAR) AS DOUBLE)
         / CAST(CAST((n_a * n_b) * (n_a * n_b) AS VARCHAR) AS DOUBLE)
         AS centroid_sq_dist
FROM p
"""


def seasonal_naive_mase(sf_dir: str, period: int = 24):
    """Per-source MASE-style seasonal-forecastability score: mean
    |y_t − y_{t−24h}| over mean |y_t − y_{t−1h}| on the hourly tier
    (<1 ⇒ the daily-seasonal naive forecast beats the random-walk
    naive ⇒ strong daily seasonality).  Complements
    ``seasonal_naive_error`` (that one reports the seasonal predictor's
    absolute MAE/RMSE; this one is the SCALE-FREE Hyndman MASE ratio
    against the random-walk naive, NULL on constant series — the
    comparable-across-sources form).  Lags are by HOUR ARITHMETIC
    (a term exists only when the bucket exactly 24/1 hours earlier
    exists), so gaps contribute nothing.  Exactness: both sums are
    exact integers in 10⁻⁴ units; the ratio (num·c1)/(den·c24) is ONE
    double divide of two exact bigint products (Python int / HUGEINT
    with the VARCHAR-bridge cast — see test_varpop_int_units_bitwise
    for why the bridge).  NULL when the naive denominator is zero
    (constant series — the frozen-sensor fuzz source pins this)."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, _bs, xs, y4 in _hourly_int_units(shard):
            out = {}
            for lag, tag in ((period, "s"), (1, "n")):
                prev_pos = np.searchsorted(xs, xs - lag)
                has = (prev_pos < xs.size) & (
                    xs[np.minimum(prev_pos, xs.size - 1)] == xs - lag)
                d = np.abs(y4[has] - y4[prev_pos[has]])
                out[tag] = (int(has.sum()),
                            int(d.astype(object).sum()) if d.size else 0)
            c24, num = out["s"]
            c1, den = out["n"]
            if c24 == 0 or c1 == 0:
                continue
            rows.append({
                "source": src,
                "n_seasonal_terms": c24, "n_naive_terms": c1,
                "mase": float(num * c1) / float(den * c24)
                if den > 0 else np.nan,
            })
        return pd.DataFrame(rows, columns=[
            "source", "n_seasonal_terms", "n_naive_terms", "mase"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_MASE_ORACLE = """
WITH r AS (
  SELECT event_type AS source,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS x,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), s AS (
  SELECT a.source, count(*) AS c24,
         sum(CAST(abs(a.y - b.y) AS HUGEINT)) AS num
  FROM r a JOIN r b ON b.source = a.source AND b.x = a.x - 24
  GROUP BY 1
), n AS (
  SELECT a.source, count(*) AS c1,
         sum(CAST(abs(a.y - b.y) AS HUGEINT)) AS den
  FROM r a JOIN r b ON b.source = a.source AND b.x = a.x - 1
  GROUP BY 1
)
SELECT s.source, s.c24 AS n_seasonal_terms, n.c1 AS n_naive_terms,
       CASE WHEN n.den > 0 THEN
         CAST(CAST(s.num * n.c1 AS VARCHAR) AS DOUBLE)
           / CAST(CAST(n.den * s.c24 AS VARCHAR) AS DOUBLE)
       ELSE NULL END AS mase
FROM s JOIN n USING (source)
"""


def gap_inventory_1h(sf_dir: str):
    """Data-completeness inventory: one row per RUN of missing hourly
    buckets per source — (gap_start, gap_hours, prev/next observed
    bucket).  The DETAIL table under ``gap_analysis`` (that one emits
    one summary row per source; this one lists each gap run for
    targeted backfill).  Pure integer gaps-and-islands on
    epoch-hours; one source-keyed exchange of the (already tiny)
    hourly tier."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, bs, xs, _y4 in _hourly_int_units(shard):
            d = np.diff(xs)
            at = np.flatnonzero(d > 1)
            bsv = bs.to_numpy()
            for i in at:
                rows.append({
                    "source": src,
                    "gap_start": bsv[i] + np.timedelta64(1, "h"),
                    "gap_hours": int(d[i] - 1),
                    "prev_bucket": bsv[i],
                    "next_bucket": bsv[i + 1],
                })
        return pd.DataFrame(rows, columns=[
            "source", "gap_start", "gap_hours", "prev_bucket",
            "next_bucket"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_GAP_INVENTORY_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS x
  FROM events GROUP BY 1, 2, 3
), w AS (
  SELECT source, bucket_start, x,
         lead(bucket_start) OVER win AS next_bucket,
         lead(x) OVER win AS nx
  FROM r WINDOW win AS (PARTITION BY source ORDER BY x)
)
SELECT source, bucket_start + INTERVAL 1 HOUR AS gap_start,
       nx - x - 1 AS gap_hours, bucket_start AS prev_bucket, next_bucket
FROM w WHERE nx - x > 1
"""


def hourly_profile_bands(sf_dir: str):
    """Seasonal profile product: per (source, UTC hour-of-day) the
    p25/p50/p75 of the hourly sums across days — the band chart behind
    ``seasonal_envelope`` generalized to quartiles, and the hour-of-day
    counterpart of ``weekday_profile``.  hour-of-day =
    epoch-hours mod 24 (epoch hour 0 is midnight UTC, so this equals
    extract(hour) on the naive timestamps); quantiles ride the
    bit-pinned ``quantile_cont`` lerp.  Output bounded at
    sources × 24."""
    from ..functions.stats import quantile_cont
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, _bs, xs, y4 in _hourly_int_units(shard):
            hod = xs % 24
            for h in np.unique(hod):
                v = np.sort(y4[hod == h].astype(np.float64))
                rows.append({
                    "source": src, "hour_of_day": int(h),
                    "n_obs": int(v.size),
                    "p25": float(quantile_cont(v, 0.25)) / 10000.0,
                    "p50": float(quantile_cont(v, 0.50)) / 10000.0,
                    "p75": float(quantile_cont(v, 0.75)) / 10000.0,
                })
        return pd.DataFrame(rows, columns=[
            "source", "hour_of_day", "n_obs", "p25", "p50", "p75"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_HOURLY_PROFILE_ORACLE = """
WITH r AS (
  SELECT event_type AS source,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 % 24
           AS hour_of_day,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY event_type, date_trunc('hour', ts)
)
SELECT source, hour_of_day, count(*) AS n_obs,
       quantile_cont(y, 0.25) / 10000.0 AS p25,
       quantile_cont(y, 0.50) / 10000.0 AS p50,
       quantile_cont(y, 0.75) / 10000.0 AS p75
FROM r GROUP BY 1, 2
"""


def value_quantile_drift(sf_dir: str):
    """Distribution-shift screen on the monitored signal itself: per
    source, p50/p90 of the hourly sums over the FIRST half of the
    source's buckets (by bucket order) vs the second half — the
    quantile counterpart of token_length_drift, catching level/tail
    shifts a mean-based trend test smooths over.  The half split is
    positional (early = first ⌊n/2⌋ buckets — no wall-clock boundary
    to disagree on), quantiles ride the bit-pinned ``quantile_cont``
    lerp, and sources with a single bucket drop on both sides.  One
    source-keyed exchange, bounded series."""
    from ..functions.stats import quantile_cont
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, _bs, _xs, y4 in _hourly_int_units(shard):
            n = int(y4.size)
            if n < 2:
                continue
            k = n // 2
            early = np.sort(y4[:k].astype(np.float64))
            late = np.sort(y4[k:].astype(np.float64))
            rows.append({
                "source": src, "n_early": k, "n_late": n - k,
                "p50_early": float(quantile_cont(early, 0.5)) / 10000.0,
                "p50_late": float(quantile_cont(late, 0.5)) / 10000.0,
                "p90_early": float(quantile_cont(early, 0.9)) / 10000.0,
                "p90_late": float(quantile_cont(late, 0.9)) / 10000.0,
            })
        return pd.DataFrame(rows, columns=[
            "source", "n_early", "n_late", "p50_early", "p50_late",
            "p90_early", "p90_late"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_VALUE_QUANTILE_DRIFT_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), w AS (
  SELECT source, y,
         row_number() OVER (PARTITION BY source ORDER BY bucket_start)
           AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM r
)
SELECT source,
       count(*) FILTER (WHERE 2 * rn <= n) AS n_early,
       count(*) FILTER (WHERE 2 * rn > n) AS n_late,
       quantile_cont(y, 0.5) FILTER (WHERE 2 * rn <= n) / 10000.0
         AS p50_early,
       quantile_cont(y, 0.5) FILTER (WHERE 2 * rn > n) / 10000.0
         AS p50_late,
       quantile_cont(y, 0.9) FILTER (WHERE 2 * rn <= n) / 10000.0
         AS p90_early,
       quantile_cont(y, 0.9) FILTER (WHERE 2 * rn > n) / 10000.0
         AS p90_late
FROM w GROUP BY source HAVING count(*) >= 2
"""


_EMB_NORM_ORACLE = """
WITH x AS (
  SELECT vec_id, label,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS qv
  FROM embeddings
), u AS (
  SELECT vec_id, label, sum(qv * qv) AS sq_norm FROM x GROUP BY 1, 2
), m AS (
  SELECT label, quantile_cont(sq_norm, 0.5) AS med FROM u GROUP BY 1
)
SELECT u.vec_id, u.label,
       -- BIGINT, not the HUGEINT sum: duckdb hands HUGEINT columns to
       -- pandas as float64, and the driver-compare's round(6) at 1e12
       -- magnitude is itself lossy (x*1e6 passes 2^53) — int dtype on
       -- BOTH sides keeps the compare exact
       CAST(u.sq_norm AS BIGINT) AS sq_norm, m.med AS label_median_sq,
       CAST(u.sq_norm AS DOUBLE) > 4 * m.med AS is_outlier
FROM u JOIN m USING (label)
"""


def lead_lag_vs_reference(sf_dir: str, max_lag: int = 24):
    """Per-source LEAD/LAG inference against the fleet-total hourly
    series: the shift k ∈ [−24, 24] that maximizes the cross-covariance
    between a source's demeaned hourly sums and the demeaned fleet
    total — the triage question "does this source move before or after
    the fleet?".  Scale shape is the broadcast-reference path
    (``reference_correlation``): the total series is O(hours) — tiny at
    any corpus scale — built by ONE bucket-keyed integer aggregation,
    collected once (the documented driver bound: #hours rows, never the
    corpus), demeaned on the driver, and broadcast via ``ray.put``;
    per-source work then rides ONE source-keyed exchange.  EXACT argmax
    trick (same as ``dominant_acf_lag``): values in 10⁻⁴-unit int64,
    ex = n·X_h − ΣX and ey = m·Y_h − ΣY exact integers, the lag-k
    numerator Σ ex_h·ey_{h+k} an exact Python bigint / HUGEINT, so the
    argmax and its (num DESC, lag ASC) tie-break are bit-deterministic;
    the reported peak is ONE double expression num/√(dx·dy) over
    correctly-rounded int→double casts (VARCHAR-bridged in SQL)."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")
    slim = roll.select_columns(["event_type", "bucket_start", "sum_value"])

    def v4_rows(b: pd.DataFrame) -> pd.DataFrame:
        v = _round_exact(b["sum_value"].to_numpy(dtype=np.float64))
        return pd.DataFrame({
            "h": (b["bucket_start"].to_numpy().astype("datetime64[s]")
                  .astype(np.int64) // 3600),
            "v4": np.rint(v * 10000.0).astype(np.int64)})

    totals = sharded_aggregate(
        slim.map_batches(v4_rows, batch_format="pandas"),
        "h", {"v4": "sum"}, num_shards=2).to_pandas()
    hs = totals["h"].to_numpy(np.int64)
    ys = totals["v4"].to_numpy(np.int64)
    m = int(hs.size)
    ty = int(ys.sum(dtype=object)) if m else 0
    ey = {int(h): m * int(y) - ty for h, y in zip(hs, ys)}
    dy = sum(e * e for e in ey.values())
    if dy <= 0:
        return pd.DataFrame({
            "source": pd.Series([], dtype=object),
            "lead_lag_hours": pd.Series([], dtype=np.int64),
            "n_pairs": pd.Series([], dtype=np.int64),
            "xcov_peak": pd.Series([], dtype=np.float64)})
    import ray

    ey_ref = ray.put((ey, dy))

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        ey, dy = ray.get(ey_ref)
        rows = []
        for src, _bs, xs, y4 in _hourly_int_units(shard):
            n = int(y4.size)
            tx = int(y4.sum(dtype=object))
            ex = [n * int(v) - tx for v in y4.tolist()]
            dx = sum(x * x for x in ex)
            if dx <= 0:
                continue  # constant source — oracle's WHERE dx > 0
            hsrc = xs.tolist()
            best = None  # (num, -lag) max ⇔ (num DESC, lag ASC)
            for k in range(-max_lag, max_lag + 1):
                num, cnt = 0, 0
                for h, e in zip(hsrc, ex):
                    w = ey.get(h + k)
                    if w is not None:
                        num += e * w
                        cnt += 1
                if cnt and (best is None or (num, -k) > (best[0], -best[1])):
                    best = (num, k, cnt)
            if best is None:
                continue
            num, k, cnt = best
            rows.append({
                "source": src, "lead_lag_hours": k, "n_pairs": cnt,
                "xcov_peak": float(num) / math.sqrt(float(dx) * float(dy)),
            })
        return pd.DataFrame(rows, columns=[
            "source", "lead_lag_hours", "n_pairs", "xcov_peak"])

    return sharded_map_groups(slim, "event_type", fold)


_LEAD_LAG_ORACLE = """
WITH r AS (
  SELECT event_type AS source,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS h,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS V
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT h, sum(CAST(V AS HUGEINT)) AS Y FROM r GROUP BY h
), my AS (
  SELECT count(*) AS m, sum(Y) AS ty FROM tot
), ey AS (
  SELECT tot.h, my.m * tot.Y - my.ty AS ey FROM tot, my
), dy AS (
  SELECT sum(ey * ey) AS dy FROM ey
), tx AS (
  SELECT source, count(*) AS n, sum(CAST(V AS HUGEINT)) AS t
  FROM r GROUP BY source
), ex AS (
  SELECT r.source, r.h, tx.n * CAST(r.V AS HUGEINT) - tx.t AS ex
  FROM r JOIN tx USING (source)
), dx AS (
  SELECT source, sum(ex * ex) AS dx FROM ex GROUP BY source
), lags AS (
  SELECT unnest(range(-24, 25)) AS lag
), nums AS (
  SELECT ex.source, lags.lag, sum(ex.ex * ey.ey) AS num,
         count(*) AS n_pairs
  FROM ex CROSS JOIN lags
  JOIN ey ON ey.h = ex.h + lags.lag
  GROUP BY 1, 2
)
SELECT nums.source, nums.lag AS lead_lag_hours, nums.n_pairs,
       CAST(CAST(nums.num AS VARCHAR) AS DOUBLE)
         / sqrt(CAST(CAST(dx.dx AS VARCHAR) AS DOUBLE)
                * CAST(CAST(dy.dy AS VARCHAR) AS DOUBLE)) AS xcov_peak
FROM nums JOIN dx USING (source), dy
WHERE dx.dx > 0 AND dy.dy > 0
QUALIFY row_number() OVER (
  PARTITION BY nums.source ORDER BY nums.num DESC, nums.lag ASC) = 1
"""


_WINNOW_ORACLE = r"""
WITH words AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(text, '[\w'']+'),
                        w -> lower(w)) AS ws
  FROM documents
), grams AS (
  SELECT doc_id, i AS pos,
         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
               || ' ' || ws[i+4] AS gram
  FROM words, UNNEST(generate_series(1, len(ws) - 4)) AS t(i)
), h AS (
  SELECT doc_id, pos,
         CAST(('0x' || substr(md5(gram), 1, 16)) AS UBIGINT) AS fp
  FROM grams
), wm AS (
  SELECT doc_id, pos,
         min(fp) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
         count(*) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
  FROM h
), sel AS (
  SELECT a.doc_id, max(b.pos) AS pos, a.wmin AS fp
  FROM wm a JOIN h b ON b.doc_id = a.doc_id
                    AND b.pos BETWEEN a.pos AND a.pos + 3
                    AND b.fp = a.wmin
  WHERE a.wn = 4
  GROUP BY a.doc_id, a.pos, a.wmin
)
SELECT DISTINCT doc_id, pos, fp FROM sel
"""


def user_overlap_between_types(sf_dir: str):
    """Pairwise AUDIENCE Jaccard between event types — which behaviors
    share users (funnel adjacency / cannibalization screen).  Same
    bounded-panel shape as ``vocab_jaccard_sources`` with users in
    place of words: per-batch local distinct (event_type, user_id)
    rows ride a user-keyed exchange that finishes the global distinct,
    each shard self-merges its users into unordered type-pair
    co-occurrence partials (Σ|types(u)|² per user is bounded by the
    panel width), and the driver folds only the tiny pair/count table.
    Jaccard = inter / (|A| + |B| − inter), ONE int/int divide; pairs
    with zero shared users are omitted on both sides."""
    from ..stages.shard import sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id"])

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop_duplicates()

    tagged = ds.map_batches(tag, batch_format="pandas")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.drop_duplicates(["event_type", "user_id"])
        cnt = shard.groupby("event_type", as_index=False).size().rename(
            columns={"size": "n", "event_type": "type_a"})
        cnt["type_b"] = ""  # sentinel: per-type audience partial
        m = shard.merge(shard, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        pairs = m.groupby(["event_type_x", "event_type_y"],
                          as_index=False).size().rename(
            columns={"event_type_x": "type_a", "event_type_y": "type_b",
                     "size": "n"})
        return pd.concat([pairs, cnt[["type_a", "type_b", "n"]]],
                         ignore_index=True)

    parts = sharded_map_groups(tagged, "user_id", fold).to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "type_a": pd.Series([], dtype=object),
            "type_b": pd.Series([], dtype=object),
            "shared_users": pd.Series([], dtype=np.int64),
            "users_a": pd.Series([], dtype=np.int64),
            "users_b": pd.Series([], dtype=np.int64),
            "jaccard": pd.Series([], dtype=np.float64)})
    counts = parts[parts["type_b"] == ""].groupby("type_a")["n"].sum()
    pairs = parts[parts["type_b"] != ""].groupby(
        ["type_a", "type_b"], as_index=False)["n"].sum()
    inter = pairs["n"].to_numpy(np.int64)
    ua = pairs["type_a"].map(counts).to_numpy(np.int64)
    ub = pairs["type_b"].map(counts).to_numpy(np.int64)
    return pd.DataFrame({
        "type_a": pairs["type_a"],
        "type_b": pairs["type_b"],
        "shared_users": inter,
        "users_a": ua,
        "users_b": ub,
        "jaccard": inter / (ua + ub - inter),
    })


_USER_OVERLAP_ORACLE = """
WITH d AS (
  SELECT DISTINCT event_type, user_id FROM events
), c AS (
  SELECT event_type, count(*) AS n FROM d GROUP BY 1
), p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS inter
  FROM d a JOIN d b ON b.user_id = a.user_id
  WHERE a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.inter AS shared_users,
       ca.n AS users_a, cb.n AS users_b,
       CAST(p.inter AS DOUBLE) / (ca.n + cb.n - p.inter) AS jaccard
FROM p JOIN c ca ON ca.event_type = p.type_a
JOIN c cb ON cb.event_type = p.type_b
"""


def record_highs(sf_dir: str):
    """Record-high census per source: how many hourly buckets set a new
    all-time volume high (strictly above every earlier bucket), plus
    when the standing record was set and its value — the growth /
    regime-change screen (a healthy growing source keeps printing
    records; a capped one stops).  All compares on exact 10⁻⁴-unit
    ints via ``_hourly_int_units``; the first bucket is a record by
    definition.  One source-keyed exchange over the hourly tier."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, bs, xs, y4 in _hourly_int_units(shard):
            rec = np.ones(y4.size, dtype=bool)
            if y4.size > 1:
                rec[1:] = y4[1:] > np.maximum.accumulate(y4)[:-1]
            idx = np.flatnonzero(rec)
            last = int(idx[-1])
            rows.append({
                "source": src, "n_records": int(idx.size),
                "record_ts": bs.iloc[last],
                "record_value": y4[last] / 10000.0})
        return pd.DataFrame(rows, columns=[
            "source", "n_records", "record_ts", "record_value"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_RECORD_HIGHS_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS h,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY 1, 2, 3
), w AS (
  SELECT source, bucket_start, y,
         CASE WHEN row_number() OVER win = 1
                   OR y > max(y) OVER (win ROWS BETWEEN UNBOUNDED
                                       PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS rec
  FROM r WINDOW win AS (PARTITION BY source ORDER BY h)
)
SELECT source, CAST(sum(rec) AS BIGINT) AS n_records,
       max(CASE WHEN rec = 1 THEN bucket_start END) AS record_ts,
       CAST(max(CASE WHEN rec = 1 THEN y END) AS DOUBLE) / 10000.0
         AS record_value
FROM w GROUP BY source
"""


def max_drawdown(sf_dir: str):
    """Maximum peak-to-trough decline of each source's hourly volume —
    the classic drawdown statistic (how far did the series fall from
    its running high before recovering?).  dd_t = cummax(y)_t − y_t on
    exact 10⁻⁴-unit ints; the reported trough is the EARLIEST bucket
    attaining the max drawdown (np.argmax first-max ≡ QUALIFY ORDER BY
    dd DESC, h ASC).  One source-keyed exchange over the hourly tier;
    single-bucket series report drawdown 0 at their only bucket."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, bs, xs, y4 in _hourly_int_units(shard):
            peak = np.maximum.accumulate(y4)
            dd = peak - y4
            best = int(np.argmax(dd))  # first max = earliest trough
            rows.append({
                "source": src, "drawdown": dd[best] / 10000.0,
                "trough_ts": bs.iloc[best],
                "peak_value": peak[best] / 10000.0,
                "trough_value": y4[best] / 10000.0})
        return pd.DataFrame(rows, columns=[
            "source", "drawdown", "trough_ts", "peak_value",
            "trough_value"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_MAX_DRAWDOWN_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS h,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY 1, 2, 3
), w AS (
  SELECT source, bucket_start, h, y,
         max(y) OVER (PARTITION BY source ORDER BY h
                      ROWS UNBOUNDED PRECEDING) AS peak
  FROM r
)
SELECT source, CAST(peak - y AS DOUBLE) / 10000.0 AS drawdown,
       bucket_start AS trough_ts,
       CAST(peak AS DOUBLE) / 10000.0 AS peak_value,
       CAST(y AS DOUBLE) / 10000.0 AS trough_value
FROM w
QUALIFY row_number() OVER (
  PARTITION BY source ORDER BY peak - y DESC, h ASC) = 1
"""


_EMB_DIM_VAR_ORACLE = """
WITH q AS (
  SELECT gs.i - 1 AS dim,
         CAST(floor(CAST(embedding[gs.i] AS DOUBLE) * 1000000)
              AS BIGINT) AS q
  FROM embeddings, LATERAL (
    SELECT unnest(generate_series(1, len(embedding))) AS i) gs
), m AS (
  SELECT dim, count(*) AS n,
         sum(CAST(q AS HUGEINT)) AS s1,
         sum(CAST(q AS HUGEINT) * q) AS s2
  FROM q GROUP BY 1
)
SELECT dim, CAST(n AS BIGINT) AS n,
       CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
         / CAST(CAST(n * CAST(1000000 AS HUGEINT) AS VARCHAR)
                AS DOUBLE) AS mean,
       CAST(CAST(n * s2 - s1 * s1 AS VARCHAR) AS DOUBLE)
         / CAST(CAST(n * n * CAST(1000000000000 AS HUGEINT) AS VARCHAR)
                AS DOUBLE) AS variance
FROM m
"""


def daily_peak_concentration(sf_dir: str):
    """Peak-hour concentration per (source, day): the share of the
    day's volume landing in its top-2 hours — the burst-vs-flat shape
    screen that sizes per-day partition skew (a share near 1 means the
    day is one spike; near 2/n_hours means flat load).  Top-2 selection
    on exact 10⁻⁴-unit ints with ties (y DESC, hour ASC) pinned on
    both engines; share is ONE int/int divide, NULL when the day's
    exact total is 0 (the int compare makes the guard bit-identical —
    numpy x/0 and SQL diverge otherwise).  One source-keyed exchange
    over the hourly tier."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        out = []
        for src, bs, xs, y4 in _hourly_int_units(shard):
            day = (xs // 24) * 86400
            df = pd.DataFrame({"day": day, "h": xs, "y": y4})
            df = df.sort_values(["day", "y", "h"],
                                ascending=[True, False, True],
                                kind="stable")
            df["rk"] = df.groupby("day").cumcount()
            g = df.groupby("day").agg(
                n_hours=("y", "size"), total=("y", "sum"))
            top2 = df[df["rk"] < 2].groupby("day")["y"].sum()
            g["top2"] = top2
            tot = g["total"].to_numpy(np.int64)
            t2 = g["top2"].to_numpy(np.int64)
            with np.errstate(divide="ignore", invalid="ignore"):
                share = np.where(tot == 0, np.nan, t2 / tot)
            out.append(pd.DataFrame({
                "source": src,
                "day": pd.to_datetime(g.index.to_numpy(np.int64),
                                      unit="s"),
                "n_hours": g["n_hours"].to_numpy(np.int64),
                "total_value": tot / 10000.0,
                "top2_value": t2 / 10000.0,
                "peak_share": share}))
        if not out:
            return pd.DataFrame({
                "source": pd.Series([], dtype=object),
                "day": pd.Series([], dtype="datetime64[ns]"),
                "n_hours": pd.Series([], dtype=np.int64),
                "total_value": pd.Series([], dtype=np.float64),
                "top2_value": pd.Series([], dtype=np.float64),
                "peak_share": pd.Series([], dtype=np.float64)})
        return pd.concat(out, ignore_index=True)

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_PEAK_CONC_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS h,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY 1, 2, 3
), w AS (
  SELECT source, to_timestamp((h // 24) * 86400) AT TIME ZONE 'UTC'
           AS day, h, y,
         row_number() OVER (PARTITION BY source, h // 24
                            ORDER BY y DESC, h ASC) AS rk
  FROM r
)
SELECT source, day, count(*) AS n_hours,
       CAST(sum(y) AS DOUBLE) / 10000.0 AS total_value,
       CAST(sum(CASE WHEN rk <= 2 THEN y ELSE 0 END) AS DOUBLE)
         / 10000.0 AS top2_value,
       CASE WHEN sum(y) = 0 THEN NULL
            ELSE CAST(sum(CASE WHEN rk <= 2 THEN y ELSE 0 END)
                      AS DOUBLE) / CAST(sum(y) AS BIGINT) END
         AS peak_share
FROM w GROUP BY 1, 2
"""


def rollup_7d(sf_dir: str):
    """Weekly tier extending the 1m→1h→1d cascade one level: 7-day
    epoch-aligned buckets re-aggregated from the memoized 1d tier (sum
    of sums — the raw stream is never re-read).  Epoch-floor weeks, not
    calendar ISO weeks, so the bucket rule is pure integer arithmetic
    on both engines."""
    ds = cascade(_events_rollup(sf_dir, "1d"), "event_type", 604800)
    return _finalize_rollup(ds)


_ROLLUP_7D_ORACLE = """
SELECT event_type AS source,
       to_timestamp((CAST(epoch(ts) AS BIGINT) // 604800) * 604800)
         AT TIME ZONE 'UTC' AS bucket_start,
       round(sum(value), 4) AS sum_value,
       count(*) AS n_points,
       min(value) AS min_value,
       max(value) AS max_value,
       round(sum(value), 4) / count(*) AS mean_value
FROM events
GROUP BY 1, 2
"""


def session_bounce_rate(sf_dir: str, gap_minutes: int = 30):
    """Bounce-rate series: per day (of session start), how many user
    sessions contained exactly ONE event — the engagement-quality twin
    of ``session_windows`` (same >30 min idle rule).  The user-keyed
    exchange sessionizes each shard vectorized (one cumsum across all
    its users) and reduces straight to per-day integer partials —
    session rows never leave the shard; a tiny day fold finishes and
    the rate is ONE int/int divide.
    NOTE: the paired oracle SQL hardcodes gap=30min."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def day_partials(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        user_change = g["user_id"].ne(g["user_id"].shift())
        new_session = user_change | (g["ts"].diff() > gap)
        sid = new_session.cumsum()
        s = g.groupby(sid)["ts"].agg(["min", "size"])
        day = s["min"].dt.floor("D")
        out = pd.DataFrame({
            "day": day.to_numpy(),
            "n_sessions": np.ones(len(s), dtype=np.int64),
            "n_bounces": (s["size"].to_numpy(np.int64) == 1)
            .astype(np.int64)})
        return out.groupby("day", as_index=False).sum()

    parts = sharded_map_groups(ds, "user_id", day_partials)
    agg = sharded_aggregate(parts, "day",
                            {"n_sessions": "sum", "n_bounces": "sum"},
                            num_shards=2)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        ns = b["n_sessions"].to_numpy(np.int64)
        nb = b["n_bounces"].to_numpy(np.int64)
        return pd.DataFrame({
            "day": b["day"], "n_sessions": ns, "n_bounces": nb,
            "bounce_rate": nb / ns})

    return agg.map_batches(fin, batch_format="pandas")


_BOUNCE_ORACLE = """
WITH w AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM events
), s AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM w
), g AS (
  SELECT user_id, sid, date_trunc('day', min(ts)) AS day,
         count(*) AS n_events
  FROM s GROUP BY 1, 2
)
SELECT day, count(*) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS bounce_rate
FROM g GROUP BY 1
"""


_WINNOW_PAIRS_ORACLE = f"""
WITH fp_tab AS ({_WINNOW_ORACLE}),
f AS (SELECT DISTINCT doc_id, fp FROM fp_tab),
ok AS (SELECT fp FROM f GROUP BY fp HAVING count(*) <= 64),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
  JOIN ok ON ok.fp = a.fp
)
SELECT doc_a, doc_b, count(*) AS n_shared
FROM p GROUP BY 1, 2 HAVING count(*) >= 2
"""


def ks_distance_vs_fleet(sf_dir: str):
    """Two-sample Kolmogorov–Smirnov distance between each source's
    hourly-volume distribution and the POOLED fleet distribution — the
    distribution-drift screen behind 'does this feed look like the
    fleet?'.  Exactness: with y in 10⁻⁴-unit ints, the statistic is
    max over pooled distinct values of |cS·N − cF·nS| / (nS·N); the
    numerator is an exact int64 max (counts are hourly-bucket counts,
    products ≤ buckets²) and the divide is ONE IEEE op, so engine and
    SQL agree bit-for-bit.  The sup of the CDF gap is attained at a
    pooled data point, so evaluating at the pooled distinct values is
    the exact statistic, not a grid approximation.  Scale shape: the
    pooled value histogram is O(distinct hourly values) at ANY corpus
    scale — ONE bounded driver collect + ray.put broadcast (the
    lead_lag_vs_reference pattern); per-source work rides the
    source-keyed exchange with one searchsorted against the broadcast
    grid."""
    import ray

    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h").select_columns(
        ["event_type", "sum_value"])

    def val_partials(b: pd.DataFrame) -> pd.DataFrame:
        v = _round_exact(b["sum_value"].to_numpy(dtype=np.float64))
        y4 = np.rint(v * 10000.0).astype(np.int64)
        g = pd.DataFrame({"y": y4}).groupby("y", as_index=False).size()
        return pd.DataFrame({"y": g["y"],
                             "c": g["size"].astype(np.int64)})

    hist = roll.map_batches(val_partials, batch_format="pandas").to_pandas()
    hist = hist.groupby("y", as_index=False)["c"].sum().sort_values("y")
    vals = hist["y"].to_numpy(np.int64)
    cum_f = np.cumsum(hist["c"].to_numpy(np.int64))
    n_total = int(cum_f[-1]) if cum_f.size else 0
    grid_ref = ray.put((vals, cum_f))

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        gvals, gcum = ray.get(grid_ref)
        rows = []
        for src, bs, xs, y4 in _hourly_int_units(shard):
            own = np.sort(y4)
            c_s = np.searchsorted(own, gvals, side="right").astype(np.int64)
            num = int(np.max(np.abs(c_s * n_total - gcum * own.size)))
            rows.append({
                "source": src, "n_buckets": int(own.size),
                "ks_stat": float(num) / float(own.size * n_total)})
        return pd.DataFrame(rows,
                            columns=["source", "n_buckets", "ks_stat"])

    return sharded_map_groups(
        _events_rollup(sf_dir, "1h").select_columns(
            ["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_KS_FLEET_ORACLE = """
WITH r AS (
  SELECT event_type AS source,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), tot AS (SELECT count(*) AS N FROM r),
ns AS (SELECT source, count(*) AS nS FROM r GROUP BY 1),
cnt AS (SELECT y, count(*) AS c FROM r GROUP BY 1),
cf AS (SELECT y, sum(c) OVER (ORDER BY y) AS cF FROM cnt),
scnt AS (SELECT source, y, count(*) AS c FROM r GROUP BY 1, 2),
sv AS (
  SELECT s.source, v.y, coalesce(sc.c, 0) AS c
  FROM (SELECT DISTINCT source FROM r) s
  CROSS JOIN (SELECT y FROM cnt) v
  LEFT JOIN scnt sc ON sc.source = s.source AND sc.y = v.y
), cs AS (
  SELECT source, y,
         sum(c) OVER (PARTITION BY source ORDER BY y) AS cS
  FROM sv
)
SELECT ns.source, CAST(ns.nS AS BIGINT) AS n_buckets,
       CAST(max(abs(CAST(cs.cS AS BIGINT) * tot.N
                    - CAST(cf.cF AS BIGINT) * ns.nS)) AS DOUBLE)
         / CAST(ns.nS * tot.N AS BIGINT) AS ks_stat
FROM cs JOIN cf USING (y) JOIN ns ON ns.source = cs.source
CROSS JOIN tot
GROUP BY 1, 2, ns.nS, tot.N
"""


_COOCCURRENCE_ORACLE = """
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
SELECT bucket_start, count(*) AS n_flagged,
       string_agg(source, ',' ORDER BY source) AS sources
FROM f GROUP BY 1 HAVING count(*) >= 2
"""


_BOTTOMK_JACCARD_ORACLE = r"""
WITH words AS (
  SELECT DISTINCT source,
         unnest(list_transform(regexp_extract_all(text, '[\w'']+'),
                               w -> lower(w))) AS w
  FROM documents
), h AS (
  SELECT DISTINCT source,
         CAST(('0x' || substr(md5(w), 1, 16)) AS UBIGINT) AS hv
  FROM words
), rk AS (
  SELECT source, hv,
         row_number() OVER (PARTITION BY source ORDER BY hv) AS r
  FROM h
), sk AS (SELECT source, hv FROM rk WHERE r <= 256),
pv AS (
  SELECT a.source AS sa, b.source AS sb, s.hv
  FROM (SELECT DISTINCT source FROM sk) a
  JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source
  JOIN sk s ON s.source = a.source OR s.source = b.source
  GROUP BY 1, 2, 3
), ur AS (
  SELECT sa, sb, hv,
         row_number() OVER (PARTITION BY sa, sb ORDER BY hv) AS r
  FROM pv
), uk AS (SELECT sa, sb, hv FROM ur WHERE r <= 256)
SELECT uk.sa AS source_a, uk.sb AS source_b,
       CAST(sum(CASE WHEN ia.hv IS NOT NULL AND ib.hv IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS inter_bottomk,
       CAST(count(*) AS BIGINT) AS union_bottomk,
       CAST(sum(CASE WHEN ia.hv IS NOT NULL AND ib.hv IS NOT NULL
                     THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS jaccard_est
FROM uk
LEFT JOIN sk ia ON ia.source = uk.sa AND ia.hv = uk.hv
LEFT JOIN sk ib ON ib.source = uk.sb AND ib.hv = uk.hv
GROUP BY 1, 2
"""


def lttb_downsample(sf_dir: str, m: int = 60):
    """Largest-Triangle-Three-Buckets downsample (Steinarsson 2013) of
    each source's hourly series to ``m`` points — the standard
    shape-preserving downsample behind every monitoring UI (keeps
    spikes a stride/average downsample flattens).  Exactness: with
    x = epoch-hours (int) and y in 10⁻⁴ units (int), the triangle-area
    comparison multiplies through by the next-bucket size so every
    candidate score is an EXACT int64 — |(x₀·mₙ − Σx)(y − y₀) −
    (x₀ − x)(Σy − y₀·mₙ)| — and argmax ties break to the smallest
    index on both sides; bucket boundaries are pure floor arithmetic
    (1 + ⌊k(n−2)/(m−2)⌋).  Series with n ≤ m pass through whole.
    Scale shape: one source-keyed exchange over the hourly tier;
    per-source series are bounded (buckets, not raw points), and the
    sequential selection is O(n) per source."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h").select_columns(
        ["event_type", "bucket_start", "sum_value"])
    m = int(m)

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        out = []
        for src, bs, xs, y4 in _hourly_int_units(shard):
            n = xs.size
            if n <= m:
                idx = np.arange(n, dtype=np.int64)
            else:
                K = m - 2
                bounds = 1 + (np.arange(K + 1, dtype=np.int64)
                              * (n - 2)) // K
                sel = [0]
                x0, y0 = int(xs[0]), int(y4[0])
                for k in range(K):
                    lo, hi = int(bounds[k]), int(bounds[k + 1])
                    if k < K - 1:
                        nlo, nhi = int(bounds[k + 1]), int(bounds[k + 2])
                        mn = nhi - nlo
                        sx = int(xs[nlo:nhi].sum())
                        sy = int(y4[nlo:nhi].sum())
                    else:
                        mn, sx, sy = 1, int(xs[n - 1]), int(y4[n - 1])
                    area = np.abs((x0 * mn - sx) * (y4[lo:hi] - y0)
                                  - (x0 - xs[lo:hi]) * (sy - y0 * mn))
                    j = lo + int(np.argmax(area))  # first max = lowest idx
                    sel.append(j)
                    x0, y0 = int(xs[j]), int(y4[j])
                sel.append(n - 1)
                idx = np.asarray(sel, dtype=np.int64)
            out.append(pd.DataFrame({
                "source": np.full(idx.size, src, dtype=object),
                "bucket_start": bs.to_numpy()[idx],
                "value": y4[idx] / 10000.0}))
        if not out:
            return pd.DataFrame({
                "source": pd.Series([], dtype=object),
                "bucket_start": pd.Series([], dtype="datetime64[us]"),
                "value": pd.Series([], dtype=np.float64)})
        return pd.concat(out, ignore_index=True)

    return sharded_map_groups(roll, "event_type", fold)


_LTTB_ORACLE = """
WITH RECURSIVE r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bs,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), p AS (
  SELECT source, bs, y,
         CAST(epoch(bs) AS BIGINT) // 3600 AS x,
         row_number() OVER (PARTITION BY source ORDER BY bs) - 1 AS idx,
         count(*) OVER (PARTITION BY source) AS n
  FROM r
), kb AS (
  SELECT b.source, b.n, t.k,
         1 + (t.k * (b.n - 2)) // 58 AS lo,
         1 + ((t.k + 1) * (b.n - 2)) // 58 AS hi
  FROM (SELECT DISTINCT source, n FROM p WHERE n > 60) b,
       UNNEST(generate_series(0, 57)) AS t(k)
), agg AS (
  SELECT kb.source, kb.k, count(*) AS mn, sum(c.x) AS sx, sum(c.y) AS sy
  FROM kb JOIN p c ON c.source = kb.source
                  AND c.idx >= kb.lo AND c.idx < kb.hi
  GROUP BY 1, 2
), lastp AS (
  SELECT source, x, y FROM p WHERE idx = n - 1
), nxt AS (
  SELECT kb.source, kb.k,
         coalesce(a.mn, 1) AS mn,
         coalesce(a.sx, lp.x) AS sx, coalesce(a.sy, lp.y) AS sy
  FROM kb
  LEFT JOIN agg a ON a.source = kb.source AND a.k = kb.k + 1
  JOIN lastp lp ON lp.source = kb.source
), sel AS (
  SELECT source, CAST(-1 AS BIGINT) AS k, x AS x0, y AS y0, bs
  FROM p WHERE idx = 0 AND n > 60
  UNION ALL
  SELECT source, k, x, y, bs FROM (
    SELECT s.source, s.k + 1 AS k, c.x, c.y, c.bs,
           row_number() OVER (
             PARTITION BY s.source
             ORDER BY abs((s.x0 * nx.mn - nx.sx) * (c.y - s.y0)
                        - (s.x0 - c.x) * (nx.sy - s.y0 * nx.mn)) DESC,
                      c.idx ASC) AS rn
    FROM sel s
    JOIN kb ON kb.source = s.source AND kb.k = s.k + 1
    JOIN nxt nx ON nx.source = s.source AND nx.k = s.k + 1
    JOIN p c ON c.source = s.source AND c.idx >= kb.lo AND c.idx < kb.hi
  ) WHERE rn = 1
)
SELECT source, bs AS bucket_start, CAST(y0 AS DOUBLE) / 10000.0 AS value
FROM sel
UNION ALL
SELECT source, bs, CAST(y AS DOUBLE) / 10000.0
FROM p WHERE idx = n - 1 AND n > 60
UNION ALL
SELECT source, bs, CAST(y AS DOUBLE) / 10000.0 FROM p WHERE n <= 60
"""


_DUP_CLUSTER_SIZES_ORACLE = """
WITH c AS (SELECT count(*) AS n FROM documents GROUP BY text)
SELECT CAST(n AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters
FROM c GROUP BY 1
"""


def rfm_segments(sf_dir: str):
    """RFM (recency / frequency / monetary) user segmentation — the
    classic behavioral cut, emitted as the 27-cell segment census with
    FIXED bucket edges (data-independent, so both engines bucket
    identically; quantile-edged RFM is order-fragile by construction).
    Recency is whole days between the user's last event and the
    corpus max timestamp (integer epoch-day arithmetic); frequency is
    the event count; monetary is the user's exact round(sum,4) in
    10⁻⁴ integer units (the ``_round_exact`` contract, computed inside
    the user-keyed exchange where all the user's rows co-locate).
    Scale shape: one broadcast max-ts (map-only partial → ray.put) +
    one user-keyed exchange emitting per-shard 27-cell partials; the
    driver folds shards × 27 rows."""
    import ray

    from ..stages.shard import sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "value"])

    def max_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"mx": [b["ts"].max()]})

    mx = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts"]
    ).map_batches(max_partial, batch_format="pandas").to_pandas()["mx"].max()
    max_day = int(np.datetime64(mx, "s").astype(np.int64) // 86400)
    max_ref = ray.put(max_day)

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        gmax = ray.get(max_ref)
        day = (shard["ts"].to_numpy().astype("datetime64[s]")
               .astype(np.int64) // 86400)
        g = shard.assign(day=day).groupby("user_id", sort=False)
        last_day = g["day"].max()
        freq = g["value"].size()
        sums = g["value"].sum().to_numpy(np.float64)
        m4 = np.rint(_round_exact(sums) * 10000.0).astype(np.int64)
        rec = gmax - last_day.to_numpy(np.int64)
        r_b = np.where(rec <= 0, 0, np.where(rec <= 1, 1, 2))
        f_b = np.where(freq.to_numpy(np.int64) <= 60, 0,
                       np.where(freq.to_numpy(np.int64) <= 75, 1, 2))
        m_b = np.where(m4 <= 30_000_000, 0,
                       np.where(m4 <= 40_000_000, 1, 2))
        h = pd.DataFrame({"r_bucket": r_b, "f_bucket": f_b,
                          "m_bucket": m_b}).groupby(
            ["r_bucket", "f_bucket", "m_bucket"], as_index=False).size()
        return pd.DataFrame({
            "r_bucket": h["r_bucket"].astype(np.int64),
            "f_bucket": h["f_bucket"].astype(np.int64),
            "m_bucket": h["m_bucket"].astype(np.int64),
            "n_users": h["size"].astype(np.int64)})

    parts = sharded_map_groups(ds, "user_id", fold).to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "r_bucket": pd.Series([], dtype=np.int64),
            "f_bucket": pd.Series([], dtype=np.int64),
            "m_bucket": pd.Series([], dtype=np.int64),
            "n_users": pd.Series([], dtype=np.int64)})
    return parts.groupby(["r_bucket", "f_bucket", "m_bucket"],
                         as_index=False)["n_users"].sum()


_RFM_ORACLE = """
WITH mx AS (
  SELECT CAST(epoch(max(ts)) AS BIGINT) // 86400 AS gmax FROM events
), u AS (
  SELECT user_id,
         max(CAST(epoch(ts) AS BIGINT) // 86400) AS last_day,
         count(*) AS freq,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS m4
  FROM events GROUP BY 1
), b AS (
  SELECT CASE WHEN mx.gmax - u.last_day <= 0 THEN 0
              WHEN mx.gmax - u.last_day <= 1 THEN 1 ELSE 2 END AS r_bucket,
         CASE WHEN u.freq <= 60 THEN 0
              WHEN u.freq <= 75 THEN 1 ELSE 2 END AS f_bucket,
         CASE WHEN u.m4 <= 30000000 THEN 0
              WHEN u.m4 <= 40000000 THEN 1 ELSE 2 END AS m_bucket
  FROM u CROSS JOIN mx
)
SELECT CAST(r_bucket AS BIGINT) AS r_bucket,
       CAST(f_bucket AS BIGINT) AS f_bucket,
       CAST(m_bucket AS BIGINT) AS m_bucket,
       CAST(count(*) AS BIGINT) AS n_users
FROM b GROUP BY 1, 2, 3
"""


def holt_winters_additive(sf_dir: str, period: int = 24):
    """Holt-Winters ADDITIVE triple-exponential smoothing (level +
    trend + 24-hour seasonal) of the hourly sums per source — the
    seasonal forecasting primitive one step past ``holt_linear_hourly``.
    Classic two-period init: ℓ₀ = mean of the first period, b₀ =
    (mean₂ − mean₁)/m, sᵢ = yᵢ − ℓ₀ — computed from EXACT 10⁻⁴-unit
    integer sums so the two init divides are single correctly-rounded
    FP ops; then every step is the identical FP expression in both
    engines (α=0.5, β=γ=0.25, all exactly-representable doubles):
    ℓ_t = α(y_t − s_{t−m}) + (1−α)(ℓ+b); b_t = β(ℓ_t−ℓ) + (1−β)b;
    s_t = γ(y_t − ℓ_t) + (1−γ)s_{t−m}.  The oracle replays the
    recursion in a recursive CTE whose working row carries the rolling
    m-slot seasonal state as a LIST column.  Sources shorter than 2m
    are omitted (init needs two full periods) — both sides.
    Sequential per series, parallel across series via the source-keyed
    exchange."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h").select_columns(
        ["event_type", "bucket_start", "sum_value"])
    m = int(period)

    def smooth(shard: pd.DataFrame) -> pd.DataFrame:
        out = []
        for src, bs, xs, y4 in _hourly_int_units(shard):
            n = y4.size
            if n < 2 * m:
                continue
            s1 = int(y4[:m].sum())
            s2 = int(y4[m:2 * m].sum())
            lev = float(s1) / float(m * 10000)
            tr = float(s2 - s1) / float(m * m * 10000)
            seas = [y4[i] / 10000.0 - lev for i in range(m)]
            o_lev = np.empty(n - m)
            o_tr = np.empty(n - m)
            o_se = np.empty(n - m)
            o_v = np.empty(n - m)
            for t in range(m, n):
                v = y4[t] / 10000.0
                s_old = seas[0]
                l_new = 0.5 * (v - s_old) + 0.5 * (lev + tr)
                tr = 0.25 * (l_new - lev) + 0.75 * tr
                s_new = 0.25 * (v - l_new) + 0.75 * s_old
                lev = l_new
                seas = seas[1:] + [s_new]
                i = t - m
                o_v[i], o_lev[i], o_tr[i], o_se[i] = v, lev, tr, s_new
            out.append(pd.DataFrame({
                "source": src,
                "bucket_start": bs.to_numpy()[m:],
                "value": o_v, "level": o_lev, "trend": o_tr,
                "seasonal": o_se}))
        if not out:
            return pd.DataFrame({
                "source": pd.Series([], dtype=object),
                "bucket_start": pd.Series([], dtype="datetime64[us]"),
                "value": pd.Series([], dtype=np.float64),
                "level": pd.Series([], dtype=np.float64),
                "trend": pd.Series([], dtype=np.float64),
                "seasonal": pd.Series([], dtype=np.float64)})
        return pd.concat(out, ignore_index=True)

    return sharded_map_groups(roll, "event_type", smooth)


_HOLT_WINTERS_ORACLE = """
WITH RECURSIVE r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS v4,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY date_trunc('hour', ts)) AS idx,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events GROUP BY 1, 2
), init AS (
  SELECT source,
         CAST(sum(CASE WHEN idx <= 24 THEN v4 ELSE 0 END) AS DOUBLE)
           / 240000.0 AS l0,
         CAST(sum(CASE WHEN idx > 24 THEN v4 ELSE 0 END)
              - sum(CASE WHEN idx <= 24 THEN v4 ELSE 0 END) AS DOUBLE)
           / 5760000.0 AS b0
  FROM r WHERE idx <= 48 AND n >= 48 GROUP BY source
), seas0 AS (
  SELECT r.source,
         list(r.v4 / 10000.0 - init.l0 ORDER BY r.idx) AS seas
  FROM r JOIN init USING (source) WHERE r.idx <= 24
  GROUP BY r.source
), e AS (
  SELECT init.source, CAST(24 AS BIGINT) AS idx,
         CAST(NULL AS TIMESTAMP) AS bucket_start,
         CAST(0 AS DOUBLE) AS v,
         init.l0 AS level, init.b0 AS trend,
         CAST(0 AS DOUBLE) AS s_out, seas0.seas AS seas
  FROM init JOIN seas0 USING (source)
  UNION ALL
  SELECT e.source, r.idx, r.bucket_start,
         r.v4 / 10000.0 AS v,
         0.5 * (r.v4 / 10000.0 - e.seas[1]) + 0.5 * (e.level + e.trend)
           AS level,
         0.25 * ((0.5 * (r.v4 / 10000.0 - e.seas[1])
                  + 0.5 * (e.level + e.trend)) - e.level)
           + 0.75 * e.trend AS trend,
         0.25 * (r.v4 / 10000.0
                 - (0.5 * (r.v4 / 10000.0 - e.seas[1])
                    + 0.5 * (e.level + e.trend)))
           + 0.75 * e.seas[1] AS s_out,
         e.seas[2:24]
           || [0.25 * (r.v4 / 10000.0
                       - (0.5 * (r.v4 / 10000.0 - e.seas[1])
                          + 0.5 * (e.level + e.trend)))
               + 0.75 * e.seas[1]] AS seas
  FROM e JOIN r ON r.source = e.source AND r.idx = e.idx + 1
)
SELECT source, bucket_start, v AS value, level, trend,
       s_out AS seasonal
FROM e WHERE idx > 24
"""


_CENTROID_CONFUSION_ORACLE = """
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS qv
  FROM embeddings
), c AS (
  SELECT vec_id AS cid, dim, qv FROM q
  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
), d AS (
  SELECT q.vec_id, c.cid,
         sum((q.qv - c.qv) * (q.qv - c.qv)) AS dist_i
  FROM q JOIN c USING (dim) GROUP BY 1, 2
), a AS (
  SELECT vec_id, cid, row_number() OVER (
      PARTITION BY vec_id ORDER BY dist_i, cid) AS rn
  FROM d
)
SELECT CAST(e.label AS BIGINT) AS label, a.cid AS centroid_id,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM a JOIN embeddings e USING (vec_id)
WHERE a.rn = 1 GROUP BY 1, 2
"""


_DOCS_LENGTH_AUDIT_ORACLE = """
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN length(coalesce(text, '')) <> n_chars
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch
FROM documents GROUP BY 1
"""


_TRAINING_SHARD_ORACLE = """
SELECT CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
            AS UBIGINT) % 64 AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars_total
FROM documents GROUP BY 1
"""


_DIM_COVARIANCE_ORACLE = """
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS qv
  FROM embeddings
), nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings),
s AS (SELECT dim, CAST(sum(qv) AS HUGEINT) AS sq FROM q GROUP BY 1),
p AS (
  SELECT a.dim AS dim_a, b.dim AS dim_b,
         CAST(sum(a.qv * b.qv) AS HUGEINT) AS sqq
  FROM q a JOIN q b ON b.vec_id = a.vec_id AND a.dim < b.dim
  GROUP BY 1, 2
), c AS (
  SELECT p.dim_a, p.dim_b,
         nn.n * p.sqq - sa.sq * sb.sq AS num
  FROM p JOIN s sa ON sa.dim = p.dim_a JOIN s sb ON sb.dim = p.dim_b
  CROSS JOIN nn
)
SELECT CAST(dim_a AS BIGINT) AS dim_a, CAST(dim_b AS BIGINT) AS dim_b,
       CAST(CAST(num AS VARCHAR) AS DOUBLE)
         / CAST(CAST(nn.n * nn.n * 1000000000000 AS VARCHAR) AS DOUBLE)
         AS cov
FROM c CROSS JOIN nn
QUALIFY row_number() OVER (ORDER BY abs(num) DESC, dim_a, dim_b) <= 20
"""


_LENGTH_BUCKET_MIX_ORACLE = """
WITH b AS (
  SELECT source,
         CAST(floor(log2(greatest(n_chars, 1))) AS BIGINT) AS bucket
  FROM documents
), c AS (
  SELECT source, bucket, count(*) AS n_docs FROM b GROUP BY 1, 2
), t AS (
  SELECT source, sum(n_docs) AS tot FROM c GROUP BY 1
)
SELECT c.source, c.bucket, CAST(c.n_docs AS BIGINT) AS n_docs,
       CAST(c.n_docs AS DOUBLE) / t.tot AS share
FROM c JOIN t USING (source)
"""


def classic_residual_flags_1h(sf_dir: str):
    """Decomposition-residual IQR flags — the reference's
    ``decompose_and_detect`` additive shape (catch.py:628-647) with an
    EXACT oracle end to end: residuals come from the bit-exact integer
    classic decomposition (``classic_decompose_1h``), and the IQR fence
    uses the bit-pinned two-product ``quantile_cont`` with the
    identical comparison expression both sides — so unlike the
    rows-only LOESS/STL flag paths, THIS decomposition detector
    hash-matches DuckDB.  Same one-source-keyed-exchange shape."""
    from ..functions.stats import quantile_cont
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
            trend_sum = win.sum(axis=1)
            mid = slice(12, n - 12)
            D = 25 * V[mid] - trend_sum
            slot = pd.DatetimeIndex(
                g["bucket_start"].to_numpy()[mid]).hour.to_numpy()
            agg = pd.DataFrame({"slot": slot, "D": D}).groupby(
                "slot")["D"].agg(["sum", "size"])
            s2 = agg["sum"].reindex(slot).to_numpy()
            n2 = agg["size"].reindex(slot).to_numpy().astype(np.int64)
            res = (n2 * D - s2).astype(np.float64) / (n2 * 250000.0)
            q1 = quantile_cont(res, 0.25)
            q3 = quantile_cont(res, 0.75)
            m = (res < q1 - 1.5 * (q3 - q1)) | (res > q3 + 1.5 * (q3 - q1))
            if not m.any():
                continue
            out.append(pd.DataFrame({
                "source": src,
                "bucket_start": g["bucket_start"].to_numpy()[mid][m],
                "value": v[mid][m],
                "residual": res[m]}))
        if not out:
            return pd.DataFrame({
                "source": pd.Series([], dtype=object),
                "bucket_start": pd.Series([], dtype="datetime64[us]"),
                "value": pd.Series([], dtype=np.float64),
                "residual": pd.Series([], dtype=np.float64)})
        return pd.concat(out, ignore_index=True)

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_CLASSIC_RESIDUAL_FLAGS_ORACLE = """
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
  SELECT source, bucket_start, V,
         25 * V - trend_sum AS D, hour(bucket_start) AS slot
  FROM w WHERE wn = 25
), s AS (
  SELECT source, slot, sum(D) AS s2, count(*) AS n2
  FROM d GROUP BY 1, 2
), res AS (
  SELECT d.source, d.bucket_start,
         CAST(d.V AS DOUBLE) / 10000.0 AS value,
         CAST(s.n2 * d.D - s.s2 AS DOUBLE) / (s.n2 * 250000.0) AS residual
  FROM d JOIN s ON s.source = d.source AND s.slot = d.slot
), q AS (
  SELECT source, quantile_cont(residual, 0.25) AS q1,
         quantile_cont(residual, 0.75) AS q3
  FROM res GROUP BY 1
)
SELECT res.source, res.bucket_start, res.value, res.residual
FROM res JOIN q USING (source)
WHERE res.residual < q.q1 - 1.5 * (q.q3 - q.q1)
   OR res.residual > q.q3 + 1.5 * (q.q3 - q.q1)
"""


def trend_crossing_eta(sf_dir: str):
    """Capacity-planning ETA: hours until each source's OLS volume
    trend line crosses 2× its historical mean, extrapolated from the
    last observed hour — 'when does this feed double?'.  EXACT by the
    cross-multiplied-rational trick (the ols_trend/lead_lag family):
    with x = epoch-hours and y in 10⁻⁴ units, eta =
    (2Σy·D − n·(num_a + num_b·x_last)) / (n·num_b) where
    num_a = ΣyΣxx − ΣxΣxy, num_b = nΣxy − ΣxΣy, D = nΣxx − (Σx)² —
    numerator and denominator are exact Python bigints (HUGEINT in the
    oracle) and the emit is ONE VARCHAR-bridged divide.  NULL when the
    trend is flat or falling (num_b ≤ 0) — both sides; negative eta
    means the threshold is already crossed.  One source-keyed exchange
    over the hourly tier."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, bs, xs, y4 in _hourly_int_units(shard):
            x = [int(v) for v in xs]
            y = [int(v) for v in y4]
            n = len(y)
            sx, sy = sum(x), sum(y)
            sxy = sum(a * b for a, b in zip(x, y))
            sxx = sum(a * a for a in x)
            num_b = n * sxy - sx * sy
            dd = n * sxx - sx * sx
            eta = np.nan
            if num_b > 0 and dd > 0:
                num_a = sy * sxx - sx * sxy
                num = 2 * sy * dd - n * (num_a + num_b * x[-1])
                eta = float(num) / float(n * num_b)
            rows.append({"source": src, "n_buckets": n,
                         "eta_hours": eta})
        return pd.DataFrame(rows, columns=[
            "source", "n_buckets", "eta_hours"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_TREND_ETA_ORACLE = """
WITH r AS (
  SELECT event_type AS source,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS x,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), s AS (
  SELECT source, count(*) AS n, max(x) AS xl,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx
  FROM r GROUP BY source
), c AS (
  SELECT source, n,
         n * sxy - sx * sy AS num_b,
         n * sxx - sx * sx AS dd,
         sy * sxx - sx * sxy AS num_a,
         sy, xl
  FROM s
)
SELECT source, n AS n_buckets,
       CASE WHEN num_b > 0 AND dd > 0 THEN
         CAST(CAST(2 * sy * dd - n * (num_a + num_b * xl)
                   AS VARCHAR) AS DOUBLE)
           / CAST(CAST(n * num_b AS VARCHAR) AS DOUBLE)
       ELSE NULL END AS eta_hours
FROM c
"""


def hour_of_week_profile(sf_dir: str):
    """168-cell hour-of-week activity heatmap per source (epoch-aligned
    weeks: cell = epoch-hours mod 168 — pure integer arithmetic on
    both engines, no calendar/dow-convention trap) with each cell's
    share of the source's events — the weekly-shape fingerprint behind
    seasonality-aware alert thresholds.  Map-only integer partials
    bounded at 168 × sources per batch + one tiny exchange; share is
    ONE int/int divide."""
    from ..stages.shard import sharded_map_groups

    ds = _rd().read_parquet(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_type", "ts"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        how = (batch["ts"].to_numpy().astype("datetime64[s]")
               .astype(np.int64) // 3600) % 168
        g = pd.DataFrame({"source": batch["event_type"], "how": how,
                          "n_events": 1}).groupby(
            ["source", "how"], as_index=False).sum()
        g["n_events"] = g["n_events"].astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pandas")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.groupby(["source", "how"], as_index=False)[
            "n_events"].sum()
        tot = g.groupby("source")["n_events"].transform("sum")
        return pd.DataFrame({
            "source": g["source"],
            "how": g["how"].astype(np.int64),
            "n_events": g["n_events"].astype(np.int64),
            "share": g["n_events"].to_numpy(np.int64)
                     / tot.to_numpy(np.int64)})

    return sharded_map_groups(parts, "source", fold)


_HOUR_OF_WEEK_ORACLE = """
WITH b AS (
  SELECT event_type AS source,
         (CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600) % 168
           AS how
  FROM events
), c AS (
  SELECT source, how, count(*) AS n_events FROM b GROUP BY 1, 2
), t AS (
  SELECT source, sum(n_events) AS tot FROM c GROUP BY 1
)
SELECT c.source, c.how, CAST(c.n_events AS BIGINT) AS n_events,
       CAST(c.n_events AS DOUBLE) / t.tot AS share
FROM c JOIN t USING (source)
"""


def media_input_path(n: int = 512, seed: int = 42) -> str:
    """Deterministic synthesized media parquet (cached, atomic rename):
    the multimodal family's SQL-visible input.  The driver tables carry
    no binary media (TESTDATA.md), so the documented input for the
    multimodal stages is this synthesized table of REAL PNG/WAV
    payloads — persisting it lets DuckDB re-parse the same bytes."""
    import pyarrow.parquet as _pq

    from ..stages.multimodal import synth_media_table

    gen_version = "v1"  # bump when synth_media_table's recipe changes
    out = os.path.join("/tmp", "pycatcher_ray_media",
                       f"{gen_version}-{n}-{seed}")
    path = os.path.join(out, "media.parquet")
    if not os.path.exists(path):
        tmp = f"{out}.tmp.{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        _pq.write_table(synth_media_table(n, seed=seed),
                        os.path.join(tmp, "media.parquet"))
        try:
            os.rename(tmp, out)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
            # only a lost publish race leaves the path present; any
            # other rename failure must surface, not return a path
            # that read_parquet will fail on later
            if not os.path.exists(path):
                raise
    return path


def media_header_census(sf_dir: str):
    """EXACT-ORACLED multimodal decode: the actor-pool stdlib decoder
    (stages/multimodal.MediaDecoder — the real PNG/WAV parse, state in
    ``__init__``) runs over the persisted binary media table, and the
    container-format HEADER fields it extracts are value-pinned by a
    DuckDB oracle that re-parses the same BLOB bytes with hex folds:
    PNG IHDR width/height (big-endian u32 at offsets 17/21) and WAV
    fmt/data fields (little-endian sample rate at 25, frame count =
    data size at 41 over 2 bytes/frame).  The pixel/PCM SIGNAL stats
    stay pytest-golden territory (zlib inflate is not SQL); this row
    pins the decode path's framing, byte order, and the binary
    column's zero-copy round trip through the Arrow batches.

    Scale shape: MAP-ONLY — payload bytes never enter an exchange;
    small batches bound payload × concurrency in the worker heap."""
    from ..stages.multimodal import decode_features

    path = media_input_path()
    media = _rd().read_parquet(path)
    feats = decode_features(media)

    def extract(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({
                "media_id": pd.Series([], dtype=np.int64),
                "mime": pd.Series([], dtype=object),
                "n_bytes": pd.Series([], dtype=np.int64),
                "hdr_a": pd.Series([], dtype=np.int64),
                "hdr_b": pd.Series([], dtype=np.int64)})
        f = np.stack(b["features"].to_numpy())
        return pd.DataFrame({
            "media_id": b["media_id"].to_numpy(np.int64),
            "mime": b["mime"].astype(object),
            "n_bytes": b["n_bytes"].to_numpy(np.int64),
            # PNG: f[1]=width f[2]=height; WAV: f[1]=rate f[2]=frames
            "hdr_a": f[:, 1].astype(np.int64),
            "hdr_b": f[:, 2].astype(np.int64)})

    return feats.map_batches(extract, batch_format="pandas")


def _media_byte(i: int) -> str:
    """SQL: value of 1-indexed payload byte i (via the hex string)."""
    h = f"substring(hx, {2 * i - 1}, 2)"
    return (f"((strpos('0123456789ABCDEF', substring({h},1,1))-1)*16"
            f" + strpos('0123456789ABCDEF', substring({h},2,1))-1)")


def _media_be32(off: int) -> str:
    return " + ".join(f"{_media_byte(off + k)}*{256 ** (3 - k)}"
                      for k in range(4))


def _media_le32(off: int) -> str:
    return " + ".join(f"{_media_byte(off + k)}*{256 ** k}"
                      for k in range(4))


def _media_header_oracle() -> str:
    path = media_input_path()
    return f"""
WITH m AS (
  SELECT media_id, mime, payload, hex(payload) AS hx
  FROM read_parquet('{path}')
)
SELECT media_id, mime, octet_length(payload) AS n_bytes,
  CAST(CASE WHEN mime = 'image/png' THEN {_media_be32(17)}
            ELSE {_media_le32(25)} END AS BIGINT) AS hdr_a,
  CAST(CASE WHEN mime = 'image/png' THEN {_media_be32(21)}
            ELSE ({_media_le32(41)}) // 2 END AS BIGINT) AS hdr_b
FROM m
"""
