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
    _BLOOM_BITS,
    _BLOOM_REF,
    _events_rollup,
    _rd,
    _round_exact,
    _splitmix64,
    _sql_mulmod64,
)
from .events import (
    rollup_monthly,
    session_windows,
)
from .events2 import (
    _SAX_ORACLE,
    _hourly_int_units,
    sax_daily_words,
)



def wow_change_1h(sf_dir: str):
    """Week-over-week change per hourly bucket: each observed hour
    joins the SAME hour one epoch-week earlier (x − 168 in epoch-hours
    — integer key, no calendar arithmetic) and emits the exact delta
    plus one ratio divide — the seasonal-aware growth screen a daily
    rate-of-change misses.  Hours with no observation a week before
    are omitted on both sides.  One source-keyed exchange; the
    self-join happens inside the shard on integer hour keys."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        out = []
        for src, bs, xs, y4 in _hourly_int_units(shard):
            prev = {int(x): int(y) for x, y in zip(xs, y4)}
            cur_i, prev_i = [], []
            for i, x in enumerate(xs):
                p = prev.get(int(x) - 168)
                if p is not None:
                    cur_i.append(i)
                    prev_i.append(p)
            if not cur_i:
                continue
            idx = np.asarray(cur_i, dtype=np.int64)
            pv = np.asarray(prev_i, dtype=np.int64)
            cv = y4[idx]
            out.append(pd.DataFrame({
                "source": src,
                "bucket_start": bs.to_numpy()[idx],
                "value": cv / 10000.0,
                "prev_week": pv / 10000.0,
                "delta": (cv - pv) / 10000.0,
                "ratio": np.where(pv != 0, cv / pv.astype(np.float64),
                                  np.nan)}))
        if not out:
            return pd.DataFrame({
                "source": pd.Series([], dtype=object),
                "bucket_start": pd.Series([], dtype="datetime64[us]"),
                "value": pd.Series([], dtype=np.float64),
                "prev_week": pd.Series([], dtype=np.float64),
                "delta": pd.Series([], dtype=np.float64),
                "ratio": pd.Series([], dtype=np.float64)})
        return pd.concat(out, ignore_index=True)

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_WOW_CHANGE_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS x,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY 1, 2, 3
)
SELECT a.source, a.bucket_start,
       CAST(a.y AS DOUBLE) / 10000.0 AS value,
       CAST(b.y AS DOUBLE) / 10000.0 AS prev_week,
       CAST(a.y - b.y AS DOUBLE) / 10000.0 AS delta,
       CASE WHEN b.y <> 0
            THEN CAST(a.y AS DOUBLE) / CAST(b.y AS DOUBLE)
            ELSE NULL END AS ratio
FROM r a JOIN r b ON b.source = a.source AND b.x = a.x - 168
"""


def new_vs_returning_daily(sf_dir: str):
    """New-vs-returning user split per day: a user is NEW on their
    first-ever day, RETURNING on any later active day — the growth
    composition metric next to DAU.  Shape: per-batch distinct
    (user, day) partials ride the user-keyed exchange where each
    user's first day resolves exactly; per-day integer partials fold
    in a tiny second exchange.  Pure integer counts."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    ds = _rd().read_parquet(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        day = (batch["ts"].to_numpy().astype("datetime64[s]")
               .astype(np.int64) // 86400)
        return pd.DataFrame({"user_id": batch["user_id"],
                             "day": day}).drop_duplicates()

    parts = ds.map_batches(partial, batch_format="pandas")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.drop_duplicates(["user_id", "day"])
        first = shard.groupby("user_id")["day"].transform("min")
        is_new = (shard["day"] == first).astype(np.int64)
        g = pd.DataFrame({
            "day": shard["day"].to_numpy(np.int64),
            "n_new": is_new.to_numpy(),
            "n_returning": 1 - is_new.to_numpy()}).groupby(
            "day", as_index=False).sum()
        g["n_new"] = g["n_new"].astype(np.int64)
        g["n_returning"] = g["n_returning"].astype(np.int64)
        return g

    per_day = sharded_map_groups(parts, "user_id", fold)
    agg = sharded_aggregate(per_day, "day",
                            {"n_new": "sum", "n_returning": "sum"},
                            num_shards=2)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "day": pd.to_datetime(b["day"].to_numpy(np.int64) * 86400,
                                  unit="s"),
            "n_new": b["n_new"].to_numpy(np.int64),
            "n_returning": b["n_returning"].to_numpy(np.int64)})

    return agg.map_batches(fin, batch_format="pandas")


_NEW_RETURNING_ORACLE = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day
  FROM events
), f AS (
  SELECT user_id, min(day) AS first_day FROM d GROUP BY 1
)
SELECT to_timestamp(d.day * 86400) AT TIME ZONE 'UTC' AS day,
       CAST(sum(CASE WHEN d.day = f.first_day THEN 1 ELSE 0 END)
            AS BIGINT) AS n_new,
       CAST(sum(CASE WHEN d.day > f.first_day THEN 1 ELSE 0 END)
            AS BIGINT) AS n_returning
FROM d JOIN f USING (user_id)
GROUP BY 1
"""


def minute_uniformity_tv(sf_dir: str):
    """Intra-hour arrival uniformity per source: total-variation
    distance between the minute-of-hour event histogram and the
    uniform distribution — TV = Σ_m |c_m·60 − n| / (2·n·60), an exact
    integer numerator with ONE final divide (a batch scheduler firing
    on the minute shows up as TV → 59/60; organic traffic sits near
    0).  Map-only integer partials bounded at 60 × sources per batch
    + one tiny exchange; the driver folds sources × 60 rows."""
    from ..stages.shard import sharded_aggregate

    ds = _rd().read_parquet(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_type", "ts"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        moh = (batch["ts"].to_numpy().astype("datetime64[s]")
               .astype(np.int64) // 60) % 60
        g = pd.DataFrame({"source": batch["event_type"], "m": moh,
                          "c": 1}).groupby(["source", "m"],
                                           as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        return g

    hist = sharded_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["source", "m"], {"c": "sum"}, num_shards=2).to_pandas()
    if hist.empty:
        return pd.DataFrame({
            "source": pd.Series([], dtype=object),
            "n_events": pd.Series([], dtype=np.int64),
            "tv_uniform": pd.Series([], dtype=np.float64)})
    rows = []
    for s, g in hist.groupby("source"):
        c = np.zeros(60, dtype=np.int64)
        c[g["m"].to_numpy(np.int64)] = g["c"].to_numpy(np.int64)
        n = int(c.sum())
        num = int(np.abs(c * 60 - n).sum())
        rows.append({"source": s, "n_events": n,
                     "tv_uniform": float(num) / float(2 * n * 60)})
    return pd.DataFrame(rows, columns=["source", "n_events",
                                       "tv_uniform"])


_MINUTE_UNIFORMITY_ORACLE = """
WITH b AS (
  SELECT event_type AS source,
         (CAST(epoch(date_trunc('minute', ts)) AS BIGINT) // 60) % 60
           AS m
  FROM events
), c AS (
  SELECT source, m, count(*) AS c FROM b GROUP BY 1, 2
), full_grid AS (
  SELECT s.source, t.m, coalesce(c.c, 0) AS c
  FROM (SELECT DISTINCT source FROM c) s
  CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS m) t
  LEFT JOIN c ON c.source = s.source AND c.m = t.m
), n AS (
  SELECT source, sum(c) AS n FROM full_grid GROUP BY 1
)
SELECT f.source, CAST(n.n AS BIGINT) AS n_events,
       CAST(CAST(sum(abs(CAST(f.c AS HUGEINT) * 60 - n.n))
                 AS VARCHAR) AS DOUBLE)
         / CAST(CAST(2 * n.n * 60 AS VARCHAR) AS DOUBLE) AS tv_uniform
FROM full_grid f JOIN n USING (source)
GROUP BY 1, 2, n.n
"""


_ENSEMBLE_FLAGS_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         sum(value) AS v
  FROM events GROUP BY 1, 2
), q AS (
  SELECT source, quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3
  FROM r GROUP BY source
), zs AS (
  SELECT source, avg(v) AS mu, stddev_pop(v) AS sigma FROM r GROUP BY source
), med AS (
  SELECT source, median(v) AS m FROM r GROUP BY source
), madt AS (
  SELECT r.source, median(abs(r.v - med.m)) AS mad
  FROM r JOIN med USING (source) GROUP BY r.source
), f AS (
  SELECT r.source, r.bucket_start, r.v, 'iqr' AS method
  FROM r JOIN q USING (source)
  WHERE r.v < q.q1 - 1.5 * (q.q3 - q.q1) OR r.v > q.q3 + 1.5 * (q.q3 - q.q1)
  UNION ALL
  SELECT r.source, r.bucket_start, r.v, 'zscore'
  FROM r JOIN zs USING (source)
  WHERE abs((r.v - zs.mu) / zs.sigma) > 2
  UNION ALL
  SELECT r.source, r.bucket_start, r.v, 'mad'
  FROM r JOIN med USING (source) JOIN madt USING (source)
  WHERE r.v <> med.m AND abs(0.6745 * (r.v - med.m) / madt.mad) > 3.5
)
SELECT source, bucket_start, round(v, 4) AS value,
       CAST(count(*) AS BIGINT) AS n_methods,
       string_agg(method, ',' ORDER BY method) AS methods
FROM f GROUP BY 1, 2, 3 HAVING count(*) >= 2
"""


def user_value_outliers(sf_dir: str):
    """Users whose exact lifetime value sits > 2 population σ above the
    user mean — the whale/abuse screen, INTEGER-exact end to end: with
    per-user m = round(sum,4)·10⁴ ints (computed inside the user-keyed
    exchange), the flag test (n·m − S)² > 4·(n·S2 − S²) ∧ n·m > S is a
    pure bigint comparison (the embedding_norm_outliers shape applied
    to users); the emitted zscore is ONE VARCHAR-bridged divide of
    exact ints — √ appears on BOTH sides as the same single sqrt.
    Shape: user-keyed exchange → bounded (user, m4) table → driver
    folds moments in Python bigints and filters."""
    from ..stages.shard import sharded_map_groups

    ds = _rd().read_parquet(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "value"])

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        sums = shard.groupby("user_id", sort=False)["value"].sum()
        m4 = np.rint(_round_exact(sums.to_numpy(np.float64))
                     * 10000.0).astype(np.int64)
        return pd.DataFrame({
            "user_id": sums.index.to_numpy(np.int64),
            "m4": m4})

    users = sharded_map_groups(ds, "user_id", fold).to_pandas()
    if users.empty:
        return pd.DataFrame({
            "user_id": pd.Series([], dtype=np.int64),
            "total_value": pd.Series([], dtype=np.float64),
            "zscore": pd.Series([], dtype=np.float64)})
    users = users.groupby("user_id", as_index=False)["m4"].first()
    m = [int(v) for v in users["m4"]]
    n, S = len(m), sum(m)
    S2 = sum(v * v for v in m)
    var_num = n * S2 - S * S  # n² · σ² · 10⁸ — exact
    rows = []
    for uid, v in zip(users["user_id"], m):
        d = n * v - S
        if d > 0 and d * d > 4 * var_num:
            rows.append({
                "user_id": int(uid),
                "total_value": v / 10000.0,
                "zscore": float(d) / math.sqrt(float(var_num))})
    out = pd.DataFrame(rows, columns=["user_id", "total_value", "zscore"])
    if out.empty:
        return pd.DataFrame({
            "user_id": pd.Series([], dtype=np.int64),
            "total_value": pd.Series([], dtype=np.float64),
            "zscore": pd.Series([], dtype=np.float64)})
    return out


_USER_VALUE_OUTLIERS_ORACLE = """
WITH u AS (
  SELECT user_id,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS m4
  FROM events GROUP BY 1
), s AS (
  SELECT count(*) AS n, sum(CAST(m4 AS HUGEINT)) AS S,
         sum(CAST(m4 AS HUGEINT) * m4) AS S2
  FROM u
)
SELECT u.user_id, CAST(u.m4 AS DOUBLE) / 10000.0 AS total_value,
       CAST(CAST(s.n * u.m4 - s.S AS VARCHAR) AS DOUBLE)
         / sqrt(CAST(CAST(s.n * s.S2 - s.S * s.S AS VARCHAR) AS DOUBLE))
         AS zscore
FROM u CROSS JOIN s
WHERE s.n * u.m4 - s.S > 0
  AND (s.n * u.m4 - s.S) * (s.n * u.m4 - s.S)
        > 4 * (s.n * s.S2 - s.S * s.S)
"""


def mann_kendall_trend(sf_dir: str):
    """Mann-Kendall trend test per source over the hourly sums — the
    nonparametric monotone-trend screen (robust where OLS is leverage-
    fragile).  The statistic S = Σ_{i<j} sgn(y_j − y_i) is a PURE
    INTEGER on the 10⁻⁴-unit values; Kendall's tau = S / (n(n−1)/2) is
    ONE int/int divide.  Per-source O(n²) on the BOUNDED hourly series
    (buckets, never raw rows — the theil_sen precedent); one
    source-keyed exchange."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, bs, xs, y4 in _hourly_int_units(shard):
            n = y4.size
            if n < 2:
                continue
            diff = np.sign(y4[None, :] - y4[:, None])
            s_stat = int(np.triu(diff, k=1).sum())
            pairs = n * (n - 1) // 2
            rows.append({
                "source": src, "n_buckets": int(n),
                "s_stat": s_stat,
                "tau": float(s_stat) / float(pairs)})
        return pd.DataFrame(rows, columns=[
            "source", "n_buckets", "s_stat", "tau"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_MANN_KENDALL_ORACLE = """
WITH r AS (
  SELECT event_type AS source,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS x,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), p AS (
  SELECT a.source,
         sum(CASE WHEN b.y > a.y THEN 1
                  WHEN b.y < a.y THEN -1 ELSE 0 END) AS s_stat,
         count(*) AS pairs
  FROM r a JOIN r b ON b.source = a.source AND b.x > a.x
  GROUP BY 1
), n AS (
  SELECT source, count(*) AS n FROM r GROUP BY 1
)
SELECT n.source, CAST(n.n AS BIGINT) AS n_buckets,
       CAST(p.s_stat AS BIGINT) AS s_stat,
       CAST(p.s_stat AS DOUBLE) / pairs AS tau
FROM n JOIN p USING (source) WHERE n.n >= 2
"""


def event_transition_matrix(sf_dir: str):
    """Global event-type transition counts: consecutive event pairs
    within each user's timeline (ordered by ts, event_id to pin exact
    ties) aggregated into the (from_type, to_type) Markov census with
    each row's share of its from-type — the session-flow fingerprint
    behind funnel design.  All of a user's events co-locate in the
    user-keyed exchange where the sort + shift is vectorized; only
    (from, to, count) integer partials leave it.  Share is ONE
    int/int divide."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"])

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["user_id", "ts", "event_id"],
                                  kind="stable")
        same_user = (shard["user_id"].to_numpy()[1:]
                     == shard["user_id"].to_numpy()[:-1])
        et = shard["event_type"].to_numpy()
        g = pd.DataFrame({
            "from_type": et[:-1][same_user],
            "to_type": et[1:][same_user],
            "n": 1}).groupby(["from_type", "to_type"],
                             as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = sharded_map_groups(ds, "user_id", fold)
    agg = sharded_aggregate(parts, ["from_type", "to_type"],
                            {"n": "sum"}, num_shards=2).to_pandas()
    if agg.empty:
        return pd.DataFrame({
            "from_type": pd.Series([], dtype=object),
            "to_type": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64),
            "share_of_from": pd.Series([], dtype=np.float64)})
    tot = agg.groupby("from_type")["n"].transform("sum")
    return pd.DataFrame({
        "from_type": agg["from_type"],
        "to_type": agg["to_type"],
        "n": agg["n"].astype(np.int64),
        "share_of_from": agg["n"].to_numpy(np.int64)
                         / tot.to_numpy(np.int64)})


_EVENT_TRANSITION_ORACLE = """
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
), c AS (
  SELECT event_type AS from_type, next_type AS to_type,
         count(*) AS n
  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2
), t AS (
  SELECT from_type, sum(n) AS tot FROM c GROUP BY 1
)
SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
       CAST(c.n AS DOUBLE) / t.tot AS share_of_from
FROM c JOIN t USING (from_type)
"""


_GOOD_TURING_ORACLE = r"""
WITH w AS (
  SELECT source,
         unnest(list_transform(regexp_extract_all(text, '[\w'']+'),
                               x -> lower(x))) AS w
  FROM documents
), c AS (
  SELECT source, w, count(*) AS c FROM w GROUP BY 1, 2
)
SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(sum(c) AS BIGINT) AS unseen_mass
FROM c GROUP BY 1
"""


def seasonal_mann_kendall(sf_dir: str):
    """Seasonal Mann-Kendall trend test (Hirsch-Slack): the MK S
    statistic computed WITHIN each hour-of-day stratum and summed —
    the monotone-trend screen that a daily cycle cannot fool (plain MK
    reads any seasonal series as trending).  S remains a PURE INTEGER;
    tau normalizes by the summed per-stratum pair counts with ONE
    divide.  Same bounded per-source O(Σ nₕ²) cost and source-keyed
    exchange as ``mann_kendall_trend``."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, bs, xs, y4 in _hourly_int_units(shard):
            hour = (xs % 24).astype(np.int64)
            s_stat, pairs = 0, 0
            for h in range(24):
                yh = y4[hour == h]
                if yh.size < 2:
                    continue
                diff = np.sign(yh[None, :] - yh[:, None])
                s_stat += int(np.triu(diff, k=1).sum())
                pairs += yh.size * (yh.size - 1) // 2
            if pairs == 0:
                continue
            rows.append({
                "source": src, "n_pairs": pairs, "s_stat": s_stat,
                "tau": float(s_stat) / float(pairs)})
        return pd.DataFrame(rows, columns=[
            "source", "n_pairs", "s_stat", "tau"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_SEASONAL_MK_ORACLE = """
WITH r AS (
  SELECT event_type AS source,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS x,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), p AS (
  SELECT a.source,
         sum(CASE WHEN b.y > a.y THEN 1
                  WHEN b.y < a.y THEN -1 ELSE 0 END) AS s_stat,
         count(*) AS pairs
  FROM r a JOIN r b ON b.source = a.source AND b.x > a.x
                   AND a.x % 24 = b.x % 24
  GROUP BY 1
)
SELECT source, CAST(pairs AS BIGINT) AS n_pairs,
       CAST(s_stat AS BIGINT) AS s_stat,
       CAST(s_stat AS DOUBLE) / pairs AS tau
FROM p
"""


_MINHASH_MD5_ORACLE = r"""
WITH sample AS (
  SELECT doc_id, text FROM documents
  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
             AS INTEGER) % 4 = 0
), words AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(regexp_extract_all(text, '[\w'']+'),
                               w -> lower(w))) AS w
  FROM sample
), h AS (
  SELECT doc_id, t.p AS perm,
         CAST(('0x' || substr(md5(CAST(t.p AS VARCHAR) || '|' || w),
                              1, 16)) AS UBIGINT) AS hv
  FROM words, UNNEST(generate_series(0, 7)) AS t(p)
)
SELECT doc_id, perm, min(hv) AS sig
FROM h GROUP BY 1, 2
"""


_MINHASH_JACCARD_ORACLE = r"""
WITH words AS (
  SELECT DISTINCT source,
         unnest(list_transform(regexp_extract_all(text, '[\w'']+'),
                               w -> lower(w))) AS w
  FROM documents
), h AS (
  SELECT source, t.p AS perm,
         min(CAST(('0x' || substr(md5(CAST(t.p AS VARCHAR) || '|' || w),
                                  1, 16)) AS UBIGINT)) AS sig
  FROM words, UNNEST(generate_series(0, 15)) AS t(p)
  GROUP BY 1, 2
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(sum(CASE WHEN a.sig = b.sig THEN 1 ELSE 0 END) AS BIGINT)
         AS matching_perms,
       CAST(sum(CASE WHEN a.sig = b.sig THEN 1 ELSE 0 END) AS DOUBLE)
         / 16 AS jaccard_est
FROM h a JOIN h b ON a.perm = b.perm AND a.source < b.source
GROUP BY 1, 2
"""


_WORD_RANK_ORACLE = r"""
WITH words AS (
  SELECT source,
         unnest(list_transform(regexp_extract_all(text, '[\w'']+'),
                               w -> lower(w))) AS w
  FROM documents
), cnt AS (
  SELECT source, w, count(*) AS c FROM words GROUP BY 1, 2
), rk AS (
  SELECT w, row_number() OVER (ORDER BY sum(c) DESC, w) AS r
  FROM cnt GROUP BY w
)
SELECT cnt.source,
       CAST(sum(c) AS BIGINT) AS occurrences,
       CAST(sum(c * r) AS BIGINT) AS rank_mass,
       CAST(CAST(sum(c * r) AS BIGINT) AS DOUBLE)
         / CAST(sum(c) AS BIGINT) AS mean_rank
FROM cnt JOIN rk USING (w)
GROUP BY 1
"""


_RAG_CHUNK_ORACLE = r"""
WITH chunks AS (
  SELECT source, md5(substr(text, t.s, 256)) AS d
  FROM documents, UNNEST(generate_series(1, length(text), 128)) AS t(s)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(DISTINCT d) AS BIGINT) AS n_distinct_chunks,
       CAST(count(*) - count(DISTINCT d) AS BIGINT) AS dup_chunks
FROM chunks GROUP BY 1
"""


def croston_intermittent(sf_dir: str):
    """Croston's method (1972) for INTERMITTENT demand over the
    zero-filled hourly grid per source — the forecasting primitive for
    sparse series where Holt/EWMA break down (separate exponential
    smoothing of the nonzero demand SIZE z and the inter-demand
    INTERVAL p; forecast = z/p).  Demand period = an observed hourly
    bucket with a nonzero 10⁻⁴-unit sum; carved gaps in the grid are
    zero-demand periods, which is exactly what makes the interval state
    meaningful on this input.  Determinism (the holt_winters contract):
    α = 1/2 exactly-representable, init z₀ = first demand value,
    p₀ = its 1-based grid index, then the IDENTICAL per-step FP
    expressions on both engines: z' = 0.5·v + 0.5·z,
    p' = 0.5·q + 0.5·p with q = integer grid gap.  The oracle replays
    the recursion over demand rows in a recursive CTE (gaps never need
    materializing — the zero periods only enter through the integer
    index arithmetic).  Sequential per series, parallel across series
    via ONE source-keyed exchange."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h").select_columns(
        ["event_type", "bucket_start", "sum_value"])

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, bs, _xs, y4 in _hourly_int_units(shard):
            h = (bs.to_numpy().astype("datetime64[s]")
                 .astype(np.int64) // 3600)
            idx = h - h[0] + 1  # 1-based grid index incl. gap periods
            nz = np.flatnonzero(y4 != 0)
            if nz.size == 0:
                continue
            z = y4[nz[0]] / 10000.0
            p = float(idx[nz[0]])
            prev = idx[nz[0]]
            for j in nz[1:]:
                v = y4[j] / 10000.0
                q = int(idx[j] - prev)
                z = 0.5 * v + 0.5 * z
                p = 0.5 * q + 0.5 * p
                prev = idx[j]
            rows.append({
                "source": src,
                "n_periods": int(idx[-1]),
                "n_demand": int(nz.size),
                "z_final": z, "p_final": p,
                "croston_forecast": z / p})
        return pd.DataFrame(rows, columns=[
            "source", "n_periods", "n_demand", "z_final", "p_final",
            "croston_forecast"])

    return sharded_map_groups(roll, "event_type", fold)


_CROSTON_ORACLE = """
WITH RECURSIVE r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bs,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS v4
  FROM events GROUP BY 1, 2
), g AS (
  SELECT source, bs, v4,
         (epoch(bs) - min(epoch(bs)) OVER (PARTITION BY source)) / 3600
           + 1 AS idx
  FROM r
), span AS (
  SELECT source, CAST(max(idx) AS BIGINT) AS n_periods FROM g
  GROUP BY source
), d AS (
  SELECT source, v4, idx,
         row_number() OVER (PARTITION BY source ORDER BY idx) AS dn,
         count(*) OVER (PARTITION BY source) AS n_demand
  FROM g WHERE v4 <> 0
), e AS (
  SELECT source, dn, idx,
         v4 / 10000.0 AS z, CAST(idx AS DOUBLE) AS p
  FROM d WHERE dn = 1
  UNION ALL
  SELECT e.source, d.dn, d.idx,
         0.5 * (d.v4 / 10000.0) + 0.5 * e.z AS z,
         0.5 * CAST(d.idx - e.idx AS DOUBLE) + 0.5 * e.p AS p
  FROM e JOIN d ON d.source = e.source AND d.dn = e.dn + 1
), fin AS (
  SELECT source, z, p FROM e
  QUALIFY row_number() OVER (PARTITION BY source ORDER BY dn DESC) = 1
)
SELECT span.source, span.n_periods,
       CAST(d1.n_demand AS BIGINT) AS n_demand,
       fin.z AS z_final, fin.p AS p_final,
       fin.z / fin.p AS croston_forecast
FROM span
JOIN (SELECT DISTINCT source, n_demand FROM d) d1 USING (source)
JOIN fin USING (source)
"""


def binary_segmentation_cp(sf_dir: str):
    """TWO-LEVEL binary-segmentation changepoints per source: the
    global CUSUM argmax (``cusum_changepoint``'s statistic) splits the
    series, then the SAME statistic runs inside each half — the first
    recursion of the classic multi-changepoint algorithm (Scott &
    Knott 1974 lineage).  Everything stays exact: per-segment statistic
    |m·P_j − j·T| in Python bigints (int64 vectorized under the
    m·Σ|y| < 2⁶² guard) vs HUGEINT window sums, earliest-tie argmax on
    both sides, and each emitted stat is ONE VARCHAR-bridged divide.
    Segments shorter than 2 buckets emit NULL (no interior structure).
    One source-keyed exchange; series bounded per source."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h").select_columns(
        ["event_type", "bucket_start", "sum_value"])

    def seg_argmax(y4: np.ndarray):
        """(earliest argmax index, stat) of |m·P_j − j·T| over y4."""
        m = int(y4.size)
        abs_sum = int(np.abs(y4).sum())
        total = int(y4.sum())
        if m * abs_sum < 2 ** 62:
            P = np.cumsum(y4)
            sv = np.abs(m * P - np.arange(1, m + 1, dtype=np.int64) * total)
            i = int(np.argmax(sv))
            return i, int(sv[i])
        best, best_i, acc = -1, 0, 0
        for i, v in enumerate(y4.tolist(), start=1):
            acc += v
            s = abs(m * acc - i * total)
            if s > best:
                best, best_i = s, i - 1
        return best_i, best

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, bs, _xs, y4 in _hourly_int_units(shard):
            n = int(y4.size)
            i1, s1 = seg_argmax(y4)
            row = {
                "source": src, "n_buckets": n,
                "changepoint_bucket": bs.iloc[i1],
                "cusum_stat": float(s1) / float(n) / 10000.0,
                "left_changepoint_bucket": pd.NaT,
                "left_stat": np.nan,
                "right_changepoint_bucket": pd.NaT,
                "right_stat": np.nan}
            if i1 + 1 >= 2:
                li, ls = seg_argmax(y4[:i1 + 1])
                row["left_changepoint_bucket"] = bs.iloc[li]
                row["left_stat"] = float(ls) / float(i1 + 1) / 10000.0
            if n - i1 - 1 >= 2:
                ri, rs = seg_argmax(y4[i1 + 1:])
                row["right_changepoint_bucket"] = bs.iloc[i1 + 1 + ri]
                row["right_stat"] = (float(rs) / float(n - i1 - 1)
                                     / 10000.0)
            rows.append(row)
        return pd.DataFrame(rows, columns=[
            "source", "n_buckets", "changepoint_bucket", "cusum_stat",
            "left_changepoint_bucket", "left_stat",
            "right_changepoint_bucket", "right_stat"])

    return sharded_map_groups(roll, "event_type", fold)


_BINSEG_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY date_trunc('hour', ts)) AS idx
  FROM events GROUP BY 1, 2
), t AS (
  SELECT source, count(*) AS n, sum(CAST(y AS HUGEINT)) AS total
  FROM r GROUP BY source
), c AS (
  SELECT r.source, r.bucket_start, r.idx, t.n,
         abs(t.n * sum(CAST(r.y AS HUGEINT)) OVER (
               PARTITION BY r.source ORDER BY r.idx
               ROWS UNBOUNDED PRECEDING)
             - r.idx * t.total) AS stat
  FROM r JOIN t USING (source)
), cp1 AS (
  SELECT source, idx AS i1, bucket_start AS cpb, n, stat AS s1 FROM c
  QUALIFY row_number() OVER (
    PARTITION BY source ORDER BY stat DESC, idx ASC) = 1
), st AS (
  SELECT r.source, r.bucket_start,
         CASE WHEN r.idx <= cp1.i1 THEN 'L' ELSE 'R' END AS side,
         count(*) OVER w_all AS m,
         abs(count(*) OVER w_all
             * sum(CAST(r.y AS HUGEINT)) OVER w_pre
             - row_number() OVER w_ord
             * sum(CAST(r.y AS HUGEINT)) OVER w_all) AS stat
  FROM r JOIN cp1 USING (source)
  WINDOW
    w_all AS (PARTITION BY r.source,
              CASE WHEN r.idx <= cp1.i1 THEN 'L' ELSE 'R' END),
    w_pre AS (PARTITION BY r.source,
              CASE WHEN r.idx <= cp1.i1 THEN 'L' ELSE 'R' END
              ORDER BY r.idx ROWS UNBOUNDED PRECEDING),
    w_ord AS (PARTITION BY r.source,
              CASE WHEN r.idx <= cp1.i1 THEN 'L' ELSE 'R' END
              ORDER BY r.idx)
), best AS (
  SELECT source, side, bucket_start, m, stat FROM st
  QUALIFY row_number() OVER (
    PARTITION BY source, side
    ORDER BY stat DESC, bucket_start ASC) = 1
)
SELECT cp1.source, CAST(cp1.n AS BIGINT) AS n_buckets,
       cp1.cpb AS changepoint_bucket,
       CAST(CAST(cp1.s1 AS VARCHAR) AS DOUBLE)
         / CAST(cp1.n AS DOUBLE) / 10000.0 AS cusum_stat,
       l.bucket_start AS left_changepoint_bucket,
       CAST(CAST(l.stat AS VARCHAR) AS DOUBLE)
         / CAST(l.m AS DOUBLE) / 10000.0 AS left_stat,
       rr.bucket_start AS right_changepoint_bucket,
       CAST(CAST(rr.stat AS VARCHAR) AS DOUBLE)
         / CAST(rr.m AS DOUBLE) / 10000.0 AS right_stat
FROM cp1
LEFT JOIN (SELECT * FROM best WHERE side = 'L' AND m >= 2) l
  USING (source)
LEFT JOIN (SELECT * FROM best WHERE side = 'R' AND m >= 2) rr
  USING (source)
"""


_PRIORITY_SAMPLE_ORACLE = """
WITH h AS (
  SELECT source, doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
              AS UBIGINT) AS priority
  FROM documents
)
SELECT source, doc_id, priority FROM h
QUALIFY row_number() OVER (
  PARTITION BY source ORDER BY priority, doc_id) <= 5
"""


def integrated_acf_time(sf_dir: str, max_lag: int = 48):
    """Integrated autocorrelation time τ = 1 + 2·Σρ_k per source —
    the MCMC-style effective-sample-size deflator (how many hourly
    buckets equal one independent observation), summed with Geyer's
    initial-positive-sequence cutoff: lags stop at the FIRST k whose
    autocovariance numerator is ≤ 0 (or at min(48, n−1) if none).
    EXACT arithmetic end to end (the ``dominant_acf_lag`` machinery):
    with e = n·V − ΣV the numerators Σ e_i·e_{i+k} are Python-bigint /
    HUGEINT integers, so the cutoff decision and the partial sum S are
    bit-deterministic; τ = (den + 2S)/den and ess = n/τ are the only
    FP ops, written as the identical expressions over VARCHAR-bridged
    correctly-rounded casts on both engines.  Constant series
    (den = 0) emit NULL τ via an exact integer compare.  One
    source-keyed exchange, O(n·max_lag) integer ops per source."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, _bs, _xs, y4 in _hourly_int_units(shard):
            n = int(y4.size)
            if n < 2:
                continue
            total = int(y4.sum())
            e = [n * int(v) - total for v in y4.tolist()]
            den = sum(x * x for x in e)
            maxk = min(max_lag, n - 1)
            S, cutoff = 0, maxk + 1
            for k in range(1, maxk + 1):
                num = sum(a * b for a, b in zip(e[:-k], e[k:]))
                if num <= 0:
                    cutoff = k
                    break
                S += num
            if den == 0:
                tau = ess = np.nan
            else:
                tau = float(den + 2 * S) / float(den)
                ess = float(n) / tau
            rows.append({
                "source": src, "n_obs": n, "cutoff_lag": cutoff,
                "tau": tau, "ess": ess})
        return pd.DataFrame(rows, columns=[
            "source", "n_obs", "cutoff_lag", "tau", "ess"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_INTEGRATED_ACF_ORACLE = """
WITH r AS (
  SELECT event_type AS source,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS V,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY date_trunc('hour', ts)) AS idx
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), t AS (
  SELECT source, count(*) AS n, sum(CAST(V AS HUGEINT)) AS total
  FROM r GROUP BY source HAVING count(*) >= 2
), e AS (
  SELECT r.source, r.idx, t.n, t.n * CAST(r.V AS HUGEINT) - t.total AS ev
  FROM r JOIN t USING (source)
), den AS (
  SELECT source, sum(ev * ev) AS s2, any_value(n) AS n_obs
  FROM e GROUP BY source
), nums AS (
  SELECT a.source, l.lag, sum(a.ev * b.ev) AS num
  FROM e a CROSS JOIN (SELECT unnest(range(1, 49)) AS lag) l
  JOIN e b ON b.source = a.source AND b.idx = a.idx + l.lag
  GROUP BY a.source, l.lag
), cut AS (
  SELECT den.source, den.n_obs, den.s2,
         coalesce(min(nums.lag) FILTER (nums.num <= 0),
                  least(48, den.n_obs - 1) + 1) AS cutoff
  FROM den LEFT JOIN nums USING (source)
  GROUP BY 1, 2, 3
), acc AS (
  SELECT cut.source, cut.n_obs, cut.s2, cut.cutoff,
         coalesce(sum(nums.num) FILTER (nums.lag < cut.cutoff),
                  CAST(0 AS HUGEINT)) AS S
  FROM cut LEFT JOIN nums USING (source)
  GROUP BY 1, 2, 3, 4
)
SELECT source, CAST(n_obs AS BIGINT) AS n_obs,
       CAST(cutoff AS BIGINT) AS cutoff_lag,
       CASE WHEN s2 > 0 THEN
         CAST(CAST(s2 + 2 * S AS VARCHAR) AS DOUBLE)
           / CAST(CAST(s2 AS VARCHAR) AS DOUBLE) END AS tau,
       CASE WHEN s2 > 0 THEN
         CAST(n_obs AS DOUBLE)
           / (CAST(CAST(s2 + 2 * S AS VARCHAR) AS DOUBLE)
              / CAST(CAST(s2 AS VARCHAR) AS DOUBLE)) END AS ess
FROM acc
"""


_TRIPLET_MARGIN_ORACLE = """
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS qv
  FROM embeddings
), anch AS (
  SELECT vec_id, label FROM embeddings ORDER BY vec_id LIMIT 8
), d AS (
  SELECT aq.vec_id AS anchor_id, q.vec_id AS vid,
         sum((aq.qv - q.qv) * (aq.qv - q.qv)) AS d2
  FROM q aq JOIN anch a ON aq.vec_id = a.vec_id
  JOIN q ON q.dim = aq.dim
  GROUP BY 1, 2
)
SELECT a.vec_id AS anchor_id, CAST(a.label AS BIGINT) AS label,
       CAST(min(d.d2) FILTER (vl.label = a.label
                              AND d.vid <> a.vec_id) AS BIGINT)
         AS d2_same,
       CAST(min(d.d2) FILTER (vl.label <> a.label) AS BIGINT)
         AS d2_diff,
       CAST(min(d.d2) FILTER (vl.label <> a.label)
            - min(d.d2) FILTER (vl.label = a.label
                                AND d.vid <> a.vec_id) AS BIGINT)
         AS margin
FROM anch a
JOIN d ON d.anchor_id = a.vec_id
JOIN embeddings vl ON vl.vec_id = d.vid
GROUP BY 1, 2
"""


_DETECTOR_KAPPA_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         sum(value) AS v
  FROM events GROUP BY 1, 2
), q AS (
  SELECT source, quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3
  FROM r GROUP BY source
), s AS (
  SELECT source, avg(v) AS mu, stddev_pop(v) AS sigma FROM r GROUP BY source
), f AS (
  SELECT r.source,
         CASE WHEN r.v < q.q1 - 1.5 * (q.q3 - q.q1)
                OR r.v > q.q3 + 1.5 * (q.q3 - q.q1)
              THEN 1 ELSE 0 END AS fi,
         CASE WHEN abs((r.v - s.mu) / s.sigma) > 2
              THEN 1 ELSE 0 END AS fz
  FROM r JOIN q USING (source) JOIN s USING (source)
), agg AS (
  SELECT source, count(*) AS n,
         sum(fi * fz) AS a, sum(fi * (1 - fz)) AS b,
         sum((1 - fi) * fz) AS c
  FROM f GROUP BY 1
)
SELECT source, CAST(n AS BIGINT) AS n_buckets,
       CAST(a AS BIGINT) AS both_flagged,
       CAST(b AS BIGINT) AS iqr_only,
       CAST(c AS BIGINT) AS zscore_only,
       CASE WHEN n * n - ((a + b) * (a + c)
                          + (c + n - a - b - c) * (b + n - a - b - c))
                 <> 0 THEN
         CAST(CAST(n * (a + n - a - b - c)
                   - ((a + b) * (a + c)
                      + (c + n - a - b - c) * (b + n - a - b - c))
              AS BIGINT) AS DOUBLE)
           / CAST(CAST(n * n - ((a + b) * (a + c)
                                + (c + n - a - b - c)
                                  * (b + n - a - b - c))
                  AS BIGINT) AS DOUBLE)
       END AS kappa
FROM agg
"""


_CORPUS_PROFILE_ORACLE = r"""
WITH base AS (
  SELECT doc_id, source, lang, text, length(text) AS n_chars,
         len(string_split(text, ' ')) AS n_words
  FROM documents
), agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS n_chars,
         CAST(sum(n_words) AS BIGINT) AS n_words,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(count(*) FILTER (n_words >= 10 AND n_chars >= 100
              AND CAST(n_chars AS DOUBLE) / n_words
                  BETWEEN 3.0 AND 12.0) AS BIGINT) AS n_quality_pass
  FROM base GROUP BY 1
), words AS (
  SELECT source, CAST(count(DISTINCT w) AS BIGINT) AS n_distinct_words
  FROM (SELECT source,
               unnest(list_transform(regexp_extract_all(text, '[\w'']+'),
                                     x -> lower(x))) AS w
        FROM documents) GROUP BY 1
), dup AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_exact_dup
  FROM (SELECT source, doc_id,
               min(doc_id) OVER (PARTITION BY text) AS keeper
        FROM documents) WHERE doc_id <> keeper GROUP BY 1
)
SELECT agg.source, agg.n_docs, agg.n_chars, agg.n_words,
       coalesce(words.n_distinct_words, 0) AS n_distinct_words,
       agg.n_langs, agg.n_quality_pass,
       coalesce(dup.n_exact_dup, 0) AS n_exact_dup
FROM agg
LEFT JOIN words USING (source)
LEFT JOIN dup USING (source)
"""


_AMS_F2_ORACLE = r"""
WITH words AS (
  SELECT source,
         unnest(list_transform(regexp_extract_all(text, '[\w'']+'),
                               x -> lower(x))) AS w
  FROM documents
), cnt AS (
  SELECT source, w, count(*) AS c FROM words GROUP BY 1, 2
), signs AS (
  SELECT w, t.j,
         CASE WHEN CAST(('0x' || substr(
                md5(CAST(t.j AS VARCHAR) || '#' || w), 1, 1))
              AS INTEGER) % 2 = 0 THEN 1 ELSE -1 END AS s
  FROM (SELECT DISTINCT w FROM cnt),
       UNNEST(generate_series(0, 7)) AS t(j)
), z AS (
  SELECT cnt.source, signs.j, sum(signs.s * cnt.c) AS z
  FROM cnt JOIN signs USING (w) GROUP BY 1, 2
), est AS (
  SELECT source, sum(z * z) AS est_sum FROM z GROUP BY 1
), ex AS (
  SELECT source, sum(c * c) AS f2 FROM cnt GROUP BY 1
)
SELECT ex.source, CAST(ex.f2 AS BIGINT) AS f2_exact,
       CAST(est.est_sum AS BIGINT) AS f2_est_sum,
       CAST(CAST(est.est_sum AS BIGINT) AS DOUBLE) / 8 AS f2_est_mean
FROM ex JOIN est USING (source)
"""


_LSH_BAND_ORACLE = r"""
WITH sample AS (
  SELECT doc_id, text FROM documents
  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
             AS INTEGER) % 4 = 0
), words AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(regexp_extract_all(text, '[\w'']+'),
                               w -> lower(w))) AS w
  FROM sample
), h AS (
  SELECT doc_id, t.p AS perm,
         min(CAST(('0x' || substr(md5(CAST(t.p AS VARCHAR) || '|' || w),
                                  1, 16)) AS UBIGINT)) AS sig
  FROM words, UNNEST(generate_series(0, 7)) AS t(p)
  GROUP BY 1, 2
), pairs AS (
  SELECT a.doc_id, a.perm // 2 AS band, a.sig AS s1, b.sig AS s2
  FROM h a JOIN h b ON b.doc_id = a.doc_id AND b.perm = a.perm + 1
  WHERE a.perm % 2 = 0
), b AS (
  SELECT band, s1, s2, count(*) AS m FROM pairs GROUP BY 1, 2, 3
)
SELECT CAST(band AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(max(m) AS BIGINT) AS max_bucket,
       CAST(sum(m * (m - 1) // 2) AS BIGINT) AS candidate_pairs
FROM b GROUP BY 1
"""


_TOP_BIGRAM_ORACLE = r"""
WITH d AS (
  SELECT doc_id, source,
         list_transform(regexp_extract_all(text, '[\w'']+'),
                        x -> lower(x)) AS ws
  FROM documents
), big AS (
  SELECT doc_id, source, ws[t.i] || ' ' || ws[t.i + 1] AS bg
  FROM d, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
), percnt AS (
  SELECT doc_id, source, bg, count(*) AS c FROM big GROUP BY 1, 2, 3
), perdoc AS (
  SELECT doc_id, source, max(c) AS cmax, sum(c) AS n
  FROM percnt GROUP BY 1, 2
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (25 * cmax > 2 * n) AS BIGINT)
         AS n_flagged,
       CAST(count(*) FILTER (25 * cmax > 2 * n) AS DOUBLE) / count(*)
         AS flag_rate
FROM perdoc GROUP BY 1
"""


_IVF_RECALL_ORACLE = """
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS qv
  FROM embeddings
), c AS (
  SELECT vec_id AS cid, dim, qv FROM q
  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
), qry AS (
  SELECT vec_id AS qid, dim, qv FROM q
  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)
), dc AS (
  SELECT q.vec_id, c.cid,
         sum((q.qv - c.qv) * (q.qv - c.qv)) AS d2
  FROM q JOIN c USING (dim) GROUP BY 1, 2
), a AS (
  SELECT vec_id, cid FROM dc
  QUALIFY row_number() OVER (
    PARTITION BY vec_id ORDER BY d2, cid) = 1
), pq AS (
  SELECT qry.qid, c.cid,
         row_number() OVER (
           PARTITION BY qry.qid
           ORDER BY sum((qry.qv - c.qv) * (qry.qv - c.qv)), c.cid)
           AS prank
  FROM qry JOIN c USING (dim) GROUP BY qry.qid, c.cid
), dv AS (
  SELECT qry.qid, q.vec_id,
         sum((qry.qv - q.qv) * (qry.qv - q.qv)) AS d2
  FROM qry JOIN q USING (dim) GROUP BY 1, 2
), exact AS (
  SELECT qid, vec_id FROM dv
  QUALIFY row_number() OVER (
    PARTITION BY qid ORDER BY d2, vec_id) <= 10
), probes AS (SELECT unnest([1, 2, 4]) AS p), cand AS (
  SELECT dv.qid, probes.p, dv.vec_id, dv.d2
  FROM dv
  JOIN a ON a.vec_id = dv.vec_id
  JOIN pq ON pq.qid = dv.qid AND pq.cid = a.cid
  JOIN probes ON pq.prank <= probes.p
), approx AS (
  SELECT qid, p, vec_id FROM cand
  QUALIFY row_number() OVER (
    PARTITION BY qid, p ORDER BY d2, vec_id) <= 10
), ncand AS (
  SELECT qid, p, count(*) AS n_candidates FROM cand GROUP BY 1, 2
), hits AS (
  SELECT approx.qid, approx.p, count(exact.vec_id) AS h
  FROM approx LEFT JOIN exact
    ON exact.qid = approx.qid AND exact.vec_id = approx.vec_id
  GROUP BY 1, 2
)
SELECT ncand.qid AS query_id, CAST(ncand.p AS BIGINT) AS n_probe,
       CAST(ncand.n_candidates AS BIGINT) AS n_candidates,
       CAST(hits.h AS BIGINT) AS hits,
       CAST(hits.h AS BIGINT) / 10.0 AS recall
FROM ncand JOIN hits ON hits.qid = ncand.qid AND hits.p = ncand.p
"""


_RQ_CENSUS_ORACLE = """
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS qv
  FROM embeddings
), c AS (
  SELECT vec_id AS cid, dim, qv FROM q
  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
), seeds AS (
  SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8 OFFSET 8
), dc AS (
  SELECT q.vec_id, c.cid,
         sum((q.qv - c.qv) * (q.qv - c.qv)) AS d2
  FROM q JOIN c USING (dim) GROUP BY 1, 2
), a AS (
  SELECT vec_id, cid FROM dc
  QUALIFY row_number() OVER (
    PARTITION BY vec_id ORDER BY d2, cid) = 1
), resid AS (
  SELECT q.vec_id, q.dim, q.qv - c.qv AS rv
  FROM q JOIN a USING (vec_id) JOIN c
    ON c.cid = a.cid AND c.dim = q.dim
), rcode AS (
  SELECT resid.vec_id AS code_id, dim, rv FROM resid
  WHERE resid.vec_id IN (SELECT vec_id FROM seeds)
), dr AS (
  SELECT resid.vec_id, rcode.code_id,
         sum((resid.rv - rcode.rv) * (resid.rv - rcode.rv)) AS d2
  FROM resid JOIN rcode USING (dim) GROUP BY 1, 2
), b AS (
  SELECT vec_id, code_id, d2 FROM dr
  QUALIFY row_number() OVER (
    PARTITION BY vec_id ORDER BY d2, code_id) = 1
)
SELECT a.cid AS centroid_id, b.code_id,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(b.d2) AS BIGINT) / CAST(count(*) AS DOUBLE)
         AS mean_residual_d2
FROM a JOIN b USING (vec_id)
GROUP BY 1, 2
"""


def tail_mean_above_p95(sf_dir: str):
    """Conditional tail expectation (CVaR-style) per source: the mean
    hourly volume GIVEN the bucket is above the source's own p95 — the
    capacity-planning number a bare p95 hides (how bad the top 5 %
    actually is).  The p95 is the bit-pinned ``quantile_cont`` over
    the 4-dp-rounded series (the winsorized_stats contract), the tail
    test is the identical IEEE compare v > p95 on both engines, tail
    totals are 4-dp-rounded exact sums, and the tail mean is ONE
    divide (NULL when the tail is empty — constant series).  One
    source-keyed exchange over the hourly tier."""
    from ..functions.stats import quantile_cont
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in shard.groupby("event_type", sort=False):
            v = _round_exact(g["sum_value"].to_numpy(dtype=np.float64))
            p95 = quantile_cont(v, 0.95)
            tail = v > p95
            nt = int(tail.sum())
            tt = _round_exact(np.array([v[tail].sum()]))[0] if nt \
                else 0.0
            rows.append({
                "source": src, "n_buckets": int(v.size),
                "p95": round(float(p95), 6), "n_tail": nt,
                "tail_total": tt if nt else np.nan,
                "tail_mean": tt / nt if nt else np.nan})
        return pd.DataFrame(rows, columns=[
            "source", "n_buckets", "p95", "n_tail", "tail_total",
            "tail_mean"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_TAIL_MEAN_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         round(sum(value), 4) AS v
  FROM events GROUP BY 1, 2
), q AS (
  SELECT source, quantile_cont(v, 0.95) AS p95 FROM r GROUP BY source
)
SELECT r.source, count(*) AS n_buckets,
       round(any_value(q.p95), 6) AS p95,
       CAST(count(*) FILTER (v > q.p95) AS BIGINT) AS n_tail,
       round(sum(v) FILTER (v > q.p95), 4) AS tail_total,
       round(sum(v) FILTER (v > q.p95), 4)
         / count(*) FILTER (v > q.p95) AS tail_mean
FROM r JOIN q USING (source)
GROUP BY r.source
"""


def exchange_shard_histogram(sf_dir: str, num_shards: int = 64):
    """The engine's OWN shuffle partitioner, value-checked in SQL: rows
    and distinct keys per shard when the raw hash exchange
    (stages/shard.py — the carrier under every dedup / rollup /
    detector path) partitions the events table on ``user_id`` into 64
    shards.  This is the skew diagnostic a partitioning plan is judged
    by (a hot shard = a straggler reduce task), and it doubles as an
    END-TO-END ORACLE OF THE SHUFFLE PRIMITIVE ITSELF: the engine
    column is produced by the real ``shard_values`` code path, and the
    oracle reimplements the integer key hash —
    (v · 2654435761) mod 2⁶² then mod shards — in HUGEINT arithmetic
    (low 62 bits are unaffected by the int64 wrap, so the mod-2⁶²
    form is exact).  Scale shape: per-batch (shard, rows) counters +
    batch-local distinct (shard, user) pairs ride ONE user-keyed
    exchange (all copies of a user share a fold shard — the standard
    distributed distinct), then a 64-row driver fold."""
    from ..stages.shard import shard_values, sharded_map_groups

    ds = _rd().read_parquet(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id"])
    ns = int(num_shards)

    def tag(tb: pa.Table) -> pd.DataFrame:
        sv = shard_values(tb, ["user_id"], ns)  # the real engine path
        uid = tb["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        pairs = pd.DataFrame({"shard": sv, "user_id": uid}
                             ).drop_duplicates()
        pairs["p_rows"] = 0
        cnt = np.bincount(sv, minlength=ns)
        nz = np.flatnonzero(cnt)
        counters = pd.DataFrame({
            "shard": nz.astype(np.int64),
            # sentinel key: real user_ids are non-negative
            "user_id": -(nz.astype(np.int64) + 1),
            "p_rows": cnt[nz]})
        return pd.concat([pairs, counters], ignore_index=True)

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        real = shard[shard["user_id"] >= 0].drop_duplicates(
            ["shard", "user_id"])
        keys = real.groupby("shard", as_index=False).size().rename(
            columns={"size": "p_keys"})
        keys["p_rows"] = 0
        rows = shard[shard["user_id"] < 0].groupby(
            "shard", as_index=False)[["p_rows"]].sum()
        rows["p_keys"] = 0
        return pd.concat([keys, rows], ignore_index=True)[
            ["shard", "p_keys", "p_rows"]]

    parts = sharded_map_groups(tagged, ["user_id"], fold).to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "shard": pd.Series([], dtype=np.int64),
            "n_rows": pd.Series([], dtype=np.int64),
            "n_keys": pd.Series([], dtype=np.int64)})
    out = parts.groupby("shard", as_index=False).sum()
    return pd.DataFrame({
        "shard": out["shard"].astype(np.int64),
        "n_rows": out["p_rows"].astype(np.int64),
        "n_keys": out["p_keys"].astype(np.int64)})


_EXCHANGE_SHARD_ORACLE = """
WITH h AS (
  SELECT user_id,
         ((CAST(user_id AS HUGEINT) * 2654435761)
            % 4611686018427387904 + 4611686018427387904)
           % 4611686018427387904 AS hv
  FROM events
)
SELECT CAST(hv % 64 AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys
FROM h GROUP BY 1
"""


def checkpoint_partition_census(sf_dir: str, num_partitions: int = 16):
    """The RESUME contract's partitioner, value-checked in SQL: rows
    and distinct sources per checkpoint partition when
    ``stable_key_hash`` (state/checkpoint's FNV-1a over the key
    string — the function that decides which parquet partition a
    source's rows land in, and therefore what a resumed run may skip)
    maps the events sources into 16 partitions.  The oracle replays
    FNV-1a byte-for-byte in DuckDB via ``list_reduce`` over the key's
    character codes (32-bit wrap as BIGINT mod 2³²), so the
    checkpoint layout itself is exact-oracled next to
    ``exchange_shard_histogram``'s shuffle hash.  Scale shape:
    per-batch (partition, rows) counters + batch-local distinct
    (partition, source) pairs through ONE source-keyed exchange, then
    a ≤16-row driver fold."""
    from ..stages.shard import sharded_map_groups, stable_key_hash

    ds = _rd().read_parquet(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_type"])
    np_ = int(num_partitions)

    def tag(tb: pa.Table) -> pd.DataFrame:
        col = tb["event_type"]
        dict_arr = pc.dictionary_encode(col)
        if isinstance(dict_arr, pa.ChunkedArray):
            dict_arr = dict_arr.combine_chunks()
        keys = dict_arr.dictionary.to_numpy(zero_copy_only=False)
        pids = stable_key_hash(keys, np_)  # the real resume path
        idx = dict_arr.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        per_row = pids[idx]
        pairs = pd.DataFrame({
            "part": pids.astype(np.int64),
            "source": keys.astype(object)})
        pairs["p_rows"] = 0
        cnt = np.bincount(per_row, minlength=np_)
        nz = np.flatnonzero(cnt)
        counters = pd.DataFrame({
            "part": nz.astype(np.int64),
            "source": "",  # sources are non-empty strings
            "p_rows": cnt[nz]})
        return pd.concat([pairs, counters], ignore_index=True)

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        real = shard[shard["source"] != ""].drop_duplicates(
            ["part", "source"])
        srcs = real.groupby("part", as_index=False).size().rename(
            columns={"size": "p_sources"})
        srcs["p_rows"] = 0
        rows = shard[shard["source"] == ""].groupby(
            "part", as_index=False)[["p_rows"]].sum()
        rows["p_sources"] = 0
        return pd.concat([srcs, rows], ignore_index=True)[
            ["part", "p_sources", "p_rows"]]

    parts = sharded_map_groups(tagged, ["source"], fold).to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "part": pd.Series([], dtype=np.int64),
            "n_rows": pd.Series([], dtype=np.int64),
            "n_sources": pd.Series([], dtype=np.int64)})
    out = parts.groupby("part", as_index=False).sum()
    return pd.DataFrame({
        "part": out["part"].astype(np.int64),
        "n_rows": out["p_rows"].astype(np.int64),
        "n_sources": out["p_sources"].astype(np.int64)})


_CHECKPOINT_PART_ORACLE = """
WITH h AS (
  -- FNV-1a over the key's UTF-8 OCTETS (hex(encode(...)) pairs), not
  -- code points: stable_key_hash hashes str(k).encode(), so ascii(c)
  -- would silently diverge on any non-ASCII event_type
  SELECT event_type,
         CAST(list_reduce(
           list_prepend(CAST(2166136261 AS HUGEINT),
             list_transform(
               generate_series(1, CAST(length(hex(encode(event_type)))
                                       // 2 AS BIGINT)),
               i -> CAST(CAST(('0x' || substr(hex(encode(event_type)),
                                              CAST(2*i-1 AS BIGINT), 2))
                              AS INTEGER) AS HUGEINT))),
           (h, ch) -> (xor(CAST(h AS BIGINT), CAST(ch AS BIGINT))
                       * 16777619) % 4294967296) % 16 AS BIGINT)
           AS part
  FROM events
)
SELECT part, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_sources
FROM h GROUP BY 1
"""


def fleet_share_hourly(sf_dir: str):
    """Each source's SHARE of the fleet total per hourly bucket — the
    market-share / mix-shift series (a share trending up while the
    fleet total is flat is reallocation, not growth; the input
    ``lead_lag_vs_reference`` and ``reference_correlation`` implicitly
    normalize away).  Exactness: numerator and denominator are exact
    10⁻⁴-unit integer sums; share = v4 / t4 is ONE int/int divide per
    row (NULL when the bucket total is exactly zero — integer
    compare).  Scale shape: the fleet-total series is O(hours) at ANY
    corpus scale — one bucket-keyed integer aggregation, bounded
    driver collect, ``ray.put`` broadcast (the lead_lag contract) —
    and the share map is a stateless per-batch lookup; no second
    shuffle."""
    import ray

    from ..stages.shard import sharded_aggregate

    roll = _events_rollup(sf_dir, "1h").select_columns(
        ["event_type", "bucket_start", "sum_value"])

    def to_units(b: pd.DataFrame) -> pd.DataFrame:
        v4 = np.rint(_round_exact(
            b["sum_value"].to_numpy(np.float64)) * 10000.0
        ).astype(np.int64)
        h = (b["bucket_start"].to_numpy().astype("datetime64[s]")
             .astype(np.int64) // 3600)
        return pd.DataFrame({
            "source": b["event_type"].to_numpy(dtype=object),
            "h": h, "v4": v4})

    units = roll.map_batches(to_units, batch_format="pandas")
    totals = sharded_aggregate(
        units.select_columns(["h", "v4"]).map_batches(
            lambda b: b.groupby("h", as_index=False)["v4"].sum(),
            batch_format="pandas"),
        ["h"], {"v4": "sum"}, num_shards=2).to_pandas()
    tot = dict(zip(totals["h"].astype(np.int64),
                   totals["v4"].astype(np.int64)))
    tot_ref = ray.put(tot)

    def share(b: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(tot_ref)
        t4 = np.array([t[int(h)] for h in b["h"]], dtype=np.int64)
        v4 = b["v4"].to_numpy(np.int64)
        return pd.DataFrame({
            "source": b["source"],
            "bucket_start": (b["h"].to_numpy(np.int64) * 3600
                             ).astype("datetime64[s]"),
            "value": v4 / 10000.0,
            "fleet_total": t4 / 10000.0,
            "share": np.where(t4 != 0, v4 / np.where(t4 != 0, t4, 1),
                              np.nan)})

    return units.map_batches(share, batch_format="pandas")


_FLEET_SHARE_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS v4
  FROM events GROUP BY 1, 2
), t AS (
  SELECT bucket_start, sum(v4) AS t4 FROM r GROUP BY 1
)
SELECT r.source, r.bucket_start,
       r.v4 / 10000.0 AS value,
       CAST(t.t4 AS BIGINT) / 10000.0 AS fleet_total,
       CASE WHEN t.t4 <> 0
            THEN CAST(r.v4 AS DOUBLE) / CAST(t.t4 AS BIGINT)
       END AS share
FROM r JOIN t USING (bucket_start)
"""


def sax_motif_matches(sf_dir: str):
    """Cross-source MOTIF matches on the SAX index: (day, word) combos
    where ≥ 2 sources produced the IDENTICAL daily SAX word — the
    fleet-level payoff of symbolization (two feeds tracing the same
    shape the same day are correlated load, a shared upstream, or a
    copy).  Rides ``sax_daily_words``' oracled symbolization verbatim;
    the census is one (day, word)-keyed exchange over the tiny words
    table with an exact string-identity group, sources reported
    sorted.  Bit-determinism is inherited from the SAX contract."""
    from ..stages.shard import sharded_map_groups

    words = sax_daily_words(sf_dir)

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["day", "word", "source"],
                                  kind="stable")
        g = shard.groupby(["day", "word"], sort=False).agg(
            n_sources=("source", "size"),
            sources=("source", ",".join)).reset_index()
        g = g[g["n_sources"] >= 2]
        return pd.DataFrame({
            "day": g["day"], "word": g["word"],
            "n_sources": g["n_sources"].astype(np.int64),
            "sources": g["sources"].astype(object)})

    return sharded_map_groups(words, ["day", "word"], fold)


_SAX_MOTIF_ORACLE = f"""
WITH sax AS ({_SAX_ORACLE})
SELECT day, word,
       CAST(count(*) AS BIGINT) AS n_sources,
       string_agg(source, ',' ORDER BY source) AS sources
FROM sax GROUP BY 1, 2 HAVING count(*) >= 2
"""


_EMB_DIM_DRIFT_ORACLE = """
WITH b AS (
  SELECT (min(vec_id) + max(vec_id)) // 2 AS split FROM embeddings
), q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS qv
  FROM embeddings
), h AS (
  SELECT q.dim,
         CASE WHEN q.vec_id <= b.split THEN 0 ELSE 1 END AS half,
         count(*) AS n, sum(qv) AS s
  FROM q, b GROUP BY 1, 2
)
SELECT h0.dim,
       CAST(h0.n AS BIGINT) AS n_first,
       CAST(coalesce(h1.n, 0) AS BIGINT) AS n_second,
       CASE WHEN h1.n > 0 THEN
         CAST(CAST(h0.n * h1.s - h1.n * h0.s AS VARCHAR) AS DOUBLE)
           / CAST(CAST(h0.n * h1.n AS VARCHAR) AS DOUBLE) / 1e6
       END AS drift
FROM (SELECT * FROM h WHERE half = 0) h0
LEFT JOIN (SELECT * FROM h WHERE half = 1) h1 USING (dim)
"""


_FLAG_TIER_ORACLE = """
WITH rh AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         sum(value) AS v
  FROM events GROUP BY 1, 2
), qh AS (
  SELECT source, quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3
  FROM rh GROUP BY source
), fh AS (
  SELECT rh.source,
         CAST(epoch(date_trunc('day', rh.b)) AS BIGINT) // 86400 AS day
  FROM rh JOIN qh USING (source)
  WHERE rh.v < qh.q1 - 1.5 * (qh.q3 - qh.q1)
     OR rh.v > qh.q3 + 1.5 * (qh.q3 - qh.q1)
), rd AS (
  SELECT event_type AS source, date_trunc('day', ts) AS b,
         sum(value) AS v
  FROM events GROUP BY 1, 2
), qd AS (
  SELECT source, quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3
  FROM rd GROUP BY source
), fd AS (
  SELECT rd.source,
         CAST(epoch(rd.b) AS BIGINT) // 86400 AS day
  FROM rd JOIN qd USING (source)
  WHERE rd.v < qd.q1 - 1.5 * (qd.q3 - qd.q1)
     OR rd.v > qd.q3 + 1.5 * (qd.q3 - qd.q1)
)
SELECT fh.source, CAST(count(*) AS BIGINT) AS n_hour_flags,
       CAST(sum(CASE WHEN fd.day IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_corroborated,
       CAST(sum(CASE WHEN fd.day IS NOT NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / count(*) AS corroborated_share
FROM fh LEFT JOIN fd ON fd.source = fh.source AND fd.day = fh.day
GROUP BY 1
"""


def session_depth_histogram(sf_dir: str):
    """Session-depth histogram: count of sessions by events-per-session
    (the engagement-depth profile over the same >30-min-idle sessions
    as ``session_windows``; bucket = exact event count, capped at 20+
    so the output is bounded).  Sessions resolve in the user-keyed
    exchange; only (depth_bucket, n_sessions) integer partials leave
    it."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts"])
    gap = pd.Timedelta(minutes=30)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        user_change = g["user_id"].ne(g["user_id"].shift())
        new_session = user_change | (g["ts"].diff() > gap)
        sizes = new_session.cumsum().value_counts().to_numpy()
        depth = np.minimum(sizes, 20).astype(np.int64)
        h = pd.DataFrame({"depth_bucket": depth,
                          "n_sessions": 1}).groupby(
            "depth_bucket", as_index=False).sum()
        h["n_sessions"] = h["n_sessions"].astype(np.int64)
        return h

    parts = sharded_map_groups(ds, "user_id", fold)
    return sharded_aggregate(parts, "depth_bucket",
                             {"n_sessions": "sum"}, num_shards=2)


_SESSION_DEPTH_ORACLE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *, sum(new_session) OVER (
      PARTITION BY user_id ORDER BY ts
      ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
), sz AS (
  SELECT user_id, session_id, count(*) AS n
  FROM numbered GROUP BY 1, 2
)
SELECT CAST(least(n, 20) AS BIGINT) AS depth_bucket,
       CAST(count(*) AS BIGINT) AS n_sessions
FROM sz GROUP BY 1
"""


_LANG_MIX_TV_ORACLE = """
WITH c AS (
  SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2
), ns AS (
  SELECT source, CAST(sum(c) AS HUGEINT) AS n FROM c GROUP BY 1
), tot AS (
  SELECT CAST(sum(c) AS HUGEINT) AS N FROM c
), cl AS (
  SELECT lang, CAST(sum(c) AS HUGEINT) AS cl FROM c GROUP BY 1
), m AS (
  SELECT s.source, l.lang, l.cl,
         CAST(coalesce(c.c, 0) AS HUGEINT) AS csl
  FROM (SELECT source FROM ns) s
  CROSS JOIN cl l
  LEFT JOIN c ON c.source = s.source AND c.lang = l.lang
), num AS (
  SELECT m.source, sum(abs(m.csl * tot.N - m.cl * ns.n)) AS num
  FROM m CROSS JOIN tot JOIN ns ON ns.source = m.source
  GROUP BY 1
)
SELECT num.source, CAST(ns.n AS BIGINT) AS n_docs,
       CAST(CAST(num.num AS VARCHAR) AS DOUBLE)
         / CAST(CAST(2 * ns.n * tot.N AS VARCHAR) AS DOUBLE) AS tv_drift
FROM num JOIN ns ON ns.source = num.source CROSS JOIN tot
"""


def mom_growth(sf_dir: str):
    """Month-over-month volume growth per source on the CALENDAR
    monthly tier (the rollup_monthly cascade): exact delta of
    10⁻⁴-unit integers between consecutive observed months plus one
    ratio divide — the board-deck growth number next to the
    day-over-day and week-over-week operators.  One source-keyed
    exchange; consecutive = next observed month row (both sides)."""
    from ..stages.shard import sharded_map_groups

    roll = rollup_monthly(sf_dir).select_columns(
        ["source", "bucket_start", "sum_value"])

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["source", "bucket_start"],
                                  kind="stable")
        out = []
        for src, g in shard.groupby("source", sort=False):
            v4 = np.rint(g["sum_value"].to_numpy(np.float64)
                         * 10000.0).astype(np.int64)
            if v4.size < 2:
                continue
            cur, prev = v4[1:], v4[:-1]
            out.append(pd.DataFrame({
                "source": src,
                "month": g["bucket_start"].to_numpy()[1:],
                "sum_value": cur / 10000.0,
                "prev_month": prev / 10000.0,
                "delta": (cur - prev) / 10000.0,
                "ratio": np.where(prev != 0,
                                  cur / prev.astype(np.float64),
                                  np.nan)}))
        if not out:
            return pd.DataFrame({
                "source": pd.Series([], dtype=object),
                "month": pd.Series([], dtype="datetime64[us]"),
                "sum_value": pd.Series([], dtype=np.float64),
                "prev_month": pd.Series([], dtype=np.float64),
                "delta": pd.Series([], dtype=np.float64),
                "ratio": pd.Series([], dtype=np.float64)})
        return pd.concat(out, ignore_index=True)

    return sharded_map_groups(roll, "source", fold)


_MOM_GROWTH_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('month', ts) AS month,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS v4
  FROM events GROUP BY 1, 2
), l AS (
  SELECT source, month, v4,
         lag(v4) OVER (PARTITION BY source ORDER BY month) AS pv4
  FROM r
)
SELECT source, month,
       CAST(v4 AS DOUBLE) / 10000.0 AS sum_value,
       CAST(pv4 AS DOUBLE) / 10000.0 AS prev_month,
       CAST(v4 - pv4 AS DOUBLE) / 10000.0 AS delta,
       CASE WHEN pv4 <> 0
            THEN CAST(v4 AS DOUBLE) / CAST(pv4 AS DOUBLE)
            ELSE NULL END AS ratio
FROM l WHERE pv4 IS NOT NULL
"""


def session_first_touch_purchases(sf_dir: str):
    """First-touch attribution: for every session (>30-min-idle rule),
    credit its FIRST event type with the session's purchase count and
    purchase value — the acquisition-channel report.  Sessions resolve
    inside the user-keyed exchange ((ts, event_id)-pinned ordering);
    only per-(first_type) integer/round-exact partials leave it.
    Purchase value is the exact round(sum,4) of each session's
    purchase events summed AFTER rounding per session — both sides
    apply the identical two-level rule."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type", "value"])
    gap = pd.Timedelta(minutes=30)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        user_change = g["user_id"].ne(g["user_id"].shift())
        new_session = user_change | (g["ts"].diff() > gap)
        sid = new_session.cumsum()
        g = g.assign(sid=sid)
        first = g.groupby("sid", sort=False)["event_type"].first()
        pur = g[g["event_type"] == "purchase"]
        pn = pur.groupby("sid")["value"].agg(["size", "sum"])
        out = pd.DataFrame({
            "first_type": first,
            "n_sessions": np.int64(1),
            "n_purchases": pn["size"].reindex(first.index)
            .fillna(0).astype(np.int64),
            "purchase_value": _round_exact(
                pn["sum"].reindex(first.index).fillna(0.0)
                .to_numpy(np.float64)),
        })
        agg = out.groupby("first_type", as_index=False).agg(
            n_sessions=("n_sessions", "sum"),
            n_purchases=("n_purchases", "sum"),
            purchase_value=("purchase_value", "sum"))
        return agg

    parts = sharded_map_groups(ds, "user_id", fold)
    agg = sharded_aggregate(parts, "first_type",
                            {"n_sessions": "sum", "n_purchases": "sum",
                             "purchase_value": "sum"},
                            num_shards=2)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "first_type": b["first_type"],
            "n_sessions": b["n_sessions"].astype(np.int64),
            "n_purchases": b["n_purchases"].astype(np.int64),
            "purchase_value": _round_exact(
                b["purchase_value"].to_numpy(np.float64))})

    return agg.map_batches(fin, batch_format="pandas")


_FIRST_TOUCH_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type, value,
         CASE WHEN ts - lag(ts) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *, sum(new_session) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
), firsts AS (
  SELECT user_id, session_id, event_type AS first_type
  FROM (SELECT *, row_number() OVER (
          PARTITION BY user_id, session_id
          ORDER BY ts, event_id) AS rn
        FROM numbered)
  WHERE rn = 1
), sess AS (
  SELECT user_id, session_id,
         count(*) FILTER (event_type = 'purchase') AS n_pur,
         round(coalesce(sum(value) FILTER (event_type = 'purchase'),
                        0), 4) AS pv
  FROM numbered GROUP BY 1, 2
)
SELECT f.first_type, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(s.n_pur) AS BIGINT) AS n_purchases,
       round(sum(s.pv), 4) AS purchase_value
FROM sess s JOIN firsts f USING (user_id, session_id)
GROUP BY 1
"""


_CENTROID_PURITY_ORACLE = """
WITH q AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS qv
  FROM embeddings
), ls AS (
  SELECT label, dim, CAST(sum(qv) AS HUGEINT) AS s FROM q GROUP BY 1, 2
), ln AS (
  SELECT label, CAST(count(*) AS HUGEINT) AS n FROM embeddings GROUP BY 1
), dmat AS (
  SELECT q.vec_id, q.label AS own_label, ls.label AS cand_label,
         sum((CAST(q.qv AS HUGEINT) * ln.n - ls.s)
             * (CAST(q.qv AS HUGEINT) * ln.n - ls.s)) AS dnum,
         any_value(ln.n) AS cand_n
  FROM q JOIN ls ON ls.dim = q.dim
         JOIN ln ON ln.label = ls.label
  GROUP BY 1, 2, 3
), flag AS (
  SELECT own.vec_id, own.own_label AS label,
         max(CASE WHEN riv.dnum * own.cand_n * own.cand_n
                       < own.dnum * riv.cand_n * riv.cand_n
                  THEN 1 ELSE 0 END) AS viol
  FROM dmat own
  JOIN dmat riv ON riv.vec_id = own.vec_id
               AND riv.cand_label <> own.own_label
  WHERE own.cand_label = own.own_label
  GROUP BY 1, 2
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(viol) AS BIGINT) AS n_violations
FROM flag GROUP BY 1
"""


def daily_hhi(sf_dir: str):
    """Daily Herfindahl-Hirschman concentration of volume across
    sources — 'is today's traffic one feed or the fleet?' (HHI → 1 is
    a single-source day; → 1/k is even).  EXACT rational: with
    per-(day, source) volume v = round(sum,4)·10⁴ ints, HHI =
    Σ_s v_s² / (Σ_s v_s)² — bigint numerator and denominator folded in
    Python ints over the bounded days×sources table, ONE
    VARCHAR-bridged divide.  Days whose total volume is 0 are omitted
    (both sides).  Map-only partials + one tiny exchange."""
    from ..stages.shard import sharded_aggregate

    ds = _rd().read_parquet(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_type", "ts", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        day = (batch["ts"].to_numpy().astype("datetime64[s]")
               .astype(np.int64) // 86400)
        g = pd.DataFrame({
            "source": batch["event_type"], "day": day,
            "sv": batch["value"].to_numpy(np.float64),
        }).groupby(["source", "day"], as_index=False)["sv"].sum()
        return g

    cells = sharded_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["source", "day"], {"sv": "sum"}, num_shards=2).to_pandas()
    if cells.empty:
        return pd.DataFrame({
            "day": pd.Series([], dtype="datetime64[us]"),
            "n_sources": pd.Series([], dtype=np.int64),
            "hhi": pd.Series([], dtype=np.float64)})
    v4 = np.rint(_round_exact(cells["sv"].to_numpy(np.float64))
                 * 10000.0).astype(np.int64)
    cells = cells.assign(v4=v4)
    rows = []
    for day, g in cells.groupby("day"):
        vs = [int(v) for v in g["v4"]]
        tot = sum(vs)
        if tot == 0:
            continue
        num = sum(v * v for v in vs)
        rows.append({
            "day": pd.Timestamp(int(day) * 86400, unit="s"),
            "n_sources": len(vs),
            "hhi": float(num) / float(tot * tot)})
    return pd.DataFrame(rows, columns=["day", "n_sources", "hhi"])


_DAILY_HHI_ORACLE = """
WITH c AS (
  SELECT event_type AS source,
         CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS v4
  FROM events GROUP BY 1, 2
), a AS (
  SELECT day, count(*) AS n_sources,
         sum(CAST(v4 AS HUGEINT) * v4) AS num,
         sum(CAST(v4 AS HUGEINT)) AS tot
  FROM c GROUP BY 1
)
SELECT to_timestamp(day * 86400) AT TIME ZONE 'UTC' AS day,
       CAST(n_sources AS BIGINT) AS n_sources,
       CAST(CAST(num AS VARCHAR) AS DOUBLE)
         / CAST(CAST(tot * tot AS VARCHAR) AS DOUBLE) AS hhi
FROM a WHERE tot <> 0
"""


def peak_concurrent_sessions(sf_dir: str):
    """Peak CONCURRENT sessions over the whole stream — the capacity
    number a connection-pool/serving planner asks for — via the classic
    sweep line over session intervals: +1 at each session start, −1
    just after each (inclusive) end, running-sum max.  Sessions come
    out of the same >30-min-idle rule as ``session_windows`` inside
    the user-keyed exchange; only the (start_us, end_us) interval
    table leaves it — bounded by session count, orders of magnitude
    below the event stream (the documented driver-fold bound).  Tie
    rule pinned both sides: at equal timestamps +1 sorts before −1
    (inclusive ends), and the earliest instant attaining the peak is
    reported.  Pure integer microsecond arithmetic."""
    from ..stages.shard import sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts"])
    gap = pd.Timedelta(minutes=30)

    def sessions_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        user_change = g["user_id"].ne(g["user_id"].shift())
        new_session = user_change | (g["ts"].diff() > gap)
        sid = new_session.cumsum()
        out = g.groupby(sid).agg(start=("ts", "min"), end=("ts", "max"))
        return pd.DataFrame({
            "start_us": out["start"].to_numpy()
            .astype("datetime64[us]").astype(np.int64),
            "end_us": out["end"].to_numpy()
            .astype("datetime64[us]").astype(np.int64)})

    iv = sharded_map_groups(ds, "user_id", sessions_shard).to_pandas()
    if iv.empty:
        return pd.DataFrame({
            "peak_sessions": pd.Series([], dtype=np.int64),
            "at_ts": pd.Series([], dtype="datetime64[us]"),
            "n_sessions": pd.Series([], dtype=np.int64)})
    t = np.concatenate([iv["start_us"].to_numpy(np.int64),
                        iv["end_us"].to_numpy(np.int64)])
    d = np.concatenate([np.ones(len(iv), dtype=np.int64),
                        -np.ones(len(iv), dtype=np.int64)])
    # +1 before −1 at equal instants (inclusive ends): sort by (t, -d)
    order = np.lexsort((-d, t))
    run = np.cumsum(d[order])
    peak = int(run.max())
    at_us = int(t[order][int(np.argmax(run))])  # first max = earliest
    return pd.DataFrame({
        "peak_sessions": np.array([peak], dtype=np.int64),
        "at_ts": pd.to_datetime([at_us], unit="us"),
        "n_sessions": np.array([len(iv)], dtype=np.int64)})


_PEAK_SESSIONS_ORACLE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *, sum(new_session) OVER (
      PARTITION BY user_id ORDER BY ts
      ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
), sess AS (
  SELECT epoch_us(min(ts)) AS s_us, epoch_us(max(ts)) AS e_us
  FROM numbered GROUP BY user_id, session_id
), pts AS (
  SELECT s_us AS t, 1 AS d FROM sess
  UNION ALL SELECT e_us, -1 FROM sess
), run AS (
  SELECT t, sum(d) OVER (ORDER BY t, d DESC
                         ROWS UNBOUNDED PRECEDING) AS c
  FROM pts
)
SELECT CAST(c AS BIGINT) AS peak_sessions,
       to_timestamp(CAST(t AS DOUBLE) / 1000000) AT TIME ZONE 'UTC'
         AS at_ts,
       (SELECT CAST(count(*) AS BIGINT) FROM sess) AS n_sessions
FROM run ORDER BY c DESC, t ASC LIMIT 1
"""


_EMBEDDING_DUP_ORACLE = """
SELECT min(vec_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups
FROM embeddings GROUP BY embedding HAVING count(*) >= 2
"""


def daily_peak_hour_mode(sf_dir: str):
    """Peak-hour stability per source: each day's peak hour-of-day
    (argmax hourly sum, ties → earliest hour) reduced to the MODAL
    peak hour and its share of days — a stable mode near 1.0 means the
    diurnal cycle is dependable enough for seasonal detectors; a flat
    mode means the source has no reliable peak.  All selections are on
    exact 10⁻⁴-unit ints with pinned tie orders ((y DESC, hour ASC)
    within day; (days DESC, hour ASC) across days); the share is ONE
    int/int divide.  One source-keyed exchange over the hourly tier."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, _bs, xs, y4 in _hourly_int_units(shard):
            day = xs // 24
            hod = xs % 24
            d = pd.DataFrame({"day": day, "hod": hod, "y": y4})
            d = d.sort_values(["day", "y", "hod"],
                              ascending=[True, False, True], kind="stable")
            pk = d.groupby("day", as_index=False).first()
            m = pk.groupby("hod", as_index=False).size()
            m = m.sort_values(["size", "hod"], ascending=[False, True],
                              kind="stable")
            n_days = int(len(pk))
            rows.append({
                "source": src, "n_days": n_days,
                "modal_peak_hour": int(m["hod"].iloc[0]),
                "mode_days": int(m["size"].iloc[0]),
                "mode_share": float(int(m["size"].iloc[0]))
                / float(n_days)})
        return pd.DataFrame(rows, columns=[
            "source", "n_days", "modal_peak_hour", "mode_days",
            "mode_share"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_DAILY_PEAK_MODE_ORACLE = """
WITH r AS (
  SELECT event_type AS source,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS h,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), pk AS (
  SELECT source, h // 24 AS day, h % 24 AS peak_hour
  FROM r
  QUALIFY row_number() OVER (
      PARTITION BY source, h // 24 ORDER BY y DESC, h % 24 ASC) = 1
), m AS (
  SELECT source, peak_hour, count(*) AS mode_days FROM pk GROUP BY 1, 2
), n AS (
  SELECT source, count(*) AS n_days FROM pk GROUP BY 1
)
SELECT m.source, n.n_days, m.peak_hour AS modal_peak_hour, m.mode_days,
       CAST(m.mode_days AS DOUBLE) / CAST(n.n_days AS DOUBLE)
         AS mode_share
FROM m JOIN n ON n.source = m.source
QUALIFY row_number() OVER (
    PARTITION BY m.source ORDER BY m.mode_days DESC, m.peak_hour ASC) = 1
"""


_TYPE_SIZE_CONTINGENCY_ORACLE = """
WITH o AS (
  SELECT p_type, p_size, count(*) AS o FROM part GROUP BY 1, 2
), r AS (
  SELECT p_type, sum(o) AS r FROM o GROUP BY 1
), c AS (
  SELECT p_size, sum(o) AS c FROM o GROUP BY 1
), nn AS (
  SELECT sum(o) AS n FROM o
)
SELECT o.p_type, o.p_size, CAST(o.o AS BIGINT) AS observed,
       CAST(r.r * c.c AS BIGINT) AS expected_num,
       CAST(CAST((o.o * nn.n - r.r * c.c) * (o.o * nn.n - r.r * c.c)
                 AS VARCHAR) AS DOUBLE)
       / CAST(CAST(nn.n * r.r * c.c AS VARCHAR) AS DOUBLE) AS cell_chi2
FROM o JOIN r USING (p_type) JOIN c USING (p_size) CROSS JOIN nn
"""


def rollup_grouping_sets(sf_dir: str):
    """Multi-level daily census in ONE pass — GROUPING SETS
    ((source, day), (source), (day), ()) with counts and exact
    round(sum,4) totals: the OLAP-cube shape a dashboard backend
    issues, computed from a single finest-level partial table instead
    of four scans.  Engine: per-batch (source, day) float-sum/int-count
    partials → one tiny exchange finishes the finest level → the three
    coarser levels re-aggregate THE SAME partials on the driver
    (bounded by sources×days rows); every emitted sum applies
    ``_round_exact`` to its own full-precision float total, matching
    DuckDB's round(sum(value), 4) per grouping set (the rollup-tier
    argument: 2-decimal inputs keep float drift orders below the 1e-4
    quantum).  grouping_id: 0=cell, 1=source total, 2=day total,
    3=grand total; NULL dims encode as '' / 1970-01-01 sentinels on
    BOTH sides to keep the hash comparable."""
    from ..stages.shard import sharded_aggregate

    ds = _rd().read_parquet(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_type", "ts", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        day = (batch["ts"].to_numpy().astype("datetime64[s]")
               .astype(np.int64) // 86400)
        g = pd.DataFrame({
            "source": batch["event_type"], "day": day,
            "n_events": 1, "sv": batch["value"].to_numpy(np.float64),
        }).groupby(["source", "day"], as_index=False).agg(
            n_events=("n_events", "sum"), sv=("sv", "sum"))
        g["n_events"] = g["n_events"].astype(np.int64)
        return g

    cells = sharded_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["source", "day"], {"n_events": "sum", "sv": "sum"},
        num_shards=2).to_pandas()
    cols = ["grouping_id", "source", "day", "n_events", "sum_value"]
    if cells.empty:
        return pd.DataFrame({
            "grouping_id": pd.Series([], dtype=np.int64),
            "source": pd.Series([], dtype=object),
            "day": pd.Series([], dtype="datetime64[us]"),
            "n_events": pd.Series([], dtype=np.int64),
            "sum_value": pd.Series([], dtype=np.float64)})

    def emit(df, gid, with_src, with_day):
        return pd.DataFrame({
            "grouping_id": np.full(len(df), gid, dtype=np.int64),
            "source": df["source"] if with_src
            else np.full(len(df), "", dtype=object),
            "day": pd.to_datetime(
                (df["day"].to_numpy(np.int64) if with_day else
                 np.zeros(len(df), dtype=np.int64)) * 86400, unit="s"),
            "n_events": df["n_events"].to_numpy(np.int64),
            "sum_value": _round_exact(df["sv"].to_numpy(np.float64))})

    finest = cells.groupby(["source", "day"], as_index=False).agg(
        n_events=("n_events", "sum"), sv=("sv", "sum"))
    by_src = finest.groupby("source", as_index=False).agg(
        n_events=("n_events", "sum"), sv=("sv", "sum"))
    by_day = finest.groupby("day", as_index=False).agg(
        n_events=("n_events", "sum"), sv=("sv", "sum"))
    by_day["source"] = ""
    grand = pd.DataFrame({
        "source": [""], "day": [0],
        "n_events": [finest["n_events"].sum()],
        "sv": [finest["sv"].sum()]})
    by_src["day"] = 0
    return pd.concat([
        emit(finest, 0, True, True), emit(by_src, 1, True, False),
        emit(by_day, 2, False, True), emit(grand, 3, False, False),
    ], ignore_index=True)[cols]


_GROUPING_SETS_ORACLE = """
SELECT CASE WHEN event_type IS NULL AND d IS NULL THEN 3
            WHEN event_type IS NULL THEN 2
            WHEN d IS NULL THEN 1 ELSE 0 END AS grouping_id,
       coalesce(event_type, '') AS source,
       coalesce(d, TIMESTAMP '1970-01-01') AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS sum_value
FROM (SELECT event_type, date_trunc('day', ts) AS d, value FROM events)
GROUP BY GROUPING SETS ((event_type, d), (event_type), (d), ())
"""


def poisson_rate_flags_1h(sf_dir: str):
    """Count-based anomaly flags at the hourly tier: a (source, hour)
    bucket is flagged when its EVENT COUNT deviates from the source's
    mean hourly count by more than 3·√mean — the Poisson-rate control
    band that catches ingestion stalls/bursts the value-based IQR band
    misses (n_points vs sum_value are independent signals).  The test
    |c − S/n| > 3·√(S/n) is evaluated as the PURE-INTEGER compare
    (c·n − S)² > 9·S·n (multiplied through by n²) in Python bigints /
    HUGEINT, so the flag set is bit-deterministic at any magnitude.
    Rides the memoized hourly rollup through one source-keyed
    exchange."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["event_type", "bucket_start"],
                                  kind="stable")
        out = []
        for src, g in shard.groupby("event_type", sort=False):
            c = [int(x) for x in g["n_points"].to_numpy(np.int64)]
            n, s = len(c), sum(c)
            keep = [i for i, ci in enumerate(c)
                    if (ci * n - s) ** 2 > 9 * s * n]
            if keep:
                out.append(pd.DataFrame({
                    "source": src,
                    "bucket_start": g["bucket_start"].iloc[keep].to_numpy(),
                    "n_events": np.asarray([c[i] for i in keep], np.int64),
                    "total_events": np.int64(s),
                    "n_buckets": np.int64(n)}))
        if not out:
            return pd.DataFrame({
                "source": pd.Series([], dtype=object),
                "bucket_start": pd.Series([], dtype="datetime64[us]"),
                "n_events": pd.Series([], dtype=np.int64),
                "total_events": pd.Series([], dtype=np.int64),
                "n_buckets": pd.Series([], dtype=np.int64)})
        return pd.concat(out, ignore_index=True)

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "n_points"]),
        "event_type", fold)


_POISSON_FLAGS_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         CAST(count(*) AS HUGEINT) AS c
  FROM events GROUP BY 1, 2
), t AS (
  SELECT source, sum(c) AS s, CAST(count(*) AS HUGEINT) AS n
  FROM r GROUP BY 1
)
SELECT r.source, r.b AS bucket_start, CAST(r.c AS BIGINT) AS n_events,
       CAST(t.s AS BIGINT) AS total_events, CAST(t.n AS BIGINT) AS n_buckets
FROM r JOIN t USING (source)
WHERE (r.c * t.n - t.s) * (r.c * t.n - t.s) > 9 * t.s * t.n
"""


def variance_changepoint(sf_dir: str):
    """ICSS-style variance-changepoint per source: argmax over split
    points i of |n·E2ᵢ − i·E2ₙ| where E2 is the running sum of SQUARED
    integer deviations eₕ = n·yₕ − T (the dominant_acf_lag demeaning
    trick: multiply through by n so centering stays in ℤ) — the scale-
    shift twin of cusum_changepoint's level test.  e² reaches ~10²³ at
    sf0.1 magnitudes, so partial sums fold in Python bigints / HUGEINT
    by design; the reported statistic is ONE double divide through the
    VARCHAR bridge (DuckDB's HUGEINT→DOUBLE cast is not correctly
    rounded past 2⁶⁴).  Earliest-tie pinned (np.argmax ≡ QUALIFY
    ORDER BY stat DESC, bucket ASC)."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["event_type", "bucket_start"],
                                  kind="stable")
        rows = []
        for src, g in shard.groupby("event_type", sort=False):
            v = _round_exact(g["sum_value"].to_numpy(np.float64))
            y = [int(x) for x in np.rint(v * 10000.0).astype(np.int64)]
            n = len(y)
            if n < 2:
                continue
            t = sum(y)
            e2 = [(n * yi - t) ** 2 for yi in y]
            tot = sum(e2)
            if tot == 0:
                continue  # constant series: no variance structure
            best_i, best_stat, run = 0, -1, 0
            for i in range(1, n):
                run += e2[i - 1]
                stat = abs(n * run - i * tot)
                if stat > best_stat:
                    best_i, best_stat = i, stat
            rows.append({
                "source": src,
                "change_bucket": g["bucket_start"].iloc[best_i - 1],
                "n_buckets": np.int64(n),
                "var_stat": float(best_stat) / float(n * tot)})
        return pd.DataFrame(rows, columns=[
            "source", "change_bucket", "n_buckets", "var_stat"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_VARIANCE_CHANGEPOINT_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         CAST(CAST(round(round(sum(value), 4) * 10000) AS BIGINT)
              AS HUGEINT) AS y
  FROM events GROUP BY 1, 2
), s AS (
  SELECT source, b, y,
         CAST(count(*) OVER (PARTITION BY source) AS HUGEINT) AS n,
         sum(y) OVER (PARTITION BY source) AS t
  FROM r
), e AS (
  SELECT source, b, n, (n * y - t) * (n * y - t) AS e2 FROM s
), c AS (
  SELECT source, b, n,
         sum(e2) OVER (PARTITION BY source ORDER BY b
                       ROWS UNBOUNDED PRECEDING) AS run,
         CAST(row_number() OVER (PARTITION BY source ORDER BY b)
              AS HUGEINT) AS i,
         sum(e2) OVER (PARTITION BY source) AS tot
  FROM e
)
SELECT source, b AS change_bucket, CAST(n AS BIGINT) AS n_buckets,
       CAST(CAST(abs(n * run - i * tot) AS VARCHAR) AS DOUBLE)
         / CAST(CAST(n * tot AS VARCHAR) AS DOUBLE) AS var_stat
FROM c
WHERE i < n AND n >= 2 AND tot > 0
QUALIFY row_number() OVER (
  PARTITION BY source ORDER BY abs(n * run - i * tot) DESC, b ASC) = 1
"""


def sma_crossover_count(sf_dir: str, fast: int = 6, slow: int = 24):
    """Fast/slow moving-average crossover census per source — how often
    the 6-bucket SMA crosses the 24-bucket SMA on the hourly tier (the
    trend-turn counter behind trading-style alert rules; a high count
    means oscillation, a low count sustained regimes).  Row-based
    trailing windows over observed buckets; the compare Sf/6 vs Ss/24
    is multiplied through to the INTEGER 4·Sf − Ss, and a crossing is
    a strict sign flip between CONSECUTIVE full-window rows (the
    mean_crossings convention; zeros break runs on both sides because
    the flip test requires strictly opposite signs).  One source-keyed
    exchange; windows via one cumulative sum, no per-row loop."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["event_type", "bucket_start"],
                                  kind="stable")
        rows = []
        for src, g in shard.groupby("event_type", sort=False):
            v = _round_exact(g["sum_value"].to_numpy(np.float64))
            y = np.rint(v * 10000.0).astype(np.int64)
            n = int(y.size)
            nw = max(n - (slow - 1), 0)
            if nw == 0:
                rows.append({"source": src, "n_windows": 0,
                             "n_crossings": 0})
                continue
            cs = np.concatenate([[0], np.cumsum(y)])
            i = np.arange(slow - 1, n)
            sf_ = cs[i + 1] - cs[i + 1 - fast]
            ss = cs[i + 1] - cs[i + 1 - slow]
            d = 4 * sf_ - ss
            flips = int((((d[:-1] > 0) & (d[1:] < 0))
                         | ((d[:-1] < 0) & (d[1:] > 0))).sum())
            rows.append({"source": src, "n_windows": nw,
                         "n_crossings": flips})
        out = pd.DataFrame(rows, columns=[
            "source", "n_windows", "n_crossings"])
        out["n_windows"] = out["n_windows"].astype(np.int64)
        out["n_crossings"] = out["n_crossings"].astype(np.int64)
        return out

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_SMA_CROSSOVER_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), s AS (
  SELECT source, b,
         row_number() OVER (PARTITION BY source ORDER BY b) AS i,
         count(*) OVER (PARTITION BY source) AS n,
         sum(y) OVER (PARTITION BY source ORDER BY b
                      ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS sf,
         sum(y) OVER (PARTITION BY source ORDER BY b
                      ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS ss
  FROM r
), d AS (
  SELECT source, i, n, 4 * sf - ss AS d,
         lead(4 * sf - ss) OVER (PARTITION BY source ORDER BY i) AS dn
  FROM s WHERE i >= 24
), f AS (
  SELECT source, max(n) AS n,
         count(*) FILTER ((d > 0 AND dn < 0) OR (d < 0 AND dn > 0))
           AS n_crossings
  FROM d GROUP BY source
), allsrc AS (
  SELECT source, count(*) AS n FROM r GROUP BY source
)
SELECT a.source,
       CAST(greatest(a.n - 23, 0) AS BIGINT) AS n_windows,
       CAST(coalesce(f.n_crossings, 0) AS BIGINT) AS n_crossings
FROM allsrc a LEFT JOIN f USING (source)
"""


_KNN_INDEGREE_ORACLE = """
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS qv
  FROM embeddings
), d AS (
  SELECT a.vec_id AS src, b.vec_id AS nbr,
         sum((a.qv - b.qv) * (a.qv - b.qv)) AS dist
  FROM q a JOIN q b ON a.dim = b.dim AND a.vec_id <> b.vec_id
  GROUP BY 1, 2
), nn AS (
  SELECT src, nbr FROM d
  QUALIFY row_number() OVER (
    PARTITION BY src ORDER BY dist, nbr) = 1
), deg AS (
  SELECT e.vec_id, count(nn.src) AS in_degree
  FROM embeddings e LEFT JOIN nn ON nn.nbr = e.vec_id
  GROUP BY 1
)
SELECT CAST(in_degree AS BIGINT) AS in_degree,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM deg GROUP BY 1
"""


def rescaled_range_stat(sf_dir: str):
    """Hurst-style rescaled-range statistic per source at the hourly
    tier: (R/S)² where R is the range of the mean-adjusted cumulative
    sums and S the population std — the long-memory screen (persistent
    trends score high, white noise low) run before choosing a
    forecasting model.  Exactness: with Zᵢ = n·Cᵢ − i·T (cumulative
    sums multiplied through by n so demeaning stays in ℤ),
    R_n = max Z − min Z and n²S² = n·S2 − T² are EXACT integers
    (Python bigint / HUGEINT — R_n² reaches ~10²⁹ by design), and
    (R/S)² = R_n²/(n·S2 − T²); ONE double divide through the VARCHAR
    bridge.  One source-keyed exchange over the bounded hourly tier."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, _bs, _xs, y4 in _hourly_int_units(shard):
            y = [int(v) for v in y4.tolist()]
            n = len(y)
            if n < 2:
                continue
            t = sum(y)
            den = n * sum(v * v for v in y) - t * t
            if den == 0:
                continue  # constant series: S = 0, ratio undefined
            z, c, mx, mn = 0, 0, None, None
            for i, v in enumerate(y, start=1):
                c += v
                z = n * c - i * t
                mx = z if mx is None or z > mx else mx
                mn = z if mn is None or z < mn else mn
            r = mx - mn
            rows.append({"source": src, "n_buckets": np.int64(n),
                         "rs_sq": float(r * r) / float(den)})
        return pd.DataFrame(rows, columns=["source", "n_buckets", "rs_sq"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_RESCALED_RANGE_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         CAST(CAST(round(round(sum(value), 4) * 10000) AS BIGINT)
              AS HUGEINT) AS y
  FROM events GROUP BY 1, 2
), s AS (
  SELECT source, b, y,
         CAST(count(*) OVER (PARTITION BY source) AS HUGEINT) AS n,
         sum(y) OVER (PARTITION BY source) AS t,
         sum(y * y) OVER (PARTITION BY source) AS s2,
         sum(y) OVER (PARTITION BY source ORDER BY b
                      ROWS UNBOUNDED PRECEDING) AS c,
         CAST(row_number() OVER (PARTITION BY source ORDER BY b)
              AS HUGEINT) AS i
  FROM r
), z AS (
  SELECT source, n, t, s2, n * c - i * t AS z FROM s
), agg AS (
  SELECT source, max(n) AS n, max(z) - min(z) AS r,
         max(n) * max(s2) - max(t) * max(t) AS den
  FROM z GROUP BY source
)
SELECT source, CAST(n AS BIGINT) AS n_buckets,
       CAST(CAST(r * r AS VARCHAR) AS DOUBLE)
         / CAST(CAST(den AS VARCHAR) AS DOUBLE) AS rs_sq
FROM agg WHERE n >= 2 AND den <> 0
"""


def successive_diff_stats(sf_dir: str):
    """Volatility census per source: median and max of the ABSOLUTE
    successive differences |yₕ₊₁ − yₕ| over the bucket-sorted hourly
    tier (row-adjacent observed buckets; gaps do not split the series
    — pinned on both sides) — the roughness profile that separates
    smooth seasonal sources from jittery ones.  Diffs are exact 10⁻⁴
    ints; the reported median divides each diff by 10⁴ (identical IEEE
    op both sides) and runs the bit-pinned quantile_cont two-product
    lerp; the max stays BIGINT.  One source-keyed exchange."""
    from ..functions.stats import quantile_cont
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, _bs, _xs, y4 in _hourly_int_units(shard):
            if y4.size < 2:
                continue
            d = np.abs(np.diff(y4))
            rows.append({
                "source": src, "n_diffs": np.int64(d.size),
                "med_abs_diff": float(quantile_cont(
                    d.astype(np.float64) / 10000.0, 0.5)),
                "max_abs_diff": np.int64(d.max())})
        return pd.DataFrame(rows, columns=[
            "source", "n_diffs", "med_abs_diff", "max_abs_diff"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_SUCCESSIVE_DIFF_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), d AS (
  SELECT source,
         abs(y - lag(y) OVER (PARTITION BY source ORDER BY b)) AS d
  FROM r
)
SELECT source, count(d) AS n_diffs,
       quantile_cont(CAST(d AS DOUBLE) / 10000.0, 0.5) AS med_abs_diff,
       max(d) AS max_abs_diff
FROM d WHERE d IS NOT NULL GROUP BY source
"""


_KMEANS_UPDATE_ORACLE = """
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
  SELECT vec_id, cid FROM d
  QUALIFY row_number() OVER (
    PARTITION BY vec_id ORDER BY dist_i, cid) = 1
)
SELECT a.cid AS centroid_id, q.dim, count(*) AS n_vecs,
       CAST(sum(q.qv) AS DOUBLE) / count(*) AS new_coord
FROM a JOIN q USING (vec_id)
GROUP BY 1, 2
"""


def session_duration_quartiles(sf_dir: str, gap_minutes: int = 30):
    """Session-length distribution by day: p25/p50/p75 of session
    duration (microseconds, an exact integer per session) for sessions
    STARTING each day — the engagement-depth trend a product dashboard
    tracks.  Rides the session_windows rule (>30 min idle closes, user
    boundary closes); durations are integer epoch-µs diffs, quartiles
    via the bit-pinned quantile_cont two-product lerp.  Sessions form
    in one user-keyed exchange (vectorized break-scan), then the
    per-day fold rides a second, day-keyed exchange over the bounded
    session table — the raw stream shuffles once."""
    from ..functions.stats import quantile_cont
    from ..stages.shard import sharded_map_groups

    sess = session_windows(sf_dir, gap_minutes=gap_minutes)

    def to_day(b: pd.DataFrame) -> pd.DataFrame:
        start = b["session_start"].to_numpy().astype("datetime64[us]")
        end = b["session_end"].to_numpy().astype("datetime64[us]")
        day = start.astype("datetime64[D]").astype("datetime64[us]")
        return pd.DataFrame({
            "day": day,
            "dur_us": (end - start).astype(np.int64)})

    durs = sess.map_batches(to_day, batch_format="pandas")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for day, g in shard.groupby("day", sort=False):
            v = g["dur_us"].to_numpy(np.float64)
            rows.append({
                "day": day, "n_sessions": np.int64(v.size),
                "p25_us": float(quantile_cont(v, 0.25)),
                "p50_us": float(quantile_cont(v, 0.50)),
                "p75_us": float(quantile_cont(v, 0.75))})
        return pd.DataFrame(rows, columns=[
            "day", "n_sessions", "p25_us", "p50_us", "p75_us"])

    return sharded_map_groups(durs, "day", fold)


_SESSION_DUR_Q_ORACLE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *, sum(new_session) OVER (
      PARTITION BY user_id ORDER BY ts
      ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
), sess AS (
  SELECT user_id, session_id,
         date_trunc('day', min(ts)) AS day,
         CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS dur_us
  FROM numbered GROUP BY 1, 2
)
SELECT day, count(*) AS n_sessions,
       quantile_cont(CAST(dur_us AS DOUBLE), 0.25) AS p25_us,
       quantile_cont(CAST(dur_us AS DOUBLE), 0.50) AS p50_us,
       quantile_cont(CAST(dur_us AS DOUBLE), 0.75) AS p75_us
FROM sess GROUP BY day
"""


def user_lifespan_histogram(sf_dir: str):
    """User-lifespan census: histogram of (last active day − first
    active day) spans in whole days — the retention-shape summary
    (mass at 0 = one-day users; a long tail = a durable cohort).
    Per-batch (user → min/max day) integer partials bound the
    user-keyed exchange at users×batches rows; the span histogram
    folds in a second, tiny span-keyed exchange — per-user rows never
    reach the driver.  Days via trunc-then-epoch (the hour_of_week
    lesson: date_trunc FIRST so no fractional-second rounding
    divergence).  All-integer — bit-exact."""
    from ..stages.shard import sharded_aggregate

    ds = _rd().read_parquet(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].to_numpy().astype("datetime64[D]")
               .astype(np.int64))
        g = pd.DataFrame({"user_id": b["user_id"], "lo": day, "hi": day}
                         ).groupby("user_id", as_index=False).agg(
            lo=("lo", "min"), hi=("hi", "max"))
        return g

    parts = ds.map_batches(partial, batch_format="pandas")
    spans = sharded_aggregate(parts, "user_id",
                              {"lo": "min", "hi": "max"})

    def census(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "span_days": (b["hi"].to_numpy(np.int64)
                          - b["lo"].to_numpy(np.int64)),
            "n_users": 1}).groupby("span_days", as_index=False).sum()
        g["n_users"] = g["n_users"].astype(np.int64)
        return g

    return sharded_aggregate(
        spans.map_batches(census, batch_format="pandas"),
        "span_days", {"n_users": "sum"}, num_shards=2)


_USER_LIFESPAN_ORACLE = """
WITH u AS (
  SELECT user_id,
         CAST(epoch(date_trunc('day', max(ts)))
              - epoch(date_trunc('day', min(ts))) AS BIGINT)
           // 86400 AS span_days
  FROM events GROUP BY user_id
)
SELECT span_days, count(*) AS n_users FROM u GROUP BY span_days
"""


_DAILY_BURDEN_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         sum(value) AS v
  FROM events GROUP BY 1, 2
), q AS (
  SELECT source, quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3
  FROM r GROUP BY source
), f AS (
  SELECT r.source, date_trunc('day', r.bucket_start) AS day,
         count(*) AS c
  FROM r JOIN q USING (source)
  WHERE r.v < q.q1 - 1.5 * (q.q3 - q.q1) OR r.v > q.q3 + 1.5 * (q.q3 - q.q1)
  GROUP BY 1, 2
), t AS (
  SELECT source, date_trunc('day', bucket_start) AS day, count(*) AS n
  FROM r GROUP BY 1, 2
)
SELECT t.source, t.day,
       CAST(coalesce(f.c, 0) AS BIGINT) AS n_flagged,
       CAST(t.n AS BIGINT) AS n_buckets,
       CAST(coalesce(f.c, 0) AS DOUBLE) / t.n AS flag_rate
FROM t LEFT JOIN f USING (source, day)
"""


_DEDUP_RATE_ORACLE = """
SELECT source, count(*) AS n_docs,
       count(*) - count(DISTINCT text) AS n_dup_docs,
       CAST(count(*) - count(DISTINCT text) AS DOUBLE) / count(*)
         AS dup_rate
FROM documents GROUP BY source
"""


def _fleet_vocab_oracle(top_k: int = 100) -> str:
    return rf"""
WITH words AS (
  SELECT source,
         unnest(list_transform(regexp_extract_all(text, '[\w'']+'),
                               w -> lower(w))) AS w
  FROM documents
), sc AS (
  SELECT source, w, count(*) AS c FROM words GROUP BY 1, 2
), fleet AS (
  SELECT w, sum(c) AS c FROM sc GROUP BY w
), topk AS (
  SELECT w FROM fleet
  QUALIFY row_number() OVER (ORDER BY c DESC, w ASC) <= {top_k}
)
SELECT source,
       CAST(sum(CASE WHEN w IN (SELECT w FROM topk) THEN c ELSE 0 END)
            AS BIGINT) AS covered_tokens,
       CAST(sum(c) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN w IN (SELECT w FROM topk) THEN c ELSE 0 END)
            AS DOUBLE) / sum(c) AS coverage
FROM sc GROUP BY source
"""


_INTERFLAG_GAP_ORACLE = """
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
), g AS (
  SELECT source,
         CAST(epoch(bucket_start) AS BIGINT) // 3600
         - lag(CAST(epoch(bucket_start) AS BIGINT) // 3600)
           OVER (PARTITION BY source ORDER BY bucket_start) AS gap
  FROM f
)
SELECT source, count(*) AS n_flags,
       CAST(sum(gap) AS DOUBLE) / (count(*) - 1) AS mean_gap_hours,
       CAST(max(gap) AS BIGINT) AS max_gap_hours
FROM g GROUP BY source HAVING count(*) >= 2
"""


def longest_rising_run(sf_dir: str):
    """Longest strictly-rising streak per source on the hourly tier —
    the momentum screen (how many CONSECUTIVE hours did load climb
    without a dip or a gap?).  A run extends only while the next
    bucket is exactly +1 h AND its value strictly exceeds the
    previous one; ties broken to the EARLIEST run start.  Engine:
    one source-keyed exchange, then a vectorized boundary scan per
    series (sort → int64 hour diffs → boolean step mask → run-length
    encode via flatnonzero on mask transitions — no Python per-point
    loop).  The strict float compare is deterministic because both
    engines read the SAME exact-oracled hourly sums.  The oracle is
    the classic gaps-and-islands window form."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "bucket_start"], kind="stable")
        rows = []
        for src, sub in g.groupby("event_type", sort=False):
            ts = sub["bucket_start"].to_numpy()
            h = ts.astype("datetime64[h]").astype(np.int64)
            v = sub["sum_value"].to_numpy(np.float64)
            n = len(sub)
            if n == 1:
                rows.append({"source": src, "longest_rise": np.int64(1),
                             "run_start": ts[0]})
                continue
            ok = (np.diff(h) == 1) & (v[1:] > v[:-1])
            # island ids: cumulative count of breaks; runs = bincount
            brk = np.concatenate(([0], np.cumsum(~ok)))
            lens = np.bincount(brk)           # points per island, in
            best = int(lens.argmax())         # first-occurrence argmax
            start_idx = int(np.searchsorted(brk, best))
            rows.append({"source": src,
                         "longest_rise": np.int64(int(lens[best])),
                         "run_start": ts[start_idx]})
        return pd.DataFrame(rows, columns=[
            "source", "longest_rise", "run_start"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", per_source, num_shards=4)


_LONGEST_RISING_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         round(sum(value), 4) AS v
  FROM events GROUP BY 1, 2
), s AS (
  SELECT source, bucket_start,
         CASE WHEN bucket_start = lag(bucket_start)
                   OVER (PARTITION BY source ORDER BY bucket_start)
                   + INTERVAL 1 HOUR
               AND v > lag(v)
                   OVER (PARTITION BY source ORDER BY bucket_start)
              THEN 0 ELSE 1 END AS brk
  FROM r
), i AS (
  SELECT source, bucket_start,
         sum(brk) OVER (PARTITION BY source ORDER BY bucket_start
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM s
), runs AS (
  SELECT source, grp, count(*) AS len, min(bucket_start) AS run_start
  FROM i GROUP BY 1, 2
)
SELECT source, CAST(len AS BIGINT) AS longest_rise, run_start
FROM runs
QUALIFY row_number() OVER (PARTITION BY source
                           ORDER BY len DESC, run_start ASC) = 1
"""


_FLAG_HOUR_PROFILE_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket_start,
         sum(value) AS v
  FROM events GROUP BY 1, 2
), q AS (
  SELECT source, quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3
  FROM r GROUP BY source
), f AS (
  SELECT (CAST(epoch(bucket_start) AS BIGINT) // 3600) % 24 AS hour_of_day,
         count(*) AS c
  FROM r JOIN q USING (source)
  WHERE r.v < q.q1 - 1.5 * (q.q3 - q.q1) OR r.v > q.q3 + 1.5 * (q.q3 - q.q1)
  GROUP BY 1
), t AS (
  SELECT (CAST(epoch(bucket_start) AS BIGINT) // 3600) % 24 AS hour_of_day,
         count(*) AS n
  FROM r GROUP BY 1
)
SELECT t.hour_of_day,
       CAST(coalesce(f.c, 0) AS BIGINT) AS n_flagged,
       CAST(t.n AS BIGINT) AS n_buckets,
       CAST(coalesce(f.c, 0) AS DOUBLE) / t.n AS flag_rate
FROM t LEFT JOIN f USING (hour_of_day)
"""


_BOW_DEDUP_ORACLE = r"""
SELECT source, count(*) AS n_docs,
       count(*) - count(DISTINCT text) AS n_exact_dups,
       count(*) - count(DISTINCT list_sort(list_transform(
           regexp_extract_all(text, '[\w'']+'), w -> lower(w))))
         AS n_bow_dups,
       count(DISTINCT text)
       - count(DISTINCT list_sort(list_transform(
           regexp_extract_all(text, '[\w'']+'), w -> lower(w))))
         AS n_shuffled_dups
FROM documents GROUP BY source
"""


def top_decile_value_share(sf_dir: str):
    """Load concentration per source: what share of total volume sits
    in the top 10% of hourly buckets — the peakiness metric that
    separates a bursty feed (share → 1) from a flat one (→ 0.1).
    Exactness: values are round(sum,4)·10⁴ int64s; the top-m slice sum
    is invariant under any tie ordering at the boundary (summing m of
    identical values is permutation-free), so the engine's partition
    sort and the oracle's arbitrary row_number tie order CANNOT
    diverge; m = ⌈n/10⌉ in integer arithmetic; the share is ONE
    divide of two exact Python bigints.  One source-keyed exchange
    over the (tiny) hourly tier."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, sub in g.groupby("event_type", sort=False):
            v4 = np.rint(sub["sum_value"].to_numpy(np.float64)
                         * 10000.0).astype(np.int64)
            n = len(v4)
            m = (n + 9) // 10
            top = np.sort(v4)[::-1][:m]
            tot = int(v4.sum())
            if tot == 0:
                continue
            rows.append({
                "source": src, "n_buckets": np.int64(n),
                "n_top": np.int64(m),
                "top_decile_share": float(int(top.sum())) / float(tot)})
        return pd.DataFrame(rows, columns=[
            "source", "n_buckets", "n_top", "top_decile_share"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "sum_value"]),
        "event_type", per_source, num_shards=4)


_TOP_DECILE_SHARE_ORACLE = """
WITH r AS (
  SELECT event_type AS source,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS x
  FROM events GROUP BY source, date_trunc('hour', ts)
), rk AS (
  SELECT source, x,
         row_number() OVER (PARTITION BY source ORDER BY x DESC) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM r
)
SELECT source, CAST(max(n) AS BIGINT) AS n_buckets,
       CAST((max(n) + 9) // 10 AS BIGINT) AS n_top,
       CAST(CAST(sum(CASE WHEN rn <= (n + 9) // 10 THEN x ELSE 0 END)
                 AS VARCHAR) AS DOUBLE)
         / CAST(CAST(sum(x) AS VARCHAR) AS DOUBLE) AS top_decile_share
FROM rk GROUP BY source HAVING sum(x) <> 0
"""


_ORDER_MONTH_ORACLE = """
SELECT CAST(month(o_orderdate) AS BIGINT) AS month,
       count(*) AS n_orders,
       CAST(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                 AS VARCHAR) AS DOUBLE) / 100.0 AS revenue
FROM orders GROUP BY 1
"""


def day_volume_80pct_hour(sf_dir: str):
    """How early does the day's traffic land?  Per (source, day): the
    first hour-of-day whose CUMULATIVE volume reaches 80% of the day's
    total — the front-loading census (a batch feed crosses at its
    drop hour; organic traffic crosses late afternoon).  The 80% rule
    is the integer cross-product form (5·cum ≥ 4·total — no float
    threshold compare, the brand_pareto contract) over round(sum,4)·
    10⁴ int64 volumes; one (source, day)-keyed exchange of the (tiny)
    hourly tier, vectorized cumsum + argmax per group.  Days with
    total ≤ 0 are omitted (both sides)."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def per_day(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["bucket_start"].to_numpy()
        h = ts.astype("datetime64[h]").astype(np.int64)
        g = g.assign(
            day=(ts.astype("datetime64[D]").astype("datetime64[us]")),
            hod=((h % 24) + 24) % 24,
            v4=np.rint(g["sum_value"].to_numpy(np.float64)
                       * 10000.0).astype(np.int64),
        ).sort_values(["event_type", "day", "hod"], kind="stable")
        rows = []
        for (src, day), sub in g.groupby(["event_type", "day"],
                                         sort=False):
            v4 = sub["v4"].to_numpy(np.int64)
            tot = int(v4.sum())
            if tot <= 0:
                continue
            cum = np.cumsum(v4)
            hit = np.flatnonzero(5 * cum >= 4 * tot)
            rows.append({
                "source": src, "day": day,
                "hour_80pct": np.int64(
                    int(sub["hod"].to_numpy(np.int64)[hit[0]])),
                "n_hours": np.int64(len(sub))})
        return pd.DataFrame(rows, columns=[
            "source", "day", "hour_80pct", "n_hours"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", per_day, num_shards=4)


_DAY_80PCT_ORACLE = """
WITH r AS (
  SELECT event_type AS source, date_trunc('day', ts) AS day,
         (CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600) % 24
           AS hod,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS v4
  FROM events GROUP BY 1, 2, 3
), c AS (
  SELECT source, day, hod, v4,
         sum(v4) OVER (PARTITION BY source, day ORDER BY hod
                       ROWS UNBOUNDED PRECEDING) AS cum,
         sum(v4) OVER (PARTITION BY source, day) AS tot,
         count(*) OVER (PARTITION BY source, day) AS n
  FROM r
)
SELECT source, day,
       CAST(min(CASE WHEN 5 * cum >= 4 * tot THEN hod END) AS BIGINT)
         AS hour_80pct,
       CAST(max(n) AS BIGINT) AS n_hours
FROM c WHERE tot > 0
GROUP BY 1, 2
"""


_PCA_SEED_DOC = """seed direction q0_d = +1 for even (d−1), −1 for odd —
the deterministic Rademacher start both engines pin"""


_PCA_POWER_ORACLE = """
WITH x AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS q
  FROM embeddings
), dotp AS (
  SELECT vec_id,
         sum(CAST(q AS HUGEINT)
             * (CASE WHEN (dim - 1) % 2 = 0 THEN 1 ELSE -1 END)) AS dt
  FROM x GROUP BY 1
), w AS (
  SELECT x.dim, sum(CAST(x.q AS HUGEINT) * dotp.dt) AS w
  FROM x JOIN dotp USING (vec_id) GROUP BY 1
), nrm AS (
  SELECT sum(w * w) AS ss FROM w
)
SELECT CAST(w.dim AS BIGINT) AS dim,
       CAST(CAST(w.w AS VARCHAR) AS DOUBLE) AS w,
       CAST(CAST(w.w AS VARCHAR) AS DOUBLE)
         / sqrt(CAST(CAST(nrm.ss AS VARCHAR) AS DOUBLE)) AS loading
FROM w, nrm
"""


def _emb_projection_oracle(bucket_width: int = 2_000_000) -> str:
    return f"""
WITH x AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS q
  FROM embeddings
), dotp AS (
  SELECT vec_id,
         CAST(sum(q * (CASE WHEN (dim - 1) % 2 = 0
                            THEN 1 ELSE -1 END)) AS BIGINT) AS dt
  FROM x GROUP BY 1
)
SELECT CASE WHEN dt >= 0 THEN dt // {bucket_width}
            ELSE -((-dt + {bucket_width} - 1) // {bucket_width}) END
         AS bucket,
       count(*) AS n_vecs
FROM dotp GROUP BY 1
"""


_CMS_DEPTH, _CMS_WIDTH = 4, 64
_CMS_STREAM = 0x9E3779B97F4A7C15  # golden-ratio stream split per row


def cms_user_counts(sf_dir: str):
    """Count-Min sketch over per-user event counts, VALUE-CHECKED: the
    classic streaming frequency sketch (Cormode & Muthukrishnan 2005)
    with depth 4 × width 64, hash rows h_d(u) = splitmix64((u + d·φ)
    mod 2⁶⁴) — the same splitmix chain the SQL oracle reimplements
    bit-exactly in HUGEINT mod-2⁶⁴ arithmetic (hash_sample_docs), so
    the sketch CELLS, every estimate, AND the deterministic
    one-sided-error invariant (estimate ≥ truth, always) are all
    exact-oracled — not a rows-only tolerance check.  Engine: the
    sketch folds MAP-ONLY (per-batch partial user counts → bucket
    increments; merge = elementwise add — the mergeability that makes
    CMS the right shape for a 100-TB stream); exact per-user counts
    ride one user-keyed exchange alongside for the comparison
    columns.  The tiny width forces real collisions at every scale so
    the sketch path is genuinely exercised."""
    from ..stages.shard import sharded_aggregate

    ds = _rd().read_parquet(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64), "cnt": 1,
        }).groupby("user_id", as_index=False).sum()
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    exact = sharded_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        "user_id", {"cnt": "sum"}, num_shards=2).to_pandas()

    def cms_partial(b: pd.DataFrame) -> pd.DataFrame:
        u = b["user_id"].to_numpy(np.int64)
        g = pd.DataFrame({"u": u, "c": 1}).groupby(
            "u", as_index=False).sum()
        uu = g["u"].to_numpy(np.int64).astype(np.uint64)
        cc = g["c"].to_numpy(np.int64)
        rows = []
        for d in range(_CMS_DEPTH):
            bk = (_splitmix64(uu + np.uint64((d * _CMS_STREAM)
                                             % (1 << 64)))
                  % np.uint64(_CMS_WIDTH)).astype(np.int64)
            cell = np.bincount(bk, weights=cc,
                               minlength=_CMS_WIDTH).astype(np.int64)
            rows.append(pd.DataFrame({
                "d": np.int64(d),
                "b": np.arange(_CMS_WIDTH, dtype=np.int64),
                "total": cell}))
        return pd.concat(rows, ignore_index=True)

    cells = ds.map_batches(cms_partial,
                           batch_format="pandas").to_pandas()
    sketch = np.zeros((_CMS_DEPTH, _CMS_WIDTH), dtype=np.int64)
    for r in cells.itertuples():
        sketch[int(r.d), int(r.b)] += int(r.total)

    uu = exact["user_id"].to_numpy(np.int64).astype(np.uint64)
    est = np.full(len(exact), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(_CMS_DEPTH):
        bk = (_splitmix64(uu + np.uint64((d * _CMS_STREAM) % (1 << 64)))
              % np.uint64(_CMS_WIDTH)).astype(np.int64)
        est = np.minimum(est, sketch[d, bk])
    cnt = exact["cnt"].to_numpy(np.int64)
    out = pd.DataFrame({
        "user_id": exact["user_id"].to_numpy(np.int64),
        "exact_count": cnt, "cms_estimate": est,
        "overcount_ok": est >= cnt})
    return out.sort_values("user_id", kind="stable").reset_index(
        drop=True)


def _cms_oracle() -> str:
    # splitmix64((user_id + d*phi) mod 2^64) % width, the s1/s2/s3/s4
    # HUGEINT chain of _HASH_SAMPLE_ORACLE parameterized by stream d
    z1 = (f"(CAST(user_id AS HUGEINT) + d * {_CMS_STREAM} "
          f"+ 11400714819323198485) % 18446744073709551616")
    z2 = _sql_mulmod64(f"xor(z1, z1 // 1073741824)", 0xBF58476D1CE4E5B9)
    z3 = _sql_mulmod64(f"xor(z2, z2 // 134217728)", 0x94D049BB133111EB)
    return f"""
WITH uc AS (
  SELECT user_id, count(*) AS cnt FROM events GROUP BY 1
), dd AS (
  SELECT unnest([0, 1, 2, 3]) AS d
), h1 AS (
  SELECT user_id, cnt, d, {z1} AS z1 FROM uc, dd
), h2 AS (
  SELECT user_id, cnt, d, {z2} AS z2 FROM h1
), h3 AS (
  SELECT user_id, cnt, d, {z3} AS z3 FROM h2
), hb AS (
  SELECT user_id, cnt, d,
         CAST(xor(z3, z3 // 2147483648) % {_CMS_WIDTH} AS BIGINT) AS b
  FROM h3
), cell AS (
  SELECT d, b, sum(cnt) AS total FROM hb GROUP BY 1, 2
), est AS (
  SELECT hb.user_id, min(cell.total) AS est
  FROM hb JOIN cell USING (d, b) GROUP BY 1
)
SELECT uc.user_id, CAST(uc.cnt AS BIGINT) AS exact_count,
       CAST(est.est AS BIGINT) AS cms_estimate,
       est.est >= uc.cnt AS overcount_ok
FROM uc JOIN est USING (user_id)
"""


def session_gap_sensitivity(sf_dir: str):
    """How sensitive is the session count to the idle-gap parameter?
    One pass answers for 15/30/60 minutes simultaneously — the sweep a
    pipeline owner runs BEFORE hardcoding a sessionization constant
    (if n_sessions moves a lot between 30 and 60, the choice is
    load-bearing).  Per user the sorted event stream yields integer-µs
    successive gaps ONCE; each threshold is then one vectorized
    count of gaps exceeding it; n_sessions(T) = n_users + Σ gaps > T.
    All-integer; one user-keyed exchange."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    thresholds = (15, 30, 60)
    ds = _rd().read_parquet(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        rows = []
        for _uid, sub in g.groupby("user_id", sort=False):
            us = sub["ts"].to_numpy().astype("datetime64[us]") \
                .astype(np.int64)
            gaps = np.diff(us)
            for t in thresholds:
                rows.append({
                    "gap_minutes": np.int64(t), "n_users": np.int64(1),
                    "n_sessions": np.int64(
                        1 + int((gaps > t * 60_000_000).sum()))})
        out = pd.DataFrame(rows, columns=[
            "gap_minutes", "n_users", "n_sessions"])
        if out.empty:
            return out
        out = out.groupby("gap_minutes", as_index=False).sum()
        for c in ("n_users", "n_sessions"):
            out[c] = out[c].astype(np.int64)
        return out

    parts = sharded_map_groups(ds, "user_id", per_user, num_shards=4)
    return sharded_aggregate(parts, "gap_minutes",
                             {"n_users": "sum", "n_sessions": "sum"},
                             num_shards=2)


_SESSION_GAP_SENS_ORACLE = """
WITH g AS (
  SELECT user_id,
         CAST(epoch_us(ts) AS BIGINT)
         - lag(CAST(epoch_us(ts) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts) AS gap_us
  FROM events
), t AS (
  SELECT unnest([15, 30, 60]) AS gap_minutes
)
SELECT CAST(t.gap_minutes AS BIGINT) AS gap_minutes,
       CAST(count(DISTINCT g.user_id) AS BIGINT) AS n_users,
       CAST(count(DISTINCT g.user_id)
            + sum(CASE WHEN g.gap_us > CAST(t.gap_minutes AS BIGINT)
                                       * 60000000
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM g, t GROUP BY 1
"""


# 2*cos(2*pi/24) pinned as a LITERAL on both engines — never computed
# via libm at runtime (cos() may differ by an ulp across libms).
# In SQL the literal must go through CAST('<repr>' AS DOUBLE): DuckDB's
# bare numeric-literal path parses via DECIMAL and lands 1 ulp off the
# correctly-rounded double (measured), which compounds ~1e-13 over a
# 700-step recurrence; the string cast parses correctly rounded.
_GOERTZEL_COEF_24 = 1.9318516525781366


def goertzel_diurnal_power(sf_dir: str):
    """Spectral energy at the diurnal frequency per source — the
    Goertzel single-bin DFT (the O(n) way to ask 'how 24-hourly is
    this series?' without an FFT): s_t = v_t + c·s_{t-1} − s_{t-2}
    over the hourly values in bucket order, power = s₁² + s₂² −
    c·s₁·s₂.  Bit-exact cross-engine: v is the exact-oracled
    round(sum,4) hourly value, the coefficient is a pinned LITERAL
    (never a runtime cos()), and every FP op of the recurrence and the
    power expression is written in the same association order in the
    Python loop and the oracle's recursive CTE.  One source-keyed
    exchange; the per-series scan is sequential by nature (this is
    the same whole-series-per-shard shape as the detector stages)."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")
    c = _GOERTZEL_COEF_24

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "bucket_start"], kind="stable")
        rows = []
        for src, sub in g.groupby("event_type", sort=False):
            # correctly-rounded tier values: the recursion's inputs
            # must be the oracle's round(sum,4) DOUBLES bit-for-bit,
            # or the per-step ulp gap compounds past the 6-dp canon
            # at 1e8 magnitudes (fuzz seed 173 / sf0.1)
            v = _round_exact(sub["sum_value"].to_numpy(np.float64))
            s1 = 0.0
            s2 = 0.0
            for x in v:
                s1, s2 = (float(x) + c * s1) - s2, s1
            rows.append({
                "source": src, "n_hours": np.int64(len(v)),
                "diurnal_power": (s1 * s1 + s2 * s2) - (c * s1) * s2})
        return pd.DataFrame(rows, columns=[
            "source", "n_hours", "diurnal_power"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", per_source, num_shards=4)


_GOERTZEL_ORACLE = f"""
WITH RECURSIVE r AS (
  SELECT event_type AS source, round(sum(value), 4) AS v,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY date_trunc('hour', ts)) AS idx,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), e AS (
  SELECT source, CAST(0 AS BIGINT) AS idx,
         CAST(0 AS DOUBLE) AS s1, CAST(0 AS DOUBLE) AS s2
  FROM (SELECT DISTINCT source FROM r)
  UNION ALL
  SELECT e.source, r.idx,
         (r.v + CAST('{_GOERTZEL_COEF_24!r}' AS DOUBLE) * e.s1) - e.s2
           AS s1,
         e.s1 AS s2
  FROM e JOIN r ON r.source = e.source AND r.idx = e.idx + 1
), last AS (
  SELECT e.source, e.s1, e.s2,
         row_number() OVER (PARTITION BY e.source
                            ORDER BY e.idx DESC) AS rk
  FROM e
), nn AS (
  SELECT source, max(idx) AS n FROM r GROUP BY 1
)
SELECT last.source, CAST(nn.n AS BIGINT) AS n_hours,
       (last.s1 * last.s1 + last.s2 * last.s2)
         - (CAST('{_GOERTZEL_COEF_24!r}' AS DOUBLE) * last.s1) * last.s2
         AS diurnal_power
FROM last JOIN nn USING (source) WHERE last.rk = 1
"""


def rolling_3h_active_users(sf_dir: str):
    """Sliding-window distinct: users active in the trailing 3 hours,
    per source per hour — the live-ops 'current actives' board as a
    streaming window primitive.  A naive per-window recount touches
    every event 3×; here each DISTINCT (source, hour, user) row (one
    exchange dedupes batch-local partials) expands to its ≤ 3 target
    windows — the all-to-all carries the BOUNDED ×3 interval-union
    expansion of the distinct table, never raw events (the DAU/WAU
    contract) — and a second composite-keyed exchange re-dedupes
    (a user active in 2 window hours must count once) and folds
    counts.  Window ends are capped at each source's max observed
    hour (tiny bounds broadcast); windows with zero actives are
    absent on both sides."""
    import ray

    from ..stages.shard import sharded_aggregate, sharded_map_groups

    ds = _rd().read_parquet(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_type", "ts", "user_id"])

    roll = _events_rollup(sf_dir, "1h")
    b = roll.select_columns(["event_type", "bucket_start"]).to_pandas()
    hb = (b["bucket_start"].to_numpy().astype("datetime64[h]")
          .astype(np.int64))
    hi = pd.DataFrame({"source": b["event_type"], "h": hb}).groupby(
        "source")["h"].max().to_dict()
    hi_ref = ray.put(hi)

    def distinct_partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = (batch["ts"].to_numpy().astype("datetime64[h]")
             .astype(np.int64))
        return pd.DataFrame({
            "source": batch["event_type"], "h": h,
            "u": batch["user_id"].to_numpy(np.int64),
        }).drop_duplicates()

    def expand(shard: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        mx = _ray.get(hi_ref)
        s = shard.drop_duplicates(["source", "h", "u"])
        reps = pd.concat([s.assign(t=s["h"] + k) for k in range(3)],
                         ignore_index=True)
        cap = reps["source"].map(mx).to_numpy(np.int64)
        return reps[reps["t"].to_numpy(np.int64) <= cap][
            ["source", "t", "u"]]

    expanded = sharded_map_groups(
        ds.map_batches(distinct_partial, batch_format="pandas"),
        ["source", "h"], expand)

    def window_counts(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.drop_duplicates(["source", "t", "u"]).groupby(
            ["source", "t"], as_index=False).size().rename(
            columns={"size": "n_active_users"})
        g["n_active_users"] = g["n_active_users"].astype(np.int64)
        return g

    counts = sharded_map_groups(expanded, ["source", "t", "u"],
                                window_counts)
    agg = sharded_aggregate(counts, ["source", "t"],
                            {"n_active_users": "sum"}, num_shards=4)

    def fin(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "source": batch["source"],
            "window_end": (batch["t"].to_numpy(np.int64)
                           .astype("datetime64[h]")
                           .astype("datetime64[us]")),
            "n_active_users": batch["n_active_users"]
            .to_numpy(np.int64)})

    return agg.map_batches(fin, batch_format="pandas")


_ROLLING_3H_ORACLE = """
WITH eh AS (
  SELECT DISTINCT event_type AS source,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS h,
         user_id
  FROM events
), b AS (
  SELECT source, min(h) AS lo, max(h) AS hi FROM eh GROUP BY 1
), t AS (
  SELECT source, unnest(generate_series(lo, hi)) AS t FROM b
), j AS (
  SELECT t.source, t.t, eh.user_id
  FROM t JOIN eh ON eh.source = t.source
                AND eh.h BETWEEN t.t - 2 AND t.t
)
SELECT source,
       to_timestamp(t * 3600) AT TIME ZONE 'UTC' AS window_end,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_users
FROM j GROUP BY 1, 2
"""


def haar_energy_by_scale(sf_dir: str, levels: int = 4):
    """Multi-resolution (Haar) energy decomposition of each hourly
    series: for block sizes 2/4/8/16, the energy of the half-vs-half
    block differences — where does this source's variance live, hour-
    to-hour jitter (level 1) or half-day swings (level 4)?  EXACT: the
    unnormalized detail d = Σ(first half v4) − Σ(second half v4) is an
    integer per complete block; energies fold as Python bigints inside
    the shard (no overflow at any corpus size); only complete blocks
    count, so both engines see the identical index-block partition of
    the row_number grid.  One source-keyed exchange; per-series work
    is vectorized reshape-and-sum."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "bucket_start"], kind="stable")
        rows = []
        for src, sub in g.groupby("event_type", sort=False):
            v4 = np.rint(sub["sum_value"].to_numpy(np.float64)
                         * 10000.0).astype(np.int64)
            n = len(v4)
            for lv in range(1, levels + 1):
                bs = 1 << lv
                nb = n // bs
                if nb == 0:
                    continue
                m = v4[:nb * bs].reshape(nb, bs)
                half = bs // 2
                d = m[:, :half].sum(axis=1) - m[:, half:].sum(axis=1)
                energy = sum(int(x) * int(x) for x in d)
                rows.append({
                    "source": src, "level": np.int64(lv),
                    "n_blocks": np.int64(nb),
                    "energy": float(energy)})
        return pd.DataFrame(rows, columns=[
            "source", "level", "n_blocks", "energy"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", per_source, num_shards=4)


_HAAR_ENERGY_ORACLE = """
WITH r AS (
  SELECT event_type AS source,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS v4,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY date_trunc('hour', ts)) AS idx
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), lv AS (
  SELECT unnest([1, 2, 3, 4]) AS level,
         unnest([2, 4, 8, 16]) AS bs
), d AS (
  SELECT r.source, lv.level, lv.bs, (r.idx - 1) // lv.bs AS block,
         sum(CASE WHEN (r.idx - 1) % lv.bs < lv.bs // 2
                  THEN CAST(r.v4 AS HUGEINT)
                  ELSE -CAST(r.v4 AS HUGEINT) END) AS detail,
         count(*) AS cnt
  FROM r, lv GROUP BY 1, 2, 3, 4
)
SELECT source, CAST(level AS BIGINT) AS level,
       count(*) AS n_blocks,
       CAST(CAST(sum(detail * detail) AS VARCHAR) AS DOUBLE) AS energy
FROM d WHERE cnt = bs
GROUP BY 1, 2
"""


def hourly_profile_rank_correlation(sf_dir: str):
    """Does each source keep the FLEET's daily rhythm?  Spearman rank
    correlation between a source's 24-hour mean-volume profile and the
    fleet's, with EXACT rank arithmetic: hour means are rationals
    (Σv4 / n-buckets), so ranks come from cross-multiplied integer
    compares (s_j·n_i < s_i·n_j — never a float divide), ties pinned
    to hour ASC via the same count-based rank definition (1 + #hours
    strictly below, + #equal with smaller hour) spelled identically as
    a 24×24 self-join in SQL and an O(24²) integer loop in the engine;
    ρ = 1 − 6Σd²/(n(n²−1)) is ONE divide of exact ints.  Both profiles
    are restricted to the source's observed hours; the fleet profile
    is a tiny driver fold broadcast into the per-source pass."""
    import ray

    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def hod_partial(b: pd.DataFrame) -> pd.DataFrame:
        h = (b["bucket_start"].to_numpy().astype("datetime64[h]")
             .astype(np.int64))
        g = pd.DataFrame({
            "source": b["event_type"], "hod": ((h % 24) + 24) % 24,
            "s4": np.rint(b["sum_value"].to_numpy(np.float64)
                          * 10000.0).astype(np.int64),
            "nb": np.int64(1),
        }).groupby(["source", "hod"], as_index=False).sum()
        for c in ("s4", "nb"):
            g[c] = g[c].astype(np.int64)
        return g

    cells = roll.select_columns(
        ["event_type", "bucket_start", "sum_value"]).map_batches(
        hod_partial, batch_format="pandas").to_pandas()
    cells = cells.groupby(["source", "hod"], as_index=False).sum()
    fleet = cells.groupby("hod", as_index=False)[["s4", "nb"]].sum()
    fleet_map = {int(r.hod): (int(r.s4), int(r.nb))
                 for r in fleet.itertuples()}
    fleet_ref = ray.put(fleet_map)

    def _ranks(hods, ss, ns):
        # rank h = 1 + #(mean_j < mean_h) + #(mean_j == mean_h, j < h)
        k = len(hods)
        ranks = []
        for i in range(k):
            r = 1
            for j in range(k):
                if j == i:
                    continue
                lhs = ss[j] * ns[i]
                rhs = ss[i] * ns[j]
                if lhs < rhs or (lhs == rhs and hods[j] < hods[i]):
                    r += 1
            ranks.append(r)
        return ranks

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        fm = _ray.get(fleet_ref)
        g = g.groupby(["source", "hod"], as_index=False).sum()
        rows = []
        for src, sub in g.groupby("source", sort=False):
            hods = [int(x) for x in sub["hod"]]
            ss = [int(x) for x in sub["s4"]]
            ns = [int(x) for x in sub["nb"]]
            n = len(hods)
            if n < 2:
                continue
            fs = [fm[h][0] for h in hods]
            fn = [fm[h][1] for h in hods]
            r_src = _ranks(hods, ss, ns)
            r_flt = _ranks(hods, fs, fn)
            sd2 = sum((a - b) * (a - b) for a, b in zip(r_src, r_flt))
            rows.append({
                "source": src, "n_hours": np.int64(n),
                "spearman_rho": 1.0 - float(6 * sd2)
                / float(n * (n * n - 1))})
        return pd.DataFrame(rows, columns=[
            "source", "n_hours", "spearman_rho"])

    cells_ds = _rd().from_pandas(cells)
    return sharded_map_groups(cells_ds, "source", per_source,
                              num_shards=4)


_PROFILE_RANK_CORR_ORACLE = """
WITH r AS (
  SELECT event_type AS source,
         (CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600) % 24
           AS hod,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS v4
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), sc AS (
  SELECT source, hod, CAST(sum(v4) AS HUGEINT) AS s4,
         CAST(count(*) AS HUGEINT) AS nb
  FROM r GROUP BY 1, 2
), fl AS (
  SELECT hod, sum(s4) AS s4, sum(nb) AS nb FROM sc GROUP BY 1
), rs AS (
  SELECT a.source, a.hod,
         1 + sum(CASE WHEN b.s4 * a.nb < a.s4 * b.nb
                        OR (b.s4 * a.nb = a.s4 * b.nb
                            AND b.hod < a.hod)
                      THEN 1 ELSE 0 END) AS rk
  FROM sc a JOIN sc b ON b.source = a.source AND b.hod <> a.hod
  GROUP BY 1, 2
), rf AS (
  SELECT a.source, a.hod,
         1 + sum(CASE WHEN fb.s4 * fa.nb < fa.s4 * fb.nb
                        OR (fb.s4 * fa.nb = fa.s4 * fb.nb
                            AND fb.hod < fa.hod)
                      THEN 1 ELSE 0 END) AS rk
  FROM sc a
  JOIN fl fa ON fa.hod = a.hod
  JOIN sc b ON b.source = a.source AND b.hod <> a.hod
  JOIN fl fb ON fb.hod = b.hod
  GROUP BY 1, 2
), d AS (
  SELECT rs.source, count(*) AS n,
         sum((rs.rk - rf.rk) * (rs.rk - rf.rk)) AS sd2
  FROM rs JOIN rf USING (source, hod) GROUP BY 1
)
SELECT source, CAST(n AS BIGINT) AS n_hours,
       1 - CAST(6 * sd2 AS DOUBLE)
           / CAST(n * (n * n - 1) AS DOUBLE) AS spearman_rho
FROM d WHERE n >= 2
"""


def _bloom_oracle() -> str:
    bit = (lambda r: f"CAST(('0x' || substr(md5('{r}|' || w), 1, 16)) "
           f"AS UBIGINT) % {_BLOOM_BITS}")
    return rf"""
WITH wrd AS (
  SELECT DISTINCT source,
         unnest(list_transform(regexp_extract_all(text, '[\w'']+'),
                               x -> lower(x))) AS w
  FROM documents
), ref AS (
  SELECT DISTINCT w FROM wrd WHERE source = '{_BLOOM_REF}'
), bits AS (
  SELECT DISTINCT b FROM (
    SELECT {bit(0)} AS b FROM ref
    UNION SELECT {bit(1)} FROM ref
    UNION SELECT {bit(2)} FROM ref)
), pr AS (
  SELECT wrd.source, wrd.w,
         ({bit(0)} IN (SELECT b FROM bits)
          AND {bit(1)} IN (SELECT b FROM bits)
          AND {bit(2)} IN (SELECT b FROM bits)) AS hit,
         wrd.w IN (SELECT w FROM ref) AS true_mem
  FROM wrd WHERE wrd.source <> '{_BLOOM_REF}'
)
SELECT source, count(*) AS n_probed,
       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
         AS n_positive,
       CAST(sum(CASE WHEN true_mem THEN 1 ELSE 0 END) AS BIGINT)
         AS n_true_members,
       CAST(sum(CASE WHEN hit AND NOT true_mem THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_positive,
       CASE WHEN count(*) - sum(CASE WHEN true_mem THEN 1 ELSE 0 END)
                 > 0
            THEN CAST(sum(CASE WHEN hit AND NOT true_mem
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / (count(*) - sum(CASE WHEN true_mem
                                        THEN 1 ELSE 0 END))
            ELSE 0.0 END AS fp_rate,
       sum(CASE WHEN true_mem AND hit THEN 1 ELSE 0 END)
         = sum(CASE WHEN true_mem THEN 1 ELSE 0 END)
         AS no_false_negatives
FROM pr GROUP BY source
"""


def matrix_profile_1h(sf_dir: str, w: int = 24):
    """Matrix profile over the hourly tier (Yeh et al., ICDM 2016 —
    unnormalized-Euclidean variant): for every length-``w`` positional
    window of a source's ordered hourly sums, the squared distance to
    its nearest non-overlapping neighbor window (exclusion zone
    |i−j| < w) and that neighbor's position — the motif/discord
    primitive (low d2 = repeated motif, high d2 = discord, i.e. an
    anomaly no other day resembles).  EXACT end to end: windows are
    positional over the observed-bucket sequence, values are the usual
    10⁻⁴-unit ints, and d² = Σ(yᵢ₊ₜ−yⱼ₊ₜ)² is exact integer on both
    sides (the engine shifts by the per-source min — d² is shift-
    invariant in ℤ — so V·Vᵀ stays in int64 under a range²·w < 2⁶²
    guard, with an arbitrary-precision fallback; the oracle sums
    HUGEINT squares).  Ties pinned to the smallest j (np.argmin ≡
    ORDER BY d2, j).  d2 emitted through the correctly-rounded casts
    (engine float(int), oracle VARCHAR-bridged HUGEINT).  One
    source-keyed exchange; per-source work is O(m²·w) vectorized over
    the BOUNDED bucket series, never the raw corpus.
    NOTE: the paired oracle SQL hardcodes w=24."""
    from ..stages.shard import sharded_map_groups

    roll = _events_rollup(sf_dir, "1h")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, _bs, _xs, y4 in _hourly_int_units(shard):
            n = len(y4)
            m = n - w + 1
            if m < 2:
                continue
            ys = y4 - y4.min()
            V = np.lib.stride_tricks.sliding_window_view(ys, w)
            rng = int(ys.max(initial=0))
            if rng * rng * w < 2 ** 62:
                V = np.ascontiguousarray(V, dtype=np.int64)
                C = V @ V.T
                ss = np.einsum("ij,ij->i", V, V)
                d2 = ss[:, None] + ss[None, :] - 2 * C
            else:  # arbitrary-precision fallback, same semantics
                vl = [[int(x) for x in r] for r in V]
                d2 = np.empty((m, m), dtype=object)
                for i in range(m):
                    for j in range(m):
                        d2[i, j] = sum((p - q) * (p - q)
                                       for p, q in zip(vl[i], vl[j]))
            idx = np.arange(m)
            excl = np.abs(idx[:, None] - idx[None, :]) < w
            valid = ~excl.all(axis=1)
            if not valid.any():
                continue
            sentinel = (d2[~excl].max() if d2.dtype == object
                        else int(d2[~excl].max())) + 1
            d2m = np.where(excl, sentinel, d2)
            nn = d2m.argmin(axis=1)  # ties -> smallest j, as the oracle
            for i in np.flatnonzero(valid):
                rows.append({
                    "source": src, "pos": np.int64(i + 1),
                    "nn_pos": np.int64(nn[i] + 1),
                    "d2": float(int(d2m[i, nn[i]]))})
        return pd.DataFrame(rows, columns=["source", "pos", "nn_pos",
                                           "d2"])

    return sharded_map_groups(
        roll.select_columns(["event_type", "bucket_start", "sum_value"]),
        "event_type", fold)


_MATRIX_PROFILE_ORACLE = """
WITH r AS (
  SELECT event_type AS source,
         CAST(round(round(sum(value), 4) * 10000) AS BIGINT) AS y,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY date_trunc('hour', ts)) AS p,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), w AS (
  SELECT source, p - g.t AS i, g.t AS t, y
  FROM r, generate_series(0, 23) g(t)
  WHERE p - g.t >= 1 AND p - g.t <= n - 24 + 1
), d AS (
  SELECT a.source, a.i, b.i AS j,
         sum(CAST(a.y - b.y AS HUGEINT) * (a.y - b.y)) AS d2
  FROM w a JOIN w b ON b.source = a.source AND b.t = a.t
                   AND abs(a.i - b.i) >= 24
  GROUP BY 1, 2, 3
)
SELECT source, CAST(i AS BIGINT) AS pos, CAST(j AS BIGINT) AS nn_pos,
       CAST(CAST(d2 AS VARCHAR) AS DOUBLE) AS d2
FROM d
QUALIFY row_number() OVER (PARTITION BY source, i
                           ORDER BY d2 ASC, j ASC) = 1
"""


_TRENDING_WORDS_ORACLE = r"""
WITH m AS (SELECT max(doc_id) AS mx FROM documents),
dw AS (
  SELECT DISTINCT d.source, d.doc_id, 2 * d.doc_id < m.mx AS early,
         unnest(list_transform(regexp_extract_all(d.text, '[\w'']+'),
                               w -> lower(w))) AS word
  FROM documents d, m
), cnt AS (
  SELECT source, word,
         sum(CASE WHEN early THEN 1 ELSE 0 END) AS e,
         sum(CASE WHEN NOT early THEN 1 ELSE 0 END) AS l
  FROM dw GROUP BY 1, 2
), rk AS (
  SELECT source, word, e, l,
         row_number() OVER (PARTITION BY source
                            ORDER BY e DESC, word ASC) AS re,
         row_number() OVER (PARTITION BY source
                            ORDER BY l DESC, word ASC) AS rl
  FROM cnt
)
SELECT source, word, CAST(e AS BIGINT) AS early_df,
       CAST(l AS BIGINT) AS late_df, CAST(re AS BIGINT) AS rank_early,
       CAST(rl AS BIGINT) AS rank_late,
       CAST(re - rl AS BIGINT) AS rank_delta
FROM rk
QUALIFY row_number() OVER (PARTITION BY source
                           ORDER BY re - rl DESC, word ASC) <= 5
"""


_LEAD_TIME_ORACLE = """
WITH rm AS (
  SELECT event_type AS source, date_trunc('minute', ts) AS b,
         sum(value) AS v
  FROM events GROUP BY 1, 2
), qm AS (
  SELECT source, quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3
  FROM rm GROUP BY source
), fm AS (
  SELECT rm.source,
         CAST(epoch(rm.b) AS BIGINT) // 60 // 60 AS hour,
         (CAST(epoch(rm.b) AS BIGINT) // 60) % 60 AS moh
  FROM rm JOIN qm USING (source)
  WHERE rm.v < qm.q1 - 1.5 * (qm.q3 - qm.q1)
     OR rm.v > qm.q3 + 1.5 * (qm.q3 - qm.q1)
), fma AS (
  SELECT source, hour, count(*) AS n_minute_flags,
         min(moh) AS first_flag_moh
  FROM fm GROUP BY 1, 2
), rh AS (
  SELECT event_type AS source, date_trunc('hour', ts) AS b,
         sum(value) AS v
  FROM events GROUP BY 1, 2
), qh AS (
  SELECT source, quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3
  FROM rh GROUP BY source
), fh AS (
  SELECT rh.source, CAST(epoch(rh.b) AS BIGINT) // 3600 AS hour
  FROM rh JOIN qh USING (source)
  WHERE rh.v < qh.q1 - 1.5 * (qh.q3 - qh.q1)
     OR rh.v > qh.q3 + 1.5 * (qh.q3 - qh.q1)
)
SELECT fh.source, to_timestamp(fh.hour * 3600)::TIMESTAMP AS hour,
       CAST(coalesce(fma.n_minute_flags, 0) AS BIGINT) AS n_minute_flags,
       CAST(fma.first_flag_moh AS DOUBLE) AS first_flag_moh,
       60.0 - fma.first_flag_moh AS lead_minutes
FROM fh LEFT JOIN fma ON fma.source = fh.source AND fma.hour = fh.hour
"""
