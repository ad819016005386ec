"""Native-tokens-input queries (north-rule core)."""

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
    _SF_ROWS,
    _cast_npoints_double,
    _memo_ds,
    _rd,
    _splitmix64,
)

def token_entropy_by_lang(sf_dir: str):
    """Unigram Shannon entropy of the word distribution per language over
    the documents corpus — the vocabulary-diversity signal of
    training-data curation (low entropy = template/boilerplate-heavy
    slices).  One sharded exchange carries (lang, word) counts; entropy
    folds per lang inside the shard.  Tokenization matches
    ``tfidf_top_terms`` (lower + split on single spaces)."""
    from ..stages.shard import sharded_map_groups

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["lang", "text"])

    def word_counts(batch: pd.DataFrame) -> pd.DataFrame:
        # bulk Arrow tokenize — same kernel as tfidf_top_terms
        # (verdict r4 item 4); flatten() is offset-safe on slices
        toks = pc.split_pattern(
            pc.utf8_lower(pa.array(batch["text"].fillna(""),
                                   type=pa.string())), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        if not lens.sum():
            return pd.DataFrame({"lang": [], "word": [], "c": []})
        df = pd.DataFrame({
            "lang": np.repeat(batch["lang"].to_numpy(), lens),
            "word": pc.list_flatten(toks).to_numpy(zero_copy_only=False)})
        df = df[df["word"] != ""]
        return df.groupby(["lang", "word"], as_index=False).size().rename(
            columns={"size": "c"})

    partials = ds.map_batches(word_counts, batch_format="pandas")

    def entropy_shard(shard: pd.DataFrame) -> pd.DataFrame:
        counts = shard.groupby(["lang", "word"])["c"].sum()
        rows = []
        for lang, g in counts.groupby(level="lang", sort=False):
            c = g.to_numpy(dtype=np.float64)
            total = c.sum()
            p = c / total
            rows.append({
                "lang": lang,
                "n_tokens": int(total),
                "n_distinct": int(c.size),
                "entropy_bits": round(float(-(p * np.log2(p)).sum()), 6),
            })
        return pd.DataFrame(rows, columns=[
            "lang", "n_tokens", "n_distinct", "entropy_bits"])

    return sharded_map_groups(partials, "lang", entropy_shard)


def token_length_histogram(sf_dir: str):
    """Sequence-length distribution of the corpus per language — the
    training-data diagnostic behind context-length planning and packing
    efficiency.  Token count = number of ``\\S+`` runs (one vectorized
    RE2 count per batch, ``pc.count_substring_regex``); length classes
    are power-of-two buckets (bucket = 2^floor(log2(n)), 0 for empty
    docs), computed integer-exactly by searchsorted against an int64
    power table (no float log2 edge cases).

    Scale shape: each batch emits only its (lang × ~20 buckets) partial
    counts, so the combine groupby moves O(langs × buckets × batches)
    rows — document text never shuffles."""
    ds = _rd().read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"])

    pows = np.int64(1) << np.arange(63, dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            batch["text"], r"\S+").to_numpy(zero_copy_only=False)
        n = n.astype(np.int64)
        bucket = np.where(
            n > 0, pows[np.searchsorted(pows, n, side="right") - 1], 0)
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"lang": lang, "len_bucket": bucket, "n": n})
        g = df.groupby(["lang", "len_bucket"], as_index=False).agg(
            p_docs=("n", "size"), p_tokens=("n", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(shard: pd.DataFrame) -> pd.DataFrame:
        # integer partial sums — order-independent, exact
        return shard.groupby(["lang", "len_bucket"], as_index=False).agg(
            n_docs=("p_docs", "sum"), n_tokens=("p_tokens", "sum"))

    from ..stages.shard import sharded_map_groups

    return sharded_map_groups(ds.map_batches(partial,
                                             batch_format="pyarrow"),
                              ["lang", "len_bucket"], final,
                              num_shards=None)


_TOKEN_HIST_ORACLE = """
WITH counted AS (
  SELECT lang, len(regexp_extract_all(text, '\\S+')) AS n
  FROM documents
)
SELECT lang,
       CASE WHEN n = 0 THEN 0
            ELSE CAST(power(2, length(format('{:b}', n)) - 1) AS BIGINT)
       END AS len_bucket,
       count(*) AS n_docs,
       sum(n) AS n_tokens
FROM counted
GROUP BY 1, 2
"""


def tokens_input_dir(sf_dir: str) -> str:
    """Deterministic synthesized native input for this sf (cached)."""
    from ..sources.tokensynth import write_tokens_dataset

    name = os.path.basename(os.path.normpath(sf_dir))
    rows = _SF_ROWS.get(name, 6_000)
    gen_version = "v2"  # bump when the generator recipe changes
    out = os.path.join("/tmp", "pycatcher_ray_tokens", f"{name}-{gen_version}")
    marker = os.path.join(out, "_COMPLETE")
    if not os.path.exists(marker):
        # generate into a unique tmp dir, then atomically rename — safe
        # against concurrent query invocations racing on the cache
        tmp = f"{out}.tmp.{os.getpid()}"
        write_tokens_dataset(tmp, rows, rows_per_file=100_000)
        with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
            f.write(str(rows))
        try:
            os.rename(tmp, out)
        except OSError:  # another process won the race
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return out


def _tokens_paths(sf_dir: str) -> list[str]:
    d = tokens_input_dir(sf_dir)
    return [os.path.join(d, f) for f in sorted(os.listdir(d))
            if f.endswith(".parquet")]


def tokens_rollup_1m(sf_dir: str):
    """Native-input rollup: n_tok per (source, minute).  Exact-oracle
    checked against DuckDB over the same synthesized parquet in
    tests/test_ray_engine.py."""
    from ..stages.ingest import ingest

    def build():
        from ..stages.ingest import read_parquet_fused

        _rd()
        ds = read_parquet_fused(_tokens_paths(sf_dir))
        slim = ingest(ds, checksum=False).select_columns(
            ["source", "ts", "n_tok"])
        return rollup(slim, "source", "ts", "n_tok", 60)

    return _memo_ds(("tok_roll", os.path.abspath(sf_dir), "1m"), build)


def _tokens_rollup_1h(sf_dir: str):
    """Hourly cascade of the native rollup (shared by the flags/gapfill
    family — memoized per process like the events tiers)."""
    return _memo_ds(("tok_roll", os.path.abspath(sf_dir), "1h"),
                    lambda: cascade(tokens_rollup_1m(sf_dir), "source", 3600))


def tokens_flags_1h(sf_dir: str):
    """Native-input anomaly scan at the 1h tier (planted x10 spikes)."""
    cfg = EngineConfig(detect_concurrency=2,
                       detectors=("iqr", "mad", "zscore", "stl", "esd"))
    roll = _tokens_rollup_1h(sf_dir)
    return detect(roll, "source", tier="1h", cfg=cfg)


def tokens_gapfill_1h(sf_dir: str):
    """Gap-filled hourly series with fill provenance."""
    roll = _tokens_rollup_1h(sf_dir)
    return _cast_npoints_double(gapfill(roll, "source", 3600, method="linear"))


def tokens_gapfill_1m(sf_dir: str):
    """Linear gap-fill at the native 1m tier, where the synth's planted
    whole-bucket gaps (minutes 1000-1029) and the Zipf tail's organic
    sparsity actually exercise interpolation (~36k of 57k grid rows at
    sf0.01 are synthetic).  Oracle: DuckDB window functions replaying
    np.interp's exact operation order (slope = dv/didx first, then
    slope*(idx-pidx)+prev) — bit-identical, no rounding needed."""
    return _cast_npoints_double(
        gapfill(tokens_rollup_1m(sf_dir), "source", 60, method="linear")
    )


def _tokens_flags(sf_dir: str, method: str):
    from ._core import _anchor_schema

    roll = _tokens_rollup_1h(sf_dir)
    flags = detect(roll, "source", tier="1h",
                   cfg=EngineConfig(detect_concurrency=2), methods=(method,))
    out = flags.select_columns(["key", "bucket_start", "value"])
    return _anchor_schema(out, pa.schema([
        ("key", pa.string()),
        ("bucket_start", pa.timestamp("s")),
        ("value", pa.float64()),
    ]))


def tokens_iqr_flags_1h(sf_dir: str):
    """Tukey-fence outliers on the hourly n_tok series (exact oracle)."""
    return _tokens_flags(sf_dir, "iqr")


def tokens_zscore_flags_1h(sf_dir: str):
    """|z| > 2 outliers on the hourly n_tok series (exact oracle)."""
    return _tokens_flags(sf_dir, "zscore")


def tokens_mad_flags_1h(sf_dir: str):
    """Modified-z (0.6745·|v-med|/MAD > 3.5) outliers, exact oracle."""
    return _tokens_flags(sf_dir, "mad")


def tokens_classic_decompose_1h(sf_dir: str):
    """Classic additive decomposition of the NATIVE hourly n_tok series
    — the north-rule signal run through the same bit-exact integer
    pipeline as ``classic_decompose_1h``: centered 25-point moving-
    average trend, hour-of-day seasonal means of the detrended series,
    residual, emitted only where the full window exists.  Token sums
    are already integers, so V needs no 10⁻⁴ scaling; every
    intermediate (trend_sum, D = 25·V − trend_sum, per-slot ΣD) is an
    exact integer and each output is ONE integer→double divide written
    identically on both engines."""
    from ..stages.shard import sharded_map_groups

    roll = _tokens_rollup_1h(sf_dir)

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["source", "bucket_start"],
                                  kind="stable")
        out = []
        for src, g in shard.groupby("source", sort=False):
            V = np.rint(g["sum_value"].to_numpy(
                dtype=np.float64)).astype(np.int64)
            n = V.size
            if n < 25:
                continue
            win = np.lib.stride_tricks.sliding_window_view(V, 25)
            trend_sum = win.sum(axis=1)
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
                "value": V[mid].astype(np.float64),
                "trend": trend_sum.astype(np.float64) / 25.0,
                "seasonal": s2.astype(np.float64) / (n2 * 25.0),
                "residual": (n2 * D - s2).astype(np.float64) / (n2 * 25.0),
            }))
        if not out:
            return pd.DataFrame(columns=[
                "source", "bucket_start", "value", "trend", "seasonal",
                "residual"])
        return pd.concat(out, ignore_index=True)

    return sharded_map_groups(
        roll.select_columns(["source", "bucket_start", "sum_value"]),
        "source", fold)


def _tokens_classic_decompose_oracle() -> str:
    return _tokens_oracle_cte() + """, r AS (
  SELECT source,
         to_timestamp(epoch_s - (epoch_s % 3600)) AT TIME ZONE 'UTC'
           AS bucket_start,
         CAST(sum(n_tok) AS BIGINT) AS V
  FROM t GROUP BY 1, 2
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
       CAST(d.V AS DOUBLE) AS value,
       CAST(d.trend_sum AS DOUBLE) / 25.0 AS trend,
       CAST(s.s2 AS DOUBLE) / (s.n2 * 25.0) AS seasonal,
       CAST(s.n2 * d.D - s.s2 AS DOUBLE) / (s.n2 * 25.0) AS residual
FROM d JOIN s ON s.source = d.source AND s.slot = d.slot
"""


def business_hours_share(sf_dir: str):
    """Share of each source's tokens emitted during business hours
    (Mon-Fri, 09:00-16:59 UTC) — the submission-cadence fingerprint
    that separates scraped human forums from batch-generated corpora.
    Pure integer calendar arithmetic (hour-of-day = epoch-hours mod 24,
    day-of-week = (epoch-days + 4) mod 7 with 0 = Sunday — DuckDB's
    dayofweek convention), map-only per-source partials, ONE final
    divide."""
    ds = _rd().read_parquet(_tokens_paths(sf_dir),
                            columns=["doc_id", "source", "n_tok"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        epoch_s = (b["doc_id"].str.split("|").str[1]
                   .astype(np.int64) * 60)
        hod = (epoch_s // 3600) % 24
        dow = (epoch_s // 86400 + 4) % 7
        n = b["n_tok"].to_numpy(np.int64)
        biz = ((dow >= 1) & (dow <= 5) & (hod >= 9) & (hod < 17)
               ).to_numpy()
        g = pd.DataFrame({"source": b["source"], "tot": n,
                          "biz": np.where(biz, n, 0)}).groupby(
            "source", as_index=False).sum()
        g["tot"] = g["tot"].astype(np.int64)
        g["biz"] = g["biz"].astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    fin = parts.groupby("source", as_index=False).sum()
    return pd.DataFrame({
        "source": fin["source"],
        "total_tokens": fin["tot"].astype(np.int64),
        "business_tokens": fin["biz"].astype(np.int64),
        "business_share": fin["biz"].astype(np.float64)
        / fin["tot"].astype(np.float64)})


def _business_hours_oracle() -> str:
    return _tokens_oracle_cte() + """
SELECT source,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN (epoch_s // 86400 + 4) % 7 BETWEEN 1 AND 5
                      AND (epoch_s // 3600) % 24 BETWEEN 9 AND 16
                     THEN n_tok ELSE 0 END) AS BIGINT) AS business_tokens,
       CAST(CAST(sum(CASE WHEN (epoch_s // 86400 + 4) % 7 BETWEEN 1 AND 5
                           AND (epoch_s // 3600) % 24 BETWEEN 9 AND 16
                          THEN n_tok ELSE 0 END) AS BIGINT) AS DOUBLE)
         / CAST(CAST(sum(n_tok) AS BIGINT) AS DOUBLE) AS business_share
FROM t GROUP BY source
"""


def doc_token_concentration(sf_dir: str):
    """Token-mass concentration per source: the minimum number of
    documents (taken largest-first) that covers ≥ 90 % of the source's
    tokens — the Lorenz-curve point that decides whether a per-doc cap
    or a length filter reshapes the mix.  The 90 % cut is the exact
    integer compare 10·cum ≥ 9·total (no float threshold); doc order
    is (n_tok DESC, doc_id ASC) on both engines.  One source-keyed
    exchange; the per-source sort is over that source's doc count (the
    bounded-per-key contract of the detector family — at larger
    per-key cardinality the scale path is a two-pass n_tok-histogram
    cut).  Sources with zero tokens emit n_docs_90pct = 0."""
    from ..stages.shard import sharded_map_groups

    ds = _rd().read_parquet(_tokens_paths(sf_dir),
                            columns=["doc_id", "source", "n_tok"])

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in shard.groupby("source", sort=False):
            g = g.sort_values(["n_tok", "doc_id"],
                              ascending=[False, True], kind="stable")
            n = g["n_tok"].to_numpy(np.int64)
            tot = int(n.sum())
            if tot == 0:
                n90 = 0
            else:
                cum = np.cumsum(n)
                n90 = int(np.argmax(10 * cum >= 9 * tot)) + 1
            rows.append({"source": src, "n_docs": int(n.size),
                         "total_tokens": tot, "n_docs_90pct": n90})
        return pd.DataFrame(rows, columns=[
            "source", "n_docs", "total_tokens", "n_docs_90pct"])

    return sharded_map_groups(ds, "source", fold)


def _doc_token_concentration_oracle() -> str:
    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    glob = os.path.join(tokens_input_dir(sf_dir), "*.parquet")
    return f"""
WITH w AS (
  SELECT source, n_tok,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_tok DESC, doc_id ASC) AS rn,
         sum(CAST(n_tok AS BIGINT)) OVER (
             PARTITION BY source ORDER BY n_tok DESC, doc_id ASC
             ROWS UNBOUNDED PRECEDING) AS cum,
         count(*) OVER (PARTITION BY source) AS n,
         sum(CAST(n_tok AS BIGINT)) OVER (PARTITION BY source) AS tot
  FROM read_parquet('{glob}')
)
SELECT source, n AS n_docs, CAST(tot AS BIGINT) AS total_tokens,
       CASE WHEN tot = 0 THEN 0 ELSE min(rn) END AS n_docs_90pct
FROM w WHERE 10 * cum >= 9 * tot OR tot = 0
GROUP BY source, n, tot
"""


def tokens_dominant_acf_lag(sf_dir: str, max_lag: int = 48):
    """Dominant seasonality period of the NATIVE hourly n_tok series —
    dominant_acf_lag's exact-bigint argmax (e = n·V − ΣV demeaning,
    Σ eᵢe₍ᵢ₊ₖ₎ in Python bigint / HUGEINT, smallest-lag ties) run on
    the north-rule signal, answering 'what period should the tokens
    STL use?'.  One source-keyed exchange over the hourly tier."""
    from ..stages.shard import sharded_map_groups

    roll = _tokens_rollup_1h(sf_dir)

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["source", "bucket_start"],
                                  kind="stable")
        rows = []
        for src, g in shard.groupby("source", sort=False):
            V = np.rint(g["sum_value"].to_numpy(
                dtype=np.float64)).astype(np.int64)
            n = int(V.size)
            if n < 2:
                continue
            total = int(V.sum())
            e = [n * int(v) - total for v in V.tolist()]
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
        roll.select_columns(["source", "bucket_start", "sum_value"]),
        "source", fold)


def _tokens_dominant_acf_oracle() -> str:
    return _tokens_oracle_cte() + """, r AS (
  SELECT source, CAST(sum(n_tok) AS BIGINT) AS V,
         row_number() OVER (PARTITION BY source
                            ORDER BY epoch_s - (epoch_s % 3600)) AS idx
  FROM t GROUP BY source, epoch_s - (epoch_s % 3600)
), tt AS (
  SELECT source, count(*) AS n, sum(CAST(V AS HUGEINT)) AS total
  FROM r GROUP BY source
), e AS (
  SELECT r.source, r.idx, tt.n, tt.n * CAST(r.V AS HUGEINT) - tt.total AS ev
  FROM r JOIN tt USING (source)
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


def tokens_hourly_profile(sf_dir: str):
    """Hour-of-day p25/p50/p75 bands of the NATIVE hourly n_tok series
    — the seasonal envelope of the north-rule signal (which hours does
    this source emit tokens in?).  hour-of-day = epoch-hours mod 24;
    quantiles ride the bit-pinned ``quantile_cont`` lerp over exact
    integer token sums.  Output bounded at sources × 24."""
    from ..functions.stats import quantile_cont
    from ..stages.shard import sharded_map_groups

    roll = _tokens_rollup_1h(sf_dir)

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["source", "bucket_start"],
                                  kind="stable")
        rows = []
        for src, g in shard.groupby("source", sort=False):
            hod = (g["bucket_start"].to_numpy().astype("datetime64[s]")
                   .astype(np.int64) // 3600) % 24
            V = np.rint(g["sum_value"].to_numpy(
                dtype=np.float64)).astype(np.int64)
            for h in np.unique(hod):
                v = np.sort(V[hod == h].astype(np.float64))
                rows.append({
                    "source": src, "hour_of_day": int(h),
                    "n_obs": int(v.size),
                    "p25": float(quantile_cont(v, 0.25)),
                    "p50": float(quantile_cont(v, 0.50)),
                    "p75": float(quantile_cont(v, 0.75)),
                })
        return pd.DataFrame(rows, columns=[
            "source", "hour_of_day", "n_obs", "p25", "p50", "p75"])

    return sharded_map_groups(
        roll.select_columns(["source", "bucket_start", "sum_value"]),
        "source", fold)


def _tokens_hourly_profile_oracle() -> str:
    return _tokens_oracle_cte() + """, r AS (
  SELECT source,
         (epoch_s - (epoch_s % 3600)) // 3600 % 24 AS hour_of_day,
         CAST(sum(n_tok) AS BIGINT) AS V
  FROM t GROUP BY source, epoch_s - (epoch_s % 3600)
)
SELECT source, hour_of_day, count(*) AS n_obs,
       quantile_cont(V, 0.25) AS p25,
       quantile_cont(V, 0.50) AS p50,
       quantile_cont(V, 0.75) AS p75
FROM r GROUP BY 1, 2
"""


def tokens_chunks_1m(sf_dir: str):
    """Gorilla chunk table for the 1m tier, value-checked THROUGH the
    codec (verdict r4 item 1 — was metadata-only rows-only): every
    emitted statistic is computed from the DECODED blob, and the DuckDB
    oracle reproduces all of them from the raw tokens table + the
    chunk rule (chunk_id = floor(epoch/86400), stages/compress.py:27),
    so a codec regression (bit drift, lost point, wrong timestamp
    delta) turns the driver row into a hard FAIL.  Token counts are
    integers in float64 (≪ 2⁵³), so min/max/sum are exact on both
    sides.  Scale shape: chunks ride the rollup's key exchange; decode
    is a stateless per-chunk map — the audit read path of the
    compressed retention tier."""
    from ..functions.gorilla import decode_chunk
    from ..stages.compress import compress

    chunks = compress(tokens_rollup_1m(sf_dir), "source", 60,
                      TIERS["1m"].chunk_buckets)

    def decode_stats(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, cid, blob in zip(batch["key"], batch["chunk_id"],
                                  batch["chunk"]):
            ts, vals = decode_chunk(blob)
            rows.append(_decoded_chunk_stats(key, cid, ts, vals))
        return pd.DataFrame(rows, columns=[
            "source", "chunk_id", "t0", "t1", "n_points", "raw_bytes",
            "sum_tokens", "min_tok", "max_tok"])

    return chunks.map_batches(decode_stats, batch_format="pandas")


# shared 1m-rollup + chunk-rule CTE for the chunk-table oracles (the
# chunk rule — chunk_id = floor(epoch/86400), stages/compress.py:27 —
# lives HERE once; tokens_chunks_1m and tokens_chunks_fixed_1m both
# derive from it)
_TOKENS_CHUNK_ROLLUP_CTE = """, r AS (
  SELECT source, epoch_s - (epoch_s % 60) AS b,
         CAST(sum(n_tok) AS BIGINT) AS v
  FROM t GROUP BY 1, 2
)"""


def _decoded_chunk_stats(key, cid, ts, vals) -> dict:
    """Shared per-chunk decoded-blob statistics (both chunk queries)."""
    return {
        "source": key, "chunk_id": int(cid),
        "t0": int(ts[0]), "t1": int(ts[-1]),
        "n_points": int(ts.size),
        "raw_bytes": int(ts.size) * 16,
        "sum_tokens": int(vals.sum()),
        "min_tok": int(vals.min()), "max_tok": int(vals.max()),
    }


def _tokens_chunks_oracle() -> str:
    return _tokens_oracle_cte() + _TOKENS_CHUNK_ROLLUP_CTE + """
SELECT source, b // 86400 AS chunk_id,
       min(b) AS t0, max(b) AS t1,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(count(*) * 16 AS BIGINT) AS raw_bytes,
       sum(v) AS sum_tokens, min(v) AS min_tok, max(v) AS max_tok
FROM r GROUP BY 1, 2
"""


def tokens_length_stats(sf_dir: str):
    """Sequence-length curation profile per source over the native
    input: doc count, total tokens (int-exact), p50/p90/p99 of n_tok
    (quantile_cont bit-parity lerp) and the short/long tail counts the
    length filters act on.  Reads ONLY (source, n_tok) — the tokens list
    column never leaves storage."""
    from ..functions.stats import quantile_cont
    from ..stages.shard import sharded_map_groups

    ds = _rd().read_parquet(_tokens_paths(sf_dir),
                            columns=["source", "n_tok"])

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in shard.groupby("source", sort=False):
            n = g["n_tok"].to_numpy(dtype=np.int64)
            q = quantile_cont(n.astype(np.float64), [0.5, 0.9, 0.99])
            rows.append({
                "source": src,
                "n_docs": int(n.size),
                "total_tokens": int(n.sum()),
                # interpolated quantiles of ints have <= 2 decimals of
                # true value; round 6 cannot sit on a tie
                "p50": round(float(q[0]), 6),
                "p90": round(float(q[1]), 6),
                "p99": round(float(q[2]), 6),
                "n_short": int((n < 16).sum()),
                "n_long": int((n > 1024).sum()),
            })
        return pd.DataFrame(rows, columns=[
            "source", "n_docs", "total_tokens", "p50", "p90", "p99",
            "n_short", "n_long"])

    return sharded_map_groups(ds, "source", fold)


def _tokens_length_stats_oracle() -> str:
    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    glob = os.path.join(tokens_input_dir(sf_dir), "*.parquet")
    return f"""
SELECT source, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       round(quantile_cont(n_tok, 0.5), 6) AS p50,
       round(quantile_cont(n_tok, 0.9), 6) AS p90,
       round(quantile_cont(n_tok, 0.99), 6) AS p99,
       count(*) FILTER (n_tok < 16) AS n_short,
       count(*) FILTER (n_tok > 1024) AS n_long
FROM read_parquet('{glob}')
GROUP BY source
"""


def padding_waste(sf_dir: str):
    """Context-length padding efficiency over the native tokens input:
    for each candidate context length (512 / 2048 / 8192), every doc
    pads to ceil(n_tok/ctx)·ctx and the per-source waste share is
    (padded − real) / padded — the number that decides whether a corpus
    needs packing (cf. context_packing) before training at that context.
    ALL integer until the one final divide; map-only per-(source, ctx)
    partials (bounded by sources × 3 × batches, never the doc count),
    tiny driver fold; reads ONLY (source, n_tok)."""
    ds = _rd().read_parquet(_tokens_paths(sf_dir),
                            columns=["source", "n_tok"])
    ctxs = np.array([512, 2048, 8192], dtype=np.int64)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["n_tok"].to_numpy(dtype=np.int64)
        rows = []
        for src, idx in batch.groupby("source", sort=False).indices.items():
            g = n[idx]
            for ctx in ctxs:
                padded = int((((g + ctx - 1) // ctx) * ctx).sum())
                rows.append({"source": src, "ctx": int(ctx),
                             "n_docs": int(g.size),
                             "real_tokens": int(g.sum()),
                             "padded_tokens": padded})
        return pd.DataFrame(rows, columns=[
            "source", "ctx", "n_docs", "real_tokens", "padded_tokens"])

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    fin = parts.groupby(["source", "ctx"], as_index=False).sum()
    padded = fin["padded_tokens"].to_numpy(np.int64)
    real = fin["real_tokens"].to_numpy(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        waste = np.where(padded > 0,
                         (padded - real).astype(np.float64)
                         / padded.astype(np.float64), np.nan)
    fin["waste_share"] = waste
    return fin[["source", "ctx", "n_docs", "real_tokens",
                "padded_tokens", "waste_share"]]


def _padding_waste_oracle() -> str:
    return _tokens_oracle_cte() + """
SELECT source, ctx, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS real_tokens,
       CAST(sum(((n_tok + ctx - 1) // ctx) * ctx) AS BIGINT)
         AS padded_tokens,
       CASE WHEN sum(((n_tok + ctx - 1) // ctx) * ctx) > 0 THEN
         CAST(CAST(sum(((n_tok + ctx - 1) // ctx) * ctx)
                   - sum(n_tok) AS BIGINT) AS DOUBLE)
         / CAST(CAST(sum(((n_tok + ctx - 1) // ctx) * ctx) AS BIGINT)
                AS DOUBLE)
       ELSE NULL END AS waste_share
FROM t CROSS JOIN (VALUES (512), (2048), (8192)) v(ctx)
GROUP BY 1, 2
"""


def token_length_drift(sf_dir: str):
    """Training-mix drift monitor over the native tokens input: per
    (source, n_tok-band of 64) document counts in the first vs second
    day of the window, plus each band's share of its source-half total —
    the per-band rows of a PSI / chi² distribution-shift check, kept
    exact-int (ONE int/int divide per rate) instead of a float log-sum
    so the driver hash is bit-stable.  Map-only partials (per-batch
    groupby) → one tiny (source, band) fold → a source-keyed pass
    attaches the half totals; reads only (doc_id→ts, source, n_tok) —
    the tokens list column never leaves storage."""
    from ..stages.ingest import ingest, read_parquet_fused
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    _rd()
    ds = read_parquet_fused(_tokens_paths(sf_dir))
    slim = ingest(ds, checksum=False).select_columns(
        ["source", "ts", "n_tok"])
    mid = np.datetime64("2024-01-02T00:00:00")

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        early = b["ts"].to_numpy() < mid
        g = pd.DataFrame({
            "source": b["source"],
            "band": b["n_tok"].to_numpy(np.int64) // 64,
            "n_early": early.astype(np.int64),
            "n_late": (~early).astype(np.int64),
        })
        return g.groupby(["source", "band"], as_index=False)[
            ["n_early", "n_late"]].sum()

    parts = slim.map_batches(partials, batch_format="pandas")
    agg = sharded_aggregate(parts, ["source", "band"],
                            {"n_early": "sum", "n_late": "sum"},
                            num_shards=4)

    def rates(shard: pd.DataFrame) -> pd.DataFrame:
        out = []
        for src, g in shard.groupby("source", sort=False):
            ne = g["n_early"].to_numpy(np.int64)
            nl = g["n_late"].to_numpy(np.int64)
            te, tl = int(ne.sum()), int(nl.sum())
            out.append(pd.DataFrame({
                "source": src,
                "band": g["band"].to_numpy(np.int64),
                "n_early": ne,
                "n_late": nl,
                "rate_early": ne / te if te else np.zeros(ne.size),
                "rate_late": nl / tl if tl else np.zeros(nl.size),
            }))
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame({
            "source": pd.Series([], dtype=object),
            "band": pd.Series([], dtype=np.int64),
            "n_early": pd.Series([], dtype=np.int64),
            "n_late": pd.Series([], dtype=np.int64),
            "rate_early": pd.Series([], dtype=np.float64),
            "rate_late": pd.Series([], dtype=np.float64)})

    return sharded_map_groups(agg, "source", rates, num_shards=4)


def token_prefix_novelty(sf_dir: str):
    """Temporal dedup signal over the native tokens input: the share of
    documents per (source, day) whose 8-token PREFIX was never seen
    earlier (first occurrence by (event time, doc_id)) — the cheap
    leading indicator of a crawl turning repetitive.  Per batch the
    prefix extracts fully vectorized from the Arrow list column into a
    padded (n, 8) int32 matrix viewed as four uint64 key words (pad −1
    cannot collide: tokens are non-negative); the 4-word key rides ONE
    hash exchange where each shard picks the unique (epoch, doc_id)
    argmin per prefix; integer (source, day) partials fold in a tiny
    second exchange.  Novelty rate is ONE int/int divide.  The oracle
    groups by the actual ``tokens[1:8]`` list — equal lists ⇔ equal
    padded keys, so both sides count identical first-occurrences."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    ds = _rd().read_parquet(_tokens_paths(sf_dir),
                            columns=["doc_id", "tokens", "source"])

    def emit(tb: pa.Table) -> pd.DataFrame:
        toks = tb["tokens"].combine_chunks()
        off = toks.offsets.to_numpy().astype(np.int64)
        vals = toks.values.to_numpy().astype(np.int32)
        n = len(tb)
        lens = off[1:] - off[:-1]
        take = np.minimum(lens, 8)
        M = np.full((n, 8), -1, dtype=np.int32)
        rows = np.repeat(np.arange(n, dtype=np.int64), take)
        cols = (np.arange(int(take.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(take) - take, take))
        M[rows, cols] = vals[np.repeat(off[:-1], take) + cols]
        key = M.view(np.uint64).astype(np.int64)  # (n, 4) words
        doc_id = tb["doc_id"].to_pandas()
        epoch_s = doc_id.str.split("|").str[1].astype(np.int64) * 60
        return pd.DataFrame({
            "k1": key[:, 0], "k2": key[:, 1],
            "k3": key[:, 2], "k4": key[:, 3],
            "epoch_s": epoch_s.to_numpy(),
            "doc_id": doc_id.to_numpy(),
            "source": tb["source"].to_pandas().to_numpy(),
        })

    tagged = ds.map_batches(emit, batch_format="pyarrow")

    def first_seen(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["k1", "k2", "k3", "k4", "epoch_s",
                                   "doc_id"], kind="stable")
        novel = ~shard.duplicated(["k1", "k2", "k3", "k4"])
        day = (shard["epoch_s"].to_numpy(np.int64) // 86400) * 86400
        g = pd.DataFrame({
            "source": shard["source"].to_numpy(),
            "day": day,
            "n_docs": np.ones(len(shard), dtype=np.int64),
            "n_novel": novel.to_numpy().astype(np.int64),
        })
        return g.groupby(["source", "day"], as_index=False)[
            ["n_docs", "n_novel"]].sum()

    parts = sharded_map_groups(tagged, ["k1", "k2", "k3", "k4"],
                               first_seen)
    agg = sharded_aggregate(parts, ["source", "day"],
                            {"n_docs": "sum", "n_novel": "sum"},
                            num_shards=2)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        nd = b["n_docs"].to_numpy(np.int64)
        nv = b["n_novel"].to_numpy(np.int64)
        return pd.DataFrame({
            "source": b["source"],
            "day": pd.to_datetime(b["day"].to_numpy(np.int64), unit="s"),
            "n_docs": nd,
            "n_novel": nv,
            "novelty_rate": nv / nd,
        })

    return agg.map_batches(fin, batch_format="pandas")


def _token_prefix_novelty_oracle() -> str:
    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    glob = os.path.join(tokens_input_dir(sf_dir), "*.parquet")
    return f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(string_split(doc_id, '|')[2] AS BIGINT) * 60 AS epoch_s,
         tokens[1:8] AS pre
  FROM read_parquet('{glob}')
), r AS (
  SELECT source, epoch_s,
         row_number() OVER (PARTITION BY pre
                            ORDER BY epoch_s, doc_id) = 1 AS novel
  FROM t
)
SELECT source,
       to_timestamp(epoch_s - (epoch_s % 86400)) AT TIME ZONE 'UTC' AS day,
       count(*) AS n_docs,
       count(*) FILTER (novel) AS n_novel,
       CAST(count(*) FILTER (novel) AS DOUBLE) / count(*) AS novelty_rate
FROM r GROUP BY 1, 2
"""


def _token_drift_oracle() -> str:
    # 1704153600 = 2024-01-02T00:00Z, the midpoint of the synth's 2-day
    # window (EPOCH_START_MINUTE + 1440 minutes)
    return _tokens_oracle_cte() + """
, g AS (
  SELECT source, CAST(n_tok // 64 AS BIGINT) AS band,
         count(*) FILTER (epoch_s < 1704153600) AS n_early,
         count(*) FILTER (epoch_s >= 1704153600) AS n_late
  FROM t GROUP BY 1, 2
), tot AS (
  SELECT source, sum(n_early) AS te, sum(n_late) AS tl
  FROM g GROUP BY source
)
SELECT g.source, g.band, g.n_early, g.n_late,
       CASE WHEN te > 0 THEN CAST(g.n_early AS DOUBLE) / te
            ELSE 0.0 END AS rate_early,
       CASE WHEN tl > 0 THEN CAST(g.n_late AS DOUBLE) / tl
            ELSE 0.0 END AS rate_late
FROM g JOIN tot USING (source)
"""


def tokens_audit(sf_dir: str):
    """Per-row token invariant proof: recompute the checksum twice (at
    ingest and after a pass-through projection) and report per-source
    agreement counts.  Any mismatch row would surface with
    matches=false."""
    from ..stages.ingest import ingest

    ds = _rd().read_parquet(_tokens_paths(sf_dir))
    ingested = ingest(ds, checksum=True)

    def recheck(batch: pa.Table) -> pa.Table:
        from ..stages.ingest import _tokens_checksum

        again = _tokens_checksum(batch["tokens"])
        ok = pc.equal(batch["tok_checksum"], pa.array(again, type=pa.uint64()))
        t = pa.table(
            {"source": batch["source"],
             "ok": pc.cast(ok, pa.int64()),
             "one": pa.array(np.ones(len(batch), dtype=np.int64))}
        )
        return t.group_by("source").aggregate([("ok", "sum"), ("one", "sum")]
                                              ).rename_columns(
            ["source", "p_ok", "p_n"]
        )

    def final(shard: pd.DataFrame) -> pd.DataFrame:
        # integer partial sums — order-independent, exact
        return shard.groupby("source", as_index=False).agg(
            rows_ok=("p_ok", "sum"), rows=("p_n", "sum"))

    from ..stages.shard import sharded_map_groups

    return sharded_map_groups(ingested.map_batches(recheck,
                                                   batch_format="pyarrow"),
                              "source", final, num_shards=None)


# ----------------------------------------- tokens-native driver oracles
#
# The driver's correctness gate runs at sf=0.01 with a FIXED oracle SQL
# string, so the tokens oracles embed the absolute path of the
# deterministic synthesized input for that sf (generated on demand when
# ``oracles()`` is called — same cached artifact the queries read).
# ``GRAFT_ORACLE_SF_DIR`` overrides the sf for local gate replicas
# (scripts/check_oracles.py sets it to its sf_dir argument).


def _tokens_oracle_cte() -> str:
    """Shared ingest CTE: parquet → (source, epoch_s, ts, n_tok), the SQL
    twin of stages/ingest.py's doc_id→ts derivation."""
    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    glob = os.path.join(tokens_input_dir(sf_dir), "*.parquet")
    return f"""
WITH t AS (
  SELECT source,
         CAST(string_split(doc_id, '|')[2] AS BIGINT) * 60 AS epoch_s,
         n_tok
  FROM read_parquet('{glob}')
)"""


_TOKENS_HOURLY = """, r AS (
  SELECT source, epoch_s - (epoch_s % 3600) AS b,
         CAST(sum(n_tok) AS DOUBLE) AS v
  FROM t GROUP BY 1, 2
)"""


def _tokens_rollup_oracle(bucket_seconds: int = 60) -> str:
    return _tokens_oracle_cte() + f"""
SELECT source,
       to_timestamp(epoch_s - (epoch_s % {bucket_seconds}))
         AT TIME ZONE 'UTC' AS bucket_start,
       CAST(sum(n_tok) AS DOUBLE) AS sum_value,
       count(*) AS n_points,
       CAST(min(n_tok) AS DOUBLE) AS min_value,
       CAST(max(n_tok) AS DOUBLE) AS max_value,
       CAST(sum(n_tok) AS DOUBLE) / count(*) AS mean_value
FROM t GROUP BY 1, 2
"""


def tokens_rollup_1h(sf_dir: str):
    """Hourly retention tier of the NATIVE tokens rollup, exact-oracled
    — with ``tokens_rollup_1m`` and ``tokens_rollup_1d`` this
    value-checks the north rule's 'match the rolled-up points at each
    retention tier' on the native input: the cascade re-aggregates the
    1m tier (raw stream never re-read), and every statistic is exact
    (integer token counts in float64 ≪ 2⁵³; mean is ONE divide)."""
    return _tokens_rollup_tier(sf_dir, "1h")


def tokens_rollup_1d(sf_dir: str):
    """Daily retention tier of the native tokens rollup (cascaded from
    the memoized 1h tier) — see ``tokens_rollup_1h``."""
    return _tokens_rollup_tier(sf_dir, "1d")


def _tokens_rollup_tier(sf_dir: str, tier: str):
    if tier == "1h":
        return _tokens_rollup_1h(sf_dir)
    return _memo_ds(("tok_roll", os.path.abspath(sf_dir), "1d"),
                    lambda: cascade(_tokens_rollup_1h(sf_dir), "source",
                                    86400))


def _tokens_gapfill_oracle(bucket_seconds: int) -> str:
    """Dense grid per source + linear interpolation via window functions.
    Replays np.interp's float ops exactly: slope = (next-prev)/didx
    rounded first, then slope*(idx-pidx)+prev — bit-identical to the
    pandas interpolate in stages/gapfill.py (probed at sf0.01: 0
    bit-mismatches over 36k interpolated rows)."""
    cols = ("sum_value", "n_points", "min_value", "max_value", "mean_value")
    win = " , ".join(
        f"""last_value({c} IGNORE NULLS) OVER wp AS p_{c},
      first_value({c} IGNORE NULLS) OVER wn AS n_{c}""" for c in cols
    )
    sel = " , ".join(
        f"CASE WHEN fill_method = 'observed' THEN {c} "
        f"ELSE ((n_{c} - p_{c}) / (nidx - pidx)) * (idx - pidx) + p_{c} "
        f"END AS {c}" for c in cols
    )
    s = bucket_seconds
    return _tokens_oracle_cte() + f""", r AS (
  SELECT source, epoch_s - (epoch_s % {s}) AS b,
         CAST(sum(n_tok) AS DOUBLE) AS sum_value,
         CAST(count(*) AS DOUBLE) AS n_points,
         CAST(min(n_tok) AS DOUBLE) AS min_value,
         CAST(max(n_tok) AS DOUBLE) AS max_value,
         CAST(sum(n_tok) AS DOUBLE) / count(*) AS mean_value
  FROM t GROUP BY 1, 2
), bounds AS (
  SELECT source, min(b) AS b0, max(b) AS b1 FROM r GROUP BY source
), grid AS (
  SELECT source, unnest(generate_series(b0, b1, {s})) AS b FROM bounds
), g2 AS (
  SELECT grid.source, grid.b,
         CAST((grid.b - bounds.b0) // {s} AS DOUBLE) AS idx
  FROM grid JOIN bounds ON grid.source = bounds.source
), j AS (
  SELECT g2.source, g2.b, g2.idx,
         r.sum_value, r.n_points, r.min_value, r.max_value, r.mean_value,
         CASE WHEN r.b IS NULL THEN 'linear' ELSE 'observed' END AS fill_method
  FROM g2 LEFT JOIN r ON g2.source = r.source AND g2.b = r.b
), w AS (
  SELECT *,
    last_value(CASE WHEN sum_value IS NOT NULL THEN idx END IGNORE NULLS)
      OVER wp AS pidx,
    first_value(CASE WHEN sum_value IS NOT NULL THEN idx END IGNORE NULLS)
      OVER wn AS nidx,
    {win}
  FROM j
  WINDOW wp AS (PARTITION BY source ORDER BY b ROWS UNBOUNDED PRECEDING),
         wn AS (PARTITION BY source ORDER BY b
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT source, to_timestamp(b) AT TIME ZONE 'UTC' AS bucket_start,
       {sel}, fill_method
FROM w
"""


def _tokens_iqr_oracle() -> str:
    return _tokens_oracle_cte() + _TOKENS_HOURLY + """, q AS (
  SELECT source, quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3
  FROM r GROUP BY source
)
SELECT r.source AS key, to_timestamp(r.b) AT TIME ZONE 'UTC' AS bucket_start,
       r.v AS value
FROM r JOIN q USING (source)
WHERE r.v < q.q1 - 1.5 * (q.q3 - q.q1) OR r.v > q.q3 + 1.5 * (q.q3 - q.q1)
"""


def _tokens_zscore_oracle() -> str:
    return _tokens_oracle_cte() + _TOKENS_HOURLY + """, s AS (
  SELECT source, avg(v) AS mu, stddev_pop(v) AS sigma FROM r GROUP BY source
)
SELECT r.source AS key, to_timestamp(r.b) AT TIME ZONE 'UTC' AS bucket_start,
       r.v AS value
FROM r JOIN s USING (source)
WHERE abs((r.v - s.mu) / s.sigma) > 2
"""


def _tokens_mad_oracle() -> str:
    return _tokens_oracle_cte() + _TOKENS_HOURLY + """, med AS (
  SELECT source, median(v) AS m FROM r GROUP BY source
), madt AS (
  SELECT r.source, median(abs(r.v - med.m)) AS mad
  FROM r JOIN med USING (source) GROUP BY r.source
)
SELECT r.source AS key, to_timestamp(r.b) AT TIME ZONE 'UTC' AS bucket_start,
       r.v AS value
FROM r JOIN med USING (source) JOIN madt ON r.source = madt.source
WHERE abs(0.6745 * (r.v - med.m) / madt.mad) > 3.5
"""


def _tokens_audit_oracle() -> str:
    """The audit's contract IS that every row's recomputed checksum
    matches (token-array equality invariant) — the oracle asserts it by
    equating rows_ok with the plain per-source row count."""
    return _tokens_oracle_cte() + """
SELECT source, count(*) AS rows_ok, count(*) AS rows FROM t GROUP BY source
"""


def token_head_buckets(sf_dir: str, k: int = 10, vocab: int = 4096):
    """Top-``k`` token-id buckets (id mod ``vocab``) per source over the
    native tokens input — the vocabulary-head profile a tokenizer audit
    reads (is one source dominated by a few token classes?).  Per batch
    the Arrow list column flattens once and a single bincount over
    source-offset bucket ids produces integer partials (no per-row
    loop); partials ride ONE source-keyed exchange whose fold sums and
    takes top-k (ties: count DESC, bucket ASC — pinned both sides).
    Counts are exact ints."""
    from ..stages.shard import sharded_map_groups

    ds = _rd().read_parquet(_tokens_paths(sf_dir),
                            columns=["source", "tokens"])
    v = int(vocab)

    def partial(tb: pa.Table) -> pd.DataFrame:
        toks = tb["tokens"].combine_chunks()
        off = toks.offsets.to_numpy().astype(np.int64)
        # flatten() (NOT .values) trims to the logical slice: this path
        # zips per-token values elementwise against a per-row repeat, so
        # a sliced batch's list offset must not shift the buffer
        vals = toks.flatten().to_numpy().astype(np.int64) % v
        src = tb["source"].to_pandas()
        codes, uniq = pd.factorize(src, sort=False)
        per_tok_code = np.repeat(codes.astype(np.int64),
                                 off[1:] - off[:-1])
        cnt = np.bincount(per_tok_code * v + vals,
                          minlength=len(uniq) * v)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({
            "source": uniq.take(nz // v),
            "bucket": nz % v,
            "cnt": cnt[nz]})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.groupby(["source", "bucket"], as_index=False)[
            "cnt"].sum()
        g = g.sort_values(["source", "cnt", "bucket"],
                          ascending=[True, False, True], kind="stable")
        return g.groupby("source", sort=False).head(k).reset_index(
            drop=True)

    return sharded_map_groups(parts, "source", fold)


def _token_head_buckets_oracle() -> str:
    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    glob = os.path.join(tokens_input_dir(sf_dir), "*.parquet")
    return f"""
WITH u AS (
  SELECT source, unnest(tokens) % 4096 AS bucket
  FROM read_parquet('{glob}')
), c AS (
  SELECT source, CAST(bucket AS BIGINT) AS bucket, count(*) AS cnt
  FROM u GROUP BY 1, 2
)
SELECT source, bucket, cnt FROM c
QUALIFY row_number() OVER (
  PARTITION BY source ORDER BY cnt DESC, bucket ASC) <= 10
"""


def token_oov_rate(sf_dir: str, threshold: int = 1 << 30):
    """Out-of-vocabulary-rate monitor over the native tokens input: per
    (source, day), the share of token ids ≥ ``threshold`` — the cheap
    canary for a tokenizer/vocab mismatch in a feed (a crawl source
    suddenly emitting high-id bytes-fallback tokens).  Per batch the
    list column flattens once; per-row high-id counts come from a
    cumsum-difference (empty-row safe), then integer (source, day)
    partials fold through one tiny exchange.  Rate is ONE int/int
    divide."""
    from ..stages.shard import sharded_aggregate

    ds = _rd().read_parquet(_tokens_paths(sf_dir),
                            columns=["doc_id", "source", "tokens"])
    thr = int(threshold)

    def partial(tb: pa.Table) -> pd.DataFrame:
        toks = tb["tokens"].combine_chunks()
        off = toks.offsets.to_numpy().astype(np.int64)
        vals = toks.values.to_numpy()
        hi = np.concatenate([[0], np.cumsum(vals >= thr, dtype=np.int64)])
        n_hi = hi[off[1:]] - hi[off[:-1]]
        n_tok = off[1:] - off[:-1]
        doc_id = tb["doc_id"].to_pandas()
        day = (doc_id.str.split("|").str[1].astype(np.int64) * 60
               // 86400) * 86400
        g = pd.DataFrame({
            "source": tb["source"].to_pandas().to_numpy(),
            "day": day.to_numpy(),
            "n_tokens": n_tok,
            "n_oov": n_hi,
        })
        return g.groupby(["source", "day"], as_index=False)[
            ["n_tokens", "n_oov"]].sum()

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    agg = sharded_aggregate(parts, ["source", "day"],
                            {"n_tokens": "sum", "n_oov": "sum"},
                            num_shards=2)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "source": b["source"],
            "day": pd.to_datetime(b["day"].to_numpy(np.int64), unit="s"),
            "n_tokens": b["n_tokens"].to_numpy(np.int64),
            "n_oov": b["n_oov"].to_numpy(np.int64),
            "oov_rate": (b["n_oov"].to_numpy(np.int64)
                         / b["n_tokens"].to_numpy(np.int64))})

    return agg.map_batches(fin, batch_format="pandas")


def _token_oov_oracle() -> str:
    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    glob = os.path.join(tokens_input_dir(sf_dir), "*.parquet")
    return f"""
WITH t AS (
  SELECT source,
         CAST(string_split(doc_id, '|')[2] AS BIGINT) * 60 AS epoch_s,
         len(tokens) AS n_tok,
         len(list_filter(tokens, x -> x >= 1073741824)) AS n_hi
  FROM read_parquet('{glob}')
)
SELECT source,
       to_timestamp(epoch_s - (epoch_s % 86400)) AT TIME ZONE 'UTC' AS day,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(sum(n_hi) AS BIGINT) AS n_oov,
       CAST(sum(n_hi) AS DOUBLE) / sum(n_tok) AS oov_rate
FROM t GROUP BY 1, 2
"""


def token_bigram_ttr(sf_dir: str, head: int = 33):
    """Bigram type-token ratio per source over the native tokens input
    (first ``head`` tokens per doc): distinct adjacent token-id pairs /
    total pairs — the sequence-level repetition screen (collapsing
    bigram TTR flags TEMPLATED text that unigram TTR misses).  Per
    batch the bigram keys build fully vectorized from the Arrow list
    column (a·2³² + b in int64 — ids are int32 ≥ 0, no overflow, no
    collision) and collapse to batch-local distinct (source, key) rows
    plus per-source pair-count rows (key −1 — real keys are ≥ 0);
    ONE (source, key)-hash exchange finishes the global distinct and a
    tiny source fold sums the integer partials.  TTR is ONE int/int
    divide.  Head-bounded so the oracle's unnest stays O(docs·head)."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    ds = _rd().read_parquet(_tokens_paths(sf_dir),
                            columns=["tokens", "source"])

    def emit(tb: pa.Table) -> pd.DataFrame:
        toks = tb["tokens"].combine_chunks()
        off = toks.offsets.to_numpy().astype(np.int64)
        vals = toks.values.to_numpy().astype(np.int64)
        n = len(tb)
        lens = off[1:] - off[:-1]
        take = np.maximum(np.minimum(lens, head) - 1, 0)  # pairs per doc
        rows = np.repeat(np.arange(n, dtype=np.int64), take)
        cols = (np.arange(int(take.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(take) - take, take))
        a_idx = np.repeat(off[:-1], take) + cols
        key = vals[a_idx] * np.int64(2**32) + vals[a_idx + 1]
        src = tb["source"].to_pandas().to_numpy()
        flat = pd.DataFrame({"source": src[rows], "key": key,
                             "p_n": np.int64(0)}).drop_duplicates(
            ["source", "key"])
        per_src = pd.DataFrame({"source": src, "p_n": take}).groupby(
            "source", as_index=False)["p_n"].sum()
        per_src["key"] = np.int64(-1)
        return pd.concat([flat, per_src[["source", "key", "p_n"]]],
                         ignore_index=True)

    tagged = ds.map_batches(emit, batch_format="pyarrow")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        keys = shard["key"].to_numpy()
        dist = (shard[keys >= 0].drop_duplicates(["source", "key"])
                .groupby("source", as_index=False).size()
                .rename(columns={"size": "p_distinct"}))
        dist["p_n"] = np.int64(0)
        cnt = (shard[keys < 0].groupby("source", as_index=False)
               ["p_n"].sum())
        cnt["p_distinct"] = np.int64(0)
        return pd.concat([dist, cnt], ignore_index=True)[
            ["source", "p_distinct", "p_n"]]

    parts = sharded_map_groups(tagged, ["source", "key"], fold)
    agg = sharded_aggregate(parts, ["source"],
                            {"p_distinct": "sum", "p_n": "sum"},
                            num_shards=2)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["p_n"].to_numpy(np.int64) > 0]
        nb = b["p_n"].to_numpy(np.int64)
        nd = b["p_distinct"].to_numpy(np.int64)
        return pd.DataFrame({
            "source": b["source"],
            "n_bigrams": nb,
            "n_distinct_bigrams": nd,
            "bigram_ttr": nd / nb})

    return agg.map_batches(fin, batch_format="pandas")


def _token_bigram_oracle() -> str:
    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    glob = os.path.join(tokens_input_dir(sf_dir), "*.parquet")
    return f"""
WITH tt AS (
  SELECT doc_id, source,
         generate_subscripts(tokens[1:33], 1) AS pos,
         unnest(tokens[1:33]) AS tok
  FROM read_parquet('{glob}')
), bg AS (
  SELECT doc_id, source, pos, CAST(tok AS BIGINT) * 4294967296
           + CAST(lead(tok) OVER (PARTITION BY doc_id ORDER BY pos)
                  AS BIGINT) AS k
  FROM tt
)
SELECT source, count(k) AS n_bigrams,
       count(DISTINCT k) AS n_distinct_bigrams,
       CAST(count(DISTINCT k) AS DOUBLE) / count(k) AS bigram_ttr
FROM bg WHERE k IS NOT NULL GROUP BY source
"""


def token_vocab_growth(sf_dir: str):
    """Heaps-law vocabulary growth over the NATIVE tokens input: per
    (source, day), how many token ids appear for the FIRST time in that
    source, plus the running vocabulary size — the saturation curve
    that tells a crawl operator when a source stops contributing new
    vocabulary.  Per batch the Arrow list column flattens ONCE and a
    single vectorized groupby produces (source, token) → min-day
    partials (the all-to-all moves at most vocab×sources×batches rows,
    never the token stream); ONE (source, token)-keyed exchange
    finishes the global min, a tiny second exchange counts first
    occurrences per (source, day), and the cumulative sum folds over
    the O(sources×days) result.  All counts exact ints; the oracle's
    window SUM is the same integer arithmetic."""
    from ..stages.shard import sharded_aggregate

    ds = _rd().read_parquet(_tokens_paths(sf_dir),
                            columns=["doc_id", "tokens", "source"])

    def partial(tb: pa.Table) -> pd.DataFrame:
        toks = tb["tokens"].combine_chunks()
        off = toks.offsets.to_numpy().astype(np.int64)
        vals = toks.flatten().to_numpy().astype(np.int64)
        lens = off[1:] - off[:-1]
        doc_id = tb["doc_id"].to_pandas()
        day = (doc_id.str.split("|").str[1].astype(np.int64) * 60
               // 86400).to_numpy()
        src = tb["source"].to_pandas()
        codes, uniq = pd.factorize(src, sort=False)
        g = pd.DataFrame({
            "code": np.repeat(codes.astype(np.int64), lens),
            "tok": vals,
            "day": np.repeat(day, lens),
        }).groupby(["code", "tok"], as_index=False)["day"].min()
        g["source"] = uniq.take(g["code"].to_numpy())
        return g[["source", "tok", "day"]]

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    first = sharded_aggregate(parts, ["source", "tok"], {"day": "min"})

    def day_rows(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["source", "day"], as_index=False).size()
        return g.rename(columns={"size": "new_tokens"})

    per_day = sharded_aggregate(
        first.map_batches(day_rows, batch_format="pandas"),
        ["source", "day"], {"new_tokens": "sum"}, num_shards=2
    ).to_pandas()  # O(sources × days) — the documented driver bound
    per_day = per_day.sort_values(["source", "day"],
                                  kind="stable").reset_index(drop=True)
    return pd.DataFrame({
        "source": per_day["source"],
        "day": pd.to_datetime(
            per_day["day"].to_numpy(np.int64) * 86400, unit="s"),
        "new_tokens": per_day["new_tokens"].astype(np.int64),
        "vocab_size": per_day.groupby("source")["new_tokens"].cumsum()
        .astype(np.int64),
    })


def _token_vocab_growth_oracle() -> str:
    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    glob = os.path.join(tokens_input_dir(sf_dir), "*.parquet")
    return f"""
WITH t AS (
  SELECT source,
         CAST(string_split(doc_id, '|')[2] AS BIGINT) * 60 // 86400 AS d,
         tokens
  FROM read_parquet('{glob}')
), u AS (
  SELECT source, d, unnest(tokens) AS tok FROM t
), f AS (
  SELECT source, tok, min(d) AS d FROM u GROUP BY 1, 2
), n AS (
  SELECT source, d, count(*) AS new_tokens FROM f GROUP BY 1, 2
)
SELECT source,
       to_timestamp(d * 86400) AT TIME ZONE 'UTC' AS day,
       new_tokens,
       CAST(sum(new_tokens) OVER (
         PARTITION BY source ORDER BY d) AS BIGINT) AS vocab_size
FROM n
"""


def token_loop_score(sf_dir: str, window: int = 8, loop_min: int = 3):
    """Degenerate-repetition screen over the native tokens input: a doc
    is LOOPY when some 8-token window repeats ≥ ``loop_min`` times
    inside it (the stuck-sampler / boilerplate-loop signature that
    per-WORD repetition ratios miss because loops repeat long spans,
    not single words).  Per batch the flat token values become one
    sliding (W, 8) int32 window matrix (doc-boundary windows excluded
    by offset arithmetic), viewed as four uint64 words; per-doc window
    multiplicities come from one lexsort + run-length scan — no Python
    loop over docs.  Map-only partials (n_docs, n_loopy, max repeat per
    source) fold in a tiny source exchange; the rate is ONE int/int
    divide.  The oracle counts the actual ``tokens[i:i+7]`` list
    windows — equal lists ⇔ equal packed keys (no padding: only full
    windows exist).  The synth corpus is loop-free (rate 0, repeat 1),
    so the loopy branch is pinned by a planted golden in
    test_training_ops."""
    from ..stages.shard import sharded_aggregate

    ds = _rd().read_parquet(_tokens_paths(sf_dir),
                            columns=["tokens", "source"])
    w = window

    def emit(tb: pa.Table) -> pd.DataFrame:
        toks = tb["tokens"].combine_chunks()
        off = toks.offsets.to_numpy().astype(np.int64)
        vals = toks.values.to_numpy().astype(np.int32)
        n = len(tb)
        lens = off[1:] - off[:-1]
        nw = np.maximum(lens - (w - 1), 0)
        src = tb["source"].to_pandas().to_numpy()
        has = nw > 0
        if not has.any() or vals.size < w:
            return pd.DataFrame({
                "source": src[:0], "n_docs": np.zeros(0, np.int64),
                "n_loopy": np.zeros(0, np.int64),
                "max_repeat": np.zeros(0, np.int64)})
        # valid window starts: off[d] .. off[d+1]-w for each doc
        doc = np.repeat(np.arange(n, dtype=np.int64), nw)
        starts = (np.arange(int(nw.sum()), dtype=np.int64)
                  - np.repeat(np.cumsum(nw) - nw, nw)
                  + np.repeat(off[:-1], nw))
        sw = np.lib.stride_tricks.sliding_window_view(vals, w)
        M = np.ascontiguousarray(sw[starts])          # (W, 8) int32
        key = M.view(np.uint64)                       # (W, 4) words
        order = np.lexsort((key[:, 3], key[:, 2], key[:, 1],
                            key[:, 0], doc))
        kd, ks = doc[order], key[order]
        brk = np.empty(kd.size, dtype=bool)
        brk[0] = True
        brk[1:] = (np.diff(kd) != 0) | (ks[1:] != ks[:-1]).any(axis=1)
        run_id = np.cumsum(brk) - 1
        counts = np.bincount(run_id)
        run_doc = kd[brk]
        max_mult = np.zeros(n, dtype=np.int64)
        np.maximum.at(max_mult, run_doc, counts)
        g = pd.DataFrame({
            "source": src[has],
            "n_docs": np.ones(int(has.sum()), dtype=np.int64),
            "n_loopy": (max_mult[has] >= loop_min).astype(np.int64),
            "max_repeat": max_mult[has],
        })
        return g.groupby("source", as_index=False).agg(
            {"n_docs": "sum", "n_loopy": "sum", "max_repeat": "max"})

    parts = ds.map_batches(emit, batch_format="pyarrow")
    agg = sharded_aggregate(parts, "source",
                            {"n_docs": "sum", "n_loopy": "sum",
                             "max_repeat": "max"}, num_shards=2)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        nd = b["n_docs"].to_numpy(np.int64)
        nl = b["n_loopy"].to_numpy(np.int64)
        return pd.DataFrame({
            "source": b["source"], "n_docs": nd, "n_loopy": nl,
            "max_window_repeat": b["max_repeat"].to_numpy(np.int64),
            "loopy_rate": nl / nd,
        })

    return agg.map_batches(fin, batch_format="pandas")


def _token_loop_oracle() -> str:
    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    glob = os.path.join(tokens_input_dir(sf_dir), "*.parquet")
    return f"""
WITH t AS (
  SELECT doc_id, source, tokens, len(tokens) AS n
  FROM read_parquet('{glob}')
), w AS (
  SELECT doc_id, source, tokens[i.i:i.i + 7] AS win
  FROM t CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, n - 7)) AS i) i
  WHERE n >= 8
), c AS (
  SELECT doc_id, source, win, count(*) AS m FROM w GROUP BY 1, 2, 3
), d AS (
  SELECT doc_id, source, max(m) AS max_mult FROM c GROUP BY 1, 2
)
SELECT source, count(*) AS n_docs,
       count(*) FILTER (max_mult >= 3) AS n_loopy,
       max(max_mult) AS max_window_repeat,
       CAST(count(*) FILTER (max_mult >= 3) AS DOUBLE) / count(*)
         AS loopy_rate
FROM d GROUP BY source
"""


def token_simpson_diversity(sf_dir: str):
    """Simpson concentration λ = Σ_t c_t² / N² of each source's token-id
    distribution over the native tokens input — the one-number
    vocabulary-concentration screen (λ → 1/vocab for a balanced source;
    a template flood or degenerate sampler pushes it up).  One corpus
    pass emits per-batch (source, token, count) integer partials — the
    token stream itself never shuffles — through a SOURCE-keyed
    exchange; per-source state is vocab-bounded, Σc² is an exact Python
    bigint, and λ is ONE IEEE divide of two correctly-rounded int→double
    casts (the oracle routes its HUGEINT casts through the VARCHAR
    bridge — see NOTES_ROUND4 on DuckDB's double-rounded HUGEINT→DOUBLE
    cast)."""
    from ..stages.shard import sharded_map_groups

    ds = _rd().read_parquet(_tokens_paths(sf_dir),
                            columns=["source", "tokens"])

    def partial(tb: pa.Table) -> pd.DataFrame:
        toks = tb["tokens"].combine_chunks()
        off = toks.offsets.to_numpy().astype(np.int64)
        n_tok = off[1:] - off[:-1]
        g = pd.DataFrame({
            "source": np.repeat(tb["source"].to_pandas().to_numpy(), n_tok),
            "token": toks.values.to_numpy().astype(np.int64),
        }).groupby(["source", "token"], as_index=False).size()
        return pd.DataFrame({"source": g["source"], "token": g["token"],
                             "cnt": g["size"].astype(np.int64)})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in shard.groupby("source", sort=False):
            c = g.groupby("token")["cnt"].sum().to_numpy(np.int64)
            n = int(c.sum())
            sq = sum(int(x) * int(x) for x in c)  # exact bigint
            rows.append({
                "source": src, "n_tokens": n,
                "distinct_tokens": int(c.size),
                "simpson": float(sq) / float(n * n)})
        return pd.DataFrame(rows, columns=[
            "source", "n_tokens", "distinct_tokens", "simpson"])

    return sharded_map_groups(parts, "source", fold, num_shards=2)


def _token_simpson_oracle() -> str:
    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    glob = os.path.join(tokens_input_dir(sf_dir), "*.parquet")
    return f"""
WITH u AS (
  SELECT source, unnest(tokens) AS tok
  FROM read_parquet('{glob}')
), c AS (
  SELECT source, tok, count(*) AS c FROM u GROUP BY 1, 2
)
SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
       count(*) AS distinct_tokens,
       CAST(CAST(sum(CAST(c AS HUGEINT) * c) AS VARCHAR) AS DOUBLE)
         / CAST(CAST(CAST(sum(c) AS HUGEINT) * sum(c) AS VARCHAR)
                AS DOUBLE) AS simpson
FROM c GROUP BY 1
"""


def token_content_dedup(sf_dir: str):
    """EXACT duplicate-sequence census over the native tokens input:
    per source, how many docs share an identical token SEQUENCE with
    another doc — the tokenized twin of text dedup_exact (catches
    byte-level near-identical pages that tokenize identically).  Per
    batch, each doc's sequence reduces to two independent
    position-mixed splitmix64 content hashes (order-sensitive:
    pos+1 enters the mix; cumsum-difference per doc, empty docs pinned
    to 0) plus its length — the token stream never shuffles, only
    (source, h1, h2, n, count) partials ride ONE h1-keyed exchange
    (a sequence's rows all co-locate), and per-source integer partials
    fold in a tiny second exchange.  The oracle groups by the list
    VALUE itself, so the engine's 128-bit key is checked against true
    sequence equality; dup_rate is ONE int/int divide."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    ds = _rd().read_parquet(_tokens_paths(sf_dir),
                            columns=["source", "tokens"])
    c2 = np.uint64(0xD1B54A32D192ED03)  # second-lane position constant

    def partial(tb: pa.Table) -> pd.DataFrame:
        toks = tb["tokens"].combine_chunks()
        off = toks.offsets.to_numpy().astype(np.int64)
        n_tok = off[1:] - off[:-1]
        vals = toks.values.to_numpy().astype(np.uint64)
        pos = (np.arange(vals.size, dtype=np.uint64)
               - np.repeat(off[:-1].astype(np.uint64), n_tok)
               + np.uint64(1))
        with np.errstate(over="ignore"):
            m1 = _splitmix64(vals + pos * np.uint64(0x9E3779B97F4A7C15))
            m2 = _splitmix64(vals + pos * c2)
            cs1 = np.concatenate([[np.uint64(0)], np.cumsum(m1)])
            cs2 = np.concatenate([[np.uint64(0)], np.cumsum(m2)])
            h1 = cs1[off[1:]] - cs1[off[:-1]]
            h2 = cs2[off[1:]] - cs2[off[:-1]]
        g = pd.DataFrame({
            "source": tb["source"].to_pandas().to_numpy(),
            "h1": h1.astype(np.int64), "h2": h2.astype(np.int64),
            "n": n_tok,
        }).groupby(["source", "h1", "h2", "n"], as_index=False).size()
        return pd.DataFrame({
            "source": g["source"], "h1": g["h1"], "h2": g["h2"],
            "n": g["n"], "cnt": g["size"].astype(np.int64)})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def per_seq(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.groupby(["source", "h1", "h2", "n"],
                          as_index=False)["cnt"].sum()
        out = pd.DataFrame({
            "source": g["source"],
            "n_docs": g["cnt"].to_numpy(np.int64),
            "distinct_seqs": np.ones(len(g), dtype=np.int64)})
        return out.groupby("source", as_index=False).sum()

    per_src = sharded_map_groups(parts, "h1", per_seq)
    agg = sharded_aggregate(per_src, "source",
                            {"n_docs": "sum", "distinct_seqs": "sum"},
                            num_shards=2)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        nd = b["n_docs"].to_numpy(np.int64)
        ds_ = b["distinct_seqs"].to_numpy(np.int64)
        return pd.DataFrame({
            "source": b["source"], "n_docs": nd, "distinct_seqs": ds_,
            "dup_docs": nd - ds_, "dup_rate": (nd - ds_) / nd})

    return agg.map_batches(fin, batch_format="pandas")


def _token_content_dedup_oracle() -> str:
    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    glob = os.path.join(tokens_input_dir(sf_dir), "*.parquet")
    return f"""
WITH g AS (
  SELECT source, tokens, count(*) AS c
  FROM read_parquet('{glob}') GROUP BY 1, 2
)
SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
       count(*) AS distinct_seqs,
       CAST(sum(c) - count(*) AS BIGINT) AS dup_docs,
       CAST(CAST(sum(c) - count(*) AS BIGINT) AS DOUBLE)
         / CAST(sum(c) AS BIGINT) AS dup_rate
FROM g GROUP BY 1
"""


def token_bucket_tv_drift(sf_dir: str, vocab: int = 4096):
    """Total-variation distance between each source's token-id BUCKET
    histogram (id mod ``vocab``, the ``token_head_buckets`` profile)
    and the pooled fleet histogram — the fixed-width distribution-drift
    screen for a feed's tokenizer output (raw ids are near-unique in a
    large vocab, so the bucketed histogram is the standard bounded
    sketch).  Exactness: TV = Σ_b |c_sb·N − c_b·n_s| / (2·n_s·N); the
    numerator is an exact integer sum folded in arbitrary-precision
    Python ints on the driver (no overflow at ANY corpus scale), and
    engine float(int) / DuckDB's VARCHAR→DOUBLE bridge are both
    correctly rounded, so the single final divide is bit-identical.
    Scale shape: per-batch bincount partials → one tiny
    (source, bucket) exchange; the folded table is bounded at
    vocab×sources rows at ANY corpus scale — driver-safe by
    construction."""
    from ..stages.shard import sharded_aggregate

    ds = _rd().read_parquet(_tokens_paths(sf_dir),
                            columns=["source", "tokens"])
    v = int(vocab)

    def partial(tb: pa.Table) -> pd.DataFrame:
        toks = tb["tokens"].combine_chunks()
        off = toks.offsets.to_numpy().astype(np.int64)
        # flatten() (NOT .values): see token_head_buckets
        vals = toks.flatten().to_numpy().astype(np.int64) % v
        src = tb["source"].to_pandas()
        codes, uniq = pd.factorize(src, sort=False)
        per_tok_code = np.repeat(codes.astype(np.int64),
                                 off[1:] - off[:-1])
        cnt = np.bincount(per_tok_code * v + vals,
                          minlength=len(uniq) * v)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({
            "source": uniq.take(nz // v),
            "bucket": nz % v,
            "cnt": cnt[nz]})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    hist = sharded_aggregate(parts, ["source", "bucket"], {"cnt": "sum"},
                             num_shards=2).to_pandas()
    if hist.empty:
        return pd.DataFrame({
            "source": pd.Series([], dtype=object),
            "n_tokens": pd.Series([], dtype=np.int64),
            "tv_drift": pd.Series([], dtype=np.float64)})
    piv = hist.pivot_table(index="bucket", columns="source",
                           values="cnt", aggfunc="sum",
                           fill_value=0).sort_index()
    c_b = piv.sum(axis=1).to_numpy(np.int64)
    big_N = int(c_b.sum())
    rows = []
    for s in sorted(piv.columns):
        c_sb = piv[s].to_numpy(np.int64)
        n_s = int(c_sb.sum())
        # arbitrary-precision: per-bucket terms as Python ints
        num = sum(abs(int(a) * big_N - int(b) * n_s)
                  for a, b in zip(c_sb, c_b))
        rows.append({"source": s, "n_tokens": n_s,
                     "tv_drift": float(num) / float(2 * n_s * big_N)})
    return pd.DataFrame(rows, columns=["source", "n_tokens", "tv_drift"])


def _token_bucket_tv_oracle() -> str:
    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    glob = os.path.join(tokens_input_dir(sf_dir), "*.parquet")
    return f"""
WITH u AS (
  SELECT source, CAST(unnest(tokens) % 4096 AS BIGINT) AS bucket
  FROM read_parquet('{glob}')
), c AS (
  SELECT source, bucket, count(*) AS c FROM u GROUP BY 1, 2
), ns AS (
  SELECT source, CAST(sum(c) AS HUGEINT) AS n FROM c GROUP BY 1
), tot AS (
  SELECT CAST(sum(c) AS HUGEINT) AS N FROM c
), cb AS (
  SELECT bucket, CAST(sum(c) AS HUGEINT) AS cb FROM c GROUP BY 1
), m AS (
  SELECT s.source, b.bucket, b.cb, CAST(coalesce(c.c, 0) AS HUGEINT) AS cst
  FROM (SELECT source FROM ns) s
  CROSS JOIN cb b
  LEFT JOIN c ON c.source = s.source AND c.bucket = b.bucket
), num AS (
  SELECT m.source, sum(abs(m.cst * tot.N - m.cb * ns.n)) AS num
  FROM m CROSS JOIN tot JOIN ns ON ns.source = m.source
  GROUP BY 1
)
SELECT num.source, CAST(ns.n AS BIGINT) AS n_tokens,
       CAST(CAST(num.num AS VARCHAR) AS DOUBLE)
         / CAST(CAST(2 * ns.n * tot.N AS VARCHAR) AS DOUBLE) AS tv_drift
FROM num JOIN ns ON ns.source = num.source CROSS JOIN tot
"""


def token_window_dedup(sf_dir: str, window: int = 64):
    """Sub-document duplicate-WINDOW census over the native tokens
    input: stride-``window`` 64-token windows, counted exactly — the
    within-corpus boilerplate/repetition screen one granularity below
    ``token_content_dedup`` (whole sequences) and the exact sibling of
    the approximate winnow family.  Same order-sensitive splitmix64
    content keys with positions RELATIVE to the window start (so equal
    contents collide wherever they sit), cumsum-difference per window;
    only (source, h1, h2, count) partials ride the h1-keyed exchange.
    The oracle groups by the token-slice VALUE itself.  dup_rate is
    ONE int/int divide."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    ds = _rd().read_parquet(_tokens_paths(sf_dir),
                            columns=["source", "tokens"])
    w = int(window)
    c2 = np.uint64(0xD1B54A32D192ED03)

    def partial(tb: pa.Table) -> pd.DataFrame:
        toks = tb["tokens"].combine_chunks()
        off = toks.offsets.to_numpy().astype(np.int64)
        n_tok = off[1:] - off[:-1]
        vals = toks.values.to_numpy().astype(np.uint64)
        pos_in_doc = (np.arange(vals.size, dtype=np.int64)
                      - np.repeat(off[:-1], n_tok))
        pos = (pos_in_doc % w + 1).astype(np.uint64)
        with np.errstate(over="ignore"):
            m1 = _splitmix64(vals + pos * np.uint64(0x9E3779B97F4A7C15))
            m2 = _splitmix64(vals + pos * c2)
            cs1 = np.concatenate([[np.uint64(0)], np.cumsum(m1)])
            cs2 = np.concatenate([[np.uint64(0)], np.cumsum(m2)])
        # window starts: doc_start + k*w for k in 0..n_tok//w - 1
        n_win = n_tok // w
        starts = (np.repeat(off[:-1], n_win)
                  + np.concatenate([np.arange(k, dtype=np.int64) * w
                                    for k in n_win]) if n_win.sum()
                  else np.array([], dtype=np.int64))
        with np.errstate(over="ignore"):
            h1 = (cs1[starts + w] - cs1[starts]).astype(np.int64)
            h2 = (cs2[starts + w] - cs2[starts]).astype(np.int64)
        src = np.repeat(tb["source"].to_pandas().to_numpy(), n_win)
        g = pd.DataFrame({"source": src, "h1": h1, "h2": h2}).groupby(
            ["source", "h1", "h2"], as_index=False).size()
        return pd.DataFrame({
            "source": g["source"], "h1": g["h1"], "h2": g["h2"],
            "cnt": g["size"].astype(np.int64)})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def per_win(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.groupby(["source", "h1", "h2"],
                          as_index=False)["cnt"].sum()
        out = pd.DataFrame({
            "source": g["source"],
            "n_windows": g["cnt"].to_numpy(np.int64),
            "distinct_windows": np.ones(len(g), dtype=np.int64)})
        return out.groupby("source", as_index=False).sum()

    per_src = sharded_map_groups(parts, "h1", per_win)
    agg = sharded_aggregate(per_src, "source",
                            {"n_windows": "sum",
                             "distinct_windows": "sum"}, num_shards=2)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        nw = b["n_windows"].to_numpy(np.int64)
        dw = b["distinct_windows"].to_numpy(np.int64)
        return pd.DataFrame({
            "source": b["source"], "n_windows": nw,
            "distinct_windows": dw, "dup_windows": nw - dw,
            "dup_rate": (nw - dw) / nw})

    return agg.map_batches(fin, batch_format="pandas")


def _token_window_dedup_oracle() -> str:
    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    glob = os.path.join(tokens_input_dir(sf_dir), "*.parquet")
    return f"""
WITH wnd AS (
  SELECT source, tokens[(t.k * 64 + 1):(t.k * 64 + 64)] AS w
  FROM read_parquet('{glob}'),
       UNNEST(generate_series(0, CAST(len(tokens) // 64 AS BIGINT) - 1))
         AS t(k)
  WHERE len(tokens) >= 64
), g AS (
  SELECT source, w, count(*) AS c FROM wnd GROUP BY 1, 2
)
SELECT source, CAST(sum(c) AS BIGINT) AS n_windows,
       count(*) AS distinct_windows,
       CAST(sum(c) - count(*) AS BIGINT) AS dup_windows,
       CAST(CAST(sum(c) - count(*) AS BIGINT) AS DOUBLE)
         / CAST(sum(c) AS BIGINT) AS dup_rate
FROM g GROUP BY 1
"""


def induction_hit_rate(sf_dir: str):
    """Induction-head hit rate over the NATIVE tokens input: at each
    position i whose token also occurred earlier in the document (last
    occurrence j), an induction head predicts position i+1 to repeat
    the token that followed j — the "… A B … A → B" statistic
    (Olsson et al. 2022) that measures how much in-context copying a
    corpus rewards (high on loopy/boilerplate docs, ~1/vocab on clean
    text).  All-integer decisions: eligible = has a previous occurrence
    AND i+1 is inside the doc; hit = t[i+1] == t[j+1]; the rate is ONE
    int/int divide (NULL when no position is eligible — the synth
    corpus's near-unique ids make that the common case there; the
    planted-loop tokens fuzz corpus pins the hit branch).  Engine
    kernel is fully vectorized per batch (lexsort by (doc, token, pos)
    → last-previous-occurrence via one shifted compare, no Python
    loop over tokens); per-batch (source, eligible, hits) integer
    partials ride one tiny source-keyed exchange — the token stream
    never shuffles."""
    from ..stages.shard import sharded_aggregate

    ds = _rd().read_parquet(_tokens_paths(sf_dir),
                            columns=["source", "tokens"])

    def partial(tb: pa.Table) -> pd.DataFrame:
        toks = tb["tokens"].combine_chunks()
        off = toks.offsets.to_numpy().astype(np.int64)
        base = off[0]
        # flatten() (NOT .values): sliced batches carry a list offset
        vals = toks.flatten().to_numpy().astype(np.int64)
        lens = off[1:] - off[:-1]
        src = tb["source"].to_pandas().to_numpy(dtype=object)
        codes, uniq = pd.factorize(pd.Series(src), sort=False)
        n_elig = np.zeros(len(uniq), dtype=np.int64)
        n_hits = np.zeros(len(uniq), dtype=np.int64)
        if vals.size:
            docidx = np.repeat(np.arange(len(lens), dtype=np.int64),
                               lens)
            g = np.arange(vals.size, dtype=np.int64)
            doc_end = np.repeat(off[1:] - base, lens)  # exclusive
            order = np.lexsort((g, vals, docidx))
            same = np.zeros(vals.size, dtype=bool)
            same[1:] = ((docidx[order][1:] == docidx[order][:-1])
                        & (vals[order][1:] == vals[order][:-1]))
            prev_g = np.full(vals.size, -1, dtype=np.int64)
            prev_g[order[same]] = order[np.flatnonzero(same) - 1]
            e = np.flatnonzero((prev_g >= 0) & (g + 1 < doc_end))
            if e.size:
                hit = vals[e + 1] == vals[prev_g[e] + 1]
                sc = codes[docidx[e]]
                n_elig += np.bincount(sc, minlength=len(uniq))
                n_hits += np.bincount(sc, weights=hit,
                                      minlength=len(uniq)
                                      ).astype(np.int64)
        return pd.DataFrame({
            "source": uniq.to_numpy(dtype=object)
            if hasattr(uniq, "to_numpy") else np.asarray(uniq,
                                                         dtype=object),
            "n_eligible": n_elig, "n_hits": n_hits})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    agg = sharded_aggregate(parts, ["source"],
                            {"n_eligible": "sum", "n_hits": "sum"},
                            num_shards=2)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        e = b["n_eligible"].to_numpy(np.int64)
        h = b["n_hits"].to_numpy(np.int64)
        return pd.DataFrame({
            "source": b["source"],
            "n_eligible": e, "n_hits": h,
            "hit_rate": np.where(e > 0, h / np.where(e > 0, e, 1),
                                 np.nan)})

    return agg.map_batches(fin, batch_format="pandas")


def _induction_oracle() -> str:
    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    glob = os.path.join(tokens_input_dir(sf_dir), "*.parquet")
    return f"""
WITH t AS (
  SELECT doc_id, source, tokens, len(tokens) AS n
  FROM read_parquet('{glob}')
), u AS (
  SELECT doc_id, source, n, i.i AS pos, tokens[i.i] AS tk
  FROM t CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, n)) AS i) i
  WHERE n >= 2
), p AS (
  SELECT doc_id, source, n, pos, tk,
         lag(pos) OVER (PARTITION BY doc_id, tk ORDER BY pos) AS pp
  FROM u
), elig AS (
  SELECT p.source,
         CASE WHEN t2.tokens[p.pos + 1] = t2.tokens[p.pp + 1]
              THEN 1 ELSE 0 END AS hit
  FROM p JOIN t t2 USING (doc_id)
  WHERE p.pp IS NOT NULL AND p.pos + 1 <= p.n
), agg AS (
  SELECT source, count(*) AS n_elig, sum(hit) AS n_hits
  FROM elig GROUP BY 1
)
SELECT s.source,
       CAST(coalesce(a.n_elig, 0) AS BIGINT) AS n_eligible,
       CAST(coalesce(a.n_hits, 0) AS BIGINT) AS n_hits,
       CASE WHEN a.n_elig > 0
            THEN CAST(a.n_hits AS DOUBLE) / a.n_elig END AS hit_rate
FROM (SELECT DISTINCT source FROM t) s LEFT JOIN agg a USING (source)
"""


def tokens_peak_24h(sf_dir: str):
    """Peak sliding-24-observed-hour token throughput per source over
    the NATIVE tokens hourly tier — the capacity headline ('what is
    this feed's worst-case day?').  Window = 24 consecutive OBSERVED
    hourly buckets (ROWS window, both sides); sums are exact integers
    (token counts in float64 ≪ 2⁵³ per bucket; the window total
    re-sums 24 exact ints).  One source-keyed exchange over the
    memoized 1h tier."""
    from ..stages.shard import sharded_map_groups

    roll = _tokens_rollup_1h(sf_dir).select_columns(
        ["source", "bucket_start", "sum_value"])

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        shard = shard.sort_values(["source", "bucket_start"],
                                  kind="stable")
        rows = []
        for src, g in shard.groupby("source", sort=False):
            v = g["sum_value"].to_numpy(np.float64).astype(np.int64)
            if v.size < 24:
                continue
            win = np.lib.stride_tricks.sliding_window_view(v, 24)
            sums = win.sum(axis=1)
            j = int(np.argmax(sums))  # first max = earliest window
            rows.append({
                "source": src,
                "peak_tokens_24h": int(sums[j]),
                "window_end": g["bucket_start"].to_numpy()[j + 23]})
        return pd.DataFrame(rows, columns=[
            "source", "peak_tokens_24h", "window_end"])

    return sharded_map_groups(roll, "source", fold)


def _tokens_peak_oracle() -> str:
    return _tokens_oracle_cte() + """
, r AS (
  SELECT source,
         to_timestamp(epoch_s - (epoch_s % 3600)) AT TIME ZONE 'UTC'
           AS bucket_start,
         sum(n_tok) AS v
  FROM t GROUP BY 1, 2
), w AS (
  SELECT source, bucket_start,
         sum(v) OVER (PARTITION BY source ORDER BY bucket_start
                      ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS s24,
         count(*) OVER (PARTITION BY source ORDER BY bucket_start
                        ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS wn
  FROM r
)
SELECT source, CAST(s24 AS BIGINT) AS peak_tokens_24h,
       bucket_start AS window_end
FROM w WHERE wn = 24
QUALIFY row_number() OVER (
  PARTITION BY source ORDER BY s24 DESC, bucket_start ASC) = 1
"""


def first_token_topk(sf_dir: str, k: int = 5):
    """Top-``k`` FIRST-token ids per source over the native tokens
    input — the BOS/template sanity check a tokenizer pipeline runs
    (a healthy corpus concentrates mass on the template's start
    tokens; drift here means the prompt format changed).  Per batch
    the first element of every non-empty list comes from ONE gather
    at the Arrow list offsets (absolute offsets are slice-safe; no
    per-row Python); (source, token) count partials ride a composite-
    keyed exchange to global counts, then a tiny source fold ranks.
    Ties pinned (cnt DESC, token ASC) on both engines; rank is part
    of the compared output."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    ds = _rd().read_parquet(_tokens_paths(sf_dir),
                            columns=["tokens", "source"])

    def partial(tb: pa.Table) -> pd.DataFrame:
        toks = tb["tokens"].combine_chunks()
        off = toks.offsets.to_numpy().astype(np.int64)
        lens = off[1:] - off[:-1]
        has = lens > 0
        if not has.any():
            return pd.DataFrame({
                "source": pd.Series([], dtype=object),
                "tok": pd.Series([], dtype=np.int64),
                "cnt": pd.Series([], dtype=np.int64)})
        vals = toks.values.to_numpy().astype(np.int64)
        first = vals[off[:-1][has]]
        src = tb["source"].to_pandas().to_numpy()[has]
        g = pd.DataFrame({"source": src, "tok": first, "cnt": 1}).groupby(
            ["source", "tok"], as_index=False).sum()
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    counts = sharded_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source", "tok"], {"cnt": "sum"})

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "cnt", "tok"],
                          ascending=[True, False, True], kind="stable")
        g["rank"] = g.groupby("source", sort=False).cumcount() + 1
        g = g[g["rank"] <= k]
        return pd.DataFrame({
            "source": g["source"],
            "rank": g["rank"].to_numpy(np.int64),
            "token_id": g["tok"].to_numpy(np.int64),
            "cnt": g["cnt"].to_numpy(np.int64)})

    return sharded_map_groups(counts, "source", topk, num_shards=None)


def _first_token_oracle(k: int = 5) -> str:
    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    glob = os.path.join(tokens_input_dir(sf_dir), "*.parquet")
    return f"""
WITH t AS (
  SELECT source, tokens[1] AS tok
  FROM read_parquet('{glob}') WHERE len(tokens) >= 1
), c AS (
  SELECT source, tok, count(*) AS cnt FROM t GROUP BY 1, 2
)
SELECT source,
       CAST(row_number() OVER (
           PARTITION BY source ORDER BY cnt DESC, tok ASC) AS BIGINT)
         AS rank,
       CAST(tok AS BIGINT) AS token_id, CAST(cnt AS BIGINT) AS cnt
FROM c
QUALIFY row_number() OVER (
  PARTITION BY source ORDER BY cnt DESC, tok ASC) <= {k}
"""


def token_max_run(sf_dir: str):
    """Longest run of IDENTICAL consecutive token ids per doc, folded
    to a per-source census (n nonempty docs, corpus max run, docs with
    a run ≥ 3) — the single-token degeneration screen (pad-token
    flooding, stuck sampler emitting one id) complementing
    token_loop_score's multi-token windows.  Per batch: one vectorized
    break-mask over the flat Arrow values (doc starts from the
    absolute offsets, value changes from one shifted compare), run
    lengths by bincount over the cumulative run id, per-doc maxima via
    np.maximum.at — no Python loop over docs or runs.  All-integer.
    The synth corpora are effectively run-free (vocab ≫ doc length),
    so the interesting branch is pinned by a planted golden in
    test_training_ops."""
    from ..stages.shard import sharded_aggregate

    ds = _rd().read_parquet(_tokens_paths(sf_dir),
                            columns=["tokens", "source"])

    def partial(tb: pa.Table) -> pd.DataFrame:
        toks = tb["tokens"].combine_chunks()
        off = toks.offsets.to_numpy().astype(np.int64)
        lens = off[1:] - off[:-1]
        has = lens > 0
        src = tb["source"].to_pandas().to_numpy()
        empty = pd.DataFrame({
            "source": pd.Series([], dtype=object),
            "n_docs": pd.Series([], dtype=np.int64),
            "max_run": pd.Series([], dtype=np.int64),
            "docs_run_ge3": pd.Series([], dtype=np.int64)})
        if not has.any():
            return empty
        vals = toks.values.to_numpy().astype(np.int64)
        lo, hi = int(off[0]), int(off[-1])
        v = vals[lo:hi]
        brk = np.ones(v.size, dtype=bool)
        brk[1:] = v[1:] != v[:-1]
        brk[off[:-1][has] - lo] = True  # doc starts always break
        run_id = np.cumsum(brk) - 1
        counts = np.bincount(run_id)
        run_start = np.flatnonzero(brk) + lo
        run_doc = np.searchsorted(off, run_start, side="right") - 1
        docmax = np.zeros(len(tb), dtype=np.int64)
        np.maximum.at(docmax, run_doc, counts)
        g = pd.DataFrame({
            "source": src[has],
            "n_docs": np.ones(int(has.sum()), dtype=np.int64),
            "max_run": docmax[has],
            "docs_run_ge3": (docmax[has] >= 3).astype(np.int64)})
        return g.groupby("source", as_index=False).agg(
            {"n_docs": "sum", "max_run": "max", "docs_run_ge3": "sum"})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    agg = sharded_aggregate(parts, "source",
                            {"n_docs": "sum", "max_run": "max",
                             "docs_run_ge3": "sum"}, num_shards=2)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "source": b["source"],
            "n_docs": b["n_docs"].to_numpy(np.int64),
            "max_token_run": b["max_run"].to_numpy(np.int64),
            "docs_run_ge3": b["docs_run_ge3"].to_numpy(np.int64)})

    return agg.map_batches(fin, batch_format="pandas")


def _token_max_run_oracle() -> str:
    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    glob = os.path.join(tokens_input_dir(sf_dir), "*.parquet")
    return f"""
WITH t AS (
  SELECT doc_id, source, unnest(tokens) AS tok,
         generate_subscripts(tokens, 1) AS pos
  FROM read_parquet('{glob}')
), g AS (
  SELECT doc_id, source, tok, pos,
         pos - row_number() OVER (
             PARTITION BY doc_id, tok ORDER BY pos) AS isl
  FROM t
), runs AS (
  SELECT doc_id, source, count(*) AS rl
  FROM g GROUP BY doc_id, source, tok, isl
), docs AS (
  SELECT doc_id, source, max(rl) AS docmax FROM runs GROUP BY 1, 2
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(max(docmax) AS BIGINT) AS max_token_run,
       CAST(count(*) FILTER (docmax >= 3) AS BIGINT) AS docs_run_ge3
FROM docs GROUP BY source
"""


def tokens_top_decile_share(sf_dir: str):
    """Throughput concentration on the NATIVE token stream: what share
    of each source's total token mass lands in its top 10% of hours —
    the burstiness gauge the planted x10 spikes exist to trip (a spike
    hour carries an outsized slice; a flat source reads ≈ 0.1 + trend).
    All-integer: hourly n_tok sums ARE ints, m = ⌈n/10⌉, and the top-m
    sum is tie-permutation-invariant, so the engine's sort and the
    oracle's arbitrary row_number order cannot diverge; the share is
    ONE divide.  One source-keyed exchange over the memoized hourly
    tier."""
    from ..stages.shard import sharded_map_groups

    roll = _tokens_rollup_1h(sf_dir)

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, sub in g.groupby("source", sort=False):
            vi = np.rint(sub["sum_value"].to_numpy(np.float64)
                         ).astype(np.int64)
            n = len(vi)
            m = (n + 9) // 10
            top = np.sort(vi)[::-1][:m]
            tot = int(vi.sum())
            if tot == 0:
                continue
            rows.append({
                "source": src, "n_buckets": np.int64(n),
                "n_top": np.int64(m),
                "top_decile_share": float(int(top.sum())) / float(tot)})
        return pd.DataFrame(rows, columns=[
            "source", "n_buckets", "n_top", "top_decile_share"])

    return sharded_map_groups(
        roll.select_columns(["source", "sum_value"]),
        "source", per_source, num_shards=4)


def _tokens_top_decile_oracle() -> str:
    return _tokens_oracle_cte() + """, r AS (
  SELECT source, CAST(sum(n_tok) AS BIGINT) AS x
  FROM t GROUP BY source, epoch_s - (epoch_s % 3600)
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


def tokens_longest_rising_run(sf_dir: str):
    """Longest strictly-rising hourly streak per source on the NATIVE
    token stream — the ramp detector (a spike's onset and a drifting
    source read very differently here).  Pure-INTEGER compares (hourly
    n_tok sums are ints; adjacency = exactly +3600 s), ties to the
    earliest run start; same vectorized boundary-scan form as
    longest_rising_run."""
    from ..stages.shard import sharded_map_groups

    roll = _tokens_rollup_1h(sf_dir)

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "bucket_start"], kind="stable")
        rows = []
        for src, sub in g.groupby("source", sort=False):
            ts = sub["bucket_start"].to_numpy()
            h = ts.astype("datetime64[h]").astype(np.int64)
            v = np.rint(sub["sum_value"].to_numpy(np.float64)
                        ).astype(np.int64)
            n = len(sub)
            if n == 1:
                rows.append({"source": src, "longest_rise": np.int64(1),
                             "run_start": ts[0]})
                continue
            ok = (np.diff(h) == 1) & (v[1:] > v[:-1])
            brk = np.concatenate(([0], np.cumsum(~ok)))
            lens = np.bincount(brk)
            best = int(lens.argmax())
            start_idx = int(np.searchsorted(brk, best))
            rows.append({"source": src,
                         "longest_rise": np.int64(int(lens[best])),
                         "run_start": ts[start_idx]})
        return pd.DataFrame(rows, columns=[
            "source", "longest_rise", "run_start"])

    return sharded_map_groups(
        roll.select_columns(["source", "bucket_start", "sum_value"]),
        "source", per_source, num_shards=4)


def _tokens_longest_rising_oracle() -> str:
    return _tokens_oracle_cte() + """, r AS (
  SELECT source, epoch_s - (epoch_s % 3600) AS b,
         CAST(sum(n_tok) AS BIGINT) AS v
  FROM t GROUP BY 1, 2
), s AS (
  SELECT source, b,
         CASE WHEN b = lag(b) OVER (PARTITION BY source ORDER BY b)
                   + 3600
               AND v > lag(v) OVER (PARTITION BY source ORDER BY b)
              THEN 0 ELSE 1 END AS brk
  FROM r
), i AS (
  SELECT source, b,
         sum(brk) OVER (PARTITION BY source ORDER BY b
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM s
), runs AS (
  SELECT source, grp, count(*) AS len, min(b) AS run_start_s
  FROM i GROUP BY 1, 2
)
SELECT source, CAST(len AS BIGINT) AS longest_rise,
       to_timestamp(run_start_s) AT TIME ZONE 'UTC' AS run_start
FROM runs
QUALIFY row_number() OVER (PARTITION BY source
                           ORDER BY len DESC, run_start_s ASC) = 1
"""


def template_position_topk(sf_dir: str, positions: int = 8, k: int = 3):
    """Prompt-template census by POSITION: the top-``k`` token ids at
    each of the first ``positions`` slots across the native corpus —
    how first_token_topk generalizes when the template is longer than
    one token (slot 1 concentrated + slot 5 diffuse = a 4-token
    template with free text after).  Engine: ``positions`` vectorized
    gathers at the Arrow list offsets per batch (no per-row Python),
    (pos, token) count partials through one composite-keyed exchange,
    then a tiny pos-keyed fold ranks.  Ties pinned (cnt DESC, token
    ASC); rank is part of the compared output."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    ds = _rd().read_parquet(_tokens_paths(sf_dir), columns=["tokens"])

    def partial(tb: pa.Table) -> pd.DataFrame:
        toks = tb["tokens"].combine_chunks()
        off = toks.offsets.to_numpy().astype(np.int64)
        lens = off[1:] - off[:-1]
        vals = toks.values.to_numpy().astype(np.int64)
        pos_l, tok_l = [], []
        for p in range(1, positions + 1):
            has = lens >= p
            if not has.any():
                continue
            pos_l.append(np.full(int(has.sum()), p, dtype=np.int64))
            tok_l.append(vals[off[:-1][has] + (p - 1)])
        if not pos_l:
            return pd.DataFrame({
                "pos": pd.Series([], dtype=np.int64),
                "tok": pd.Series([], dtype=np.int64),
                "cnt": pd.Series([], dtype=np.int64)})
        g = pd.DataFrame({
            "pos": np.concatenate(pos_l),
            "tok": np.concatenate(tok_l), "cnt": 1,
        }).groupby(["pos", "tok"], as_index=False).sum()
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    counts = sharded_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["pos", "tok"], {"cnt": "sum"})

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pos", "cnt", "tok"],
                          ascending=[True, False, True], kind="stable")
        g["rank"] = g.groupby("pos", sort=False).cumcount() + 1
        g = g[g["rank"] <= k]
        return pd.DataFrame({
            "pos": g["pos"].to_numpy(np.int64),
            "rank": g["rank"].to_numpy(np.int64),
            "token_id": g["tok"].to_numpy(np.int64),
            "cnt": g["cnt"].to_numpy(np.int64)})

    return sharded_map_groups(counts, "pos", topk, num_shards=4)


def _template_position_oracle(positions: int = 8, k: int = 3) -> str:
    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    glob = os.path.join(tokens_input_dir(sf_dir), "*.parquet")
    plist = ", ".join(str(p) for p in range(1, positions + 1))
    return f"""
WITH p AS (
  SELECT unnest([{plist}]) AS pos
), t AS (
  SELECT p.pos, tokens[p.pos] AS tok
  FROM read_parquet('{glob}'), p WHERE len(tokens) >= p.pos
), c AS (
  SELECT pos, tok, count(*) AS cnt FROM t GROUP BY 1, 2
)
SELECT CAST(pos AS BIGINT) AS pos,
       CAST(row_number() OVER (
           PARTITION BY pos ORDER BY cnt DESC, tok ASC) AS BIGINT)
         AS rank,
       CAST(tok AS BIGINT) AS token_id, CAST(cnt AS BIGINT) AS cnt
FROM c
QUALIFY row_number() OVER (
  PARTITION BY pos ORDER BY cnt DESC, tok ASC) <= {k}
"""


def token_vocab_turnover(sf_dir: str):
    """Day-over-day vocabulary TURNOVER per source over the native
    tokens input: Jaccard between day d's distinct token-id set and
    day d−1's — the churn signal that distinguishes a drifting source
    (new vocabulary displacing old) from a growing one
    (``token_vocab_growth`` counts first occurrences; a source can
    grow while staying stable, or churn while its vocab size is flat).
    Plan: per-batch distinct (source, token, day) partials (the token
    stream reduces before any all-to-all), ONE (source, token)-keyed
    exchange finishes the global distinct and emits, per token, a
    size partial for each day it appears and an intersection partial
    for each CONSECUTIVE day pair it spans; a tiny (source, day) fold
    + the O(sources×days) driver join finish.  Counts exact ints,
    jaccard = ONE int/int divide.  Rows only for days whose d−1 is
    observed for that source."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    ds = _rd().read_parquet(_tokens_paths(sf_dir),
                            columns=["doc_id", "tokens", "source"])

    def partial(tb: pa.Table) -> pd.DataFrame:
        toks = tb["tokens"].combine_chunks()
        off = toks.offsets.to_numpy().astype(np.int64)
        vals = toks.flatten().to_numpy().astype(np.int64)
        lens = off[1:] - off[:-1]
        doc_id = tb["doc_id"].to_pandas()
        day = (doc_id.str.split("|").str[1].astype(np.int64) * 60
               // 86400).to_numpy()
        src = tb["source"].to_pandas()
        codes, uniq = pd.factorize(src, sort=False)
        g = pd.DataFrame({
            "code": np.repeat(codes.astype(np.int64), lens),
            "tok": vals,
            "day": np.repeat(day, lens),
        }).drop_duplicates()
        g["source"] = uniq.take(g["code"].to_numpy())
        return g[["source", "tok", "day"]]

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def per_token(shard: pd.DataFrame) -> pd.DataFrame:
        d = shard.drop_duplicates()
        sz = d[["source", "day"]].copy()
        sz["nv"] = np.int64(1)
        sz["inter"] = np.int64(0)
        nxt = d.copy()
        nxt["day"] = nxt["day"] + 1
        it = d.merge(nxt, on=["source", "tok", "day"])[["source", "day"]]
        it["nv"] = np.int64(0)
        it["inter"] = np.int64(1)
        both = pd.concat([sz, it], ignore_index=True)
        return both.groupby(["source", "day"], as_index=False).sum()

    per_day = sharded_map_groups(parts, ["source", "tok"], per_token)
    agg = sharded_aggregate(per_day, ["source", "day"],
                            {"nv": "sum", "inter": "sum"}, num_shards=2
                            ).to_pandas()  # O(sources × days)
    agg = agg.sort_values(["source", "day"], kind="stable")
    prev = agg[["source", "day", "nv"]].copy()
    prev["day"] = prev["day"] + 1
    j = agg.merge(prev, on=["source", "day"], suffixes=("", "_prev"))
    nv = j["nv"].to_numpy(np.int64)
    np_ = j["nv_prev"].to_numpy(np.int64)
    inter = j["inter"].to_numpy(np.int64)
    return pd.DataFrame({
        "source": j["source"],
        "day": pd.to_datetime(j["day"].to_numpy(np.int64) * 86400,
                              unit="s"),
        "vocab_prev": np_, "vocab_day": nv, "n_common": inter,
        "jaccard": inter / (np_ + nv - inter),
    }).reset_index(drop=True)


def _token_vocab_turnover_oracle() -> str:
    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    glob = os.path.join(tokens_input_dir(sf_dir), "*.parquet")
    return f"""
WITH t AS (
  SELECT source,
         CAST(string_split(doc_id, '|')[2] AS BIGINT) * 60 // 86400 AS d,
         tokens
  FROM read_parquet('{glob}')
), u AS (
  SELECT DISTINCT source, d, unnest(tokens) AS tok FROM t
), v AS (
  SELECT source, d, count(*) AS nv FROM u GROUP BY 1, 2
), i AS (
  SELECT a.source, a.d + 1 AS d, count(*) AS inter
  FROM u a JOIN u b ON b.source = a.source AND b.tok = a.tok
                   AND b.d = a.d + 1
  GROUP BY 1, 2
)
SELECT v.source, to_timestamp(v.d * 86400)::TIMESTAMP AS day,
       CAST(vp.nv AS BIGINT) AS vocab_prev,
       CAST(v.nv AS BIGINT) AS vocab_day,
       CAST(coalesce(i.inter, 0) AS BIGINT) AS n_common,
       CAST(coalesce(i.inter, 0) AS DOUBLE)
         / (vp.nv + v.nv - coalesce(i.inter, 0)) AS jaccard
FROM v JOIN v vp ON vp.source = v.source AND vp.d = v.d - 1
LEFT JOIN i ON i.source = v.source AND i.d = v.d
"""


def tokens_flag_rule_1h(sf_dir: str, expected_cfg=None):
    """In-band guard for the LOESS/MC-gated half of ``tokens_flags_1h``
    (the iqr/zscore/mad members are already exact-oracled row streams):
    the distributed STL + ESD flag streams over the native hourly
    tokens tier vs a direct per-series application of the documented
    rules (see detectors._flag_rule_guard).  One row per
    (source, method in {stl, esd}): n_rows ★ from the synth parquet,
    booleans pinned TRUE."""
    from .detectors import _flag_rule_guard

    return _flag_rule_guard(_tokens_rollup_1h(sf_dir), "source",
                            (("stl", 48), ("esd", 20)),
                            expected_cfg=expected_cfg)


def _tokens_flag_rule_oracle() -> str:
    from .detectors import _flag_rule_select

    return _tokens_oracle_cte() + """
, r AS (
  SELECT source, epoch_s - (epoch_s % 3600) AS b
  FROM t GROUP BY 1, 2
), g AS (
  SELECT source, count(*) AS n_rows FROM r GROUP BY source
)""" + _flag_rule_select((("stl", 48), ("esd", 20)))


def tokens_chunks_fixed_1m(sf_dir: str):
    """``tokens_chunks_1m`` THROUGH the FixedSizeBinary layout (the
    north-star chunk-block column type, stages/compress.to_fixed_layout):
    chunks are padded to the codec's worst-case stride, written as
    Arrow FixedSizeBinary, decoded FROM the padded blobs, and every
    statistic is pinned by the same raw-table + chunk-rule oracle —
    plus two in-band booleans pinned TRUE: ``is_fixed_width`` (every
    blob is exactly the stride wide when it reaches the decoder) and
    ``pad_inert`` (the padded blob decodes to the same points as the
    stripped variable blob).  A padding bug, a stride regression, or a
    decoder that reads past the encoded bits all turn this row into a
    hard FAIL."""
    from ..functions.gorilla import decode_chunk
    from ..stages.compress import (compress, fixed_chunk_width,
                                   to_fixed_layout)

    cb = TIERS["1m"].chunk_buckets
    chunks = to_fixed_layout(
        compress(tokens_rollup_1m(sf_dir), "source", 60, cb), cb)
    width = fixed_chunk_width(cb)

    def decode_stats(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, cid, nb, blob in zip(batch["key"], batch["chunk_id"],
                                      batch["chunk_bytes"],
                                      batch["chunk"]):
            ts, vals = decode_chunk(blob)
            ts2, vals2 = decode_chunk(blob[: int(nb)])
            row = _decoded_chunk_stats(key, cid, ts, vals)
            row["is_fixed_width"] = len(blob) == width
            row["pad_inert"] = bool(np.array_equal(ts, ts2)
                                    and np.array_equal(vals, vals2))
            rows.append(row)
        return pd.DataFrame(rows, columns=[
            "source", "chunk_id", "t0", "t1", "n_points",
            "sum_tokens", "is_fixed_width", "pad_inert"])

    return chunks.map_batches(decode_stats, batch_format="pandas")


def _tokens_chunks_fixed_oracle() -> str:
    return _tokens_oracle_cte() + _TOKENS_CHUNK_ROLLUP_CTE + """
SELECT source, b // 86400 AS chunk_id,
       min(b) AS t0, max(b) AS t1,
       CAST(count(*) AS BIGINT) AS n_points,
       sum(v) AS sum_tokens,
       TRUE AS is_fixed_width, TRUE AS pad_inert
FROM r GROUP BY 1, 2
"""
