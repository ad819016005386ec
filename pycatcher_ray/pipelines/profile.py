"""One-pass corpus PROFILE — the fused multi-metric report a curation
run starts from.

The individual registry queries (``vocab_stats_by_source``,
``quality_filter``, ``dedup_exact``, ``lang_distribution``) each pay a
full corpus read; operationally you want all of them before deciding
curation thresholds, so this pipeline computes the whole per-source
report in ONE read pass:

1. **Tagged single pass** — one ``map_batches`` over the corpus emits a
   tagged union of partial rows: per-source integer counters (docs,
   chars, words, quality passes), batch-local distinct (source, word)
   rows, per-(text, source) content-digest partials (the
   ``dedup_exact`` 128-bit polars digest — text never enters the
   all-to-all), and distinct (source, lang) rows.
2. **One exchange** — every partial rides the SAME (kind, key) hash
   exchange; each shard fold finishes its kind (global word/lang
   distinct, per-digest min-doc attribution) and emits per-source
   integer partials.
3. **Tiny source fold** — a second exchange over O(sources·kinds) rows
   assembles the one-row-per-source report.

Everything in the report is exact-integer, so the ``corpus_profile``
registry entry carries a full DuckDB oracle; tests additionally pin the
fused numbers against the standalone oracled queries they fuse.

Reference parity: the reference has no corpus tooling (single-series
detectors only, catch.py); this is engine-native capability per
SURVEY.md §2's training-data section.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd

__all__ = ["profile_frame", "run_profile"]

# quality rule — MUST stay in lockstep with _QUALITY_FILTER_ORACLE
# (queries.py): words are single-space segments, so '' counts 1 word.
_MIN_WORDS = 10
_MIN_CHARS = 100
_CPW_LO, _CPW_HI = 3.0, 12.0

_COLS = ["source", "n_docs", "n_chars", "n_words", "n_distinct_words",
         "n_langs", "n_quality_pass", "n_exact_dup"]


def _tag(batch: pd.DataFrame) -> pd.DataFrame:
    """Tagged union of every metric's partial rows for one batch."""
    import polars as pl

    from ..stages.dedup import batch_words

    # fillna BEFORE astype: astype(str) would stringify nulls to the
    # literal 'None'/'nan', diverging from the (t or '') convention the
    # sibling doc queries and the NULL-skipping DuckDB oracle use
    text = batch["text"].fillna("").astype(str)
    src = batch["source"].to_numpy(dtype=object)
    n_chars = text.str.len().to_numpy(np.int64)
    n_words = text.str.count(" ").to_numpy(np.int64) + 1
    qpass = ((n_words >= _MIN_WORDS) & (n_chars >= _MIN_CHARS)
             & (n_chars / n_words >= _CPW_LO)
             & (n_chars / n_words <= _CPW_HI))

    frames = []
    # kind 0: per-source integer counters (key spreads by source)
    cnt = pd.DataFrame({"source": src, "n_chars": n_chars,
                        "n_words": n_words,
                        "qp": qpass.astype(np.int64)})
    c = cnt.groupby("source", as_index=False).agg(
        p_docs=("n_chars", "size"), p_chars=("n_chars", "sum"),
        p_words=("n_words", "sum"), p_qpass=("qp", "sum"))
    frames.append(pd.DataFrame({
        "kind": np.int64(0), "key": c["source"], "source": c["source"],
        "p_docs": c["p_docs"].astype(np.int64),
        "p_chars": c["p_chars"].astype(np.int64),
        "p_words": c["p_words"].astype(np.int64),
        "p_qpass": c["p_qpass"].astype(np.int64),
        "p_min": np.int64(0), "p_n": np.int64(0)}))

    # kind 1: batch-local distinct (source, word) — bulk tokenize,
    # one vectorized dedup (per-doc distinct ∘ cross-doc dedup ≡ one
    # batch-level (word, source) dedup)
    wflat, widx = batch_words(text)
    if wflat.size:
        w = pd.DataFrame({"key": wflat,
                          "source": src[widx]}).drop_duplicates()
        frames.append(pd.DataFrame({
            "kind": np.int64(1), "key": w["key"], "source": w["source"],
            "p_docs": np.int64(0), "p_chars": np.int64(0),
            "p_words": np.int64(0), "p_qpass": np.int64(0),
            "p_min": np.int64(0), "p_n": np.int64(0)}))

    # kind 2: per-(text, source) digest partials — dedup_exact's
    # 128-bit polars content digest; text itself never leaves the batch
    s = pl.Series("t", text.to_numpy())
    dig = pd.DataFrame({
        "key": (s.hash(seed=0x9E3779B9).cast(pl.Utf8) + ":"
                + s.hash(seed=0x85EBCA6B).cast(pl.Utf8)).to_numpy(),
        "source": src,
        "doc_id": batch["doc_id"].to_numpy(np.int64)})
    d = dig.groupby(["key", "source"], as_index=False).agg(
        p_min=("doc_id", "min"), p_n=("doc_id", "size"))
    frames.append(pd.DataFrame({
        "kind": np.int64(2), "key": d["key"], "source": d["source"],
        "p_docs": np.int64(0), "p_chars": np.int64(0),
        "p_words": np.int64(0), "p_qpass": np.int64(0),
        "p_min": d["p_min"].astype(np.int64),
        "p_n": d["p_n"].astype(np.int64)}))

    # kind 3: batch-local distinct (source, lang)
    lg = pd.DataFrame({"key": batch["lang"].to_numpy(dtype=object),
                       "source": src}).drop_duplicates()
    frames.append(pd.DataFrame({
        "kind": np.int64(3), "key": lg["key"], "source": lg["source"],
        "p_docs": np.int64(0), "p_chars": np.int64(0),
        "p_words": np.int64(0), "p_qpass": np.int64(0),
        "p_min": np.int64(0), "p_n": np.int64(0)}))

    return pd.concat(frames, ignore_index=True)


def _shard_fold(shard: pd.DataFrame) -> pd.DataFrame:
    """Finish each kind inside its shard, emit per-source partials."""
    out = []

    k0 = shard[shard["kind"] == 0]
    if len(k0):
        g = k0.groupby("source", as_index=False)[
            ["p_docs", "p_chars", "p_words", "p_qpass"]].sum()
        g[["p_distinct", "p_langs", "p_dup"]] = 0
        out.append(g)

    k1 = shard[shard["kind"] == 1].drop_duplicates(["key", "source"])
    if len(k1):
        g = k1.groupby("source", as_index=False).size().rename(
            columns={"size": "p_distinct"})
        g[["p_docs", "p_chars", "p_words", "p_qpass", "p_langs",
           "p_dup"]] = 0
        out.append(g)

    k2 = shard[shard["kind"] == 2]
    if len(k2):
        # a digest lives wholly in this shard: the GLOBAL min doc of
        # each text-group is the keeper; every other doc is a dup
        # attributed to its own source
        g = k2.groupby(["key", "source"], as_index=False).agg(
            p_min=("p_min", "min"), p_n=("p_n", "sum"))
        gmin = g.groupby("key")["p_min"].transform("min")
        owns = (g["p_min"] == gmin).astype(np.int64)
        g["p_dup"] = g["p_n"].to_numpy(np.int64) - owns.to_numpy()
        g = g.groupby("source", as_index=False)[["p_dup"]].sum()
        g = g[g["p_dup"] > 0]
        if len(g):
            g[["p_docs", "p_chars", "p_words", "p_qpass", "p_distinct",
               "p_langs"]] = 0
            out.append(g)

    k3 = shard[shard["kind"] == 3].drop_duplicates(["key", "source"])
    if len(k3):
        g = k3.groupby("source", as_index=False).size().rename(
            columns={"size": "p_langs"})
        g[["p_docs", "p_chars", "p_words", "p_qpass", "p_distinct",
           "p_dup"]] = 0
        out.append(g)

    cols = ["source", "p_docs", "p_chars", "p_words", "p_qpass",
            "p_distinct", "p_langs", "p_dup"]
    if not out:
        return pd.DataFrame({c: pd.Series(
            [], dtype=object if c == "source" else np.int64)
            for c in cols})
    return pd.concat(out, ignore_index=True)[cols]


def profile_frame(docs) -> pd.DataFrame:
    """The fused per-source profile of a documents Dataset (one corpus
    pass, one (kind, key) exchange, one tiny source fold)."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    tagged = docs.map_batches(_tag, batch_format="pandas")
    partials = sharded_map_groups(tagged, ["kind", "key"], _shard_fold)
    agg = sharded_aggregate(
        partials, ["source"],
        {c: "sum" for c in ["p_docs", "p_chars", "p_words", "p_qpass",
                            "p_distinct", "p_langs", "p_dup"]},
        num_shards=4).to_pandas()
    if agg.empty:
        return pd.DataFrame({c: pd.Series(
            [], dtype=object if c == "source" else np.int64)
            for c in _COLS})
    return pd.DataFrame({
        "source": agg["source"],
        "n_docs": agg["p_docs"].astype(np.int64),
        "n_chars": agg["p_chars"].astype(np.int64),
        "n_words": agg["p_words"].astype(np.int64),
        "n_distinct_words": agg["p_distinct"].astype(np.int64),
        "n_langs": agg["p_langs"].astype(np.int64),
        "n_quality_pass": agg["p_qpass"].astype(np.int64),
        "n_exact_dup": agg["p_dup"].astype(np.int64)})[_COLS]


def run_profile(input_paths, out_path: str | None = None) -> dict:
    """CLI entry: profile a documents parquet; optionally write the
    report as parquet.  Returns metrics + the report rows."""
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    t0 = time.time()
    docs = rd.read_parquet(input_paths)
    report = profile_frame(docs)
    metrics = {
        "input_paths": list(np.atleast_1d(input_paths)),
        "n_sources": int(len(report)),
        "n_docs": int(report["n_docs"].sum()) if len(report) else 0,
        "seconds": round(time.time() - t0, 3),
    }
    if out_path:
        report.to_parquet(out_path, index=False)
        metrics["out_path"] = out_path
    metrics["report"] = report.to_dict(orient="records")
    return metrics
