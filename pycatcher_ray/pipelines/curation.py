"""End-to-end document-curation pipeline — the documents-corpus twin of
the tokens flagship.

Stages (each a distributed Ray Data transform; the driver never holds
the corpus):

1. **Quality gate** — actor-pool ``map_batches`` computing the
   C4/Gopher-style feature scores (``stages/textops.TextStats``:
   compiled regexes live in ``__init__``) and dropping rows below the
   word-count floor or quality threshold, text kept inline so the
   corpus makes exactly one pass.
2. **Exact dedup** — digest-keyed: each text contributes a (doc_id,
   128-bit content hash) row (~24 B) to the exchange; per-digest all ids
   except the min are the drop set, which returns to the driver
   (bounded by the DUPLICATE count) and broadcasts for a map-side
   anti-filter.  Corpus text never enters an all-to-all.
3. **Near-dup canonicalization** — ``stages/dedup.minhash_dedup``
   (capped LSH buckets → distributed Jaccard verify → label-propagation
   clustering); only the (doc_id, cluster_id) table — one row per
   near-dup doc, not per doc — reaches the driver, and the non-canonical
   ids are broadcast once via ``ray.put`` for a map-side anti-filter.
4. **Checkpointed write** — ``state.CheckpointedWriter`` partitioned
   parquet with per-partition manifests; reruns skip complete
   partitions.

Scale notes: stages 1–2 stream; stage 3's driver table is bounded by
the number of near-duplicate docs (LSH-pruned), the documented bound of
the dedup family.  Reference parity: the reference has no corpus
pipeline at all (single-series detectors only); this is engine-native
capability per SURVEY.md §2's training-data section.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd

__all__ = ["run_curation"]


class QualityGate:
    """Score with TextStats, keep text inline, drop low-quality rows."""

    def __init__(self, min_quality: float, min_words: int):
        from ..stages.textops import TextStats

        self.stats = TextStats()
        self.min_quality = min_quality
        self.min_words = min_words

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = self.stats(batch)
        keep = ((feats["n_words"].to_numpy() >= self.min_words)
                & (feats["quality_score"].to_numpy() >= self.min_quality))
        out = batch.loc[keep].copy()
        out["quality_score"] = feats["quality_score"].to_numpy()[keep]
        return out


def _text_digests(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, h1, h2): two independent 64-bit content hashes per text
    (polars bulk hashing — no per-row Python).  128 combined bits make a
    false dup-collision negligible at any corpus size (~n²/2^129); only
    these ~24-byte rows ride the dedup exchange, never the text."""
    import polars as pl

    # fillna BEFORE astype: astype(str) would stringify nulls to the
    # literal 'None', colliding with real "None" texts and diverging
    # from the (t or "") convention dedup_exact uses
    s = pl.Series("t", batch["text"].fillna("").astype(str).to_numpy())
    return pd.DataFrame({
        "doc_id": batch["doc_id"].to_numpy(),
        "h1": s.hash(seed=0x9E3779B9).to_numpy().astype(np.int64),
        "h2": s.hash(seed=0x85EBCA6B).to_numpy().astype(np.int64),
    })


def _dup_ids_shard(shard: pd.DataFrame) -> pd.DataFrame:
    """All doc_ids per (h1, h2) digest EXCEPT the minimum — the drop
    set.  A digest lives in exactly one shard, so this is globally
    correct."""
    keep = shard.groupby(["h1", "h2"])["doc_id"].transform("min")
    return shard.loc[shard["doc_id"].to_numpy()
                     != keep.to_numpy(), ["doc_id"]]


def run_curation(input_paths, out_dir: str, *, min_quality: float = 0.35,
                 min_words: int = 5, neardup_threshold: float = 0.7,
                 num_partitions: int = 8) -> dict:
    """Run the full curation pipeline; returns per-stage metrics."""
    import ray
    import ray.data as rd

    from ..stages.dedup import minhash_dedup
    from ..stages.shard import sharded_map_groups
    from ..state import CheckpointedWriter

    rd.DataContext.get_current().enable_progress_bars = False
    metrics: dict = {"input_paths": list(np.atleast_1d(input_paths))}

    t0 = time.time()
    docs = rd.read_parquet(input_paths)
    n_input = docs.count()  # parquet metadata — no data scan

    # task carrier + per-process singleton (config.stage_instance): a
    # fresh actor pool mid-session pays serialized cold process spawns
    gate_kw = (min_quality, min_words)

    def gate_fn(batch: pd.DataFrame) -> pd.DataFrame:
        from ..config import stage_instance

        inst = stage_instance(("curation_gate",) + gate_kw,
                              lambda: QualityGate(*gate_kw))
        return inst(batch)

    gated = docs.map_batches(
        gate_fn, batch_format="pandas", batch_size=4096,
    ).materialize()
    n_gated = gated.count()
    metrics["quality_gate"] = {
        "n_input": int(n_input), "n_kept": int(n_gated),
        "n_dropped": int(n_input - n_gated),
        "seconds": round(time.time() - t0, 3),
    }

    t1 = time.time()
    # digest-key exact dedup (verdict r3 item 8): the exchange moves
    # (doc_id, 128-bit content digest) — ~24 B/row — instead of the full
    # text; the duplicate ids (bounded by the DUPLICATE count, the same
    # documented bound as the near-dup table below) come back to the
    # driver and broadcast for a map-side anti-filter, so corpus text
    # never enters an all-to-all.
    digests = gated.map_batches(_text_digests, batch_format="pandas")
    dup_tbl = sharded_map_groups(digests, ["h1", "h2"],
                                 _dup_ids_shard).to_pandas()
    exact_drop = (np.sort(dup_tbl["doc_id"].to_numpy(dtype=np.int64))
                  if "doc_id" in dup_tbl.columns
                  else np.empty(0, dtype=np.int64))
    exact_drop_ref = ray.put(exact_drop)

    def exact_anti_filter(batch: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(exact_drop_ref)
        if not d.size:
            return batch
        return batch[~np.isin(batch["doc_id"].to_numpy(dtype=np.int64), d)]

    deduped = gated.map_batches(exact_anti_filter,
                                batch_format="pandas").materialize()
    n_exact = deduped.count()
    metrics["exact_dedup"] = {
        "n_kept": int(n_exact), "n_dropped": int(n_gated - n_exact),
        "seconds": round(time.time() - t1, 3),
    }

    t2 = time.time()
    clusters = minhash_dedup(deduped, threshold=neardup_threshold)
    if len(clusters):
        canonical = clusters.groupby("cluster_id")["doc_id"].min()
        drop = clusters.loc[
            ~clusters["doc_id"].isin(canonical), "doc_id"
        ].to_numpy(dtype=np.int64)
    else:
        drop = np.empty(0, dtype=np.int64)
    drop_ref = ray.put(np.sort(drop))

    def anti_filter(batch: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(drop_ref)
        if not d.size:
            return batch
        return batch[~np.isin(batch["doc_id"].to_numpy(dtype=np.int64), d)]

    # materialize so the anti-filter's runtime lands in THIS stage's
    # seconds rather than being absorbed lazily into the write pass
    kept = deduped.map_batches(anti_filter,
                               batch_format="pandas").materialize()
    metrics["near_dedup"] = {
        "n_clusters": int(clusters["cluster_id"].nunique())
        if len(clusters) else 0,
        "n_dropped": int(drop.size),
        "seconds": round(time.time() - t2, 3),
    }

    t3 = time.time()
    writer = CheckpointedWriter(out_dir, "corpus")
    summary = writer.write(kept, key_col="doc_id",
                           num_partitions=num_partitions)
    summary["seconds"] = round(time.time() - t3, 3)
    metrics["write"] = summary
    metrics["total_seconds"] = round(time.time() - t0, 3)
    return metrics
