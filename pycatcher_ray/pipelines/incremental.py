"""Incremental tier maintenance — continuous aggregates over appended data.

``update_tiers`` folds NEW input shards into already-checkpointed rollup
tiers without recomputing history (the "continuous aggregate"
materialization of the north rule): the rollup measures (sum, count,
min, max) are mergeable, so

1. the new shards are ingested and partially aggregated exactly like a
   fresh run — the delta stays a Ray Dataset end to end;
2. the delta is hash-partitioned with the SAME ``stable_key_hash`` as
   the checkpoint layout (one partitioning decision everywhere), so the
   partitions TOUCHED by new data are exactly the groups of a
   ``groupby("part")``;
3. each touched partition is merged INSIDE its map_groups task: the
   task reads that partition's existing parquet, combines it with the
   delta rows (mergeable measures), rewrites data + manifest
   atomically.  The driver only collects per-partition summaries —
   no tier ever materializes driver-side.

**Idempotent / resume-safe**: every update carries a deterministic
``update_id`` (content hash of the sorted input shard list).  A
partition's manifest lineage records the update_ids already applied;
re-running the same update (the natural crash recovery) skips
partitions that already applied it instead of double-counting deltas.

Untouched partitions are never read or written, so the cost of an
update scales with the new data + touched-partition size, not with
history — the property that makes 1m/1h/1d retention tiers maintainable
at 10^12-sequence scale.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import TIERS, EngineConfig
from ..stages.ingest import ingest
from ..stages.rollup import rollup, cascade
from ..state.checkpoint import hash_partition_column

__all__ = ["update_tiers", "update_id_for", "refresh_partitions"]


def update_id_for(new_input_paths) -> str:
    """Deterministic id of an update batch: content-independent hash of
    the sorted shard path list (same inputs → same id on every rerun)."""
    h = hashlib.sha256()
    for p in sorted(map(str, new_input_paths)):
        h.update(p.encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


def _merge_frames(existing: pd.DataFrame | None, new: pd.DataFrame,
                  key_col: str) -> pd.DataFrame:
    both = pd.concat([existing, new]) if existing is not None else new
    g = both.groupby([key_col, "bucket_start"], as_index=False).agg(
        sum_value=("sum_value", "sum"),
        n_points=("n_points", "sum"),
        min_value=("min_value", "min"),
        max_value=("max_value", "max"),
    )
    g["mean_value"] = g["sum_value"] / g["n_points"]
    return g.sort_values([key_col, "bucket_start"]).reset_index(drop=True)


def _make_merge_task(stage_dir: str, key_col: str, update_id: str,
                     inputs: list[str]):
    """Per-partition merge, run INSIDE the groupby("part") task."""

    def merge_partition(g: pd.DataFrame) -> pd.DataFrame:
        if "part" not in g.columns or not len(g):
            return pd.DataFrame({"part": [], "rows": [], "applied": []})
        part = int(g["part"].iloc[0])
        pdir = os.path.join(stage_dir, f"part={part}")
        manifest_path = os.path.join(pdir, "manifest.json")
        lineage: dict = {}
        if os.path.exists(manifest_path):
            lineage = json.load(open(manifest_path)).get("lineage", {})
        data_path = os.path.join(pdir, "data.parquet")
        existing = None
        applied_ids: list[str] = []
        if os.path.exists(data_path):
            existing_tbl = pq.read_table(data_path)
            # the applied-update list lives IN the parquet key-value
            # metadata: data + lineage change in the same os.replace, so
            # a crash can never leave merged data without its update_id
            # (ADVICE r2: the old data-then-manifest rename pair had a
            # double-apply window between the two renames)
            meta = existing_tbl.schema.metadata or {}
            applied_ids = json.loads(
                meta.get(b"applied_updates", b"[]").decode())
            if update_id in applied_ids:
                # crash-recovery rerun: this partition already merged
                # this exact input batch — skip, don't double-apply
                return pd.DataFrame({"part": [part], "rows": [0],
                                     "applied": [False]})
            existing = existing_tbl.to_pandas()
        merged = _merge_frames(existing, g.drop(columns=["part"]), key_col)
        os.makedirs(pdir, exist_ok=True)
        out_tbl = pa.Table.from_pandas(merged, preserve_index=False)
        new_meta = dict(out_tbl.schema.metadata or {})
        new_meta[b"applied_updates"] = json.dumps(
            applied_ids + [update_id]).encode()
        out_tbl = out_tbl.replace_schema_metadata(new_meta)
        tmp = os.path.join(pdir, ".data.parquet.tmp")
        pq.write_table(out_tbl, tmp)
        os.replace(tmp, data_path)  # atomic: data + applied_updates together
        updates = lineage.get("updates", [])
        updates.append({"update_id": update_id, "inputs": inputs,
                        "at": time.time()})
        lineage["updates"] = updates
        # manifest is observability only — idempotency derives from the
        # parquet metadata above, so a crash before this write is safe
        mtmp = os.path.join(pdir, ".manifest.json.tmp")
        with open(mtmp, "w") as f:
            json.dump({
                "partition": part,
                "rows": int(len(merged)),
                "value_checksum": float(
                    merged.select_dtypes("number").sum().sum()
                ),
                "lineage": lineage,
                "written_at": time.time(),
            }, f)
        os.replace(mtmp, manifest_path)
        return pd.DataFrame({"part": [part], "rows": [int(len(merged))],
                             "applied": [True]})

    return merge_partition


def refresh_partitions(out_dir: str, stage: str, source_tier: str,
                       touched: list[int], build, cfg: EngineConfig,
                       key_col: str = "source") -> dict | None:
    """Recompute a DERIVED stage (flags, chunks) for the TOUCHED
    partitions only, from the already-merged tier partitions.

    Key insight: every stage partitions by the same ``stable_key_hash``
    of the series key, so a series lives in partition p of EVERY stage —
    recomputing stage partition p needs exactly tier partition p as
    input, and the recomputed rows land back in partition p.  Untouched
    partitions keep their previous output (their series data did not
    change), so the refresh cost scales with the update, not history.

    ``build(tier_ds) -> Dataset`` produces the stage's rows from a tier
    Dataset.  Returns the write summary, or None if the stage was never
    checkpointed (nothing to refresh)."""
    import ray.data as rd

    from ..state.checkpoint import CheckpointedWriter

    stage_dir = os.path.join(out_dir, stage)
    if not os.path.isdir(stage_dir):
        return None
    tier_paths = [
        os.path.join(out_dir, f"rollup_{source_tier}", f"part={p}",
                     "data.parquet")
        for p in touched
    ]
    tier_paths = [p for p in tier_paths if os.path.exists(p)]
    if not tier_paths:
        return {"partitions_written": [], "partitions_skipped": [],
                "rows_written": 0}
    tier_ds = rd.read_parquet(tier_paths, partitioning=None)
    out_ds = build(tier_ds)
    # invalidate exactly the touched partitions, then let the
    # checkpointed writer rebuild them (all keys read from partition p
    # hash back into partition p; everything else stays done)
    for p in touched:
        manifest = os.path.join(stage_dir, f"part={p}", "manifest.json")
        if os.path.exists(manifest):
            os.remove(manifest)
    writer = CheckpointedWriter(out_dir, stage)
    return writer.write(out_ds, "key", cfg.num_output_partitions,
                        lineage={"refreshed_from": source_tier,
                                 "partitions": sorted(touched)})


def update_tiers(
    new_input_paths,
    out_dir: str,
    cfg: EngineConfig | None = None,
    key_col: str = "source",
    refresh_outputs: bool = True,
) -> dict:
    """Fold new shards into the checkpointed rollup tiers under out_dir.

    Returns per-tier update metrics (partitions touched/total/skipped,
    rows).  The tier stages must already exist (a prior ``run_flagship``
    with ``checkpoint_intermediate=True``).  Safe to re-run with the
    same inputs after a crash: already-updated partitions are skipped
    via the update_id recorded in their manifest lineage.
    """
    import ray.data as rd

    cfg = cfg or EngineConfig()
    inputs = list(map(str, new_input_paths))
    uid = update_id_for(inputs)
    metrics: dict = {"new_inputs": inputs, "update_id": uid, "tiers": {}}

    from ..stages.ingest import read_parquet_fused

    ds = read_parquet_fused(new_input_paths)
    slim = ingest(ds, batch_size=cfg.read_batch_size).select_columns(
        [key_col, "ts", "n_tok"]
    )

    # existence gate BEFORE any writes (a missing prior run must fail
    # loudly, not be silently created)
    for name in cfg.tiers:
        stage_dir = os.path.join(out_dir, f"rollup_{name}")
        if not os.path.isdir(stage_dir):
            raise FileNotFoundError(
                f"{stage_dir} missing — run the flagship with "
                "checkpoint_intermediate=True before incremental updates"
            )

    prev_delta = None
    for name in cfg.tiers:
        spec = TIERS[name]
        stage_dir = os.path.join(out_dir, f"rollup_{name}")
        t0 = time.time()
        if prev_delta is None:
            delta = rollup(slim, key_col, "ts", "n_tok", spec.seconds,
                           batch_size=cfg.read_batch_size)
        else:
            # cascade the NEW deltas only (sum-of-sums re-aggregation)
            delta = cascade(prev_delta, key_col, spec.seconds)
        # the delta is tier-sized-or-smaller; materialize so the next
        # tier cascades from the object store, not from a recompute
        delta = delta.materialize()
        parted = hash_partition_column(delta, key_col,
                                       cfg.num_output_partitions)
        from ..stages.shard import exchange_by_int_column

        summary = exchange_by_int_column(
            parted, "part", cfg.num_output_partitions,
            _make_merge_task(stage_dir, key_col, uid, inputs),
            batch_format="pandas",
        ).to_pandas()
        touched = sorted(int(p) for p in summary["part"]) if len(summary) else []
        applied = (
            sorted(int(p) for p in summary[summary["applied"]]["part"])
            if len(summary) else []
        )
        metrics["tiers"][name] = {
            "partitions_touched": touched,
            "partitions_applied": applied,
            "partitions_skipped_idempotent": sorted(set(touched) - set(applied)),
            "partitions_total": cfg.num_output_partitions,
            "new_rows": int(delta.count()),
            "seconds": round(time.time() - t0, 3),
        }
        prev_delta = delta

    if refresh_outputs:
        from ..config import TIERS as _TIERS
        from ..stages.compress import compress
        from ..stages.detect import detect

        detect_tier = cfg.detect_tier
        touched_detect = metrics["tiers"].get(detect_tier, {}).get(
            "partitions_applied", [])
        if touched_detect:
            t0 = time.time()
            s = refresh_partitions(
                out_dir, f"flags_{detect_tier}", detect_tier, touched_detect,
                lambda tier_ds: detect(tier_ds, key_col, tier=detect_tier,
                                       cfg=cfg,
                                       gapfill_method=cfg.gapfill_method),
                cfg, key_col,
            )
            if s is not None:
                s["seconds"] = round(time.time() - t0, 3)
                metrics["flags_refreshed"] = s
        touched_1m = metrics["tiers"].get("1m", {}).get(
            "partitions_applied", [])
        if touched_1m:
            t0 = time.time()
            spec = _TIERS["1m"]
            s = refresh_partitions(
                out_dir, "chunks_1m", "1m", touched_1m,
                lambda tier_ds: compress(tier_ds, key_col, spec.seconds,
                                         spec.chunk_buckets),
                cfg, key_col,
            )
            if s is not None:
                s["seconds"] = round(time.time() - t0, 3)
                metrics["chunks_refreshed"] = s
    return metrics
