"""Flagship end-to-end pipeline (SURVEY.md §3.4):

read_parquet(tokens) → ingest/validate (zero-copy Arrow; ts from doc_id,
token checksums) → rollup 1m (partial+final groupby) → cascade 1h, 1d →
gap-fill per series → detect (actor pool over packed series) →
compress (Gorilla chunks) → checkpointed partitioned write + metrics.

Each tier is checkpointed through ``CheckpointedWriter`` so a rerun
skips finished partitions; cascades read the finer tier's *written*
output instead of recomputing its lineage.
"""

from __future__ import annotations

import json
import os
import time

from ..config import TIERS, EngineConfig
from ..stages.compress import compress
from ..stages.detect import detect
from ..stages.ingest import ingest
from ..stages.rollup import cascade, rollup
from ..state.checkpoint import CheckpointedWriter

__all__ = ["run_flagship"]


def run_flagship(
    input_paths,
    out_dir: str,
    cfg: EngineConfig | None = None,
    key_col: str = "source",
    with_compress: bool = True,
    with_gapfill: bool = True,
    checkpoint_intermediate: bool = True,
):
    """Run the full pipeline; returns (flags_dataset, metrics dict).

    ``checkpoint_intermediate=False`` keeps the rollup tiers in the
    object store (``materialize``) instead of the write→read round trip
    per tier — the throughput configuration (final flags/chunks are
    still checkpoint-written); ``True`` is the durable/resumable mode.
    """
    import ray.data as rd

    cfg = cfg or EngineConfig()
    t_start = time.time()
    metrics: dict = {"input_paths": list(map(str, input_paths)), "stages": {}}

    from ..stages.ingest import read_parquet_fused

    ds = read_parquet_fused(input_paths)
    ingested = ingest(ds, batch_size=cfg.read_batch_size)
    # prune: the rollup only needs (source, ts, n_tok) — tokens stay behind
    slim = ingested.select_columns([key_col, "ts", "n_tok"])
    marks = {"setup": round(time.time() - t_start, 3)}

    lineage = {"inputs": metrics["input_paths"]}
    prev_name = None
    tier_ds = {}
    for name in cfg.tiers:
        spec = TIERS[name]
        t0 = time.time()  # tier construction executes the exchange eagerly
        if checkpoint_intermediate:
            writer = CheckpointedWriter(out_dir, f"rollup_{name}")
            if len(writer.done_partitions()) >= cfg.num_output_partitions:
                # resume fast path: every partition checkpointed — read
                # back without rebuilding the tier (the rollup exchange
                # executes eagerly, so the skip must happen BEFORE it)
                tier_ds[name] = writer.read()
                metrics["stages"][f"rollup_{name}"] = {
                    "stage_dir": writer.stage_dir,
                    "partitions_written": [],
                    "partitions_skipped": sorted(writer.done_partitions()),
                    "rows_written": 0,
                    "seconds": round(time.time() - t0, 3),
                }
                prev_name = name
                continue
        if prev_name is None:
            tier = rollup(slim, key_col, "ts", "n_tok", spec.seconds,
                          batch_size=cfg.read_batch_size)
        else:
            tier = cascade(tier_ds[prev_name], key_col, spec.seconds)
        if checkpoint_intermediate:
            summary = writer.write(tier, key_col, cfg.num_output_partitions,
                                   lineage={**lineage, "from_tier": prev_name})
            tier_ds[name] = writer.read()
        else:
            tier_ds[name] = tier.materialize()
            summary = {"rows_written": tier_ds[name].count(),
                       "checkpointed": False}
        summary["seconds"] = round(time.time() - t0, 3)
        metrics["stages"][f"rollup_{name}"] = summary
        prev_name = name

    marks["tiers"] = round(time.time() - t_start - marks["setup"], 3)
    detect_tier = cfg.detect_tier
    series_src = tier_ds[detect_tier]
    # tier row counts are already known from the construction barrier —
    # pass them down so pack_series/compress skip their own
    # materialize+count pass (r4: each such pass is a full-pipeline
    # barrier; the scaling profile showed ~9 s of fixed per-run cost)
    tier_rows = {n: metrics["stages"][f"rollup_{n}"].get("rows_written") or 0
                 for n in cfg.tiers}

    flags_writer = CheckpointedWriter(out_dir, f"flags_{detect_tier}")

    def _skip_summary(writer):
        return {"stage_dir": writer.stage_dir, "partitions_written": [],
                "partitions_skipped": sorted(writer.done_partitions()),
                "rows_written": 0}

    def _flags_stage():
        t0 = time.time()
        if len(flags_writer.done_partitions()) >= cfg.num_output_partitions:
            summary = _skip_summary(flags_writer)  # resume: skip the pack
        else:
            # gap-fill is fused into the series-pack pass (one groupby
            # shuffle instead of two); the standalone gapfill stage
            # remains for pipelines that persist filled series.
            from ..stages.shard import compute_shards

            n = tier_rows.get(detect_tier) or 0
            flags = detect(
                series_src, key_col, tier=detect_tier, cfg=cfg,
                gapfill_method=cfg.gapfill_method if with_gapfill else None,
                num_shards=compute_shards(n) if n else None,
            )
            summary = flags_writer.write(flags, "key",
                                         cfg.num_output_partitions,
                                         lineage={"from_tier": detect_tier})
        summary["seconds"] = round(time.time() - t0, 3)
        return f"flags_{detect_tier}", summary

    def _chunks_stage():
        t0 = time.time()
        chunk_writer = CheckpointedWriter(out_dir, "chunks_1m")
        if len(chunk_writer.done_partitions()) >= cfg.num_output_partitions:
            summary = _skip_summary(chunk_writer)
        else:
            from ..stages.shard import compute_shards

            n = tier_rows.get("1m") or 0
            chunks = compress(tier_ds["1m"], key_col, TIERS["1m"].seconds,
                              TIERS["1m"].chunk_buckets,
                              num_shards=compute_shards(n) if n else None)
            summary = chunk_writer.write(chunks, "key",
                                         cfg.num_output_partitions,
                                         lineage={"from_tier": "1m"})
        summary["seconds"] = round(time.time() - t0, 3)
        return "chunks_1m", summary

    # flags ∥ chunks: both stages are TASK carriers (detect's default
    # since r3 — no actor-pool CPU reservation, which is what broke the
    # r2 concurrent design), both consume the already-materialized 1m
    # tier, and each has far more parallelism than CPUs, so running them
    # in threads is work-conserving and saves the smaller stage's wall.
    stages = [_flags_stage] + ([_chunks_stage] if with_compress else [])
    if len(stages) > 1 and not cfg.detect_use_actors:
        import concurrent.futures as _cf

        with _cf.ThreadPoolExecutor(len(stages)) as pool:
            for name, summary in pool.map(lambda s: s(), stages):
                metrics["stages"][name] = summary
    else:
        for stage in stages:
            name, summary = stage()
            metrics["stages"][name] = summary

    total = time.time() - t_start
    # wall attribution: setup (lazy plan build + writer dir scans), the
    # tier loop, then the threaded detect∥compress phase; any residual
    # left over is driver-side finalize (metrics write, read handles) —
    # the r4 instrumentation for the ~2 s previously outside all timers
    marks["detect_compress"] = round(
        total - marks["setup"] - marks["tiers"], 3)
    metrics["wall_marks"] = marks
    metrics["total_seconds"] = round(total, 3)
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    return flags_writer.read(), metrics
