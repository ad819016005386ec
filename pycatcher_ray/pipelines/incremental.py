"""Incremental tier maintenance — continuous aggregates over appended data.

``update_tiers`` folds NEW input shards into already-checkpointed rollup
tiers without recomputing history (the "continuous aggregate"
materialization of the north rule): the rollup measures (sum, count,
min, max) are mergeable, so

1. the new shards are ingested and partially aggregated exactly like a
   fresh run;
2. the hash partitions TOUCHED by the new data are identified from its
   keys (same ``stable_key_hash`` as the checkpoint layout — one
   partitioning decision everywhere);
3. only those partitions are rewritten: existing partition parquet is
   read back as partials, combined with the new partials, finalized,
   and atomically replaced (manifest rewritten with appended lineage).

Untouched partitions are never read or written, so the cost of an
update scales with the new data + touched-partition size, not with
history — the property that makes 1m/1h/1d retention tiers maintainable
at 10^12-sequence scale.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import TIERS, EngineConfig
from ..stages.ingest import ingest
from ..stages.rollup import rollup, cascade
from ..state.checkpoint import CheckpointedWriter, stable_key_hash

__all__ = ["update_tiers"]


def _touched_partitions(new_tier_df: pd.DataFrame, key_col: str,
                        num_partitions: int) -> dict[int, pd.DataFrame]:
    keys = new_tier_df[key_col].astype(str).to_numpy()
    uniq = pd.unique(keys)
    part_of = dict(zip(uniq, stable_key_hash(uniq, num_partitions)))
    parts = np.array([part_of[k] for k in keys])
    return {int(p): new_tier_df[parts == p] for p in np.unique(parts)}


def _merge_partition(existing: pd.DataFrame | None, new: pd.DataFrame,
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


def update_tiers(
    new_input_paths,
    out_dir: str,
    cfg: EngineConfig | None = None,
    key_col: str = "source",
) -> dict:
    """Fold new shards into the checkpointed rollup tiers under out_dir.

    Returns per-tier update metrics (partitions touched/total, rows).
    The tier stages must already exist (a prior ``run_flagship`` with
    ``checkpoint_intermediate=True``).
    """
    import ray.data as rd

    cfg = cfg or EngineConfig()
    metrics: dict = {"new_inputs": list(map(str, new_input_paths)), "tiers": {}}

    ds = rd.read_parquet(new_input_paths)
    slim = ingest(ds, batch_size=cfg.read_batch_size).select_columns(
        [key_col, "ts", "n_tok"]
    )

    # existence gate BEFORE constructing writers (the writer constructor
    # creates its stage dir, which would mask a missing prior run)
    for name in cfg.tiers:
        stage_dir = os.path.join(out_dir, f"rollup_{name}")
        if not os.path.isdir(stage_dir):
            raise FileNotFoundError(
                f"{stage_dir} missing — run the flagship with "
                "checkpoint_intermediate=True before incremental updates"
            )

    prev_tier_new: pd.DataFrame | None = None
    for name in cfg.tiers:
        spec = TIERS[name]
        writer = CheckpointedWriter(out_dir, f"rollup_{name}")
        t0 = time.time()
        if prev_tier_new is None:
            new_tier = rollup(slim, key_col, "ts", "n_tok", spec.seconds,
                              batch_size=cfg.read_batch_size).to_pandas()
        else:
            # cascade the NEW deltas only (sum-of-sums re-aggregation)
            import ray.data as rd2

            new_tier = cascade(
                rd2.from_pandas(prev_tier_new), key_col, spec.seconds
            ).to_pandas()
        touched = _touched_partitions(new_tier, key_col,
                                      cfg.num_output_partitions)
        for part, part_new in touched.items():
            pdir = os.path.join(writer.stage_dir, f"part={part}")
            data_path = os.path.join(pdir, "data.parquet")
            existing = (
                pq.read_table(data_path).to_pandas()
                if os.path.exists(data_path) else None
            )
            merged = _merge_partition(existing, part_new, key_col)
            os.makedirs(pdir, exist_ok=True)
            tmp = os.path.join(pdir, ".data.parquet.tmp")
            pq.write_table(
                pa.Table.from_pandas(merged, preserve_index=False), tmp
            )
            os.replace(tmp, data_path)
            manifest_path = os.path.join(pdir, "manifest.json")
            lineage = {}
            if os.path.exists(manifest_path):
                lineage = json.load(open(manifest_path)).get("lineage", {})
            updates = lineage.get("updates", [])
            updates.append({"inputs": metrics["new_inputs"],
                            "at": time.time()})
            lineage["updates"] = updates
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
        metrics["tiers"][name] = {
            "partitions_touched": sorted(touched),
            "partitions_total": cfg.num_output_partitions,
            "new_rows": int(len(new_tier)),
            "seconds": round(time.time() - t0, 3),
        }
        prev_tier_new = new_tier
    return metrics
