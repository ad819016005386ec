"""Resumable partitioned output: per-partition manifests + lineage.

"Resumable from per-partition checkpoints with lineage + row-count
metrics" (BASELINE.json north_rule): each pipeline stage writes its
output under ``<out>/<stage>/part=<id>/`` with an atomically-renamed
``manifest.json`` recording rows, value checksum, input lineage, and
wall time.  A rerun consults the manifests and skips finished
partitions; a partially-written partition (no manifest) is overwritten.

Partition id is a stable hash of the series key (``hash_partition``), so
the same key always lands in the same partition across runs and tiers —
one partitioning decision reused everywhere (SURVEY.md §4).
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

__all__ = ["hash_partition_column", "CheckpointedWriter", "stable_key_hash"]


# the partition-id contract lives with the exchange (stages/shard.py);
# re-exported here because every consumer of the checkpoint layout
# (incremental maintenance, tests) historically imports it from state
from ..stages.shard import _append_part_column, stable_key_hash  # noqa: E402


def hash_partition_column(ds, key_col: str, num_partitions: int):
    """Append ``part`` = stable hash(key) % P (each distinct key hashed
    once per batch via dictionary encoding)."""

    def fn(batch: pa.Table) -> pa.Table:
        return _append_part_column(batch, key_col, num_partitions)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class CheckpointedWriter:
    """Write a Dataset partitioned by ``part`` with per-partition
    manifests; reruns skip complete partitions."""

    def __init__(self, out_dir: str, stage: str):
        self.stage_dir = os.path.join(out_dir, stage)
        os.makedirs(self.stage_dir, exist_ok=True)

    def _part_dir(self, part: int) -> str:
        return os.path.join(self.stage_dir, f"part={part}")

    def done_partitions(self) -> set[int]:
        done = set()
        if not os.path.isdir(self.stage_dir):
            return done
        for name in os.listdir(self.stage_dir):
            if name.startswith("part="):
                manifest = os.path.join(self.stage_dir, name, "manifest.json")
                if os.path.exists(manifest):
                    done.add(int(name.split("=", 1)[1]))
        return done

    def write(self, ds, key_col: str, num_partitions: int,
              lineage: dict | None = None) -> dict:
        """Write all partitions not yet done.  Returns the run summary.

        The dataset is hash-partitioned by key, grouped by ``part`` and
        each group written by the distributed tasks themselves
        (temp file + atomic manifest rename) — the driver only collects
        the per-partition summaries.
        """
        done = self.done_partitions()
        if len(done) >= num_partitions:
            # everything checkpointed: nothing to execute
            return {
                "stage_dir": self.stage_dir,
                "partitions_written": [],
                "partitions_skipped": sorted(done),
                "rows_written": 0,
            }
        stage_dir = self.stage_dir
        lineage = lineage or {}

        def write_group(g: pa.Table) -> pa.Table:
            # Arrow-native write task: no pandas conversion of the
            # partition on either side of the file boundary
            if "part" not in g.column_names or not len(g):
                return pa.table({"part": pa.array([], pa.int64()),
                                 "rows": pa.array([], pa.int64())})
            part = int(g["part"][0].as_py())
            pdir = os.path.join(stage_dir, f"part={part}")
            os.makedirs(pdir, exist_ok=True)
            data = g.drop_columns(["part"])
            tmp = os.path.join(pdir, ".data.parquet.tmp")
            pq.write_table(data, tmp)
            os.replace(tmp, os.path.join(pdir, "data.parquet"))
            checksum = 0.0
            for name, col in zip(data.column_names, data.columns):
                if pa.types.is_integer(col.type) or pa.types.is_floating(
                        col.type):
                    s = pc.sum(col).as_py()
                    checksum += float(s) if s is not None else 0.0
            manifest = {
                "partition": part,
                "rows": int(len(data)),
                "value_checksum": checksum,
                "lineage": lineage,
                "written_at": time.time(),
            }
            mtmp = os.path.join(pdir, ".manifest.json.tmp")
            with open(mtmp, "w") as f:
                json.dump(manifest, f)
            os.replace(mtmp, os.path.join(pdir, "manifest.json"))
            return pa.table({"part": pa.array([part], pa.int64()),
                             "rows": pa.array([len(data)], pa.int64())})

        # fused raw exchange: the shuffle's map task computes the stable
        # partition id itself (no separate partition-column pass, no
        # resume-filter pass), each reduce task receives exactly one
        # partition and writes it
        from ..stages.shard import exchange_by_key_partition

        summary = exchange_by_key_partition(
            ds, key_col, num_partitions, write_group,
            skip_parts=done, batch_format="pyarrow",
        ).to_pandas()
        written = (
            [int(p) for p in summary["part"].tolist()] if len(summary) else []
        )
        # a hash partition that received no rows is still COMPLETE for
        # this input — manifest it (rows=0) so a rerun short-circuits
        # instead of recomputing the pipeline to rediscover emptiness
        for part in set(range(num_partitions)) - set(written) - done:
            pdir = self._part_dir(part)
            os.makedirs(pdir, exist_ok=True)
            mtmp = os.path.join(pdir, ".manifest.json.tmp")
            with open(mtmp, "w") as f:
                json.dump({"partition": part, "rows": 0,
                           "value_checksum": 0.0, "lineage": lineage,
                           "written_at": time.time()}, f)
            os.replace(mtmp, os.path.join(pdir, "manifest.json"))
        return {
            "stage_dir": self.stage_dir,
            "partitions_written": written,
            "partitions_skipped": sorted(done),
            "rows_written": int(summary["rows"].sum()) if len(summary) else 0,
        }

    def read(self):
        """Read the stage back as a Ray Dataset (all partitions)."""
        import ray.data as rd

        paths = []
        for name in sorted(os.listdir(self.stage_dir)):
            p = os.path.join(self.stage_dir, name, "data.parquet")
            if name.startswith("part=") and os.path.exists(p):
                paths.append(p)
        # partitioning=None: the part=N directory layout is checkpoint
        # metadata, not a hive partition column of the logical table
        return rd.read_parquet(paths, partitioning=None)
