"""Compression stage: Gorilla chunks per (key, chunk window).

Packs each series tier into fixed-width chunk windows (config
``TierSpec.chunk_buckets``) and encodes each window with the Gorilla
XOR / delta-of-delta codec (functions/gorilla.py) into one binary blob
with (n_points, t0, t1) metadata — the chunk-block layout the north rule
requires, stored as Parquet binary columns.

Chunking is a ``groupby(key, chunk_id).map_groups`` — the same
partitioning key as the rollup, so no extra shuffle beyond the group
gather; decode round-trip is provided for audits.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.gorilla import decode_chunk, encode_chunk_batched

__all__ = ["compress", "decompress_table", "add_chunk_id"]


def add_chunk_id(ds, bucket_seconds: int, chunk_buckets: int):
    """Append chunk_id = floor(epoch_s / (bucket_seconds*chunk_buckets))."""
    window = bucket_seconds * chunk_buckets

    def fn(batch: pa.Table) -> pa.Table:
        epoch = batch["bucket_start"].cast(pa.int64())
        unit = batch.schema.field("bucket_start").type.unit
        div = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
        # floor (not truncate-toward-zero) so pre-1970 timestamps land in
        # the chunk window below, matching bucket_column's floor semantics
        divisor = window * div
        adj = pc.if_else(pc.less(epoch, 0),
                         pc.subtract(epoch, divisor - 1), epoch)
        cid = pc.divide(adj, divisor)
        return batch.append_column("chunk_id", pc.cast(cid, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def compress(rollup_ds, key_col: str, bucket_seconds: int, chunk_buckets: int,
             value_col: str = "sum_value", num_shards: int | None = None):
    """rollup tier → one Gorilla chunk row per (key, window).

    The exchange groups by ``hash(key, chunk_id) % num_shards``
    (stages/shard.py), not one Ray group per chunk: the Gorilla encode
    is per-chunk Python either way, but at 10^6 keys the per-group
    dispatch would dominate.  Inside a shard, one sort + boundary scan
    encodes every chunk."""
    from .shard import compute_shards, sharded_map_groups

    with_id = add_chunk_id(rollup_ds, bucket_seconds, chunk_buckets)
    if num_shards is None:
        # the per-chunk Gorilla encode runs INSIDE the reduce tasks, so
        # the shard count IS the encode parallelism — size for compute
        with_id = with_id.materialize()
        num_shards = compute_shards(with_id.count())

    def encode_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "chunk_id", "bucket_start"], kind="stable")
        keys = g[key_col].to_numpy()
        cids = g["chunk_id"].to_numpy()
        ts_all = g["bucket_start"].astype("datetime64[s]").astype(
            "int64").to_numpy()
        vals_all = g[value_col].to_numpy(dtype=np.float64)
        change = np.nonzero(
            (keys[1:] != keys[:-1]) | (cids[1:] != cids[:-1])
        )[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(keys)]))
        rows = {k: [] for k in ("key", "chunk_id", "t0", "t1", "n_points",
                                "raw_bytes", "chunk_bytes", "chunk")}
        for s, e in zip(starts, ends):
            ts, vals = ts_all[s:e], vals_all[s:e]
            blob = encode_chunk_batched(ts, vals)
            rows["key"].append(keys[s])
            rows["chunk_id"].append(int(cids[s]))
            rows["t0"].append(int(ts[0]))
            rows["t1"].append(int(ts[-1]))
            rows["n_points"].append(len(ts))
            rows["raw_bytes"].append(len(ts) * 16)
            rows["chunk_bytes"].append(len(blob))
            rows["chunk"].append(blob)
        return pd.DataFrame(rows)

    return sharded_map_groups(with_id, [key_col, "chunk_id"], encode_shard,
                              num_shards=num_shards)


def decompress_table(chunks: pd.DataFrame) -> pd.DataFrame:
    """Inverse of ``compress`` for audits: chunk rows → (key, ts, value)."""
    keys, ts_all, vals_all = [], [], []
    for _, row in chunks.iterrows():
        ts, vals = decode_chunk(row["chunk"])
        keys.extend([row["key"]] * len(ts))
        ts_all.append(ts)
        vals_all.append(vals)
    return pd.DataFrame(
        {
            "key": keys,
            "bucket_start": np.concatenate(ts_all).view("datetime64[s]")
            if ts_all
            else np.array([], dtype="datetime64[s]"),
            "value": np.concatenate(vals_all) if vals_all else [],
        }
    )
