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

from ..functions.gorilla import decode_chunk, encode_chunk

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
             value_col: str = "sum_value"):
    """rollup tier → one Gorilla chunk row per (key, window)."""
    with_id = add_chunk_id(rollup_ds, bucket_seconds, chunk_buckets)

    def encode_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket_start")
        ts = g["bucket_start"].astype("datetime64[s]").astype("int64").to_numpy()
        vals = g[value_col].to_numpy(dtype=np.float64)
        blob = encode_chunk(ts, vals)
        return pd.DataFrame(
            {
                "key": [g[key_col].iloc[0]],
                "chunk_id": [int(g["chunk_id"].iloc[0])],
                "t0": [int(ts[0])],
                "t1": [int(ts[-1])],
                "n_points": [len(ts)],
                "raw_bytes": [len(ts) * 16],
                "chunk_bytes": [len(blob)],
                "chunk": [blob],
            }
        )

    return with_id.groupby([key_col, "chunk_id"]).map_groups(
        encode_group, batch_format="pandas"
    )


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
