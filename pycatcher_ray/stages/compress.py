"""Compression stage: Gorilla chunks per (key, chunk window).

Packs each series tier into fixed-width chunk windows (config
``TierSpec.chunk_buckets``) and encodes each window with the Gorilla
XOR / delta-of-delta codec (functions/gorilla.py) into one binary blob
with (n_points, t0, t1) metadata — the chunk-block layout the north rule
requires.  Two column layouts: variable ``binary`` (the default — no
padding, the compression-ratio-faithful form) and Arrow
``FixedSizeBinary`` via ``to_fixed_layout`` (fixed stride, row-index
addressable, zero-padded to the codec's worst case).

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

__all__ = ["compress", "decompress_table", "add_chunk_id",
           "fixed_chunk_width", "to_fixed_layout", "from_fixed_layout"]


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


# ----------------------------------------------- FixedSizeBinary layout


def fixed_chunk_width(chunk_buckets: int) -> int:
    """Worst-case Gorilla bytes for a chunk of ``chunk_buckets`` points.

    Per point the codec writes at most ~68 bits of timestamp (4-bit
    tag + raw 64) and ~78 bits of value (2-bit tag + 12 control + 64
    mantissa) ≈ 18.25 B; header + first point add < 64 B.  20 B/point
    + 64 rounds up to a safe fixed stride."""
    return 20 * int(chunk_buckets) + 64


def to_fixed_layout(chunks_ds, chunk_buckets: int):
    """Re-emit the ``chunk`` column as Arrow FixedSizeBinary(W) — the
    north-star chunk-block layout (fixed stride: a chunk's bytes are
    addressable by row index alone, the mmap-friendly layout
    fixed-size TSDB blocks use; trade-off is zero-padding up to the
    codec's worst case).  The Gorilla header carries n_points, so the
    decoder reads exactly the encoded bits and trailing pad bytes are
    inert — no length prefix needed (pinned by the padded-decode
    test).  Raises if any blob exceeds the worst-case width (that
    would mean the codec wrote more than its documented bound)."""
    width = fixed_chunk_width(chunk_buckets)

    def fn(b: pa.Table) -> pa.Table:
        return _to_fixed_batch(b, width)

    return chunks_ds.map_batches(fn, batch_format="pyarrow")


def _to_fixed_batch(b: pa.Table, width: int) -> pa.Table:
    col = b["chunk"].combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0)
    if col.type != pa.binary():  # e.g. large_binary: 64-bit offsets
        col = col.cast(pa.binary())
    fixed = _scatter_fixed(col, width)
    i = b.column_names.index("chunk")
    return b.set_column(i, "chunk", fixed)


def _scatter_fixed(col: "pa.Array", width: int):
    # one bulk copy via the Arrow buffers — no per-row Python
    # bytes objects: scatter each blob's bytes into a preallocated
    # zero-filled (n, width) buffer with a single fancy-index.
    # offset-aware: a sliced array (Ray block split / limit, or a
    # combine_chunks that shortcuts to a zero-copy view) has
    # col.offset > 0 and offsets that don't start at byte 0
    offs = np.frombuffer(
        col.buffers()[1], dtype=np.int32,
        count=len(col) + 1, offset=4 * col.offset).astype(np.int64)
    byte0, byte1 = int(offs[0]), int(offs[-1])
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8,
                         count=byte1)[byte0:] if byte1 > byte0 else \
        np.empty(0, dtype=np.uint8)
    lens = np.diff(offs)
    if len(lens) and int(lens.max()) > width:
        raise ValueError(
            f"chunk of {int(lens.max())} B exceeds fixed width {width}")
    out = np.zeros((len(col), width), dtype=np.uint8)
    # destination flat positions: row_base + within-blob offset
    idx = (np.repeat(np.arange(len(col), dtype=np.int64) * width,
                     lens)
           + (np.arange(byte1 - byte0, dtype=np.int64)
              - np.repeat(offs[:-1] - byte0, lens)))
    out.ravel()[idx] = data
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(width), len(col),
        [None, pa.py_buffer(out.tobytes())])


def from_fixed_layout(chunks_ds):
    """Inverse cast back to variable binary.  The pad bytes could stay
    (the decoder ignores them); stripping to the recorded
    ``chunk_bytes`` restores the exact variable-layout bytes."""

    def fn(b: pa.Table) -> pa.Table:
        nb = b["chunk_bytes"].to_numpy(zero_copy_only=False)
        blobs = [x[: int(n)] for x, n in zip(b["chunk"].to_pylist(), nb)]
        i = b.column_names.index("chunk")
        return b.set_column(i, "chunk", pa.array(blobs, type=pa.binary()))

    return chunks_ds.map_batches(fn, batch_format="pyarrow")
