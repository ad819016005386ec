"""Ingest/validate stage: zero-copy Arrow batch transforms.

Replaces the reference's ``check_and_convert_date`` (catch.py:85-121) for
the engine's native input: event time is encoded in ``doc_id``
("{source}|{epoch_minute}|{seq}", FIXTURES.md §A) and derived with
pyarrow compute kernels — no Python row loop, no pandas conversion.

Also implements the per-row token invariant required by
``BASELINE.json.input_hint``: a deterministic per-row checksum over the
``tokens`` list column, computed segment-wise with numpy (flatten +
reduceat), so any pipeline that claims to pass tokens through unchanged
can be audited cheaply (compare checksum sums per partition, or
re-compute after the pipeline and anti-join mismatches on doc_id).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["derive_ts", "token_checksum_column", "validate_batch",
           "ingest", "read_parquet_fused"]

_CHECKSUM_MIX = np.uint64(0x9E3779B97F4A7C15)


def derive_ts(batch: pa.Table) -> pa.Table:
    """Append ``ts`` (timestamp[s]) and ``epoch_minute`` (int64) parsed
    from ``doc_id``.  Vectorized: split on '|', take element 1, cast."""
    parts = pc.split_pattern(batch["doc_id"], "|")
    minute = pc.list_element(parts, 1).cast(pa.int64())
    seconds = pc.multiply(minute, pa.scalar(60, pa.int64()))
    ts = seconds.cast(pa.timestamp("s"))
    return batch.append_column("epoch_minute", minute).append_column("ts", ts)


_SCRATCH: dict[str, np.ndarray] = {}

# tokens processed per inner chunk.  Small on purpose: this VM class
# makes first-touch page faults of large fresh allocations pathologically
# expensive (and they serialize across workers), so the kernel streams
# through a fixed ~2 MB working set that stays resident after the first
# batch instead of sizing scratch to the whole batch (~200 MB cold per
# worker — measured at seconds of wall time per process).
_CS_CHUNK = 262_144


def _scratch(name: str, size: int, dtype) -> np.ndarray:
    """Grow-only per-process scratch buffer (reused across batches)."""
    buf = _SCRATCH.get(name)
    if buf is None or buf.size < size or buf.dtype != np.dtype(dtype):
        buf = np.empty(int(size * 1.25) + 16, dtype=dtype)
        _SCRATCH[name] = buf
    return buf[:size]


def _tokens_checksum(tokens: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic uint64 checksum per row of a list<int32> column.

    checksum = [sum_i (tok_i+1)·(pos_i+1)] · MIX   (mod 2^64),
    position-sensitive so reorderings and substitutions are caught.

    Computed WITHOUT per-element position arrays via the identity
      Σ (t_i+1)(pos_i+1) = Σ (t_i+1)(g_i+1) − start_row · Σ (t_i+1)
    (g = global flat index, start_row = row's start offset): two
    ``np.add.reduceat`` passes, streamed in row-aligned chunks of
    ``_CS_CHUNK`` tokens over reused scratch buffers — no ``np.repeat``
    temporaries, a constant-size working set.
    """
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    arr = tokens
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    starts = offsets[:-1] - offsets[0]
    flat32 = arr.flatten().to_numpy(zero_copy_only=False)
    n_rows = len(arr)
    lengths = np.diff(offsets)
    out = np.zeros(n_rows, dtype=np.uint64)
    n = flat32.size
    if n == 0:
        return out
    nonempty_idx = np.nonzero(lengths > 0)[0]
    red_starts = starts[nonempty_idx]
    a_sums = np.zeros(red_starts.size, dtype=np.uint64)
    b_sums = np.zeros(red_starts.size, dtype=np.uint64)
    # fixed 0..CHUNK-1 ramp, filled once per process
    ramp = _SCRATCH.get("cs_ramp")
    if ramp is None or ramp.size < _CS_CHUNK:
        ramp = np.arange(_CS_CHUNK, dtype=np.uint64)
        _SCRATCH["cs_ramp"] = ramp
    row = 0  # index into red_starts of the first row at/after the chunk
    for a in range(0, n, _CS_CHUNK):
        b = min(a + _CS_CHUNK, n)
        # rows whose START lies in [a, b); the last such row may extend
        # past b — its tokens are still read (in-bounds of flat32), and
        # `row` advances past it so nothing is double-counted
        hi = int(np.searchsorted(red_starts, b, side="left"))
        if hi == row:
            continue
        seg_starts = red_starts[row:hi]
        lo_tok = int(seg_starts[0])
        hi_tok = int(starts[nonempty_idx[hi - 1]]
                     + lengths[nonempty_idx[hi - 1]])
        m = hi_tok - lo_tok
        t = _scratch("cs_tmp", m, np.uint64)
        np.add(flat32[lo_tok:hi_tok], 1, out=t, casting="unsafe")
        local = seg_starts - lo_tok
        b_sums[row:hi] = np.add.reduceat(t, local)
        if m <= ramp.size:
            g = _scratch("cs_gid", m, np.uint64)
            np.add(ramp[:m], np.uint64(lo_tok + 1), out=g)
        else:  # a single row longer than the chunk size
            g = np.arange(lo_tok + 1, hi_tok + 1, dtype=np.uint64)
        np.multiply(t, g, out=t)
        a_sums[row:hi] = np.add.reduceat(t, local)
        row = hi
    res = (a_sums - red_starts.astype(np.uint64) * b_sums) * _CHECKSUM_MIX
    out[nonempty_idx] = res
    return out


def token_checksum_column(batch: pa.Table) -> pa.Table:
    """Append ``tok_checksum`` (uint64) over the tokens column."""
    checks = _tokens_checksum(batch["tokens"])
    return batch.append_column("tok_checksum", pa.array(checks, type=pa.uint64()))


def validate_batch(batch: pa.Table) -> pa.Table:
    """Schema + invariant validation: n_tok == len(tokens), doc_id non-null.

    Raises ValueError with batch-level counts on violation (fail fast —
    a corrupt shard should kill the job, not silently drop rows).
    """
    lengths = pc.list_value_length(batch["tokens"]).cast(pa.int32())
    mismatch = pc.sum(
        pc.cast(pc.not_equal(lengths, batch["n_tok"]), pa.int64())
    ).as_py()
    if mismatch:
        raise ValueError(f"{mismatch} rows with n_tok != len(tokens)")
    nulls = batch["doc_id"].null_count
    if nulls:
        raise ValueError(f"{nulls} null doc_id rows")
    return batch


def read_parquet_fused(paths, **kwargs):
    """``read_parquet`` shaped so downstream ``map_batches`` FUSE with
    the read into one operator: ``override_num_blocks`` is pinned to
    max(files, 2×CPUs), which (a) prevents the planner's
    ``SplitBlocks`` stage — the fusion blocker — and (b) keeps ≥2×CPUs
    read tasks even for few-file inputs (a single big file is split by
    row ranges).  Without fusion every read block (tokens column
    included — ~90 % of the bytes) transits the object store between
    the read and the first map: ~20 GB of traffic at the 48M-row
    scaling fixture, measured as the 100×-scale stall of the rollup
    stage (round 4)."""
    import ray
    import ray.data as rd

    try:
        cpus = int(ray.cluster_resources().get("CPU", 0)) or 32
    except Exception:
        cpus = 32
    n_paths = len(paths) if not isinstance(paths, str) else 1
    kwargs.setdefault("override_num_blocks", max(n_paths, 2 * cpus))
    return rd.read_parquet(paths, **kwargs)


def ingest(ds, *, checksum: bool = True, validate: bool = True,
           batch_size: int | None = None):
    """read → validate → derive ts (+ checksum), all zero-copy Arrow.

    ``batch_size=None`` (default) lets the map fuse with the upstream
    read (an explicit batch_size forces a rebatch operator boundary —
    the tokens column then crosses the object store).  The checksum
    kernel streams fixed 256k-token chunks internally, so whole-block
    batches don't grow its working set."""

    def _fn(batch: pa.Table) -> pa.Table:
        if validate:
            batch = validate_batch(batch)
        batch = derive_ts(batch)
        if checksum:
            batch = token_checksum_column(batch)
        return batch

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)
