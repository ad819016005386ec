"""Hash-shard grouping utility — the bucketed ``map_groups`` pattern.

Ray's ``groupby(key)`` pays Python dispatch per output group
(~0.3 ms/group measured, NOTES_ROUND1.md): at 10^6 keys that is minutes
of pure overhead before any work runs.  The fix used by the rollup's
final combine (rollup.py ``_final_aggregate``) and the LSH pair stage
(dedup.py) is generalized here: group by ``shard = hash(key) % B``
instead, so the all-to-all exchange has only B groups, and each shard
processes ALL of its keys with one vectorized pandas/pyarrow groupby.
B bounds skew too — shards are hash-uniform in the number of DISTINCT
keys regardless of per-key row counts (a hot key still lands in one
shard, so pair B with per-batch partial aggregation when row-skew is
the concern).

Hashing is deterministic across processes (crc32, not PYTHONHASHSEED'd
``hash``), and string columns are hashed once per DISTINCT value via
dictionary encoding — no per-row Python.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["shard_values", "with_shard", "sharded_map_groups",
           "sharded_aggregate", "right_size_shards",
           "exchange_by_int_column", "exchange_by_key_partition",
           "stable_key_hash"]

_MASK = np.int64((1 << 62) - 1)
_MIX = np.int64(1_000_003)
_NULL_SENTINEL = np.int64(-0x51_70_CA_7C)  # hash slot for null keys


def _col_hashes(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Per-row int64 hash of one column (vectorized; strings hashed once
    per distinct value through dictionary indices).  Null keys hash to a
    fixed sentinel so nullable key columns shard instead of crashing
    (int/timestamp nulls would otherwise surface as NaN float64 and
    break the integer ops)."""
    if pa.types.is_null(col.type) or len(col) == 0:
        # null-typed columns come from empty pandas blocks (object cols
        # with no rows); every (non-)value hashes to the sentinel
        return np.full(len(col), _NULL_SENTINEL & _MASK, dtype=np.int64)
    if pa.types.is_integer(col.type) or pa.types.is_timestamp(col.type):
        v64 = pc.fill_null(col.cast(pa.int64()), int(_NULL_SENTINEL))
        v = v64.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        return (v * np.int64(2_654_435_761)) & _MASK
    dict_arr = pc.dictionary_encode(col)
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
    dictionary = dict_arr.dictionary.to_pylist()
    dict_hashes = np.array(
        [zlib.crc32(str(k).encode()) for k in dictionary] or [0],
        dtype=np.int64,
    )
    idx = dict_arr.indices.to_numpy(zero_copy_only=False)
    if idx.dtype.kind == "f":  # null indices -> NaN; route to sentinel
        null_mask = np.isnan(idx)
        idx = np.where(null_mask, 0, idx).astype(np.int64)
        out = dict_hashes[idx]
        out[null_mask] = _NULL_SENTINEL & _MASK
        return out
    return dict_hashes[idx.astype(np.int64, copy=False)]


def stable_key_hash(keys: np.ndarray, num_partitions: int) -> np.ndarray:
    """Deterministic (process-independent) FNV-1a partition id per string
    key — the checkpoint/resume partitioning contract (state/checkpoint).
    Python loop over DISTINCT keys only; callers map rows through
    dictionary indices."""
    out = np.zeros(len(keys), dtype=np.int64)
    for i, k in enumerate(keys):
        h = 2166136261
        for ch in str(k).encode():
            h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
        out[i] = h % num_partitions
    return out


def _append_part_column(tbl: pa.Table, key_col: str,
                        num_partitions: int) -> pa.Table:
    """Append ``part`` = stable_key_hash(key) % P, hashing each DISTINCT
    key once via dictionary encoding."""
    dict_arr = pc.dictionary_encode(tbl[key_col])
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
    ids = stable_key_hash(
        dict_arr.dictionary.to_numpy(zero_copy_only=False), num_partitions
    )
    idx = dict_arr.indices.to_numpy(zero_copy_only=False)
    parts = ids[idx.astype(np.int64, copy=False)]
    return tbl.append_column("part", pa.array(parts, type=pa.int64()))


def right_size_shards(n_rows: int, lo: int = 4, hi: int = 256,
                      rows_per_shard: int = 50_000) -> int:
    """Derive a shard count from the data size: small inputs must not pay
    per-task overhead for hundreds of near-empty shards, large inputs
    must not cap parallelism/shard size at a fixed 64 (the per-key work
    in a shard is O(rows), so ~rows_per_shard rows per shard keeps tasks
    in the sweet spot measured in NOTES_ROUND1/2)."""
    return max(lo, min(hi, n_rows // rows_per_shard + lo))


def compute_shards(n_rows: int, hi: int = 4096) -> int:
    """Shard count for exchanges whose OUTPUT feeds heavy per-group
    compute (detector scan, chunk encode): the reduce-task count IS the
    output block count, which bounds downstream ``map_batches`` task
    parallelism — sizing only by pack-side rows capped the detector scan
    at 10 tasks on a 347k-row tier (the measured flat-4→16 flags stage).
    Floor = 2× the cluster's CPUs (work-conserving at N and at 4N
    nodes); ``right_size_shards``'s row term still raises it for
    genuinely large inputs; ``hi`` bounds the map-side object fan-out
    (blocks × shards refs)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 0)) or 32
    except Exception:
        cpus = 32
    return min(hi, max(right_size_shards(n_rows), 2 * cpus))


def shard_values(batch: pa.Table, key_cols: list[str] | tuple[str, ...],
                 num_shards: int) -> np.ndarray:
    """int64 shard id per row from the combined key-column hash."""
    h = np.zeros(len(batch), dtype=np.int64)
    for c in key_cols:
        h = (h * _MIX + _col_hashes(batch[c])) & _MASK
    return h % num_shards


def _materialized(ds):
    """Materialize once; a MaterializedDataset passes through untouched
    (calling .materialize() again re-wraps the plan and pays an extra
    barrier — the double-materialize flagged by verdict r3 item 2)."""
    from ray.data.dataset import MaterializedDataset

    if isinstance(ds, MaterializedDataset):
        return ds
    return ds.materialize()


def _resolve_shards(ds, num_shards: int | None):
    """num_shards=None → derive from the input's row count.  The input is
    materialized exactly once here (count() on a MaterializedDataset is
    metadata-only) and flows into ``_run_exchange`` as-is."""
    ds = _materialized(ds)
    if num_shards is not None:
        return ds, num_shards
    return ds, right_size_shards(ds.count())


def with_shard(ds, key_cols, num_shards: int | None = 64,
               col_name: str = "shard"):
    """Append a deterministic ``shard`` column to a Dataset."""
    cols = list(key_cols) if not isinstance(key_cols, str) else [key_cols]
    if num_shards is None:  # deriving the count needs a materialize
        ds, num_shards = _resolve_shards(ds, num_shards)

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            col_name, pa.array(shard_values(batch, cols, num_shards),
                               type=pa.int64())
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_MAX_EXCHANGE_BLOCKS = 128


def _shard_vector(tbl, cols, num_shards: int):
    """Final-shard id per row for every key-spec mode.  Returns
    ``(tbl, sv)`` — in fused-checkpoint mode the stable ``part`` column
    is appended here (carried through the shuffle), otherwise the table
    is untouched.  ``sv`` is None for blocks with no usable rows
    (empty, or zero-column padding from Ray's sort-groupby).  Pandas
    blocks (Ray keeps a block in whatever format the producing map
    emitted — a union of a lazy pandas-map stage with a materialized
    Arrow dataset hands both kinds to ``to_arrow_refs``) are coerced."""
    if not isinstance(tbl, pa.Table):
        import pandas as _pd

        if isinstance(tbl, _pd.DataFrame):
            tbl = pa.Table.from_pandas(tbl, preserve_index=False)
    part_key = None
    if isinstance(cols, dict):  # fused checkpoint mode: {"part_key": col}
        part_key = cols["part_key"]
        col_list = [part_key]
    else:
        col_list = [cols] if isinstance(cols, str) else list(cols)
    if tbl.num_rows == 0 or any(c not in tbl.column_names for c in col_list):
        return tbl, None
    if part_key is not None:
        # compute the stable partition id here and carry it as a column —
        # no separate partition-column map pass
        tbl = _append_part_column(tbl, part_key, num_shards)
        sv = tbl["part"].to_numpy(zero_copy_only=False).astype(np.int64)
    elif isinstance(cols, str):
        # value mode: the bucket id IS this int column (already 0..B-1;
        # the modulo guards against out-of-range ids silently dropping)
        sv = tbl[cols].to_numpy(zero_copy_only=False).astype(
            np.int64) % num_shards
    else:
        sv = shard_values(tbl, cols, num_shards)
    return tbl, sv


def _slice_by(tbl: pa.Table, ids: np.ndarray, n_slots: int):
    """Sort ``tbl`` by the per-row slot id and slice into ``n_slots``
    contiguous pieces (empty pieces keep the schema)."""
    order = np.argsort(ids, kind="stable")
    st = tbl.take(pa.array(order))
    svs = ids[order]
    bounds = np.searchsorted(svs, np.arange(n_slots + 1))
    pieces = tuple(
        st.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        for i in range(n_slots)
    )
    return pieces


def _split_block(tbl: pa.Table, cols, num_shards: int):
    """One map-side shuffle task: sort the block by shard id and slice
    into ``num_shards`` contiguous pieces (empty pieces keep the schema).
    The final extra return is the per-shard row-count vector, so the
    driver can skip reduce tasks for globally-empty shards."""
    tbl, sv = _shard_vector(tbl, cols, num_shards)
    if sv is None:
        empty = tbl.slice(0, 0)
        return (*([empty] * num_shards),
                np.zeros(num_shards, dtype=np.int64))
    pieces = _slice_by(tbl, sv, num_shards)
    counts = np.bincount(sv, minlength=num_shards).astype(np.int64)
    return (*pieces, counts)


def _split_block_super(tbl: pa.Table, cols, num_shards: int, s1: int):
    """Two-level map task: compute the FINAL shard id per row, carry it
    as a ``__fs__`` column, and slice by SUPER-shard ``fs % s1`` into
    ``s1`` pieces.  Last return is the per-FINAL-shard count vector (the
    skip logic is identical to the single-level path)."""
    tbl, sv = _shard_vector(tbl, cols, num_shards)
    if sv is None:
        empty = tbl.slice(0, 0).append_column(
            "__fs__", pa.array([], type=pa.int64()))
        return (*([empty] * s1), np.zeros(num_shards, dtype=np.int64))
    tbl = tbl.append_column("__fs__", pa.array(sv, type=pa.int64()))
    pieces = _slice_by(tbl, sv % s1, s1)
    counts = np.bincount(sv, minlength=num_shards).astype(np.int64)
    return (*pieces, counts)


def _merge_super(j: int, s1: int, num_shards: int, *parts):
    """Two-level intermediate task for super-shard ``j``: concat its
    pieces from every map task and re-slice by the carried ``__fs__``
    into this super-shard's final shards (j, j+s1, j+2·s1, ...).  Rows
    here are ~1/s1 of the exchange, so the task is memory-bounded
    regardless of total input size."""
    tables = [p for p in parts if p.num_rows]
    n_out = len(range(j, num_shards, s1))
    if not tables:
        empty = parts[0].drop_columns(["__fs__"]).slice(0, 0)
        return empty if n_out == 1 else tuple([empty] * n_out)
    try:
        tbl = pa.concat_tables(tables, promote_options="default")
    except pa.ArrowTypeError:
        tbl = pa.concat_tables(tables, promote_options="permissive")
    fs = tbl["__fs__"].to_numpy(zero_copy_only=False).astype(np.int64)
    tbl = tbl.drop_columns(["__fs__"])
    pieces = _slice_by(tbl, fs // s1, n_out)
    return pieces[0] if n_out == 1 else pieces


def _reduce_shard(shard_fn, batch_format: str, *parts):
    """One reduce-side task: concat this shard's pieces from every map
    task and run the vectorized shard function (never on an empty shard
    — the driver drops those, matching groupby semantics where absent
    groups are simply never seen)."""
    import pandas as _pd

    tables = [p for p in parts if p.num_rows]
    try:
        tbl = pa.concat_tables(tables, promote_options="default")
    except pa.ArrowTypeError:
        # e.g. timestamp[s] vs timestamp[us] blocks from pandas outputs
        tbl = pa.concat_tables(tables, promote_options="permissive")
    if batch_format == "pandas":
        # drop pandas schema metadata: blocks built from pandas frames
        # with tensor-extension columns (e.g. fixed-size vector columns)
        # embed a dtype string plain to_pandas cannot reconstruct; the
        # registered extension types convert fine without it
        out = shard_fn(tbl.replace_schema_metadata(None).to_pandas())
        if not isinstance(out, _pd.DataFrame):
            out = _pd.DataFrame(out)
        return pa.Table.from_pandas(out, preserve_index=False)
    return shard_fn(tbl)


def anchor_schema(ds, schema: "pa.Schema"):
    """Schema-stable empty results: union a typed 0-row block so a
    query whose final map stage sees no rows (Ray skips empty blocks,
    so the stage's output would carry NO schema) still reports its
    columns.  Zero flags / zero pairs is a legitimate outcome; without
    the anchor an all-quiet corpus reports rows=0 with NO columns
    while the SQL oracle keeps its column list (found by the
    randomized differential fuzz and the minimal-corpus sweep)."""
    import ray

    return ray.data.from_arrow(schema.empty_table()).union(ds)


def sharded_map_groups(ds, key_cols, shard_fn, num_shards: int | None = 64,
                       batch_format: str = "pandas"):
    """Hash-sharded grouped execution: every row of a key lands in shard
    ``hash(key) % B``; ``shard_fn`` receives one SHARD (all rows of every
    key hashing to it) and must do its own vectorized per-key grouping
    inside — the per-key work runs as pandas/pyarrow kernels, not Ray
    group dispatch.  ``num_shards=None`` right-sizes the shard count from
    the data (``right_size_shards``).

    The exchange is a direct two-stage hash shuffle over raw Ray tasks
    (split each block into B hash pieces; one reduce task per shard
    concats its pieces and runs ``shard_fn``), returned as a Dataset via
    ``from_arrow_refs`` — everything stays in the object store.  Ray
    Data's sort-based ``groupby(shard)`` carrier measured ~1-1.5 s of
    fixed per-exchange cost (boundary sampling + two barriers) even on
    kB-scale shards, which dominated multi-exchange operators; the raw
    exchange is ~0.1 s.  The shuffle volume is identical (all-to-all on
    the same key).  Above ``_MAX_EXCHANGE_BLOCKS`` map blocks the
    exchange goes hierarchical (blocks → S₁ super-shards → final
    shards) so the piece matrix stays O(blocks×S₁ + S₁×shards) and
    block sizes stay bounded at any input scale — no repartition of
    the input, no multi-GB super-blocks.
    """
    cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    ds, num_shards = _resolve_shards(ds, num_shards)
    return _run_exchange(ds, cols, shard_fn, num_shards, batch_format)


def exchange_by_int_column(ds, col: str, num_buckets: int, fn,
                           batch_format: str = "pyarrow"):
    """Same two-stage raw exchange, but the bucket id IS an existing
    integer column (values in [0, num_buckets)) — e.g. a precomputed
    checkpoint ``part`` id — so every reduce task receives exactly one
    partition's rows (column included)."""
    return _run_exchange(ds, col, fn, num_buckets, batch_format)


def exchange_by_key_partition(ds, key_col: str, num_partitions: int, fn,
                              skip_parts: frozenset | set = frozenset(),
                              batch_format: str = "pyarrow"):
    """Checkpoint-write exchange: the map-side split computes the stable
    FNV partition id per DISTINCT key (``stable_key_hash``), appends it
    as a ``part`` column and slices — fusing what was a separate
    partition-column ``map_batches`` pass (plus a resume-filter pass)
    into the shuffle's own map task.  ``skip_parts`` (already-done
    checkpoint partitions) drop at the reduce: their pieces are never
    concatenated or passed to ``fn``."""
    return _run_exchange(ds, {"part_key": key_col}, fn, num_partitions,
                         batch_format, skip_buckets=frozenset(skip_parts))


# per-process exchange telemetry (bench.py drains this into the bench
# JSON — verdict r3 item 2 asked for per-exchange seconds)
_EXCHANGE_STATS: list[dict] = []


def drain_exchange_stats() -> list[dict]:
    out = list(_EXCHANGE_STATS)
    _EXCHANGE_STATS.clear()
    return out


def _run_exchange(ds, key_spec, shard_fn, num_shards: int,
                  batch_format: str,
                  skip_buckets: frozenset = frozenset()):
    import time

    import ray
    import ray.data as rd

    t0 = time.perf_counter()
    ds = _materialized(ds)
    refs = ds.to_arrow_refs()
    if not refs:
        # blockless empty input (e.g. an upstream map_batches saw only
        # 0-row blocks): still derive the OUTPUT schema via the fold
        return _typed_empty_result(ds, key_spec, shard_fn, batch_format)

    reduce = ray.remote(_reduce_shard).options(num_cpus=1)

    if len(refs) <= _MAX_EXCHANGE_BLOCKS:
        # single-level: blocks × shards piece matrix
        split = ray.remote(_split_block).options(
            num_returns=num_shards + 1, num_cpus=1)
        pieces = [split.remote(r, key_spec, num_shards) for r in refs]
        # tiny count vectors only — table pieces stay in the object store
        counts = np.sum(ray.get([p[num_shards] for p in pieces]), axis=0)
        out_refs = [
            reduce.remote(shard_fn, batch_format,
                          *[pieces[i][s] for i in range(len(refs))])
            for s in range(num_shards)
            if counts[s] > 0 and s not in skip_buckets
        ]
        levels = 1
    else:
        # two-level (hierarchical) exchange: map blocks → S₁ super-shards
        # → final shards, so the piece matrix stays
        # O(blocks×S₁ + S₁×shards) and the input is never repartitioned
        # into multi-GB super-blocks (verdict r3 item 3; the old path
        # repartition(128)'d the whole input here — a scale ceiling).
        s1 = min(_MAX_EXCHANGE_BLOCKS, num_shards)
        split = ray.remote(_split_block_super).options(
            num_returns=s1 + 1, num_cpus=1)
        pieces = [split.remote(r, key_spec, num_shards, s1) for r in refs]
        counts = np.sum(ray.get([p[s1] for p in pieces]), axis=0)
        merge = ray.remote(_merge_super)
        out_refs = []
        for j in range(s1):
            shards_j = list(range(j, num_shards, s1))
            if not any(counts[s] > 0 and s not in skip_buckets
                       for s in shards_j):
                continue
            m = merge.options(num_cpus=1, num_returns=len(shards_j)).remote(
                j, s1, num_shards, *[pieces[i][j] for i in range(len(refs))])
            if len(shards_j) == 1:
                m = (m,)
            for idx, s in enumerate(shards_j):
                if counts[s] > 0 and s not in skip_buckets:
                    out_refs.append(
                        reduce.remote(shard_fn, batch_format, m[idx]))
        levels = 2
    _EXCHANGE_STATS.append({
        "seconds": round(time.perf_counter() - t0, 4),
        "blocks": len(refs), "shards": num_shards, "levels": levels,
        "rows": int(counts.sum()),
    })
    if not out_refs:
        return _typed_empty_result(ds, key_spec, shard_fn, batch_format)
    return rd.from_arrow_refs(out_refs)


def _typed_empty_result(ds, key_spec, shard_fn, batch_format: str):
    """All-empty exchange: derive the OUTPUT schema by running the fold
    on a 0-row input of the exchange's input schema, so an empty result
    keeps its columns (a schemaless `from_items([])` made every
    downstream to_pandas drop the column list — found by the
    minimal-corpus sweep).  Falls back to the schemaless empty when the
    fold cannot run on a 0-row frame."""
    import ray.data as rd

    try:
        sch = ds.schema(fetch_if_missing=True)
        arrow_sch = getattr(sch, "base_schema", None)
        if not isinstance(arrow_sch, pa.Schema):
            names = list(getattr(sch, "names", []) or [])
            if not names:
                return rd.from_items([])
            arrow_sch = pa.schema(
                [(n, pa.from_numpy_dtype(t) if not isinstance(t, pa.DataType)
                  else t)
                 for n, t in zip(names, sch.types)])
        empty_in = arrow_sch.empty_table()
        if isinstance(key_spec, dict):  # part_key variant adds the column
            empty_in = empty_in.append_column(
                "part", pa.array([], type=pa.int64()))
        # call the fold directly (_reduce_shard drops 0-row pieces
        # before concat, so it cannot carry the empty probe)
        if batch_format == "pandas":
            import pandas as _pd

            out = shard_fn(
                empty_in.replace_schema_metadata(None).to_pandas())
            if not isinstance(out, _pd.DataFrame):
                out = _pd.DataFrame(out)
            out = pa.Table.from_pandas(out, preserve_index=False)
        else:
            out = shard_fn(empty_in)
        if isinstance(out, pa.Table):
            return rd.from_arrow(out.slice(0, 0))
    except Exception:
        pass
    return rd.from_items([])


def sharded_aggregate(ds, key_cols, agg_map: dict,
                      num_shards: int | None = 64):
    """High-cardinality groupby-aggregate without Ray's per-group cost.

    ``groupby(keys).aggregate(...)`` dispatches Python per OUTPUT group
    (~0.3 ms each) — at 10^5+ groups (e.g. candidate PAIRS in the dedup
    paths) that dwarfs the actual combine.  Here the exchange groups by
    ``hash(keys) % B`` and each shard runs ONE vectorized pandas
    groupby-agg over all of its keys; a key always hashes to exactly one
    shard, so the result is exact.  ``agg_map``: {col: 'sum'|'min'|
    'max'|'count'|...} (pandas agg names)."""
    cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def agg_shard(shard):
        return shard.groupby(cols, as_index=False).agg(agg_map)

    return sharded_map_groups(ds, cols, agg_shard, num_shards=num_shards)
