"""Deterministic generator for the engine's native input table.

Produces Parquet with the exact ``BASELINE.json.input_hint`` schema:

    doc_id: string       "{source}|{epoch_minute}|{seq}"  (encodes event time)
    tokens: list<int32>  len == n_tok, deterministic per doc_id
    n_tok:  int32
    source: string       Zipf-skewed row counts (exercises salting/skew)

Recipe follows FIXTURES.md §A (seed 42, numpy default_rng): event minutes
uniform over a window with planted whole-bucket gaps (gap-fill tests) and
planted token-count spikes x10 over known whole hours (detector tests).
Everything is a pure function of (seed, n_rows, n_sources, ...) so tests,
the correctness oracle, and the bench harness can regenerate bit-identical
inputs anywhere.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["TOKENS_SCHEMA", "generate_tokens_table", "write_tokens_dataset",
           "SPIKE_FACTOR"]

TOKENS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)

SPIKE_FACTOR = 10
EPOCH_START_MINUTE = 28_401_120  # 2024-01-01 00:00 UTC in epoch minutes


def _token_fill(doc_hashes: np.ndarray, n_tok: np.ndarray) -> pa.LargeListArray:
    """tokens[i] = deterministic f(doc hash, position), int32 range."""
    total = int(n_tok.sum())
    offsets = np.zeros(n_tok.size + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    pos = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], n_tok)
    seed_per_tok = np.repeat(doc_hashes, n_tok)
    mix = np.uint64(0x9E3779B97F4A7C15)
    mixed = seed_per_tok.astype(np.uint64) + pos.astype(np.uint64) * mix
    values = (mixed % np.uint64(2**31 - 1)).astype(np.int32)
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                    pa.array(values, type=pa.int32()))


def _component_hash(src_idx: np.ndarray, minute: np.ndarray, seq: np.ndarray
                    ) -> np.ndarray:
    h = (
        src_idx.astype(np.int64) * np.int64(1_000_003)
        ^ minute.astype(np.int64) * np.int64(0x5DEECE66D)
        ^ seq.astype(np.int64) * np.int64(2_654_435_761)
    )
    return h & np.int64(0x7FFFFFFFFFFFFFFF)


def generate_tokens_table(
    n_rows: int,
    n_sources: int = 20,
    minutes_span: int = 2880,       # 2 days of minutes by default
    start_minute: int = EPOCH_START_MINUTE,
    seed: int = 42,
    spike_hours: tuple[int, ...] = (10, 30),        # hour offsets with x10 spikes
    gap_minutes: tuple[int, ...] = tuple(range(1000, 1030)),  # planted gaps
) -> pa.Table:
    rng = np.random.default_rng(seed)
    # Zipf-skewed source choice (a=1.5): source 0 is the hot key.
    weights = 1.0 / np.power(np.arange(1, n_sources + 1), 1.5)
    weights /= weights.sum()
    src_idx = rng.choice(n_sources, size=n_rows, p=weights)
    minute_off = rng.integers(0, minutes_span, size=n_rows)
    # carve out planted gaps: push any row in a gap minute to the next
    # non-gap minute (whole (source, minute) buckets go missing)
    gap_set = np.asarray(sorted(gap_minutes), dtype=np.int64)
    if gap_set.size:
        in_gap = np.isin(minute_off, gap_set)
        minute_off = np.where(in_gap, (gap_set[-1] + 1) % minutes_span, minute_off)
    minute = start_minute + minute_off
    seq = rng.integers(0, 1 << 30, size=n_rows)
    n_tok = np.clip(
        np.round(rng.lognormal(mean=4.0, sigma=0.6, size=n_rows)), 1, 2048
    ).astype(np.int32)
    # planted anomalies: x10 token counts for every row in the spike
    # hours (whole-hour spikes survive the 1h/1d rollup tiers)
    spike_set = np.asarray(sorted(spike_hours), dtype=np.int64)
    if spike_set.size:
        spiked = np.isin(minute_off // 60, spike_set)
        n_tok = np.where(spiked, np.minimum(n_tok * SPIKE_FACTOR, 20480), n_tok
                         ).astype(np.int32)

    sources = np.array([f"src{i:02d}" for i in range(n_sources)])
    source_col = sources[src_idx]
    doc_id = np.char.add(
        np.char.add(
            np.char.add(source_col, "|"), minute.astype(np.int64).astype(str)
        ),
        np.char.add("|", seq.astype(np.int64).astype(str)),
    )
    hashes = _component_hash(src_idx, minute, seq)
    tokens = _token_fill(hashes, n_tok.astype(np.int64))
    return pa.Table.from_arrays(
        [
            pa.array(doc_id, type=pa.string()),
            tokens,
            pa.array(n_tok, type=pa.int32()),
            pa.array(source_col, type=pa.string()),
        ],
        schema=TOKENS_SCHEMA,
    )


def write_tokens_dataset(
    out_dir: str,
    n_rows: int,
    rows_per_file: int = 100_000,
    **kwargs,
) -> list[str]:
    """Write the synthetic table as one Parquet file per ~rows_per_file
    (sharded deterministically: shard i uses seed+i over its row range)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    n_files = max(1, (n_rows + rows_per_file - 1) // rows_per_file)
    base_seed = kwargs.pop("seed", 42)
    remaining = n_rows
    for i in range(n_files):
        rows = min(rows_per_file, remaining)
        remaining -= rows
        tbl = generate_tokens_table(rows, seed=base_seed + i, **kwargs)
        path = os.path.join(out_dir, f"tokens-{i:05d}.parquet")
        pq.write_table(tbl, path)
        paths.append(path)
    return paths
