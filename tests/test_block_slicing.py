"""Partitioning-invariance gate: re-run the list-column-heavy queries
under a TINY Ray block size so every batch a kernel sees is a SLICED
Arrow block with a non-zero offset, and compare against the same DuckDB
oracles.  This is the systematic defense for the bug class session 6
hit by accident (``ListArray.values`` ignores a sliced batch's list
offset — consumers must use ``flatten()``; embedding_norm_outliers
flaked only when a different num_cpus changed the slicing): results
must be IDENTICAL no matter how the input is blocked, because at
cluster scale the engine never controls block boundaries."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from check_oracles import canon, to_pandas  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# every op that walks an Arrow list column (tokens / embeddings) plus a
# text op with offset-indexed batch consumption — the slicing-sensitive
# surface
SLICING_SENSITIVE = [
    "tokens_length_stats",
    "token_head_buckets",
    "token_oov_rate",
    "token_loop_score",
    "token_bigram_ttr",
    "token_max_run",
    "token_prefix_novelty",
    "token_vocab_growth",
    "token_vocab_turnover",
    "first_token_topk",
    "embedding_norm_outliers",
    "kmeans_assign_step",
    "embedding_dim_covariance",
    "embedding_dup_vectors",
    "context_packing",
    "induction_hit_rate",
    "triplet_margin_census",
    "ivf_recall_census",
    "residual_quantization_census",
    "token_window_dedup",
]


@pytest.fixture(scope="module")
def tiny_blocks(ray_session):
    """Shrink the streaming executor's target block size to 16 KiB so
    read outputs split into many small blocks and map stages hand
    kernels SLICED zero-copy views (non-zero list offsets)."""
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    before = ctx.target_max_block_size
    ctx.target_max_block_size = 16 * 1024
    yield
    ctx.target_max_block_size = before


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", SLICING_SENSITIVE)
def test_sliced_blocks_match_oracle(name, tiny_blocks, duck, monkeypatch):
    monkeypatch.setenv("GRAFT_ORACLE_SF_DIR", SF_DIR)
    import pycatcher_ray.queries as q

    # the per-process dataset memos were built under the DEFAULT block
    # size — drop them so this module's runs actually re-read under the
    # tiny target
    q._DS_MEMO.clear()
    try:
        got = canon(to_pandas(q.queries()[name](SF_DIR)))
        want = canon(duck.execute(q.oracles()[name]).fetchdf())
        assert list(got.columns) == list(want.columns)
        assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)}"
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      rtol=0, atol=0)
    finally:
        q._DS_MEMO.clear()  # don't leak tiny-block datasets to others
