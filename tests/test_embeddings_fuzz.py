"""Differential fuzzing of the EMBEDDING oracle-paired queries over
randomized embedding tables: negative coordinates, exact argmin ties
(duplicate vectors), labels with a single member, coordinates at the
floor-quantization boundary (exact multiples of 1e-6), and constant
dimensions.  Engine vs DuckDB value-exact, same query functions and
oracle SQL the driver replays."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from check_oracles import canon, to_pandas  # noqa: E402

FUZZ_EMB_QUERIES = [
    "kmeans_assign_step",
    "centroid_margin_census",
    "cosine_pair_histogram",
    "pq_assign_step",
    "embedding_label_stats",
    "embedding_quantization_stats",
    "embedding_norm_outliers",
    "label_centroid_separation",
    "embedding_dim_variance",
    "centroid_confusion",
    "embedding_dim_covariance",
    "embedding_dup_vectors",
    "centroid_purity",
    "knn_indegree_census",
    "kmeans_update_step",
    "simhash_embedding_census",
    "triplet_margin_census",
    "ivf_recall_census",
    "residual_quantization_census",
    "embedding_dim_drift",
]

DIMS = 16


def _synth_embeddings(seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    vecs, labels = [], []
    n = 200
    for i in range(n):
        v = rng.normal(0, 1, DIMS).astype(np.float32)
        if rng.random() < 0.1:
            v *= 10.0  # norm outliers for the 4x-median flag
        if rng.random() < 0.1:
            # exact multiples of 1e-6: the floor-quantization boundary
            v = (np.round(v * 1e6) / 1e6).astype(np.float32)
        vecs.append(v)
        labels.append(int(rng.integers(0, 5)))
    # duplicate vectors -> exact squared-distance ties in kmeans argmin
    vecs.append(vecs[0].copy())
    labels.append(labels[0])
    vecs.append(vecs[0].copy())
    labels.append(4)
    # a label with a single member (label 7)
    vecs.append(rng.normal(0, 1, DIMS).astype(np.float32))
    labels.append(7)
    # a constant (all equal coords) and an all-zero vector
    vecs.append(np.full(DIMS, 0.5, np.float32))
    labels.append(0)
    vecs.append(np.zeros(DIMS, np.float32))
    labels.append(1)
    return pa.table({
        "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": pa.array(np.array(labels, dtype=np.int32)),
    })


def _env_seeds(var: str, default: list[int]) -> list[int]:
    env = os.environ.get(var)
    if env:
        return [int(s) for s in env.split(",") if s.strip()]
    return default


@pytest.fixture(scope="module",
                params=_env_seeds("GRAFT_EMB32_FUZZ_SEEDS", [7, 13]))
def emb_fuzz_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"embfuzz{request.param}")
    pq.write_table(_synth_embeddings(request.param),
                   str(d / "embeddings.parquet"))
    return str(d)


class TestEmbeddingsFuzz:
    def test_oracle_parity_on_random_embeddings(self, ray_session,
                                                emb_fuzz_dir):
        import pycatcher_ray.queries as q

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{emb_fuzz_dir}/embeddings.parquet')")
        qs, os_ = q.queries(), q.oracles()
        failures = []
        for name in FUZZ_EMB_QUERIES:
            try:
                got = canon(to_pandas(qs[name](emb_fuzz_dir)))
                want = canon(con.execute(os_[name]).fetchdf())
                if list(got.columns) != list(want.columns):
                    failures.append((name, "columns", list(got.columns),
                                     list(want.columns)))
                    continue
                if len(got) != len(want):
                    failures.append((name, "rows", len(got), len(want)))
                    continue
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=False, rtol=0, atol=0)
            except AssertionError as e:
                failures.append((name, "values", str(e)[:300]))
            except Exception as e:  # noqa: BLE001
                failures.append((name, type(e).__name__, str(e)[:300]))
        assert not failures, failures
