"""Differential fuzzing of the TOKENS-NATIVE oracle-paired queries:
the same query functions and the same oracle SQL the driver replays,
run over RANDOMIZED token tables built to contain the edge cases the
deterministic synth corpus cannot produce — empty docs, sub-window
docs, planted loops, duplicate prefixes across sources and days,
out-of-vocab ids at the 2^30 boundary, minutes straddling the
token_length_drift half boundary (1704153600)."""

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

# every tokens-native oracle-paired query (reads _tokens_paths)
FUZZ_TOKEN_QUERIES = [
    "tokens_rollup_1m",
    "tokens_rollup_1h",
    "tokens_rollup_1d",
    "tokens_length_stats",
    "tokens_audit",
    "padding_waste",
    "tokens_classic_decompose_1h",
    "tokens_hourly_profile",
    "tokens_dominant_acf_lag",
    "business_hours_share",
    "doc_token_concentration",
    "token_bigram_ttr",
    "token_head_buckets",
    "token_oov_rate",
    "token_prefix_novelty",
    "token_loop_score",
    "induction_hit_rate",
    "token_length_drift",
    "token_vocab_growth",
    "token_simpson_diversity",
    "token_content_dedup",
    "token_bucket_tv_drift",
    "token_window_dedup",
    "tokens_peak_24h",
    "first_token_topk",
    "token_max_run",
]

M0 = 28_401_120  # 2024-01-01T00:00 in epoch minutes
DRIFT_BOUNDARY_MIN = 1_704_153_600 // 60  # token_length_drift half point


def _synth_tokens(seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    rows: list[tuple[str, np.ndarray, str]] = []
    sources = ["alpha", "beta", "gamma"]
    # spread over 3 days so the drift boundary (start + 1 day) has
    # non-empty early AND late halves
    for i in range(300):
        src = sources[int(rng.integers(0, 3))]
        minute = M0 + int(rng.integers(0, 3 * 1440))
        ln = int(rng.integers(0, 200))
        toks = rng.integers(0, 50_000, ln).astype(np.int64)
        if ln and rng.random() < 0.3:  # out-of-vocab id (>= 2^30)
            toks[int(rng.integers(0, ln))] = int(
                rng.integers(2**30, 2**31 - 1))
        if ln and rng.random() < 0.1:  # id exactly AT the oov boundary
            toks[int(rng.integers(0, ln))] = 2**30
        rows.append((f"{src[0]}|{minute}|{i}", toks.astype(np.int32), src))
    # planted loop: one 8-window repeated 4x
    base = rng.integers(0, 1000, 8).astype(np.int32)
    rows.append((f"a|{M0}|9001", np.tile(base, 4), "alpha"))
    # duplicate 8-token prefix across source and day
    pre = rng.integers(0, 1000, 8).astype(np.int32)
    rows.append((f"a|{M0}|9002",
                 np.concatenate([pre, [1]]).astype(np.int32), "alpha"))
    rows.append((f"b|{M0 + 1440}|9003",
                 np.concatenate([pre, [2]]).astype(np.int32), "beta"))
    # empty doc, sub-prefix doc, exactly-8 doc
    rows.append((f"g|{M0 + 10}|9004", np.array([], np.int32), "gamma"))
    rows.append((f"g|{M0 + 11}|9005", np.array([3, 3, 3], np.int32),
                 "gamma"))
    rows.append((f"g|{M0 + 12}|9006", pre.copy(), "gamma"))
    # EXACT duplicate token sequences (token_content_dedup dup branch):
    # same-source full dup, cross-source identical sequence (must NOT
    # count — grouping is per source), and a second empty doc (empty
    # sequences in one source are dups of each other)
    rows.append((f"a|{M0 + 20}|9007", np.tile(base, 4), "alpha"))
    rows.append((f"b|{M0 + 21}|9008", np.tile(base, 4), "beta"))
    rows.append((f"g|{M0 + 22}|9009", np.array([], np.int32), "gamma"))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "tokens": pa.array([r[1].tolist() for r in rows],
                           type=pa.list_(pa.int32())),
        "n_tok": pa.array([len(r[1]) for r in rows], type=pa.int32()),
        "source": pa.array([r[2] for r in rows]),
    })


def _env_seeds(var: str, default: list[int]) -> list[int]:
    env = os.environ.get(var)
    if env:
        return [int(s) for s in env.split(",") if s.strip()]
    return default


@pytest.fixture(scope="module",
                params=_env_seeds("GRAFT_TOKENS_FUZZ_SEEDS", [11, 22]))
def tokens_fuzz_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"tokfuzz{request.param}")
    pq.write_table(_synth_tokens(request.param), str(d / "part-0.parquet"))
    return str(d)


class TestTokensFuzz:
    def test_oracle_parity_on_random_tokens(self, ray_session,
                                            tokens_fuzz_dir, monkeypatch):
        import pycatcher_ray.queries as q

        monkeypatch.setattr(q.tokens, "tokens_input_dir",
                            lambda sf: tokens_fuzz_dir)
        # the rollup memo keys on sf_dir — make it unique per fuzz dir
        sf_token = tokens_fuzz_dir
        con = duckdb.connect()
        qs, os_ = q.queries(), q.oracles()
        failures = []
        for name in FUZZ_TOKEN_QUERIES:
            try:
                got = canon(to_pandas(qs[name](sf_token)))
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
