"""Degenerate-corpus robustness gate: the queries that once lost their
schema, crashed, or diverged on a 1-4-row corpus (zero flags, zero
pairs, zero dups, fewer vectors than k) stay oracle-green.  The full
327-query replay lives in ``python scripts/minimal_corpus.py`` +
``check_oracles.py``; this suite pins the ~35 formerly-failing ones."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))
from check_oracles import canon, to_pandas  # noqa: E402
from minimal_corpus import write_minimal_corpus  # noqa: E402

# every query the round-5 minimal-corpus sweep caught (38 failures in
# 4 classes: schemaless empties, Ray to_pandas column drop, None-vs-NaN
# dtype, degenerate-k crashes) plus their fixed siblings
FORMERLY_FAILING = [
    "iqr_flags_enriched_1h", "latest_iqr_flag_1h", "ensemble_flags_1h",
    "mad_flags_1h", "zscore_flags_1h", "iqr_flags_1h",
    "dickey_fuller_by_source", "simhash_near_pairs", "ann_topk_ivf",
    "kmeans_update_step", "interflag_gap_stats", "bloom_vocab_probe",
    "customer_reactivation_census", "copurchase_triangles",
    "copurchase_components", "detection_lead_time",
    "sole_late_suppliers", "winnow_candidate_pairs",
    "copurchase_part_pairs", "flag_tier_consistency",
    "repeat_order_interval", "debounced_flags_1h",
    "anomaly_run_lengths", "ngram_jaccard", "ngram_containment",
    "cross_source_contamination", "small_qty_brand_revenue",
    "late_shipment_priority", "props_json_stats", "boilerplate_phrases",
    "user_path_trigrams", "theil_sen_trend", "alert_episodes",
    "source_correlation", "time_to_click_stats",
    "approx_p95_by_source", "triplet_margin_census",
    "ivf_recall_census", "residual_quantization_census",
    "identical_basket_orders", "tpch_q19_disjunctive_revenue",
    "tpch_q6_revenue", "promo_revenue_share", "anomaly_cooccurrence",
    "session_event_pairs",
    # NB tokens_* queries are excluded: their input is the synthesized
    # 6000-row tokens dataset (keyed by sf_dir basename), so they are
    # never degenerate here and their oracle strings bind a different
    # synth instance per tmp dir.
]

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def minimal_dir(tmp_path_factory):
    return write_minimal_corpus(str(tmp_path_factory.mktemp("minimal")))


@pytest.fixture(scope="module")
def minimal2_dir(tmp_path_factory):
    return write_minimal_corpus(str(tmp_path_factory.mktemp("minimal2")),
                                variant=2)


class TestMinimalCorpus:
    def test_single_row_variant(self, ray_session, minimal2_dir):
        """Variant 2: ONE vector / ONE event / ONE doc — no rival
        centroid, no 1-NN neighbor, no pair anywhere.  The queries the
        variant-2 sweep caught must match their oracles' empty / zero
        outputs."""
        from pycatcher_ray.queries import oracles, queries

        q, o = queries(), oracles()
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{minimal2_dir}/{t}.parquet')")
        failures = []
        for name in ("knn_indegree_census", "centroid_purity",
                     "centroid_margin_census", "theil_sen_trend",
                     "ann_topk", "embedding_neardup_exact"):
            try:
                got = canon(to_pandas(q[name](minimal2_dir)))
                want = canon(con.execute(o[name]).fetchdf())
                got = got.sort_values(
                    list(got.columns)).reset_index(drop=True)
                want = want.sort_values(
                    list(want.columns)).reset_index(drop=True)
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=False, rtol=0, atol=0)
            except Exception as e:
                failures.append((name, str(e)[:160]))
        assert not failures, failures

    def test_formerly_failing_queries_stay_green(self, ray_session,
                                                 minimal_dir):
        from pycatcher_ray.queries import oracles, queries

        q, o = queries(), oracles()
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{minimal_dir}/{t}.parquet')")
        failures = []
        for name in FORMERLY_FAILING:
            if name not in o:  # rows-only entries: run-only check
                try:
                    to_pandas(q[name](minimal_dir))
                except Exception as e:
                    failures.append((name, "err", str(e)[:160]))
                continue
            try:
                got = canon(to_pandas(q[name](minimal_dir)))
                want = canon(con.execute(o[name]).fetchdf())
            except Exception as e:
                failures.append((name, "err", str(e)[:160]))
                continue
            got = got.sort_values(list(got.columns)).reset_index(drop=True)
            want = want.sort_values(
                list(want.columns)).reset_index(drop=True)
            if sorted(got.columns) != sorted(want.columns):
                failures.append((name, "cols", sorted(got.columns),
                                 sorted(want.columns)))
                continue
            if len(got) != len(want):
                failures.append((name, "rows", len(got), len(want)))
                continue
            try:
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=False, rtol=0, atol=0)
            except AssertionError as e:
                failures.append((name, "values", str(e)[:160]))
        assert not failures, failures
