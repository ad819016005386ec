"""Driver-gate replica inside pytest: run a representative subset of
queries() against their oracle_sql() with DuckDB at sf0.001 (the full
31-query sweep lives in scripts/check_oracles.py; this keeps the core
equality guarantees in `python -m pytest -x -q`)."""

import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "minhash_clusters",
    "simhash_near_pairs",
    "text_quality",
    "lang_id_pred",
    "doc_fingerprints",
    "stationarity_by_source",
    "tokens_chunks_1m",
    "approx_top_users_by_type",
    "ann_topk_ivf",
    "embedding_neardup_lsh",
    "rollup_1m",
    "mstl_recon_1h",
    "rollup_1h",
    "rollup_monthly",
    "iqr_flags_1h",
    "zscore_flags_1h",
    "mad_flags_1h",
    "latest_iqr_flag_1h",
    "dedup_exact",
    "doc_text_stats",
    "ann_topk",
    "embedding_neardup_exact",
    "lineitem_pricing_summary",
    "hopping_stats_2h",
    "tfidf_top_terms",
    "quality_filter",
    "ewma_hourly",
    "sliding_p95_24h",
    "cusum_hourly",
    "theil_sen_trend",
    "hampel_flags_1h",
    "returned_item_customers",
    "vocab_jaccard_sources",
    "token_length_drift",
    "user_path_trigrams",
    "cohort_retention_matrix",
    "token_prefix_novelty",
    "token_length_histogram",
    "context_packing",
    "holt_linear_hourly",
    "rate_of_change_1h",
    "gap_analysis",
    "alert_episodes",
    "ohlc_hourly",
    "acf_by_source",
    "seasonal_naive_error",
    "token_entropy_by_lang",
    "benford_first_digit",
    "fano_burstiness",
    "weekday_profile",
    "updown_transitions",
    "interarrival_stats",
    "source_correlation",
    "reference_correlation",
    "seasonality_strength",
    "winsorized_stats",
    "next_day_retention",
    "dau_wau_stickiness",
    "funnel_view_click",
    "time_to_click_stats",
    "gini_by_source",
    "percentile_rank_1h",
    "classic_decompose_1h",
    "kpss_level_stat",
    "seasonal_envelope",
    "rolling_zscore_flags_1h",
    "error_rate_hourly",
    "embedding_label_stats",
    "top_building_orders",
    "regional_supplier_revenue",
    "large_order_customers",
    "boilerplate_phrases",
    "stl_decomposition_1h",
    "approx_users_by_type",
    "late_shipment_priority",
    "inactive_customers",
    "props_json_stats",
    "daily_event_pivot",
    "lag_delta_1h",
    "doc_repetition",
    "hash_sample_docs",
    "per_source_doc_cap",
    "vocab_stats_by_source",
    "sax_daily_words",
    "ngram_containment",
    "mixture_sample_docs",
    "bigram_pmi",
    "ols_trend_by_source",
    "cusum_changepoint",
    "pettitt_changepoint",
    "pacf_lag2_by_source",
    "char_trigram_topk",
    "debounced_flags_1h",
    "affix_fingerprint_dups",
    "minute_spike_census",
    "vocab_gini_by_source",
    "spearman_trend",
    "runs_test_by_source",
    "anomaly_run_lengths",
    "tpch_q6_revenue",
    "promo_revenue_share",
    "mktsegment_revenue",
    "dominant_acf_lag",
    "word_length_by_lang",
    "doc_length_quartiles",
    "minhash_jaccard_sources",
    "word_rank_stats",
    "rag_chunk_census",
    "croston_intermittent",
    "binary_segmentation_cp",
    "priority_sample_per_source",
    "integrated_acf_time",
    "triplet_margin_census",
    "induction_hit_rate",
    "detector_kappa",
    "corpus_profile",
    "ams_f2_words",
    "lsh_band_census",
    "top_bigram_fraction",
    "ivf_recall_census",
    "residual_quantization_census",
    "tail_mean_above_p95",
    "exchange_shard_histogram",
    "checkpoint_partition_census",
    "fleet_share_hourly",
    "sax_motif_matches",
    "embedding_dim_drift",
    "peak_hours",
    "variance_ratio_by_day",
    "longest_flat_run",
    "zipf_head_coverage",
    "stopword_density",
    "cross_source_contamination",
    "tpch_q7_volume_shipping",
    "tpch_q19_disjunctive_revenue",
    "embedding_quantization_stats",
    "bollinger_breaks_1h",
    "mean_crossings",
    "day_over_day_growth",
    "word_repetition_ratio",
    "token_head_buckets",
    "token_oov_rate",
    "customer_order_distribution",
    "burst_window_5m",
    "user_type_diversity",
    "supplier_diversity_by_part",
    "top_supplier_revenue",
    "small_qty_brand_revenue",
    "idle_balance_by_nation",
    "token_bigram_ttr",
    "kmeans_assign_step",
    "centroid_margin_census",
    "cosine_pair_histogram",
    "pq_assign_step",
    "embedding_doclen_correlation",
    "padding_waste",
    "value_quantile_drift",
    "type_size_contingency",
    "label_centroid_separation",
    "seasonal_naive_mase",
    "gap_inventory_1h",
    "hourly_profile_bands",
    "token_loop_score",
    "embedding_norm_outliers",
    "user_overlap_between_types",
    "nation_market_share",
    "lead_lag_vs_reference",
    "token_vocab_growth",
    "winnow_fingerprints",
    "record_highs",
    "max_drawdown",
    "sole_late_suppliers",
    "shipping_mix_by_status",
    "token_simpson_diversity",
    "token_content_dedup",
    "embedding_dim_variance",
    "daily_peak_concentration",
    "rollup_7d",
    "session_bounce_rate",
    "winnow_candidate_pairs",
    "ks_distance_vs_fleet",
    "anomaly_cooccurrence",
    "bottomk_jaccard_sources",
    "token_bucket_tv_drift",
    "lttb_downsample",
    "dup_cluster_sizes",
    "rfm_segments",
    "holt_winters_additive",
    "centroid_confusion",
    "docs_length_audit",
    "training_shard_assignment",
    "embedding_dim_covariance",
    "length_bucket_mix",
    "classic_residual_flags_1h",
    "trend_crossing_eta",
    "token_window_dedup",
    "poisson_rate_flags_1h",
    "variance_changepoint",
    "sma_crossover_count",
    "first_token_topk",
    "token_max_run",
    "knn_indegree_census",
    "rescaled_range_stat",
    "successive_diff_stats",
    "kmeans_update_step",
    "session_duration_quartiles",
    "user_lifespan_histogram",
    "simhash_embedding_census",
    "daily_anomaly_burden",
    "discount_band_revenue",
    "qty_price_correlation",
    "dedup_rate_by_source",
    "fleet_vocab_coverage",
    "order_fill_latency",
    "charge_summary_by_status",
    "order_lines_audit",
    "brand_list_price_gap",
    "interflag_gap_stats",
    "longest_rising_run",
    "flag_hour_profile",
    "bow_dedup_by_source",
    "supplier_balance_revenue",
    "custbal_orders_correlation",
    "top_decile_value_share",
    "order_month_seasonality",
    "tokens_top_decile_share",
    "tokens_longest_rising_run",
    "day_volume_80pct_hour",
    "pca_power_iteration_step",
    "embedding_projection_histogram",
    "cms_user_counts",
    "exact_price_quantiles",
    "template_position_topk",
    "session_gap_sensitivity",
    "supplier_assortment_histogram",
    "goertzel_diurnal_power",
    "rolling_3h_active_users",
    "haar_energy_by_scale",
    "hourly_profile_rank_correlation",
    "hour_of_week_profile",
    "wow_change_1h",
    "new_vs_returning_daily",
    "minute_uniformity_tv",
    "ensemble_flags_1h",
    "user_value_outliers",
    "mann_kendall_trend",
    "event_transition_matrix",
    "good_turing_unseen",
    "seasonal_mann_kendall",
    "minhash_signatures_md5",
    "rollup_grouping_sets",
    "shipping_delay_histogram",
    "orders_backlog_daily",
    "session_event_pairs",
    "copurchase_part_pairs",
    "daily_peak_hour_mode",
    "tokens_rollup_1h",
    "tokens_rollup_1d",
    "tokens_classic_decompose_1h",
    "tokens_hourly_profile",
    "tokens_dominant_acf_lag",
    "funnel_three_step",
    "business_hours_share",
    "doc_token_concentration",
    "peak_concurrent_sessions",
    "embedding_dup_vectors",
    "daily_hhi",
    "repeat_order_interval",
    "brand_pareto",
    "centroid_purity",
    "tokens_peak_24h",
    "session_first_touch_purchases",
    "segment_order_value_cv",
    "lang_mix_tv_drift",
    "mom_growth",
    "flag_tier_consistency",
    "session_depth_histogram",
    "copurchase_triangles",
    "matrix_profile_1h",
    "copurchase_components",
    "trending_words",
    "token_vocab_turnover",
    "identical_basket_orders",
    "detection_lead_time",
    "flag_persistence",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            coerced = pd.to_numeric(df[c], errors="coerce")
            if len(df) and coerced.notna().all():
                df[c] = coerced.astype(float).round(6)
            else:
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


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


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, duck, ray_session, monkeypatch):
    # tokens-native oracles embed an absolute synthesized-input path
    # derived from this env var (default sf0.01 — the driver's gate sf)
    monkeypatch.setenv("GRAFT_ORACLE_SF_DIR", SF_DIR)
    from pycatcher_ray.queries import oracles, queries

    fn = queries()[name]
    sql = oracles()[name]
    got = fn(SF_DIR)
    if hasattr(got, "to_pandas"):
        obj, got = got, got.to_pandas()
        if not len(got.columns) and not isinstance(obj, pd.DataFrame):
            # Ray's to_pandas() on an empty dataset drops the columns even
            # when schema() knows them (same rebuild as the driver gate)
            schema = getattr(obj, "schema", None)
            schema = schema(fetch_if_missing=True) if callable(schema) else None
            if schema is not None and schema.names:
                got = pd.DataFrame({n: pd.Series([], dtype=object)
                                    for n in schema.names})
    got = _canon(got)
    want = _canon(duck.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=0)


class TestApproxQuantileAccuracy:
    def test_tdigest_within_rank_tolerance_of_exact(self, ray_session):
        """Rank-based accuracy: the sketch's q-quantile must lie within
        the exact [q-eps, q+eps] quantile window (value-space tolerances
        are meaningless on heavy tails of ~200-point groups, where one
        rank step can move the value by several units)."""
        import duckdb

        import numpy as np

        from pycatcher_ray.queries import _tdigest_quantiles_full

        got = _tdigest_quantiles_full("/root/testdata/sf0.001").to_pandas()
        # the query's own in-band booleans must agree (they feed the
        # hard tolerance-band oracle)
        assert bool(got["p50_in_rank_band"].all())
        assert bool(got["p95_in_rank_band"].all())
        raw = duckdb.connect().execute(
            "SELECT event_type AS source, value FROM "
            "read_parquet('/root/testdata/sf0.001/events.parquet')"
        ).fetchdf()
        eps = 0.02
        assert len(got) == raw["source"].nunique()
        for _, r in got.iterrows():
            v = raw[raw["source"] == r["source"]]["value"].to_numpy()
            for q, col in ((0.5, "approx_p50"), (0.95, "approx_p95")):
                lo = np.quantile(v, max(0.0, q - eps))
                hi = np.quantile(v, min(1.0, q + eps))
                assert lo - 1e-9 <= r[col] <= hi + 1e-9, (r["source"], q)


class TestCopurchaseTriangles:
    def test_planted_graph_counts(self, ray_session, tmp_path):
        """Crafted co-purchase graph: a K4 clique (4 triangles, every
        node in 3, all degrees tied at 3 so the (deg, partkey)
        orientation tie-break is exercised), a 2-edge path (no
        triangle), and a degree-10 hub whose spokes are unconnected
        except ONE closed pair (exactly one triangle through the hub —
        the skewed-degree case the orientation exists for)."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        import pycatcher_ray.queries as q

        orders = [
            (1, [1, 2, 3, 4]),            # K4
            (2, [5, 6]), (3, [6, 7]),     # path, no triangle
        ]
        orders += [(10 + s, [100, 100 + s]) for s in range(1, 11)]  # hub
        orders += [(30, [101, 102])]       # closes one spoke pair
        ok, pk = [], []
        for okey, parts in orders:
            for p in parts:
                ok.append(okey)
                pk.append(p)
        tbl = pa.table({
            "l_orderkey": pa.array(ok, pa.int64()),
            "l_partkey": pa.array(pk, pa.int64()),
        })
        pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))

        got = q.copurchase_triangles(str(tmp_path)).to_pandas()
        got = got.sort_values("part").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/lineitem.parquet')")
        want = con.execute(q.oracles()["copurchase_triangles"]).fetchdf()
        want = want.sort_values("part").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want[got.columns],
                                      check_dtype=False, rtol=0, atol=0)
        by = dict(zip(got["part"], got["n_triangles"]))
        assert by == {1: 3, 2: 3, 3: 3, 4: 3, 100: 1, 101: 1, 102: 1}


class TestIdenticalBasketOrders:
    def test_planted_baskets(self, ray_session, tmp_path):
        """Reordered lines ARE the same basket; a differing quantity is
        NOT; a triplicate single-line group counts 3 orders in 1 group
        — pinned against the DuckDB list-value oracle and hand counts."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        import pycatcher_ray.queries as q

        rows = [
            (1, 1, 5.0), (1, 2, 7.0),       # basket {(1,5),(2,7)}
            (2, 2, 7.0), (2, 1, 5.0),       # same basket, reordered
            (3, 1, 5.0), (3, 2, 8.0),       # qty differs -> distinct
            (4, 9, 3.0), (5, 9, 3.0), (6, 9, 3.0),  # triplicate size-1
            (7, 1, 5.0),                    # lone size-1
        ]
        tbl = pa.table({
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_quantity": pa.array([r[2] for r in rows], pa.float64()),
        })
        pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))

        got = q.identical_basket_orders(str(tmp_path)).to_pandas()
        got = got.sort_values("basket_size").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/lineitem.parquet')")
        want = con.execute(
            q.oracles()["identical_basket_orders"]).fetchdf()
        want = want.sort_values("basket_size").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want[got.columns],
                                      check_dtype=False, rtol=0, atol=0)
        by = got.set_index("basket_size")
        assert by.loc[1, "n_groups"] == 1 and by.loc[1, "n_dup_orders"] == 3
        assert by.loc[2, "n_groups"] == 1 and by.loc[2, "n_dup_orders"] == 2


def test_sax_motif_matches_planted(ray_session, tmp_path):
    """The sf corpora produce zero cross-source SAX-word matches (4^24
    word space), so the match branch is pinned here: two sources with
    IDENTICAL hourly shapes must collide on every day's word, a third
    differing source must not."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import pycatcher_ray.queries as q

    ts, et, val = [], [], []
    t0 = np.datetime64("2024-01-01T00:30")
    shape = [float(v) for v in range(1, 25)]
    for day in range(2):
        for h in range(24):
            t = t0 + np.timedelta64(day * 24 + h, "h")
            for src, v in (("s1", shape[h]), ("s2", shape[h]),
                           ("s3", shape[23 - h])):
                ts.append(t)
                et.append(src)
                val.append(v)
    n = len(ts)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(pd.Series(np.array(ts)).astype("datetime64[us]")),
        "user_id": pa.array(np.ones(n, dtype=np.int64)),
        "event_type": pa.array(et),
        "value": pa.array(np.asarray(val, dtype=np.float64)),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    got = q.sax_motif_matches(str(tmp_path))
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    got = _canon(got)
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    want = _canon(con.execute(q.oracles()["sax_motif_matches"]).fetchdf())
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  rtol=0, atol=0)
    # planted structure: s1+s2 collide on both days; s3 never matches
    assert len(got) == 2
    assert set(got["sources"]) == {"s1,s2"}
    assert (got["n_sources"] == 2).all()
