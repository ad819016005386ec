"""Differential fuzzing of the oracle-paired queries: the SAME query
functions and the SAME oracle SQL strings the driver replays, run over
RANDOMIZED events tables built to contain the edge cases the fixed sf
tables may miss — a single-event source, duplicate timestamps, long
gaps, negative values, ties at quantile boundaries."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from check_oracles import canon, to_pandas  # noqa: E402

# events-only queries cheap enough to fuzz (each is oracle-paired)
FUZZ_QUERIES = [
    "rollup_1m",
    "rollup_monthly",
    "iqr_flags_1h",
    "zscore_flags_1h",
    "mad_flags_1h",
    "session_windows",
    "sliding_avg_3h",
    "latest_iqr_flag_1h",
    "distinct_users_by_type",
    "stratified_sample_events",
    "p95_hourly_by_source",
    "top_users_by_type",
    "monthwise_box_stats",
    "gapfill_locf_1h",
    "duplicate_buckets",
    "chunks_downsample_1h",
    "moving_average_flags_1d",
    "range_join_recent_flags",
    "gap_analysis",
    "ohlc_hourly",
    "acf_by_source",
    "seasonal_naive_error",
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
    "gini_by_source",
    "percentile_rank_1h",
    "classic_decompose_1h",
    "kpss_level_stat",
    "seasonal_envelope",
    "hampel_flags_1h",
    "user_path_trigrams",
    "session_event_pairs",
    "funnel_three_step",
    "cohort_retention_matrix",
    "error_rate_hourly",
    "rolling_zscore_flags_1h",
    "sax_daily_words",
    "ols_trend_by_source",
    "cusum_changepoint",
    "pettitt_changepoint",
    "spearman_trend",
    "runs_test_by_source",
    "value_quantile_drift",
    "pacf_lag2_by_source",
    "debounced_flags_1h",
    "daily_peak_hour_mode",
    "minute_spike_census",
    "anomaly_run_lengths",
    "poisson_rate_flags_1h",
    "variance_changepoint",
    "sma_crossover_count",
    "rescaled_range_stat",
    "successive_diff_stats",
    "session_duration_quartiles",
    "user_lifespan_histogram",
    "daily_anomaly_burden",
    "interflag_gap_stats",
    "longest_rising_run",
    "flag_hour_profile",
    "top_decile_value_share",
    "day_volume_80pct_hour",
    "cms_user_counts",
    "session_gap_sensitivity",
    "goertzel_diurnal_power",
    "rolling_3h_active_users",
    "haar_energy_by_scale",
    "hourly_profile_rank_correlation",
    "dominant_acf_lag",
    "peak_hours",
    "variance_ratio_by_day",
    "longest_flat_run",
    "bollinger_breaks_1h",
    "mean_crossings",
    "day_over_day_growth",
    "burst_window_5m",
    "user_type_diversity",
    "seasonal_naive_mase",
    "gap_inventory_1h",
    "hourly_profile_bands",
    "user_overlap_between_types",
    "lead_lag_vs_reference",
    "record_highs",
    "max_drawdown",
    "daily_peak_concentration",
    "rollup_7d",
    "session_bounce_rate",
    "ks_distance_vs_fleet",
    "anomaly_cooccurrence",
    "lttb_downsample",
    "rfm_segments",
    "holt_winters_additive",
    "classic_residual_flags_1h",
    "trend_crossing_eta",
    "hour_of_week_profile",
    "wow_change_1h",
    "new_vs_returning_daily",
    "minute_uniformity_tv",
    "ensemble_flags_1h",
    "user_value_outliers",
    "mann_kendall_trend",
    "event_transition_matrix",
    "seasonal_mann_kendall",
    "rollup_grouping_sets",
    "peak_concurrent_sessions",
    "daily_hhi",
    "session_first_touch_purchases",
    "mom_growth",
    "matrix_profile_1h",
    "detection_lead_time",
    "flag_persistence",
    "croston_intermittent",
    "binary_segmentation_cp",
    "integrated_acf_time",
    "detector_kappa",
    "tail_mean_above_p95",
    "exchange_shard_histogram",
    "checkpoint_partition_census",
    "fleet_share_hourly",
    "sax_motif_matches",
]


def _synth_events(seed: int, n: int = 4000) -> pa.Table:
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-03-01T00:00:00", "s")
    srcs, tss, vals, uids = [], [], [], []

    # seed >= 300: DYADIC value regime — every value is k/16 (exactly
    # representable in binary AND exact at 4 decimals), so every
    # cross-engine SUM (rollup sums, corr/variance moment accumulators
    # sxy/sxx/syy, ANOVA sums of squares) is bit-exact in BOTH engines
    # regardless of accumulation order.  In this regime oracle parity is
    # provable, not probabilistic: any mismatch is a formula or final-
    # expression-op-order bug, never float noise.  (The realistic-decimal
    # seeds below keep covering the round()-envelope behavior.)
    dyadic = seed >= 300

    def draw_vals(size, mu, sigma):
        if dyadic:
            return rng.integers(-1024, 1025, size) / 16.0
        return np.round(rng.normal(mu, sigma, size), 3)  # negatives too

    # normal sources with bursts and gaps over ~40 days (spans 2 months)
    for s, frac in (("alpha", 0.45), ("beta", 0.3), ("gamma", 0.2)):
        m = int(n * frac)
        t = np.sort(rng.integers(0, 40 * 86400, m))
        # carve a multi-day gap
        t = t[(t < 12 * 86400) | (t > 15 * 86400)]
        srcs += [s] * t.size
        tss.append(t)
        vals.append(draw_vals(t.size, 50, 20))
        uids.append(rng.integers(1, 80, t.size))
    # a source with exactly ONE event
    srcs += ["solo"]
    tss.append(np.array([86400]))
    vals.append(np.array([123.4375 if dyadic else 123.456]))
    uids.append(np.array([999]))
    # a source whose events all share ONE timestamp (duplicate buckets)
    k = 25
    srcs += ["tied"] * k
    tss.append(np.full(k, 7 * 86400 + 1800))
    vals.append(draw_vals(k, 0, 1))
    uids.append(rng.integers(1, 5, k))
    # a stuck-sensor source: one event per hour for 30 CONTIGUOUS hours
    # with a CONSTANT value — exercises flat-run detection (runs >= 2),
    # the constant-series guards (sigma2 <= 0), and zero-variance ratios
    srcs += ["frozen"] * 30
    tss.append(3 * 86400 + np.arange(30) * 3600 + 900)
    vals.append(np.full(30, 7.25))
    uids.append(np.full(30, 5))

    ts = base + np.concatenate(tss).astype("timedelta64[s]")
    v = np.concatenate(vals)
    u = np.concatenate(uids)
    order = np.argsort(rng.random(ts.size))  # shuffle row order
    return pa.table(
        {
            "event_id": pa.array(np.arange(ts.size, dtype=np.int64)[order]),
            "ts": pa.array(ts[order]).cast(pa.timestamp("us")),
            "user_id": pa.array(u[order].astype(np.int64)),
            "event_type": pa.array(np.array(srcs, dtype=object)[order]),
            "value": pa.array(v[order]),
        }
    )


def _fuzz_seeds() -> list[int]:
    """Default 3 seeds (two realistic-decimal + handled in params);
    GRAFT_FUZZ_SEEDS="7,42,307" widens a one-off deep-fuzz session
    (seeds >= 300 select the dyadic bit-exact regime)."""
    env = os.environ.get("GRAFT_FUZZ_SEEDS")
    if env:
        return [int(s) for s in env.split(",") if s.strip()]
    return [101, 202, 303]


@pytest.fixture(scope="module", params=_fuzz_seeds())
def fuzz_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"fuzz{request.param}")
    pq.write_table(_synth_events(request.param), str(d / "events.parquet"))
    return str(d)


class TestDifferentialRandomized:
    def test_oracle_parity_on_random_events(self, ray_session, fuzz_dir):
        from pycatcher_ray.queries import oracles, queries

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{fuzz_dir}/events.parquet')"
        )
        qs, os_ = queries(), oracles()
        failures = []
        for name in FUZZ_QUERIES:
            got = canon(to_pandas(qs[name](fuzz_dir)))
            want = canon(con.execute(os_[name]).fetchdf())
            if list(got.columns) != list(want.columns):
                failures.append((name, "columns", list(got.columns),
                                 list(want.columns)))
                continue
            if len(got) != len(want):
                failures.append((name, "rows", len(got), len(want)))
                continue
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              rtol=0, atol=0)
            except AssertionError as e:
                failures.append((name, "values", str(e)[:200], ""))
        assert not failures, failures


def _synth_docs(seed: int, n: int = 160) -> pa.Table:
    """Random ASCII corpus with edge cases: empty text, single word,
    punctuation-only, EXACT duplicates, planted near-duplicates."""
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i}" for i in range(200)])
    texts = []
    for i in range(n):
        k = int(rng.integers(5, 60))
        texts.append(" ".join(rng.choice(vocab, k)))
    texts[0] = ""
    texts[1] = "solitary"
    texts[2] = "... !!! ??? ,,,"
    texts[3] = texts[10]          # exact duplicate
    texts[4] = texts[10]          # triplicate
    base = " ".join(rng.choice(vocab, 40))
    texts[5] = base
    texts[6] = base + " tail"     # near duplicate
    langs = rng.choice(["en", "es", "fr"], n)
    srcs = rng.choice(["web", "book"], n)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(srcs),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )


DOC_FUZZ_QUERIES = ["dedup_exact", "doc_text_stats", "lang_distribution",
                    "ngram_jaccard", "boilerplate_phrases",
                    "hash_sample_docs", "per_source_doc_cap",
                    "vocab_stats_by_source", "ngram_containment",
                    "mixture_sample_docs", "bigram_pmi",
                    "word_length_by_lang", "doc_length_quartiles",
                    "vocab_jaccard_sources", "zipf_head_coverage",
                    "stopword_density", "cross_source_contamination",
                    "word_repetition_ratio", "winnow_fingerprints",
                    "winnow_candidate_pairs", "bottomk_jaccard_sources",
                    "dup_cluster_sizes", "docs_length_audit",
                    "training_shard_assignment", "length_bucket_mix",
                    "good_turing_unseen", "minhash_signatures_md5",
                    "lang_mix_tv_drift", "char_trigram_topk",
                    "affix_fingerprint_dups", "vocab_gini_by_source",
                    "dedup_rate_by_source", "fleet_vocab_coverage",
                    "bow_dedup_by_source", "trending_words",
                    "minhash_jaccard_sources", "word_rank_stats",
                    "rag_chunk_census", "priority_sample_per_source",
                    "corpus_profile", "ams_f2_words", "lsh_band_census",
                    "top_bigram_fraction"]


def _env_seeds(var: str, default: list[int]) -> list[int]:
    env = os.environ.get(var)
    if env:
        return [int(s) for s in env.split(",") if s.strip()]
    return default


@pytest.fixture(scope="module",
                params=_env_seeds("GRAFT_DOC_FUZZ_SEEDS", [7, 8]))
def doc_fuzz_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"docfuzz{request.param}")
    pq.write_table(_synth_docs(request.param), str(d / "documents.parquet"))
    return str(d)


class TestDifferentialDocs:
    def test_doc_oracle_parity_on_random_corpus(self, ray_session,
                                                doc_fuzz_dir):
        from pycatcher_ray.queries import oracles, queries

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{doc_fuzz_dir}/documents.parquet')"
        )
        qs, os_ = queries(), oracles()
        failures = []
        for name in DOC_FUZZ_QUERIES:
            got = canon(to_pandas(qs[name](doc_fuzz_dir)))
            want = canon(con.execute(os_[name]).fetchdf())
            if list(got.columns) != list(want.columns) or len(got) != len(want):
                failures.append((name, list(got.columns), len(got),
                                 list(want.columns), len(want)))
                continue
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              rtol=0, atol=0)
            except AssertionError as e:
                failures.append((name, "values", str(e)[:200]))
        assert not failures, failures


def _synth_embeddings(seed: int, n: int = 300, dim: int = 16) -> pa.Table:
    """Random embeddings with edge cases: exact duplicate vectors (cos
    ties at 1.0), scaled copies (cos ties below 1.0), near-parallel
    pairs — exercises the top-k tiebreak (cos desc, vec_id asc) across
    batch boundaries."""
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, dim))
    mat[5] = mat[0]             # duplicate of the query vector
    mat[6] = mat[0] * 3.0       # scaled copy: same cosine
    mat[7] = -mat[0]            # antipodal
    mat[20] = mat[21]           # duplicate pair elsewhere
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                  type=pa.list_(pa.float64())),
        }
    )


@pytest.fixture(scope="module",
                params=_env_seeds("GRAFT_EMB_FUZZ_SEEDS", [11, 12]))
def emb_fuzz_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"embfuzz{request.param}")
    pq.write_table(_synth_embeddings(request.param),
                   str(d / "embeddings.parquet"))
    return str(d)


class TestDifferentialEmbeddings:
    def test_ann_and_neardup_parity_with_ties(self, ray_session,
                                              emb_fuzz_dir):
        from pycatcher_ray.queries import oracles, queries

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{emb_fuzz_dir}/embeddings.parquet')"
        )
        qs, os_ = queries(), oracles()
        failures = []
        for name in ("ann_topk", "embedding_neardup_exact",
                     "pca_power_iteration_step",
                     "embedding_projection_histogram"):
            got = canon(to_pandas(qs[name](emb_fuzz_dir)))
            want = canon(con.execute(os_[name]).fetchdf())
            if len(got) != len(want):
                failures.append((name, "rows", len(got), len(want)))
                continue
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              rtol=0, atol=0)
            except AssertionError as e:
                failures.append((name, "values", str(e)[:200]))
        assert not failures, failures


# ---------------------------------------------------------- relational

def _synth_tpch(seed: int) -> dict:
    """TPC-H-subset tables with the edge cases the fixed generators may
    miss: zero-order customers, single-line orders, same-day reorders,
    negative/zero balances, an order with exactly one late supplier of
    several, discount/quantity boundary values, shared parts dense
    enough for the copurchase graph queries."""
    rng = np.random.default_rng(seed)
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    region = pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(regions)})
    n_nat = 25
    nation = pa.table({
        "n_nationkey": pa.array(np.arange(n_nat, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(n_nat)]),
        "n_regionkey": pa.array((np.arange(n_nat) % 5).astype(np.int32))})

    n_cust = 120
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
            "MACHINERY"]
    bal = np.round(rng.normal(3000, 4000, n_cust), 2)
    bal[0] = 0.0          # zero balance
    bal[1] = -999.99      # negative balance (Q22 idle-balance path)
    customer = pa.table({
        "c_custkey": pa.array(np.arange(1, n_cust + 1, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(1, n_cust + 1)]),
        "c_nationkey": pa.array(rng.integers(0, n_nat, n_cust).astype(np.int32)),
        "c_acctbal": pa.array(bal),
        "c_mktsegment": pa.array(rng.choice(segs, n_cust).tolist())})

    n_supp = 20
    supplier = pa.table({
        "s_suppkey": pa.array(np.arange(1, n_supp + 1, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(1, n_supp + 1)]),
        "s_nationkey": pa.array(rng.integers(0, n_nat, n_supp).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.normal(4000, 3000, n_supp), 2))})

    n_part = 40
    types = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
    part = pa.table({
        "p_partkey": pa.array(np.arange(1, n_part + 1, dtype=np.int64)),
        "p_name": pa.array([f"part {i}" for i in range(1, n_part + 1)]),
        "p_brand": pa.array([f"Brand#{int(b)}" for b in
                             rng.integers(1, 26, n_part)]),
        "p_type": pa.array(rng.choice(types, n_part).tolist()),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 2000, n_part), 2))})

    # orders: customers 1..100 order (so 101..120 have ZERO orders);
    # customer 5 places two orders on the SAME date (zero reorder gap)
    n_ord = 400
    custs = rng.integers(1, 101, n_ord).astype(np.int64)
    base = np.datetime64("1995-01-01")
    odate = base + rng.integers(0, 4 * 365, n_ord).astype("timedelta64[D]")
    custs[0] = custs[1] = 5
    odate[1] = odate[0]
    statuses = np.array(["F", "O", "P"])
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM",
                      "4-NOT SPECIFIED", "5-LOW"])
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(1, n_ord + 1, dtype=np.int64)),
        "o_custkey": pa.array(custs),
        "o_orderstatus": pa.array(statuses[rng.integers(0, 3, n_ord)].tolist()),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 300000, n_ord), 2)),
        "o_orderdate": pa.array(odate).cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(prios[rng.integers(0, 5, n_ord)].tolist())})

    # lineitems: 1-6 per order; order 1 has a SINGLE line; order 2 has
    # three suppliers with exactly ONE shipping last (sole-late path)
    rows = []
    rf = np.array(["A", "N", "R"])
    for ok, od in zip(range(1, n_ord + 1), odate):
        nl = 1 if ok == 1 else int(rng.integers(1, 7))
        supps = rng.integers(1, n_supp + 1, nl).astype(np.int64)
        if ok == 2:
            nl = 3
            supps = np.array([1, 2, 3], dtype=np.int64)
        ship = od + rng.integers(1, 121, nl).astype("timedelta64[D]")
        if ok == 2:
            ship = od + np.array([5, 5, 90], dtype="timedelta64[D]")
        for ln in range(nl):
            qty = float(rng.integers(1, 51))
            disc = round(float(rng.integers(0, 11)) / 100.0, 2)
            rows.append((
                ok, int(rng.integers(1, n_part + 1)), int(supps[ln]),
                ln + 1, qty,
                round(qty * float(rng.uniform(900, 2000)), 2),
                disc, round(float(rng.integers(0, 9)) / 100.0, 2),
                str(rf[int(rng.integers(0, 3))]),
                "F" if rng.random() < 0.5 else "O",
                ship[ln]))
    lineitem = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], type=pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], type=pa.int64()),
        "l_suppkey": pa.array([r[2] for r in rows], type=pa.int64()),
        "l_linenumber": pa.array([r[3] for r in rows], type=pa.int32()),
        "l_quantity": pa.array([r[4] for r in rows], type=pa.float64()),
        "l_extendedprice": pa.array([r[5] for r in rows], type=pa.float64()),
        "l_discount": pa.array([r[6] for r in rows], type=pa.float64()),
        "l_tax": pa.array([r[7] for r in rows], type=pa.float64()),
        "l_returnflag": pa.array([r[8] for r in rows]),
        "l_linestatus": pa.array([r[9] for r in rows]),
        "l_shipdate": pa.array(
            np.array([r[10] for r in rows], dtype="datetime64[D]")
        ).cast(pa.timestamp("us"))})
    return {"region": region, "nation": nation, "customer": customer,
            "supplier": supplier, "part": part, "orders": orders,
            "lineitem": lineitem}


RELATIONAL_FUZZ_QUERIES = [
    "top_building_orders", "regional_supplier_revenue",
    "large_order_customers", "late_shipment_priority",
    "inactive_customers", "lineitem_pricing_summary", "tpch_q6_revenue",
    "promo_revenue_share", "mktsegment_revenue",
    "returned_item_customers", "tpch_q7_volume_shipping",
    "tpch_q19_disjunctive_revenue", "customer_order_distribution",
    "supplier_diversity_by_part", "top_supplier_revenue",
    "small_qty_brand_revenue", "idle_balance_by_nation",
    "nation_market_share", "sole_late_suppliers",
    "shipping_mix_by_status", "repeat_order_interval", "brand_pareto",
    "segment_order_value_cv", "shipping_delay_histogram",
    "copurchase_part_pairs", "orders_backlog_daily",
    "type_size_contingency", "discount_band_revenue",
    "qty_price_correlation", "order_fill_latency",
    "charge_summary_by_status", "order_lines_audit",
    "brand_list_price_gap", "supplier_balance_revenue",
    "custbal_orders_correlation", "order_month_seasonality",
    "exact_price_quantiles", "supplier_assortment_histogram",
    "customer_reactivation_census", "copurchase_triangles",
    "copurchase_components", "identical_basket_orders",
]


@pytest.fixture(scope="module",
                params=_env_seeds("GRAFT_REL_FUZZ_SEEDS", [5, 6]))
def rel_fuzz_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"relfuzz{request.param}")
    for name, tbl in _synth_tpch(request.param).items():
        pq.write_table(tbl, str(d / f"{name}.parquet"))
    return str(d)


class TestDifferentialRelational:
    def test_oracle_parity_on_random_tpch(self, ray_session,
                                          rel_fuzz_dir):
        from pycatcher_ray.queries import oracles, queries

        con = duckdb.connect()
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{rel_fuzz_dir}/{t}.parquet')")
        qs, os_ = queries(), oracles()
        failures = []
        for name in RELATIONAL_FUZZ_QUERIES:
            try:
                got = canon(to_pandas(qs[name](rel_fuzz_dir)))
                want = canon(con.execute(os_[name]).fetchdf())
            except Exception as e:
                failures.append((name, "err", str(e)[:160]))
                continue
            got = got.sort_values(list(got.columns)).reset_index(drop=True)
            want = want.sort_values(list(want.columns)).reset_index(drop=True)
            if len(got) != len(want):
                failures.append((name, "rows", len(got), len(want)))
                continue
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              rtol=0, atol=0)
            except AssertionError as e:
                failures.append((name, "values", str(e)[:200]))
        assert not failures, failures
