"""Unit tests for the from-scratch numeric kernels."""

import numpy as np
import pytest

from pycatcher_ray.errors import DataValidationError
from pycatcher_ray.functions import (
    MonteCarloShapiro,
    acf_fft,
    betainc,
    boxcox,
    decode_chunk,
    encode_chunk,
    esd_critical_value,
    generalized_esd,
    inv_boxcox,
    iqr_mask,
    mad_mask,
    mstl,
    norm_ppf,
    optimal_window_size,
    rmse_for_window,
    rolling_mean,
    seasonal_decompose,
    seasonal_esd,
    shapiro,
    stl,
    sum_of_squares,
    t_ppf,
    zscore,
)


class TestSpecial:
    def test_norm_ppf_known(self):
        assert norm_ppf(0.975) == pytest.approx(1.959963985, abs=1e-8)
        assert norm_ppf(0.5) == 0.0
        assert norm_ppf(0.0228) == pytest.approx(-1.9990, abs=1e-3)

    def test_t_ppf_known(self):
        # R: qt(0.975, 10) = 2.228138852
        assert t_ppf(0.975, 10) == pytest.approx(2.228138852, abs=1e-6)
        # R: qt(0.95, 1) = 6.313751515
        assert t_ppf(0.95, 1) == pytest.approx(6.313751515, abs=1e-5)
        assert t_ppf(0.025, 10) == pytest.approx(-2.228138852, abs=1e-6)

    def test_betainc(self):
        assert betainc(2, 3, 0.4) == pytest.approx(0.5248, abs=1e-4)
        assert betainc(0.5, 0.5, 0.5) == pytest.approx(0.5, abs=1e-10)

    def test_esd_critical_value(self):
        # NIST example (n=54, alpha=0.05): lambda_1 = 3.158
        assert esd_critical_value(54, 0.05) == pytest.approx(3.158, abs=2e-3)


class TestStats:
    def test_iqr_exact_golden(self):
        # reference test_catch.py:67-75
        m = iqr_mask(np.array([1, 2, 3, 100, 4], float))
        assert list(np.nonzero(m)[0]) == [3]

    def test_mad_exact_golden(self):
        # reference test_catch.py:102-106
        m = mad_mask(np.array([1, 2, 3, 100, 4], float))
        assert list(np.nonzero(m)[0]) == [3]

    def test_iqr_rate_normal(self):
        # reference test_catch.py:54-65
        np.random.seed(42)
        d = np.random.normal(0, 1, 1000)
        assert 0.001 <= iqr_mask(d).mean() <= 0.02

    def test_mad_rate_normal(self):
        # reference test_catch.py:94-100
        np.random.seed(42)
        d = np.random.normal(0, 1, 1000)
        assert 0.001 <= mad_mask(d).mean() <= 0.10

    def test_sum_of_squares_golden(self):
        # reference test_catch.py:158-168
        assert sum_of_squares(np.array([1, 2, 3, 4])) == 30.0
        with pytest.raises(DataValidationError):
            sum_of_squares(np.array([]))

    def test_zscore_population_std(self):
        x = np.array([1.0, 2.0, 3.0, 4.0])
        z = zscore(x)
        assert z.std() == pytest.approx(1.0)  # ddof=0 normalization
        assert z.mean() == pytest.approx(0.0)

    def test_rolling_mean_matches_pandas(self):
        import pandas as pd

        rng = np.random.default_rng(7)
        x = rng.standard_normal(50)
        x[10] = np.nan
        for w in (2, 5, 9):
            got = rolling_mean(x, w)
            want = pd.Series(x).rolling(w).mean().to_numpy()
            np.testing.assert_allclose(got, want, equal_nan=True)

    def test_acf_lag0_is_one(self):
        rng = np.random.default_rng(3)
        a = acf_fft(rng.standard_normal(500))
        assert a[0] == pytest.approx(1.0)
        assert np.all(np.abs(a[1:]) < 0.2)


class TestShapiro:
    def test_normal_accepts(self):
        rng = np.random.default_rng(0)
        w, p = shapiro(rng.standard_normal(200))
        assert w > 0.98 and p > 0.05

    def test_exponential_rejects(self):
        rng = np.random.default_rng(0)
        w, p = shapiro(rng.exponential(size=200))
        assert p < 0.001

    def test_monte_carlo_cache_and_determinism(self):
        mc = MonteCarloShapiro(n_resamples=500, seed=1)
        rng = np.random.default_rng(5)
        x = rng.standard_normal(40)
        r1 = mc.test(x)
        assert len(mc._cache) == 1
        r2 = mc.test(rng.standard_normal(40))
        assert len(mc._cache) == 1  # same length -> cached null reused
        assert mc.test(x) == r1  # deterministic


class TestBoxCox:
    def test_round_trip(self):
        rng = np.random.default_rng(11)
        x = rng.lognormal(1.0, 0.4, 300)
        y, lam = boxcox(x)
        np.testing.assert_allclose(inv_boxcox(y, lam), x, rtol=1e-9)

    def test_lognormal_lambda_near_zero(self):
        rng = np.random.default_rng(11)
        x = rng.lognormal(0.0, 1.0, 2000)
        _, lam = boxcox(x)
        assert abs(lam) < 0.15

    def test_positive_required(self):
        with pytest.raises(DataValidationError):
            boxcox(np.array([1.0, -2.0, 3.0]))


class TestDecompose:
    def test_planted_outliers_flagged(self):
        # reference test_catch.py:496-518 (decompose_100 fixture)
        np.random.seed(42)
        n = 100
        v = (
            100
            + np.linspace(0, 10, n)
            + 5 * np.sin(np.linspace(0, 8 * np.pi, n))
            + np.random.normal(0, 0.1, n)
        )
        v[25], v[75] = 130.0, 70.0
        res = seasonal_decompose(v, period=7, model="additive")
        mask = mad_mask(res.resid)
        assert mask[25] and mask[75]

    def test_components_reconstruct(self):
        rng = np.random.default_rng(2)
        v = 50 + 10 * np.sin(2 * np.pi * np.arange(140) / 7) + rng.normal(0, 1, 140)
        res = seasonal_decompose(v, period=7, model="additive")
        np.testing.assert_allclose(
            res.trend + res.seasonal + res.resid, v, rtol=1e-9
        )
        assert not np.isnan(res.resid).any()  # extrapolate_trend='freq'

    def test_multiplicative_requires_positive(self):
        from pycatcher_ray.errors import TimeSeriesError

        with pytest.raises(TimeSeriesError):
            seasonal_decompose(np.r_[np.ones(20), -1.0, np.ones(20)], period=7,
                               model="multiplicative")


class TestSTL:
    def test_hourly_spike(self):
        # reference test_catch.py:861-892 (period 24)
        np.random.seed(42)
        n = 17520
        y = 100 + 50 * np.sin(np.linspace(0, 100, n)) + np.random.uniform(0, 10, n)
        y[1000] = 1000.0
        r = stl(y, period=24, seasonal=25)
        assert abs(zscore(r.resid)[1000]) > 2
        assert mad_mask(r.resid)[1000]

    def test_daily_spike_period_365(self):
        # reference test_catch.py:869-899 (period 365 on 730 points)
        np.random.seed(42)
        y = 100 + 50 * np.sin(np.linspace(0, 10, 730)) + np.random.uniform(0, 10, 730)
        y[100] = 1000.0
        r = stl(y, period=365, seasonal=365)
        assert mad_mask(r.resid)[100]

    def test_monthly_spike_period_12(self):
        # reference test_catch.py:878-906 (period 12 on 24 points)
        np.random.seed(42)
        y = 100 + 50 * np.sin(np.linspace(0, 2, 24)) + np.random.uniform(0, 10, 24)
        y[5] = 1000.0
        r = stl(y, period=12, seasonal=13)
        assert mad_mask(r.resid)[5]

    def test_reconstruction_identity(self):
        rng = np.random.default_rng(9)
        y = 10 + np.sin(2 * np.pi * np.arange(300) / 12) + rng.normal(0, 0.1, 300)
        r = stl(y, period=12, seasonal=13)
        np.testing.assert_allclose(r.trend + r.seasonal + r.resid, y, rtol=1e-9)

    def test_mstl_two_periods(self):
        np.random.seed(42)
        n = 17520
        y = 100 + 50 * np.sin(np.linspace(0, 100, n)) + np.random.uniform(0, 10, n)
        y[1000] = 1000.0
        r = mstl(y, periods=(24, 168))
        assert mad_mask(r.resid)[1000]
        assert set(r.seasonal) == {24, 168}
        np.testing.assert_allclose(
            r.trend + r.seasonal_sum + r.resid, y, rtol=1e-9
        )


class TestESD:
    def test_generalized_esd_spikes(self):
        rng = np.random.default_rng(0)
        d = rng.normal(100, 5, 500)
        d[50], d[200] = 200.0, 5.0
        out = generalized_esd(d, max_anomalies=25, alpha=0.05)
        assert 50 in out and 200 in out and len(out) < 25

    def test_generalized_esd_clean_normal(self):
        rng = np.random.default_rng(1)
        out = generalized_esd(rng.normal(0, 1, 500), max_anomalies=25, alpha=0.05)
        assert len(out) <= 3  # false-positive budget

    def test_seasonal_esd_hybrid(self):
        rng = np.random.default_rng(2)
        y = 100 + 20 * np.sin(2 * np.pi * np.arange(730) / 7) + rng.normal(0, 2, 730)
        y[300] = 250.0
        out = seasonal_esd(y, periodicity=7, max_anomalies=36, alpha=0.05, hybrid=True)
        assert 300 in out


class TestMovingAverage:
    def test_rmse_sine_small(self):
        # reference test_catch.py:647-651 asserts approx 0 for a smooth sine
        v = np.sin(np.linspace(0, 10, 100)) * 100 + 500
        assert rmse_for_window(v, 7) < 25.0  # smooth -> small relative to scale

    def test_optimal_window_range(self):
        rng = np.random.default_rng(5)
        v = np.linspace(10, 100, 100) + rng.normal(0, 5, 100)
        assert 2 <= optimal_window_size(v) <= 20

    def test_constant_series(self):
        assert 2 <= optimal_window_size(np.full(50, 10.0)) <= 20

    def test_too_short_raises(self):
        # reference test_catch.py minimum_size_dataset: 7 rows -> all-NaN RMSE
        with pytest.raises(ValueError, match="All RMSE values are NaN"):
            optimal_window_size(np.arange(1, 8, dtype=float))


class TestGorilla:
    def test_round_trip_special_values(self):
        ts = np.arange(0, 600, 60, dtype=np.int64) + 1_700_000_000
        vals = np.array(
            [1.5, 1.5, 2.0, np.nan, -0.0, 0.0, 3.14159, 3.14159, 1e300, -1e-300]
        )
        t2, v2 = decode_chunk(encode_chunk(ts, vals))
        np.testing.assert_array_equal(ts, t2)
        np.testing.assert_array_equal(vals.view(np.uint64), v2.view(np.uint64))

    def test_round_trip_random_walk(self):
        rng = np.random.default_rng(3)
        ts = np.cumsum(rng.integers(1, 120, 5000)).astype(np.int64)
        vals = np.cumsum(rng.standard_normal(5000)) + 100
        t2, v2 = decode_chunk(encode_chunk(ts, vals))
        np.testing.assert_array_equal(ts, t2)
        np.testing.assert_array_equal(vals.view(np.uint64), v2.view(np.uint64))

    def test_compresses_regular_series(self):
        ts = (np.arange(4096, dtype=np.int64) * 60)
        vals = np.full(4096, 42.5)
        blob = encode_chunk(ts, vals)
        assert len(blob) < 0.05 * 16 * 4096  # constant series ≈ 2 bits/point

    def test_empty(self):
        t2, v2 = decode_chunk(encode_chunk(np.array([], dtype=np.int64),
                                           np.array([], dtype=np.float64)))
        assert t2.size == 0 and v2.size == 0


class TestGorillaVectorized:
    def test_round_trip_matches_decoder(self):
        from pycatcher_ray.functions.gorilla import (
            decode_chunk,
            encode_chunk_vectorized,
        )

        rng = np.random.default_rng(5)
        ts = np.cumsum(rng.integers(1, 5000, 3000)).astype(np.int64)
        vals = np.cumsum(rng.standard_normal(3000))
        vals[10] = np.nan
        vals[20] = -0.0
        t2, v2 = decode_chunk(encode_chunk_vectorized(ts, vals))
        np.testing.assert_array_equal(ts, t2)
        np.testing.assert_array_equal(vals.view(np.uint64), v2.view(np.uint64))

    def test_size_within_10pct_of_sequential(self):
        from pycatcher_ray.functions.gorilla import (
            encode_chunk,
            encode_chunk_vectorized,
        )

        rng = np.random.default_rng(6)
        ts = np.arange(5000, dtype=np.int64) * 60
        vals = np.cumsum(rng.standard_normal(5000))
        a = len(encode_chunk(ts, vals))
        b = len(encode_chunk_vectorized(ts, vals))
        assert b <= 1.10 * a


class TestBucketFloorSemantics:
    """Integer bucketing must FLOOR, not truncate toward zero, so
    pre-1970 (negative-epoch) timestamps land in the bucket below."""

    def test_negative_epoch_arbitrary_width(self):
        import pyarrow as pa

        from pycatcher_ray.stages.rollup import bucket_column

        # 300s buckets (not a floor_temporal unit -> integer path)
        ts = pa.array(
            [-601, -600, -599, -1, 0, 1, 299, 300], type=pa.timestamp("s")
        )
        got = bucket_column(ts, 300).cast(pa.int64()).to_pylist()
        assert got == [-900, -600, -600, -300, 0, 0, 0, 300]

    def test_negative_epoch_subsecond_unit(self):
        import pyarrow as pa

        from pycatcher_ray.stages.rollup import bucket_column

        ts = pa.array([-60_500, -59_999, 500], type=pa.timestamp("ms"))
        got = bucket_column(ts, 300).cast(pa.int64()).to_pylist()
        # -60.5s floors to bucket -300s; -59.999s too; 0.5s to bucket 0
        assert got == [-300_000, -300_000, 0]

    def test_negative_epoch_chunk_id(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from pycatcher_ray.stages.compress import add_chunk_id

        t = pa.table(
            {"bucket_start": pa.array([-86_400, -1, 0, 86_399, 86_400],
                                      type=pa.timestamp("s"))}
        )
        out = add_chunk_id(rd.from_arrow(t), 60, 1440).to_pandas()
        assert out["chunk_id"].tolist() == [-1, -1, 0, 0, 1]


class TestTDigest:
    def test_quantiles_accurate(self):
        from pycatcher_ray.functions.tdigest import TDigest

        rng = np.random.default_rng(0)
        x = rng.standard_normal(100_000)
        td = TDigest().add_many(x)
        for q in (0.01, 0.25, 0.5, 0.75, 0.95, 0.99):
            assert abs(td.quantile(q) - np.quantile(x, q)) < 0.01, q

    def test_merge_equals_single_pass(self):
        from pycatcher_ray.functions.tdigest import TDigest

        rng = np.random.default_rng(1)
        x = rng.exponential(2.0, 50_000)
        merged = TDigest().add_many(x[:20_000]).merge(
            TDigest().add_many(x[20_000:]))
        for q in (0.5, 0.95, 0.99):
            assert abs(merged.quantile(q) - np.quantile(x, q)) \
                < 0.02 * max(1.0, np.quantile(x, q)), q

    def test_serde_round_trip(self):
        from pycatcher_ray.functions.tdigest import TDigest

        td = TDigest().add_many(np.arange(1000.0))
        rt = TDigest.from_bytes(td.to_bytes())
        assert rt.quantile(0.5) == td.quantile(0.5)
        assert rt.means.size == td.means.size

    def test_small_inputs(self):
        from pycatcher_ray.functions.tdigest import TDigest

        assert np.isnan(TDigest().quantile(0.5))
        td = TDigest().add_many([7.0])
        assert td.quantile(0.1) == 7.0 == td.quantile(0.9)


class TestSpaceSaving:
    def test_heavy_hitter_guarantee(self):
        from pycatcher_ray.functions.heavyhitters import SpaceSaving

        rng = np.random.default_rng(0)
        # zipf stream: a few heavy items among many light ones
        items = rng.zipf(1.5, 50_000) % 10_000
        ss = SpaceSaving(k=64).add_many(items)
        import collections

        true = collections.Counter(items.tolist())
        n = len(items)
        # every item with count > N/k must be present
        for item, c in true.items():
            if c > n / 64:
                assert item in ss.counts, item
        # reported counts are upper bounds within the recorded error
        for item, ub, err in ss.top(10):
            assert true[item] <= ub <= true[item] + err + 1e-9

    def test_merge_preserves_guarantee(self):
        from pycatcher_ray.functions.heavyhitters import SpaceSaving

        rng = np.random.default_rng(1)
        items = rng.zipf(1.3, 40_000) % 5_000
        a = SpaceSaving(64).add_many(items[:20_000])
        b = SpaceSaving(64).add_many(items[20_000:])
        merged = a.merge(b)
        import collections

        true = collections.Counter(items.tolist())
        top_true = [i for i, _ in true.most_common(5)]
        got = [i for i, _, _ in merged.top(64)]
        for i in top_true:
            assert i in got
        for item, ub, err in merged.top(5):
            assert true[item] <= ub + 1e-9

    def test_weighted_counts(self):
        from pycatcher_ray.functions.heavyhitters import SpaceSaving

        ss = SpaceSaving(8).add_many(["a", "b", "a"], [1.0, 5.0, 2.0])
        top = ss.top(2)
        assert top[0][0] == "b" and top[0][1] == 5.0
        assert top[1][0] == "a" and top[1][1] == 3.0


class TestGorillaBatched:
    """encode_chunk_batched must be BIT-identical to encode_chunk (same
    10-reuse window semantics) — it is the compress-stage default."""

    def test_bit_identity_shapes(self):
        from pycatcher_ray.functions.gorilla import (encode_chunk,
                                                     encode_chunk_batched)

        rng = np.random.default_rng(3)
        for kind in range(5):
            n = int(rng.integers(2, 500))
            ts = np.cumsum(rng.integers(1, 90, n)) * 1000
            if kind == 0:
                vals = np.round(rng.standard_normal(n) * 50 + 500, 4)
            elif kind == 1:  # long runs of equal values -> zero XOR path
                vals = np.resize(
                    np.repeat(rng.standard_normal(max(1, n // 9)), 9), n)
            elif kind == 2:  # small-int values -> short meaningful bits
                vals = rng.integers(0, 5, n).astype(float)
            elif kind == 3:  # constant
                vals = np.full(n, 3.14159)
            else:  # NaN / -0.0 bit patterns
                vals = rng.standard_normal(n)
                vals[rng.random(n) < 0.1] = np.nan
                vals[rng.random(n) < 0.1] = -0.0
            assert encode_chunk(ts, vals) == encode_chunk_batched(ts, vals)

    def test_edge_sizes(self):
        from pycatcher_ray.functions.gorilla import (decode_chunk,
                                                     encode_chunk,
                                                     encode_chunk_batched)

        for ts, vals in [(np.array([], dtype=np.int64), np.array([])),
                         (np.array([7]), np.array([2.5])),
                         (np.array([1, 2]), np.array([0.0, 0.0]))]:
            blob = encode_chunk_batched(ts, vals)
            assert blob == encode_chunk(ts, vals)
            t2, v2 = decode_chunk(blob)
            assert (t2 == np.asarray(ts, dtype=np.int64)).all()
            assert (v2.view(np.uint64)
                    == np.asarray(vals, float).view(np.uint64)).all()


class TestSplitmix64:
    def test_known_answers(self):
        """Published splitmix64 outputs (SplittableRandom finalizer):
        the first three outputs for seed 0 are the de-facto reference
        vector (e.g. the xoshiro/splitmix64 reference C code)."""
        import numpy as np

        from pycatcher_ray.queries import _splitmix64

        got = _splitmix64(np.array([0, 1, 2], dtype=np.int64))
        assert got.tolist() == [16294208416658607535,
                                10451216379200822465,
                                10905525725756348110]

    def test_matches_pure_python(self):
        import numpy as np

        from pycatcher_ray.queries import _splitmix64

        def ref(x: int) -> int:
            z = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            return z ^ (z >> 31)

        xs = np.array([0, 5, 123456789, 2**62, 2**63 - 1], dtype=np.uint64)
        assert _splitmix64(xs).tolist() == [ref(int(x)) for x in xs]
