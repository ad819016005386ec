"""Property-based tests (hypothesis) for the invariant-critical kernels:
Gorilla round-trip over arbitrary series, checksum sensitivity, rolling
mean vs pandas, quantiles vs numpy, gap-fill grid density, HLL merge
commutativity."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from pycatcher_ray.functions.gorilla import decode_chunk, encode_chunk
from pycatcher_ray.functions.stats import quantile_linear, rolling_mean


def _ts_strategy():
    return st.lists(
        st.integers(min_value=-2**40, max_value=2**40), min_size=1, max_size=200
    )


float_vals = st.floats(
    allow_nan=True, allow_infinity=True, width=64
)


class TestGorillaProperties:
    @settings(max_examples=200, deadline=None)
    @given(deltas=_ts_strategy(), vals=st.lists(float_vals, min_size=1,
                                                max_size=200))
    def test_round_trip_any_series(self, deltas, vals):
        n = min(len(deltas), len(vals))
        ts = np.cumsum(np.asarray(deltas[:n], dtype=np.int64))
        values = np.asarray(vals[:n], dtype=np.float64)
        t2, v2 = decode_chunk(encode_chunk(ts, values))
        np.testing.assert_array_equal(ts, t2)
        # bit-exact equality incl. NaN payloads and signed zeros
        np.testing.assert_array_equal(values.view(np.uint64),
                                      v2.view(np.uint64))

    @settings(max_examples=50, deadline=None)
    @given(st.integers(min_value=1, max_value=500))
    def test_constant_series_compresses(self, n):
        ts = np.arange(n, dtype=np.int64) * 60
        vals = np.full(n, 7.25)
        blob = encode_chunk(ts, vals)
        assert len(blob) <= 8 + 16 + n // 2 + 2  # ~2 bits/point after first


class TestChecksumProperties:
    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.lists(st.integers(0, 2**31 - 2), min_size=0,
                             max_size=30), min_size=1, max_size=30))
    def test_permutation_sensitivity(self, rows):
        import pyarrow as pa

        from pycatcher_ray.stages.ingest import _tokens_checksum

        arr = pa.array(rows, type=pa.list_(pa.int32()))
        base = _tokens_checksum(arr)
        # same data -> same checksum
        np.testing.assert_array_equal(base, _tokens_checksum(arr))
        # reversing a non-palindromic row with >=2 distinct tokens changes
        # its checksum (a palindrome's reversal is identical, so its
        # checksum legitimately matches)
        for i, r in enumerate(rows):
            if len(set(r)) >= 2 and r != r[::-1]:
                mutated = list(rows)
                mutated[i] = list(reversed(r))
                arr2 = pa.array(mutated, type=pa.list_(pa.int32()))
                assert _tokens_checksum(arr2)[i] != base[i]
                break


class TestStatsProperties:
    @settings(max_examples=100, deadline=None)
    @given(
        st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=2,
                 max_size=100),
        st.integers(min_value=1, max_value=10),
    )
    def test_rolling_mean_matches_pandas(self, vals, w):
        x = np.asarray(vals)
        got = rolling_mean(x, w)
        want = pd.Series(x).rolling(w).mean().to_numpy()
        np.testing.assert_allclose(got, want, equal_nan=True, rtol=1e-9,
                                   atol=1e-9)

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.floats(-1e9, 1e9, allow_nan=False), min_size=1,
                    max_size=200),
           st.floats(0.0, 1.0, allow_nan=False))
    def test_quantile_matches_numpy(self, vals, q):
        x = np.asarray(vals)
        assert quantile_linear(x, q) == np.quantile(x, q)


class TestHLLProperties:
    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.integers(0, 10**9), min_size=1, max_size=500),
           st.lists(st.integers(0, 10**9), min_size=1, max_size=500))
    def test_merge_commutes(self, a_vals, b_vals):
        from pycatcher_ray.functions.hll import HLL

        ab = HLL().add_many(a_vals).merge(HLL().add_many(b_vals))
        ba = HLL().add_many(b_vals).merge(HLL().add_many(a_vals))
        np.testing.assert_array_equal(ab.registers, ba.registers)

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.integers(0, 10**6), min_size=1, max_size=300))
    def test_small_cardinality_near_exact(self, vals):
        from pycatcher_ray.functions.hll import HLL

        exact = len(set(vals))
        est = HLL().add_many(vals).estimate()
        # linear-counting regime: tight even for tiny sets
        assert abs(est - exact) <= max(2, 0.05 * exact)


class TestQuantileContParity:
    @settings(max_examples=60, deadline=None)
    @given(
        vals=st.lists(st.floats(min_value=-1e6, max_value=1e6,
                                allow_nan=False, allow_infinity=False,
                                width=64), min_size=1, max_size=120),
        q=st.floats(min_value=0.0, max_value=1.0),
    )
    def test_matches_duckdb_bitwise(self, vals, q):
        """quantile_cont's plain lerp must be BIT-identical to DuckDB's
        quantile_cont for arbitrary doubles and quantiles."""
        import duckdb

        from pycatcher_ray.functions.stats import quantile_cont

        got = quantile_cont(np.asarray(vals), q)
        want = duckdb.connect().execute(
            "SELECT quantile_cont(x, ?) FROM (SELECT unnest(?) AS x)",
            [q, vals],
        ).fetchone()[0]
        if got == 0.0 and want == 0.0:
            return  # ±0.0 differ bitwise but are value-equal everywhere
        assert np.float64(got).tobytes() == np.float64(want).tobytes()


class TestBenfordDigit:
    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=10**17),
                    min_size=1, max_size=200))
    def test_searchsorted_digit_equals_string_digit(self, ns):
        n = np.asarray(ns, dtype=np.int64)
        pow10 = 10 ** np.arange(19, dtype=np.int64)
        digit = n // pow10[np.searchsorted(pow10, n, side="right") - 1]
        want = np.array([int(str(x)[0]) for x in ns], dtype=np.int64)
        np.testing.assert_array_equal(digit, want)


class TestGiniProperties:
    @settings(max_examples=80, deadline=None)
    @given(st.lists(st.floats(min_value=0.0, max_value=1e6,
                              allow_nan=False, width=64),
                    min_size=2, max_size=150))
    def test_bounds_and_scale_invariance(self, vals):
        v = np.sort(np.asarray(vals, dtype=np.float64))
        if v.sum() <= 0:
            return
        n = v.size

        def gini(x):
            iv = float(np.dot(np.arange(1, n + 1, dtype=np.float64), x))
            return 2.0 * iv / (n * float(x.sum())) - (n + 1.0) / n

        g = gini(v)
        assert -1e-9 <= g < 1.0
        # scale invariance (identical op structure -> tiny drift only)
        assert abs(gini(v * 3.0) - g) < 1e-9
        # constant array -> 0
        assert abs(gini(np.full(n, 5.0))) < 1e-12


class TestKpssBigIntFallback:
    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.integers(min_value=-10**9, max_value=10**9),
                    min_size=2, max_size=300))
    def test_python_int_path_matches_cumsum(self, es):
        """The overflow-guard path (exact Python-int partial sums) must
        agree bit-for-bit with np.cumsum when no overflow occurs."""
        e = np.asarray(es, dtype=np.int64)
        fast = np.cumsum(e).astype(np.float64)
        acc, out = 0, []
        for x in e.tolist():
            acc += x
            out.append(float(acc))
        np.testing.assert_array_equal(fast, np.asarray(out))


class TestPercentRank:
    @settings(max_examples=80, deadline=None)
    @given(st.lists(st.floats(min_value=-1e5, max_value=1e5,
                              allow_nan=False, width=64),
                    min_size=2, max_size=200))
    def test_searchsorted_equals_min_rank(self, vals):
        v = np.asarray(vals, dtype=np.float64)
        sv = np.sort(v)
        rank = np.searchsorted(sv, v, side="left")
        want = (pd.Series(v).rank(method="min").to_numpy() - 1).astype(
            np.int64)
        np.testing.assert_array_equal(rank, want)


class TestSingleTaskCC:
    """The size-gated one-task connected-components kernel
    (stages/dedup._cc_single_task) must match a plain union-find with
    value-ordered representatives (min doc_id per component — the same
    contract as the distributed label-propagation rounds) on arbitrary
    graphs, including self-loops, duplicate edges and long chains."""

    @settings(max_examples=80, deadline=None)
    @given(
        edges=st.lists(
            st.tuples(st.integers(min_value=0, max_value=60),
                      st.integers(min_value=0, max_value=60)),
            min_size=1, max_size=120,
        )
    )
    def test_matches_union_find_min_id(self, edges):
        import pyarrow as pa

        from pycatcher_ray.stages.dedup import _cc_single_task

        a = np.array([e[0] for e in edges], dtype=np.int64)
        b = np.array([e[1] for e in edges], dtype=np.int64)
        # both directions, like the both_dir stage feeding the kernel
        tbl = pa.table({"src": np.concatenate([a, b]),
                        "dst": np.concatenate([b, a])})
        got = _cc_single_task(tbl).to_pandas().set_index("doc_id")[
            "cluster_id"].to_dict()

        # reference: union-find, then min node VALUE per component
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in edges:
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[rx] = ry
        comp: dict = {}
        for node in parent:
            comp.setdefault(find(node), []).append(node)
        want = {}
        for members in comp.values():
            lo = min(members)
            for m in members:
                want[m] = lo
        assert got == want

    def test_long_chain_converges(self):
        """A 3000-hop chain: pointer jumping must converge (log rounds),
        every node labeled by the chain head."""
        import pyarrow as pa

        from pycatcher_ray.stages.dedup import _cc_single_task

        n = 3000
        src = np.arange(n - 1, dtype=np.int64)
        dst = src + 1
        tbl = pa.table({"src": np.concatenate([src, dst]),
                        "dst": np.concatenate([dst, src])})
        out = _cc_single_task(tbl).to_pandas()
        assert len(out) == n
        assert (out["cluster_id"] == 0).all()


class TestCorrMomentsCrossEngine:
    """The correlation/variance operators accumulate float moments across
    shards in nondeterministic order and claim a 6-dp round absorbs the
    drift (queries.source_correlation / variance-based kernels).  These
    properties attack that claim directly: shard-order-permuted chunked
    partial sums vs DuckDB's single-pass explicit-moment SQL must agree
    at 6 dp for 4-dp-rounded inputs of pipeline magnitude."""

    @settings(max_examples=100, deadline=None)
    @given(
        xy=st.lists(
            st.tuples(
                st.floats(min_value=-1e5, max_value=1e5,
                          allow_nan=False, width=64),
                st.floats(min_value=-1e5, max_value=1e5,
                          allow_nan=False, width=64)),
            min_size=2, max_size=200),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_pearson_round6_stable_under_shard_order(self, xy, seed):
        import duckdb

        x = np.round(np.array([p[0] for p in xy]), 4)
        y = np.round(np.array([p[1] for p in xy]), 4)
        # constancy guard is an exact min==max on both engines — the
        # float path under test only runs on non-constant sides
        if x.min() == x.max() or y.min() == y.max():
            return
        rng = np.random.default_rng(seed)
        order = rng.permutation(x.size)
        # chunked partials in permuted order = shard fold simulation
        cuts = np.unique(rng.integers(0, x.size, size=4))
        chunks = np.split(order, cuts[(cuts > 0) & (cuts < x.size)])
        n = float(x.size)
        sx = sum(float(x[c].sum()) for c in chunks if c.size)
        sy = sum(float(y[c].sum()) for c in chunks if c.size)
        sxy = sum(float((x[c] * y[c]).sum()) for c in chunks if c.size)
        sxx = sum(float((x[c] * x[c]).sum()) for c in chunks if c.size)
        syy = sum(float((y[c] * y[c]).sum()) for c in chunks if c.size)
        den = (sxx - sx * sx / n) * (syy - sy * sy / n)
        if den <= 0:
            return  # numerically-constant after rounding; guard covers it
        got = round((sxy - sx * sy / n) / np.sqrt(den), 6)
        want = duckdb.connect().execute(
            """
            WITH j AS (SELECT unnest(?) AS x, unnest(?) AS y),
            s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                         sum(x*y) AS sxy, sum(x*x) AS sxx,
                         sum(y*y) AS syy FROM j)
            SELECT round((sxy - sx*sy/n)
                         / sqrt((sxx - sx*sx/n) * (syy - sy*sy/n)), 6)
            FROM s
            """,
            [x.tolist(), y.tolist()]).fetchone()[0]
        assert want is not None
        # 6-dp agreement modulo one ulp of the rounding grid: a true
        # half-tie at 1e-6 may legally round apart — flag only real drift
        assert abs(got - want) <= 1.0000001e-6, (got, want)

    @settings(max_examples=100, deadline=None)
    @given(
        vals=st.lists(st.floats(min_value=-1e5, max_value=1e5,
                                allow_nan=False, width=64),
                      min_size=2, max_size=200),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_varpop_int_units_bitwise(self, vals, seed):
        """ABSOLUTE-magnitude variances must use the 10⁻⁴-int-unit
        exact-moment path (variance_ratio_by_day et al.): bigint
        n·S2−S1² under any fold order == HUGEINT SQL, bit-for-bit after
        the single divide.  (The float-moment form of this same
        quantity FAILS round-6 at ~1e5 magnitudes — hypothesis found
        [0, 1, 99998, 99999, 14747.2019, -1] drifting past the grid —
        which is exactly why the operators don't use it.)

        DuckDB quirk this test documents (found by hypothesis,
        2026-08-19): ``CAST(h AS DOUBLE)`` on a HUGEINT is NOT
        correctly rounded — duckdb converts via per-half ldexp-style
        float arithmetic (two roundings), so integers past ~2⁶⁴ (and
        negative HUGEINTs past 2⁵³) can land 1 ulp off Python's
        correctly-rounded ``float(int)`` (e.g. 19727111344750000000 →
        0x…4670 vs 0x…466f).  ``CAST(h AS VARCHAR) → DOUBLE`` IS
        correctly rounded (fast_float parser; 0/20k mismatches in a
        127-bit fuzz), so every oracle that divides a HUGEINT-typed
        exact moment routes through the VARCHAR bridge — and so does
        this test.  BIGINT→DOUBLE is correctly rounded (0/20k fuzz)
        and needs no bridge."""
        import duckdb

        y4 = np.rint(np.round(np.array(vals), 4) * 10000.0).astype(
            np.int64)
        rng = np.random.default_rng(seed)
        order = rng.permutation(y4.size)
        cuts = np.unique(rng.integers(0, y4.size, size=4))
        chunks = np.split(order, cuts[(cuts > 0) & (cuts < y4.size)])
        n = y4.size
        # Python-int partials in permuted chunk order — exact, so the
        # fold order cannot matter
        s1 = sum(int(sum(int(v) for v in y4[c])) for c in chunks)
        s2 = sum(int(sum(int(v) * int(v) for v in y4[c]))
                 for c in chunks)
        got = float(n * s2 - s1 * s1) / float(n * n) / 1e8
        want = duckdb.connect().execute(
            """
            WITH j AS (SELECT unnest(?) AS y)
            SELECT CAST(CAST(count(*) * sum(CAST(y AS HUGEINT) * y)
                             - sum(CAST(y AS HUGEINT))
                               * sum(CAST(y AS HUGEINT)) AS VARCHAR)
                        AS DOUBLE)
                   / CAST(count(*) * count(*) AS DOUBLE) / 1e8 FROM j
            """,
            [y4.tolist()]).fetchone()[0]
        if got == 0.0 and want == 0.0:
            return
        assert np.float64(got).tobytes() == np.float64(want).tobytes()
