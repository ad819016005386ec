"""The in-band oracle booleans must actually MEASURE something: each
test here breaks the approximate path (or checks the planted
construction) and asserts the guard reacts — the negative twin of the
driver's pinned-TRUE oracles (verdict r4 item 1 conversions)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


class TestInBandGuards:
    def test_sketch_guarantee_boolean_reacts_to_broken_errs(
            self, ray_session):
        """Corrupted error accounting (err=0) on a crippled cap=1
        sketch makes the Metwally separation condition spuriously
        certify its top-k, so the implication boolean
        sketch_topk_consistent must go False for at least one
        exact-top-k row — proving the pinned-TRUE oracle is a real
        measurement, not a constant.  (cap=1 with HONEST errors keeps
        the boolean True because separation correctly fails — the
        implication is vacuous for a sketch that knows it's garbage.)"""
        from pycatcher_ray.queries import approx_top_users_by_type

        out = approx_top_users_by_type(SF, cap=1, _zero_err_for_test=True)
        assert len(out)
        assert not bool(out["sketch_topk_consistent"].all())
        honest = approx_top_users_by_type(SF, cap=1)
        assert bool(honest["sketch_topk_consistent"].all())

    def test_sketch_guarantee_holds_at_default_cap(self, ray_session):
        from pycatcher_ray.queries import approx_top_users_by_type

        out = approx_top_users_by_type(SF)
        assert len(out)
        assert bool(out["sketch_topk_consistent"].all())
        assert bool(out["within_error_bound"].all())

    def test_embedding_neardup_planted_pairs_exact(self, ray_session):
        """The planted exact-duplicate construction must yield exactly
        the 8 (v, v+1e9) pairs at cos ~ 1.0 — LSH bucket identity for
        identical vectors is structural, so a miss means the bucketing
        or verify stage broke."""
        from pycatcher_ray.queries import embedding_neardup_lsh

        out = embedding_neardup_lsh(SF)
        if hasattr(out, "to_pandas"):
            out = out.to_pandas()
        out = out.sort_values("vec_a").reset_index(drop=True)
        assert len(out) == 8
        np.testing.assert_array_equal(out["vec_a"], np.arange(8))
        np.testing.assert_array_equal(out["vec_b"],
                                      np.arange(8) + 1_000_000_000)
        assert (out["cos_sim"].round(4) == 1.0).all()

    def test_ivf_recall_floor_is_measured(self, ray_session):
        """ivf_recall_ok must be a single measured value repeated per
        rank row (not per-row noise) and True on this corpus."""
        from pycatcher_ray.queries import ann_topk_ivf

        out = ann_topk_ivf(SF)
        assert len(out) == 10
        assert out["ivf_recall_ok"].nunique() == 1
        assert bool(out["ivf_recall_ok"].all())

    def test_stationarity_adf_inband_consistency(self, ray_session):
        """adf_consistent pins the Schwert lag bound and the lag-0 ≡
        closed-form identity; on the sf events series it must hold for
        every source."""
        from pycatcher_ray.queries import stationarity_by_source

        out = stationarity_by_source(SF)
        if hasattr(out, "to_pandas"):
            out = out.to_pandas()
        assert len(out) == 5
        assert bool(out["adf_consistent"].all())
        assert bool(out["kpss_stat"].notna().all())
