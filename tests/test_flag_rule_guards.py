"""Flag-rule carrier guards (round-5 session 2): the LOESS/MC-gated
flag queries get in-band driver signals via detectors._flag_rule_guard
— the distributed detect stage's flag stream compared per (source,
method) against a direct single-process application of the documented
rule over an independently assembled series.  These tests hold the
positive pins AND the negative knob: perturbing the EXPECTED side's
thresholds (``expected_cfg``) must flip the booleans, proving they
measure the comparison rather than decorate it."""

import numpy as np
import pandas as pd

from pycatcher_ray.config import EngineConfig

SF = "/root/testdata/sf0.001"


def _df(ds) -> pd.DataFrame:
    return ds.to_pandas() if hasattr(ds, "to_pandas") else ds


class TestFlagRuleGuards:
    def test_stl_guard_true_on_clean_run(self, ray_session):
        from pycatcher_ray.queries import stl_flag_rule_1h

        out = _df(stl_flag_rule_1h(SF))
        assert len(out) > 0
        assert (out["method"] == "stl").all()
        assert bool(out["flags_match_rule"].all())
        assert bool(out["values_match_rule"].all())
        assert (out["n_rows"] >= 48).all()

    def test_mstl_and_esd_guards_true(self, ray_session):
        from pycatcher_ray.queries import (esd_flag_rule_1h,
                                           mstl_flag_rule_1h)

        for fn in (mstl_flag_rule_1h, esd_flag_rule_1h):
            out = _df(fn(SF))
            assert len(out) > 0
            assert bool(out["flags_match_rule"].all())
            assert bool(out["values_match_rule"].all())

    def test_tokens_guard_covers_both_methods(self, ray_session):
        from pycatcher_ray.queries import tokens_flag_rule_1h

        out = _df(tokens_flag_rule_1h(SF))
        assert set(out["method"]) == {"stl", "esd"}
        assert bool(out["flags_match_rule"].all())
        assert bool(out["values_match_rule"].all())

    def test_stl_guard_flips_with_crippled_expected_threshold(
            self, ray_session):
        """z/MAD thresholds near zero on the EXPECTED side flag almost
        every bucket, so the stage (real thresholds) can no longer
        match — flags_match_rule must go False somewhere."""
        from pycatcher_ray.queries import stl_flag_rule_1h

        crippled = EngineConfig(z_threshold=0.05, mad_threshold=0.05)
        out = _df(stl_flag_rule_1h(SF, expected_cfg=crippled))
        assert len(out) > 0
        assert not bool(out["flags_match_rule"].all())

    def test_esd_guard_flips_with_crippled_expected_alpha(
            self, ray_session):
        """alpha near 0 makes the expected ESD pass admit far fewer
        deviates than the stage's 0.05 run — the guard must notice."""
        from pycatcher_ray.queries import esd_flag_rule_1h

        crippled = EngineConfig(esd_alpha=0.0001)
        out = _df(esd_flag_rule_1h(SF, expected_cfg=crippled))
        assert len(out) > 0
        assert not bool(out["flags_match_rule"].all())


class TestMediaHeaderCensus:
    def test_header_fields_match_direct_parse(self, ray_session):
        """The actor-pool decode's header fields must equal a direct
        stdlib parse of the same payloads (the oracle sweep pins the
        SQL side; this pins the engine side without DuckDB)."""
        import pyarrow.parquet as pq

        from pycatcher_ray.queries import media_header_census
        from pycatcher_ray.queries.events2 import media_input_path
        from pycatcher_ray.stages.multimodal import parse_png, parse_wav

        out = media_header_census(SF).to_pandas().set_index("media_id")
        t = pq.read_table(media_input_path())
        assert len(out) == t.num_rows
        for i in (0, 1, 2, 3):
            mime = t["mime"][i].as_py()
            p = t["payload"][i].as_py()
            row = out.loc[i]
            assert row["n_bytes"] == len(p)
            if mime == "image/png":
                w, h, _ = parse_png(p)
                assert (row["hdr_a"], row["hdr_b"]) == (w, h)
            else:
                rate, n_frames, _ = parse_wav(p)
                assert (row["hdr_a"], row["hdr_b"]) == (rate, n_frames)


class TestGuardsNonVacuous:
    def test_compared_flag_sets_are_non_empty(self, ray_session):
        """The guards' equality booleans must compare NON-EMPTY sets on
        this corpus (planted x10 token spikes; organic events
        anomalies), otherwise pinned-TRUE would be vacuous: every
        guarded method actually emits flags at sf0.001."""
        from pycatcher_ray.queries.detectors import _flags
        from pycatcher_ray.queries.tokens import _tokens_flags

        for m in ("stl", "esd"):
            assert _tokens_flags(SF, m).count() > 0
        for m in ("stl", "mstl", "esd"):
            assert _flags(SF, "1h", m).count() > 0


class TestPeriodParameterizedBuilders:
    """Name-parity closure for the last reference defs without compat
    twins (diagnostics.py:597/729/861/1001, catch.py:21,
    api_diagnostics.py:41, webapp.py:157)."""

    def _df(self):
        rng = np.random.default_rng(5)
        n = 120
        vals = (50 + 10 * np.sin(2 * np.pi * np.arange(n) / 7)
                + rng.normal(0, 1, n))
        vals[40] = 150.0
        return pd.DataFrame({
            "date": pd.date_range("2024-01-01", periods=n, freq="D"),
            "count": vals})

    def test_outlier_builders_flag_planted_spike(self):
        from pycatcher_ray.compat import (generate_outlier_plot_mstl,
                                          generate_outlier_plot_stl)

        df = self._df()
        o = generate_outlier_plot_stl(df, 7)
        assert pd.Timestamp("2024-02-10") in o.index
        om = generate_outlier_plot_mstl(df, 7)
        assert pd.Timestamp("2024-02-10") in om.index

    def test_seasonal_builders_return_components(self):
        from pycatcher_ray.compat import (generate_seasonal_plot_mstl,
                                          generate_seasonal_plot_stl)

        df = self._df()
        for fn in (generate_seasonal_plot_stl, generate_seasonal_plot_mstl):
            s = fn(df, 7)
            assert list(s.columns) == ["seasonal", "trend", "residuals",
                                       "actual_values"]
            assert len(s) == len(df)
            # the chosen decomposition reconstructs its own observed
            recon = s["seasonal"] + s["trend"] + s["residuals"]
            np.testing.assert_allclose(recon, s["actual_values"],
                                       rtol=0, atol=1e-8)

    def test_plot_response_and_routes_shims(self):
        from pycatcher_ray.compat import build_iqr_plot_data
        from pycatcher_ray.serving import (generate_plot_response,
                                           register_routes)

        r = generate_plot_response(build_iqr_plot_data, self._df())
        assert set(r) == {"plot_data"}
        assert r["plot_data"]["columns"][0] == "index"
        assert callable(register_routes())

    def test_setup_logging_rotating_file(self, tmp_path):
        import logging
        from logging.handlers import RotatingFileHandler

        from pycatcher_ray.serving import setup_logging

        d = str(tmp_path / "logs")
        lg = setup_logging(log_dir=d, debug=True)
        assert lg.level == logging.DEBUG
        lg.info("hello from the serving twin")
        # idempotent: a second call must not stack duplicate handlers
        lg2 = setup_logging(log_dir=d)
        rfh = [h for h in lg2.handlers
               if isinstance(h, RotatingFileHandler)]
        assert len(rfh) == 1 and lg2.level == logging.INFO
        for h in rfh:
            h.flush()
        text = (tmp_path / "logs" / "pycatcher.log").read_text()
        assert "hello from the serving twin" in text

    def test_setup_logger_level_env(self, monkeypatch):
        import logging

        from pycatcher_ray.compat import setup_logger

        monkeypatch.setenv("PYCATCHER_LOG_LEVEL", "DEBUG")
        lg = setup_logger()
        assert lg.level == logging.DEBUG and lg.handlers
