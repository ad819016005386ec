"""Shared fixtures.  Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield ray
    ray.shutdown()


@pytest.fixture
def iqr_known_outlier():
    """5 daily rows, values [1,2,3,100,4] — IQR flags exactly the 100
    (reference test_catch.py:67-75)."""
    return pd.DataFrame(
        {
            "date": pd.date_range("2022-01-01", periods=5, freq="D"),
            "value": [1, 2, 3, 100, 4],
        }
    )


@pytest.fixture
def decompose_100():
    """100-day trend+sin+noise with planted outliers at 25 and 75
    (reference test_catch.py:496-518)."""
    np.random.seed(42)
    n = 100
    values = (
        100
        + np.linspace(0, 10, n)
        + 5 * np.sin(np.linspace(0, 8 * np.pi, n))
        + np.random.normal(0, 0.1, n)
    )
    values[25] = 130.0
    values[75] = 70.0
    return pd.DataFrame(
        {"date": pd.date_range("2022-01-01", periods=n, freq="D"), "value": values}
    )
