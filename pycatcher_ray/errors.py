"""Error contract mirroring the reference's exception taxonomy.

Reference: /root/reference/src/pycatcher/catch.py:1-80 defines
``DataValidationError`` and ``TimeSeriesError`` raised on invalid inputs
(None/empty frames, non-numeric feature columns, duplicate timestamps,
failed decompositions).  The engine keeps the same names and raise sites
so the ported conformance tests (tests/test_conformance_*.py) can assert
identical error behaviour.
"""


class PycatcherRayError(Exception):
    """Base class for all engine errors."""


class DataValidationError(PycatcherRayError):
    """Invalid input data (None/empty/malformed/duplicate timestamps)."""


class TimeSeriesError(PycatcherRayError):
    """Time-series processing failure (decomposition, frequency)."""
