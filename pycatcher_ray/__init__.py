"""pycatcher_ray — a Ray-Data-native time-series rollup + anomaly engine.

A from-scratch engine (NOT a port) with the query/data-processing
capabilities of the reference ``aseemanand/pycatcher``
(/root/reference), re-expressed Ray-Data-first per BASELINE.json:

- native input: Parquet tables of pre-tokenized sequences
  ``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)``;
- rollup + downsample + retention tiers (1m → 1h → 1d) via
  partial-aggregate ``map_batches`` + ``groupby().aggregate`` shuffles;
- gap-fill (LOCF + linear), Gorilla XOR / delta-of-delta chunk
  compression, and pycatcher's full detector suite (IQR, z-score, MAD,
  classical decomposition, STL, MSTL, Generalized/Seasonal ESD,
  moving-average) as stateful actor-pool stages over Arrow batches;
- resumable partitioned-Parquet output with per-partition lineage.

``pycatcher_ray.compat`` exposes the reference's public function names
over pandas DataFrames for conformance with the ported pytest suite.
"""

from .errors import DataValidationError, PycatcherRayError, TimeSeriesError

__version__ = "0.1.0"

__all__ = [
    "DataValidationError",
    "PycatcherRayError",
    "TimeSeriesError",
    "__version__",
]
