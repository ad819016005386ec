"""Retention enforcement: per-tier TTL on the cascading aggregates.

The north rule's "rollup + downsample + retention" triple: finer tiers
keep a short window (the coarser tiers retain the downsampled history),
so storage stays bounded — the continuous-aggregate retention policy of
time-series stores (e.g. Gorilla's 26h in-memory window, VLDB 2015).

A vectorized Arrow filter per batch; ``now`` is an explicit parameter
(never the wall clock inside a task) so distributed runs and reruns are
deterministic and resumable.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import TierSpec

__all__ = ["apply_retention", "DEFAULT_RETENTION"]

# keep 1m for 7 days, 1h for 90 days, 1d forever (None)
DEFAULT_RETENTION: dict[str, int | None] = {
    "1m": 7 * 86400,
    "1h": 90 * 86400,
    "1d": None,
}


def apply_retention(tier_ds, keep_seconds: int | None, now_epoch_s: int):
    """Drop buckets older than ``now - keep_seconds`` (None = keep all)."""
    if keep_seconds is None:
        return tier_ds
    cutoff = int(now_epoch_s) - int(keep_seconds)

    def fn(batch: pa.Table) -> pa.Table:
        unit = batch.schema.field("bucket_start").type.unit
        div = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
        epoch_s = pc.divide(batch["bucket_start"].cast(pa.int64()), div)
        return batch.filter(pc.greater_equal(epoch_s, cutoff))

    return tier_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
