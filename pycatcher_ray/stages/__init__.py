"""Ray Data stages: ingest, rollup/cascade, gap-fill, detect, compress."""

from .compress import add_chunk_id, compress, decompress_table
from .detect import DetectorActor, detect, detect_series, pack_series
from .gapfill import gapfill, gapfill_group
from .ingest import derive_ts, ingest, token_checksum_column, validate_batch
from .rollup import bucket_column, cascade, rollup, rollup_tiers

__all__ = [
    "add_chunk_id", "compress", "decompress_table",
    "DetectorActor", "detect", "detect_series", "pack_series",
    "gapfill", "gapfill_group",
    "derive_ts", "ingest", "token_checksum_column", "validate_batch",
    "bucket_column", "cascade", "rollup", "rollup_tiers",
]
