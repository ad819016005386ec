"""State: checkpoint manifests and resumable partitioned writes."""

from .checkpoint import CheckpointedWriter, hash_partition_column, stable_key_hash

__all__ = ["CheckpointedWriter", "hash_partition_column", "stable_key_hash"]
