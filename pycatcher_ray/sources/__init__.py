"""Sources: deterministic synthetic token-table generator."""

from .tokensynth import TOKENS_SCHEMA, generate_tokens_table, write_tokens_dataset

__all__ = ["TOKENS_SCHEMA", "generate_tokens_table", "write_tokens_dataset"]
