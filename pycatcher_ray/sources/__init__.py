"""Sources: deterministic token-table generator + format readers."""

from .readers import from_json_rows, read_table
from .tokensynth import TOKENS_SCHEMA, generate_tokens_table, write_tokens_dataset

__all__ = ["TOKENS_SCHEMA", "generate_tokens_table", "write_tokens_dataset",
           "read_table", "from_json_rows"]
