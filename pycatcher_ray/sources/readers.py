"""Input readers (reference parity: CSV upload at webapp.py:66-69, JSON
rows at api_catch.py:17-31, plus the engine-native Parquet path).

Parquet is the primary source (column pruning + row-group pushdown);
CSV/JSON exist for conformance with the reference's serving surface.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["read_table", "from_json_rows"]


def read_table(path_or_paths, *, columns=None, **kwargs):
    """Dispatch on extension: .parquet / .csv / .json(l)."""
    import ray.data as rd

    paths = (
        [path_or_paths] if isinstance(path_or_paths, str) else list(path_or_paths)
    )
    ext = paths[0].rsplit(".", 1)[-1].lower()
    if ext in ("parquet", "pq"):
        return rd.read_parquet(paths, columns=columns, **kwargs)
    if ext == "csv":
        ds = rd.read_csv(paths, **kwargs)
        return ds.select_columns(columns) if columns else ds
    if ext in ("json", "jsonl", "ndjson"):
        ds = rd.read_json(paths, **kwargs)
        return ds.select_columns(columns) if columns else ds
    raise ValueError(f"unsupported input extension: {ext}")


def from_json_rows(data: list[list], columns: list[str]):
    """The reference's FastAPI input contract (api_catch.py:17-31):
    row-lists + column names → Dataset."""
    import ray.data as rd

    arrays = list(zip(*data)) if data else [[] for _ in columns]
    table = pa.table({c: list(v) for c, v in zip(columns, arrays)})
    return rd.from_arrow(table)
