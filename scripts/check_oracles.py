"""Local replica of the driver's correctness gate: run each queries()
entry and its oracle_sql() on the same sf dir, compare row count, schema
(sorted column names) and order-insensitive values."""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd


def to_pandas(obj):
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    df = obj.to_pandas()  # ray Dataset
    if not len(df.columns):
        # Ray's to_pandas() on an empty dataset drops the columns even
        # when schema() knows them — rebuild the empty frame from it
        schema = obj.schema(fetch_if_missing=True)
        if schema is not None and schema.names:
            df = pd.DataFrame({n: pd.Series([], dtype=object)
                               for n in schema.names})
    return df


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            coerced = pd.to_numeric(df[c], errors="coerce")
            if coerced.notna().all() and len(df):
                df[c] = coerced.astype(float).round(6)
            else:
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, only: list[str] | None = None):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import os

    # tokens-native oracle SQL embeds an absolute synthesized-input path
    # (default sf0.01, the driver's gate sf) — point it at OUR sf dir
    os.environ["GRAFT_ORACLE_SF_DIR"] = sf_dir
    from pycatcher_ray.queries import oracles, queries

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, os_ = queries(), oracles()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        took = time.time() - t0
        sql = os_.get(name)
        if sql is None:
            print(f"ok   {name}: rows={len(got)} ({took:.1f}s) [rows-only]")
            continue
        want = canon(con.execute(sql).fetchdf())
        status = "ok  "
        if list(got.columns) != list(want.columns):
            status = "FAIL"
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        elif len(got) != len(want):
            status = "FAIL"
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
        else:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              rtol=0, atol=0)
            except AssertionError as e:
                status = "FAIL"
                print(f"FAIL {name}: values differ: {str(e)[:400]}")
        if status == "ok  ":
            print(f"ok   {name}: rows={len(got)} ({took:.1f}s)")
        else:
            failures += 1
    print(f"\n{failures} failures")
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    raise SystemExit(1 if main(sf, only) else 0)
