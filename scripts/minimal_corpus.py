"""Degenerate minimal corpus: 1-4 rows per table, engineered so most
queries produce EMPTY or single-group results.  The robustness probe
behind the round-5 schema-stability work — run the full driver-style
gate against it with

    python scripts/minimal_corpus.py /tmp/minimal_corpus
    python scripts/check_oracles.py /tmp/minimal_corpus

Expected: 0 failures (zero flags / zero pairs / zero dups are
legitimate results and must keep their column lists and match the SQL
oracles' empty outputs).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def write_minimal_corpus(d: str, embeddings_source: str | None = None,
                         variant: int = 1):
    """variant=1: 1-4 rows per table.  variant=2: the harsher shape —
    ONE event, ONE document, ONE embedding vector (no rival centroid,
    no 1-NN neighbor, no pair anywhere)."""
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "ts": pa.array(np.array(
            ["2024-03-01T00:10:00", "2024-03-01T01:20:00",
             "2024-03-01T01:40:00", "2024-03-02T05:00:00"],
            dtype="datetime64[us]")),
        "user_id": pa.array([7, 7, 8, 9], type=pa.int64()),
        "event_type": pa.array(["click", "click", "click", "view"]),
        "value": pa.array([1.25, -2.5, 0.0, 10.125]),
        "props": pa.array(['{"k": 1}', '{"k": 0}', '{"k": 2}',
                           '{"k": 3}']),
    }), f"{d}/events.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["", "hello world hello"]),
        "lang": pa.array(["en", "en"]),
        "source": pa.array(["web", "web"]),
        "n_chars": pa.array([0, 17], type=pa.int32()),
    }), f"{d}/documents.parquet")
    if embeddings_source is None:
        embeddings_source = "/root/testdata/sf0.001/embeddings.parquet"
    emb = pq.read_table(embeddings_source)
    pq.write_table(emb.slice(0, 2 if variant == 1 else 1),
                   f"{d}/embeddings.parquet")
    if variant == 2:  # overwrite with the single-row shapes
        pq.write_table(pa.table({
            "event_id": pa.array([1], type=pa.int64()),
            "ts": pa.array(np.array(["2024-03-01T00:10:00"],
                                    dtype="datetime64[us]")),
            "user_id": pa.array([7], type=pa.int64()),
            "event_type": pa.array(["click"]),
            "value": pa.array([0.0]),
            "props": pa.array(['{"k": 1}']),
        }), f"{d}/events.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array([1], type=pa.int64()),
            "text": pa.array(["aaa aaa aaa"]),
            "lang": pa.array(["en"]),
            "source": pa.array(["web"]),
            "n_chars": pa.array([11], type=pa.int32()),
        }), f"{d}/documents.parquet")
    pq.write_table(pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(["AFRICA", "AMERICA", "ASIA", "EUROPE",
                            "MIDDLE EAST"])}), f"{d}/region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
    }), f"{d}/nation.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], type=pa.int64()),
        "c_name": pa.array(["Customer#1", "Customer#2"]),
        "c_nationkey": pa.array([0, 1], type=pa.int32()),
        "c_acctbal": pa.array([0.0, -10.5]),
        "c_mktsegment": pa.array(["BUILDING", "MACHINERY"]),
    }), f"{d}/customer.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1], type=pa.int64()),
        "s_name": pa.array(["Supplier#1"]),
        "s_nationkey": pa.array([2], type=pa.int32()),
        "s_acctbal": pa.array([5.25]),
    }), f"{d}/supplier.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], type=pa.int64()),
        "p_name": pa.array(["part 1", "part 2"]),
        "p_brand": pa.array(["Brand#12", "Brand#1"]),
        "p_type": pa.array(["PROMO", "ECONOMY"]),
        "p_size": pa.array([5, 40], type=pa.int32()),
        "p_retailprice": pa.array([1000.0, 1500.0]),
    }), f"{d}/part.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1], type=pa.int64()),
        "o_custkey": pa.array([1], type=pa.int64()),
        "o_orderstatus": pa.array(["O"]),
        "o_totalprice": pa.array([123.45]),
        "o_orderdate": pa.array(np.array(["1996-06-01"],
                                         dtype="datetime64[us]")),
        "o_orderpriority": pa.array(["1-URGENT"]),
    }), f"{d}/orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1], type=pa.int64()),
        "l_partkey": pa.array([1], type=pa.int64()),
        "l_suppkey": pa.array([1], type=pa.int64()),
        "l_linenumber": pa.array([1], type=pa.int32()),
        "l_quantity": pa.array([5.0]),
        "l_extendedprice": pa.array([5000.0]),
        "l_discount": pa.array([0.05]),
        "l_tax": pa.array([0.02]),
        "l_returnflag": pa.array(["N"]),
        "l_linestatus": pa.array(["O"]),
        "l_shipdate": pa.array(np.array(["1996-06-20"],
                                        dtype="datetime64[us]")),
    }), f"{d}/lineitem.parquet")
    return d


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/minimal_corpus"
    variant = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    write_minimal_corpus(out, variant=variant)
    print(out)
