"""TPC-H-shaped relational queries."""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import TIERS, EngineConfig
from ..stages.detect import detect
from ..stages.gapfill import gapfill
from ..stages.rollup import cascade, rollup

from ._core import (
    _rd,
    _round_cols,
    _round_exact,
)



def top_building_orders(sf_dir: str, cutoff: str = "1998-01-01",
                        k: int = 10):
    """TPC-H Q3 shape — the multi-table distributed equi-join: top-k
    BUILDING-segment orders by unshipped revenue.  Plan: the customer
    dimension is filtered and BROADCAST once (``ray.put`` key array, not
    re-shipped per batch); orders are semi-join-filtered against it
    map-side; lineitem revenue partials pre-aggregate per batch; both
    sides then meet in ONE orderkey-hash exchange where the join +
    final sum happen per shard; each shard emits only its top-k, so the
    driver sees ≤ k × num_shards rows.  Revenue sums are 4-dp rounded
    (_round_exact) and ORDER BY uses the rounded value with
    (orderdate, orderkey) tiebreaks — deterministic in both engines.
    NOTE: the paired oracle SQL hardcodes cutoff='1998-01-01' / k=10 —
    other arguments are library calls, not oracle-checked."""
    import ray

    from ..stages.shard import sharded_map_groups

    cut = np.datetime64(cutoff)

    cust = _rd().read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"]).to_pandas()
    keys_ref = ray.put(np.sort(
        cust.loc[cust["c_mktsegment"] == "BUILDING",
                 "c_custkey"].to_numpy(dtype=np.int64)))

    orders = _rd().read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"])

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(keys_ref)
        b = b[(b["o_orderdate"].to_numpy() < cut)
              & np.isin(b["o_custkey"].to_numpy(dtype=np.int64), keys,
                        assume_unique=False)]
        return pd.DataFrame({
            "okey": b["o_orderkey"].astype(np.int64),
            "o_orderdate": b["o_orderdate"],
            "o_orderpriority": b["o_orderpriority"],
            "rev": 0.0,
            "kind": np.int64(1),
        })

    line = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])

    def rev_partials(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_shipdate"].to_numpy() > cut]
        if not len(b):
            return pd.DataFrame({
                "okey": pd.Series([], dtype=np.int64),
                "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                "o_orderpriority": pd.Series([], dtype=object),
                "rev": pd.Series([], dtype=np.float64),
                "kind": pd.Series([], dtype=np.int64)})
        rev = (b["l_extendedprice"].to_numpy(dtype=np.float64)
               * (1.0 - b["l_discount"].to_numpy(dtype=np.float64)))
        agg = pd.DataFrame({
            "okey": b["l_orderkey"].to_numpy(dtype=np.int64), "rev": rev,
        }).groupby("okey", as_index=False)["rev"].sum()
        agg["o_orderdate"] = pd.NaT
        agg["o_orderpriority"] = ""
        agg["kind"] = np.int64(0)
        return agg[["okey", "o_orderdate", "o_orderpriority", "rev",
                    "kind"]]

    both = line.map_batches(rev_partials, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas"))

    def join_topk(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["kind"] == 1][["okey", "o_orderdate", "o_orderpriority"]]
        r = g[g["kind"] == 0].groupby("okey", as_index=False)["rev"].sum()
        j = o.merge(r, on="okey", how="inner")
        if not len(j):
            return pd.DataFrame(columns=[
                "o_orderkey", "o_orderdate", "o_orderpriority", "revenue"])
        j["revenue"] = _round_exact(j["rev"].to_numpy(dtype=np.float64))
        j = j.sort_values(["revenue", "o_orderdate", "okey"],
                          ascending=[False, True, True],
                          kind="stable").head(k)
        return pd.DataFrame({
            "o_orderkey": j["okey"].astype(np.int64),
            "o_orderdate": j["o_orderdate"],
            "o_orderpriority": j["o_orderpriority"],
            "revenue": j["revenue"]})

    partials = sharded_map_groups(both, "okey", join_topk)
    # ≤ k rows per shard reach the driver — bounded by the shard count,
    # not the data size
    out = partials.to_pandas()
    cols = ["o_orderkey", "o_orderdate", "o_orderpriority", "revenue"]
    if out.empty:  # globally empty exchange yields a column-less frame
        return pd.DataFrame(columns=cols)
    out = out.sort_values(
        ["revenue", "o_orderdate", "o_orderkey"],
        ascending=[False, True, True], kind="stable").head(k)
    return out.reset_index(drop=True)


def regional_supplier_revenue(sf_dir: str, region: str = "ASIA",
                              date_lo: str = "1996-01-01",
                              date_hi: str = "1997-01-01"):
    """TPC-H Q5 shape — the 6-table join: revenue from lineitems whose
    supplier and customer share a nation inside one region, grouped by
    nation.  Distributed plan (scale notes inline):

    - region ⋈ nation and supplier are BROADCAST (``ray.put`` once —
      both are O(nations)/O(10⁴·SF) dimension tables);
    - orders ⋈ customer is big-big → ONE custkey-hash exchange
      (order rows meet customer (custkey → nationkey) rows);
    - lineitem revenue partials pre-aggregate per batch after a
      map-side semi-join against the broadcast supplier map;
    - both sides meet in ONE orderkey-hash exchange where the
      c_nation = s_nation filter and per-nation partial sums happen;
      the driver folds ≤ nations × shards partial rows.

    Exactness: revenue is summed in integer 10⁻⁴ units —
    cents(price) × (100 − cents(discount)) in int64 — so the sum is
    order-independent and the final /10⁴ double divide is
    bit-deterministic against the SQL oracle (the float-sum form drifts
    past round(·,4) half-ties at this magnitude).  Reference anchor:
    engine-native join capability (SURVEY.md §2 joins; the reference has
    none)."""
    import ray

    from ..stages.shard import sharded_map_groups

    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)

    nat = _rd().read_parquet(
        os.path.join(sf_dir, "nation.parquet")).to_pandas()
    reg = _rd().read_parquet(
        os.path.join(sf_dir, "region.parquet")).to_pandas()
    rkey = reg.loc[reg["r_name"] == region, "r_regionkey"]
    region_nations = nat[nat["n_regionkey"].isin(set(rkey))]
    nation_name = dict(zip(region_nations["n_nationkey"].astype(int),
                           region_nations["n_name"]))
    nat_keys = np.sort(region_nations["n_nationkey"].to_numpy(np.int64))

    supp = _rd().read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp[supp["s_nationkey"].isin(set(nat_keys))]
    supp_ref = ray.put({int(k): int(v) for k, v in
                        zip(supp["s_suppkey"], supp["s_nationkey"])})
    nat_ref = ray.put(nat_keys)

    # --- exchange 1: orders ⋈ customer on custkey → (okey, c_nation) ---
    cust = _rd().read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"])

    def cust_rows(b: pd.DataFrame) -> pd.DataFrame:
        nk = ray.get(nat_ref)
        b = b[np.isin(b["c_nationkey"].to_numpy(np.int64), nk)]
        return pd.DataFrame({
            "ckey": b["c_custkey"].astype(np.int64),
            "okey": np.int64(-1),
            "nat": b["c_nationkey"].astype(np.int64),
            "kind": np.int64(1)})

    orders = _rd().read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def order_rows(b: pd.DataFrame) -> pd.DataFrame:
        d = b["o_orderdate"].to_numpy()
        b = b[(d >= lo) & (d < hi)]
        return pd.DataFrame({
            "ckey": b["o_custkey"].astype(np.int64),
            "okey": b["o_orderkey"].astype(np.int64),
            "nat": np.int64(-1),
            "kind": np.int64(0)})

    def join_cust(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["kind"] == 1][["ckey", "nat"]].drop_duplicates("ckey")
        o = g[g["kind"] == 0][["ckey", "okey"]]
        j = o.merge(c, on="ckey", how="inner")
        return pd.DataFrame({"okey": j["okey"], "c_nat": j["nat"],
                             "rev_i": np.int64(0), "s_nat": np.int64(-1),
                             "kind": np.int64(1)})

    o_nat = sharded_map_groups(
        orders.map_batches(order_rows, batch_format="pandas").union(
            cust.map_batches(cust_rows, batch_format="pandas")),
        "ckey", join_cust)

    # --- lineitem partials: semi-join suppliers map-side, int64 revenue
    line = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])

    def rev_partials(b: pd.DataFrame) -> pd.DataFrame:
        smap = ray.get(supp_ref)
        sk = b["l_suppkey"].to_numpy(np.int64)
        keep = np.isin(sk, np.fromiter(smap.keys(), np.int64,
                                       len(smap)) if smap else
                       np.empty(0, np.int64))
        b = b[keep]
        sk = sk[keep]
        price_c = np.rint(
            b["l_extendedprice"].to_numpy(np.float64) * 100).astype(np.int64)
        disc_c = np.rint(
            b["l_discount"].to_numpy(np.float64) * 100).astype(np.int64)
        part = pd.DataFrame({
            "okey": b["l_orderkey"].to_numpy(np.int64),
            "s_nat": np.array([smap[k] for k in sk], dtype=np.int64)
            if len(b) else np.empty(0, np.int64),
            "rev_i": price_c * (100 - disc_c),
        }).groupby(["okey", "s_nat"], as_index=False)["rev_i"].sum()
        part["c_nat"] = np.int64(-1)
        part["kind"] = np.int64(0)
        return part[["okey", "c_nat", "rev_i", "s_nat", "kind"]]

    def join_rev(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["kind"] == 1][["okey", "c_nat"]].drop_duplicates("okey")
        r = g[g["kind"] == 0][["okey", "s_nat", "rev_i"]]
        j = r.merge(o, on="okey", how="inner")
        j = j[j["s_nat"].to_numpy() == j["c_nat"].to_numpy()]
        return j.groupby("s_nat", as_index=False)["rev_i"].sum()

    parts = sharded_map_groups(
        line.map_batches(rev_partials, batch_format="pandas").union(o_nat),
        "okey", join_rev).to_pandas()
    if parts.empty or "s_nat" not in parts.columns:
        return pd.DataFrame({"n_name": pd.Series([], dtype=object),
                             "revenue": pd.Series([], dtype=float)})
    fin = parts.groupby("s_nat", as_index=False)["rev_i"].sum()
    fin["n_name"] = fin["s_nat"].map(nation_name)
    fin["revenue"] = fin["rev_i"].to_numpy(np.int64) / 1e4
    return fin.sort_values("revenue", ascending=False)[
        ["n_name", "revenue"]].reset_index(drop=True)


_Q5_ORACLE = """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND c_nationkey = s_nationkey
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate <  DATE '1997-01-01'
GROUP BY n_name
"""


def large_order_customers(sf_dir: str, min_qty: float = 250.0,
                          k: int = 100):
    """TPC-H Q18 shape — groupby-HAVING semi-join: the customers behind
    orders whose TOTAL lineitem quantity exceeds ``min_qty`` (the
    far-tail threshold: 25/204/2285 qualifying orders at
    sf0.001/0.01/0.1).  Distributed plan:

    - lineitem quantity partials pre-aggregate per batch (okey → qty
      sum) and meet the orders rows in ONE orderkey-hash exchange whose
      shard fn folds the totals, applies the HAVING filter and joins
      the order attrs in-shard;
    - qualifying orders are RARE by construction (HAVING sits in the
      quantity tail), so only that bounded set reaches the driver; its
      custkeys broadcast via ``ray.put`` and the customer table is
      filtered MAP-SIDE (never collected, never shuffled).

    Exactness: l_quantity holds small integers in double — every
    partial and total sum is exact in both engines, so the HAVING
    filter and the emitted total_qty are bit-deterministic.
    o_totalprice passes through unaggregated.  Deterministic LIMIT via
    (o_totalprice DESC, o_orderdate, o_orderkey) tiebreaks on both
    sides.  NOTE: the paired oracle hardcodes min_qty=250 / k=100.
    Reference anchor: engine-native join capability (SURVEY.md §2
    joins; the reference has none)."""
    import ray

    from ..stages.shard import sharded_map_groups

    orders = _rd().read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "okey": b["o_orderkey"].astype(np.int64),
            "ocust": b["o_custkey"].astype(np.int64),
            "o_orderdate": b["o_orderdate"],
            "o_totalprice": b["o_totalprice"].astype(np.float64),
            "qty": 0.0,
            "kind": np.int64(1),
        })

    line = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"])

    def qty_partials(b: pd.DataFrame) -> pd.DataFrame:
        agg = pd.DataFrame({
            "okey": b["l_orderkey"].to_numpy(dtype=np.int64),
            "qty": b["l_quantity"].to_numpy(dtype=np.float64),
        }).groupby("okey", as_index=False)["qty"].sum()
        agg["ocust"] = np.int64(0)
        agg["o_orderdate"] = pd.Series(
            pd.NaT, index=agg.index, dtype="datetime64[us]")
        agg["o_totalprice"] = 0.0
        agg["kind"] = np.int64(0)
        return agg[["okey", "ocust", "o_orderdate", "o_totalprice",
                    "qty", "kind"]]

    both = line.map_batches(qty_partials, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas"))

    def having_join(g: pd.DataFrame) -> pd.DataFrame:
        tot = g[g["kind"] == 0].groupby("okey", as_index=False)["qty"].sum()
        tot = tot[tot["qty"].to_numpy() > min_qty]
        o = g[g["kind"] == 1][["okey", "ocust", "o_orderdate",
                               "o_totalprice"]]
        j = o.merge(tot, on="okey", how="inner")
        return pd.DataFrame({
            "o_orderkey": j["okey"].astype(np.int64),
            "o_custkey": j["ocust"].astype(np.int64),
            "o_orderdate": j["o_orderdate"],
            "o_totalprice": j["o_totalprice"].astype(np.float64),
            "total_qty": j["qty"].astype(np.float64)})

    qual = sharded_map_groups(both, "okey", having_join).to_pandas()
    cols = ["c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty"]
    if qual.empty:
        return pd.DataFrame(columns=cols)

    keys_ref = ray.put(np.unique(qual["o_custkey"].to_numpy(
        dtype=np.int64)))

    def pick_customers(b: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(keys_ref)
        b = b[np.isin(b["c_custkey"].to_numpy(dtype=np.int64), keys)]
        return b[["c_custkey", "c_name"]]

    cust = _rd().read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"]).map_batches(
        pick_customers, batch_format="pandas").to_pandas()

    out = qual.merge(cust, left_on="o_custkey", right_on="c_custkey",
                     how="inner")
    out = out.sort_values(
        ["o_totalprice", "o_orderdate", "o_orderkey"],
        ascending=[False, True, True], kind="stable").head(k)
    return out[cols].reset_index(drop=True)


_Q18_ORACLE = """
WITH q AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       o.o_totalprice, q.total_qty
FROM q
JOIN orders o   ON o.o_orderkey = q.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
LIMIT 100
"""


def late_shipment_priority(sf_dir: str, days: int = 90):
    """TPC-H Q4 shape — EXISTS semi-join folded into one exchange:
    count of orders per priority having at least one lineitem shipped
    more than ``days`` days after the order date.  Distributed plan:
    lineitem reduces to per-orderkey MAX(l_shipdate) partials per batch
    (EXISTS(ship > cutoff) ≡ max(ship) > cutoff — the per-order state
    is ONE timestamp, not the lineitem rows), meets the order rows in
    one orderkey-hash exchange whose shard fn applies the lateness
    predicate and emits per-priority integer count partials; a tiny
    second exchange folds ≤ 5 × shards rows.  All-integer — bit-exact.
    NOTE: the paired oracle SQL hardcodes days=90."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    lag = np.timedelta64(days, "D")

    orders = _rd().read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "okey": b["o_orderkey"].astype(np.int64),
            "ts": b["o_orderdate"],
            "o_orderpriority": b["o_orderpriority"],
            "kind": np.int64(1),
        })

    line = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"])

    def ship_partials(b: pd.DataFrame) -> pd.DataFrame:
        agg = pd.DataFrame({
            "okey": b["l_orderkey"].to_numpy(dtype=np.int64),
            "ts": b["l_shipdate"],
        }).groupby("okey", as_index=False)["ts"].max()
        agg["o_orderpriority"] = ""
        agg["kind"] = np.int64(0)
        return agg[["okey", "ts", "o_orderpriority", "kind"]]

    both = line.map_batches(ship_partials, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas"))

    def late_counts(g: pd.DataFrame) -> pd.DataFrame:
        ship = g[g["kind"] == 0].groupby("okey", as_index=False)["ts"].max()
        o = g[g["kind"] == 1][["okey", "ts", "o_orderpriority"]].rename(
            columns={"ts": "odate"})
        j = o.merge(ship, on="okey", how="inner")
        j = j[j["ts"].to_numpy() > (j["odate"].to_numpy() + lag)]
        out = j.groupby("o_orderpriority", as_index=False).size().rename(
            columns={"size": "n_late"})
        out["n_late"] = out["n_late"].astype(np.int64)
        return out

    partials = sharded_map_groups(both, "okey", late_counts)
    return sharded_aggregate(partials, "o_orderpriority",
                             {"n_late": "sum"}, num_shards=4)


_Q4_ORACLE = """
SELECT o.o_orderpriority, count(*) AS n_late
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o.o_orderpriority
"""


def inactive_customers(sf_dir: str, cutoff: str = "2000-01-01"):
    """Distributed ANTI-join: customers with NO order on/after
    ``cutoff``, counted per market segment (the churn screen).  Plan:
    orders prune to (custkey) per-batch DISTINCT partials after the
    date filter; customer rows union in and both meet in one
    custkey-hash exchange whose shard fn drops every customer whose key
    has an order row (set difference inside the shard — a key's rows
    from both sides always co-locate); per-segment integer count
    partials fold in a tiny second exchange.  All-integer — bit-exact.
    NOTE: the paired oracle SQL hardcodes cutoff='2000-01-01'."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    cut = np.datetime64(cutoff)

    orders = _rd().read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate"])

    def active_partials(b: pd.DataFrame) -> pd.DataFrame:
        keys = np.unique(b.loc[b["o_orderdate"].to_numpy() >= cut,
                               "o_custkey"].to_numpy(dtype=np.int64))
        return pd.DataFrame({"ckey": keys,
                             "c_mktsegment": "",
                             "kind": np.int64(0)})

    cust = _rd().read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"])

    def tag_cust(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"ckey": b["c_custkey"].astype(np.int64),
                             "c_mktsegment": b["c_mktsegment"],
                             "kind": np.int64(1)})

    both = orders.map_batches(active_partials, batch_format="pandas").union(
        cust.map_batches(tag_cust, batch_format="pandas"))

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        active = g.loc[g["kind"] == 0, "ckey"].to_numpy(dtype=np.int64)
        c = g[g["kind"] == 1]
        c = c[~np.isin(c["ckey"].to_numpy(dtype=np.int64),
                       np.unique(active))]
        out = c.groupby("c_mktsegment", as_index=False).size().rename(
            columns={"size": "n_inactive"})
        out["n_inactive"] = out["n_inactive"].astype(np.int64)
        return out

    partials = sharded_map_groups(both, "ckey", anti)
    return sharded_aggregate(partials, "c_mktsegment",
                             {"n_inactive": "sum"}, num_shards=4)


_ANTI_JOIN_ORACLE = """
SELECT c.c_mktsegment, count(*) AS n_inactive
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c.c_mktsegment
"""


_Q3_ORACLE = """
SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 10
"""


# ------------------------------------------------------- lineitem query


def lineitem_pricing_summary(sf_dir: str):
    """TPC-H Q1-style pricing summary: vectorized Arrow compute +
    partial/final aggregation — demonstrates the general batch-transform
    + aggregate path on a non-time-series table."""
    ds = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_shipdate",
        ],
    )
    cutoff = pa.scalar(pd.Timestamp("1998-09-02"), pa.timestamp("us"))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        disc = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": batch["l_quantity"],
                "base": batch["l_extendedprice"],
                "disc_price": disc,
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base", "sum"), ("disc_price", "sum"),
             ("qty", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "p_qty", "p_base", "p_disc", "p_n"]
        )

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]
    ).aggregate(
        Sum("p_qty", alias_name="sum_qty"),
        Sum("p_base", alias_name="sum_base_price"),
        Sum("p_disc", alias_name="sum_disc_price"),
        Sum("p_n", alias_name="count_order"),
    )
    return _round_cols(agg, ("sum_qty", "sum_base_price", "sum_disc_price"))


_LINEITEM_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------- TPC-H Q6 / Q14 shapes


def tpch_q6_revenue(sf_dir: str, date_lo: str = "1996-01-01",
                    date_hi: str = "1997-01-01"):
    """TPC-H Q6 shape — the pure filter-aggregate: forecast revenue
    change from lineitems in a date window with discount 5-7 % and
    quantity < 24.  Map-only: predicate + per-batch integer partials
    (10⁻⁴ units, cents(price)·cents(discount)) with NO shuffle — the
    driver folds one row per batch.  Columns are pruned at the read."""
    lo = pa.scalar(pd.Timestamp(date_lo), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp(date_hi), pa.timestamp("us"))

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        disc_c = pc.cast(pc.round(pc.multiply(
            b["l_discount"], pa.scalar(100.0))), pa.int64())
        keep = pc.and_(
            pc.and_(pc.greater_equal(b["l_shipdate"], lo),
                    pc.less(b["l_shipdate"], hi)),
            pc.and_(
                pc.and_(pc.greater_equal(disc_c, pa.scalar(5, pa.int64())),
                        pc.less_equal(disc_c, pa.scalar(7, pa.int64()))),
                pc.less(b["l_quantity"], pa.scalar(24.0))))
        b = b.filter(keep)
        disc_c = pc.cast(pc.round(pc.multiply(
            b["l_discount"], pa.scalar(100.0))), pa.int64())
        price_c = pc.cast(pc.round(pc.multiply(
            b["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        rev = pc.sum(pc.multiply(price_c, disc_c)).as_py() or 0
        return pa.table({"rev_i": pa.array([rev], pa.int64()),
                         "n": pa.array([b.num_rows], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    rev_i = int(parts["rev_i"].sum())
    return pd.DataFrame({
        # NaN (float dtype) over an empty window, matching SQL sum()'s
        # NULL — Python None makes the column object dtype and fails
        # the float compare (found by the relational fuzz)
        "revenue": [float(rev_i) / 10000.0 if n else float("nan")],
        "n_lines": [n]})


_Q6_ORACLE = """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


def promo_revenue_share(sf_dir: str, date_lo: str = "1996-01-01",
                        date_hi: str = "1996-04-01"):
    """TPC-H Q14 shape — promo revenue share: % of discounted revenue
    in a date window from parts of type PROMO.  The part side collapses
    to a BITSET-sized broadcast (the sorted promo partkey array via
    ``ray.put`` — O(parts/8) bytes, read once per task, never per
    batch); lineitem partials are map-side ``np.isin`` tags + integer
    sums, NO shuffle at all.  The share is one double divide of two
    exact 10⁻⁴-unit integers (numerator ×100 for percent)."""
    import ray

    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)

    part = _rd().read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_type"]).to_pandas()
    promo = np.sort(part.loc[part["p_type"] == "PROMO",
                             "p_partkey"].to_numpy(np.int64))
    promo_ref = ray.put(promo)

    line = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        d = b["l_shipdate"].to_numpy()
        b = b[(d >= lo) & (d < hi)]
        price_c = np.rint(
            b["l_extendedprice"].to_numpy(np.float64) * 100).astype(np.int64)
        disc_c = np.rint(
            b["l_discount"].to_numpy(np.float64) * 100).astype(np.int64)
        rev = price_c * (100 - disc_c)
        is_promo = np.isin(b["l_partkey"].to_numpy(np.int64),
                           ray.get(promo_ref))
        return pd.DataFrame({
            "promo_i": [int(rev[is_promo].sum())],
            "total_i": [int(rev.sum())]})

    parts = line.map_batches(partials, batch_format="pandas").to_pandas()
    promo_i = int(parts["promo_i"].sum())
    total_i = int(parts["total_i"].sum())
    return pd.DataFrame({
        "promo_revenue": [float(promo_i) / 10000.0],
        "total_revenue": [float(total_i) / 10000.0],
        "promo_share_pct": [
            float(100 * promo_i) / float(total_i) if total_i
            else float("nan")]})


def mktsegment_revenue(sf_dir: str, date_lo: str = "1996-01-01",
                       date_hi: str = "1997-01-01"):
    """Order revenue by customer market segment over a date window —
    the big-big join shape (orders ⋈ customer) resolved with ONE
    custkey-hash exchange (Q5's first leg): order rows and customer
    (custkey → segment) rows meet in the same shard, segment partials
    fold per shard, the driver sees ≤ segments × shards rows.  Revenue
    is an exact integer cents sum; the /100 divide is the only float op."""
    from ..stages.shard import sharded_map_groups

    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)

    cust = _rd().read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"])

    def cust_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ckey": b["c_custkey"].astype(np.int64),
            "seg": b["c_mktsegment"].astype(str),
            "price_c": np.int64(0),
            "kind": np.int64(1)})

    orders = _rd().read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def order_rows(b: pd.DataFrame) -> pd.DataFrame:
        d = b["o_orderdate"].to_numpy()
        b = b[(d >= lo) & (d < hi)]
        return pd.DataFrame({
            "ckey": b["o_custkey"].astype(np.int64),
            "seg": "",
            "price_c": np.rint(b["o_totalprice"].to_numpy(np.float64)
                               * 100).astype(np.int64),
            "kind": np.int64(0)})

    def join_seg(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["kind"] == 1][["ckey", "seg"]].drop_duplicates("ckey")
        o = g[g["kind"] == 0][["ckey", "price_c"]]
        j = o.merge(c, on="ckey", how="inner")
        agg = j.groupby("seg", as_index=False).agg(
            n_orders=("price_c", "size"), rev_c=("price_c", "sum"))
        return agg

    parts = sharded_map_groups(
        orders.map_batches(order_rows, batch_format="pandas").union(
            cust.map_batches(cust_rows, batch_format="pandas")),
        "ckey", join_seg).to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "segment": pd.Series([], dtype=object),
            "n_orders": pd.Series([], dtype=np.int64),
            "revenue": pd.Series([], dtype=float)})
    fin = parts.groupby("seg", as_index=False).agg(
        n_orders=("n_orders", "sum"), rev_c=("rev_c", "sum"))
    return pd.DataFrame({
        "segment": fin["seg"],
        "n_orders": fin["n_orders"].astype(np.int64),
        "revenue": fin["rev_c"].to_numpy(np.int64) / 100.0})


def returned_item_customers(sf_dir: str, k: int = 20):
    """TPC-H Q10 shape — which customers returned the most revenue in a
    quarter.  Plan: lineitem R-flag revenue partials pre-aggregate per
    batch in integer 10⁻⁴ units (cents(price) × (100 − cents(discount))
    in int64, order-independent sum), meet the date-filtered orders
    projection in ONE orderkey-hash exchange, re-key to custkey, and a
    second custkey exchange computes per-shard top-k — the driver sees
    ≤ k·shards rows, never the customer-level table.  The customer
    dimension attaches AFTER top-k by filtering the dimension read
    against the ≤ k winning keys (a broadcast semi-join, not a shuffle).
    Ties at rank k break on custkey in both engines.
    NOTE: the paired oracle hardcodes the 1996Q1 window and k=20."""
    import ray

    from ..stages.shard import sharded_map_groups

    lo, hi = np.datetime64("1996-01-01"), np.datetime64("1996-04-01")

    orders = _rd().read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        d = b["o_orderdate"].to_numpy()
        b = b[(d >= lo) & (d < hi)]
        return pd.DataFrame({
            "okey": b["o_orderkey"].astype(np.int64),
            "custkey": b["o_custkey"].astype(np.int64),
            "rev_i": np.zeros(len(b), dtype=np.int64),
            "kind": np.ones(len(b), dtype=np.int64)})

    line = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"])

    def rev_partials(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_returnflag"] == "R"]
        rev = (np.round(b["l_extendedprice"].to_numpy(np.float64) * 100)
               .astype(np.int64)
               * (100 - np.round(b["l_discount"].to_numpy(np.float64) * 100)
                  .astype(np.int64)))
        agg = pd.DataFrame({
            "okey": b["l_orderkey"].to_numpy(np.int64), "rev_i": rev,
        }).groupby("okey", as_index=False)["rev_i"].sum()
        agg["custkey"] = np.int64(0)
        agg["kind"] = np.int64(0)
        return agg[["okey", "custkey", "rev_i", "kind"]]

    both = line.map_batches(rev_partials, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas"))

    def join_orders(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["kind"] == 1][["okey", "custkey"]]
        r = g[g["kind"] == 0].groupby("okey", as_index=False)["rev_i"].sum()
        return o.merge(r, on="okey", how="inner")[["custkey", "rev_i"]]

    per_order = sharded_map_groups(both, "okey", join_orders)

    def shard_topk(shard: pd.DataFrame) -> pd.DataFrame:
        s = shard.groupby("custkey", as_index=False)["rev_i"].sum()
        return s.sort_values(["rev_i", "custkey"],
                             ascending=[False, True], kind="stable").head(k)

    parts = sharded_map_groups(per_order, "custkey", shard_topk)
    out = parts.to_pandas()
    cols = ["c_custkey", "c_name", "revenue"]
    if out.empty:
        return pd.DataFrame({
            "c_custkey": pd.Series([], dtype=np.int64),
            "c_name": pd.Series([], dtype=object),
            "revenue": pd.Series([], dtype=np.float64)})
    out = out.sort_values(["rev_i", "custkey"],
                          ascending=[False, True], kind="stable").head(k)
    win_ref = ray.put(np.sort(out["custkey"].to_numpy(np.int64)))

    def pick_names(b: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(win_ref)
        return b[np.isin(b["c_custkey"].to_numpy(np.int64), keys)]

    names = _rd().read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"]).map_batches(
        pick_names, batch_format="pandas").to_pandas()
    out = out.merge(names.rename(columns={"c_custkey": "custkey"}),
                    on="custkey", how="left")
    return pd.DataFrame({
        "c_custkey": out["custkey"].astype(np.int64),
        "c_name": out["c_name"],
        "revenue": out["rev_i"].to_numpy(np.int64) / 10000.0})[cols]


_Q10_ORACLE = """
WITH rev AS (
  SELECT o_custkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_i
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1996-04-01'
  GROUP BY o_custkey
)
SELECT c_custkey, c_name, CAST(rev_i AS DOUBLE) / 10000.0 AS revenue
FROM rev JOIN customer ON o_custkey = c_custkey
QUALIFY row_number() OVER (ORDER BY rev_i DESC, c_custkey) <= 20
"""


_MKTSEG_ORACLE = """
SELECT c_mktsegment AS segment, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_mktsegment
"""


_Q14_ORACLE = """
WITH l AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_i,
         p_type = 'PROMO' AS is_promo
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
)
SELECT CAST(coalesce(sum(rev_i) FILTER (is_promo), 0) AS DOUBLE)
         / 10000.0 AS promo_revenue,
       CAST(coalesce(sum(rev_i), 0) AS DOUBLE) / 10000.0 AS total_revenue,
       CASE WHEN coalesce(sum(rev_i), 0) <> 0 THEN
         CAST(100 * coalesce(sum(rev_i) FILTER (is_promo), 0) AS DOUBLE)
           / CAST(sum(rev_i) AS DOUBLE)
       ELSE NULL END AS promo_share_pct
FROM l
"""


def tpch_q7_volume_shipping(sf_dir: str, nation_a: str = "NATION_13",
                            nation_b: str = "NATION_19",
                            date_lo: str = "1996-01-01",
                            date_hi: str = "1998-01-01"):
    """TPC-H Q7 shape — volume shipping between two nations, both
    directions, by year.  Distributed plan: nation + supplier broadcast
    (dimension tables); orders ⋈ customer rides ONE custkey-hash
    exchange (pre-filtered map-side to the two customer nations via the
    broadcast customer-nation keys); lineitem revenue partials
    pre-aggregate per (okey, supp_nation, year) after a map-side
    semi-join against the broadcast supplier map; both sides meet in
    ONE orderkey-hash exchange where the cross-nation pair filter and
    the (supp, cust, year) partial sums happen — the driver folds
    ≤ 2 × years × shards rows.  Revenue in integer 10⁻⁴ units (the Q5
    order-independent-sum trick).
    NOTE: the paired oracle hardcodes NATION_13/NATION_19, 1996-1997."""
    import ray

    from ..stages.shard import sharded_map_groups

    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)

    nat = _rd().read_parquet(
        os.path.join(sf_dir, "nation.parquet")).to_pandas()
    pair = nat[nat["n_name"].isin([nation_a, nation_b])]
    nation_name = dict(zip(pair["n_nationkey"].astype(int),
                           pair["n_name"]))
    pair_keys = np.sort(pair["n_nationkey"].to_numpy(np.int64))

    supp = _rd().read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp[supp["s_nationkey"].isin(set(pair_keys))]
    supp_ref = ray.put({int(k): int(v) for k, v in
                        zip(supp["s_suppkey"], supp["s_nationkey"])})
    pair_ref = ray.put(pair_keys)

    # --- exchange 1: orders ⋈ customer on custkey → (okey, c_nat) ---
    cust = _rd().read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"])

    def cust_rows(b: pd.DataFrame) -> pd.DataFrame:
        nk = ray.get(pair_ref)
        b = b[np.isin(b["c_nationkey"].to_numpy(np.int64), nk)]
        return pd.DataFrame({
            "ckey": b["c_custkey"].astype(np.int64),
            "okey": np.int64(-1),
            "nat": b["c_nationkey"].astype(np.int64),
            "kind": np.int64(1)})

    orders = _rd().read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"])

    def order_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ckey": b["o_custkey"].astype(np.int64),
            "okey": b["o_orderkey"].astype(np.int64),
            "nat": np.int64(-1),
            "kind": np.int64(0)})

    def join_cust(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["kind"] == 1][["ckey", "nat"]].drop_duplicates("ckey")
        o = g[g["kind"] == 0][["ckey", "okey"]]
        j = o.merge(c, on="ckey", how="inner")
        return pd.DataFrame({"okey": j["okey"], "c_nat": j["nat"],
                             "rev_i": np.int64(0), "s_nat": np.int64(-1),
                             "year": np.int64(-1), "kind": np.int64(1)})

    o_nat = sharded_map_groups(
        orders.map_batches(order_rows, batch_format="pandas").union(
            cust.map_batches(cust_rows, batch_format="pandas")),
        "ckey", join_cust)

    # --- lineitem partials: shipdate window + broadcast supplier semi ---
    line = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"])

    def rev_partials(b: pd.DataFrame) -> pd.DataFrame:
        smap = ray.get(supp_ref)
        d = b["l_shipdate"].to_numpy()
        b = b[(d >= lo) & (d < hi)]
        sk = b["l_suppkey"].to_numpy(np.int64)
        keys = (np.fromiter(smap.keys(), np.int64, len(smap)) if smap
                else np.empty(0, np.int64))
        keep = np.isin(sk, keys)
        b = b[keep]
        sk = sk[keep]
        price_c = np.rint(
            b["l_extendedprice"].to_numpy(np.float64) * 100).astype(np.int64)
        disc_c = np.rint(
            b["l_discount"].to_numpy(np.float64) * 100).astype(np.int64)
        years = b["l_shipdate"].dt.year.to_numpy(np.int64)
        part = pd.DataFrame({
            "okey": b["l_orderkey"].to_numpy(np.int64),
            "s_nat": np.array([smap[k] for k in sk], dtype=np.int64)
            if len(b) else np.empty(0, np.int64),
            "year": years,
            "rev_i": price_c * (100 - disc_c),
        }).groupby(["okey", "s_nat", "year"], as_index=False)["rev_i"].sum()
        part["c_nat"] = np.int64(-1)
        part["kind"] = np.int64(0)
        return part[["okey", "c_nat", "rev_i", "s_nat", "year", "kind"]]

    def join_rev(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["kind"] == 1][["okey", "c_nat"]].drop_duplicates("okey")
        r = g[g["kind"] == 0][["okey", "s_nat", "year", "rev_i"]]
        j = r.merge(o, on="okey", how="inner")
        j = j[j["s_nat"].to_numpy() != j["c_nat"].to_numpy()]
        return j.groupby(["s_nat", "c_nat", "year"],
                         as_index=False)["rev_i"].sum()

    parts = sharded_map_groups(
        line.map_batches(rev_partials, batch_format="pandas").union(o_nat),
        "okey", join_rev).to_pandas()
    cols = ["supp_nation", "cust_nation", "l_year", "revenue"]
    if parts.empty or "s_nat" not in parts.columns:
        return pd.DataFrame({
            "supp_nation": pd.Series([], dtype=object),
            "cust_nation": pd.Series([], dtype=object),
            "l_year": pd.Series([], dtype=np.int64),
            "revenue": pd.Series([], dtype=np.float64)})
    fin = parts.groupby(["s_nat", "c_nat", "year"],
                        as_index=False)["rev_i"].sum()
    fin["supp_nation"] = fin["s_nat"].map(nation_name)
    fin["cust_nation"] = fin["c_nat"].map(nation_name)
    fin["l_year"] = fin["year"].astype(np.int64)
    fin["revenue"] = fin["rev_i"].to_numpy(np.int64) / 1e4
    return fin.sort_values(["supp_nation", "cust_nation", "l_year"])[
        cols].reset_index(drop=True)


_Q7_ORACLE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000 AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_19')
    OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_13'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def tpch_q19_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape — disjunctive broadcast-join predicate: revenue
    from lineitems matching ANY of three (brand, size-range,
    quantity-range) branches.  The part dimension broadcasts once
    (``ray.put`` of partkey → (brand-id, size) arrays); each lineitem
    batch evaluates the whole disjunction vectorized map-side and emits
    ONE integer partial row — NO shuffle at all.  Revenue in 10⁻⁴
    integer units (order-independent).  Adapted to this schema's
    columns (no containers/shipmode in the synth part/lineitem).
    NOTE: the paired oracle hardcodes the three branches."""
    import ray

    branches = (  # (brand, size_hi, qty_lo, qty_hi)
        ("Brand#12", 15, 1.0, 11.0),
        ("Brand#23", 25, 10.0, 20.0),
        ("Brand#3", 35, 20.0, 30.0),
    )

    part = _rd().read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_size"]).to_pandas()
    brand_id = {b: i for i, (b, *_rest) in enumerate(branches)}
    part["bid"] = part["p_brand"].map(brand_id).fillna(-1).astype(np.int64)
    part = part[part["bid"] >= 0]
    part_ref = ray.put({
        int(k): (int(b), int(s)) for k, b, s in
        zip(part["p_partkey"], part["bid"], part["p_size"])})

    line = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        pmap = ray.get(part_ref)
        pk = b["l_partkey"].to_numpy(np.int64)
        keys = (np.fromiter(pmap.keys(), np.int64, len(pmap)) if pmap
                else np.empty(0, np.int64))
        keep = np.isin(pk, keys)
        b = b[keep]
        pk = pk[keep]
        if not len(b):
            return pd.DataFrame({"rev_i": pd.Series([0], dtype=np.int64),
                                 "n": pd.Series([0], dtype=np.int64)})
        bid = np.array([pmap[k][0] for k in pk], dtype=np.int64)
        size = np.array([pmap[k][1] for k in pk], dtype=np.int64)
        qty = b["l_quantity"].to_numpy(np.float64)
        mask = np.zeros(len(b), dtype=bool)
        for i, (_brand, size_hi, qlo, qhi) in enumerate(branches):
            mask |= ((bid == i) & (size >= 1) & (size <= size_hi)
                     & (qty >= qlo) & (qty <= qhi))
        b = b[mask]
        price_c = np.rint(
            b["l_extendedprice"].to_numpy(np.float64) * 100).astype(np.int64)
        disc_c = np.rint(
            b["l_discount"].to_numpy(np.float64) * 100).astype(np.int64)
        rev = int((price_c * (100 - disc_c)).sum())
        return pd.DataFrame({"rev_i": pd.Series([rev], dtype=np.int64),
                             "n": pd.Series([len(b)], dtype=np.int64)})

    parts = line.map_batches(partial, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    rev_i = int(parts["rev_i"].sum())
    return pd.DataFrame({
        # NaN (float dtype) over an empty window, matching SQL sum()'s
        # NULL — Python None makes the column object dtype and fails
        # the float compare (found by the relational fuzz)
        "revenue": [float(rev_i) / 10000.0 if n else float("nan")],
        "n_lines": [n]})


_Q19_ORACLE = """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000 AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


def customer_order_distribution(sf_dir: str):
    """TPC-H Q13 shape — the customer-distribution double aggregate:
    how many customers placed exactly N orders, INCLUDING the
    zero-order customers a plain join drops.  Distributed plan: orders
    reduce to per-custkey integer count partials per batch; customers
    tag (kind 1) and meet them in ONE custkey-hash exchange whose shard
    fn left-attaches counts (missing → 0) and emits per-N histogram
    partials; a tiny second exchange folds ≤ |distinct N| × shards
    rows.  All-integer — bit-exact.  Reference cited in SURVEY §2
    (TPC-H family)."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    cust = _rd().read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"])

    def tag_cust(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ckey": b["c_custkey"].to_numpy(np.int64),
            "cnt": np.int64(0),
            "kind": np.int64(1)})

    orders = _rd().read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"])

    def order_partials(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby("o_custkey", as_index=False).size()
             .rename(columns={"o_custkey": "ckey", "size": "cnt"}))
        g["cnt"] = g["cnt"].astype(np.int64)
        g["kind"] = np.int64(0)
        return g[["ckey", "cnt", "kind"]]

    both = orders.map_batches(order_partials, batch_format="pandas").union(
        cust.map_batches(tag_cust, batch_format="pandas"))

    def histo(shard: pd.DataFrame) -> pd.DataFrame:
        kinds = shard["kind"].to_numpy()
        oc = (shard[kinds == 0].groupby("ckey", as_index=False)
              ["cnt"].sum())
        c = shard.loc[kinds == 1, ["ckey"]].merge(oc, on="ckey",
                                                  how="left")
        n_orders = c["cnt"].fillna(0).astype(np.int64)
        out = (pd.DataFrame({"n_orders": n_orders})
               .groupby("n_orders", as_index=False).size()
               .rename(columns={"size": "n_customers"}))
        out["n_customers"] = out["n_customers"].astype(np.int64)
        return out

    parts = sharded_map_groups(both, "ckey", histo)
    return sharded_aggregate(parts, "n_orders",
                             {"n_customers": "sum"}, num_shards=2)


_Q13_ORACLE = """
WITH c AS (
  SELECT c.c_custkey, count(o.o_custkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1
)
SELECT n_orders, count(*) AS n_customers FROM c GROUP BY n_orders
"""


def supplier_diversity_by_part(sf_dir: str):
    """TPC-H Q16 shape adapted to this schema (no partsupp table):
    distinct SUPPLIERS serving each (p_brand, p_size) part class,
    counted through lineitem.  The part dimension broadcasts once
    (``ray.put`` of partkey → (brand, size)); each lineitem batch
    attaches it map-side and dedups to (brand, size, suppkey) partials
    BEFORE the exchange (shuffle volume is bounded by
    |classes|×|suppliers|×batches, never the lineitem row count); one
    exchange on the class key finishes the global distinct count.
    All-integer."""
    import ray

    from ..stages.shard import sharded_map_groups

    part = _rd().read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_size"]).to_pandas()
    brands, bcodes = np.unique(part["p_brand"].to_numpy(), return_inverse=True)
    part_ref = ray.put((
        part["p_partkey"].to_numpy(np.int64),
        bcodes.astype(np.int64),
        part["p_size"].to_numpy(np.int64),
        brands))

    line = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        pk, bid, size, _brands = ray.get(part_ref)
        order = np.argsort(pk, kind="stable")
        pos = np.searchsorted(pk, b["l_partkey"].to_numpy(np.int64),
                              sorter=order)
        idx = order[np.clip(pos, 0, pk.size - 1)]
        # every l_partkey exists in part (FK), but guard anyway
        ok = pk[idx] == b["l_partkey"].to_numpy(np.int64)
        out = pd.DataFrame({
            "bid": bid[idx[ok]],
            "p_size": size[idx[ok]],
            "suppkey": b["l_suppkey"].to_numpy(np.int64)[ok]})
        return out.drop_duplicates()

    pairs = line.map_batches(partial, batch_format="pandas")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        _pk, _bid, _size, brands = ray.get(part_ref)
        u = shard.drop_duplicates()
        g = (u.groupby(["bid", "p_size"], as_index=False)["suppkey"]
             .nunique().rename(columns={"suppkey": "n_suppliers"}))
        return pd.DataFrame({
            "p_brand": brands[g["bid"].to_numpy(np.int64)],
            "p_size": g["p_size"].astype(np.int64),
            "n_suppliers": g["n_suppliers"].astype(np.int64)})

    return sharded_map_groups(pairs, ["bid", "p_size"], fold)


_Q16_ORACLE = """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem JOIN part ON p_partkey = l_partkey
GROUP BY 1, 2
"""


def top_supplier_revenue(sf_dir: str, date_lo: str = "1996-01-01",
                         date_hi: str = "1996-04-01"):
    """TPC-H Q15 shape — the top supplier(s) by revenue in a quarter
    (ALL ties at the max, per spec).  Distributed plan: lineitem
    filters the shipdate window and pre-aggregates per-suppkey integer
    10⁻⁴-unit revenue partials per batch; ONE suppkey exchange
    finishes the per-supplier sums; each shard emits only its own
    max-tied rows, so the driver folds ≤ |shards| × ties rows (bounded
    by the supplier dimension, never lineitem).  Supplier names attach
    AFTER the max by a dimension read of only the winning keys' rows.
    Revenue is an exact int64 sum → the global max / tie compare is
    bit-deterministic; the one double divide happens at emit."""
    from ..stages.shard import sharded_map_groups

    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)

    line = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b["l_shipdate"].to_numpy()
        b = b[(d >= lo) & (d < hi)]
        price_c = np.rint(
            b["l_extendedprice"].to_numpy(np.float64) * 100).astype(np.int64)
        disc_c = np.rint(
            b["l_discount"].to_numpy(np.float64) * 100).astype(np.int64)
        out = pd.DataFrame({
            "skey": b["l_suppkey"].to_numpy(np.int64),
            "rev_i": price_c * (100 - disc_c)})
        return out.groupby("skey", as_index=False)["rev_i"].sum()

    parts = line.map_batches(partial, batch_format="pandas")

    def shard_max(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.groupby("skey", as_index=False)["rev_i"].sum()
        return g[g["rev_i"] == g["rev_i"].max()]

    cand = sharded_map_groups(parts, "skey", shard_max).to_pandas()
    if not len(cand):
        return pd.DataFrame({
            "s_suppkey": pd.Series([], dtype=np.int64),
            "s_name": pd.Series([], dtype=object),
            "total_revenue": pd.Series([], dtype=np.float64)})
    best = int(cand["rev_i"].max())
    win = cand[cand["rev_i"] == best]

    sup = _rd().read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"]).to_pandas()
    out = win.merge(sup, left_on="skey", right_on="s_suppkey")
    return pd.DataFrame({
        "s_suppkey": out["s_suppkey"].astype(np.int64),
        "s_name": out["s_name"],
        "total_revenue": out["rev_i"].astype(np.float64) / 10000.0})


_Q15_ORACLE = """
WITH r AS (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_i
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(rev_i AS DOUBLE) / 10000.0 AS total_revenue
FROM r JOIN supplier ON s_suppkey = l_suppkey
WHERE rev_i = (SELECT max(rev_i) FROM r)
"""


def small_qty_brand_revenue(sf_dir: str):
    """TPC-H Q17 shape generalized per brand — the lost-revenue probe:
    for each part, lineitems with quantity below 20 % of that part's
    average quantity; their extended price summed per BRAND and
    annualized (/7 per spec).  The quantity filter is INTEGER-exact:
    q < 0.2·(S/N) ⟺ 5·q·N < S with q, S, N exact int64 (quantities
    are integral; 5·50·N can't overflow).  Distributed plan: per batch
    lineitem collapses to (partkey, q) partials carrying row count +
    integer price-cents sums (cardinality ≤ parts × 50 distinct
    quantities, NOT the lineitem row count); ONE partkey exchange
    finishes per-part S, N and applies the compare; qualifying price
    partials fold per-brand map-side against the broadcast part
    dimension and a tiny brand exchange finishes.  One double divide
    per brand at emit."""
    import ray

    from ..stages.shard import sharded_aggregate, sharded_map_groups

    part = _rd().read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand"]).to_pandas()
    brands, bcodes = np.unique(part["p_brand"].to_numpy(),
                               return_inverse=True)
    pk_sorted = np.sort(part["p_partkey"].to_numpy(np.int64))
    order = np.argsort(part["p_partkey"].to_numpy(np.int64), kind="stable")
    part_ref = ray.put((pk_sorted, bcodes.astype(np.int64)[order], brands))

    line = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        q = np.rint(b["l_quantity"].to_numpy(np.float64)).astype(np.int64)
        price_c = np.rint(
            b["l_extendedprice"].to_numpy(np.float64) * 100).astype(np.int64)
        g = (pd.DataFrame({
            "pkey": b["l_partkey"].to_numpy(np.int64), "q": q,
            "price_i": price_c, "n": np.int64(1)})
            .groupby(["pkey", "q"], as_index=False).sum())
        return g

    parts = line.map_batches(partial, batch_format="pandas")

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.groupby(["pkey", "q"], as_index=False).sum()
        qn = g["q"].to_numpy() * g["n"].to_numpy()
        s = pd.Series(qn).groupby(g["pkey"].to_numpy()).sum()
        n = g.groupby("pkey")["n"].sum()
        stats = pd.DataFrame({"pkey": s.index.to_numpy(np.int64),
                              "s": s.to_numpy(np.int64),
                              "nn": n.to_numpy(np.int64)})
        m = g.merge(stats, on="pkey")
        keep = 5 * m["q"].to_numpy() * m["nn"].to_numpy() < m["s"].to_numpy()
        m = m[keep]
        if not len(m):
            return pd.DataFrame({"bid": pd.Series([], dtype=np.int64),
                                 "price_i": pd.Series([], dtype=np.int64)})
        pk_sorted, bid_sorted, _brands = ray.get(part_ref)
        pos = np.searchsorted(pk_sorted, m["pkey"].to_numpy(np.int64))
        out = pd.DataFrame({
            "bid": bid_sorted[pos],
            "price_i": m["price_i"].to_numpy(np.int64)})
        return out.groupby("bid", as_index=False).sum()

    per_brand = sharded_map_groups(parts, "pkey", fold)
    from ._core import _ds_to_pandas

    agg = _ds_to_pandas(sharded_aggregate(
        per_brand, "bid", {"price_i": "sum"}, num_shards=2))
    return pd.DataFrame({
        "p_brand": brands[agg["bid"].to_numpy(np.int64)],
        "avg_yearly": agg["price_i"].astype(np.float64) / 700.0})


_Q17_ORACLE = """
WITH l AS (
  SELECT l_partkey,
         CAST(round(l_quantity) AS BIGINT) AS q,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
  FROM lineitem
), a AS (
  SELECT l_partkey, sum(q) AS s, count(*) AS n FROM l GROUP BY 1
)
SELECT p_brand, CAST(sum(price_c) AS DOUBLE) / 700.0 AS avg_yearly
FROM l JOIN a USING (l_partkey) JOIN part ON p_partkey = l.l_partkey
WHERE 5 * q * n < s
GROUP BY 1
"""


def idle_balance_by_nation(sf_dir: str, cutoff: str = "2001-01-01"):
    """TPC-H Q22 shape — the sales-opportunity screen: customers whose
    account balance beats the average POSITIVE balance yet placed no
    order since ``cutoff`` (in this synth EVERY customer has some
    order, so the spec's never-ordered predicate is vacuous — the
    dormancy cutoff keeps the anti-join real and the result non-empty
    at every sf).  The above-average compare is
    INTEGER-exact: bal > S/N ⟺ bal_c·N > S with bal_c cents int64.
    Distributed plan: pass 1 is a map-only customer scan folding ONE
    (Σ positive bal_c, count) row per batch on the driver; pass 2
    unions qualifying customer rows (kind 1, carrying nation + bal_c)
    with per-batch DISTINCT order-custkey partials (kind 0) into ONE
    custkey exchange whose shard fn anti-drops every customer with an
    order row and emits per-nation integer partials; a tiny nation
    exchange finishes.  One double divide per nation at emit."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    cust = _rd().read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def bal_partial(b: pd.DataFrame) -> pd.DataFrame:
        bal_c = np.rint(
            b["c_acctbal"].to_numpy(np.float64) * 100).astype(np.int64)
        pos = bal_c[bal_c > 0]
        return pd.DataFrame({"s": [int(pos.sum())], "n": [len(pos)]})

    stats = cust.map_batches(bal_partial, batch_format="pandas").to_pandas()
    s_tot, n_tot = int(stats["s"].sum()), int(stats["n"].sum())

    def tag_cust(b: pd.DataFrame) -> pd.DataFrame:
        bal_c = np.rint(
            b["c_acctbal"].to_numpy(np.float64) * 100).astype(np.int64)
        keep = bal_c * n_tot > s_tot
        return pd.DataFrame({
            "ckey": b["c_custkey"].to_numpy(np.int64)[keep],
            "nation": b["c_nationkey"].to_numpy(np.int64)[keep],
            "bal_c": bal_c[keep],
            "kind": np.int64(1)})

    cut = np.datetime64(cutoff)
    orders = _rd().read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate"])

    def order_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["o_orderdate"].to_numpy() >= cut]
        u = np.unique(b["o_custkey"].to_numpy(np.int64))
        return pd.DataFrame({
            "ckey": u, "nation": np.int64(0), "bal_c": np.int64(0),
            "kind": np.int64(0)})

    both = cust.map_batches(tag_cust, batch_format="pandas").union(
        orders.map_batches(order_partial, batch_format="pandas"))

    def anti(shard: pd.DataFrame) -> pd.DataFrame:
        kinds = shard["kind"].to_numpy()
        has_order = np.unique(shard.loc[kinds == 0, "ckey"].to_numpy())
        c = shard[kinds == 1]
        c = c[~np.isin(c["ckey"].to_numpy(), has_order)]
        out = c.groupby("nation", as_index=False).agg(
            n_customers=("ckey", "size"), bal_i=("bal_c", "sum"))
        out["n_customers"] = out["n_customers"].astype(np.int64)
        out["bal_i"] = out["bal_i"].astype(np.int64)
        return out

    parts = sharded_map_groups(both, "ckey", anti)
    agg = sharded_aggregate(parts, "nation",
                            {"n_customers": "sum", "bal_i": "sum"},
                            num_shards=2).to_pandas()
    if "nation" not in agg.columns:  # empty Dataset drops columns
        agg = pd.DataFrame({"nation": pd.Series([], dtype=np.int64),
                            "n_customers": pd.Series([], dtype=np.int64),
                            "bal_i": pd.Series([], dtype=np.int64)})
    return pd.DataFrame({
        "c_nationkey": agg["nation"].astype(np.int64),
        "n_customers": agg["n_customers"].astype(np.int64),
        "total_acctbal": agg["bal_i"].astype(np.float64) / 100.0})


_Q22_ORACLE = """
WITH s AS (
  SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS tot,
         count(*) AS n
  FROM customer WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0
), q AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer, s
  WHERE CAST(round(c_acctbal * 100) AS BIGINT) * s.n > s.tot
    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01')
)
SELECT c_nationkey, count(*) AS n_customers,
       CAST(sum(bal_c) AS DOUBLE) / 100.0 AS total_acctbal
FROM q GROUP BY 1
"""


def nation_market_share(sf_dir: str, target_nation: str = "NATION_13",
                        region: str = "ASIA", p_type: str = "PROMO"):
    """TPC-H Q8 shape — the target nation's share of PROMO-part revenue
    sold to ASIA customers, by order year.  Distributed plan: the three
    small dims broadcast (partkeys of the type; suppkey→nation;
    ASIA nationkey set); orders⋈customer region membership resolves in
    ONE custkey exchange (the dimension never shuffles whole); lineitem
    revenue partials — pre-filtered map-side by the broadcast partkey
    set, supplier nation attached from the broadcast map — meet the
    region-qualified (okey, year) rows in ONE orderkey exchange.  The
    share is (Σ rev_target)/(Σ rev) per year: integer 10⁻⁴-unit sums,
    ONE double divide via the VARCHAR-bridged HUGEINT casts (sums pass
    2⁵³ at scale)."""
    import ray

    from ..stages.shard import sharded_map_groups

    part = _rd().read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_type"]).to_pandas()
    pkeys = np.sort(part.loc[part["p_type"] == p_type,
                             "p_partkey"].to_numpy(np.int64))
    nat = _rd().read_parquet(
        os.path.join(sf_dir, "nation.parquet")).to_pandas()
    reg = _rd().read_parquet(
        os.path.join(sf_dir, "region.parquet")).to_pandas()
    rkey = reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0]
    region_nkeys = np.sort(nat.loc[nat["n_regionkey"] == rkey,
                                   "n_nationkey"].to_numpy(np.int64))
    sup = _rd().read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nation_by_key = dict(zip(nat["n_nationkey"].to_numpy(np.int64),
                             nat["n_name"]))
    sup_nation = dict(
        (int(k), nation_by_key[int(v)])
        for k, v in zip(sup["s_suppkey"], sup["s_nationkey"]))
    pk_ref = ray.put(pkeys)
    rn_ref = ray.put(region_nkeys)
    sn_ref = ray.put(sup_nation)

    # -- stage 1: orders ⋈ customer (region membership) in ONE exchange
    orders = _rd().read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        yr = pd.DatetimeIndex(b["o_orderdate"]).year.to_numpy(np.int64)
        return pd.DataFrame({
            "custkey": b["o_custkey"].to_numpy(np.int64),
            "okey": b["o_orderkey"].to_numpy(np.int64),
            "yr": yr, "kind": np.ones(len(b), dtype=np.int64)})

    cust = _rd().read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"])

    def tag_cust(b: pd.DataFrame) -> pd.DataFrame:
        keep = np.isin(b["c_nationkey"].to_numpy(np.int64),
                       ray.get(rn_ref))
        b = b[keep]
        return pd.DataFrame({
            "custkey": b["c_custkey"].to_numpy(np.int64),
            "okey": np.zeros(len(b), dtype=np.int64),
            "yr": np.zeros(len(b), dtype=np.int64),
            "kind": np.zeros(len(b), dtype=np.int64)})

    both = orders.map_batches(tag_orders, batch_format="pandas").union(
        cust.map_batches(tag_cust, batch_format="pandas"))

    def region_orders(g: pd.DataFrame) -> pd.DataFrame:
        ok = g.loc[g["kind"] == 0, "custkey"].to_numpy(np.int64)
        o = g[g["kind"] == 1]
        keep = np.isin(o["custkey"].to_numpy(np.int64), ok)
        return pd.DataFrame({
            "okey": o["okey"].to_numpy(np.int64)[keep],
            "yr": o["yr"].to_numpy(np.int64)[keep],
            "rev_i": np.zeros(int(keep.sum()), dtype=np.int64),
            "nation": np.full(int(keep.sum()), "", dtype=object),
            "kind": np.ones(int(keep.sum()), dtype=np.int64)})

    region_ords = sharded_map_groups(both, "custkey", region_orders)

    # -- stage 2: lineitem revenue partials meet orders in ONE exchange
    line = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"])

    def rev_partials(b: pd.DataFrame) -> pd.DataFrame:
        keep = np.isin(b["l_partkey"].to_numpy(np.int64),
                       ray.get(pk_ref))
        b = b[keep]
        rev = (np.round(b["l_extendedprice"].to_numpy(np.float64) * 100)
               .astype(np.int64)
               * (100 - np.round(
                   b["l_discount"].to_numpy(np.float64) * 100)
                  .astype(np.int64)))
        sn = ray.get(sn_ref)
        nation = b["l_suppkey"].map(sn).to_numpy(dtype=object)
        g = pd.DataFrame({
            "okey": b["l_orderkey"].to_numpy(np.int64),
            "nation": nation, "rev_i": rev,
        }).groupby(["okey", "nation"], as_index=False)["rev_i"].sum()
        g["yr"] = np.int64(0)
        g["kind"] = np.int64(0)
        return g[["okey", "yr", "rev_i", "nation", "kind"]]

    both2 = line.map_batches(rev_partials, batch_format="pandas").union(
        region_ords)

    def join_rev(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["kind"] == 1][["okey", "yr"]]
        r = g[g["kind"] == 0]
        m = r.merge(o, on="okey", how="inner")
        return m.groupby(["yr_y", "nation"], as_index=False)[
            "rev_i"].sum().rename(columns={"yr_y": "yr"})

    parts = sharded_map_groups(both2, "okey", join_rev).to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "o_year": pd.Series([], dtype=np.int64),
            "total_revenue": pd.Series([], dtype=np.float64),
            "nation_revenue": pd.Series([], dtype=np.float64),
            "mkt_share": pd.Series([], dtype=np.float64)})
    per = parts.groupby(["yr", "nation"], as_index=False)["rev_i"].sum()
    tot = per.groupby("yr")["rev_i"].sum()
    tgt = per[per["nation"] == target_nation].set_index("yr")["rev_i"]
    yrs = np.sort(tot.index.to_numpy(np.int64))
    tv = tot.reindex(yrs).to_numpy(np.int64)
    gv = tgt.reindex(yrs).fillna(0).astype(np.int64).to_numpy()
    return pd.DataFrame({
        "o_year": yrs,
        "total_revenue": tv.astype(np.float64) / 1e4,
        "nation_revenue": gv.astype(np.float64) / 1e4,
        "mkt_share": np.array([float(int(g)) / float(int(t))
                               for g, t in zip(gv, tv)]),
    })


_Q8_ORACLE = """
WITH rev AS (
  SELECT extract(year FROM o.o_orderdate) AS o_year, n.n_name AS nation,
         sum(CAST(round(l.l_extendedprice * 100) AS HUGEINT)
             * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS rev_i
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = cn.n_regionkey AND r.r_name = 'ASIA'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY 1, 2
)
SELECT o_year,
       CAST(CAST(sum(rev_i) AS VARCHAR) AS DOUBLE) / 10000.0
         AS total_revenue,
       CAST(CAST(coalesce(sum(rev_i) FILTER (nation = 'NATION_13'), 0)
                 AS VARCHAR) AS DOUBLE) / 10000.0 AS nation_revenue,
       CAST(CAST(coalesce(sum(rev_i) FILTER (nation = 'NATION_13'), 0)
                 AS VARCHAR) AS DOUBLE)
         / CAST(CAST(sum(rev_i) AS VARCHAR) AS DOUBLE) AS mkt_share
FROM rev GROUP BY o_year
"""


def sole_late_suppliers(sf_dir: str, days: int = 90):
    """TPC-H Q21 shape — suppliers who SOLELY held up a multi-supplier
    order: per supplier, the number of orders with ≥ 2 distinct
    suppliers where this supplier was the ONLY one whose latest line
    shipped more than ``days`` days after the order date (the schema
    has no commit/receipt dates, so lateness is vs o_orderdate — same
    exists/not-exists group logic as Q21).  Distributed plan: lineitem
    reduces to per-(orderkey, suppkey) MAX(l_shipdate) partials per
    batch (the per-order state is one row per participating supplier,
    never the lineitem rows); order rows tag in and meet them in ONE
    orderkey-hash exchange whose shard fn applies the
    n_suppliers ≥ 2 ∧ n_late = 1 gate and emits (suppkey, 1) winners;
    a tiny suppkey fold counts, and the 10-row supplier dim attaches
    names AFTER the fold.  All-integer — bit-exact.
    NOTE: the paired oracle SQL hardcodes days=90."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    lag = np.timedelta64(days, "D")

    orders = _rd().read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"])

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "okey": b["o_orderkey"].astype(np.int64),
            "skey": np.int64(-1),
            "ts": b["o_orderdate"],
            "kind": np.int64(1)})

    line = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate"])

    def ship_partials(b: pd.DataFrame) -> pd.DataFrame:
        agg = pd.DataFrame({
            "okey": b["l_orderkey"].to_numpy(np.int64),
            "skey": b["l_suppkey"].to_numpy(np.int64),
            "ts": b["l_shipdate"],
        }).groupby(["okey", "skey"], as_index=False)["ts"].max()
        agg["kind"] = np.int64(0)
        return agg[["okey", "skey", "ts", "kind"]]

    both = line.map_batches(ship_partials, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas"))

    def sole_late(g: pd.DataFrame) -> pd.DataFrame:
        kinds = g["kind"].to_numpy()
        ship = g[kinds == 0].groupby(["okey", "skey"],
                                     as_index=False)["ts"].max()
        o = g[kinds == 1][["okey", "ts"]].rename(columns={"ts": "odate"})
        j = ship.merge(o, on="okey", how="inner")
        j["late"] = (j["ts"].to_numpy()
                     > (j["odate"].to_numpy() + lag)).astype(np.int64)
        st = j.groupby("okey").agg(n_supp=("skey", "size"),
                                   n_late=("late", "sum"))
        ok = st.index[(st["n_supp"] >= 2) & (st["n_late"] == 1)]
        win = j[(j["late"] == 1) & j["okey"].isin(ok)]
        return pd.DataFrame({"skey": win["skey"].to_numpy(np.int64),
                             "numwait": np.ones(len(win), dtype=np.int64)})

    from ._core import _ds_to_pandas

    partials = sharded_map_groups(both, "okey", sole_late)
    counts = _ds_to_pandas(sharded_aggregate(
        partials, "skey", {"numwait": "sum"}, num_shards=2))
    sup = _rd().read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"]).to_pandas()
    out = counts.merge(sup, left_on="skey", right_on="s_suppkey")
    return pd.DataFrame({
        "s_suppkey": out["s_suppkey"].astype(np.int64),
        "s_name": out["s_name"],
        "numwait": out["numwait"].astype(np.int64)})


_Q21_ORACLE = """
WITH ls AS (
  SELECT l_orderkey AS okey, l_suppkey AS skey, max(l_shipdate) AS ship
  FROM lineitem GROUP BY 1, 2
), j AS (
  SELECT ls.okey, ls.skey,
         CASE WHEN ls.ship > o.o_orderdate + INTERVAL 90 DAY
              THEN 1 ELSE 0 END AS late
  FROM ls JOIN orders o ON o.o_orderkey = ls.okey
), f AS (
  SELECT okey FROM j GROUP BY okey
  HAVING count(*) >= 2 AND sum(late) = 1
)
SELECT s.s_suppkey, s.s_name, count(*) AS numwait
FROM j JOIN f USING (okey)
JOIN supplier s ON s.s_suppkey = j.skey
WHERE j.late = 1
GROUP BY 1, 2
"""


def shipping_mix_by_status(sf_dir: str, date_lo: str = "1995-01-01",
                           date_hi: str = "1997-01-01"):
    """TPC-H Q12 shape — priority mix by line status: for lineitems
    shipped inside the window, how many belong to high-priority orders
    (1-URGENT / 2-HIGH) vs the rest, per l_linestatus (the schema has
    no l_shipmode; linestatus plays its grouping role).  Distributed
    plan: lineitem filters the window and reduces to per-(orderkey,
    linestatus) integer count partials per batch; orders tag in
    (okey → priority) and meet them in ONE orderkey-hash exchange
    whose shard fn classifies and emits per-status (high, low) count
    partials; a tiny 2-row fold finishes.  All-integer — bit-exact.
    NOTE: the paired oracle SQL hardcodes the 1995-1997 window."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)

    orders = _rd().read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"])

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "okey": b["o_orderkey"].astype(np.int64),
            "l_linestatus": b["o_orderpriority"],  # carrier col, kind 1
            "cnt": np.int64(0),
            "kind": np.int64(1)})

    line = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linestatus", "l_shipdate"])

    def line_partials(b: pd.DataFrame) -> pd.DataFrame:
        d = b["l_shipdate"].to_numpy()
        b = b[(d >= lo) & (d < hi)]
        agg = pd.DataFrame({
            "okey": b["l_orderkey"].to_numpy(np.int64),
            "l_linestatus": b["l_linestatus"].to_numpy(),
        }).groupby(["okey", "l_linestatus"], as_index=False).size()
        return pd.DataFrame({
            "okey": agg["okey"], "l_linestatus": agg["l_linestatus"],
            "cnt": agg["size"].astype(np.int64),
            "kind": np.int64(0)})

    both = line.map_batches(line_partials, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas"))

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        kinds = g["kind"].to_numpy()
        o = g[kinds == 1][["okey", "l_linestatus"]].rename(
            columns={"l_linestatus": "prio"})
        li = g[kinds == 0].merge(o, on="okey", how="inner")
        high = li["prio"].isin(("1-URGENT", "2-HIGH")).to_numpy()
        cnt = li["cnt"].to_numpy(np.int64)
        out = pd.DataFrame({
            "l_linestatus": li["l_linestatus"],
            "high_line_count": np.where(high, cnt, 0),
            "low_line_count": np.where(high, 0, cnt)})
        return out.groupby("l_linestatus", as_index=False).sum()

    partials = sharded_map_groups(both, "okey", classify)
    return sharded_aggregate(partials, "l_linestatus",
                             {"high_line_count": "sum",
                              "low_line_count": "sum"}, num_shards=2)


_Q12_ORACLE = """
SELECT l.l_linestatus,
       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= DATE '1995-01-01'
  AND l.l_shipdate < DATE '1997-01-01'
GROUP BY 1
"""


# ------------------------------------------------------------- registry


def repeat_order_interval(sf_dir: str):
    """Median reorder interval (days between a customer's consecutive
    orders) per market segment — the repeat-purchase cadence behind
    inventory planning.  Distributed plan: orders and customer
    (custkey → segment) rows meet in ONE custkey-hash exchange
    (the mktsegment_revenue shape); per-customer sorted day-gaps are
    pure integers, and only (segment, gap_days) rows — bounded by the
    ORDER count, not events — ride a tiny second exchange whose fold
    applies the bit-pinned two-product quantile_cont."""
    from ..functions.stats import quantile_cont
    from ..stages.shard import sharded_map_groups

    cust = _rd().read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"])

    def cust_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ckey": b["c_custkey"].astype(np.int64),
            "seg": b["c_mktsegment"].astype(str),
            "day": np.int64(0),
            "kind": np.int64(1)})

    orders = _rd().read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate"])

    def order_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ckey": b["o_custkey"].astype(np.int64),
            "seg": "",
            "day": (b["o_orderdate"].to_numpy()
                    .astype("datetime64[s]").astype(np.int64) // 86400),
            "kind": np.int64(0)})

    both = orders.map_batches(order_rows, batch_format="pandas").union(
        cust.map_batches(cust_rows, batch_format="pandas"))

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["kind"] == 1][["ckey", "seg"]].drop_duplicates("ckey")
        o = g[g["kind"] == 0][["ckey", "day"]].sort_values(
            ["ckey", "day"], kind="stable")
        same = o["ckey"].to_numpy()[1:] == o["ckey"].to_numpy()[:-1]
        d = o["day"].to_numpy(np.int64)
        out = pd.DataFrame({
            "ckey": o["ckey"].to_numpy()[1:][same],
            "gap_days": (d[1:] - d[:-1])[same]})
        return out.merge(c, on="ckey")[["seg", "gap_days"]]

    pairs = sharded_map_groups(both, "ckey", gaps)

    def med(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for seg, g in shard.groupby("seg"):
            rows.append({
                "segment": seg,
                "n_gaps": len(g),
                "median_gap_days": quantile_cont(
                    g["gap_days"].to_numpy(np.float64), 0.5)})
        return pd.DataFrame(rows, columns=[
            "segment", "n_gaps", "median_gap_days"])

    return sharded_map_groups(pairs, "seg", med)


_REPEAT_INTERVAL_ORACLE = """
WITH o AS (
  SELECT o_custkey AS ckey,
         CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) // 86400
           AS day
  FROM orders
), g AS (
  SELECT ckey,
         day - lag(day) OVER (PARTITION BY ckey ORDER BY day) AS gap
  FROM o
), j AS (
  SELECT c.c_mktsegment AS segment, g.gap
  FROM g JOIN customer c ON c.c_custkey = g.ckey
  WHERE g.gap IS NOT NULL
)
SELECT segment, CAST(count(*) AS BIGINT) AS n_gaps,
       quantile_cont(CAST(gap AS DOUBLE), 0.5) AS median_gap_days
FROM j GROUP BY 1
"""


def brand_pareto(sf_dir: str):
    """Revenue Pareto over part brands: how many brands cover ≥80% of
    lineitem revenue — the assortment-concentration number.  EXACT by
    the integer-units trick: per-brand revenue rounds to 10⁻⁴-unit
    ints, brands sort by (revenue DESC, brand ASC), and the 80%
    condition is the INTEGER comparison 5·cum ≥ 4·total (no float
    threshold anywhere).  Shape: lineitem reduces per batch to
    (partkey, rev) partials that meet the part (partkey → brand) rows
    in one partkey-hash exchange; the ≤ brands × shards partial table
    folds on the driver."""
    from ..stages.shard import sharded_map_groups

    part = _rd().read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand"])

    def part_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "pkey": b["p_partkey"].astype(np.int64),
            "brand": b["p_brand"].astype(str),
            "rev": np.float64(0),
            "kind": np.int64(1)})

    line = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount"])

    def line_rows(b: pd.DataFrame) -> pd.DataFrame:
        rev = (b["l_extendedprice"].to_numpy(np.float64)
               * (1.0 - b["l_discount"].to_numpy(np.float64)))
        g = pd.DataFrame({
            "pkey": b["l_partkey"].to_numpy(np.int64),
            "rev": rev}).groupby("pkey", as_index=False)["rev"].sum()
        g["brand"] = ""
        g["kind"] = np.int64(0)
        return g[["pkey", "brand", "rev", "kind"]]

    both = line.map_batches(line_rows, batch_format="pandas").union(
        part.map_batches(part_rows, batch_format="pandas"))

    def per_brand(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["kind"] == 1][["pkey", "brand"]].drop_duplicates("pkey")
        l_ = g[g["kind"] == 0].groupby("pkey", as_index=False)[
            "rev"].sum()
        j = l_.merge(p, on="pkey", how="inner")
        return j.groupby("brand", as_index=False)["rev"].sum()

    parts_tbl = sharded_map_groups(both, "pkey", per_brand).to_pandas()
    if parts_tbl.empty:
        return pd.DataFrame({
            "n_brands_80": pd.Series([], dtype=np.int64),
            "n_brands_total": pd.Series([], dtype=np.int64),
            "covered_share": pd.Series([], dtype=np.float64)})
    br = parts_tbl.groupby("brand", as_index=False)["rev"].sum()
    v4 = np.rint(_round_exact(br["rev"].to_numpy(np.float64))
                 * 10000.0).astype(np.int64)
    order = sorted(zip(br["brand"], v4),
                   key=lambda t: (-t[1], t[0]))
    total = sum(int(v) for _, v in order)
    cum, k = 0, 0
    for _, v in order:
        cum += int(v)
        k += 1
        if 5 * cum >= 4 * total:
            break
    return pd.DataFrame({
        "n_brands_80": np.array([k], dtype=np.int64),
        "n_brands_total": np.array([len(order)], dtype=np.int64),
        "covered_share": np.array([float(cum) / float(total)])})


_BRAND_PARETO_ORACLE = """
WITH b AS (
  SELECT p.p_brand AS brand,
         CAST(round(round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                    * 10000) AS BIGINT) AS v4
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1
), r AS (
  SELECT brand, v4,
         sum(v4) OVER (ORDER BY v4 DESC, brand ASC
                       ROWS UNBOUNDED PRECEDING) AS cum,
         sum(v4) OVER () AS tot,
         row_number() OVER (ORDER BY v4 DESC, brand ASC) AS rk
  FROM b
), hit AS (
  SELECT min(rk) AS k FROM r WHERE 5 * cum >= 4 * tot
)
SELECT CAST(hit.k AS BIGINT) AS n_brands_80,
       (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_brands_total,
       (SELECT CAST(r2.cum AS DOUBLE) / r2.tot FROM r r2
        WHERE r2.rk = hit.k) AS covered_share
FROM hit
"""


def segment_order_value_cv(sf_dir: str):
    """Order-value dispersion per market segment: exact integer-cents
    moments (n·ΣX² − (ΣX)² is a pure bigint) emit mean and the
    coefficient of variation with ONE sqrt and ONE divide written
    identically both sides — the pricing-consistency screen.
    Custkey-hash join (the mktsegment_revenue shape); per-segment
    integer partials fold on the driver in Python bigints."""
    from ..stages.shard import sharded_map_groups

    cust = _rd().read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"])

    def cust_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ckey": b["c_custkey"].astype(np.int64),
            "seg": b["c_mktsegment"].astype(str),
            "price_c": np.int64(0),
            "kind": np.int64(1)})

    orders = _rd().read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"])

    def order_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ckey": b["o_custkey"].astype(np.int64),
            "seg": "",
            "price_c": np.rint(b["o_totalprice"].to_numpy(np.float64)
                               * 100).astype(np.int64),
            "kind": np.int64(0)})

    both = orders.map_batches(order_rows, batch_format="pandas").union(
        cust.map_batches(cust_rows, batch_format="pandas"))

    def moments(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["kind"] == 1][["ckey", "seg"]].drop_duplicates("ckey")
        o = g[g["kind"] == 0][["ckey", "price_c"]]
        j = o.merge(c, on="ckey", how="inner")
        rows = []
        for seg, gg in j.groupby("seg"):
            x = [int(v) for v in gg["price_c"]]
            rows.append({"seg": seg, "n": len(x), "s1": sum(x),
                         "s2": sum(v * v for v in x)})
        return pd.DataFrame(rows, columns=["seg", "n", "s1", "s2"])

    parts = sharded_map_groups(both, "ckey", moments).to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "segment": pd.Series([], dtype=object),
            "n_orders": pd.Series([], dtype=np.int64),
            "mean_price": pd.Series([], dtype=np.float64),
            "cv": pd.Series([], dtype=np.float64)})
    rows = []
    for seg, g in parts.groupby("seg"):
        n = int(g["n"].sum())
        s1 = sum(int(v) for v in g["s1"])
        s2 = sum(int(v) for v in g["s2"])
        var_num = n * s2 - s1 * s1
        rows.append({
            "segment": seg, "n_orders": n,
            "mean_price": float(s1) / float(n * 100),
            "cv": math.sqrt(float(var_num)) / float(s1)
            if s1 > 0 else np.nan})
    return pd.DataFrame(rows, columns=["segment", "n_orders",
                                       "mean_price", "cv"])


_SEGMENT_CV_ORACLE = """
WITH o AS (
  SELECT c.c_mktsegment AS segment,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS x
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), m AS (
  SELECT segment, count(*) AS n, sum(CAST(x AS HUGEINT)) AS s1,
         sum(CAST(x AS HUGEINT) * x) AS s2
  FROM o GROUP BY 1
)
SELECT segment, CAST(n AS BIGINT) AS n_orders,
       CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
         / CAST(CAST(n * 100 AS VARCHAR) AS DOUBLE) AS mean_price,
       CASE WHEN s1 > 0 THEN
         sqrt(CAST(CAST(n * s2 - s1 * s1 AS VARCHAR) AS DOUBLE))
           / CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
       ELSE NULL END AS cv
FROM m
"""


def shipping_delay_histogram(sf_dir: str):
    """Order-to-ship latency distribution by priority — the
    fulfillment-SLA histogram, as a FACT-FACT distributed join:
    lineitem reduces to (orderkey, ship_day, count) integer partials
    per batch, meets the order rows in one orderkey-hash exchange
    whose shard fn computes delay_days = ship_day − order_day and
    emits (priority, delay, count) partials; a tiny second exchange
    folds the ≤ priorities × delays histogram.  Pure integer epoch-day
    arithmetic — bit-exact."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    orders = _rd().read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "okey": b["o_orderkey"].astype(np.int64),
            "day": (b["o_orderdate"].to_numpy()
                    .astype("datetime64[s]").astype(np.int64) // 86400),
            "o_orderpriority": b["o_orderpriority"],
            "cnt": np.int64(0),
            "kind": np.int64(1),
        })

    line = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"])

    def ship_partials(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "okey": b["l_orderkey"].to_numpy(np.int64),
            "day": (b["l_shipdate"].to_numpy()
                    .astype("datetime64[s]").astype(np.int64) // 86400),
        }).groupby(["okey", "day"], as_index=False).size()
        return pd.DataFrame({
            "okey": g["okey"], "day": g["day"],
            "o_orderpriority": "", "cnt": g["size"].astype(np.int64),
            "kind": np.int64(0)})

    both = line.map_batches(ship_partials, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas"))

    def delays(g: pd.DataFrame) -> pd.DataFrame:
        ship = g[g["kind"] == 0].groupby(["okey", "day"],
                                         as_index=False)["cnt"].sum()
        o = g[g["kind"] == 1][["okey", "day", "o_orderpriority"]].rename(
            columns={"day": "oday"})
        j = ship.merge(o, on="okey", how="inner")
        j["delay_days"] = j["day"] - j["oday"]
        out = j.groupby(["o_orderpriority", "delay_days"],
                        as_index=False)["cnt"].sum()
        return out.rename(columns={"cnt": "n_items"})

    partials = sharded_map_groups(both, "okey", delays)
    agg = sharded_aggregate(partials, ["o_orderpriority", "delay_days"],
                            {"n_items": "sum"}, num_shards=2)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderpriority": b["o_orderpriority"],
            "delay_days": b["delay_days"].astype(np.int64),
            "n_items": b["n_items"].astype(np.int64)})

    return agg.map_batches(fin, batch_format="pandas")


_SHIPPING_DELAY_ORACLE = """
SELECT o.o_orderpriority,
       CAST(epoch(date_trunc('day', l.l_shipdate)) AS BIGINT) // 86400
         - CAST(epoch(date_trunc('day', o.o_orderdate)) AS BIGINT) // 86400
         AS delay_days,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
"""


def copurchase_part_pairs(sf_dir: str, min_support: int = 2):
    """Market-basket mining on TPC-H facts: unordered part pairs that
    co-occur in at least ``min_support`` orders — the iceberg self-join
    shape (a large candidate-pair space pruned by a support threshold
    AFTER the global count).  One orderkey exchange builds per-order
    distinct part sets and emits pair partials (bounded by
    Σ k_order·(k_order−1)/2, k = lines per order — small per key); a
    pair-keyed fold finishes counts and applies the threshold.  The
    raw part table never broadcasts and no driver materialization
    happens before the support cut.  All-integer — exact."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    line = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["l_orderkey", "l_partkey"])
        j = d.merge(d, on="l_orderkey")
        j = j[j["l_partkey_x"] < j["l_partkey_y"]]
        out = j.groupby(["l_partkey_x", "l_partkey_y"],
                        as_index=False).size()
        out.columns = ["part_a", "part_b", "n_orders"]
        return out.astype(np.int64)

    from ._core import _ds_to_pandas

    parts = sharded_map_groups(line, "l_orderkey", pairs)
    agg = _ds_to_pandas(sharded_aggregate(
        parts, ["part_a", "part_b"], {"n_orders": "sum"}))
    agg = agg[agg["n_orders"] >= min_support]
    return agg.sort_values(["part_a", "part_b"],
                           kind="stable").reset_index(drop=True)


_COPURCHASE_ORACLE = """
WITH d AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       count(*) AS n_orders
FROM d a JOIN d b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2 HAVING count(*) >= 2
"""


def orders_backlog_daily(sf_dir: str):
    """Open-order backlog over time — the fulfillment work-in-progress
    curve: an order opens on its o_orderdate and closes on its LAST
    lineitem ship day; the operator emits the running open count at
    every day the backlog CHANGES (a sweep line, the
    peak_concurrent_sessions shape on TPC-H facts).  Distributed plan:
    lineitem folds to per-order max ship-day integer partials in one
    orderkey exchange that also meets the order row and emits ±1 day
    deltas; the delta table is bounded by 2·orders collapsing to
    O(distinct days), so the driver cumsum is over a tiny frame.
    Orders with no lineitem never open (inner join semantics on both
    sides).  Pure integer epoch days — exact."""
    from ..stages.shard import sharded_map_groups

    orders = _rd().read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"])

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "okey": b["o_orderkey"].astype(np.int64),
            "day": (b["o_orderdate"].to_numpy()
                    .astype("datetime64[s]").astype(np.int64) // 86400),
            "kind": np.int64(1),
        })

    line = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"])

    def ship_partials(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "okey": b["l_orderkey"].to_numpy(np.int64),
            "day": (b["l_shipdate"].to_numpy()
                    .astype("datetime64[s]").astype(np.int64) // 86400),
        }).groupby("okey", as_index=False).max()
        g["kind"] = np.int64(0)
        return g

    both = line.map_batches(ship_partials, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas"))

    def deltas(g: pd.DataFrame) -> pd.DataFrame:
        close = g[g["kind"] == 0].groupby("okey", as_index=False)[
            "day"].max()
        open_ = g[g["kind"] == 1][["okey", "day"]].rename(
            columns={"day": "oday"})
        j = close.merge(open_, on="okey", how="inner")
        d = pd.DataFrame({
            "day": np.concatenate([j["oday"].to_numpy(np.int64),
                                   j["day"].to_numpy(np.int64) + 1]),
            "delta": np.concatenate([
                np.ones(len(j), dtype=np.int64),
                -np.ones(len(j), dtype=np.int64)])})
        return d.groupby("day", as_index=False)["delta"].sum()

    parts = sharded_map_groups(both, "okey", deltas).to_pandas()
    fin = parts.groupby("day", as_index=False)["delta"].sum()
    fin = fin.sort_values("day", kind="stable").reset_index(drop=True)
    return pd.DataFrame({
        "epoch_day": fin["day"].astype(np.int64),
        "backlog": fin["delta"].cumsum().astype(np.int64)})


_ORDERS_BACKLOG_ORACLE = """
WITH c AS (
  SELECT l_orderkey AS okey,
         max(CAST(epoch(date_trunc('day', l_shipdate)) AS BIGINT)
             // 86400) AS close_day
  FROM lineitem GROUP BY 1
), o AS (
  SELECT CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) // 86400
           AS open_day, c.close_day
  FROM orders JOIN c ON o_orderkey = c.okey
), d AS (
  SELECT open_day AS day, 1 AS delta FROM o
  UNION ALL
  SELECT close_day + 1 AS day, -1 AS delta FROM o
), g AS (
  SELECT day, sum(delta) AS delta FROM d GROUP BY 1
)
SELECT day AS epoch_day,
       CAST(sum(delta) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS backlog
FROM g
"""


def type_size_contingency(sf_dir: str):
    """Chi-square contingency cells for part type × size — the
    catalog-skew diagnostic (is size independent of type?), emitted
    per cell so every number is exact-with-one-divide instead of an
    order-dependent float total: observed count O, expected numerator
    R·C (row total × column total; expected = R·C/N), and the cell's
    chi² contribution (O·N − R·C)²/(N·R·C) — numerator and denominator
    are EXACT integers (Python bigint engine-side, HUGEINT in the
    oracle, VARCHAR-bridged casts), ONE divide per cell.  Map-only
    per-batch (type, size) count partials; output bounded by
    types × sizes."""
    ds = _rd().read_parquet(os.path.join(sf_dir, "part.parquet"),
                            columns=["p_type", "p_size"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["p_type", "p_size"], as_index=False).size()
        g["size"] = g["size"].astype(np.int64)
        return g.rename(columns={"size": "o"})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    cells = parts.groupby(["p_type", "p_size"], as_index=False)["o"].sum()
    rtot = dict(cells.groupby("p_type")["o"].sum())
    ctot = dict(cells.groupby("p_size")["o"].sum())
    n = int(cells["o"].sum())
    rows = []
    for t, s, o in cells.itertuples(index=False):
        r, c = int(rtot[t]), int(ctot[s])
        num = (int(o) * n - r * c) ** 2
        den = n * r * c
        rows.append({"p_type": t, "p_size": int(s), "observed": int(o),
                     "expected_num": r * c,
                     "cell_chi2": float(num) / float(den)})
    return pd.DataFrame(rows, columns=[
        "p_type", "p_size", "observed", "expected_num", "cell_chi2"])


def discount_band_revenue(sf_dir: str):
    """Discounted revenue by integer discount band (0%..10%) — the
    pricing-mix census behind promotion analysis.  Map-only: every
    batch bins rint(l_discount·100) and folds integer 10⁻⁴-unit
    revenue partials (cents(price) × (100 − pct(discount)), the
    order-independent integer-revenue trick of regional_supplier_
    revenue); one tiny band-keyed exchange finishes ≤ 11 rows.  The
    emitted revenue is the one divide /10⁴ of an exact BIGINT."""
    from ..stages.shard import sharded_aggregate

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice", "l_discount"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        p = np.rint(b["l_extendedprice"].to_numpy(np.float64)
                    * 100.0).astype(np.int64)
        d = np.rint(b["l_discount"].to_numpy(np.float64)
                    * 100.0).astype(np.int64)
        g = pd.DataFrame({"band_pct": d, "n_items": 1,
                          "rev4": p * (100 - d)}).groupby(
            "band_pct", as_index=False).sum()
        g["n_items"] = g["n_items"].astype(np.int64)
        g["rev4"] = g["rev4"].astype(np.int64)
        return g

    agg = sharded_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        "band_pct", {"n_items": "sum", "rev4": "sum"}, num_shards=2)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "band_pct": b["band_pct"].to_numpy(np.int64),
            "n_items": b["n_items"].to_numpy(np.int64),
            "revenue": b["rev4"].to_numpy(np.int64) / 10000.0})

    return agg.map_batches(fin, batch_format="pandas")


_DISCOUNT_BAND_ORACLE = """
SELECT CAST(round(l_discount * 100) AS BIGINT) AS band_pct,
       count(*) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue
FROM lineitem GROUP BY 1
"""


def qty_price_correlation(sf_dir: str):
    """Pearson correlation between quantity and extended price per
    return flag — the pricing-sanity check (price should scale with
    quantity; a flag segment where it doesn't is suspect).  All five
    moment sums are EXACT integers: quantity and cents(price) are
    ints, and Σp² (which passes 2⁶³ at sf0.1) rides the exchange as
    SPLIT hi/lo int64 partials (p² ≫ int64-safe per value; the 32-bit
    split keeps every partial column in BIGINT range at any corpus
    size — recombined in Python bigints at emit).  r is the pinned
    expression num / (√a · √b) over correctly-rounded casts on both
    engines (a·b would overflow HUGEINT, so the square roots are taken
    separately by design).  Map-only + one tiny flag-keyed exchange."""
    from ..stages.shard import sharded_aggregate

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        q = np.rint(b["l_quantity"].to_numpy(np.float64)).astype(np.int64)
        p = np.rint(b["l_extendedprice"].to_numpy(np.float64)
                    * 100.0).astype(np.int64)
        p2 = p * p
        g = pd.DataFrame({
            "flag": b["l_returnflag"], "n": 1, "sq": q, "sp": p,
            "sqp": q * p, "sq2": q * q,
            "sp2_hi": p2 >> 32, "sp2_lo": p2 & 0xFFFFFFFF,
        }).groupby("flag", as_index=False).sum()
        for c in g.columns[1:]:
            g[c] = g[c].astype(np.int64)
        return g

    agg = sharded_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        "flag", {"n": "sum", "sq": "sum", "sp": "sum", "sqp": "sum",
                 "sq2": "sum", "sp2_hi": "sum", "sp2_lo": "sum"},
        num_shards=2).to_pandas()
    rows = []
    for _, r in agg.iterrows():
        n, sq, sp = int(r["n"]), int(r["sq"]), int(r["sp"])
        sp2 = (int(r["sp2_hi"]) << 32) + int(r["sp2_lo"])
        num = n * int(r["sqp"]) - sq * sp
        a = n * int(r["sq2"]) - sq * sq
        b = n * sp2 - sp * sp
        if a == 0 or b == 0:
            continue
        import math
        rows.append({
            "l_returnflag": r["flag"], "n_items": np.int64(n),
            "corr_qty_price": float(num) / (math.sqrt(float(a))
                                            * math.sqrt(float(b)))})
    return pd.DataFrame(rows, columns=[
        "l_returnflag", "n_items", "corr_qty_price"])


_QTY_PRICE_CORR_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS HUGEINT) AS sq,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS HUGEINT) AS sp,
         sum(CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sqp,
         sum(CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_quantity) AS HUGEINT)) AS sq2,
         sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
             * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sp2
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n_items,
       CAST(CAST(n * sqp - sq * sp AS VARCHAR) AS DOUBLE)
         / (sqrt(CAST(CAST(n * sq2 - sq * sq AS VARCHAR) AS DOUBLE))
            * sqrt(CAST(CAST(n * sp2 - sp * sp AS VARCHAR) AS DOUBLE)))
         AS corr_qty_price
FROM m WHERE n * sq2 - sq * sq <> 0 AND n * sp2 - sp * sp <> 0
"""


def order_fill_latency(sf_dir: str):
    """Order-fulfilment latency per priority: mean days from order date
    to the FIRST lineitem shipment — the SLA metric per priority class
    (URGENT should ship sooner).  Same tagged-union orderkey exchange
    as late_shipment_priority, but the per-order state is MIN(shipdate)
    and the day gap folds into per-priority (Σdays, n) integer
    partials; the mean is ONE divide.  Days via trunc-then-epoch (both
    timestamps are day-aligned)."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    orders = _rd().read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "okey": b["o_orderkey"].astype(np.int64),
            "ts": b["o_orderdate"],
            "o_orderpriority": b["o_orderpriority"],
            "kind": np.int64(1)})

    line = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"])

    def ship_partials(b: pd.DataFrame) -> pd.DataFrame:
        agg = pd.DataFrame({
            "okey": b["l_orderkey"].to_numpy(dtype=np.int64),
            "ts": b["l_shipdate"],
        }).groupby("okey", as_index=False)["ts"].min()
        agg["o_orderpriority"] = ""
        agg["kind"] = np.int64(0)
        return agg[["okey", "ts", "o_orderpriority", "kind"]]

    both = line.map_batches(ship_partials, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas"))

    def latency_partials(g: pd.DataFrame) -> pd.DataFrame:
        ship = g[g["kind"] == 0].groupby("okey", as_index=False)["ts"].min()
        o = g[g["kind"] == 1][["okey", "ts", "o_orderpriority"]].rename(
            columns={"ts": "odate"})
        j = o.merge(ship, on="okey", how="inner")
        days = ((j["ts"].to_numpy().astype("datetime64[D]")
                 .astype(np.int64))
                - (j["odate"].to_numpy().astype("datetime64[D]")
                   .astype(np.int64)))
        out = pd.DataFrame({
            "o_orderpriority": j["o_orderpriority"],
            "sum_days": days, "n_orders": 1}).groupby(
            "o_orderpriority", as_index=False).sum()
        out["sum_days"] = out["sum_days"].astype(np.int64)
        out["n_orders"] = out["n_orders"].astype(np.int64)
        return out

    partials = sharded_map_groups(both, "okey", latency_partials)
    agg = sharded_aggregate(partials, "o_orderpriority",
                            {"sum_days": "sum", "n_orders": "sum"},
                            num_shards=2)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        s = b["sum_days"].to_numpy(np.int64)
        n = b["n_orders"].to_numpy(np.int64)
        return pd.DataFrame({
            "o_orderpriority": b["o_orderpriority"],
            "n_orders": n, "mean_fill_days": s / n})

    return agg.map_batches(fin, batch_format="pandas")


_FILL_LATENCY_ORACLE = """
WITH first_ship AS (
  SELECT l_orderkey, min(l_shipdate) AS ship FROM lineitem GROUP BY 1
)
SELECT o.o_orderpriority, count(*) AS n_orders,
       CAST(sum(CAST(epoch(date_trunc('day', f.ship)) AS BIGINT) // 86400
                - CAST(epoch(date_trunc('day', o.o_orderdate)) AS BIGINT)
                  // 86400) AS DOUBLE) / count(*) AS mean_fill_days
FROM orders o JOIN first_ship f ON f.l_orderkey = o.o_orderkey
GROUP BY 1
"""


def charge_summary_by_status(sf_dir: str):
    """TPC-H Q1's full pricing ladder per (returnflag, linestatus):
    item count, discounted price and the TAX-inclusive charge — the
    one Q1 column (`sum_charge`) lineitem_pricing_summary left out,
    exercising l_tax.  Exactness: disc price rides the exchange as
    int64 10⁻⁴ units (cents(p)·(100−d)); charge is 10⁻⁶ units
    (cents(p)·(100−d)·(100+t), ≤ ~10¹¹ per row) summed as SPLIT hi/lo
    int64 partials (the qty_price_correlation 32-bit-split trick — a
    global charge sum passes 2⁶³ long before 100 TB; the split keeps
    every partial in BIGINT at any corpus size, recombined in Python
    bigints over the ≤ 8 final groups).  Map-only partials + one tiny
    flag-keyed exchange; emitted doubles are ONE divide of an exact
    integer on both engines (VARCHAR-bridged in SQL so the HUGEINT →
    DOUBLE cast is correctly rounded)."""
    from ..stages.shard import sharded_aggregate

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_extendedprice",
                 "l_discount", "l_tax"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        p = np.rint(b["l_extendedprice"].to_numpy(np.float64)
                    * 100.0).astype(np.int64)
        d = np.rint(b["l_discount"].to_numpy(np.float64)
                    * 100.0).astype(np.int64)
        t = np.rint(b["l_tax"].to_numpy(np.float64)
                    * 100.0).astype(np.int64)
        disc4 = p * (100 - d)
        charge6 = disc4 * (100 + t)
        g = pd.DataFrame({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "n_items": 1, "disc4": disc4,
            "c6_hi": charge6 >> 32, "c6_lo": charge6 & 0xFFFFFFFF,
        }).groupby(["l_returnflag", "l_linestatus"],
                   as_index=False).sum()
        for c in g.columns[2:]:
            g[c] = g[c].astype(np.int64)
        return g

    agg = sharded_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["l_returnflag", "l_linestatus"],
        {"n_items": "sum", "disc4": "sum", "c6_hi": "sum",
         "c6_lo": "sum"}, num_shards=2).to_pandas()
    rows = []
    for _, r in agg.iterrows():
        c6 = (int(r["c6_hi"]) << 32) + int(r["c6_lo"])
        rows.append({
            "l_returnflag": r["l_returnflag"],
            "l_linestatus": r["l_linestatus"],
            "n_items": np.int64(int(r["n_items"])),
            "sum_disc_price": float(int(r["disc4"])) / 10000.0,
            "sum_charge": float(c6) / 1000000.0})
    return pd.DataFrame(rows, columns=[
        "l_returnflag", "l_linestatus", "n_items", "sum_disc_price",
        "sum_charge"])


_CHARGE_SUMMARY_ORACLE = """
SELECT l_returnflag, l_linestatus, count(*) AS n_items,
       CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                 AS VARCHAR) AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))
                     * (100 + CAST(round(l_tax * 100) AS BIGINT)))
                 AS VARCHAR) AS DOUBLE) / 1000000.0 AS sum_charge
FROM lineitem GROUP BY 1, 2
"""


def order_lines_audit(sf_dir: str):
    """Line-number integrity audit — the ingest-contract check a
    warehouse runs on every load: per order, l_linenumber must be
    exactly the gapless sequence 1..n (verified WITHOUT materializing
    the set: max == count AND 2·sum == n·(n+1) — both directions of
    a gap/dup break one of the two).  Per-batch per-order (count, sum,
    max) partials combine associatively through one orderkey exchange
    (sum/sum/max — no order rows, no line rows move whole); a tiny
    second exchange folds the census: orders and intact-orders per
    line-count.  All-integer, bit-exact."""
    from ..stages.shard import sharded_aggregate

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ln = b["l_linenumber"].to_numpy(np.int64)
        g = pd.DataFrame({
            "okey": b["l_orderkey"].to_numpy(np.int64),
            "n": 1, "s": ln, "m": ln,
        }).groupby("okey", as_index=False).agg(
            {"n": "sum", "s": "sum", "m": "max"})
        for c in ("n", "s", "m"):
            g[c] = g[c].astype(np.int64)
        return g

    per_order = sharded_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        "okey", {"n": "sum", "s": "sum", "m": "max"})

    def census(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n"].to_numpy(np.int64)
        intact = ((b["m"].to_numpy(np.int64) == n)
                  & (2 * b["s"].to_numpy(np.int64) == n * (n + 1)))
        g = pd.DataFrame({"n_lines": n, "n_orders": 1,
                          "n_intact": intact.astype(np.int64)}).groupby(
            "n_lines", as_index=False).sum()
        g["n_orders"] = g["n_orders"].astype(np.int64)
        g["n_intact"] = g["n_intact"].astype(np.int64)
        return g

    return sharded_aggregate(
        per_order.map_batches(census, batch_format="pandas"),
        "n_lines", {"n_orders": "sum", "n_intact": "sum"}, num_shards=2)


_ORDER_LINES_AUDIT_ORACLE = """
WITH per_o AS (
  SELECT l_orderkey, count(*) AS n, sum(l_linenumber) AS s,
         max(l_linenumber) AS m
  FROM lineitem GROUP BY 1
)
SELECT CAST(n AS BIGINT) AS n_lines,
       count(*) AS n_orders,
       CAST(sum(CASE WHEN m = n AND 2 * s = n * (n + 1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_intact
FROM per_o GROUP BY 1
"""


def brand_list_price_gap(sf_dir: str):
    """Realized vs list value per brand — the pricing-power metric:
    what the brand's lineitems actually billed (Σ cents(extprice))
    against what the catalog says they were worth (Σ qty ·
    cents(p_retailprice)), with the realized share as ONE divide of
    the two exact integer sums.  part is a BROADCAST dimension
    (``ray.put`` one partkey → (brand, retail-cents) table, read once
    per task — O(200k·SF) rows, never re-shipped per batch); lineitem
    partials pre-aggregate per batch so only O(brands) rows enter the
    tiny final exchange.  VARCHAR-bridged HUGEINT→DOUBLE casts in the
    oracle mirror Python's correctly-rounded float(int)."""
    import ray

    from ..stages.shard import sharded_aggregate

    part_df = _rd().read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_retailprice"]).to_pandas()
    pk = part_df["p_partkey"].to_numpy(np.int64)
    order = np.argsort(pk)
    dim_ref = ray.put({
        "keys": pk[order],
        "brand": part_df["p_brand"].to_numpy(object)[order],
        "retail_c": np.rint(part_df["p_retailprice"].to_numpy(np.float64)
                            * 100.0).astype(np.int64)[order]})

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        dim = ray.get(dim_ref)
        idx = np.searchsorted(dim["keys"], b["l_partkey"].to_numpy(np.int64))
        q = np.rint(b["l_quantity"].to_numpy(np.float64)).astype(np.int64)
        p = np.rint(b["l_extendedprice"].to_numpy(np.float64)
                    * 100.0).astype(np.int64)
        g = pd.DataFrame({
            "p_brand": dim["brand"][idx], "n_items": 1,
            "list_c": q * dim["retail_c"][idx], "real_c": p,
        }).groupby("p_brand", as_index=False).sum()
        for c in ("n_items", "list_c", "real_c"):
            g[c] = g[c].astype(np.int64)
        return g

    agg = sharded_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        "p_brand", {"n_items": "sum", "list_c": "sum", "real_c": "sum"},
        num_shards=2)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        lc = b["list_c"].to_numpy(np.int64)
        rc = b["real_c"].to_numpy(np.int64)
        return pd.DataFrame({
            "p_brand": b["p_brand"],
            "n_items": b["n_items"].to_numpy(np.int64),
            "list_value": lc / 100.0, "realized_value": rc / 100.0,
            "realized_share": rc / lc})

    return agg.map_batches(fin, batch_format="pandas")


_BRAND_LIST_GAP_ORACLE = """
WITH m AS (
  SELECT p.p_brand, count(*) AS n_items,
         sum(CAST(round(l.l_quantity) AS HUGEINT)
             * CAST(round(p.p_retailprice * 100) AS HUGEINT)) AS list_c,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
              AS HUGEINT) AS real_c
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1
)
SELECT p_brand, n_items,
       CAST(CAST(list_c AS VARCHAR) AS DOUBLE) / 100.0 AS list_value,
       CAST(CAST(real_c AS VARCHAR) AS DOUBLE) / 100.0 AS realized_value,
       CAST(CAST(real_c AS VARCHAR) AS DOUBLE)
         / CAST(CAST(list_c AS VARCHAR) AS DOUBLE) AS realized_share
FROM m
"""


def supplier_balance_revenue(sf_dir: str):
    """Supplier health × realized revenue: bucket suppliers by account
    balance (low < $2000 ≤ mid < $4500 ≤ high, exact cents compares)
    and fold each tier's lineitem revenue — the procurement-risk view
    (how much flow rides on thin-balance suppliers?).  supplier is a
    BROADCAST dimension (``ray.put`` one suppkey → tier array, read
    once per task); supplier counts come off the dimension itself
    (suppliers with zero lineitems still count); lineitem partials
    pre-aggregate per batch so only O(tiers) rows hit the final fold.
    Revenue in int64 10⁻⁴ units (the regional_supplier_revenue
    contract), ONE /10⁴ divide at emit."""
    import ray

    from ..stages.shard import sharded_aggregate

    supp = _rd().read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_acctbal"]).to_pandas()
    bal_c = np.rint(supp["s_acctbal"].to_numpy(np.float64)
                    * 100.0).astype(np.int64)
    tier = np.where(bal_c < 200000, "low",
                    np.where(bal_c < 450000, "mid", "high")).astype(object)
    sk = supp["s_suppkey"].to_numpy(np.int64)
    order = np.argsort(sk)
    dim_ref = ray.put({"keys": sk[order], "tier": tier[order]})
    n_suppliers = pd.DataFrame({"balance_tier": tier}).groupby(
        "balance_tier", as_index=False).size().rename(
        columns={"size": "n_suppliers"})

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_extendedprice", "l_discount"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        dim = ray.get(dim_ref)
        idx = np.searchsorted(dim["keys"], b["l_suppkey"].to_numpy(np.int64))
        p = np.rint(b["l_extendedprice"].to_numpy(np.float64)
                    * 100.0).astype(np.int64)
        d = np.rint(b["l_discount"].to_numpy(np.float64)
                    * 100.0).astype(np.int64)
        g = pd.DataFrame({
            "balance_tier": dim["tier"][idx], "n_items": 1,
            "rev4": p * (100 - d),
        }).groupby("balance_tier", as_index=False).sum()
        g["n_items"] = g["n_items"].astype(np.int64)
        g["rev4"] = g["rev4"].astype(np.int64)
        return g

    agg = sharded_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        "balance_tier", {"n_items": "sum", "rev4": "sum"},
        num_shards=2).to_pandas()
    out = n_suppliers.merge(agg, on="balance_tier", how="left")
    out["n_suppliers"] = out["n_suppliers"].astype(np.int64)
    out["n_items"] = out["n_items"].fillna(0).astype(np.int64)
    out["revenue"] = out["rev4"].fillna(0).astype(np.int64) / 10000.0
    return out[["balance_tier", "n_suppliers", "n_items", "revenue"]]


_SUPPLIER_BALANCE_ORACLE = """
WITH s AS (
  SELECT s_suppkey,
         CASE WHEN CAST(round(s_acctbal * 100) AS BIGINT) < 200000
              THEN 'low'
              WHEN CAST(round(s_acctbal * 100) AS BIGINT) < 450000
              THEN 'mid' ELSE 'high' END AS balance_tier
  FROM supplier
), rev AS (
  SELECT s.balance_tier, count(*) AS n_items,
         sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS rev4
  FROM lineitem l JOIN s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1
)
SELECT s.balance_tier,
       count(*) AS n_suppliers,
       CAST(coalesce(max(rev.n_items), 0) AS BIGINT) AS n_items,
       CAST(CAST(coalesce(max(rev.rev4), 0) AS VARCHAR) AS DOUBLE)
         / 10000.0 AS revenue
FROM s LEFT JOIN rev USING (balance_tier)
GROUP BY 1
"""


def custbal_orders_correlation(sf_dir: str):
    """Does a customer's account balance predict order volume?  Pearson
    r between balance (exact cents) and order COUNT per market
    segment — zero-order customers included (the LEFT-JOIN semantics,
    via a tagged custkey exchange: customer rows meet per-batch order-
    count partials; a customer shard with no order rows scores y=0).
    All five moment sums are EXACT integers; Σx² (cents² ≈ 10¹²/row)
    rides as SPLIT hi/lo int64 partials (the qty_price_correlation
    32-bit-split — Σx² passes 2⁶³ near 10⁷ customers), recombined in
    Python bigints over ≤ segments rows.  r is the pinned
    num / (√a · √b) expression on both engines."""
    import math

    from ..stages.shard import sharded_map_groups, sharded_aggregate

    cust = _rd().read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_acctbal", "c_mktsegment"])

    def tag_cust(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ckey": b["c_custkey"].to_numpy(np.int64),
            "x": np.rint(b["c_acctbal"].to_numpy(np.float64)
                         * 100.0).astype(np.int64),
            "segment": b["c_mktsegment"], "kind": np.int64(1)})

    orders = _rd().read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"])

    def count_partials(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "ckey": b["o_custkey"].to_numpy(np.int64), "x": 1,
        }).groupby("ckey", as_index=False).sum()
        g["x"] = g["x"].astype(np.int64)
        g["segment"] = ""
        g["kind"] = np.int64(0)
        return g[["ckey", "x", "segment", "kind"]]

    both = cust.map_batches(tag_cust, batch_format="pandas").union(
        orders.map_batches(count_partials, batch_format="pandas"))

    def moments(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["kind"] == 1][["ckey", "x", "segment"]].rename(
            columns={"x": "bal"})
        o = g[g["kind"] == 0].groupby("ckey", as_index=False)["x"].sum()
        j = c.merge(o, on="ckey", how="left")
        x = j["bal"].to_numpy(np.int64)
        y = j["x"].fillna(0).to_numpy().astype(np.int64)
        x2 = x * x
        out = pd.DataFrame({
            "segment": j["segment"], "n": 1, "sx": x, "sy": y,
            "sxy": x * y, "sy2": y * y,
            "sx2_hi": x2 >> 32, "sx2_lo": x2 & 0xFFFFFFFF,
        }).groupby("segment", as_index=False).sum()
        for col in out.columns[1:]:
            out[col] = out[col].astype(np.int64)
        return out

    partials = sharded_map_groups(both, "ckey", moments)
    agg = sharded_aggregate(
        partials, "segment",
        {"n": "sum", "sx": "sum", "sy": "sum", "sxy": "sum",
         "sy2": "sum", "sx2_hi": "sum", "sx2_lo": "sum"},
        num_shards=2).to_pandas()
    rows = []
    for _, r in agg.sort_values("segment").iterrows():
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sx2 = (int(r["sx2_hi"]) << 32) + int(r["sx2_lo"])
        num = n * int(r["sxy"]) - sx * sy
        a = n * sx2 - sx * sx
        b = n * int(r["sy2"]) - sy * sy
        if a == 0 or b == 0:
            continue
        rows.append({
            "c_mktsegment": r["segment"], "n_customers": np.int64(n),
            "corr_bal_orders": float(num) / (math.sqrt(float(a))
                                             * math.sqrt(float(b)))})
    return pd.DataFrame(rows, columns=[
        "c_mktsegment", "n_customers", "corr_bal_orders"])


_CUSTBAL_ORDERS_CORR_ORACLE = """
WITH oc AS (
  SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1
), p AS (
  SELECT c.c_mktsegment,
         CAST(round(c.c_acctbal * 100) AS BIGINT) AS x,
         coalesce(oc.cnt, 0) AS y
  FROM customer c LEFT JOIN oc ON oc.o_custkey = c.c_custkey
), m AS (
  SELECT c_mktsegment,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(y) AS HUGEINT) AS sy,
         sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
         sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sx2,
         sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS sy2
  FROM p GROUP BY 1
)
SELECT c_mktsegment, CAST(n AS BIGINT) AS n_customers,
       CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
         / (sqrt(CAST(CAST(n * sx2 - sx * sx AS VARCHAR) AS DOUBLE))
            * sqrt(CAST(CAST(n * sy2 - sy * sy AS VARCHAR) AS DOUBLE)))
         AS corr_bal_orders
FROM m WHERE n * sx2 - sx * sx <> 0 AND n * sy2 - sy * sy <> 0
"""


def order_month_seasonality(sf_dir: str):
    """Order seasonality: orders and gross revenue by calendar month-
    of-year pooled across years — the demand-planning heatmap row.
    Map-only per-batch partials (month via the datetime64[M] integer
    calendar, revenue as exact o_totalprice cents) + one tiny
    month-keyed exchange; the emitted revenue is ONE /100 divide."""
    from ..stages.shard import sharded_aggregate

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        mm = b["o_orderdate"].to_numpy().astype("datetime64[M]")
        month = (mm.astype(np.int64) % 12) + 1
        p = np.rint(b["o_totalprice"].to_numpy(np.float64)
                    * 100.0).astype(np.int64)
        g = pd.DataFrame({"month": month, "n_orders": 1,
                          "rev_c": p}).groupby(
            "month", as_index=False).sum()
        g["n_orders"] = g["n_orders"].astype(np.int64)
        g["rev_c"] = g["rev_c"].astype(np.int64)
        return g

    agg = sharded_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        "month", {"n_orders": "sum", "rev_c": "sum"}, num_shards=2)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "month": b["month"].to_numpy(np.int64),
            "n_orders": b["n_orders"].to_numpy(np.int64),
            "revenue": b["rev_c"].to_numpy(np.int64) / 100.0})

    return agg.map_batches(fin, batch_format="pandas")


def exact_price_quantiles(sf_dir: str):
    """EXACT global order statistics WITHOUT a global sort — the
    distributed-selection primitive (median of 100 TB): p50/p90/p99 of
    lineitem price in two streaming passes.  Pass 1 folds a bounded
    256-cent-bucket histogram map-only (≤ ~40k cells at any corpus
    size — the driver holds buckets, never rows); the driver walks the
    cumulative histogram to locate each target RANK k = ⌈p·n⌉ (exact
    integer arithmetic) and its residual rank within the bucket.
    Pass 2 re-reads ONLY rows falling in the ≤ 3 target buckets
    (predicate pushed into the scan batches) and selects the residual
    order statistic per bucket.  A kth order statistic of a multiset
    is tie-proof by construction.  The oracle pays the full sort; the
    engine never does."""
    ds = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice"])

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(b["l_extendedprice"].to_numpy(np.float64)
                    * 100.0).astype(np.int64)
        g = pd.DataFrame({"bucket": c >> 8, "n": 1}).groupby(
            "bucket", as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    hist = ds.map_batches(hist_partial, batch_format="pandas").to_pandas()
    hist = hist.groupby("bucket", as_index=False)["n"].sum().sort_values(
        "bucket", kind="stable")
    buckets = hist["bucket"].to_numpy(np.int64)
    counts = hist["n"].to_numpy(np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return pd.DataFrame({
            "quantile": pd.Series([], dtype=object),
            "rank": pd.Series([], dtype=np.int64),
            "value": pd.Series([], dtype=np.float64)})

    targets = []
    for label, p_num, p_den in (("p50", 1, 2), ("p90", 9, 10),
                                ("p99", 99, 100)):
        k = (p_num * n + p_den - 1) // p_den  # ceil(p*n), 1-based
        i = int(np.searchsorted(cum, k))      # first cum >= k
        resid = k - (int(cum[i - 1]) if i else 0)  # rank inside bucket
        targets.append((label, k, int(buckets[i]), resid))
    want = {b for _, _, b, _ in targets}

    def in_buckets(b: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(b["l_extendedprice"].to_numpy(np.float64)
                    * 100.0).astype(np.int64)
        keep = np.isin(c >> 8, np.fromiter(want, np.int64, len(want)))
        return pd.DataFrame({"c": c[keep], "bucket": (c >> 8)[keep]})

    picked = ds.map_batches(in_buckets, batch_format="pandas").to_pandas()
    rows = []
    for label, k, b, resid in targets:
        vals = np.sort(picked.loc[picked["bucket"] == b, "c"]
                       .to_numpy(np.int64))
        rows.append({"quantile": label, "rank": np.int64(k),
                     "value": int(vals[resid - 1]) / 100.0})
    return pd.DataFrame(rows, columns=["quantile", "rank", "value"])


_EXACT_QUANTILES_ORACLE = """
WITH v AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
  FROM lineitem
), n AS (
  SELECT count(*) AS n FROM v
), r AS (
  SELECT c, row_number() OVER (ORDER BY c) AS rn FROM v
), k AS (
  SELECT 'p50' AS quantile, (1 * n.n + 1) // 2 AS k FROM n
  UNION ALL
  SELECT 'p90', (9 * n.n + 9) // 10 FROM n
  UNION ALL
  SELECT 'p99', (99 * n.n + 99) // 100 FROM n
)
SELECT k.quantile, CAST(k.k AS BIGINT) AS rank,
       CAST(r.c AS DOUBLE) / 100.0 AS value
FROM k JOIN r ON r.rn = k.k
"""


def supplier_assortment_histogram(sf_dir: str):
    """Supplier specialization census: the distribution of assortment
    sizes (how many DISTINCT parts each supplier actually shipped) —
    generalists vs single-part specialists.  Three bounded stages:
    per-batch distinct (suppkey, partkey) partials dedupe through a
    composite-keyed exchange (the all-to-all moves pair rows once,
    never lineitems), per-shard pair counts fold per supplier in a
    suppkey-keyed exchange, and the final histogram is a tiny
    n_parts-keyed fold.  All-integer."""
    from ..stages.shard import sharded_aggregate

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_partkey"])

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "sk": b["l_suppkey"].to_numpy(np.int64),
            "pk": b["l_partkey"].to_numpy(np.int64),
        }).drop_duplicates()
        return g

    def dedupe(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.drop_duplicates(["sk", "pk"]).groupby(
            "sk", as_index=False).size().rename(
            columns={"size": "n_parts"})
        g["n_parts"] = g["n_parts"].astype(np.int64)
        return g

    from ..stages.shard import sharded_map_groups

    pair_counts = sharded_map_groups(
        ds.map_batches(pair_partial, batch_format="pandas"),
        ["sk", "pk"], dedupe)

    per_supp = sharded_aggregate(pair_counts, "sk",
                                 {"n_parts": "sum"}, num_shards=4)

    def census(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "n_parts": b["n_parts"].to_numpy(np.int64),
            "n_suppliers": 1}).groupby("n_parts", as_index=False).sum()
        g["n_suppliers"] = g["n_suppliers"].astype(np.int64)
        return g

    return sharded_aggregate(
        per_supp.map_batches(census, batch_format="pandas"),
        "n_parts", {"n_suppliers": "sum"}, num_shards=2)


_SUPPLIER_ASSORTMENT_ORACLE = """
WITH a AS (
  SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts
  FROM lineitem GROUP BY 1
)
SELECT CAST(n_parts AS BIGINT) AS n_parts,
       count(*) AS n_suppliers
FROM a GROUP BY 1
"""


def customer_reactivation_census(sf_dir: str, gap_days: int = 180):
    """Win-back census per market segment: among multi-order customers,
    how many went dormant (> ``gap_days`` between consecutive orders)
    and then came back — the lifecycle metric behind re-engagement
    spend.  One custkey-tagged exchange (order dates meet the segment
    dimension row), per-customer sorted integer epoch-day diffs, max
    gap compared in exact ints; counts exact, the rate ONE divide.
    NOTE: the paired oracle hardcodes gap_days=180."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    cust = _rd().read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"])

    def tag_cust(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ckey": b["c_custkey"].to_numpy(np.int64),
            "d": np.int64(-1), "segment": b["c_mktsegment"],
            "kind": np.int64(1)})

    orders = _rd().read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate"])

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ckey": b["o_custkey"].to_numpy(np.int64),
            "d": (b["o_orderdate"].to_numpy().astype("datetime64[D]")
                  .astype(np.int64)),
            "segment": "", "kind": np.int64(0)})

    both = orders.map_batches(tag_orders, batch_format="pandas").union(
        cust.map_batches(tag_cust, batch_format="pandas"))

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        seg = g[g["kind"] == 1][["ckey", "segment"]].drop_duplicates(
            "ckey")
        o = g[g["kind"] == 0].sort_values(["ckey", "d"], kind="stable")
        rows = []
        for ck, sub in o.groupby("ckey", sort=False):
            d = sub["d"].to_numpy(np.int64)
            if len(d) < 2:
                continue
            rows.append({"ckey": ck, "multi": np.int64(1),
                         "react": np.int64(
                             int(np.diff(d).max() > gap_days))})
        if not rows:
            return pd.DataFrame({
                "segment": pd.Series([], dtype=object),
                "n_multi": pd.Series([], dtype=np.int64),
                "n_reactivated": pd.Series([], dtype=np.int64)})
        j = pd.DataFrame(rows).merge(seg, on="ckey", how="inner")
        out = j.groupby("segment", as_index=False).agg(
            n_multi=("multi", "sum"), n_reactivated=("react", "sum"))
        for c in ("n_multi", "n_reactivated"):
            out[c] = out[c].astype(np.int64)
        return out

    parts = sharded_map_groups(both, "ckey", per_cust)
    agg = sharded_aggregate(parts, "segment",
                            {"n_multi": "sum", "n_reactivated": "sum"},
                            num_shards=2)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        m = b["n_multi"].to_numpy(np.int64)
        r = b["n_reactivated"].to_numpy(np.int64)
        return pd.DataFrame({
            "c_mktsegment": b["segment"], "n_multi_order_customers": m,
            "n_reactivated": r, "reactivation_rate": r / m})

    from ._core import _anchor_schema

    return _anchor_schema(
        agg.map_batches(fin, batch_format="pandas"),
        pa.schema([
            ("c_mktsegment", pa.string()),
            ("n_multi_order_customers", pa.int64()),
            ("n_reactivated", pa.int64()),
            ("reactivation_rate", pa.float64())]))


_REACTIVATION_ORACLE = """
WITH g AS (
  SELECT o_custkey,
         CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) // 86400
         - lag(CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT)
               // 86400)
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS gap
  FROM orders
), pc AS (
  SELECT o_custkey, count(*) AS n,
         max(CASE WHEN gap > 180 THEN 1 ELSE 0 END) AS react
  FROM g GROUP BY 1 HAVING count(*) >= 2
)
SELECT c.c_mktsegment,
       count(*) AS n_multi_order_customers,
       CAST(sum(pc.react) AS BIGINT) AS n_reactivated,
       CAST(sum(pc.react) AS DOUBLE) / count(*) AS reactivation_rate
FROM pc JOIN customer c ON c.c_custkey = pc.o_custkey
GROUP BY 1
"""


def copurchase_triangles(sf_dir: str):
    """Distributed triangle counting over the co-purchase graph — the
    graph-analytics capstone on top of ``copurchase_part_pairs``: parts
    are nodes, an edge joins two parts co-ordered in at least one
    order, and the output is each part's triangle participation count
    (the numerator of its local clustering coefficient — how cliquish
    its co-purchase neighborhood is).  The engine runs the standard
    DEGREE-ORIENTED enumeration (Schank & Wagner 2005 / Suri-Vassilvitskii
    MapReduce form): every edge is directed from its lower-rank to its
    higher-rank endpoint with rank = (degree, partkey), so each
    triangle is generated by exactly ONE wedge (the one centered at its
    minimum-rank vertex) and per-node wedge work is bounded O(E^1.5)
    total even under power-law degree skew — the hot-part hub never
    enumerates its own neighbor pairs.  Plan: per-order pair partials
    (orderkey exchange, bounded by lines-per-order²) → edge dedupe
    (pair exchange) → TWO node-keyed passes attach both endpoint
    degrees (each edge rides as its two (v, other) copies; rows keyed
    by v==x are exactly x's incident edges so the shard-local count IS
    deg(x)) → orientation filter keeps one copy per edge → wedge
    generation per oriented source (node exchange) → closing-edge
    membership (pair-keyed exchange of wedges ∪ edges) → tiny per-part
    fold.  All-integer — bit-exact; the orientation never has to match
    the oracle because both sides count the same unordered triangles."""
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    line = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["l_orderkey", "l_partkey"])
        j = d.merge(d, on="l_orderkey")
        j = j[j["l_partkey_x"] < j["l_partkey_y"]]
        out = j[["l_partkey_x", "l_partkey_y"]].drop_duplicates()
        out.columns = ["a", "b"]
        return out.astype(np.int64)

    def dedupe(s: pd.DataFrame) -> pd.DataFrame:
        return s.drop_duplicates()

    edges = sharded_map_groups(
        sharded_map_groups(line, "l_orderkey", pairs), ["a", "b"], dedupe
    ).materialize()  # consumed twice (degree passes + closure check)

    # each edge as its two endpoint copies: (v, other)
    def both_copies(b: pd.DataFrame) -> pd.DataFrame:
        a = b["a"].to_numpy(np.int64)
        bb = b["b"].to_numpy(np.int64)
        return pd.DataFrame({"v": np.concatenate([a, bb]),
                             "other": np.concatenate([bb, a])})

    copies = edges.map_batches(both_copies, batch_format="pandas")

    def attach_deg_v(shard: pd.DataFrame) -> pd.DataFrame:
        deg = shard.groupby("v")["other"].transform("size")
        out = shard.copy()
        out["deg_v"] = deg.to_numpy(np.int64)
        return out

    with_dv = sharded_map_groups(copies, "v", attach_deg_v)

    def orient(shard: pd.DataFrame) -> pd.DataFrame:
        # rows keyed by other==x are exactly x's incident edges (one
        # copy each), so the shard-local count is deg(other)
        deg_o = shard.groupby("other")["v"].transform("size")
        sh = shard.copy()
        sh["deg_o"] = deg_o.to_numpy(np.int64)
        v, o = sh["v"].to_numpy(np.int64), sh["other"].to_numpy(np.int64)
        dv, do = sh["deg_v"].to_numpy(np.int64), sh["deg_o"].to_numpy(np.int64)
        keep = (dv < do) | ((dv == do) & (v < o))
        return pd.DataFrame({"src": v[keep], "dst": o[keep]})

    oriented = sharded_map_groups(with_dv, "other", orient)

    def wedges(shard: pd.DataFrame) -> pd.DataFrame:
        j = shard.merge(shard, on="src")
        j = j[j["dst_x"] < j["dst_y"]]  # closing key in partkey order
        return pd.DataFrame({
            "a": j["dst_x"].to_numpy(np.int64),
            "b": j["dst_y"].to_numpy(np.int64),
            "u": j["src"].to_numpy(np.int64)})

    wedge_ds = sharded_map_groups(oriented, "src", wedges)

    def tag_edges(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["a", "b"]].copy()
        out["u"] = np.int64(-1)
        return out

    both = wedge_ds.union(edges.map_batches(tag_edges,
                                            batch_format="pandas"))

    def close_triangles(shard: pd.DataFrame) -> pd.DataFrame:
        u = shard["u"].to_numpy(np.int64)
        e = shard[u == -1][["a", "b"]].drop_duplicates()
        wdg = shard[u != -1]
        tri = wdg.merge(e, on=["a", "b"], how="inner")
        parts = np.concatenate([tri["a"].to_numpy(np.int64),
                                tri["b"].to_numpy(np.int64),
                                tri["u"].to_numpy(np.int64)])
        if parts.size == 0:
            return pd.DataFrame({"part": pd.Series([], dtype=np.int64),
                                 "n_triangles": pd.Series([], dtype=np.int64)})
        vals, cnts = np.unique(parts, return_counts=True)
        return pd.DataFrame({"part": vals,
                             "n_triangles": cnts.astype(np.int64)})

    partials = sharded_map_groups(both, ["a", "b"], close_triangles)
    from ._core import _anchor_schema

    return _anchor_schema(
        sharded_aggregate(partials, "part", {"n_triangles": "sum"},
                          num_shards=8),
        pa.schema([("part", pa.int64()), ("n_triangles", pa.int64())]))


_TRIANGLES_ORACLE = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey),
t AS (SELECT e1.a, e1.b, e2.b AS c
      FROM e e1 JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT part, count(*) AS n_triangles FROM (
  SELECT a AS part FROM t
  UNION ALL SELECT b FROM t
  UNION ALL SELECT c FROM t)
GROUP BY 1
"""


def copurchase_components(sf_dir: str, min_support: int = 2):
    """Connected components over the co-purchase graph — the first
    EXACT-ORACLED run of the distributed label-propagation machinery
    the near-dup clustering rides (``cluster_pairs_distributed``,
    previously pinned only by the pytest union-find differential):
    parts are nodes, edges join parts co-ordered in ≥ ``min_support``
    orders, output is the full cluster table (cluster_id = MIN partkey
    of the component — the same min-label contract as dedup — and the
    component's size).  At sf0.01 the support-2 graph has one
    1860-node giant component plus satellites, so the label rounds /
    pointer jumping actually chase long paths.  Plan: per-order pair
    partials (orderkey exchange) → pair-keyed support counts → edge
    filter → label propagation (single bounded task below the edge
    cap, sharded rounds above) → tiny cluster-keyed fold.  The oracle
    replays min-label reachability with a recursive CTE (state space
    Σ size² — bounded at gate scales).  All-integer — bit-exact.
    NOTE: the paired oracle SQL hardcodes min_support=2."""
    from ..stages.dedup import cluster_pairs_distributed
    from ..stages.shard import sharded_aggregate, sharded_map_groups

    line = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["l_orderkey", "l_partkey"])
        j = d.merge(d, on="l_orderkey")
        j = j[j["l_partkey_x"] < j["l_partkey_y"]]
        out = j.groupby(["l_partkey_x", "l_partkey_y"],
                        as_index=False).size()
        out.columns = ["a", "b", "n"]
        return out.astype(np.int64)

    support = sharded_aggregate(
        sharded_map_groups(line, "l_orderkey", pairs),
        ["a", "b"], {"n": "sum"})

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        keep = b[b["n"].to_numpy(np.int64) >= min_support]
        return pd.DataFrame({
            "doc_a": keep["a"].to_numpy(np.int64),
            "doc_b": keep["b"].to_numpy(np.int64)})

    edges = support.map_batches(gate, batch_format="pandas")
    cc = cluster_pairs_distributed(edges)

    def one(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cluster_id": b["cluster_id"].to_numpy(np.int64),
            "n_parts": np.ones(len(b), dtype=np.int64)})

    from ._core import _anchor_schema

    return _anchor_schema(
        sharded_aggregate(cc.map_batches(one, batch_format="pandas"),
                          "cluster_id", {"n_parts": "sum"},
                          num_shards=4),
        pa.schema([("cluster_id", pa.int64()), ("n_parts", pa.int64())]))


_COPURCHASE_CC_ORACLE = """
WITH RECURSIVE d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT a.l_partkey AS a, b.l_partkey AS b
      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2),
e2 AS (SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e),
nodes AS (SELECT DISTINCT src AS node FROM e2),
reach(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e2.dst, reach.lab FROM reach JOIN e2 ON e2.src = reach.node
),
cc AS (SELECT node, min(lab) AS cluster_id FROM reach GROUP BY node)
SELECT cluster_id, count(*) AS n_parts FROM cc GROUP BY 1
"""


def identical_basket_orders(sf_dir: str):
    """Duplicate-order detection — the relational twin of the corpus
    exact-dedup path: orders whose full basket (the SET of (partkey,
    quantity) lines, line order ignored) is byte-identical to another
    order's, reported as a census per basket size (n duplicate groups,
    n orders inside them).  Plan: ONE orderkey exchange builds each
    order's canonical basket (sorted (partkey, qty-bits) pairs — the
    float qty serializes as its raw IEEE bits so equality is exact)
    and emits a 128-bit md5 fingerprint + size; a fingerprint-keyed
    count exchange finds groups ≥ 2 (the basket bytes never enter the
    second all-to-all — same digest-keyed design as curation dedup);
    a tiny per-size fold finishes.  All-integer — bit-exact."""
    import hashlib

    from ..stages.shard import sharded_aggregate, sharded_map_groups

    line = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_quantity"])

    def fingerprints(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):  # an empty shard must not hash an empty basket
            return pd.DataFrame({
                "h1": pd.Series([], dtype=np.int64),
                "h2": pd.Series([], dtype=np.int64),
                "basket_size": pd.Series([], dtype=np.int64),
                "n_orders": pd.Series([], dtype=np.int64)})
        g = g.sort_values(["l_orderkey", "l_partkey", "l_quantity"],
                          kind="stable")
        pk = g["l_partkey"].to_numpy(np.int64)
        qb = g["l_quantity"].to_numpy(np.float64).view(np.uint64)
        ok = g["l_orderkey"].to_numpy(np.int64)
        bounds = np.flatnonzero(np.diff(ok)) + 1
        h1s, h2s, szs = [], [], []
        for chunk_pk, chunk_qb in zip(np.split(pk, bounds),
                                      np.split(qb, bounds)):
            buf = np.column_stack([chunk_pk.view(np.uint64),
                                   chunk_qb]).tobytes()
            dig = hashlib.md5(buf).digest()
            h1s.append(int.from_bytes(dig[:8], "big") - 2 ** 63)
            h2s.append(int.from_bytes(dig[8:], "big") - 2 ** 63)
            szs.append(len(chunk_pk))
        return pd.DataFrame({
            "h1": pd.Series(h1s, dtype=np.int64),
            "h2": pd.Series(h2s, dtype=np.int64),
            "basket_size": pd.Series(szs, dtype=np.int64),
            "n_orders": np.ones(len(h1s), dtype=np.int64)})

    fps = sharded_map_groups(line, "l_orderkey", fingerprints)
    groups = sharded_aggregate(fps, ["h1", "h2", "basket_size"],
                               {"n_orders": "sum"})

    def dup_census(b: pd.DataFrame) -> pd.DataFrame:
        d = b[b["n_orders"].to_numpy(np.int64) >= 2]
        out = d.groupby("basket_size", as_index=False).agg(
            n_groups=("n_orders", "size"),
            n_dup_orders=("n_orders", "sum"))
        return out.astype(np.int64)

    parts = groups.map_batches(dup_census, batch_format="pandas")
    out = sharded_aggregate(parts, "basket_size",
                            {"n_groups": "sum", "n_dup_orders": "sum"},
                            num_shards=2)
    # a corpus with NO duplicate baskets is a legitimate result; keep
    # the schema on the empty path (the _anchor_schema convention)
    from ._core import _anchor_schema

    return _anchor_schema(out, pa.schema([
        ("basket_size", pa.int64()),
        ("n_groups", pa.int64()),
        ("n_dup_orders", pa.int64()),
    ]))


_IDENTICAL_BASKET_ORACLE = """
WITH b AS (
  SELECT l_orderkey,
         list(ROW(l_partkey, l_quantity)
              ORDER BY l_partkey, l_quantity) AS basket,
         count(*) AS basket_size
  FROM lineitem GROUP BY 1
), g AS (
  SELECT basket, basket_size, count(*) AS n FROM b
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT basket_size, CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(n) AS BIGINT) AS n_dup_orders
FROM g GROUP BY 1
"""
