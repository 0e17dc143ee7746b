"""Bucketed-layout variants of TPC-H Q3/Q18 — the write-time-shuffle
amortization demo.

The reference pays radix partitioning inside every hash join
(join_hash.cpp:38 build phase); a warehouse pays it ONCE at write time:
lineitem and orders bucketed by orderkey into the same bucket count join
with NO exchange on either side, for every subsequent query
(layout.write_bucketed). These two registered variants run the exact
tpch_q3/tpch_q18 plans against the bucketed tables — same oracle SQL, same
results, fewer shuffles. bench.py builds the bucketed tables during its
uncounted warm-up (the amortized write), so their timings measure the
query-time win.

At 100 TB: bucket the fact tables by their dominant join key at ingest;
every orderkey join and orderkey-prefixed aggregation in this file then
runs shuffle-free.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

import hyrise_spark.plans.tpch  # noqa: F401  (registers the oracles we reuse)
from hyrise_spark.catalog import load_tables
from hyrise_spark.registry import _REGISTRY, register

R2 = 2
_N_BUCKETS = 32


def ensure_bucketed(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Create (once per session x sf_dir) lineitem/orders bucketed by
    orderkey; returns {logical_name: table_name}. Idempotent: reuses live
    catalog tables, so repeated queries pay zero build cost."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    names = {t: f"bk_{tag}_{t}" for t in ("lineitem", "orders")}
    if not all(spark.catalog.tableExists(t) for t in names.values()):
        from hyrise_spark.layout import write_bucketed

        tabs = load_tables(spark, sf_dir, ("lineitem", "orders"))
        write_bucketed(tabs["lineitem"], names["lineitem"], "l_orderkey", _N_BUCKETS)
        write_bucketed(tabs["orders"], names["orders"], "o_orderkey", _N_BUCKETS)
    return names


# Same data -> same answers: the bucketed variants reuse the plain queries'
# oracle SQL verbatim (registered before this module loads).
@register("tpch_q3_bucketed", oracle=_REGISTRY["tpch_q3"].oracle, tags=("tpch", "bucketed"))
def tpch_q3_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = ensure_bucketed(spark, sf_dir)
    li = spark.table(names["lineitem"])
    orders = spark.table(names["orders"])
    (cust,) = (load_tables(spark, sf_dir, ("customer",))["customer"],)
    # identical plan shape to tpch_q3; the orderkey join + orderkey-prefixed
    # groupBy ride the bucketing (no Exchange on either fact side)
    return (
        orders.filter(F.col("o_orderdate") < F.lit("1998-03-15"))
        .join(
            cust.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            li.filter(F.col("l_shipdate") > F.lit("1998-03-15")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), R2).alias("revenue"))
        .select("l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("o_orderdate"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register("tpch_q18_bucketed", oracle=_REGISTRY["tpch_q18"].oracle, tags=("tpch", "bucketed"))
def tpch_q18_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = ensure_bucketed(spark, sf_dir)
    li = spark.table(names["lineitem"])
    orders = spark.table(names["orders"])
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    # every orderkey hop (HAVING agg, semi join, re-join, final groupBy) is
    # co-located by the bucketing — no fact-table exchange anywhere
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 150)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        orders.join(big, orders["o_orderkey"] == big["big_orderkey"], "left_semi")
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), R2).alias("sum_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.round("o_totalprice", R2).alias("o_totalprice"), "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )
