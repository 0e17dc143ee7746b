"""TPC-C — the reference's OLTP benchmark, adapted to the driver schema.

The reference ships TPC-C as a first-class suite
(src/benchmark/tpcc_benchmark.cpp; procedures in
src/benchmarklib/tpcc/procedures/*). Its five transactions split into:

  read-only  : OrderStatus, StockLevel      -> registered queries below
  read-write : NewOrder, Payment, Delivery  -> Engine DML sequences,
               exercised in tests/test_tpcc.py (BEGIN/COMMIT wrapped,
               the reference's transaction_manager.hpp surface)

Schema mapping (no warehouse/district/stock tables in the driver data):

  district        -> customer nation (the per-locality grouping unit)
  customer        -> customer
  orders / order_line -> orders / lineitem
  item            -> part
  stock s_quantity    -> p_size (the only per-part integer "level")

Like the reference ("we do not claim to report correctly calculated tpmC",
tpcc_benchmark.cpp:30), these preserve each procedure's *query shape* —
greatest-per-group latest order, last-20-orders low-stock distinct count —
not official tpmC semantics.

Scale note: OrderStatus is a per-customer window (shuffle by o_custkey,
then per-key top-1 — no global sort); StockLevel's "last 20 orders" window
partitions by nation (25 partitions at any SF — the window never sees more
than one nation's orders per partition).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from hyrise_spark.catalog import load_tables
from hyrise_spark.registry import register

R2 = 2


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tabs = load_tables(spark, sf_dir, names)
    return [tabs[n] for n in names]


# --------------------------------------------------------------------------
# OrderStatus (tpcc/procedures/tpcc_order_status.cpp): a customer's most
# recent order, with its line count and total amount. Run for every
# BUILDING-segment customer (the procedure's by-last-name variant selects a
# customer set, not a single key).
@register(
    "tpcc_order_status",
    oracle="""
    WITH latest AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    )
    SELECT c_custkey, c_name, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
           CAST(COUNT(l_linenumber) AS BIGINT) AS line_count,
           ROUND(SUM(l_extendedprice), 2) AS amount_sum
    FROM latest
    JOIN customer ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE rn = 1 AND c_mktsegment = 'BUILDING'
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    ORDER BY c_custkey LIMIT 200
    """,
    tags=("tpcc",),
)
def tpcc_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, cust, li = _t(spark, sf_dir, "orders", "customer", "lineitem")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    latest = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )
    return (
        latest.join(
            cust.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(
            F.count("l_linenumber").alias("line_count"),
            F.round(F.sum("l_extendedprice"), R2).alias("amount_sum"),
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", R2).alias("o_totalprice"),
            "line_count",
            "amount_sum",
        )
        .orderBy("c_custkey")
        .limit(200)
    )


# --------------------------------------------------------------------------
# StockLevel (tpcc/procedures/tpcc_stock_level.cpp): distinct items in the
# district's last 20 orders whose stock is below a threshold. District ->
# customer nation, stock level -> p_size, threshold 15.
@register(
    "tpcc_stock_level",
    oracle="""
    WITH recent AS (
      SELECT n_nationkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY n_nationkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
    )
    SELECT n_name, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS low_stock
    FROM recent
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    JOIN nation ON recent.n_nationkey = nation.n_nationkey
    WHERE rn <= 20 AND p_size < 15
    GROUP BY n_name ORDER BY n_name
    """,
    tags=("tpcc",),
)
def tpcc_stock_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, cust, nation, li, part = _t(
        spark, sf_dir, "orders", "customer", "nation", "lineitem", "part"
    )
    w = Window.partitionBy("n_nationkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    recent = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("n_name", "o_orderkey")
    )
    return (
        recent.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(part.filter(F.col("p_size") < 15), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("n_name")
        .agg(F.countDistinct("l_partkey").alias("low_stock"))
        .orderBy("n_name")
    )
