"""Analytic superset — grouping sets / rollup / cube, pivot / unpivot,
approximate sketches.

The reference has none of these ("No grouping sets / cube / rollup ... no
approx_count_distinct-style sketches", SURVEY.md §2.4) — they come free with
Spark and round out the OLAP surface its users would expect. Sketch queries
whose output is approximate by construction register without an oracle
(driver's rows-only check) but pin their error bounds in tests/.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hyrise_spark.catalog import load_tables
from hyrise_spark.registry import register


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tabs = load_tables(spark, sf_dir, names)
    return [tabs[n] for n in names]


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("aggregate", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           ROUND(SUM(o_totalprice), 2) AS total, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("aggregate", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total"), F.count(F.lit(1)).alias("n")
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("aggregate", "grouping-sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# Pivot: avg-free (deterministic SUM) wide table of order counts by status.
@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS F,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS O,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("pivot",),
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .fillna(0, subset=["F", "O", "P"])
        .select(
            "o_orderpriority",
            F.col("F").cast("long").alias("F"),
            F.col("O").cast("long").alias("O"),
            F.col("P").cast("long").alias("P"),
        )
    )


# Unpivot (melt/stack): wide -> long over part price/size attributes.
@register(
    "unpivot_part_attrs",
    oracle="""
    SELECT p_partkey, attr, val FROM (
      SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part
      UNION ALL
      SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
    ) u WHERE p_partkey < 100
    """,
    tags=("unpivot",),
)
def unpivot_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = _t(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_partkey") < 100)
        .select(
            "p_partkey",
            F.col("p_retailprice").alias("retailprice"),
            F.col("p_size").cast("double").alias("size"),
        )
        .unpivot("p_partkey", ["retailprice", "size"], "attr", "val")
    )


# Approximate sketches: output is estimator-specific -> rows-only check here;
# tests/test_sketches.py pins the error bounds against exact values.
@register("sketch_approx_distinct", oracle=None, tags=("sketch",))
def sketch_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    # Approx ONLY: mixing approx_count_distinct with an exact count_distinct
    # in one agg makes Catalyst plan them as separate subplans joined back
    # (5x slower measured); the exact comparison lives in the test instead.
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.05).alias("approx_orders")
    )


@register("sketch_percentile_approx", oracle=None, tags=("sketch",))
def sketch_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000).alias("pcts"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
