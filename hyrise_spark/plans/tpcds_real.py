"""Ten REAL TPC-DS queries from the reference's included set, adapted to the
driver schema.

The reference runs ~45 actual TPC-DS queries (the `#`-commented entries in
/root/reference/resources/benchmark/tpcds/query_excludelist.cfg are the
INCLUDED ones; tpcds_benchmark.cpp:22-38 loads the rest). `plans/tpcds.py`
covers the *excluded* families (windows/rollup); this module adapts ten of
the included queries — keeping each query's join graph, predicate structure
and aggregation shape — onto the driver's TPC-H-ish schema:

  store_sales      -> lineitem (joined through orders for customer/date)
  store_returns    -> lineitem with l_returnflag = 'R'
  item             -> part  (i_brand->p_brand, i_category->p_type,
                             i_current_price->p_retailprice)
  customer_address -> nation/region via c_nationkey (ca_state->n_name)
  date_dim         -> EXTRACT on o_orderdate / l_shipdate
  time_dim         -> events.ts (the schema's only sub-day timestamps)
  household_demographics / store -> customer segment / supplier nation

Mapping per query (canonical TPC-DS number -> here):
  Q1  customers returning > 1.2x their state's average      -> tpcds_q1
  Q3  brand revenue for one manufacturer, one month         -> tpcds_q3
  Q6  states where customers buy above-category-price items -> tpcds_q6
  Q7  per-item averages for one demographic slice           -> tpcds_q7
  Q9  five quantity-band buckets, threshold-picked metric   -> tpcds_q9
  Q13 averages under OR'd demographic x price-band filters  -> tpcds_q13
  Q15 zip revenue with IN/state/price disjunction           -> tpcds_q15
  Q19 brand revenue where buyer and seller differ in locale -> tpcds_q19
  Q42 category revenue by year for one month                -> tpcds_q42
  Q96 count of sales in a half-hour slot for one segment    -> tpcds_q96

All Spark plans are the decorrelated DataFrame form (correlated scalar
subqueries become tiny pre-aggregations + broadcast joins — the
SubqueryToJoinRule analog, sql_translator.cpp); dims broadcast explicitly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hyrise_spark.catalog import load_tables
from hyrise_spark.registry import register

R2 = 2


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tabs = load_tables(spark, sf_dir, names)
    return [tabs[n] for n in names]


# --------------------------------------------------------------------------
# Q1: customer_total_return per (customer, state); keep customers whose
# returns exceed 1.2x their state's average. state -> customer nation.
@register(
    "tpcds_q1",
    oracle="""
    WITH ctr AS (
      SELECT o_custkey AS ctr_custkey, c_nationkey AS ctr_nationkey,
             ROUND(SUM(l_extendedprice), 2) AS ctr_total_return
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R' AND EXTRACT(YEAR FROM o_orderdate) = 1997
      GROUP BY 1, 2
    )
    SELECT c_custkey, c_name, ctr_total_return
    FROM ctr ctr1 JOIN customer ON ctr1.ctr_custkey = c_custkey
    WHERE ctr_total_return > (
      SELECT AVG(ctr_total_return) * 1.2 FROM ctr ctr2
      WHERE ctr1.ctr_nationkey = ctr2.ctr_nationkey
    )
    ORDER BY c_custkey LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust = _t(spark, sf_dir, "lineitem", "orders", "customer")
    ctr = (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders.filter(F.year("o_orderdate") == 1997), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("o_custkey").alias("ctr_custkey"), F.col("c_nationkey").alias("ctr_nationkey"))
        .agg(F.round(F.sum("l_extendedprice"), R2).alias("ctr_total_return"))
    )
    # decorrelated: per-nation average once, broadcast back (25 rows)
    nation_avg = ctr.groupBy(F.col("ctr_nationkey").alias("na_nationkey")).agg(
        (F.avg("ctr_total_return") * 1.2).alias("threshold")
    )
    return (
        ctr.join(F.broadcast(nation_avg), F.col("ctr_nationkey") == F.col("na_nationkey"))
        .filter(F.col("ctr_total_return") > F.col("threshold"))
        .join(F.broadcast(cust), F.col("ctr_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "ctr_total_return")
        .orderBy("c_custkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q3: brand revenue for one "manufacturer" (p_type) in one calendar month,
# by ship year.
@register(
    "tpcds_q3",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS d_year,
           p_brand, ROUND(SUM(l_extendedprice), 2) AS sum_agg
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'PROMO' AND EXTRACT(MONTH FROM l_shipdate) = 11
    GROUP BY 1, 2
    ORDER BY d_year, sum_agg DESC, p_brand
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    return (
        li.filter(F.month("l_shipdate") == 11)
        .join(F.broadcast(part.filter(F.col("p_type") == "PROMO")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("l_shipdate").cast("int").alias("d_year"), "p_brand")
        .agg(F.round(F.sum("l_extendedprice"), R2).alias("sum_agg"))
        .orderBy("d_year", F.col("sum_agg").desc(), "p_brand")
    )


# --------------------------------------------------------------------------
# Q6: "states" (customer nations) where >= 10 sold items are priced over
# their category's (p_type) average price. Canonical Q6 uses 1.2x; the
# synthetic price distribution is uniform in [900, 1000] (max/avg ~ 1.05),
# so the adapted constant is 1.04x — same correlated-subquery structure,
# selectivity matched to the data.
@register(
    "tpcds_q6",
    oracle="""
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN part ON l_partkey = p_partkey
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
      AND p_retailprice > 1.04 * (
        SELECT AVG(p2.p_retailprice) FROM part p2 WHERE p2.p_type = part.p_type
      )
    GROUP BY n_name
    HAVING COUNT(*) >= 10
    ORDER BY cnt, n_name
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, nation, part = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "part"
    )
    type_avg = part.groupBy(F.col("p_type").alias("ta_type")).agg(
        F.avg("p_retailprice").alias("avg_price")
    )
    pricey = (
        part.join(F.broadcast(type_avg), F.col("p_type") == F.col("ta_type"))
        .filter(F.col("p_retailprice") > 1.04 * F.col("avg_price"))
        .select("p_partkey")
    )
    return (
        li.join(F.broadcast(pricey), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            orders.filter(F.year("o_orderdate") == 1997),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 10)
        .orderBy("cnt", "n_name")
    )


# --------------------------------------------------------------------------
# Q7: per-item (brand) averages for one demographic slice (segment x
# order priority standing in for cd_gender/cd_marital_status).
@register(
    "tpcds_q7",
    oracle="""
    SELECT p_brand,
           ROUND(AVG(l_quantity), 2) AS agg1,
           ROUND(AVG(l_extendedprice), 2) AS agg2,
           ROUND(AVG(l_discount), 2) AS agg3,
           ROUND(AVG(l_tax), 2) AS agg4
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN part ON l_partkey = p_partkey
    WHERE c_mktsegment = 'BUILDING' AND o_orderpriority = '1-URGENT'
    GROUP BY p_brand ORDER BY p_brand LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, part = _t(spark, sf_dir, "lineitem", "orders", "customer", "part")
    return (
        li.join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.round(F.avg("l_quantity"), R2).alias("agg1"),
            F.round(F.avg("l_extendedprice"), R2).alias("agg2"),
            F.round(F.avg("l_discount"), R2).alias("agg3"),
            F.round(F.avg("l_tax"), R2).alias("agg4"),
        )
        .orderBy("p_brand")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q9: five quantity bands; each bucket reports avg discount if the band is
# over-represented (> 1/5 of rows), else avg tax. Canonical Q9 runs 15
# scalar-subquery scans; the Spark-first form is ONE pass of conditional
# aggregation — same values, 15x less I/O (the oracle uses the same
# single-pass formulation so both engines compute identical doubles).
_Q9_BANDS = [(1, 10), (11, 20), (21, 30), (31, 40), (41, 50)]


def _q9_oracle() -> str:
    cols, outs = [], []
    for i, (lo, hi) in enumerate(_Q9_BANDS, 1):
        band = f"l_quantity BETWEEN {lo} AND {hi}"
        cols.append(f"SUM(CASE WHEN {band} THEN 1 ELSE 0 END) AS cnt{i}")
        cols.append(f"ROUND(AVG(CASE WHEN {band} THEN l_discount END), 4) AS avgd{i}")
        cols.append(f"ROUND(AVG(CASE WHEN {band} THEN l_tax END), 4) AS avgt{i}")
        outs.append(f"CASE WHEN cnt{i} * 5 > total THEN avgd{i} ELSE avgt{i} END AS bucket{i}")
    return f"""
    WITH agg AS (SELECT COUNT(*) AS total, {", ".join(cols)} FROM lineitem)
    SELECT {", ".join(outs)} FROM agg
    """


@register("tpcds_q9", oracle=_q9_oracle(), tags=("tpcds", "tpcds-real"))
def tpcds_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("total")]
    for i, (lo, hi) in enumerate(_Q9_BANDS, 1):
        band = F.col("l_quantity").between(lo, hi)
        aggs.append(F.sum(F.when(band, 1).otherwise(0)).alias(f"cnt{i}"))
        aggs.append(F.round(F.avg(F.when(band, F.col("l_discount"))), 4).alias(f"avgd{i}"))
        aggs.append(F.round(F.avg(F.when(band, F.col("l_tax"))), 4).alias(f"avgt{i}"))
    agg = li.agg(*aggs)
    return agg.select(
        *[
            F.when(F.col(f"cnt{i}") * 5 > F.col("total"), F.col(f"avgd{i}"))
            .otherwise(F.col(f"avgt{i}"))
            .alias(f"bucket{i}")
            for i in range(1, len(_Q9_BANDS) + 1)
        ]
    )


# --------------------------------------------------------------------------
# Q13: one-row averages under OR'd (demographic x quantity-band x
# order-value-band) composite predicates.
@register(
    "tpcds_q13",
    oracle="""
    SELECT ROUND(AVG(l_quantity), 2) AS avg_qty,
           ROUND(AVG(l_extendedprice), 2) AS avg_price,
           ROUND(SUM(l_extendedprice), 2) AS sum_price
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE (c_mktsegment = 'BUILDING' AND o_orderpriority = '1-URGENT'
           AND l_quantity BETWEEN 1 AND 20 AND o_totalprice BETWEEN 50000 AND 150000)
       OR (c_mktsegment = 'MACHINERY' AND o_orderpriority = '2-HIGH'
           AND l_quantity BETWEEN 21 AND 35 AND o_totalprice BETWEEN 100000 AND 250000)
       OR (c_mktsegment = 'AUTOMOBILE' AND o_orderpriority = '3-MEDIUM'
           AND l_quantity BETWEEN 36 AND 50 AND o_totalprice BETWEEN 150000 AND 300000)
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust = _t(spark, sf_dir, "lineitem", "orders", "customer")
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    seg, prio, q, tp = (
        F.col("c_mktsegment"),
        F.col("o_orderpriority"),
        F.col("l_quantity"),
        F.col("o_totalprice"),
    )
    cond = (
        ((seg == "BUILDING") & (prio == "1-URGENT") & q.between(1, 20) & tp.between(50000, 150000))
        | ((seg == "MACHINERY") & (prio == "2-HIGH") & q.between(21, 35) & tp.between(100000, 250000))
        | ((seg == "AUTOMOBILE") & (prio == "3-MEDIUM") & q.between(36, 50) & tp.between(150000, 300000))
    )
    return joined.filter(cond).agg(
        F.round(F.avg("l_quantity"), R2).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), R2).alias("avg_price"),
        F.round(F.sum("l_extendedprice"), R2).alias("sum_price"),
    )


# --------------------------------------------------------------------------
# Q15: "zip" (nation) revenue for one quarter where nation is in a list, OR
# its region qualifies, OR the order is high-value — the canonical
# zip-list/state-list/price disjunction.
@register(
    "tpcds_q15",
    oracle="""
    SELECT n_name, ROUND(SUM(l_extendedprice), 2) AS total_sales
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE (n_name IN ('NATION_1', 'NATION_5', 'NATION_9')
           OR r_name = 'ASIA' OR o_totalprice > 200000)
      AND EXTRACT(YEAR FROM o_orderdate) = 1997
      AND EXTRACT(QUARTER FROM o_orderdate) = 2
    GROUP BY n_name ORDER BY n_name LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, nation, region = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region"
    )
    return (
        li.join(
            orders.filter((F.year("o_orderdate") == 1997) & (F.quarter("o_orderdate") == 2)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(
            F.col("n_name").isin("NATION_1", "NATION_5", "NATION_9")
            | (F.col("r_name") == "ASIA")
            | (F.col("o_totalprice") > 200000)
        )
        .groupBy("n_name")
        .agg(F.round(F.sum("l_extendedprice"), R2).alias("total_sales"))
        .orderBy("n_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q19: brand revenue for one month where the buyer's locale differs from the
# seller's (ca_zip <> s_zip becomes customer nation <> supplier nation).
@register(
    "tpcds_q19",
    oracle="""
    SELECT p_brand, p_type, ROUND(SUM(l_extendedprice), 2) AS ext_price
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE EXTRACT(MONTH FROM o_orderdate) = 11 AND c_nationkey <> s_nationkey
    GROUP BY p_brand, p_type
    ORDER BY ext_price DESC, p_brand, p_type LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, supp, part = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "part"
    )
    return (
        li.join(
            orders.filter(F.month("o_orderdate") == 11),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.round(F.sum("l_extendedprice"), R2).alias("ext_price"))
        .orderBy(F.col("ext_price").desc(), "p_brand", "p_type")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q42: category (p_type) revenue by ship year for one month, small parts.
@register(
    "tpcds_q42",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS d_year, p_type,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE EXTRACT(MONTH FROM l_shipdate) = 12 AND p_size < 6
    GROUP BY 1, 2
    ORDER BY revenue DESC, d_year, p_type LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    return (
        li.filter(F.month("l_shipdate") == 12)
        .join(F.broadcast(part.filter(F.col("p_size") < 6)), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("l_shipdate").cast("int").alias("d_year"), "p_type")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), R2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "d_year", "p_type")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q96: count of events in a half-hour slot for one customer segment
# (time_dim hour/minute predicate + household_demographics join; events.ts
# is the schema's only sub-day time dimension).
@register(
    "tpcds_q96",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events
    JOIN customer ON user_id = c_custkey
    WHERE EXTRACT(HOUR FROM ts) = 20 AND EXTRACT(MINUTE FROM ts) >= 30
      AND event_type = 'click' AND c_mktsegment = 'HOUSEHOLD'
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    events, cust = _t(spark, sf_dir, "events", "customer")
    return (
        events.filter(
            (F.hour("ts") == 20) & (F.minute("ts") >= 30) & (F.col("event_type") == "click")
        )
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "HOUSEHOLD")),
            F.col("user_id") == F.col("c_custkey"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
