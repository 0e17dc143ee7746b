"""REAL TPC-DS queries adapted to the driver schema — together with
plans/tpcds.py this covers ALL 99: the reference's COMPLETE included set
(all 49 entries of query_excludelist.cfg's `#`-commented list, 48 distinct
+ the 39a/39b pair) PLUS every query it EXCLUDES as unexecutable
(window/ROLLUP/set-op families; batch 5: Q5 12 22 27 36 38 47 51 53 57 59
67 70 74 75 76 86 87 89 98; round-4 batch: Q2 4 8 11 14 18 20 21 23 24 30
33 40 44 46 49 54 56 58 60 61 63 64 66 68 71 72 77 78 80 90) — both halves
of the reference's TPC-DS split, 99/99.

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
subqueries become tiny pre-aggregations + joins — the SubqueryToJoinRule
analog, sql_translator.cpp). Dim joins carry NO broadcast hints: plan
choice is left to CBO/AQE thresholds so a dim that outgrows the broadcast
limit falls back to a shuffle join instead of dying at the 8 GB hint cap
(lint-enforced in tests/test_plan_quality.py; measured sublinear in the
SCALE.md §10 dims probe).
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


def _ts_range(col: str, start: str, end: str):
    """Half-open timestamp range — pushable to the parquet scan, unlike
    EXTRACT/year() which wrap the column in a function and defeat pushdown."""
    return (F.col(col) >= F.lit(start)) & (F.col(col) < F.lit(end))


# Year span of the synthetic dataset (TESTDATA.md: 1995..2001) with margin on
# both sides. In production the engine would take min/max from table stats;
# here the span is a dataset property the month-range rewrites rely on.
_DATA_YEARS = tuple(range(1994, 2003))


def _or_all(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def _month_ranges(col: str, m_lo: int, m_hi: int | None = None):
    """month(col) BETWEEN m_lo AND m_hi (any year), in the hybrid form
    `month() BETWEEN ... AND <OR of per-year half-open raw-column ranges>`:
    the OR of ranges reaches the parquet scan (PushedFilters -> row-group /
    partition pruning at 100 TB), while the cheap month() term short-circuits
    the surviving rows before the wide OR tree is evaluated (measured 0.23 s
    vs 0.37 s OR-only vs 0.30 s month-only on the sf0.1 lineitem scan)."""
    m_hi = m_lo if m_hi is None else m_hi
    end = lambda y: f"{y + 1}-01-01" if m_hi == 12 else f"{y}-{m_hi + 1:02d}-01"
    ranges = _or_all([
        (F.col(col) >= f"{y}-{m_lo:02d}-01") & (F.col(col) < end(y))
        for y in _DATA_YEARS
    ])
    return F.month(col).between(m_lo, m_hi) & ranges


def _first_days_ranges(col: str, last_day: int):
    """dayofmonth(col) <= last_day (any month/year).

    Deliberately NOT rewritten as an OR of 108 per-month ranges: measured
    on sf0.1, the wide OR costs ~8 us/row (1.35 s vs 0.13 s on the orders
    scan; tpcds_q68 0.39 s -> 1.5 s end-to-end) while buying NOTHING on
    this data — TIMESTAMP_NTZ columns get no parquet row-group filtering
    in Spark 4.1 (pinned by
    tests/test_layout.py::test_date_sorted_layout_skips_row_groups), so
    the pushed ranges never skip anything. The scale path for day-of-month
    scans is the `layout.write_date_sorted` DATE relayout, where days 1-N
    of each month cluster into skippable row groups and this predicate
    stays cheap. Lint exception recorded in
    test_plan_quality._DATE_FN_FILTER_ALLOWLIST."""
    return F.dayofmonth(col) <= last_day


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
        .join(orders.filter(_ts_range("o_orderdate", "1997-01-01", "1998-01-01")), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("o_custkey").alias("ctr_custkey"), F.col("c_nationkey").alias("ctr_nationkey"))
        .agg(F.round(F.sum("l_extendedprice"), R2).alias("ctr_total_return"))
    )
    # decorrelated: per-nation average once, broadcast back (25 rows)
    nation_avg = ctr.groupBy(F.col("ctr_nationkey").alias("na_nationkey")).agg(
        (F.avg("ctr_total_return") * 1.2).alias("threshold")
    )
    return (
        ctr.join(nation_avg, F.col("ctr_nationkey") == F.col("na_nationkey"))
        .filter(F.col("ctr_total_return") > F.col("threshold"))
        .join(cust, F.col("ctr_custkey") == F.col("c_custkey"))
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
        li.filter(_month_ranges("l_shipdate", 11))
        .join(part.filter(F.col("p_type") == "PROMO"), F.col("l_partkey") == F.col("p_partkey"))
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
        part.join(type_avg, F.col("p_type") == F.col("ta_type"))
        .filter(F.col("p_retailprice") > 1.04 * F.col("avg_price"))
        .select("p_partkey")
    )
    return (
        li.join(pricey, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            orders.filter(_ts_range("o_orderdate", "1997-01-01", "1998-01-01")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
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
            cust.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
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
        cust, F.col("o_custkey") == F.col("c_custkey")
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
            orders.filter(_ts_range("o_orderdate", "1997-04-01", "1997-07-01")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
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
            orders.filter(_month_ranges("o_orderdate", 11)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
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
        li.filter(_month_ranges("l_shipdate", 12))
        .join(part.filter(F.col("p_size") < 6), F.col("l_partkey") == F.col("p_partkey"))
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
            cust.filter(F.col("c_mktsegment") == "HOUSEHOLD"),
            F.col("user_id") == F.col("c_custkey"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ==========================================================================
# Batch 2 — ten more queries from the reference's included set.
#   Q17 quantity count/avg/stdev split by return status per brand
#   Q28 six quantity bands x (avg price, count, distinct parts)
#   Q31 quarter-over-quarter growth, web channel vs store channel
#   Q37 parts in a price/size band with sales inside a 60-day window
#   Q41 DISTINCT part names whose brand carries qualifying attribute combos
#   Q45 nation revenue where key IN list OR brand IN subquery
#   Q50 ship-latency bucket counts per supplier nation
#   Q79 each customer's single highest-revenue order
#   Q92 excessive discount: rows discounted > 1.3x their part's average
#   Q93 per-customer net sales excluding returned lineitems
# Channel mapping for Q31: "store" = order priorities 1-2, "web" = 4-5.


# --------------------------------------------------------------------------
# Q17: per-brand quantity statistics (count / avg / stddev_samp), kept vs
# returned lineitems in one year. HAVING >= 2 on both sides keeps
# stddev_samp non-NULL and cross-engine stable.
@register(
    "tpcds_q17",
    oracle="""
    SELECT p_brand,
           CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS kept_cnt,
           ROUND(AVG(CASE WHEN l_returnflag <> 'R' THEN l_quantity END), 2) AS kept_avg,
           ROUND(STDDEV_SAMP(CASE WHEN l_returnflag <> 'R' THEN l_quantity END), 4) AS kept_std,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS ret_cnt,
           ROUND(AVG(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS ret_avg,
           ROUND(STDDEV_SAMP(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 4) AS ret_std
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
    GROUP BY p_brand
    HAVING SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) >= 2
       AND SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) >= 2
    ORDER BY p_brand
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    kept = F.when(F.col("l_returnflag") != "R", F.col("l_quantity"))
    ret = F.when(F.col("l_returnflag") == "R", F.col("l_quantity"))
    return (
        li.filter(_ts_range("l_shipdate", "1997-01-01", "1998-01-01"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.sum(F.when(F.col("l_returnflag") != "R", 1).otherwise(0)).alias("kept_cnt"),
            F.round(F.avg(kept), R2).alias("kept_avg"),
            F.round(F.stddev_samp(kept), 4).alias("kept_std"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("ret_cnt"),
            F.round(F.avg(ret), R2).alias("ret_avg"),
            F.round(F.stddev_samp(ret), 4).alias("ret_std"),
        )
        .filter((F.col("kept_cnt") >= 2) & (F.col("ret_cnt") >= 2))
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# Q28: six quantity bands, each reporting avg price / row count / distinct
# part count. Canonical Q28 cross-joins six scalar-subquery scans; grouped
# conditional aggregation computes the same measures in ONE pass.
@register(
    "tpcds_q28",
    oracle="""
    SELECT CAST(FLOOR((l_quantity - 1) / 8) AS INTEGER) AS band,
           ROUND(AVG(l_extendedprice), 2) AS avg_price,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS distinct_parts
    FROM lineitem
    WHERE l_quantity BETWEEN 1 AND 48
    GROUP BY 1 ORDER BY band
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity").between(1, 48))
        .groupBy(F.floor((F.col("l_quantity") - 1) / 8).cast("int").alias("band"))
        .agg(
            F.round(F.avg("l_extendedprice"), R2).alias("avg_price"),
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("l_partkey").alias("distinct_parts"),
        )
        .orderBy("band")
    )


# --------------------------------------------------------------------------
# Q31: nations where the "web" channel (priorities 4-5) grew faster than the
# "store" channel (priorities 1-2) across consecutive quarters of 1997.
@register(
    "tpcds_q31",
    oracle="""
    WITH sales AS (
      SELECT n_name,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'store' ELSE 'web' END AS channel,
             CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS q,
             SUM(o_totalprice) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
        AND o_orderpriority IN ('1-URGENT', '2-HIGH', '4-NOT SPECIFIED', '5-LOW')
      GROUP BY 1, 2, 3
    ), pivoted AS (
      SELECT n_name,
             SUM(CASE WHEN channel = 'store' AND q = 1 THEN rev ELSE 0 END) AS ss1,
             SUM(CASE WHEN channel = 'store' AND q = 2 THEN rev ELSE 0 END) AS ss2,
             SUM(CASE WHEN channel = 'web' AND q = 1 THEN rev ELSE 0 END) AS ws1,
             SUM(CASE WHEN channel = 'web' AND q = 2 THEN rev ELSE 0 END) AS ws2
      FROM sales GROUP BY n_name
    )
    SELECT n_name,
           ROUND(ws2 / ws1, 4) AS web_growth,
           ROUND(ss2 / ss1, 4) AS store_growth
    FROM pivoted
    WHERE ws1 > 0 AND ss1 > 0 AND ws2 / ws1 > ss2 / ss1
    ORDER BY n_name
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, cust, nation = _t(spark, sf_dir, "orders", "customer", "nation")
    prio = F.col("o_orderpriority")
    sales = (
        orders.filter(
            _ts_range("o_orderdate", "1997-01-01", "1998-01-01")
            & prio.isin("1-URGENT", "2-HIGH", "4-NOT SPECIFIED", "5-LOW")
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.when(prio.isin("1-URGENT", "2-HIGH"), "store").otherwise("web").alias("channel"),
            F.quarter("o_orderdate").cast("int").alias("q"),
            "o_totalprice",
        )
    )
    piv = sales.groupBy("n_name").agg(
        *[
            F.sum(
                F.when((F.col("channel") == ch) & (F.col("q") == q), F.col("o_totalprice")).otherwise(0.0)
            ).alias(f"{ch[0]}s{q}")
            for ch in ("store", "web")
            for q in (1, 2)
        ]
    )
    return (
        piv.filter(
            (F.col("ws1") > 0) & (F.col("ss1") > 0)
            & (F.col("ws2") / F.col("ws1") > F.col("ss2") / F.col("ss1"))
        )
        .select(
            "n_name",
            F.round(F.col("ws2") / F.col("ws1"), 4).alias("web_growth"),
            F.round(F.col("ss2") / F.col("ss1"), 4).alias("store_growth"),
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Q37: parts in a price band and size band ("inventory level") that actually
# sold inside a 60-day window — the semi-join-on-window shape.
@register(
    "tpcds_q37",
    oracle="""
    SELECT p_name, ROUND(p_retailprice, 2) AS p_retailprice
    FROM part
    WHERE p_retailprice BETWEEN 920 AND 960 AND p_size BETWEEN 5 AND 25
      AND p_partkey IN (
        SELECT l_partkey FROM lineitem
        WHERE l_shipdate >= DATE '1997-03-01' AND l_shipdate < DATE '1997-04-30'
      )
    GROUP BY p_name, p_retailprice
    ORDER BY p_name, p_retailprice LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ORDER BY covers BOTH output columns (round 13): p_name is not unique,
    # so `ORDER BY p_name LIMIT 100` left the cut engine-nondeterministic
    # once name collisions appear (first diverged at sf0.1 — the sf0.01
    # sweeps agreed by luck). Total order = deterministic LIMIT.
    li, part = _t(spark, sf_dir, "lineitem", "part")
    sold = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01")) & (F.col("l_shipdate") < F.lit("1997-04-30"))
    ).select("l_partkey")
    return (
        part.filter(F.col("p_retailprice").between(920, 960) & F.col("p_size").between(5, 25))
        .join(sold, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("p_name", F.round("p_retailprice", R2).alias("p_retailprice"))
        .agg(F.lit(1))
        .select("p_name", "p_retailprice")
        .orderBy("p_name", "p_retailprice")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q41: DISTINCT part names in a size band whose BRAND also carries parts
# matching OR'd attribute combos (correlated COUNT > 0 -> semi join on the
# qualifying-brand set).
@register(
    "tpcds_q41",
    oracle="""
    SELECT DISTINCT p_name
    FROM part p1
    WHERE p_size BETWEEN 10 AND 20
      AND (SELECT COUNT(*) FROM part p2
           WHERE p2.p_brand = p1.p_brand
             AND ((p2.p_type = 'PROMO' AND p2.p_size BETWEEN 1 AND 15)
               OR (p2.p_type = 'ECONOMY' AND p2.p_size BETWEEN 20 AND 35))) > 0
    ORDER BY p_name LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = _t(spark, sf_dir, "part")
    qualifying = part.filter(
        ((F.col("p_type") == "PROMO") & F.col("p_size").between(1, 15))
        | ((F.col("p_type") == "ECONOMY") & F.col("p_size").between(20, 35))
    ).select(F.col("p_brand").alias("q_brand")).distinct()
    return (
        part.filter(F.col("p_size").between(10, 20))
        .join(qualifying, F.col("p_brand") == F.col("q_brand"), "left_semi")
        .select("p_name")
        .distinct()
        .orderBy("p_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q45: nation revenue for one quarter where the part key is in an explicit
# list OR its brand comes from a subquery (the canonical zip-list OR
# item-subquery disjunction).
@register(
    "tpcds_q45",
    oracle="""
    SELECT n_name, ROUND(SUM(l_extendedprice), 2) AS total_sales
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN part ON l_partkey = p_partkey
    WHERE (l_partkey IN (2, 11, 24, 37, 49)
           OR p_brand IN (SELECT p_brand FROM part WHERE p_size = 1))
      AND EXTRACT(YEAR FROM o_orderdate) = 1998 AND EXTRACT(QUARTER FROM o_orderdate) = 1
    GROUP BY n_name ORDER BY n_name LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, nation, part = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "part"
    )
    # Brand-subquery disjunction stays relational: flag qualifying brands on the
    # (already-broadcast) part side instead of collecting them to the driver —
    # the flag join is brand-level and tiny, so the whole dim stays broadcastable.
    q_brands = (
        part.filter(F.col("p_size") == 1)
        .select(F.col("p_brand").alias("q_brand"))
        .distinct()
        .withColumn("brand_qualifies", F.lit(True))
    )
    part_flagged = part.join(
        q_brands, F.col("p_brand") == F.col("q_brand"), "left"
    ).drop("q_brand")
    return (
        li.join(
            orders.filter(_ts_range("o_orderdate", "1998-01-01", "1998-04-01")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(part_flagged, F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            F.col("l_partkey").isin(2, 11, 24, 37, 49)
            | F.col("brand_qualifies").isNotNull()
        )
        .groupBy("n_name")
        .agg(F.round(F.sum("l_extendedprice"), R2).alias("total_sales"))
        .orderBy("n_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q50: ship-latency bucket counts (order date -> ship date) per supplier
# nation — the canonical 30/60/90/120/120+ day histogram.
@register(
    "tpcds_q50",
    oracle="""
    SELECT n_name,
           CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) BETWEEN 31 AND 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
           CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) BETWEEN 61 AND 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
           CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) BETWEEN 91 AND 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120,
           CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 120 THEN 1 ELSE 0 END) AS BIGINT) AS d_over_120
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
    GROUP BY n_name ORDER BY n_name
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, supp, nation = _t(spark, sf_dir, "lineitem", "orders", "supplier", "nation")
    lat = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))

    def band(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).alias(name)

    return (
        li.join(
            orders.filter(_ts_range("o_orderdate", "1997-01-01", "1998-01-01")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            band(lat <= 30, "d30"),
            band(lat.between(31, 60), "d60"),
            band(lat.between(61, 90), "d90"),
            band(lat.between(91, 120), "d120"),
            band(lat > 120, "d_over_120"),
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Q79: each customer's single highest-revenue order (greatest-per-group via
# ranked window, deterministic tie-break on orderkey).
@register(
    "tpcds_q79",
    oracle="""
    WITH per_order AS (
      SELECT c_custkey, c_name, o_orderkey,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS rev
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
      GROUP BY c_custkey, c_name, o_orderkey
    ), ranked AS (
      SELECT c_custkey, c_name, o_orderkey, rev,
             ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY rev DESC, o_orderkey) AS rn
      FROM per_order
    )
    SELECT c_custkey, c_name, o_orderkey AS top_orderkey, rev
    FROM ranked WHERE rn = 1
    ORDER BY c_custkey LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li, orders, cust = _t(spark, sf_dir, "lineitem", "orders", "customer")
    per_order = (
        li.join(
            orders.filter(_ts_range("o_orderdate", "1997-01-01", "1998-01-01")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), R2).alias("rev"))
    )
    w = Window.partitionBy("c_custkey").orderBy(F.col("rev").desc(), F.col("o_orderkey"))
    return (
        per_order.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "c_name", F.col("o_orderkey").alias("top_orderkey"), "rev")
        .orderBy("c_custkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q92: excessive discount — total discount amount on lineitems discounted
# more than 1.3x their part's average discount over the period.
@register(
    "tpcds_q92",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS excess_discount_amount
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'PROMO'
      AND EXTRACT(YEAR FROM l_shipdate) = 1997
      AND l_discount > 1.3 * (
        SELECT AVG(l2.l_discount) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey
          AND EXTRACT(YEAR FROM l2.l_shipdate) = 1997
      )
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    li97 = li.filter(_ts_range("l_shipdate", "1997-01-01", "1998-01-01"))
    part_avg = li97.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (F.lit(1.3) * F.avg("l_discount")).alias("disc_threshold")
    )
    return (
        li97.join(part.filter(F.col("p_type") == "PROMO"), F.col("l_partkey") == F.col("p_partkey"))
        .join(part_avg, F.col("l_partkey") == F.col("pa_partkey"))
        .filter(F.col("l_discount") > F.col("disc_threshold"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), R2).alias("excess_discount_amount"))
    )


# --------------------------------------------------------------------------
# Q93: per-customer net sales counting only non-returned lineitems.
@register(
    "tpcds_q93",
    oracle="""
    SELECT c_custkey,
           ROUND(SUM(CASE WHEN l_returnflag <> 'R' THEN l_quantity * l_extendedprice ELSE 0 END), 2) AS act_sales
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey
    ORDER BY act_sales DESC, c_custkey LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust = _t(spark, sf_dir, "lineitem", "orders", "customer")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("l_returnflag") != "R",
                        F.col("l_quantity") * F.col("l_extendedprice"),
                    ).otherwise(0.0)
                ),
                R2,
            ).alias("act_sales")
        )
        .orderBy(F.col("act_sales").desc(), "c_custkey")
        .limit(100)
    )


# ==========================================================================
# Batch 3 — thirteen more queries from the reference's included set
# (resources/benchmark/tpcds/query_excludelist.cfg; tpcds_benchmark.cpp:22).
#   Q10 customers active in BOTH channels, counted by segment
#   Q16 orders with a second distinct supplier and no returns (EXISTS/NOT EXISTS)
#   Q25 three-channel join: store buy -> return -> web re-buy per customer
#   Q34 orders with 6-8 lineitems for customers in selected nations
#   Q39 quantity coefficient-of-variation, consecutive-month self-join
#   Q43 revenue by day-of-week per supplier nation
#   Q48 quantity under OR'd segment x price-band x nation x qty-band filters
#   Q65 (supplier, part) revenue at most 30% of the supplier's average
#   Q69 store-channel-only customers (EXISTS + NOT EXISTS), by segment
#   Q88 eight half-hour activity slots in one single-pass conditional agg
#   Q91 returns loss by supplier nation x month for overdrawn customers
#   Q97 store/web customer-item overlap via FULL OUTER JOIN
# Channel mapping (as Q31): "store" = priorities 1-2, "web" = 4-5.
# Q26/Q62/Q94 were considered and skipped as exact shape-duplicates of
# Q7/Q50/Q16 under this schema; Q25/Q35/Q69/Q91 taken instead.


# --------------------------------------------------------------------------
# Q10: customers in selected nations active in the store channel AND the web
# channel in H1/1997, counted by segment (two EXISTS -> two semi joins).
@register(
    "tpcds_q10",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM customer
    WHERE c_nationkey IN (0, 1, 2, 3, 4, 5)
      AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
                  AND EXTRACT(YEAR FROM o_orderdate) = 1997
                  AND EXTRACT(QUARTER FROM o_orderdate) <= 2)
      AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
                  AND EXTRACT(YEAR FROM o_orderdate) = 1997
                  AND EXTRACT(QUARTER FROM o_orderdate) <= 2)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, cust = _t(spark, sf_dir, "orders", "customer")
    h1 = orders.filter(_ts_range("o_orderdate", "1997-01-01", "1997-07-01"))
    store = h1.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select("o_custkey")
    web = h1.filter(F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")).select(
        F.col("o_custkey").alias("w_custkey")
    )
    return (
        cust.filter(F.col("c_nationkey").isin(0, 1, 2, 3, 4, 5))
        .join(store, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .join(web, F.col("c_custkey") == F.col("w_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Q16: orders in a 60-day window shipped by >= 2 distinct suppliers with no
# returned lineitem — COUNT(DISTINCT order), SUM(price). The canonical
# EXISTS(other supplier) / NOT EXISTS(return) pair collapses to ONE
# per-order aggregate in the Spark plan (countDistinct >= 2 iff some other
# row has a different supplier) — the TPC-H Q21 decorrelation trick.
@register(
    "tpcds_q16",
    oracle="""
    SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS order_count,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem l1 JOIN orders ON l1.l_orderkey = o_orderkey
    WHERE o_orderdate >= DATE '1997-02-01' AND o_orderdate < DATE '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_returnflag = 'R')
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    win = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-02-01")) & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    # The date window is an ORDER-level predicate, so per-order supplier /
    # return stats computed on the filtered join equal stats on the full
    # table — ONE lineitem scan + one shuffle of the window subset, not an
    # extra full-table aggregation (the EXISTS/NOT EXISTS pair collapses to
    # window functions over the orderkey partition).
    w = Window.partitionBy("l_orderkey")
    return (
        li.join(win, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("nsup", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn("has_r", F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).over(w))
        .filter((F.col("nsup") >= 2) & (F.col("has_r") == 0))
        .agg(
            F.countDistinct("o_orderkey").alias("order_count"),
            F.round(F.sum("l_extendedprice"), R2).alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# Q25: three-channel chain — customers who bought in the store channel in
# April 1997, returned something in Apr-Oct, and bought again on the web
# channel in Apr-Oct; channel revenues summed by customer nation. The
# canonical item+customer correlation is coarsened to customer grain (the
# synthetic data has no correlated re-purchases of the same part).
@register(
    "tpcds_q25",
    oracle="""
    WITH ss AS (
      SELECT o_custkey AS cust, l_extendedprice AS price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag <> 'R' AND EXTRACT(YEAR FROM o_orderdate) = 1997
        AND EXTRACT(MONTH FROM o_orderdate) = 4
        AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    ), sr AS (
      SELECT o_custkey AS cust, l_extendedprice AS ret_price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R' AND EXTRACT(YEAR FROM o_orderdate) = 1997
        AND EXTRACT(MONTH FROM o_orderdate) BETWEEN 4 AND 10
    ), ws AS (
      SELECT o_custkey AS cust, l_extendedprice AS web_price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag <> 'R' AND EXTRACT(YEAR FROM o_orderdate) = 1997
        AND EXTRACT(MONTH FROM o_orderdate) BETWEEN 4 AND 10
        AND o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
    )
    SELECT n_name,
           ROUND(SUM(price), 2) AS store_sales,
           ROUND(SUM(ret_price), 2) AS return_amt,
           ROUND(SUM(web_price), 2) AS web_sales
    FROM ss JOIN sr USING (cust) JOIN ws USING (cust)
    JOIN customer ON cust = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, nation = _t(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    lo = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        _ts_range("o_orderdate", "1997-01-01", "1998-01-01")
    )
    # the year is fixed to 1997, so each month window folds into an exact
    # pushable raw-column range (month() wrapper would defeat row-group skip)
    ss = lo.filter(
        (F.col("l_returnflag") != "R")
        & _ts_range("o_orderdate", "1997-04-01", "1997-05-01")
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select(F.col("o_custkey").alias("cust"), F.col("l_extendedprice").alias("price"))
    sr = lo.filter(
        (F.col("l_returnflag") == "R") & _ts_range("o_orderdate", "1997-04-01", "1997-11-01")
    ).select(F.col("o_custkey").alias("cust"), F.col("l_extendedprice").alias("ret_price"))
    ws = lo.filter(
        (F.col("l_returnflag") != "R")
        & _ts_range("o_orderdate", "1997-04-01", "1997-11-01")
        & F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")
    ).select(F.col("o_custkey").alias("cust"), F.col("l_extendedprice").alias("web_price"))
    return (
        ss.join(sr, "cust")
        .join(ws, "cust")
        .join(cust, F.col("cust") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum("price"), R2).alias("store_sales"),
            F.round(F.sum("ret_price"), R2).alias("return_amt"),
            F.round(F.sum("web_price"), R2).alias("web_sales"),
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Q34: store-channel orders carrying 6-8 lineitems for customers in selected
# nations (the "big basket" per-ticket count band).
@register(
    "tpcds_q34",
    oracle="""
    WITH per_order AS (
      SELECT o_orderkey, o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY 1, 2
      HAVING COUNT(*) BETWEEN 6 AND 8
    )
    SELECT c_custkey, c_name, o_orderkey, cnt
    FROM per_order JOIN customer ON o_custkey = c_custkey
    WHERE c_nationkey IN (0, 3, 7, 11, 15, 19, 23)
    ORDER BY c_custkey, o_orderkey LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust = _t(spark, sf_dir, "lineitem", "orders", "customer")
    per_order = (
        li.join(
            orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt").between(6, 8))
    )
    return (
        per_order.join(
            cust.filter(F.col("c_nationkey").isin(0, 3, 7, 11, 15, 19, 23)),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_custkey", "c_name", "o_orderkey", "cnt")
        .orderBy("c_custkey", "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q35: customers active in both channels in 1997, with count / avg / max /
# sum of account balance per nation (the demographic-stats sibling of Q10).
@register(
    "tpcds_q35",
    oracle="""
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(ROUND(SUM(c_acctbal), 2) / COUNT(*), 2) AS avg_bal,
           ROUND(MAX(c_acctbal), 2) AS max_bal,
           ROUND(SUM(c_acctbal), 2) AS sum_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
                  AND EXTRACT(YEAR FROM o_orderdate) = 1997)
      AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
                  AND EXTRACT(YEAR FROM o_orderdate) = 1997)
    GROUP BY n_name ORDER BY n_name
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, cust, nation = _t(spark, sf_dir, "orders", "customer", "nation")
    o97 = orders.filter(_ts_range("o_orderdate", "1997-01-01", "1998-01-01"))
    store = o97.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select("o_custkey")
    web = o97.filter(F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")).select(
        F.col("o_custkey").alias("w_custkey")
    )
    return (
        cust.join(store, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .join(web, F.col("c_custkey") == F.col("w_custkey"), "left_semi")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            # avg from the 2dp-rounded sum: raw AVG can land on a .xx5
            # round-half tie whose direction depends on summation order
            F.round(F.round(F.sum("c_acctbal"), R2) / F.count(F.lit(1)), R2).alias("avg_bal"),
            F.round(F.max("c_acctbal"), R2).alias("max_bal"),
            F.round(F.sum("c_acctbal"), R2).alias("sum_bal"),
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Q39: quantity coefficient of variation per (supplier, month); keep
# suppliers whose cov stays > 0.5 across consecutive months (the inventory
# volatility self-join). Filter uses the ROUNDED cov on both engines so the
# threshold compare is bit-stable cross-engine.
@register(
    "tpcds_q39",
    oracle="""
    WITH inv AS (
      SELECT l_suppkey, CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER) AS m,
             ROUND(STDDEV_SAMP(l_quantity) / AVG(l_quantity), 4) AS cov
      FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT i1.l_suppkey AS suppkey, i1.m AS m1, i1.cov AS cov1,
           i2.m AS m2, i2.cov AS cov2
    FROM inv i1 JOIN inv i2 ON i1.l_suppkey = i2.l_suppkey AND i2.m = i1.m + 1
    WHERE i1.cov > 0.5 AND i2.cov > 0.5
    ORDER BY suppkey, m1 LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    inv = (
        li.filter(_ts_range("l_shipdate", "1997-01-01", "1998-01-01"))
        .groupBy("l_suppkey", F.month("l_shipdate").cast("int").alias("m"))
        .agg(
            F.round(F.stddev_samp("l_quantity") / F.avg("l_quantity"), 4).alias("cov"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 2)
        .drop("n")
    )
    i1 = inv.select(
        F.col("l_suppkey").alias("suppkey"), F.col("m").alias("m1"), F.col("cov").alias("cov1")
    )
    i2 = inv.select(
        F.col("l_suppkey").alias("s2"), F.col("m").alias("m2"), F.col("cov").alias("cov2")
    )
    return (
        i1.join(i2, (F.col("suppkey") == F.col("s2")) & (F.col("m2") == F.col("m1") + 1))
        .filter((F.col("cov1") > 0.5) & (F.col("cov2") > 0.5))
        .select("suppkey", "m1", "cov1", "m2", "cov2")
        .orderBy("suppkey", "m1")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q43: 1997 revenue by day-of-week per supplier nation, pivoted to seven
# columns (DuckDB DOW: 0=Sunday; Spark dayofweek: 1=Sunday, hence -1).
@register(
    "tpcds_q43",
    oracle="""
    SELECT n_name,
           ROUND(SUM(CASE WHEN EXTRACT(DOW FROM l_shipdate) = 0 THEN l_extendedprice ELSE 0 END), 2) AS sun_sales,
           ROUND(SUM(CASE WHEN EXTRACT(DOW FROM l_shipdate) = 1 THEN l_extendedprice ELSE 0 END), 2) AS mon_sales,
           ROUND(SUM(CASE WHEN EXTRACT(DOW FROM l_shipdate) = 2 THEN l_extendedprice ELSE 0 END), 2) AS tue_sales,
           ROUND(SUM(CASE WHEN EXTRACT(DOW FROM l_shipdate) = 3 THEN l_extendedprice ELSE 0 END), 2) AS wed_sales,
           ROUND(SUM(CASE WHEN EXTRACT(DOW FROM l_shipdate) = 4 THEN l_extendedprice ELSE 0 END), 2) AS thu_sales,
           ROUND(SUM(CASE WHEN EXTRACT(DOW FROM l_shipdate) = 5 THEN l_extendedprice ELSE 0 END), 2) AS fri_sales,
           ROUND(SUM(CASE WHEN EXTRACT(DOW FROM l_shipdate) = 6 THEN l_extendedprice ELSE 0 END), 2) AS sat_sales
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
    GROUP BY n_name ORDER BY n_name
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, supp, nation = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    dow = F.dayofweek("l_shipdate") - 1
    names = ["sun", "mon", "tue", "wed", "thu", "fri", "sat"]
    return (
        li.filter(_ts_range("l_shipdate", "1997-01-01", "1998-01-01"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            *[
                F.round(
                    F.sum(F.when(dow == i, F.col("l_extendedprice")).otherwise(0.0)), R2
                ).alias(f"{names[i]}_sales")
                for i in range(7)
            ]
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Q48: total quantity under OR'd (segment x price band) AND OR'd
# (nation-set x quantity band) disjunctions — the canonical
# demographic/address double-disjunction scan.
@register(
    "tpcds_q48",
    oracle="""
    SELECT ROUND(SUM(l_quantity), 2) AS total_qty
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
      AND ((c_mktsegment = 'BUILDING' AND l_extendedprice BETWEEN 1000 AND 20000)
        OR (c_mktsegment = 'MACHINERY' AND l_extendedprice BETWEEN 5000 AND 40000)
        OR (c_mktsegment = 'AUTOMOBILE' AND l_extendedprice BETWEEN 10000 AND 50000))
      AND ((c_nationkey IN (0, 1, 2) AND l_quantity BETWEEN 0 AND 25)
        OR (c_nationkey IN (5, 6, 7) AND l_quantity BETWEEN 10 AND 40)
        OR (c_nationkey IN (10, 11, 12) AND l_quantity BETWEEN 20 AND 50))
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust = _t(spark, sf_dir, "lineitem", "orders", "customer")
    seg, price, qty, nk = (
        F.col("c_mktsegment"),
        F.col("l_extendedprice"),
        F.col("l_quantity"),
        F.col("c_nationkey"),
    )
    return (
        li.join(orders.filter(_ts_range("o_orderdate", "1997-01-01", "1998-01-01")), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (
                ((seg == "BUILDING") & price.between(1000, 20000))
                | ((seg == "MACHINERY") & price.between(5000, 40000))
                | ((seg == "AUTOMOBILE") & price.between(10000, 50000))
            )
            & (
                (nk.isin(0, 1, 2) & qty.between(0, 25))
                | (nk.isin(5, 6, 7) & qty.between(10, 40))
                | (nk.isin(10, 11, 12) & qty.between(20, 50))
            )
        )
        .agg(F.round(F.sum("l_quantity"), R2).alias("total_qty"))
    )


# --------------------------------------------------------------------------
# Q65: (supplier, part) pairs whose revenue is at most 30% of that
# supplier's average per-part revenue — two-level aggregation + broadcast
# of the tiny per-supplier averages.
@register(
    "tpcds_q65",
    oracle="""
    WITH sp AS (
      SELECT l_suppkey, l_partkey, SUM(l_extendedprice) AS rev
      FROM lineitem GROUP BY 1, 2
    ), sa AS (
      SELECT l_suppkey, AVG(rev) AS avg_rev FROM sp GROUP BY 1
    )
    SELECT s_name, p_name, ROUND(rev, 2) AS rev
    FROM sp
    JOIN sa USING (l_suppkey)
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE rev <= 0.3 * avg_rev
    ORDER BY s_name, p_name, rev LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ORDER BY covers all three output columns (round 13): p_name repeats
    # within a supplier, so the (s_name, p_name) prefix left the LIMIT cut
    # engine-nondeterministic at sf0.1 — see tpcds_q37.
    li, supp, part = _t(spark, sf_dir, "lineitem", "supplier", "part")
    sp = li.groupBy("l_suppkey", "l_partkey").agg(F.sum("l_extendedprice").alias("rev"))
    sa = sp.groupBy(F.col("l_suppkey").alias("sa_suppkey")).agg(F.avg("rev").alias("avg_rev"))
    return (
        sp.join(sa, F.col("l_suppkey") == F.col("sa_suppkey"))
        .filter(F.col("rev") <= 0.3 * F.col("avg_rev"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select("s_name", "p_name", F.round("rev", R2).alias("rev"))
        .orderBy("s_name", "p_name", "rev")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q69: store-channel-only customers — bought in the store channel in 1997
# but never in the web channel that year (EXISTS + NOT EXISTS -> semi +
# anti join), counted by segment with average balance.
@register(
    "tpcds_q69",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(AVG(c_acctbal), 2) AS avg_bal
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
                  AND EXTRACT(YEAR FROM o_orderdate) = 1997)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
                      AND EXTRACT(YEAR FROM o_orderdate) = 1997)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, cust = _t(spark, sf_dir, "orders", "customer")
    o97 = orders.filter(_ts_range("o_orderdate", "1997-01-01", "1998-01-01"))
    store = o97.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select("o_custkey")
    web = o97.filter(F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")).select(
        F.col("o_custkey").alias("w_custkey")
    )
    return (
        cust.join(store, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .join(web, F.col("c_custkey") == F.col("w_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.avg("c_acctbal"), R2).alias("avg_bal"))
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Q88: eight half-hour activity slots (8:00-12:00) for two segments.
# Canonical Q88 cross-joins eight scalar COUNT(*) subqueries; the
# Spark-first form is ONE pass of conditional counts over events.
@register(
    "tpcds_q88",
    oracle="""
    SELECT CAST(SUM(CASE WHEN h = 8 AND m < 30 THEN 1 ELSE 0 END) AS BIGINT) AS h8_00,
           CAST(SUM(CASE WHEN h = 8 AND m >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS h8_30,
           CAST(SUM(CASE WHEN h = 9 AND m < 30 THEN 1 ELSE 0 END) AS BIGINT) AS h9_00,
           CAST(SUM(CASE WHEN h = 9 AND m >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS h9_30,
           CAST(SUM(CASE WHEN h = 10 AND m < 30 THEN 1 ELSE 0 END) AS BIGINT) AS h10_00,
           CAST(SUM(CASE WHEN h = 10 AND m >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS h10_30,
           CAST(SUM(CASE WHEN h = 11 AND m < 30 THEN 1 ELSE 0 END) AS BIGINT) AS h11_00,
           CAST(SUM(CASE WHEN h = 11 AND m >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS h11_30
    FROM (
      SELECT EXTRACT(HOUR FROM ts) AS h, EXTRACT(MINUTE FROM ts) AS m
      FROM events JOIN customer ON user_id = c_custkey
      WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    )
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    events, cust = _t(spark, sf_dir, "events", "customer")
    h, m = F.hour("ts"), F.minute("ts")
    slots = [(8, 0), (8, 30), (9, 0), (9, 30), (10, 0), (10, 30), (11, 0), (11, 30)]
    return (
        events.join(
            cust.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY")),
            F.col("user_id") == F.col("c_custkey"),
        )
        .agg(
            *[
                F.sum(
                    F.when(
                        (h == hh) & ((m < 30) if mm == 0 else (m >= 30)), 1
                    ).otherwise(0)
                ).alias(f"h{hh}_{mm:02d}")
                for hh, mm in slots
            ]
        )
    )


# --------------------------------------------------------------------------
# Q91: returns loss by supplier nation ("call center") x month for
# overdrawn customers (c_acctbal < 0), 1997.
@register(
    "tpcds_q91",
    oracle="""
    SELECT n_name, CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS m,
           ROUND(SUM(l_extendedprice), 2) AS returns_loss
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE l_returnflag = 'R' AND c_acctbal < 0
      AND EXTRACT(YEAR FROM o_orderdate) = 1997
    GROUP BY 1, 2
    ORDER BY returns_loss DESC, n_name, m LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, supp, nation = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders.filter(_ts_range("o_orderdate", "1997-01-01", "1998-01-01")), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust.filter(F.col("c_acctbal") < 0), F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.month("o_orderdate").cast("int").alias("m"))
        .agg(F.round(F.sum("l_extendedprice"), R2).alias("returns_loss"))
        .orderBy(F.col("returns_loss").desc(), "n_name", "m")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q97: store/web customer-item overlap — DISTINCT (customer, part) sets per
# channel, FULL OUTER joined, counted into store-only / web-only / both.
@register(
    "tpcds_q97",
    oracle="""
    WITH ssci AS (
      SELECT DISTINCT o_custkey AS cust, l_partkey AS pk
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    ), wsci AS (
      SELECT DISTINCT o_custkey AS cust, l_partkey AS pk
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
    )
    SELECT CAST(SUM(CASE WHEN s.cust IS NOT NULL AND w.cust IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS store_only,
           CAST(SUM(CASE WHEN s.cust IS NULL AND w.cust IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS web_only,
           CAST(SUM(CASE WHEN s.cust IS NOT NULL AND w.cust IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS store_and_web
    FROM ssci s FULL OUTER JOIN wsci w ON s.cust = w.cust AND s.pk = w.pk
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders = _t(spark, sf_dir, "lineitem", "orders")

    def channel(prios):
        return (
            li.join(
                orders.filter(F.col("o_orderpriority").isin(*prios)),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("pk"))
            .distinct()
        )

    s = channel(["1-URGENT", "2-HIGH"])
    w = channel(["4-NOT SPECIFIED", "5-LOW"]).select(
        F.col("cust").alias("w_cust"), F.col("pk").alias("w_pk")
    )
    j = s.join(w, (F.col("cust") == F.col("w_cust")) & (F.col("pk") == F.col("w_pk")), "full_outer")
    return j.agg(
        F.sum(F.when(F.col("cust").isNotNull() & F.col("w_cust").isNull(), 1).otherwise(0)).alias("store_only"),
        F.sum(F.when(F.col("cust").isNull() & F.col("w_cust").isNotNull(), 1).otherwise(0)).alias("web_only"),
        F.sum(F.when(F.col("cust").isNotNull() & F.col("w_cust").isNotNull(), 1).otherwise(0)).alias("store_and_web"),
    )


# ==========================================================================
# Batch 4 — the FINAL 16 queries: with these, every entry in the
# reference's included set (the 49 `#`-commented lines of
# resources/benchmark/tpcds/query_excludelist.cfg, 48 distinct queries +
# the 39a/39b pair) has an adapted, oracle-checked counterpart here.
#   Q26 catalog-channel per-brand averages (Q7's web sibling)
#   Q29 store buy -> return -> re-buy quantity chain
#   Q32 excessive discount inside a 90-day window, web channel
#   Q39b Q39's stricter-volatility variant
#   Q52 brand revenue by year for one month (Q42 sibling, year grain)
#   Q55 flat brand revenue for one month/year
#   Q62 ship-latency buckets by "ship mode" (order priority)
#   Q73 small-basket ticket counts (2-4 items)
#   Q81 customers returning > 1.2x their nation's average, 1998 supplier view
#   Q82 low-account-supplier parts in a size band that actually sold
#   Q83 per-part return counts across three month windows, joined
#   Q84 customer directory lookup by nation + balance band
#   Q85 banded web-return statistics per nation
#   Q94 web orders, >= 2 suppliers, nothing returned (Q16's web sibling)
#   Q95 web orders, >= 2 suppliers, WITH a returned item (Q94's dual)
#   Q99 latency buckets per (nation, priority, month-bucket)


# --------------------------------------------------------------------------
# Q26: per-brand averages for the web channel (priorities 4-5) and the
# FURNITURE segment — the catalog_sales sibling of Q7.
@register(
    "tpcds_q26",
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
    WHERE c_mktsegment = 'FURNITURE'
      AND o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
    GROUP BY p_brand ORDER BY p_brand LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, part = _t(spark, sf_dir, "lineitem", "orders", "customer", "part")
    return (
        li.join(
            orders.filter(F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            cust.filter(F.col("c_mktsegment") == "FURNITURE"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
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
# Q29: quantity chain — customers who bought (store, month 4/1997),
# returned (months 4-7), and re-bought (web, months 4-10); quantity sums
# per customer nation. Q25's quantity-grain sibling.
@register(
    "tpcds_q29",
    oracle="""
    WITH ss AS (
      SELECT o_custkey AS cust, l_quantity AS q
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag <> 'R' AND EXTRACT(YEAR FROM o_orderdate) = 1997
        AND EXTRACT(MONTH FROM o_orderdate) = 4
        AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    ), sr AS (
      SELECT o_custkey AS cust, l_quantity AS rq
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R' AND EXTRACT(YEAR FROM o_orderdate) = 1997
        AND EXTRACT(MONTH FROM o_orderdate) BETWEEN 4 AND 7
    ), ws AS (
      SELECT o_custkey AS cust, l_quantity AS wq
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag <> 'R' AND EXTRACT(YEAR FROM o_orderdate) = 1997
        AND EXTRACT(MONTH FROM o_orderdate) BETWEEN 4 AND 10
        AND o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
    )
    SELECT n_name,
           ROUND(SUM(q), 2) AS store_qty,
           ROUND(SUM(rq), 2) AS return_qty,
           ROUND(SUM(wq), 2) AS web_qty
    FROM ss JOIN sr USING (cust) JOIN ws USING (cust)
    JOIN customer ON cust = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, nation = _t(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    lo = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        _ts_range("o_orderdate", "1997-01-01", "1998-01-01")
    )
    # year fixed to 1997 — each month window folds into an exact pushable range
    ss = lo.filter(
        (F.col("l_returnflag") != "R")
        & _ts_range("o_orderdate", "1997-04-01", "1997-05-01")
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select(F.col("o_custkey").alias("cust"), F.col("l_quantity").alias("q"))
    sr = lo.filter(
        (F.col("l_returnflag") == "R") & _ts_range("o_orderdate", "1997-04-01", "1997-08-01")
    ).select(F.col("o_custkey").alias("cust"), F.col("l_quantity").alias("rq"))
    ws = lo.filter(
        (F.col("l_returnflag") != "R")
        & _ts_range("o_orderdate", "1997-04-01", "1997-11-01")
        & F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")
    ).select(F.col("o_custkey").alias("cust"), F.col("l_quantity").alias("wq"))
    return (
        ss.join(sr, "cust")
        .join(ws, "cust")
        .join(cust, F.col("cust") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum("q"), R2).alias("store_qty"),
            F.round(F.sum("rq"), R2).alias("return_qty"),
            F.round(F.sum("wq"), R2).alias("web_qty"),
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Q32: excessive discount in a 90-day window on the web channel — lineitems
# discounted > 1.3x their part's window average.
@register(
    "tpcds_q32",
    oracle="""
    WITH win AS (
      SELECT l_partkey, l_discount, l_extendedprice
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderdate >= DATE '1997-03-01' AND o_orderdate < DATE '1997-05-30'
        AND o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
    )
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS excess_discount
    FROM win w1
    WHERE l_discount > 1.3 * (
      SELECT AVG(w2.l_discount) FROM win w2 WHERE w2.l_partkey = w1.l_partkey
    )
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    win = li.join(
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1997-03-01"))
            & (F.col("o_orderdate") < F.lit("1997-05-30"))
            & F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select("l_partkey", "l_discount", "l_extendedprice")
    pavg = win.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        (F.lit(1.3) * F.avg("l_discount")).alias("thr")
    )
    return (
        win.join(pavg, F.col("l_partkey") == F.col("pa_key"))
        .filter(F.col("l_discount") > F.col("thr"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), R2).alias("excess_discount"))
    )


# --------------------------------------------------------------------------
# Q39b: Q39's stricter variant — the FIRST month must exceed a higher
# volatility bar (canonical 39b raises the cov floor on the first month).
@register(
    "tpcds_q39b",
    oracle="""
    WITH inv AS (
      SELECT l_suppkey, CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER) AS m,
             ROUND(STDDEV_SAMP(l_quantity) / AVG(l_quantity), 4) AS cov
      FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT i1.l_suppkey AS suppkey, i1.m AS m1, i1.cov AS cov1,
           i2.m AS m2, i2.cov AS cov2
    FROM inv i1 JOIN inv i2 ON i1.l_suppkey = i2.l_suppkey AND i2.m = i1.m + 1
    WHERE i1.cov > 0.56 AND i2.cov > 0.5
    ORDER BY suppkey, m1 LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q39b(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    inv = (
        li.filter(_ts_range("l_shipdate", "1997-01-01", "1998-01-01"))
        .groupBy("l_suppkey", F.month("l_shipdate").cast("int").alias("m"))
        .agg(
            F.round(F.stddev_samp("l_quantity") / F.avg("l_quantity"), 4).alias("cov"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 2)
        .drop("n")
    )
    i1 = inv.select(
        F.col("l_suppkey").alias("suppkey"), F.col("m").alias("m1"), F.col("cov").alias("cov1")
    )
    i2 = inv.select(
        F.col("l_suppkey").alias("s2"), F.col("m").alias("m2"), F.col("cov").alias("cov2")
    )
    return (
        i1.join(i2, (F.col("suppkey") == F.col("s2")) & (F.col("m2") == F.col("m1") + 1))
        .filter((F.col("cov1") > 0.56) & (F.col("cov2") > 0.5))
        .select("suppkey", "m1", "cov1", "m2", "cov2")
        .orderBy("suppkey", "m1")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q52: brand revenue by ship year for one month (Q42's year-grain sibling).
@register(
    "tpcds_q52",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS d_year,
           p_brand, ROUND(SUM(l_extendedprice), 2) AS ext_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE EXTRACT(MONTH FROM l_shipdate) = 12 AND p_type = 'ECONOMY'
    GROUP BY 1, 2
    ORDER BY d_year, ext_price DESC, p_brand LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    return (
        li.filter(_month_ranges("l_shipdate", 12))
        .join(part.filter(F.col("p_type") == "ECONOMY"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("l_shipdate").cast("int").alias("d_year"), "p_brand")
        .agg(F.round(F.sum("l_extendedprice"), R2).alias("ext_price"))
        .orderBy("d_year", F.col("ext_price").desc(), "p_brand")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q55: flat brand revenue for one (month, year).
@register(
    "tpcds_q55",
    oracle="""
    SELECT p_brand, ROUND(SUM(l_extendedprice), 2) AS ext_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE EXTRACT(YEAR FROM l_shipdate) = 1997 AND EXTRACT(MONTH FROM l_shipdate) = 8
    GROUP BY p_brand
    ORDER BY ext_price DESC, p_brand LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    return (
        li.filter(_ts_range("l_shipdate", "1997-08-01", "1997-09-01"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.round(F.sum("l_extendedprice"), R2).alias("ext_price"))
        .orderBy(F.col("ext_price").desc(), "p_brand")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q62: ship-latency buckets per "ship mode" (order priority) — Q50 buckets
# by supplier nation; Q62's grouping column is the mode.
@register(
    "tpcds_q62",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) BETWEEN 31 AND 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
           CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) BETWEEN 61 AND 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
           CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) BETWEEN 91 AND 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120,
           CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 120 THEN 1 ELSE 0 END) AS BIGINT) AS d_over_120
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1998
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    lat = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))

    def band(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).alias(name)

    return (
        li.join(orders.filter(_ts_range("o_orderdate", "1998-01-01", "1999-01-01")), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            band(lat <= 30, "d30"),
            band(lat.between(31, 60), "d60"),
            band(lat.between(61, 90), "d90"),
            band(lat.between(91, 120), "d120"),
            band(lat > 120, "d_over_120"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q73: small-basket tickets — orders with 2-4 lineitems (Q34's low band).
@register(
    "tpcds_q73",
    oracle="""
    WITH per_order AS (
      SELECT o_orderkey, o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
      GROUP BY 1, 2
      HAVING COUNT(*) BETWEEN 2 AND 4
    )
    SELECT c_custkey, c_name, o_orderkey, cnt
    FROM per_order JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')
    ORDER BY c_custkey, o_orderkey LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust = _t(spark, sf_dir, "lineitem", "orders", "customer")
    per_order = (
        li.join(
            orders.filter(F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt").between(2, 4))
    )
    return (
        per_order.join(
            cust.filter(F.col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_custkey", "c_name", "o_orderkey", "cnt")
        .orderBy("c_custkey", "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q81: customers whose 1998 returns exceed 1.2x their nation's average
# (Q1's 1998 sibling, returning balance too).
@register(
    "tpcds_q81",
    oracle="""
    WITH ctr AS (
      SELECT o_custkey AS ctr_custkey, c_nationkey AS ctr_nationkey,
             ROUND(SUM(l_extendedprice), 2) AS ctr_total_return
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R' AND EXTRACT(YEAR FROM o_orderdate) = 1998
      GROUP BY 1, 2
    )
    SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal, ctr_total_return
    FROM ctr ctr1 JOIN customer ON ctr1.ctr_custkey = c_custkey
    WHERE ctr_total_return > (
      SELECT AVG(ctr_total_return) * 1.2 FROM ctr ctr2
      WHERE ctr1.ctr_nationkey = ctr2.ctr_nationkey
    )
    ORDER BY c_custkey LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust = _t(spark, sf_dir, "lineitem", "orders", "customer")
    ctr = (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders.filter(_ts_range("o_orderdate", "1998-01-01", "1999-01-01")), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("o_custkey").alias("ctr_custkey"), F.col("c_nationkey").alias("ctr_nationkey"))
        .agg(F.round(F.sum("l_extendedprice"), R2).alias("ctr_total_return"))
    )
    nation_avg = ctr.groupBy(F.col("ctr_nationkey").alias("na_nationkey")).agg(
        (F.avg("ctr_total_return") * 1.2).alias("threshold")
    )
    return (
        ctr.join(nation_avg, F.col("ctr_nationkey") == F.col("na_nationkey"))
        .filter(F.col("ctr_total_return") > F.col("threshold"))
        .join(cust, F.col("ctr_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", F.round("c_acctbal", R2).alias("c_acctbal"), "ctr_total_return")
        .orderBy("c_custkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q82: parts in a size band supplied by overdrawn suppliers that actually
# sold (Q37 with the supplier-side constraint instead of price).
@register(
    "tpcds_q82",
    oracle="""
    SELECT p_name, ROUND(p_retailprice, 2) AS p_retailprice
    FROM part
    WHERE p_size BETWEEN 30 AND 45
      AND p_partkey IN (
        SELECT l_partkey FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE s_acctbal < 0
          AND l_shipdate >= DATE '1998-01-01' AND l_shipdate < DATE '1998-03-02'
      )
    GROUP BY p_name, p_retailprice
    ORDER BY p_name, p_retailprice LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    # total ORDER BY — see tpcds_q37 (p_name is not unique).
    li, part, supp = _t(spark, sf_dir, "lineitem", "part", "supplier")
    sold = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01")) & (F.col("l_shipdate") < F.lit("1998-03-02"))
        )
        .join(supp.filter(F.col("s_acctbal") < 0), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_partkey")
    )
    return (
        part.filter(F.col("p_size").between(30, 45))
        .join(sold, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("p_name", F.round("p_retailprice", R2).alias("p_retailprice"))
        .agg(F.lit(1))
        .select("p_name", "p_retailprice")
        .orderBy("p_name", "p_retailprice")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q83: per-part return counts across three month windows, joined on part —
# each channel CTE must see the same part for it to appear.
@register(
    "tpcds_q83",
    oracle="""
    WITH r1 AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c1
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R' AND EXTRACT(YEAR FROM o_orderdate) = 1997
        AND EXTRACT(MONTH FROM o_orderdate) IN (1, 2, 3)
      GROUP BY 1
    ), r2 AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c2
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R' AND EXTRACT(YEAR FROM o_orderdate) = 1997
        AND EXTRACT(MONTH FROM o_orderdate) IN (4, 5, 6)
      GROUP BY 1
    ), r3 AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c3
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R' AND EXTRACT(YEAR FROM o_orderdate) = 1997
        AND EXTRACT(MONTH FROM o_orderdate) IN (7, 8, 9)
      GROUP BY 1
    )
    SELECT p_name, c1, c2, c3, CAST(c1 + c2 + c3 AS BIGINT) AS total
    FROM r1 JOIN r2 USING (l_partkey) JOIN r3 USING (l_partkey)
    JOIN part ON l_partkey = p_partkey
    ORDER BY total DESC, p_name LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, part = _t(spark, sf_dir, "lineitem", "orders", "part")
    ret = li.filter(F.col("l_returnflag") == "R").join(
        orders.filter(_ts_range("o_orderdate", "1997-01-01", "1998-01-01")), F.col("l_orderkey") == F.col("o_orderkey")
    )

    # contiguous month triples within the fixed 1997 year fold into exact
    # pushable quarter ranges (month() isin would defeat row-group pruning)
    def window_counts(start: str, end: str, alias: str):
        return (
            ret.filter(_ts_range("o_orderdate", start, end))
            .groupBy("l_partkey")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    r1 = window_counts("1997-01-01", "1997-04-01", "c1")
    r2 = window_counts("1997-04-01", "1997-07-01", "c2")
    r3 = window_counts("1997-07-01", "1997-10-01", "c3")
    return (
        r1.join(r2, "l_partkey")
        .join(r3, "l_partkey")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_name", "c1", "c2", "c3", (F.col("c1") + F.col("c2") + F.col("c3")).alias("total")
        )
        .orderBy(F.col("total").desc(), "p_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q84: customer directory lookup — nation + balance band, formatted name.
@register(
    "tpcds_q84",
    oracle="""
    SELECT c_custkey, c_name || ' (' || n_name || ')' AS customer_id,
           ROUND(c_acctbal, 2) AS c_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE' AND c_acctbal BETWEEN 1000 AND 3000
    ORDER BY c_custkey LIMIT 100
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, nation, region = _t(spark, sf_dir, "customer", "nation", "region")
    return (
        cust.filter(F.col("c_acctbal").between(1000, 3000))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == "EUROPE")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "c_custkey",
            F.concat(F.col("c_name"), F.lit(" ("), F.col("n_name"), F.lit(")")).alias("customer_id"),
            F.round("c_acctbal", R2).alias("c_acctbal"),
        )
        .orderBy("c_custkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q85: banded web-return statistics per nation — OR'd (segment x quantity
# band) filters over returned web-channel lineitems.
@register(
    "tpcds_q85",
    oracle="""
    SELECT n_name,
           ROUND(AVG(l_quantity), 2) AS avg_qty,
           ROUND(AVG(l_extendedprice), 2) AS avg_price,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
      AND ((c_mktsegment = 'BUILDING' AND l_quantity BETWEEN 1 AND 20)
        OR (c_mktsegment = 'MACHINERY' AND l_quantity BETWEEN 10 AND 35)
        OR (c_mktsegment = 'FURNITURE' AND l_quantity BETWEEN 25 AND 50))
    GROUP BY n_name
    HAVING COUNT(*) >= 3
    ORDER BY n_name
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, nation = _t(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    seg, qty = F.col("c_mktsegment"), F.col("l_quantity")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .filter(
            ((seg == "BUILDING") & qty.between(1, 20))
            | ((seg == "MACHINERY") & qty.between(10, 35))
            | ((seg == "FURNITURE") & qty.between(25, 50))
        )
        .groupBy("n_name")
        .agg(
            F.round(F.avg("l_quantity"), R2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), R2).alias("avg_price"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .filter(F.col("cnt") >= 3)
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Q94: web orders in a 60-day window with >= 2 distinct suppliers and no
# returned lineitem (Q16's web-channel sibling).
@register(
    "tpcds_q94",
    oracle="""
    SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS order_count,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem l1 JOIN orders ON l1.l_orderkey = o_orderkey
    WHERE o_orderdate >= DATE '1998-05-01' AND o_orderdate < DATE '1998-07-01'
      AND o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_returnflag = 'R')
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    win = orders.filter(
        (F.col("o_orderdate") >= F.lit("1998-05-01"))
        & (F.col("o_orderdate") < F.lit("1998-07-01"))
        & F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")
    )
    # order-level predicates -> per-order stats on the filtered join (one
    # lineitem scan; see tpcds_q16)
    w = Window.partitionBy("l_orderkey")
    return (
        li.join(win, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("nsup", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn("has_r", F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).over(w))
        .filter((F.col("nsup") >= 2) & (F.col("has_r") == 0))
        .agg(
            F.countDistinct("o_orderkey").alias("order_count"),
            F.round(F.sum("l_extendedprice"), R2).alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# Q95: Q94's dual — same window and channel, >= 2 suppliers AND at least one
# returned lineitem (canonical Q95 requires presence in web_returns).
@register(
    "tpcds_q95",
    oracle="""
    SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS order_count,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem l1 JOIN orders ON l1.l_orderkey = o_orderkey
    WHERE o_orderdate >= DATE '1998-05-01' AND o_orderdate < DATE '1998-07-01'
      AND o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_returnflag = 'R')
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    win = orders.filter(
        (F.col("o_orderdate") >= F.lit("1998-05-01"))
        & (F.col("o_orderdate") < F.lit("1998-07-01"))
        & F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")
    )
    w = Window.partitionBy("l_orderkey")
    return (
        li.join(win, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("nsup", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn("has_r", F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).over(w))
        .filter((F.col("nsup") >= 2) & (F.col("has_r") == 1))
        .agg(
            F.countDistinct("o_orderkey").alias("order_count"),
            F.round(F.sum("l_extendedprice"), R2).alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# Q99: latency buckets per (supplier nation, priority, half-year) — Q62's
# fully-crossed grouping.
@register(
    "tpcds_q99",
    oracle="""
    SELECT n_name, o_orderpriority,
           CAST(CASE WHEN EXTRACT(MONTH FROM o_orderdate) <= 6 THEN 1 ELSE 2 END AS INTEGER) AS half,
           CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
           CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60 THEN 1 ELSE 0 END) AS BIGINT) AS d_over_60
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
    GROUP BY 1, 2, 3 ORDER BY n_name, o_orderpriority, half
    """,
    tags=("tpcds", "tpcds-real"),
)
def tpcds_q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, supp, nation = _t(spark, sf_dir, "lineitem", "orders", "supplier", "nation")
    lat = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(orders.filter(_ts_range("o_orderdate", "1997-01-01", "1998-01-01")), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name",
            "o_orderpriority",
            F.when(F.month("o_orderdate") <= 6, 1).otherwise(2).cast("int").alias("half"),
        )
        .agg(
            F.sum(F.when(lat <= 60, 1).otherwise(0)).alias("d60"),
            F.sum(F.when(lat > 60, 1).otherwise(0)).alias("d_over_60"),
        )
        .orderBy("n_name", "o_orderpriority", "half")
    )


# ==========================================================================
# Batch 5 — ten REAL queries from the reference's EXCLUDED set (the 54
# queries hyrise cannot execute: window functions, ROLLUP/GROUPING,
# channel-union rollups — query_excludelist.cfg's uncommented lines).
# Spark runs all of them natively; each is adapted with the same schema
# mapping as batches 1-4 and oracle-checked. Together with the 49 included
# queries above, the engine covers BOTH halves of the reference's TPC-DS
# split — the half the reference runs, and the half it cannot.
#   Q5  multi-channel profit union rollup
#   Q12 revenue share within type over a 30-day window
#   Q36 gross-margin ROLLUP hierarchy with GROUPING() lochierarchy
#   Q47 monthly brand sales vs yearly average + neighbor months (windows)
#   Q51 cumulative store/web comparison via running sums + FULL OUTER
#   Q67 ROLLUP + per-group top-k ranking
#   Q70 state/nation ranking inside ROLLUP levels
#   Q86 rollup with RANK() within parent grouping
#   Q89 monthly category deviation from the year average
#   Q98 revenue share of each part within its type


# --------------------------------------------------------------------------
# Q5: profit-and-loss per channel (store/web = priority split, returns as
# loss), UNION ALL'd then rolled up by channel.
@register(
    "tpcds_q5",
    oracle="""
    WITH per AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'store channel'
                  ELSE 'web channel' END AS channel,
             CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE l_extendedprice END AS sales,
             CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END AS returns_amt
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
        AND o_orderpriority IN ('1-URGENT', '2-HIGH', '4-NOT SPECIFIED', '5-LOW')
    )
    SELECT channel,
           ROUND(SUM(sales), 2) AS sales,
           ROUND(SUM(returns_amt), 2) AS returns_amt,
           ROUND(SUM(sales) - SUM(returns_amt), 2) AS profit
    FROM per
    GROUP BY ROLLUP (channel)
    ORDER BY channel NULLS FIRST
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    prio = F.col("o_orderpriority")
    per = (
        li.join(
            orders.filter(
                _ts_range("o_orderdate", "1997-01-01", "1998-01-01")
                & prio.isin("1-URGENT", "2-HIGH", "4-NOT SPECIFIED", "5-LOW")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.when(prio.isin("1-URGENT", "2-HIGH"), "store channel")
            .otherwise("web channel")
            .alias("channel"),
            F.when(F.col("l_returnflag") == "R", 0.0).otherwise(F.col("l_extendedprice")).alias("sales"),
            F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")).otherwise(0.0).alias("returns_amt"),
        )
    )
    return (
        per.rollup("channel")
        .agg(
            F.round(F.sum("sales"), R2).alias("sales"),
            F.round(F.sum("returns_amt"), R2).alias("returns_amt"),
            F.round(F.sum("sales") - F.sum("returns_amt"), R2).alias("profit"),
        )
        .orderBy(F.col("channel").asc_nulls_first())
    )


# --------------------------------------------------------------------------
# Q12: each part's share of its type's revenue inside a 30-day window
# (SUM OVER PARTITION ratio — the canonical revenueratio query).
@register(
    "tpcds_q12",
    oracle="""
    WITH win AS (
      SELECT p_name, p_type, l_extendedprice
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= DATE '1997-05-01' AND l_shipdate < DATE '1997-05-31'
    ), per_part AS (
      SELECT p_name, p_type, SUM(l_extendedprice) AS itemrevenue
      FROM win GROUP BY p_name, p_type
    )
    SELECT p_name, p_type, ROUND(itemrevenue, 2) AS itemrevenue,
           ROUND(itemrevenue * 100.0 / SUM(itemrevenue) OVER (PARTITION BY p_type), 4) AS revenueratio
    FROM per_part
    ORDER BY p_type, revenueratio DESC, p_name LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li, part = _t(spark, sf_dir, "lineitem", "part")
    per_part = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-05-01")) & (F.col("l_shipdate") < F.lit("1997-05-31"))
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_name", "p_type")
        .agg(F.sum("l_extendedprice").alias("itemrevenue"))
    )
    w = Window.partitionBy("p_type")
    return (
        per_part.select(
            "p_name",
            "p_type",
            F.round("itemrevenue", R2).alias("itemrevenue"),
            F.round(F.col("itemrevenue") * 100.0 / F.sum("itemrevenue").over(w), 4).alias("revenueratio"),
        )
        .orderBy("p_type", F.col("revenueratio").desc(), "p_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q36: gross margin ROLLUP over (type, brand) with GROUPING()-derived
# hierarchy level — the lochierarchy query.
@register(
    "tpcds_q36",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount) / SUM(l_extendedprice), 6) AS gross_margin,
           p_type, p_brand,
           CAST(GROUPING(p_type) + GROUPING(p_brand) AS INTEGER) AS lochierarchy
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
    GROUP BY ROLLUP (p_type, p_brand)
    ORDER BY lochierarchy DESC, p_type NULLS FIRST, p_brand NULLS FIRST
    LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    return (
        li.filter(_ts_range("l_shipdate", "1997-01-01", "1998-01-01"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .rollup("p_type", "p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")) / F.sum("l_extendedprice"), 6
            ).alias("gross_margin"),
            (F.grouping("p_type") + F.grouping("p_brand")).cast("int").alias("lochierarchy"),
        )
        .select("gross_margin", "p_type", "p_brand", "lochierarchy")
        .orderBy(
            F.col("lochierarchy").desc(),
            F.col("p_type").asc_nulls_first(),
            F.col("p_brand").asc_nulls_first(),
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q47: monthly brand sales vs the brand's yearly average, with the
# neighboring months' sales (LAG/LEAD + AVG OVER) — kept where deviation
# exceeds 10%.
@register(
    "tpcds_q47",
    oracle="""
    WITH monthly AS (
      SELECT p_brand, CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER) AS m,
             ROUND(SUM(l_extendedprice), 2) AS sum_sales
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
      GROUP BY 1, 2
    ), win AS (
      SELECT p_brand, m, sum_sales,
             ROUND(AVG(sum_sales) OVER (PARTITION BY p_brand), 2) AS avg_monthly_sales,
             LAG(sum_sales) OVER (PARTITION BY p_brand ORDER BY m) AS psum,
             LEAD(sum_sales) OVER (PARTITION BY p_brand ORDER BY m) AS nsum
      FROM monthly
    )
    SELECT p_brand, m, sum_sales, avg_monthly_sales, psum, nsum
    FROM win
    WHERE avg_monthly_sales > 0
      AND ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales > 0.1
    ORDER BY p_brand, m LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li, part = _t(spark, sf_dir, "lineitem", "part")
    monthly = (
        li.filter(_ts_range("l_shipdate", "1997-01-01", "1998-01-01"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", F.month("l_shipdate").cast("int").alias("m"))
        .agg(F.round(F.sum("l_extendedprice"), R2).alias("sum_sales"))
    )
    wp = Window.partitionBy("p_brand")
    wo = wp.orderBy("m")
    win = monthly.select(
        "p_brand",
        "m",
        "sum_sales",
        F.round(F.avg("sum_sales").over(wp), R2).alias("avg_monthly_sales"),
        F.lag("sum_sales").over(wo).alias("psum"),
        F.lead("sum_sales").over(wo).alias("nsum"),
    )
    return (
        win.filter(
            (F.col("avg_monthly_sales") > 0)
            & (F.abs(F.col("sum_sales") - F.col("avg_monthly_sales")) / F.col("avg_monthly_sales") > 0.1)
        )
        .orderBy("p_brand", "m")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q51: running store vs web revenue per nation by month; rows where the
# store's cumulative total overtakes the web's (running MAX/SUM + FULL
# OUTER between channels).
@register(
    "tpcds_q51",
    oracle="""
    WITH store AS (
      SELECT n_name, CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS m,
             SUM(o_totalprice) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
        AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY 1, 2
    ), web AS (
      SELECT n_name, CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS m,
             SUM(o_totalprice) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
        AND o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
      GROUP BY 1, 2
    ), joined AS (
      SELECT COALESCE(s.n_name, w.n_name) AS n_name,
             COALESCE(s.m, w.m) AS m,
             SUM(COALESCE(s.rev, 0)) OVER (PARTITION BY COALESCE(s.n_name, w.n_name)
                                           ORDER BY COALESCE(s.m, w.m)) AS store_cum,
             SUM(COALESCE(w.rev, 0)) OVER (PARTITION BY COALESCE(s.n_name, w.n_name)
                                           ORDER BY COALESCE(s.m, w.m)) AS web_cum
      FROM store s FULL OUTER JOIN web w ON s.n_name = w.n_name AND s.m = w.m
    )
    SELECT n_name, m, ROUND(store_cum, 2) AS store_cum, ROUND(web_cum, 2) AS web_cum
    FROM joined WHERE store_cum > web_cum
    ORDER BY n_name, m LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders, cust, nation = _t(spark, sf_dir, "orders", "customer", "nation")

    def channel(prios):
        return (
            orders.filter(
                _ts_range("o_orderdate", "1997-01-01", "1998-01-01") & F.col("o_orderpriority").isin(*prios)
            )
            .join(cust, F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name", F.month("o_orderdate").cast("int").alias("m"))
            .agg(F.sum("o_totalprice").alias("rev"))
        )

    s = channel(["1-URGENT", "2-HIGH"]).select(
        F.col("n_name").alias("s_n"), F.col("m").alias("s_m"), F.col("rev").alias("s_rev")
    )
    w = channel(["4-NOT SPECIFIED", "5-LOW"]).select(
        F.col("n_name").alias("w_n"), F.col("m").alias("w_m"), F.col("rev").alias("w_rev")
    )
    j = s.join(w, (F.col("s_n") == F.col("w_n")) & (F.col("s_m") == F.col("w_m")), "full_outer").select(
        F.coalesce("s_n", "w_n").alias("n_name"),
        F.coalesce("s_m", "w_m").alias("m"),
        F.coalesce("s_rev", F.lit(0.0)).alias("s_rev"),
        F.coalesce("w_rev", F.lit(0.0)).alias("w_rev"),
    )
    cum = Window.partitionBy("n_name").orderBy("m")
    joined = j.select(
        "n_name",
        "m",
        F.sum("s_rev").over(cum).alias("store_cum"),
        F.sum("w_rev").over(cum).alias("web_cum"),
    )
    return (
        joined.filter(F.col("store_cum") > F.col("web_cum"))
        .select("n_name", "m", F.round("store_cum", R2).alias("store_cum"), F.round("web_cum", R2).alias("web_cum"))
        .orderBy("n_name", "m")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q67: ROLLUP over (type, brand, size-band) + RANK within type by revenue,
# keep top 5 per type — rollup feeding a ranked window.
@register(
    "tpcds_q67",
    oracle="""
    WITH rolled AS (
      SELECT p_type, p_brand, CAST(FLOOR(p_size / 10) AS INTEGER) AS size_band,
             ROUND(SUM(l_extendedprice), 2) AS sumsales
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
      GROUP BY ROLLUP (p_type, p_brand, CAST(FLOOR(p_size / 10) AS INTEGER))
    ), ranked AS (
      SELECT p_type, p_brand, size_band, sumsales,
             RANK() OVER (PARTITION BY p_type ORDER BY sumsales DESC) AS rk
      FROM rolled
    )
    SELECT p_type, p_brand, size_band, sumsales, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 5
    ORDER BY p_type NULLS FIRST, rk, p_brand NULLS FIRST, size_band NULLS FIRST
    LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li, part = _t(spark, sf_dir, "lineitem", "part")
    size_band = F.floor(F.col("p_size") / 10).cast("int")
    rolled = (
        li.filter(_ts_range("l_shipdate", "1997-01-01", "1998-01-01"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("size_band", size_band)
        .rollup("p_type", "p_brand", "size_band")
        .agg(F.round(F.sum("l_extendedprice"), R2).alias("sumsales"))
    )
    rk = F.rank().over(Window.partitionBy("p_type").orderBy(F.col("sumsales").desc()))
    return (
        rolled.withColumn("rk", rk.cast("long"))
        .filter(F.col("rk") <= 5)
        .orderBy(
            F.col("p_type").asc_nulls_first(),
            "rk",
            F.col("p_brand").asc_nulls_first(),
            F.col("size_band").asc_nulls_first(),
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q70: nation revenue ranking inside ROLLUP levels (region > nation), with
# RANK over the grouping level.
@register(
    "tpcds_q70",
    oracle="""
    WITH rolled AS (
      SELECT r_name, n_name,
             ROUND(SUM(o_totalprice), 2) AS total_sum,
             CAST(GROUPING(r_name) + GROUPING(n_name) AS INTEGER) AS lochierarchy
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1998
      GROUP BY ROLLUP (r_name, n_name)
    )
    SELECT total_sum, r_name, n_name, lochierarchy,
           CAST(RANK() OVER (PARTITION BY lochierarchy, CASE WHEN lochierarchy = 0 THEN r_name END
                             ORDER BY total_sum DESC) AS BIGINT) AS rank_within_parent
    FROM rolled
    ORDER BY lochierarchy DESC, CASE WHEN lochierarchy = 0 THEN r_name END NULLS FIRST,
             rank_within_parent, n_name NULLS FIRST
    LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders, cust, nation, region = _t(spark, sf_dir, "orders", "customer", "nation", "region")
    rolled = (
        orders.filter(_ts_range("o_orderdate", "1998-01-01", "1999-01-01"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), R2).alias("total_sum"),
            (F.grouping("r_name") + F.grouping("n_name")).cast("int").alias("lochierarchy"),
        )
    )
    parent = F.when(F.col("lochierarchy") == 0, F.col("r_name"))
    w = Window.partitionBy("lochierarchy", parent).orderBy(F.col("total_sum").desc())
    return (
        rolled.select(
            "total_sum",
            "r_name",
            "n_name",
            "lochierarchy",
            F.rank().over(w).cast("long").alias("rank_within_parent"),
        )
        .orderBy(
            F.col("lochierarchy").desc(),
            parent.asc_nulls_first(),
            "rank_within_parent",
            F.col("n_name").asc_nulls_first(),
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q86: two-level rollup (type > brand) of web-channel revenue with RANK
# within parent — Q70's item-side sibling.
@register(
    "tpcds_q86",
    oracle="""
    WITH rolled AS (
      SELECT p_type, p_brand,
             ROUND(SUM(l_extendedprice), 2) AS total_sum,
             CAST(GROUPING(p_type) + GROUPING(p_brand) AS INTEGER) AS lochierarchy
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
        AND EXTRACT(YEAR FROM o_orderdate) = 1997
      GROUP BY ROLLUP (p_type, p_brand)
    )
    SELECT total_sum, p_type, p_brand, lochierarchy,
           CAST(RANK() OVER (PARTITION BY lochierarchy, CASE WHEN lochierarchy = 0 THEN p_type END
                             ORDER BY total_sum DESC) AS BIGINT) AS rank_within_parent
    FROM rolled
    ORDER BY lochierarchy DESC, CASE WHEN lochierarchy = 0 THEN p_type END NULLS FIRST,
             rank_within_parent, p_brand NULLS FIRST
    LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li, orders, part = _t(spark, sf_dir, "lineitem", "orders", "part")
    rolled = (
        li.join(
            orders.filter(
                _ts_range("o_orderdate", "1997-01-01", "1998-01-01")
                & F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .rollup("p_type", "p_brand")
        .agg(
            F.round(F.sum("l_extendedprice"), R2).alias("total_sum"),
            (F.grouping("p_type") + F.grouping("p_brand")).cast("int").alias("lochierarchy"),
        )
    )
    parent = F.when(F.col("lochierarchy") == 0, F.col("p_type"))
    w = Window.partitionBy("lochierarchy", parent).orderBy(F.col("total_sum").desc())
    return (
        rolled.select(
            "total_sum",
            "p_type",
            "p_brand",
            "lochierarchy",
            F.rank().over(w).cast("long").alias("rank_within_parent"),
        )
        .orderBy(
            F.col("lochierarchy").desc(),
            parent.asc_nulls_first(),
            "rank_within_parent",
            F.col("p_brand").asc_nulls_first(),
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q89: monthly (type, brand) sales vs that pair's yearly monthly average —
# kept where the deviation ratio is largest.
@register(
    "tpcds_q89",
    oracle="""
    WITH monthly AS (
      SELECT p_type, p_brand, CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER) AS m,
             ROUND(SUM(l_extendedprice), 2) AS sum_sales
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE EXTRACT(YEAR FROM l_shipdate) = 1998
      GROUP BY 1, 2, 3
    ), win AS (
      SELECT p_type, p_brand, m, sum_sales,
             ROUND(AVG(sum_sales) OVER (PARTITION BY p_type, p_brand), 2) AS avg_monthly_sales
      FROM monthly
    )
    SELECT p_type, p_brand, m, sum_sales, avg_monthly_sales
    FROM win
    WHERE avg_monthly_sales <> 0
      AND ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales > 0.3
    ORDER BY sum_sales - avg_monthly_sales, p_type, p_brand, m
    LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li, part = _t(spark, sf_dir, "lineitem", "part")
    monthly = (
        li.filter(_ts_range("l_shipdate", "1998-01-01", "1999-01-01"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", "p_brand", F.month("l_shipdate").cast("int").alias("m"))
        .agg(F.round(F.sum("l_extendedprice"), R2).alias("sum_sales"))
    )
    w = Window.partitionBy("p_type", "p_brand")
    win = monthly.withColumn("avg_monthly_sales", F.round(F.avg("sum_sales").over(w), R2))
    return (
        win.filter(
            (F.col("avg_monthly_sales") != 0)
            & (F.abs(F.col("sum_sales") - F.col("avg_monthly_sales")) / F.col("avg_monthly_sales") > 0.3)
        )
        .orderBy(F.col("sum_sales") - F.col("avg_monthly_sales"), "p_type", "p_brand", "m")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q98: each part's revenue share within its type, whole year (Q12 without
# the window constraint — the store-channel revenueratio).
@register(
    "tpcds_q98",
    oracle="""
    WITH per_part AS (
      SELECT p_name, p_type, SUM(l_extendedprice) AS itemrevenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE EXTRACT(YEAR FROM l_shipdate) = 1998
      GROUP BY p_name, p_type
    )
    SELECT p_name, p_type, ROUND(itemrevenue, 2) AS itemrevenue,
           ROUND(itemrevenue * 100.0 / SUM(itemrevenue) OVER (PARTITION BY p_type), 4) AS revenueratio
    FROM per_part
    ORDER BY p_type, p_name LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li, part = _t(spark, sf_dir, "lineitem", "part")
    per_part = (
        li.filter(_ts_range("l_shipdate", "1998-01-01", "1999-01-01"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_name", "p_type")
        .agg(F.sum("l_extendedprice").alias("itemrevenue"))
    )
    w = Window.partitionBy("p_type")
    return (
        per_part.select(
            "p_name",
            "p_type",
            F.round("itemrevenue", R2).alias("itemrevenue"),
            F.round(F.col("itemrevenue") * 100.0 / F.sum("itemrevenue").over(w), 4).alias("revenueratio"),
        )
        .orderBy("p_type", "p_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q22 (excluded set): average quantity ROLLUP over the part hierarchy
# (brand > type > size band) — the inventory-rollup query.
@register(
    "tpcds_q22",
    oracle="""
    SELECT p_brand, p_type, CAST(FLOOR(p_size / 10) AS INTEGER) AS size_band,
           ROUND(AVG(l_quantity), 4) AS qoh
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
    GROUP BY ROLLUP (p_brand, p_type, CAST(FLOOR(p_size / 10) AS INTEGER))
    ORDER BY qoh, p_brand NULLS FIRST, p_type NULLS FIRST, size_band NULLS FIRST
    LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    return (
        li.filter(_ts_range("l_shipdate", "1997-01-01", "1998-01-01"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("size_band", F.floor(F.col("p_size") / 10).cast("int"))
        .rollup("p_brand", "p_type", "size_band")
        .agg(F.round(F.avg("l_quantity"), 4).alias("qoh"))
        .orderBy(
            "qoh",
            F.col("p_brand").asc_nulls_first(),
            F.col("p_type").asc_nulls_first(),
            F.col("size_band").asc_nulls_first(),
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q53 (excluded set): quarterly manufacturer (brand) sales vs the brand's
# average quarter — kept where the ratio deviates.
@register(
    "tpcds_q53",
    oracle="""
    WITH quarterly AS (
      SELECT p_brand, CAST(EXTRACT(QUARTER FROM l_shipdate) AS INTEGER) AS q,
             ROUND(SUM(l_extendedprice), 2) AS sum_sales
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE EXTRACT(YEAR FROM l_shipdate) = 1997 AND p_type IN ('PROMO', 'ECONOMY')
      GROUP BY 1, 2
    ), win AS (
      SELECT p_brand, q, sum_sales,
             ROUND(AVG(sum_sales) OVER (PARTITION BY p_brand), 2) AS avg_quarterly_sales
      FROM quarterly
    )
    SELECT p_brand, q, sum_sales, avg_quarterly_sales
    FROM win
    WHERE avg_quarterly_sales > 0
      AND ABS(sum_sales - avg_quarterly_sales) / avg_quarterly_sales > 0.05
    ORDER BY avg_quarterly_sales, sum_sales, p_brand, q LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li, part = _t(spark, sf_dir, "lineitem", "part")
    quarterly = (
        li.filter(_ts_range("l_shipdate", "1997-01-01", "1998-01-01"))
        .join(
            part.filter(F.col("p_type").isin("PROMO", "ECONOMY")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", F.quarter("l_shipdate").cast("int").alias("q"))
        .agg(F.round(F.sum("l_extendedprice"), R2).alias("sum_sales"))
    )
    w = Window.partitionBy("p_brand")
    win = quarterly.withColumn("avg_quarterly_sales", F.round(F.avg("sum_sales").over(w), R2))
    return (
        win.filter(
            (F.col("avg_quarterly_sales") > 0)
            & (
                F.abs(F.col("sum_sales") - F.col("avg_quarterly_sales")) / F.col("avg_quarterly_sales")
                > 0.05
            )
        )
        .orderBy("avg_quarterly_sales", "sum_sales", "p_brand", "q")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q57 (excluded set): Q47's sibling at supplier-nation grain — monthly
# nation sales vs yearly average with neighbor months.
@register(
    "tpcds_q57",
    oracle="""
    WITH monthly AS (
      SELECT n_name, CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER) AS m,
             ROUND(SUM(l_extendedprice), 2) AS sum_sales
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE EXTRACT(YEAR FROM l_shipdate) = 1998
      GROUP BY 1, 2
    ), win AS (
      SELECT n_name, m, sum_sales,
             ROUND(AVG(sum_sales) OVER (PARTITION BY n_name), 2) AS avg_monthly_sales,
             LAG(sum_sales) OVER (PARTITION BY n_name ORDER BY m) AS psum,
             LEAD(sum_sales) OVER (PARTITION BY n_name ORDER BY m) AS nsum
      FROM monthly
    )
    SELECT n_name, m, sum_sales, avg_monthly_sales, psum, nsum
    FROM win
    WHERE avg_monthly_sales > 0
      AND ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales > 0.1
    ORDER BY n_name, m LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li, supp, nation = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    monthly = (
        li.filter(_ts_range("l_shipdate", "1998-01-01", "1999-01-01"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.month("l_shipdate").cast("int").alias("m"))
        .agg(F.round(F.sum("l_extendedprice"), R2).alias("sum_sales"))
    )
    wp = Window.partitionBy("n_name")
    wo = wp.orderBy("m")
    win = monthly.select(
        "n_name",
        "m",
        "sum_sales",
        F.round(F.avg("sum_sales").over(wp), R2).alias("avg_monthly_sales"),
        F.lag("sum_sales").over(wo).alias("psum"),
        F.lead("sum_sales").over(wo).alias("nsum"),
    )
    return (
        win.filter(
            (F.col("avg_monthly_sales") > 0)
            & (F.abs(F.col("sum_sales") - F.col("avg_monthly_sales")) / F.col("avg_monthly_sales") > 0.1)
        )
        .orderBy("n_name", "m")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q74 (excluded set): customers whose web-channel year-over-year growth
# beats their store-channel growth (per-customer two-year two-channel
# pivot + ratio compare — the year-over-year self-join family).
@register(
    "tpcds_q74",
    oracle="""
    WITH totals AS (
      SELECT o_custkey,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'store' ELSE 'web' END AS channel,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y,
             SUM(o_totalprice) AS total
      FROM orders
      WHERE EXTRACT(YEAR FROM o_orderdate) IN (1997, 1998)
        AND o_orderpriority IN ('1-URGENT', '2-HIGH', '4-NOT SPECIFIED', '5-LOW')
      GROUP BY 1, 2, 3
    ), piv AS (
      SELECT o_custkey,
             SUM(CASE WHEN channel = 'store' AND y = 1997 THEN total ELSE 0 END) AS s1,
             SUM(CASE WHEN channel = 'store' AND y = 1998 THEN total ELSE 0 END) AS s2,
             SUM(CASE WHEN channel = 'web' AND y = 1997 THEN total ELSE 0 END) AS w1,
             SUM(CASE WHEN channel = 'web' AND y = 1998 THEN total ELSE 0 END) AS w2
      FROM totals GROUP BY o_custkey
    )
    SELECT p.o_custkey AS c_custkey, c_name,
           ROUND(w2 / w1, 4) AS web_growth, ROUND(s2 / s1, 4) AS store_growth
    FROM piv p JOIN customer ON p.o_custkey = c_custkey
    WHERE s1 > 0 AND w1 > 0 AND s2 > 0 AND w2 > 0 AND w2 / w1 > s2 / s1
    ORDER BY c_custkey LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, cust = _t(spark, sf_dir, "orders", "customer")
    prio = F.col("o_orderpriority")
    totals = (
        orders.filter(
            _ts_range("o_orderdate", "1997-01-01", "1999-01-01")
            & prio.isin("1-URGENT", "2-HIGH", "4-NOT SPECIFIED", "5-LOW")
        )
        .select(
            "o_custkey",
            F.when(prio.isin("1-URGENT", "2-HIGH"), "store").otherwise("web").alias("channel"),
            F.year("o_orderdate").cast("int").alias("y"),
            "o_totalprice",
        )
    )
    piv = totals.groupBy("o_custkey").agg(
        *[
            F.sum(
                F.when((F.col("channel") == ch) & (F.col("y") == y), F.col("o_totalprice")).otherwise(0.0)
            ).alias(f"{ch[0]}{i+1}")
            for ch in ("store", "web")
            for i, y in enumerate((1997, 1998))
        ]
    )
    return (
        piv.filter(
            (F.col("s1") > 0) & (F.col("w1") > 0) & (F.col("s2") > 0) & (F.col("w2") > 0)
            & (F.col("w2") / F.col("w1") > F.col("s2") / F.col("s1"))
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "c_name",
            F.round(F.col("w2") / F.col("w1"), 4).alias("web_growth"),
            F.round(F.col("s2") / F.col("s1"), 4).alias("store_growth"),
        )
        .orderBy("c_custkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q27 (excluded set): demographic-slice averages rolled up over customer
# nation (ROLLUP variant of Q7's shape).
@register(
    "tpcds_q27",
    oracle="""
    SELECT n_name,
           ROUND(AVG(l_quantity), 2) AS agg1,
           ROUND(AVG(l_extendedprice), 2) AS agg2,
           ROUND(AVG(l_discount), 2) AS agg3
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_mktsegment = 'BUILDING' AND EXTRACT(YEAR FROM o_orderdate) = 1997
    GROUP BY ROLLUP (n_name)
    ORDER BY n_name NULLS FIRST
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, nation = _t(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    return (
        li.join(orders.filter(_ts_range("o_orderdate", "1997-01-01", "1998-01-01")), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            cust.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .rollup("n_name")
        .agg(
            F.round(F.avg("l_quantity"), R2).alias("agg1"),
            F.round(F.avg("l_extendedprice"), R2).alias("agg2"),
            F.round(F.avg("l_discount"), R2).alias("agg3"),
        )
        .orderBy(F.col("n_name").asc_nulls_first())
    )


# --------------------------------------------------------------------------
# Q38 (excluded set): customers active in ALL THREE priority channels in
# one year — INTERSECT chain.
@register(
    "tpcds_q38",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM (
      SELECT o_custkey FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND EXTRACT(YEAR FROM o_orderdate) = 1997
      INTERSECT
      SELECT o_custkey FROM orders
      WHERE o_orderpriority = '3-MEDIUM' AND EXTRACT(YEAR FROM o_orderdate) = 1997
      INTERSECT
      SELECT o_custkey FROM orders
      WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW') AND EXTRACT(YEAR FROM o_orderdate) = 1997
    )
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    o97 = orders.filter(_ts_range("o_orderdate", "1997-01-01", "1998-01-01"))

    def ch(*prios):
        return o97.filter(F.col("o_orderpriority").isin(*prios)).select("o_custkey")

    three = (
        ch("1-URGENT", "2-HIGH")
        .intersect(ch("3-MEDIUM"))
        .intersect(ch("4-NOT SPECIFIED", "5-LOW"))
    )
    return three.agg(F.count(F.lit(1)).alias("cnt"))


# --------------------------------------------------------------------------
# Q59 (excluded set): weekly revenue per supplier nation, 1997 vs 1998
# pivoted into per-week ratio columns (the week-over-week YoY query).
@register(
    "tpcds_q59",
    oracle="""
    WITH weekly AS (
      SELECT n_name, CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS y,
             CAST(EXTRACT(WEEK FROM l_shipdate) AS INTEGER) AS wk,
             SUM(l_extendedprice) AS rev
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE EXTRACT(YEAR FROM l_shipdate) IN (1997, 1998)
      GROUP BY 1, 2, 3
    )
    SELECT a.n_name, a.wk, ROUND(a.rev, 2) AS rev_1997, ROUND(b.rev, 2) AS rev_1998,
           ROUND(b.rev / a.rev, 4) AS yoy
    FROM weekly a JOIN weekly b ON a.n_name = b.n_name AND a.wk = b.wk
    WHERE a.y = 1997 AND b.y = 1998 AND a.rev > 0
    ORDER BY a.n_name, a.wk LIMIT 200
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, supp, nation = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    # one ranged scan per year: Catalyst duplicates the shared subtree anyway,
    # and a per-year half-open range prunes row groups where the previous
    # y == 1997 filter on the derived year() column could not
    def weekly(y: int) -> DataFrame:
        return (
            li.filter(_ts_range("l_shipdate", f"{y}-01-01", f"{y + 1}-01-01"))
            .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name", F.weekofyear("l_shipdate").cast("int").alias("wk"))
            .agg(F.sum("l_extendedprice").alias("rev"))
        )

    a = weekly(1997).select("n_name", "wk", F.col("rev").alias("rev_a"))
    b = weekly(1998).select(
        F.col("n_name").alias("b_n"), F.col("wk").alias("b_wk"), F.col("rev").alias("rev_b")
    )
    return (
        a.join(b, (F.col("n_name") == F.col("b_n")) & (F.col("wk") == F.col("b_wk")))
        .filter(F.col("rev_a") > 0)
        .select(
            "n_name",
            "wk",
            F.round("rev_a", R2).alias("rev_1997"),
            F.round("rev_b", R2).alias("rev_1998"),
            F.round(F.col("rev_b") / F.col("rev_a"), 4).alias("yoy"),
        )
        .orderBy("n_name", "wk")
        .limit(200)
    )


# --------------------------------------------------------------------------
# Q75 (excluded set): year-over-year net sales (returns negated) per brand;
# brands whose 1998 net fell below 90% of 1997.
@register(
    "tpcds_q75",
    oracle="""
    WITH t AS (
      SELECT p_brand, CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y,
             SUM(CASE WHEN l_returnflag = 'R' THEN -l_extendedprice ELSE l_extendedprice END) AS amt
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      WHERE EXTRACT(YEAR FROM o_orderdate) IN (1997, 1998)
      GROUP BY 1, 2
    )
    SELECT cur.p_brand,
           ROUND(prev.amt, 2) AS prev_amt, ROUND(cur.amt, 2) AS cur_amt,
           ROUND(cur.amt - prev.amt, 2) AS sales_delta
    FROM t cur JOIN t prev ON cur.p_brand = prev.p_brand
    WHERE cur.y = 1998 AND prev.y = 1997 AND prev.amt > 0 AND cur.amt < prev.amt * 0.9
    ORDER BY sales_delta, cur.p_brand LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, part = _t(spark, sf_dir, "lineitem", "orders", "part")
    net = F.when(F.col("l_returnflag") == "R", -F.col("l_extendedprice")).otherwise(
        F.col("l_extendedprice")
    )
    # per-year ranged scans (see tpcds_q59): the derived-y filter could not
    # prune row groups; a single-year half-open range can
    def yearly(y: int) -> DataFrame:
        return (
            li.join(
                orders.filter(_ts_range("o_orderdate", f"{y}-01-01", f"{y + 1}-01-01")),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .join(part, F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand")
            .agg(F.sum(net).alias("amt"))
        )

    cur = yearly(1998).select("p_brand", F.col("amt").alias("cur_amt_raw"))
    prev = yearly(1997).select(
        F.col("p_brand").alias("prev_brand"), F.col("amt").alias("prev_amt_raw")
    )
    return (
        cur.join(prev, F.col("p_brand") == F.col("prev_brand"))
        .filter((F.col("prev_amt_raw") > 0) & (F.col("cur_amt_raw") < F.col("prev_amt_raw") * 0.9))
        .select(
            "p_brand",
            F.round("prev_amt_raw", R2).alias("prev_amt"),
            F.round("cur_amt_raw", R2).alias("cur_amt"),
            F.round(F.col("cur_amt_raw") - F.col("prev_amt_raw"), R2).alias("sales_delta"),
        )
        .orderBy("sales_delta", "p_brand")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q76 (excluded set): UNION ALL of channel slices with a literal channel
# column, counted per (channel, year, quarter) — the all-channels census.
@register(
    "tpcds_q76",
    oracle="""
    WITH unioned AS (
      SELECT 'store' AS channel, o_orderdate, l_extendedprice
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      UNION ALL
      SELECT 'web' AS channel, o_orderdate, l_extendedprice
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
      UNION ALL
      SELECT 'catalog' AS channel, o_orderdate, l_extendedprice
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '3-MEDIUM'
    )
    SELECT channel, CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS q,
           CAST(COUNT(*) AS BIGINT) AS sales_cnt,
           ROUND(SUM(l_extendedprice), 2) AS sales_amt
    FROM unioned
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
    GROUP BY 1, 2, 3 ORDER BY channel, y, q
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    lo = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))

    def ch(name, *prios):
        return lo.filter(F.col("o_orderpriority").isin(*prios)).select(
            F.lit(name).alias("channel"), "o_orderdate", "l_extendedprice"
        )

    unioned = (
        ch("store", "1-URGENT", "2-HIGH")
        .unionAll(ch("web", "4-NOT SPECIFIED", "5-LOW"))
        .unionAll(ch("catalog", "3-MEDIUM"))
    )
    return (
        unioned.filter(_ts_range("o_orderdate", "1997-01-01", "1998-01-01"))
        .groupBy(
            "channel",
            F.year("o_orderdate").cast("int").alias("y"),
            F.quarter("o_orderdate").cast("int").alias("q"),
        )
        .agg(
            F.count(F.lit(1)).alias("sales_cnt"),
            F.round(F.sum("l_extendedprice"), R2).alias("sales_amt"),
        )
        .orderBy("channel", "y", "q")
    )


# --------------------------------------------------------------------------
# Q87 (excluded set): store customers NOT in the catalog channel and NOT in
# the web channel — EXCEPT chain (Q38's dual).
@register(
    "tpcds_q87",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND EXTRACT(YEAR FROM o_orderdate) = 1997
      EXCEPT
      SELECT o_custkey FROM orders
      WHERE o_orderpriority = '3-MEDIUM' AND EXTRACT(YEAR FROM o_orderdate) = 1997
      EXCEPT
      SELECT o_custkey FROM orders
      WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW') AND EXTRACT(YEAR FROM o_orderdate) = 1997
    )
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    o97 = orders.filter(_ts_range("o_orderdate", "1997-01-01", "1998-01-01"))

    def ch(*prios):
        return o97.filter(F.col("o_orderpriority").isin(*prios)).select("o_custkey")

    only_store = (
        ch("1-URGENT", "2-HIGH").distinct()
        .exceptAll(ch("3-MEDIUM").distinct())
        .exceptAll(ch("4-NOT SPECIFIED", "5-LOW").distinct())
    )
    return only_store.agg(F.count(F.lit(1)).alias("cnt"))


# ==========================================================================
# Round-4 batch: the remaining 31 excluded-set queries -> TPC-DS 99/99.
# Channel convention throughout (established by Q10/Q74/Q76): store =
# priorities 1-URGENT/2-HIGH, catalog = 3-MEDIUM, web = 4-NOT SPECIFIED/5-LOW
# (tpcds_benchmark.cpp loads the real channels; query_excludelist.cfg marks
# these queries as unexecutable in the reference).
# ==========================================================================

_STORE = ("1-URGENT", "2-HIGH")
_CATALOG = ("3-MEDIUM",)
_WEB = ("4-NOT SPECIFIED", "5-LOW")
_DOW_NAMES = ("sun", "mon", "tue", "wed", "thu", "fri", "sat")


# --------------------------------------------------------------------------
# Q2 (excluded set): web+catalog revenue per (year, week) pivoted to the
# seven weekdays; 1998-over-1997 ratio per weekday, week-aligned.
@register(
    "tpcds_q2",
    oracle="""
    WITH sales AS (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS y, EXTRACT(WEEK FROM o_orderdate) AS w,
             EXTRACT(DOW FROM o_orderdate) AS dow, l_extendedprice AS price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority IN ('3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
    ), wk AS (
      SELECT y, w,
             SUM(CASE WHEN dow = 0 THEN price ELSE 0 END) AS sun,
             SUM(CASE WHEN dow = 1 THEN price ELSE 0 END) AS mon,
             SUM(CASE WHEN dow = 2 THEN price ELSE 0 END) AS tue,
             SUM(CASE WHEN dow = 3 THEN price ELSE 0 END) AS wed,
             SUM(CASE WHEN dow = 4 THEN price ELSE 0 END) AS thu,
             SUM(CASE WHEN dow = 5 THEN price ELSE 0 END) AS fri,
             SUM(CASE WHEN dow = 6 THEN price ELSE 0 END) AS sat
      FROM sales GROUP BY y, w
    )
    SELECT CAST(a.w AS INTEGER) AS wk,
           ROUND(b.sun / NULLIF(a.sun, 0), 4) AS sun_r,
           ROUND(b.mon / NULLIF(a.mon, 0), 4) AS mon_r,
           ROUND(b.tue / NULLIF(a.tue, 0), 4) AS tue_r,
           ROUND(b.wed / NULLIF(a.wed, 0), 4) AS wed_r,
           ROUND(b.thu / NULLIF(a.thu, 0), 4) AS thu_r,
           ROUND(b.fri / NULLIF(a.fri, 0), 4) AS fri_r,
           ROUND(b.sat / NULLIF(a.sat, 0), 4) AS sat_r
    FROM wk a JOIN wk b ON a.w = b.w AND a.y = 1997 AND b.y = 1998
    ORDER BY wk
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders = _t(spark, sf_dir, "lineitem", "orders")

    # per-year ranged scans: only y=1997/1998 rows survive the join anyway,
    # and the raw-column range prunes row groups where the pushed-through
    # year() == filter on the derived column could not
    def wk_year(y: int) -> DataFrame:
        sales = li.join(
            orders.filter(
                F.col("o_orderpriority").isin(*(_CATALOG + _WEB))
                & _ts_range("o_orderdate", f"{y}-01-01", f"{y + 1}-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).select(
            F.weekofyear("o_orderdate").alias("w"),
            (F.dayofweek("o_orderdate") - 1).alias("dow"),
            F.col("l_extendedprice").alias("price"),
        )
        return sales.groupBy("w").agg(
            *[
                F.sum(F.when(F.col("dow") == d, F.col("price")).otherwise(0.0)).alias(n)
                for d, n in enumerate(_DOW_NAMES)
            ]
        )

    a, b = wk_year(1997).alias("a"), wk_year(1998).alias("b")

    def ratio(n):
        num, den = F.col(f"b.{n}"), F.col(f"a.{n}")
        return F.round(num / F.when(den != 0.0, den), 4).alias(f"{n}_r")

    return (
        a.join(b, F.col("a.w") == F.col("b.w"))
        .select(F.col("a.w").alias("wk"), *[ratio(n) for n in _DOW_NAMES])
        .orderBy("wk")
    )


# --------------------------------------------------------------------------
# Q4 (excluded set): customers whose catalog-channel year-over-year growth
# beats BOTH their store and web growth (three-channel Q74 extension; net
# lineitem revenue, not order totals).
@register(
    "tpcds_q4",
    oracle="""
    WITH yt AS (
      SELECT o_custkey AS ck,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'store'
                  WHEN o_orderpriority = '3-MEDIUM' THEN 'catalog' ELSE 'web' END AS channel,
             EXTRACT(YEAR FROM o_orderdate) AS y,
             SUM(l_extendedprice * (1 - l_discount)) AS total
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE EXTRACT(YEAR FROM o_orderdate) IN (1997, 1998)
      GROUP BY 1, 2, 3
    ), p AS (
      SELECT ck,
             SUM(CASE WHEN channel = 'store' AND y = 1997 THEN total ELSE 0 END) AS s1,
             SUM(CASE WHEN channel = 'store' AND y = 1998 THEN total ELSE 0 END) AS s2,
             SUM(CASE WHEN channel = 'catalog' AND y = 1997 THEN total ELSE 0 END) AS c1,
             SUM(CASE WHEN channel = 'catalog' AND y = 1998 THEN total ELSE 0 END) AS c2,
             SUM(CASE WHEN channel = 'web' AND y = 1997 THEN total ELSE 0 END) AS w1,
             SUM(CASE WHEN channel = 'web' AND y = 1998 THEN total ELSE 0 END) AS w2
      FROM yt GROUP BY ck
    )
    SELECT c_custkey, c_name
    FROM p JOIN customer ON ck = c_custkey
    WHERE s1 > 0 AND c1 > 0 AND w1 > 0
      AND c2 / c1 > s2 / s1 AND c2 / c1 > w2 / w1
    ORDER BY c_custkey LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust = _t(spark, sf_dir, "lineitem", "orders", "customer")
    prio = F.col("o_orderpriority")
    yt = (
        li.join(
            orders.filter(_ts_range("o_orderdate", "1997-01-01", "1999-01-01")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("ck"),
            F.when(prio.isin(*_STORE), "store")
            .when(prio.isin(*_CATALOG), "catalog")
            .otherwise("web")
            .alias("channel"),
            F.year("o_orderdate").alias("y"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
        )
        .groupBy("ck", "channel", "y")
        .agg(F.sum("net").alias("total"))
    )

    def piv(ch, y, alias):
        return F.sum(
            F.when((F.col("channel") == ch) & (F.col("y") == y), F.col("total")).otherwise(0.0)
        ).alias(alias)

    p = yt.groupBy("ck").agg(
        piv("store", 1997, "s1"), piv("store", 1998, "s2"),
        piv("catalog", 1997, "c1"), piv("catalog", 1998, "c2"),
        piv("web", 1997, "w1"), piv("web", 1998, "w2"),
    )
    return (
        p.filter((F.col("s1") > 0) & (F.col("c1") > 0) & (F.col("w1") > 0))
        .filter(
            (F.col("c2") / F.col("c1") > F.col("s2") / F.col("s1"))
            & (F.col("c2") / F.col("c1") > F.col("w2") / F.col("w1"))
        )
        .join(cust, F.col("ck") == F.col("c_custkey"))
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q8 (excluded set): supplier-nation revenue restricted to nations that are
# BOTH in a literal list AND have >= 10 preferred (high-balance) customers —
# the zip-list INTERSECT preferred-customer-zips shape.
@register(
    "tpcds_q8",
    oracle="""
    WITH pref AS (
      SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE c_acctbal > 5000 GROUP BY n_name HAVING COUNT(*) >= 3
    ), chosen AS (
      SELECT n_name FROM (VALUES ('NATION_1'), ('NATION_3'), ('NATION_5'), ('NATION_7'),
                                 ('NATION_9'), ('NATION_11'), ('NATION_13'), ('NATION_15'),
                                 ('NATION_17'), ('NATION_19'), ('NATION_21'), ('NATION_23')) v(n_name)
      INTERSECT SELECT n_name FROM pref
    )
    SELECT n_name, ROUND(SUM(l_extendedprice), 2) AS net_profit
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN chosen USING (n_name)
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
    GROUP BY n_name ORDER BY n_name
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, supp, nation, cust = _t(spark, sf_dir, "lineitem", "supplier", "nation", "customer")
    literal = spark.createDataFrame(
        [(f"NATION_{i}",) for i in range(1, 25, 2)], ["n_name"]
    )
    pref = (
        cust.filter(F.col("c_acctbal") > 5000)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_pref"))
        .filter(F.col("n_pref") >= 3)
        .select("n_name")
    )
    chosen = literal.intersect(pref)
    return (
        # range predicate instead of EXTRACT(YEAR/QUARTER): semantically the
        # same quarter, but pushable to the parquet scan (row-group skipping)
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-04-01"))
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(chosen, "n_name", "left_semi")
        .groupBy("n_name")
        .agg(F.round(F.sum("l_extendedprice"), R2).alias("net_profit"))
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Q11 (excluded set): customers whose web-channel year-over-year NET-revenue
# growth beats their store growth (Q74 at order-total grain; this one at
# discounted lineitem grain, reporting names).
@register(
    "tpcds_q11",
    oracle="""
    WITH yt AS (
      SELECT o_custkey AS ck,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'store'
                  WHEN o_orderpriority = '3-MEDIUM' THEN 'catalog' ELSE 'web' END AS channel,
             EXTRACT(YEAR FROM o_orderdate) AS y,
             SUM(l_extendedprice * (1 - l_discount)) AS total
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE EXTRACT(YEAR FROM o_orderdate) IN (1997, 1998)
      GROUP BY 1, 2, 3
    ), p AS (
      SELECT ck,
             SUM(CASE WHEN channel = 'store' AND y = 1997 THEN total ELSE 0 END) AS s1,
             SUM(CASE WHEN channel = 'store' AND y = 1998 THEN total ELSE 0 END) AS s2,
             SUM(CASE WHEN channel = 'web' AND y = 1997 THEN total ELSE 0 END) AS w1,
             SUM(CASE WHEN channel = 'web' AND y = 1998 THEN total ELSE 0 END) AS w2
      FROM yt GROUP BY ck
    )
    SELECT c_custkey, c_name, c_mktsegment
    FROM p JOIN customer ON ck = c_custkey
    WHERE s1 > 0 AND w1 > 0 AND w2 / w1 > s2 / s1
    ORDER BY c_custkey LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust = _t(spark, sf_dir, "lineitem", "orders", "customer")
    prio = F.col("o_orderpriority")
    yt = (
        li.join(
            orders.filter(_ts_range("o_orderdate", "1997-01-01", "1999-01-01")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("ck"),
            F.when(prio.isin(*_STORE), "store")
            .when(prio.isin(*_CATALOG), "catalog")
            .otherwise("web")
            .alias("channel"),
            F.year("o_orderdate").alias("y"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
        )
        .groupBy("ck", "channel", "y")
        .agg(F.sum("net").alias("total"))
    )

    def piv(ch, y, alias):
        return F.sum(
            F.when((F.col("channel") == ch) & (F.col("y") == y), F.col("total")).otherwise(0.0)
        ).alias(alias)

    p = yt.groupBy("ck").agg(
        piv("store", 1997, "s1"), piv("store", 1998, "s2"),
        piv("web", 1997, "w1"), piv("web", 1998, "w2"),
    )
    return (
        p.filter((F.col("s1") > 0) & (F.col("w1") > 0))
        .filter(F.col("w2") / F.col("w1") > F.col("s2") / F.col("s1"))
        .join(cust, F.col("ck") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q14 (excluded set): cross_items = parts sold through ALL THREE channels in
# 1997 (INTERSECT chain); 1998 per-(channel, brand) sales of those parts kept
# only above the 1997 all-channel average sale (scalar subquery threshold).
@register(
    "tpcds_q14",
    oracle="""
    WITH store_pk AS (
      SELECT DISTINCT l_partkey AS pk FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND EXTRACT(YEAR FROM o_orderdate) = 1997
    ), cat_pk AS (
      SELECT DISTINCT l_partkey AS pk FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '3-MEDIUM' AND EXTRACT(YEAR FROM o_orderdate) = 1997
    ), web_pk AS (
      SELECT DISTINCT l_partkey AS pk FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW') AND EXTRACT(YEAR FROM o_orderdate) = 1997
    ), cross_items AS (
      SELECT pk FROM store_pk INTERSECT SELECT pk FROM cat_pk INTERSECT SELECT pk FROM web_pk
    ), avg_sales AS (
      SELECT AVG(l_quantity * l_extendedprice) AS average_sales
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
    ), ch AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'store'
                  WHEN o_orderpriority = '3-MEDIUM' THEN 'catalog' ELSE 'web' END AS channel,
             p_brand, SUM(l_quantity * l_extendedprice) AS sales,
             COUNT(*) AS number_sales
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1998
        AND l_partkey IN (SELECT pk FROM cross_items)
      GROUP BY 1, 2
    )
    SELECT channel, p_brand, ROUND(sales, 2) AS sales,
           CAST(number_sales AS BIGINT) AS number_sales
    FROM ch, avg_sales WHERE sales > average_sales
    ORDER BY channel, p_brand LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, part = _t(spark, sf_dir, "lineitem", "orders", "part")
    prio = F.col("o_orderpriority")
    # lo97 feeds the three channel part-sets AND the average-sales scalar —
    # four consumers, each re-running the lineitem⋈orders(1997) join without
    # the checkpoint. Project to the four columns the consumers need before
    # materializing (the raw join output is every column of both tables).
    lo97 = li.join(
        orders.filter(_ts_range("o_orderdate", "1997-01-01", "1998-01-01")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "o_orderpriority", "l_partkey", "l_quantity", "l_extendedprice"
    ).localCheckpoint(eager=False)

    def chan_pk(prios):
        return lo97.filter(prio.isin(*prios)).select(F.col("l_partkey").alias("pk")).distinct()

    cross_items = chan_pk(_STORE).intersect(chan_pk(_CATALOG)).intersect(chan_pk(_WEB))
    avg_sales = lo97.agg(
        F.avg(F.col("l_quantity") * F.col("l_extendedprice")).alias("average_sales")
    )
    ch = (
        li.join(
            orders.filter(_ts_range("o_orderdate", "1998-01-01", "1999-01-01")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cross_items, F.col("l_partkey") == F.col("pk"), "left_semi")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.when(prio.isin(*_STORE), "store")
            .when(prio.isin(*_CATALOG), "catalog")
            .otherwise("web")
            .alias("channel"),
            "p_brand",
            (F.col("l_quantity") * F.col("l_extendedprice")).alias("amt"),
        )
        .groupBy("channel", "p_brand")
        .agg(F.sum("amt").alias("sales"), F.count(F.lit(1)).alias("number_sales"))
    )
    return (
        ch.crossJoin(F.broadcast(avg_sales))
        .filter(F.col("sales") > F.col("average_sales"))
        .select(
            "channel", "p_brand", F.round("sales", R2).alias("sales"), "number_sales"
        )
        .orderBy("channel", "p_brand")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q18 (excluded set): catalog-channel averages (quantity, price, discount,
# account balance) ROLLUP'd over region > nation > segment.
@register(
    "tpcds_q18",
    oracle="""
    -- averages computed as exact-decimal SUM -> double -> /COUNT, truncated
    -- with FLOOR(x*100)/100: every step is IEEE double arithmetic on
    -- identical inputs, so both engines agree bit-for-bit. (ROUND diverges:
    -- a count=2 average of 2-decimal values lands on exact .005 midpoints,
    -- where DuckDB's scaled-multiply rounds down and Spark's BigDecimal
    -- rounds up.)
    SELECT r_name, n_name, c_mktsegment AS segment,
           FLOOR(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) * 100) / 100 AS agg1,
           FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) * 100) / 100 AS agg2,
           FLOOR(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) * 100) / 100 AS agg3,
           FLOOR(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) * 100) / 100 AS agg4
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderpriority = '3-MEDIUM' AND EXTRACT(YEAR FROM o_orderdate) = 1998
    GROUP BY ROLLUP (r_name, n_name, c_mktsegment)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST, segment NULLS FIRST
    LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, nation, region = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region"
    )
    base = (
        li.join(
            orders.filter(
                (prio := F.col("o_orderpriority")).isin(*_CATALOG)
                & _ts_range("o_orderdate", "1998-01-01", "1999-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "r_name", "n_name", F.col("c_mktsegment").alias("segment"),
            "l_quantity", "l_extendedprice", "l_discount", "c_acctbal",
        )
    )
    return (
        base.rollup("r_name", "n_name", "segment")
        .agg(
            *[
                (
                    F.floor(
                        F.sum(F.col(c).cast("decimal(18,4)")).cast("double")
                        / F.count(F.lit(1))
                        * 100
                    )
                    / F.lit(100.0)
                ).alias(f"agg{i}")
                for i, c in enumerate(
                    ("l_quantity", "l_extendedprice", "l_discount", "c_acctbal"), 1
                )
            ]
        )
        .orderBy(
            F.col("r_name").asc_nulls_first(),
            F.col("n_name").asc_nulls_first(),
            F.col("segment").asc_nulls_first(),
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q20 (excluded set): catalog-channel revenue share of each part within its
# type over a 30-day ship window (Q12/Q98's catalog sibling).
@register(
    "tpcds_q20",
    oracle="""
    WITH s AS (
      SELECT p_name, p_type, p_retailprice, SUM(l_extendedprice) AS rev
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '3-MEDIUM'
        AND p_type IN ('ECONOMY', 'PROMO', 'STANDARD')
        AND l_shipdate >= TIMESTAMP '1997-02-01' AND l_shipdate < TIMESTAMP '1997-03-03'
      GROUP BY 1, 2, 3
    )
    SELECT p_name, p_type, p_retailprice, ROUND(rev, 2) AS itemrevenue,
           ROUND(rev * 100.0 / SUM(rev) OVER (PARTITION BY p_type), 4) AS revenueratio
    FROM s ORDER BY p_type, revenueratio DESC, p_name LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li, part, orders = _t(spark, sf_dir, "lineitem", "part", "orders")
    s = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-02-01"))
            & (F.col("l_shipdate") < F.lit("1997-03-03"))
        )
        .join(
            part.filter(F.col("p_type").isin("ECONOMY", "PROMO", "STANDARD")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            orders.filter(F.col("o_orderpriority").isin(*_CATALOG)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("p_name", "p_type", "p_retailprice")
        .agg(F.sum("l_extendedprice").alias("rev"))
    )
    w = Window.partitionBy("p_type")
    return (
        s.select(
            "p_name", "p_type", "p_retailprice",
            F.round("rev", R2).alias("itemrevenue"),
            F.round(F.col("rev") * 100.0 / F.sum("rev").over(w), 4).alias("revenueratio"),
        )
        .orderBy("p_type", F.col("revenueratio").desc(), "p_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q21 (excluded set): per (supplier-nation "warehouse", brand) shipped
# quantity in the 30 days before vs after a pivot date; keep ratios within
# [2/3, 3/2] — the inventory before/after balance check.
@register(
    "tpcds_q21",
    oracle="""
    WITH m AS (
      SELECT n_name, p_brand,
             SUM(CASE WHEN l_shipdate < TIMESTAMP '1997-06-15' THEN l_quantity ELSE 0 END) AS inv_before,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-06-15' THEN l_quantity ELSE 0 END) AS inv_after
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-05-16' AND l_shipdate < TIMESTAMP '1997-07-15'
      GROUP BY 1, 2
    )
    SELECT n_name, p_brand, ROUND(inv_before, 2) AS inv_before, ROUND(inv_after, 2) AS inv_after
    FROM m
    WHERE inv_before > 0 AND inv_after / inv_before >= 2.0 / 3.0
      AND inv_after / inv_before <= 3.0 / 2.0
    ORDER BY n_name, p_brand LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, supp, nation, part = _t(spark, sf_dir, "lineitem", "supplier", "nation", "part")
    pivot = F.lit("1997-06-15")
    m = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-05-16"))
            & (F.col("l_shipdate") < F.lit("1997-07-15"))
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("n_name", "p_brand")
        .agg(
            F.sum(F.when(F.col("l_shipdate") < pivot, F.col("l_quantity")).otherwise(0.0)).alias("inv_before"),
            F.sum(F.when(F.col("l_shipdate") >= pivot, F.col("l_quantity")).otherwise(0.0)).alias("inv_after"),
        )
    )
    ratio = F.col("inv_after") / F.col("inv_before")
    return (
        m.filter((F.col("inv_before") > 0) & (ratio >= 2.0 / 3.0) & (ratio <= 3.0 / 2.0))
        .select("n_name", "p_brand", F.round("inv_before", R2).alias("inv_before"),
                F.round("inv_after", R2).alias("inv_after"))
        .orderBy("n_name", "p_brand")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q23 (excluded set): frequent parts (sold on > 4 distinct ship days in
# 1997) x best customers (total sales > half the max customer) -> their
# February-1998 revenue. The CTE-ladder shape with two semi-join filters
# and a scalar MAX threshold.
@register(
    "tpcds_q23",
    oracle="""
    WITH frequent AS (
      SELECT l_partkey AS pk FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_partkey HAVING COUNT(DISTINCT CAST(l_shipdate AS DATE)) > 4
    ), best AS (
      SELECT o_custkey AS ck, SUM(l_quantity * l_extendedprice) AS sales
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1
    ), best_cut AS (
      SELECT ck FROM best WHERE sales > (SELECT 0.5 * MAX(sales) FROM best)
    )
    SELECT ROUND(SUM(l_extendedprice), 2) AS total
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1998 AND EXTRACT(MONTH FROM o_orderdate) = 2
      AND l_partkey IN (SELECT pk FROM frequent)
      AND o_custkey IN (SELECT ck FROM best_cut)
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    frequent = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.countDistinct(F.to_date("l_shipdate")).alias("nd"))
        .filter(F.col("nd") > 4)
        .select("pk")
    )
    best = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(F.sum(F.col("l_quantity") * F.col("l_extendedprice")).alias("sales"))
        # consumed twice (max-threshold scalar + the cut): materialize the
        # custkey-sized aggregate once instead of joining the facts twice
        .localCheckpoint(eager=False)
    )
    threshold = best.agg((F.max("sales") * 0.5).alias("thr"))
    best_cut = (
        best.crossJoin(F.broadcast(threshold)).filter(F.col("sales") > F.col("thr")).select("ck")
    )
    return (
        li.join(
            orders.filter(_ts_range("o_orderdate", "1998-02-01", "1998-03-01")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(frequent, F.col("l_partkey") == F.col("pk"), "left_semi")
        .join(best_cut, F.col("o_custkey") == F.col("ck"), "left_semi")
        .agg(F.round(F.sum("l_extendedprice"), R2).alias("total"))
    )


# --------------------------------------------------------------------------
# Q24 (excluded set): returned lineitems paired with a NON-returned lineitem
# of the same (order, part) — the store_returns-matched-to-store_sales
# ticket+item join — netpaid per (customer, brand) kept above 5% of the
# all-pairs average.
@register(
    "tpcds_q24",
    oracle="""
    WITH pairs AS (
      SELECT c_name, p_brand, SUM(ret.l_extendedprice) AS netpaid
      FROM lineitem ret
      JOIN lineitem sold ON sold.l_orderkey = ret.l_orderkey
                        AND sold.l_partkey = ret.l_partkey
                        AND sold.l_linenumber <> ret.l_linenumber
      JOIN orders ON ret.l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN part ON ret.l_partkey = p_partkey
      WHERE ret.l_returnflag = 'R' AND sold.l_returnflag <> 'R'
      GROUP BY 1, 2
    )
    SELECT c_name, p_brand, ROUND(netpaid, 2) AS paid
    FROM pairs
    WHERE netpaid > (SELECT 0.05 * AVG(netpaid) FROM pairs)
    ORDER BY c_name, p_brand
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, part = _t(spark, sf_dir, "lineitem", "orders", "customer", "part")
    ret = li.filter(F.col("l_returnflag") == "R").alias("ret")
    sold = li.filter(F.col("l_returnflag") != "R").alias("sold")
    pairs = (
        ret.join(
            sold,
            (F.col("sold.l_orderkey") == F.col("ret.l_orderkey"))
            & (F.col("sold.l_partkey") == F.col("ret.l_partkey"))
            & (F.col("sold.l_linenumber") != F.col("ret.l_linenumber")),
        )
        .join(orders, F.col("ret.l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(part, F.col("ret.l_partkey") == F.col("p_partkey"))
        .groupBy("c_name", "p_brand")
        .agg(F.sum("ret.l_extendedprice").alias("netpaid"))
    )
    thr = pairs.agg((F.avg("netpaid") * 0.05).alias("thr"))
    return (
        pairs.crossJoin(thr)
        .filter(F.col("netpaid") > F.col("thr"))
        .select("c_name", "p_brand", F.round("netpaid", R2).alias("paid"))
        .orderBy("c_name", "p_brand")
    )


# --------------------------------------------------------------------------
# Q30 (excluded set): web-channel returns per customer vs 1.2x their
# nation's average (Q1's web sibling, reporting customer detail).
@register(
    "tpcds_q30",
    oracle="""
    WITH ctr AS (
      SELECT o_custkey AS ck, c_nationkey AS nk, SUM(l_extendedprice) AS total_return
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R' AND o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
        AND EXTRACT(YEAR FROM o_orderdate) = 1998
      GROUP BY 1, 2
    )
    SELECT c_custkey, c_name, c_mktsegment, ROUND(total_return, 2) AS return_amt
    FROM ctr JOIN customer ON ck = c_custkey
    WHERE total_return > (
      SELECT AVG(total_return) * 1.2 FROM ctr c2 WHERE c2.nk = ctr.nk
    )
    ORDER BY c_custkey LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust = _t(spark, sf_dir, "lineitem", "orders", "customer")
    ctr = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                F.col("o_orderpriority").isin(*_WEB) & _ts_range("o_orderdate", "1998-01-01", "1999-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("o_custkey").alias("ck"), F.col("c_nationkey").alias("nk"))
        .agg(F.sum("l_extendedprice").alias("total_return"))
    )
    nation_avg = ctr.groupBy(F.col("nk").alias("avg_nk")).agg(
        (F.avg("total_return") * 1.2).alias("threshold")
    )
    return (
        ctr.join(nation_avg, F.col("nk") == F.col("avg_nk"))
        .filter(F.col("total_return") > F.col("threshold"))
        .join(cust, F.col("ck") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "c_mktsegment",
            F.round("total_return", R2).alias("return_amt"),
        )
        .orderBy("c_custkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q33 (excluded set): per-brand revenue summed across all three channels
# (UNION ALL of channel aggregations) for one part type, one month.
@register(
    "tpcds_q33",
    oracle="""
    WITH ch AS (
      SELECT p_brand, SUM(l_extendedprice) AS total_sales
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN part ON l_partkey = p_partkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND p_type = 'ECONOMY'
        AND EXTRACT(YEAR FROM o_orderdate) = 1998 AND EXTRACT(MONTH FROM o_orderdate) = 3
      GROUP BY p_brand
      UNION ALL
      SELECT p_brand, SUM(l_extendedprice) AS total_sales
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN part ON l_partkey = p_partkey
      WHERE o_orderpriority = '3-MEDIUM' AND p_type = 'ECONOMY'
        AND EXTRACT(YEAR FROM o_orderdate) = 1998 AND EXTRACT(MONTH FROM o_orderdate) = 3
      GROUP BY p_brand
      UNION ALL
      SELECT p_brand, SUM(l_extendedprice) AS total_sales
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN part ON l_partkey = p_partkey
      WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW') AND p_type = 'ECONOMY'
        AND EXTRACT(YEAR FROM o_orderdate) = 1998 AND EXTRACT(MONTH FROM o_orderdate) = 3
      GROUP BY p_brand
    )
    SELECT p_brand, ROUND(SUM(total_sales), 2) AS total_sales
    FROM ch GROUP BY p_brand ORDER BY p_brand
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, part = _t(spark, sf_dir, "lineitem", "orders", "part")
    base = (
        li.join(
            orders.filter(_ts_range("o_orderdate", "1998-03-01", "1998-04-01")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            part.filter(F.col("p_type") == "ECONOMY"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )

    def chan(prios):
        return (
            base.filter(F.col("o_orderpriority").isin(*prios))
            .groupBy("p_brand")
            .agg(F.sum("l_extendedprice").alias("total_sales"))
        )

    return (
        chan(_STORE).unionAll(chan(_CATALOG)).unionAll(chan(_WEB))
        .groupBy("p_brand")
        .agg(F.round(F.sum("total_sales"), R2).alias("total_sales"))
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# Q40 (excluded set): catalog net sales (returns negated) per (supplier
# nation, brand) split before/after a pivot date, for a retail-price band.
@register(
    "tpcds_q40",
    oracle="""
    SELECT n_name, p_brand,
           ROUND(SUM(CASE WHEN l_shipdate < TIMESTAMP '1997-06-15'
                          THEN CASE WHEN l_returnflag = 'R' THEN -l_extendedprice ELSE l_extendedprice END
                          ELSE 0 END), 2) AS sales_before,
           ROUND(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-06-15'
                          THEN CASE WHEN l_returnflag = 'R' THEN -l_extendedprice ELSE l_extendedprice END
                          ELSE 0 END), 2) AS sales_after
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN part ON l_partkey = p_partkey
    WHERE o_orderpriority = '3-MEDIUM'
      AND l_shipdate >= TIMESTAMP '1997-05-16' AND l_shipdate < TIMESTAMP '1997-07-15'
      AND p_retailprice BETWEEN 905 AND 995
    GROUP BY 1, 2 ORDER BY n_name, p_brand LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, supp, nation, part = _t(
        spark, sf_dir, "lineitem", "orders", "supplier", "nation", "part"
    )
    net = F.when(F.col("l_returnflag") == "R", -F.col("l_extendedprice")).otherwise(
        F.col("l_extendedprice")
    )
    pivot = F.lit("1997-06-15")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-05-16"))
            & (F.col("l_shipdate") < F.lit("1997-07-15"))
        )
        .join(
            orders.filter(F.col("o_orderpriority").isin(*_CATALOG)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            part.filter(F.col("p_retailprice").between(905, 995)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("n_name", "p_brand")
        .agg(
            F.round(F.sum(F.when(F.col("l_shipdate") < pivot, net).otherwise(0.0)), R2).alias("sales_before"),
            F.round(F.sum(F.when(F.col("l_shipdate") >= pivot, net).otherwise(0.0)), R2).alias("sales_after"),
        )
        .orderBy("n_name", "p_brand")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q44 (excluded set): ten best and ten worst parts by average net revenue,
# paired rank-to-rank (the ascending/descending ROW_NUMBER self-join).
@register(
    "tpcds_q44",
    oracle="""
    WITH perf AS (
      SELECT l_partkey AS pk, AVG(l_extendedprice * (1 - l_discount)) AS avg_net
      FROM lineitem GROUP BY 1
    ), ranked AS (
      SELECT pk,
             ROW_NUMBER() OVER (ORDER BY avg_net DESC, pk) AS rnk_best,
             ROW_NUMBER() OVER (ORDER BY avg_net ASC, pk) AS rnk_worst
      FROM perf
    )
    SELECT CAST(b.rnk_best AS INTEGER) AS rnk, bp.p_name AS best_performing,
           wp.p_name AS worst_performing
    FROM ranked b
    JOIN ranked w ON b.rnk_best = w.rnk_worst
    JOIN part bp ON b.pk = bp.p_partkey
    JOIN part wp ON w.pk = wp.p_partkey
    WHERE b.rnk_best <= 10
    ORDER BY rnk
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Only the top/bottom 10 parts are consumed, so instead of the oracle's two
    # GLOBAL row_number windows (WindowExec with no partition spec = every
    # distinct part sorted in ONE task at 100 TB) we take each extreme with
    # orderBy().limit(10) — TakeOrderedAndProject, a per-partition top-k merge —
    # and rank WITHIN the 10-row results with a trivially bounded window.
    from pyspark.sql import Window

    li, part = _t(spark, sf_dir, "lineitem", "part")
    perf = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("avg_net")
    )
    best = (
        perf.orderBy(F.col("avg_net").desc(), F.col("pk"))
        .limit(10)
        .withColumn("rnk_best", F.row_number().over(
            Window.orderBy(F.col("avg_net").desc(), F.col("pk"))))
    )
    worst = (
        perf.orderBy(F.col("avg_net").asc(), F.col("pk"))
        .limit(10)
        .withColumn("rnk_worst", F.row_number().over(
            Window.orderBy(F.col("avg_net").asc(), F.col("pk"))))
    )
    b = best.alias("b")
    w = worst.alias("w")
    bp = part.alias("bp")
    wp = part.alias("wp")
    return (
        b.join(w, F.col("b.rnk_best") == F.col("w.rnk_worst"))
        .join(bp, F.col("b.pk") == F.col("bp.p_partkey"))
        .join(wp, F.col("w.pk") == F.col("wp.p_partkey"))
        .select(
            F.col("b.rnk_best").alias("rnk"),
            F.col("bp.p_name").alias("best_performing"),
            F.col("wp.p_name").alias("worst_performing"),
        )
        .orderBy("rnk")
    )


# --------------------------------------------------------------------------
# Q46 (excluded set): weekend orders by customers in two segments buying
# from suppliers OUTSIDE their own nation ("bought in another city"), with
# per-order amount and tax sums.
@register(
    "tpcds_q46",
    oracle="""
    SELECT c_name, o_orderkey, ROUND(SUM(l_extendedprice), 2) AS amt,
           ROUND(SUM(l_tax), 2) AS tax_amt
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')
      AND EXTRACT(DOW FROM o_orderdate) IN (0, 6)
      AND c_nationkey <> s_nationkey
    GROUP BY 1, 2 ORDER BY c_name, o_orderkey LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, supp = _t(spark, sf_dir, "lineitem", "orders", "customer", "supplier")
    return (
        li.join(
            orders.filter((F.dayofweek("o_orderdate") - 1).isin(0, 6)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            cust.filter(F.col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy("c_name", "o_orderkey")
        .agg(
            F.round(F.sum("l_extendedprice"), R2).alias("amt"),
            F.round(F.sum("l_tax"), R2).alias("tax_amt"),
        )
        .orderBy("c_name", "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q49 (excluded set): worst return ratios per channel — top 10 by quantity
# ratio OR by amount ratio (dual ROW_NUMBER), one month.
@register(
    "tpcds_q49",
    oracle="""
    WITH per AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'store'
                  WHEN o_orderpriority = '3-MEDIUM' THEN 'catalog' ELSE 'web' END AS channel,
             l_partkey AS pk,
             SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END) AS ret_qty,
             SUM(l_quantity) AS qty,
             SUM(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END) AS ret_amt,
             SUM(l_extendedprice) AS amt
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1998 AND EXTRACT(MONTH FROM o_orderdate) = 1
      GROUP BY 1, 2
    ), ranked AS (
      SELECT channel, pk, ROUND(ret_qty / qty, 4) AS return_ratio,
             CAST(ROW_NUMBER() OVER (PARTITION BY channel ORDER BY ret_qty / qty DESC, pk) AS INTEGER) AS return_rank,
             CAST(ROW_NUMBER() OVER (PARTITION BY channel ORDER BY ret_amt / amt DESC, pk) AS INTEGER) AS currency_rank
      FROM per
    )
    SELECT channel, pk AS item, return_ratio, return_rank, currency_rank
    FROM ranked WHERE return_rank <= 10 OR currency_rank <= 10
    ORDER BY channel, return_rank, pk
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    prio = F.col("o_orderpriority")
    per = (
        li.join(
            orders.filter(_ts_range("o_orderdate", "1998-01-01", "1998-02-01")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.when(prio.isin(*_STORE), "store")
            .when(prio.isin(*_CATALOG), "catalog")
            .otherwise("web")
            .alias("channel"),
            F.col("l_partkey").alias("pk"),
            "l_quantity", "l_extendedprice", "l_returnflag",
        )
        .groupBy("channel", "pk")
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", F.col("l_quantity")).otherwise(0.0)).alias("ret_qty"),
            F.sum("l_quantity").alias("qty"),
            F.sum(F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")).otherwise(0.0)).alias("ret_amt"),
            F.sum("l_extendedprice").alias("amt"),
        )
    )
    w_q = Window.partitionBy("channel").orderBy((F.col("ret_qty") / F.col("qty")).desc(), F.col("pk"))
    w_a = Window.partitionBy("channel").orderBy((F.col("ret_amt") / F.col("amt")).desc(), F.col("pk"))
    ranked = per.select(
        "channel", "pk",
        F.round(F.col("ret_qty") / F.col("qty"), 4).alias("return_ratio"),
        F.row_number().over(w_q).alias("return_rank"),
        F.row_number().over(w_a).alias("currency_rank"),
    )
    return (
        ranked.filter((F.col("return_rank") <= 10) | (F.col("currency_rank") <= 10))
        .select(
            "channel", F.col("pk").alias("item"), "return_ratio",
            "return_rank", "currency_rank",
        )
        .orderBy("channel", "return_rank", "pk")
    )


# --------------------------------------------------------------------------
# Q54 (excluded set): customers who bought in catalog/web in March 1997,
# bucketed by their store-channel revenue in the following quarter
# ($5000-wide revenue segments, count per segment).
@register(
    "tpcds_q54",
    oracle="""
    WITH my_customers AS (
      SELECT DISTINCT o_custkey AS ck FROM orders
      WHERE o_orderpriority IN ('3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
        AND EXTRACT(YEAR FROM o_orderdate) = 1997 AND EXTRACT(MONTH FROM o_orderdate) = 3
    ), rev AS (
      SELECT ck, SUM(l_extendedprice) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN my_customers ON o_custkey = ck
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND o_orderdate >= TIMESTAMP '1997-04-01' AND o_orderdate < TIMESTAMP '1997-07-01'
      GROUP BY ck
    )
    SELECT CAST(FLOOR(revenue / 5000) AS INTEGER) AS segment,
           CAST(COUNT(*) AS BIGINT) AS num_customers
    FROM rev GROUP BY 1 ORDER BY segment
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    my_customers = (
        orders.filter(
            F.col("o_orderpriority").isin(*(_CATALOG + _WEB))
            # March 1997 as an exact pushable range (was year range + month())
            & _ts_range("o_orderdate", "1997-03-01", "1997-04-01")
        )
        .select(F.col("o_custkey").alias("ck"))
        .distinct()
    )
    rev = (
        li.join(
            orders.filter(
                F.col("o_orderpriority").isin(*_STORE)
                & (F.col("o_orderdate") >= F.lit("1997-04-01"))
                & (F.col("o_orderdate") < F.lit("1997-07-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(my_customers, F.col("o_custkey") == F.col("ck"), "left_semi")
        .groupBy("o_custkey")
        .agg(F.sum("l_extendedprice").alias("revenue"))
    )
    return (
        rev.select(F.floor(F.col("revenue") / 5000).cast("int").alias("segment"))
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("num_customers"))
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# Q56 (excluded set): Q33's sibling at part-name grain for the color-prefixed
# parts (p_name = '<color> <noun>'), February 1998, three channels summed.
@register(
    "tpcds_q56",
    oracle="""
    WITH ch AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'store'
                  WHEN o_orderpriority = '3-MEDIUM' THEN 'catalog' ELSE 'web' END AS channel,
             p_name, SUM(l_extendedprice) AS total_sales
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN part ON l_partkey = p_partkey
      WHERE (p_name LIKE 'red %' OR p_name LIKE 'blue %' OR p_name LIKE 'green %')
        AND EXTRACT(YEAR FROM o_orderdate) = 1998 AND EXTRACT(MONTH FROM o_orderdate) = 2
      GROUP BY 1, 2
    )
    SELECT p_name, ROUND(SUM(total_sales), 2) AS total_sales
    FROM ch GROUP BY p_name ORDER BY p_name
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, part = _t(spark, sf_dir, "lineitem", "orders", "part")
    prio = F.col("o_orderpriority")
    colored = part.filter(
        F.col("p_name").like("red %")
        | F.col("p_name").like("blue %")
        | F.col("p_name").like("green %")
    )
    ch = (
        li.join(
            orders.filter(_ts_range("o_orderdate", "1998-02-01", "1998-03-01")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(colored, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.when(prio.isin(*_STORE), "store")
            .when(prio.isin(*_CATALOG), "catalog")
            .otherwise("web")
            .alias("channel"),
            F.col("p_name"),
        )
        .agg(F.sum("l_extendedprice").alias("total_sales"))
    )
    return (
        ch.groupBy("p_name")
        .agg(F.round(F.sum("total_sales"), R2).alias("total_sales"))
        .orderBy("p_name")
    )


# --------------------------------------------------------------------------
# Q58 (excluded set): parts whose revenue is BALANCED across all three
# channels over 1997 — each channel within 90%-110% of the three-channel
# average (a single month is too sparse at test SFs to balance).
@register(
    "tpcds_q58",
    oracle="""
    WITH per AS (
      SELECT l_partkey AS pk,
             SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN l_extendedprice ELSE 0 END) AS ss_rev,
             SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN l_extendedprice ELSE 0 END) AS cs_rev,
             SUM(CASE WHEN o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW') THEN l_extendedprice ELSE 0 END) AS ws_rev
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
      GROUP BY 1
    )
    SELECT pk AS item, ROUND(ss_rev, 2) AS ss_rev, ROUND(cs_rev, 2) AS cs_rev,
           ROUND(ws_rev, 2) AS ws_rev
    FROM per
    WHERE ss_rev BETWEEN 0.9 * (ss_rev + cs_rev + ws_rev) / 3 AND 1.1 * (ss_rev + cs_rev + ws_rev) / 3
      AND cs_rev BETWEEN 0.9 * (ss_rev + cs_rev + ws_rev) / 3 AND 1.1 * (ss_rev + cs_rev + ws_rev) / 3
      AND ws_rev BETWEEN 0.9 * (ss_rev + cs_rev + ws_rev) / 3 AND 1.1 * (ss_rev + cs_rev + ws_rev) / 3
    ORDER BY item
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    prio = F.col("o_orderpriority")
    per = (
        li.join(
            orders.filter(_ts_range("o_orderdate", "1997-01-01", "1998-01-01")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            F.sum(F.when(prio.isin(*_STORE), F.col("l_extendedprice")).otherwise(0.0)).alias("ss_rev"),
            F.sum(F.when(prio.isin(*_CATALOG), F.col("l_extendedprice")).otherwise(0.0)).alias("cs_rev"),
            F.sum(F.when(prio.isin(*_WEB), F.col("l_extendedprice")).otherwise(0.0)).alias("ws_rev"),
        )
    )
    avg3 = (F.col("ss_rev") + F.col("cs_rev") + F.col("ws_rev")) / 3
    balanced = (
        F.col("ss_rev").between(0.9 * avg3, 1.1 * avg3)
        & F.col("cs_rev").between(0.9 * avg3, 1.1 * avg3)
        & F.col("ws_rev").between(0.9 * avg3, 1.1 * avg3)
    )
    return (
        per.filter(balanced)
        .select(
            F.col("pk").alias("item"),
            F.round("ss_rev", R2).alias("ss_rev"),
            F.round("cs_rev", R2).alias("cs_rev"),
            F.round("ws_rev", R2).alias("ws_rev"),
        )
        .orderBy("item")
    )


# --------------------------------------------------------------------------
# Q60 (excluded set): Q33/Q56's sibling — per part-name revenue summed over
# the three channels for one part type, September 1997.
@register(
    "tpcds_q60",
    oracle="""
    WITH ch AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'store'
                  WHEN o_orderpriority = '3-MEDIUM' THEN 'catalog' ELSE 'web' END AS channel,
             p_name, SUM(l_extendedprice) AS total_sales
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'MEDIUM'
        AND EXTRACT(YEAR FROM o_orderdate) = 1997 AND EXTRACT(MONTH FROM o_orderdate) = 9
      GROUP BY 1, 2
    )
    SELECT p_name, ROUND(SUM(total_sales), 2) AS total_sales
    FROM ch GROUP BY p_name ORDER BY total_sales DESC, p_name LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, part = _t(spark, sf_dir, "lineitem", "orders", "part")
    prio = F.col("o_orderpriority")
    ch = (
        li.join(
            orders.filter(_ts_range("o_orderdate", "1997-09-01", "1997-10-01")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            part.filter(F.col("p_type") == "MEDIUM"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(
            F.when(prio.isin(*_STORE), "store")
            .when(prio.isin(*_CATALOG), "catalog")
            .otherwise("web")
            .alias("channel"),
            F.col("p_name"),
        )
        .agg(F.sum("l_extendedprice").alias("total_sales"))
    )
    return (
        ch.groupBy("p_name")
        .agg(F.round(F.sum("total_sales"), R2).alias("total_sales"))
        .orderBy(F.col("total_sales").desc(), "p_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q61 (excluded set): promotional share of revenue — PROMO-part sales vs all
# sales for one region, one month (the two-scalar ratio report).
@register(
    "tpcds_q61",
    oracle="""
    SELECT ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN l_extendedprice ELSE 0 END), 2) AS promotions,
           ROUND(SUM(l_extendedprice), 2) AS total,
           ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN l_extendedprice ELSE 0 END) * 100.0
                 / SUM(l_extendedprice), 4) AS promo_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND EXTRACT(YEAR FROM o_orderdate) = 1998
      AND EXTRACT(MONTH FROM o_orderdate) = 11
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part, orders, cust, nation, region = _t(
        spark, sf_dir, "lineitem", "part", "orders", "customer", "nation", "region"
    )
    promo = F.when(F.col("p_type") == "PROMO", F.col("l_extendedprice")).otherwise(0.0)
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            orders.filter(_ts_range("o_orderdate", "1998-11-01", "1998-12-01")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .agg(
            F.round(F.sum(promo), R2).alias("promotions"),
            F.round(F.sum("l_extendedprice"), R2).alias("total"),
            F.round(F.sum(promo) * 100.0 / F.sum("l_extendedprice"), 4).alias("promo_pct"),
        )
    )


# --------------------------------------------------------------------------
# Q63 (excluded set): monthly sales per part-size band ("manager") vs that
# band's yearly monthly average; keep months deviating by more than 10%.
@register(
    "tpcds_q63",
    oracle="""
    WITH m AS (
      SELECT CAST(FLOOR((p_size - 1) / 10) AS INTEGER) AS mgr,
             CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER) AS mo,
             SUM(l_extendedprice) AS sales
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        AND p_type IN ('ECONOMY', 'STANDARD', 'PROMO')
      GROUP BY 1, 2
    ), w AS (
      SELECT mgr, mo, sales, AVG(sales) OVER (PARTITION BY mgr) AS avg_monthly
      FROM m
    )
    SELECT mgr, mo, ROUND(sales, 2) AS sum_sales, ROUND(avg_monthly, 2) AS avg_monthly_sales
    FROM w
    WHERE avg_monthly > 0 AND ABS(sales - avg_monthly) / avg_monthly > 0.1
    ORDER BY mgr, mo
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li, part = _t(spark, sf_dir, "lineitem", "part")
    m = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(
            part.filter(F.col("p_type").isin("ECONOMY", "STANDARD", "PROMO")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(
            F.floor((F.col("p_size") - 1) / 10).cast("int").alias("mgr"),
            F.month("l_shipdate").alias("mo"),
        )
        .agg(F.sum("l_extendedprice").alias("sales"))
    )
    w = m.withColumn("avg_monthly", F.avg("sales").over(Window.partitionBy("mgr")))
    return (
        w.filter(
            (F.col("avg_monthly") > 0)
            & (F.abs(F.col("sales") - F.col("avg_monthly")) / F.col("avg_monthly") > 0.1)
        )
        .select(
            "mgr", "mo", F.round("sales", R2).alias("sum_sales"),
            F.round("avg_monthly", R2).alias("avg_monthly_sales"),
        )
        .orderBy("mgr", "mo")
    )


# --------------------------------------------------------------------------
# Q64 (excluded set): two-year (part, supplier-nation) store-channel net
# revenue for parts that were returned at least once — the same-item
# cross-year self-join where the later year must not grow.
@register(
    "tpcds_q64",
    oracle="""
    WITH returned_pk AS (
      SELECT DISTINCT l_partkey AS rpk FROM lineitem WHERE l_returnflag = 'R'
    ), sales AS (
      SELECT l_partkey AS pk, s_nationkey AS nk, EXTRACT(YEAR FROM o_orderdate) AS y,
             SUM(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND EXTRACT(YEAR FROM o_orderdate) IN (1997, 1998)
        AND l_partkey IN (SELECT rpk FROM returned_pk)
      GROUP BY 1, 2, 3
    )
    SELECT p_name, n_name, ROUND(s1.rev, 2) AS rev_1997, ROUND(s2.rev, 2) AS rev_1998
    FROM sales s1
    JOIN sales s2 ON s1.pk = s2.pk AND s1.nk = s2.nk AND s1.y = 1997 AND s2.y = 1998
    JOIN part ON s1.pk = p_partkey
    JOIN nation ON s1.nk = n_nationkey
    WHERE s2.rev <= s1.rev
    ORDER BY p_name, n_name LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, supp, part, nation = _t(
        spark, sf_dir, "lineitem", "orders", "supplier", "part", "nation"
    )
    returned_pk = (
        li.filter(F.col("l_returnflag") == "R").select(F.col("l_partkey").alias("rpk")).distinct()
    )
    # per-year ranged scans (see tpcds_q59): each branch reads only its year
    def sales(y: int) -> DataFrame:
        return (
            li.join(
                orders.filter(
                    F.col("o_orderpriority").isin(*_STORE)
                    & _ts_range("o_orderdate", f"{y}-01-01", f"{y + 1}-01-01")
                ),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .join(returned_pk, F.col("l_partkey") == F.col("rpk"), "left_semi")
            .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy(F.col("l_partkey").alias("pk"), F.col("s_nationkey").alias("nk"))
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
        )

    s1 = sales(1997).alias("s1")
    s2 = sales(1998).alias("s2")
    return (
        s1.join(
            s2,
            (F.col("s1.pk") == F.col("s2.pk")) & (F.col("s1.nk") == F.col("s2.nk")),
        )
        .filter(F.col("s2.rev") <= F.col("s1.rev"))
        .join(part, F.col("s1.pk") == F.col("p_partkey"))
        .join(F.broadcast(nation), F.col("s1.nk") == F.col("n_nationkey"))
        .select(
            "p_name", "n_name",
            F.round(F.col("s1.rev"), R2).alias("rev_1997"),
            F.round(F.col("s2.rev"), R2).alias("rev_1998"),
        )
        .orderBy("p_name", "n_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q66 (excluded set): supplier-nation ("warehouse") shipped quantity pivoted
# into 12 monthly columns, web + store channels combined (UNION ALL), 1997.
@register(
    "tpcds_q66",
    oracle="""
    WITH both_ch AS (
      SELECT n_name, EXTRACT(MONTH FROM l_shipdate) AS mo, l_quantity AS qty
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      UNION ALL
      SELECT n_name, EXTRACT(MONTH FROM l_shipdate) AS mo, l_quantity AS qty
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
        AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    )
    SELECT n_name,
           ROUND(SUM(CASE WHEN mo = 1 THEN qty ELSE 0 END), 2) AS jan,
           ROUND(SUM(CASE WHEN mo = 2 THEN qty ELSE 0 END), 2) AS feb,
           ROUND(SUM(CASE WHEN mo = 3 THEN qty ELSE 0 END), 2) AS mar,
           ROUND(SUM(CASE WHEN mo = 4 THEN qty ELSE 0 END), 2) AS apr,
           ROUND(SUM(CASE WHEN mo = 5 THEN qty ELSE 0 END), 2) AS may,
           ROUND(SUM(CASE WHEN mo = 6 THEN qty ELSE 0 END), 2) AS jun,
           ROUND(SUM(CASE WHEN mo = 7 THEN qty ELSE 0 END), 2) AS jul,
           ROUND(SUM(CASE WHEN mo = 8 THEN qty ELSE 0 END), 2) AS aug,
           ROUND(SUM(CASE WHEN mo = 9 THEN qty ELSE 0 END), 2) AS sep,
           ROUND(SUM(CASE WHEN mo = 10 THEN qty ELSE 0 END), 2) AS oct,
           ROUND(SUM(CASE WHEN mo = 11 THEN qty ELSE 0 END), 2) AS nov,
           ROUND(SUM(CASE WHEN mo = 12 THEN qty ELSE 0 END), 2) AS dec
    FROM both_ch GROUP BY n_name ORDER BY n_name
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, supp, nation = _t(spark, sf_dir, "lineitem", "orders", "supplier", "nation")
    base = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", F.month("l_shipdate").alias("mo"), F.col("l_quantity").alias("qty"),
                "o_orderpriority")
    )
    both_ch = base.filter(F.col("o_orderpriority").isin(*_STORE)).unionAll(
        base.filter(F.col("o_orderpriority").isin(*_WEB))
    )
    months = ("jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep", "oct", "nov", "dec")
    return (
        both_ch.groupBy("n_name")
        .agg(
            *[
                F.round(
                    F.sum(F.when(F.col("mo") == i, F.col("qty")).otherwise(0.0)), R2
                ).alias(n)
                for i, n in enumerate(months, 1)
            ]
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Q68 (excluded set): Q46's sibling — month-start orders for two other
# segments with out-of-nation suppliers, reporting price and tax per order.
@register(
    "tpcds_q68",
    oracle="""
    SELECT c_name, o_orderkey, ROUND(SUM(l_extendedprice), 2) AS extended_price,
           ROUND(SUM(l_extendedprice * l_tax), 2) AS extended_tax
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      AND EXTRACT(DAY FROM o_orderdate) <= 3
      AND c_nationkey <> s_nationkey
    GROUP BY 1, 2 ORDER BY c_name, o_orderkey LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, supp = _t(spark, sf_dir, "lineitem", "orders", "customer", "supplier")
    return (
        li.join(
            orders.filter(_first_days_ranges("o_orderdate", 3)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            cust.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy("c_name", "o_orderkey")
        .agg(
            F.round(F.sum("l_extendedprice"), R2).alias("extended_price"),
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_tax")), R2).alias("extended_tax"),
        )
        .orderBy("c_name", "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q71 (excluded set): revenue by hour inside the breakfast and dinner
# dayparts, per "brand" (event type) — on events, the only sub-day
# timestamps in the schema (time_dim analog; Q88/Q96 use the same mapping).
@register(
    "tpcds_q71",
    oracle="""
    SELECT event_type, CAST(EXTRACT(HOUR FROM ts) AS INTEGER) AS hr,
           CASE WHEN EXTRACT(HOUR FROM ts) BETWEEN 7 AND 8 THEN 'breakfast' ELSE 'dinner' END AS meal,
           ROUND(SUM(value), 2) AS ext_price
    FROM events
    WHERE EXTRACT(HOUR FROM ts) BETWEEN 7 AND 8 OR EXTRACT(HOUR FROM ts) BETWEEN 17 AND 18
    GROUP BY 1, 2, 3 ORDER BY event_type, hr
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    hr = F.hour("ts")
    return (
        events.filter(hr.between(7, 8) | hr.between(17, 18))
        .groupBy(
            "event_type",
            hr.alias("hr"),
            F.when(hr.between(7, 8), "breakfast").otherwise("dinner").alias("meal"),
        )
        .agg(F.round(F.sum("value"), R2).alias("ext_price"))
        .orderBy("event_type", "hr")
    )


# --------------------------------------------------------------------------
# Q72 (excluded set): store-channel lineitems whose quantity exceeds 1.5x
# the supplier's average shipped quantity (the inventory-shortfall join),
# counted per (supplier nation, week).
@register(
    "tpcds_q72",
    oracle="""
    WITH sup_avg AS (
      SELECT l_suppkey AS sk, AVG(l_quantity) AS avg_qty FROM lineitem GROUP BY 1
    )
    SELECT n_name, CAST(EXTRACT(WEEK FROM o_orderdate) AS INTEGER) AS wk,
           CAST(COUNT(*) AS BIGINT) AS shortfall_cnt
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN sup_avg ON l_suppkey = sk
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1998
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND l_quantity > 1.5 * avg_qty
    GROUP BY 1, 2 ORDER BY n_name, wk LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, supp, nation = _t(spark, sf_dir, "lineitem", "orders", "supplier", "nation")
    sup_avg = li.groupBy(F.col("l_suppkey").alias("sk")).agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(
            orders.filter(
                _ts_range("o_orderdate", "1998-01-01", "1999-01-01") & F.col("o_orderpriority").isin(*_STORE)
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(sup_avg, F.col("l_suppkey") == F.col("sk"))
        .filter(F.col("l_quantity") > 1.5 * F.col("avg_qty"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.weekofyear("o_orderdate").alias("wk"))
        .agg(F.count(F.lit(1)).alias("shortfall_cnt"))
        .orderBy("n_name", "wk")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q77 (excluded set): per-channel sales / returns / profit by supplier
# nation with a ROLLUP total over (channel, nation) — the channel census
# with grand totals.
@register(
    "tpcds_q77",
    oracle="""
    WITH per AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'store'
                  WHEN o_orderpriority = '3-MEDIUM' THEN 'catalog' ELSE 'web' END AS channel,
             s_nationkey AS nk,
             SUM(CASE WHEN l_returnflag <> 'R' THEN l_extendedprice ELSE 0 END) AS sales,
             SUM(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END) AS returns
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
      GROUP BY 1, 2
    )
    SELECT channel, nk AS id, ROUND(SUM(sales), 2) AS sales,
           ROUND(SUM(returns), 2) AS returns,
           ROUND(SUM(sales) - SUM(returns), 2) AS profit
    FROM per GROUP BY ROLLUP (channel, nk)
    ORDER BY channel NULLS FIRST, id NULLS FIRST LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, supp = _t(spark, sf_dir, "lineitem", "orders", "supplier")
    prio = F.col("o_orderpriority")
    per = (
        li.join(
            orders.filter(_ts_range("o_orderdate", "1997-01-01", "1998-01-01")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.when(prio.isin(*_STORE), "store")
            .when(prio.isin(*_CATALOG), "catalog")
            .otherwise("web")
            .alias("channel"),
            F.col("s_nationkey").alias("nk"),
        )
        .agg(
            F.sum(F.when(F.col("l_returnflag") != "R", F.col("l_extendedprice")).otherwise(0.0)).alias("sales"),
            F.sum(F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")).otherwise(0.0)).alias("returns"),
        )
    )
    return (
        per.rollup("channel", "nk")
        .agg(
            F.round(F.sum("sales"), R2).alias("sales"),
            F.round(F.sum("returns"), R2).alias("returns"),
            F.round(F.sum("sales") - F.sum("returns"), R2).alias("profit"),
        )
        .withColumnRenamed("nk", "id")
        .orderBy(F.col("channel").asc_nulls_first(), F.col("id").asc_nulls_first())
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q78 (excluded set): store vs web quantity per (year, customer) counting
# only never-returned lineitems; store/web ratio per customer-year.
@register(
    "tpcds_q78",
    oracle="""
    WITH nr AS (SELECT * FROM lineitem WHERE l_returnflag <> 'R'),
    ss AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y, o_custkey AS ck,
             SUM(l_quantity) AS qty, SUM(l_extendedprice) AS amt
      FROM nr JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY 1, 2
    ), ws AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y, o_custkey AS ck,
             SUM(l_quantity) AS qty, SUM(l_extendedprice) AS amt
      FROM nr JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
      GROUP BY 1, 2
    )
    SELECT ss.y AS y, ss.ck AS ck, ROUND(ss.qty, 2) AS ss_qty, ROUND(ws.qty, 2) AS ws_qty,
           ROUND(ss.qty / ws.qty, 4) AS ratio
    FROM ss JOIN ws ON ss.y = ws.y AND ss.ck = ws.ck
    WHERE ws.qty > 0
    ORDER BY y, ck LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    nr = li.filter(F.col("l_returnflag") != "R")

    def chan(prios):
        return (
            nr.join(
                orders.filter(F.col("o_orderpriority").isin(*prios)),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy(F.year("o_orderdate").alias("y"), F.col("o_custkey").alias("ck"))
            .agg(F.sum("l_quantity").alias("qty"), F.sum("l_extendedprice").alias("amt"))
        )

    ss, ws = chan(_STORE).alias("ss"), chan(_WEB).alias("ws")
    return (
        ss.join(ws, (F.col("ss.y") == F.col("ws.y")) & (F.col("ss.ck") == F.col("ws.ck")))
        .filter(F.col("ws.qty") > 0)
        .select(
            F.col("ss.y").alias("y"), F.col("ss.ck").alias("ck"),
            F.round(F.col("ss.qty"), R2).alias("ss_qty"),
            F.round(F.col("ws.qty"), R2).alias("ws_qty"),
            F.round(F.col("ss.qty") / F.col("ws.qty"), 4).alias("ratio"),
        )
        .orderBy("y", "ck")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q80 (excluded set): Q77's item-grain sibling — per-channel sales / returns
# / profit ROLLUP'd over (channel, brand) for high-price parts, one quarter.
@register(
    "tpcds_q80",
    oracle="""
    WITH per AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'store'
                  WHEN o_orderpriority = '3-MEDIUM' THEN 'catalog' ELSE 'web' END AS channel,
             p_brand,
             SUM(CASE WHEN l_returnflag <> 'R' THEN l_extendedprice ELSE 0 END) AS sales,
             SUM(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END) AS returns
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1998 AND EXTRACT(QUARTER FROM o_orderdate) = 2
        AND p_retailprice > 910
      GROUP BY 1, 2
    )
    SELECT channel, p_brand, ROUND(SUM(sales), 2) AS sales,
           ROUND(SUM(returns), 2) AS returns,
           ROUND(SUM(sales) - SUM(returns), 2) AS profit
    FROM per GROUP BY ROLLUP (channel, p_brand)
    ORDER BY channel NULLS FIRST, p_brand NULLS FIRST LIMIT 100
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, part = _t(spark, sf_dir, "lineitem", "orders", "part")
    prio = F.col("o_orderpriority")
    per = (
        li.join(
            orders.filter(_ts_range("o_orderdate", "1998-04-01", "1998-07-01")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            part.filter(F.col("p_retailprice") > 910),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(
            F.when(prio.isin(*_STORE), "store")
            .when(prio.isin(*_CATALOG), "catalog")
            .otherwise("web")
            .alias("channel"),
            "p_brand",
        )
        .agg(
            F.sum(F.when(F.col("l_returnflag") != "R", F.col("l_extendedprice")).otherwise(0.0)).alias("sales"),
            F.sum(F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")).otherwise(0.0)).alias("returns"),
        )
    )
    return (
        per.rollup("channel", "p_brand")
        .agg(
            F.round(F.sum("sales"), R2).alias("sales"),
            F.round(F.sum("returns"), R2).alias("returns"),
            F.round(F.sum("sales") - F.sum("returns"), R2).alias("profit"),
        )
        .orderBy(F.col("channel").asc_nulls_first(), F.col("p_brand").asc_nulls_first())
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q90 (excluded set): morning-vs-evening activity ratio — the am/pm count
# ratio over the sub-day event stream (web_page analog).
@register(
    "tpcds_q90",
    oracle="""
    SELECT ROUND(CAST(am.cnt AS DOUBLE) / pm.cnt, 4) AS am_pm_ratio
    FROM (SELECT COUNT(*) AS cnt FROM events
          WHERE EXTRACT(HOUR FROM ts) BETWEEN 8 AND 9 AND event_type = 'view') am,
         (SELECT COUNT(*) AS cnt FROM events
          WHERE EXTRACT(HOUR FROM ts) BETWEEN 19 AND 20 AND event_type = 'view') pm
    WHERE pm.cnt > 0
    """,
    tags=("tpcds", "tpcds-excluded-real"),
)
def tpcds_q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view")
    am = views.filter(F.hour("ts").between(8, 9)).agg(F.count(F.lit(1)).alias("am_cnt"))
    pm = views.filter(F.hour("ts").between(19, 20)).agg(F.count(F.lit(1)).alias("pm_cnt"))
    return (
        am.crossJoin(pm)
        .filter(F.col("pm_cnt") > 0)
        .select(
            F.round(F.col("am_cnt").cast("double") / F.col("pm_cnt"), 4).alias("am_pm_ratio")
        )
    )
