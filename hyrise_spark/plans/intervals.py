"""Interval-overlap join via temporal binning — the scale strategy for
inequality joins.

The reference executes theta joins with JoinSortMergeClusterer
(`join_sort_merge.cpp:43`) — a single-node sort-cluster pass. Spark's only
native plan for a pure inequality predicate is BroadcastNestedLoop (or a
shuffled cartesian), both of which die at fact×fact scale. The standard
distributed answer (used by ranged spatial joins and Flink/KDB-style
interval joins) is BINNING: chop time into fixed-width bins, explode each
interval to the bins it covers, equi-join on the bin, then (a) re-check the
exact overlap predicate and (b) keep each pair exactly once by crediting it
to the bin holding `greatest(start_a, start_b)` — no DISTINCT pass needed.

Scale design: the explode factor is (interval_len / bin_width) + 1, chosen
~1-2 here (7-day bins vs 1-8 day intervals). The join is then a plain
shuffle-hash equi-join on bin — partitionable, AQE-skew-splittable, no
broadcast of a scaling side, no nested loop. Output is aggregated, so the
pair stream never materializes driver-side.

Round 13 (guide §2.3 "aggregate before you shuffle"): both queries aggregate
the pair stream with DISTRIBUTIVE measures (COUNT, SUM), and both sides'
join-relevant attributes live on a bounded lattice — epoch DAYS in the query
window × (5 interval lengths | 5 priorities). Identical rows join identically,
so each side collapses to its (attrs → count/sum) histogram BEFORE the bin
join and the measures recombine as sum(n_a*n_b) / sum(qty_a*n_b). That turns
a ~10^8-candidate-pair join (the window holds ~9 seven-day bins, so per-bin
blocks were ~25k × 700 rows — and only ~9 join tasks could ever be busy) into
a few-hundred × few-hundred row join, while the fact tables are read once
through a map-side-aggregable groupBy whose key count is bounded by the date
lattice, not the row count. The binned-join shape is kept (it is the part
that survives fact×fact scale when the lattice is NOT bounded); the
pre-aggregation is what makes the bin blocks small.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hyrise_spark.catalog import load_tables
from hyrise_spark.registry import register

# Window of interest and bin width (days). Epoch-day arithmetic keeps both
# engines on exact integers; 1998 epoch days are positive so integer `div`
# is a true floor.
_LO, _HI = "1998-01-01", "1998-03-01"
_BIN = 7


@register(
    "join_interval_overlap_binned",
    oracle=f"""
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS BIGINT) AS lq,
             month(CAST(l_shipdate AS DATE)) AS ship_month,
             date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS ls,
             date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
               + (l_linenumber % 5) + 1 AS le
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{_LO}' AND l_shipdate < TIMESTAMP '{_HI}'
    ),
    od AS (
      SELECT o_orderpriority,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS os,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 7 AS oe
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '{_LO}' AND o_orderdate < TIMESTAMP '{_HI}'
    )
    SELECT o_orderpriority, ship_month,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(lq) AS BIGINT) AS sum_qty
    FROM li JOIN od ON li.ls <= od.oe AND od.os <= li.le
    GROUP BY o_orderpriority, ship_month
    """,
    tags=("join", "interval"),
)
def join_interval_overlap_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count lineitem-shipping-interval × order-fulfilment-window overlaps
    per (priority, ship month), Jan-Feb 1998. Lineitem interval =
    [shipdate, shipdate + (linenumber % 5) + 1 days]; order window =
    [orderdate, orderdate + 7 days].

    The oracle states the inequality join directly; the Spark plan is the
    binned equi-join described in the module docstring — byte-identical
    results, but a plan that survives fact×fact scale. Both sides are
    pre-aggregated to their bounded-lattice histograms before the join
    (§2.3): COUNT/SUM distribute over the group product, so
    n_pairs = Σ n_li·n_od and sum_qty = Σ qty_li·n_od — exact long
    arithmetic, no pair ever materialized row-at-a-time.
    """
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    epoch = F.lit("1970-01-01").cast("date")
    # (ship_month, ls, le) lives on the window's day lattice × 5 interval
    # lengths (~300 combos): the groupBy is map-side-aggregable and the
    # join input is histogram-sized regardless of fact row count.
    li = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit(_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_HI).cast("timestamp"))
        )
        .select(
            F.col("l_quantity").cast("long").alias("lq"),
            F.month(F.col("l_shipdate").cast("date")).alias("ship_month"),
            F.datediff(F.col("l_shipdate").cast("date"), epoch).alias("ls"),
            (
                F.datediff(F.col("l_shipdate").cast("date"), epoch)
                + F.col("l_linenumber") % 5
                + 1
            ).alias("le"),
        )
        .groupBy("ship_month", "ls", "le")
        .agg(F.count(F.lit(1)).alias("n_li"), F.sum("lq").alias("qty_li"))
    )
    # (priority, os) — window days × 5 priorities (~300 combos); oe = os+7.
    od = (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= F.lit(_LO).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(_HI).cast("timestamp"))
        )
        .select(
            "o_orderpriority",
            F.datediff(F.col("o_orderdate").cast("date"), epoch).alias("os"),
            (F.datediff(F.col("o_orderdate").cast("date"), epoch) + 7).alias("oe"),
        )
        .groupBy("o_orderpriority", "os", "oe")
        .agg(F.count(F.lit(1)).alias("n_od"))
    )
    li_b = li.withColumn(
        "bin",
        F.explode(F.sequence(F.expr(f"ls div {_BIN}"), F.expr(f"le div {_BIN}"))),
    )
    od_b = od.withColumn(
        "bin",
        F.explode(F.sequence(F.expr(f"os div {_BIN}"), F.expr(f"oe div {_BIN}"))),
    )
    pairs = li_b.join(od_b, "bin").filter(
        (F.col("ls") <= F.col("oe"))
        & (F.col("os") <= F.col("le"))
        # exactly-once: credit the pair to the bin of the later start
        & (F.col("bin") == F.expr(f"greatest(ls, os) div {_BIN}"))
    )
    return pairs.groupBy("o_orderpriority", "ship_month").agg(
        F.sum(F.col("n_li") * F.col("n_od")).alias("n_pairs"),
        F.sum(F.col("qty_li") * F.col("n_od")).alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# Point-in-interval join (temporal containment — the validity-interval /
# IP-range-lookup shape, distinct from the as-of join's "latest before"):
# each POINT explodes to exactly ONE bin and each interval to <= 2, so the
# binned equi-join is exactly-once BY CONSTRUCTION (a point lives in one
# bin; no credit filter, no DISTINCT). The as-of join (plans/events.py)
# picks one row; this keeps EVERY containing interval.


@register(
    "join_point_in_interval_binned",
    oracle=f"""
    WITH pt AS (
      SELECT CAST(l_quantity AS BIGINT) AS lq,
             month(CAST(l_shipdate AS DATE)) AS ship_month,
             date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS p
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{_LO}' AND l_shipdate < TIMESTAMP '{_HI}'
    ),
    od AS (
      SELECT o_orderpriority,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS os,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 7 AS oe
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '{_LO}' AND o_orderdate < TIMESTAMP '{_HI}'
    )
    SELECT o_orderpriority, ship_month,
           CAST(COUNT(*) AS BIGINT) AS n_contained,
           CAST(SUM(lq) AS BIGINT) AS sum_qty
    FROM pt JOIN od ON pt.p >= od.os AND pt.p <= od.oe
    GROUP BY o_orderpriority, ship_month
    """,
    tags=("join", "interval"),
)
def join_point_in_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ship events (points) inside order fulfilment windows (intervals),
    counted per (priority, ship month), Jan-Feb 1998. The oracle states
    containment as an inequality join; Spark gets the binned equi-join —
    point side keys by its single bin, interval side explodes to its <= 2
    covering bins. Both sides pre-aggregate to their day-lattice histograms
    before the join (§2.3; see the overlap query above): COUNT/SUM
    distribute over the group product."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    epoch = F.lit("1970-01-01").cast("date")
    # p determines ship_month; the point histogram is one row per window
    # day (~60 rows) however many fact rows land on the day.
    pt = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit(_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_HI).cast("timestamp"))
        )
        .select(
            F.col("l_quantity").cast("long").alias("lq"),
            F.month(F.col("l_shipdate").cast("date")).alias("ship_month"),
            F.datediff(F.col("l_shipdate").cast("date"), epoch).alias("p"),
        )
        .groupBy("ship_month", "p")
        .agg(F.count(F.lit(1)).alias("n_pt"), F.sum("lq").alias("qty_pt"))
        .withColumn("bin", F.expr(f"p div {_BIN}"))
    )
    od = (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= F.lit(_LO).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(_HI).cast("timestamp"))
        )
        .select(
            "o_orderpriority",
            F.datediff(F.col("o_orderdate").cast("date"), epoch).alias("os"),
            (F.datediff(F.col("o_orderdate").cast("date"), epoch) + 7).alias("oe"),
        )
        .groupBy("o_orderpriority", "os", "oe")
        .agg(F.count(F.lit(1)).alias("n_od"))
        .withColumn(
            "bin",
            F.explode(
                F.sequence(F.expr(f"os div {_BIN}"), F.expr(f"oe div {_BIN}"))
            ),
        )
    )
    contained = pt.join(od, "bin").filter(
        (F.col("p") >= F.col("os")) & (F.col("p") <= F.col("oe"))
    )
    return contained.groupBy("o_orderpriority", "ship_month").agg(
        F.sum(F.col("n_pt") * F.col("n_od")).alias("n_contained"),
        F.sum(F.col("qty_pt") * F.col("n_od")).alias("sum_qty"),
    )
