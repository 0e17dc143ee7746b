"""Binned interval-overlap join (plans/intervals.py).

The DuckDB differential pins the values; these pin the MECHANISM — the
binned equi-join must (a) agree with a naive inequality join run on Spark,
(b) never plan a nested-loop or cartesian (the whole point of binning), and
(c) count each overlapping pair exactly once without a DISTINCT.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from hyrise_spark.plans.intervals import _BIN, join_interval_overlap_binned
from tests.conftest import SF_DIR


def _naive_pairs(spark):
    """The same overlap join stated as a raw inequality join (Spark plans a
    BNL here — fine at test scale, the oracle shape)."""
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .filter(
            (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-03-01")
        )
        .select(
            F.col("l_quantity").cast("long").alias("lq"),
            F.month(F.col("l_shipdate").cast("date")).alias("ship_month"),
            F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date")).alias("ls"),
            (
                F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date"))
                + F.col("l_linenumber") % 5
                + 1
            ).alias("le"),
        )
    )
    od = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(
            (F.col("o_orderdate") >= "1998-01-01") & (F.col("o_orderdate") < "1998-03-01")
        )
        .select(
            "o_orderpriority",
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")).alias("os"),
            (F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")) + 7).alias("oe"),
        )
    )
    return li.join(od, (F.col("ls") <= F.col("oe")) & (F.col("os") <= F.col("le")))


def test_binned_join_matches_naive_inequality_join(spark):
    got = {
        (r.o_orderpriority, r.ship_month, r.n_pairs, r.sum_qty)
        for r in join_interval_overlap_binned(spark, SF_DIR).collect()
    }
    want = {
        (r.o_orderpriority, r.ship_month, r.n_pairs, r.sum_qty)
        for r in _naive_pairs(spark)
        .groupBy("o_orderpriority", "ship_month")
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.sum("lq").alias("sum_qty"))
        .collect()
    }
    assert got and got == want


def test_bin_credit_is_exactly_once(spark):
    """Every overlapping pair covers the bin of its later start (so the
    credit-bin filter keeps it) and covers it exactly once (so no pair is
    double-counted): total naive pair count == binned n_pairs sum."""
    naive_n = _naive_pairs(spark).count()
    binned_n = (
        join_interval_overlap_binned(spark, SF_DIR)
        .agg(F.sum("n_pairs").alias("n"))
        .collect()[0]
        .n
    )
    assert naive_n > 0 and naive_n == binned_n


def test_binned_plan_is_equi_join(spark):
    """Binning must buy a partitionable equi-join: no nested-loop join and
    no cartesian anywhere in the physical plan."""
    df = join_interval_overlap_binned(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan


def test_bin_width_covers_interval_lengths():
    """The explode factor stays <= 2 bins per interval: every interval in
    both sides is shorter than the bin width (1-5+1 <= 7 and 7 <= 7), the
    documented cost model for the binning strategy."""
    assert _BIN == 7  # max lineitem interval (l_linenumber % 5) + 1 <= 6 < 7


def test_point_in_interval_matches_naive_and_plans_equi(spark):
    """join_point_in_interval_binned == the naive containment join on
    Spark, and the binned plan has no BNL/cartesian. Exactly-once needs no
    credit filter: each point owns exactly one bin."""
    from hyrise_spark.plans.intervals import join_point_in_interval_binned

    got = {
        (r.o_orderpriority, r.ship_month, r.n_contained, r.sum_qty)
        for r in join_point_in_interval_binned(spark, SF_DIR).collect()
    }
    pt = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .filter(
            (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-03-01")
        )
        .select(
            F.col("l_quantity").cast("long").alias("lq"),
            F.month(F.col("l_shipdate").cast("date")).alias("ship_month"),
            F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date")).alias("p"),
        )
    )
    od = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(
            (F.col("o_orderdate") >= "1998-01-01") & (F.col("o_orderdate") < "1998-03-01")
        )
        .select(
            "o_orderpriority",
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")).alias("os"),
            (F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")) + 7).alias("oe"),
        )
    )
    want = {
        (r.o_orderpriority, r.ship_month, r.n_contained, r.sum_qty)
        for r in pt.join(od, (F.col("p") >= F.col("os")) & (F.col("p") <= F.col("oe")))
        .groupBy("o_orderpriority", "ship_month")
        .agg(F.count(F.lit(1)).alias("n_contained"), F.sum("lq").alias("sum_qty"))
        .collect()
    }
    assert got and got == want

    df = join_point_in_interval_binned(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sides_pre_aggregate_before_bin_join(spark):
    """Round 13 (§2.3): the bin join's inputs must be the bounded-lattice
    HISTOGRAMS (count/sum per distinct attribute combo), not raw fact rows —
    the pre-agg measure columns must feed the join and the final aggregate
    must recombine them as products."""
    from hyrise_spark.plans.intervals import join_point_in_interval_binned

    for builder, cols in (
        (join_interval_overlap_binned, ("n_li", "qty_li", "n_od")),
        (join_point_in_interval_binned, ("n_pt", "qty_pt", "n_od")),
    ):
        df = builder(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        for c in cols:
            assert c in plan, f"{builder.__name__}: pre-agg column {c} not in plan"
        # the final agg multiplies the two sides' histogram counts
        import re

        assert re.search(rf"{cols[0]}#\d+L? \* n_od#\d+L?", plan), (
            f"{builder.__name__}: histogram-product recombination not in plan"
        )
