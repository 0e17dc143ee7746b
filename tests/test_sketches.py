"""Error-bound tests for approximate sketches (no DuckDB oracle possible —
estimator outputs are implementation-specific)."""

from __future__ import annotations

from hyrise_spark.plans.analytic import sketch_approx_distinct, sketch_percentile_approx
from tests.conftest import SF_DIR


def test_approx_distinct_within_rsd(spark):
    import pyspark.sql.functions as F

    rows = sketch_approx_distinct(spark, SF_DIR).collect()
    assert rows
    exact = {
        r["l_returnflag"]: r["exact"]
        for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.count_distinct(F.col("l_orderkey")).alias("exact"))
        .collect()
    }
    for r in rows:
        e = exact[r["l_returnflag"]]
        # HLL++ with rsd=0.05: allow generous 5-sigma-ish slack
        assert abs(r["approx_orders"] - e) <= max(10, 0.25 * e)


def test_percentile_approx_ordered_and_bounded(spark):
    r = sketch_percentile_approx(spark, SF_DIR).collect()[0]
    p50, p95, p99 = r["pcts"]
    assert r["lo"] <= p50 <= p95 <= p99 <= r["hi"]
