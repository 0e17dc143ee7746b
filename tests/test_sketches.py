"""Error-bound tests for approximate sketches (no DuckDB oracle possible —
estimator outputs are implementation-specific)."""

from __future__ import annotations

from hyrise_spark.plans.analytic import sketch_approx_distinct, sketch_percentile_approx
from tests.conftest import SF_DIR


def test_approx_distinct_within_rsd(spark):
    rows = sketch_approx_distinct(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # HLL++ with rsd=0.02: allow 5 sigma
        assert abs(r["approx_orders"] - r["exact_orders"]) <= max(5, 0.1 * r["exact_orders"])


def test_percentile_approx_ordered_and_bounded(spark):
    r = sketch_percentile_approx(spark, SF_DIR).collect()[0]
    p50, p95, p99 = r["pcts"]
    assert r["lo"] <= p50 <= p95 <= p99 <= r["hi"]
