"""JCC-H suite (round 12; VERDICT r11 #1): the full TPC-H 22 over a
PERSISTED skewed dataset copy, plus the plan pins that the canonical plans
survive the skew — AQE splits the hot partitions at runtime (skew=true in
the final adaptive plan), no single-reducer stage.

Correctness of all 22 bench_jcch_* queries is covered by the registry-wide
differential (tests/test_queries_oracle.py + the driver gate); this file
pins the SKEW-specific properties: the persisted copy's documented hot-key
profile, idempotent ingest, and the runtime skew handling on q9/q18/q21 —
the three reference-named skew victims (VERDICT r11 #1)."""

from __future__ import annotations

import os

import pytest
import pyspark.sql.functions as F

from hyrise_spark.plans.jcch_suite import ensure_jcch
from hyrise_spark.registry import all_queries
from tests.conftest import SF_DIR

QUERIES = all_queries()


@pytest.fixture(scope="module")
def skew_dir(spark):
    return ensure_jcch(spark, SF_DIR)


def test_suite_registered_with_oracles():
    names = [n for n in QUERIES if n.startswith("bench_jcch_q")]
    assert len(names) == 22
    assert all(QUERIES[n].oracle for n in names)
    # the names land inside the driver's alphabetical 50-query window
    first50 = sorted(QUERIES)[:50]
    assert sum(1 for n in names if n in first50) >= 5


def test_skew_profile_and_symlinks(spark, skew_dir):
    """The persisted copy carries the documented JCC-H signature: one
    supplier owns ~75% of lineitems, 25 customers own ~75% of orders, one
    nation holds ~75% of customers; untouched tables are symlinked."""
    li = spark.read.parquet(os.path.join(skew_dir, "lineitem.parquet"))
    n = li.count()
    hot = li.filter(F.col("l_suppkey") == 1).count()
    assert 0.70 <= hot / n <= 0.80, (hot, n)

    orders = spark.read.parquet(os.path.join(skew_dir, "orders.parquet"))
    no = orders.count()
    hot_o = orders.filter(F.col("o_custkey") <= 25).count()
    assert hot_o / no >= 0.74, (hot_o, no)

    cust = spark.read.parquet(os.path.join(skew_dir, "customer.parquet"))
    nc = cust.count()
    hot_c = cust.filter(F.col("c_nationkey") == 1).count()
    assert 0.70 <= hot_c / nc <= 0.85, (hot_c, nc)

    assert os.path.islink(os.path.join(skew_dir, "supplier.parquet"))
    assert os.path.islink(os.path.join(skew_dir, "part.parquet"))
    # idempotent: a second call returns without rewriting (marker present)
    assert ensure_jcch(li.sparkSession, SF_DIR) == skew_dir


def test_skew_rewrite_matches_oracle_arithmetic(spark, duck, skew_dir):
    """The persisted transform and the oracle CTE are the same function of
    the same source: compare the per-supplier histogram of the parquet
    copy against DuckDB evaluating the CTE arithmetic directly."""
    li = spark.read.parquet(os.path.join(skew_dir, "lineitem.parquet"))
    got = {
        r["l_suppkey"]: r["n"]
        for r in li.groupBy("l_suppkey").agg(F.count("*").alias("n")).collect()
    }
    want = dict(duck.execute(
        "SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 1 ELSE l_suppkey END, "
        "COUNT(*) FROM lineitem GROUP BY 1").fetchall())
    assert got == want


_SKEW_CONF = {
    # force the shuffle path (dims would broadcast at test scale) and make
    # AQE's skew detector fire on the toy partitions — at 100 TB the same
    # mechanism fires at the DEFAULT thresholds (256 MB partitions)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # the session sets a SEPARATE AQE runtime conversion threshold (16 MB,
    # round-12 broadcast-cliff fix); it must be off too or AQE converts
    # the tiny test-scale joins to broadcast before skew splitting applies
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


@pytest.fixture()
def skew_conf(spark):
    old = {}
    for k, v in _SKEW_CONF.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


@pytest.mark.parametrize("name", ["bench_jcch_q09", "bench_jcch_q18"])
def test_aqe_splits_hot_partitions(spark, skew_dir, skew_conf, name):
    """Two of the reference-named skew victims (q9: hot-suppkey supplier
    join, q18: customer join over hot-custkey orders): with broadcasts
    disabled (the 100 TB shape — dims too big to ship) the hot key lands
    in one shuffle partition and AQE must SPLIT it — the final adaptive
    plan carries skew=true; without the split one reducer owns 75% of the
    fact and the stage never finishes at scale."""
    df = QUERIES[name].builder(spark, SF_DIR)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in final, f"{name}: no skew split in final plan"


def test_q21_runs_keyed_and_hot_edge_splits(spark, skew_dir, skew_conf):
    """q21 (supplier + double lineitem self-join): at sf0.001 its
    NATION-filtered intermediates sit under ANY skew threshold, so the
    pin decomposes — (a) the full query completes on the skewed copy with
    every join keyed (no cartesian / nested loop), and (b) the query's
    HOT EDGE (lineitem self-join on orderkey -> hot-suppkey join to
    supplier) splits under AQE when run on the same skewed parquet. At
    scale the full query's intermediates are fact-sized and (b) is the
    path that fires; operators/joins.py::salted_join is the documented
    fallback beyond AQE's split granularity (plans/jcch.py)."""
    df = QUERIES["bench_jcch_q21"].builder(spark, SF_DIR)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" not in final

    li = spark.read.parquet(os.path.join(skew_dir, "lineitem.parquet"))
    l2 = li.select(F.col("l_orderkey").alias("o2"),
                   F.col("l_suppkey").alias("s2"))
    supp = spark.read.parquet(os.path.join(skew_dir, "supplier.parquet"))
    edge = (
        li.join(l2, (F.col("l_orderkey") == F.col("o2"))
                & (F.col("l_suppkey") != F.col("s2")))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name").count()
    )
    edge.collect()
    final = edge._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in final, "q21 hot edge: no skew split"
