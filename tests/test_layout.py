"""Bucketed-layout tests: a join between co-bucketed tables must plan
without a shuffle (Exchange) on either side."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hyrise_spark.layout import bucketize_star_schema
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # warehouse dir is a static conf; tables land in ./spark-warehouse
    # (gitignored) and are dropped on teardown
    names = bucketize_star_schema(spark, SF_DIR, n_buckets=8, prefix="t_bl_")
    yield names
    for t in names.values():
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    li = spark.table(bucketed["lineitem"])
    orders = spark.table(bucketed["orders"])
    joined = li.join(orders.hint("merge"), li["l_orderkey"] == orders["o_orderkey"]).groupBy(
        "o_orderstatus"
    ).agg(F.sum("l_quantity").alias("q"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join itself must not re-shuffle either bucketed side: the only
    # Exchange allowed is for the final aggregation
    join_part = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan


def test_bucketed_join_matches_unbucketed(spark, bucketed):
    li_b = spark.table(bucketed["lineitem"])
    orders_b = spark.table(bucketed["orders"])
    got = (
        li_b.join(orders_b, li_b["l_orderkey"] == orders_b["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    want = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_bucketed_q18_variant_has_no_orderkey_exchange(spark):
    """tpch_q18_bucketed: every orderkey hop (HAVING agg, semi join, re-join,
    final groupBy) must ride the bucketing — no exchange on either fact."""
    from hyrise_spark.registry import all_queries

    df = all_queries()["tpch_q18_bucketed"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan


def test_bucketed_variant_matches_plain(spark):
    from hyrise_spark.registry import all_queries

    qs = all_queries()
    got = qs["tpch_q18_bucketed"].builder(spark, SF_DIR).collect()
    want = qs["tpch_q18"].builder(spark, SF_DIR).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_engine_explain(spark):
    from hyrise_spark.engine import Engine

    eng = Engine(spark)
    txt = eng.explain("SELECT 1 AS x")
    assert "Physical Plan" in txt or "Project" in txt


def test_date_partitioned_scan_prunes_partitions(spark):
    """A time-band predicate on a date-partitioned table must appear as
    PartitionFilters (directory pruning), not merely PushedFilters."""
    import pyspark.sql.functions as F

    from hyrise_spark.catalog import load_tables
    from hyrise_spark.layout import write_date_partitioned
    from tests.conftest import SF_DIR

    orders = load_tables(spark, SF_DIR, ("orders",))["orders"]
    write_date_partitioned(orders, "lp_orders", "o_orderdate", "month")
    try:
        q = spark.table("lp_orders").filter(
            (F.col("__pdate") >= "1997-01-01") & (F.col("__pdate") < "1997-04-01")
        )
        plan = q._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        seg = plan.split("PartitionFilters: [", 1)
        assert len(seg) == 2, plan
        assert "__pdate" in seg[1].split("]", 1)[0]
        # and the pruned read returns exactly the banded rows
        import pyspark.sql.functions as F2

        want = orders.filter(
            (F2.date_trunc("month", "o_orderdate") >= "1997-01-01")
            & (F2.date_trunc("month", "o_orderdate") < "1997-04-01")
        ).count()
        assert q.count() == want and want > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS lp_orders")


def test_date_sorted_layout_skips_row_groups(spark, tmp_path):
    """Pins TWO facts the 100 TB story depends on:
    1. TIMESTAMP_NTZ date columns get NO parquet row-group filtering in
       Spark 4.1 — every row decodes even on a perfectly sorted layout
       (PushedFilters is cosmetic at the stats level for NTZ).
    2. write_date_sorted (DATE-cast + range-partition + sort) activates
       real row-group skipping: the scan decodes a small fraction of rows
       for a one-month band, with identical results."""
    import pyspark.sql.functions as F

    from hyrise_spark.catalog import load_tables
    from hyrise_spark.layout import write_date_sorted
    from tests.conftest import SF_DIR

    orders = load_tables(spark, SF_DIR, ("orders",))["orders"]
    total = orders.count()

    def scan_decoded_rows(df):
        df.collect()
        metrics = []

        def walk(node):
            m = node.metrics()
            if "Scan" in node.nodeName() and m.contains("numOutputRows"):
                metrics.append(m.apply("numOutputRows").value())
            ch = node.children()
            for i in range(ch.size()):
                walk(ch.apply(i))
            if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
                walk(node.executedPlan())

        walk(df._jdf.queryExecution().executedPlan())
        assert metrics, "no scan metric found"
        return sum(metrics)

    band = lambda df: df.filter(
        (F.col("o_orderdate") >= "1997-03-01") & (F.col("o_orderdate") < "1997-04-01")
    )

    # 1. NTZ sorted layout: no skipping — every row decodes
    ntz_path = str(tmp_path / "ntz_sorted")
    (orders.orderBy("o_orderdate").coalesce(1)
     .write.option("parquet.block.size", 64 * 1024).mode("overwrite").parquet(ntz_path))
    ntz = band(spark.read.parquet(ntz_path))
    want = ntz.count()
    assert want > 0
    assert scan_decoded_rows(ntz) == total  # the NTZ gap, pinned

    # 2. date-sorted layout: row groups skipped, same rows returned
    ds_path = str(tmp_path / "date_sorted")
    write_date_sorted(orders, ds_path, "o_orderdate", n_files=2, block_size=8 * 1024)
    ds = band(spark.read.parquet(ds_path))
    assert ds.count() == want
    decoded = scan_decoded_rows(ds)
    assert decoded < total * 0.4, (decoded, total)


def test_compact_parquet_merges_small_files(spark, tmp_path):
    """20 tiny files -> 1 right-sized file, identical rows."""
    import glob

    from hyrise_spark.catalog import load_tables
    from hyrise_spark.layout import compact_parquet
    from tests.conftest import SF_DIR

    orders = load_tables(spark, SF_DIR, ("orders",))["orders"]
    src = str(tmp_path / "fragmented")
    orders.repartition(20).write.mode("overwrite").parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 20
    dst = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    assert n == 1
    assert len(glob.glob(f"{dst}/*.parquet")) == 1
    a = sorted(tuple(r) for r in spark.read.parquet(src).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(dst).collect())
    assert a == b


def test_zorder_layout_skips_on_both_dimensions(spark, tmp_path):
    """write_zordered clusters BOTH keys: a banded predicate on either
    dimension decodes a fraction of the rows, where a single-column sort
    only skips on its own column. Results identical in all layouts."""
    import pyspark.sql.functions as F

    from hyrise_spark.catalog import load_tables
    from hyrise_spark.layout import write_zordered
    from tests.conftest import SF_DIR

    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"]
    total = li.count()
    pk_hi = li.agg(F.max("l_partkey")).collect()[0][0]
    sk_hi = li.agg(F.max("l_suppkey")).collect()[0][0]
    # middle ~15% band on each dimension
    pk_band = (int(pk_hi * 0.4), int(pk_hi * 0.55))
    sk_band = (int(sk_hi * 0.4), int(sk_hi * 0.55))

    def scan_decoded_rows(df):
        df.collect()
        metrics = []

        def walk(node):
            m = node.metrics()
            if "Scan" in node.nodeName() and m.contains("numOutputRows"):
                metrics.append(m.apply("numOutputRows").value())
            ch = node.children()
            for i in range(ch.size()):
                walk(ch.apply(i))
            if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
                walk(node.executedPlan())

        walk(df._jdf.queryExecution().executedPlan())
        assert metrics, "no scan metric found"
        return sum(metrics)

    single_path = str(tmp_path / "pk_sorted")
    (li.orderBy("l_partkey").coalesce(1)
     .write.option("parquet.block.size", 8 * 1024).mode("overwrite").parquet(single_path))
    z_path = str(tmp_path / "zordered")
    write_zordered(li, z_path, ["l_partkey", "l_suppkey"], bits=8,
                   n_files=2, block_size=8 * 1024)

    for col, (lo, hi) in (("l_partkey", pk_band), ("l_suppkey", sk_band)):
        band = lambda df: df.filter(F.col(col).between(lo, hi))
        want = band(spark.read.parquet(single_path)).count()
        assert want > 0
        z_scan = band(spark.read.parquet(z_path))
        assert z_scan.count() == want
        decoded = scan_decoded_rows(z_scan)
        assert decoded < total * 0.6, (col, decoded, total)

    # the single-sorted layout cannot skip on the OTHER dimension
    other = spark.read.parquet(single_path).filter(
        F.col("l_suppkey").between(*sk_band)
    )
    assert scan_decoded_rows(other) > total * 0.9


def test_zorder_accepts_temporal_keys_and_guards_bit_budget(spark, tmp_path):
    """write_zordered normalizes DATE/TIMESTAMP keys on their epoch-day
    ordinal (the docstring's advertised contract) and rejects a bits x
    columns product that would spill into the long sign bit."""
    import pytest as _pytest

    from hyrise_spark.catalog import load_tables
    from hyrise_spark.layout import write_zordered
    from tests.conftest import SF_DIR

    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"]
    path = str(tmp_path / "z_temporal")
    write_zordered(li, path, ["l_shipdate", "l_partkey"], bits=6, n_files=2)
    assert spark.read.parquet(path).count() == li.count()

    with _pytest.raises(ValueError, match="exceeds 63"):
        write_zordered(li, str(tmp_path / "z_overflow"),
                       ["l_partkey", "l_suppkey"], bits=32)


def test_daily_rollup_incremental_refresh(spark, tmp_path):
    """Appending one new day and refreshing ONLY that day yields the same
    rollup as a full rebuild, and the untouched days' parquet files are
    physically identical (same paths, sizes, mtimes) — partition-level
    maintenance, not a rewrite."""
    from pathlib import Path

    from hyrise_spark.layout import refresh_daily_rollup, write_daily_rollup
    from tests.conftest import SF_DIR

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    path = str(tmp_path / "rollup")
    write_daily_rollup(events, path)

    def snapshot(skip_day):
        return {
            str(p): (p.stat().st_size, p.stat().st_mtime_ns)
            for p in Path(path).rglob("*.parquet")
            if f"day={skip_day}" not in str(p)
        }

    # "new data arrives" for one day beyond the corpus
    new_day = "2024-02-01"
    extra = spark.createDataFrame(
        [(10**6 + i, f"{new_day} 0{i}:00:00", 1, "click", 10.0 + i, "{}")
         for i in range(3)],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    combined = events.unionByName(extra)

    before = snapshot(new_day)
    refresh_daily_rollup(spark, combined, path, [new_day])
    after = snapshot(new_day)
    assert before == after  # old partitions physically untouched

    got = spark.read.parquet(path)
    full = tmp_path / "rollup_full"
    write_daily_rollup(combined, str(full))
    want = spark.read.parquet(str(full))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
