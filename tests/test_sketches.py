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
    p50, p95, p99 = r["p50"], r["p95"], r["p99"]
    assert r["lo"] <= p50 <= p95 <= p99 <= r["hi"]


def test_count_min_overestimates_only_and_is_bounded(spark):
    """Count-min point estimates (min over depth rows of the hashed cell)
    are >= the true frequency for EVERY key, and the summed overestimate is
    bounded by the sketch's epsilon*N guarantee (e = e_base/width)."""
    import pyspark.sql.functions as F

    from hyrise_spark.plans.analytic import _CM_DEPTH, _CM_WIDTH, _cm_hash_spark
    from hyrise_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    cells = {
        (r.d, r.bucket): r.cnt
        for r in all_queries()["sketch_count_min"].builder(spark, sf).collect()
    }
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    truth = {r.l_partkey: r.cnt for r in
             li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    hashed = li.select(
        "l_partkey",
        *[_cm_hash_spark(d, F.col("l_partkey")).alias(f"h{d}") for d in range(_CM_DEPTH)],
    ).dropDuplicates(["l_partkey"]).collect()
    n = sum(truth.values())
    overs = []
    for r in hashed:
        est = min(cells.get((d, r[f"h{d}"]), 0) for d in range(_CM_DEPTH))
        assert est >= truth[r.l_partkey], (r.l_partkey, est, truth[r.l_partkey])
        overs.append(est - truth[r.l_partkey])
    # CM guarantee: P(over > (e/width)*N) < (1/2)^depth per key; the MEAN
    # overestimate is far under one epsilon — generous factor for the tail
    import math
    eps_n = math.e / _CM_WIDTH * n
    assert sum(overs) / len(overs) <= eps_n, (sum(overs) / len(overs), eps_n)


def test_bloom_has_no_false_negatives_and_bounded_fp(spark):
    """Every inserted key tests positive; absent keys false-positive at no
    more than a few times the theoretical rate for these parameters."""
    from hyrise_spark.plans.analytic import _BLOOM_HASHES, _BLOOM_WORDS
    from hyrise_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    words = {
        r.word_idx: r.word
        for r in all_queries()["sketch_bloom_build"].builder(spark, sf).collect()
    }
    import hashlib

    m = _BLOOM_WORDS * 63

    def bits_of(key: int):
        for i in range(_BLOOM_HASHES):
            h = int(hashlib.md5(f"{key}".encode()).hexdigest()[i * 8:(i + 1) * 8], 16) % m
            yield h // 63, h % 63

    def member(key: int) -> bool:
        return all((words.get(w, 0) >> b) & 1 for w, b in bits_of(key))

    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    present = {r.l_partkey for r in li.select("l_partkey").distinct().collect()}
    for k in present:
        assert member(k), k
    absent = [k for k in range(100000, 102000) if k not in present]
    fp = sum(member(k) for k in absent) / len(absent)
    n_bits_set = sum(bin(w & ((1 << 63) - 1)).count("1") for w in words.values())
    theoretical = (n_bits_set / m) ** _BLOOM_HASHES
    assert fp <= max(0.02, 3 * theoretical), (fp, theoretical)
