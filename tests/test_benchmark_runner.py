"""File-based benchmark runner (file_based_benchmark.cpp / BenchmarkRunner
analog): query discovery, table registration, timing, and --verify."""

from __future__ import annotations

import pytest

from hyrise_spark.benchmark_runner import discover_queries, run
from tests.conftest import SF_DIR


def _write_queries(tmp_path):
    (tmp_path / "q_count.sql").write_text(
        "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation"
    )
    (tmp_path / "q_join.sql").write_text(
        """
        SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
        """
    )
    return tmp_path


def test_discover_queries_sorted(tmp_path):
    _write_queries(tmp_path)
    qs = discover_queries(tmp_path)
    assert list(qs) == ["q_count", "q_join"]
    assert qs["q_count"].startswith("SELECT")


def test_run_times_and_counts(spark, tmp_path):
    _write_queries(tmp_path)
    out = run(spark, tmp_path, SF_DIR, runs=2)
    assert set(out["items"]) == {"q_count", "q_join"}
    assert out["items"]["q_count"]["rows"] == 1
    assert out["items"]["q_join"]["rows"] == 5
    assert all(v["best_s"] <= v["mean_s"] for v in out["items"].values())
    assert all(v["verified"] is None for v in out["items"].values())


def test_run_verify_against_duckdb(spark, tmp_path):
    _write_queries(tmp_path)
    out = run(spark, tmp_path, SF_DIR, runs=1, verify=True)
    assert all(v["verified"] is True for v in out["items"].values())


def test_verify_catches_divergence(spark, tmp_path):
    # A query whose Spark and DuckDB results genuinely differ must be flagged:
    # exploit an engine-dependent expression? No — use a statement sequence
    # whose last statement reads engine-local state (a CREATE TABLE AS only
    # Spark sees), so DuckDB errors / mismatches and verified=False.
    (tmp_path / "q_div.sql").write_text(
        "SELECT CAST(1 AS BIGINT) AS n FROM nation LIMIT 2"
    )
    out = run(spark, tmp_path, SF_DIR, runs=1, verify=True)
    assert out["items"]["q_div"]["verified"] is True  # sanity: identical SQL matches
    (tmp_path / "q_div.sql").write_text(
        "SELECT CAST(COUNT(*) + 1 AS BIGINT) AS n FROM nation"
    )
    # simulate divergence by comparing against a different oracle: rewrite the
    # file between Spark run and verify is not possible through run(), so
    # instead check the comparator directly.
    from hyrise_spark.benchmark_runner import _verify_duckdb

    sdf = spark.sql("SELECT CAST(26 AS BIGINT) AS n")
    assert _verify_duckdb(SF_DIR, "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation", sdf) is False


def test_run_multi_client_stream(spark, tmp_path):
    """clients > 1 drains the (query, run) stream from a thread pool
    (BenchmarkConfig::clients analog) — results and verification must be
    identical to single-stream."""
    qdir = tmp_path / "q"
    qdir.mkdir()
    (qdir / "a.sql").write_text("SELECT COUNT(*) AS n FROM nation")
    (qdir / "b.sql").write_text(
        "SELECT r_name, COUNT(*) AS n FROM nation JOIN region "
        "ON n_regionkey = r_regionkey GROUP BY r_name"
    )
    from hyrise_spark.benchmark_runner import run

    out = run(spark, qdir, SF_DIR, runs=2, verify=True, clients=4)
    assert out["clients"] == 4
    assert set(out["items"]) == {"a", "b"}
    for v in out["items"].values():
        assert v["verified"] is True
        assert v["best_s"] <= v["median_s"] and v["best_s"] <= v["mean_s"]
        assert v["rows"] >= 1


def test_discover_uccs_pre_benchmark_hook(spark, tmp_path):
    """--discover-uccs analog of the UCC plugin's pre_benchmark_hook
    (ucc_discovery_plugin.cpp:82-88): after the warmup stream, discovery
    runs over the logged statements and validates join/group-by columns."""
    from hyrise_spark.benchmark_runner import run

    qdir = tmp_path / "q"
    qdir.mkdir()
    (qdir / "nation_groups.sql").write_text(
        "SELECT n_nationkey, COUNT(*) AS n FROM nation GROUP BY n_nationkey"
    )
    out = run(spark, qdir, "/root/testdata/sf0.001", runs=1, discover_uccs=True)
    assert out["validated_uccs"] >= 1  # n_nationkey is unique


def test_run_shuffled_mode(spark, tmp_path):
    """BenchmarkMode::Shuffled analog: the seeded permutation must still
    time every (query, run) pair — same per-item run counts and rows as
    ordered mode, mode recorded in the result."""
    qdir = tmp_path / "q"
    qdir.mkdir()
    (qdir / "a.sql").write_text("SELECT COUNT(*) AS n FROM region")
    (qdir / "b.sql").write_text("SELECT r_name FROM region ORDER BY r_name")
    from hyrise_spark.benchmark_runner import run

    out = run(spark, qdir, SF_DIR, runs=2, mode="shuffled", seed=3)
    assert out["mode"] == "shuffled"
    assert set(out["items"]) == {"a", "b"}
    for item in out["items"].values():
        assert item["best_s"] >= 0 and item["rows"] >= 1
    with pytest.raises(ValueError, match="unknown benchmark mode"):
        run(spark, qdir, SF_DIR, runs=1, mode="zigzag")


def test_tpch_refresh_roundtrip(spark):
    """RF1 inserts a nonempty re-keyed sample + lineitems, RF2 removes it;
    after every pair the audit profile is bit-identical to baseline."""
    from hyrise_spark.benchmark_runner import run_tpch_refresh
    from tests.conftest import SF_DIR

    result = run_tpch_refresh(spark, SF_DIR, pairs=2)
    assert result["roundtrip_ok"], result
    assert all(n > 0 for n in result["orders_per_rf1"])
    assert result["baseline"] == result["final"]
    assert set(result["latency_s"]) == {"rf1", "rf2", "probe"}


@pytest.mark.slow  # heavyweight; full run only (HYRISE_SPARK_FULL_TESTS=1)
def test_jcch_mode_runs_and_verifies(spark):
    """--jcch (the reference's -j flag, tpch_benchmark.cpp:58-60): all 22
    TPC-H queries over the persisted skewed copy, each DuckDB-verified
    against the oracle replaying the same skew arithmetic. A subset keeps
    the test fast; the registry-wide differential covers all 22."""
    from hyrise_spark.benchmark_runner import run_jcch
    from tests.conftest import SF_DIR

    result = run_jcch(spark, SF_DIR, runs=1, verify=True)
    assert result["mode"] == "jcch"
    assert len(result["items"]) == 22
    assert result["verified_ok"], {
        k: v for k, v in result["items"].items() if not v["verified"]}
    assert all(v["median_s"] >= 0 for v in result["items"].values())
