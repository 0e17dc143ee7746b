"""UCC discovery (hyrise_spark/ucc.py) — the ucc_discovery_plugin analog:
candidate identification from the statement log, one-pass validation,
the redundant-DISTINCT rewrite it enables, and DML invalidation."""
from __future__ import annotations

import pyspark.sql.functions as F

from hyrise_spark.engine import Engine
from hyrise_spark.ucc import (
    identify_candidates,
    maybe_strip_redundant_distinct,
    validate_uccs,
)


def _engine(spark):
    eng = Engine(spark)
    eng.execute(
        "CREATE TABLE ut AS SELECT CAST(id AS INT) AS k,"
        " CAST(id % 7 AS INT) AS grp,"
        " CAST(CASE WHEN id = 3 THEN NULL ELSE id END AS INT) AS k_null"
        " FROM RANGE(50)"
    )
    return eng


def test_validate_uccs_unique_vs_duplicate_vs_null(spark):
    df = spark.range(50).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        F.when(F.col("id") == 3, None).otherwise(F.col("id")).alias("k_null"),
    )
    got = validate_uccs(df, ["k", "grp", "k_null"])
    # unique; duplicated (7 groups over 50 rows); unique-but-nullable
    assert got == {"k": True, "grp": False, "k_null": False}


def test_identify_candidates_from_group_by_and_joins():
    cands = identify_candidates(
        [
            "SELECT grp, COUNT(*) FROM ut GROUP BY grp ORDER BY grp",
            "SELECT * FROM ut a JOIN other b ON a.k = b.fk WHERE x > 2",
        ],
        {"ut": ["k", "grp", "k_null"], "other": ["fk"]},
    )
    assert ("ut", "grp") in cands and ("ut", "k") in cands
    assert ("other", "fk") in cands
    assert ("ut", "k_null") not in cands  # never appeared in a plan


def test_discover_via_meta_exec_and_meta_uccs(spark):
    eng = _engine(spark)
    try:
        # log statements whose plans a UCC could optimize (the LQP-cache walk)
        eng.execute("SELECT k, COUNT(*) AS n FROM ut GROUP BY k").collect()
        eng.execute("SELECT grp, COUNT(*) AS n FROM ut GROUP BY grp").collect()
        eng.execute("INSERT INTO meta_exec VALUES ('ucc', 'discover_uccs')")
        rows = {
            (r.table_name, r.column_name)
            for r in eng.execute("SELECT * FROM meta_uccs").collect()
        }
        assert ("ut", "k") in rows
        assert ("ut", "grp") not in rows  # duplicated -> not validated
    finally:
        eng.execute("DROP TABLE ut")


def test_distinct_rewrite_saves_shuffle_and_keeps_results(spark):
    eng = _engine(spark)
    try:
        eng.execute("SELECT k FROM ut GROUP BY k").collect()
        eng.execute("INSERT INTO meta_exec VALUES ('ucc', 'discover_uccs')")
        assert ("ut", "k") in eng.catalog.validated_uccs

        stmt = "SELECT DISTINCT k, grp FROM ut WHERE grp < 5"
        df = eng.execute(stmt)
        # plan: no aggregate, no exchange — the DISTINCT was stripped
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" not in plan and "Exchange" not in plan, plan
        # results identical to the un-rewritten statement
        want = sorted(tuple(r) for r in spark.sql(stmt).collect())
        got = sorted(tuple(r) for r in df.collect())
        assert got == want
        # DISTINCT on non-UCC columns must NOT be stripped
        df2 = eng.execute("SELECT DISTINCT grp FROM ut")
        plan2 = df2._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" in plan2
        assert df2.count() == 7
    finally:
        eng.execute("DROP TABLE ut")


def test_rewrite_never_touches_joins_or_groupby(spark):
    class FakeCatalog:
        validated_uccs = {("ut", "k")}

        def has_table(self, n):
            return False

    for stmt in (
        "SELECT DISTINCT k FROM ut JOIN o ON k = fk",
        "SELECT DISTINCT k FROM ut UNION SELECT 1",
        "SELECT k, COUNT(DISTINCT grp) FROM ut GROUP BY k",
        "SELECT DISTINCT grp FROM ut",  # no UCC among selected columns
    ):
        assert maybe_strip_redundant_distinct(stmt, FakeCatalog()) == stmt
    assert (
        maybe_strip_redundant_distinct("SELECT DISTINCT k FROM ut", FakeCatalog())
        == "SELECT k FROM ut"
    )


def test_dml_invalidates_uccs(spark):
    eng = _engine(spark)
    try:
        eng.execute("SELECT k FROM ut GROUP BY k").collect()
        eng.execute("INSERT INTO meta_exec VALUES ('ucc', 'discover_uccs')")
        assert ("ut", "k") in eng.catalog.validated_uccs
        # an INSERT could introduce a duplicate — the UCC must be dropped
        eng.execute("INSERT INTO ut VALUES (0, 99, 99)")
        assert ("ut", "k") not in eng.catalog.validated_uccs
        # and the rewrite no longer fires: DISTINCT dedups the duplicate k
        df = eng.execute("SELECT DISTINCT k FROM ut")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" in plan
        assert df.count() == 50  # 51 rows, k=0 twice
    finally:
        eng.execute("DROP TABLE ut")


def test_rewrite_ignores_ucc_inside_function_arguments(spark):
    """ADVICE r6 (high): a UCC column appearing only as a function ARGUMENT
    must not count as selected — `substr(c, k, 2)` does not make the output
    unique. The select list splits on depth-0 commas only, and any
    non-bare-column item disables the rewrite."""

    class FakeCatalog:
        validated_uccs = {("ut", "k")}

        def has_table(self, n):
            return False

    for stmt in (
        "SELECT DISTINCT grp, substr(c, k, 2) FROM ut",
        "SELECT DISTINCT upper(k) FROM ut",
        "SELECT DISTINCT k + 1 FROM ut",
        "SELECT DISTINCT k AS a FROM ut",  # alias -> not a bare column item
        "SELECT DISTINCT coalesce(k, grp), grp FROM ut",
    ):
        assert maybe_strip_redundant_distinct(stmt, FakeCatalog()) == stmt
    # bare columns (qualified or not) still rewrite
    assert (
        maybe_strip_redundant_distinct(
            "SELECT DISTINCT ut.k, grp FROM ut", FakeCatalog()
        )
        == "SELECT ut.k, grp FROM ut"
    )


def test_rewrite_end_to_end_function_arg_returns_duplicates(spark):
    """End-to-end repro of the ADVICE scenario: with ('ut','k') validated,
    SELECT DISTINCT grp, substr(...) must KEEP its dedup."""
    eng = _engine(spark)
    try:
        eng.execute("SELECT k FROM ut GROUP BY k").collect()
        eng.execute("INSERT INTO meta_exec VALUES ('ucc', 'discover_uccs')")
        assert ("ut", "k") in eng.catalog.validated_uccs
        df = eng.execute(
            "SELECT DISTINCT grp, substr(CAST(k % 2 AS STRING), 1, 1) AS b FROM ut"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" in plan  # DISTINCT survived
        assert df.count() == 14  # 7 grps x 2 parities, not 50
    finally:
        eng.execute("DROP TABLE ut")


def test_uppercase_table_ucc_invalidated_on_dml(spark):
    """ADVICE r6 (low): UCC keys are canonically lowercase, so a table
    registered with uppercase letters still has its UCCs dropped by DML."""
    eng = Engine(spark)
    eng.execute("CREATE TABLE UT2 AS SELECT CAST(id AS INT) AS k FROM RANGE(20)")
    try:
        eng.execute("SELECT k FROM UT2 GROUP BY k").collect()
        eng.execute("INSERT INTO meta_exec VALUES ('ucc', 'discover_uccs')")
        assert ("ut2", "k") in eng.catalog.validated_uccs
        eng.execute("INSERT INTO UT2 VALUES (0)")
        assert not {
            (t, c) for (t, c) in eng.catalog.validated_uccs if t == "ut2"
        }
    finally:
        eng.execute("DROP TABLE UT2")
