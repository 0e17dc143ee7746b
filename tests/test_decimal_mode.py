"""Exact-decimal session mode (opt-in; VERDICT r7 item 6).

The default engine loads monetary columns as DOUBLE (the driver parquet's
physical type) with cents-lattice rounding discipline. `DECIMAL_MODE` /
`load_tables(..., decimal=True)` instead casts the TPC-H monetary columns
to DECIMAL(15,2) — the spec's type — making every price aggregate exact.
Hyrise itself has NO decimal type (all_type_variant.hpp:34-40: int/long/
float/double/string only), so this is a beyond-reference robustness axis.

These tests re-run the scan + TPC-H registry families with the decimal
flag flipped and compare against DuckDB oracles whose views carry the SAME
DECIMAL(15,2) casts (`SELECT * REPLACE`), plus a pin on exactly WHERE the
double path and the decimal path diverge (ulp-level drift of a big double
sum vs the exact decimal sum).
"""

from __future__ import annotations

import duckdb
import pytest

import hyrise_spark.catalog as catalog
from hyrise_spark.oracle import assert_matches_oracle
from hyrise_spark.registry import all_queries
from tests.conftest import SF_DIR

QUERIES = all_queries()

# Physical-layout variants (bucketed / date-partitioned / z-ordered) rewrite
# derived files through layout.py rather than load_tables and test layout,
# not arithmetic — the plain forms of the same queries cover the decimal
# semantics. Everything else in the scan_/tpch_ families runs.
_LAYOUT_VARIANTS = {
    "tpch_q3_bucketed", "tpch_q18_bucketed", "tpch_q6_datepartitioned",
    "tpch_q6_datesorted", "scan_multidim_zordered",
}

_MONEY_NAMES = {c for cols in catalog.MONEY_COLS.values() for c in cols}


def _touches_money(oracle_sql: str) -> bool:
    return any(c in oracle_sql for c in _MONEY_NAMES)


# scan_/tpch_ run wholesale (the original axis); the aggregate/window/
# setop/sort/distinct families run where their oracle actually reads a
# monetary column (VERDICT r8 task #6 — widen the differential axis).
_WIDENED_FAMILIES = (
    "aggregate_", "agg_", "window_", "setop_", "sort_", "distinct_",
)

# window_rows_frame computes ROUND(AVG(price), 2): under DECIMAL inputs the
# average lands on EXACT .xx5 midpoints (cents over small counts), and
# there the engines legitimately differ — Spark's AVG(DECIMAL) is exact
# decimal division while DuckDB's returns a DOUBLE approximation that can
# sit just below the midpoint. Documented in SCALE.md §9 and pinned below
# (test_window_round_avg_midpoint_divergence) instead of hash-compared.
_DECIMAL_DIVERGENT = {"window_rows_frame"}

DECIMAL_AXIS = sorted(
    n for n in QUERIES
    if n not in _LAYOUT_VARIANTS and n not in _DECIMAL_DIVERGENT
    and QUERIES[n].oracle is not None
    and (
        n.startswith(("scan_", "tpch_"))
        or (n.startswith(_WIDENED_FAMILIES)
            and _touches_money(QUERIES[n].oracle))
    )
)


@pytest.fixture(scope="module")
def decimal_mode(spark):
    old = catalog.DECIMAL_MODE
    catalog.DECIMAL_MODE = True
    yield
    catalog.DECIMAL_MODE = old
    # the parametrized tests re-registered temp views with DECIMAL casts;
    # put EVERY monetary table back on its double views so later modules in
    # the same Spark session see the default schema
    catalog.load_tables(spark, SF_DIR, tuple(catalog.MONEY_COLS), decimal=False)


@pytest.fixture(scope="module")
def duck_decimal():
    """DuckDB oracle connection whose views carry the same DECIMAL(15,2)
    monetary columns the Spark session loads."""
    con = duckdb.connect()
    for t in catalog.TESTDATA_TABLES:
        money = catalog.MONEY_COLS.get(t)
        if money:
            repl = ", ".join(f"CAST({c} AS DECIMAL(15,2)) AS {c}" for c in money)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * REPLACE ({repl}) "
                f"FROM read_parquet('{SF_DIR}/{t}.parquet')"
            )
        else:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
            )
    yield con
    con.close()


@pytest.mark.parametrize("name", DECIMAL_AXIS)
def test_query_matches_oracle_under_decimal_session(spark, decimal_mode, duck_decimal, name):
    sdf = QUERIES[name].builder(spark, SF_DIR)
    assert_matches_oracle(sdf, duck_decimal, QUERIES[name].oracle, name)


def test_decimal_sum_is_exact_where_double_sum_drifts(spark, decimal_mode, duck_decimal):
    """Pin the divergence the mode exists for: a full-column price sum in
    doubles accumulates ulp error (order-dependent), while the decimal sum
    equals DuckDB's exact DECIMAL sum digit-for-digit."""
    import decimal as pydec

    li_dec = catalog.load_tables(spark, SF_DIR, ("lineitem",), decimal=True)["lineitem"]
    li_dbl = catalog.load_tables(spark, SF_DIR, ("lineitem",), decimal=False)["lineitem"]
    got_dec = li_dec.groupBy().sum("l_extendedprice").collect()[0][0]
    got_dbl = li_dbl.groupBy().sum("l_extendedprice").collect()[0][0]
    want = duck_decimal.execute(
        "SELECT SUM(l_extendedprice) FROM lineitem"
    ).fetchone()[0]
    assert isinstance(got_dec, pydec.Decimal)
    assert got_dec == want  # exact, digit-for-digit
    # the double path is close (cents-lattice inputs) but only approximately:
    # equality of the double sum with the exact total is NOT guaranteed and
    # the engine's default mode therefore rounds at presentation time
    # (full view restoration happens in the decimal_mode fixture teardown)
    assert abs(float(got_dec) - got_dbl) < 0.01


# -- one pinned double-vs-decimal divergence per widened family --------------
# (VERDICT r8 task #6 done-criterion; the table lives in SCALE.md §9)

def test_aggregate_grouped_decimal_sum_exact(spark, decimal_mode, duck_decimal):
    """Aggregate family: per-group SUMs of DECIMAL(15,2) equal DuckDB's
    exact decimal totals digit-for-digit; the double path is only
    approximately equal (order-dependent ulp drift) and the engine's
    default mode therefore rounds at presentation time."""
    import decimal as pydec

    li = catalog.load_tables(spark, SF_DIR, ("lineitem",), decimal=True)["lineitem"]
    got = {
        r["l_returnflag"]: r["s"]
        for r in li.groupBy("l_returnflag").agg({"l_extendedprice": "sum"})
        .withColumnRenamed("sum(l_extendedprice)", "s").collect()
    }
    want = dict(duck_decimal.execute(
        "SELECT l_returnflag, SUM(l_extendedprice) FROM lineitem GROUP BY 1"
    ).fetchall())
    assert got == want
    assert all(isinstance(v, pydec.Decimal) for v in got.values())


def test_window_round_avg_midpoint_divergence(spark, decimal_mode, duck_decimal):
    """Window family: Spark's AVG(DECIMAL) is EXACT decimal division
    (result type decimal(38, s+4)), while DuckDB's AVG(DECIMAL) returns a
    DOUBLE approximation. At .xx5 midpoints — which cents-valued decimals
    hit constantly — ROUND then legitimately disagrees: Spark rounds the
    exact midpoint HALF_UP, DuckDB rounds the nearest double, which may sit
    just below it. Pin both on avg(0.05, 0.10) = exactly 0.075: Spark says
    0.08, DuckDB's double path says ROUND(0.07499999...) = 0.07 via its
    float rounding (its DECIMAL ROUND alone is HALF_UP too — probed:
    ROUND(DECIMAL '0.075', 2) = 0.08 — the divergence is the avg's type,
    not the rounding policy). This is why window_rows_frame is excluded
    from the decimal hash axis."""
    row = spark.sql(
        "SELECT ROUND(AVG(v), 2) AS r FROM VALUES"
        " (CAST(0.05 AS DECIMAL(15,2))), (CAST(0.10 AS DECIMAL(15,2))) t(v)"
    ).collect()[0]
    assert str(row["r"]) == "0.08"  # Spark: exact decimal avg, HALF_UP
    avg_d, rounded = duck_decimal.execute(
        "SELECT AVG(v), ROUND(AVG(v), 2) FROM (VALUES"
        " (CAST(0.05 AS DECIMAL(15,2))), (CAST(0.10 AS DECIMAL(15,2)))) t(v)"
    ).fetchone()
    assert isinstance(avg_d, float)  # DuckDB: AVG(DECIMAL) -> DOUBLE
    assert rounded == 0.08 or rounded == 0.07  # value-dependent float round
    # DuckDB's decimal ROUND itself is HALF_UP — the avg TYPE is the cause
    assert str(duck_decimal.execute(
        "SELECT ROUND(CAST(0.075 AS DECIMAL(10,3)), 2)"
    ).fetchone()[0]) == "0.08"


def test_setop_intersect_decimal_exact_double_misses(spark, decimal_mode):
    """Setop family: INTERSECT compares values for EQUALITY, so a computed
    double (0.1 + 0.2) never matches the literal 0.3 — the classic float
    identity failure — while DECIMAL(15,2) arithmetic is exact and the
    intersection is non-empty. This is WHY a money pipeline wants the
    decimal session for set operations."""
    dbl = spark.sql(
        "SELECT CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE) AS v"
        " INTERSECT SELECT CAST(0.3 AS DOUBLE) AS v"
    ).collect()
    assert dbl == []  # 0.30000000000000004 != 0.3
    dec = spark.sql(
        "SELECT CAST(0.1 AS DECIMAL(15,2)) + CAST(0.2 AS DECIMAL(15,2)) AS v"
        " INTERSECT SELECT CAST(0.3 AS DECIMAL(15,2)) AS v"
    ).collect()
    assert len(dec) == 1 and str(dec[0]["v"]) == "0.30"


def test_window_sum_distinct_decimal_fold_exact(spark, decimal_mode, duck_decimal):
    """ADVICE r9: SUM(DISTINCT) OVER folds its collect_set with a typed
    accumulator — in decimal mode (or for decimal-cast args) a
    DECIMAL(38,6) accumulator, matching DuckDB's exact native
    SUM(DISTINCT) over DECIMAL(15,2) monetary columns cent for cent."""
    from hyrise_spark.engine import Engine

    catalog.load_tables(spark, SF_DIR, ("lineitem",), decimal=True)[
        "lineitem"
    ].createOrReplaceTempView("lineitem")
    sql = ("SELECT l_orderkey, SUM(DISTINCT l_extendedprice) OVER "
           "(PARTITION BY l_returnflag) AS s FROM lineitem "
           "WHERE l_orderkey < 500")
    got = sorted(
        (r.l_orderkey, str(r.s)) for r in Engine(spark).execute(sql).collect()
    )
    want = sorted(
        (int(k), str(v)) for k, v in duck_decimal.execute(sql).fetchall()
    )
    # exact decimal comparison: both engines print full-scale decimals
    assert [g[0] for g in got] == [w[0] for w in want]
    from decimal import Decimal

    for (gk, gv), (wk, wv) in zip(got, want):
        assert Decimal(gv) == Decimal(wv), (gk, gv, wv)


def test_window_sum_distinct_double_arg_in_decimal_mode(spark, decimal_mode, duck_decimal):
    """ADVICE r10 regression: the DISTINCT-window fold accumulator comes
    from the ARGUMENT's type, not the session flag. `l_quantity` stays
    DOUBLE even in decimal mode — a forced DECIMAL(38,6) zero over DOUBLE
    elements used to raise DATATYPE_MISMATCH; now it folds in DOUBLE and
    matches DuckDB exactly (integral quantities, well below 2^53)."""
    from hyrise_spark.engine import Engine

    catalog.load_tables(spark, SF_DIR, ("lineitem",), decimal=True)[
        "lineitem"
    ].createOrReplaceTempView("lineitem")
    sql = ("SELECT l_orderkey, l_linenumber, SUM(DISTINCT l_quantity) OVER "
           "(PARTITION BY l_orderkey) AS sd, AVG(DISTINCT l_quantity) OVER "
           "(PARTITION BY l_orderkey) AS ad FROM lineitem "
           "WHERE l_orderkey < 200 ORDER BY 1, 2")
    got = [(r.l_orderkey, r.l_linenumber, float(r.sd), round(float(r.ad), 9))
           for r in Engine(spark).execute(sql).collect()]
    want = [(int(a), int(b), float(c), round(float(d), 9))
            for a, b, c, d in duck_decimal.execute(sql).fetchall()]
    assert got == want


def test_window_sum_distinct_high_scale_decimal_cast_exact(spark, decimal_mode, duck_decimal):
    """ADVICE r10 regression: an explicit DECIMAL(p,s) cast folds at the
    arg's OWN scale (DECIMAL(38,s)), not a hardwired scale 6 — a
    DECIMAL(20,9) arg used to be silently rounded to 6 decimal places on
    every addition. Both engines now agree digit-for-digit at scale 9."""
    from decimal import Decimal

    from hyrise_spark.engine import Engine

    catalog.load_tables(spark, SF_DIR, ("lineitem",), decimal=True)[
        "lineitem"
    ].createOrReplaceTempView("lineitem")
    sql = ("SELECT l_orderkey, l_linenumber, SUM(DISTINCT "
           "CAST((l_orderkey % 97) * 0.000000001 AS DECIMAL(20,9))) OVER "
           "(PARTITION BY l_returnflag) AS sd "
           "FROM lineitem WHERE l_orderkey < 500")
    got = sorted((r.l_orderkey, r.l_linenumber, Decimal(str(r.sd)))
                 for r in Engine(spark).execute(sql).collect())
    want = sorted((int(k), int(ln), Decimal(str(v)))
                  for k, ln, v in duck_decimal.execute(sql).fetchall())
    assert got == want
    # the sums carry non-zero scale-9 digits — the old scale-6 fold
    # would have rounded every addition to .000000
    assert any(v != v.quantize(Decimal("0.000001")) for _, _, v in got)
