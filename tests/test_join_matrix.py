"""Join configuration-matrix differential runner (SURVEY.md §5 layer 2).

Mirror of the reference's join_test_runner
(/root/reference/src/test/lib/operators/join_test_runner.cpp:31-34), which
sweeps JoinModes x predicates x data types x null patterns against a
verification implementation. Here the sweep runs every combination through
BOTH the Spark DataFrame API and DuckDB SQL over identical inputs and
compares canonicalized results:

  modes      : inner, left, right, full, cross, semi, anti (NOT EXISTS),
               anti-null-as-true (NOT IN)       [types.hpp:210 JoinModes]
  key types  : int / long / float / double / string  [all_type_variant.hpp:34]
  null pats  : none, left-side, both-sides
  theta ops  : < <= > >= <> (inner, per JoinSortMerge limits,
               join_sort_merge.cpp:43-47)
  multi-pred : equi + secondary predicate
               [multi_predicate_join_evaluator.cpp]
"""

from __future__ import annotations

import pytest

# join-type x null matrix sweep — deselected from the driver-window default run (pytest.ini / conftest);
# runs under HYRISE_SPARK_FULL_TESTS=1.
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from tests.oracle_utils import canon

# ---------------------------------------------------------------------------
# Deterministic inputs. Key domain per type; payloads make row-multiplicity
# (bag semantics) visible. Duplicate keys on both sides exercise 1:N and N:M.

_KEYS = {
    "int": ([1, 2, 2, 3, 4, 7], IntegerType(), "INTEGER"),
    "long": (
        [10**10 + 1, 10**10 + 2, 10**10 + 2, 10**10 + 3, 10**10 + 4, 10**10 + 7],
        LongType(),
        "BIGINT",
    ),
    "float": ([1.5, 2.5, 2.5, 3.5, 4.5, 7.5], FloatType(), "FLOAT"),
    "double": ([1.25, 2.25, 2.25, 3.25, 4.25, 7.25], DoubleType(), "DOUBLE"),
    "string": (["a", "b", "b", "c", "d", "g"], StringType(), "VARCHAR"),
}

_NULL_PATTERNS = ("none", "left", "both")


def _rows(dtype: str, side: str, nullpat: str):
    keys, _, _ = _KEYS[dtype]
    if side == "l":
        # 8 rows: 6 domain keys (one dup pair) + 2 extra dups of keys[0]
        ks = list(keys) + [keys[0], keys[3]]
    else:
        # 6 rows: subset overlapping 4 of the left keys + 1 right-only
        ks = [keys[1], keys[1], keys[3], keys[4], keys[5], keys[5]]
    rows = [(k, i * (10 if side == "l" else 7) + 1) for i, k in enumerate(ks)]
    if nullpat in ("left", "both") and side == "l":
        rows[2] = (None, rows[2][1])
        rows[6] = (None, rows[6][1])
    if nullpat == "both" and side == "r":
        rows[1] = (None, rows[1][1])
    return rows


def _setup(spark, duck, dtype: str, nullpat: str):
    keys, stype, dtyp = _KEYS[dtype]
    for side, kcol, vcol in (("l", "lk", "lv"), ("r", "rk", "rv")):
        rows = _rows(dtype, side, nullpat)
        schema = StructType(
            [StructField(kcol, stype, True), StructField(vcol, IntegerType(), False)]
        )
        spark.createDataFrame(rows, schema).createOrReplaceTempView(f"jm_{side}")
        duck.execute(f"DROP TABLE IF EXISTS jm_{side}")
        duck.execute(f"CREATE TABLE jm_{side} ({kcol} {dtyp}, {vcol} INTEGER)")
        duck.executemany(f"INSERT INTO jm_{side} VALUES (?, ?)", rows)


def _compare(sdf, duck, sql: str, label: str):
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    res = duck.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), f"{label}: cols {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{label}: rowcount {len(srows)} vs {len(orows)}"
    sc, oc = canon(scols, srows), canon(ocols, orows)
    assert sc == oc, f"{label}: first diff:\n spark : " + next(
        (f"{a}\n duckdb: {b}" for a, b in zip(sc, oc) if a != b), ""
    )


_MODES = {
    # mode -> (spark how, duckdb SQL template)
    "inner": ("inner", "SELECT lk, lv, rk, rv FROM jm_l JOIN jm_r ON lk = rk"),
    "left": ("left", "SELECT lk, lv, rk, rv FROM jm_l LEFT JOIN jm_r ON lk = rk"),
    "right": ("right", "SELECT lk, lv, rk, rv FROM jm_l RIGHT JOIN jm_r ON lk = rk"),
    "full": ("full", "SELECT lk, lv, rk, rv FROM jm_l FULL JOIN jm_r ON lk = rk"),
    "semi": (
        "left_semi",
        "SELECT lk, lv FROM jm_l WHERE EXISTS (SELECT 1 FROM jm_r WHERE rk = lk)",
    ),
    "anti": (
        "left_anti",
        "SELECT lk, lv FROM jm_l WHERE NOT EXISTS (SELECT 1 FROM jm_r WHERE rk = lk)",
    ),
}


@pytest.mark.parametrize("nullpat", _NULL_PATTERNS)
@pytest.mark.parametrize("dtype", sorted(_KEYS))
@pytest.mark.parametrize("mode", sorted(_MODES))
def test_join_mode_matrix(spark, duck, mode, dtype, nullpat):
    _setup(spark, duck, dtype, nullpat)
    how, sql = _MODES[mode]
    left, right = spark.table("jm_l"), spark.table("jm_r")
    sdf = left.join(right, F.col("lk") == F.col("rk"), how)
    if mode in ("semi", "anti"):
        sdf = sdf.select("lk", "lv")
    _compare(sdf, duck, sql, f"{mode}/{dtype}/{nullpat}")


@pytest.mark.parametrize("nullpat", _NULL_PATTERNS)
@pytest.mark.parametrize("dtype", ["int", "string"])
def test_join_cross(spark, duck, dtype, nullpat):
    _setup(spark, duck, dtype, nullpat)
    sdf = spark.table("jm_l").crossJoin(spark.table("jm_r"))
    _compare(sdf, duck, "SELECT lk, lv, rk, rv FROM jm_l CROSS JOIN jm_r",
             f"cross/{dtype}/{nullpat}")


@pytest.mark.parametrize("nullpat", _NULL_PATTERNS)
@pytest.mark.parametrize("dtype", sorted(_KEYS))
def test_join_anti_null_as_true(spark, duck, dtype, nullpat):
    """NOT IN with nullable subquery column = hyrise AntiNullAsTrue (types.hpp:210).

    With a NULL on the right, NOT IN yields no rows; Spark's null-aware anti
    join and DuckDB must agree exactly (SURVEY §7 hard-part 1).
    """
    _setup(spark, duck, dtype, nullpat)
    sql = "SELECT lk, lv FROM jm_l WHERE lk NOT IN (SELECT rk FROM jm_r)"
    sdf = spark.sql(sql)
    _compare(sdf, duck, sql, f"anti_nat/{dtype}/{nullpat}")


@pytest.mark.parametrize("op", ["<", "<=", ">", ">=", "<>"])
@pytest.mark.parametrize("dtype", ["int", "string"])
def test_join_theta(spark, duck, op, dtype):
    """Theta joins (JoinSortMerge ops, join_sort_merge.cpp:43-47) — inner mode."""
    _setup(spark, duck, dtype, "left")
    sql = f"SELECT lk, lv, rk, rv FROM jm_l JOIN jm_r ON lk {op} rk"
    sdf = spark.sql(sql)
    _compare(sdf, duck, sql, f"theta{op}/{dtype}")


@pytest.mark.parametrize("nullpat", _NULL_PATTERNS)
def test_join_multi_predicate(spark, duck, nullpat):
    """Primary equi + secondary predicate (multi_predicate_join_evaluator.cpp)."""
    _setup(spark, duck, "int", nullpat)
    left, right = spark.table("jm_l"), spark.table("jm_r")
    sdf = left.join(right, (F.col("lk") == F.col("rk")) & (F.col("lv") < F.col("rv")))
    _compare(sdf, duck,
             "SELECT lk, lv, rk, rv FROM jm_l JOIN jm_r ON lk = rk AND lv < rv",
             f"multipred/{nullpat}")


@pytest.mark.parametrize("how", ["left", "full"])
def test_join_outer_with_secondary_predicate(spark, duck, how):
    """Outer joins keep unmatched rows when the secondary predicate fails."""
    _setup(spark, duck, "int", "both")
    kw = {"left": "LEFT", "full": "FULL"}[how]
    sdf = spark.table("jm_l").join(
        spark.table("jm_r"),
        (F.col("lk") == F.col("rk")) & (F.col("lv") < F.col("rv")),
        how,
    )
    _compare(sdf, duck,
             f"SELECT lk, lv, rk, rv FROM jm_l {kw} JOIN jm_r ON lk = rk AND lv < rv",
             f"outer-multipred/{how}")
