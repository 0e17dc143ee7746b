"""DML emulation tests (Insert/Delete/Update operators, SURVEY.md §2.8) —
single-statement autocommit over re-registered DataFrames."""

from __future__ import annotations

import pytest

from hyrise_spark.engine import Engine


@pytest.fixture()
def engine(spark):
    eng = Engine(spark)
    eng.execute("CREATE TABLE dml_t AS SELECT id AS k, CAST(id * 10 AS BIGINT) AS v FROM RANGE(5)")
    yield eng
    eng.execute("DROP TABLE dml_t")


def _rows(engine):
    return sorted(
        (r["k"], r["v"]) for r in engine.execute("SELECT * FROM dml_t").collect()
    )


def test_create_table_as(engine):
    assert _rows(engine) == [(0, 0), (1, 10), (2, 20), (3, 30), (4, 40)]


def test_insert_values(engine):
    engine.execute("INSERT INTO dml_t VALUES (10, 100), (11, 110)")
    assert (10, 100) in _rows(engine) and len(_rows(engine)) == 7


def test_insert_select(engine):
    engine.execute("INSERT INTO dml_t SELECT k + 100, v FROM dml_t WHERE k < 2")
    rows = _rows(engine)
    assert (100, 0) in rows and (101, 10) in rows and len(rows) == 7


def test_delete_where(engine):
    engine.execute("DELETE FROM dml_t WHERE k >= 3")
    assert _rows(engine) == [(0, 0), (1, 10), (2, 20)]


def test_delete_all(engine):
    engine.execute("DELETE FROM dml_t")
    assert _rows(engine) == []


def test_update_where(engine):
    engine.execute("UPDATE dml_t SET v = v + 1, k = k * 2 WHERE k = 2")
    assert (4, 21) in _rows(engine) and (2, 20) not in _rows(engine)


def test_update_all(engine):
    engine.execute("UPDATE dml_t SET v = 0")
    assert all(v == 0 for _, v in _rows(engine))


def test_delete_null_predicate_keeps_null_rows(engine):
    # SQL 3VL: DELETE removes rows where the condition is TRUE; rows where it
    # evaluates to NULL must survive (ADVICE r1: `~expr` alone drops them).
    engine.execute("INSERT INTO dml_t VALUES (99, NULL)")
    engine.execute("DELETE FROM dml_t WHERE v > 15")
    rows = _rows(engine)
    assert (99, None) in rows  # NULL predicate -> kept
    assert rows == [(0, 0), (1, 10), (99, None)]


def test_multi_statement_dml(engine):
    engine.execute(
        "INSERT INTO dml_t VALUES (20, 200); DELETE FROM dml_t WHERE k < 2; "
        "UPDATE dml_t SET v = -1 WHERE k = 20"
    )
    rows = _rows(engine)
    assert (20, -1) in rows and all(k >= 2 for k, _ in rows)
