"""DML-sequence differential harness — the reference corpus's DML families
(sqlite_testrunner_queries.sql lines ~329-367: DELETE/UPDATE/INSERT chains
and BEGIN..COMMIT transactions) run through BOTH this Engine and DuckDB,
final table states compared. Closes the corpus-accounting gap where DML
sequences were only unit-tested: every mutation statement below executes
verbatim on both engines.

The BEGIN..ROLLBACK family (reference lines 506-510) is mirrored verbatim
since round 8: transactions ride the snapshot version ring (engine.py
_begin/_rollback), so both arms of every reference transaction sequence run
on both engines and the final states must agree.

Seed data differs only in the range() table-function dialect; all DML text
is shared verbatim.
"""
from __future__ import annotations

import os

import duckdb
import pytest

from hyrise_spark.engine import Engine
from hyrise_spark.oracle import canon

# idt ~ id_int_int_int_100: deterministic pseudo-random int columns
_SPARK_SEED = """CREATE TABLE idt AS
SELECT CAST(id AS INT) AS id, CAST((id * 37) % 97 AS INT) AS a,
       CAST((id * 53) % 89 AS INT) AS b, CAST((id * 71) % 83 AS INT) AS c
FROM RANGE(100)"""
_DUCK_SEED = """CREATE TABLE idt AS
SELECT CAST(r AS INT) AS id, CAST((r * 37) % 97 AS INT) AS a,
       CAST((r * 53) % 89 AS INT) AS b, CAST((r * 71) % 83 AS INT) AS c
FROM range(100) t(r)"""

# Each case: list of statements executed in order on BOTH engines (verbatim),
# then `SELECT * FROM idt` compared. Mirrors the reference corpus sequences.
_SEQUENCES = {
    "delete_all_then_insert": [
        "DELETE FROM idt",
        "INSERT INTO idt VALUES (1, 2, 3, 4)",
    ],
    "delete_range": ["DELETE FROM idt WHERE id > 75"],
    "delete_or_pred": ["DELETE FROM idt WHERE a > 40 OR b < 20"],
    "delete_chained": [
        "DELETE FROM idt WHERE a > 40",
        "DELETE FROM idt WHERE b < 20",
    ],
    "delete_noop": ["DELETE FROM idt WHERE a > 9000"],
    "delete_with_scalar_subquery": [
        "DELETE FROM idt WHERE a = 5 OR b = 6 OR (a > 2 AND b > 80)"
        " OR (a = (SELECT MIN(a) FROM idt))",
    ],
    # CORRELATED subqueries referencing the target table (round 9: the
    # snapshot view is aliased AS the table name, postgres visibility —
    # every inner read sees the pre-statement state)
    "update_correlated_set": [
        "UPDATE idt SET a = (SELECT CAST(COUNT(*) AS INT) FROM idt i2"
        " WHERE i2.b < idt.b) WHERE id < 20",
    ],
    "delete_correlated_where": [
        "DELETE FROM idt WHERE b < (SELECT AVG(i2.b) FROM idt i2"
        " WHERE i2.c = idt.c)",
    ],
    "update_where": ["UPDATE idt SET a = a + 1 WHERE id > 10"],
    "update_all": ["UPDATE idt SET a = a + 1"],
    "update_expr_where": ["UPDATE idt SET a = b + c + 3 WHERE id > 10 * 5"],
    "update_noop": ["UPDATE idt SET a = b + c + 3 WHERE id > 1000 * 1000"],
    "update_key_collapse": ["UPDATE idt SET id = 0 WHERE id > 20"],
    # simultaneous assignment: every RHS reads the OLD row
    "update_column_rotation": [
        "UPDATE idt SET id = a, a = b, b = c, c = id WHERE id > 20",
    ],
    "update_column_rotation_arith": [
        "UPDATE idt SET id = a - 1, a = b, b = c, c = id + 1 WHERE id > 20",
    ],
    "insert_values": ["INSERT INTO idt VALUES (100, 1, 2, 3)"],
    "insert_column_list": ["INSERT INTO idt (id, a, b, c) VALUES (100, 1, 2, 3)"],
    "insert_column_list_reordered": [
        "INSERT INTO idt (id, c, b, a) VALUES (100, 3, 2, 1)",
    ],
    "insert_partial_columns_null_fill": [
        "INSERT INTO idt (id, a) VALUES (200, 7)",
    ],
    # BY NAME (DuckDB dialect, round 9): the SELECT's output names pick the
    # target columns — order irrelevant, unmentioned columns NULL
    "insert_by_name_reordered": [
        "INSERT INTO idt BY NAME SELECT 3 AS c, 100 AS id, 1 AS a, 2 AS b",
    ],
    "insert_by_name_partial_null_fill": [
        "INSERT INTO idt BY NAME SELECT 7 AS a, 300 AS id",
    ],
    "insert_by_name_from_table": [
        "INSERT INTO idt BY NAME SELECT id + 1000 AS id, c AS a"
        " FROM idt WHERE id < 3",
    ],
    "insert_chain": [
        "INSERT INTO idt VALUES (100, 1, 2, 3)",
        "INSERT INTO idt VALUES (101, 3, 2, 1)",
        "INSERT INTO idt VALUES (102, 42, 77992, 1000000)",
    ],
    # INSERT .. SELECT literal-projection FROM the table (row-multiplying)
    "insert_select_literals": [
        "INSERT INTO idt SELECT 100, 1, 2, 3 FROM idt",
    ],
    "insert_select_literals_column_list": [
        "INSERT INTO idt (b, id, c, a) SELECT 2, 100, 3, 1 FROM idt",
    ],
    "insert_select_filtered": [
        "INSERT INTO idt SELECT id + 1000, a, b, c FROM idt WHERE a < 10",
    ],
    "mixed_sequence": [
        "DELETE FROM idt WHERE id >= 90",
        "UPDATE idt SET b = b * 2 WHERE a < 50",
        "INSERT INTO idt (id, a, b, c) VALUES (300, 1, 2, 3)",
        "DELETE FROM idt WHERE b > 150",
    ],
    # Transaction corpus family (sqlite_testrunner_queries.sql:506-510):
    # real transactions on BOTH engines — both COMMIT and ROLLBACK arms of
    # the INSERT and DELETE twins, statements shared verbatim.
    "transaction_commit": [
        "BEGIN",
        "INSERT INTO idt VALUES (999, 1, 42, 7)",
        "COMMIT",
    ],
    "transaction_insert_rollback": [
        "BEGIN",
        "INSERT INTO idt VALUES (999, 1, 42, 7)",
        "ROLLBACK",
    ],
    "transaction_delete_commit": [
        "BEGIN",
        "DELETE FROM idt WHERE a > 40",
        "COMMIT",
    ],
    "transaction_delete_rollback": [
        "BEGIN",
        "DELETE FROM idt WHERE a > 40",
        "ROLLBACK",
    ],
    "transaction_update_rollback_then_autocommit": [
        "BEGIN",
        "UPDATE idt SET b = b * 2 WHERE a < 50",
        "ROLLBACK",
        "UPDATE idt SET c = c + 1 WHERE id < 10",
    ],
    # -- round 6 widening: subqueries inside DML, aggregates/joins as INSERT
    # sources, NULL writes, multi-row VALUES — each statement shared verbatim.
    "delete_in_subquery_self": [
        # subquery reads the PRE-delete state on both engines
        "DELETE FROM idt WHERE a IN (SELECT b FROM idt WHERE b < 10)",
    ],
    "update_scalar_subquery_rhs": [
        "UPDATE idt SET a = (SELECT MAX(b) FROM idt) WHERE id < 5",
    ],
    "update_subquery_where": [
        "UPDATE idt SET c = 0 WHERE b > (SELECT AVG(a) FROM idt)",
    ],
    "update_case_expr": [
        "UPDATE idt SET a = CASE WHEN b > 50 THEN 1 ELSE 0 END",
    ],
    "update_set_null": ["UPDATE idt SET a = NULL WHERE id < 3"],
    "insert_nulls": ["INSERT INTO idt VALUES (600, NULL, NULL, 9)"],
    "insert_multi_row_values": [
        "INSERT INTO idt VALUES (400, 1, 2, 3), (401, 4, 5, 6), (402, 7, 8, 9)",
    ],
    "insert_select_aggregate": [
        "INSERT INTO idt SELECT 500, CAST(MAX(a) AS INT), CAST(MIN(b) AS INT),"
        " CAST(COUNT(*) AS INT) FROM idt",
    ],
    "insert_select_order_limit": [
        # unique sort key -> deterministic subset on both engines
        "INSERT INTO idt SELECT id + 2000, a, b, c FROM idt ORDER BY id LIMIT 5",
    ],
    "insert_select_join_cross_table": [
        "CREATE TABLE idt2 AS SELECT * FROM idt WHERE id < 30",
        "INSERT INTO idt SELECT i.id + 5000, j.a, i.b, j.c"
        " FROM idt i JOIN idt2 j ON i.id = j.id WHERE j.a < 20",
        "DROP TABLE idt2",
    ],
    "delete_after_null_write": [
        "UPDATE idt SET a = NULL WHERE id < 10",
        # NULL never matches a comparison: 3VL must keep the NULL rows
        "DELETE FROM idt WHERE a > 40",
    ],
}


@pytest.fixture()
def engines(spark):
    eng = Engine(spark)
    duck = duckdb.connect()
    eng.execute(_SPARK_SEED)
    duck.execute(_DUCK_SEED)
    yield eng, duck
    eng.execute("DROP TABLE idt")
    duck.close()


def _compare_select(eng, duck, select_sql: str, name: str) -> None:
    sdf = eng.execute(select_sql)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(select_sql)
    ocols = [d[0].lower() for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)}"
    assert canon(scols, srows) == canon(ocols, orows), name


@pytest.mark.parametrize("name", sorted(_SEQUENCES))
def test_dml_sequence_matches_duckdb(engines, name):
    eng, duck = engines
    for stmt in _SEQUENCES[name]:
        eng.execute(stmt)
        duck.execute(stmt)
    _compare_select(eng, duck, "SELECT * FROM idt", name)


# The reference transaction corpus lines VERBATIM (sqlite_testrunner_queries
# .sql:506-510, `mixed`/`id_int_int_int_100` renamed to the shared seed
# table): the mid-transaction SELECT must show the uncommitted write on both
# engines (read-your-own-writes), the post-ROLLBACK/COMMIT SELECT the final
# state. Compared after EVERY SELECT, not just at the end.
_TXN_CORPUS_LINES = [
    "BEGIN; INSERT INTO idt VALUES (999, 1, 42, 7); SELECT * FROM idt; ROLLBACK; SELECT * FROM idt;",
    "BEGIN; INSERT INTO idt VALUES (999, 1, 42, 7); SELECT * FROM idt; COMMIT; SELECT * FROM idt;",
    "BEGIN; DELETE FROM idt WHERE a > 90; SELECT * FROM idt; ROLLBACK; SELECT * FROM idt;",
    "BEGIN; DELETE FROM idt WHERE a > 90; SELECT * FROM idt; COMMIT; SELECT * FROM idt;",
]


@pytest.mark.parametrize("line", _TXN_CORPUS_LINES)
def test_transaction_corpus_line_matches_duckdb(engines, line):
    eng, duck = engines
    for stmt in [s.strip() for s in line.split(";") if s.strip()]:
        if stmt.upper().startswith("SELECT"):
            _compare_select(eng, duck, stmt, line)
        else:
            eng.execute(stmt)
            duck.execute(stmt)


# -- VIEW / CREATE TABLE DDL sequences (corpus lines ~369-380) ---------------
# Each: (statements, final SELECT). Statements run verbatim on both engines.
_DDL_SEQUENCES = {
    "view_count_distinct": (
        ["CREATE VIEW cv1 AS SELECT a, CAST(COUNT(DISTINCT b) AS BIGINT) AS cd FROM idt GROUP BY a"],
        "SELECT * FROM cv1",
    ),
    "view_filtered_select": (
        ["CREATE VIEW cv2 AS SELECT a, CAST(COUNT(DISTINCT b) AS BIGINT) AS cd FROM idt GROUP BY a"],
        "SELECT * FROM cv2 WHERE a > 10",
    ),
    "view_explicit_column_list": (
        ["CREATE VIEW cv3 (foo, bar) AS SELECT a, CAST(COUNT(DISTINCT b) AS BIGINT) AS cd FROM idt GROUP BY a"],
        "SELECT * FROM cv3 WHERE foo > 10",
    ),
    "view_duplicate_aliases": (
        ["CREATE VIEW av AS SELECT a AS a1, a AS a2 FROM idt WHERE a > 10"],
        "SELECT a1, a2 FROM av",
    ),
    "view_sees_later_dml": (
        [
            "CREATE VIEW lv AS SELECT CAST(COUNT(*) AS BIGINT) AS n FROM idt",
            "DELETE FROM idt WHERE id >= 50",
        ],
        "SELECT * FROM lv",
    ),
    "create_table_schema_and_if_not_exists": (
        [
            "DROP TABLE IF EXISTS ddl_t",
            "CREATE TABLE ddl_t (a INT)",
            "INSERT INTO ddl_t (a) VALUES (1)",
            "CREATE TABLE IF NOT EXISTS ddl_t (b INT)",
        ],
        "SELECT * FROM ddl_t",
    ),
    "ctas_from_query": (
        [
            "DROP TABLE IF EXISTS ddl_s",
            "CREATE TABLE ddl_s AS SELECT id, a FROM idt WHERE a > 50",
        ],
        "SELECT * FROM ddl_s",
    ),
    # -- round 7: ALTER TABLE / TRUNCATE (beyond the reference's dialect;
    # statements shared VERBATIM with DuckDB)
    "alter_add_column_default": (
        ["ALTER TABLE idt ADD COLUMN extra BIGINT DEFAULT 7"],
        "SELECT id, a, extra FROM idt",
    ),
    "alter_add_column_null_then_update": (
        [
            "ALTER TABLE idt ADD COLUMN flag INT",
            "UPDATE idt SET flag = 1 WHERE a > 50",
        ],
        "SELECT id, flag FROM idt",
    ),
    "alter_rename_column": (
        ["ALTER TABLE idt RENAME COLUMN a TO alpha"],
        "SELECT id, alpha FROM idt WHERE alpha > 50",
    ),
    "alter_drop_column": (
        ["ALTER TABLE idt DROP COLUMN c"],
        "SELECT * FROM idt",
    ),
    "alter_rename_table": (
        [
            "DROP TABLE IF EXISTS idt_renamed",
            "ALTER TABLE idt RENAME TO idt_renamed",
            "CREATE TABLE idt AS SELECT * FROM idt_renamed",  # restore for teardown
        ],
        "SELECT * FROM idt_renamed",
    ),
    "truncate_then_insert": (
        [
            "TRUNCATE idt",
            "INSERT INTO idt VALUES (1, 2, 3, 4)",
        ],
        "SELECT * FROM idt",
    ),
    "alter_chain_mixed_with_dml": (
        [
            "ALTER TABLE idt ADD COLUMN s BIGINT DEFAULT 0",
            "UPDATE idt SET s = a + b",
            "ALTER TABLE idt DROP COLUMN b",
            "DELETE FROM idt WHERE s > 120",
        ],
        "SELECT * FROM idt",
    ),
}


@pytest.mark.parametrize("name", sorted(_DDL_SEQUENCES))
def test_ddl_sequence_matches_duckdb(engines, name):
    eng, duck = engines
    stmts, final = _DDL_SEQUENCES[name]
    for stmt in stmts:
        eng.execute(stmt)
        duck.execute(stmt)
    try:
        _compare_select(eng, duck, final, name)
    finally:  # drop created objects so cases stay independent
        for obj, kind in (("cv1", "VIEW"), ("cv2", "VIEW"), ("cv3", "VIEW"),
                          ("av", "VIEW"), ("lv", "VIEW"),
                          ("ddl_t", "TABLE"), ("ddl_s", "TABLE"),
                          ("idt_renamed", "TABLE")):
            for ex in (eng.execute, duck.execute):
                try:
                    ex(f"DROP {kind} IF EXISTS {obj}")
                except Exception:
                    pass


def test_view_over_view_refreshes_transitively(engines):
    """A view over a view over a table: DML on the base table must refresh
    BOTH (dependency via name mention, in creation order)."""
    eng, duck = engines
    stmts = [
        "CREATE VIEW vv_a AS SELECT a, CAST(COUNT(*) AS BIGINT) AS n FROM idt GROUP BY a",
        "CREATE VIEW vv_b AS SELECT CAST(SUM(n) AS BIGINT) AS total FROM vv_a",
        "DELETE FROM idt WHERE id >= 50",
    ]
    try:
        for s in stmts:
            eng.execute(s)
            duck.execute(s)
        _compare_select(eng, duck, "SELECT * FROM vv_b", "view_over_view")
    finally:
        for ex in (eng.execute, duck.execute):
            for v in ("vv_b", "vv_a"):
                try:
                    ex(f"DROP VIEW IF EXISTS {v}")
                except Exception:
                    pass


# -- round-6: property-based DML sequences (the fixed families above, with
# hypothesis drawing predicates, values, and statement order) ---------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# deep-fuzz knob: HS_FUZZ_EXAMPLES multiplies every fuzz family (default 1x;
# a long-running bug hunt sets e.g. 10)
_FUZZ_X = int(os.environ.get("HS_FUZZ_EXAMPLES", "1"))


@st.composite
def _dml_statement(draw) -> str:
    kind = draw(st.integers(0, 7))
    col = draw(st.sampled_from(["a", "b", "c"]))
    v = draw(st.integers(0, 100))
    if kind == 0:
        op = draw(st.sampled_from(["<", "<=", ">", ">=", "="]))
        return f"DELETE FROM idt WHERE {col} {op} {v}"
    if kind == 1:
        rhs = draw(st.sampled_from([f"{col} + {v}", f"b + c + {v}", str(v), "NULL"]))
        op = draw(st.sampled_from(["<", ">", "="]))
        wc = draw(st.sampled_from(["a", "b", "id"]))
        return f"UPDATE idt SET {col} = {rhs} WHERE {wc} {op} {v}"
    if kind == 2:
        # column-list form: stays valid after a fuzzed ADD COLUMN widened
        # the table (missing columns NULL-fill on both engines)
        vals = [draw(st.integers(100, 999)) for _ in range(4)]
        return (f"INSERT INTO idt (id, a, b, c) VALUES "
                f"({vals[0]}, {vals[1]}, {vals[2]}, {vals[3]})")
    if kind == 3:
        return (f"INSERT INTO idt (id, a, b, c) "
                f"SELECT id + 1000, a, b, c FROM idt WHERE a < {v % 30}")
    if kind == 4:
        # simultaneous-assignment rotation with a random guard
        return f"UPDATE idt SET a = b, b = c, c = a WHERE id % 7 = {v % 7}"
    if kind == 5:
        return f"DELETE FROM idt WHERE {col} IN (SELECT b FROM idt WHERE b < {v % 20})"
    if kind == 6:
        # schema evolution mid-sequence: new NULL-filled column (no DEFAULT
        # — DuckDB backfills DEFAULTs on column-list inserts, this engine
        # NULL-fills; NULL columns agree). IF NOT EXISTS tolerates re-adds.
        return f"ALTER TABLE idt ADD COLUMN IF NOT EXISTS x{v % 3} BIGINT"
    return "TRUNCATE idt"


@settings(max_examples=20 * _FUZZ_X, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(stmts=st.lists(_dml_statement(), min_size=2, max_size=5))
@pytest.mark.slow  # hypothesis fuzz; full run only
def test_fuzz_dml_sequences(engines, stmts):
    """Random 2-5 statement DML sequences run verbatim on both engines; the
    final table state must match (each example rebuilds the seed table, so
    examples are independent)."""
    eng, duck = engines
    # reset both engines to the seed state for this example (the fixture is
    # function-scoped but hypothesis reuses it across examples)
    eng.execute("DROP TABLE idt")
    duck.execute("DROP TABLE idt")
    eng.execute(_SPARK_SEED)
    duck.execute(_DUCK_SEED)
    for s in stmts:
        eng.execute(s)
        duck.execute(s)
    _compare_select(eng, duck, "SELECT * FROM idt", "; ".join(stmts))


@st.composite
def _txn_wrapped_sequence(draw) -> list[str]:
    """A fuzzed DML sequence with a random contiguous slice wrapped in
    BEGIN..COMMIT or BEGIN..ROLLBACK — both engines run real transactions,
    so the rolled-back arm must leave identical (pre-slice) state and the
    committed arm identical post-slice state."""
    stmts = draw(st.lists(_dml_statement(), min_size=2, max_size=5))
    i = draw(st.integers(0, len(stmts) - 1))
    j = draw(st.integers(min_value=i + 1, max_value=len(stmts)))
    end = draw(st.sampled_from(["COMMIT", "ROLLBACK"]))
    return stmts[:i] + ["BEGIN"] + stmts[i:j] + [end] + stmts[j:]


@settings(max_examples=15 * _FUZZ_X, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(stmts=_txn_wrapped_sequence())
@pytest.mark.slow  # hypothesis fuzz; full run only
def test_fuzz_transactional_sequences(engines, stmts):
    """Transaction-wrapped fuzz (round 8): DML + DDL inside BEGIN..
    COMMIT/ROLLBACK runs verbatim on both engines; final state must match
    — including rolled-back ALTER/TRUNCATE (both engines treat DDL
    transactionally)."""
    eng, duck = engines
    eng.execute("DROP TABLE idt")
    duck.execute("DROP TABLE idt")
    eng.execute(_SPARK_SEED)
    duck.execute(_DUCK_SEED)
    for s in stmts:
        eng.execute(s)
        duck.execute(s)
    _compare_select(eng, duck, "SELECT * FROM idt", "; ".join(stmts))


# -- RETURNING (postgres/DuckDB dialect; round 8): the clause's result AND
# the post-statement table state must both match DuckDB ------------------
_RETURNING_CASES = [
    "INSERT INTO idt VALUES (500, 1, 2, 3), (501, 4, 5, 6) RETURNING id, a + b AS s",
    "INSERT INTO idt (id, a) VALUES (600, 7) RETURNING *",
    "UPDATE idt SET a = a + 10 WHERE id < 5 RETURNING id, a",
    "UPDATE idt SET a = b + c WHERE id % 10 = 3 RETURNING id, a, b, c",
    "DELETE FROM idt WHERE id >= 95 RETURNING *",
    "DELETE FROM idt WHERE a > 9000 RETURNING id",  # no matches: empty result
]


@pytest.mark.parametrize("sql", _RETURNING_CASES)
def test_returning_matches_duckdb(engines, sql):
    eng, duck = engines
    sdf = eng.execute(sql)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(sql)
    ocols = [d[0].lower() for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), f"{sql}: {scols} vs {ocols}"
    assert canon(scols, srows) == canon(ocols, orows), sql
    _compare_select(eng, duck, "SELECT * FROM idt", sql)


# -- savepoint model fuzz (round 8): DuckDB has no SAVEPOINT, so the oracle
# here is a pure-Python state model — a stack of pinned table snapshots the
# statements mutate deterministically -----------------------------------
@st.composite
def _savepoint_program(draw) -> list[str]:
    """2-8 statements mixing simple deterministic DML with transaction
    control; BEGIN always first, savepoint names drawn from a small pool so
    shadowing and missing-name errors both occur."""
    body = draw(st.lists(st.sampled_from([
        "INSERT INTO spf VALUES (777)",
        "DELETE FROM spf WHERE x % 3 = 0",
        "UPDATE spf SET x = x + 100 WHERE x < 50",
        "SAVEPOINT a", "SAVEPOINT b",
        "ROLLBACK TO a", "ROLLBACK TO b",
        "RELEASE a",
    ]), min_size=2, max_size=8))
    end = draw(st.sampled_from(["COMMIT", "ROLLBACK"]))
    return ["BEGIN"] + body + [end]


def _model_apply(stmt: str, rows: list[int], stack: list, begun: list) -> list[int]:
    """The reference model: rows is the table, stack holds (name, snapshot)
    savepoints, begun[0] the BEGIN snapshot. Mirrors postgres semantics."""
    if stmt == "BEGIN":
        begun[0] = list(rows)
        stack.clear()
        return rows
    if stmt == "COMMIT":
        begun[0] = None
        stack.clear()
        return rows
    if stmt == "ROLLBACK":
        rows = list(begun[0])
        begun[0] = None
        stack.clear()
        return rows
    if stmt.startswith("SAVEPOINT"):
        stack.append((stmt.split()[1], list(rows)))
        return rows
    if stmt.startswith("ROLLBACK TO"):
        name = stmt.split()[-1]
        for i in range(len(stack) - 1, -1, -1):
            if stack[i][0] == name:
                del stack[i + 1:]
                return list(stack[i][1])
        raise KeyError(name)
    if stmt.startswith("RELEASE"):
        name = stmt.split()[-1]
        for i in range(len(stack) - 1, -1, -1):
            if stack[i][0] == name:
                del stack[i:]
                return rows
        raise KeyError(name)
    if stmt.startswith("INSERT"):
        return rows + [777]
    if stmt.startswith("DELETE"):
        return [x for x in rows if x % 3 != 0]
    if stmt.startswith("UPDATE"):
        return [x + 100 if x < 50 else x for x in rows]
    raise AssertionError(stmt)


@settings(max_examples=15 * _FUZZ_X, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(stmts=_savepoint_program())
@pytest.mark.slow  # hypothesis fuzz; full run only
def test_fuzz_savepoints_match_model(spark, stmts):
    """Engine savepoint semantics == the Python snapshot-stack model on
    every generated program, including missing-savepoint errors (both
    sides must fail on the same statement)."""
    eng = Engine(spark)
    eng.execute("DROP TABLE IF EXISTS spf")
    eng.execute("CREATE TABLE spf AS SELECT CAST(id AS INT) AS x FROM RANGE(20)")
    rows = list(range(20))
    stack: list = []
    begun: list = [None]
    try:
        for s in stmts:
            model_err = engine_err = None
            try:
                rows = _model_apply(s, rows, stack, begun)
            except KeyError as e:
                model_err = str(e)
            try:
                eng.execute(s)
            except Exception as e:
                engine_err = str(e)
            assert (model_err is None) == (engine_err is None), (s, engine_err)
            got = sorted(r.x for r in eng.execute("SELECT * FROM spf").collect())
            assert got == sorted(rows), (s, stmts)
    finally:
        if eng._txn is not None:
            eng.execute("ROLLBACK")
        eng.execute("DROP TABLE spf")


def test_on_conflict_upsert_matches_duckdb(spark):
    """INSERT ... ON CONFLICT (postgres/DuckDB upsert dialect; rewritten
    onto MERGE): DO UPDATE with excluded./target-qualified refs, DO NOTHING,
    partial column lists — statements shared verbatim (DuckDB needs the PK
    for its conflict detection; the engine takes the key from the clause)."""
    eng = Engine(spark)
    duck = duckdb.connect()
    eng.execute("CREATE TABLE uct (id INT, v INT, w INT)")
    duck.execute("CREATE TABLE uct (id INT PRIMARY KEY, v INT, w INT)")
    try:
        for s in [
            "INSERT INTO uct VALUES (1, 10, 0), (2, 20, 0)",
            "INSERT INTO uct VALUES (1, 99, 1), (3, 30, 1)"
            " ON CONFLICT (id) DO UPDATE SET v = excluded.v, w = excluded.w",
            "INSERT INTO uct VALUES (2, 5, 9), (4, 40, 2) ON CONFLICT (id) DO NOTHING",
            "INSERT INTO uct VALUES (3, 7, 0)"
            " ON CONFLICT (id) DO UPDATE SET v = uct.v + excluded.v",
            "INSERT INTO uct (id, v) VALUES (5, 50), (1, 11)"
            " ON CONFLICT (id) DO UPDATE SET v = excluded.v",
        ]:
            eng.execute(s)
            duck.execute(s)
            _compare_select(eng, duck, "SELECT * FROM uct", s)
    finally:
        eng.execute("DROP TABLE uct")
        duck.close()


def test_update_from_and_delete_using_match_duckdb(spark):
    """UPDATE ... FROM and DELETE ... USING (postgres/DuckDB join-DML):
    rewritten onto MERGE WHEN MATCHED; single-match data keeps the two
    engines' semantics identical (this engine's ANSI cardinality check is
    STRICTER than postgres's arbitrary pick on multi-match — documented)."""
    eng = Engine(spark)
    duck = duckdb.connect()
    for ex in (eng.execute, duck.execute):
        ex("CREATE TABLE jdml_t (id INT, v INT)")
        ex("CREATE TABLE jdml_s (id INT, nv INT)")
        ex("INSERT INTO jdml_t VALUES (1, 10), (2, 20), (3, 30), (4, 40)")
        ex("INSERT INTO jdml_s VALUES (1, 100), (3, 300), (9, 900)")
    try:
        for s in [
            "UPDATE jdml_t SET v = jdml_s.nv FROM jdml_s WHERE jdml_t.id = jdml_s.id",
            "UPDATE jdml_t SET v = jdml_t.v + jdml_s.nv FROM jdml_s"
            " WHERE jdml_t.id = jdml_s.id AND jdml_s.nv < 200",
            "DELETE FROM jdml_t USING jdml_s WHERE jdml_t.id = jdml_s.id"
            " AND jdml_s.nv > 200",
        ]:
            eng.execute(s)
            duck.execute(s)
            _compare_select(eng, duck, "SELECT * FROM jdml_t", s)
    finally:
        for t in ("jdml_t", "jdml_s"):
            eng.execute(f"DROP TABLE {t}")
        duck.close()


def test_create_or_replace_view_matches_duckdb(engines):
    """CREATE OR REPLACE VIEW redefines in place (postgres/DuckDB); plain
    CREATE VIEW on an existing name still errors on both engines."""
    eng, duck = engines
    stmts = [
        "CREATE VIEW corv AS SELECT CAST(COUNT(*) AS BIGINT) AS n FROM idt",
        "CREATE OR REPLACE VIEW corv AS SELECT CAST(MAX(id) AS BIGINT) AS n FROM idt",
    ]
    try:
        for s in stmts:
            eng.execute(s)
            duck.execute(s)
        _compare_select(eng, duck, "SELECT * FROM corv", "create_or_replace_view")
        for ex in (eng.execute, duck.execute):
            try:
                ex("CREATE VIEW corv AS SELECT 1 AS n")
                raise AssertionError("duplicate CREATE VIEW must error")
            except AssertionError:
                raise
            except Exception:
                pass  # both engines reject the duplicate
    finally:
        for ex in (eng.execute, duck.execute):
            try:
                ex("DROP VIEW IF EXISTS corv")
            except Exception:
                pass


def test_create_or_replace_table_matches_duckdb(engines):
    """CREATE OR REPLACE TABLE (DuckDB dialect): the defining query reads
    the PRE-replace state (self-referencing replace works on both)."""
    eng, duck = engines
    stmts = [
        "CREATE OR REPLACE TABLE cort AS SELECT id, a FROM idt WHERE id < 10",
        # self-reference: new state derived from the old
        "CREATE OR REPLACE TABLE cort AS SELECT id + 100 AS id, a FROM cort WHERE a > 20",
    ]
    try:
        for s in stmts:
            eng.execute(s)
            duck.execute(s)
        _compare_select(eng, duck, "SELECT * FROM cort", "create_or_replace_table")
    finally:
        for ex in (eng.execute, duck.execute):
            try:
                ex("DROP TABLE IF EXISTS cort")
            except Exception:
                pass
