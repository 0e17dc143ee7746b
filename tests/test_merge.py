"""MERGE INTO differential tests — the engine's MERGE (SQL:2003 F312,
beyond the reference's dialect; its Update operator is the delete+insert
composite a MERGE lowers to, update.hpp:17-27) vs DuckDB 1.0 running the
semantically equivalent UPDATE ... FROM + INSERT ... SELECT sequence
(DuckDB grows MERGE only in 1.4, so the statement cannot run verbatim —
the equivalence sequence is the oracle)."""
from __future__ import annotations

import duckdb
import pytest

from hyrise_spark.engine import Engine

_SPARK_SEED = [
    """CREATE TABLE mt AS
    SELECT CAST(id AS INT) AS id, CAST((id * 37) % 97 AS INT) AS a,
           CAST((id * 53) % 89 AS INT) AS b
    FROM RANGE(50)""",
    """CREATE TABLE ups AS
    SELECT CAST(id * 2 AS INT) AS id, CAST(id * 7 AS INT) AS delta
    FROM RANGE(40)""",
]
_DUCK_SEED = [
    """CREATE TABLE mt AS
    SELECT CAST(r AS INT) AS id, CAST((r * 37) % 97 AS INT) AS a,
           CAST((r * 53) % 89 AS INT) AS b
    FROM range(50) t(r)""",
    """CREATE TABLE ups AS
    SELECT CAST(r * 2 AS INT) AS id, CAST(r * 7 AS INT) AS delta
    FROM range(40) t(r)""",
]

# (merge statement for the engine, equivalent DuckDB statement sequence)
_CASES = {
    # multiple WHEN MATCHED clauses, first-match-wins (ANSI order)
    "delete_then_update_chain": (
        "MERGE INTO mt t USING ups u ON t.id = u.id "
        "WHEN MATCHED AND u.delta > 100 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET a = u.delta "
        "WHEN NOT MATCHED THEN INSERT (id, a) VALUES (u.id, u.delta)",
        [
            # MERGE's NOT MATCHED tests against the PRE-merge target; a
            # naive DELETE-then-INSERT-NOT-EXISTS would re-insert the rows
            # the same statement just deleted, so snapshot the keys first
            "CREATE TEMP TABLE premt AS SELECT id FROM mt",
            "DELETE FROM mt WHERE EXISTS (SELECT 1 FROM ups u "
            "WHERE mt.id = u.id AND u.delta > 100)",
            "UPDATE mt SET a = u.delta FROM ups u "
            "WHERE mt.id = u.id AND NOT u.delta > 100",
            "INSERT INTO mt SELECT u.id, u.delta, NULL FROM ups u "
            "WHERE NOT EXISTS (SELECT 1 FROM premt WHERE premt.id = u.id)",
            "DROP TABLE premt",
        ],
    ),
    "update_then_delete_chain": (
        "MERGE INTO mt t USING ups u ON t.id = u.id "
        "WHEN MATCHED AND u.delta < 50 THEN UPDATE SET b = 0 "
        "WHEN MATCHED THEN DELETE",
        [
            "UPDATE mt SET b = 0 FROM ups u "
            "WHERE mt.id = u.id AND u.delta < 50",
            "DELETE FROM mt WHERE EXISTS (SELECT 1 FROM ups u "
            "WHERE mt.id = u.id AND NOT u.delta < 50)",
        ],
    ),
    "two_guarded_updates": (
        "MERGE INTO mt t USING ups u ON t.id = u.id "
        "WHEN MATCHED AND u.delta % 2 = 0 THEN UPDATE SET a = 1 "
        "WHEN MATCHED AND u.delta % 3 = 0 THEN UPDATE SET a = 2, b = 5",
        [
            "UPDATE mt SET a = 1 FROM ups u "
            "WHERE mt.id = u.id AND u.delta % 2 = 0",
            "UPDATE mt SET a = 2, b = 5 FROM ups u "
            "WHERE mt.id = u.id AND u.delta % 3 = 0 AND NOT u.delta % 2 = 0",
        ],
    ),
    "upsert": (
        "MERGE INTO mt USING ups u ON mt.id = u.id "
        "WHEN MATCHED THEN UPDATE SET a = mt.a + u.delta "
        "WHEN NOT MATCHED THEN INSERT (id, a) VALUES (u.id, u.delta)",
        [
            "UPDATE mt SET a = mt.a + u.delta FROM ups u WHERE mt.id = u.id",
            "INSERT INTO mt SELECT u.id, u.delta, NULL FROM ups u "
            "WHERE NOT EXISTS (SELECT 1 FROM mt WHERE mt.id = u.id)",
        ],
    ),
    "update_only": (
        "MERGE INTO mt t USING ups u ON t.id = u.id "
        "WHEN MATCHED THEN UPDATE SET b = u.delta * 2",
        ["UPDATE mt SET b = u.delta * 2 FROM ups u WHERE mt.id = u.id"],
    ),
    "matched_guard": (
        "MERGE INTO mt t USING ups u ON t.id = u.id "
        "WHEN MATCHED AND u.delta > 100 THEN UPDATE SET a = 0",
        [
            "UPDATE mt SET a = 0 FROM ups u "
            "WHERE mt.id = u.id AND u.delta > 100"
        ],
    ),
    "delete_when_matched": (
        "MERGE INTO mt t USING ups u ON t.id = u.id "
        "WHEN MATCHED THEN DELETE",
        ["DELETE FROM mt WHERE EXISTS (SELECT 1 FROM ups u WHERE mt.id = u.id)"],
    ),
    "delete_guarded": (
        "MERGE INTO mt t USING ups u ON t.id = u.id "
        "WHEN MATCHED AND u.delta < 70 THEN DELETE",
        [
            "DELETE FROM mt WHERE EXISTS "
            "(SELECT 1 FROM ups u WHERE mt.id = u.id AND u.delta < 70)"
        ],
    ),
    "insert_only": (
        "MERGE INTO mt t USING ups u ON t.id = u.id "
        "WHEN NOT MATCHED THEN INSERT (id, b) VALUES (u.id, u.delta + 1)",
        [
            "INSERT INTO mt SELECT u.id, NULL, u.delta + 1 FROM ups u "
            "WHERE NOT EXISTS (SELECT 1 FROM mt WHERE mt.id = u.id)"
        ],
    ),
    "subquery_source": (
        "MERGE INTO mt t USING (SELECT id, delta FROM ups WHERE delta % 3 = 0) u "
        "ON t.id = u.id "
        "WHEN MATCHED THEN UPDATE SET a = t.a + 1 "
        "WHEN NOT MATCHED THEN INSERT (id, a, b) VALUES (u.id, u.delta, 0)",
        [
            "UPDATE mt SET a = mt.a + 1 FROM "
            "(SELECT id, delta FROM ups WHERE delta % 3 = 0) u WHERE mt.id = u.id",
            "INSERT INTO mt SELECT u.id, u.delta, 0 FROM "
            "(SELECT id, delta FROM ups WHERE delta % 3 = 0) u "
            "WHERE NOT EXISTS (SELECT 1 FROM mt WHERE mt.id = u.id)",
        ],
    ),
}


@pytest.fixture()
def engines(spark):
    eng = Engine(spark)
    duck = duckdb.connect()
    for s in _SPARK_SEED:
        eng.execute(s)
    for s in _DUCK_SEED:
        duck.execute(s)
    yield eng, duck
    eng.execute("DROP TABLE mt")
    eng.execute("DROP TABLE ups")
    duck.close()


def _final_state(eng, duck, name):
    sdf = eng.execute("SELECT * FROM mt")
    srows = sorted(
        tuple(None if v is None else int(v) for v in r) for r in sdf.collect()
    )
    orows = sorted(
        tuple(None if v is None else int(v) for v in r)
        for r in duck.execute("SELECT * FROM mt").fetchall()
    )
    assert srows == orows, f"{name}: {srows[:5]} vs {orows[:5]}"


@pytest.mark.parametrize("name", sorted(_CASES))
def test_merge_matches_duckdb_equivalent(engines, name):
    eng, duck = engines
    merge_sql, duck_seq = _CASES[name]
    eng.execute(merge_sql)
    for s in duck_seq:
        duck.execute(s)
    _final_state(eng, duck, name)


def test_merge_cardinality_violation_raises(engines):
    eng, _ = engines
    eng.execute("CREATE TABLE dupsrc AS SELECT CAST(id % 2 AS INT) AS id, "
                "CAST(id AS INT) AS delta FROM RANGE(4)")
    with pytest.raises(ValueError, match="more than one source row"):
        eng.execute(
            "MERGE INTO mt t USING dupsrc u ON t.id = u.id "
            "WHEN MATCHED THEN UPDATE SET a = u.delta"
        )
    eng.execute("DROP TABLE dupsrc")


def test_merge_reads_pre_merge_snapshot(engines):
    """Every branch reads the PRE-merge target: an inserted row must not be
    visible to the update branch of the same statement."""
    eng, duck = engines
    eng.execute(
        "MERGE INTO mt t USING ups u ON t.id = u.id "
        "WHEN MATCHED THEN UPDATE SET a = (SELECT COUNT(*) FROM mt) "
        "WHEN NOT MATCHED THEN INSERT (id, a) VALUES (u.id, -1)"
    )
    rows = {r.id: r.a for r in eng.execute("SELECT * FROM mt").collect()}
    # pre-merge mt had 50 rows; matched rows got exactly 50, inserts -1
    assert rows[0] == 50 and rows[2] == 50
    assert rows[50] == -1


def test_merge_rejects_unregistered_target(engines):
    eng, _ = engines
    with pytest.raises(ValueError, match="not registered"):
        eng.execute("MERGE INTO nope USING ups u ON nope.id = u.id "
                    "WHEN MATCHED THEN DELETE")


# -- deterministic MERGE fuzzing ------------------------------------------
# Random-but-seeded upsert shapes: the engine's MERGE vs the equivalent
# UPDATE ... FROM + INSERT ... SELECT built from the SAME random parts.

_SET_POOL = [
    "a = mt.a + u.delta",
    "a = u.delta",
    "b = mt.b - u.delta + 1",
    "a = mt.b + u.delta, b = mt.a",  # simultaneous: RHS reads OLD row
]
_GUARD_POOL = [None, "u.delta % 2 = 0", "u.delta > 50", "mt.b < 40"]


def _duck_set(sets: str) -> str:
    return sets  # assignments reference mt./u. explicitly — shared verbatim


# deep-fuzz knob: HS_FUZZ_EXAMPLES multiplies the seed pool (default 1x)
@pytest.mark.parametrize(
    "seed", range(12 * int(__import__("os").environ.get("HS_FUZZ_EXAMPLES", "1")))
)
def test_merge_fuzz_matches_duckdb(engines, seed):
    import random

    rng = random.Random(7000 + seed)
    eng, duck = engines
    sets = rng.choice(_SET_POOL)
    guard = rng.choice(_GUARD_POOL)
    do_insert = rng.random() < 0.7
    cond = "mt.id = u.id"
    g = f" AND {guard}" if guard else ""
    merge = f"MERGE INTO mt USING ups u ON {cond} WHEN MATCHED"
    if guard:
        merge += f" AND {guard}"
    merge += f" THEN UPDATE SET {sets}"
    duck_seq = [f"UPDATE mt SET {_duck_set(sets)} FROM ups u WHERE {cond}{g}"]
    if do_insert:
        merge += " WHEN NOT MATCHED THEN INSERT (id, a) VALUES (u.id, u.delta)"
        duck_seq.append(
            "INSERT INTO mt SELECT u.id, u.delta, NULL FROM ups u "
            "WHERE NOT EXISTS (SELECT 1 FROM mt WHERE mt.id = u.id)"
        )
    eng.execute(merge)
    for s in duck_seq:
        duck.execute(s)
    _final_state(eng, duck, f"fuzz seed={seed}: {merge}")


def test_merge_unguarded_clause_shadowing_raises(engines):
    eng, _ = engines
    with pytest.raises(ValueError, match="unreachable"):
        eng.execute(
            "MERGE INTO mt t USING ups u ON t.id = u.id "
            "WHEN MATCHED THEN UPDATE SET a = 0 "
            "WHEN MATCHED AND u.delta > 5 THEN DELETE"
        )


def test_merge_pair_failing_all_guards_does_not_duplicate(engines):
    """A (target, source) pair where every guard fails must leave the row
    untouched and UNDUPLICATED (the join is on cond AND any-guard)."""
    eng, duck = engines
    n_before = eng.execute("SELECT COUNT(*) AS n FROM mt").collect()[0].n
    eng.execute(
        "MERGE INTO mt t USING ups u ON t.id = u.id "
        "WHEN MATCHED AND u.delta > 100000 THEN UPDATE SET a = 0"
    )
    n_after = eng.execute("SELECT COUNT(*) AS n FROM mt").collect()[0].n
    assert n_after == n_before
    _final_state(eng, duck, "noop-guards")


def test_merge_with_case_when_expressions(engines):
    """A CASE WHEN inside SET / guard / ON must not split MERGE clauses
    (the clause scanner tracks CASE...END nesting)."""
    eng, duck = engines
    eng.execute(
        "MERGE INTO mt t USING ups u ON t.id = u.id "
        "WHEN MATCHED AND CASE WHEN u.delta > 50 THEN TRUE ELSE FALSE END "
        "THEN UPDATE SET a = CASE WHEN u.delta > 100 THEN 1 ELSE 2 END, "
        "b = CASE WHEN t.b > 40 THEN t.b ELSE 0 END "
        "WHEN NOT MATCHED THEN INSERT (id, a) VALUES "
        "(u.id, CASE WHEN u.delta > 200 THEN 9 ELSE 8 END)"
    )
    duck.execute(
        "UPDATE mt SET a = CASE WHEN u.delta > 100 THEN 1 ELSE 2 END, "
        "b = CASE WHEN mt.b > 40 THEN mt.b ELSE 0 END "
        "FROM ups u WHERE mt.id = u.id AND u.delta > 50"
    )
    duck.execute(
        "INSERT INTO mt SELECT u.id, CASE WHEN u.delta > 200 THEN 9 ELSE 8 END, "
        "NULL FROM ups u WHERE NOT EXISTS (SELECT 1 FROM mt WHERE mt.id = u.id)"
    )
    _final_state(eng, duck, "case-when clauses")
