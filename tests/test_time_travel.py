"""Time travel — `<table> VERSION AS OF <n>` (the queryable analog of the
reference's MVCC visibility, mvcc_data.hpp: begin/end commit-ids let old
transactions read old row versions). Version n = table state after n
committed writes; history is a bounded ring of lazy snapshots."""
from __future__ import annotations

import pytest

from hyrise_spark.catalog import COMPACT_THRESHOLD_DML_DEPTH
from hyrise_spark.engine import Engine


@pytest.fixture()
def eng(spark):
    e = Engine(spark)
    e.execute("CREATE TABLE tt AS SELECT CAST(id AS INT) AS id, "
              "CAST(id * 10 AS INT) AS v FROM RANGE(5)")
    yield e
    e.execute("DROP TABLE tt")


def test_version_as_of_reads_past_states(eng):
    eng.execute("UPDATE tt SET v = v + 1")           # v1
    eng.execute("DELETE FROM tt WHERE id >= 3")      # v2
    eng.execute("INSERT INTO tt VALUES (9, 99)")     # v3
    assert eng.execute(
        "SELECT CAST(SUM(v) AS BIGINT) AS s FROM tt VERSION AS OF 0"
    ).collect()[0].s == 100
    assert eng.execute(
        "SELECT CAST(SUM(v) AS BIGINT) AS s FROM tt VERSION AS OF 1"
    ).collect()[0].s == 105
    assert eng.execute(
        "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tt VERSION AS OF 2"
    ).collect()[0].n == 3
    assert eng.execute(
        "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tt"
    ).collect()[0].n == 4


def test_version_diff_join_audit(eng):
    """The audit query time travel exists for: diff two versions of the
    same table in ONE statement."""
    eng.execute("UPDATE tt SET v = v * 2 WHERE id < 2")
    rows = eng.execute(
        "SELECT old.id, old.v AS v_old, new.v AS v_new "
        "FROM tt VERSION AS OF 0 old "
        "JOIN tt VERSION AS OF 1 AS new ON old.id = new.id "
        "WHERE old.v <> new.v ORDER BY old.id"
    ).collect()
    assert [(r.id, r.v_old, r.v_new) for r in rows] == [(0, 0, 0), (1, 10, 20)][1:]


def test_future_and_evicted_versions_raise(eng):
    with pytest.raises(ValueError, match="no version 5"):
        eng.execute("SELECT * FROM tt VERSION AS OF 5")
    for i in range(12):  # overflow the 8-slot ring
        eng.execute(f"UPDATE tt SET v = v + {i} WHERE id = 0")
    with pytest.raises(ValueError, match="evicted"):
        eng.execute("SELECT * FROM tt VERSION AS OF 0")
    # the newest ring entries still resolve
    assert eng.execute("SELECT COUNT(*) AS n FROM tt VERSION AS OF 12").collect()[0].n == 5


def test_versions_survive_compaction(eng):
    """Compaction flattens the CURRENT version's plan; past versions keep
    reading their pre-compaction snapshots."""
    for i in range(COMPACT_THRESHOLD_DML_DEPTH):
        eng.execute(f"UPDATE tt SET v = v + 1 WHERE id = {i % 5}")
    assert eng.catalog.dml_depth["tt"] == 0  # compacted
    cur = eng.catalog.current_version("tt")
    s_now = eng.execute("SELECT CAST(SUM(v) AS BIGINT) AS s FROM tt").collect()[0].s
    s_ver = eng.execute(
        f"SELECT CAST(SUM(v) AS BIGINT) AS s FROM tt VERSION AS OF {cur}"
    ).collect()[0].s
    assert s_now == s_ver
    s_prev = eng.execute(
        f"SELECT CAST(SUM(v) AS BIGINT) AS s FROM tt VERSION AS OF {cur - 1}"
    ).collect()[0].s
    assert s_prev == s_now - 1


def test_meta_versions_reflects_history(eng):
    eng.execute("UPDATE tt SET v = v + 1")
    rows = {r.table_name: r for r in eng.execute(
        "SELECT * FROM meta_versions").collect()}
    assert rows["tt"].current_version == 1
    assert rows["tt"].oldest_retained == 0
    assert rows["tt"].dml_depth == 1


def test_point_in_time_restore_via_merge(eng):
    """The composition time travel exists for: restore a table to a past
    version with one MERGE against its own snapshot."""
    eng.execute("UPDATE tt SET v = -1")                 # v1: corruption
    eng.execute("DELETE FROM tt WHERE id >= 3")         # v2: more damage
    eng.execute(
        "MERGE INTO tt USING tt VERSION AS OF 0 AS old ON tt.id = old.id "
        "WHEN MATCHED THEN UPDATE SET v = old.v "
        "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (old.id, old.v)"
    )
    rows = sorted((r.id, r.v) for r in eng.execute("SELECT * FROM tt").collect())
    assert rows == [(i, i * 10) for i in range(5)]


def test_version_ref_inside_dml_subquery(eng):
    eng.execute("UPDATE tt SET v = 0 WHERE id < 2")     # v1
    eng.execute(
        "DELETE FROM tt WHERE id IN "
        "(SELECT id FROM tt VERSION AS OF 0 WHERE v >= 30)"
    )
    assert {r.id for r in eng.execute("SELECT * FROM tt").collect()} == {0, 1, 2}


def test_version_phrase_inside_string_literal_is_data(eng):
    """The literal 'VERSION AS OF' inside a string is data, not a table
    reference — the substitution is quote-aware."""
    eng.execute("CREATE TABLE notes (id INT, msg STRING)")
    eng.execute(
        "INSERT INTO notes VALUES (1, 'see tt VERSION AS OF 3 for history')"
    )
    rows = eng.execute("SELECT msg FROM notes").collect()
    assert rows[0].msg == "see tt VERSION AS OF 3 for history"
    eng.execute("DROP TABLE notes")


def test_matview_rename_keeps_refresh_and_drop_working(eng, spark):
    from hyrise_spark.engine import Engine

    e = Engine(spark)
    e.execute("CREATE TABLE mvb (v INT)")
    e.execute("INSERT INTO mvb VALUES (1), (2)")
    e.execute("CREATE MATERIALIZED VIEW mv_tt AS SELECT CAST(SUM(v) AS BIGINT) AS s FROM mvb")
    e.execute("ALTER TABLE mv_tt RENAME TO mv_tt2")
    e.execute("INSERT INTO mvb VALUES (7)")
    assert e.execute("SELECT s FROM mv_tt2").collect()[0].s == 3  # stale snapshot
    e.execute("REFRESH MATERIALIZED VIEW mv_tt2")
    assert e.execute("SELECT s FROM mv_tt2").collect()[0].s == 10
    e.execute("DROP MATERIALIZED VIEW mv_tt2")
    e.execute("DROP TABLE mvb")
