"""MvccDeletePlugin analog: snapshot-DML lineage compaction.

The reference physically rewrites chunks once invalidated rows accumulate
(mvcc_delete_plugin.hpp:21-32); here each DML statement deepens the table's
plan lineage, and crossing COMPACT_THRESHOLD_DML_DEPTH must rewrite the live
rows to parquet and re-register a flat scan — with byte-identical query
results before and after, verified against a DuckDB replay of the same
statements."""
from __future__ import annotations

import duckdb

from hyrise_spark.catalog import COMPACT_THRESHOLD_DML_DEPTH
from hyrise_spark.engine import Engine


def _seed(spark):
    eng = Engine(spark)
    eng.execute(
        "CREATE TABLE ct AS SELECT CAST(id AS INT) AS id, "
        "CAST(id * 3 % 17 AS INT) AS v FROM RANGE(60)"
    )
    duck = duckdb.connect()
    duck.execute(
        "CREATE TABLE ct AS SELECT CAST(r AS INT) AS id, "
        "CAST(r * 3 % 17 AS INT) AS v FROM range(60) t(r)"
    )
    return eng, duck


def test_auto_compaction_triggers_and_preserves_state(spark):
    eng, duck = _seed(spark)
    stmts = []
    for i in range(COMPACT_THRESHOLD_DML_DEPTH + 3):
        stmts.append(f"UPDATE ct SET v = v + 1 WHERE id % 7 = {i % 7}")
        stmts.append(f"DELETE FROM ct WHERE id = {i * 2}")
        stmts.append(f"INSERT INTO ct VALUES ({1000 + i}, {i})")
    for s in stmts:
        eng.execute(s)
        duck.execute(s)
    # the chain crossed the threshold (3 statements per loop) -> compacted
    # at least once, so the current depth is strictly below the threshold
    assert eng.catalog.dml_depth["ct"] < COMPACT_THRESHOLD_DML_DEPTH
    # the base is now the compacted PARQUET scan (the seed CTAS was a
    # LocalRelation — "parquet" in the plan proves the rewrite happened),
    # and only the post-compaction statements' layers sit on top of it
    plan = eng.catalog.get_table("ct")._jdf.queryExecution().optimizedPlan().toString()
    assert "parquet" in plan
    assert plan.count("CASE WHEN") < COMPACT_THRESHOLD_DML_DEPTH
    got = sorted((r.id, r.v) for r in eng.execute("SELECT * FROM ct").collect())
    want = sorted(duck.execute("SELECT * FROM ct").fetchall())
    assert got == want
    eng.execute("DROP TABLE ct")
    duck.close()


def test_manual_compaction_via_meta_exec(spark):
    eng, duck = _seed(spark)
    eng.execute("UPDATE ct SET v = 0 WHERE id < 5")
    assert eng.catalog.dml_depth["ct"] == 1
    eng.execute("INSERT INTO meta_exec VALUES ('mvcc', 'compact_tables')")
    assert eng.catalog.dml_depth["ct"] == 0
    duck.execute("UPDATE ct SET v = 0 WHERE id < 5")
    got = sorted((r.id, r.v) for r in eng.execute("SELECT * FROM ct").collect())
    assert got == sorted(duck.execute("SELECT * FROM ct").fetchall())
    eng.execute("DROP TABLE ct")
    duck.close()


def test_compaction_listed_in_meta_exec(spark):
    eng = Engine(spark)
    rows = eng.execute("SELECT * FROM meta_exec").collect()
    assert ("mvcc", "compact_tables") in {tuple(r) for r in rows}


def test_views_survive_compaction(spark):
    """A SQL view over a compacted table must re-resolve against the
    compacted state (lqp_view re-instantiation parity)."""
    eng, duck = _seed(spark)
    eng.execute("CREATE VIEW ct_sum AS SELECT CAST(SUM(v) AS BIGINT) AS s FROM ct")
    for i in range(COMPACT_THRESHOLD_DML_DEPTH + 1):
        eng.execute(f"UPDATE ct SET v = v + 1 WHERE id = {i}")
        duck.execute(f"UPDATE ct SET v = v + 1 WHERE id = {i}")
    want = duck.execute("SELECT SUM(v) FROM ct").fetchone()[0]
    assert eng.execute("SELECT s FROM ct_sum").collect()[0].s == want
    eng.execute("DROP VIEW ct_sum")
    eng.execute("DROP TABLE ct")
    duck.close()


def test_compaction_trail_bounded_and_purgeable(spark, monkeypatch):
    """Repeated compaction keeps an ACTIVE trail of _HISTORY_CAP files;
    evicted files queue in the trash (NOT eagerly deleted — another plan
    may read them) until the explicit purge admin function removes them."""
    import os

    from hyrise_spark.catalog import Catalog

    monkeypatch.setattr(Catalog, "_HISTORY_CAP", 2)
    eng = Engine(spark)
    eng.execute("CREATE TABLE cb AS SELECT CAST(id AS INT) AS id FROM RANGE(10)")
    # a second table whose plan READS cb's first compaction file: eager
    # deletion would break it (the cross-plan reference hazard)
    for _ in range(4):
        eng.execute("UPDATE cb SET id = id + 1 WHERE id < 0")  # no-op DML
        eng.catalog.compact_table("cb")
        if not eng.catalog.has_table("cb_snap"):
            eng.execute("CREATE TABLE cb_snap AS SELECT * FROM cb")
    trail = eng.catalog.compact_paths["cb"]
    assert len(trail) == 2 and len(eng.catalog._compact_trash) == 2
    # evicted files still on disk -> the dependent table still reads
    assert eng.execute("SELECT COUNT(*) AS n FROM cb_snap").collect()[0].n == 10
    eng.execute("DROP TABLE cb_snap")
    eng.execute("INSERT INTO meta_exec VALUES ('mvcc', 'purge_compaction_trail')")
    assert eng.catalog._compact_trash == []
    base = os.path.dirname(trail[0])
    on_disk = [d for d in os.listdir(base) if d.startswith("cb_v")]
    assert sorted(os.path.join(base, d) for d in on_disk) == sorted(trail)
    assert eng.execute("SELECT COUNT(*) AS n FROM cb").collect()[0].n == 10
    eng.execute("DROP TABLE cb")


def test_rename_preserves_compacted_data_and_history(spark):
    """RENAME TO must re-key (not drop+add) per-table state: the renamed
    table keeps reading its compaction file and its version ring."""
    eng = Engine(spark)
    eng.execute("CREATE TABLE rn AS SELECT CAST(id AS INT) AS id FROM RANGE(7)")
    eng.execute("UPDATE rn SET id = id + 100 WHERE id = 0")
    eng.catalog.compact_table("rn")
    eng.execute("ALTER TABLE rn RENAME TO rn2")
    assert eng.execute("SELECT COUNT(*) AS n FROM rn2").collect()[0].n == 7
    # version ring re-keyed: v0 still readable under the NEW name
    assert eng.execute(
        "SELECT CAST(SUM(id) AS BIGINT) AS s FROM rn2 VERSION AS OF 0"
    ).collect()[0].s == 21
    assert "rn2" in eng.catalog.compact_paths and "rn" not in eng.catalog.compact_paths
    eng.execute("DROP TABLE rn2")


def test_rollback_unqueues_dropped_tables_trail(spark):
    """DROP TABLE inside a transaction queues the table's compaction files
    for purge; ROLLBACK must UN-queue them — otherwise a later
    purge_compaction_trail rmtree's parquet the restored live table still
    reads (silent data loss on a table the user believes was never
    dropped)."""
    eng = Engine(spark)
    eng.execute("CREATE TABLE rb AS SELECT CAST(id AS INT) AS id FROM RANGE(9)")
    eng.execute("UPDATE rb SET id = id + 10 WHERE id = 0")
    eng.catalog.compact_table("rb")
    trail = list(eng.catalog.compact_paths["rb"])
    assert trail
    eng.execute("BEGIN")
    eng.execute("DROP TABLE rb")
    assert set(trail) <= set(eng.catalog._compact_trash)  # queued by the drop
    eng.execute("ROLLBACK")
    # the restored table's files are no longer queued ...
    assert not set(trail) & set(eng.catalog._compact_trash)
    assert eng.catalog.compact_paths["rb"] == trail
    # ... so the physical purge cannot delete them out from under the plan
    eng.catalog.purge_compaction_trail()
    assert eng.execute(
        "SELECT CAST(SUM(id) AS BIGINT) AS s FROM rb"
    ).collect()[0].s == sum(range(1, 9)) + 10
    eng.execute("DROP TABLE rb")


def test_rollback_keeps_pretxn_trash_and_txn_written_files_queued(spark):
    """Trash queued BEFORE the transaction survives the rollback; a
    compaction file WRITTEN during the transaction is unreferenced after
    restore and must be (re-)queued."""
    eng = Engine(spark)
    eng.execute("CREATE TABLE rq AS SELECT CAST(id AS INT) AS id FROM RANGE(5)")
    eng.execute("CREATE TABLE gone AS SELECT 1 AS g")
    eng.catalog.compact_table("gone")
    eng.execute("DROP TABLE gone")  # pre-txn trash entry
    pre_trash = list(eng.catalog._compact_trash)
    assert pre_trash
    eng.execute("BEGIN")
    eng.execute("UPDATE rq SET id = id + 1 WHERE id = 0")
    eng.catalog.compact_table("rq")  # file written DURING the txn
    txn_file = eng.catalog.compact_paths["rq"][-1]
    eng.execute("ROLLBACK")
    assert set(pre_trash) <= set(eng.catalog._compact_trash)
    assert txn_file in eng.catalog._compact_trash  # unreferenced -> queued
    assert "rq" not in eng.catalog.compact_paths or \
        txn_file not in eng.catalog.compact_paths.get("rq", [])
    eng.catalog.purge_compaction_trail()
    assert eng.execute("SELECT COUNT(*) AS n FROM rq").collect()[0].n == 5
    eng.execute("DROP TABLE rq")


def test_create_or_replace_carries_compaction_trail(spark):
    """CREATE OR REPLACE TABLE t AS SELECT ... FROM t: the defining plan
    reads the OLD table's compaction parquet, so the trail must carry over
    to the new entry instead of being queued for purge while the live
    replacement still references it."""
    eng = Engine(spark)
    eng.execute("CREATE TABLE cor AS SELECT CAST(id AS INT) AS id FROM RANGE(6)")
    eng.execute("UPDATE cor SET id = id + 50 WHERE id = 5")
    eng.catalog.compact_table("cor")
    trail = list(eng.catalog.compact_paths["cor"])
    assert trail
    eng.execute("CREATE OR REPLACE TABLE cor AS SELECT id + 1 AS id FROM cor")
    assert eng.catalog.compact_paths.get("cor") == trail  # carried, not trashed
    assert not set(trail) & set(eng.catalog._compact_trash)
    eng.catalog.purge_compaction_trail()
    assert eng.execute(
        "SELECT CAST(SUM(id) AS BIGINT) AS s FROM cor"
    ).collect()[0].s == sum(range(5)) + 55 + 6  # 0..4 kept, 5->55, then +1 x6
    eng.execute("DROP TABLE cor")


def test_compaction_sizing_tracks_growth_not_stale_trail(spark, monkeypatch):
    """Review regression (round 9): output sizing must not trust only the
    PREVIOUS compaction's on-disk size — a table that grew via bulk
    INSERT..SELECT since then would be funneled through one task. The
    Catalyst logical-stats estimate of the current plan catches the growth;
    with a shrunken target-file size the second compaction must emit
    multiple files."""
    import glob

    import hyrise_spark.catalog as cat

    monkeypatch.setattr(cat, "COMPACT_TARGET_FILE_BYTES", 64 * 1024)
    eng = Engine(spark)
    eng.execute("CREATE TABLE gr AS SELECT CAST(id AS INT) AS id FROM RANGE(10)")
    eng.execute("UPDATE gr SET id = id + 1 WHERE id = 0")
    eng.catalog.compact_table("gr")  # tiny: single output file
    first = eng.catalog.compact_paths["gr"][-1]
    assert len(glob.glob(f"{first}/part-*")) == 1
    # bulk growth after the small compaction (plan-side, before next rewrite)
    eng.execute(
        "INSERT INTO gr SELECT CAST(id AS INT) FROM RANGE(200000)"
    )
    eng.catalog.compact_table("gr")
    second = eng.catalog.compact_paths["gr"][-1]
    nfiles = len(glob.glob(f"{second}/part-*"))
    assert nfiles > 1, f"grown table rewrote through {nfiles} file(s)"
    assert eng.execute(
        "SELECT COUNT(*) AS n FROM gr"
    ).collect()[0]["n"] == 200010
    eng.execute("DROP TABLE gr")
