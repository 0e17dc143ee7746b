"""Statement/plan cache (sql_plan_cache.hpp + gdfs_cache.hpp analog).

The reference caches translated plans per statement text with GDFS
eviction; repeated identical statements skip parsing/translation
(sql_pipeline_statement.cpp consults SQLPhysicalPlanCache). Here the
cached value is the eagerly-analyzed DataFrame: a hit returns the same
immutable lazy plan and skips parse + dialect rewrite + Catalyst analysis.
Validity is epoch-based on catalog.mutation_counter — any mutating
statement (or direct catalog API call) moves the epoch, so a stale serve
is impossible by construction.
"""
from __future__ import annotations

import pytest

from hyrise_spark.engine import Engine
from hyrise_spark.plan_cache import GDFSCache


# -- pure GDFS policy (no Spark) ---------------------------------------------

def test_gdfs_hit_miss_counters_and_epoch_invalidation():
    c = GDFSCache(capacity=4)
    assert c.get("q1", epoch=0) is None
    assert c.misses == 1
    c.put("q1", "plan1", epoch=0, cost=10.0)
    assert c.get("q1", epoch=0) == "plan1"
    assert c.hits == 1
    # epoch moved -> entry invalidated, counted, dropped
    assert c.get("q1", epoch=1) is None
    assert c.invalidations == 1 and c.misses == 2
    assert len(c) == 0


def test_gdfs_evicts_minimum_priority_and_inflates():
    """GDFS semantics (gdfs_cache.hpp): priority = L + frequency*cost/size;
    eviction removes the min-priority entry and raises L to it, so a hot or
    expensive entry outlives a cold cheap one even when older."""
    c = GDFSCache(capacity=2)
    c.put("cheap", "a", epoch=0, cost=1.0)
    c.put("costly", "b", epoch=0, cost=100.0)
    # heat up 'cheap' a lot: frequency compensates for low cost
    for _ in range(5):
        assert c.get("cheap", 0) == "a"
    # inserting a third entry evicts the MIN priority one
    pri_cheap = c._entries["cheap"].priority
    pri_costly = c._entries["costly"].priority
    victim = "cheap" if pri_cheap < pri_costly else "costly"
    c.put("new", "c", epoch=0, cost=1.0)
    assert victim not in c._entries
    assert c.evictions == 1
    assert c.inflation == pytest.approx(min(pri_cheap, pri_costly))
    # a brand-new cheap entry starts at L + cost: aging is monotone
    assert c._entries["new"].priority == pytest.approx(c.inflation + 1.0)


def test_gdfs_frequency_beats_recency():
    """A frequently-hit entry survives a newer one-shot entry (the F in
    GDFS) — plain LRU would evict it."""
    c = GDFSCache(capacity=2)
    c.put("hot", "h", epoch=0, cost=10.0)
    for _ in range(10):
        c.get("hot", 0)
    c.put("cold", "c1", epoch=0, cost=10.0)
    c.put("newer", "c2", epoch=0, cost=10.0)  # evicts 'cold', not 'hot'
    assert "hot" in c._entries and "cold" not in c._entries


def test_gdfs_capacity_zero_disables():
    c = GDFSCache(capacity=0)
    c.put("q", "v", epoch=0, cost=1.0)
    assert c.get("q", 0) is None and len(c) == 0


# -- engine integration -------------------------------------------------------

@pytest.fixture()
def engine(spark):
    return Engine(spark)


def test_repeated_statement_hits_cache_same_plan_object(engine):
    engine.execute("CREATE TABLE pc AS SELECT CAST(id AS INT) AS id FROM RANGE(10)")
    q = "SELECT CAST(SUM(id) AS BIGINT) AS s FROM pc WHERE id > 2"
    d1 = engine.execute(q)
    d2 = engine.execute(q)
    assert d2 is d1  # the identical analyzed plan, no re-analysis
    assert engine._plan_cache.hits == 1
    assert d2.collect()[0]["s"] == sum(range(3, 10))
    engine.execute("DROP TABLE pc")


def test_dml_and_ddl_invalidate_cached_statements(engine):
    engine.execute("CREATE TABLE pci AS SELECT CAST(id AS INT) AS id FROM RANGE(5)")
    q = "SELECT CAST(SUM(id) AS BIGINT) AS s FROM pci"
    assert engine.execute(q).collect()[0]["s"] == 10
    engine.execute("INSERT INTO pci VALUES (100)")
    # same text, new epoch: result reflects the write, never the stale plan
    assert engine.execute(q).collect()[0]["s"] == 110
    engine.execute("CREATE OR REPLACE TABLE pci AS SELECT 7 AS id")
    assert engine.execute(q).collect()[0]["s"] == 7
    engine.execute("DROP TABLE pci")


def test_rollback_invalidates_cache(engine):
    engine.execute("CREATE TABLE pcr AS SELECT 1 AS x")
    q = "SELECT x FROM pcr"
    engine.execute("BEGIN")
    engine.execute("UPDATE pcr SET x = 2")
    assert engine.execute(q).collect()[0]["x"] == 2  # owner sees its write
    engine.execute("ROLLBACK")
    # ROLLBACK moved the epoch: the in-transaction plan cannot be served
    assert engine.execute(q).collect()[0]["x"] == 1
    engine.execute("DROP TABLE pcr")


def test_uncacheable_statements_bypass(engine):
    engine.execute("CREATE TABLE pcu AS SELECT CAST(id AS INT) AS id FROM RANGE(4)")
    base = engine._plan_cache.misses
    # nondeterministic: rand() must re-analyze (fresh seed) every time
    d1 = engine.execute("SELECT id, rand() AS r FROM pcu")
    d2 = engine.execute("SELECT id, rand() AS r FROM pcu")
    assert d1 is not d2
    # meta tables are dynamic (meta_log grows without a catalog mutation)
    n1 = engine.execute("SELECT COUNT(*) AS n FROM meta_log").collect()[0]["n"]
    n2 = engine.execute("SELECT COUNT(*) AS n FROM meta_log").collect()[0]["n"]
    assert n2 > n1  # the second run saw the first run's log entry
    assert engine._plan_cache.misses == base  # none of the above was cached
    engine.execute("DROP TABLE pcu")


def test_parameterized_statements_cache_per_bound_values(engine):
    """Prepared-plan cache analog (the reference's SQLPhysicalPlanCache
    serves repeated EXECUTEs): a parameterized statement caches per
    (text, bound values) — same args hit, different args are distinct
    entries with their own results."""
    engine.execute("CREATE TABLE pcp AS SELECT CAST(id AS INT) AS id FROM RANGE(6)")
    q = "SELECT id FROM pcp WHERE id = :v"
    p1 = engine.execute(q, {"v": 1})
    p1b = engine.execute(q, {"v": 1})
    assert p1b is p1  # identical args: the very same analyzed plan
    p2 = engine.execute(q, {"v": 2})
    assert p2 is not p1
    assert p1.collect()[0]["id"] == 1 and p2.collect()[0]["id"] == 2
    # SQL-dialect PREPARE/EXECUTE rides the same cache
    engine.execute("PREPARE pq FROM 'SELECT COUNT(*) AS n FROM pcp WHERE id < ?'")
    a = engine.execute("EXECUTE pq (3)")
    b = engine.execute("EXECUTE pq (3)")
    assert a.collect()[0]["n"] == 3 and b.collect()[0]["n"] == 3
    # DML between executions invalidates by epoch
    engine.execute("INSERT INTO pcp VALUES (0)")
    assert engine.execute("EXECUTE pq (3)").collect()[0]["n"] == 4
    engine.execute("DROP TABLE pcp")


def test_snapshot_reads_bypass_cache(engine):
    """A non-owner connection's snapshot read must not fill (or be served
    from) the cache: its visibility differs from the live catalog."""
    import threading

    engine.execute("CREATE TABLE pcs AS SELECT 1 AS x")
    q = "SELECT x FROM pcs"
    engine.execute(q)  # cached under the live epoch
    engine.execute("BEGIN; UPDATE pcs SET x = 2")
    out = {}

    def reader():
        out["x"] = engine.execute(q).collect()[0]["x"]

    t = threading.Thread(target=reader)
    t.start()
    t.join()
    assert out["x"] == 1  # snapshot visibility, not the cached live plan
    assert engine.execute(q).collect()[0]["x"] == 2  # owner: live state
    engine.execute("ROLLBACK; DROP TABLE pcs")


def test_meta_plan_cache_observability(engine):
    engine.execute("CREATE TABLE pcm AS SELECT 1 AS x")
    q = "SELECT x FROM pcm"
    engine.execute(q)
    engine.execute(q)
    engine.execute(q)
    row = engine.execute("SELECT * FROM meta_plan_cache").collect()[0]
    assert row["hits"] >= 2 and row["misses"] >= 1
    assert row["entries"] >= 1 and row["capacity"] == 1024
    ent = engine.execute(
        "SELECT * FROM meta_plan_cache_entries"
    ).collect()
    mine = [r for r in ent if r["statement"] == q]
    assert mine and mine[0]["frequency"] >= 3 and mine[0]["cost_ms"] > 0
    # admin flush (console 'clear cache' analog)
    engine.execute("INSERT INTO meta_exec VALUES ('plan_cache', 'clear')")
    row = engine.execute("SELECT * FROM meta_plan_cache").collect()[0]
    assert row["entries"] == 0
    engine.execute("DROP TABLE pcm")


def test_cache_hit_skips_analysis_cost(engine):
    """The point of the cache: the second execution of an expensive-to-
    analyze statement costs ~0 analysis time (VERDICT r8 task #4's done
    criterion, measured not assumed)."""
    import time

    engine.execute("CREATE TABLE pct AS SELECT CAST(id AS INT) AS id FROM RANGE(100)")
    # a deliberately wide-expression statement (analysis-heavy, data-light)
    cols = ", ".join(
        f"SUM(CASE WHEN id % {k + 2} = 0 THEN id ELSE -id END) AS c{k}"
        for k in range(120)
    )
    q = f"SELECT {cols} FROM pct"
    t0 = time.perf_counter()
    engine.execute(q)
    miss_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    engine.execute(q)
    hit_s = time.perf_counter() - t0
    assert engine._plan_cache.hits >= 1
    # hits are dict lookups (micro-seconds); 10x headroom over analysis
    assert hit_s < miss_s / 10
    engine.execute("DROP TABLE pct")


def test_dialect_statements_are_cacheable(spark):
    """Round-9 dialect SELECTs (DISTINCT ON etc.) flow through the
    statement cache like plain SELECTs — the rewrite + analysis cost is
    exactly what the cache exists to skip."""
    from hyrise_spark.engine import Engine

    engine = Engine(spark)
    engine.execute("CREATE TABLE pc_d AS SELECT id % 3 AS g, id AS v FROM RANGE(30)")
    try:
        q = "SELECT DISTINCT ON (g) g, v FROM pc_d ORDER BY g, v DESC"
        before = engine._plan_cache.hits
        engine.execute(q).collect()
        engine.execute(q).collect()
        assert engine._plan_cache.hits == before + 1
        # a mutation invalidates: the third execution re-analyzes
        engine.execute("INSERT INTO pc_d VALUES (0, 99)")
        rows = {(r["g"], r["v"]) for r in engine.execute(q).collect()}
        assert (0, 99) in rows
        assert engine._plan_cache.hits == before + 1
    finally:
        engine.execute("DROP TABLE pc_d")
