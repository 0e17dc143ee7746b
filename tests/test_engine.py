"""Engine statement-router tests: multi-statement SQL, IMPORT/EXPORT,
CREATE/DROP VIEW, prepared statements, meta tables
(reference SQLPipeline / maintenance operators / prepared_plan)."""

from __future__ import annotations

import pytest

from hyrise_spark.engine import Engine


@pytest.fixture()
def engine(spark):
    return Engine(spark)


def test_sql_passthrough(engine):
    df = engine.execute("SELECT 1 AS x")
    assert df.collect()[0]["x"] == 1


def test_multi_statement(engine):
    df = engine.execute("SELECT 1 AS x; SELECT 2 AS y")
    assert df.collect()[0]["y"] == 2


def test_import_export_tbl(engine, spark, tmp_path):
    p = tmp_path / "t.tbl"
    p.write_text("a|b\nint|string\n1|x\n2|y\n")
    df = engine.execute(f"IMPORT FROM '{p}' INTO t1")
    assert df.count() == 2
    assert engine.execute("SELECT COUNT(*) AS n FROM t1").collect()[0]["n"] == 2
    out = tmp_path / "out.tbl"
    engine.execute(f"EXPORT t1 TO '{out}'")
    assert out.read_text().splitlines()[0] == "a|b"


def test_create_drop_view(engine, spark):
    spark.range(10).createOrReplaceTempView("base_t")
    engine.execute("CREATE VIEW v10 AS SELECT id * 2 AS dbl FROM base_t")
    assert engine.catalog.has_view("v10")
    assert engine.execute("SELECT MAX(dbl) AS m FROM v10").collect()[0]["m"] == 18
    engine.execute("DROP VIEW v10")
    assert not engine.catalog.has_view("v10")


def test_duplicate_view_rejected(engine, spark):
    spark.range(3).createOrReplaceTempView("base_t2")
    engine.execute("CREATE VIEW vdup AS SELECT id FROM base_t2")
    with pytest.raises(ValueError):
        engine.execute("CREATE VIEW vdup AS SELECT id FROM base_t2")
    engine.execute("DROP VIEW vdup")


def test_prepared_statements(engine, spark):
    spark.range(100).createOrReplaceTempView("nums")
    engine.prepare("p1", "SELECT COUNT(*) AS n FROM nums WHERE id < :thr")
    assert engine.execute_prepared("p1", {"thr": 10}).collect()[0]["n"] == 10
    assert engine.execute_prepared("p1", {"thr": 50}).collect()[0]["n"] == 50


def test_meta_tables(engine, spark):
    spark.range(7).createOrReplaceTempView("mt_base")
    engine.catalog.replace_table("mt_base", spark.table("mt_base"))
    rows = engine.execute("SELECT * FROM meta_tables WHERE table_name = 'mt_base'").collect()
    assert len(rows) == 1 and rows[0]["column_count"] == 1
    cols = engine.execute(
        "SELECT column_name, data_type FROM meta_columns WHERE table_name = 'mt_base'"
    ).collect()
    assert [(r["column_name"], r["data_type"]) for r in cols] == [("id", "bigint")]
    settings = engine.execute("SELECT * FROM meta_settings").collect()
    assert any(r["name"] == "spark.sql.adaptive.enabled" and r["value"] == "true" for r in settings)
