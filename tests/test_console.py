"""Console (src/bin/console/console.cpp analog) — command loop tests."""

from __future__ import annotations

from hyrise_spark.console import Console
from tests.conftest import SF_DIR


def _console(spark):
    return Console(spark, sf_dir=SF_DIR)


def test_sql_roundtrip(spark):
    con = _console(spark)
    out = con.handle("SELECT 1 AS one, 'x' AS s")
    assert out.splitlines()[0] == "one | s"
    assert out.splitlines()[1] == "1 | x"


def test_generate_and_print(spark):
    con = _console(spark)
    assert "10 tables" in con.handle(f"generate_tpch {SF_DIR}")
    out = con.handle("print region")
    assert "r_name" in out.splitlines()[0]
    assert "ASIA" in out
    con.handle("reset")
    assert con.handle("tables") == "(no tables)"


def test_visualize_last_query(spark):
    con = _console(spark)
    con.handle("SELECT 2 + 2 AS four")
    out = con.handle("visualize")
    assert "Physical Plan" in out or "Project" in out


def test_setting_get_set(spark):
    con = _console(spark)
    assert "= 64" in con.handle("setting hyrise_spark.console_test 64")
    assert "= 64" in con.handle("setting hyrise_spark.console_test")


def test_script_and_row_cap(spark, tmp_path):
    con = _console(spark)
    script = tmp_path / "s.sql"
    script.write_text("SELECT 1 AS a; SELECT id FROM RANGE(30) ORDER BY id")
    out = con.handle(f"script {script}")
    assert out.startswith("a\n1")
    assert out.rstrip().endswith("...")  # 20-row print cap


def test_help_lists_commands(spark):
    out = _console(spark).handle("help")
    for cmd in ("load", "export", "script", "visualize", "setting"):
        assert cmd in out
