"""Import/export surface tests: .tbl round-trip, CSV+meta round-trip,
FileType::Auto dispatch (reference import.hpp/export.hpp/file_type.hpp)."""

from __future__ import annotations

import os

import pytest

from hyrise_spark.sources import read_any, write_any
from hyrise_spark.sources.tbl import parse_tbl_header, read_tbl, write_tbl
from hyrise_spark.sources.csv_meta import read_csv_with_meta, write_csv_with_meta


@pytest.fixture()
def tbl_file(tmp_path):
    # Reference fixture shape: resources/test_data/tbl/int_float.tbl
    p = tmp_path / "int_float.tbl"
    p.write_text(
        "a|b|c\n"
        "int|float_null|string\n"
        "12345|458.7|hello\n"
        "123|null|null\n"
    )
    return str(p)


def test_read_tbl_embedded_header(spark, tbl_file):
    df = read_tbl(spark, tbl_file)
    assert [f.name for f in df.schema.fields] == ["a", "b", "c"]
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["int", "float", "string"]
    rows = sorted(df.collect(), key=lambda r: r["a"])
    assert rows[0]["a"] == 123 and rows[0]["b"] is None and rows[0]["c"] is None
    assert rows[1]["a"] == 12345 and abs(rows[1]["b"] - 458.7) < 1e-3 and rows[1]["c"] == "hello"


def test_tbl_round_trip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "x"), (2, None)], "k int, v string"
    )
    out = str(tmp_path / "out.tbl")
    write_tbl(df, out)
    lines = open(out).read().splitlines()
    assert lines[0] == "k|v"
    # createDataFrame marks every column nullable
    assert lines[1] == "int_null|string_null"
    back = read_tbl(spark, out)
    assert sorted([(r["k"], r["v"]) for r in back.collect()]) == [(1, "x"), (2, None)]


def test_csv_meta_round_trip(spark, tmp_path):
    df = spark.createDataFrame([(1, 2.5, "a"), (2, 3.5, "b")], "i int, d double, s string")
    out = str(tmp_path / "data.csv")
    write_csv_with_meta(df, out)
    assert os.path.exists(out + ".json")
    back = read_csv_with_meta(spark, out)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_read_any_dispatch(spark, tbl_file, tmp_path):
    assert read_any(spark, tbl_file).count() == 2
    pq = str(tmp_path / "t.parquet")
    write_any(spark.range(5), pq)
    assert read_any(spark, pq).count() == 5
    with pytest.raises(ValueError):
        read_any(spark, "/tmp/unknown.xyz")


def test_parse_tbl_header_rejects_bad_type():
    with pytest.raises(ValueError):
        parse_tbl_header("a|b", "int|decimal")


def test_json_roundtrip(spark, tmp_path):
    """Beyond-reference format: line-delimited JSON via read_any/write_any."""
    from hyrise_spark.sources import read_any, write_any

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "s"])
    path = str(tmp_path / "t.jsonl")
    write_any(df, path)
    back = read_any(spark, path)
    assert sorted((r["k"], r["s"]) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_orc_roundtrip(spark, tmp_path):
    """Beyond-reference format: ORC via read_any/write_any."""
    from hyrise_spark.sources import read_any, write_any

    df = spark.createDataFrame([(1, 1.5), (2, 2.5)], ["k", "v"])
    path = str(tmp_path / "t.orc")
    write_any(df, path)
    back = read_any(spark, path)
    assert back.count() == 2 and set(back.columns) == {"k", "v"}
