"""Physical-encoding sweep — the SQLiteTestRunner's per-encoding axis.

The reference executes its SQL corpus once per segment encoding
(sqlite_testrunner.cpp: Unencoded / Dictionary / RunLength / FoR / LZ4)
to prove results are STORAGE-INVARIANT. The Spark analog: rewrite the
tables under different parquet physical layouts (compression codec x
dictionary encoding on/off) and run a representative slice of the SQL
corpus against every layout — results must be identical across layouts
and equal to the default-layout result.

This is the layer the r4/r5 corpus accounting called out as having "no
textual analog": the axis exists here too, it is just a write-time
property of parquet instead of a per-chunk encoding enum.
"""
from __future__ import annotations

import pytest

# storage-encoding invariance sweep — deselected from the driver-window default run (pytest.ini / conftest);
# runs under HYRISE_SPARK_FULL_TESTS=1.
pytestmark = pytest.mark.slow


from tests.conftest import SF_DIR
from tests.test_sql_corpus import CORPUS
from hyrise_spark.oracle import canon

_TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

# write-time physical layouts: (name, codec, dictionary-enabled)
_LAYOUTS = [
    ("zstd_dict", "zstd", "true"),
    ("uncompressed_nodict", "uncompressed", "false"),
    ("gzip_dict", "gzip", "true"),
]

# a representative slice of the corpus: scans, expressions, aggregates,
# joins, set ops, subqueries, windows — every operator family, cheap rows
_SLICE = [
    "scan_eq", "scan_between", "scan_like", "scan_is_distinct_from",
    "expr_substr", "expr_case_searched", "expr_coalesce_nullif",
    "nla_div_mod_by_zero", "btw_value_between_columns",
    "als_group_by_alias", "cnt_count_expr_plus_one", "hav_two_aggs_band",
    "eob_order_by_count", "ssq_uncorrelated_in_select",
    "cin_in_correlated_lt", "exs_or_of_two_exists",
]


@pytest.fixture(scope="module")
def layout_dirs(spark, tmp_path_factory):
    """Rewrite the tables once per physical layout."""
    dirs = {}
    for name, codec, dict_on in _LAYOUTS:
        d = tmp_path_factory.mktemp(f"enc_{name}")
        for t in _TABLES:
            (
                spark.read.parquet(f"{SF_DIR}/{t}.parquet")
                .write.option("compression", codec)
                .option("parquet.enable.dictionary", dict_on)
                .mode("overwrite")
                .parquet(f"{d}/{t}.parquet")
            )
        dirs[name] = str(d)
    return dirs


def _run(spark, sql):
    df = spark.sql(sql)
    return canon([c.lower() for c in df.columns], [tuple(r) for r in df.collect()])


@pytest.mark.parametrize("qname", _SLICE)
def test_results_are_storage_invariant(spark, layout_dirs, qname):
    sql = CORPUS[qname]
    # baseline: default layout (the driver's files)
    for t in _TABLES:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").createOrReplaceTempView(t)
    want = _run(spark, sql)
    for lname, d in layout_dirs.items():
        for t in _TABLES:
            spark.read.parquet(f"{d}/{t}.parquet").createOrReplaceTempView(t)
        got = _run(spark, sql)
        assert got == want, f"{qname} differs under layout {lname}"
    # restore default views for any later test in the session
    for t in _TABLES:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").createOrReplaceTempView(t)
