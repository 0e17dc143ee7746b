"""EMA recurrence division semantics: Python // floors, DuckDB's integer //
TRUNCATES toward zero, Spark div truncates — so all three sides of
events_ema_daily spell FLOOR division explicitly. This test pins the three
implementations on a series with NEGATIVE daily sums (refund days), where
truncate-vs-floor diverges."""

import duckdb
import pyspark.sql.functions as F

SERIES = [100, -7, 3, -250, 41]  # daily cents incl. refund days


def _python_fold(vs):
    ema = vs[0]
    for v in vs[1:]:
        ema = (v + 3 * ema) // 4  # Python // = floor
    return ema


def test_fold_matches_python_floor_on_negatives(spark):
    arr = "array(" + ", ".join(f"CAST({v} AS BIGINT)" for v in SERIES) + ")"
    got = spark.sql(
        f"SELECT aggregate(slice({arr}, 2, {len(SERIES) - 1}),"
        f" element_at({arr}, 1),"
        " (acc, x) -> CAST(FLOOR((x + 3 * acc) / 4.0) AS BIGINT)) AS ema"
    ).first().ema
    assert got == _python_fold(SERIES)

    duck = duckdb.connect()
    lst = "[" + ", ".join(f"CAST({v} AS BIGINT)" for v in SERIES) + "]"
    got_duck = duck.execute(
        f"SELECT CAST(list_reduce({lst},"
        " (acc, x) -> CAST(FLOOR((x + 3 * acc) / 4.0) AS BIGINT)) AS BIGINT)"
    ).fetchone()[0]
    assert got_duck == _python_fold(SERIES)

    # the divergence this guards against: truncation would give a DIFFERENT
    # value on this series than floor
    ema = SERIES[0]
    for v in SERIES[1:]:
        q = (v + 3 * ema) / 4
        ema = int(q)  # truncate toward zero
    assert ema != _python_fold(SERIES)
