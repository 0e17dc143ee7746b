"""Custom operator tests: as-of join (vs pandas.merge_asof), range join
(vs naive cross-join filter), salted join (vs plain join)."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from hyrise_spark.operators.joins import asof_join, range_join, salted_join


def test_asof_join_backward_matches_pandas(spark):
    left = pd.DataFrame(
        {"k": [1, 1, 1, 2, 2, 3], "t": [5, 10, 15, 3, 30, 1], "lid": [0, 1, 2, 3, 4, 5]}
    )
    right = pd.DataFrame(
        {"k": [1, 1, 2, 2, 4], "rt": [4, 10, 10, 20, 1], "val": [100, 200, 300, 400, 500]}
    )
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            left_time="t",
            right_time="rt",
            value_cols=["val"],
        )
        .orderBy("lid")
        .toPandas()
    )
    want = pd.merge_asof(
        left.sort_values("t"),
        right.rename(columns={"rt": "t"}).sort_values("t"),
        on="t",
        by="k",
    ).sort_values("lid")
    assert list(got["val"].fillna(-1)) == list(want["val"].fillna(-1))


def test_asof_join_forward(spark):
    left = spark.createDataFrame([(1, 5, 0), (1, 11, 1)], "k int, t int, lid int")
    right = spark.createDataFrame([(1, 4, 10), (1, 10, 20), (1, 30, 30)], "k int, rt int, v int")
    got = {
        r["lid"]: r["v"]
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt", value_cols=["v"],
            direction="forward",
        ).collect()
    }
    assert got == {0: 20, 1: 30}  # earliest right >= left time


def test_range_join_matches_naive(spark):
    import random

    random.seed(7)
    pts = [(i, random.uniform(0, 100)) for i in range(200)]
    ivs = [
        (j, lo, lo + random.uniform(0, 10))
        for j, lo in ((j, random.uniform(0, 95)) for j in range(50))
    ]
    left = spark.createDataFrame(pts, "pid int, x double")
    right = spark.createDataFrame(ivs, "iid int, lo double, hi double")
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(left, right, "x", "lo", "hi", bucket_width=5.0).collect()
    )
    naive = sorted(
        (r["pid"], r["iid"])
        for r in left.crossJoin(right)
        .filter((F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")))
        .collect()
    )
    assert got == naive and len(got) > 0


def test_salted_join_matches_plain(spark):
    # skewed left: 90% of rows share key 0
    left = spark.createDataFrame(
        [(0 if i % 10 else i, i) for i in range(1000)], "k long, payload long"
    )
    right = spark.createDataFrame([(i, i * 100) for i in range(100)], "k long, rv long")
    got = sorted(map(tuple, salted_join(left, right, on="k", salt=8).collect()))
    want = sorted(map(tuple, left.join(right, "k").collect()))
    assert got == want


def test_salted_join_left_anti(spark):
    left = spark.createDataFrame([(i, i) for i in range(20)], "k long, payload long")
    right = spark.createDataFrame([(i,) for i in range(0, 20, 2)], "k long")
    got = sorted(r["k"] for r in salted_join(left, right, on="k", how="left_anti").collect())
    assert got == list(range(1, 20, 2))


def test_salted_join_rejects_right_replicating_modes(spark):
    # right/full replicate unmatched right rows `salt` times -> must raise.
    left = spark.createDataFrame([(1, 1)], "k long, payload long")
    right = spark.createDataFrame([(2, 2)], "k long, rv long")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(left, right, on="k", how=how)


def test_gapfill_interpolation_properties(spark):
    """events_gapfill_interpolate: dense per-series calendar, observed rows
    keep n*1000 exactly, both series endpoints are observed (the calendar
    is bounded by observations), and every gap's interpolated value lies
    within [min, max] of its two neighbors' scaled values."""
    from hyrise_spark.plans.events import events_gapfill_interpolate
    from tests.conftest import SF_DIR as _SF

    rows = events_gapfill_interpolate(spark, _SF).collect()
    assert rows
    by_series: dict[str, list] = {}
    for r in rows:
        by_series.setdefault(r.event_type, []).append(r)
    from datetime import datetime, timedelta

    for series, rs in by_series.items():
        rs.sort(key=lambda r: r.hour)
        hours = [datetime.strptime(r.hour, "%Y-%m-%d %H:%M:%S") for r in rs]
        # dense hourly calendar, endpoints observed
        assert all(
            b - a == timedelta(hours=1) for a, b in zip(hours, hours[1:])
        ), series
        assert not rs[0].is_gap and not rs[-1].is_gap, series
        for i, r in enumerate(rs):
            if r.is_gap:
                assert r.observed is None
                prev = next(x for x in reversed(rs[:i]) if not x.is_gap)
                nxt = next(x for x in rs[i + 1 :] if not x.is_gap)
                lo = min(prev.observed, nxt.observed) * 1000
                hi = max(prev.observed, nxt.observed) * 1000
                assert lo <= r.filled_millis <= hi, (series, r.hour)
            else:
                assert r.filled_millis == r.observed * 1000


def test_skyline_matches_bruteforce(spark):
    """Independent dominance brute-force over the collected part rows
    (test-SF only): the bucketed prefix-max decomposition must equal the
    quadratic NOT EXISTS definition, ties and duplicates included."""
    from hyrise_spark.plans.analytic import skyline_price_size
    from tests.conftest import SF_DIR

    parts = spark.read.parquet(f"{SF_DIR}/part.parquet").select(
        "p_partkey", "p_retailprice", "p_size"
    ).collect()
    rows = [(r.p_partkey, round(r.p_retailprice * 100), r.p_size) for r in parts]
    expected = {
        (k, c, s)
        for (k, c, s) in rows
        if not any(
            bc <= c and bs >= s and (bc < c or bs > s) for (_, bc, bs) in rows
        )
    }
    got = {(r.p_partkey, r.cents, r.p_size) for r in skyline_price_size(spark, SF_DIR).collect()}
    assert got == expected
    assert got  # frontier is never empty
