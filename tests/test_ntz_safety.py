"""Regression tests for TIMESTAMP_NTZ handling under PySpark 4.x.

The driver's events parquet stores `ts` as timestamp[us] with no UTC
adjustment, which Spark 4 reads as TIMESTAMP_NTZ — and Spark 4 forbids
CAST(timestamp_ntz AS BIGINT). Sessionize must therefore compute time gaps
via timestamp_diff, never via .cast("long").

Reference parity: hyrise treats timestamps as naive values throughout
(src/lib/types.hpp); NTZ is the faithful Spark mapping.
"""
from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from hyrise_spark.plans.events import events_sessionize
from hyrise_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"


def test_events_parquet_ts_is_ntz(spark):
    ts_type = spark.read.parquet(f"{SF_DIR}/events.parquet").schema["ts"].dataType
    assert isinstance(ts_type, TimestampNTZType)


def test_sessionize_runs_on_ntz_frame(spark):
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampNTZType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
        ]
    )
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 1, "view"),
        (2, base + datetime.timedelta(seconds=60), 1, "click"),
        # gap of exactly 1800s must NOT break the session (strict >)
        (3, base + datetime.timedelta(seconds=60 + 1800), 1, "view"),
        # gap of 1801s must break it
        (4, base + datetime.timedelta(seconds=60 + 1800 + 1801), 1, "view"),
        (5, base, 2, "view"),
    ]
    events = spark.createDataFrame(rows, schema)
    assert isinstance(events.schema["ts"].dataType, TimestampNTZType)
    import hyrise_spark.plans.events as ev

    orig = ev._t
    ev._t = lambda _spark, _sf, *names: (events,)
    try:
        out = events_sessionize(spark, SF_DIR)
        got = {(r.user_id, r.session_id): r.n_events for r in out.collect()}
    finally:
        ev._t = orig
    assert got == {(1, 1): 3, (1, 2): 1, (2, 1): 1}


def test_no_ntz_unsafe_long_casts_on_ts(spark):
    # The registered query must analyze cleanly against the real NTZ parquet
    # (this is exactly what failed under PySpark 4.1.2 before the fix).
    df = all_queries()["events_sessionize"].builder(spark, SF_DIR)
    df.explain("formatted")  # forces analysis
    assert df.columns == ["user_id", "session_id", "n_events", "session_start"]
