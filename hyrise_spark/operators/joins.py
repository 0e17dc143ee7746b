"""Custom join operators Spark lacks as single calls — as-of join, range
join, and a salted join for heavy key skew.

The reference has none of these either ("No as-of / interval / range-join
specializations exist", SURVEY.md §2.3); they're the composite operators a
time-series/feature-store workload needs, built from shuffle-conscious
primitives:

- as-of join: union-tag + running-max window. ONE shuffle on the join key
  (vs. per-row subqueries or a broadcast of the whole right side).
- range join: bucketized equi-join + residual filter — turns an O(N*M)
  BroadcastNestedLoop into an equi-shuffle with bounded fan-out.
- salted join: explodes the hot side's keys into `salt` sub-keys so a skewed
  key's rows spread over `salt` reducers. AQE's skew-join handles moderate
  skew; salting is for the pathological key that dwarfs a single executor.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach `value_cols` from the latest right row with
    right_time <= left_time (direction='backward'; 'forward' = earliest
    right row with right_time >= left_time), matching pandas.merge_asof
    semantics with allow_exact_matches=True.

    Implementation: tag and union both sides, sort within key by time (right
    rows first on ties), carry a running struct(max) of (time, values) — a
    single shuffle on `on`, linear scan per key.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    lcols = left.columns
    packed = F.struct(F.col(right_time).alias("__t"), *[F.col(c) for c in value_cols])
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__time"),
        packed.alias("__packed"),
        F.lit(0).alias("__is_left"),
    )
    l = left.select(
        "*",
        F.col(on).alias("__k"),
        F.col(left_time).alias("__time"),
        F.lit(None).cast(r.schema["__packed"].dataType).alias("__packed"),
        F.lit(1).alias("__is_left"),
    )
    tagged = l.select("__k", "__time", "__packed", "__is_left", *lcols).unionByName(
        r.select(
            "__k",
            "__time",
            "__packed",
            "__is_left",
            *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        )
    )
    if direction == "backward":
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__time").asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.max("__packed").over(w)
    else:
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__time").desc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.min("__packed").over(w)
    out = (
        tagged.withColumn("__match", carried)
        .filter(F.col("__is_left") == 1)
        .select(
            *lcols,
            *[F.col("__match")[c].alias(c) for c in value_cols],
        )
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Join left rows whose `left_point` falls in [right_lo, right_hi].

    Bucketizes the point and explodes each right interval over the buckets it
    spans, then equi-joins on bucket + residual filter. `bucket_width` should
    be on the order of typical interval length: fan-out per interval is
    len/bucket_width + 1.
    """
    lb = left.withColumn("__bucket", F.floor(F.col(left_point) / bucket_width))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / bucket_width),
                F.floor(F.col(right_hi) / bucket_width),
            )
        ),
    )
    return (
        lb.join(rb, "__bucket")
        .filter((F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) <= F.col(right_hi)))
        .drop("__bucket")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left (large, skewed) side salted: left keys get a
    random salt in [0, salt); the right side is replicated `salt` times so
    every (key, salt) partition finds its match. Use when one key's row count
    dwarfs an executor's share and AQE skew-splitting isn't available.

    Only modes that never emit unmatched RIGHT rows are sound: the right side
    is replicated `salt` times, so right/full outer (or right-semi/anti) would
    emit every unmatched right row `salt` times.
    """
    sound = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower().replace(" ", "_") not in sound:
        raise ValueError(
            f"salted_join: how={how!r} replicates unmatched right rows {salt}x; "
            f"use one of {sorted(sound)}"
        )
    l = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    r = right.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return l.join(r, [on, "__salt"], how).drop("__salt")
