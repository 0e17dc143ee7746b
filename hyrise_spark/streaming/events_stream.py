"""Structured Streaming pipelines over the events table.

Net-new surface (the reference has no streaming, SURVEY.md §2.9). The same
aggregations as plans/events.py, expressed as streams: file-source ->
watermark -> windowed agg / session_window -> sink. Tests run them with
availableNow=True (bounded backfill) and compare against the batch results —
the streaming/batch parity check Structured Streaming is designed for.

Scale notes: at production scale the source swaps for Kafka with the same
plan (readStream options change, the DAG does not). Watermarks bound state;
session_window state is per (user_id, open session) only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream of event batches (parquet files dropped into a dir)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window count/sum per event_type with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionized(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows per user (gap-based), the streaming twin of
    plans/events.py::events_sessionize."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState.

    Maintains per-user running (event count, value total) across micro-batches
    — the "custom stateful operator" path for semantics Spark's built-in
    streaming aggregates can't express (arbitrary per-key state machines).
    State is one (long, double) pair per user: bounded, skew-safe, and
    partitioned by the grouping key, so a 1000-executor deployment shards
    state horizontally with no driver involvement.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("total", DoubleType())]
    )

    def update(key, pdf_iter, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def deduped_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    the streaming twin of pipeline/dedup.py::dedup_exact. State holds only
    ids newer than the watermark, so memory is bounded by event rate x
    horizon, not by stream history."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def run_to_completion(stream_df: DataFrame, out_table: str,
                      output_mode: str = "complete") -> None:
    """Drain all available input into an in-memory sink (availableNow).
    `complete` fits aggregation streams; stateless/dedup streams need
    `append` (complete is invalid without an aggregation)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(out_table)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def purchase_click_attribution(
    events: DataFrame,
    events2: DataFrame,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each purchase joins the same user's
    clicks from the preceding `max_lag` — streaming last-touch attribution.

    Both sides carry watermarks and the join condition bounds event time on
    both ends, so Spark can expire join state (docs: stream-stream joins
    REQUIRE this to avoid unbounded buffers). State per side is bounded by
    rate x (watermark + lag). Pass the same source twice (two independent
    readStream handles — a self-join on one handle is disallowed for
    streaming).
    """
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("amount"),
        )
    )
    clicks = (
        events2.filter(F.col("event_type") == "click")
        .withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {max_lag}")),
        "inner",
    ).select("purchase_id", "click_id", F.col("p_user").alias("user_id"), "p_ts", "c_ts", "amount")


def enriched_stream(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static join: events enriched with the customer dimension.

    The static side re-resolves per micro-batch (picking up dim updates) and
    broadcasts under the session threshold — the canonical streaming
    enrichment pattern; no state is kept for the static side.
    """
    dim = customers.select(
        F.col("c_custkey").alias("d_custkey"), "c_name", "c_mktsegment"
    )
    return events.join(
        F.broadcast(dim), F.col("user_id") == F.col("d_custkey"), "left"
    ).select("event_id", "ts", "user_id", "event_type", "value", "c_name", "c_mktsegment")
