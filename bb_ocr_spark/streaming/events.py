"""Structured Streaming analogs of the reference's event-stream layer.

The reference hand-rolls per-job append-only trace/log/status streams with
monotone seq numbers, delta-poll/SSE readers, bounded buffers and TTL
eviction (i2j_ui/app/main.py:80-368, SURVEY §2.9). In Spark those concepts
map onto Structured Streaming primitives:

  reader resume from last_seq      → checkpointed source offsets
  bounded buffers / TTL eviction   → watermark + windowed state eviction
  duplicate-line coalescing        → dropDuplicatesWithinWatermark
  job-status counters              → windowed groupBy aggregation

This module streams an events table (file source for tests; Kafka in
production — same plan) through watermarked tumbling/session windows.
For local smoke use, `run_to_memory` drives the query synchronously with
processAllAvailable().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counters per event_type (A5-style status counters);
    the watermark bounds state exactly like the reference's buffer caps."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def deduped_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Dedup-in-state (reference duplicate-line coalescing analog):
    drop repeated (user_id, event_type) within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-based), the streaming sessionization
    primitive; state evicted by watermark (TTL analog)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "total",
        )
    )


def run_to_memory(
    df: DataFrame, name: str, output_mode: str = "append"
) -> None:
    """Drive a streaming query to completion over currently-available input
    (local smoke harness): memory sink + processAllAvailable."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
