"""Structured Streaming over the events table.

The reference engine has no streaming (SURVEY.md §2.5 scopes this to
the declared operator inventory); these are the canonical streaming
operators a training-data pipeline needs: watermarked tumbling/sliding
windows, session windows, and keyed dedup-within-watermark. The same
aggregation expressions run in batch in queries/events.py — one
implementation, two execution modes, which is exactly Spark's
batch/streaming unification.

Tests drive these with a file source over the testdata parquet and a
memory sink (processAllAvailable) — the transformations are
source/sink-agnostic, so swapping in Kafka is a read/write change only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream of event rows (schema pinned, no inference)."""
    return spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir)


def windowed_counts_stream(events: DataFrame, *, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation; late rows beyond the
    watermark are dropped, state is bounded — the scale-safe default."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n_events", "sum_value")
    )


def session_stream(events: DataFrame, *, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows (inactivity gap) per user under a watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("session_start"), "user_id", "n_events")
    )


def dedup_stream(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Keyed dedup within the watermark — bounded-state streaming
    exact dedup (dropDuplicatesWithinWatermark)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def run_stream_to_memory(df: DataFrame, name: str, output_mode: str = "append") -> DataFrame:
    """Drive a streaming frame to completion against the memory sink;
    returns the materialized result as a batch DataFrame."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return df.sparkSession.sql(f"SELECT * FROM {name}")
