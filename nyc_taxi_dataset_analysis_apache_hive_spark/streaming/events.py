"""Structured Streaming operators over the ``events`` table.

North-star extension (SURVEY.md §2.9): the reference is batch-only, so this
module adds the streaming surface a production pipeline needs -- watermarked
tumbling/sliding/session windows, stateful dedup -- all with Spark built-ins
(no custom state stores).  Each transform is written against a *schema*, not
a source, so the same code serves a file/Kafka stream in production and a
memory/file stream in tests; the batch analogs (same expressions on a static
DataFrame) power the SQL-oracle correctness checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based stream over an events parquet directory.

    In production this is the Kafka/file drop-zone reader; the parquet
    schema is taken from the static table (readStream requires a schema).
    """
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tumbling_counts_stream(
    events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts + value sum per event_type.

    Late rows beyond the watermark are dropped; state for a window is
    evicted once ``max(event time) - watermark`` passes its end -- bounded
    state at any throughput.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def tumbling_counts_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Batch analog of :func:`tumbling_counts_stream` (same expressions).

    Used by the correctness registry: windowing semantics are identical in
    batch, and DuckDB's date_trunc reproduces the hour-aligned buckets.
    """
    return (
        events.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            F.round("sum_value", 2).alias("sum_value"),
        )
    )


def sliding_value_stats_stream(
    events: DataFrame,
    window: str = "30 minutes",
    slide: str = "10 minutes",
    watermark: str = "15 minutes",
) -> DataFrame:
    """Sliding-window avg/max of ``value`` per event_type, watermarked."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), "event_type")
        .agg(F.avg("value").alias("avg_value"), F.max("value").alias("max_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "avg_value",
            "max_value",
        )
    )


def sessionized_counts_stream(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Session windows per user: events within ``gap`` merge into a session.

    ``session_window`` is Spark's built-in dynamic-gap window -- state is one
    open session per (user, key), merged/evicted by watermark.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def dedup_events_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Stateful streaming dedup on event_id within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only for the
    watermark window -- the streaming analog of exact dedup that stays
    bounded-state forever (vs ``dropDuplicates`` whose state grows without
    bound on an unbounded stream).
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory_sink(
    stream_df: DataFrame, query_name: str, mode: str = "append"
) -> "object":
    """Test/debug helper: drain a stream into an in-memory table.

    Returns the StreamingQuery; caller awaits termination/processes all
    available then reads ``spark.table(query_name)``.
    """
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
