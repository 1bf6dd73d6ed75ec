"""Streaming rollups over the events stream.

The reference has no streaming surface (SURVEY.md §2.4: batch-only), but a
continuously-crawled pages/events feed is the natural 100 TB input shape,
so the engine exposes the standard incremental pattern: readStream ->
watermarked windowed aggregation -> writeStream (foreachBatch into the
snapshot-log table for exactly-once-per-batch commits).

The same logical aggregation is exposed as a batch function
(``windowed_event_counts``) so correctness can be checked against a SQL
oracle; the streaming wrapper differs only in watermarking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_event_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts/sums per event_type (batch or stream)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_windowed_event_counts(
    spark: SparkSession,
    source_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """File-source stream -> watermarked tumbling-window aggregation.

    Late rows beyond the watermark are dropped; state is bounded, which is
    what makes this run forever on a real cluster."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(source_dir)
    )
    return windowed_event_counts(stream.withWatermark("ts", watermark), window)


def stream_dedup_counts(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exactly-once-per-event ingestion: state-store dedup on
    event_id within the watermark horizon (the standard idempotent-ingest
    guard against at-least-once upstream delivery), then per-type counts.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state — the
    requirement for running forever; plain dropDuplicates on a stream
    grows state without bound."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(source_dir)
    )
    deduped = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return deduped.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def run_dedup_stream_to_memory(
    spark: SparkSession, source_dir: str, query_name: str = "event_dedup",
) -> None:
    out = stream_dedup_counts(spark, source_dir)
    query = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .start()
    )
    query.processAllAvailable()
    query.stop()


def run_stream_to_memory(
    spark: SparkSession, source_dir: str, query_name: str = "event_rollup",
    window: str = "1 hour",
) -> None:
    """Drive the stream to completion into an in-memory sink (tests)."""
    out = stream_windowed_event_counts(spark, source_dir, window=window)
    query = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .start()
    )
    query.processAllAvailable()
    query.stop()
