"""Stateful sessionization: streaming operator vs deterministic batch twin."""

import shutil

from pyspark.sql import functions as F

from web_content_extraction_benchmark_spark.streaming.sessions import (
    batch_sessionize,
    stream_sessionize,
)


def _closed_key(rows):
    return {
        (r.user_id, r.session_start, r.session_end, r.n_events,
         round(r.sum_value, 6))
        for r in rows
    }


def test_batch_sessionize_gap_semantics(spark):
    events = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1.0),
            (1, "2024-01-01 00:10:00", 2.0),   # same session (gap 10m)
            (1, "2024-01-01 01:10:00", 3.0),   # new session (gap 60m)
            (2, "2024-01-01 00:00:00", 5.0),
        ],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    sessions = {(r.user_id, r.n_events, r.sum_value)
                for r in batch_sessionize(events).collect()}
    assert sessions == {(1, 2, 3.0), (1, 1, 3.0), (2, 1, 5.0)}


def test_stream_sessions_subset_of_batch(spark, sf_dir, tmp_path):
    """Every session the stateful stream CLOSES must appear identically in
    the batch twin (the stream holds trailing sessions in open state)."""
    src = tmp_path / "events"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")

    out = stream_sessionize(spark, str(src))
    query = (
        out.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    streamed = _closed_key(spark.sql("SELECT * FROM sessions_test").collect())

    batch = _closed_key(
        batch_sessionize(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        ).collect()
    )
    assert streamed <= batch
    # single file + event-time timeout: the closed set is the batch set
    # minus each user's trailing session
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert len(batch) - len(streamed) <= n_users
    assert len(streamed) > 0
