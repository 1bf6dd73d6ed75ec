"""Structured Streaming rollup == batch rollup on the same input."""

import shutil

from web_content_extraction_benchmark_spark.streaming.events import (
    run_stream_to_memory,
    windowed_event_counts,
)


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")

    run_stream_to_memory(spark, str(src), query_name="rollup_test")
    streamed = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM rollup_test").collect()
    }
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in windowed_event_counts(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        ).collect()
    }
    assert streamed == batch
    assert len(batch) > 10
