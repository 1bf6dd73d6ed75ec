"""Streaming extraction: the flagship decode->parse->extract pipeline as
a Structured Streaming job.

The reference is batch-only (SURVEY §2.4), but a continuously-crawled
pages feed is the natural 100 TB input shape: readStream over the pages
table directory -> the SAME per-page Arrow extraction kernel the batch
plan uses (stateless, so append mode; no watermark needed) ->
writeStream.  Because the transformation is the identical kernel, the
stream's answers are byte-identical to the batch answers — which is what
the ``stream_extract`` driver query pins against the DuckDB gold oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.pipeline import extract_answers

PAGES_PARQUET_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "doc_id long, dataset string, gold string"
)


def stream_extract_answers(
    spark: SparkSession,
    source_dir: str,
    models: list[str],
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source pages stream -> extraction kernel (stateless)."""
    stream = (
        spark.readStream.schema(PAGES_PARQUET_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(source_dir)
    )
    return extract_answers(stream, models)


def run_extract_stream_to_memory(
    spark: SparkSession,
    source_dir: str,
    models: list[str],
    query_name: str = "stream_extract",
) -> None:
    """Drive the extraction stream to completion into a memory sink."""
    out = stream_extract_answers(spark, source_dir, models)
    query = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .start()
    )
    query.processAllAvailable()
    query.stop()
