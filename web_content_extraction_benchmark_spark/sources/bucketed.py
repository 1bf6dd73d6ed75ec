"""Bucketed table sink: co-located joins without a runtime shuffle.

At 100 TB the dominant recurring cost of answers-joins-truth /
pages-joins-metadata pipelines is re-shuffling both sides on the join key
for every run.  Writing both tables bucketed by that key (same bucket
count) lets Spark plan a sort-merge join with NO Exchange on either side
— the shuffle is paid once at write time and amortized over every
subsequent join (tests/test_plans.py pins the Exchange-free plan).

Iceberg reaches the same effect with a bucket partition transform; the
parquet ``bucketBy`` catalog table is the sandbox equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a parquet catalog table bucketed (and optionally
    sorted) by the join key."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, bucket_col)
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
