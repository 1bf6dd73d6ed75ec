"""Skew handling (north_rule): salted url-hash repartition balances
partitions even though the synthetic corpus deliberately clusters ~28% of
pages on host0 (pages.py SKEW_HOST_MOD)."""

from pyspark.sql import functions as F

from web_content_extraction_benchmark_spark.plans.pipeline import (
    repartition_salted,
)
from web_content_extraction_benchmark_spark.sources.pages import (
    synthesize_pages,
)


def _partition_sizes(df):
    return [
        r.n for r in df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid").agg(F.count("*").alias("n")).collect()
    ]


def test_host_partitioning_is_skewed_salting_fixes_it(spark, sf_dir):
    pages = synthesize_pages(spark, sf_dir).withColumn(
        "host", F.regexp_extract("url", r"https://([^/]+)/", 1)
    ).cache()
    n_parts = 8

    by_host = pages.repartition(n_parts, F.col("host"))
    host_sizes = _partition_sizes(by_host)
    salted = repartition_salted(pages, n_parts)
    salted_sizes = _partition_sizes(salted)

    mean = pages.count() / n_parts
    # the deliberate host skew produces a straggler partition...
    assert max(host_sizes) > 1.5 * mean
    # ...the salted repartition keeps every partition within 40% of mean
    # (tight for 500 rows; far tighter at real scale)
    assert max(salted_sizes) < 1.4 * mean
    assert min(salted_sizes) > 0.6 * mean


def test_salts_give_different_but_complete_assignments(spark, sf_dir):
    pages = synthesize_pages(spark, sf_dir)
    a = repartition_salted(pages, 8, salt=1)
    b = repartition_salted(pages, 8, salt=2)
    assert a.count() == b.count() == pages.count()
