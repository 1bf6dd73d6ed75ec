"""SparkSession factory with scale-oriented defaults.

Local testing runs ``local[N]`` in one JVM, but every knob here is chosen
for the 1000-executor / 100 TB case: AQE on (post-shuffle coalescing + skew
join splitting), Arrow-batched Python execution with bounded batch sizes
(giant HTML documents must not blow one Arrow batch), and a shuffle
partition count that callers can override per data size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32
# Arrow batch sizing is THE throughput lever for Python-heavy stages:
# too small (512) and per-batch overhead dominates (measured 2.6x slower
# than 4096 on ~1.5 kB pages); too big and one batch of MB-scale pages
# blows executor memory.  Default suits ~1-100 kB documents; tune down
# via SPARK_GRAFT_ARROW_BATCH for giant-page corpora (batch_rows ~
# 256 MB / p99_page_bytes).
ARROW_MAX_RECORDS_PER_BATCH = int(
    os.environ.get("SPARK_GRAFT_ARROW_BATCH", "4096")
)


def get_spark(
    app_name: str = "wceb-spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[*]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
