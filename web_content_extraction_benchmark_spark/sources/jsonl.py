"""JSONL source/sink with explicit schemas.

Mirrors the reference's file IO conventions: answers/truth live as JSONL
(`extract.py:33-37` writes sorted-by-key JSONL so golden outputs diff
cleanly).  Schema inference is always disabled — every read declares its
StructType (SURVEY.md §1.2: determinism over convenience).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ANSWER_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("page_id", T.StringType(), True),
        T.StructField("model", T.StringType(), False),
        T.StructField("plaintext", T.StringType(), True),
    ]
)

TRUTH_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("page_id", T.StringType(), True),
        T.StructField("dataset", T.StringType(), True),
        T.StructField("plaintext", T.StringType(), True),
    ]
)


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str,
                sort_by: str | list[str] | None = None,
                golden: bool = False) -> None:
    """JSONL sink.  ``golden=True`` reproduces the reference's diffable
    golden-file mode: globally sorted by key, single file.  At scale the
    sort+coalesce is an anti-pattern — golden mode is for tests only.

    ``sort_by`` may be a list; golden mode needs the FULL unique key
    (e.g. ["url", "model"]) — a sort on a non-unique prefix leaves
    equal-key rows in nondeterministic order and the bytes stop being
    diffable."""
    keys = [sort_by] if isinstance(sort_by, str) else (sort_by or [])
    if golden and not keys:
        raise ValueError(
            "golden=True requires sort_by (the full unique key) — "
            "unsorted multi-file output cannot be byte-diffable"
        )
    if golden:
        df = df.orderBy(*keys).coalesce(1)
    elif keys:
        df = df.sortWithinPartitions(*keys)
    df.write.mode("overwrite").json(path)
