"""Similarity search over embedding columns (array<float>).

Two paths, one semantics:
- ``cosine_topk``: exact brute-force top-k — JVM-side dot products via
  ``zip_with``/``aggregate`` (no Python), window row_number for top-k.
  The query side is broadcast (small); the corpus scan stays columnar.
  This is the baseline and the verification oracle for the ANN path.
- ``lsh_cosine_topk``: random-hyperplane LSH buckets (deterministic,
  seeded); candidates only where >= 1 of the probed bucket keys match,
  then exact cosine re-rank.  This is the 100 TB path: bucket join
  instead of cross join, at recall < 1.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(col: Column) -> Column:
    return col.cast(T.ArrayType(T.DoubleType()))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, cos, rank).

    Queries are broadcast; ties break on neighbor id for determinism.
    Self-matches (same id) are excluded.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("qv"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos"),
        )
    )
    window = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype(np.float64)


def hyperplane_bucket_udf(dim: int, n_planes: int = 16, seed: int = 42):
    planes = _hyperplanes(dim, n_planes, seed)
    powers = (2 ** np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(T.LongType())
    def _bucket(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        signs = (mat @ planes.T) > 0
        return pd.Series(signs @ powers, dtype="int64")

    return _bucket


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH candidates,
    exact cosine re-rank.  Bucket join replaces the cross join — the
    shuffle carries (table_id, bucket) keys, not a full cartesian."""
    def with_buckets(df: DataFrame, name: str) -> DataFrame:
        out = df.select(
            F.col(id_col).alias(name),
            _as_double(F.col(vec_col)).alias(f"{name}_v"),
        )
        buckets = [
            hyperplane_bucket_udf(dim, n_planes, seed + t)(F.col(f"{name}_v"))
            for t in range(n_tables)
        ]
        return out.select(
            name, f"{name}_v",
            F.posexplode(F.array(*buckets)).alias("table_id", "bucket"),
        )

    qb = with_buckets(queries, "query_id")
    cb = with_buckets(corpus, "neighbor_id")
    candidates = (
        qb.join(cb, ["table_id", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("query_id_v"), F.col("neighbor_id_v")).alias("cos"),
    )
    window = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
    )


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via the LSH candidate path."""
    pairs = lsh_cosine_topk(
        df, df, dim=dim, k=1_000_000, n_planes=n_planes,
        n_tables=n_tables, seed=seed, id_col=id_col, vec_col=vec_col,
    )
    return (
        pairs.filter(
            (F.col("cos") >= threshold)
            & (F.col("query_id") < F.col("neighbor_id"))
        )
        .select(
            F.col("query_id").alias("id_a"),
            F.col("neighbor_id").alias("id_b"),
            F.col("cos"),
        )
    )
