"""Deduplication operators for web-scale corpora.

The reference only needs dict-key dedup (R24), but a 100 TB training-data
pipeline needs the full family.  Everything JVM-expressible stays in
built-in functions (no Python in the hot path); only SimHash drops to a
vectorized pandas UDF.

Design for scale:
- exact dedup: hash-groupBy on a digest, never on the full text (shuffle
  carries 32-byte keys, not documents);
- MinHash LSH: signatures are computed in one projection (no explode -> no
  row blow-up), candidate generation joins on (band_id, band_key) so only
  same-bucket docs shuffle together; verification re-checks exact Jaccard
  on the candidate pairs only;
- hash functions are md5-based so an independent engine (DuckDB) can
  reproduce signatures bit-for-bit — this is what makes the driver's
  oracle check meaningful.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_NUM_HASHES = 8
DEFAULT_BANDS = 4  # 4 bands x 2 rows
SHINGLE_SIZE = 3


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical texts: (text_hash, n_docs, min_doc_id)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("canonical_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def drop_exact_duplicates(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id doc per identical text (deterministic winner)."""
    from pyspark.sql.window import Window

    window = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(window))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def shingle_col(text_col: Column, k: int = SHINGLE_SIZE) -> Column:
    """Distinct word k-gram shingles of a single-spaced text column."""
    words = F.split(text_col, " ")
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i, k)),
    )
    return F.array_distinct(grams)


def minhash_signature(shingles: Column,
                      num_hashes: int = DEFAULT_NUM_HASHES) -> list[Column]:
    """One md5-min per hash seed; md5 hex strings compare lexicographically
    identically in any engine, making signatures engine-independent."""
    def _min_hash(seed: int):
        prefix = F.lit(f"{seed}:")
        # NB: the lambda must take exactly one arg — F.transform feeds the
        # element index to a second parameter.
        return F.array_min(
            F.transform(shingles, lambda s: F.md5(F.concat(prefix, s)))
        ).alias(f"mh{seed}")

    return [_min_hash(h) for h in range(num_hashes)]


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    jaccard_threshold: float = 0.6,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard) via banded MinHash.

    Plan shape: project signatures -> posexplode band keys -> self-join on
    (band, key) -> distinct candidate pairs -> exact-Jaccard verify with
    array_intersect/union on the candidates only.
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        shingle_col(F.col(text_col)).alias("shingles"),
    ).select("id", "shingles", *minhash_signature(F.col("shingles"), num_hashes))

    band_keys = [
        F.concat_ws(
            "|", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select(
        "id", "shingles", F.posexplode(F.array(*band_keys)).alias("band", "key")
    )

    left = banded.select(
        F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"),
        "band", "key",
    )
    right = banded.select(
        F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"),
        "band", "key",
    )
    candidates = (
        left.join(right, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    jaccard = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        candidates.select("id_a", "id_b", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        threshold: float = 0.8) -> DataFrame:
    """All-pairs n-gram Jaccard >= threshold, pre-filtered by a cheap
    length-band inequality (|A| within [t, 1/t] of |B| is necessary for
    J >= t) so the join is not a full cross product."""
    shingled = df.select(
        F.col(id_col).alias("id"),
        shingle_col(F.col(text_col)).alias("sh"),
        F.size(shingle_col(F.col(text_col))).alias("n"),
    )
    a = shingled.select(
        F.col("id").alias("id_a"), F.col("sh").alias("sh_a"),
        F.col("n").alias("n_a"),
    )
    b = shingled.select(
        F.col("id").alias("id_b"), F.col("sh").alias("sh_b"),
        F.col("n").alias("n_b"),
    )
    jaccard = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        a.join(
            b,
            (F.col("id_a") < F.col("id_b"))
            & (F.col("n_b") >= F.col("n_a") * threshold)
            & (F.col("n_b") <= F.col("n_a") / threshold),
        )
        .select("id_a", "id_b", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


@F.pandas_udf(T.LongType())
def simhash64_udf(text: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (md5-derived token hashes),
    vectorized with numpy bit unpacking."""
    import hashlib

    out = np.zeros(len(text), dtype=np.int64)
    for i, t in enumerate(text):
        tokens = (t or "").split()
        if not tokens:
            continue
        acc = np.zeros(64, dtype=np.int64)
        for token in tokens:
            h = int.from_bytes(
                hashlib.md5(token.encode("utf-8")).digest()[:8], "big"
            )
            bits = (h >> np.arange(64, dtype=np.uint64)) & 1
            acc += np.where(bits.astype(bool), 1, -1)
        sig = np.uint64(0)
        for bit_idx in np.flatnonzero(acc > 0):
            sig |= np.uint64(1) << np.uint64(bit_idx)
        out[i] = np.int64(sig.astype(np.int64))
    return pd.Series(out)


def simhash_near_duplicates(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on 16-bit
    chunks: two signatures within hamming<=3 share at least one of the 4
    chunks exactly (pigeonhole) -> join per chunk, then verify."""
    sig = df.select(
        F.col(id_col).alias("id"), simhash64_udf(F.col(text_col)).alias("sig")
    )
    chunks = sig.select(
        "id", "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sig"), s).bitwiseAND(F.lit(0xFFFF))
                    for s in (0, 16, 32, 48)
                ]
            )
        ).alias("chunk_id", "chunk"),
    )
    a = chunks.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"),
                      "chunk_id", "chunk")
    b = chunks.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"),
                      "chunk_id", "chunk")
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, ["chunk_id", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
