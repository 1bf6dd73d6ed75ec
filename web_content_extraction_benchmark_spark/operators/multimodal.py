"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are absent in this sandbox, so the
*decode kernels* are stubs (deterministic fake or NotImplementedError),
but the Spark-side machinery — schemas, Arrow batch shapes, partitioning,
UDF signatures — is real and tested.  Swapping the fake decoder for a real
one (PIL/torchaudio/ffmpeg) changes only the marked function bodies.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def real_decode(payload: bytes, kind: str):
    """REAL decoder hook — unavailable in this sandbox.

    On a production cluster, replace with PIL.Image.open / soundfile /
    pyav frame sampling.  Kept as an explicit stub per task contract.
    """
    raise NotImplementedError(
        "media decode libraries are not installed in this environment"
    )


def _fake_features(payload: bytes | None, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake 'decoder': md5-seeded feature vector.  Stands in
    for decode+embed so the distributed plumbing is end-to-end testable."""
    digest = hashlib.md5(payload or b"").digest()
    seed = int.from_bytes(digest[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.rand(dim).astype(np.float32)


def extract_media_features(media: DataFrame,
                           batch_rows: int = 256) -> DataFrame:
    """mapInPandas over Arrow batches: payload binary -> feature vector.

    The per-batch shape (bounded rows, payload column isolated) is the
    production pattern for MB-scale payloads; only ``_fake_features`` is a
    stand-in."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_features(p).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "features": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def synthesize_media(spark, n_rows: int = 64) -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n_rows):
        kind = kinds[i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * (1 + i % 5)
        meta = {
            "width": 640 if kind == "image" else None,
            "height": 480 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": 1000 * (i % 30) if kind != "image" else None,
            "codec": {"image": "png", "audio": "pcm", "video": "h264"}[kind],
        }
        rows.append((i, f"https://media.example/{kind}/{i}", kind, payload, meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
