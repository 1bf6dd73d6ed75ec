"""Synthetic-model demonstration of the BoilerNet deployment pattern
(E15; reference extractors.py:146-153 + extractors/boilernet/):
a trained neural net classifies text blocks keep/drop, kept block text is
emitted.  The real Keras checkpoint cannot ship in this sandbox (no
model file, no TF), so this module proves the SPARK side of the path —
the part that transfers unchanged to the real model — with a frozen tiny
MLP:

- weights are broadcast ONCE per job via ``SparkContext.broadcast`` (a
  real checkpoint would broadcast its serialized weights identically);
- the ``mapInPandas`` kernel materializes the model ONCE PER WORKER
  PROCESS through a module-level cache (Spark reuses Python workers
  across tasks), never per batch or per row;
- inference is vectorized: one (n_blocks x features) matmul per page
  batch, not a Python call per block.

The frozen weights are CONSTRUCTED (not trained) as an exact boolean
circuit over block features that reproduces the density classifier's
keep/drop rule (``extractors/density.py::classify``), using step
activations (z > 0) where the real model has sigmoids.  That makes the
stub's output byte-identical to the density extractor's main text — so
the driver query carries a true SQL oracle (GOLD_SQL) instead of a
rows-only check; equality is also pinned corpus-wide by
tests/test_neural_stub.py.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..dom import body_or_root, parse_html
from ..encoding import decode_html
from ..textutils import squeeze_ws
from .density import HEADING_TAGS, Block, segment_blocks

WEIGHTS_VERSION = "block-mlp-v1"

# Feature order: [hard_negative, class_signal, link_density, words,
# is_heading].  Hidden layer (step units): h1 = not hard_negative,
# h2 = class_signal >= 0, h3 = link_density <= 0.55 (epsilon absorbs the
# boundary: densities are k/words rationals, so a margin of 1e-9 is only
# crossable past 10^8-word blocks), h4 = class_signal > 0, h5 = words >= 2,
# h6 = is_heading.  Output: AND(h1, h2, h3) AND OR(h4, h5, h6) — exactly
# density.classify for the words > 0 blocks segment_blocks emits.
FROZEN_WEIGHTS: dict = {
    "version": WEIGHTS_VERSION,
    "W1": [
        [-1.0, 0.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, -1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 0.0, 1.0],
    ],
    "b1": [0.5, 0.5, 0.55 + 1e-9, -0.5, -1.5, -0.5],
    "W2": [[3.0, 3.0, 3.0, 1.0, 1.0, 1.0]],
    "b2": [-9.5],
}


class TinyBlockMLP:
    """Two-layer step-activation MLP over block feature rows."""

    def __init__(self, weights: dict):
        self.version = weights["version"]
        self.w1 = np.asarray(weights["W1"], dtype=np.float64)
        self.b1 = np.asarray(weights["b1"], dtype=np.float64)
        self.w2 = np.asarray(weights["W2"], dtype=np.float64)
        self.b2 = np.asarray(weights["b2"], dtype=np.float64)

    def predict(self, feats: np.ndarray) -> np.ndarray:
        """(n_blocks, n_features) -> bool keep mask, one matmul pass."""
        hidden = (feats @ self.w1.T + self.b1 > 0).astype(np.float64)
        return (hidden @ self.w2.T + self.b2 > 0)[:, 0]


def block_features(block: Block) -> list[float]:
    return [
        float(block.hard_negative),
        float(block.class_signal),
        block.link_density,
        float(block.words),
        float(block.tag in HEADING_TAGS),
    ]


# Per-worker-process model cache: Spark reuses Python workers across
# tasks, so the (deserialize weights -> build model) cost is paid once
# per worker, not once per task/batch — the load-once contract a real
# TF/Keras model needs.  Keyed on a CONTENT hash, not the version
# string: two weight dicts that reuse a version (e.g. a tweaked copy of
# FROZEN_WEIGHTS) must not silently share a cached model.
_MODEL_CACHE: dict[str, TinyBlockMLP] = {}


def _weights_key(weights: dict) -> str:
    import hashlib
    import json

    return hashlib.md5(
        json.dumps(weights, sort_keys=True, default=str).encode()
    ).hexdigest()


def _worker_model(weights: dict) -> TinyBlockMLP:
    key = _weights_key(weights)
    model = _MODEL_CACHE.get(key)
    if model is None:
        model = _MODEL_CACHE.setdefault(key, TinyBlockMLP(weights))
    return model


def neural_extract_from_tree(root, model: TinyBlockMLP) -> str:
    blocks = segment_blocks(body_or_root(root))
    if not blocks:
        return ""
    feats = np.array([block_features(b) for b in blocks], dtype=np.float64)
    keep = model.predict(feats)
    kept = [
        squeeze_ws(b.raw_text) for b, k in zip(blocks, keep) if k
    ]
    return "\n".join(t for t in kept if t)


def extract_neural_stub(html: str) -> str:
    """Single-threaded kernel (driver-side oracle twin)."""
    return neural_extract_from_tree(
        parse_html(html), _worker_model(FROZEN_WEIGHTS)
    )


_ANSWER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("plaintext", T.StringType(), False),
    ]
)


def neural_extract_answers(pages: DataFrame,
                           weights: dict = FROZEN_WEIGHTS) -> DataFrame:
    """pages -> (url, plaintext) via the broadcast-model block classifier."""
    bc = pages.sparkSession.sparkContext.broadcast(weights)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _worker_model(bc.value)
        for pdf in batches:
            texts = []
            for blob in pdf["html"]:
                try:
                    texts.append(
                        neural_extract_from_tree(
                            parse_html(decode_html(blob)), model
                        )
                    )
                except Exception:
                    texts.append("")
            yield pd.DataFrame({"url": pdf["url"], "plaintext": texts})

    return pages.select("url", "html").mapInPandas(run, schema=_ANSWER_SCHEMA)
