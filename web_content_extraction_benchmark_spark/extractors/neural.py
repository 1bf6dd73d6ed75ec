"""Neural block classifier for E15 (the BoilerNet deployment pattern;
reference extractors.py:146-153 + boilernet/net/train.py,
boilernet/net/leaf_classifier.py:58-71): a TRAINED neural net classifies
text blocks keep/drop, kept block text is emitted.

The frozen weights below are genuinely LEARNED — produced by the seeded,
reproducible pure-numpy training run in ``tools/train_neural.py`` /
``extractors/neural_training.py`` (full-batch Adam, BCE, 5 -> 12 relu
-> 1 logistic) over gold-labeled template blocks plus an adversarial
link-rich corpus.  On the held-out split (doc_id % 7 == 5) the frozen
model BEATS the hand-tuned density rule (~99.9% vs ~96.7% block
accuracy — the rule's fixed 0.55 link cap misfires on positively-marked
link-rich content; pinned by tests/test_neural_stub.py).  On the
synthetic corpus itself the model agrees with gold on every block with
a minimum logit magnitude > 13, so the extraction output is
byte-identical to the gold main text and the driver query carries a true
SQL oracle (GOLD_SQL) over LEARNED weights.

Deployment pattern (the part that transfers unchanged to any real
checkpoint — reference boilernet loads a Keras model the same way):

- weights are broadcast ONCE per job via ``SparkContext.broadcast``;
- the ``mapInPandas`` kernel materializes the model ONCE PER WORKER
  PROCESS through a module-level cache keyed on a content hash of the
  weights (Spark reuses Python workers across tasks);
- inference is vectorized: one (n_blocks x features) matmul per page
  batch, not a Python call per block.

Frozen-model invariant (CLAUDE.md): these constants are pinned, not
derived.  Retraining = rerun ``python tools/train_neural.py``, paste the
printed literal here, and re-verify the ``neural_extract`` oracle at
sf0.001 AND sf0.01 in the same commit.
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

WEIGHTS_VERSION = "block-mlp-v2-trained"

# Trained by tools/train_neural.py (seed 20260816, sf0.01 template
# blocks + 4000 adversarial rows, held-out doc_id % 7 == 5 untouched).
FROZEN_WEIGHTS: dict = {
    "version": WEIGHTS_VERSION,
    "seed": 20260816,
    "hidden": 12,
    "epochs": 3000,
    "lr": 0.02,
    "W1": [
        [1.670698, -2.742521, 2.1979, -0.663693, 0.122055],
        [2.297058, 1.08372, 2.398008, -0.10778, 0.101978],
        [-0.430052, 0.716367, 0.049662, 0.769671, 0.131187],
        [-2.2329, 2.193063, -1.962681, 1.909674, 0.4552],
        [-0.258532, 0.085335, -0.56246, -0.335826, -0.202029],
        [-0.100995, -0.136684, 0.394625, -0.855872, -0.471909],
        [0.029627, 0.159993, -0.11505, -0.490367, -1.006167],
        [-4.44589, 2.754611, -2.126769, 0.597928, 2.382909],
        [-3.053201, 4.065389, -1.6405, 5.741058, 0.441593],
        [1.034329, -1.899893, 1.379496, 0.403125, 0.041858],
        [-0.664962, 2.062392, -1.106045, 2.189508, 0.312839],
        [7.794685, 2.156304, 12.224335, 5.249022, 1.098839],
    ],
    "b1": [2.091048, -0.904144, -0.18525, 0.025202, -0.201356, -0.277076, -0.12311, -0.121808, -1.374631, 0.99348, -0.305839, -10.110173],
    "W2": [
        [-1.334418, -2.515049, 0.576629, 2.726384, -0.33546, -0.051967, -0.039642, 2.491121, 4.580835, -1.536668, 1.639578, -6.777402],
    ],
    "b2": [-0.365595],
}


class BlockMLP:
    """5 -> hidden (relu) -> 1 (logit) block classifier; keep = logit > 0."""

    def __init__(self, weights: dict):
        self.version = weights["version"]
        self.w1 = np.asarray(weights["W1"], dtype=np.float64)
        self.b1 = np.asarray(weights["b1"], dtype=np.float64)
        self.w2 = np.asarray(weights["W2"], dtype=np.float64)
        self.b2 = np.asarray(weights["b2"], dtype=np.float64)

    def predict(self, feats: np.ndarray) -> np.ndarray:
        """(n_blocks, n_features) -> bool keep mask, one matmul pass."""
        hidden = np.maximum(feats @ self.w1.T + self.b1, 0.0)
        return (hidden @ self.w2.T + self.b2 > 0)[:, 0]


# Backwards-compatible alias (round-3 name).
TinyBlockMLP = BlockMLP


def block_features(block: Block) -> list[float]:
    """Model inputs, all bounded to [-1, 1] (words capped at 4 and
    scaled — the classifier only needs the >= 2 threshold; must match
    neural_training.feature_row)."""
    return [
        float(block.hard_negative),
        float(block.class_signal),
        block.link_density,
        min(float(block.words), 4.0) / 4.0,
        float(block.tag in HEADING_TAGS),
    ]


# Per-worker-process model cache: Spark reuses Python workers across
# tasks, so the (deserialize weights -> build model) cost is paid once
# per worker, not once per task/batch — the load-once contract a real
# TF/Keras model needs.  Keyed on a CONTENT hash, not the version
# string: two weight dicts that reuse a version (e.g. a tweaked copy of
# FROZEN_WEIGHTS) must not silently share a cached model.
_MODEL_CACHE: dict[str, BlockMLP] = {}


def _weights_key(weights: dict) -> str:
    import hashlib
    import json

    return hashlib.md5(
        json.dumps(weights, sort_keys=True, default=str).encode()
    ).hexdigest()


def _worker_model(weights: dict) -> BlockMLP:
    key = _weights_key(weights)
    model = _MODEL_CACHE.get(key)
    if model is None:
        model = _MODEL_CACHE.setdefault(key, BlockMLP(weights))
    return model


def neural_extract_from_tree(root, model: BlockMLP) -> str:
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
