"""E15 trained neural block classifier (extractors/neural.py): the
frozen weights are LEARNED (tools/train_neural.py, seeded numpy Adam),
must reproduce exactly from the pinned seed, must beat the density rule
on the held-out split, and must agree with gold on every template block
(that agreement is what keeps the driver row's GOLD_SQL oracle valid).
The Spark path must broadcast weights + vectorize."""

import os

import numpy as np
import pandas as pd
import pytest

from web_content_extraction_benchmark_spark.dom import body_or_root, parse_html
from web_content_extraction_benchmark_spark.extractors import (
    neural_training as nt,
)
from web_content_extraction_benchmark_spark.extractors.density import (
    classify,
    extract_main_content,
    segment_blocks,
)
from web_content_extraction_benchmark_spark.extractors.neural import (
    FROZEN_WEIGHTS,
    BlockMLP,
    block_features,
    extract_neural_stub,
    neural_extract_answers,
)
from web_content_extraction_benchmark_spark.sources.pages import (
    build_page_html,
    synthesize_pages,
)

TRAIN_SF_DIR = "/root/testdata/sf0.01"  # the corpus the weights froze on


def _train_docs() -> pd.DataFrame:
    if not os.path.exists(f"{TRAIN_SF_DIR}/documents.parquet"):
        pytest.skip("training corpus not present")
    return pd.read_parquet(f"{TRAIN_SF_DIR}/documents.parquet")


def test_trained_model_equals_gold_per_block(sf_dir):
    """The trained MLP's keep/drop decision == density.classify (== gold
    label) on every block of the synthetic corpus — the invariant that
    keeps the neural_extract GOLD_SQL oracle hash-green."""
    import pyarrow.parquet as pq

    model = BlockMLP(FROZEN_WEIGHTS)
    n_blocks = 0
    for row in pq.read_table(f"{sf_dir}/documents.parquet").to_pylist():
        html = build_page_html(row["doc_id"], row["source"], row["text"])
        blocks = segment_blocks(body_or_root(parse_html(html)))
        if not blocks:
            continue
        feats = np.array([block_features(b) for b in blocks])
        keep = model.predict(feats)
        for block, k in zip(blocks, keep):
            assert bool(k) == classify(block), (row["doc_id"], block.tag)
        n_blocks += len(blocks)
    assert n_blocks > 500


def test_training_reproduces_frozen_weights():
    """Frozen-model invariant: the pinned seed + pinned dataset rebuild
    EXACTLY the weights shipped in neural.py (so the training script is
    the real provenance of the constants, not decoration)."""
    X, y, ids = nt.build_dataset(_train_docs())
    held = nt.heldout_mask(ids)
    trained = nt.train_mlp(X[~held], y[~held])
    for key in ("W1", "b1", "W2", "b2"):
        assert trained[key] == FROZEN_WEIGHTS[key], key


def test_frozen_model_beats_density_rule_on_heldout():
    """On doc_id % 7 == 5 (never trained on) the learned model out-scores
    the hand-tuned density rule: the rule's fixed 0.55 link cap drops
    positively-marked link-rich content that the gold concept keeps."""
    X, y, ids = nt.build_dataset(_train_docs())
    held = nt.heldout_mask(ids)
    assert held.sum() > 100
    logits = nt.predict_logits(FROZEN_WEIGHTS, X[held])
    model_acc = nt.accuracy((logits > 0).astype(float), y[held])
    density_acc = nt.accuracy(nt.density_predictions(X[held]), y[held])
    assert model_acc > density_acc
    assert model_acc >= 0.99
    assert density_acc < 0.99


def test_model_is_not_a_rule_rederivation():
    """The trained model genuinely diverges from the density rule where
    the gold concept does: a positively-marked block at link density 0.65
    is kept by the model (gold) and dropped by the rule."""
    f = np.array([nt.feature_row(False, 1, 0.65, 20, False)])
    assert BlockMLP(FROZEN_WEIGHTS).predict(f)[0]
    assert nt.density_predictions(f)[0] == 0.0
    assert nt.target_concept(False, 1, 0.65, 20, False)


def test_template_block_margins_are_stable(sf_dir):
    """Oracle safety: decisions on template blocks sit far from the
    logit-0 boundary, so FP summation noise can never flip a keep/drop
    and break byte identity with GOLD_SQL."""
    import pyarrow.parquet as pq

    feats = []
    for row in pq.read_table(f"{sf_dir}/documents.parquet").to_pylist():
        html = build_page_html(row["doc_id"], row["source"], row["text"])
        for b in segment_blocks(body_or_root(parse_html(html))):
            feats.append(block_features(b))
    logits = nt.predict_logits(FROZEN_WEIGHTS, np.asarray(feats))
    assert np.abs(logits).min() > 1.0


def test_adversarial_blocks_agree():
    """Hand-built pages hitting every branch where the model and the
    density rule agree: hard-negative tags, negative/positive class
    signals, link-heavy neutral blocks, 1-word blocks, headings."""
    cases = [
        '<html><body><nav>skip me now</nav><p>real content here</p></body></html>',
        '<html><body><div class="sidebar">drop this</div><p>keep this text</p></body></html>',
        '<html><body><div class="article">one</div><p>x</p></body></html>',
        '<html><body><h1>t</h1><p><a href="/">l1</a> <a href="/">l2</a> <a href="/">l3</a></p></body></html>',
        '<html><body><p><a href="/x">mostly link text here</a> y</p><p>plain words follow now</p></body></html>',
    ]
    for html in cases:
        assert extract_neural_stub(html) == extract_main_content(html), html


def test_spark_neural_equals_density_extractor(spark, sf_dir):
    """Distributed output byte-identical to the density extractor's main
    text (they agree on the whole template feature region), through the
    broadcast-weights vectorized kernel."""
    from web_content_extraction_benchmark_spark.plans.pipeline import (
        extract_answers,
    )

    pages = synthesize_pages(spark, sf_dir).limit(120).cache()
    neural = {
        r.url: r.plaintext for r in neural_extract_answers(pages).collect()
    }
    density = {
        r.url: r.plaintext
        for r in extract_answers(pages, ["main_content"]).collect()
    }
    assert neural == density
