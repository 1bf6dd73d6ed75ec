"""E15 synthetic-model deployment pattern (extractors/neural.py): the
frozen step-MLP block classifier must equal the density rule classifier
corpus-wide, and the Spark path must broadcast weights + vectorize."""

import numpy as np
from pyspark.sql import functions as F

from web_content_extraction_benchmark_spark.extractors.density import (
    classify,
    extract_main_content,
    segment_blocks,
)
from web_content_extraction_benchmark_spark.extractors.neural import (
    FROZEN_WEIGHTS,
    TinyBlockMLP,
    block_features,
    extract_neural_stub,
    neural_extract_answers,
)
from web_content_extraction_benchmark_spark.dom import body_or_root, parse_html
from web_content_extraction_benchmark_spark.sources.pages import (
    build_page_html,
    synthesize_pages,
)


def test_circuit_equals_rule_classifier_per_block(sf_dir):
    """The frozen MLP's keep/drop decision == density.classify on every
    block of the synthetic corpus (all 5 template variants)."""
    import pyarrow.parquet as pq

    model = TinyBlockMLP(FROZEN_WEIGHTS)
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


def test_adversarial_blocks_agree():
    """Hand-built pages hitting every branch: hard-negative tags,
    negative/positive class signals, link-heavy blocks, 1-word blocks,
    headings."""
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
    text, and the plan broadcasts weights instead of inlining them."""
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
