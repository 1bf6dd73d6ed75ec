"""pyspark.ml complexity pipeline (R26-R30) + JSONL IO (S5)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from web_content_extraction_benchmark_spark.operators.relational import (
    page_complexity,
)
from web_content_extraction_benchmark_spark.plans.complexity_ml import (
    FEATURE_COLS,
    html_feature_table,
    kmeans_complexity_clusters,
    logistic_regression_classify,
)
from web_content_extraction_benchmark_spark.sources.jsonl import (
    ANSWER_JSONL_SCHEMA,
    read_jsonl,
    write_jsonl,
)
from web_content_extraction_benchmark_spark.sources.pages import (
    synthesize_pages,
    truth_table,
)


@pytest.fixture(scope="module")
def pages(spark, sf_dir):
    return synthesize_pages(spark, sf_dir).cache()


def test_html_feature_table_shape(spark, pages):
    feats = html_feature_table(pages.limit(50))
    rows = feats.collect()
    assert len(rows) == 50
    for row in rows:
        for col in FEATURE_COLS:
            assert 0.0 <= row[col] or col == "html_to_non_html"


def test_kmeans_labels_aligned(spark, pages):
    feats = html_feature_table(pages)
    compl = page_complexity(pages, truth_table(pages))
    out = kmeans_complexity_clusters(feats, compl, threshold=0.1)
    rows = out.collect()
    assert {r.kmeans_label for r in rows} <= {0, 1}
    # label-flip alignment: clusters agree with quantile labels more often
    # than not (that is what the flip guarantees)
    agree = sum(1 for r in rows if r.kmeans_label == r.quantile_label)
    assert agree * 2 >= len(rows)


def test_kmeans_with_pca_reduction(spark, pages):
    """R28: the PCA dimensionality-reduction path produces the same label
    contract (clusters 0/1, majority agreement with quantile labels)."""
    feats = html_feature_table(pages)
    compl = page_complexity(pages, truth_table(pages))
    out = kmeans_complexity_clusters(
        feats, compl, threshold=0.1, reduce_dim=4
    )
    rows = out.collect()
    assert rows and {r.kmeans_label for r in rows} <= {0, 1}
    agree = sum(1 for r in rows if r.kmeans_label == r.quantile_label)
    assert agree * 2 >= len(rows)


def test_logistic_regression_metrics(spark, pages):
    feats = html_feature_table(pages)
    compl = page_complexity(pages, truth_table(pages))
    preds, metrics = logistic_regression_classify(feats, compl, threshold=0.1)
    assert set(metrics) == {"accuracy", "precision", "recall", "f1", "mcc",
                            "n_test"}
    assert 0.0 <= metrics["accuracy"] <= 1.0
    assert -1.0 <= metrics["mcc"] <= 1.0
    assert metrics["n_test"] == preds.count() > 0


def test_jsonl_golden_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("u2", "p2", "m", "b"), ("u1", "p1", "m", "a")],
        schema=ANSWER_JSONL_SCHEMA,
    )
    path = str(tmp_path / "answers")
    write_jsonl(df, path, sort_by="url", golden=True)
    files = [f for f in os.listdir(path) if f.endswith(".json")]
    assert len(files) == 1  # golden mode: single diffable file
    with open(os.path.join(path, files[0])) as f:
        keys = [json.loads(line)["url"] for line in f]
    assert keys == ["u1", "u2"]  # sorted by key (extract.py:33-37)
    back = read_jsonl(spark, path, ANSWER_JSONL_SCHEMA)
    assert back.orderBy("url").collect() == df.orderBy("url").collect()


def test_tsne_separates_clusters_and_is_deterministic():
    """R31 data side (reference complexity.py:137-144): the from-scratch
    seeded t-SNE must keep well-separated feature clusters separated in
    2-D, reproduce bit-identically for a seed, and stay finite."""
    import numpy as np

    from web_content_extraction_benchmark_spark.plans.tsne import tsne_embed

    rng = np.random.default_rng(1)
    centers = np.array(
        [[0.0] * 10, [8.0] * 10, [-8.0] * 5 + [8.0] * 5]
    )
    X = np.vstack([c + rng.normal(0, 0.5, size=(50, 10)) for c in centers])
    labels = np.repeat([0, 1, 2], 50)
    Y = tsne_embed(X, n_iter=300)
    assert Y.shape == (150, 2) and np.isfinite(Y).all()
    cents = np.stack([Y[labels == k].mean(axis=0) for k in range(3)])
    pred = np.argmin(
        ((Y[:, None, :] - cents[None]) ** 2).sum(-1), axis=1
    )
    assert (pred == labels).mean() >= 0.95
    assert np.array_equal(Y, tsne_embed(X, n_iter=300))
    # degenerate sizes stay total
    assert tsne_embed(np.zeros((0, 4))).shape == (0, 2)
    assert tsne_embed(np.ones((1, 4))).shape == (1, 2)
    assert np.isfinite(tsne_embed(np.ones((5, 3)), n_iter=50)).all()


def test_complexity_tsne_spark_roundtrip(spark, sf_dir):
    """Feature extraction stays in Spark; only the small aggregated
    matrix is collected; coordinates come back as a (url, x, y) table."""
    from web_content_extraction_benchmark_spark.plans.complexity_ml import (
        html_feature_table,
    )
    from web_content_extraction_benchmark_spark.plans.tsne import (
        complexity_tsne,
    )
    from web_content_extraction_benchmark_spark.sources.pages import (
        synthesize_pages,
    )

    pages = synthesize_pages(spark, sf_dir).limit(150).cache()
    feats = html_feature_table(pages)
    out = complexity_tsne(feats, n_iter=120)
    rows = out.collect()
    assert len(rows) == feats.count()
    assert all(r.x is not None and r.y is not None for r in rows)
    assert set(out.columns) == {"url", "x", "y"}
