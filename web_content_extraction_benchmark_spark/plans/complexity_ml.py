"""Complexity clustering & classification via pyspark.ml (reference
complexity.py:177-233 / R26-R30).

- HTML feature vectors (15 structural features, R25) -> StandardScaler ->
  KMeans(k=2) with the reference's label-flip alignment to quantiles
  (complexity.py:229-230);
- logistic-regression classification of binarized complexity with
  accuracy / precision / recall / F1 / MCC (complexity.py:301-311), the
  MCC computed from a confusion-matrix aggregation (no sklearn).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import HTML_FEATURE_TAGS, html_features_udf

FEATURE_COLS = HTML_FEATURE_TAGS + ["html_to_non_html"]


def html_feature_table(pages: DataFrame) -> DataFrame:
    """(url, dataset, 15 feature columns) — one DOM pass per page."""
    feats = html_features_udf(F.col("html"))
    return pages.select(
        "url", "dataset", *[feats[c].alias(c) for c in FEATURE_COLS]
    )


def _assemble_scaled(features: DataFrame):
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    assembler = VectorAssembler(inputCols=FEATURE_COLS, outputCol="fvec")
    assembled = assembler.transform(features)
    scaler = StandardScaler(inputCol="fvec", outputCol="scaled",
                            withMean=True, withStd=True)
    model = scaler.fit(assembled)
    return model.transform(assembled)


def kmeans_complexity_clusters(features: DataFrame,
                               complexity: DataFrame,
                               threshold: float,
                               k: int = 2,
                               seed: int = 42,
                               reduce_dim: int | None = None) -> DataFrame:
    """KMeans(k=2, maxIter=500) over scaled features; labels flipped so
    cluster 1 aligns with the high-complexity quantile side."""
    from pyspark.ml.clustering import KMeans

    scaled = _assemble_scaled(features)
    col = "scaled"
    if reduce_dim:
        from pyspark.ml.feature import PCA

        pca = PCA(k=reduce_dim, inputCol="scaled", outputCol="pca")
        scaled = pca.fit(scaled).transform(scaled)
        col = "pca"
    kmeans = KMeans(k=k, maxIter=500, seed=seed, featuresCol=col,
                    predictionCol="kmeans_label")
    clustered = kmeans.fit(scaled).transform(scaled)

    labeled = clustered.join(
        complexity.select("url",
                          F.when(F.col("complexity") >= threshold, 1)
                          .otherwise(0).alias("quantile_label")),
        "url",
    )
    # Label-flip alignment (complexity.py:229-230): if cluster 1 mostly
    # holds low-quantile pages, swap.
    agree = labeled.agg(
        F.sum(
            F.when(F.col("kmeans_label") == F.col("quantile_label"), 1)
            .otherwise(0)
        ).alias("n_agree"),
        F.count("*").alias("n"),
    ).collect()[0]
    flip = agree.n_agree * 2 < agree.n
    out = labeled.withColumn(
        "kmeans_label",
        (1 - F.col("kmeans_label")) if flip else F.col("kmeans_label"),
    )
    return out.select("url", "dataset", "kmeans_label", "quantile_label")


def logistic_regression_classify(features: DataFrame,
                                 complexity: DataFrame,
                                 threshold: float,
                                 train_fraction: float = 0.8,
                                 seed: int = 42) -> tuple[DataFrame, dict]:
    """Train/test split, LR on binarized complexity, returns
    (predictions, metrics incl. MCC)."""
    from pyspark.ml.classification import LogisticRegression

    data = _assemble_scaled(
        features.join(
            complexity.select(
                "url",
                F.when(F.col("complexity") >= threshold, 1.0)
                .otherwise(0.0).alias("label"),
            ),
            "url",
        )
    )
    train, test = data.randomSplit([train_fraction, 1 - train_fraction],
                                   seed=seed)
    lr = LogisticRegression(featuresCol="scaled", labelCol="label")
    preds = lr.fit(train).transform(test).select(
        "url", "label", F.col("prediction").cast("int").alias("pred")
    )
    cm = preds.agg(
        F.sum(F.when((F.col("label") == 1) & (F.col("pred") == 1), 1)
              .otherwise(0)).alias("tp"),
        F.sum(F.when((F.col("label") == 0) & (F.col("pred") == 1), 1)
              .otherwise(0)).alias("fp"),
        F.sum(F.when((F.col("label") == 1) & (F.col("pred") == 0), 1)
              .otherwise(0)).alias("fn"),
        F.sum(F.when((F.col("label") == 0) & (F.col("pred") == 0), 1)
              .otherwise(0)).alias("tn"),
    ).collect()[0]
    tp, fp, fn, tn = cm.tp, cm.fp, cm.fn, cm.tn
    total = tp + fp + fn + tn
    accuracy = (tp + tn) / total if total else 0.0
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    denom = ((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)) ** 0.5
    mcc = ((tp * tn - fp * fn) / denom) if denom else 0.0
    metrics = {
        "accuracy": accuracy, "precision": precision, "recall": recall,
        "f1": f1, "mcc": mcc, "n_test": total,
    }
    return preds, metrics
