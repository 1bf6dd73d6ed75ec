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
    cluster 1 aligns with the high-complexity quantile side.

    The flip arithmetic (1 - label) and the binary quantile alignment
    are only meaningful at k=2; other k would silently emit negative /
    swapped labels, so they are rejected loudly."""
    from pyspark.ml.clustering import KMeans

    if k != 2:
        raise ValueError(
            f"label-flip alignment is defined for k=2 only, got k={k}"
        )
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
    if not agree.n:
        raise ValueError(
            "features and complexity share no urls — cannot align "
            "cluster labels on an empty join"
        )
    flip = agree.n_agree * 2 < agree.n
    out = labeled.withColumn(
        "kmeans_label",
        (1 - F.col("kmeans_label")) if flip else F.col("kmeans_label"),
    )
    return out.select("url", "dataset", "kmeans_label", "quantile_label")


# Frozen k-means codebook for the ORACLED cluster-assignment tail:
# trained once through the pyspark.ml path (sf0.01, k=2, seed=42,
# maxIter=200, raw 6-decimal-rounded features), the label-flip alignment
# (complexity.py:229-230) applied AT FREEZE TIME so index 1 is the
# high-complexity side, centroids rounded to 6 and pinned.  Training
# (R26-R28: scaler/KMeans/PCA) stays pytest-gated — iterative; APPLYING a
# pinned codebook is exact integer micro-unit L2 argmin, bit-reproducible
# across engines.
FROZEN_KMEANS: dict = {
    "version": "kmeans-complexity-v1",
    "threshold": 0.05,
    # FEATURE_COLS order; aligned (cluster 1 = high-complexity side)
    "centroids": [
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.833333, 0.0, 0.0, 0.0,
         0.166666, 0.0, 0.0, 0.0, 0.047964],
        [0.069205, 0.0, 0.0, 0.0, 0.0, 0.0, 0.13543, 0.125166, 0.0,
         0.29404, 0.092384, 0.0, 0.0, 0.0, 0.19758],
    ],
}


def frozen_kmeans_confusion(features: DataFrame, complexity: DataFrame,
                            spec: dict = FROZEN_KMEANS) -> DataFrame:
    """(kmeans_label, quantile_label, n) counts from the frozen aligned
    codebook: per-page nearest centroid by EXACT integer micro-unit
    squared L2 (ties -> cluster 0), quantile label from the binarized
    complexity.  No floats anywhere in the assignment, so the confusion
    counts hash-match the DuckDB mirror."""
    u = 1_000_000

    def dist2(centroid: list[float]):
        expr = F.lit(0).cast("long")
        for col, c in zip(FEATURE_COLS, centroid):
            d = (
                F.round(F.col(col) * u, 0).cast("long")
                - F.lit(int(round(c * u)))
            )
            expr = expr + d * d
        return expr

    c0, c1 = spec["centroids"]
    assigned = features.join(
        complexity.select(
            "url",
            (F.round("complexity", 6) >= spec["threshold"])
            .cast("int").alias("quantile_label"),
        ),
        "url",
    ).select(
        F.when(dist2(c0) <= dist2(c1), 0).otherwise(1).alias("kmeans_label"),
        "quantile_label",
    )
    return assigned.groupBy("kmeans_label", "quantile_label").agg(
        F.count("*").alias("n")
    )


# Frozen logistic model for the ORACLED classify+metrics tail: trained
# once through the pyspark.ml path below (sf0.01 train split, maxIter=200,
# regParam=0.01, raw 6-decimal-rounded features), coefficients exported
# and pinned.  Training is iterative (no SQL oracle possible — R29 stays
# pytest-gated); APPLYING a pinned linear model is pure arithmetic, and in
# integer micro-units it is bit-reproducible across engines, which is
# what gives lr_classify a hash-green driver row (VERDICT r2 item 6).
# Zero-weight features are omitted.
FROZEN_LR: dict = {
    "version": "lr-complexity-v1",
    "threshold": 0.05,       # binarize: round(complexity, 6) >= threshold
    "test_mod": 7,           # test split: doc_id % 7 == 3 (co-prime with
    "test_rem": 3,           # the 5-way template-variant mod)
    "weights": {
        "h1": 13.779857,
        "p": -4.828841,
        "li": 7.814531,
        "a": 7.54612,
        "div": -5.3771,
        "html_to_non_html": 3.653948,
    },
    "bias": 0.92988,
}

_U = 1_000_000  # micro-units


def frozen_lr_margin_units(spec: dict = FROZEN_LR):
    """Integer micro-unit margin column builder: features and weights are
    rounded to 6 decimals, scaled to BIGINT, and combined with exact
    integer arithmetic — sign(margin) is engine-independent (float dot
    products could flip a knife-edge prediction between engines)."""
    margin = F.lit(int(round(spec["bias"] * _U)) * _U)
    for col, w in sorted(spec["weights"].items()):
        wu = int(round(w * _U))
        margin = margin + (
            F.round(F.col(col) * _U, 0).cast("long") * F.lit(wu)
        )
    return margin


def frozen_lr_metrics(features: DataFrame, complexity: DataFrame,
                      doc_ids: DataFrame,
                      spec: dict = FROZEN_LR) -> DataFrame:
    """Apply the frozen model to the deterministic test split and emit one
    row: integer confusion matrix + metrics derived from those integers
    (reference complexity.py:301-311 metric set incl. MCC).  Everything
    stays in the plan — no driver collect."""
    data = (
        features.join(
            complexity.select(
                "url",
                (F.round("complexity", 6) >= spec["threshold"])
                .cast("int").alias("label"),
            ),
            "url",
        )
        .join(doc_ids, "url")
        .filter(F.col("doc_id") % spec["test_mod"] == spec["test_rem"])
    )
    pred = (frozen_lr_margin_units(spec) > 0).cast("int")
    cm = data.select(F.col("label"), pred.alias("pred")).agg(
        F.count("*").alias("n_test"),
        F.sum(F.col("label") * F.col("pred")).alias("tp"),
        F.sum((1 - F.col("label")) * F.col("pred")).alias("fp"),
        F.sum(F.col("label") * (1 - F.col("pred"))).alias("fn"),
        F.sum((1 - F.col("label")) * (1 - F.col("pred"))).alias("tn"),
    )
    tp, fp = F.col("tp").cast("double"), F.col("fp").cast("double")
    fn, tn = F.col("fn").cast("double"), F.col("tn").cast("double")
    prec = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
    rec = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(F.lit(0.0))
    denom = F.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    return cm.select(
        "n_test", "tp", "fp", "fn", "tn",
        F.round(
            F.when(F.col("n_test") > 0, (tp + tn) / F.col("n_test"))
            .otherwise(F.lit(0.0)), 6
        ).alias("accuracy"),
        F.round(
            F.when(prec + rec > 0, 2 * prec * rec / (prec + rec))
            .otherwise(F.lit(0.0)), 6
        ).alias("f1"),
        F.round(
            F.when(denom > 0, (tp * tn - fp * fn) / denom)
            .otherwise(F.lit(0.0)), 6
        ).alias("mcc"),
    )


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
