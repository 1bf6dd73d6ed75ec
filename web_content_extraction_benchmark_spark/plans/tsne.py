"""From-scratch seeded t-SNE for the complexity visualization (R31 —
reference complexity.py:137-144 calls sklearn TSNE over the scaled
per-page HTML feature matrix before scattering it).

This module implements the DATA side of that step — the 2-D embedding
coordinates — as a deterministic pure-numpy t-SNE (van der Maaten &
Hinton 2008: perplexity-calibrated Gaussian affinities via per-point
binary search, symmetrized P, early exaggeration, momentum gradient
descent on the Student-t low-dimensional kernel).  Only the matplotlib
scatter *rendering* remains out of scope (driver-side viz).

Scale framing: t-SNE is an O(N^2) driver-side visualization of an
ALREADY-AGGREGATED small matrix (the reference runs it in-process too).
The distributed part of the pipeline — feature extraction and scaling —
stays in Spark; ``complexity_tsne`` collects only the small (N x d)
feature block, never raw pages.
"""

from __future__ import annotations

import numpy as np

TSNE_SEED = 20260816


def _pairwise_sq_dists(X: np.ndarray) -> np.ndarray:
    s = (X * X).sum(axis=1)
    d2 = s[:, None] + s[None, :] - 2.0 * (X @ X.T)
    np.fill_diagonal(d2, 0.0)
    return np.maximum(d2, 0.0)


def _row_affinities(d2_row: np.ndarray, i: int, perplexity: float,
                    tol: float = 1e-5, max_iter: int = 60) -> np.ndarray:
    """Binary-search the Gaussian precision beta so the row's entropy
    matches log(perplexity)."""
    target = np.log(perplexity)
    beta, beta_lo, beta_hi = 1.0, 0.0, np.inf
    d2 = np.delete(d2_row, i)
    for _ in range(max_iter):
        p = np.exp(-d2 * beta)
        sum_p = p.sum()
        if sum_p <= 0:
            h, p = 0.0, np.zeros_like(d2)
        else:
            h = np.log(sum_p) + beta * (d2 * p).sum() / sum_p
            p = p / sum_p
        diff = h - target
        if abs(diff) < tol:
            break
        if diff > 0:
            beta_lo = beta
            beta = beta * 2.0 if beta_hi == np.inf else (beta + beta_hi) / 2
        else:
            beta_hi = beta
            beta = beta / 2.0 if beta_lo == 0.0 else (beta + beta_lo) / 2
    row = np.zeros(len(d2_row))
    row[np.arange(len(d2_row)) != i] = p
    return row


def tsne_embed(X: np.ndarray, perplexity: float = 30.0,
               n_iter: int = 500, learning_rate: float = 100.0,
               seed: int = TSNE_SEED) -> np.ndarray:
    """(N, d) -> (N, 2) embedding; deterministic for a given seed."""
    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]
    if n == 0:
        return np.zeros((0, 2))
    if n == 1:
        return np.zeros((1, 2))
    perplexity = min(perplexity, max(2.0, (n - 1) / 3.0))

    # standardize features (constant columns -> zero)
    mu, sd = X.mean(axis=0), X.std(axis=0)
    sd[sd == 0] = 1.0
    X = (X - mu) / sd

    d2 = _pairwise_sq_dists(X)
    P = np.stack(
        [_row_affinities(d2[i], i, perplexity) for i in range(n)]
    )
    P = (P + P.T) / (2.0 * n)
    P = np.maximum(P, 1e-12)

    rng = np.random.default_rng(seed)
    Y = rng.normal(0.0, 1e-4, size=(n, 2))
    inc = np.zeros_like(Y)
    momentum, final_momentum = 0.5, 0.8
    exaggeration, stop_exaggeration = 4.0, 100

    for it in range(n_iter):
        Peff = P * exaggeration if it < stop_exaggeration else P
        num = 1.0 / (1.0 + _pairwise_sq_dists(Y))
        np.fill_diagonal(num, 0.0)
        Q = np.maximum(num / num.sum(), 1e-12)
        W = (Peff - Q) * num
        # == 4 * (diag(rowsum(W)) - W) @ Y without the dense n x n
        # diagonal temporary
        grad = 4.0 * (W.sum(axis=1)[:, None] * Y - W @ Y)
        m = momentum if it < 20 else final_momentum
        inc = m * inc - learning_rate * grad
        Y = Y + inc
        Y = Y - Y.mean(axis=0)
    return Y


def complexity_tsne(features, perplexity: float = 30.0,
                    n_iter: int = 500, seed: int = TSNE_SEED):
    """Spark features table (url + numeric columns) -> (url, x, y).

    Collects ONLY the aggregated feature block (N x d doubles) to the
    driver — the same in-process shape the reference uses — and returns
    the coordinates as a DataFrame for the report sinks."""
    from pyspark.sql import functions as F

    num_cols = [
        f.name for f in features.schema.fields
        if f.name != "url" and f.dataType.typeName() in
        ("double", "float", "integer", "long")
    ]
    rows = features.select(
        "url", *[F.col(c).cast("double") for c in num_cols]
    ).collect()
    urls = [r.url for r in rows]
    X = np.array([[r[c] for c in num_cols] for r in rows], dtype=np.float64)
    Y = tsne_embed(X, perplexity=perplexity, n_iter=n_iter, seed=seed)
    spark = features.sparkSession
    return spark.createDataFrame(
        [(u, float(x), float(y)) for u, (x, y) in zip(urls, Y)],
        "url string, x double, y double",
    )
