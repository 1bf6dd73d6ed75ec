"""Unicode NFC normalization (operators/textstats.py::nfc_normalize_col)
— value truth is the DuckDB ``nfc_normalize`` mirror in the
``token_counts`` oracle row; these pin the kernel semantics."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_nfc_normalize_col(spark):
    from web_content_extraction_benchmark_spark.operators.textstats import (
        nfc_normalize_col,
    )

    rows = [
        (0, "e\u0301cole"),    # decomposed -> composed U+00E9
        (1, "d\u00e9j\u00e0"),  # already NFC -> unchanged
        (2, "A\u030a"),        # combining ring -> U+00C5
        (3, "plain ascii"),     # fast path identity
        (4, None),              # NULL passthrough
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {r.id: r.n for r in df.select(
        "id", nfc_normalize_col(F.col("t")).alias("n")).collect()}
    assert got[0] == "\u00e9cole" and len(got[0]) == 5
    assert got[1] == "d\u00e9j\u00e0"
    assert got[2] == "\u00c5" and len(got[2]) == 1
    assert got[3] == "plain ascii"
    assert got[4] is None
