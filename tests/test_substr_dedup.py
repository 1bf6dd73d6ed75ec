"""ExactSubstr dedup (operators/substr_dedup.py).

The driver row (dedup_exact, op='substr') hash-gates values against the
DuckDB mirror; these tests pin the semantics the mirror can't see:
hash-mode == exact-mode equality, the short-doc guard, interval-merge
edge shapes, and the plan (one shuffle on window keys, text never
exchanged).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_content_extraction_benchmark_spark.operators.substr_dedup import (
    dedup_exact_substrings,
)

ROWS = [
    (1, "a b c d e f g h i j k l m n o p"),
    (2, "zz1 yy1 c d e f g h i j k l xx1"),   # copies 1's tokens 2..11
    (3, "one two three four five six"),        # < window, untouched
    (4, "r r r r r r r r r r r r r r r r"),   # self-repeat only
    (5, "lone words that never repeat anywhere else at all ok"),
]


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup_exact_substrings(df, **kw)
    return {
        r["doc_id"]: (r["n_dup_windows"], r["n_tokens_removed"],
                      r["kept_text"])
        for r in out.collect()
    }


def test_cross_doc_span_removed_both_sides(spark):
    got = _run(spark, ROWS)
    # 10 copied tokens -> window starts 2,3,4 in both docs; coverage
    # spans tokens 2..11, the unique wrapper survives
    assert got[1] == (3, 10, "a b m n o p")
    assert got[2] == (3, 10, "zz1 yy1 xx1")


def test_self_repeat_counts_as_duplicate(spark):
    got = _run(spark, ROWS)
    assert got[4] == (9, 16, "")  # whole doc is one repeated window


def test_short_and_unique_docs_survive_intact(spark):
    got = _run(spark, ROWS)
    assert got[3] == (0, 0, ROWS[2][1])
    assert got[5] == (0, 0, ROWS[4][1])


def test_hash_mode_equals_exact_mode(spark):
    assert _run(spark, ROWS, key_mode="hash") == _run(
        spark, ROWS, key_mode="exact"
    )


def test_adjacent_intervals_merge_to_full_coverage(spark):
    # two docs sharing two NON-overlapping windows separated by exactly
    # one position: starts 0 and 8 with window 8 -> adjacent intervals
    # [0,7] + [8,15] merge; token 16 differs and survives
    a = "w0 w1 w2 w3 w4 w5 w6 w7 v0 v1 v2 v3 v4 v5 v6 v7 tail1"
    b = "w0 w1 w2 w3 w4 w5 w6 w7 v0 v1 v2 v3 v4 v5 v6 v7 tail2"
    got = _run(spark, [(1, a), (2, b)])
    # every window of the shared 16-token prefix is duplicated
    assert got[1] == (9, 16, "tail1")
    assert got[2] == (9, 16, "tail2")


def test_disjoint_spans_leave_gap_tokens(spark):
    # duplicated windows at both ends, unique middle gap > window
    shared_a = "s0 s1 s2 s3 s4 s5 s6 s7"
    shared_b = "t0 t1 t2 t3 t4 t5 t6 t7"
    mid = "m0 m1 m2 m3 m4 m5 m6 m7 m8"
    n_mid = "x0 x1 x2 x3 x4 x5 x6 x7 x8"
    got = _run(spark, [
        (1, f"{shared_a} {mid} {shared_b}"),
        (2, f"{shared_a} {n_mid} {shared_b}"),
    ])
    assert got[1] == (2, 16, mid)
    assert got[2] == (2, 16, n_mid)


def test_window_param_and_bad_mode(spark):
    df_rows = [(1, "a b c a b c"), (2, "a b c x y z")]
    got = _run(spark, df_rows, window=3)
    # doc1: windows 'a b c'(0) 'b c a'(1) 'c a b'(2) 'a b c'(3) --
    # 'a b c' occurs 3x (doc1 twice + doc2 once): starts 0,3 in doc1
    assert got[1] == (2, 6, "")
    assert got[2] == (1, 3, "x y z")
    with pytest.raises(ValueError, match="key_mode"):
        dedup_exact_substrings(_spark_df(spark, df_rows), key_mode="md5")


def _spark_df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_empty_and_null_like_text(spark):
    got = _run(spark, [(1, ""), (2, ""), (3, "a")])
    # '' splits to one empty token -> no 8-windows -> intact
    assert got[1] == (0, 0, "")
    assert got[3] == (0, 0, "a")


def test_plan_one_exchange_no_text(spark):
    df = _spark_df(spark, ROWS)
    out = dedup_exact_substrings(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # occurrence counting + per-doc starts + the left join back:
    # window keys and ids shuffle, full text never enters an exchange
    assert "PythonUDF" not in plan
    assert "CartesianProduct" not in plan


def test_plan_no_window_partial_agg_crushes_hot_keys(spark):
    """r9 skew defuse (VERDICT r8 #1): the duplicated-window count must
    be a groupBy with MAP-SIDE PARTIAL aggregation (a key seen 10^7
    times leaves each map task as one row), never a count-over-Window
    (no partial agg — one hot boilerplate key lands its whole
    occurrence list in a single sorted task)."""
    df = _spark_df(spark, ROWS)
    out = dedup_exact_substrings(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_count" in plan


def test_planted_hot_key_correctness(spark):
    """>= 30% of docs share ONE window (site-chrome boilerplate shape):
    the hot key's occurrences must still resolve correctly — boilerplate
    removed everywhere, unique tails kept."""
    chrome = "nav home about contact login search footer copyright"
    rows = [
        (i, f"{chrome} u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f u{i}g u{i}h")
        for i in range(40)
    ] + [
        (100 + i, f"q{i}a q{i}b q{i}c q{i}d q{i}e q{i}f q{i}g q{i}h")
        for i in range(60)
    ]
    got = _run(spark, rows)
    for i in range(40):
        # exactly the chrome window (start 0) is duplicated; the 8
        # unique tail tokens survive
        n_dup, n_removed, kept = got[i]
        assert n_dup == 1 and n_removed == 8
        assert kept == " ".join(
            f"u{i}{c}" for c in "abcdefgh"
        )
    for i in range(60):
        assert got[100 + i] == (0, 0, rows[40 + i][1])
