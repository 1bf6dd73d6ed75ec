import random

import pytest

from web_content_extraction_benchmark_spark.functions.scoring import (
    lcs_length,
    rouge_lsum,
    split_sentences,
    token_levenshtein_ratio,
)


def _lcs_dp(a, b):
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b):
            cur[j + 1] = prev[j] + 1 if x == y else max(prev[j + 1], cur[j])
        prev = cur
    return prev[-1]


def test_lcs_matches_dp_randomized():
    rng = random.Random(42)
    for _ in range(500):
        a = [rng.randint(0, 6) for _ in range(rng.randint(0, 30))]
        b = [rng.randint(0, 6) for _ in range(rng.randint(0, 30))]
        assert lcs_length(a, b) == _lcs_dp(a, b)


def test_levenshtein_ratio_values():
    # identical -> 1
    assert token_levenshtein_ratio("a b c", "a b c") == 1.0
    # one insertion over 3+4 tokens: 2*3/7
    assert token_levenshtein_ratio("a b c", "a b c d") == pytest.approx(6 / 7)
    # disjoint -> 0
    assert token_levenshtein_ratio("a b", "c d") == 0.0
    # token-level, not char-level: 'ab' vs 'abc' are different tokens
    assert token_levenshtein_ratio("ab", "abc") == 0.0
    # both empty / whitespace-only -> 1.0 (eval.py:61-71 + util.py:47-57)
    assert token_levenshtein_ratio("", "") == 1.0
    assert token_levenshtein_ratio("   ", "\n\t") == 1.0
    # one side empty -> 0
    assert token_levenshtein_ratio("", "a") == 0.0


def test_rouge_empty_target_overrides():
    # target '' & pred '' -> all 1.0 (eval.py:50-55)
    assert rouge_lsum("", "") == (1.0, 1.0, 1.0)
    # target '' & pred non-empty -> rec=1, prec=0, f1=0
    assert rouge_lsum("", "x y") == (0.0, 1.0, 0.0)
    # whitespace-only target behaves as empty
    assert rouge_lsum("  \n ", "x") == (0.0, 1.0, 0.0)


def test_rouge_perfect_match():
    prec, rec, f1 = rouge_lsum("a b c\nd e f", "a b c\nd e f")
    assert (prec, rec, f1) == (1.0, 1.0, 1.0)


def test_rouge_hand_computed():
    # target 5 tokens, pred 6 tokens, all 5 target tokens recovered:
    # prec = 5/6, rec = 1, f1 = 2pr/(p+r)
    prec, rec, f1 = rouge_lsum("a b c\nd e", "a b c x\nd e")
    assert rec == 1.0
    assert prec == pytest.approx(5 / 6)
    assert f1 == pytest.approx(2 * (5 / 6) / (1 + 5 / 6))


def test_rouge_union_lcs_clipping():
    # pred has 'a' once; target sentences both contain 'a' -> only one hit
    prec, rec, f1 = rouge_lsum("a\na", "a")
    assert rec == pytest.approx(0.5)
    assert prec == pytest.approx(1.0)


def test_split_sentences():
    assert split_sentences("One two. Three four") == ["One two.", "Three four"]
    assert split_sentences("line one\nline two") == ["line one", "line two"]
    assert split_sentences("") == []
    assert split_sentences(" \n ") == []
