"""N-gram majority-vote ensemble over other extractors' answers.

Semantics per the reference ensemble
(/root/reference/src/extraction_benchmark/extractors/ensemble.py:48-73 and
extractors.py:174-209): render the *full* page text, slide 5-gram windows,
and keep a token iff the summed weight of models whose (whitespace-
normalized) answer contains the token's left or right 5-gram reaches the
vote threshold.  Answers and page text are padded with NUL sentinels so
boundary tokens see complete windows.

Unlike the reference (single-machine in-memory answer cache,
ensemble.py:24-37), the Spark plan feeds the per-page answer map through a
``map_from_entries(collect_list(...))`` aggregation — this module is the
pure per-page kernel.
"""

from __future__ import annotations

from ..extractors.baseline import extract_plain
from ..textutils import ws_tokens

NGRAM_SIZE = 5
DEFAULT_VOTE_FRACTION = 0.66


def _pad_nul(text: str, n: int) -> str:
    return ("\0 " * n) + text + (" \0" * n)


def normalize_answer(text: str) -> str:
    """Whitespace-renormalize a model answer before substring voting."""
    return " ".join(ws_tokens(text))


def majority_vote(
    full_text: str,
    answers: dict[str, str],
    weights: dict[str, int] | None = None,
    vote_threshold: int | None = None,
    ngram_size: int = NGRAM_SIZE,
) -> str:
    """Token-level weighted vote; ``answers`` must be ws-normalized.

    A window " w1 .. wk " is a substring of the space-joined NUL-padded
    answer iff (w1..wk) is a contiguous token k-gram of it (the flanking
    spaces force token alignment) — so the O(tokens x answer_len)
    substring scans become O(1) lookups against precomputed per-model
    k-gram sets (~2x on the bench vote stage, same bytes out)."""
    models = sorted(answers)
    if weights is None:
        weights = {m: 1 for m in models}
    if vote_threshold is None:
        vote_threshold = int(len(models) * DEFAULT_VOTE_FRACTION)

    tokens = ws_tokens(_pad_nul(full_text, ngram_size - 1))
    window_sets: dict[str, set] = {}
    for model in models:
        atoks = ws_tokens(_pad_nul(answers.get(model) or "", ngram_size))
        window_sets[model] = {
            tuple(atoks[i: i + ngram_size])
            for i in range(len(atoks) - ngram_size + 1)
        }

    kept: list[str] = []
    for ti in range(ngram_size - 1, len(tokens) - ngram_size + 1):
        left = tuple(tokens[ti - ngram_size + 1: ti + 1])
        right = tuple(tokens[ti: ti + ngram_size])
        votes = 0
        for model in models:
            windows = window_sets[model]
            if left in windows or right in windows:
                votes += weights.get(model, 1)
            if votes >= vote_threshold:
                break
        if votes >= vote_threshold:
            kept.append(tokens[ti])
    return " ".join(kept)


def extract_ensemble_majority(html: str, answers: dict[str, str]) -> str:
    """Full ensemble step for one page: render full text, then vote."""
    full_text = extract_plain(html)
    normalized = {m: normalize_answer(a or "") for m, a in answers.items()}
    return majority_vote(full_text, normalized)
