"""Body Text Extraction (BTE) — Finn, Kushmerick & Smyth (DELOS 2001).

From-scratch implementation of the published algorithm (the reference wraps
a third-party port at
/root/reference/src/extraction_benchmark/extractors/bte.py:17-47): model the
page as a token stream where every HTML tag scores -1 and every word +1,
then select the contiguous token span [i, j] maximizing

    tags_before(i) + words_within(i, j) + tags_after(j)

which is equivalent to maximizing the value sum inside the span.  The scan
operates on *runs* (maximal same-sign token stretches) and is vectorized
with numpy prefix/suffix reductions to O(runs) instead of the classic
O(runs^2) double loop, preserving the first-strictly-greater tie-breaking
of a lexicographic (i, j) scan.
"""

from __future__ import annotations

import re

import numpy as np

_BODY_OPEN = re.compile(r"^.*<body(\s[^>]*)?>", re.S | re.I)
_BODY_CLOSE = re.compile(r"</body\s*>.*$", re.S | re.I)
_SCRIPT = re.compile(r"<script(\s[^>]*)?>.*?</script\s*>", re.S | re.I)
_STYLE = re.compile(r"<style(\s[^>]*)?>.*?</style\s*>", re.S | re.I)
_TOKEN = re.compile(r"<[^>]*>|[^\s<]+")
_OPEN_TAG_NAME = re.compile(r"^<([a-zA-Z][a-zA-Z0-9]*)")

# Common named/numeric entities normalized before tokenization.
_ENTITIES = (("&quot;", '"'), ("&nbsp;", " "), ("&#39;", "'"), ("&amp;", "&"))

# Opening tags that terminate a text paragraph in the output stage.
PARAGRAPH_TAGS = frozenset(
    "p div hr blockquote table h1 h2 h3 li".split()
)


def _preclean(html: str) -> str:
    text = _BODY_OPEN.sub("", html)
    text = _BODY_CLOSE.sub("", text)
    text = _SCRIPT.sub("<script></script>", text)
    text = _STYLE.sub("<style></style>", text)
    for entity, repl in _ENTITIES:
        text = text.replace(entity, repl)
    return text


def _tokenize(text: str) -> list[str]:
    return _TOKEN.findall(text)


def _best_span(values: np.ndarray) -> tuple[int, int]:
    """Token index range [start, end] maximizing the in-span value sum.

    Operates on alternating-sign runs.  Ties resolve to the earliest (i, j)
    with a strictly positive improvement, matching a naive ascending scan;
    a non-positive global max degenerates to (0, 0).
    """
    n = values.shape[0]
    if n == 0:
        return 0, 0
    # Run-length compress: boundaries where the sign changes.
    change = np.flatnonzero(values[1:] != values[:-1]) + 1
    starts = np.concatenate(([0], change))          # first token of each run
    ends = np.concatenate((change - 1, [n - 1]))    # last token of each run
    csum = np.concatenate(([0], np.cumsum(values)))
    run_prefix = csum[ends + 1]                     # sum of values through run k
    # P[k] = total before run k;  score(i..j) = P[j+1] - P[i]
    prefix = np.concatenate(([0], run_prefix))
    # Suffix max of prefix[1:] with first-occurrence argmax: suf_arg[k] is
    # the smallest j >= k maximizing prefix[j+1] (first j wins ties, as in
    # an ascending-j scan with strict improvement).
    ends_vals = prefix[1:]
    m = ends_vals.shape[0]
    suf_max = np.maximum.accumulate(ends_vals[::-1])[::-1]
    suf_arg = np.empty(m, dtype=np.int64)
    best_val = -np.inf
    best_at = 0
    for k in range(m - 1, -1, -1):
        # >= so the SMALLEST tied j survives the backward scan — the
        # reference's ascending-j strict-improvement loop (bte.py:40-53)
        # keeps the first j reaching the max; a strict > here kept the
        # largest tied j and emitted longer spans on ~21% of random
        # streams (code-review r4 fuzz finding)
        if ends_vals[k] >= best_val:
            best_val = ends_vals[k]
            best_at = k
        suf_arg[k] = best_at

    best = 0
    best_i = 0
    best_j = 0
    num_runs = run_prefix.shape[0]
    for i in range(num_runs):
        j = suf_arg[i]  # first j >= i maximizing prefix[j+1]
        cand = suf_max[i] - prefix[i]
        if cand > best:
            best = cand
            best_i = i
            best_j = j
    if best <= 0:
        return 0, 0
    return int(starts[best_i]), int(ends[best_j])


def _render_paragraphs(tokens: list[str]) -> str:
    """Join word runs with spaces; paragraph tags flush a newline block."""
    blocks: list[str] = []
    current: list[str] = []
    for token in tokens:
        if not token.startswith("<"):
            current.append(token)
            continue
        if not current:
            continue
        match = _OPEN_TAG_NAME.match(token)
        if match and match.group(1).lower() in PARAGRAPH_TAGS:
            blocks.append(" ".join(current))
            current = []
    if current:
        blocks.append(" ".join(current))
    return "\n".join(blocks)


def extract_bte(html: str) -> str:
    tokens = _tokenize(_preclean(html))
    if not tokens:
        return ""
    values = np.fromiter(
        (-1 if t.startswith("<") else 1 for t in tokens),
        dtype=np.int64,
        count=len(tokens),
    )
    start, end = _best_span(values)
    return _render_paragraphs(tokens[start:end + 1])
