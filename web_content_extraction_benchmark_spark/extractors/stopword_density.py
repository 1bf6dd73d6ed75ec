"""jusText-style paragraph classifier (reference family E12,
extractors.py:91-96 calls justext with params (50, 200, 0.1, 0.2, 0.2,
200, True) and an English stoplist; kept paragraphs join with spaces).

From-scratch simplified two-pass variant of the published algorithm
(Pomikálek 2011): context-free classification of paragraphs by link
density, stopword density, and length; then a context-sensitive pass that
resolves 'short'/'near-good' paragraphs by their neighbors' classes.
Deviation from jusText proper, documented: no DOM re-walk for headings
within max_heading_distance — headings inherit from the nearest
classified neighbor like any short paragraph.
"""

from __future__ import annotations

from ..dom import BLOCK_ELEMENTS, NON_TEXT_ELEMENTS, Node, body_or_root, parse_html
from ..textutils import squeeze_ws, ws_tokens

LENGTH_LOW = 50
LENGTH_HIGH = 200
STOPWORDS_LOW = 0.1
STOPWORDS_HIGH = 0.2
MAX_LINK_DENSITY = 0.2

STOPLIST = frozenset(
    """a about above after again against all am an and any are as at be
because been before being below between both but by can did do does doing
down during each few for from further had has have having he her here hers
him his how i if in into is it its just me more most my no nor not now of
off on once only or other our out over own same she so some such than that
the their them then there these they this those through to too under until
up very was we were what when where which while who whom why will with you
your""".split()
)

GOOD, BAD, SHORT, NEAR_GOOD = "good", "bad", "short", "near_good"


def _paragraphs(body: Node) -> list[tuple[str, int, int]]:
    """(raw_text, word_count, link_word_count) per block paragraph."""
    out: list[tuple[str, int, int]] = []
    parts: list[str] = []
    link_parts: list[str] = []

    def flush() -> None:
        nonlocal parts, link_parts
        raw = " ".join(p for p in ("".join(parts),) if p)
        words = len(ws_tokens(raw))
        if words:
            out.append((raw, words, len(ws_tokens(" ".join(link_parts)))))
        parts = []
        link_parts = []

    def walk(node: Node, in_link: bool) -> None:
        for child in node.children:
            if child.is_text:
                parts.append(child.text)
                if in_link:
                    link_parts.append(child.text)
            elif child.tag in NON_TEXT_ELEMENTS:
                continue
            elif child.tag in BLOCK_ELEMENTS:
                flush()
                walk(child, in_link)
                flush()
            else:
                walk(child, in_link or child.tag == "a")

    walk(body, False)
    flush()
    return out


def _context_free_class(text: str, words: int, link_words: int) -> str:
    link_density = link_words / words if words else 0.0
    if link_density > MAX_LINK_DENSITY:
        return BAD
    if "©" in text or "&copy;" in text:
        return BAD
    length = len(text)
    tokens = ws_tokens(text.lower())
    stop_density = sum(1 for t in tokens if t in STOPLIST) / len(tokens)
    if length < LENGTH_LOW:
        return SHORT if link_density == 0 else BAD
    if stop_density >= STOPWORDS_HIGH:
        return GOOD if length > LENGTH_HIGH else NEAR_GOOD
    if stop_density >= STOPWORDS_LOW:
        return NEAR_GOOD
    return BAD


def extract_stopword_density(html: str) -> str:
    body = body_or_root(parse_html(html))
    paragraphs = [
        (squeeze_ws(raw), words, links)
        for raw, words, links in _paragraphs(body)
    ]
    classes = [_context_free_class(t, w, l) for t, w, l in paragraphs]

    # Context-sensitive pass: short/near-good take the class of the
    # nearest good/bad neighbor (good wins when surrounded by good).
    n = len(classes)
    resolved = list(classes)
    for i, cls in enumerate(classes):
        if cls not in (SHORT, NEAR_GOOD):
            continue
        prev_cls = next(
            (classes[j] for j in range(i - 1, -1, -1)
             if classes[j] in (GOOD, BAD)), BAD,
        )
        next_cls = next(
            (classes[j] for j in range(i + 1, n)
             if classes[j] in (GOOD, BAD)), BAD,
        )
        if cls == NEAR_GOOD:
            resolved[i] = GOOD if GOOD in (prev_cls, next_cls) else BAD
        else:
            resolved[i] = GOOD if prev_cls == GOOD and next_cls == GOOD else BAD

    return " ".join(
        text for (text, _, _), cls in zip(paragraphs, resolved)
        if cls == GOOD
    )
