"""Main-content extraction via block segmentation + density/tag-weight rules.

From-scratch design in the spirit of the reference's Resiliparse family
(/root/reference/src/extraction_benchmark/extractors/extractors.py:69-78:
rule/density-based main-content heuristics with formatting preserved):

1. Segment the <body> subtree into text blocks at block-level elements.
2. Per block measure word count, link word count (text under <a>), the
   owning element tag, and the closest class/id signal on the ancestor
   chain.
3. Classify: hard-negative ancestor tags (nav/aside/footer/form/menu/...)
   drop a block; class/id signals decide next (closest ancestor wins);
   then link density and a tiny-fragment rule.
4. Output kept blocks, whitespace-squeezed, joined with newlines
   (preserve_formatting semantics), plus char-offset block spans per the
   north-star contract ("extracted main text plus block-level spans").
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..dom import BLOCK_ELEMENTS, NON_TEXT_ELEMENTS, Node, body_or_root, parse_html
from ..textutils import squeeze_ws, ws_tokens

# Blocks under these elements never survive (site chrome / input surfaces).
HARD_NEGATIVE_TAGS = frozenset(
    "nav aside footer form menu select option button textarea label fieldset "
    "legend iframe object embed".split()
)

HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

NEGATIVE_CLASS_RE = re.compile(
    r"nav|menu|footer|foot|sidebar|side-bar|comment|promo|advert|\bad\b|banner"
    r"|social|share|related|breadcrumb|copyright|widget|cookie|popup|masthead"
    r"|pagination|pager|tags|meta|byline|disclaimer|subscribe|signup",
    re.IGNORECASE,
)
POSITIVE_CLASS_RE = re.compile(
    r"article|content|main|body|post\b|entry|text|story|blog|page",
    re.IGNORECASE,
)

MAX_LINK_DENSITY = 0.55


@dataclass
class Block:
    tag: str                 # owning block element tag
    raw_text: str            # unnormalized concatenated text
    words: int
    link_words: int
    class_signal: int        # +1 keep-bias, -1 drop-bias, 0 neutral
    hard_negative: bool
    # non-whitespace text leaves of the block, in document order:
    # (text, tag path root->parent as a tuple).  Consumed by the E15
    # leaf-sequence classifier (extractors/neural.py); ignored by the
    # density rule itself.
    leaves: tuple = ()

    @property
    def link_density(self) -> float:
        return self.link_words / self.words if self.words else 0.0


def _class_signal(node: Node) -> int:
    """Closest class/id decision walking self -> ancestors; 0 if none."""
    cur: Node | None = node
    while cur is not None and cur.tag not in (None, "#document", "body", "html"):
        blob = f"{cur.attr('class')} {cur.attr('id')}".strip()
        if blob:
            if NEGATIVE_CLASS_RE.search(blob):
                return -1
            if POSITIVE_CLASS_RE.search(blob):
                return 1
        cur = cur.parent
    return 0


def _has_hard_negative(node: Node) -> bool:
    cur: Node | None = node
    while cur is not None:
        if cur.tag in HARD_NEGATIVE_TAGS:
            return True
        cur = cur.parent
    return False


def _leaf_tag_path(node: Node) -> tuple:
    """Element tags on the root -> parent chain of a text node whose
    immediate parent is ``node`` (the BoilerNet ``tag_list`` shape)."""
    path: list[str] = []
    cur: Node | None = node
    while cur is not None:
        if cur.tag and cur.tag != "#document":
            path.append(cur.tag)
        cur = cur.parent
    return tuple(reversed(path))


def segment_blocks(body: Node) -> list[Block]:
    """Flatten the body subtree into text blocks split at block elements."""
    blocks: list[Block] = []
    # Current accumulation: (owner element, [text parts], [link parts])
    parts: list[str] = []
    link_parts: list[str] = []
    leaf_parts: list[tuple] = []
    owner: Node | None = None

    def flush() -> None:
        nonlocal parts, link_parts, leaf_parts, owner
        if owner is not None and parts:
            raw = "".join(parts)
            words = len(ws_tokens(raw))
            if words:
                link_words = len(ws_tokens(" ".join(link_parts)))
                blocks.append(
                    Block(
                        tag=owner.tag or "body",
                        raw_text=raw,
                        words=words,
                        link_words=link_words,
                        class_signal=_class_signal(owner),
                        hard_negative=_has_hard_negative(owner),
                        leaves=tuple(leaf_parts),
                    )
                )
        parts = []
        link_parts = []
        leaf_parts = []
        owner = None

    def walk(node: Node, block_owner: Node, in_link: bool) -> None:
        nonlocal owner
        for child in node.children:
            if child.is_text:
                if child.text:
                    if owner is None:
                        owner = block_owner
                    parts.append(child.text)
                    if in_link:
                        link_parts.append(child.text)
                    if ws_tokens(child.text):
                        leaf_parts.append(
                            (child.text, _leaf_tag_path(node))
                        )
                continue
            if child.tag in NON_TEXT_ELEMENTS:
                continue
            if child.tag in BLOCK_ELEMENTS:
                flush()
                walk(child, child, in_link)
                flush()
            else:
                walk(child, block_owner, in_link or child.tag == "a")

    walk(body, body, False)
    flush()
    return blocks


def classify(block: Block) -> bool:
    """True when the block is main content."""
    if block.words == 0 or block.hard_negative:
        return False
    if block.class_signal < 0:
        return False
    if block.link_density > MAX_LINK_DENSITY:
        return False
    if block.class_signal > 0:
        return True
    if block.words < 2 and block.tag not in HEADING_TAGS:
        return False
    return True


def main_content_with_blocks_from_tree(
    root: Node,
) -> tuple[str, list[tuple[int, int, str, str]]]:
    """Main text plus block spans (start, end char offsets, tag, text)."""
    body = body_or_root(root)
    kept: list[tuple[str, str]] = []
    for block in segment_blocks(body):
        if classify(block):
            text = squeeze_ws(block.raw_text)
            if text:
                kept.append((block.tag, text))
    spans: list[tuple[int, int, str, str]] = []
    offset = 0
    for tag, text in kept:
        spans.append((offset, offset + len(text), tag, text))
        offset += len(text) + 1  # separating newline
    plaintext = "\n".join(text for _, text in kept)
    return plaintext, spans


def extract_main_content_with_blocks(
    html: str,
) -> tuple[str, list[tuple[int, int, str, str]]]:
    return main_content_with_blocks_from_tree(parse_html(html))


def main_content_from_tree(root: Node) -> str:
    return main_content_with_blocks_from_tree(root)[0]


def extract_main_content(html: str) -> str:
    return extract_main_content_with_blocks(html)[0]
