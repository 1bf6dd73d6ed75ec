"""Lightweight HTML DOM built on stdlib ``html.parser``.

The sandbox ships neither lxml, bs4 nor resiliparse, so every extractor in
this engine parses through this module.  It builds a minimal element tree
with a small HTML5-ish auto-close subset (p/li/tr/td/...), raw-text handling
for script/style (delegated to HTMLParser's CDATA mode) and entity decoding
(``convert_charrefs=True`` — same behavior bs4's html.parser builder gives
the reference's ``extract_bs4`` at extractors.py:18-23).

The DOM is per-document transient state inside extraction UDFs — it is never
a dataset-level abstraction (mirrors the reference where the tree lives only
inside an extractor call, extractors.py:33-38).
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser
from typing import Iterator, Optional

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Elements whose raw content should never surface as page text.
NON_TEXT_ELEMENTS = frozenset({"script", "style", "noscript", "template"})

# Block-level elements: segment boundaries for block classifiers and
# paragraph breaks for formatted output.
BLOCK_ELEMENTS = frozenset(
    (
        "address article aside blockquote body center dd details dir div dl dt "
        "fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hgroup "
        "hr li main menu nav ol p pre section summary table tbody td tfoot th "
        "thead tr ul"
    ).split()
)

# When a start tag (key) arrives, implicitly close an open element whose tag
# is in the value set if it sits on top of the stack chain.
_IMPLICIT_CLOSE = {
    "p": frozenset({"p"}),
    "li": frozenset({"li"}),
    "td": frozenset({"td", "th"}),
    "th": frozenset({"td", "th"}),
    "tr": frozenset({"tr", "td", "th"}),
    "dd": frozenset({"dd", "dt"}),
    "dt": frozenset({"dd", "dt"}),
    "option": frozenset({"option"}),
}


class Node:
    """Element or text node. Text nodes have ``tag is None``."""

    __slots__ = ("tag", "attrs", "children", "parent", "text")

    def __init__(self, tag: Optional[str], attrs: Optional[dict] = None,
                 text: str = ""):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list[Node] = []
        self.parent: Optional[Node] = None
        self.text = text

    @property
    def is_text(self) -> bool:
        return self.tag is None

    def append(self, child: "Node") -> None:
        child.parent = self
        self.children.append(child)

    def iter(self, skip_tags: frozenset = frozenset()) -> Iterator["Node"]:
        """Pre-order traversal; subtrees rooted at ``skip_tags`` are pruned."""
        stack = [self]
        while stack:
            node = stack.pop()
            if node.tag in skip_tags:
                continue
            yield node
            stack.extend(reversed(node.children))

    def find(self, tag: str) -> Optional["Node"]:
        for node in self.iter():
            if node.tag == tag:
                return node
        return None

    def attr(self, name: str) -> str:
        return self.attrs.get(name) or ""

    def own_text(self) -> str:
        """Concatenated direct text children (raw, no normalization)."""
        return "".join(c.text for c in self.children if c.is_text)

    def text_content(self, skip: frozenset = NON_TEXT_ELEMENTS) -> str:
        """All descendant text in document order, raw concatenation.

        Inlined pre-order walk (r9): same traversal as ``iter`` without
        the generator frame per node — this accessor is on the
        extraction hot path (text nodes have no children, so the
        child-push is elided for them)."""
        parts = []
        stack = [self]
        pop = stack.pop
        extend = stack.extend
        append = parts.append
        while stack:
            node = pop()
            tag = node.tag
            if tag in skip:
                continue
            if tag is None:
                append(node.text)
            elif node.children:
                extend(reversed(node.children))
        return "".join(parts)


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self._open = [self.root]

    # -- helpers -----------------------------------------------------
    def _top(self) -> Node:
        return self._open[-1]

    def _push(self, node: Node) -> None:
        self._top().append(node)
        self._open.append(node)

    # -- HTMLParser hooks --------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        closers = _IMPLICIT_CLOSE.get(tag)
        if closers:
            while len(self._open) > 1 and self._top().tag in closers:
                self._open.pop()
        node = Node(tag, dict(attrs))
        if tag in VOID_ELEMENTS:
            self._top().append(node)
        else:
            self._push(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self._top().append(Node(tag, dict(attrs)))

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self._open) - 1, 0, -1):
            if self._open[i].tag == tag:
                del self._open[i:]
                return
        # Unmatched end tag: ignored (lenient real-world parsing).

    def handle_data(self, data: str) -> None:
        if data:
            self._top().append(Node(None, text=data))

    # Comments / doctype / processing instructions are dropped.
    def handle_comment(self, data: str) -> None:
        pass

    def handle_decl(self, decl: str) -> None:
        pass

    def handle_pi(self, data: str) -> None:
        pass


# ---------------------------------------------------------------------------
# Fast path: single-regex tokenizer.  ~3x the stdlib HTMLParser on typical
# pages (the parse dominates extraction cost).  Produces the same tree as
# _TreeBuilder for well-formed and mildly-dirty markup; equivalence is
# pinned by tests/test_dom.py::test_fast_parser_equivalence and the golden
# extraction files.  Any parse exception falls back to the stdlib path.
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|$)"                       # comments
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"             # CDATA sections
    r"|<[!?][^>]*>"                            # doctype / PI
    r"|</[a-zA-Z][^>]*>"                       # end tags
    r"|<[a-zA-Z](?:[^>\"']|\"[^\"]*\"|'[^']*')*>"  # start tags (quoted > safe)
    r"|[^<]+"                                  # text runs
    r"|<",                                     # stray '<' -> text
    re.DOTALL,
)

_TAG_NAME_RE = re.compile(r"</?([a-zA-Z][a-zA-Z0-9:-]*)")
_ATTR_RE = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)"
    r"(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]*))?"
)

# Raw-text elements: content is literal until the matching close tag and
# char refs are NOT decoded (HTMLParser CDATA_CONTENT_ELEMENTS behavior).
_RAWTEXT = ("script", "style")
# Close-tag scan for rawtext content, matching stdlib html.parser's
# CDATA-mode semantics: '</' + optional whitespace + the exact tag name
# + optional whitespace + '>'.  A bare prefix find would close at
# '</scripty>' (leaking JS into page text) and miss '</ script>'
# (dropping the rest of the document).
_RAWTEXT_CLOSE = {
    t: re.compile(rf"</\s*{t}\s*>", re.IGNORECASE) for t in _RAWTEXT
}


def _parse_attrs(raw: str) -> dict:
    attrs: dict = {}
    for match in _ATTR_RE.finditer(raw):
        name = match.group(1).lower()
        value = match.group(2)
        if value is None:
            attrs[name] = None
        else:
            if value[:1] in "\"'" and value[:1] == value[-1:] and len(value) > 1:
                value = value[1:-1]
            attrs[name] = unescape(value) if "&" in value else value
    return attrs


def parse_html_fast(html: str) -> Node:
    root = Node("#document")
    open_stack = [root]
    pos = 0
    length = len(html)
    # locally-bound method lookups + bare m.group() (the no-arg form
    # skips the index dispatch — the CLAUDE.md PDF-lexer finding, r9):
    # measured 57 -> 44 us/page on the bench corpus, tree-equivalent.
    tag_match = _TAG_NAME_RE.match
    finditer = _TOKEN_RE.finditer

    # finditer scans the token stream in one C-level pass (the regex is
    # total, so consecutive matches are gap-free); only a rawtext skip
    # (script/style) restarts the iterator at the jumped-to offset.
    while pos < length:
        jumped = False
        for match in finditer(html, pos):
            token = match.group()
            pos = match.end()
            first = token[0]
            if first != "<" or len(token) == 1:
                # text run (or stray '<')
                text = unescape(token) if "&" in token else token
                child = Node(None, text=text)
                top = open_stack[-1]
                child.parent = top
                top.children.append(child)
                continue
            second = token[1]
            if second in "!?":
                continue  # comment / doctype / PI / CDATA: dropped
            if second == "/":
                name_match = tag_match(token)
                if not name_match:
                    continue
                tag = name_match.group(1).lower()
                if tag in VOID_ELEMENTS:
                    continue
                for i in range(len(open_stack) - 1, 0, -1):
                    if open_stack[i].tag == tag:
                        del open_stack[i:]
                        break
                continue
            name_match = tag_match(token)
            if not name_match:
                continue
            tag = name_match.group(1).lower()
            rest = token[name_match.end():-1]
            self_closing = rest.endswith("/")
            if self_closing:
                rest = rest[:-1]
            node = Node(tag)
            if rest and not rest.isspace():
                node.attrs = _parse_attrs(rest)
            closers = _IMPLICIT_CLOSE.get(tag)
            if closers:
                while len(open_stack) > 1 and open_stack[-1].tag in closers:
                    open_stack.pop()
            top = open_stack[-1]
            node.parent = top
            top.children.append(node)
            if tag in VOID_ELEMENTS or self_closing:
                continue
            if tag in _RAWTEXT:
                # literal content until the matching close tag (stdlib
                # CDATA-mode equivalent regex, see _RAWTEXT_CLOSE)
                m = _RAWTEXT_CLOSE[tag].search(html, pos)
                if m is None:
                    # unterminated rawtext: stdlib drops buffered content
                    pos = length
                else:
                    if m.start() > pos:
                        text_child = Node(None, text=html[pos:m.start()])
                        text_child.parent = node
                        node.children.append(text_child)
                    pos = m.end()
                jumped = True
                break
            open_stack.append(node)
        if not jumped:
            break
    return root


def parse_html_stdlib(html: str) -> Node:
    """Reference implementation on stdlib html.parser (fallback path)."""
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


def parse_html(html: str) -> Node:
    """Parse an HTML string into a :class:`Node` tree (root ``#document``)."""
    try:
        return parse_html_fast(html)
    except Exception:
        return parse_html_stdlib(html)


def body_or_root(root: Node) -> Node:
    """The ``<body>`` element if present, else the document root."""
    return root.find("body") or root
