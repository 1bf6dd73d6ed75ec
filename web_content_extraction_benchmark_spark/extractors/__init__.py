"""From-scratch per-document extraction operators.

Every extractor is a pure function ``html: str -> plaintext: str`` so the
same code runs (a) single-threaded as the correctness oracle and (b) inside
Arrow-batched pandas UDFs on executors.  The registry mirrors the
reference's name-based dynamic dispatch
(/root/reference/src/extraction_benchmark/extractors/extractors.py:212-221,
``extract.py:138``) as a plain dict.

Per-document error semantics follow the reference harness
(extract.py:106-119): any exception or None result maps to ''.
"""

from __future__ import annotations

from typing import Callable

from ..dom import Node
from .baseline import (
    extract_plain,
    extract_tag_blacklist,
    extract_xpath_text,
    plain_from_tree,
    tag_blacklist_from_tree,
    xpath_text_from_tree,
)
from .bte import extract_bte
from .density import (
    extract_main_content,
    extract_main_content_with_blocks,
    main_content_from_tree,
    main_content_with_blocks_from_tree,
)
from .readability import extract_readability, readability_from_tree
from .stopword_density import extract_stopword_density, justext_from_tree

ExtractorFn = Callable[[str], str]

EXTRACTORS: dict[str, ExtractorFn] = {
    # reference family E1 (extract_bs4): full text, boilerplate-naive
    "plain": extract_plain,
    # reference family E3 (extract_xpath_text)
    "xpath_text": extract_xpath_text,
    # reference family E14 (extract_lxml_cleaner): tag-blacklist cleaner
    "tag_blacklist": extract_tag_blacklist,
    # reference family E10 (extract_bte): Finn's Body Text Extraction
    "bte": extract_bte,
    # reference family E9 (extract_resiliparse): density/link-density/tag-weight
    "main_content": extract_main_content,
    # reference family E5 (extract_readability): candidate scoring
    "readability": extract_readability,
    # reference family E12 (extract_justext): stopword-density classifier
    "stopword_density": extract_stopword_density,
}

DEFAULT_EXTRACTOR = "main_content"

# Import-gated third-party wrappers (E2/E4/E6-E8/E11/E13/E15-E19): only
# families whose packages actually import in this environment register —
# in the build sandbox that is none; on a real cluster, installing e.g.
# trafilatura makes 'trafilatura' a first-class registry model.
from .third_party import discover_third_party  # noqa: E402

EXTRACTORS.update(discover_third_party())

# Tree-level entry points: identical semantics to the string functions
# (each string fn is exactly parse_html + its tree fn), letting multi-model
# kernels parse each page ONCE and fan the tree out to every extractor.
# bte is absent by design — it tokenizes the raw markup, not a DOM.
TREE_EXTRACTORS: dict[str, Callable[[Node], str]] = {
    "plain": plain_from_tree,
    "xpath_text": xpath_text_from_tree,
    "tag_blacklist": tag_blacklist_from_tree,
    "main_content": main_content_from_tree,
    "readability": readability_from_tree,
    "stopword_density": justext_from_tree,
}


def list_extractors() -> list[str]:
    return sorted(EXTRACTORS)


def get_extractor(name: str) -> ExtractorFn:
    try:
        return EXTRACTORS[name]
    except KeyError:
        raise ValueError(f"unknown extractor {name!r}; have {list_extractors()}")


def safe_extract(name: str, html: str) -> str:
    """Run one extractor with the reference's error semantics: '' on failure."""
    fn = get_extractor(name)
    try:
        return fn(html) or ""
    except Exception:
        return ""


__all__ = [
    "EXTRACTORS",
    "DEFAULT_EXTRACTOR",
    "ExtractorFn",
    "extract_plain",
    "extract_xpath_text",
    "extract_tag_blacklist",
    "extract_bte",
    "extract_main_content",
    "extract_main_content_with_blocks",
    "extract_readability",
    "extract_stopword_density",
    "get_extractor",
    "list_extractors",
    "safe_extract",
]
