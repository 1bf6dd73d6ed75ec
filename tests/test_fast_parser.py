"""Fast regex tokenizer == stdlib HTMLParser tree, byte-for-byte."""

import pandas as pd
import pytest

from web_content_extraction_benchmark_spark.dom import (
    parse_html_fast,
    parse_html_stdlib,
)
from web_content_extraction_benchmark_spark.sources.pages import (
    build_page_html,
)

EDGE_CASES = [
    "", "<p>", "</p>", "no tags at all",
    "<body><p>a<p>b<ul><li>x<li>y</ul></body>",
    "<script>if(a<b){}</script><p>k</p>",
    "<p>&quot;x&quot; &amp; &#39;y&#39;</p>",
    "<a href='q>r'>t</a>",
    '<a href="u>v">t</a>',
    "<br/><img src=x>",
    "<!-- comment --><p>s</p>",
    '<div class="a b" id=c data-x>t</div>',
    "<P CLASS='UP'>Mixed Case</P>",
    "<style>p{color:red}</style>",
    "<textarea><p>not raw for us</p></textarea>",
    "<script>never closed",
    "<td>1<td>2",
    "﻿<html><body>b</body></html>",
    "<p>a & b</p>",
    "<div><span>x</span> <b>y</b>z</div>",
    "<?pi ?><!DOCTYPE html><p>d</p>",
    "< notatag <p>t</p>",
    "<option>a<option>b",
]


def _dump(node):
    if node.is_text:
        return ("#text", node.text)
    return (
        node.tag,
        sorted(node.attrs.items()),
        [_dump(c) for c in node.children],
    )


@pytest.mark.parametrize("html", EDGE_CASES)
def test_fast_parser_equivalence_edge_cases(html):
    assert _dump(parse_html_fast(html)) == _dump(parse_html_stdlib(html))


def test_fast_parser_equivalence_synthetic_corpus(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    for _, row in docs.iterrows():
        html = build_page_html(int(row.doc_id), row.source, row.text)
        assert _dump(parse_html_fast(html)) == _dump(parse_html_stdlib(html))
