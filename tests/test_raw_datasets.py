"""Raw dataset readers (S1) over committed fixtures: decode chain
(gzip / BOM / meta-charset cp1252), CleanEval unwrap + truth derivation,
L3S CSS-annotated truth, whitelist semi-join drop."""

import os

from web_content_extraction_benchmark_spark.sources.raw_datasets import (
    cleaneval_truth,
    cleaneval_unwrap,
    convert_cleaneval,
    convert_l3s,
    l3s_truth,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "raw")


def test_cleaneval_convert_end_to_end(spark):
    out = convert_cleaneval(
        spark,
        os.path.join(FIXTURES, "cleaneval", "orig"),
        os.path.join(FIXTURES, "cleaneval", "clean"),
    )
    rows = {r.source: r for r in out.collect()}
    # page 5 has no truth file -> whitelist-dropped
    assert set(rows) == {"1", "2", "3", "4"}
    assert rows["1"].url == "http://example.com/one"
    assert rows["1"].plaintext == "Alpha beta gamma."
    assert "<text" not in rows["1"].html
    assert "Alpha beta gamma." in rows["1"].html
    # gzip payload decoded transparently
    assert rows["2"].plaintext == "Second page body text."
    assert rows["2"].html.startswith("<html>")
    # cp1252 via meta-charset sniff: é must round-trip
    assert "Café richness." in rows["3"].html
    assert rows["3"].plaintext == "Café richness."
    # BOM stripped
    assert rows["4"].html.startswith("<html>")


def test_l3s_convert_end_to_end(spark):
    out = convert_l3s(
        spark,
        os.path.join(FIXTURES, "l3s", "original"),
        os.path.join(FIXTURES, "l3s", "annotated"),
    )
    rows = {r.source: r for r in out.collect()}
    assert set(rows) == {"a", "b"}
    # block parents prefix a newline; trailing space before it is kept
    assert rows["a"].plaintext == "Article A \nBody words here."
    assert rows["a"].html.startswith("<html><body><div>Article A</div>")
    # multi-token class matches; non-leaf span skipped; inline parent (em)
    # gets no newline prefix (only block parents do)
    assert rows["b"].plaintext == "Lead text. inline tail"


def test_cleaneval_pure_helpers():
    assert cleaneval_unwrap('<text id="9">\n<p>x</p>\n</text>') == "<p>x</p>"
    url, text = cleaneval_truth("URL: http://e.com/a\n\n<p>hello there</p>\n")
    assert url == "http://e.com/a"
    assert text == "hello there"
    # no URL line
    url, text = cleaneval_truth("<p>just text</p>")
    assert url is None and text == "just text"


def test_l3s_truth_skips_unannotated_and_nonleaf():
    html = (
        '<body><p><span class="x-nc-sel2">keep <b>no</b></span></p>'
        '<p><span class="other">drop</span></p>'
        '<p><span class="x-nc-sel1">yes</span></p></body>'
    )
    # first span is non-leaf (element child) -> skipped entirely
    assert l3s_truth(html) == "yes"
