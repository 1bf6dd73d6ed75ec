import gzip

import pytest

from web_content_extraction_benchmark_spark.encoding import decode_html
from web_content_extraction_benchmark_spark.extractors import (
    EXTRACTORS,
    extract_bte,
    extract_main_content,
    extract_main_content_with_blocks,
    extract_plain,
    extract_readability,
    extract_tag_blacklist,
    extract_xpath_text,
    safe_extract,
)

ARTICLE = (
    "<html><head><title>T</title><style>p{}</style><script>var x=1;</script></head>"
    '<body><nav><a href="/">Home</a> <a href="/a">About</a></nav>'
    "<main><h1>Big News</h1><p>alpha beta gamma delta epsilon zeta eta theta</p></main>"
    "<footer><p>Copyright 2023 Example Corp</p></footer></body></html>"
)


def test_plain_full_text():
    # strip-join of every text node outside script/style/noscript, incl title
    assert extract_plain(ARTICLE) == (
        "T Home About Big News alpha beta gamma delta epsilon zeta eta theta "
        "Copyright 2023 Example Corp"
    )


def test_plain_strips_noscript():
    assert extract_plain("<body><noscript>no</noscript><p>yes</p></body>") == "yes"


def test_xpath_text_body_scope():
    # title excluded (outside body); body-level stray text excluded
    out = extract_xpath_text(ARTICLE)
    assert out.startswith("Home")
    assert "T " not in out
    assert "Big News" in out


def test_xpath_text_whitespace_squeeze():
    html = "<body><div><p>a   b</p><p>c \n d</p></div></body>"
    assert extract_xpath_text(html) == "a b c\nd"


def test_tag_blacklist_drops_chrome():
    assert extract_tag_blacklist(ARTICLE) == (
        "Big News alpha beta gamma delta epsilon zeta eta theta"
    )


def test_main_content_keeps_article_drops_boilerplate():
    text, spans = extract_main_content_with_blocks(ARTICLE)
    assert text == "Big News\nalpha beta gamma delta epsilon zeta eta theta"
    assert [s[2] for s in spans] == ["h1", "p"]
    # span offsets index into the plaintext
    for start, end, _tag, block_text in spans:
        assert text[start:end] == block_text


def test_main_content_class_signals():
    html = (
        '<body><div id="menu"><ul><li><a href="/l">Login</a></li></ul></div>'
        '<div class="article-body"><p>one two three four five six</p></div>'
        '<aside class="promo"><a href="/b">Buy now</a></aside></body>'
    )
    assert extract_main_content(html) == "one two three four five six"


def test_main_content_link_density():
    html = (
        "<body><div><a href='/1'>x</a> <a href='/2'>y</a> <a href='/3'>z</a></div>"
        "<p>real content words here now</p></body>"
    )
    assert extract_main_content(html) == "real content words here now"


def test_main_content_empty_inputs():
    assert extract_main_content("") == ""
    assert extract_main_content("<body></body>") == ""
    assert extract_main_content("<script>only()</script>") == ""


def test_bte_selects_word_dense_region():
    html = (
        "<body><div><a href='/'>l1</a></div><div><a href='/'>l2</a></div>"
        "<div><a href='/'>l3</a></div>"
        "<div><p>w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12</p></div>"
        "<div><a href='/'>l4</a></div><div><a href='/'>l5</a></div>"
        "<div><a href='/'>l6</a></div></body>"
    )
    assert extract_bte(html) == "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"


def test_bte_paragraph_breaks():
    html = "<body><p>a b c d e</p><p>f g h i j</p></body>"
    assert extract_bte(html) == "a b c d e\nf g h i j"


def test_bte_entities():
    assert "don't" in extract_bte("<body><p>don&#39;t stop w1 w2 w3</p></body>")


def test_bte_empty():
    assert extract_bte("") == ""
    assert extract_bte("<body></body>") == ""


def test_readability_picks_candidate():
    assert extract_readability(ARTICLE) == (
        "Big News\nalpha beta gamma delta epsilon zeta eta theta"
    )


def test_readability_fallback_without_paragraphs():
    # no scoreable <p> -> whole-body render
    assert extract_readability("<body><span>tiny</span></body>") == "tiny"


def test_safe_extract_error_to_empty():
    # error semantics of the reference harness (extract.py:106-119)
    assert safe_extract("plain", None) == ""  # type: ignore[arg-type]


@pytest.mark.parametrize("name", sorted(EXTRACTORS))
def test_all_extractors_handle_edge_inputs(name):
    for html in ("", "<body></body>", "<p>", "</p>", "<script>x</script>",
                 "no tags at all", "<body><p>" + "w " * 5000 + "</p></body>"):
        out = safe_extract(name, html)
        assert isinstance(out, str)


@pytest.mark.parametrize("name", sorted(EXTRACTORS))
def test_extractors_deterministic(name):
    assert safe_extract(name, ARTICLE) == safe_extract(name, ARTICLE)


def test_decode_gzip_bom_fallbacks():
    assert decode_html(gzip.compress("héllo".encode())) == "héllo"
    assert decode_html(b"\xef\xbb\xbfabc") == "abc"
    assert decode_html("ü".encode("cp1252")) == "ü"
    assert decode_html(b"") == ""
    assert decode_html(None) == ""
    meta = '<html><head><meta charset="cp1252"></head><body>ü</body></html>'
    assert decode_html(meta.encode("cp1252")) == meta.replace("cp1252", "cp1252")


def test_decode_html_corrupt_gzip_and_utf16_bom():
    """Corrupt/truncated gzip must degrade to a per-document fallback,
    never escape as EOFError/zlib.error and kill the task; UTF-16/32
    BOMs must be CONSUMED like utf-8-sig, not emitted as U+FEFF tokens
    (code-review r4 findings)."""
    import codecs
    import gzip

    from web_content_extraction_benchmark_spark.encoding import decode_html

    good = gzip.compress(b"<p>ok</p>")
    assert decode_html(good) == "<p>ok</p>"
    truncated = good[: len(good) - 4]
    assert isinstance(decode_html(truncated), str)  # no exception
    corrupt = good[:10] + b"\xff\xff\xff\xff" + good[14:]
    assert isinstance(decode_html(corrupt), str)

    for bom, enc in (
        (codecs.BOM_UTF16_LE, "utf-16-le"),
        (codecs.BOM_UTF16_BE, "utf-16-be"),
        (codecs.BOM_UTF32_LE, "utf-32-le"),
    ):
        raw = bom + "<p>héllo</p>".encode(enc)
        decoded = decode_html(raw)
        assert decoded == "<p>héllo</p>", (enc, repr(decoded))
        assert "﻿" not in decoded
