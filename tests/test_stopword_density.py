from web_content_extraction_benchmark_spark.extractors.stopword_density import (
    extract_stopword_density,
)

GOOD_PARA = (
    "This is a long paragraph of the kind that a real page would have, "
    "because it has many of the words that people use when they write "
    "for other people to read, and it keeps going for a while so that "
    "its length is clearly above the high threshold."
)


def test_keeps_proper_prose_drops_link_lists():
    html = (
        "<body><nav><a href='/'>Home</a> <a href='/x'>Products</a></nav>"
        f"<div><p>{GOOD_PARA}</p></div>"
        "<footer>© 2023 Example Corp</footer></body>"
    )
    out = extract_stopword_density(html)
    assert GOOD_PARA in out
    assert "Home" not in out
    assert "©" not in out


def test_short_heading_rescued_by_good_neighbor():
    html = (
        f"<body><h1>The Big Story</h1><p>{GOOD_PARA}</p>"
        f"<p>{GOOD_PARA}</p></body>"
    )
    out = extract_stopword_density(html)
    # heading is 'short' but sits before a good paragraph chain ->
    # near-good resolution keeps paragraphs; short needs good on BOTH sides
    assert GOOD_PARA in out


def test_stopword_free_text_is_boilerplate():
    html = "<body><p>lorem ipsum dolor sit amet consectetur adipiscing " \
           "elit sed eiusmod tempor incididunt labore dolore magna</p></body>"
    assert extract_stopword_density(html) == ""


def test_empty_and_edge_inputs():
    assert extract_stopword_density("") == ""
    assert extract_stopword_density("<body></body>") == ""
    assert extract_stopword_density("<script>x()</script>") == ""


def test_deterministic():
    html = f"<body><p>{GOOD_PARA}</p></body>"
    assert extract_stopword_density(html) == extract_stopword_density(html)
