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


# --- jusText context-sensitive smoothing paths (Pomikálek 2011, revise
# step with no_headings=True; reference params extractors.py:91-96) ---

NEARGOOD_PARA = (
    # stop density >= 0.2 but length <= 200 chars -> context-free neargood
    "It is a good bit of the story that we all like to read here."
)
SHORT_PARA = "A short line here."  # < 50 chars, no links -> short
BAD_PARA = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed eiusmod "
    "tempor incididunt labore dolore magna aliqua enim minim veniam"
)


def test_short_between_two_goods_is_promoted():
    html = (
        f"<body><p>{GOOD_PARA}</p><p>{SHORT_PARA}</p>"
        f"<p>{GOOD_PARA}</p></body>"
    )
    out = extract_stopword_density(html)
    assert SHORT_PARA in out


def test_short_with_mixed_neighbours_is_dropped_without_neargood_shield():
    html = (
        f"<body><p>{BAD_PARA}</p><p>{SHORT_PARA}</p>"
        f"<p>{GOOD_PARA}</p></body>"
    )
    out = extract_stopword_density(html)
    assert SHORT_PARA not in out
    assert GOOD_PARA in out


def test_short_promoted_when_bad_side_shielded_by_neargood():
    # neighbours (ignoring neargood) are {bad, good} = mixed, but the bad
    # side is shielded by an immediately adjacent neargood -> promote
    html = (
        f"<body><p>{BAD_PARA}</p><p>{NEARGOOD_PARA}</p>"
        f"<p>{SHORT_PARA}</p><p>{GOOD_PARA}</p></body>"
    )
    out = extract_stopword_density(html)
    assert SHORT_PARA in out
    assert NEARGOOD_PARA in out  # neargood next to good -> good


def test_neargood_between_bads_is_dropped():
    html = (
        f"<body><p>{BAD_PARA}</p><p>{NEARGOOD_PARA}</p>"
        f"<p>{BAD_PARA}</p></body>"
    )
    assert NEARGOOD_PARA not in extract_stopword_density(html)


def test_neargood_adjacent_to_good_is_kept():
    html = f"<body><p>{NEARGOOD_PARA}</p><p>{GOOD_PARA}</p></body>"
    out = extract_stopword_density(html)
    assert NEARGOOD_PARA in out and GOOD_PARA in out


def test_link_density_counts_chars_not_words():
    # one long linked word among few short plain words: word-based density
    # would pass (1/5 = 0.2), char-based fails (> 0.2) -> bad
    html = (
        "<body><p>so we it <a href='/x'>supercalifragilistic</a></p>"
        f"<p>{GOOD_PARA}</p></body>"
    )
    out = extract_stopword_density(html)
    assert "supercalifragilistic" not in out


def test_link_density_uses_squeezed_link_text():
    """Whitespace-heavy anchor text must not inflate link density past
    what the squeezed paragraph length supports (ADVICE r2): the ratio is
    squeezed-link-chars / squeezed-paragraph-chars, never > 1."""
    from web_content_extraction_benchmark_spark.extractors.stopword_density import (
        _context_free_class,
        _paragraphs,
    )
    from web_content_extraction_benchmark_spark.dom import (
        body_or_root,
        parse_html,
    )
    from web_content_extraction_benchmark_spark.textutils import squeeze_ws

    words = "the of and to a in that it was for on are with as his they at"
    html = (
        "<html><body><p>"
        f"<a href='/x'>link   \n\n   text      here</a> {words} {words}"
        "</p></body></html>"
    )
    paras = _paragraphs(body_or_root(parse_html(html)))
    assert len(paras) == 1
    raw, link_chars = paras[0]
    text = squeeze_ws(raw)
    assert link_chars == len("link text here")
    assert link_chars / len(text) <= 1.0
    # 14 squeezed link chars over a long stopword-dense paragraph: the
    # raw count (26 chars incl. the whitespace run) would not change the
    # verdict here, but the ratio itself must be the squeezed one
    assert _context_free_class(text, link_chars) in ("good", "near_good")
