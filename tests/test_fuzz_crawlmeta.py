"""Fuzz over the crawl-metadata surface: the robots/crawl-delay
parsers must never throw on arbitrary policy text (hypothesis), and
the link/SURT extraction twins must stay LOCKSTEP on randomized
HTML/URL soup far outside the fixture distribution (seeded batch fuzz
— one Spark job over N random docs beats N hypothesis examples by two
orders of magnitude of wall clock)."""

from __future__ import annotations

import random

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from web_content_extraction_benchmark_spark.operators.robots import (
    parse_crawl_delay,
    parse_robots_txt,
)

_policy_fragment = st.one_of(
    st.text(
        alphabet=st.sampled_from(list("ab:/# *\n\t\r-.%ü")), max_size=16
    ),
    st.sampled_from([
        "User-agent: *\n", "user-AGENT: bot\n", "Disallow: /a\n",
        "Allow:\n", "Disallow:\n", "Crawl-delay: 3\n",
        "Crawl-delay: nan\n", "Crawl-delay: -1\n", "Sitemap: x\n",
        "bogus line\n", ": :\n", "#comment\n",
    ]),
)
_policy = st.lists(_policy_fragment, max_size=20).map("".join)


@given(_policy)
@settings(max_examples=300, deadline=None)
def test_robots_parsers_never_throw(txt):
    for agent in ("*", "bot", "nope"):
        rules = parse_robots_txt(txt, agent)
        assert all(p for p, _ in rules)  # no empty-path rules survive
        assert parse_robots_txt(txt, agent) == rules  # deterministic
        d = parse_crawl_delay(txt, agent)
        assert d is None or isinstance(d, float)


def _random_docs(n: int = 250, seed: int = 8) -> list[str]:
    rng = random.Random(seed)
    frags = [
        '<a href="/p/{i}">text {i}</a>', '<a href="//h{i}.example/x">y</a>',
        '<a href="https://H{i}.EX/Q?b=2&a=1">Z <b>b</b>\nmulti</a>',
        '<link href="/s.css">', '<title>T {i} </title>',
        '<meta name="d" content="c{i}">', '<meta property="og:t" content="v">',
        '<link rel="canonical" href="https://c{i}.example/p">',
        '<link rel="alternate" hreflang="de" href="https://c{i}.example/de">',
        '<a href="relative/{i}">r</a>', '<a href="mailto:a@b">m</a>',
        'plain text ', '"quoted" ', "<a href=\"", "</a>", "href=", "\n\t",
        '<a href="#f">f</a>', '<a href="">e</a>',
    ]
    docs = []
    for i in range(n):
        parts = [rng.choice(frags).replace("{i}", str(rng.randrange(50)))
                 for _ in range(rng.randrange(1, 12))]
        docs.append("".join(parts))
    return docs


def test_page_links_twins_lockstep_on_random_html(spark):
    """Catalyst twin == fused Python kernel on random tag soup — the
    regex-engine-parity property, stressed beyond the fixtures."""
    from web_content_extraction_benchmark_spark.operators.linkgraph import (
        page_links,
        page_links_raw,
    )

    docs = _random_docs()
    rows = [(f"https://s{i % 7}.example/d/{i}", h, h.encode())
            for i, h in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "url string, html_str string, html binary")
    via_string = page_links(df)
    via_raw = page_links_raw(df)
    assert via_raw.exceptAll(via_string).count() == 0
    assert via_string.exceptAll(via_raw).count() == 0


def test_surt_lockstep_on_random_urls(spark):
    from web_content_extraction_benchmark_spark.operators.urls import (
        surt_key,
        surt_sql,
    )

    rng = random.Random(81)
    parts = ["https://", "HTTP://", "//", "", "a.B.example", "h:8443",
             "@u:p@", "/P/x", "?b=2&a=1", "?z", "#f", ":", "..", "%2F",
             "host", ".", "x y"]
    urls = ["".join(rng.choice(parts) for _ in range(rng.randrange(1, 6)))
            for _ in range(300)]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "id long, u string")
    got = {r.id: r.s for r in
           df.select("id", surt_key(F.col("u")).alias("s")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, u VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)",
                    [(i, u) for i, u in enumerate(urls)])
    want = dict(con.execute(
        f"SELECT id, {surt_sql('u')} FROM t").fetchall())
    assert got == want
