"""Host-graph operators: outlink extraction, edges, integer PageRank.

Value truth comes from the DuckDB mirror in the ``host_graph`` oracle
row (tools/check_oracles.py); these tests pin the semantic contracts —
URL-resolution cases, PageRank's exact integer arithmetic on a
hand-computed graph, and the plan shape (no Python in the extraction
path, lineage truncated before the rank loop).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_content_extraction_benchmark_spark.operators.linkgraph import (
    BASE_MICRO,
    INIT_MICRO,
    extract_outlinks,
    host_edges,
    pagerank_hosts,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html_str string")


def test_resolution_cases(spark):
    html = (
        '<a href="/root">r</a>'
        '<a href="https://abs.example/p">a</a>'
        '<a href="HTTP://UP.EXAMPLE/Q">u</a>'
        '<a href="//proto.example/z">p</a>'
        '<a href="relative/path">rel</a>'
        '<a href="mailto:x@y.example">m</a>'
        '<a href="javascript:void(0)">j</a>'
        '<a href="#frag">f</a>'
        '<a href="">e</a>'
    )
    out = extract_outlinks(_pages(spark, [("https://src.example/a/1", html)]))
    got = {r.href: (r.dst_url, r.dst_host) for r in out.collect()}
    assert got == {
        "/root": ("https://src.example/root", "src.example"),
        "https://abs.example/p": ("https://abs.example/p", "abs.example"),
        # scheme case preserved in the URL, host lowercased for the graph
        "HTTP://UP.EXAMPLE/Q": ("HTTP://UP.EXAMPLE/Q", "up.example"),
        "//proto.example/z": ("https://proto.example/z", "proto.example"),
    }


def test_root_relative_keeps_base_port_and_drops_query(spark):
    out = extract_outlinks(
        _pages(spark, [("https://h.example:8443/p?x=1#f", '<a href="/q">l</a>')])
    ).collect()
    assert out[0].dst_url == "https://h.example:8443/q"
    assert out[0].src_host == "h.example:8443"


def test_host_edges_weights(spark):
    pages = _pages(spark, [
        ("https://a.example/1", '<a href="/x">1</a><a href="/y">2</a>'
                                '<a href="https://b.example/z">3</a>'),
        ("https://a.example/2", '<a href="https://b.example/w">4</a>'),
    ])
    edges = {(r.src_host, r.dst_host): r.n_links
             for r in host_edges(extract_outlinks(pages)).collect()}
    assert edges == {("a.example", "a.example"): 2,
                     ("a.example", "b.example"): 2}


def test_pagerank_hand_computed(spark):
    # a -> b (w 1); b dangles.  rank0 = 1_000_000 each.
    # iter1: contrib(b) = 1_000_000 DIV 1 = 1_000_000
    #        rank(b) = 150_000 + 850_000 = 1_000_000; rank(a) = 150_000
    # iter2: contrib(b) = 150_000 -> rank(b) = 150_000 + 127_500 = 277_500
    edges = spark.createDataFrame(
        [("a", "b", 1)], "src_host string, dst_host string, n_links long"
    )
    r1 = {r.host: r.rank_micro for r in pagerank_hosts(edges, 1).collect()}
    assert r1 == {"a": BASE_MICRO, "b": 1_000_000}
    r2 = {r.host: r.rank_micro for r in pagerank_hosts(edges, 2).collect()}
    assert r2 == {"a": BASE_MICRO, "b": 277_500}


def test_pagerank_integer_division_truncates(spark):
    # a -> {b, c} with weights 1, 2: contribs are (r*1) DIV 3, (r*2) DIV 3
    # iter1: b: 333_333 -> 150_000 + (333_333*850) DIV 1000 = 433_333
    #        c: 666_666 -> 150_000 + (666_666*850) DIV 1000 = 716_666
    edges = spark.createDataFrame(
        [("a", "b", 1), ("a", "c", 2)],
        "src_host string, dst_host string, n_links long",
    )
    got = {r.host: r.rank_micro for r in pagerank_hosts(edges, 1).collect()}
    assert got == {"a": BASE_MICRO, "b": 433_333, "c": 716_666}


def test_pagerank_zero_iterations_and_validation(spark):
    edges = spark.createDataFrame(
        [("a", "b", 1)], "src_host string, dst_host string, n_links long"
    )
    got = {r.host: r.rank_micro for r in pagerank_hosts(edges, 0).collect()}
    assert got == {"a": INIT_MICRO, "b": INIT_MICRO}
    with pytest.raises(ValueError, match="iterations"):
        pagerank_hosts(edges, -1)


def test_pagerank_loop_equals_fast_path(spark, monkeypatch):
    """r9: small host graphs iterate on the driver; the distributed
    loop must stay exactly equal (integer micro-units, DIV truncation
    included).  Force the loop by zeroing the fast-path threshold."""
    import random

    from web_content_extraction_benchmark_spark.operators import linkgraph

    rng = random.Random(5)
    hosts = [f"h{i}" for i in range(30)]
    edges = list({
        (rng.choice(hosts), rng.choice(hosts), rng.randrange(1, 5))
        for _ in range(120)
    })
    df = spark.createDataFrame(
        edges, "src_host string, dst_host string, n_links long"
    )
    for iters in (1, 3):
        fast = {(r.host, r.rank_micro)
                for r in linkgraph.pagerank_hosts(df, iters).collect()}
        monkeypatch.setattr(linkgraph, "PR_LOCAL_EDGE_THRESHOLD", 0)
        loop = {(r.host, r.rank_micro)
                for r in linkgraph.pagerank_hosts(df, iters).collect()}
        monkeypatch.undo()
        assert fast == loop


def test_pagerank_cycle_converges_toward_uniform(spark):
    # symmetric 2-cycle: ranks stay equal and head toward 1_000_000
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 1)],
        "src_host string, dst_host string, n_links long",
    )
    got = {r.host: r.rank_micro for r in pagerank_hosts(edges, 5).collect()}
    assert got["a"] == got["b"]
    assert abs(got["a"] - 1_000_000) < 5  # truncation drift only


def test_extraction_plan_is_pure_catalyst(spark):
    pages = _pages(spark, [("https://a.example/1", '<a href="/x">1</a>')])
    plan = extract_outlinks(pages)._jdf.queryExecution().executedPlan().toString()
    for marker in ("ArrowEvalPython", "BatchEvalPython", "FlatMapsInPandas"):
        assert marker not in plan
    edge_plan = (
        host_edges(extract_outlinks(pages))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # partial (map-side) aggregation before the host-pair exchange
    assert "partial_count" in edge_plan


def test_driver_row_arms(spark, sf_dir):
    import __spark_entry__ as entry

    out = entry.q_host_graph(spark, sf_dir)
    arms = {r["op"]: r["cnt"] for r in
            out.groupBy("op").agg(F.count("*").alias("cnt")).collect()}
    assert set(arms) == {"outlink", "edge", "rank", "anchor", "title",
                         "meta", "robots", "sitemap", "redir", "depth", "delay"}
    # hubs carry the full head-metadata kind set
    kinds = {r.b.split("|")[0] for r in
             out.filter(F.col("op") == "meta").select("b").collect()}
    assert kinds == {"meta", "prop", "canonical", "hreflang"}
    # the probe frontier exercises both REP verdicts
    verdicts = {r.b for r in
                out.filter(F.col("op") == "robots").select("b").collect()}
    assert verdicts == {"allow", "deny"}
    # hub pages guarantee cross-host edges beyond the self-loops
    cross = out.filter(
        (F.col("op") == "edge") & (F.col("a") != F.col("b"))
    ).count()
    assert cross > 0
    # every host present in the rank arm exactly once
    hosts = out.filter(F.col("op") == "edge").select(
        F.col("a").alias("h")
    ).unionByName(
        out.filter(F.col("op") == "edge").select(F.col("b").alias("h"))
    ).distinct().count()
    assert out.filter(F.col("op") == "rank").count() == hosts


def test_wat_records_shape_and_sorting(spark):
    from web_content_extraction_benchmark_spark.operators.linkgraph import (
        wat_records,
    )

    pages = _pages(spark, [
        ("https://a.example/1", '<a href="/z">1</a><a href="/a">2</a>'),
    ])
    rec = wat_records(extract_outlinks(pages)).collect()
    assert len(rec) == 1 and rec[0].n_links == 2
    # links sorted by href for byte-stable golden output
    assert [l.href for l in rec[0].links] == ["/a", "/z"]
    assert rec[0].links[0].target == "https://a.example/a"
    assert rec[0].links[0].host == "a.example"


def test_wat_records_full_title_and_anchor_text(spark):
    from web_content_extraction_benchmark_spark.operators.linkgraph import (
        page_links,
        wat_records_full,
    )

    pages = _pages(spark, [
        ("https://a.example/1",
         "<title> Page  One </title>"
         '<meta name="description" content="first page">'
         '<a href="/z">Z link</a><a href="/a">A <i>link</i></a>'
         '<link href="/style.css">'),
        ("https://a.example/2", "<p>no links, no title</p>"),
    ])
    rec = {r.url: r for r in wat_records_full(page_links(pages)).collect()}
    r1 = rec["https://a.example/1"]
    assert r1.title == "Page One" and r1.n_links == 2
    # <link href> is NOT an anchor element; links sorted by href
    assert [(l.href, l.text) for l in r1.links] == [
        ("/a", "A link"), ("/z", "Z link")]
    assert r1.links[0].target == "https://a.example/a"
    assert [(m.kind, m.key, m.value) for m in r1.metas] == [
        ("meta", "description", "first page")]
    r2 = rec["https://a.example/2"]
    assert r2.title == "" and r2.n_links == 0 and r2.links == []
    assert r2.metas == []


def test_cli_linkgraph(tmp_path, spark, sf_dir):
    from web_content_extraction_benchmark_spark.cli import main

    wat = str(tmp_path / "wat")
    pr = str(tmp_path / "pr")
    main(["linkgraph", "--sf-dir", sf_dir, "-o", wat, "--golden"])
    got = spark.read.json(wat)
    assert {"url", "links", "n_links"} <= set(got.columns)
    assert got.count() > 100  # 3 of 5 template variants carry links
    main(["linkgraph", "--sf-dir", sf_dir, "-o", pr, "--what", "pagerank",
          "--iterations", "2", "--golden"])
    ranks = spark.read.json(pr)
    assert ranks.count() == 41  # every host is self-linked via nav hrefs
    assert ranks.filter("rank_micro <= 0").count() == 0
    wf = str(tmp_path / "watfull")
    main(["linkgraph", "--sf-dir", sf_dir, "-o", wf, "--what", "wat-full",
          "--golden"])
    full = spark.read.json(wf)
    assert {"url", "title", "links", "n_links"} <= set(full.columns)
    assert full.filter("title <> ''").count() > 100


def test_extract_anchors_semantics(spark):
    from web_content_extraction_benchmark_spark.operators.linkgraph import (
        extract_anchors,
    )

    html = (
        '<a href="/a" class="x">One <b>bold</b>\n  multi</a>'
        '<link href="/style.css">'          # not an anchor ELEMENT
        '<a href="/b"></a>'                 # empty text kept
        '<a href="relative">dropped</a>'    # unresolvable -> dropped
        '<a href="https://t.example/p">T</a>'
    )
    got = {r.href: (r.anchor_text, r.dst_url) for r in extract_anchors(
        _pages(spark, [("https://s.example/1", html)])
    ).collect()}
    assert got == {
        "/a": ("One bold multi", "https://s.example/a"),
        "/b": ("", "https://s.example/b"),
        "https://t.example/p": ("T", "https://t.example/p"),
    }


def test_page_titles_first_match_squeezed(spark):
    from web_content_extraction_benchmark_spark.operators.linkgraph import (
        page_links,
        page_titles,
    )

    pages = _pages(spark, [
        ("u1", "<title>  A \n  B </title><title>second</title>"),
        ("u2", "<body>no title</body>"),
        ("u3", "<title></title>"),
    ])
    got = {r.url: r.title for r in page_titles(page_links(pages)).collect()}
    assert got == {"u1": "A B"}


def test_anchor_corpus_counts(spark):
    from web_content_extraction_benchmark_spark.operators.linkgraph import (
        anchor_corpus,
        extract_anchors,
    )

    pages = _pages(spark, [
        ("https://a.example/1", '<a href="https://t.example/">Home</a>'),
        ("https://b.example/2", '<a href="https://t.example/">Home</a>'
                                '<a href="https://t.example/">Start</a>'),
    ])
    corpus = {(r.target, r.anchor_text): r.n_anchors for r in
              anchor_corpus(extract_anchors(pages)).collect()}
    assert corpus == {("https://t.example/", "Home"): 2,
                      ("https://t.example/", "Start"): 1}
    by_host = {(r.target, r.anchor_text): r.n_anchors for r in
               anchor_corpus(extract_anchors(pages), by="dst_host").collect()}
    assert by_host[("t.example", "Home")] == 2


def test_extract_head_meta_semantics(spark):
    from web_content_extraction_benchmark_spark.operators.linkgraph import (
        extract_head_meta,
    )

    html = (
        '<head>'
        '<meta name="description" content="A page">'
        '<meta name="keywords" content="a,b">'
        '<meta charset="utf-8">'                       # no name= -> ignored
        '<meta property="og:title" content="OG A">'
        '<link rel="canonical" href="https://c.example/a">'
        '<link rel="canonical" href="https://c.example/SECOND">'  # first wins
        '<link rel="alternate" hreflang="de" href="https://c.example/de">'
        '</head>'
    )
    got = {(r.kind, r.key): r.value for r in extract_head_meta(
        _pages(spark, [("https://s.example/1", html)])
    ).collect()}
    assert got == {
        ("meta", "description"): "A page",
        ("meta", "keywords"): "a,b",
        ("prop", "og:title"): "OG A",
        ("canonical", ""): "https://c.example/a",
        ("hreflang", "de"): "https://c.example/de",
    }
    # a page with no head metadata contributes zero rows
    assert extract_head_meta(
        _pages(spark, [("u", "<body>plain</body>")])
    ).count() == 0


def test_link_metadata_plan_shapes(spark, sf_dir):
    """The raw bundle is ONE Arrow stage (the fused kernel, not one
    per field family); every Catalyst twin is Python-free."""
    from web_content_extraction_benchmark_spark.operators.linkgraph import (
        extract_anchors,
        extract_head_meta,
        page_links,
        page_links_raw,
        page_titles,
    )
    from web_content_extraction_benchmark_spark.sources.pages import (
        synthesize_pages,
    )

    raw_plan = page_links_raw(
        synthesize_pages(spark, sf_dir)
    )._jdf.queryExecution().executedPlan().toString()
    assert raw_plan.count("ArrowEvalPython") == 1

    pages = _pages(spark, [("https://a.example/1",
                            '<title>t</title><a href="/x">1</a>')])
    for df in (extract_anchors(pages), extract_head_meta(pages),
               page_titles(page_links(pages))):
        plan = df._jdf.queryExecution().executedPlan().toString()
        for marker in ("ArrowEvalPython", "BatchEvalPython",
                       "FlatMapsInPandas"):
            assert marker not in plan


def test_page_links_raw_equals_string_path(spark, sf_dir):
    """The fused decode+links kernel must produce exactly the bundle of
    the Catalyst twin over decoded text — anchors, titles and hrefs,
    including the corpus's gzip/BOM/cp1252 encoding variants."""
    from web_content_extraction_benchmark_spark.functions.udfs import (
        decode_html_udf,
    )
    from web_content_extraction_benchmark_spark.operators.linkgraph import (
        page_links,
        page_links_raw,
    )
    from web_content_extraction_benchmark_spark.sources.pages import (
        synthesize_pages,
    )

    pages = synthesize_pages(spark, sf_dir)
    via_string = page_links(
        pages.select("url", decode_html_udf(F.col("html")).alias("html_str"))
    )
    via_raw = page_links_raw(pages)
    assert via_raw.columns == via_string.columns
    assert via_raw.exceptAll(via_string).count() == 0
    assert via_string.exceptAll(via_raw).count() == 0


def test_extract_outlinks_raw_equals_string_path(spark, sf_dir):
    """The fused decode+href kernel (one Arrow crossing over raw bytes)
    must produce exactly the rows of decode_html_udf -> extract_outlinks
    — including over the corpus's gzip/BOM/cp1252 encoding variants."""
    from web_content_extraction_benchmark_spark.functions.udfs import (
        decode_html_udf,
    )
    from web_content_extraction_benchmark_spark.operators.linkgraph import (
        extract_outlinks_raw,
    )
    from web_content_extraction_benchmark_spark.sources.pages import (
        synthesize_pages,
    )

    pages = synthesize_pages(spark, sf_dir)
    via_string = extract_outlinks(
        pages.select("url", decode_html_udf(F.col("html")).alias("html_str"))
    )
    via_raw = extract_outlinks_raw(pages)
    assert via_raw.columns == via_string.columns
    assert via_raw.exceptAll(via_string).count() == 0
    assert via_string.exceptAll(via_raw).count() == 0


def test_resolve_redirects_semantics(spark):
    import duckdb

    from web_content_extraction_benchmark_spark.operators.linkgraph import (
        redirects_sql,
        resolve_redirects,
    )

    rows = [
        ("a1", "a2"), ("a2", "a3"), ("a3", "afinal"),   # 3-hop chain
        ("b1", "bfinal"),                               # 1 hop
        ("c1", "c2"), ("c2", "c1"),                     # 2-cycle
    ] + [(f"l{i}", f"l{i+1}") for i in range(12)]       # 12-hop > cap
    edges = spark.createDataFrame(
        rows, "url string, redirect_to string")
    got = {r.url: (r.final_url, r.hops, r.terminated)
           for r in resolve_redirects(edges, max_hops=8).collect()}
    assert got["a1"] == ("afinal", 3, True)
    assert got["a2"] == ("afinal", 2, True)
    assert got["b1"] == ("bfinal", 1, True)
    # cycle: exactly max_hops hops, back at the start, not terminated
    assert got["c1"] == ("c1", 8, False)
    assert got["c2"] == ("c2", 8, False)
    # over-cap chain: cut at 8 hops, not terminated
    assert got["l0"] == ("l8", 8, False)
    assert got["l5"] == ("l12", 7, True)

    con = duckdb.connect()
    con.execute("CREATE TABLE e(url VARCHAR, redirect_to VARCHAR)")
    con.executemany("INSERT INTO e VALUES (?,?)", rows)
    want = {u: (f, h, t) for u, f, h, t in con.execute(
        redirects_sql("SELECT * FROM e", max_hops=8)).fetchall()}
    assert got == want

    import pytest as _pytest
    with _pytest.raises(ValueError, match="power of two"):
        resolve_redirects(edges, max_hops=6)


def test_bfs_depths_semantics(spark):
    import duckdb

    from web_content_extraction_benchmark_spark.operators.linkgraph import (
        bfs_depths,
        bfs_depths_sql,
    )

    rows = [
        ("s", "a"), ("a", "b"), ("b", "c"),   # chain s->a->b->c
        ("a", "s"),                           # back edge (cycle safety)
        ("x", "y"),                           # disconnected island
        ("c", "a"),                           # cycle c->a
    ]
    edges = spark.createDataFrame(rows, "src_host string, dst_host string")
    seeds = spark.createDataFrame([("s",), ("lonely",)], "host string")
    got = {r.host: r.depth for r in bfs_depths(edges, seeds).collect()}
    # seed not in the graph still gets depth 0; island unreachable
    assert got == {"s": 0, "lonely": 0, "a": 1, "b": 2, "c": 3}

    # depth cap drops the deeper tail
    capped = {r.host: r.depth
              for r in bfs_depths(edges, seeds, max_depth=2).collect()}
    assert capped == {"s": 0, "lonely": 0, "a": 1, "b": 2}

    con = duckdb.connect()
    con.execute("CREATE TABLE e(src_host VARCHAR, dst_host VARCHAR)")
    con.executemany("INSERT INTO e VALUES (?,?)", rows)
    con.execute("CREATE TABLE sd(host VARCHAR)")
    con.executemany("INSERT INTO sd VALUES (?)", [("s",), ("lonely",)])
    for cap in (16, 2):
        want = dict(con.execute(bfs_depths_sql(
            "SELECT * FROM e", "SELECT * FROM sd", max_depth=cap
        )).fetchall())
        have = {r.host: r.depth
                for r in bfs_depths(edges, seeds, max_depth=cap).collect()}
        assert have == want

    import pytest as _p
    with _p.raises(ValueError, match="max_depth"):
        bfs_depths(edges, seeds, max_depth=-1)
