"""examples/frontier.py — the crawl-discovery operator story
(sitemaps -> robots -> canonical dedup -> SURT order -> host quota)."""

from __future__ import annotations

import importlib.util
import os

from pyspark.sql import functions as F

_spec = importlib.util.spec_from_file_location(
    "frontier_example",
    os.path.join(os.path.dirname(__file__), "..", "examples",
                 "frontier.py"),
)
frontier_example = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and frontier_example)


def test_build_frontier_properties(spark):
    robots = spark.createDataFrame(
        [("a.example",
          "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"),
         ("b.example", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    entries = []
    for h in ("a.example", "b.example"):
        xml = "<urlset>" + "".join(
            # three spellings of the same page -> ONE canonical row
            f"<url><loc>https://{h}/d/{j}?b=2&amp;a=1</loc></url>"
            f"<url><loc>HTTPS://{h.upper()}:443/d/{j}?a=1&amp;b=2</loc></url>"
            f"<url><loc>https://{h}/d/{j}?a=1&amp;b=2#frag</loc></url>"
            f"<url><loc>https://{h}/private/{j}</loc></url>"
            for j in range(8)
        ) + "</urlset>"
        entries.append((f"https://{h}/sitemap.xml", xml))
    sitemaps = spark.createDataFrame(entries, "url string, xml string")

    rows = frontier_example.build_frontier(
        robots, sitemaps, quota=5).collect()

    # deny-all host contributes nothing; /private/ rows dropped
    hosts = {r.host for r in rows}
    assert hosts == {"a.example"}
    assert all("/private/" not in r.url for r in rows)
    # HTML-entity escapes are NOT url escapes: the three spellings
    # collapse to one canonical row per page id
    assert len({r.url for r in rows}) == len(rows)
    # quota caps the 8 distinct pages to 5
    assert len(rows) == 5
    # every url is the canonical form (sorted params, no fragment,
    # lowercase host, no default port)
    for r in rows:
        assert r.url.startswith("https://a.example/d/")
        assert "#" not in r.url and ":443" not in r.url
        assert r.surt.startswith("example,a)")
    # SURT keys are the deterministic order key
    surts = [r.surt for r in rows]
    assert surts == sorted(surts)
    # pacing rides along: a.example's Crawl-delay joined onto every row
    assert all(r.crawl_delay == 2.0 for r in rows)
