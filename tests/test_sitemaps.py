"""Sitemap protocol parsing (operators/sitemaps.py): entry extraction
with independently-optional fields, index documents, and the robots
``Sitemap:`` directive bridge."""

from __future__ import annotations

import duckdb

from web_content_extraction_benchmark_spark.operators.sitemaps import (
    parse_sitemaps,
    sitemap_urls_from_robots,
    sitemaps_sql,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://h.example/a</loc>
    <lastmod>2023-04-01</lastmod>
    <priority>0.8</priority>
  </url>
  <url>
    <loc> https://h.example/b </loc>
    <changefreq>daily</changefreq>
  </url>
  <url><lastmod>2023-01-01</lastmod></url>
</urlset>
"""

INDEX = """<sitemapindex>
  <sitemap><loc>https://h.example/s1.xml</loc></sitemap>
  <sitemap><loc>https://h.example/s2.xml</loc>
           <lastmod>2023-02-02</lastmod></sitemap>
</sitemapindex>
"""


def _rows(spark, xml):
    df = spark.createDataFrame(
        [("https://h.example/sitemap.xml", xml)], "url string, xml string")
    return {(r.kind, r.loc): (r.lastmod, r.changefreq, r.priority)
            for r in parse_sitemaps(df).collect()}


def test_urlset_entries_optional_fields_independent(spark):
    got = _rows(spark, URLSET)
    # entry without <loc> is invalid -> dropped; whitespace trimmed;
    # a missing optional in one entry must NOT shift another's fields
    assert got == {
        ("url", "https://h.example/a"): ("2023-04-01", "", "0.8"),
        ("url", "https://h.example/b"): ("", "daily", ""),
    }


def test_sitemapindex_entries(spark):
    got = _rows(spark, INDEX)
    assert got == {
        ("sitemap", "https://h.example/s1.xml"): ("", "", ""),
        ("sitemap", "https://h.example/s2.xml"): ("2023-02-02", "", ""),
    }


def test_duckdb_mirror_lockstep(spark):
    for xml in (URLSET, INDEX, "<urlset></urlset>"):
        got = _rows(spark, xml)
        con = duckdb.connect()
        con.execute("CREATE OR REPLACE TABLE c(url VARCHAR, xml VARCHAR)")
        con.execute("INSERT INTO c VALUES (?, ?)",
                    ["https://h.example/sitemap.xml", xml])
        want = {
            (k, l): (lm, cf, p)
            for _, k, l, lm, cf, p in con.execute(
                sitemaps_sql("SELECT url, xml FROM c")).fetchall()
        }
        assert got == want, xml


def test_xml_entity_unescaping(spark):
    xml = ("<urlset><url>"
           "<loc>https://h.example/d?a=1&amp;b=2&amp;lt;</loc>"
           "<lastmod>&quot;2023&quot;</lastmod>"
           "</url></urlset>")
    got = _rows(spark, xml)
    # &amp; -> & ; &amp;lt; -> literal "&lt;" (NOT "<" — amp resolves
    # last, exactly once)
    assert got == {
        ("url", "https://h.example/d?a=1&b=2&lt;"): ('"2023"', "", ""),
    }


def test_sitemap_urls_from_robots():
    txt = ("User-agent: *\nDisallow: /p/\n"
           "Sitemap: https://h.example/sitemap.xml  # main\n"
           "sitemap: https://h.example/news.xml\n"
           "Sitemap:\n")
    assert sitemap_urls_from_robots(txt) == [
        "https://h.example/sitemap.xml",
        "https://h.example/news.xml",
    ]
    assert sitemap_urls_from_robots("") == []
    assert sitemap_urls_from_robots(None) == []
