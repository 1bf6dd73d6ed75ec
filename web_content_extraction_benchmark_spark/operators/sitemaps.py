"""Sitemap protocol (sitemaps.org XML) parsing — the discovery side of
the crawl-metadata suite: robots.txt points at sitemaps (``Sitemap:``
directives), sitemaps enumerate fetchable URLs with freshness hints,
and the parsed rows feed the frontier that ``operators/robots.py``
then filters.  The reference engine has no crawler; built from the
public sitemaps.org 0.9 protocol.

Shape: pure Catalyst.  A sitemap document is either a ``<urlset>`` of
``<url>`` entries or a ``<sitemapindex>`` of ``<sitemap>`` entries;
entries carry ``<loc>`` (required) and optional ``<lastmod>`` /
``<changefreq>`` / ``<priority>``.  Because the optional children make
parallel-array zipping unsound (a missing ``<lastmod>`` in one entry
would shift every later pairing), extraction is two-stage: explode the
ENTRY BLOCKS first (one ``regexp_extract_all`` per block kind), then
per-block single extracts — each row's fields come from its own block,
so optional fields are independent per entry.  Values are trimmed and
the five predefined XML entities unescaped (the protocol REQUIRES
escaping in ``<loc>``, so ``&amp;`` in a sitemap is a literal ``&`` in
the URL); ``&amp;`` is replaced LAST so ``&amp;lt;`` correctly yields
the literal text ``&lt;`` — mirrored replace-for-replace in SQL.

100 TB shape: sitemap corpora are ~1 file per host (1e8 rows, ~KB
each) — the parse is a per-row flatMap with no shuffle, and the result
joins the frontier on host like the robots rules do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

URL_BLOCK_PATTERN = r"(?s)<url>(.*?)</url>"
INDEX_BLOCK_PATTERN = r"(?s)<sitemap>(.*?)</sitemap>"
LOC_PATTERN = r"(?s)<loc>([^<]*)</loc>"
LASTMOD_PATTERN = r"(?s)<lastmod>([^<]*)</lastmod>"
CHANGEFREQ_PATTERN = r"(?s)<changefreq>([^<]*)</changefreq>"
PRIORITY_PATTERN = r"(?s)<priority>([^<]*)</priority>"


# &amp; must come LAST: "&amp;lt;" is the escaped literal "&lt;", and
# unescaping &lt; first cannot touch it (no '<' precedes), while
# unescaping &amp; first would create a new &lt; for a later pass
XML_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                ("&apos;", "'"), ("&amp;", "&")]


def _unescape(col: Column) -> Column:
    for ent, ch in XML_ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _entry_fields(block: Column) -> list[Column]:
    def field(pattern: str, name: str) -> Column:
        return _unescape(
            F.trim(F.regexp_extract(block, pattern, 1))
        ).alias(name)

    return [
        field(LOC_PATTERN, "loc"),
        field(LASTMOD_PATTERN, "lastmod"),
        field(CHANGEFREQ_PATTERN, "changefreq"),
        field(PRIORITY_PATTERN, "priority"),
    ]


def parse_sitemaps(df: DataFrame, xml_col: str = "xml",
                   url_col: str = "url") -> DataFrame:
    """(sitemap url, xml text) rows -> one row per entry:
    (url, kind, loc, lastmod, changefreq, priority) with kind 'url'
    (urlset entry) or 'sitemap' (sitemapindex entry — follow these to
    fetch the child sitemaps).  Entries without a ``<loc>`` are invalid
    per the protocol and dropped; optional fields are '' when absent."""
    parts = []
    for kind, pattern in (("url", URL_BLOCK_PATTERN),
                          ("sitemap", INDEX_BLOCK_PATTERN)):
        blocks = df.select(
            F.col(url_col).alias("url"),
            F.explode(
                F.regexp_extract_all(F.col(xml_col), F.lit(pattern), 1)
            ).alias("b"),
        )
        parts.append(blocks.select(
            "url", F.lit(kind).alias("kind"), *_entry_fields(F.col("b"))
        ).filter(F.col("loc") != ""))
    return parts[0].unionByName(parts[1])


def sitemaps_sql(corpus_cte: str) -> str:
    """DuckDB mirror of ``parse_sitemaps`` over a CTE body selecting
    (url, xml) — same two-stage block explode, same patterns."""
    def unescape(expr: str) -> str:
        for ent, ch in XML_ENTITIES:
            ch_sql = ch.replace("'", "''")
            expr = f"replace({expr}, '{ent}', '{ch_sql}')"
        return expr

    def field(pattern: str, name: str) -> str:
        return (unescape(f"trim(regexp_extract(b, '{pattern}', 1))")
                + f" AS {name}")

    def arm(kind: str, pattern: str) -> str:
        return f"""
            SELECT url, '{kind}' AS kind,
                   {field(LOC_PATTERN, "loc")},
                   {field(LASTMOD_PATTERN, "lastmod")},
                   {field(CHANGEFREQ_PATTERN, "changefreq")},
                   {field(PRIORITY_PATTERN, "priority")}
            FROM (
                SELECT url,
                       unnest(regexp_extract_all(xml, '{pattern}', 1)) AS b
                FROM corpus
            )
        """

    return f"""
        WITH corpus AS ({corpus_cte})
        SELECT * FROM ({arm("url", URL_BLOCK_PATTERN)}) WHERE loc <> ''
        UNION ALL
        SELECT * FROM ({arm("sitemap", INDEX_BLOCK_PATTERN)})
        WHERE loc <> ''
    """


def sitemap_urls_from_robots(txt: str) -> list[str]:
    """``Sitemap:`` directives from robots.txt text (case-insensitive,
    comments stripped) — the links from the policy file to the
    discovery files.  Pure fn, pytest-pinned alongside
    ``robots.parse_robots_txt`` (same line discipline)."""
    out = []
    for raw_line in (txt or "").splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    return out
