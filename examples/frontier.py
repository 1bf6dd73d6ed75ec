"""Crawl-frontier story: discovery -> policy -> canonical dedup ->
politeness quota -> a sorted, seekable frontier.

    spark-submit --master local[8] --py-files wceb_spark.zip \
        examples/frontier.py [out_dir]

This is the operator chain a crawl scheduler runs BEFORE any fetch,
built entirely from the crawl-metadata suite:

1. ``parse_sitemaps``       — per-host sitemap documents (urlset +
   sitemapindex) become candidate URL rows with freshness hints; the
   ``Sitemap:`` directives come from the robots corpus via
   ``sitemap_urls_from_robots``.
2. ``canonicalize_urls``    — scheme/host case, default ports,
   tracking params and fragments folded so the same page under six
   spellings becomes ONE frontier row (exact dedup on the canonical
   form).  Canonicalization runs BEFORE the policy gate on purpose:
   robots rules join on the url's host, and an uppercase-host or
   explicit-:443 spelling would otherwise slip past a deny rule keyed
   on the canonical host.
3. ``robots_rules`` + ``robots_filter`` — the REP gate: rules are
   parsed once per HOST (Arrow kernel), the per-URL verdict is one
   Catalyst max(struct) aggregation, and disallowed candidates drop
   here — before fetch capacity is spent on them.
4. ``surt_key``             — the CDX-style sort key; sorting the
   frontier by SURT groups every host and registrable domain into a
   contiguous range, which is what lets a fetch scheduler slice work
   per-domain with a prefix seek instead of a shuffle.
5. ``quota_per_key``        — per-host politeness cap, applied
   map-side before the exchange (WindowGroupLimit), so a hot host
   cannot flood the frontier.
6. ``crawl_delays``         — each host's Crawl-delay joins on so the
   scheduler that consumes this frontier has its pacing next to its
   work (null = no directive, scheduler default applies).

The pytest twin (tests/test_frontier_example.py) drives a synthetic
host set through `build_frontier` and pins the policy, dedup, quota
and ordering properties.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_content_extraction_benchmark_spark.operators.robots import (
    crawl_delays,
    robots_filter,
    robots_rules,
)
from web_content_extraction_benchmark_spark.operators.sampling import (
    quota_per_key,
)
from web_content_extraction_benchmark_spark.operators.sitemaps import (
    parse_sitemaps,
)
from web_content_extraction_benchmark_spark.operators.urls import (
    canonicalize_urls,
    surt_key,
)

PER_HOST_QUOTA = 100


def build_frontier(robots: DataFrame, sitemaps: DataFrame,
                   quota: int = PER_HOST_QUOTA) -> DataFrame:
    """(host, robots_txt) + (url, xml) -> frontier rows
    (surt, url, host, lastmod, priority, crawl_delay), robots-filtered,
    canonical-deduplicated, per-host capped, SURT-ordered."""
    candidates = (
        parse_sitemaps(sitemaps)
        .filter(F.col("kind") == "url")
        .select(F.col("loc").alias("url"), "lastmod", "priority")
    )
    canon = canonicalize_urls(candidates, "url", out_col="canonical_url")
    # exact dedup on the canonical form: all spellings of a page
    # collapse to one row (deterministic hint winner), BEFORE the
    # policy join so no spelling can evade a host's rules
    winners = (
        canon.groupBy("canonical_url")
        .agg(F.min(F.struct("lastmod", "priority")).alias("w"))
        .select(
            F.col("canonical_url").alias("url"),
            F.col("w.lastmod").alias("lastmod"),
            F.col("w.priority").alias("priority"),
        )
    )
    allowed = robots_filter(winners, robots_rules(robots))
    keyed = allowed.select(
        surt_key(F.col("url")).alias("surt"),
        "url",
        F.lower(F.regexp_extract(
            "url", r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1
        )).alias("host"),
        "lastmod", "priority",
    )
    capped = quota_per_key(keyed, quota, key_col="host", order_col="surt")
    return capped.join(
        F.broadcast(crawl_delays(robots)), "host", "left"
    )


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/frontier_out"
    spark = SparkSession.builder.getOrCreate()

    # demo corpus: 5 hosts, one sitemap each, one host with a deny-all
    hosts = [f"h{i}.example" for i in range(5)]
    robots = spark.createDataFrame(
        [(h,
          "User-agent: *\nDisallow: /\n" if i == 4 else
          "User-agent: *\nDisallow: /private/\n")
         for i, h in enumerate(hosts)],
        "host string, robots_txt string",
    )
    entries = [
        (f"https://{h}/sitemap.xml",
         "<urlset>" + "".join(
             f"<url><loc>https://{h}/d/{j}</loc>"
             f"<priority>0.{j % 10}</priority></url>"
             f"<url><loc>https://{h}/private/{j}</loc></url>"
             for j in range(150)
         ) + "</urlset>")
        for h in hosts
    ]
    sitemaps = spark.createDataFrame(entries, "url string, xml string")

    frontier = build_frontier(robots, sitemaps)
    from web_content_extraction_benchmark_spark.sources.jsonl import (
        write_jsonl,
    )

    write_jsonl(frontier, out_dir, sort_by="surt", golden=True)
    print(f"frontier rows: {frontier.count()} -> {out_dir}")
    spark.stop()


if __name__ == "__main__":
    main()
