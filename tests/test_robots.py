"""robots.txt REP semantics (operators/robots.py): parser contract,
longest-match filtering, and the Spark==DuckDB matching lockstep."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from web_content_extraction_benchmark_spark.operators.robots import (
    parse_robots_txt,
    robots_filter,
    robots_match_sql,
    robots_rules,
)

BASIC = """
# crawler policy
User-agent: badbot
Disallow: /

User-agent: *
Disallow: /private/
Allow: /private/ok/
Crawl-delay: 10
Sitemap: https://h.example/sitemap.xml
"""


def test_parser_group_selection_and_directives():
    assert parse_robots_txt(BASIC) == [
        ("/private/", False), ("/private/ok/", True)]
    assert parse_robots_txt(BASIC, agent="badbot") == [("/", False)]
    # unknown agent falls back to the * group
    assert parse_robots_txt(BASIC, agent="goodbot") == [
        ("/private/", False), ("/private/ok/", True)]
    # header names and agent tokens are case-insensitive
    assert parse_robots_txt("USER-AGENT: BadBot\nDISALLOW: /x",
                            agent="badbot") == [("/x", False)]


def test_parser_edge_cases():
    # empty-path rules are REP no-ops
    assert parse_robots_txt("User-agent: *\nDisallow:") == []
    # rules before any user-agent line are invalid -> dropped
    assert parse_robots_txt("Disallow: /x\nUser-agent: *\nAllow: /y") == [
        ("/y", True)]
    # consecutive user-agent lines share one group; groups for the same
    # agent MERGE (RFC 9309)
    txt = ("User-agent: a\nUser-agent: b\nDisallow: /one\n"
           "User-agent: a\nDisallow: /two\n")
    assert parse_robots_txt(txt, agent="a") == [
        ("/one", False), ("/two", False)]
    assert parse_robots_txt(txt, agent="b") == [("/one", False)]
    # no matching group and no * group -> everything allowed
    assert parse_robots_txt("User-agent: x\nDisallow: /", agent="y") == []
    assert parse_robots_txt("") == []
    assert parse_robots_txt(None) == []


def _verdicts(spark, robots_txt: str, urls: list[str]) -> dict[str, bool]:
    robots = spark.createDataFrame(
        [("h.example", robots_txt)], "host string, robots_txt string")
    frontier = spark.createDataFrame([(u,) for u in urls], "url string")
    out = robots_filter(
        frontier, robots_rules(robots), keep_denied=True)
    return {r.url: r.robots_allowed for r in out.collect()}


def test_longest_match_and_tie_break(spark):
    got = _verdicts(spark, BASIC, [
        "https://h.example/private/x",        # deny  (/private/)
        "https://h.example/private/ok/1",     # allow (longer Allow wins)
        "https://h.example/public/a",         # allow (no match)
        "https://h.example",                  # allow ('' path -> '/')
        "https://h.example/privateer",        # allow (prefix is /private/)
        "https://other.example/private/x",    # allow (no rules for host)
    ])
    assert got == {
        "https://h.example/private/x": False,
        "https://h.example/private/ok/1": True,
        "https://h.example/public/a": True,
        "https://h.example": True,
        "https://h.example/privateer": True,
        "https://other.example/private/x": True,
    }
    # equal-length Allow and Disallow -> Allow wins (RFC 9309)
    tie = "User-agent: *\nDisallow: /a/\nAllow: /a/\n"
    assert _verdicts(spark, tie, ["https://h.example/a/x"]) == {
        "https://h.example/a/x": True}


def test_filter_drops_denied_rows(spark):
    robots = spark.createDataFrame(
        [("h.example", "User-agent: *\nDisallow: /no/")],
        "host string, robots_txt string")
    frontier = spark.createDataFrame(
        [("https://h.example/no/1", 7), ("https://h.example/yes/1", 8)],
        "url string, doc_id long")
    kept = robots_filter(frontier, robots_rules(robots)).collect()
    assert [(r.url, r.doc_id) for r in kept] == [
        ("https://h.example/yes/1", 8)]


def test_match_duckdb_lockstep(spark):
    """The Catalyst struct-max verdict must equal the SQL row_number
    mirror rule-for-rule, including the no-rules and tie cases."""
    rules_rows = [
        ("h.example", "/p/", False),
        ("h.example", "/p/ok/", True),
        ("h.example", "/q", False),
        ("h.example", "/q", True),        # tie -> allow
    ]
    urls = [
        "https://h.example/p/x", "https://h.example/p/ok/x",
        "https://h.example/q", "https://h.example/qq",
        "https://h.example/", "https://bare.example",
        "https://h.example/p/ok",         # shorter than the Allow rule
    ]
    rules = spark.createDataFrame(
        rules_rows, "host string, path string, allow boolean")
    frontier = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r.url: r.robots_allowed for r in robots_filter(
        frontier, rules, keep_denied=True).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE r(host VARCHAR, path VARCHAR, allow BOOLEAN)")
    con.executemany("INSERT INTO r VALUES (?,?,?)", rules_rows)
    con.execute("CREATE TABLE f(url VARCHAR)")
    con.executemany("INSERT INTO f VALUES (?)", [(u,) for u in urls])
    sql = robots_match_sql("SELECT url FROM f", "SELECT * FROM r")
    want = dict(con.execute(sql).fetchall())
    assert got == want
    assert got["https://h.example/p/x"] is False
    assert got["https://h.example/q"] is True          # tie -> allow
    assert got["https://h.example/p/ok"] is False      # /p/ wins over
    assert got["https://bare.example"] is True


def test_plan_is_aggregation_not_window(spark):
    """The per-URL verdict is a groupBy max(struct) — map-side
    combinable — not a Window sort."""
    rules = spark.createDataFrame(
        [("h.example", "/p/", False)],
        "host string, path string, allow boolean")
    frontier = spark.createDataFrame(
        [("https://h.example/p/x",)], "url string")
    plan = robots_filter(
        frontier, rules, keep_denied=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_max" in plan
    # the per-host rules side broadcasts: the frontier never shuffles
    # for the join
    assert "Broadcast" in plan and "SortMergeJoin" not in plan


def test_parse_crawl_delay():
    from web_content_extraction_benchmark_spark.operators.robots import (
        parse_crawl_delay,
    )

    txt = ("User-agent: fast\nCrawl-delay: 0.5\n"
           "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n"
           "User-agent: *\nCrawl-delay: 7\n")
    # merged * groups -> MAX wins (politeness-safe)
    assert parse_crawl_delay(txt) == 7.0
    assert parse_crawl_delay(txt, agent="fast") == 0.5
    # no delay anywhere -> None; malformed ignored
    assert parse_crawl_delay("User-agent: *\nDisallow: /x") is None
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: soon") is None
    assert parse_crawl_delay("") is None


def test_crawl_delays_frame(spark):
    from web_content_extraction_benchmark_spark.operators.robots import (
        crawl_delays,
    )

    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nCrawl-delay: 3"),
         ("b.example", "User-agent: *\nDisallow: /x")],
        "host string, robots_txt string")
    got = {r.host: r.crawl_delay for r in crawl_delays(robots).collect()}
    assert got == {"a.example": 3.0}


def test_parse_crawl_delay_rejects_nonfinite_and_negative():
    """ADVICE r8: NaN poisons the max() merge and negative/inf delays
    corrupt scheduler pacing — only finite non-negative values count."""
    from web_content_extraction_benchmark_spark.operators.robots import (
        parse_crawl_delay,
    )

    txt = ("User-agent: *\n"
           "Crawl-delay: nan\n"
           "Crawl-delay: inf\n"
           "Crawl-delay: -3\n"
           "Crawl-delay: 4\n")
    assert parse_crawl_delay(txt) == 4.0
    only_bad = "User-agent: *\nCrawl-delay: nan\nCrawl-delay: -1\n"
    assert parse_crawl_delay(only_bad) is None


def test_robots_filter_reserved_columns_and_path_passthrough(spark):
    """ADVICE r8: a frontier carrying a 'path' column must filter
    cleanly (the rules side uses reserved _r_path now), and reserved
    working columns collide loudly."""
    import pytest
    from pyspark.sql import functions as F

    from web_content_extraction_benchmark_spark.operators.robots import (
        robots_filter,
    )

    rules = spark.createDataFrame(
        [("a.example", "/private", False), ("a.example", "/", True)],
        "host string, path string, allow boolean",
    )
    frontier = spark.createDataFrame(
        [("https://a.example/private/x", "keep-me"),
         ("https://a.example/ok", "keep-me-too")],
        "url string, path string",  # user 'path' column must pass through
    )
    got = {(r.url, r.path) for r in robots_filter(frontier, rules).collect()}
    assert got == {("https://a.example/ok", "keep-me-too")}
    bad = frontier.withColumn("_host", F.lit("x"))
    with pytest.raises(ValueError, match="reserved"):
        robots_filter(bad, rules)
