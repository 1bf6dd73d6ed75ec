"""robots.txt (Robots Exclusion Protocol) parsing + frontier filtering.

The gatekeeper every crawl pipeline runs BEFORE fetch scheduling: a
frontier of candidate URLs is joined against each host's robots.txt
rules and the disallowed rows dropped.  The reference engine (an
extraction scoring harness) has no crawler code; this module is built
from the public REP — the original 1994 convention plus the RFC 9309
core — minus wildcard patterns ('*' / '$'), which RFC 9309 makes
OPTIONAL for crawlers; prefix-only matching is the conservative subset
every implementation agrees on (documented contract; a URL denied
under prefix rules is denied under wildcard rules too whenever the
pattern is wildcard-free).

Semantics implemented (RFC 9309 §2):
- groups: one or more ``User-agent:`` lines followed by rules; ALL
  groups whose agent token matches are merged (RFC: "crawlers MUST
  combine groups");
- group selection: case-insensitive exact agent token match wins over
  the ``*`` group; if neither exists, everything is allowed;
- ``Allow:`` / ``Disallow:`` with an empty path are no-ops (the
  classic "Disallow:" = allow-everything idiom);
- matching: longest-path-prefix wins; on a length tie Allow wins; a
  URL matching no rule is allowed;
- comments (``#``) stripped, unknown directives (Crawl-delay, Sitemap,
  ...) ignored, header names case-insensitive.

Two layers:
1. ``parse_robots_txt`` — pure fn ``(txt, agent) -> [(path, allow)]``
   used by pytest directly and inside the Arrow kernel
   (``robots_rules``): parsing is Python (string munging, not worth a
   Catalyst contortion) but runs ONCE PER HOST, not per URL — a crawl
   has ~1e8 hosts vs ~1e12 URLs, so the Python stage is off the hot
   path by 4 orders of magnitude.
2. ``robots_filter`` — the per-URL matching, pure Catalyst: frontier
   joined to the (small, per-host) rule table — broadcastable below
   ~1e7 rules, hash-join on host above — then ONE aggregation takes
   ``max(struct(len(path), allow))`` per URL: struct ordering gives
   longest-match-wins with the Allow tie-break for free, no Window.
   ``robots_match_sql`` is the DuckDB mirror of the matching layer
   (same struct-max reduction via row_number), so the oracle gates the
   parser's output THROUGH the match: synthesized robots text parsed by
   the kernel must reproduce the mirror's closed-form rules or the
   verdict columns diverge.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

RULES_TYPE = T.ArrayType(
    T.StructType([
        T.StructField("path", T.StringType(), False),
        T.StructField("allow", T.BooleanType(), False),
    ])
)

_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"


def _parse_groups(txt: str):
    """robots.txt -> [(agents, rules, delays)] per group: the shared
    line discipline behind ``parse_robots_txt`` and
    ``parse_crawl_delay`` (comments stripped, header names
    case-insensitive, consecutive User-agent lines share one group)."""
    groups: list[tuple[list[str], list[tuple[str, bool]], list[float]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    cur_delays: list[float] = []
    in_header = False
    for raw_line in (txt or "").splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_header:
                if cur_agents:
                    groups.append((cur_agents, cur_rules, cur_delays))
                cur_agents, cur_rules, cur_delays = [], [], []
                in_header = True
            cur_agents.append(value.lower())
        else:
            in_header = False
            if field in ("allow", "disallow") and value:
                cur_rules.append((value, field == "allow"))
            elif field == "crawl-delay":
                try:
                    delay = float(value)
                except ValueError:
                    pass  # malformed delay: ignored like any bad line
                else:
                    # ADVICE r8: 'Crawl-delay: nan' poisons the max()
                    # merge and a negative/inf delay corrupts scheduler
                    # pacing — only finite non-negative values count
                    if math.isfinite(delay) and delay >= 0:
                        cur_delays.append(delay)
    if cur_agents:
        groups.append((cur_agents, cur_rules, cur_delays))
    return groups


def _matched_groups(groups, agent: str):
    agent = agent.lower()
    if any(agent in agents for agents, _, _ in groups):
        return [g for g in groups if agent in g[0]]
    return [g for g in groups if "*" in g[0]]


def parse_robots_txt(txt: str, agent: str = "*") -> list[tuple[str, bool]]:
    """robots.txt text -> ordered [(path_prefix, allow)] rules for
    ``agent`` (exact case-insensitive token match, falling back to the
    ``*`` group).  Empty-path rules are dropped (REP no-ops)."""
    return [r for _, rules, _ in _matched_groups(_parse_groups(txt), agent)
            for r in rules]


def parse_crawl_delay(txt: str, agent: str = "*") -> float | None:
    """The agent's Crawl-delay in seconds, or None.  Same group
    selection as the rules; when merged groups disagree the MAXIMUM
    wins (the politeness-safe reading — Crawl-delay is not in RFC 9309,
    so the conservative choice is the defensible one)."""
    delays = [d for _, _, ds in _matched_groups(_parse_groups(txt), agent)
              for d in ds]
    return max(delays) if delays else None


def robots_rules(robots: DataFrame, agent: str = "*",
                 host_col: str = "host",
                 txt_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) -> long rule rows (host, path, allow).  The
    Arrow kernel runs once per HOST; hosts with no applicable rules
    contribute zero rows (their URLs pass ``robots_filter`` by the
    no-match default)."""

    @pandas_udf(RULES_TYPE)
    def _parse(txt: pd.Series) -> pd.Series:
        return txt.map(lambda t: [
            {"path": p, "allow": a} for p, a in parse_robots_txt(t, agent)
        ])

    return (
        robots.select(
            F.col(host_col).alias("host"),
            F.explode(_parse(F.col(txt_col))).alias("r"),
        )
        .select("host", F.col("r.path").alias("path"),
                F.col("r.allow").alias("allow"))
    )


def crawl_delays(robots: DataFrame, agent: str = "*",
                 host_col: str = "host",
                 txt_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) -> (host, crawl_delay DOUBLE) for hosts whose
    policy sets one — the per-host pacing input of a fetch scheduler.
    Same once-per-host Arrow kernel shape as ``robots_rules``."""

    @pandas_udf(T.DoubleType())
    def _delay(txt: pd.Series) -> pd.Series:
        return txt.map(lambda t: parse_crawl_delay(t, agent))

    return (
        robots.select(
            F.col(host_col).alias("host"),
            _delay(F.col(txt_col)).alias("crawl_delay"),
        )
        .filter(F.col("crawl_delay").isNotNull())
    )


def robots_filter(frontier: DataFrame, rules: DataFrame,
                  url_col: str = "url",
                  keep_denied: bool = False,
                  broadcast_rules: bool = True) -> DataFrame:
    """Frontier URLs -> the same rows plus ``robots_allowed`` (and only
    the allowed ones unless ``keep_denied``).  Longest-prefix-wins with
    Allow tie-break via one ``max(struct)`` aggregation — no Window, so
    the per-URL cost is a map-side-combinable agg after the rule join.
    The join key is the URL's host; rules tables are per-host and tiny
    relative to any frontier, so the rules side is BROADCAST by default
    (the frontier then never shuffles for the join — only the verdict
    agg exchanges, at frontier-row cardinality); pass
    ``broadcast_rules=False`` for a pathological rules table."""
    # ADVICE r8: the staged/rules working columns are reserved — a
    # frontier already carrying one would silently produce ambiguous
    # references or wrong grouping, so collide loudly instead.  NB the
    # groupBy(*frontier.columns) also collapses fully-duplicate
    # frontier rows to one (documented behavior: the verdict is a
    # per-URL-row fact, identical rows get one identical verdict row).
    reserved = {"_host", "_path", "_r_path", "_allow"}
    clash = reserved & set(frontier.columns)
    if clash:
        raise ValueError(
            f"frontier carries reserved robots_filter column(s) "
            f"{sorted(clash)} — rename them before filtering"
        )
    host = F.lower(
        F.regexp_extract(F.col(url_col),
                         r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    path_raw = F.regexp_extract(F.col(url_col), _PATH_RE, 1)
    path = F.when(path_raw == "", "/").otherwise(path_raw)
    staged = frontier.withColumn("_host", host).withColumn("_path", path)
    rules_side = rules.select(
        F.col("host").alias("_host"),
        F.col("path").alias("_r_path"),
        F.col("allow").cast("int").alias("_allow"),
    )
    if broadcast_rules:
        rules_side = F.broadcast(rules_side)
    joined = staged.join(rules_side, "_host", "left")
    hit = F.col("_r_path").isNotNull() & F.col("_path").startswith(
        F.col("_r_path")
    )
    verdict = (
        joined.groupBy(*frontier.columns)
        .agg(
            F.max(
                F.when(hit, F.struct(
                    F.length("_r_path").alias("l"),
                    F.col("_allow").alias("a"),
                ))
            ).alias("m")
        )
        .withColumn(
            "robots_allowed",
            F.coalesce(F.col("m.a") == 1, F.lit(True)),
        )
        .drop("m")
    )
    if keep_denied:
        return verdict
    return verdict.filter(F.col("robots_allowed")).drop("robots_allowed")


def robots_match_sql(frontier_cte: str, rules_cte: str,
                     url_expr: str = "url") -> str:
    """DuckDB mirror of ``robots_filter(..., keep_denied=True)`` over
    CTE bodies selecting the frontier rows and (host, path, allow)
    rules.  row_number over (len(path) DESC, allow DESC) is the same
    total order as the Spark struct-max."""
    return f"""
        WITH frontier AS ({frontier_cte}),
        rules AS ({rules_cte}),
        staged AS (
            SELECT f.*,
                   lower(regexp_extract({url_expr},
                         '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))
                       AS _host,
                   CASE WHEN regexp_extract({url_expr},
                             '{_PATH_RE}', 1) = '' THEN '/'
                        ELSE regexp_extract({url_expr}, '{_PATH_RE}', 1)
                   END AS _path
            FROM frontier f
        ),
        matched AS (
            SELECT s.*, r.path AS _rpath, r.allow AS _rallow,
                   row_number() OVER (
                       PARTITION BY s.{url_expr}
                       ORDER BY CASE WHEN r.path IS NOT NULL
                                     AND starts_with(s._path, r.path)
                                THEN len(r.path) ELSE -1 END DESC,
                                CASE WHEN r.allow THEN 1 ELSE 0 END DESC
                   ) AS _rn
            FROM staged s LEFT JOIN rules r ON s._host = r.host
        )
        SELECT * EXCLUDE (_host, _path, _rpath, _rallow, _rn),
               CASE WHEN _rpath IS NOT NULL
                    AND starts_with(_path, _rpath)
                    THEN _rallow ELSE TRUE END AS robots_allowed
        FROM matched WHERE _rn = 1
    """
