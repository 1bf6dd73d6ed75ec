"""URL canonicalization for crawl dedup: the same page arrives under
scheme/host case variants, default ports, tracking parameters,
shuffled query order, and fragments — canonicalize BEFORE exact/near
dedup or per-host quotas, or every variant counts as a distinct
document (and a host quota under-counts its hot host).

Rules (the conservative, reversibility-safe core):
- scheme and host lowercased;
- default port stripped (:80 for http, :443 for https);
- empty path -> '/';
- query parameters: tracking params dropped (utm_*, fbclid, gclid),
  the rest SORTED lexicographically (order-insensitive equality);
- fragment dropped.

Scale shape: pure string/array column expressions — JVM-side,
whole-stage-codegen, per-row, no shuffle.  Every construct sits in the
Java-regex/RE2 common subset and has a DuckDB twin
(``canonical_url_sql``), so an independent engine reproduces the
output byte-for-byte; non-URL strings (no ``scheme://``) pass through
unchanged."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# query is extracted from the PRE-FRAGMENT substring (see _FRAG_RE):
# an unanchored \? over the whole url would resurrect a '?' inside an
# SPA-style fragment ('#/route?x=1') as query params
_FRAG_RE = r"#.*$"
_QUERY_RE = r"\?([^#]*)"

# prefix match, '=' NOT included: bare '?fbclid' (value stripped by a
# redirector) must collapse the same as '?fbclid=abc'
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")


def canonical_url_col(url: Column) -> Column:
    pre = F.regexp_replace(url, _FRAG_RE, "")
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host_raw = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(host_raw, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host_raw, ":443$", ""))
        .otherwise(host_raw)
    )
    path_raw = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(path_raw == "", F.lit("/")).otherwise(path_raw)
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_extract(pre, _QUERY_RE, 1), "&"),
            lambda p: (p != "")
            & ~p.startswith(TRACKING_PREFIXES[0])
            & ~p.startswith(TRACKING_PREFIXES[1])
            & ~p.startswith(TRACKING_PREFIXES[2]),
        )
    )
    query = F.concat_ws("&", params)
    rebuilt = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )
    # non-URLs (no scheme) pass through untouched
    return F.when(scheme == "", url).otherwise(rebuilt)


def canonicalize_urls(df: DataFrame, url_col: str = "url",
                      out_col: str | None = None) -> DataFrame:
    """Corpus-scale entry point: the component regexp_extracts are
    MATERIALIZED in their own projection first — the combined column
    expression references scheme 4x and host 3x, and CollapseProject
    would otherwise inline (re-evaluate) each regex per reference
    (the CLAUDE.md fan-out gotcha)."""
    u = F.col(url_col)
    pre = F.regexp_replace(u, _FRAG_RE, "")
    staged = df.select(
        "*",
        F.lower(F.regexp_extract(u, _SCHEME_RE, 1)).alias("__scheme"),
        F.lower(F.regexp_extract(u, _HOST_RE, 1)).alias("__host_raw"),
        F.regexp_extract(u, _PATH_RE, 1).alias("__path_raw"),
        F.regexp_extract(pre, _QUERY_RE, 1).alias("__query_raw"),
    )
    scheme = F.col("__scheme")
    host = (
        F.when(scheme == "http",
               F.regexp_replace("__host_raw", ":80$", ""))
        .when(scheme == "https",
              F.regexp_replace("__host_raw", ":443$", ""))
        .otherwise(F.col("__host_raw"))
    )
    path = F.when(F.col("__path_raw") == "", F.lit("/")).otherwise(
        F.col("__path_raw")
    )
    params = F.array_sort(
        F.filter(
            F.split("__query_raw", "&"),
            lambda p: (p != "")
            & ~p.startswith(TRACKING_PREFIXES[0])
            & ~p.startswith(TRACKING_PREFIXES[1])
            & ~p.startswith(TRACKING_PREFIXES[2]),
        )
    )
    query = F.concat_ws("&", params)
    rebuilt = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(query == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), query)
        ),
    )
    canon = F.when(scheme == "", u).otherwise(rebuilt)
    return staged.withColumn(out_col or url_col, canon).drop(
        "__scheme", "__host_raw", "__path_raw", "__query_raw"
    )


def canonical_url_sql(url_expr: str) -> str:
    """DuckDB mirror — the SAME interpolated regex constants, same rule
    order, byte-identical output."""
    u = url_expr
    pre = f"regexp_replace({u}, '{_FRAG_RE}', '')"
    scheme = f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"
    host_raw = f"lower(regexp_extract({u}, '{_HOST_RE}', 1))"
    host = (
        f"CASE WHEN {scheme} = 'http' "
        f"THEN regexp_replace({host_raw}, ':80$', '') "
        f"WHEN {scheme} = 'https' "
        f"THEN regexp_replace({host_raw}, ':443$', '') "
        f"ELSE {host_raw} END"
    )
    path_raw = f"regexp_extract({u}, '{_PATH_RE}', 1)"
    path = f"CASE WHEN {path_raw} = '' THEN '/' ELSE {path_raw} END"
    filters = " AND ".join(
        f"NOT starts_with(p, '{pfx}')" for pfx in TRACKING_PREFIXES
    )
    params = (
        f"list_sort(list_filter(string_split("
        f"regexp_extract({pre}, '{_QUERY_RE}', 1), '&'), "
        f"p -> p != '' AND {filters}))"
    )
    # NB: DuckDB array_to_string([]) is NULL (Spark concat_ws is '') —
    # coalesce keeps the engines in lockstep
    query = f"coalesce(array_to_string({params}, '&'), '')"
    rebuilt = (
        f"({scheme} || '://' || ({host}) || ({path}) || "
        f"CASE WHEN {query} = '' THEN '' ELSE '?' || {query} END)"
    )
    return f"CASE WHEN {scheme} = '' THEN {u} ELSE {rebuilt} END"
