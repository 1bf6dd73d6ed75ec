"""URL canonicalization for crawl dedup: the same page arrives under
scheme/host case variants, default ports, tracking parameters,
shuffled query order, percent-encoding variants, and fragments —
canonicalize BEFORE exact/near dedup or per-host quotas, or every
variant counts as a distinct document (and a host quota under-counts
its hot host).

Rules (the conservative, reversibility-safe core):
- percent-encoding normalized per RFC 3986 §6.2.2: hex digits of every
  escape uppercased (``%2f`` -> ``%2F``), and escapes of UNRESERVED
  characters decoded (``%41`` -> ``A``, ``%7E`` -> ``~``); reserved
  characters stay encoded, so component boundaries never move;
- scheme lowercased; host lowercased — but ONLY the host: userinfo
  (``User:Pass@``) is case-sensitive credential material and passes
  through untouched;
- default port stripped (:80 for http, :443 for https);
- empty path -> '/';
- query parameters: tracking params dropped (utm_*, fbclid, gclid),
  the rest SORTED lexicographically (order-insensitive equality);
- fragment dropped.

Scale shape: pure string/array column expressions — JVM-side,
whole-stage-codegen, per-row, no shuffle.  The percent normalization
is ONE split on '%' + one higher-order transform (each segment's
leading two chars are the escape's hex digits), not a 78-pass
regex chain.  Every construct sits in the Java-regex/RE2 common
subset (or exact engine-agnostic arithmetic) and has a DuckDB twin
(``canonical_url_sql``), so an independent engine reproduces the
output byte-for-byte; non-URL strings (no ``scheme://`` after
normalization) pass through byte-unchanged.

IDN/punycode host folding (r7): ``bücher.example`` and
``xn--bcher-kva.example`` are the same host in two representations —
``canonicalize_urls`` folds both to the ASCII (punycode) form crawl
frontiers store, per label, via stdlib ``encodings.idna`` (IDNA 2003
ToASCII — nameprep case/width folding included).  The fold is the one
step outside the regex/Catalyst subset: a vectorized ``pandas_udf``
over the hostport column ONLY, with an ASCII fast path (rows whose
host has no non-ASCII byte and no ``xn--`` label — i.e. ~all of a real
crawl — never enter the per-label Python loop).  Because punycode is
not SQL-expressible, ``canonical_url_sql`` mirrors the
``fold_idn=False`` operator; the fold itself is value-oracled through
planted hosts with pinned punycode forms (the ``page_ids`` arm) plus
idempotence/round-trip pytests.  A label that fails ToASCII (invalid
punycode, length overflow) passes through unchanged — conservative,
never destructive.

Deliberately OUT of scope (documented, not forgotten): path dot-
segment removal (``/a/../b`` — a crawler's fetcher resolves these
before the URL reaches a corpus)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# query is extracted from the PRE-FRAGMENT substring (see _FRAG_RE):
# an unanchored \? over the whole url would resurrect a '?' inside an
# SPA-style fragment ('#/route?x=1') as query params
_FRAG_RE = r"#.*$"
_QUERY_RE = r"\?([^#]*)"
# authority split: userinfo is everything up to the LAST '@' (RFC 3986
# §3.2 — the host starts after the final '@'); both captures are
# greedy-anchored so Java and RE2 agree
_USERINFO_RE = r"^(.*@)"
_HOSTPORT_RE = r"([^@]*)$"

# prefix match, '=' NOT included: bare '?fbclid' (value stripped by a
# redirector) must collapse the same as '?fbclid=abc'
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")

# RFC 3986 §2.3 unreserved byte values: ALPHA / DIGIT / - . _ ~
_UNRESERVED_SQL = (
    "({c} BETWEEN 48 AND 57) OR ({c} BETWEEN 65 AND 90) "
    "OR ({c} BETWEEN 97 AND 122) OR {c} IN (45, 46, 95, 126)"
)
_IS_ESC_RE = r"^[0-9A-Fa-f]{2}"


def _unreserved(code: Column) -> Column:
    return (
        code.between(48, 57)
        | code.between(65, 90)
        | code.between(97, 122)
        | code.isin(45, 46, 95, 126)
    )


def percent_normalize_col(url: Column) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization as one Catalyst
    expression: split on '%' — every segment after the first begins at
    an escape site — then per segment either decode (unreserved),
    uppercase the hex pair (reserved/other), or re-emit '%' verbatim
    (invalid escape: fewer than two hex digits follow).

    Idempotent: decoding leaves no '%HH' of an unreserved char behind,
    and uppercased hex re-uppercases to itself (pinned by pytest)."""

    def seg(e: Column, i: Column) -> Column:
        hx = F.upper(F.substring(e, 1, 2))
        # conv only evaluates under the is-escape branch (CaseWhen is
        # lazy), so ANSI mode never sees a non-hex input
        code = F.conv(hx, 16, 10).cast("int")
        rest = F.substring(e, 3, 2_000_000_000)
        out = F.when(
            ~e.rlike(_IS_ESC_RE), F.concat(F.lit("%"), e)
        ).otherwise(
            F.when(_unreserved(code), F.concat(F.char(code), rest))
            .otherwise(F.concat(F.lit("%"), hx, rest))
        )
        # the first segment precedes any '%' — emit verbatim.  NB the
        # two-param transform lambda receives (element, INDEX).
        return F.when(i == 0, e).otherwise(out)

    return F.concat_ws("", F.transform(F.split(url, "%"), seg))


def percent_normalize_sql(url_expr: str) -> str:
    """DuckDB mirror of ``percent_normalize_col`` — same split/segment
    semantics; hex value via strpos arithmetic (no conv in DuckDB)."""
    u = url_expr
    parts = f"string_split({u}, '%')"
    dig = "strpos('0123456789ABCDEF', substr(upper(e), {pos}, 1))"
    code = (
        f"CAST(({dig.format(pos=1)} - 1) * 16 "
        f"+ {dig.format(pos=2)} - 1 AS INTEGER)"
    )
    unres = _UNRESERVED_SQL.format(c=code)
    seg = (
        f"CASE WHEN NOT regexp_matches(e, '{_IS_ESC_RE}') THEN '%' || e "
        f"WHEN {unres} THEN chr({code}) || substr(e, 3) "
        f"ELSE '%' || upper(substr(e, 1, 2)) || substr(e, 3) END"
    )
    # NB: DuckDB array_to_string([]) is NULL (Spark concat_ws is '') —
    # coalesce keeps the engines in lockstep on '%'-free urls
    tail = (
        f"coalesce(array_to_string(list_transform(({parts})[2:], "
        f"e -> {seg}), ''), '')"
    )
    return f"(({parts})[1] || {tail})"


def fold_idn_host(hostport: str) -> str:
    """Fold one (lowercased) ``host[:port]`` to its IDNA ASCII form:
    non-ASCII labels are punycode-encoded (stdlib ``encodings.idna``,
    IDNA 2003 ToASCII — the nameprep mapping handles any residual
    case/width variants); existing ``xn--`` labels are round-tripped
    (decode -> re-encode) so only VALID punycode survives as-is and
    invalid punycode passes through unchanged.  Pure function — the
    same kernel runs inside the Spark pandas_udf and in the pytest
    oracle (the repo's byte-identity pattern)."""
    if not hostport or hostport.startswith("["):
        return hostport  # IPv6 literal: no IDN semantics
    head, sep, tail = hostport.rpartition(":")
    if sep and tail.isdigit():
        host, port = head, ":" + tail
    else:
        host, port = hostport, ""
    out = []
    for label in host.split("."):
        try:
            if not label.isascii():
                label = label.encode("idna").decode("ascii")
            elif label.lower().startswith("xn--"):
                # stdlib ToUnicode only recognizes a lowercase ACE
                # prefix; the canonical form is lowercase anyway
                label = (
                    label.lower().encode("ascii").decode("idna")
                    .encode("idna").decode("ascii")
                )
        except UnicodeError:
            pass  # not foldable: conservative passthrough
        out.append(label)
    return ".".join(out) + port


# rows with neither a non-ASCII byte nor an xn-- label skip the
# per-label Python loop entirely (the ~always fast path)
_IDN_NEEDS_RE = r"[^\x00-\x7f]|(?:^|\.)(?:xn|XN|Xn|xN)--"


@pandas_udf(T.StringType())
def _fold_idn_udf(hostport: pd.Series) -> pd.Series:
    needs = hostport.str.contains(_IDN_NEEDS_RE, regex=True, na=False)
    if not needs.any():
        return hostport
    out = hostport.copy()
    out[needs] = out[needs].map(fold_idn_host)
    return out


def _host_canon(scheme: Column, hostport: Column) -> Column:
    """lowercase + default-port strip over the host:port part ONLY
    (userinfo already split off)."""
    low = F.lower(hostport)
    return (
        F.when(scheme == "http", F.regexp_replace(low, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(low, ":443$", ""))
        .otherwise(low)
    )


def canonical_url_col(url: Column) -> Column:
    """Single-expression pure-Catalyst variant (no IDN fold — use
    ``canonicalize_urls`` for the full canonicalization; this form also
    re-evaluates the percent-normalize transform per referencing regex,
    see the entry point's docstring)."""
    norm = percent_normalize_col(url)
    pre = F.regexp_replace(norm, _FRAG_RE, "")
    scheme = F.lower(F.regexp_extract(norm, _SCHEME_RE, 1))
    auth = F.regexp_extract(norm, _HOST_RE, 1)
    userinfo = F.regexp_extract(auth, _USERINFO_RE, 1)
    host = _host_canon(scheme, F.regexp_extract(auth, _HOSTPORT_RE, 1))
    path_raw = F.regexp_extract(norm, _PATH_RE, 1)
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
        scheme, F.lit("://"), userinfo, host, path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )
    # non-URLs (no scheme after normalization) pass through untouched
    return F.when(scheme == "", url).otherwise(rebuilt)


def canonicalize_urls(df: DataFrame, url_col: str = "url",
                      out_col: str | None = None,
                      fold_idn: bool = True) -> DataFrame:
    """Corpus-scale entry point: the percent-normalized url, the
    component regexp_extracts, and the authority split are each
    MATERIALIZED in their own projection — the normalization transform
    is referenced by 4 regexes and the combined expression references
    scheme 4x / hostport 3x, and CollapseProject would otherwise
    inline (re-evaluate) each non-cheap expression per reference
    (the CLAUDE.md fan-out gotcha).

    ``fold_idn`` (default on) additionally folds Unicode/punycode host
    representations to one ASCII form (module docstring) — the one
    Arrow stage in the operator, carrying ONLY the short hostport
    column, with a no-Python fast path for ASCII hosts.  Pass False
    for the pure-Catalyst plan (exactly what ``canonical_url_sql``
    mirrors)."""
    u = F.col(url_col)
    s1 = df.select("*", percent_normalize_col(u).alias("__norm"))
    n = F.col("__norm")
    pre = F.regexp_replace(n, _FRAG_RE, "")
    s2 = s1.select(
        "*",
        F.lower(F.regexp_extract(n, _SCHEME_RE, 1)).alias("__scheme"),
        F.regexp_extract(n, _HOST_RE, 1).alias("__auth"),
        F.regexp_extract(n, _PATH_RE, 1).alias("__path_raw"),
        F.regexp_extract(pre, _QUERY_RE, 1).alias("__query_raw"),
    )
    s3 = s2.select(
        "*",
        F.regexp_extract("__auth", _USERINFO_RE, 1).alias("__userinfo"),
        F.regexp_extract("__auth", _HOSTPORT_RE, 1).alias("__hostport"),
    )
    scheme = F.col("__scheme")
    host = _host_canon(scheme, F.col("__hostport"))
    if fold_idn:
        host = _fold_idn_udf(host)
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
        scheme, F.lit("://"), F.col("__userinfo"), host, path,
        F.when(query == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), query)
        ),
    )
    canon = F.when(scheme == "", u).otherwise(rebuilt)
    return s3.withColumn(out_col or url_col, canon).drop(
        "__norm", "__scheme", "__auth", "__path_raw", "__query_raw",
        "__userinfo", "__hostport",
    )


def canonical_url_sql(url_expr: str) -> str:
    """DuckDB mirror — the SAME interpolated regex constants, same rule
    order, byte-identical output.  Mirrors ``fold_idn=False`` (punycode
    is not SQL-expressible); the fold is oracled separately through
    planted hosts with pinned punycode forms (``page_ids`` arm)."""
    u = url_expr
    n = percent_normalize_sql(u)
    pre = f"regexp_replace({n}, '{_FRAG_RE}', '')"
    scheme = f"lower(regexp_extract({n}, '{_SCHEME_RE}', 1))"
    auth = f"regexp_extract({n}, '{_HOST_RE}', 1)"
    userinfo = f"regexp_extract({auth}, '{_USERINFO_RE}', 1)"
    hostport = f"lower(regexp_extract({auth}, '{_HOSTPORT_RE}', 1))"
    host = (
        f"CASE WHEN {scheme} = 'http' "
        f"THEN regexp_replace({hostport}, ':80$', '') "
        f"WHEN {scheme} = 'https' "
        f"THEN regexp_replace({hostport}, ':443$', '') "
        f"ELSE {hostport} END"
    )
    path_raw = f"regexp_extract({n}, '{_PATH_RE}', 1)"
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
        f"({scheme} || '://' || ({userinfo}) || ({host}) || ({path}) || "
        f"CASE WHEN {query} = '' THEN '' ELSE '?' || {query} END)"
    )
    return f"CASE WHEN {scheme} = '' THEN {u} ELSE {rebuilt} END"


# --- SURT (Sort-friendly URI Reordering Transform) ---------------------
#
# The key format crawl indexes (CDX/CDXJ, OpenWayback, pywb) sort and
# prefix-scan by: host labels reversed and comma-joined, non-default
# port kept, then ')' + path [+ '?' + sorted query], all lowercased —
# "https://sub.host.example:8443/Path?b=2&a=1" ->
# "example,host,sub:8443)/path?a=1&b=2".  Reversing the host groups a
# registrable domain's subdomains into one contiguous key range, which
# is what makes per-domain scans of a petabyte-scale index a prefix
# seek instead of a scatter.  Userinfo and fragment are dropped (pywb
# default canon); apply to ``canonical_url_col`` output so scheme/host
# case, default ports and tracking params are already folded.  Pure
# Catalyst; ``surt_sql`` is the DuckDB twin (same regexes, RE2/Java
# common subset).

_SURT_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]*)"
_SURT_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_SURT_QUERY_RE = r"^[^?#]*\?([^#]*)"


def surt_key(url: Column) -> Column:
    """URL -> SURT key; NULL for strings with no ``scheme://`` (a sort
    key is only meaningful for URLs)."""
    hostport = F.regexp_extract(url, _SURT_HOSTPORT_RE, 1)
    host = F.regexp_extract(hostport, "^([^:]*)", 1)
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    rev = F.array_join(F.reverse(F.split(host, "[.]")), ",")
    path = F.regexp_extract(url, _SURT_PATH_RE, 1)
    query = F.regexp_extract(url, _SURT_QUERY_RE, 1)
    sq = F.array_join(F.array_sort(F.split(query, "&")), "&")
    key = F.lower(F.concat(
        rev,
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.lit(")"),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(query != "", F.concat(F.lit("?"), sq)).otherwise(F.lit("")),
    ))
    return F.when(hostport != "", key).otherwise(F.lit(None).cast("string"))


def surt_sql(url_expr: str) -> str:
    """DuckDB twin of ``surt_key`` (same regex constants)."""
    u = f"({url_expr})"
    hostport = f"regexp_extract({u}, '{_SURT_HOSTPORT_RE}', 1)"
    host = f"regexp_extract({hostport}, '^([^:]*)', 1)"
    port = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    rev = f"array_to_string(list_reverse(string_split({host}, '.')), ',')"
    path = f"regexp_extract({u}, '{_SURT_PATH_RE}', 1)"
    query = f"regexp_extract({u}, '{_SURT_QUERY_RE}', 1)"
    sq = f"array_to_string(list_sort(string_split({query}, '&')), '&')"
    key = (
        f"lower({rev} "
        f"|| CASE WHEN {port} <> '' THEN ':' || {port} ELSE '' END "
        f"|| ')' "
        f"|| CASE WHEN {path} = '' THEN '/' ELSE {path} END "
        f"|| CASE WHEN {query} <> '' THEN '?' || {sq} ELSE '' END)"
    )
    return f"CASE WHEN {hostport} <> '' THEN {key} ELSE NULL END"
