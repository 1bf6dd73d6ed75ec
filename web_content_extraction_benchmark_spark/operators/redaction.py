"""PII redaction for training-data curation: replace e-mail addresses,
IPv4/IPv6 addresses, card-number-length digit runs, and separator-style
phone numbers with typed placeholder tokens — the privacy-scrubbing
step between extraction and packing in an LLM data pipeline.

Scale shape: a chain of ``regexp_replace`` column expressions —
JVM-side, whole-stage-codegen'd, per-row, no shuffle, no Python.  The
patterns deliberately stay inside the regex subset that Java
(``java.util.regex``) and RE2-family engines (DuckDB) evaluate
identically — character classes, bounded counts, ``\\b`` word
boundaries, no backreferences or lookaround — so an independent engine
reproduces the exact output (``redact_pii_sql`` is the DuckDB mirror;
pytest cross-checks full-corpus equality and idempotence).

Rule order matters and is part of the contract: the longest / most
specific shapes run first (e-mail before anything digit-based would
split it; IPv6 before IPv4 so a mapped tail is never half-eaten; card
runs before phone so a 16-digit run is one ``<CC>``, not a phone
prefix plus digits).

WHAT IS REDACTED — the inclusion list, exactly:
- e-mail addresses (local@dotted-domain);
- IPv4 dotted quads with every octet in 0-255;
- IPv6 in full 8-group form, ``::``-compressed with at least one
  hex group on each side of the ``::``, or with an embedded dotted-quad
  tail (v4-mapped/NAT64: ``64:ff9b::1.2.3.4``) — the whole address is
  one ``<IP6>``, never a half-eaten hex prefix plus a leaked quad.
  This extends to the MALFORMED 7-hex-group + quad shape
  (``1:2:3:4:5:6:7:1.2.3.4``): not a valid address, but redacted whole
  as one ``<IP6>`` rather than letting the 8-group rule eat the quad's
  first octet and leak ``.2.3.4`` (over-redaction is the safe side);
- 13-19 digit runs and 4-4-4-4 grouped card numbers;
- phone numbers with ``-``/``.`` separators (3-3/4-4, optional
  +country), and space-separated international numbers that START
  WITH ``+`` (``+CC NNN NNN NNNN`` shapes).

WHAT IS DELIBERATELY NOT REDACTED — pinned by negative tests
(tests/test_redaction.py), not an oversight:
- dotted quads with any octet > 255 (``1.2.3.999`` — version/build
  strings, not routable addresses);
- ``::``-leading or ``::``-trailing IPv6 (``::1``, ``fe80::``) — a
  ``\\b`` boundary cannot anchor after ``:``, and bare ``::1`` collides
  with too much non-PII text.  In a ``::``-LEADING v4-tailed form the
  embedded quad still redacts via the IPv4 rule, but any hex groups
  between the leading ``::`` and the quad survive (``::a:b:1.2.3.4``
  -> ``::a:b:<IP>``) — only forms with >=1 hex group BEFORE the ``::``
  get the full single-token ``<IP6>`` treatment;
- space-separated phone numbers WITHOUT a leading ``+``
  (``415 555 2671``) — indistinguishable from numeric table columns;
- national formats with no separators beyond the 13-19-digit card rule
  (a bare 10-digit run is NOT redacted as a phone).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one IPv4 octet, 0-255 only: 250-255 | 200-249 | 0-199 (the last arm
# also covers 1-2 digit octets).  Alternation ORDER matters and both
# Java and RE2 (DuckDB) use leftmost-FIRST semantics, so the longest
# specific arms come first.
_OCTET = r"(?:25[0-5]|2[0-4]\d|1?\d?\d)"
# one IPv6 hex group
_HEX4 = r"[0-9A-Fa-f]{1,4}"

# (pattern, replacement) — applied IN ORDER.  Patterns restricted to the
# Java/RE2 common subset (see module docstring).
PII_RULES: tuple[tuple[str, str], ...] = (
    # e-mail: local part @ dotted domain
    (r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b", "<EMAIL>"),
    # IPv6 with an embedded dotted-quad tail (v4-mapped/NAT64 forms,
    # '::ffff:1.2.3.4' / '64:ff9b::1.2.3.4' / full '0:...:0:1.2.3.4')
    # FIRST: the hex-only compressed rule below would otherwise consume
    # '...::1' and leave '.2.3.4' behind (review finding r6)
    (rf"\b(?:{_HEX4}:){{1,6}}:(?:{_HEX4}:){{0,5}}"
     rf"(?:{_OCTET}\.){{3}}{_OCTET}\b", "<IP6>"),
    # MALFORMED 7-group + quad ('1:2:3:4:5:6:7:1.2.3.4' — 9 groups,
    # not a valid address): without this arm the 8-group rule below
    # consumes the quad's first octet as its 8th hex group and leaves
    # '<IP6>.2.3.4' — a surviving quad-like tail fragment (ADVICE r6).
    # Over-redacting the whole malformed blob as one <IP6> is the
    # privacy-safe direction (RE2 has no lookahead to reject instead).
    # MUST precede the valid 6-group v4-mapped arm: \b also matches
    # after '1:', so the 6-group arm would eat '2:...:7:1.2.3.4' first
    # and leave a stray '1:' prefix.
    (rf"\b(?:{_HEX4}:){{7}}(?:{_OCTET}\.){{3}}{_OCTET}\b", "<IP6>"),
    (rf"\b(?:{_HEX4}:){{6}}(?:{_OCTET}\.){{3}}{_OCTET}\b", "<IP6>"),
    # IPv6 full form (8 groups), then ::-compressed with >=1 group on
    # each side of the ::.  Before IPv4 so a v4-mapped tail can't be
    # half-eaten by the dotted-quad rule.
    (rf"\b(?:{_HEX4}:){{7}}{_HEX4}\b", "<IP6>"),
    (rf"\b(?:{_HEX4}:){{1,6}}:{_HEX4}(?::{_HEX4}){{0,5}}\b", "<IP6>"),
    # IPv4 dotted quad, octets bounded to 0-255 (a quad with a
    # 256+ group is a version string, not an address — pinned by test)
    (rf"\b(?:{_OCTET}\.){{3}}{_OCTET}\b", "<IP>"),
    # payment-card-length digit run (13-19 digits, optionally grouped
    # as 4-4-4-4 with spaces or dashes)
    (r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b", "<CC>"),
    (r"\b\d{13,19}\b", "<CC>"),
    # separator-style phone: 3-3/4-4 groups with - or . separators,
    # optional +country prefix.  NB: the '+' must sit INSIDE the
    # alternation — '\b\+?' can never consume a '+' after whitespace
    # (no word boundary between ' ' and '+'), which left a stray '+'
    # in the redacted text
    (r"(?:\+|\b)\d{1,3}[-.]\d{3}[-.]\d{3,4}[-.]\d{4}\b", "<PHONE>"),
    (r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b", "<PHONE>"),
    # space-separated international phone — the leading '+' is REQUIRED
    # (a bare space-separated triplet is a numeric table column as often
    # as a phone; exclusion pinned by test)
    (r"\+\d{1,3} \d{2,4} \d{3,4} \d{4}\b", "<PHONE>"),
)


def redact_pii_col(text_col: Column) -> Column:
    """The redaction chain as one column expression."""
    out = text_col
    for pattern, repl in PII_RULES:
        out = F.regexp_replace(out, pattern, repl)
    return out


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str | None = None) -> DataFrame:
    """Replace PII shapes in ``text_col`` with typed placeholders
    (in-place unless ``out_col`` names a new column)."""
    return df.withColumn(out_col or text_col,
                         redact_pii_col(F.col(text_col)))


def redact_pii_sql(text_expr: str) -> str:
    """DuckDB mirror: the same rules, same order, global replacement
    ('g' flag — DuckDB replaces only the first match by default, Java
    replaces all)."""
    out = text_expr
    for pattern, repl in PII_RULES:
        escaped = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{escaped}', '{repl}', 'g')"
    return out
