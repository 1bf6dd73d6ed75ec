"""PII redaction for training-data curation: replace e-mail addresses,
IPv4 addresses, card-number-length digit runs, and separator-style
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
split it; card runs before phone so a 16-digit run is one ``<CC>``,
not a phone prefix plus digits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) — applied IN ORDER.  Patterns restricted to the
# Java/RE2 common subset (see module docstring).
PII_RULES: tuple[tuple[str, str], ...] = (
    # e-mail: local part @ dotted domain
    (r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b", "<EMAIL>"),
    # IPv4 dotted quad
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
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
