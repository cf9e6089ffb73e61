"""PII detection / redaction over text columns.

A training-data pipeline must scrub direct identifiers before a corpus
ships; the reference works on de-identified MIMIC exports and so never
needs this (its only privacy surface is the date-shifting already baked
into MIMIC), but any 100 TB web/clinical corpus does. Patterns are
deliberately conservative, anchored regexes over four high-precision
identifier classes — the same class list as common scrubbers (emails,
phone numbers, IPv4 addresses, US SSNs).

Everything is a narrow per-row column expression (regexp in whole-stage
codegen — no UDF, no shuffle), so redaction streams at scan speed on
any cluster size. Patterns use only RE2-safe syntax (no lookaround, no
backreferences) so the exact same strings run in DuckDB oracles
(`regexp_extract_all`, `regexp_replace(..., 'g')`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "pii_counts", "redact_pii", "with_pii_scrub"]

# Ordered: earlier classes are redacted first, so overlapping matches
# (an email's local part containing digits, say) are consumed before
# later patterns can see them. Keep SSN before PHONE: both are dash
# digit runs but with disjoint group shapes (3-2-4 vs 3-3-4).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-class match counts (computed on the raw text, pre-redaction)."""
    return {
        # idx=0 (whole match) — Spark's default group index is 1, DuckDB's
        # regexp_extract_all defaults to 0; pin both to the whole match.
        name: F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).cast("long")
        for name, pat in PII_PATTERNS
    }


def redact_pii(text: Column) -> Column:
    """Replace every match with a typed placeholder, class by class in
    ``PII_PATTERNS`` order."""
    out = text
    for name, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def with_pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add per-class counts + a ``redacted`` column in one projection."""
    text = F.col(text_col)
    cols = [df[c] for c in df.columns]
    cols += [expr.alias(f"n_{name}") for name, expr in pii_counts(text).items()]
    cols.append(redact_pii(text).alias("redacted"))
    return df.select(*cols)
