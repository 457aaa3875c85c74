"""PII detection and redaction for training-data pipelines.

The pre-training scrub pass: find and mask e-mail addresses, US-style
phone numbers, IPv4 addresses, and SSN-shaped identifiers before text
reaches a training mix.  Everything is plain ``regexp_count`` /
``regexp_replace`` column math — fully codegen'd JVM regex on the Spark
side, zero shuffles (a pure per-row projection the optimizer can
pipeline into any scan), and every pattern is written in the
Java-regex ∩ RE2 dialect subset (no lookaround, no backreferences) so
the DuckDB oracle replays the exact same matches.

Redaction applies the patterns in :data:`PII_ORDER` — a fixed, named
order, because replacement rewrites the string the next pattern sees.
Counts are always computed on the ORIGINAL text, one pattern at a time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex ∩ RE2 subset: character classes, bounded repeats, \b only.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}

# email first (its local part may contain digits/dots that later digit
# patterns could nibble), then dotted-quad, then the two dashed-digit
# shapes — ssn (3-2-4) before phone (3-3-4); the shapes are mutually
# exclusive but the order is part of the contract.
PII_ORDER: tuple[str, ...] = ("email", "ipv4", "ssn", "phone")


def _token(name: str) -> str:
    return f"<{name.upper()}>"


def pii_count_col(text: Column, kind: str) -> Column:
    """Match count of one PII pattern over the original text."""
    return F.regexp_count(text, F.lit(PII_PATTERNS[kind])).cast("int")


def redact_pii_col(text: Column) -> Column:
    """Replace every PII match with its ``<KIND>`` token, applying the
    patterns in :data:`PII_ORDER`."""
    out = text
    for kind in PII_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[kind], _token(kind))
    return out


def pii_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII profile: one count column per pattern plus the
    md5 of the redacted text (the redaction receipt — two runs redacted
    identically iff the hashes agree).  Pure projection, no shuffle."""
    text = F.col(text_col)
    cols = [F.col(id_col)]
    cols += [
        pii_count_col(text, kind).alias(f"n_{kind}") for kind in PII_ORDER
    ]
    cols.append(F.md5(redact_pii_col(text)).alias("redacted_hash"))
    return docs.select(*cols)


def redact_pii_sql(expr: str) -> str:
    """DuckDB twin of :func:`redact_pii_col` (global-flag replaces in
    the same :data:`PII_ORDER`)."""
    out = expr
    for kind in PII_ORDER:
        pat = PII_PATTERNS[kind].replace("'", "''")
        out = f"regexp_replace({out}, '{pat}', '{_token(kind)}', 'g')"
    return out


def pii_count_sql(expr: str, kind: str) -> str:
    """DuckDB twin of :func:`pii_count_col`."""
    pat = PII_PATTERNS[kind].replace("'", "''")
    return f"cast(len(regexp_extract_all({expr}, '{pat}')) as int)"
