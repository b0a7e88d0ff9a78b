"""PII detection and redaction — pure column expressions.

The standard pre-training curation stage (C4/CCNet strip documents,
Dolma redacts spans): find emails / phone numbers / IPv4 addresses and
replace them with typed sentinels so downstream tokenization never sees
the raw value. Reference analog: the charset/OOD policies of
rec_postprocess.py decide what survives decoding; this decides what
survives publication.

Everything here is frozen regexp column expressions — whole-stage
codegen, zero Python, zero shuffle, and each pattern is written in the
common Java-regex/RE2 subset (no lookaround, no backreferences) so a SQL
oracle applies the *identical* pattern text.

At 100 TB this is a free rider on any existing scan: counts and the
redacted column are projections, so Catalyst fuses them into whatever
stage already reads ``text``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Ordered: emails first (an email's host part would otherwise feed the
# IPv4/phone patterns), then phones, then bare IPv4s.
PII_PATTERNS: list = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+\d{1,3}-\d{3}-\d{3,4}-\d{4}", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_counts(col: Column | str) -> list:
    """One ``n_<kind>`` count column per pattern (Spark ``regexp_count``)."""
    return [
        F.regexp_count(F.col(col) if isinstance(col, str) else col, F.lit(pat))
        .cast("int")
        .alias(f"n_{kind}")
        for kind, pat, _ in PII_PATTERNS
    ]


def redact(col: Column | str) -> Column:
    """All patterns replaced by their sentinels, in PII_PATTERNS order."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pat, sentinel in PII_PATTERNS:
        out = F.regexp_replace(out, pat, sentinel)
    return out


def with_pii(df: DataFrame, col: str = "text") -> DataFrame:
    """Adds per-kind counts, a ``has_pii`` flag, and ``<col>_redacted``.

    Counts are computed on the ORIGINAL text (before any sentinel is
    substituted) so overlapping kinds report what was actually present.
    """
    counts = pii_counts(col)
    has = None
    for c in counts:
        has = c if has is None else has + c
    return df.select(
        "*",
        *counts,
        (has > 0).alias("has_pii"),
        redact(col).alias(f"{col}_redacted"),
    )
