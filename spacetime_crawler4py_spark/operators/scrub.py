"""PII scrubbing — redact contact-information spans from document text
before it enters a training corpus (emails, North-American-style phone
numbers, IPv4 addresses).

Pure JVM `regexp_replace` / `regexp_extract_all` expressions: no Python
workers, no shuffle — the scrub is a scan-level projection that fuses
into whatever pipeline reads the corpus, so at 100 TB its cost is the
regex engine on bytes already being read.

Pattern dialect is deliberately conservative — no lookaround, no
backreferences — so the exact same pattern strings run under Java's
regex (Spark), RE2 (DuckDB oracle), and Python's `re` (tests), making
the operator hash-exact checkable cross-engine. That rules out a few
precision tricks (e.g. rejecting 999.999.999.999 via lookahead); the
standard corpus-scrub trade is to over-redact rather than leak.

Scrub order is part of the contract (email → phone → IPv4), applied to
the original text's match sets: replacement tokens contain no digits or
'@', so later patterns cannot match inside earlier replacements.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PII_PATTERNS",
    "scrub_pii",
    "scrubbed_text_col",
]

# (name, pattern, replacement) — order is the scrub order
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "phone",
        r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
]


def scrubbed_text_col(text: Column) -> Column:
    """The redacted text as a column expression (chained regexp_replace)."""
    out = text
    for _name, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document scrub readout:

      id            document id
      n_email / n_phone / n_ipv4   match counts on the ORIGINAL text
      scrubbed      redacted text
      scrubbed_len  its length

    Counting on the original text (not scrub-as-you-go) keeps each count
    independent of the scrub order; the IPv4 count therefore includes
    dotted quads that the phone pattern cannot also match (disjoint by
    construction: phones use '-' or '.' between 3-3-4 digit groups and
    IPv4 needs three '.' with 1-3 digit groups)."""
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat, _repl in PII_PATTERNS
    ]
    scrubbed = scrubbed_text_col(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        *counts,
        scrubbed.alias("scrubbed"),
        F.length(scrubbed).cast("long").alias("scrubbed_len"),
    )
