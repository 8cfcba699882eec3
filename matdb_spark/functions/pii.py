"""PII detection and redaction over a text column.

The standard pre-training scrub stage (BigScience ROOTS, Dolma §2.3,
FineWeb): find emails / IPv4 addresses / phone numbers / SSN-shaped
ids with regexes and either count them (per-document risk signal) or
replace them with typed placeholder tokens.

Everything here is built-in column expressions — ``regexp_count`` and
``regexp_replace`` run JVM-side inside whole-stage codegen, so the
scrub is a zero-shuffle map over the corpus: at 100 TB it pipelines
with the parquet scan and costs one pass, exactly like the Gopher
quality rules (functions/text.py).

Pattern portability contract: every pattern uses only syntax that
means the same thing in Java regex (Spark) and RE2 (DuckDB, the
oracle engine) — character classes, bounded repetition, ``\\b`` word
boundaries. No lookarounds, no backreferences. This is what lets the
correctness gate replay detection/redaction verbatim in the oracle.

Reference note: the reference engine (ejrh/matdb) has no text
processing at all — this module is part of the training-data-pipeline
surface built on top of the storage/query core.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Ordered: redaction applies these in sequence, so the order is part
# of the contract (the oracle replays the same sequence). The patterns
# are mutually non-overlapping on well-formed text (3-2-4 SSN vs 3-3-4
# phone; IPv4 needs three dots), but a fixed order makes the composed
# result deterministic even on adversarial input.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-type match counts for one text column. Counting happens on
    the ORIGINAL text for every type (not the progressively redacted
    text), so counts are independent signals; redact_pii's sequential
    replacement can therefore redact fewer spans than the sum when
    types overlap — it reports its own count."""
    return {
        name: F.regexp_count(text, F.lit(pat)).cast("long")
        for name, pat, _ in PII_PATTERNS
    }


def pii_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII profile: one count column per type plus a
    composite ``has_pii`` flag. One projection, no shuffle."""
    counts = pii_counts(F.col(text_col))
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        (total > 0).alias("has_pii"),
    )


def pii_report(
    df: DataFrame, text_col: str, group_col: str
) -> DataFrame:
    """Per-group PII data card (the compliance sibling of
    text.corpus_report): total matches per type, documents-with-PII
    count, and the PII incidence rate per group. One projection + one
    hash aggregation — the zero-shuffle detection pass followed by a
    groupBy(group) that ships four counters per task per group."""
    counts = pii_counts(F.col(text_col))
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    per_doc = df.select(
        F.col(group_col),
        *[c.alias(f"__{name}") for name, c in counts.items()],
        (total > 0).cast("long").alias("__hit"),
    )
    return per_doc.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.sum(f"__{name}").alias(f"n_{name}")
            for name in counts
        ],
        F.sum("__hit").alias("docs_with_pii"),
        F.round(
            F.sum("__hit").cast("double") / F.count(F.lit(1)), 6
        ).alias("pii_rate"),
    )


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Replace every PII span with its typed placeholder, applying the
    PII_PATTERNS sequence in order. Returns
    (id, n_redacted, clean_text); ``n_redacted`` counts the spans
    actually replaced (summed per stage on the text that stage saw)."""
    cleaned = F.col(text_col)
    n = F.lit(0).cast("long")
    for _, pat, token in PII_PATTERNS:
        n = n + F.regexp_count(cleaned, F.lit(pat)).cast("long")
        cleaned = F.regexp_replace(cleaned, pat, token)
    return df.select(
        F.col(id_col),
        n.alias("n_redacted"),
        cleaned.alias("clean_text"),
    )
