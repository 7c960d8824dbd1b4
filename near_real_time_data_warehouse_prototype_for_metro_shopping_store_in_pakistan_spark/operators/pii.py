"""PII detection and redaction over a document corpus.

A training-data pipeline scrubs personally-identifiable information
before a corpus ships (emails, phone numbers, IP addresses are the
standard regex-detectable classes — the same families CCNet-style
curation and every public crawl-cleaning stack gate on). Beyond
reference parity: the reference (src/*.java) has no text scrubbing at
all, so this is part of the LLM-pipeline extension surface.

Everything is built-in ``regexp_count`` / ``regexp_replace`` column
expressions — JVM-side, whole-stage codegen, one corpus scan, zero
shuffles, zero Python. That is exactly the 100 TB shape: PII scrubbing
is embarrassingly parallel and must never cost more than the scan
itself.

Pattern portability: the patterns below restrict themselves to the
intersection of Java ``util.regex`` and RE2 syntax (character classes,
bounded repetition, ``\\b`` word boundaries; no lookaround, no
backreferences) so the DuckDB oracle runs the IDENTICAL pattern text
and both engines provably see the same matches (parity is asserted
per-row by the driver's hash gate on both the counts and the redacted
text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Order matters for redaction: emails first (an email's host part may
# otherwise partially match the IP pattern), then IPs, then phones.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"

PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


def redact(text) -> "F.Column":
    """The PII redaction fold as one column expression: every pattern
    replaced by its typed placeholder, applied in ``PII_PATTERNS``
    order (the ordering is load-bearing — emails before IPs). This is
    the SINGLE definition both ``pii_scan`` and the curation funnel's
    ``redact_pii`` gate apply, so the stored corpus and the scan's
    ``redacted`` column cannot drift."""
    red = F.col(text) if isinstance(text, str) else text
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return red


def pii_scan(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII audit + redaction in ONE scan: match counts per
    class (counted on the ORIGINAL text, so classes are independent),
    a total, and the redacted text with matches replaced by typed
    placeholders, applied in ``PII_PATTERNS`` order.

    Returns (id_col, n_email, n_ip, n_phone, n_pii, redacted).
    Counts are non-overlapping leftmost matches — identical semantics
    in Java regex and RE2, which the patterns are restricted to.
    """
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    red = redact(text_col)
    return docs.select(
        id_col,
        *counts,
        sum(
            (F.regexp_count(F.col(text_col), F.lit(p)) for _, p, _ in PII_PATTERNS),
            start=F.lit(0),
        ).alias("n_pii"),
        red.alias("redacted"),
    )


def with_synthetic_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministically append synthetic PII to every 3rd document
    (an email, an IP, and a phone number derived from the doc id).

    The synthetic corpus contains no natural PII, which would make a
    pinned ``pii_scan`` demo trivially all-zero; this seeds a known,
    id-derived amount so the correctness gate exercises real matches
    AND real pass-throughs. The transformation is a pure column
    expression mirrored verbatim in the DuckDB oracle — production
    callers run ``pii_scan`` on their corpus directly.
    """
    i = F.col(id_col)
    seeded = F.concat(
        F.col(text_col),
        F.lit(" contact user"),
        i,
        F.lit("@example.com at 10.0."),
        (i % 256).cast("long"),
        F.lit(".7 or 555-"),
        F.lpad((i % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((i % 10000).cast("string"), 4, "0"),
    )
    return docs.withColumn(
        text_col, F.when(i % 3 == 0, seeded).otherwise(F.col(text_col))
    )
