"""PII detection / redaction for training-corpus preparation.

Regex-only (no ML NER): emails, IPv4 addresses, phone-like digit runs.
The patterns deliberately avoid backreferences and lookaround so the
same strings mean the same thing to Java regex (Spark executors) and
RE2 (DuckDB oracle) — which is what makes the pipeline oracle-checkable.

All scrubbing is `regexp_replace` column expressions: JVM-side,
whole-stage-codegen'd, map-only — at 100 TB this adds zero shuffles to
a corpus pass and fuses with whatever filter/projection surrounds it.

No reference equivalent (kenstt/small-etl has no redaction); this is a
north-star LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Ordered: emails first (their local parts contain digit runs a phone
# pattern could claim), then IPs, then bare phone-like runs. The
# replacement tokens contain no digits, so later passes cannot re-match
# earlier redactions.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d[\d\- ]{7,}\d"

REDACTIONS = (
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def scrub_pii(col: Column | str) -> Column:
    """Redact emails → IPs → phone-like runs (in that order)."""
    c = _c(col)
    for pattern, token in REDACTIONS:
        c = F.regexp_replace(c, pattern, token)
    return c


def pii_counts(col: Column | str) -> list[Column]:
    """Per-category match counts on the ORIGINAL text (audit columns:
    how much PII a source carries drives keep/drop policy)."""
    c = _c(col)
    return [
        F.regexp_count(c, F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(c, F.lit(IPV4_RE)).cast("bigint").alias("n_ips"),
        F.regexp_count(c, F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
    ]
