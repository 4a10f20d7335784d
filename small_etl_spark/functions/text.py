"""Text-cleaning column functions (SURVEY §2.9, X1–X3).

- X1 clean_text       — /root/reference/src/core/contextual_pipeline.rs:883-889
  (trim + newline→space on every string column)
- X2 normalize_fields — /root/reference/src/core/contextual_pipeline.rs:892-898
  (lowercase listed columns)
- X3 trim_whitespace / remove_html_tags — declared-only in the
  reference (/root/reference/src/config/sequence_config.rs:93-100);
  implemented for real here.

All are JVM-side built-ins — whole-stage codegen, no Python in the
hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType


def _string_columns(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if isinstance(f.dataType, StringType)]


def clean_text(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """X1: trim + replace newlines with spaces on string columns."""
    cols = columns if columns is not None else _string_columns(df)
    return df.withColumns(
        {c: F.trim(F.regexp_replace(F.col(c), "\n", " ")) for c in cols if c in df.columns}
    )


def normalize_fields(df: DataFrame, columns: list[str]) -> DataFrame:
    """X2: lowercase the listed string columns (absent names no-op)."""
    existing = set(_string_columns(df))
    return df.withColumns({c: F.lower(F.col(c)) for c in columns if c in existing})


def trim_whitespace(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """X3a: trim leading/trailing whitespace on string columns."""
    cols = columns if columns is not None else _string_columns(df)
    return df.withColumns({c: F.trim(F.col(c)) for c in cols if c in df.columns})


def remove_html_tags(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """X3b: strip ``<...>`` tags from string columns."""
    cols = columns if columns is not None else _string_columns(df)
    return df.withColumns(
        {c: F.regexp_replace(F.col(c), "<[^>]*>", "") for c in cols if c in df.columns}
    )


# PII redaction (north-star: pre-training corpus hygiene). Order
# matters: emails before the bare-domain-ish patterns, IPs before
# phone-ish digit runs. Each is a plain POSIX-compatible regex so the
# identical pattern runs in the DuckDB oracle.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
]


def redact_pii(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Replace emails / IPv4s / phone-number-shaped digit runs with
    typed placeholder tokens on string columns.

    The standard corpus-scrub pass before training: pure chained
    ``regexp_replace`` — JVM-side, codegen'd, zero Python — so at
    100 TB it fuses into the same scan stage as every other text
    cleaner. Deliberately conservative patterns (high precision);
    swap in a Presidio-style NER pass via ``mapInPandas`` only for
    recall-critical corpora.
    """
    cols = columns if columns is not None else _string_columns(df)

    def scrub(c: str):
        col = F.col(c)
        for pattern, token in PII_PATTERNS:
            col = F.regexp_replace(col, pattern, token)
        return col

    return df.withColumns({c: scrub(c) for c in cols if c in df.columns})
