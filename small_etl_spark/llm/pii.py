"""PII audit for training-corpus preparation.

The redaction pass itself lives in ``functions.text.redact_pii``
(chained ``regexp_replace`` over ``PII_PATTERNS`` — map-only, fuses
into the corpus scan). This module adds the AUDIT side: per-category
match counts on the original text, which is what drives keep/drop and
source-level policy decisions before anything is redacted.

``PII_PATTERNS`` is imported — one source of truth for what counts as
PII; patterns avoid backreferences and lookaround so Java regex
(Spark) and RE2 (DuckDB oracle) agree.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from small_etl_spark.functions.text import PII_PATTERNS

# category label per pattern, in PII_PATTERNS order
_CATEGORIES = ("emails", "ips", "phones")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def scrub_pii(col: Column | str) -> Column:
    """Column-level redaction (same patterns/order as the DataFrame
    pass ``functions.text.redact_pii``)."""
    c = _c(col)
    for pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def pii_counts(col: Column | str) -> list[Column]:
    """Per-category match counts on the ORIGINAL text (audit columns:
    how much PII a source carries drives keep/drop policy)."""
    c = _c(col)
    return [
        F.regexp_count(c, F.lit(pattern)).cast("bigint").alias(f"n_{cat}")
        for (pattern, _), cat in zip(PII_PATTERNS, _CATEGORIES)
    ]
