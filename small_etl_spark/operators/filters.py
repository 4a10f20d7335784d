"""Filter / predicate operators (SURVEY §2.4, F1–F5).

- F1 threshold → intermediate — /root/reference/src/app/pipelines/simple_pipeline.rs:113-116
- F3 conjunctive equality     — /root/reference/src/core/contextual_pipeline.rs:1064-1083
- F4 row limit                — /root/reference/src/app/pipelines/mvp_pipeline.rs:74-109
- F5 extract filters          — /root/reference/src/config/sequence_config.rs:72
  (declared, never implemented in the reference — implemented for real here)

Filters are expressed as Column predicates so Catalyst pushes them
into the parquet scan (``PushedFilters``) — at 100 TB the filter IS
the scan cost, so this pushdown is the whole ballgame.
"""

from __future__ import annotations

from functools import reduce
from operator import and_

from pyspark.sql import Column, DataFrame, functions as F


def threshold_filter(df: DataFrame, column: str, threshold: float) -> DataFrame:
    """F1: the reference's ``value > 20`` side-output selector.

    The reference computes this as a *side output* alongside the full
    output (one pass); in Spark both outputs share one cached plan and
    Catalyst pipelines the predicate, so we just return the filtered
    frame and let the caller reuse ``df`` for the full output.
    """
    return df.filter(F.col(column) > F.lit(threshold))


def equality_filter(df: DataFrame, conditions: dict[str, object]) -> DataFrame:
    """F3: conjunction of exact-equality conditions.

    Missing column ⇒ no row matches (reference: missing field ⇒ false,
    contextual_pipeline.rs:1071-1079). Null-safe: a null cell never
    equals a condition value.
    """
    preds: list[Column] = []
    existing = set(df.columns)
    for field, value in conditions.items():
        if field not in existing:
            return df.filter(F.lit(False))
        preds.append(F.col(field) == F.lit(value))
    if not preds:
        return df
    return df.filter(reduce(and_, preds))


def extract_filters(df: DataFrame, filters: dict[str, object]) -> DataFrame:
    """F5: source-level filters — equality, or value-in-list.

    The reference declares ``extract.filters`` in config
    (sequence_config.rs:72) but never reads it; we enforce it. List
    values mean membership.
    """
    preds: list[Column] = []
    for field, value in filters.items():
        c = F.col(field)
        if isinstance(value, (list, tuple)):
            preds.append(c.isin(list(value)))
        else:
            preds.append(c == F.lit(value))
    if not preds:
        return df
    return df.filter(reduce(and_, preds))


def limit_records(
    df: DataFrame, max_records: int | None = None, first_record_only: bool = False
) -> DataFrame:
    """F4: ``max_records`` truncation; ``first_record_only`` ⇒ limit 1.

    Catalyst pushes the limit into the scan (CollectLimit) — the
    reference hand-codes this with ``take(n)`` during extract
    (mvp_pipeline.rs:74-109).
    """
    if first_record_only:
        return df.limit(1)
    if max_records is not None:
        return df.limit(int(max_records))
    return df
