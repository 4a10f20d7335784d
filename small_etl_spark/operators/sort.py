"""Sort / limit operators (SURVEY §2.7, O1–O2).

- O1 single-field sort — /root/reference/src/core/contextual_pipeline.rs:647-672
  Reference nulls: missing sorts LAST ascending, FIRST descending.
  Reference compares the JSON-rendered string (numbers as strings!);
  we sort natively-typed by default — a deliberate, documented
  deviation (SURVEY §7.1) — and offer ``lexicographic=True`` for
  bug-compatible behavior.

Physical: Spark's sort is a range-partitioned distributed sort
(sampling → range exchange → per-partition sort) — no single-node
bottleneck at 100 TB, unlike a naive global orderBy-to-one-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sort_by_field(
    df: DataFrame,
    field: str,
    order: str = "asc",
    lexicographic: bool = False,
) -> DataFrame:
    """O1: sort by one field with the reference's null placement."""
    col = F.col(field).cast("string") if lexicographic else F.col(field)
    if order.lower() == "desc":
        return df.orderBy(col.desc_nulls_first())
    return df.orderBy(col.asc_nulls_last())


def top_k(
    df: DataFrame,
    field: str,
    k: int,
    order: str = "desc",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Sort + limit composition (reference expresses top-k this way).

    ``tiebreak`` columns (ascending) make the result deterministic when
    ``field`` has duplicates. Catalyst turns orderBy+limit into
    TakeOrderedAndProject — a per-partition top-k then a k-row merge at
    the driver; O(n) scan, no full sort, the right plan at any scale.
    """
    main = F.col(field).desc_nulls_first() if order.lower() == "desc" else F.col(
        field
    ).asc_nulls_last()
    extra = [F.col(c).asc() for c in (tiebreak or [])]
    return df.orderBy(main, *extra).limit(k)
