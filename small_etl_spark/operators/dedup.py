"""Deduplication operators (SURVEY §2.6, A2–A3) — exact dedup.

Reference keeps the FIRST occurrence in input order:
- A2 full-record  — /root/reference/src/core/contextual_pipeline.rs:630-637
  (key = JSON-serialized record)
- A3 by-fields    — /root/reference/src/core/contextual_pipeline.rs:614-629
  (key = stringified field tuple, missing field ⇒ "")

Spark's ``dropDuplicates`` keeps an *arbitrary* row, so "first wins"
needs an explicit ingest ordinal (SURVEY §7.3). At scale this is one
shuffle on the dedup key with a partial (map-side) min — the same cost
profile as any groupBy; no global sort.

Scale-path near-dup variants (MinHash-LSH, SimHash, ...) live in
``small_etl_spark.llm.dedup``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

ORDINAL = "__ingest_ordinal__"


def with_ingest_ordinal(df: DataFrame) -> DataFrame:
    """Attach a monotonically increasing ingest ordinal.

    ``monotonically_increasing_id`` encodes (partition, row-in-
    partition), so it preserves input order *within and across*
    partitions of an ordered source read — sufficient for first-wins
    semantics without any shuffle or driver round-trip.
    """
    return df.withColumn(ORDINAL, F.monotonically_increasing_id())


def dedup_by_fields_first_wins(
    df: DataFrame, fields: list[str], order_col: str | list[str] | None = None
) -> DataFrame:
    """A3: keep the first row per key tuple.

    ``order_col`` (one column or a list — include a unique tiebreak
    for determinism) defines "first"; if absent an ingest ordinal is
    attached (valid when ``df`` is a raw source read). Missing key
    columns are treated as "" (reference stringifies missing → "").

    Physical plan: one hash-shuffle on ``fields``; row_number window
    with partial sort inside each partition — no global sort, skew
    handled by AQE.
    """
    missing = [f for f in fields if f not in df.columns]
    work = df
    for m in missing:
        work = work.withColumn(m, F.lit(""))
    added_ordinal = False
    if order_col is None:
        work = with_ingest_ordinal(work)
        order_col = ORDINAL
        added_ordinal = True
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(*[F.coalesce(F.col(f).cast("string"), F.lit("")) for f in fields]).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    out = work.withColumn("__rn__", F.row_number().over(w)).filter(F.col("__rn__") == 1).drop("__rn__")
    if added_ordinal:
        out = out.drop(ORDINAL)
    return out.drop(*missing)


def dedup_full_record(df: DataFrame, order_col: str | None = None) -> DataFrame:
    """A2: full-record dedup, first occurrence wins.

    Equivalent to A3 keyed on every column. When input order is
    irrelevant (set semantics) prefer ``df.dropDuplicates()`` which
    map-side-combines; this variant pins the reference's order
    guarantee.
    """
    return dedup_by_fields_first_wins(df, list(df.columns), order_col=order_col)
