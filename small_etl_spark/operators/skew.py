"""Skew mitigation operators (100 TB north-star; no reference
equivalent — the reference is single-process, SURVEY §4).

Two standard levers:

- ``salted_agg``: two-stage aggregation for skewed group keys — stage 1
  aggregates on (key, salt) spreading a hot key over ``salt_buckets``
  reducers, stage 2 merges the partials. Correct for any algebraic
  aggregate (count/sum/min/max given here).
- ``salted_broadcast_join`` is unnecessary in Spark: broadcast joins
  don't shuffle the fact side, and AQE's skew-join splitting
  (``spark.sql.adaptive.skewJoin.enabled``, on in our session factory)
  handles sort-merge skew at runtime. Documented here so callers reach
  for AQE first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column → "count" | "sum:col" | "min:col" |
    "max:col". A hot key's rows land on ``salt_buckets`` different
    reducers in stage 1; stage 2 combines ``salt_buckets`` partial rows
    per key — O(keys × salt) instead of one reducer eating the hot key.
    """
    partial_exprs = []
    merge_exprs = []
    for out, spec in aggs.items():
        op, _, col = spec.partition(":")
        if op == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"__p_{out}__"))
            merge_exprs.append(F.sum(f"__p_{out}__").alias(out))
        elif op == "sum":
            partial_exprs.append(F.sum(col).alias(f"__p_{out}__"))
            merge_exprs.append(F.sum(f"__p_{out}__").alias(out))
        elif op == "min":
            partial_exprs.append(F.min(col).alias(f"__p_{out}__"))
            merge_exprs.append(F.min(f"__p_{out}__").alias(out))
        elif op == "max":
            partial_exprs.append(F.max(col).alias(f"__p_{out}__"))
            merge_exprs.append(F.max(f"__p_{out}__").alias(out))
        else:
            raise ValueError(f"unsupported agg {spec!r}")

    salted = df.withColumn(
        "__salt__", F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    stage1 = salted.groupBy(*keys, "__salt__").agg(*partial_exprs)
    return stage1.groupBy(*keys).agg(*merge_exprs)


def null_skew_left_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Left join that routes NULL-keyed left rows AROUND the join.

    A left join's null keys can never match, yet a plain join ships
    every one of them through the shuffle — and since they all hash
    to the same partition, a null-heavy foreign key (the classic
    "optional dimension" column) creates the worst possible skew:
    one straggler task holding every null row. Here null-keyed rows
    short-circuit (null-extended with the right side's columns,
    exactly what the join would emit) and only non-null keys
    shuffle; AQE no longer sees a monster partition.
    """
    if how != "left":
        raise ValueError("null short-circuit only preserves LEFT join semantics")
    matched = left.filter(F.col(on).isNotNull()).join(right, on, "left")
    right_only = [c for c in matched.columns if c not in left.columns]
    bypass = left.filter(F.col(on).isNull())
    for c in right_only:
        bypass = bypass.withColumn(c, F.lit(None).cast(matched.schema[c].dataType))
    return matched.unionByName(bypass.select(*matched.columns))
