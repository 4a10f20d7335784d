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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    distributor: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: replicate the right side ``salt_buckets``×
    and scatter each left row to one replica.

    A hot join key sends every matching left row to ONE reducer in a
    plain shuffle join; here the hot key's rows spread over
    ``salt_buckets`` reducers, each holding a full copy of the right
    side's rows for that key. ``distributor`` is any left column with
    per-row variety (a row id / event id) — the salt is
    ``crc32(distributor) mod salt_buckets``, deterministic so reruns
    produce identical plans, but NOT a function of the join key
    (salting by the key would put the hot key back on one reducer).

    Cost: right side inflated ``salt_buckets``× through the shuffle —
    use when right ≪ left but too big to broadcast, or when AQE's
    skew-split (our session default) can't help because the skew is
    in a hash-aggregate rather than sort-merge. For the LEFT-anchored
    join types the RESULT is identical to the unsalted join (each
    left row meets exactly one replica, which holds ALL right rows
    for its key) and the salt columns never escape. Right/full outer
    variants are REJECTED: an unmatched right row exists in every one
    of the ``salt_buckets`` replicas, so the outer side would emit it
    ``salt_buckets``× — silently wrong; use AQE's skew-join split for
    outer joins instead.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not preserve {how!r} semantics: the right "
            f"side is replicated {salt_buckets}x, so unmatched right rows "
            f"would be emitted {salt_buckets} times under right/full outer "
            "joins. Use inner/left/left_semi/left_anti, or AQE skew-join "
            "for outer variants."
        )
    salted_left = left.withColumn(
        "__salt__",
        F.pmod(F.crc32(F.col(distributor).cast("string")), F.lit(salt_buckets)),
    )
    salted_right = right.withColumn(
        "__salt__",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"), F.lit(salt_buckets - 1).cast("bigint")
            )
        ),
    )
    return salted_left.join(salted_right, [on, "__salt__"], how).drop("__salt__")


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
