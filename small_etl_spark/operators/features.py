"""Feature-engineering transforms: group-wise standardization and
percentile winsorization.

North-star operators (no reference analogue). The last mile before a
model consumes tabular features: center/scale within a group, and clip
the long tails that would otherwise dominate a squared loss. Both are
two-pass shapes — a tiny per-group statistics aggregate broadcast back
over the full table — so they scale like a scan plus one
group-count-sized shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def groupwise_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str = "z",
) -> DataFrame:
    """Per-group z-score standardization: ``z = (v − μ_g) / σ_g`` with
    population σ (ddof=0), rounded 6dp; groups with σ=0 yield NULL
    (a constant feature has no scale).

    μ and σ come from EXACT integer sufficient statistics over cents
    (n, Σc, Σc²) — order-insensitive map-side partials, so the
    per-group numbers are identical at any parallelism; the z itself
    is the only floating-point step: sqrt is IEEE-exact and the
    expression shape is pinned to match the DuckDB oracle
    term-for-term.
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    stats = (
        df.select(F.col(group_col), cents.alias("__c__"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("__n__"),
            F.sum("__c__").alias("__s__"),
            F.sum(F.col("__c__") * F.col("__c__")).alias("__ss__"),
        )
    )
    joined = df.withColumn("__c__", cents).join(F.broadcast(stats), group_col)
    n = F.col("__n__").cast("double")
    mean = F.col("__s__").cast("double") / n
    var = (
        F.col("__ss__").cast("double") / n - mean * mean
    )  # population variance, in cents²
    z = F.when(
        var > 0,
        F.round((F.col("__c__").cast("double") - mean) / F.sqrt(var), 6),
    )
    return joined.withColumn(out_col, z).drop("__c__", "__n__", "__s__", "__ss__")


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    out_col: str = "clipped",
) -> DataFrame:
    """Per-group percentile clipping: values below the group's
    ``lower`` quantile (linear-interpolated, SQL ``percentile_cont``
    semantics) clamp up to it, values above ``upper`` clamp down.
    Adds ``out_col`` (2-decimal money, exact where unclipped).

    Same two-pass shape as :func:`groupwise_normalize`: quantiles on
    integer cents per group (a bounded aggregate), broadcast back,
    clip map-side. Quantiles interpolate on cents in BOTH engines, so
    the bounds — the only floats — are the same IEEE doubles.
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    bounds = (
        df.select(F.col(group_col), cents.alias("__c__"))
        .groupBy(group_col)
        .agg(
            F.percentile("__c__", F.lit(lower)).alias("__lo__"),
            F.percentile("__c__", F.lit(upper)).alias("__hi__"),
        )
    )
    joined = df.withColumn("__c__", cents).join(F.broadcast(bounds), group_col)
    # explicit null guard: Spark/DuckDB GREATEST null-skipping rules
    # differ — a null value must stay null, not clamp to the bound
    clipped = F.when(
        F.col("__c__").isNotNull(),
        F.round(
            F.least(
                F.greatest(F.col("__c__").cast("double"), F.col("__lo__")),
                F.col("__hi__"),
            )
            / 100.0,
            6,
        ),
    )
    return joined.withColumn(out_col, clipped).drop("__c__", "__lo__", "__hi__")


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    val_col: str,
    id_col: str,
    ref_group: str,
) -> DataFrame:
    """Quantile normalization: map every group's values onto the
    REFERENCE group's empirical distribution — x becomes the reference
    value at x's within-group percent-rank. The calibration transform
    for cross-source score comparability (quality scores from
    different raters/sources land on one scale; the reference group
    maps onto itself).

    Returns ``(id_col, group_col, val_col, mapped)`` where ``mapped``
    is the reference-group value whose percent-rank is the greatest
    one ≤ this row's rank — an AS-OF match on the rank axis, computed
    with the union-merge single-sort trick (tag reference quantiles
    side 0, data rows side 1; one sort by (rank, side); running
    last-non-null carries the reference value forward). Every rank is
    (rank-1)/(n-1) with a unique tiebreak, so both engines sort the
    identical doubles identically.

    Scale: the exact form is one sort over data + reference quantiles
    (the same shape as ``operators.joins.asof_join``). At 100 TB,
    compress the reference side to T quantiles first
    (``approx_percentiles``) and broadcast; the mapping join then
    stays map-side.
    """
    w = Window.partitionBy(group_col).orderBy(val_col, id_col)
    src = df.select(
        id_col, group_col, val_col, F.percent_rank().over(w).alias("__pr__")
    )
    ref = src.filter(F.col(group_col) == ref_group).select(
        F.lit(None).cast("bigint").alias(id_col),
        F.lit(None).cast("string").alias(group_col),
        F.lit(None).cast(dict(df.dtypes)[val_col]).alias(val_col),
        F.col("__pr__"),
        F.lit(0).alias("__side__"),
        F.col(val_col).alias("__rv__"),
    )
    data = src.select(
        id_col,
        group_col,
        val_col,
        "__pr__",
        F.lit(1).alias("__side__"),
        F.lit(None).cast(dict(df.dtypes)[val_col]).alias("__rv__"),
    )
    u = ref.unionByName(data)
    carry = Window.orderBy("__pr__", "__side__").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        u.withColumn(
            "mapped", F.last("__rv__", ignorenulls=True).over(carry)
        )
        .filter(F.col("__side__") == 1)
        .select(id_col, group_col, val_col, "mapped")
    )
