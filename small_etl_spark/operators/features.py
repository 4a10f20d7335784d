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

from pyspark.sql import DataFrame, functions as F


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
