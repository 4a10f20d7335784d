"""Data-profiling / diagnostics operators: column profiles, exact
histograms, heavy-hitter detection, z-score outliers.

North-star operators (the reference has no profiling surface; its
closest feature is the record-count summary,
``/root/reference/src/core/sequence.rs`` execution summaries). These
are the data-quality checks a 100 TB ingest pipeline runs before
training: every one is a constant-output-size aggregation over an
arbitrarily large input, so the driver never sees more than the
summary.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

_NUMERIC = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-pass column profile: null count, exact distinct count, and
    min/max (numeric as double, strings as strings) per column, in
    long format ``(column, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str)``.

    All statistics for all columns are computed in a SINGLE agg — one
    scan however many columns are profiled. Exact COUNT(DISTINCT)
    over k columns makes Catalyst plan an Expand (k+1 rows per input
    row); at 100 TB swap in ``approx_count_distinct`` (HLL, one pass,
    no expand) — the profile's consumers tolerate ±2%.
    """
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs = []
    for c in cols:
        is_num = dtypes[c].startswith(_NUMERIC)
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__n_{c}"),
            F.countDistinct(F.col(c)).alias(f"__d_{c}"),
            (F.min(c).cast("double") if is_num else F.lit(None).cast("double")).alias(
                f"__minn_{c}"
            ),
            (F.max(c).cast("double") if is_num else F.lit(None).cast("double")).alias(
                f"__maxn_{c}"
            ),
            (F.min(c) if not is_num else F.lit(None).cast("string")).alias(
                f"__mins_{c}"
            ),
            (F.max(c) if not is_num else F.lit(None).cast("string")).alias(
                f"__maxs_{c}"
            ),
        ]
    one = df.agg(*aggs)
    rows = [
        one.select(
            F.lit(c).alias("column"),
            F.col(f"__n_{c}").alias("n_nulls"),
            F.col(f"__d_{c}").alias("n_distinct"),
            F.col(f"__minn_{c}").alias("min_num"),
            F.col(f"__maxn_{c}").alias("max_num"),
            F.col(f"__mins_{c}").alias("min_str"),
            F.col(f"__maxs_{c}").alias("max_str"),
        )
        for c in cols
    ]
    return reduce(DataFrame.unionByName, rows)


def histogram_cents(
    df: DataFrame,
    col: str,
    lo_cents: int,
    hi_cents: int,
    buckets: int,
) -> DataFrame:
    """Exact equi-width histogram of a 2-decimal money column:
    ``(bucket, lo_edge, hi_edge, cnt)`` for every non-empty bucket.

    The bucket index is integer arithmetic on cents (values above
    ``hi_cents`` clamp into the last bucket), so assignment is exact
    and engine-portable — no float-edge ambiguity. One map-side
    combined aggregation with ≤ ``buckets`` output rows.
    """
    if hi_cents <= lo_cents or buckets <= 0:
        raise ValueError("need hi > lo and buckets > 0")
    w = (hi_cents - lo_cents) // buckets
    c = F.round(F.col(col) * 100).cast("bigint")
    b = F.least(
        F.floor((c - F.lit(lo_cents)) / F.lit(w)).cast("bigint"),
        F.lit(buckets - 1).cast("bigint"),
    )
    return (
        df.select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "bucket",
            ((F.lit(lo_cents) + F.col("bucket") * w) / 100.0).alias("lo_edge"),
            ((F.lit(lo_cents) + (F.col("bucket") + 1) * w) / 100.0).alias("hi_edge"),
            "cnt",
        )
    )


def heavy_hitters(df: DataFrame, key_col: str, n: int = 10) -> DataFrame:
    """Exact top-n keys by row count with their global share:
    ``(key, cnt, share)`` — the skew-diagnosis query you run before
    choosing a salting factor (operators/skew.py). One shuffle
    (map-side combined, distinct-key-sized) + a 1-row total broadcast
    + TakeOrderedAndProject."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("__total__"))
    return (
        counts.orderBy(F.col("cnt").desc(), "key")
        .limit(n)
        .join(F.broadcast(total))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("__total__").cast("double"), 6)
            .alias("share"),
        )
    )


def zscore_outliers(
    df: DataFrame,
    group_col: str,
    val_col: str,
    id_col: str,
    threshold: float = 2.5,
) -> DataFrame:
    """Per-group z-score outliers of a 2-decimal value column:
    rows where ``|value - mean| / stddev > threshold`` within their
    group, with the z-score (rounded to 6).

    The group moments come from exact integer sufficient statistics
    (n, Σy, Σy² in cents) — the shuffle carries three numbers per
    group and the float math happens once per group from identical
    integers, so results are partitioning-independent and
    oracle-reproducible. The stats side is group-count rows and
    broadcasts back onto the fact scan: two passes over the data,
    zero sort.
    """
    y = F.round(F.col(val_col) * 100).cast("bigint")
    stats = (
        df.select(F.col(group_col), y.alias("__y__"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("__n__"),
            F.sum("__y__").alias("__sy__"),
            F.sum(F.col("__y__") * F.col("__y__")).alias("__syy__"),
        )
        .select(
            F.col(group_col).alias("__g__"),
            (F.col("__sy__").cast("double") / F.col("__n__").cast("double")).alias(
                "__mean__"
            ),
            F.sqrt(
                F.col("__syy__").cast("double") / F.col("__n__").cast("double")
                - (F.col("__sy__").cast("double") / F.col("__n__").cast("double"))
                * (F.col("__sy__").cast("double") / F.col("__n__").cast("double"))
            ).alias("__std__"),
        )
    )
    z = (y.cast("double") - F.col("__mean__")) / F.col("__std__")
    # a zero-variance group has no outliers by definition — drop it
    # before the division (ANSI mode makes x/0 an error, not a NaN)
    stats = stats.filter(F.col("__std__") > 0)
    return (
        df.join(F.broadcast(stats), F.col(group_col) == F.col("__g__"))
        .withColumn("__z__", z)
        .filter(F.abs(F.col("__z__")) > threshold)
        .select(
            id_col,
            group_col,
            val_col,
            F.round(F.col("__z__"), 6).alias("zscore"),
        )
    )


def expect(df: DataFrame, rules: list[tuple[str, "F.Column"]]) -> DataFrame:
    """Data-quality expectations report: each rule is
    ``(name, boolean_condition_column)``; returns one row per rule —
    ``(rule, violations, total, passed)`` — computed in a SINGLE
    pass (one agg evaluates every rule's violation count over one
    scan; nulls count as violations). The declarative cousin of the
    reference's declared-but-inert ``transform.validation``
    (/root/reference/src/config/sequence_config.rs:102-108), and the
    gate a 100 TB ingest runs before promoting a partition."""
    aggs = [F.count(F.lit(1)).alias("__total__")]
    for name, cond in rules:
        aggs.append(
            F.sum((~F.coalesce(cond, F.lit(False))).cast("bigint")).alias(
                f"__v_{name}"
            )
        )
    one = df.agg(*aggs)
    rows = [
        one.select(
            F.lit(name).alias("rule"),
            F.col(f"__v_{name}").alias("violations"),
            F.col("__total__").alias("total"),
            (F.col(f"__v_{name}") == 0).alias("passed"),
        )
        for name, _ in rules
    ]
    return reduce(DataFrame.unionByName, rows)
