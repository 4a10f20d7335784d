"""Event-stream analytics operators: funnel, cohort retention, trend.

North-star operators past the reference's surface (its only time
handling is opaque strings — ``/root/reference/src/core/transform.rs``
never parses a date): the classic product-analytics shapes a
large-scale events pipeline needs, expressed as pure DataFrame plans
so Catalyst/AQE keep them scan-pruned and exchange-aligned.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: a user reaches step ``i`` when an
    event of type ``steps[i]`` occurs strictly AFTER the time they
    reached step ``i-1`` (earliest qualifying event wins).

    Returns one row per step: ``(step_index, step, users)``.

    Plan shape: per step, one filtered groupBy(user) min + an
    equi-join to the previous step's per-user conversion times with
    the strictly-after predicate as residual. Every shuffle in the
    chain keys on ``user_col``, so the exchanges align and AQE reuses
    the partitioning instead of re-shuffling per step; the per-step
    counts are 1-row aggregates unioned at the end. The loop is over
    the constant step list, never over data.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    u, t = F.col(user_col), F.col(ts_col)
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t__"))
    )
    out = [
        cur.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(1).alias("step_index"), F.lit(steps[0]).alias("step"), "users"
        )
    ]
    for i, step in enumerate(steps[1:], start=2):
        prev = cur.select(
            F.col(user_col).alias("__pu__"), F.col("__t__").alias("__pt__")
        )
        cur = (
            events.filter(F.col(type_col) == step)
            .join(prev, (u == F.col("__pu__")) & (t > F.col("__pt__")))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("__t__"))
        )
        out.append(
            cur.agg(F.count(F.lit(1)).alias("users")).select(
                F.lit(i).alias("step_index"), F.lit(step).alias("step"), "users"
            )
        )
    return reduce(DataFrame.unionByName, out)


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every consecutive event pair within a user's
    timeline, count ``prev_type → next_type`` and normalize to a
    conditional probability within each ``prev_type`` row.

    Returns ``(prev_type, next_type, transitions, prob)`` — the
    navigation/path-analysis primitive (what do users do after a
    'view'?).

    Plan shape: the lag window partitions by ``user_col`` — millions
    of small per-user frames, fully parallel, never a global sort
    (``id_col`` breaks timestamp ties deterministically). The pair
    count is one matrix-sized shuffle; the normalizing sum_over
    window runs on the already-tiny |types|² aggregate. Scale-safe at
    any corpus size.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = events.select(
        F.lag(type_col).over(w).alias("prev_type"),
        F.col(type_col).alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("transitions")
    )
    total = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "transitions",
        F.round(
            F.col("transitions").cast("double")
            / F.sum("transitions").over(total).cast("double"),
            6,
        ).alias("prob"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 604_800,
) -> DataFrame:
    """Cohort retention matrix: users bucketed by the week of their
    first event (cohort), counted in every subsequent week they were
    active. Returns ``(cohort_week, week_offset, users)`` with epochs
    as BIGINT seconds.

    Two aggregations, both keyed on ``user_col`` (first-seen per
    user; distinct user-week activity), then a co-partitioned join —
    the final (cohort, offset) agg is matrix-sized. Week truncation
    happens in UTC via date_trunc, so offsets are exact multiples of
    604800 and the integer division is lossless.
    """
    first = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).cast("long").alias("__cohort__")
    )
    activity = events.select(
        user_col, F.date_trunc("week", F.col(ts_col)).cast("long").alias("__week__")
    ).distinct()
    return (
        activity.join(first, user_col)
        .groupBy(
            F.col("__cohort__").alias("cohort_week"),
            ((F.col("__week__") - F.col("__cohort__")) / period_seconds)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("users"))
    )


def grouped_trend(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    origin: str = "2024-01-01",
) -> DataFrame:
    """Per-group OLS trend line (slope + intercept) of value vs time.

    The regression is decomposed into its five sufficient statistics
    (n, Σx, Σy, Σxy, Σx²) computed as EXACT integers — x quantized to
    whole hours since ``origin``, y to cents — so the map-side
    partial aggregation is order-insensitive and the normal-equation
    solve is bit-reproducible at any parallelism; only the two final
    divisions are floating point (rounded to 6 decimals). One
    shuffle, group-count output rows.

    Integer ranges: with |x| ≤ H hours and |y| ≤ C cents over n rows,
    the largest term is n·Σxy ≈ n²·H·C — safe in int64 well past the
    oracle scale factors; at extreme n switch the statistics to a
    centered (per-group mean-subtracted) form.
    """
    origin_s = F.lit(origin).cast("date").cast("timestamp").cast("long")
    x = F.floor((F.col(ts_col).cast("long") - origin_s) / 3600).cast("bigint")
    y = F.round(F.col(val_col) * 100).cast("bigint")
    s = (
        events.select(F.col(group_col), x.alias("__x__"), y.alias("__y__"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__x__").alias("__sx__"),
            F.sum("__y__").alias("__sy__"),
            F.sum(F.col("__x__") * F.col("__y__")).alias("__sxy__"),
            F.sum(F.col("__x__") * F.col("__x__")).alias("__sxx__"),
        )
    )
    denom = (F.col("n") * F.col("__sxx__") - F.col("__sx__") * F.col("__sx__")).cast(
        "double"
    )
    slope = (
        (F.col("n") * F.col("__sxy__") - F.col("__sx__") * F.col("__sy__")).cast(
            "double"
        )
        / denom
    )
    intercept = (
        (
            F.col("__sy__") * F.col("__sxx__") - F.col("__sx__") * F.col("__sxy__")
        ).cast("double")
        / denom
    )
    return s.select(
        group_col,
        "n",
        F.round(slope, 6).alias("slope_cents_per_hour"),
        F.round(intercept, 6).alias("intercept_cents"),
    )
