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


def inter_event_gaps(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Distribution of think-time gaps between a user's consecutive
    events, bucketed on human-scale boundaries (<1m, 1m–10m, 10m–1h,
    1h–1d, ≥1d). Returns ``(bucket, n, min_gap_s, max_gap_s,
    avg_gap_s)`` — the histogram that picks a sessionization gap
    threshold from data instead of folklore.

    Gap seconds are exact integers (truncated-epoch difference), so
    bucketing is engine-portable; only the final avg divides. Lag
    window partitions per user (parallel), then one 5-row shuffle.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    secs = F.col(ts_col).cast("long")
    gap = (secs - F.lag(secs).over(w)).alias("gap_s")
    gaps = events.select(gap).filter(F.col("gap_s").isNotNull())
    bucket = (
        F.when(F.col("gap_s") < 60, "a_lt_1m")
        .when(F.col("gap_s") < 600, "b_1m_10m")
        .when(F.col("gap_s") < 3600, "c_10m_1h")
        .when(F.col("gap_s") < 86400, "d_1h_1d")
        .otherwise("e_ge_1d")
    )
    return gaps.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("gap_s").alias("min_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
        F.round(F.sum("gap_s").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_gap_s"
        ),
    )


def last_touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    val_col: str = "value",
) -> DataFrame:
    """Last-touch conversion attribution: each conversion event is
    credited to the LAST preceding non-conversion touch in the same
    user's timeline (conversions with no prior touch fall out).
    Returns ``(touch_type, conversions, revenue)`` with revenue
    cents-exact.

    The ``last(non-conversion type, ignorenulls) OVER (… ROWS
    UNBOUNDED PRECEDING TO 1 PRECEDING)`` window skips over
    interleaved conversions — two back-to-back purchases both credit
    the same earlier touch, the standard marketing-attribution rule.
    Per-user window frames (parallel), one |types|-sized shuffle.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col(type_col) != conversion_type, F.col(type_col)),
        ignorenulls=True,
    ).over(w)
    cents = F.round(F.col(val_col) * 100).cast("bigint")
    return (
        events.select(
            F.col(type_col), touch.alias("touch_type"), cents.alias("__c__")
        )
        .filter((F.col(type_col) == conversion_type) & F.col("touch_type").isNotNull())
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("conversions"),
            (F.sum("__c__").cast("double") / 100.0).alias("revenue"),
        )
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


def event_pattern_matches(
    df: DataFrame,
    pattern: str,
    alphabet: dict[str, str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """MATCH_RECOGNIZE-lite: count regex matches of an event-sequence
    ``pattern`` per user. Each user's events are serialized — in
    (ts, id) order — into a string of single letters via ``alphabet``
    (event types absent from the mapping become ``.`` and can
    interrupt contiguous patterns), and ``pattern`` is any regex over
    those letters: ``"vcp"`` = view→click→purchase back-to-back,
    ``"v[^p]*p"`` = a view eventually converting with no intervening
    purchase. Returns ``(user_col, seq_len, n_matches)``.

    This is the pragmatic Spark answer to SQL's MATCH_RECOGNIZE
    (which Spark lacks): per-key sequences are at most
    events-per-user long, so the serialize-then-regex plan is one
    groupBy with an ORDERED collect (``array_sort`` on (ts, id)
    structs — deterministic under any partitioning) and a map-side
    regex count. Nothing pairwise, no self-joins; the shuffle is the
    same one any per-user aggregate pays. Guard for 100 TB: a hot key
    with millions of events makes a long string — cap with a
    preceding per-user limit/time-window filter, as with any
    collect_list aggregate.
    """
    letter = F.col(type_col)
    expr = None
    for t, ch in alphabet.items():
        if len(ch) != 1:
            raise ValueError(f"alphabet letters must be single chars: {ch!r}")
        cond = F.when(letter == t, F.lit(ch))
        expr = cond if expr is None else expr.when(letter == t, F.lit(ch))
    expr = expr.otherwise(F.lit("."))

    seqs = (
        df.select(
            F.col(user_col),
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(id_col).alias("id"),
                expr.alias("ch"),
            ).alias("__e__"),
        )
        .groupBy(user_col)
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list("__e__")), lambda e: e["ch"]
                ),
            ).alias("__seq__")
        )
    )
    return seqs.select(
        user_col,
        F.length("__seq__").cast("bigint").alias("seq_len"),
        F.size(F.regexp_extract_all("__seq__", F.lit(pattern), 0))
        .cast("bigint")
        .alias("n_matches"),
    )


def position_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    val_col: str = "value",
) -> DataFrame:
    """Position-based multi-touch attribution REPORT: for every
    conversion, the journey is the run of non-conversion touches
    since the user's previous conversion; each touch is classified
    by position — ``only`` (single-touch journey), ``first``,
    ``last``, or ``middle`` — and the report counts touches and sums
    the full converted revenue they influenced, per (touch_type,
    role).

    Deliberately reports ROLES + integer cents instead of fractional
    U-shaped credits (40/20/40): the fractional split is a trivial
    consumer-side multiply, while splitting here would force
    order-dependent double sums that no engine pair reproduces
    bit-for-bit. Plan: two per-user windows (journey index = running
    conversion count; position = row numbers within journey) + one
    equi-join of journeys onto their closing conversion — all
    user-partitioned, no global anything.
    """
    from pyspark.sql import Window

    w_prior = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_conv = (F.col(type_col) == conversion_type).cast("bigint")
    marked = events.select(
        F.col(user_col),
        F.col(ts_col),
        F.col(id_col),
        F.col(type_col),
        F.col(val_col),
        F.coalesce(F.sum(is_conv).over(w_prior), F.lit(0)).alias("__j__"),
    )
    convs = marked.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col),
        F.col("__j__"),
        F.round(F.col(val_col) * 100).cast("bigint").alias("__cents__"),
    )
    touches = marked.filter(F.col(type_col) != conversion_type)
    w_j = Window.partitionBy(user_col, "__j__").orderBy(ts_col, id_col)
    w_jd = Window.partitionBy(user_col, "__j__").orderBy(
        F.col(ts_col).desc(), F.col(id_col).desc()
    )
    pos = touches.select(
        F.col(user_col),
        F.col("__j__"),
        F.col(type_col).alias("touch_type"),
        F.row_number().over(w_j).alias("__ra__"),
        F.row_number().over(w_jd).alias("__rd__"),
    ).withColumn(
        "role",
        F.when((F.col("__ra__") == 1) & (F.col("__rd__") == 1), "only")
        .when(F.col("__ra__") == 1, "first")
        .when(F.col("__rd__") == 1, "last")
        .otherwise("middle"),
    )
    credited = pos.join(convs, [user_col, "__j__"])
    return (
        credited.groupBy("touch_type", "role")
        .agg(
            F.count(F.lit(1)).alias("touches"),
            (
                F.sum("__cents__").cast("double") / 100.0
            ).alias("influenced_revenue"),
        )
    )
