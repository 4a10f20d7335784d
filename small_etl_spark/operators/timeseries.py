"""Time-series operators: grid resampling with gap filling (LOCF) and
interval-RANGE rolling aggregates.

North-star operators (the reference has no time semantics at all —
dates stay strings end-to-end). These are the shapes a metrics /
feature-engineering pipeline needs: a dense regular grid from sparse
events, forward-filled, and trailing-window statistics keyed by TIME
(RANGE frame), not row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def resample_locf(
    events: DataFrame,
    start: str,
    end: str,
    step_seconds: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Resample per-key sparse events onto a dense [start, end) grid
    of ``step_seconds`` bins, forward-filling each key's last
    observed per-bin total (LOCF; bins before a key's first event
    stay NULL). Returns ``(key, bin_ts, cents_filled)`` with the
    value as exact integer cents.

    Plan shape: the per-bin aggregation shuffles once on
    (key, bin); the grid is ``sequence()`` + explode over the DISTINCT
    key set — per key it adds (end-start)/step rows, the standard
    densification cost, map-side generated (no grid shuffle: the
    left join back to the bin aggregate keys on (key, bin) too, so
    the exchanges align). The LOCF window is one partition per key
    ordered by bin — bounded at (end-start)/step rows per key
    regardless of event volume.

    At 100 TB: bound the grid span per call (a year of hourly bins =
    8.8k rows/key); for unbounded histories, run per time-slice and
    carry the last value of the previous slice as a seed row —
    partials compose exactly like incremental.merge_partials.
    """
    start_ts = F.lit(start).cast("timestamp")
    bin_col = F.to_timestamp(
        F.floor(
            (F.col(ts_col).cast("long") - start_ts.cast("long")) / step_seconds
        )
        * step_seconds
        + start_ts.cast("long")
    )
    cents = F.round(F.col(val_col) * 100).cast("bigint")
    per_bin = (
        events.filter(
            (F.col(ts_col) >= start_ts)
            & (F.col(ts_col) < F.lit(end).cast("timestamp"))
        )
        .groupBy(F.col(key_col).alias("key"), bin_col.alias("bin_ts"))
        .agg(F.sum(cents).alias("cents"))
    )
    grid = (
        events.select(F.col(key_col).alias("key"))
        .distinct()
        .select(
            "key",
            F.explode(
                F.sequence(
                    F.lit(start).cast("timestamp"),
                    F.lit(end).cast("timestamp") - F.expr("INTERVAL 1 SECOND"),
                    F.expr(f"INTERVAL {step_seconds} SECONDS"),
                )
            ).alias("bin_ts"),
        )
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bin_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(per_bin, ["key", "bin_ts"], "left")
        .select(
            "key",
            "bin_ts",
            F.last("cents", ignorenulls=True).over(w).alias("cents_filled"),
        )
    )


def resample_interpolate(
    events: DataFrame,
    start: str,
    end: str,
    step_seconds: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Dense-grid resampling with LINEAR interpolation: like
    :func:`resample_locf` but gaps between a key's observed bins take
    the straight-line value between the surrounding observations
    instead of carrying the last one (bins before the first / after
    the last observation stay NULL — extrapolation is a modeling
    decision, not a resampler's). Returns
    ``(key, bin_ts, interp_millicents)``.

    Mechanics: same grid + exact-cents per-bin totals as LOCF, then
    per bin the bracketing observed bins come from two ignorenulls
    windows (last-preceding and first-following); the interpolation
    ``(prev·(W−w) + next·w)·1000 DIV W`` (w, W = offsets in whole
    bins) is PURE INTEGER arithmetic — millicents, truncated. Floats
    are deliberately absent: interpolation ratios land exactly on
    .5 decimal ties, where Spark (shortest-decimal HALF_UP) and
    DuckDB (binary-product rounding) disagree by one ulp; integer DIV
    is bit-identical everywhere. Assumes non-negative cents (floor
    and truncating division coincide). Same scale profile as LOCF:
    per-key windows bounded at grid size regardless of event volume.
    """
    start_ts = F.lit(start).cast("timestamp")
    bin_col = F.to_timestamp(
        F.floor(
            (F.col(ts_col).cast("long") - start_ts.cast("long")) / step_seconds
        )
        * step_seconds
        + start_ts.cast("long")
    )
    cents = F.round(F.col(val_col) * 100).cast("bigint")
    per_bin = (
        events.filter(
            (F.col(ts_col) >= start_ts)
            & (F.col(ts_col) < F.lit(end).cast("timestamp"))
        )
        .groupBy(F.col(key_col).alias("key"), bin_col.alias("bin_ts"))
        .agg(F.sum(cents).alias("cents"))
    )
    grid = (
        events.select(F.col(key_col).alias("key"))
        .distinct()
        .select(
            "key",
            F.explode(
                F.sequence(
                    F.lit(start).cast("timestamp"),
                    F.lit(end).cast("timestamp") - F.expr("INTERVAL 1 SECOND"),
                    F.expr(f"INTERVAL {step_seconds} SECONDS"),
                )
            ).alias("bin_ts"),
        )
    )
    joined = grid.join(per_bin, ["key", "bin_ts"], "left")
    bin_s = F.col("bin_ts").cast("long")
    w_prev = (
        Window.partitionBy("key")
        .orderBy("bin_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("key")
        .orderBy("bin_ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col("cents").isNotNull(), bin_s)
    obs = joined.select(
        "key",
        "bin_ts",
        F.last("cents", ignorenulls=True).over(w_prev).alias("__pc__"),
        F.last(obs_t, ignorenulls=True).over(w_prev).alias("__pt__"),
        F.first("cents", ignorenulls=True).over(w_next).alias("__nc__"),
        F.first(obs_t, ignorenulls=True).over(w_next).alias("__nt__"),
    )
    s = int(step_seconds)
    # offsets in whole bins: differences are exact multiples of step
    obs = obs.withColumns(
        {
            "__ofs__": (
                (F.col("bin_ts").cast("long") - F.col("__pt__")) / s
            ).cast("bigint"),
            "__span__": ((F.col("__nt__") - F.col("__pt__")) / s).cast("bigint"),
        }
    )
    interp = F.when(
        F.col("__pt__") == F.col("__nt__"), F.col("__pc__") * 1000
    ).otherwise(
        F.expr(
            "((__pc__ * (__span__ - __ofs__) + __nc__ * __ofs__) * 1000)"
            " DIV __span__"
        )
    )
    return obs.select("key", "bin_ts", interp.alias("interp_millicents"))


def rolling_range_sum(
    events: DataFrame,
    window_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Trailing time-window sum per event: for each row, the exact
    cents total of the key's events in the preceding
    ``window_seconds`` (inclusive of now) — a RANGE frame over epoch
    seconds, not a ROWS frame, so co-timed bursts and sparse gaps
    both aggregate correctly. One window partition per key."""
    cents = F.round(F.col(val_col) * 100).cast("bigint")
    secs = F.col(ts_col).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(secs)
        .rangeBetween(-window_seconds, 0)
    )
    return events.select(
        F.col(key_col),
        F.col("event_id"),
        (F.sum(cents).over(w).cast("double") / 100.0).alias("trailing_sum"),
    )


def ewma(
    events: DataFrame,
    alpha: float = 0.5,
    lookback: int = 7,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Finite-window exponentially weighted moving average per key:
    at each event, the trailing ``lookback+1`` values are combined
    with weights (1-α)^age and normalized — the smoothing primitive
    behind anomaly baselines and metric dashboards.

    The window is explicitly finite (ROWS BETWEEN lookback PRECEDING)
    rather than the infinite recurrence: it is expressible as a pure
    window + higher-order-function pass in ANY engine (and therefore
    DuckDB-oracle-exact), and at α=0.5 every weight is a power of two,
    so each weighted term is bit-exact and both engines fold the same
    doubles in the same order. NULL values are excluded before
    windowing (both engines' list aggregates would skip them anyway —
    excluding first makes the frame semantics identical).

    One shuffle on ``key_col``; the HOF arithmetic is JVM-side
    whole-stage-codegen'd, O(lookback) per row.
    """
    decay = 1.0 - alpha
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-lookback, 0)
    )
    arr = F.collect_list(val_col).over(w)
    base = events.filter(F.col(val_col).isNotNull()).withColumn("__l__", arr)
    n = F.size("__l__")
    terms = F.zip_with(
        F.col("__l__"),
        F.sequence(F.lit(1), n),
        lambda v, i: v * F.pow(F.lit(decay), (n - i).cast("double")),
    )
    weights = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.pow(F.lit(decay), (n - i).cast("double")),
    )
    fold = lambda col: F.aggregate(col, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    return base.select(
        id_col,
        key_col,
        ts_col,
        val_col,
        (fold(terms) / fold(weights)).alias("ewma"),
    )


def seasonal_decompose_dow(
    daily: DataFrame,
    day_col: str = "day",
    cents_col: str = "y_cents",
) -> DataFrame:
    """Classical additive decomposition of a DAILY series into
    trend + day-of-week seasonal + residual (the STL-lite every
    metrics pipeline ends up needing): trend is a centered 7-day
    rolling mean (null at the edges where the window is short),
    the seasonal term is the per-weekday mean of the detrended
    series, and the residual is what remains.

    Exactness: input is integer CENTS; every aggregate stays integer
    (7·y − Σ₇y for detrending, summed per weekday) until the final
    divisions, so the oracle hash is stable regardless of summation
    order — the same integer-cents discipline as the money
    aggregates in queries.py. Weekday = days-since-epoch mod 7
    (NOT ``dayofweek``: Spark is 1=Sunday-based, DuckDB 0-based —
    epoch arithmetic is engine-proof).

    Scale note: the window here is over the already-AGGREGATED
    one-row-per-day series — bounded by calendar length, thousands
    of rows at most — so its unpartitioned global sort is a
    non-issue; the distributed heavy lifting (raw events → daily
    cents) happens before this operator. Returns
    ``(day, dow, y, trend, seasonal, residual)`` in dollars, 6dp.
    """
    w7 = Window.orderBy(day_col).rowsBetween(-3, 3)
    with_trend = daily.select(
        F.col(day_col),
        F.pmod(
            F.datediff(F.to_date(day_col), F.to_date(F.lit("1970-01-01"))), 7
        ).cast("bigint").alias("dow"),
        F.col(cents_col).alias("__yc__"),
        F.when(
            F.count(F.lit(1)).over(w7) == 7, F.sum(cents_col).over(w7)
        ).alias("__t7__"),
    ).withColumn(
        "__d7__",
        F.when(
            F.col("__t7__").isNotNull(),
            F.lit(7) * F.col("__yc__") - F.col("__t7__"),
        ),
    )
    seasonal = (
        with_trend.filter(F.col("__d7__").isNotNull())
        .groupBy("dow")
        .agg(
            F.sum("__d7__").alias("__s_num__"),
            F.count(F.lit(1)).alias("__s_n__"),
        )
    )
    out = with_trend.join(F.broadcast(seasonal), "dow", "left")
    s_term = F.col("__s_num__").cast("double") / (
        F.lit(700.0) * F.col("__s_n__").cast("double")
    )
    t_term = F.col("__t7__").cast("double") / F.lit(700.0)
    y_term = F.col("__yc__").cast("double") / F.lit(100.0)
    return out.select(
        day_col,
        "dow",
        F.round(y_term, 6).alias("y"),
        F.round(t_term, 6).alias("trend"),
        F.round(s_term, 6).alias("seasonal"),
        F.round(y_term - t_term - s_term, 6).alias("residual"),
    )
