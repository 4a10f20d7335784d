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

from small_etl_spark.operators.sort import global_ordinal

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


def equidepth_bins(
    df: DataFrame,
    col: str,
    tiebreak: str,
    bins: int = 10,
) -> DataFrame:
    """Exact equi-depth (quantile) binning: rows ranked by
    ``(col, tiebreak)`` are cut into ``bins`` groups of near-equal
    population (sizes differ by at most 1); per bin report
    ``(bin, cnt, lo, hi, sum_val)`` with the money sum exact in cents.

    The complement of :func:`histogram_cents` — equi-WIDTH answers
    "how are values spread over the range", equi-DEPTH answers "where
    are the quantile cut points" (feature bucketing, score calibration,
    choosing range-partition split points for a 100 TB sort).

    Bin assignment is ``floor(ordinal × bins / n)`` on the global
    0-based rank — a pure-integer rule both engines compute
    identically (ntile() would also work but its ragged-remainder
    placement differs subtly from the integer rule; we pin ONE rule in
    both). The rank comes from
    :func:`~small_etl_spark.operators.sort.global_ordinal` (range
    exchange + parallel per-partition rank), never a single-partition
    window; the per-bin aggregate is one bins-sized shuffle.
    """
    n_total = df.count()
    ranked = global_ordinal(
        df.select(F.col(col).alias("__v__"), F.col(tiebreak).alias("__t__")),
        ["__v__", "__t__"],
        ordinal_col="__ord__",
    )
    # integer DIV, not floor(double /): bit-exact at any corpus size
    # (double loses integers past 2^53)
    b = F.expr(f"CAST((__ord__ * {int(bins)}) DIV {int(n_total)} AS INT)")
    cents = F.round(F.col("__v__") * 100).cast("bigint")
    return (
        ranked.select(b.alias("bin"), F.col("__v__"), cents.alias("__c__"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("__v__").alias("lo"),
            F.max("__v__").alias("hi"),
            (F.sum("__c__").cast("double") / 100.0).alias("sum_val"),
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


def ab_chi_square(
    df: DataFrame,
    unit_col: str,
    variant_col: "F.Column",
    outcome_col: "F.Column",
) -> DataFrame:
    """2×2 A/B contingency test: one row with per-variant unit counts,
    conversion counts, and the chi-square statistic (1 dof, no
    continuity correction).

    ``variant_col``/``outcome_col`` are expressions evaluated per raw
    row; units are deduplicated first (a unit converts if ANY of its
    rows has a truthy outcome). chi² = N·(ad−bc)²/((a+b)(c+d)(a+c)(b+d))
    — every term an exact BIGINT, one final IEEE division rounded to
    6dp, so the statistic is bit-reproducible.

    Plan: per-unit collapse (one map-side-combined shuffle on the
    unit key), then a single global 4-counter aggregate — partials
    combine per partition, the exchange carries one row per
    partition. No libm, no approximation; scales as a pure
    two-level aggregation.
    """
    per_unit = (
        df.select(
            F.col(unit_col).alias("unit"),
            variant_col.alias("variant"),
            outcome_col.cast("int").alias("outcome"),
        )
        .groupBy("unit", "variant")
        .agg(F.max("outcome").alias("converted"))
    )
    counts = per_unit.agg(
        F.sum(((F.col("variant") == 0) & (F.col("converted") == 1)).cast("bigint")).alias("a_conv"),
        F.sum(((F.col("variant") == 0) & (F.col("converted") == 0)).cast("bigint")).alias("a_noconv"),
        F.sum(((F.col("variant") == 1) & (F.col("converted") == 1)).cast("bigint")).alias("b_conv"),
        F.sum(((F.col("variant") == 1) & (F.col("converted") == 0)).cast("bigint")).alias("b_noconv"),
    )
    a, b_, c, d = (F.col(x) for x in ("a_conv", "a_noconv", "b_conv", "b_noconv"))
    n = a + b_ + c + d
    num = n * (a * d - b_ * c) * (a * d - b_ * c)
    den = (a + b_) * (c + d) * (a + c) * (b_ + d)
    # try_divide: a degenerate table (an empty margin — e.g. every unit
    # converted) has no defined chi²; NULL matches DuckDB's x/0 → NULL
    # instead of throwing under ANSI mode.
    return counts.select(
        "a_conv", "a_noconv", "b_conv", "b_noconv",
        F.round(F.try_divide(num, den), 6).alias("chi_square"),
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    z_threshold: float = 3.5,
) -> DataFrame:
    """Robust per-group outlier summary via median absolute deviation:
    ``(group, med, mad, n, n_outliers)`` where an outlier has modified
    z-score 0.6745·|v−med|/MAD above ``z_threshold`` (the Iglewicz-
    Hoaglin rule). Unlike mean/stddev z-scores (zscore_outliers), a
    single corrupt extreme cannot drag the threshold.

    Two exact-median passes: group medians, then MAD over absolute
    deviations, then a counting re-join. Exact interpolated medians
    over integer inputs land on .5 at worst — exact in binary, so
    cross-engine reproducible (contrast percentile_approx, which is
    sketch-dependent). Zero-MAD groups (over half the values
    identical) report n_outliers = NULL rather than dividing by zero.

    At 100 TB exact medians are the expensive choice — each pass
    shuffles the full column to its group — and the docstring of
    approx_percentiles covers the sketch alternative; this operator
    is the exact twin for when the answer must be reproducible.
    """
    vals = df.select(
        F.col(group_col).alias("grp"), F.col(value_col).alias("v")
    )
    med = vals.groupBy("grp").agg(F.median("v").alias("med"))
    dev = vals.join(med, "grp").withColumn("ad", F.abs(F.col("v") - F.col("med")))
    mad = dev.groupBy("grp").agg(F.median("ad").alias("mad"))
    return (
        dev.join(mad, "grp")
        .groupBy("grp")
        .agg(
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.col("mad") > 0,
                    (
                        F.lit(0.6745) * F.col("ad") / F.col("mad")
                        > F.lit(z_threshold)
                    ).cast("bigint"),
                )
            ).alias("n_outliers"),
        )
        .select(
            F.col("grp").alias(group_col), "med", "mad", "n", "n_outliers"
        )
    )


def benford_audit(df: DataFrame, col: str) -> DataFrame:
    """Benford's-law first-digit audit of a positive numeric column:
    observed first-significant-digit distribution vs the expected
    ``log10(1 + 1/d)`` — the classic fabricated-data / corrupted-feed
    tripwire for naturally wide-ranging quantities (amounts, sizes,
    populations). Returns one row per digit 1-9 with observed count,
    observed rate, expected rate, and the χ² component
    ``(obs-exp)²/exp`` (sum them for the audit statistic).

    The first digit is taken textually — strip every non-1-9
    character from the value's string form and keep the first — NOT
    via ``floor(log10(x))`` digit math: log10 at exact powers of ten
    sits one ulp below the integer in some libms, which would
    misclassify 1000 as digit 9 on one engine and 1 on another. The
    string route is notation-proof (plain or scientific) and
    engine-exact. One map-side expression + a 9-row groupBy.
    """
    digits = (
        df.filter(F.col(col) > 0)
        .select(
            F.substring(
                F.regexp_replace(F.col(col).cast("string"), "[^1-9]", ""),
                1,
                1,
            )
            .cast("bigint")
            .alias("digit")
        )
        .filter(F.col("digit").isNotNull())
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__total__"))
    exp_rate = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    obs_rate = F.col("n").cast("double") / F.col("__total__").cast("double")
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(obs_rate, 6).alias("obs_rate"),
            F.round(exp_rate, 6).alias("exp_rate"),
            F.round(
                (obs_rate - exp_rate) * (obs_rate - exp_rate) / exp_rate, 6
            ).alias("chi2_component"),
        )
    )


def observe_during(
    df: DataFrame, metrics: dict[str, "F.Column"]
) -> tuple[DataFrame, "object"]:
    """Attach zero-cost pipeline metrics to a DataFrame: the returned
    ``Observation`` yields the aggregates AFTER the next action on the
    returned frame, computed inside that action's single pass — no
    second scan, no extra job (Spark's ``Dataset.observe``; the
    CollectMetrics node rides the existing plan).

    This is the scale-correct K7 metrics shape: the reference tallies
    record counts per stage as it materializes
    (/root/reference/src/core/contextual_pipeline.rs execution
    summary); at 100 TB a separate ``count()`` per stage would re-run
    the stage, while an observation is free. Usage::

        stage, obs = observe_during(stage, {
            "rows": F.count(F.lit(1)),
            "null_keys": F.sum(F.col("k").isNull().cast("long")),
        })
        stage.write.parquet(...)          # the one and only pass
        audit = obs.get                   # {'rows': ..., 'null_keys': ...}

    Only aggregates over the observed frame are legal (no
    distinct/sort); nulls count via sum-of-cast, the idiom above.
    """
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return observed, obs
