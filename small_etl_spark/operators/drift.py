"""Distribution-drift monitoring: two-sample KS statistic and PSI.

North-star operators (no reference analogue — its only data check is
record counts). A 100 TB ingest pipeline watches its feeds for drift:
did today's crawl shift the document-length distribution? Does source
B's value profile still match source A's? The two standard detectors:

- **Kolmogorov–Smirnov**: max gap between the two empirical CDFs —
  non-parametric, sensitive anywhere in the distribution.
- **Population Stability Index**: Σ (p−q)·ln(p/q) over fixed buckets —
  the scorecard-monitoring industry standard (rule of thumb: <0.1
  stable, 0.1–0.25 drifting, >0.25 shifted).

Both reduce arbitrarily large inputs to tiny aggregates before any
windowing, so the driver never sees more than the summary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def ks_statistic(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the empirical
    distributions of ``value_col`` in ``df_a`` and ``df_b``. Returns
    one row ``(n_a, n_b, ks_stat)`` with the statistic rounded 6dp.

    The right-continuous empirical CDFs can only differ maximally at
    an observed value, so D = max over DISTINCT union values of
    |F_a(x) − F_b(x)| — exact, no binning. Plan shape: one
    groupBy(value) shrinks both inputs to per-value counts (distinct-
    value-sized), cumulative sums run over that aggregate, and the
    final max is a 1-row reduce. The cumulative window is a single
    ordered partition over DISTINCT VALUES — for unbounded-cardinality
    doubles at extreme scale, quantize values first (e.g. to cents) or
    swap the window for sort.global_ordinal's two-phase rank; for the
    usual bounded domains (lengths, prices, scores) the aggregate is
    small by construction.
    """
    a = df_a.select(F.col(value_col).alias("v")).groupBy("v").agg(
        F.count(F.lit(1)).alias("ca")
    )
    b = df_b.select(F.col(value_col).alias("v")).groupBy("v").agg(
        F.count(F.lit(1)).alias("cb")
    )
    merged = a.join(b, "v", "full_outer").select(
        "v",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cums = merged.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    wall = Window.partitionBy()
    gaps = cums.select(
        "cum_a",
        "cum_b",
        F.max("cum_a").over(wall).alias("n_a"),
        F.max("cum_b").over(wall).alias("n_b"),
    )
    return gaps.agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.round(
            F.max(
                F.abs(
                    F.col("cum_a").cast("double") / F.col("n_a")
                    - F.col("cum_b").cast("double") / F.col("n_b")
                )
            ),
            6,
        ).alias("ks_stat"),
    )


def psi_report(
    curr: DataFrame,
    ref: DataFrame,
    value_col: str,
    lo: int,
    hi: int,
    buckets: int = 10,
    floor: float = 1e-6,
) -> DataFrame:
    """Population Stability Index of ``curr`` vs ``ref`` over
    ``buckets`` equi-width bins of integer-valued ``value_col`` on
    [lo, hi) (values outside clamp into the edge bins — drift OUT of
    the historical range must register, not vanish). Returns one row
    ``(n_curr, n_ref, psi)``.

    Shares are exact rationals (bucket count / total) floored at
    ``floor`` so an empty bucket contributes a large-but-finite term
    (the standard PSI convention) instead of ±inf. Two bucket-sized
    aggregations + a 2·buckets-row join — scales like a scan.
    """
    if hi <= lo or buckets <= 0:
        raise ValueError("need hi > lo and buckets > 0")
    width = (hi - lo) // buckets
    if width <= 0:
        raise ValueError("bucket width underflow: widen [lo, hi) or cut buckets")

    def bucketed(df: DataFrame, cname: str) -> DataFrame:
        b = F.least(
            F.greatest(
                F.floor((F.col(value_col) - lo) / width).cast("bigint"), F.lit(0)
            ),
            F.lit(buckets - 1).cast("bigint"),
        )
        return df.select(b.alias("bucket")).groupBy("bucket").agg(
            F.count(F.lit(1)).alias(cname)
        )

    c = bucketed(curr, "nc")
    r = bucketed(ref, "nr")
    merged = c.join(r, "bucket", "full_outer").select(
        F.coalesce("nc", F.lit(0)).alias("nc"),
        F.coalesce("nr", F.lit(0)).alias("nr"),
    )
    tot = Window.partitionBy()
    p = F.greatest(
        F.col("nc").cast("double") / F.sum("nc").over(tot), F.lit(floor)
    )
    q = F.greatest(
        F.col("nr").cast("double") / F.sum("nr").over(tot), F.lit(floor)
    )
    terms = merged.select(
        F.col("nc"), F.col("nr"), ((p - q) * F.log(p / q)).alias("term")
    )
    return terms.agg(
        F.sum("nc").alias("n_curr"),
        F.sum("nr").alias("n_ref"),
        F.round(F.sum("term"), 6).alias("psi"),
    )
