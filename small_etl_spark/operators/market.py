"""Market-basket analysis: association rules over co-occurrence pairs.

Extends the co-purchase pair mining (queries.py::copurchase_pairs, the
Apriori candidate step) with the rule-quality metrics — support,
confidence, lift. No reference equivalent (north-star op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def association_rules(
    baskets: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item_id",
    min_pair_count: int = 2,
) -> DataFrame:
    """Pairwise association rules from a (basket, item) relation.

    Returns one row per unordered item pair ``(item_a < item_b)`` that
    co-occurs in at least ``min_pair_count`` baskets:
    ``(item_a, item_b, n_ab, n_a, n_b, conf_a_to_b, conf_b_to_a,
    lift)``. Confidence = n_ab/n_x; lift = (n_ab·N)/(n_a·n_b) with N
    the total basket count. All counts are exact BIGINTs; the ratios
    are single IEEE divisions of exact integers, rounded to 6dp —
    bit-reproducible in any engine, no libm involved.

    Plan shape: distinct (basket, item) → per-item basket counts (one
    map-side-combined shuffle) → basket-keyed self-join for pairs (the
    blow-up is bounded by items-per-basket, never corpus-n² — same
    blocking argument as copurchase_pairs) → pair counts (second
    shuffle) → item counts joined back twice (AQE picks broadcast vs
    shuffle from the item-table size) → one-row corpus count as a
    broadcast cross join. ``min_pair_count`` prunes the long tail
    BEFORE the item-count joins, so the join input is the frequent
    pairs only. At 100 TB the skew hazard is a mega-basket (one order
    with thousands of items) — cap or salt upstream; AQE skew-join
    splits the pair shuffle otherwise.
    """
    bi = baskets.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("item")
    ).distinct()
    n_baskets = bi.agg(F.count_distinct("bk").alias("n_baskets"))
    item_counts = bi.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    a = bi.select("bk", F.col("item").alias("item_a"))
    b = bi.select(F.col("bk").alias("bk2"), F.col("item").alias("item_b"))
    pairs = (
        a.join(
            b,
            (F.col("bk") == F.col("bk2"))
            & (F.col("item_a") < F.col("item_b")),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_count)
    )
    ca = item_counts.select(
        F.col("item").alias("item_a"), F.col("n_item").alias("n_a")
    )
    cb = item_counts.select(
        F.col("item").alias("item_b"), F.col("n_item").alias("n_b")
    )
    return (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(F.col("n_ab") / F.col("n_a"), 6).alias("conf_a_to_b"),
            F.round(F.col("n_ab") / F.col("n_b"), 6).alias("conf_b_to_a"),
            F.round(
                (F.col("n_ab") * F.col("n_baskets"))
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )
