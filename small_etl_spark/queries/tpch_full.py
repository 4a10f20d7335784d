"""Full TPC-H shape coverage: q2/q4/q6..q22 — every join broadcast-audited, money math in exact integer cents."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from small_etl_spark.queries._registry import register
from small_etl_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# North-star analytics, round 2: wider TPC-H shape coverage. All joins
# are hint-free (AQE sizes them); all money math in exact integer units.
# --------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                    * CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE)
             / 10000.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan → filter → global agg. The whole
    query is one map-side partial sum + a 1-row final agg; every
    predicate reaches the parquet scan (PushedFilters), so at 100 TB
    this reads only the row groups whose min/max stats survive."""
    li = load_table(spark, sf_dir, "lineitem")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    disc_c = F.round(F.col("l_discount") * 100).cast("bigint")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & disc_c.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg((F.sum(price_c * disc_c).cast("double") / 10000.0).alias("revenue"))
    )


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS subquery as a LeftSemi join with a
    non-equi residual (l_shipdate > o_orderdate), then a 5-group
    count. The semi join deduplicates lineitem matches without
    materializing them — no distinct, no second agg."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    sel = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    return (
        sel.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q12_priority_by_returnflag",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate
    GROUP BY l_returnflag
    """,
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → returnflag; the testdata has no
    l_shipmode): fact-to-fact join + conditional counts. Both sides
    shuffle on the join key at scale (AQE decides; no hints)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_returnflag"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
    )


@register(
    "q14_promo_revenue",
    """
    SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                    THEN CAST(round(l_extendedprice*100) AS BIGINT)
                         * (100 - CAST(round(l_discount*100) AS BIGINT))
                    ELSE 0 END) AS DOUBLE) * 100.0
           / CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                      * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)
             AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-02-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: join + conditional-revenue ratio. Both sums
    run in exact integer units and only the final ratio is floating
    point, so the single output value is bit-reproducible."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-02-01").cast("date"))
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.sum(promo).cast("double") * F.lit(100.0)
                / F.sum(rev).cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "q16_supplier_cnt",
    """
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size IN (1, 14, 23, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp → lineitem as the part-supplier
    relation): distinct-supplier counts per part attribute with a
    NOT-IN exclusion as a LeftAnti join. The anti side (negative-
    balance suppliers) is tiny and AQE broadcasts it."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(
            p.filter(F.col("p_size").isin(1, 14, 23, 45)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q19_discounted_revenue",
    """
    SELECT CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)
             / 10000.0 AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#33' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate across both join sides.
    Catalyst splits the disjunction: the part-only conjuncts
    (brand/size) and lineitem-only conjuncts (quantity) are pushed
    below the join as OR'd scan filters, shrinking both inputs before
    the join runs — check PushedFilters on both scans."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(p, F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#33")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    rev = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    return j.filter(cond).agg(
        (F.sum(rev).cast("double") / 10000.0).alias("revenue")
    )


@register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)
             / 10000.0 AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20.
    Only nation carries a broadcast hint (25 rows); customer/orders
    are AQE-sized. TakeOrderedAndProject caps the result without a
    global sort."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
                & (F.col("o_orderdate") < F.lit("1996-04-01").cast("date"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(rev).cast("double") / 10000.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q2_min_cost_supplier",
    """
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(round(l_extendedprice*100) AS BIGINT)) AS cost_cents
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eligible AS (
      SELECT p_partkey, p_name, s_name, s_acctbal, n_name, cost_cents
      FROM ps
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
      WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE' AND r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           CAST(cost_cents AS DOUBLE) / 100.0 AS supply_cost
    FROM (SELECT *, MIN(cost_cents) OVER (PARTITION BY p_partkey) AS min_cost
          FROM eligible)
    WHERE cost_cents = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (testdata has no partsupp — the grouped
    (l_partkey, l_suppkey) min price over lineitem plays the
    part-supplier relation): correlated min-cost subquery per part,
    answered with one window over the *already part-filtered*
    candidate set. At 100 TB the part/region filters shrink the
    window input to dimension scale before any shuffle; the
    part-supplier agg itself is a partial-agg shuffle on a
    well-distributed compound key."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    ).select("p_partkey", "p_name")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
            "cost_cents"
        )
    )
    eligible = (
        ps.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name", "cost_cents")
    )
    w = Window.partitionBy("p_partkey")
    return (
        eligible.withColumn("min_cost", F.min("cost_cents").over(w))
        .filter(F.col("cost_cents") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            (F.col("cost_cents").cast("double") / 100.0).alias("supply_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q7_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)
             / 10000.0 AS revenue
    FROM lineitem
      JOIN supplier  ON s_suppkey = l_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN orders    ON o_orderkey = l_orderkey
      JOIN customer  ON c_custkey = o_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS INT)
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume — the same nation dim
    joined twice under different roles (supplier side / customer
    side) with a disjunctive cross-role predicate. Both nation joins
    broadcast (constant-size dim); the orders join is the only real
    shuffle. The nation-pair filter cannot be pushed below either
    single join — it's evaluated post-join, which is the point of
    the shape."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg((F.sum(rev).cast("double") / 10000.0).alias("revenue"))
    )


@register(
    "q8_market_share",
    """
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END)
                AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(round(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l_discount*100) AS BIGINT)) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
        JOIN part      ON p_partkey = l_partkey
        JOIN supplier  ON s_suppkey = l_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        JOIN orders    ON o_orderkey = l_orderkey
        JOIN customer  ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's part-filtered
    import volume per year — a conditional-sum ratio over a 7-table
    star. Every dimension (part/supplier/nation×2/region) broadcasts;
    orders is the one shuffle join. Numerator and denominator are
    exact integer sums; only the final division is floating point."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    volume = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    return (
        li.join(F.broadcast(p.select("p_partkey")), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .select(F.year("o_orderdate").alias("o_year"), volume.alias("volume"), "supp_nation")
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(
                        F.lit(0).cast("bigint")
                    )
                ).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    """
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                      * (100 - CAST(round(l_discount*100) AS BIGINT))
                    - CAST(round(p_retailprice*100) AS BIGINT) * 60
                      * CAST(l_quantity AS BIGINT)) AS DOUBLE)
             / 10000.0 AS sum_profit
    FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, CAST(year(o_orderdate) AS INT)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp → unit cost modeled as 60% of
    p_retailprice): profit per supplier-nation per order-year over a
    substring-filtered part slice. The LIKE '%red%' filter can't use
    stats but is still pushed to the part scan; profit is computed in
    exact integer cent-units (revenue minus cost) so the grouped sums
    are bit-reproducible at any parallelism."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    ).select("p_partkey", "p_retailprice")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    ) - F.round(F.col("p_retailprice") * 100).cast("bigint") * 60 * F.col(
        "l_quantity"
    ).cast("bigint")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(amount).cast("double") / 10000.0).alias("sum_profit"))
    )


@register(
    "q11_important_stock",
    """
    WITH v AS (
      SELECT l_partkey, CAST(round(l_extendedprice*100) AS BIGINT) AS val
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
    )
    SELECT l_partkey, CAST(SUM(val) AS DOUBLE) / 100.0 AS part_value
    FROM v
    GROUP BY l_partkey
    HAVING SUM(val) * (SELECT COUNT(DISTINCT l_partkey) FROM v)
           > 2 * (SELECT SUM(val) FROM v)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (lineitem value per part plays partsupp stock
    value): grouped sums kept only when they exceed 2× the average
    per-part value — a scalar subquery over the global stats (TPC-H
    scales its HAVING fraction by 1/SF for the same reason: a fixed
    fraction degenerates as cardinality grows; the average-relative
    threshold is scale-invariant). Spark evaluates the global stats
    as a 1-row DataFrame cross-joined (broadcast) onto the grouped
    result; the test runs on cross-multiplied exact integers, no
    floating-point threshold. The value
    stream is computed once per side from the same filtered scan —
    at 100 TB you'd .persist() it; at oracle SF the double scan is
    cheaper than a cache materialization."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    v = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "l_partkey",
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("val"),
        )
    )
    total = v.agg(
        F.sum("val").alias("total_val"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )
    return (
        v.groupBy("l_partkey")
        .agg(F.sum("val").alias("sum_val"))
        .join(F.broadcast(total))
        .filter(F.col("sum_val") * F.col("n_parts") > 2 * F.col("total_val"))
        .select(
            "l_partkey",
            (F.col("sum_val").cast("double") / 100.0).alias("part_value"),
        )
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count histogram over ALL customers —
    the outer join keeps zero-order customers (COUNT of a null column
    is 0, never dropped), and the join predicate carries a non-key
    residual that must stay in the ON clause (a WHERE would silently
    turn the join inner). Two shuffles: the outer join + first
    groupBy share the c_custkey partitioning (Catalyst reuses it);
    the histogram agg is 40-ish groups."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    return (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(round(l_discount*100) AS BIGINT))) AS rev_units
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(rev_units AS DOUBLE) / 10000.0 AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE rev_units = (SELECT MAX(rev_units) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue view + scalar-max subquery. The
    max is a 1-row broadcast cross join; the equality filter keeps
    *all* tied maxima (argmax semantics, not top-1), which a
    LIMIT 1 would get wrong. Revenue compared in exact integer
    units — float revenue would make the tie test flaky."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev_units = F.sum(
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
    )
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
        )
        .groupBy("l_suppkey")
        .agg(rev_units.alias("rev_units"))
    )
    best = rev.agg(F.max("rev_units").alias("max_units"))
    return (
        rev.join(F.broadcast(best))
        .filter(F.col("rev_units") == F.col("max_units"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_units").cast("double") / 10000.0).alias("total_revenue"),
        )
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)
             / 700.0 AS avg_yearly
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN (SELECT l_partkey AS agg_partkey,
                   SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
                   COUNT(*) AS cnt_qty
            FROM lineitem GROUP BY l_partkey) pa
        ON agg_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 10
      AND CAST(l_quantity AS BIGINT) * 5 * cnt_qty < sum_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average (l_quantity <
    0.2 * avg over the same part) decorrelated into a grouped
    self-join on lineitem. The avg test runs on cross-multiplied
    integers (qty*5*cnt < sum) — exact, no float avg. At 100 TB the
    self-agg shuffles on l_partkey once and AQE broadcasts the
    part-filtered probe side; the final agg is a single row."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 10)
    ).select("p_partkey")
    per_part = li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt_qty"),
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part, F.col("agg_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity").cast("bigint") * 5 * F.col("cnt_qty") < F.col("sum_qty"))
        .agg(
            (
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).cast(
                    "double"
                )
                / 700.0
            ).alias("avg_yearly")
        )
    )


@register(
    "q20_excess_shippers",
    """
    WITH shipped AS (
      SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      GROUP BY l_suppkey, l_partkey
    ), totals AS (
      SELECT l_partkey AS t_partkey, SUM(qty) AS total_qty
      FROM shipped GROUP BY l_partkey
    )
    SELECT s_name, n_name
    FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AFRICA'
      AND s_suppkey IN (
        SELECT l_suppkey FROM shipped JOIN totals ON t_partkey = l_partkey
        WHERE qty * 10 > total_qty * 3
      )
    ORDER BY s_name
    """,
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (availqty threshold → share-of-part-volume
    threshold): nested IN-subqueries decorrelated into
    agg → agg → threshold join → LeftSemi onto supplier. The
    qualifying-supplier set is derived wholly before touching the
    supplier dim, so the expensive side runs once; the semi join
    deduplicates qualification (a supplier can qualify via many
    parts) without a distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("red")
    ).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
    )
    totals = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("qty").alias("total_qty")
    )
    qualifying = (
        shipped.join(totals, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("qty") * 10 > F.col("total_qty") * 3)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "q21_waiting_orders",
    """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
      JOIN orders   ON o_orderkey = l1.l_orderkey
      JOIN supplier ON s_suppkey = l1.l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderstatus = 'F' AND r_name = 'ASIA'
      AND l1.l_shipdate > o_orderdate + INTERVAL 100 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 100 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (no commit/receipt dates → late = shipped
    >100 days after order date): the sole-blame double-correlation —
    EXISTS another supplier's line in the order (LeftSemi) AND NOT
    EXISTS another supplier's *late* line (LeftAnti with a non-equi
    residual referencing the outer o_orderdate). Both correlated
    probes equi-join on l_orderkey, so at 100 TB all three lineitem
    legs co-shuffle on the same key and AQE collapses them into one
    exchange; nation/region prune suppliers before counting."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    late_cutoff = F.col("o_orderdate") + F.expr("INTERVAL 100 DAYS")
    l1 = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.col("l_shipdate") > late_cutoff
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
        F.col("l_shipdate").alias("l3_shipdate"),
    )
    return (
        l1.join(
            l2,
            (F.col("l2_orderkey") == F.col("l_orderkey"))
            & (F.col("l2_suppkey") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3_orderkey") == F.col("l_orderkey"))
            & (F.col("l3_suppkey") != F.col("l_suppkey"))
            & (F.col("l3_shipdate") > late_cutoff),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "q22_sales_opportunity",
    """
    WITH pos AS (
      SELECT CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE) / 100.0
             AS totacctbal
    FROM customer
    WHERE CAST(round(c_acctbal*100) AS BIGINT) * (SELECT COUNT(*) FROM pos)
            > (SELECT SUM(bal_cents) FROM pos)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= DATE '1999-01-01')
    GROUP BY c_nationkey
    """,
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (no c_phone → nationkey plays the country
    code; "no orders in 7 years" → no orders since 1999): above-
    average-balance customers gone quiet — a scalar
    avg subquery plus NOT EXISTS as LeftAnti. The avg test is
    cross-multiplied to integers (bal*count > sum) so the threshold
    is exact; the anti join's build side is just o_custkey, and at
    100 TB it shuffles while the 1-row stats broadcast."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("date"))
        .select("o_custkey")
    )
    bal_cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    stats = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.count(F.lit(1)).alias("pos_cnt"),
        F.sum(bal_cents).alias("pos_sum"),
    )
    return (
        c.join(F.broadcast(stats))
        .filter(bal_cents * F.col("pos_cnt") > F.col("pos_sum"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(bal_cents).cast("double") / 100.0).alias("totacctbal"),
        )
    )
