"""Reference §2 operator families: projections, filters, dedup/sort, joins/enrichment, text functions (the driver-gate core)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from small_etl_spark.queries._registry import register
from small_etl_spark.functions.text import clean_text
from small_etl_spark.functions.text import normalize_fields
from small_etl_spark.functions.text import remove_html_tags
from small_etl_spark.operators.dedup import dedup_by_fields_first_wins_packed
from small_etl_spark.operators.filters import equality_filter
from small_etl_spark.operators.filters import extract_filters
from small_etl_spark.operators.filters import limit_records
from small_etl_spark.operators.filters import threshold_filter
from small_etl_spark.operators.joins import lookup_enrich
from small_etl_spark.operators.joins import lookup_enrich_stub
from small_etl_spark.operators.joins import merge_with_previous
from small_etl_spark.operators.projections import add_processing_markers
from small_etl_spark.operators.projections import computed_fields
from small_etl_spark.operators.projections import default_fill
from small_etl_spark.operators.projections import exclude_fields
from small_etl_spark.operators.projections import keep_only_fields
from small_etl_spark.operators.projections import rename_fields
from small_etl_spark.operators.sets import union_all_by_name
from small_etl_spark.operators.sort import top_k
from small_etl_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# §2.3 projections
# --------------------------------------------------------------------------


@register(
    "rename_project",
    """
    SELECT l_orderkey AS order_id, l_partkey AS part_id,
           l_quantity AS qty, l_extendedprice AS price
    FROM lineitem
    """,
)
def q_rename_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 rename + P5 keep-only (mvp_pipeline.rs:85-96; contextual_pipeline.rs:901-924)."""
    li = load_table(spark, sf_dir, "lineitem")
    li = rename_fields(
        li,
        {
            "l_orderkey": "order_id",
            "l_partkey": "part_id",
            "l_quantity": "qty",
            "l_extendedprice": "price",
            "not_a_column": "ignored",  # absent source keys silently skipped
        },
    )
    return keep_only_fields(li, ["order_id", "part_id", "qty", "price", "missing_too"])


@register(
    "exclude_fields",
    "SELECT doc_id, lang, source, n_chars FROM documents",
)
def q_exclude_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 exclude projection (contextual_pipeline.rs:926-945)."""
    return exclude_fields(load_table(spark, sf_dir, "documents"), ["text", "absent_col"])


@register(
    "computed_markers",
    """
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS record_index,
           'docs-stage' AS stage,
           'exec42' AS exec_id,
           'hello' AS note,
           TRUE AS processed,
           'docs-stage' AS processed_by
    FROM documents
    """,
)
def q_computed_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 computed fields + P8 markers (contextual_pipeline.rs:964-987)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = computed_fields(
        docs,
        {
            "record_index": "record_index",
            "stage": "pipeline_name",
            "exec_id": "execution_id",
            "note": "hello",
        },
        pipeline_name="docs-stage",
        execution_id="exec42",
        order_by="doc_id",
    )
    return add_processing_markers(out, "docs-stage")


@register(
    "default_fill_union",
    """
    WITH u AS (
      SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal,
             c_mktsegment AS segment
      FROM customer
      UNION ALL BY NAME
      SELECT s_suppkey AS id, s_name AS name, s_acctbal AS acctbal
      FROM supplier
    )
    SELECT id, name, acctbal, coalesce(segment, 'Unknown') AS segment FROM u
    """,
)
def q_default_fill_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 heterogeneous union + P9 default-fill
    (sequence_pipeline.rs:49-54; simple_pipeline.rs:88-100)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return default_fill(union_all_by_name([cust, supp]), {"segment": "Unknown"})


@register(
    "json_path_extract",
    """
    SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k FROM events
    """,
)
def q_json_path_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2-analog on serialized JSON: dot-path extraction from a JSON
    column (struct-path variants pinned in tests/test_projections.py
    — the parquet testdata has no nested struct columns)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("bigint").alias("k")
    )


@register(
    "array_path_extract",
    """
    WITH g AS (
      SELECT l_orderkey AS order_id,
             list(l_partkey ORDER BY l_linenumber, l_partkey) AS parts
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT order_id, parts[1] AS first_part, parts[-1] AS last_part,
           len(parts) AS n_parts
    FROM g
    """,
)
def q_array_path_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 array indexing incl. negative index + P4 flat-map shape
    (contextual_pipeline.rs:746-815) on a built array column —
    ``element_at`` is 1-based and supports -1-from-end exactly like
    the reference's index rules; struct-path variants are pinned in
    tests/test_projections.py."""
    li = load_table(spark, sf_dir, "lineitem")
    parts = F.transform(
        F.array_sort(
            F.collect_list(F.struct("l_linenumber", "l_partkey"))
        ),
        lambda x: x["l_partkey"],
    )
    return (
        li.groupBy(F.col("l_orderkey").alias("order_id"))
        .agg(parts.alias("parts"))
        .select(
            "order_id",
            F.element_at("parts", 1).alias("first_part"),
            F.element_at("parts", -1).alias("last_part"),
            F.size("parts").cast("bigint").alias("n_parts"),
        )
    )


# --------------------------------------------------------------------------
# §2.4 filters / limits
# --------------------------------------------------------------------------


@register(
    "threshold_filter",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_quantity > 20
    """,
    headline=True,
)
def q_threshold_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 threshold → intermediate (simple_pipeline.rs:113-116)."""
    li = load_table(spark, sf_dir, "lineitem")
    return threshold_filter(li, "l_quantity", 20).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@register(
    "equality_filter",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
    """,
)
def q_equality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 conjunctive equality (contextual_pipeline.rs:1064-1083)."""
    o = load_table(spark, sf_dir, "orders")
    return equality_filter(
        o, {"o_orderstatus": "F", "o_orderpriority": "1-URGENT"}
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "extract_filters",
    """
    SELECT event_id, user_id, event_type, value FROM events
    WHERE event_type IN ('click', 'purchase')
    """,
)
def q_extract_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 extract.filters — declared-only in the reference
    (sequence_config.rs:72), enforced here; list value = membership."""
    ev = load_table(spark, sf_dir, "events")
    return extract_filters(ev, {"event_type": ["click", "purchase"]}).select(
        "event_id", "user_id", "event_type", "value"
    )


@register(
    "limit_sorted",
    """
    SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 10
    """,
)
def q_limit_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 max_records truncation (mvp_pipeline.rs:74-109); ordered for
    determinism."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return limit_records(o.orderBy("o_orderkey"), max_records=10)


# --------------------------------------------------------------------------
# §2.6 / §2.7 dedup + sort/top-k
# --------------------------------------------------------------------------


@register(
    "dedup_first_wins",
    """
    SELECT l_orderkey, l_partkey, l_linenumber, l_quantity FROM (
      SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
    headline=True,
)
def q_dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 dedup-by-fields, first occurrence wins
    (contextual_pipeline.rs:614-629); "first" = (l_linenumber,
    l_partkey, l_quantity) — the synthetic data duplicates shorter
    prefixes, and a tie across all output columns is value-identical.

    Round 12: runs the bit-packed execution path — every non-key
    column is a bounded non-negative integer per the TPC-H column
    spec (linenumber ≤ 7, quantity an integer ≤ 50, partkey < 2⁴⁷ at
    any conceivable SF), so the whole candidate row packs into one
    bigint and the aggregate is a fixed-width HashAggregate ``min``
    with true map-side partial aggregation — where min_by(struct…)
    forced SortAggregate on both sides of the exchange (see the cost
    notes on both operators). Result identity vs the min_by form is
    pinned in tests/test_operators.py and by this entry's unchanged
    DuckDB oracle; a contract-violating row raises, never mis-dedups.

    The input goes through ``ensure_parallelism(key_cols=[dedup key])``
    (round 12, same split-starved fix as window_topk_per_group): a
    one-row-group scan otherwise runs the packing projection and the
    partial min on ONE core. The keyed exchange satisfies the
    aggregate's required distribution — still exactly one Exchange in
    the plan, but packing + both agg phases run on the 32-way
    post-shuffle side (interleaved min-of-7 A/B: −19%/−5% across two
    runs on the bimodal host). At scale the helper no-ops and the
    default partial-agg plan stands."""
    from small_etl_spark.llm.util import ensure_parallelism

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber", "l_quantity"
    )
    return dedup_by_fields_first_wins_packed(
        ensure_parallelism(li, key_cols=["l_orderkey"]),
        ["l_orderkey"],
        [("l_linenumber", 8), ("l_partkey", 47), ("l_quantity", 8)],
    )


@register(
    "top_k",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
    """,
)
def q_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 sort + O2 limit composition (contextual_pipeline.rs:647-672);
    plans as TakeOrderedAndProject (per-partition top-k, no full sort)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return top_k(o, "o_totalprice", 25, order="desc", tiebreak=["o_orderkey"])


@register(
    "lexicographic_sort",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY CAST(o_totalprice AS VARCHAR), o_orderkey LIMIT 50
    """,
)
def q_lexicographic_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 exact reference semantics: comparison is lexicographic on the
    rendered value — numbers compared as strings
    (contextual_pipeline.rs:647-672). Our engine sorts typed by
    default (sort_by_field); this pins the compat mode."""
    from small_etl_spark.operators.sort import sort_by_field

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    out = sort_by_field(o, "o_totalprice", order="asc", lexicographic=True)
    return out.orderBy(
        F.col("o_totalprice").cast("string"), F.col("o_orderkey")
    ).limit(50)


@register(
    "full_record_dedup",
    """
    SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate FROM lineitem
    """,
)
def q_full_record_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 full-record dedup (contextual_pipeline.rs:630-637). With the
    whole row as key, "first wins" is indistinguishable from DISTINCT
    (group members are identical), so the set form — with map-side
    partial aggregation — is the right plan."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_shipdate"
    )
    return li.dropDuplicates()


# --------------------------------------------------------------------------
# §2.5 joins / enrichment
# --------------------------------------------------------------------------


@register(
    "merge_with_previous",
    """
    SELECT a.id, a.qty, coalesce(a.total, p.total) AS total, p.status AS status
    FROM (
      SELECT l_orderkey AS id, l_quantity AS qty,
             CASE WHEN l_quantity > 30 THEN NULL ELSE l_extendedprice END AS total
      FROM lineitem
    ) a
    LEFT JOIN (
      SELECT o_orderkey AS id, o_totalprice AS total, o_orderstatus AS status
      FROM orders
    ) p ON a.id = p.id
    """,
    headline=True,
)
def q_merge_with_previous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 merge-with-previous (sequence_pipeline.rs:77-108): api value
    wins, previous fills nulls, api rows all survive. Broadcast-hash
    join — zero shuffle on the fact side."""
    li = load_table(spark, sf_dir, "lineitem")
    api = li.selectExpr(
        "l_orderkey as id",
        "l_quantity as qty",
        "CASE WHEN (l_quantity > 30) THEN cast(null as double)"
        " ELSE l_extendedprice END as total",
    )
    prev = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey as id",
        "o_totalprice as total",
        "o_orderstatus as status",
    )
    return merge_with_previous(api, prev, key="id")


@register(
    "lookup_enrich",
    """
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    """,
    headline=True,
)
def q_lookup_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 (real) + S8 lookup-file join: broadcast dimension enrichment
    (what contextual_pipeline.rs:950-961 stubs and ports.rs:17 declares)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return lookup_enrich(o, c, on="o_custkey", lookup_key="c_custkey").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "asof_join_events",
    """
    SELECT c.event_id, CAST(floor(epoch(c.ts)) AS BIGINT) AS ts_sec, c.user_id,
           p.event_id AS purchase_event_id, p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    headline=True,
)
def q_asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators.joins.asof_join): each click matched to
    the user's most recent prior purchase. Union-merge plan — one
    sort per key over |left|+|right| rows, never a range cross
    product. Oracle: DuckDB's native ASOF JOIN."""
    from small_etl_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    out = asof_join(clicks, purchases, on="user_id", suffix="")
    return out.select(
        "event_id",
        F.col("ts").cast("long").alias("ts_sec"),
        "user_id",
        "purchase_event_id",
        "purchase_value",
    )


@register(
    "range_join_events",
    """
    SELECT c.event_id, p.event_id AS followup_event_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS delta_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND epoch(p.ts) - epoch(c.ts) BETWEEN 0.0 AND 3600.0
    """,
)
def q_range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (operators.joins.range_join): purchases within
    1 h after a click, same user. Time-bucketed equi-join — never a
    per-key cross product (the plan a bare BETWEEN predicate would
    give)."""
    from small_etl_spark.operators.joins import range_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id"
    )
    out = range_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        lower_seconds=0.0, upper_seconds=3600.0,
    )
    delta_us = F.unix_micros("ts_r") - F.unix_micros("ts")
    return out.select(
        "event_id",
        F.col("event_id_r").alias("followup_event_id"),
        delta_us.alias("delta_us"),
    )


@register(
    "running_total",
    """
    SELECT user_id, event_id,
           CAST(SUM(CAST(round(value*100) AS BIGINT))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE)
             / 100.0 AS running_value
    FROM events
    """,
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user running sum (north-star window breadth);
    exact cents so the prefix sums are order-independent-exact."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    return ev.select(
        "user_id",
        "event_id",
        (F.sum(cents).over(w).cast("double") / 100.0).alias("running_value"),
    )


@register(
    "percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90
    FROM events GROUP BY event_type
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (north-star; at 100 TB
    switch to approx_percentile — same call shape, sketch-merged,
    no sort)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
    )


@register(
    "key_skew_report",
    """
    WITH per_key AS (
      SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           round(quantile_cont(n, 0.5), 6) AS p50,
           round(quantile_cont(n, 0.99), 6) AS p99,
           CAST(max(n) AS BIGINT) AS max_n,
           round(CAST(max(n) AS DOUBLE) / SUM(n), 6) AS top_key_share
    FROM per_key
    """,
)
def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnostic: per-key row counts for a
    prospective shuffle key (l_orderkey), summarized as key count,
    p50/p99/max rows-per-key, and the hottest key's share — the
    numbers that decide between a plain shuffle, AQE skew-split, and
    explicit salting (operators/skew.py) BEFORE running the join at
    100 TB. One groupBy + a 6-number aggregate over the key-grain
    table."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.round(F.percentile("n", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("n", F.lit(0.99)), 6).alias("p99"),
        F.max("n").alias("max_n"),
        F.round(F.max("n").cast("double") / F.sum("n"), 6).alias(
            "top_key_share"
        ),
    )


@register(
    "semi_anti_join",
    """
    SELECT c_custkey, c_name,
           (c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000))
             AS has_big_order
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
)
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (customers with any order) + a semi-derived flag
    (north-star relational breadth; the reference has no semi/anti).
    Plans as broadcast LeftSemi — existence check without
    materializing the join product."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    with_orders = c.join(
        o.select("o_custkey"), c["c_custkey"] == o["o_custkey"], "left_semi"
    )
    big = o.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("big_key")
    ).distinct()
    return (
        with_orders.join(
            F.broadcast(big), F.col("c_custkey") == F.col("big_key"), "left"
        )
        .select(
            "c_custkey", "c_name", F.col("big_key").isNotNull().alias("has_big_order")
        )
    )


@register(
    "anti_join",
    """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no orders (LeftAnti — the NOT EXISTS
    plan; at scale the probe side streams, never materializes)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o.select("o_custkey"), c["c_custkey"] == o["o_custkey"], "left_anti"
    ).select("c_custkey", "c_mktsegment")


@register(
    "intersect_except",
    """
    WITH click_users AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         buy_users   AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT user_id, 'both' AS cohort FROM (SELECT * FROM click_users INTERSECT SELECT * FROM buy_users)
    UNION ALL
    SELECT user_id, 'click_only' AS cohort FROM (SELECT * FROM click_users EXCEPT SELECT * FROM buy_users)
    """,
)
def q_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operations (north-star; the reference
    has only union, SURVEY §2.8)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    both = clicks.intersect(buys).withColumn("cohort", F.lit("both"))
    only = clicks.exceptAll(buys).withColumn("cohort", F.lit("click_only"))
    return both.unionByName(only)


@register(
    "lookup_enrich_stub",
    """
    SELECT doc_id, source, 'enriched_' || source AS source_enriched FROM documents
    """,
)
def q_lookup_enrich_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 stub-exact form (contextual_pipeline.rs:950-961)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return lookup_enrich_stub(docs, {"source": "source_enriched"})


# --------------------------------------------------------------------------
# §2.9 text functions
# --------------------------------------------------------------------------


@register(
    "clean_text",
    """
    SELECT doc_id, trim(replace(text, chr(10), ' ')) AS text FROM documents
    """,
)
def q_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 clean_text (contextual_pipeline.rs:883-889)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return clean_text(docs, ["text"])


@register(
    "normalize_fields",
    """
    SELECT c_custkey, lower(c_name) AS c_name, lower(c_mktsegment) AS c_mktsegment
    FROM customer
    """,
)
def q_normalize_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 normalize_fields (contextual_pipeline.rs:892-898)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return normalize_fields(c, ["c_name", "c_mktsegment"])


@register(
    "remove_html_tags",
    """
    SELECT doc_id, regexp_replace(text, '<[^>]*>', '', 'g') AS text FROM documents
    """,
)
def q_remove_html_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 remove_html_tags — declared-only in the reference
    (sequence_config.rs:93-100), implemented for real."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return remove_html_tags(docs, ["text"])
