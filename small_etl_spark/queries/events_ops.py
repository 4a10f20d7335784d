"""Event analytics and ops surfaces: funnels, cohorts, SCD2, CDC, expectations, snapshots, sketches, BPE, PageRank, sampling and shard planning."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from small_etl_spark.queries._registry import register
from small_etl_spark.functions.text import clean_text
from small_etl_spark.llm import textstats
from small_etl_spark.sources.tables import load_table


@register(
    "funnel_steps",
    """
    WITH s1 AS (SELECT user_id, MIN(ts) AS t FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
           JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
           WHERE e.event_type = 'click' GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
           JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
           WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT CAST(1 AS INT) AS step_index, 'view' AS step,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS users
    UNION ALL
    SELECT CAST(2 AS INT), 'click', (SELECT CAST(COUNT(*) AS BIGINT) FROM s2)
    UNION ALL
    SELECT CAST(3 AS INT), 'purchase', (SELECT CAST(COUNT(*) AS BIGINT) FROM s3)
    """,
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase conversion funnel over the events
    table (operators/events.py::funnel). Strictly-ordered semantics:
    each step's clock starts at the user's previous-step conversion
    time."""
    from small_etl_spark.operators.events import funnel

    ev = load_table(spark, sf_dir, "events")
    return funnel(ev, ["view", "click", "purchase"])


@register(
    "cohort_retention",
    """
    WITH first_seen AS (
      SELECT user_id,
             CAST(epoch(date_trunc('week', MIN(ts))) AS BIGINT) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id,
             CAST(epoch(date_trunc('week', ts)) AS BIGINT) AS act_week
      FROM events
    )
    SELECT cohort_week,
           (act_week - cohort_week) // 604800 AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS users
    FROM activity JOIN first_seen USING (user_id)
    GROUP BY cohort_week, (act_week - cohort_week) // 604800
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix over events
    (operators/events.py::cohort_retention): users grouped by
    first-seen week, counted per active week offset."""
    from small_etl_spark.operators.events import cohort_retention

    ev = load_table(spark, sf_dir, "events")
    return cohort_retention(ev)


@register(
    "grouped_trend",
    """
    WITH s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x*y) AS BIGINT) AS sxy,
             CAST(SUM(x*x) AS BIGINT) AS sxx
      FROM (SELECT event_type,
                   -- floor() before the cast: epoch() is a fractional-
                   -- second DOUBLE and CAST..BIGINT rounds, while
                   -- Spark's timestamp→long cast truncates
                   (CAST(floor(epoch(ts)) AS BIGINT)
                    - CAST(epoch(TIMESTAMP '2024-01-01') AS BIGINT)) // 3600 AS x,
                   CAST(round(value*100) AS BIGINT) AS y
            FROM events)
      GROUP BY event_type
    )
    SELECT event_type, n,
           round(CAST(n*sxy - sx*sy AS DOUBLE)
                 / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS slope_cents_per_hour,
           round(CAST(sy*sxx - sx*sxy AS DOUBLE)
                 / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS intercept_cents
    FROM s
    """,
)
def q_grouped_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of value vs time
    (operators/events.py::grouped_trend): regression via exact-integer
    sufficient statistics, one shuffle."""
    from small_etl_spark.operators.events import grouped_trend

    ev = load_table(spark, sf_dir, "events")
    return grouped_trend(ev)


@register(
    "scd2_customers",
    """
    WITH cur AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
             '2020-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to,
             TRUE AS is_current
      FROM customer
    ), upd AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal,
             'WEB' AS c_mktsegment
      FROM customer WHERE c_nationkey = 5
    ), chg AS (
      SELECT cur.c_custkey AS k FROM cur
      JOIN upd ON cur.c_custkey = upd.c_custkey
      WHERE cur.c_mktsegment <> upd.c_mktsegment
    )
    SELECT * FROM cur WHERE c_custkey NOT IN (SELECT k FROM chg)
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           valid_from, '2024-06-01', FALSE
    FROM cur WHERE c_custkey IN (SELECT k FROM chg)
    UNION ALL
    SELECT u.c_custkey, u.c_name, u.c_nationkey, u.c_acctbal, u.c_mktsegment,
           '2024-06-01', CAST(NULL AS VARCHAR), TRUE
    FROM upd u WHERE u.c_custkey IN (SELECT k FROM chg)
    """,
)
def q_scd2_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 merge (operators/joins.py::scd2_upsert): nation-5
    customers move to the WEB segment effective 2024-06-01 — changed
    open rows are closed, new versions appended, history preserved."""
    from small_etl_spark.operators.joins import scd2_upsert

    c = load_table(spark, sf_dir, "customer")
    current = c.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
        F.lit("2020-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = c.filter(F.col("c_nationkey") == 5).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        F.lit("WEB").alias("c_mktsegment"),
    )
    return scd2_upsert(
        current,
        updates,
        key="c_custkey",
        compare_cols=["c_mktsegment"],
        effective="2024-06-01",
    )


@register(
    "reservoir_sample_docs",
    """
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(concat_ws('|', 'reservoir-v1',
                                      CAST(doc_id AS VARCHAR))), doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= 20
    """,
)
def q_reservoir_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20-docs-per-language sample
    (llm/sampling.py::hash_topk_per_group) — the reproducible,
    engine-portable replacement for reservoir sampling."""
    from small_etl_spark.llm.sampling import hash_topk_per_group

    docs = load_table(spark, sf_dir, "documents")
    return hash_topk_per_group(docs, "lang", 20).select(
        "doc_id", "lang", "n_chars"
    )


@register(
    "vocab_coverage",
    """
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ), counts AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok WHERE term <> '' GROUP BY term
    ), top AS (
      SELECT term, cnt FROM counts ORDER BY cnt DESC, term LIMIT 100
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS rank,
           term, cnt,
           round(CAST(CAST(SUM(cnt) OVER (ORDER BY cnt DESC, term
                                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
                      AS DOUBLE)
                 / CAST((SELECT CAST(SUM(cnt) AS BIGINT) FROM counts) AS DOUBLE),
                 6) AS coverage
    FROM top
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 vocabulary with cumulative token coverage
    (llm/textstats.py::vocab_coverage) — the tokenizer-design query."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.vocab_coverage(docs, top_n=100)


def _lloyd_round_sql(prev_assign: str, cents: str, nxt: str) -> str:
    """One Lloyd iteration as DuckDB CTEs: per-(cell,pos) means folded
    back into centroid lists, then nearest-centroid re-assign (tie →
    larger cell, mirroring the kernel's reversed argmax)."""
    return f"""
    {cents} AS (
      SELECT cell, list(m ORDER BY pos) AS cent FROM (
        SELECT cell, pos, AVG(x) AS m FROM (
          SELECT cell, unnest(v) AS x,
                 unnest(range(1, len(v)+1)) AS pos
          FROM {prev_assign})
        GROUP BY cell, pos)
      GROUP BY cell
    ), {nxt} AS (
      SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, s.cell,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY list_cosine_similarity(c.v, s.cent) DESC,
                          s.cell DESC) AS rn
        FROM corpus c CROSS JOIN {cents} s) WHERE rn = 1
    )"""


@register(
    "kmeans_clusters",
    """
    WITH corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE embedding IS NOT NULL
    ), seeds AS (
      SELECT vec_id AS cell, v AS cent FROM corpus
      ORDER BY md5(CAST(vec_id AS VARCHAR) || ':42') LIMIT 8
    ), a0 AS (
      SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, s.cell,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY list_cosine_similarity(c.v, s.cent) DESC,
                          s.cell DESC) AS rn
        FROM corpus c CROSS JOIN seeds s) WHERE rn = 1
    ),"""
    + _lloyd_round_sql("a0", "c1", "a1")
    + ","
    + _lloyd_round_sql("a1", "c2", "a2")
    + ","
    + _lloyd_round_sql("a2", "c3", "a3")
    + """
    SELECT cell, CAST(count(*) AS BIGINT) AS size,
           round(avg(sqrt(list_reduce(
             list_transform(v, x -> x * x), (a, b) -> a + b))), 6)
             AS mean_norm
    FROM a3 GROUP BY cell
    """,
)
def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-means clustering of the embeddings corpus
    (llm/similarity.py::kmeans_clusters): 8 clusters, 3 Lloyd rounds.
    The oracle UNROLLS Lloyd's algorithm as chained CTEs — md5
    bottom-k seed pick, initial nearest-centroid assign, then three
    (per-(cell,pos) mean → re-assign) rounds — so every cluster's
    size and mean member norm is value-checked, not just row-counted
    (VERDICT r6 item 5)."""
    from small_etl_spark.llm.similarity import kmeans_clusters

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_clusters(emb, k=8, iters=3)


@register(
    "profile_customer",
    """
    SELECT 'c_custkey' AS "column",
           CAST(COUNT(*) - COUNT(c_custkey) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
           CAST(MIN(c_custkey) AS DOUBLE) AS min_num,
           CAST(MAX(c_custkey) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM customer
    UNION ALL
    SELECT 'c_name', CAST(COUNT(*) - COUNT(c_name) AS BIGINT),
           CAST(COUNT(DISTINCT c_name) AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           MIN(c_name), MAX(c_name)
    FROM customer
    UNION ALL
    SELECT 'c_nationkey', CAST(COUNT(*) - COUNT(c_nationkey) AS BIGINT),
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT),
           CAST(MIN(c_nationkey) AS DOUBLE), CAST(MAX(c_nationkey) AS DOUBLE),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM customer
    UNION ALL
    SELECT 'c_acctbal', CAST(COUNT(*) - COUNT(c_acctbal) AS BIGINT),
           CAST(COUNT(DISTINCT c_acctbal) AS BIGINT),
           CAST(MIN(c_acctbal) AS DOUBLE), CAST(MAX(c_acctbal) AS DOUBLE),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', CAST(COUNT(*) - COUNT(c_mktsegment) AS BIGINT),
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           MIN(c_mktsegment), MAX(c_mktsegment)
    FROM customer
    """,
)
def q_profile_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profile of the customer table
    (operators/profiling.py::profile_columns): nulls, exact distinct,
    min/max per column — the pre-ingest data-quality check."""
    from small_etl_spark.operators.profiling import profile_columns

    return profile_columns(load_table(spark, sf_dir, "customer"))


@register(
    "histogram_totalprice",
    """
    SELECT bucket,
           CAST((0 + bucket * 2500000) AS DOUBLE) / 100.0 AS lo_edge,
           CAST((0 + (bucket + 1) * 2500000) AS DOUBLE) / 100.0 AS hi_edge,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (
      SELECT LEAST(CAST(round(o_totalprice*100) AS BIGINT) // 2500000,
                   CAST(19 AS BIGINT)) AS bucket
      FROM orders
    )
    GROUP BY bucket
    """,
)
def q_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 20-bucket equi-width histogram of o_totalprice in
    [0, 500k] (operators/profiling.py::histogram_cents) — integer
    bucket math on cents, no float-edge ambiguity."""
    from small_etl_spark.operators.profiling import histogram_cents

    o = load_table(spark, sf_dir, "orders")
    return histogram_cents(o, "o_totalprice", 0, 50_000_000, 20)


@register(
    "heavy_hitter_users",
    """
    WITH counts AS (
      SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id
    )
    SELECT key, cnt,
           round(CAST(cnt AS DOUBLE)
                 / CAST((SELECT CAST(SUM(cnt) AS BIGINT) FROM counts) AS DOUBLE),
                 6) AS share
    FROM counts
    ORDER BY cnt DESC, key
    LIMIT 10
    """,
)
def q_heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 users by event count with global share
    (operators/profiling.py::heavy_hitters) — the skew diagnosis you
    run before picking a salting factor."""
    from small_etl_spark.operators.profiling import heavy_hitters

    ev = load_table(spark, sf_dir, "events")
    return heavy_hitters(ev, "user_id", 10)


@register(
    "zscore_outliers",
    """
    WITH stats AS (
      SELECT event_type AS g,
             CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean,
             sqrt(CAST(SUM(y*y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                  - (CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                    * (CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))) AS std
      FROM (SELECT event_type, CAST(round(value*100) AS BIGINT) AS y FROM events)
      GROUP BY event_type
    )
    SELECT event_id, event_type, value,
           round((CAST(CAST(round(value*100) AS BIGINT) AS DOUBLE) - mean) / std,
                 6) AS zscore
    FROM events JOIN stats ON event_type = g
    WHERE std > 0
      AND abs((CAST(CAST(round(value*100) AS BIGINT) AS DOUBLE) - mean) / std)
          > 2.5
    """,
)
def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outliers
    (operators/profiling.py::zscore_outliers): group moments from
    exact integer sufficient statistics, float math once per group —
    partitioning-independent and oracle-reproducible."""
    from small_etl_spark.operators.profiling import zscore_outliers

    ev = load_table(spark, sf_dir, "events")
    return zscore_outliers(ev, "event_type", "value", "event_id", 2.5)


@register(
    "incremental_agg_merge",
    """
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM orders
    GROUP BY o_custkey
    """,
)
def q_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-aggregate maintenance
    (operators/incremental.py): per-customer (cnt, sum) partials for
    the pre-1999 base and the 1999+ delta merged WITHOUT rescanning —
    the oracle recomputes from scratch, proving merge ≡ recompute."""
    from small_etl_spark.operators.incremental import (
        merge_partials,
        partial_counts_sums,
    )

    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1999-01-01").cast("date")
    base = partial_counts_sums(
        o.filter(F.col("o_orderdate") < cut), "o_custkey", "o_totalprice"
    )
    delta = partial_counts_sums(
        o.filter(F.col("o_orderdate") >= cut), "o_custkey", "o_totalprice"
    )
    return merge_partials(base, delta)


@register(
    "bigram_stats",
    """
    WITH toks AS (
      SELECT string_split(text, ' ') AS l FROM documents
    ), zipped AS (
      SELECT unnest(list_zip(l[1:len(l)-1], l[2:])) AS pr FROM toks
    ), pairs AS (
      SELECT pr[1] AS w1, pr[2] AS w2 FROM zipped
      WHERE pr[1] <> '' AND pr[2] <> ''
    ), counts AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM pairs GROUP BY w1, w2
    ), tot AS (
      SELECT w1 AS tw1, CAST(SUM(cnt) AS BIGINT) AS w1_total
      FROM counts GROUP BY w1
    )
    SELECT w1, w2, cnt,
           round(CAST(cnt AS DOUBLE) / CAST(w1_total AS DOUBLE), 6) AS cond_p
    FROM counts JOIN tot ON w1 = tw1
    ORDER BY cnt DESC, w1, w2
    LIMIT 50
    """,
)
def q_bigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 corpus bigrams with p(w2|w1)
    (llm/textstats.py::bigram_stats) — the n-gram-LM/tokenizer-merge
    query; shift-composed zip_with bigrams, no per-position slicing."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.bigram_stats(docs, top_n=50)


@register(
    "stream_stateful_totals",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS total_events,
           CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)
             AS total_value_cents
    FROM events
    GROUP BY user_id
    """,
)
def q_stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACTUAL custom stateful streaming operator under the oracle
    gate (streaming/stateful.py::running_user_totals_exact):
    applyInPandasWithState accumulates per-user integer-cent totals
    across micro-batches; the final emission per user (totals are
    monotone — max picks it, whatever the batch count) must
    hash-match DuckDB's batch aggregate of the same parquet."""
    import shutil
    import tempfile
    import uuid

    from small_etl_spark.streaming.stateful import running_user_totals_exact
    from small_etl_spark.streaming.windows import (
        read_events_stream,
        run_to_memory_sink,
    )

    stream_dir = tempfile.mkdtemp(prefix="events_state_")
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir)
    ev = read_events_stream(spark, stream_dir)
    sink = f"state_{uuid.uuid4().hex[:8]}"
    run_to_memory_sink(
        running_user_totals_exact(ev), sink, output_mode="append"
    )
    return (
        spark.table(sink)
        .groupBy("user_id")
        .agg(
            F.max("total_events").alias("total_events"),
            F.max("total_value_cents").alias("total_value_cents"),
        )
    )


@register(
    "apply_cdc_orders",
    """
    WITH log AS (
      SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) AS seq, 'I' AS op
      FROM orders
      UNION ALL
      SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice*100) AS BIGINT) * 2,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) + 1000000, 'U'
      FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT o_orderkey, o_custkey, CAST(0 AS BIGINT),
             CAST(floor(epoch(o_orderdate)) AS BIGINT) + 2000000, 'D'
      FROM orders WHERE o_orderstatus = 'P'
    ), latest AS (
      SELECT o_orderkey, o_custkey, price_cents, op,
             ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY seq DESC)
               AS rn
      FROM log
    )
    SELECT o_orderkey, o_custkey, price_cents
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def q_apply_cdc_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log replay (operators/joins.py::apply_cdc): a synthetic
    I/U/D change log over orders (every order inserted; 'F' orders
    later updated to doubled price; 'P' orders deleted) reduced to
    final state with latest-op-wins max_by aggregation — never a
    window sort of the full log. The oracle spells out the
    ROW_NUMBER formulation; both must agree row-for-row."""
    from small_etl_spark.operators.joins import apply_cdc

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    # o_orderdate reads as TIMESTAMP_NTZ, which has no direct long
    # cast — hop through TIMESTAMP (session TZ is pinned UTC)
    seq = F.col("o_orderdate").cast("timestamp").cast("long")
    ins = o.select(
        "o_orderkey", "o_custkey", cents.alias("price_cents"),
        seq.alias("seq"), F.lit("I").alias("op"),
    )
    upd = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_custkey", (cents * 2).alias("price_cents"),
        (seq + 1_000_000).alias("seq"), F.lit("U").alias("op"),
    )
    dels = o.filter(F.col("o_orderstatus") == "P").select(
        "o_orderkey", "o_custkey", F.lit(0).cast("bigint").alias("price_cents"),
        (seq + 2_000_000).alias("seq"), F.lit("D").alias("op"),
    )
    log = ins.unionByName(upd).unionByName(dels)
    return apply_cdc(log, "o_orderkey", ["seq"])


@register(
    "expectations_orders",
    """
    SELECT 'price_in_range' AS rule,
           CAST(COUNT(*) FILTER (WHERE o_totalprice IS NULL
                                 OR o_totalprice < 0
                                 OR o_totalprice > 1000000) AS BIGINT)
             AS violations,
           CAST(COUNT(*) AS BIGINT) AS total,
           COUNT(*) FILTER (WHERE o_totalprice IS NULL OR o_totalprice < 0
                            OR o_totalprice > 1000000) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'status_known',
           CAST(COUNT(*) FILTER (WHERE o_orderstatus IS NULL
                                 OR o_orderstatus NOT IN ('O','F','P'))
                AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           COUNT(*) FILTER (WHERE o_orderstatus IS NULL
                            OR o_orderstatus NOT IN ('O','F','P')) = 0
    FROM orders
    UNION ALL
    SELECT 'date_not_null',
           CAST(COUNT(*) FILTER (WHERE o_orderdate IS NULL) AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           COUNT(*) FILTER (WHERE o_orderdate IS NULL) = 0
    FROM orders
    UNION ALL
    SELECT 'custkey_positive',
           CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL OR o_custkey < 0)
                AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           COUNT(*) FILTER (WHERE o_custkey IS NULL OR o_custkey < 0) = 0
    FROM orders
    """,
)
def q_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations gate over orders
    (operators/profiling.py::expect): four rules evaluated in one
    scan, null-hostile (a null fails its rule) — the promote/quarantine
    decision for an ingest partition."""
    from small_etl_spark.operators.profiling import expect

    o = load_table(spark, sf_dir, "orders")
    return expect(
        o,
        [
            ("price_in_range", F.col("o_totalprice").between(0, 1_000_000)),
            ("status_known", F.col("o_orderstatus").isin("O", "F", "P")),
            ("date_not_null", F.col("o_orderdate").isNotNull()),
            ("custkey_positive", F.col("o_custkey") >= 0),
        ],
    )


@register(
    "snapshot_diff_orders",
    """
    WITH old AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
      FROM orders WHERE o_orderdate < DATE '2000-01-01'
    ), new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'P' THEN 'F' ELSE o_orderstatus END
               AS o_orderstatus,
             CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
      FROM orders WHERE o_orderdate >= DATE '1997-01-01'
    )
    SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
           CASE WHEN old.o_orderkey IS NULL THEN 'added'
                WHEN new.o_orderkey IS NULL THEN 'removed'
                WHEN old.o_orderstatus IS DISTINCT FROM new.o_orderstatus
                  OR old.price_cents IS DISTINCT FROM new.price_cents
                  THEN 'changed' END AS change,
           old.o_orderstatus AS old_o_orderstatus,
           old.price_cents AS old_price_cents,
           new.o_orderstatus AS new_o_orderstatus,
           new.price_cents AS new_price_cents
    FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
       OR old.o_orderstatus IS DISTINCT FROM new.o_orderstatus
       OR old.price_cents IS DISTINCT FROM new.price_cents
    """,
)
def q_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (operators/joins.py::snapshot_diff):
    two overlapping order snapshots (pre-2000 vs 1997+, with 'P'
    statuses flipped to 'F' in the new image) diffed into
    added/removed/changed rows via ONE full-outer join with null-safe
    comparison."""
    from small_etl_spark.operators.joins import snapshot_diff

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    old = o.filter(
        F.col("o_orderdate") < F.lit("2000-01-01").cast("date")
    ).select("o_orderkey", "o_orderstatus", cents.alias("price_cents"))
    new = o.filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("date")
    ).select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "P", "F")
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        cents.alias("price_cents"),
    )
    return snapshot_diff(old, new, "o_orderkey")


@register(
    "array_functions",
    """
    SELECT doc_id,
           CAST(len(l) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(l, x -> len(x) > 5)) AS BIGINT) AS n_long,
           l[1] AS first_token,
           CAST(list_sum(list_transform(l, x -> len(x))) AS BIGINT)
             AS total_chars
    FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
    """,
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order-function surface (north-star §2.9 breadth,
    like string_functions/date_functions): size, lambda filter,
    element access, lambda aggregate — all JVM array expressions in
    one codegen stage, mapped 1:1 onto DuckDB list functions."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.filter(toks, lambda x: F.length(x) > 5))
        .cast("bigint")
        .alias("n_long"),
        F.element_at(toks, 1).alias("first_token"),
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).alias("total_chars"),
    )


@register(
    "grouping_sets_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def q_grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form cube/rollup
    specialize; north-star agg breadth) via the engine's SQL surface
    over a registered view — one Expand-based aggregation pass, not
    three unioned scans."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


@register(
    "argminmax_agg",
    """
    SELECT l_returnflag,
           arg_max(l_orderkey,
                   CAST(round(l_extendedprice*100) AS BIGINT) * 8589934592
                   + l_orderkey * 8 + l_linenumber) AS priciest_order,
           arg_min(l_orderkey,
                   CAST(round(l_extendedprice*100) AS BIGINT) * 8589934592
                   + l_orderkey * 8 + l_linenumber) AS cheapest_order,
           CAST(MAX(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_argminmax_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg_max/arg_min (max_by/min_by) with a DETERMINISTIC composite
    ordering key: ties on price are broken by (orderkey, linenumber)
    folded into one bigint (price_cents·2³³ + orderkey·8 + line — the
    components can't overlap at any test SF), because a bare
    arg_max(x, price) is nondeterministic under ties and would flake
    the oracle hash."""
    li = load_table(spark, sf_dir, "lineitem")
    ordk = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint") * 8589934592
        + F.col("l_orderkey") * 8
        + F.col("l_linenumber")
    )
    return li.groupBy("l_returnflag").agg(
        F.max_by("l_orderkey", ordk).alias("priciest_order"),
        F.min_by("l_orderkey", ordk).alias("cheapest_order"),
        (
            F.max(F.round(F.col("l_extendedprice") * 100).cast("bigint")).cast(
                "double"
            )
            / 100.0
        ).alias("max_price"),
    )


@register(
    "incremental_distinct_hll",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS merge_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_incremental_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained DISTINCT counts
    (operators/incremental.py::partial_distinct_sketches /
    merge_distinct_sketches): per-returnflag distinct-partkey
    cardinality from two time-slice HLL sketches unioned — the
    sketch analog of incremental_agg_merge. The sketch estimate is
    engine-specific, so the ORACLE CHECKS THE APPROXIMATION
    CONTRACT: at lg_k=12 (rsd ≈ 1.6%) the merged estimate must land
    within 5% of the exact distinct count over the union, which the
    oracle computes for real. Datasketches hashing has no RNG →
    stable driver row; merge≡direct is additionally pinned in
    pytest."""
    from small_etl_spark.operators.incremental import (
        merge_distinct_sketches,
        partial_distinct_sketches,
    )

    li = load_table(spark, sf_dir, "lineitem")
    cut = F.lit("1998-01-01").cast("date")
    base = partial_distinct_sketches(
        li.filter(F.col("l_shipdate") < cut), "l_returnflag", "l_partkey"
    )
    delta = partial_distinct_sketches(
        li.filter(F.col("l_shipdate") >= cut), "l_returnflag", "l_partkey"
    )
    merged = merge_distinct_sketches(base, delta)
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    return merged.join(exact, "l_returnflag").select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_distinct") - F.col("exact_parts"))
            <= 0.05 * F.col("exact_parts")
        ).alias("merge_ok"),
    )


# The BPE oracle replays the greedy merge loop exactly: per iteration,
# a pair-count CTE + argmax CTE, then the gaps-and-islands rewrite
# (candidates chain only when the pair is a repeated symbol; greedy
# keeps even offsets from the chain start — see llm/bpe.py). All
# integer arithmetic → bit-identical across engines.
def _bpe_prefix_sql(iters: int, apply_last: bool) -> list[str]:
    """Shared CTE prefix for the BPE oracles: word frequencies, then
    ``iters`` rounds of (pair counts p{i} → winning merge t{i}) with
    the merge applied to seqs after each round — optionally including
    the last (learning only inspects t{iters}; encoding needs
    seqs{iters})."""
    sql = [
        """
    WITH words AS (
      SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY w
    ), seqs0 AS (
      SELECT word, cnt, string_split(word, '') AS syms FROM words
    )"""
    ]
    for i in range(1, iters + 1):
        prev = i - 1
        sql.append(
            f""", p{i} AS (
      SELECT a, b, CAST(sum(cnt) AS BIGINT) AS pair_count FROM (
        SELECT cnt, unnest(syms[1:len(syms)-1]) AS a, unnest(syms[2:]) AS b
        FROM seqs{prev}) GROUP BY a, b
    ), t{i} AS (
      SELECT a, b, pair_count FROM p{i} ORDER BY pair_count DESC, a, b LIMIT 1
    )"""
        )
        if i < iters or apply_last:
            sql.append(
                f""", ex{i} AS (
      SELECT word, cnt, unnest(syms) AS sym,
             unnest(range(1, len(syms)+1)) AS pos
      FROM seqs{prev}
    ), c{i} AS (
      SELECT word, cnt, pos, sym,
             lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
      FROM ex{i}
    ), d{i} AS (
      SELECT c.*, coalesce(c.sym = t.a AND c.nxt = t.b, FALSE) AS cand
      FROM c{i} c CROSS JOIN t{i} t
    ), e{i} AS (
      SELECT *, sum(CASE WHEN cand THEN 1 ELSE 0 END)
                  OVER (PARTITION BY word ORDER BY pos) AS rn
      FROM d{i}
    ), f{i} AS (
      SELECT *, CASE WHEN cand THEN pos - rn END AS chain FROM e{i}
    ), g{i} AS (
      SELECT *, min(pos) OVER (PARTITION BY word, chain) AS cstart FROM f{i}
    ), h{i} AS (
      SELECT *, cand AND ((pos - cstart) % 2 = 0) AS mstart FROM g{i}
    ), j{i} AS (
      SELECT *, coalesce(lag(mstart) OVER (PARTITION BY word ORDER BY pos),
                         FALSE) AS consumed
      FROM h{i}
    ), seqs{i} AS (
      SELECT word, cnt,
             list(CASE WHEN mstart THEN sym || nxt ELSE sym END
                  ORDER BY pos) AS syms
      FROM j{i} WHERE mstart OR NOT consumed GROUP BY word, cnt
    )"""
            )
    return sql


def _bpe_oracle(iters: int) -> str:
    sql = _bpe_prefix_sql(iters, apply_last=False)
    finals = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS iter, a AS lhs, b AS rhs, pair_count"
        f" FROM t{i}"
        for i in range(1, iters + 1)
    )
    sql.append(f"\n    {finals}\n    ORDER BY iter\n    ")
    return "".join(sql)


def _bpe_encode_oracle(iters: int) -> str:
    sql = _bpe_prefix_sql(iters, apply_last=True)
    sql.append(
        f""", wl AS (
      SELECT word, CAST(len(syms) AS BIGINT) AS npw FROM seqs{iters}
    ), dw AS (
      SELECT doc_id, w AS word
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents)
      WHERE w <> ''
    ), scored AS (
      SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(w.npw) AS BIGINT) AS n_pieces
      FROM dw d JOIN wl w USING (word) GROUP BY d.doc_id
    )
    SELECT docs.doc_id, COALESCE(s.n_words, 0) AS n_words,
           COALESCE(s.n_pieces, 0) AS n_pieces
    FROM documents docs LEFT JOIN scored s ON docs.doc_id = s.doc_id
    """
    )
    return "".join(sql)


@register("bpe_merges", _bpe_oracle(3))
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 3 BPE merge rules learned from the corpus
    (llm/bpe.py::bpe_merges) — the tokenizer-training step, fully
    set-expressed: greedy left-to-right pair merging via the
    gaps-and-islands even-offset rule, integer-exact in both engines.
    Corpus touched once (word-frequency table); each round is a
    pair-vocab aggregation + two word-partitioned window passes."""
    from small_etl_spark.llm.bpe import bpe_merges

    docs = load_table(spark, sf_dir, "documents")
    return bpe_merges(docs, iters=3)


# The oracle unrolls the 10 power iterations as 10 chained CTE pairs
# (contribution sum by destination, then damped re-rank over all
# nodes) — recursive CTEs can't aggregate over the recursive
# reference, but a FIXED iteration count needs no recursion. Float
# summation order differs between engines (~1e-13 after 10 rounds);
# the 4dp rounding in the final projection absorbs it, and ordering is
# on the ROUNDED rank + node so the top-20 cut is reproducible.
_PAGERANK_ORACLE = (
    """
    WITH toks AS (
      SELECT string_split(text, ' ') AS l FROM documents
    ), zipped AS (
      SELECT unnest(list_zip(l[1:len(l)-1], l[2:])) AS pr FROM toks
    ), edges AS (
      SELECT DISTINCT pr[1] AS src, pr[2] AS dst FROM zipped
      WHERE pr[1] <> '' AND pr[2] <> ''
    ), nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ), deg AS (
      SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY src
    ), r0 AS (
      SELECT node, 1.0 AS rank FROM nodes
    )"""
    + "".join(
        f""", c{i} AS (
      SELECT e.dst AS node, sum(r.rank / d.deg) AS inflow
      FROM edges e JOIN deg d ON e.src = d.src
                   JOIN r{i - 1} r ON e.src = r.node
      GROUP BY e.dst
    ), r{i} AS (
      SELECT n.node, 0.15 + 0.85 * coalesce(c.inflow, 0.0) AS rank
      FROM nodes n LEFT JOIN c{i} c ON n.node = c.node
    )"""
        for i in range(1, 11)
    )
    + """
    SELECT node, round(rank, 4) AS rank FROM r10
    ORDER BY round(rank, 4) DESC, node LIMIT 20
    """
)


@register("pagerank_bigram_terms", _PAGERANK_ORACLE)
def q_pagerank_bigram_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the corpus bigram graph (w1→w2 edges from
    llm/textstats.py::bigram_stats machinery;
    operators/graph.py::pagerank, 10 power iterations): the
    term-centrality view of the corpus. The fixed iteration count
    makes the fixpoint SQL-expressible by unrolling — see
    ``_PAGERANK_ORACLE``; convergence and known-graph values are
    additionally pinned in tests/test_graph.py."""
    from small_etl_spark.operators.graph import pagerank

    # no ensure_parallelism here: the tokenize is a cheap split that
    # feeds a distinct() shuffle anyway — the extra repartition
    # measured 1.1 s SLOWER at sf0.1 (2.6 s vs 3.7 s)
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.col("text"), " ").alias("__toks__"))
    edges = (
        toks.select(
            F.explode(
                F.zip_with(
                    F.slice(
                        F.col("__toks__"),
                        1,
                        F.greatest(F.size("__toks__") - 1, F.lit(0)),
                    ),
                    F.slice(
                        F.col("__toks__"),
                        2,
                        F.greatest(F.size("__toks__") - 1, F.lit(0)),
                    ),
                    lambda a, b: F.struct(a.alias("src"), b.alias("dst")),
                )
            ).alias("__e__")
        )
        .select("__e__.src", "__e__.dst")
        .filter((F.col("src") != "") & (F.col("dst") != ""))
        .distinct()
    )
    ranks = pagerank(edges, iters=10)
    return (
        ranks.select("node", F.round("rank", 4).alias("rank"))
        .orderBy(F.col("rank").desc(), "node")
        .limit(20)
    )


@register(
    "unpivot_part_metrics",
    """
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
    """,
)
def q_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt — the inverse of pivot_agg, completing the
    reshape family: wide part metrics to long (key, metric, value)
    form. Plans as a single Expand over one scan (zero shuffle, k×
    row multiplication map-side) — NOT the k-scan UNION ALL the
    oracle spells out."""
    p = load_table(spark, sf_dir, "part")
    return p.withColumn("p_size", F.col("p_size").cast("double")).unpivot(
        ["p_partkey"],
        ["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@register(
    "resample_locf",
    """
    WITH keys AS (SELECT DISTINCT user_id AS key FROM events),
    grid AS (
      SELECT key, CAST(floor(epoch(gs.g)) AS BIGINT) AS bin_epoch
      FROM keys, generate_series(TIMESTAMP '2024-01-01',
                                 TIMESTAMP '2024-01-31' - INTERVAL 1 SECOND,
                                 INTERVAL 1 HOUR) AS gs(g)
    ), per_bin AS (
      SELECT user_id AS key,
             CAST(epoch(TIMESTAMP '2024-01-01') AS BIGINT)
               + 3600 * ((CAST(floor(epoch(ts)) AS BIGINT)
                          - CAST(epoch(TIMESTAMP '2024-01-01') AS BIGINT))
                         // 3600) AS bin_epoch,
             CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'
      GROUP BY 1, 2
    )
    SELECT key, bin_epoch,
           last_value(cents IGNORE NULLS)
             OVER (PARTITION BY key ORDER BY bin_epoch
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cents_filled
    FROM grid LEFT JOIN per_bin USING (key, bin_epoch)
    """,
)
def q_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample + forward fill over January 2024
    (operators/timeseries.py::resample_locf): dense grid per user,
    per-bin exact-cent totals, LOCF carry — the metrics/feature
    densification shape."""
    from small_etl_spark.operators.timeseries import resample_locf

    ev = load_table(spark, sf_dir, "events")
    out = resample_locf(ev, "2024-01-01", "2024-01-31", 3600)
    return out.select(
        "key", F.col("bin_ts").cast("long").alias("bin_epoch"), "cents_filled"
    )


@register(
    "rolling_range_sum",
    """
    SELECT user_id, event_id,
           CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER (
                  PARTITION BY user_id
                  ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                  RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / 100.0 AS trailing_sum
    FROM events
    """,
)
def q_rolling_range_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 24h per-user spend at every event
    (operators/timeseries.py::rolling_range_sum): an interval-RANGE
    window frame (peer-inclusive, time-keyed) — the rate-limit /
    rolling-feature shape that a ROWS frame gets wrong under bursts
    and gaps."""
    from small_etl_spark.operators.timeseries import rolling_range_sum

    ev = load_table(spark, sf_dir, "events")
    return rolling_range_sum(ev, 86400)


@register(
    "yoy_growth",
    """
    WITH yearly AS (
      SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS yr,
             CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM orders GROUP BY o_custkey, CAST(year(o_orderdate) AS INT)
    )
    SELECT cur.o_custkey, cur.yr,
           CAST(cur.rev_cents AS DOUBLE) / 100.0 AS revenue,
           round(CAST(cur.rev_cents AS DOUBLE)
                 / CAST(prev.rev_cents AS DOUBLE), 6) AS yoy_ratio
    FROM yearly cur JOIN yearly prev
      ON cur.o_custkey = prev.o_custkey AND cur.yr = prev.yr + 1
    WHERE prev.rev_cents > 0
    """,
)
def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth per customer (the TPC-DS Q4/Q11 shape:
    a periodized aggregate self-joined against its own prior
    period). One aggregation, then a self-join on
    (custkey, yr = yr+1) — both legs share the aggregate's
    partitioning, so the join adds no new exchange for the big side
    at scale. A lag() window over (custkey ORDER BY yr) is the
    single-pass alternative; the self-join form is the one that
    generalizes to cross-channel comparisons (DS Q4 joins store vs
    web years), which is why it's the shape pinned here."""
    o = load_table(spark, sf_dir, "orders")
    yearly = o.groupBy(
        "o_custkey", F.year("o_orderdate").alias("yr")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "rev_cents"
        )
    )
    cur = yearly.select(
        "o_custkey", "yr", F.col("rev_cents").alias("cur_cents")
    )
    prev = yearly.select(
        F.col("o_custkey").alias("p_custkey"),
        (F.col("yr") + 1).alias("p_yr"),
        F.col("rev_cents").alias("prev_cents"),
    )
    return (
        cur.join(
            prev,
            (F.col("o_custkey") == F.col("p_custkey"))
            & (F.col("yr") == F.col("p_yr")),
        )
        .filter(F.col("prev_cents") > 0)
        .select(
            "o_custkey",
            "yr",
            (F.col("cur_cents").cast("double") / 100.0).alias("revenue"),
            F.round(
                F.col("cur_cents").cast("double")
                / F.col("prev_cents").cast("double"),
                6,
            ).alias("yoy_ratio"),
        )
    )


@register(
    "global_ordinal_docs",
    """
    SELECT doc_id, n_chars,
           CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) - 1
                AS BIGINT) AS ordinal
    FROM documents
    """,
)
def q_global_ordinal_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: a GLOBAL rank over (n_chars desc, doc_id)
    via operators/sort.py::global_ordinal — range partition + prefix-
    summed per-partition offsets + parallel local windows, never the
    single-partition window the oracle's bare ROW_NUMBER plans."""
    from small_etl_spark.operators.sort import global_ordinal

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__neg_chars__", -F.col("n_chars")
    )
    return global_ordinal(docs, ["__neg_chars__", "doc_id"]).select(
        "doc_id", "n_chars", "ordinal"
    )


@register(
    "weighted_sample_docs",
    """
    SELECT doc_id, lang, n_chars FROM documents
    WHERE CAST(('0x' || substr(md5(concat_ws('|', 'weighted-v1',
                                             CAST(doc_id AS VARCHAR))), 1, 4))
               AS INT)
          < LEAST(65536.0, CAST(n_chars AS DOUBLE) * 0.002 * 65536)
    """,
)
def q_weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted Bernoulli sample
    (llm/sampling.py::weighted_hash_sample): keep probability
    min(1, 0.002·n_chars) — longer documents upweighted — with
    membership a pure function of (doc_id, salt): engine-portable,
    rerun-stable, pushed-down filter."""
    from small_etl_spark.llm.sampling import weighted_hash_sample

    docs = load_table(spark, sf_dir, "documents")
    return weighted_hash_sample(docs, "n_chars", 0.002).select(
        "doc_id", "lang", "n_chars"
    )


@register(
    "length_bucketed_batches",
    """
    WITH toks AS (
      SELECT doc_id,
             CAST(floor(log2(GREATEST(
               len(list_filter(string_split(text, ' '), x -> x <> '')), 1)))
               AS BIGINT) AS bucket
      FROM documents
    )
    SELECT doc_id, bucket,
           CAST((ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) - 1)
                // 16 AS BIGINT) AS batch_id
    FROM toks
    """,
)
def q_length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inference batching by length bucket
    (llm/chunking.py::length_bucketed_batches): batches of 16 within
    power-of-two token-length buckets — padding waste bounded 2×. The
    oracle's per-bucket ROW_NUMBER is what the implementation
    deliberately avoids (global_ordinal composition keeps the few
    giant buckets parallel)."""
    from small_etl_spark.llm.chunking import length_bucketed_batches

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens",
        F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != "")),
    )
    return length_bucketed_batches(docs, "n_tokens", 16)


@register(
    "copurchase_pairs",
    """
    WITH parts_per_order AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM parts_per_order a JOIN parts_per_order b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 25
    """,
)
def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence (the Apriori candidate-pair step):
    parts bought together, top 25. The self-join is keyed on
    l_orderkey so the pair blow-up is bounded by lines-per-order
    (≈4-7), never corpus-n² — the same blocking argument as the
    n-gram dedup joins; `part_a < part_b` halves the pairs and
    canonicalizes them."""
    li = load_table(spark, sf_dir, "lineitem")
    ppo = li.select("l_orderkey", "l_partkey").distinct()
    a = ppo.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = ppo.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(
            b,
            (F.col("ok") == F.col("ok2")) & (F.col("part_a") < F.col("part_b")),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(25)
    )


# Z-order oracle: the Morton interleave is mechanical, so the SQL is
# generated from the same (bits, dims) parameters the Spark operator
# uses — guaranteeing the two sides implement the identical curve.
_Z_TERMS = " | ".join(
    f"(((ux >> {b}) & 1) << {2 * b}) | (((uy >> {b}) & 1) << {2 * b + 1})"
    for b in range(8)
)

_ZORDER_ORACLE = f"""
    WITH bucketed AS (
      SELECT event_id,
             GREATEST(0, LEAST(CAST(floor((user_id * 256) / 1024) AS BIGINT),
                               255)) AS ux,
             GREATEST(0, LEAST(CAST(floor((CAST(round(value*100) AS BIGINT)
                                           * 256) / 56100) AS BIGINT),
                               255)) AS uy
      FROM events
    )
    SELECT event_id, {_Z_TERMS} AS zcode FROM bucketed
"""


@register("zorder_events", _ZORDER_ORACLE)
def q_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (user_id, value-cents)
    (operators/layout.py::zorder_by): static-bounds bucketing + bit
    interleave, all JVM shift/and/or expressions. The oracle SQL is
    generated from the same curve parameters; the locality payoff
    (per-file span bounded on BOTH dimensions) is pinned by
    tests/test_layout.py."""
    from small_etl_spark.operators.layout import zorder_by

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_cents", F.round(F.col("value") * 100).cast("bigint")
    )
    z = zorder_by(ev, [("user_id", 0, 1024), ("value_cents", 0, 56100)], bits=8)
    return z.select("event_id", "zcode")


@register(
    "segment_dedup_docs",
    """
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), ix AS (
      SELECT doc_id, ws,
             unnest(range(1, CAST(ceil(len(ws) / 3.0) AS BIGINT) + 1)) AS i
      FROM w
    ), seg AS (
      SELECT doc_id, i,
             array_to_string(ws[(i - 1) * 3 + 1 : i * 3], ' ') AS seg
      FROM ix
    ), cnt AS (
      SELECT seg, COUNT(DISTINCT doc_id) AS nd FROM seg GROUP BY 1
    ), j AS (
      SELECT s.doc_id, s.i, s.seg, c.nd FROM seg s JOIN cnt c USING (seg)
    )
    SELECT doc_id,
           string_agg(seg, ' ' ORDER BY i) FILTER (WHERE nd <= 2)
             AS clean_text,
           CAST(COUNT(*) FILTER (WHERE nd <= 2) AS BIGINT) AS n_kept,
           CAST(COUNT(*) FILTER (WHERE nd > 2) AS BIGINT) AS n_dropped
    FROM j GROUP BY doc_id HAVING n_kept > 0
    """,
)
def q_segment_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus boilerplate-segment removal
    (llm.dedup.cross_doc_segment_dedup): the RefinedWeb "line dedup"
    pass with 3-word windows as line surrogates — segments seen in >2
    distinct docs are struck everywhere, survivors reassembled in
    order. Two bounded-group shuffles; the doc-frequency count is
    map-side combined so boilerplate skew collapses early."""
    from small_etl_spark.llm.dedup import cross_doc_segment_dedup

    docs = load_table(spark, sf_dir, "documents")
    return cross_doc_segment_dedup(docs, seg_words=3, max_docs=2)


@register(
    "bm25_scores_docs",
    r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+'))
               AS term
      FROM documents
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1
    ), corpus AS (
      SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks
      WHERE term IN ('spark', 'window', 'merge') GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ), per_term AS (
      SELECT tf.doc_id,
             round(ln(1 + (corpus.n_docs - dfreq.df + 0.5)
                          / (dfreq.df + 0.5))
                   * (tf.tf * 2.2)
                   / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / corpus.avgdl)),
                   6) AS term_score
      FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
      CROSS JOIN corpus
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matched,
           SUM(CAST(round(term_score * 1000000) AS BIGINT)) / 1000000.0
             AS score
    FROM per_term GROUP BY doc_id
    """,
)
def q_bm25_scores_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval scoring (llm.textstats.bm25_scores) for a
    3-term query over the documents table. Per-term scores rounded to
    6dp then summed as exact integer micros, so the aggregate is
    order-independent and hash-stable across engines. The query-
    vocabulary filter lands before any shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.bm25_scores(docs, ["spark", "window", "merge"])


@register(
    "association_rules_parts",
    """
    WITH ppo AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM ppo
    ), ic AS (
      SELECT l_partkey AS item, COUNT(*) AS n_item FROM ppo GROUP BY 1
    ), pairs AS (
      SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
             CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM ppo a JOIN ppo b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT item_a, item_b, n_ab, ca.n_item AS n_a, cb.n_item AS n_b,
           round(n_ab / ca.n_item, 6) AS conf_a_to_b,
           round(n_ab / cb.n_item, 6) AS conf_b_to_a,
           round((n_ab * n.n_baskets) / (ca.n_item * cb.n_item), 6) AS lift
    FROM pairs
    JOIN ic ca ON ca.item = item_a
    JOIN ic cb ON cb.item = item_b
    CROSS JOIN n
    """,
)
def q_association_rules_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over co-purchased parts
    (operators.market.association_rules): support / confidence / lift
    for every part pair co-occurring in ≥2 orders. Exact-integer
    counts; ratios are single IEEE divisions rounded to 6dp. The pair
    join is order-blocked (bounded by lines-per-order, never n²)."""
    from small_etl_spark.operators.market import association_rules

    li = load_table(spark, sf_dir, "lineitem")
    return association_rules(
        li, basket_col="l_orderkey", item_col="l_partkey", min_pair_count=2
    )


@register(
    "triangle_counts_copurchase",
    """
    WITH ppo AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM ppo a JOIN ppo b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ), tri AS (
      SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
      FROM pairs e1
      JOIN pairs e2 ON e1.pb = e2.pa
      JOIN pairs e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    ), nodes AS (
      SELECT unnest([a, b, c]) AS node FROM tri
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM nodes GROUP BY 1
    ORDER BY n_triangles DESC, node
    LIMIT 15
    """,
)
def q_triangle_counts_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the frequent-co-purchase graph
    (operators.graph.triangle_counts): degree-ordered wedge
    enumeration (out-neighborhoods bounded O(√m) — the oracle's naive
    a<b three-way join is what the implementation deliberately
    avoids; both enumerate the identical triangle set)."""
    from small_etl_spark.operators.graph import triangle_counts

    li = load_table(spark, sf_dir, "lineitem")
    ppo = li.select("l_orderkey", "l_partkey").distinct()
    a = ppo.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = ppo.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("src") < F.col("dst")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("src", "dst")
    )
    return (
        triangle_counts(edges)
        .orderBy(F.col("n_triangles").desc(), "node")
        .limit(15)
    )


@register(
    "fuzzy_dup_customers",
    """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           a.c_name AS name_a, b.c_name AS name_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS distance
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def q_fuzzy_dup_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity matching
    (operators.dedup.fuzzy_dup_pairs): Levenshtein ≤1 customer-name
    pairs, compared only inside same-nation blocks — the
    entity-resolution blocking discipline that keeps edit-distance
    joins off the n² path. JVM levenshtein expression, exact integer
    distance."""
    from small_etl_spark.operators.dedup import fuzzy_dup_pairs

    cust = load_table(spark, sf_dir, "customer")
    return fuzzy_dup_pairs(
        cust, id_col="c_custkey", text_col="c_name",
        block_cols=["c_nationkey"], max_distance=1,
    )


@register(
    "ab_chi_square_events",
    """
    WITH per_unit AS (
      SELECT user_id, user_id % 2 AS variant,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY 1, 2
    ), counts AS (
      SELECT
        CAST(SUM(CASE WHEN variant = 0 AND converted = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS a_conv,
        CAST(SUM(CASE WHEN variant = 0 AND converted = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS a_noconv,
        CAST(SUM(CASE WHEN variant = 1 AND converted = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS b_conv,
        CAST(SUM(CASE WHEN variant = 1 AND converted = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS b_noconv
      FROM per_unit
    )
    SELECT a_conv, a_noconv, b_conv, b_noconv,
           round((a_conv + a_noconv + b_conv + b_noconv)
                 * (a_conv * b_noconv - a_noconv * b_conv)
                 * (a_conv * b_noconv - a_noconv * b_conv)
                 / ((a_conv + a_noconv) * (b_conv + b_noconv)
                    * (a_conv + b_conv) * (a_noconv + b_noconv)),
                 6) AS chi_square
    FROM counts
    """,
)
def q_ab_chi_square_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 chi-square A/B test (operators.profiling.ab_chi_square):
    users split by parity of user_id, conversion = any purchase
    event. Exact BIGINT contingency terms, one IEEE division rounded
    to 6dp — two-level aggregation, no libm."""
    from small_etl_spark.operators.profiling import ab_chi_square

    ev = load_table(spark, sf_dir, "events")
    return ab_chi_square(
        ev,
        unit_col="user_id",
        variant_col=F.col("user_id") % 2,
        outcome_col=F.col("event_type") == "purchase",
    )


@register(
    "mad_outliers_events",
    """
    WITH v AS (
      SELECT event_type AS grp, CAST(round(value * 100) AS BIGINT) AS v
      FROM events
    ), med AS (
      SELECT grp, median(v) AS med FROM v GROUP BY 1
    ), dev AS (
      SELECT v.grp, v.v, med.med, abs(v.v - med.med) AS ad
      FROM v JOIN med USING (grp)
    ), mad AS (
      SELECT grp, median(ad) AS mad FROM dev GROUP BY 1
    )
    SELECT dev.grp AS event_type, MIN(dev.med) AS med, MIN(mad.mad) AS mad,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN mad.mad > 0
                         THEN CASE WHEN 0.6745 * dev.ad / mad.mad > 3.5
                                   THEN 1 ELSE 0 END
                         ELSE NULL END) AS BIGINT) AS n_outliers
    FROM dev JOIN mad USING (grp)
    GROUP BY 1
    """,
)
def q_mad_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust MAD outlier summary per event type
    (operators.profiling.mad_outliers): exact interpolated medians
    over integer cents (binary-exact, engine-portable), modified
    z-score 0.6745·|v−med|/MAD > 3.5. The exact-median twin of the
    sketch-based approx_percentiles path."""
    from small_etl_spark.operators.profiling import mad_outliers

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_cents", F.round(F.col("value") * 100).cast("bigint")
    )
    return mad_outliers(ev, group_col="event_type", value_col="value_cents")


@register(
    "event_transitions",
    """
    WITH pairs AS (
      SELECT lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type,
             event_type AS next_type
      FROM events
    ), c AS (
      SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS transitions
      FROM pairs WHERE prev_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev_type, next_type, transitions,
           round(CAST(transitions AS DOUBLE)
                 / CAST(SUM(transitions) OVER (PARTITION BY prev_type)
                        AS DOUBLE), 6) AS prob
    FROM c
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (operators/events.py::event_transitions): lag window
    partitioned by user (parallel per-user frames, event_id tiebreak),
    |types|²-sized count shuffle, probability normalized within
    prev_type."""
    from small_etl_spark.operators.events import event_transitions

    ev = load_table(spark, sf_dir, "events")
    return event_transitions(ev)


@register(
    "train_shuffle_shards",
    """
    WITH o AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (
                    ORDER BY md5('shuffle-v1|' || CAST(doc_id AS VARCHAR)),
                             doc_id) - 1 AS BIGINT) AS ordinal
      FROM documents
    )
    SELECT doc_id, ordinal,
           CAST(ordinal % 8 AS INT) AS shard,
           ordinal // 8 AS position
    FROM o
    """,
)
def q_train_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle + round-robin shard
    striping (llm/sampling.py::global_shuffle_shards): md5 content-
    defined permutation ranked by the distributed global_ordinal
    (range exchange + prefix-summed offsets, never a single-partition
    window), shard/position derived map-side — the write-N-shard-files
    step of a pretraining pipeline, reproducible across engines and
    cluster sizes."""
    from small_etl_spark.llm.sampling import global_shuffle_shards

    docs = load_table(spark, sf_dir, "documents")
    return global_shuffle_shards(docs, id_col="doc_id", n_shards=8)


@register(
    "equidepth_bins_orders",
    """
    WITH o AS (
      SELECT o_totalprice AS v, o_orderkey AS k,
             CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) - 1
                  AS BIGINT) AS ord
      FROM orders
    ), n AS (SELECT COUNT(*) AS n FROM orders)
    SELECT CAST((ord * 10) // n.n AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           MIN(v) AS lo, MAX(v) AS hi,
           CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_val
    FROM o, n
    GROUP BY 1
    """,
)
def q_equidepth_bins_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth (quantile) binning of order totals
    (operators/profiling.py::equidepth_bins): global rank via the
    distributed ordinal, bin = (ord*k) DIV n in exact integer
    arithmetic (pinned identically in both engines — no ntile
    remainder ambiguity), per-bin count/min/max/cents-exact sum. The
    cut points double as range-partition split points for a 100 TB
    sort."""
    from small_etl_spark.operators.profiling import equidepth_bins

    orders = load_table(spark, sf_dir, "orders")
    return equidepth_bins(orders, col="o_totalprice", tiebreak="o_orderkey", bins=10)


@register(
    "inter_event_gaps",
    """
    WITH g AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT)
             - lag(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
      FROM events
    )
    SELECT CASE WHEN gap_s < 60 THEN 'a_lt_1m'
                WHEN gap_s < 600 THEN 'b_1m_10m'
                WHEN gap_s < 3600 THEN 'c_10m_1h'
                WHEN gap_s < 86400 THEN 'd_1h_1d'
                ELSE 'e_ge_1d' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(gap_s) AS min_gap_s, MAX(gap_s) AS max_gap_s,
           round(CAST(SUM(gap_s) AS DOUBLE) / COUNT(*), 6) AS avg_gap_s
    FROM g WHERE gap_s IS NOT NULL
    GROUP BY 1
    """,
)
def q_inter_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Think-time gap distribution between consecutive per-user events
    (operators/events.py::inter_event_gaps): exact integer gap
    seconds bucketed on human-scale boundaries — the data-driven way
    to pick a sessionization threshold."""
    from small_etl_spark.operators.events import inter_event_gaps

    ev = load_table(spark, sf_dir, "events")
    return inter_event_gaps(ev)


@register(
    "last_touch_attribution",
    """
    WITH t AS (
      SELECT event_type,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_type,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    )
    SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS conversions,
           CAST(SUM(c) AS DOUBLE) / 100.0 AS revenue
    FROM t
    WHERE event_type = 'purchase' AND touch_type IS NOT NULL
    GROUP BY touch_type
    """,
)
def q_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution
    (operators/events.py::last_touch_attribution): each purchase
    credits the last preceding non-purchase touch in the user's
    timeline (ignorenulls window skips interleaved conversions);
    revenue cents-exact."""
    from small_etl_spark.operators.events import last_touch_attribution

    ev = load_table(spark, sf_dir, "events")
    return last_touch_attribution(ev)
