"""Statistical audits and engine contracts: variance props, HHI/Gini/Pareto, PQ/pre-agg/IVM/HLL contracts, graph CC, golden records, attribution."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from small_etl_spark.queries._registry import register
from small_etl_spark.llm import textstats
from small_etl_spark.sources.tables import load_table


@register(
    "props_variant_agg",
    """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_band,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY 1
    """,
)
def q_props_variant_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through Spark 4's VARIANT type:
    ``parse_json`` turns the JSON ``props`` column into the binary
    variant encoding once, ``variant_get`` extracts typed paths
    WITHOUT per-access string re-parsing — the open-lakehouse answer
    to schemaless columns (vs ``get_json_object``, which re-parses
    the string per call; that legacy path is covered by
    json_path_extract). Oracle goes through DuckDB's JSON extraction
    on the same column."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        F.variant_get(F.parse_json("props"), "$.k", "bigint").alias("k")
    ).filter(F.col("k").isNotNull())
    return (
        v.groupBy((F.col("k") % 10).alias("k_band"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "dispersion_index_events",
    """
    WITH daily AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT event_type,
             COUNT(*) AS days,
             SUM(n) AS s1,
             SUM(n * n) AS s2
      FROM daily GROUP BY 1
    )
    SELECT event_type, CAST(days AS BIGINT) AS days,
           CAST(s1 AS BIGINT) AS total,
           round(CAST(s1 AS DOUBLE) / days, 6) AS mean_daily,
           round((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / days)
                 / days, 6) AS var_daily,
           round(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / days)
                  / days) / (CAST(s1 AS DOUBLE) / days), 6)
             AS dispersion
    FROM s
    """,
)
def q_dispersion_index_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dispersion index (variance-to-mean ratio) of daily event
    counts per type — the overdispersion tripwire: ≈1 is Poisson
    arrivals, ≫1 means bursty/clumped traffic (bot storms,
    batch-replayed feeds), ≪1 means suspiciously regular (synthetic
    schedules). Variance from exact integer moment sums (Σn, Σn²) —
    population variance, one two-level groupBy, no window, fully
    order-independent."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("days"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("days")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("days")
    ) / F.col("days")
    return s.select(
        "event_type",
        "days",
        F.col("s1").alias("total"),
        F.round(mean, 6).alias("mean_daily"),
        F.round(var, 6).alias("var_daily"),
        F.round(var / mean, 6).alias("dispersion"),
    )


@register(
    "gini_user_activity",
    """
    WITH per_user AS (
      SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1
    ), ranked AS (
      SELECT n, row_number() OVER (ORDER BY n, user_id) AS i,
             COUNT(*) OVER () AS u, SUM(n) OVER () AS tot
      FROM per_user
    )
    SELECT CAST(MAX(u) AS BIGINT) AS n_users,
           CAST(MAX(tot) AS BIGINT) AS n_events,
           round(2.0 * CAST(SUM(i * n) AS DOUBLE) / (MAX(u) * CAST(MAX(tot) AS DOUBLE))
                 - (MAX(u) + 1.0) / MAX(u), 6) AS gini
    FROM ranked
    """,
)
def q_gini_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event-count concentration — the
    inequality summary behind "1% of users generate X% of traffic"
    skew planning (it directly predicts hot-key pressure on every
    user-keyed shuffle). Uses the rank formula
    ``2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n`` with the rank from
    operators.sort.global_ordinal (partition-parallel, no single-task
    window over users); Σ(i·xᵢ) is an exact integer sum."""
    from small_etl_spark.operators.sort import global_ordinal

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    ranked = global_ordinal(per_user, ["n", "user_id"], ordinal_col="i0")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n").alias("n_events"),
        F.round(
            F.lit(2.0)
            * F.sum((F.col("i0") + 1) * F.col("n")).cast("double")
            / (
                F.count(F.lit(1))
                * F.sum("n").cast("double")
            )
            - (F.count(F.lit(1)) + F.lit(1.0)) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


@register(
    "weighted_median_prices",
    """
    WITH w AS (
      SELECT l_returnflag, l_extendedprice AS price,
             CAST(l_quantity AS BIGINT) AS wt,
             SUM(CAST(l_quantity AS BIGINT))
               OVER (PARTITION BY l_returnflag
                     ORDER BY l_extendedprice, l_orderkey, l_linenumber
                     ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(CAST(l_quantity AS BIGINT))
               OVER (PARTITION BY l_returnflag) AS tot
      FROM lineitem
    )
    SELECT l_returnflag, CAST(MAX(tot) AS BIGINT) AS total_weight,
           MIN(CASE WHEN 2 * cum >= tot THEN price END) AS weighted_median
    FROM w GROUP BY l_returnflag
    """,
)
def q_weighted_median_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median per group: the price at which half the
    total QUANTITY (not half the rows) lies at-or-below — the
    weighted order statistic behind fair-price and allocation
    summaries. One per-group cumulative-weight window (partitioned by
    the group — parallel across groups) + a conditional min; weights
    sum as exact integers, the median is an existing data value, so
    the result is engine-exact with no rounding anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.sum(F.col("l_quantity").cast("bigint")).over(w_cum).alias("cum"),
        F.sum(F.col("l_quantity").cast("bigint")).over(w_all).alias("tot"),
    )
    return ranked.groupBy("l_returnflag").agg(
        F.max("tot").alias("total_weight"),
        F.min(
            F.when(F.lit(2) * F.col("cum") >= F.col("tot"), F.col("price"))
        ).alias("weighted_median"),
    )


@register("phash_near_dup_media", None)  # rows-only: the decode step is
# Python-side (fake codec standing in for Pillow), so DuckDB cannot
# replay it; determinism + the perturbation-recall property are pinned
# by tests/test_multimodal.py
def q_phash_near_dup_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dedup by perceptual hash
    (llm/multimodal.py::perceptual_hash + phash_near_dup): 64-bit
    average-hash per image (map-only decode), pigeonhole-blocked
    16-bit-chunk candidate join, exact bit_count(xor) Hamming verify
    — the multimodal counterpart of the SimHash text dedup, over the
    deterministic synthetic media corpus."""
    from small_etl_spark.llm.multimodal import (
        perceptual_hash, phash_near_dup, synth_media_df,
    )

    media = synth_media_df(spark, n=64).filter(F.col("kind") == "image")
    return phash_near_dup(perceptual_hash(media), max_hamming=16).orderBy(
        "id_a", "id_b"
    )




def _pq_oracle(m: int = 8, k: int = 16, dim: int = 64, kq: int = 10) -> str:
    """DuckDB twin of the full PQ pipeline (pq_train -> pq_encode ->
    pq_topk): per subspace, the md5 bottom-k seed pick and two Lloyd
    rounds are unrolled exactly like the kmeans_clusters oracle; codes
    densify by cell order; encode is an L2 argmin against the
    codebook; ADC sums the per-subspace table lookups. Sequential
    list_sum folds mirror the engine's F.aggregate folds bit-for-bit."""
    dsub = dim // m

    def l2sq(a: str, b: str) -> str:
        return (
            f"list_sum([({a}[i] - {b}[i]) * ({a}[i] - {b}[i]) "
            f"for i in range(1, len({a}) + 1)])"
        )

    parts = []
    books = []
    subs = []
    for j in range(m):
        lo, hi = j * dsub + 1, j * dsub + dsub
        seed = 42 + j
        parts.append(f"""
    s{j} AS (
      SELECT vec_id, CAST(embedding[{lo}:{hi}] AS DOUBLE[]) AS v
      FROM embeddings WHERE embedding IS NOT NULL
    ), seeds{j} AS (
      SELECT vec_id AS cell, v AS cent FROM s{j}
      ORDER BY md5(CAST(vec_id AS VARCHAR) || ':{seed}') LIMIT {k}
    ), a{j}0 AS (
      SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, s.cell,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY list_cosine_similarity(c.v, s.cent) DESC,
                          s.cell DESC) AS rn
        FROM s{j} c CROSS JOIN seeds{j} s) WHERE rn = 1
    ), c{j}1 AS (
      SELECT cell, list(mm ORDER BY pos) AS cent FROM (
        SELECT cell, pos, AVG(x) AS mm FROM (
          SELECT cell, unnest(v) AS x,
                 unnest(range(1, len(v)+1)) AS pos FROM a{j}0)
        GROUP BY cell, pos) GROUP BY cell
    ), a{j}1 AS (
      SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, s.cell,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY list_cosine_similarity(c.v, s.cent) DESC,
                          s.cell DESC) AS rn
        FROM s{j} c CROSS JOIN c{j}1 s) WHERE rn = 1
    ), c{j}2 AS (
      SELECT cell, list(mm ORDER BY pos) AS cent FROM (
        SELECT cell, pos, AVG(x) AS mm FROM (
          SELECT cell, unnest(v) AS x,
                 unnest(range(1, len(v)+1)) AS pos FROM a{j}1)
        GROUP BY cell, pos) GROUP BY cell
    )""")
        books.append(
            f"SELECT {j} AS sub_idx, cell, cent FROM c{j}2"
        )
        subs.append(f"SELECT vec_id, {j} AS sub_idx, v FROM s{j}")
    body = ",".join(parts)
    return f"""
    WITH {body.lstrip()},
    rawbook AS (
      {" UNION ALL ".join(books)}
    ), book AS (
      SELECT sub_idx, cent,
             CAST(dense_rank() OVER (PARTITION BY sub_idx ORDER BY cell)
                  - 1 AS INT) AS code
      FROM rawbook
    ), subs AS (
      {" UNION ALL ".join(subs)}
    ), enc AS (
      SELECT vec_id, sub_idx, code FROM (
        SELECT s.vec_id, s.sub_idx, b.code,
               row_number() OVER (PARTITION BY s.vec_id, s.sub_idx
                 ORDER BY {l2sq("s.v", "b.cent")} ASC, b.code ASC) AS rn
        FROM subs s JOIN book b USING (sub_idx)) WHERE rn = 1
    ), dtab AS (
      SELECT q.vec_id AS query_id, q.sub_idx, b.code,
             {l2sq("q.v", "b.cent")} AS qd
      FROM subs q JOIN book b USING (sub_idx)
      WHERE q.vec_id < 8
    ), scored AS (
      SELECT d.query_id, e.vec_id, SUM(d.qd) AS adist
      FROM enc e JOIN dtab d ON d.sub_idx = e.sub_idx AND d.code = e.code
      GROUP BY d.query_id, e.vec_id
      HAVING COUNT(*) = {m}
    ), ranked AS (
      SELECT query_id, vec_id, adist,
             row_number() OVER (PARTITION BY query_id
               ORDER BY adist ASC, vec_id ASC) AS rn
      FROM scored
    )
    SELECT query_id, vec_id, CAST(rn AS BIGINT) AS rank,
           round(adist, 6) AS adist
    FROM ranked WHERE rn <= {kq}
    """


@register("pq_ann_topk", _pq_oracle())
def q_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (llm/similarity.py::pq_train/encode/
    topk): 64-dim float vectors compressed to 8 one-byte codes
    (m=8 subspaces × 16 centroids), searched by asymmetric distance
    — per query one m×16 lookup table, per corpus vector m adds over
    INTEGER codes. The 100 TB vector-search storage path: the float
    corpus is touched once at encode time, never per query.
    Round 7 made the per-subspace Lloyd seeds engine-portable, so the
    ENTIRE pipeline — 8 seed picks, 16 Lloyd rounds, code
    densification, L2-argmin encode, ADC table build and the windowed
    top-k — now replays as one DuckDB statement (``_pq_oracle``):
    every hit and its asymmetric distance is value-checked."""
    from small_etl_spark.llm.similarity import pq_encode, pq_topk, pq_train

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_train(emb, m=8, num_centroids=16)
    codes = pq_encode(emb, books, m=8)
    q = emb.filter(F.col("vec_id") < 8)
    out = pq_topk(codes, books, q, k=10, m=8)
    return out.select(
        "query_id", "vec_id", "rank", F.round("adist", 6).alias("adist")
    )


@register(
    "pq_recall_contract",
    """
    SELECT CAST(8 AS BIGINT) AS n_queries, TRUE AS recall_ok
    """,
)
def q_pq_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality contract for the PQ path: recall@10 of the
    8-byte-code ADC search against the exact L2 top-10 over the same
    8 queries must beat 0.1 — ≥5× the random baseline at sf0.01
    (10/500) and ≥50× at sf0.1 (10/5000). Measured on the shipped
    testdata: 0.3875 at sf0.01, 0.1875 at sf0.1. Hash-deterministic
    codebooks → a stable driver row; exact hit sets live in the
    rows-only ``pq_ann_topk`` and pytest."""
    from small_etl_spark.llm.similarity import pq_encode, pq_topk, pq_train

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    books = pq_train(emb, m=8, num_centroids=16)
    codes = pq_encode(emb, books, m=8)
    pq = pq_topk(codes, books, q, k=10, m=8).select("query_id", "vec_id")

    a = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    b = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("cv")
    )
    d = a.crossJoin(b).withColumn(
        "d",
        F.aggregate(
            F.zip_with("qv", "cv", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d").asc(), F.col("vec_id").asc()
    )
    exact = (
        d.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 10)
        .select("query_id", "vec_id")
    )
    marked = exact.join(
        pq.withColumn("__hit__", F.lit(1)), ["query_id", "vec_id"], "left"
    )
    return marked.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.sum(F.coalesce(F.col("__hit__"), F.lit(0))).alias("__hits__"),
    ).select(
        "n_queries",
        (
            F.col("__hits__").cast("double")
            / (F.lit(10.0) * F.col("n_queries"))
            > 0.1
        ).alias("recall_ok"),
    )


@register(
    "preagg_reuse_contract",
    """
    WITH daily AS (
      SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents,
             COUNT(*) AS n
      FROM orders GROUP BY 1
    ), monthly_from_daily AS (
      SELECT substr(day, 1, 7) AS month, SUM(cents) AS cents, SUM(n) AS n
      FROM daily GROUP BY 1
    ), monthly_direct AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents,
             COUNT(*) AS n
      FROM orders GROUP BY 1
    )
    SELECT d.month,
           CAST(d.n AS BIGINT) AS n_orders,
           CAST(d.cents AS DOUBLE) / 100.0 AS revenue,
           d.cents = f.cents AND d.n = f.n AS rollup_equal
    FROM monthly_direct d JOIN monthly_from_daily f USING (month)
    """,
)
def q_preagg_reuse_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-navigator contract: monthly revenue computed two ways
    — directly from the fact table, and by ROLLING UP a daily
    pre-aggregate — must be cell-identical (sums/counts are
    algebraic, so the time hierarchy composes). This identity is what
    lets a 100 TB pipeline serve month/quarter/year queries from a
    day-grain materialization instead of re-scanning facts; exact
    integer cents make the equality bit-true, and the driver
    value-hash checks every month's flag."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.sum(
        F.round(F.col("o_totalprice") * 100).cast("bigint")
    )
    daily = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(cents.alias("cents"), F.count(F.lit(1)).alias("n"))
    from_daily = daily.groupBy(
        F.substring("day", 1, 7).alias("month")
    ).agg(F.sum("cents").alias("f_cents"), F.sum("n").alias("f_n"))
    direct = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(cents.alias("cents"), F.count(F.lit(1)).alias("n"))
    return direct.join(from_daily, "month").select(
        "month",
        F.col("n").alias("n_orders"),
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        (
            (F.col("cents") == F.col("f_cents")) & (F.col("n") == F.col("f_n"))
        ).alias("rollup_equal"),
    )


@register(
    "catalog_stats",
    """
    SELECT 'region' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(2 AS BIGINT) AS n_cols FROM region
    UNION ALL SELECT 'nation', COUNT(*), 3 FROM nation
    UNION ALL SELECT 'customer', COUNT(*), 5 FROM customer
    UNION ALL SELECT 'supplier', COUNT(*), 4 FROM supplier
    UNION ALL SELECT 'part', COUNT(*), 6 FROM part
    UNION ALL SELECT 'orders', COUNT(*), 6 FROM orders
    UNION ALL SELECT 'lineitem', COUNT(*), 11 FROM lineitem
    UNION ALL SELECT 'events', COUNT(*), 6 FROM events
    UNION ALL SELECT 'documents', COUNT(*), 5 FROM documents
    UNION ALL SELECT 'embeddings', COUNT(*), 3 FROM embeddings
    """,
)
def q_catalog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-catalog survey: row and column counts for every table in
    the scale-factor directory — the first query any engine
    migration runs. Each COUNT(*) is a metadata-adjacent scan
    (parquet row-group counts, no column decode: the scan's
    ReadSchema is empty); the union is 10 tiny aggregates."""
    from small_etl_spark.sources.tables import TABLES, load_table as _lt

    parts = []
    for t in TABLES:
        df = _lt(spark, sf_dir, t)
        parts.append(
            df.agg(F.count(F.lit(1)).alias("n_rows")).select(
                F.lit(t).alias("tbl"),
                "n_rows",
                F.lit(len(df.columns)).cast("bigint").alias("n_cols"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "fs_em_step",
    """
    WITH p AS (
      SELECT levenshtein(a.c_name, b.c_name) <= 1 AS g_name,
             a.c_mktsegment = b.c_mktsegment AS g_seg,
             floor(a.c_acctbal / 1000.0) = floor(b.c_acctbal / 1000.0)
               AS g_bal
      FROM customer a
      JOIN customer b
        ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 2
    ), pat AS (
      SELECT g_name, g_seg, g_bal, CAST(COUNT(*) AS DOUBLE) AS n
      FROM p GROUP BY 1, 2, 3
    ), wgt AS (
      SELECT *,
        0.1 * (CASE WHEN g_name THEN 0.9 ELSE 0.1 END)
            * (CASE WHEN g_seg THEN 0.9 ELSE 0.1 END)
            * (CASE WHEN g_bal THEN 0.8 ELSE 0.2 END) AS pm,
        0.9 * (CASE WHEN g_name THEN 0.1 ELSE 0.9 END)
            * (CASE WHEN g_seg THEN 0.2 ELSE 0.8 END)
            * (CASE WHEN g_bal THEN 0.1 ELSE 0.9 END) AS pu
      FROM pat
    ), ww AS (
      SELECT *, pm / (pm + pu) AS w FROM wgt
    ), fields AS (
      SELECT 'name' AS field, CASE WHEN g_name THEN 1.0 ELSE 0.0 END AS g,
             n, w FROM ww
      UNION ALL
      SELECT 'seg', CASE WHEN g_seg THEN 1.0 ELSE 0.0 END, n, w FROM ww
      UNION ALL
      SELECT 'bal', CASE WHEN g_bal THEN 1.0 ELSE 0.0 END, n, w FROM ww
    )
    SELECT field,
           round(SUM(w * n * g) / SUM(w * n), 6) AS m_new,
           round(SUM((1 - w) * n * g) / SUM((1 - w) * n), 6) AS u_new,
           round(SUM(w * n) / SUM(n), 6) AS p_match
    FROM fields GROUP BY field
    """,
)
def q_fs_em_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One EM iteration of Fellegi–Sunter parameter estimation over
    the blocked candidate pairs: from the 2³ agreement-pattern
    counts, compute each pattern's posterior match weight under the
    initial (m, u, p) guesses, then re-estimate per-field m (P(agree
    | match)) and u (P(agree | non-match)) — how real record-linkage
    systems LEARN the weights that ``fs_link_scores`` declares.
    Everything after the blocked self-join is arithmetic over 8
    pattern-count rows, so the whole E+M step is a pure expression
    tree (and runs identically in the DuckDB oracle)."""
    c = load_table(spark, sf_dir, "customer")
    a = c.select(*[F.col(x).alias(f"a_{x}") for x in c.columns])
    b = c.select(*[F.col(x).alias(f"b_{x}") for x in c.columns])
    pairs = (
        a.join(
            b,
            (F.col("a_c_nationkey") == F.col("b_c_nationkey"))
            & (F.col("a_c_custkey") < F.col("b_c_custkey")),
        )
        .filter(F.levenshtein("a_c_name", "b_c_name") <= 2)
        .select(
            (F.levenshtein("a_c_name", "b_c_name") <= 1).alias("g_name"),
            (F.col("a_c_mktsegment") == F.col("b_c_mktsegment")).alias(
                "g_seg"
            ),
            (
                F.floor(F.col("a_c_acctbal") / 1000.0)
                == F.floor(F.col("b_c_acctbal") / 1000.0)
            ).alias("g_bal"),
        )
    )
    pat = pairs.groupBy("g_name", "g_seg", "g_bal").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )

    def bern(flag, yes, no):
        return F.when(F.col(flag), F.lit(yes)).otherwise(F.lit(no))

    pm = (
        F.lit(0.1)
        * bern("g_name", 0.9, 0.1)
        * bern("g_seg", 0.9, 0.1)
        * bern("g_bal", 0.8, 0.2)
    )
    pu = (
        F.lit(0.9)
        * bern("g_name", 0.1, 0.9)
        * bern("g_seg", 0.2, 0.8)
        * bern("g_bal", 0.1, 0.9)
    )
    ww = pat.withColumn("w", pm / (pm + pu))
    fields = None
    for fname, flag in (("name", "g_name"), ("seg", "g_seg"), ("bal", "g_bal")):
        part = ww.select(
            F.lit(fname).alias("field"),
            F.when(F.col(flag), F.lit(1.0)).otherwise(F.lit(0.0)).alias("g"),
            "n",
            "w",
        )
        fields = part if fields is None else fields.unionByName(part)
    return fields.groupBy("field").agg(
        F.round(
            F.sum(F.col("w") * F.col("n") * F.col("g"))
            / F.sum(F.col("w") * F.col("n")),
            6,
        ).alias("m_new"),
        F.round(
            F.sum((F.lit(1.0) - F.col("w")) * F.col("n") * F.col("g"))
            / F.sum((F.lit(1.0) - F.col("w")) * F.col("n")),
            6,
        ).alias("u_new"),
        F.round(F.sum(F.col("w") * F.col("n")) / F.sum("n"), 6).alias(
            "p_match"
        ),
    )


@register(
    "position_attribution_events",
    """
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type, value,
             COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS j
      FROM events
    ), convs AS (
      SELECT user_id, j, CAST(round(value * 100) AS BIGINT) AS cents
      FROM marked WHERE event_type = 'purchase'
    ), pos AS (
      SELECT user_id, j, event_type AS touch_type,
             row_number() OVER (PARTITION BY user_id, j
                                ORDER BY ts, event_id) AS ra,
             row_number() OVER (PARTITION BY user_id, j
                                ORDER BY ts DESC, event_id DESC) AS rd
      FROM marked WHERE event_type <> 'purchase'
    ), roled AS (
      SELECT touch_type,
             CASE WHEN ra = 1 AND rd = 1 THEN 'only'
                  WHEN ra = 1 THEN 'first'
                  WHEN rd = 1 THEN 'last'
                  ELSE 'middle' END AS role,
             user_id, j
      FROM pos
    )
    SELECT r.touch_type, r.role, CAST(COUNT(*) AS BIGINT) AS touches,
           CAST(SUM(c.cents) AS DOUBLE) / 100.0 AS influenced_revenue
    FROM roled r JOIN convs c USING (user_id, j)
    GROUP BY 1, 2
    """,
)
def q_position_attribution_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Position-based multi-touch attribution
    (operators.events.position_attribution): journeys delimited by
    purchases, touches classified first/middle/last/only, full
    converted revenue summed per (touch_type, role) in exact integer
    cents — the U-shaped-credit report without the order-dependent
    fractional sums (the 40/20/40 multiply is consumer-side)."""
    from small_etl_spark.operators.events import position_attribution

    ev = load_table(spark, sf_dir, "events")
    return position_attribution(ev)


@register(
    "nation_share_of_region",
    """
    WITH rev AS (
      SELECT n.n_name AS nation, r.r_name AS region,
             SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    )
    SELECT region, nation,
           CAST(cents AS DOUBLE) / 100.0 AS revenue,
           round(CAST(cents AS DOUBLE)
                 / CAST(SUM(cents) OVER (PARTITION BY region) AS DOUBLE),
                 6) AS share_of_region
    FROM rev
    """,
)
def q_nation_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent rollup: each nation's order revenue and its
    share within its region — the drill-down ratio every BI layer
    asks of a hierarchy. Star join (constant-size dims broadcast),
    exact integer-cents revenue, then ONE region-partitioned window
    over the 25-row aggregate (bounded by the dimension, not the
    facts) for the parent total."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.col("r_name").alias("region")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "cents"
            )
        )
    )
    w = Window.partitionBy("region")
    return rev.select(
        "region",
        "nation",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        F.round(
            F.col("cents").cast("double")
            / F.sum("cents").over(w).cast("double"),
            6,
        ).alias("share_of_region"),
    )


@register(
    "ivm_join_contract",
    """
    WITH bl AS (SELECT o_orderkey, o_custkey FROM orders
                WHERE o_orderkey % 10 <> 0),
    dl AS (SELECT o_orderkey, o_custkey FROM orders
           WHERE o_orderkey % 10 = 0),
    br AS (SELECT l_orderkey, l_extendedprice FROM lineitem
           WHERE l_linenumber % 3 <> 0),
    dr AS (SELECT l_orderkey, l_extendedprice FROM lineitem
           WHERE l_linenumber % 3 = 0),
    delta AS (
      SELECT dl.o_orderkey, dl.o_custkey, br.l_extendedprice
      FROM dl JOIN br ON dl.o_orderkey = br.l_orderkey
      UNION ALL
      SELECT bl.o_orderkey, bl.o_custkey, dr.l_extendedprice
      FROM bl JOIN dr ON bl.o_orderkey = dr.l_orderkey
      UNION ALL
      SELECT dl.o_orderkey, dl.o_custkey, dr.l_extendedprice
      FROM dl JOIN dr ON dl.o_orderkey = dr.l_orderkey
    ), incremental AS (
      SELECT o_orderkey, o_custkey, l_extendedprice
      FROM bl JOIN br ON bl.o_orderkey = br.l_orderkey
      UNION ALL SELECT * FROM delta
    ), full_join AS (
      SELECT o.o_orderkey, o.o_custkey, l.l_extendedprice
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), inc_agg AS (
      SELECT o_custkey % 100 AS cust_band, COUNT(*) AS n,
             SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
      FROM incremental GROUP BY 1
    ), full_agg AS (
      SELECT o_custkey % 100 AS cust_band, COUNT(*) AS n,
             SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
      FROM full_join GROUP BY 1
    )
    SELECT i.cust_band, CAST(i.n AS BIGINT) AS n_rows,
           CAST(i.cents AS DOUBLE) / 100.0 AS revenue,
           i.n = f.n AND i.cents = f.cents AS ivm_equal
    FROM inc_agg i JOIN full_agg f USING (cust_band)
    """,
)
def q_ivm_join_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-view-maintenance contract
    (operators.incremental.ivm_join_delta): orders/lineitem are each
    split into base + insert delta; the maintained view (base join ∪
    the three delta legs) must equal the full re-join, checked
    per-band with exact integer cents. The delta rule is what turns
    a nightly 100 TB re-join into a delta-sized increment; the
    driver value-hash covers every band's equality flag."""
    from small_etl_spark.operators.incremental import ivm_join_delta

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_extendedprice",
        "l_linenumber",
    )
    bl = o.filter(F.col("o_orderkey") % 10 != 0)
    dl = o.filter(F.col("o_orderkey") % 10 == 0)
    br = li.filter(F.col("l_linenumber") % 3 != 0).drop("l_linenumber")
    dr = li.filter(F.col("l_linenumber") % 3 == 0).drop("l_linenumber")

    incremental = bl.join(br, "o_orderkey").unionByName(
        ivm_join_delta(bl, dl, br, dr, on="o_orderkey")
    )
    full = o.join(li.drop("l_linenumber"), "o_orderkey")

    def agg(df):
        return df.groupBy((F.col("o_custkey") % 100).alias("cust_band")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
            ).alias("cents"),
        )

    i, f = agg(incremental), agg(full)
    return i.join(
        f.select(
            "cust_band",
            F.col("n").alias("f_n"),
            F.col("cents").alias("f_cents"),
        ),
        "cust_band",
    ).select(
        "cust_band",
        F.col("n").alias("n_rows"),
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        (
            (F.col("n") == F.col("f_n")) & (F.col("cents") == F.col("f_cents"))
        ).alias("ivm_equal"),
    )


@register(
    "neyman_allocation",
    """
    WITH s AS (
      SELECT c_mktsegment AS stratum,
             COUNT(*) AS nh,
             SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS s1,
             SUM(CAST(round(c_acctbal * 100) AS BIGINT)
                 * CAST(round(c_acctbal * 100) AS BIGINT)) AS s2
      FROM customer GROUP BY 1
    ), m AS (
      SELECT stratum, nh,
             sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / nh)
                  / nh) / 100.0 AS sd
      FROM s
    )
    SELECT stratum, CAST(nh AS BIGINT) AS stratum_size,
           round(sd, 6) AS stratum_sd,
           CAST(round(1000.0 * nh * sd
                      / SUM(nh * sd) OVER ()) AS BIGINT) AS alloc_n
    FROM m
    """,
)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified-sample allocation: for a budget of
    1000 samples over customer market segments, allocate
    ``n_h ∝ N_h·S_h`` (stratum size × stratum std-dev of account
    balance) — the survey-sampling formula that minimizes estimator
    variance, and the principled upgrade to the proportional
    allocation ``stratified_sample_docs`` uses. Moments from exact
    integer cents; one groupBy + one 5-row window."""
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    s = c.groupBy(F.col("c_mktsegment").alias("stratum")).agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum(cents).alias("s1"),
        F.sum(cents * cents).alias("s2"),
    )
    sd = (
        F.sqrt(
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1") / F.col("nh")
            )
            / F.col("nh")
        )
        / 100.0
    )
    m = s.select("stratum", "nh", sd.alias("sd"))
    w = Window.partitionBy()
    return m.select(
        "stratum",
        F.col("nh").alias("stratum_size"),
        F.round("sd", 6).alias("stratum_sd"),
        F.round(
            F.lit(1000.0)
            * F.col("nh")
            * F.col("sd")
            / F.sum(F.col("nh") * F.col("sd")).over(w)
        )
        .cast("bigint")
        .alias("alloc_n"),
    )


@register(
    "hll_setops_contract",
    """
    WITH c AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'click'),
    p AS (SELECT DISTINCT user_id FROM events
          WHERE event_type = 'purchase')
    SELECT CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS exact_clickers,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS exact_purchasers,
           CAST((SELECT COUNT(*) FROM c JOIN p USING (user_id)) AS BIGINT)
             AS exact_both,
           TRUE AS union_est_ok, TRUE AS intersect_est_ok
    """,
)
def q_hll_setops_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch set-operation contract: HLL can UNION (merge) but not
    intersect — the intersection estimate comes from
    inclusion–exclusion, ``|A∩B| ≈ |A| + |B| − |A∪B|`` over three
    approx_count_distinct sketches. The contract pins both the union
    estimate (within 5% of exact, rsd=0.01 sketches) and the derived
    intersection (within 15% — inclusion–exclusion compounds error,
    which is exactly the lesson). Exact counts are driver-hashed; the
    estimates live in the booleans."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    buys = ev.filter(F.col("event_type") == "purchase")
    both = clicks.select("user_id").intersect(buys.select("user_id"))
    stats = (
        ev.agg(
            F.countDistinct(
                F.when(F.col("event_type") == "click", F.col("user_id"))
            ).alias("exact_clickers"),
            F.countDistinct(
                F.when(F.col("event_type") == "purchase", F.col("user_id"))
            ).alias("exact_purchasers"),
            F.approx_count_distinct(
                F.when(F.col("event_type") == "click", F.col("user_id")),
                rsd=0.01,
            ).alias("a_c"),
            F.approx_count_distinct(
                F.when(F.col("event_type") == "purchase", F.col("user_id")),
                rsd=0.01,
            ).alias("a_p"),
            F.approx_count_distinct(
                F.when(
                    F.col("event_type").isin("click", "purchase"),
                    F.col("user_id"),
                ),
                rsd=0.01,
            ).alias("a_u"),
            F.countDistinct(
                F.when(
                    F.col("event_type").isin("click", "purchase"),
                    F.col("user_id"),
                )
            ).alias("e_u"),
        )
        .crossJoin(
            F.broadcast(both.agg(F.count(F.lit(1)).alias("exact_both")))
        )
    )
    inter_est = F.col("a_c") + F.col("a_p") - F.col("a_u")
    return stats.select(
        "exact_clickers",
        "exact_purchasers",
        "exact_both",
        (
            F.abs(F.col("a_u") - F.col("e_u")).cast("double")
            / F.greatest(F.col("e_u").cast("double"), F.lit(1.0))
            <= 0.05
        ).alias("union_est_ok"),
        (
            F.abs(inter_est - F.col("exact_both")).cast("double")
            / F.greatest(F.col("exact_both").cast("double"), F.lit(1.0))
            <= 0.15
        ).alias("intersect_est_ok"),
    )


@register(
    "cc_star_components",
    r"""
    WITH RECURSIVE t AS (
      SELECT source AS g, doc_id AS id,
             regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS toks
      FROM documents
    ), s AS (
      SELECT g, id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, greatest(len(toks)-2, 1)+1)]) AS sh
      FROM t
    ), pairs AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM s a JOIN s b ON a.g = b.g AND a.id < b.id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ), reach(node, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.label FROM edges e JOIN reach r ON e.src = r.node
    )
    SELECT node AS doc_id, min(label) AS component FROM reach GROUP BY node
    """,
)
def q_cc_star_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (operators.graph.cc_two_phase_star; Kiveris et al. 2014) over the
    same exact near-dup pair graph as ``near_dup_components`` — and
    the SAME recursive-CTE oracle, so the driver hash proves the two
    algorithms agree. The star variant is the 100 TB path: O(log²)
    rounds independent of component diameter, where min-label
    propagation pays diameter-many rounds (the 200-node-chain pytest
    pins that difference)."""
    from small_etl_spark.llm.dedup import ngram_jaccard_pairs
    from small_etl_spark.operators.graph import cc_two_phase_star

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, group_col="source", min_jaccard=0.8)
    cc = cc_two_phase_star(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    ).select(F.col("node").alias("doc_id"), "component")
    singles = docs.select("doc_id").join(cc, "doc_id", "left_anti").select(
        "doc_id", F.col("doc_id").alias("component")
    )
    return cc.unionByName(singles)


@register(
    "golden_record_customers",
    r"""
    WITH RECURSIVE pairs AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM customer a
      JOIN customer b
        ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 1
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ), reach(node, label) AS (
      SELECT c_custkey, c_custkey FROM customer
      UNION
      SELECT e.dst, r.label FROM edges e JOIN reach r ON e.src = r.node
    ), clusters AS (
      SELECT node AS c_custkey, min(label) AS cluster FROM reach GROUP BY node
    ), joined AS (
      SELECT cl.cluster, c.c_custkey, c.c_name, c.c_acctbal
      FROM clusters cl JOIN customer c USING (c_custkey)
    ), agg AS (
      SELECT cluster,
             CAST(COUNT(*) AS BIGINT) AS n_members,
             MIN(c_custkey) AS canonical_id,
             MAX(length(c_name)) AS maxlen,
             MAX(c_acctbal) AS best_acctbal
      FROM joined GROUP BY cluster
    )
    SELECT a.cluster, a.n_members, a.canonical_id,
           MAX(j.c_name) AS canonical_name,
           a.best_acctbal
    FROM agg a
    JOIN joined j
      ON j.cluster = a.cluster AND length(j.c_name) = a.maxlen
    GROUP BY 1, 2, 3, 5
    """,
)
def q_golden_record_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship — the last step of the entity-
    resolution story (blocking → scoring → EM → clustering →
    SURVIVORSHIP): fuzzy-duplicate customers (nation-blocked,
    Levenshtein ≤ 1) are closed into clusters via the star CC
    (operators.graph.cc_two_phase_star), then each cluster elects
    one record: min custkey as id, the longest (tie: lexicographic
    max) name, the max account balance. One pairs join + log²-round
    CC + two cluster aggregates; singletons survive as their own
    golden record."""
    from small_etl_spark.operators.dedup import fuzzy_dup_pairs
    from small_etl_spark.operators.graph import cc_two_phase_star

    c = load_table(spark, sf_dir, "customer")
    pairs = fuzzy_dup_pairs(
        c, id_col="c_custkey", text_col="c_name",
        block_cols=["c_nationkey"], max_distance=1,
    )
    cc = cc_two_phase_star(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    ).select(F.col("node").alias("c_custkey"), F.col("component").alias("cluster"))
    clusters = (
        c.select("c_custkey")
        .join(cc, "c_custkey", "left")
        .select(
            "c_custkey",
            F.coalesce("cluster", "c_custkey").alias("cluster"),
        )
    )
    joined = clusters.join(
        c.select("c_custkey", "c_name", "c_acctbal"), "c_custkey"
    )
    agg = joined.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("c_custkey").alias("canonical_id"),
        F.max(F.length("c_name")).alias("maxlen"),
        F.max("c_acctbal").alias("best_acctbal"),
    )
    return (
        agg.join(joined, "cluster")
        .filter(F.length("c_name") == F.col("maxlen"))
        .groupBy("cluster", "n_members", "canonical_id", "best_acctbal")
        .agg(F.max("c_name").alias("canonical_name"))
        .select(
            "cluster",
            "n_members",
            "canonical_id",
            "canonical_name",
            "best_acctbal",
        )
    )


@register(
    "diff_in_diff_events",
    """
    WITH mid AS (
      SELECT to_timestamp(CAST(floor((CAST(epoch(MIN(ts)) AS BIGINT)
                           + CAST(epoch(MAX(ts)) AS BIGINT)) / 2.0) AS BIGINT))
               AS m
      FROM events
    ), cell AS (
      SELECT user_id % 2 AS variant,
             CASE WHEN ts >= (SELECT m FROM mid) THEN 1 ELSE 0 END AS post,
             SUM(CAST(round(value * 100) AS BIGINT)) AS cents,
             COUNT(*) AS n
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT CAST(variant AS BIGINT) AS variant, CAST(post AS BIGINT) AS post,
           CAST(n AS BIGINT) AS n_purchases,
           round(CAST(cents AS DOUBLE) / n / 100.0, 6) AS mean_value,
           round(
             (SELECT CAST(c1.cents AS DOUBLE) / c1.n / 100.0
                     - CAST(c0.cents AS DOUBLE) / c0.n / 100.0
              FROM cell c1, cell c0
              WHERE c1.variant = 1 AND c1.post = 1
                AND c0.variant = 1 AND c0.post = 0)
             - (SELECT CAST(c1.cents AS DOUBLE) / c1.n / 100.0
                       - CAST(c0.cents AS DOUBLE) / c0.n / 100.0
                FROM cell c1, cell c0
                WHERE c1.variant = 0 AND c1.post = 1
                  AND c0.variant = 0 AND c0.post = 0), 6) AS did_estimate
    FROM cell
    """,
)
def q_diff_in_diff_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: mean purchase value per
    (variant = user parity, period = before/after the corpus
    midpoint), plus the DiD estimate
    ``(treat_post − treat_pre) − (ctrl_post − ctrl_pre)`` — the
    quasi-experimental causal readout when randomized exposure isn't
    available. Four cells from one exact-cents groupBy; the estimate
    is scalar arithmetic broadcast onto every row."""
    ev = load_table(spark, sf_dir, "events")
    mid = ev.agg(
        F.to_timestamp(
            F.floor(
                (F.min("ts").cast("long") + F.max("ts").cast("long")) / 2
            ).cast("long")
        ).alias("m")
    )
    cells = (
        ev.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(mid))
        .groupBy(
            (F.col("user_id") % 2).alias("variant"),
            (F.col("ts") >= F.col("m")).cast("bigint").alias("post"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "cents"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "variant",
            "post",
            "n",
            (F.col("cents").cast("double") / F.col("n") / 100.0).alias(
                "mv"
            ),
        )
    )
    wide = cells.groupBy().pivot("variant", [0, 1]).agg(
        F.sum(F.when(F.col("post") == 1, F.col("mv"))).alias("post_mv"),
        F.sum(F.when(F.col("post") == 0, F.col("mv"))).alias("pre_mv"),
    )
    did = wide.select(
        (
            (F.col("1_post_mv") - F.col("1_pre_mv"))
            - (F.col("0_post_mv") - F.col("0_pre_mv"))
        ).alias("did")
    )
    return (
        cells.crossJoin(F.broadcast(did))
        .select(
            "variant",
            "post",
            F.col("n").alias("n_purchases"),
            F.round("mv", 6).alias("mean_value"),
            F.round("did", 6).alias("did_estimate"),
        )
    )


@register(
    "rolling_corr_events",
    """
    WITH daily AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
      FROM events GROUP BY 1
    ), w AS (
      SELECT day, c, p,
             COUNT(*) OVER win AS n,
             SUM(c) OVER win AS sc, SUM(p) OVER win AS sp,
             SUM(c * c) OVER win AS scc, SUM(p * p) OVER win AS spp,
             SUM(c * p) OVER win AS scp
      FROM daily
      WINDOW win AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT day, CAST(c AS BIGINT) AS clicks, CAST(p AS BIGINT) AS purchases,
           CASE WHEN n = 14
                 AND (n * scc - sc * sc) > 0 AND (n * spp - sp * sp) > 0
                THEN round((n * scp - sc * sp)
                           / sqrt(CAST(n * scc - sc * sc AS DOUBLE))
                           / sqrt(CAST(n * spp - sp * sp AS DOUBLE)), 6)
           END AS corr14
    FROM w
    """,
)
def q_rolling_corr_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day rolling Pearson correlation between daily click and
    purchase counts — the co-movement monitor for leading-indicator
    health checks. All five moment sums are exact integers inside the
    row-bounded window (over the one-row-per-day aggregate, not the
    raw events); the correlation divides only at the end, NULL until
    the window is full or a side is constant."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum((F.col("event_type") == "click").cast("bigint")).alias("c"),
        F.sum((F.col("event_type") == "purchase").cast("bigint")).alias("p"),
    )
    win = Window.orderBy("day").rowsBetween(-13, 0)
    w = daily.select(
        "day",
        "c",
        "p",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("c").over(win).alias("sc"),
        F.sum("p").over(win).alias("sp"),
        F.sum(F.col("c") * F.col("c")).over(win).alias("scc"),
        F.sum(F.col("p") * F.col("p")).over(win).alias("spp"),
        F.sum(F.col("c") * F.col("p")).over(win).alias("scp"),
    )
    var_c = F.col("n") * F.col("scc") - F.col("sc") * F.col("sc")
    var_p = F.col("n") * F.col("spp") - F.col("sp") * F.col("sp")
    cov = F.col("n") * F.col("scp") - F.col("sc") * F.col("sp")
    return w.select(
        "day",
        F.col("c").alias("clicks"),
        F.col("p").alias("purchases"),
        F.when(
            (F.col("n") == 14) & (var_c > 0) & (var_p > 0),
            F.round(
                cov
                / F.sqrt(var_c.cast("double"))
                / F.sqrt(var_p.cast("double")),
                6,
            ),
        ).alias("corr14"),
    )


@register(
    "coalesce_intervals_events",
    """
    WITH iv AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT) + 900 AS e,
             event_id
      FROM events
    ), flagged AS (
      SELECT user_id, s, e, event_id,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -9223372036854775808)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ), islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY s, event_id
               ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    )
    SELECT user_id, CAST(island AS BIGINT) AS island,
           CAST(MIN(s) AS BIGINT) AS span_start,
           CAST(MAX(e) AS BIGINT) AS span_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM islands GROUP BY 1, 2
    """,
)
def q_coalesce_intervals_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing (gaps-and-islands): each event opens a
    15-minute activity interval; overlapping/touching intervals per
    user merge into one span. The classic running-max formulation —
    a row starts a new island iff its start exceeds the max end seen
    so far — followed by a running-sum island id; two per-user
    windows (parallel across users), no self-join, no explode. The
    downtime-merging / meeting-coalescing primitive."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").cast("long").alias("s"),
        (F.col("ts").cast("long") + 900).alias("e"),
        "event_id",
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        (
            F.col("s")
            > F.coalesce(
                F.max("e").over(w_prev), F.lit(-(1 << 63)).cast("long")
            )
        ).cast("bigint"),
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.withColumn(
        "island", F.sum("new_island").over(w_cum)
    )
    return islands.groupBy("user_id", "island").agg(
        F.min("s").alias("span_start"),
        F.max("e").alias("span_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "rrf_fusion_docs",
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
    ), bm AS (
      SELECT doc_id,
             SUM(CAST(round(term_score * 1000000) AS BIGINT)) / 1000000.0
               AS score
      FROM per_term GROUP BY doc_id
    ), bm_r AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
      FROM bm
    ), q AS (
      SELECT doc_id,
             (least(CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+'))
                         AS DOUBLE), 200.0) / 200.0
              + CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9_]+')) > 0
                      AND CAST(length(text) AS DOUBLE)
                          / CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+'))
                                 AS DOUBLE)
                          BETWEEN 3.0 AND 10.0
                     THEN 1.0 ELSE 0.0 END
              + CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9_]+')) > 0
                     THEN 1.0 ELSE 0.0 END
             ) / 3.0 AS quality
      FROM documents
    ), q_r AS (
      SELECT doc_id, row_number() OVER (ORDER BY quality DESC, doc_id) AS r
      FROM q
    ), fused AS (
      SELECT COALESCE(b.doc_id, qq.doc_id) AS doc_id,
             b.r AS bm25_rank, qq.r AS quality_rank,
             round(COALESCE(1.0 / (60 + b.r), 0.0)
                   + COALESCE(1.0 / (60 + qq.r), 0.0), 6) AS rrf
      FROM bm_r b FULL OUTER JOIN q_r qq USING (doc_id)
    )
    SELECT doc_id, bm25_rank, quality_rank, rrf
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 20
    """,
)
def q_rrf_fusion_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of two rankers —
    BM25 relevance for a 3-term query and the heuristic quality
    score: ``rrf = Σ 1/(60 + rank_i)``, the standard zero-tuning way
    to combine lexical and quality (or lexical and vector) rankings
    in a retrieval pipeline. Both rank columns come from
    operators.sort.global_ordinal (partition-parallel), fused with a
    full outer join; docs absent from a ranker simply contribute
    nothing from it."""
    from small_etl_spark.operators.sort import global_ordinal

    docs = load_table(spark, sf_dir, "documents")
    bm = textstats.bm25_scores(docs, ["spark", "window", "merge"]).select(
        "doc_id", (-F.col("score")).alias("neg")
    )
    bm_r = global_ordinal(bm, ["neg", "doc_id"], ordinal_col="r0").select(
        "doc_id", (F.col("r0") + 1).alias("bm25_rank")
    )
    q = docs.select(
        "doc_id",
        (-textstats.quality_score("text")).alias("neg"),
    )
    q_r = global_ordinal(q, ["neg", "doc_id"], ordinal_col="r0").select(
        "doc_id", (F.col("r0") + 1).alias("quality_rank")
    )
    fused = bm_r.join(q_r, "doc_id", "full_outer").select(
        "doc_id",
        "bm25_rank",
        "quality_rank",
        F.round(
            F.coalesce(1.0 / (60 + F.col("bm25_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("quality_rank")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(20)


@register(
    "topn_plus_other_nations",
    """
    WITH rev AS (
      SELECT n.n_name AS nation,
             SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    ), ranked AS (
      SELECT nation, cents,
             row_number() OVER (ORDER BY cents DESC, nation) AS r
      FROM rev
    )
    SELECT CASE WHEN r <= 5 THEN nation ELSE 'OTHER' END AS nation,
           CAST(SUM(cents) AS DOUBLE) / 100.0 AS revenue,
           CAST(MIN(r) AS BIGINT) AS rank
    FROM ranked
    GROUP BY 1
    """,
)
def q_topn_plus_other_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 nations by order revenue with everything else rolled
    into one OTHER row (rank = 6, the min rank inside the bucket) —
    the chart-ready breakdown every BI surface asks for. The rank
    window runs over the 25-row nation aggregate (dimension-bounded),
    revenue in exact integer cents; the OTHER rollup is a second
    bounded aggregate, not a second scan of the facts."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "cents"
            )
        )
    )
    w = Window.orderBy(F.col("cents").desc(), "nation")
    ranked = rev.withColumn("r", F.row_number().over(w))
    return (
        ranked.withColumn(
            "nation",
            F.when(F.col("r") <= 5, F.col("nation")).otherwise("OTHER"),
        )
        .groupBy("nation")
        .agg(
            (F.sum("cents").cast("double") / 100.0).alias("revenue"),
            F.min("r").alias("rank"),
        )
    )


@register(
    "sprt_conversion_monitor",
    """
    WITH daily AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             SUM(CASE WHEN user_id % 2 = 1
                       AND event_type = 'purchase' THEN 1 ELSE 0 END) AS t_c,
             SUM(CASE WHEN user_id % 2 = 1
                       AND event_type = 'view' THEN 1 ELSE 0 END) AS t_n,
             SUM(CASE WHEN user_id % 2 = 0
                       AND event_type = 'purchase' THEN 1 ELSE 0 END) AS c_c,
             SUM(CASE WHEN user_id % 2 = 0
                       AND event_type = 'view' THEN 1 ELSE 0 END) AS c_n
      FROM events GROUP BY 1
    ), llr AS (
      SELECT day, t_c, t_n,
             round(SUM(CAST(t_c AS DOUBLE) * ln(1.2)
                       + CAST(t_n - t_c AS DOUBLE)
                         * ln((1.0 - 0.12) / (1.0 - 0.10))) OVER w, 6)
               AS cum_llr
      FROM daily
      WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
    )
    SELECT day, CAST(t_c AS BIGINT) AS treat_conv,
           CAST(t_n AS BIGINT) AS treat_views,
           cum_llr,
           CASE WHEN cum_llr >= round(ln(19.0), 6) THEN 'accept_h1'
                WHEN cum_llr <= round(ln(1.0 / 19.0), 6) THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM llr
    """,
)
def q_sprt_conversion_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential probability-ratio test (Wald) monitor: the
    treatment arm's cumulative log-likelihood ratio for H1 "view→
    purchase conversion = 12%" vs H0 "10%", with the ±ln(19)
    boundaries (α=β=0.05) — the always-valid peeking rule
    experimentation platforms use instead of fixed-horizon tests.
    Daily integer counts feed a calendar-bounded running sum; every
    ln() term multiplies an exact integer, so 6dp rounding is stable
    across engines."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(
            (
                (F.col("user_id") % 2 == 1)
                & (F.col("event_type") == "purchase")
            ).cast("bigint")
        ).alias("t_c"),
        F.sum(
            (
                (F.col("user_id") % 2 == 1) & (F.col("event_type") == "view")
            ).cast("bigint")
        ).alias("t_n"),
    )
    import math

    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    llr_term = F.col("t_c").cast("double") * F.lit(math.log(1.2)) + (
        F.col("t_n") - F.col("t_c")
    ).cast("double") * F.log(F.lit((1.0 - 0.12) / (1.0 - 0.10)))
    out = daily.withColumn("cum_llr", F.round(F.sum(llr_term).over(w), 6))
    hi, lo = F.round(F.log(F.lit(19.0)), 6), F.round(
        F.log(F.lit(1.0 / 19.0)), 6
    )
    return out.select(
        "day",
        F.col("t_c").alias("treat_conv"),
        F.col("t_n").alias("treat_views"),
        "cum_llr",
        F.when(F.col("cum_llr") >= hi, "accept_h1")
        .when(F.col("cum_llr") <= lo, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    )


@register(
    "hour_of_week_profile",
    """
    SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                AS BIGINT) AS dow,
           CAST(strftime(ts, '%H') AS BIGINT) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases
    FROM events GROUP BY 1, 2
    """,
)
def q_hour_of_week_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week activity heatmap (dow × hour event and purchase
    counts) — the load-shaping profile behind capacity planning and
    anomaly baselines. Weekday from epoch-day arithmetic (engine-
    proof, not locale dayofweek), hour from the UTC-pinned session
    formatter; one map-combined groupBy to a 7×24-bounded result."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.pmod(
                F.datediff(
                    F.to_date("ts"), F.to_date(F.lit("1970-01-01"))
                ),
                7,
            )
            .cast("bigint")
            .alias("dow"),
            F.date_format("ts", "HH").cast("bigint").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                (F.col("event_type") == "purchase").cast("bigint")
            ).alias("n_purchases"),
        )
    )


@register(
    "basket_size_distribution",
    """
    WITH b AS (
      SELECT l_orderkey, COUNT(*) AS basket
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(basket AS BIGINT) AS basket_size,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM b GROUP BY 1
    """,
)
def q_basket_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size histogram: line items per order, then order counts
    per basket size — the two-level count-of-counts aggregation
    (same shape as degree distributions and dup-cluster histograms).
    Both groupBys map-combine; the result is bounded by the max
    basket size."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("basket"))
    return b.groupBy(F.col("basket").alias("basket_size")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "log2_value_histogram",
    """
    WITH c AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' AND value > 0
    )
    SELECT CAST(length(printf('%b', cents)) - 1 AS BIGINT) AS log2_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents
    FROM c GROUP BY 1
    """,
)
def q_log2_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two histogram of purchase values: bucket =
    floor(log2(cents)) computed as BIT LENGTH − 1 of the exact
    integer cents — integer arithmetic, immune to the
    floating-log-at-boundary ulp problem (same reasoning as the
    Benford audit's textual digit). The log-scale histogram is the
    right shape for long-tailed money/size distributions where
    equi-width buckets put 99% of mass in one bin."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    c = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 0)
    ).select(cents.alias("cents"))
    # bit_length(cents) - 1 == floor(log2(cents)) for positive ints
    bucket = (F.length(F.expr("bin(cents)")) - F.lit(1)).cast("bigint")
    return (
        c.select("cents", bucket.alias("log2_bucket"))
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )


@register(
    "supplier_hhi_by_part",
    """
    WITH s AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem GROUP BY 1, 2
    ), t AS (
      SELECT l_partkey, SUM(cents) AS tot, COUNT(*) AS n_suppliers
      FROM s GROUP BY 1
    ), hhi AS (
      SELECT s.l_partkey, t.n_suppliers,
             SUM(pow(CAST(s.cents AS DOUBLE) / t.tot, 2)) * 10000.0 AS h
      FROM s JOIN t USING (l_partkey)
      GROUP BY 1, 2
    )
    SELECT CAST(CASE WHEN h < 1500 THEN 0
                     WHEN h < 2500 THEN 1 ELSE 2 END AS BIGINT) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(MIN(n_suppliers) AS BIGINT) AS min_suppliers,
           CAST(MAX(n_suppliers) AS BIGINT) AS max_suppliers
    FROM hhi GROUP BY 1
    """,
)
def q_supplier_hhi_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-concentration audit: Herfindahl–Hirschman index of
    supplier revenue share per part, bucketed into the DOJ bands
    (<1500 competitive, 1500–2500 moderate, >2500 concentrated) —
    the single-source-risk screen over a supply graph. Shares from
    exact integer cents; the share-square sum runs over the
    bounded suppliers-per-part group, and only the 3-band rollup
    leaves the executor."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
        ).alias("cents")
    )
    t = s.groupBy("l_partkey").agg(
        F.sum("cents").alias("tot"), F.count(F.lit(1)).alias("n_suppliers")
    )
    hhi = (
        s.join(t, "l_partkey")
        .groupBy("l_partkey", "n_suppliers")
        .agg(
            (
                F.sum(
                    F.pow(F.col("cents").cast("double") / F.col("tot"), 2)
                )
                * 10000.0
            ).alias("h")
        )
    )
    band = (
        F.when(F.col("h") < 1500, 0)
        .when(F.col("h") < 2500, 1)
        .otherwise(2)
        .cast("bigint")
    )
    return hhi.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("n_suppliers").alias("min_suppliers"),
        F.max("n_suppliers").alias("max_suppliers"),
    )


@register(
    "clv_deciles",
    """
    WITH clv AS (
      SELECT o_custkey,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ), tiled AS (
      SELECT o_custkey, cents, n_orders,
             ntile(10) OVER (ORDER BY cents, o_custkey) AS decile
      FROM clv
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS DOUBLE) / 100.0 AS revenue,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders
    FROM tiled GROUP BY 1
    """,
)
def q_clv_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value deciles: per-customer order revenue
    (exact cents) tiled into 10 equal-count bands via
    operators.sort.ntile_by — partition-parallel exact NTILE, no
    single-task window even though customers scale with the corpus —
    then per-decile revenue and order totals: the 'top decile = X%
    of revenue' concentration table."""
    from small_etl_spark.operators.sort import ntile_by

    o = load_table(spark, sf_dir, "orders")
    clv = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "cents"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )
    tiled = ntile_by(clv, ["cents", "o_custkey"], 10, tile_col="decile")
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum("cents").cast("double") / 100.0).alias("revenue"),
        F.sum("n_orders").alias("n_orders"),
    )


@register(
    "part_revenue_pareto",
    """
    WITH rev AS (
      SELECT l_partkey,
             SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem GROUP BY 1
    ), ranked AS (
      SELECT l_partkey, cents,
             row_number() OVER (ORDER BY cents DESC, l_partkey) - 1 AS i,
             SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                              ROWS UNBOUNDED PRECEDING) AS cum,
             COUNT(*) OVER () AS n, SUM(cents) OVER () AS tot
      FROM rev
    )
    SELECT CAST(floor(10.0 * i / n) AS BIGINT) AS part_decile,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           round(CAST(MAX(cum) AS DOUBLE) / CAST(MAX(tot) AS DOUBLE), 6)
             AS cum_revenue_share
    FROM ranked GROUP BY 1
    """,
)
def q_part_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration curve: parts ranked by revenue, the
    cumulative revenue share at each decile of the part catalog —
    the 80/20 readout ("the top 10% of parts carry X% of revenue").
    Rank AND running total both come from the partition-parallel
    primitives (global_ordinal + global_cumsum over (−revenue,
    partkey)) — no single-task window even at catalog scale; the
    only bounded output is the 10-row decile rollup."""
    from small_etl_spark.operators.sort import global_cumsum, global_ordinal

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
        ).alias("cents")
    ).withColumn("neg", -F.col("cents"))
    ranked = global_ordinal(rev, ["neg", "l_partkey"], ordinal_col="i")
    cum = global_cumsum(
        ranked, ["neg", "l_partkey"], "cents", cumsum_col="cum"
    )
    totals = rev.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("tot")
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .groupBy(
            F.floor(F.lit(10.0) * F.col("i") / F.col("n"))
            .cast("bigint")
            .alias("part_decile")
        )
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(
                F.max("cum").cast("double") / F.max("tot").cast("double"), 6
            ).alias("cum_revenue_share"),
        )
    )


@register(
    "quantile_sketch_contract",
    """
    SELECT l_returnflag, q, TRUE AS rank_ok
    FROM (SELECT DISTINCT l_returnflag FROM lineitem),
         (SELECT CAST(0.25 AS DOUBLE) AS q UNION ALL SELECT 0.5 UNION ALL SELECT 0.75)
    ORDER BY l_returnflag, q
    """,
)
def q_quantile_sketch_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mergeable-quantile-sketch error contract
    (operators/sketches.py::approx_quantile_rank_error): GK
    approx_percentile(accuracy=1000) per return flag over
    l_extendedprice, each returned value's EXACT rank recomputed with
    one conditional-sum scan, asserted within 5/accuracy of the
    target quantile. The one-pass mergeable sketch is the only way to
    do percentiles at 100 TB (no sort, O(accuracy) executor memory);
    this contract MEASURES its bound instead of trusting it."""
    from small_etl_spark.operators.sketches import (
        approx_quantile_rank_error,
    )

    li = load_table(spark, sf_dir, "lineitem")
    out = approx_quantile_rank_error(
        li, "l_returnflag", "l_extendedprice", accuracy=1000
    )
    return out.select(
        "l_returnflag",
        "q",
        (F.col("rank_err") <= 0.005).alias("rank_ok"),
    ).orderBy("l_returnflag", "q")


@register(
    "ivfpq_recall_contract",
    """
    SELECT CAST(8 AS BIGINT) AS n_queries, TRUE AS recall_ok,
           TRUE AS probe_bounded
    """,
)
def q_ivfpq_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality contract for the IVF-PQ composite
    (llm/similarity.py::ivfpq_topk — Jégou et al. 2011 / the FAISS
    IVFPQ recipe: L2 coarse cells + PQ-encoded RESIDUALS, probed by
    per-cell asymmetric distance; m=16 subspaces x 32 centroids,
    nprobe=8/16): recall@10 against the exact L2 top-10 over the same
    8 queries must clear 0.15 (measured 0.41 at sf0.01, 0.25 at
    sf0.1 — this synthetic corpus is near-uniform 64-dim noise, the
    worst case for any quantizer: pairwise distances concentrate, so
    quantization error rivals the signal; real embedding manifolds
    sit far from this floor), and every returned candidate must come
    from a probed cell (probe_bounded — the scan really is
    nprobe/num_cells of the corpus). Hash-deterministic end to end →
    a stable driver row; the flat-IVF and raw-PQ halves carry their
    own value-exact oracles (ivf_ann_topk, pq_ann_topk)."""
    from pyspark.sql import Window

    from small_etl_spark.llm.similarity import (
        _sq_l2,
        ivf_assign,
        ivfpq_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    ann = ivfpq_topk(
        emb, q, k=10, num_cells=16, nprobe=8, m=16, pq_centroids=32
    ).select("query_id", "vec_id")
    a = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    b = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("cv")
    )
    d = (
        a.crossJoin(b)
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("d", _sq_l2(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d").asc(), F.col("vec_id").asc()
    )
    bf = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("query_id", "vec_id")
    )
    marked = bf.join(
        ann.withColumn("__hit__", F.lit(1)), ["query_id", "vec_id"], "left"
    )
    # probe-bounded: every ANN candidate's cell is within the probed
    # set of its query (assignments + probes re-derived independently,
    # with the same L2 routing the composite uses)
    assigned, cents = ivf_assign(emb, num_centroids=16, metric="l2")
    pw = Window.partitionBy("query_id").orderBy(
        F.col("__pd__").asc(), F.col("cell").asc()
    )
    probed = (
        a.crossJoin(F.broadcast(cents))
        .withColumn("__pd__", _sq_l2(F.col("qv"), F.col("__cent__")))
        .withColumn("__pr__", F.row_number().over(pw))
        .filter(F.col("__pr__") <= 8)
        .select("query_id", "cell")
    )
    outside = (
        ann.join(assigned.select("vec_id", "cell"), "vec_id")
        .join(probed, ["query_id", "cell"], "left_anti")
    )
    n_outside = outside.count()
    return marked.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.sum(F.coalesce(F.col("__hit__"), F.lit(0))).alias("__hits__"),
    ).select(
        "n_queries",
        (
            F.col("__hits__").cast("double")
            / (F.lit(10.0) * F.col("n_queries"))
            > 0.15
        ).alias("recall_ok"),
        F.lit(n_outside == 0).alias("probe_bounded"),
    )
