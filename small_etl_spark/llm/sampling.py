"""Deterministic hash-based sampling and train/val splitting.

Training-data pipelines need splits that are (a) reproducible across
runs, engines, and cluster sizes, (b) stable under re-partitioning and
incremental appends — a doc keeps its split when the corpus grows —
and (c) free of coordination (no global sort, no RNG state). Seeded
``df.sample``/``sampleBy`` give none of these: their output depends on
partitioning and engine RNG internals.

The standard answer is content hashing: bucket = the first 16 bits of
``md5(salt | id)``; a row is sampled/assigned-val when its bucket falls
below ``fraction × 2^16``. Pure map-side column expressions — no
shuffle, no state — and md5 is md5 everywhere, so the same predicate
is oracle-exact in DuckDB. Changing ``salt`` draws an independent
split (e.g. one salt for val carve-out, another for subsampling).

No reference equivalent (the reference has no sampling); BASELINE.json
north-star extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

BUCKETS = 1 << 16  # 4 hex chars of md5 → 16-bit bucket


def _hex_threshold(fraction: float) -> str:
    """fraction ∈ [0,1] → 4-hex-digit bucket threshold."""
    return format(min(max(round(fraction * BUCKETS), 0), BUCKETS), "04x")


def hash_bucket(col: Column | str, salt: str) -> Column:
    """First 4 md5-hex chars of ``salt|value`` — compares
    lexicographically against :func:`_hex_threshold` output."""
    c = F.col(col) if isinstance(col, str) else col
    keyed = F.concat_ws("|", F.lit(salt), c.cast("string"))
    return F.substring(F.md5(keyed.cast("binary")), 1, 4)


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_fraction: float = 0.1,
    salt: str = "split-v1",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val assignment: ``split_col`` ∈
    {'train','val'} with ~``val_fraction`` of rows in 'val'."""
    thresh = _hex_threshold(val_fraction)
    return df.withColumn(
        split_col,
        F.when(hash_bucket(id_col, salt) < F.lit(thresh), F.lit("val")).otherwise(
            F.lit("train")
        ),
    )


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic stratified sampling: keep ~``fractions[s]`` of
    each stratum ``s`` (strata absent from the dict are dropped).

    The 100 TB use case: rebalancing a training corpus (downsample the
    dominant language/domain, keep the tail) with stable membership —
    a pure filter, so Catalyst pushes it into the scan pipeline and
    no shuffle ever happens.
    """
    thresh = F.lit("0000")  # default: drop unknown strata
    for stratum, frac in fractions.items():
        thresh = F.when(
            F.col(strata_col) == stratum, F.lit(_hex_threshold(frac))
        ).otherwise(thresh)
    return df.filter(hash_bucket(id_col, salt) < thresh)


def hash_topk_per_group(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "reservoir-v1",
) -> DataFrame:
    """Deterministic k-per-stratum sample — the distributed,
    re-runnable replacement for reservoir sampling: rank rows within
    each stratum by a salted md5 of their id and keep the k smallest.

    Unlike a sequential reservoir (order-dependent, single-pass
    state) or seeded ``df.sample`` (partition-layout-dependent),
    membership is a pure function of (id, salt, k): stable across
    runs, partitionings, and engines — the DuckDB oracle reproduces
    it exactly. One shuffle (the per-stratum window); for a
    pathological giant stratum, pre-filter with
    :func:`hash_bucket` < a generous threshold first so the window
    input is ~k·fudge rows per stratum, the same two-phase trick as
    ``operators/sort.top_k``.
    """
    from pyspark.sql import Window

    rank_key = F.md5(
        F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")).cast("binary")
    )
    w = Window.partitionBy(strata_col).orderBy(rank_key, F.col(id_col))
    return (
        df.withColumn("__rk__", F.row_number().over(w))
        .filter(F.col("__rk__") <= k)
        .drop("__rk__")
    )


def weighted_hash_sample(
    df: DataFrame,
    weight_col: Column | str,
    scale: float,
    id_col: str = "doc_id",
    salt: str = "weighted-v1",
) -> DataFrame:
    """Deterministic weighted Bernoulli sampling: row ``i`` is kept
    with probability ``min(1, scale · wᵢ)`` — the quality-upweighting
    primitive (keep high-quality documents at a higher rate) — but
    membership is a pure function of (id, salt), so reruns, engines,
    and partitionings agree exactly.

    Mechanics: the row's 16-bit md5 bucket (uniform on [0, 2¹⁶)) is
    compared against its own weight-scaled threshold; like
    stratified_hash_sample this is a pushed-down filter — no shuffle,
    no RNG state.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    thresh = F.least(
        F.lit(float(BUCKETS)), w.cast("double") * F.lit(scale) * BUCKETS
    )
    bucket = F.conv(hash_bucket(id_col, salt), 16, 10).cast("double")
    return df.filter(bucket < thresh)


def token_budget_resample(
    df: DataFrame,
    strata_cols: list[str],
    token_count_col: Column,
    target_shares: dict[tuple, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "mixture-v1",
) -> DataFrame:
    """Rebalance a corpus toward a target token mixture (the
    DoReMi-style reweighting step): each stratum is down-sampled so its
    surviving token budget approaches ``target_share × total_tokens``.

    ``target_shares`` maps stratum key tuples to shares; omitted (or
    None) means a UNIFORM target over observed strata. A stratum
    already below its target keeps everything (rate capped at 1) — this
    operator only down-samples; upweighting is epoch repetition at
    training time, not row duplication here.

    Mechanics: one groupBy over the corpus for per-stratum token
    totals (tiny result), rates derived on that aggregate, broadcast
    back, then the usual deterministic md5-bucket Bernoulli filter —
    the whole pass adds ONE small shuffle and the final filter is a
    map-side predicate, so it scales like a scan. Membership is a pure
    function of (id, salt): appends and reruns agree.

    Returns the surviving rows plus ``keep_rate`` (the stratum's
    applied rate).
    """
    from pyspark.sql import Window

    tok = df.withColumn("__tok__", token_count_col.cast("bigint"))
    cells = tok.groupBy(*strata_cols).agg(F.sum("__tok__").alias("__cell_tok__"))
    total_w = Window.partitionBy()
    if target_shares is None:
        n_cells = Window.partitionBy()
        share = F.lit(1.0) / F.count(F.lit(1)).over(n_cells).cast("double")
    else:
        share = None
        for key, s in target_shares.items():
            cond = F.lit(True)
            for c, v in zip(strata_cols, key):
                cond = cond & (F.col(c) == F.lit(v))
            share = F.when(cond, F.lit(float(s))) if share is None else share.when(
                cond, F.lit(float(s))
            )
        share = share.otherwise(F.lit(0.0))
    rates = cells.select(
        *strata_cols,
        F.least(
            F.lit(1.0),
            (F.sum("__cell_tok__").over(total_w).cast("double") * share)
            / F.col("__cell_tok__").cast("double"),
        ).alias("keep_rate"),
    )
    bucket = F.conv(hash_bucket(id_col, salt), 16, 10).cast("double")
    return (
        tok.join(F.broadcast(rates), strata_cols)
        .filter(bucket < F.col("keep_rate") * BUCKETS)
        .drop("__tok__")
    )


def global_shuffle_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "shuffle-v1",
) -> DataFrame:
    """Deterministic global training-order shuffle + round-robin shard
    striping: the canonical "shuffle the corpus once, write N shard
    files, stream them in order" step every pretraining pipeline runs
    before tokenization.

    Order key = ``md5(salt|id)`` — a content-defined permutation that
    is reproducible across runs, engines, and cluster sizes (changing
    ``salt`` draws an independent epoch order). Rows are striped
    round-robin over shards by their global shuffled ordinal, so shard
    sizes differ by at most 1 and every shard is itself a uniform
    sample of the corpus (any prefix of training sees an unbiased
    mix — the property curriculum loaders rely on).

    Returns ``(id, ordinal, shard, position)``: ``ordinal`` is the
    global 0-based shuffled rank, ``shard = ordinal % n_shards``,
    ``position = ordinal // n_shards`` (the row's offset inside its
    shard file).

    Scale: the global rank uses :func:`~small_etl_spark.operators.
    sort.global_ordinal` — range-exchange on the hash key + per-
    partition rank + driver-side prefix-summed offsets — NOT a
    single-partition ``row_number() OVER (ORDER BY …)``; shard/
    position derive map-side from the ordinal. One range shuffle
    total, balanced by sampled split points on an (uniform) md5 key.
    """
    from small_etl_spark.operators.sort import global_ordinal

    ord_hex = F.md5(
        F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")).cast("binary")
    )
    keyed = df.select(F.col(id_col), ord_hex.alias("__ord__"))
    ranked = global_ordinal(keyed, ["__ord__", id_col], ordinal_col="ordinal")
    return ranked.select(
        id_col,
        "ordinal",
        (F.col("ordinal") % n_shards).cast("int").alias("shard"),
        F.floor(F.col("ordinal") / n_shards).cast("bigint").alias("position"),
    )


def temperature_weights(
    df: DataFrame,
    strata_cols: list[str],
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-based mixture weights (the mT5/XLM-R α-sampling
    rule): stratum i gets sampling weight w_i = n_i^α / Σ_j n_j^α.
    α=1 preserves the natural distribution; α→0 approaches uniform;
    0.3 is the multilingual-pretraining default that up-weights
    low-resource strata without flattening the mix entirely.

    Returns one row per stratum: ``(*strata_cols, n_docs, weight,
    boost)`` where ``boost`` = weight / natural share (>1 means the
    stratum is over-sampled relative to raw frequency).

    Scale shape: ONE count aggregation over the corpus (strata
    cardinality is tiny — sources × languages), then window sums over
    the stratum table itself. The corpus is scanned once; everything
    downstream is metadata-sized.
    """
    counts = df.groupBy(*strata_cols).agg(F.count(F.lit(1)).alias("n_docs"))
    w_all = Window.partitionBy()
    powered = F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
    weight = powered / F.sum(powered).over(w_all)
    natural = F.col("n_docs").cast("double") / F.sum(
        F.col("n_docs").cast("double")
    ).over(w_all)
    return counts.select(
        *strata_cols,
        "n_docs",
        F.round(weight, 6).alias("weight"),
        F.round(weight / natural, 6).alias("boost"),
    )


def dsir_logratio_weights(
    df: DataFrame,
    target_filter: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by the log-likelihood ratio of two hashed-unigram bag
    models — one fit on an in-engine *target* subcorpus (rows
    matching ``target_filter``), one on the full *source* corpus.
    High scores = documents that look like the target distribution;
    feed the weights to :func:`weighted_hash_sample` (or a plain
    top-N cut) for the resampling step.

    Features are the hashing-trick buckets (portable md5, house
    idiom — no vocabulary build, fixed ``buckets``-wide model
    regardless of corpus size). Both LMs are add-one smoothed over
    the bucket space; weight(doc) = mean over its feature
    occurrences of ``ln p_target(b) - ln p_source(b)``.

    Scale shape: one explode + two bucket-count aggregations (model
    tables are ``buckets`` rows — broadcast), then one scoring join
    per doc feature + per-doc avg. Identical skeleton to
    ``textstats.unigram_logprob`` but with a bounded feature space,
    which is the point of DSIR: the model stays ``O(buckets)`` at
    100 TB, and fitting is a single map-side-combined pass.

    Returns ``(id_col, n_feats, logratio)``; docs with no tokens are
    dropped (no features → no evidence).
    """
    from small_etl_spark.llm.textstats import tokens

    feats = df.select(
        F.col(id_col),
        target_filter.alias("__is_target__"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    ).select(
        id_col,
        "__is_target__",
        F.pmod(
            F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 4), 16, 10)
            .cast("bigint"),
            F.lit(buckets),
        ).alias("b"),
    )
    source_lm = feats.groupBy("b").agg(F.count(F.lit(1)).alias("s_cnt"))
    target_lm = (
        feats.filter(F.col("__is_target__"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("t_cnt"))
    )
    model = (
        source_lm.join(target_lm, "b", "left")
        .na.fill({"t_cnt": 0})
        .crossJoin(
            F.broadcast(
                feats.agg(
                    F.count(F.lit(1)).alias("s_n"),
                    F.sum(F.col("__is_target__").cast("bigint")).alias("t_n"),
                )
            )
        )
        .select(
            "b",
            (
                F.log((F.col("t_cnt") + 1).cast("double")
                      / (F.col("t_n") + buckets).cast("double"))
                - F.log((F.col("s_cnt") + 1).cast("double")
                        / (F.col("s_n") + buckets).cast("double"))
            ).alias("lr"),
        )
    )
    return (
        feats.join(F.broadcast(model), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.avg("lr").alias("logratio"),
        )
    )


def domain_token_budget_cap(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    budget_tokens: int = 1000,
    salt: str = "domain-cap-v1",
) -> DataFrame:
    """Per-domain token-budget admission (the CommonCrawl-style "no
    domain may contribute more than B tokens" cap that stops a single
    hot site from dominating the mix): within each ``group_col``
    (registrable domain — see functions/text.py::registrable_domain),
    documents are ordered by a deterministic salted hash of their id
    (crawl-order- and partitioning-independent, re-runs admit the
    same set) and admitted while the EXCLUSIVE running token total is
    still under ``budget_tokens`` — so the first document of a domain
    is always admitted, and the document that crosses the budget is
    the last one in.

    Output: the admitted rows of ``df`` plus ``n_tokens`` and
    ``tokens_before`` (the exclusive prefix sum — keep it: it is the
    audit column that explains every admission decision).

    Scale shape: one hash shuffle partitioned BY DOMAIN and a
    running-sum window WITHIN each domain — group-bounded state, no
    global sort, no driver round-trip. A pathological mega-domain is
    exactly the case the cap neuters: its window is long but its
    output is cut at the budget, and AQE skew handling splits the
    oversized partition upstream. Compare token_budget_resample
    (GLOBAL budget via the pinned-range prefix-sum scaffold) — this
    is its per-group sibling, where a plain window is the right tool
    because groups, unlike the corpus, are bounded.
    """
    from small_etl_spark.llm.textstats import token_count

    w = (
        Window.partitionBy(group_col)
        .orderBy(hash_bucket(id_col, salt), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn("n_tokens", token_count(text_col).cast("bigint"))
        .withColumn(
            "tokens_before",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint"),
        )
        .filter(F.col("tokens_before") < F.lit(budget_tokens))
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    val_fraction: float = 0.1,
    salt: str = "split-v1",
    split_col: str = "split",
) -> DataFrame:
    """Near-dup-aware train/val split: assign whole near-duplicate
    COMPONENTS to a side, never individual documents. A plain
    :func:`hash_split` puts ~2·p·(1-p) of each near-dup pair across
    the boundary — val examples whose near-copies sit in train, the
    classic eval-contamination leak (the reason Lee et al. 2022 and
    the GPT-3 paper dedup across, not just within, splits). Here every
    doc is labeled with its connected component over ``pairs``
    (llm/dedup.py::connected_components — singletons label
    themselves), and the salted hash that decides the side reads the
    COMPONENT id, so a chain A~B~C moves as one unit by construction.

    Returns ``docs`` + ``component`` + ``split_col`` ∈ {'train','val'}.

    Scale shape: the component labeling is the O(log n)-round
    min-propagation already benched under ``cc_star_components``; the
    split itself is a pure map over the labeled rows. ``pairs`` comes
    from any dedup family in this package (exact n-gram, MinHash-LSH,
    SimHash, embedding cosine) — pass the pairs you already computed
    for dedup; nothing is recomputed here.
    """
    from small_etl_spark.llm.dedup import connected_components

    comps = connected_components(docs, pairs, id_col=id_col)
    thresh = _hex_threshold(val_fraction)
    return docs.join(comps, id_col).withColumn(
        split_col,
        F.when(
            hash_bucket("component", salt) < F.lit(thresh), F.lit("val")
        ).otherwise(F.lit("train")),
    )
