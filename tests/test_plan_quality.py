"""Physical-plan regression tests: the scale properties the engine
relies on, asserted from explain output so refactors can't silently
lose them (SURVEY §4)."""

from __future__ import annotations

import pytest

from small_etl_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].builder(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def final_plan_of(spark, name: str) -> str:
    """Execute the query, then read the AQE-final physical plan.

    The star-join queries carry no broadcast hints (they'd OOM at the
    100 TB design point), so the broadcast decision is made by
    Catalyst size stats / AQE at runtime — visible only in the final
    adaptive plan, after an action has run."""
    df = REGISTRY[name].builder(spark, SF_DIR)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "threshold_filter")
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,20.0)" in plan


def test_column_pruning(spark):
    plan = plan_of(spark, "rename_project")
    # only the 4 projected columns reach the scan
    assert "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint," in plan
    assert "l_returnflag" not in plan


def test_broadcast_joins_in_star_queries(spark):
    """At this SF every join side is small, so the stats/AQE-chosen
    plan must be all-broadcast with zero sort-merge joins — WITHOUT
    any F.broadcast hint on the SF-proportional tables (orders,
    customer, supplier, semi sets), which must stay hint-free so the
    same code shuffle-joins at the 100 TB design point."""
    for name in ("merge_with_previous", "q3_shipping_priority",
                 "q5_local_supplier_volume"):
        plan = final_plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_star_queries_carry_no_broadcast_hint_on_fact_sized_tables():
    """Regression: q3/q5/q18 must not force-broadcast SF-proportional
    sides (VERDICT r1 'What's wrong' #2). Source-level check so a
    reintroduced hint fails even if AQE would mask it at test SF."""
    import inspect

    for fn in (REGISTRY["q3_shipping_priority"].builder,
               REGISTRY["q5_local_supplier_volume"].builder,
               REGISTRY["q18_large_orders"].builder):
        src = inspect.getsource(fn)
        for line in src.splitlines():
            if "F.broadcast" in line:
                assert "(n" in line or "(r" in line, (
                    f"{fn.__name__}: broadcast hint on a non-dimension "
                    f"side: {line.strip()}"
                )


def test_topk_plans_as_take_ordered(spark):
    # orderBy+limit must not plan a global sort
    plan = plan_of(spark, "top_k")
    assert "TakeOrderedAndProject" in plan


def test_groupby_has_partial_aggregation(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    # two HashAggregate nodes: partial (map-side) + final
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan or "merge_sum" in plan


def test_dedup_first_wins_is_aggregation_not_sort(spark):
    """Round 12: the packed path must plan as a fixed-width
    HashAggregate min with a map-side partial — no window sort, no
    SortAggregate (the min_by struct buffer forced SortAggregate on
    both sides of the exchange)."""
    plan = plan_of(spark, "dedup_first_wins")
    assert "partial_min" in plan
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan
    assert "Window" not in plan


def test_limit_pushdown(spark):
    plan = plan_of(spark, "limit_sorted")
    assert "TakeOrderedAndProject" in plan or "CollectLimit" in plan


@pytest.mark.parametrize("name", ["token_count", "lang_id", "quality_score",
                                  "fingerprint"])
def test_text_analysis_is_single_map_pass(spark, name):
    """Text stats must stay narrow: no exchange at all in the plan."""
    plan = plan_of(spark, name)
    assert "Exchange" not in plan, name


def test_q6_predicates_reach_scan(spark):
    """Q6 is scan→filter→1-row agg: every predicate must be pushed to
    the parquet scan and no Exchange beyond the final single-partition
    agg may appear."""
    plan = plan_of(spark, "q6_forecast_revenue")
    # explain truncates the PushedFilters list; assert the prefix and
    # the date bound that leads it
    assert "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_quantity)" in plan
    assert "GreaterThanOrEqual(l_shipdate,1996-01-01" in plan


def test_q19_or_predicates_push_to_both_scans(spark):
    """Catalyst must split the OR-of-ANDs: brand/size disjuncts reach
    the part scan, quantity disjuncts the lineitem scan."""
    plan = plan_of(spark, "q19_discounted_revenue")
    assert "Brand#11" in plan
    # the lineitem-side OR'd quantity bounds survive as a pushed filter
    assert plan.count("Or(") >= 2


def test_q4_semi_join_with_residual(spark):
    plan = final_plan_of(spark, "q4_order_priority")
    assert "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_tfidf_docfreq_join_is_hint_free(spark):
    """The vocabulary (docfreq) side of the tf·idf join grows with the
    corpus, so it must not carry a broadcast hint; AQE decides. At
    test SF that still resolves to a broadcast join (vocab is tiny),
    with both groupBys feeding it."""
    import inspect

    from small_etl_spark.llm import textstats

    assert "F.broadcast" not in inspect.getsource(textstats.tfidf_top_terms)
    plan = final_plan_of(spark, "tfidf_top_terms")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


@pytest.mark.parametrize("name", ["chunk_documents", "redact_pii",
                                  "train_val_split", "pii_audit"])
def test_map_only_llm_ops_have_no_exchange(spark, name):
    """Chunking, PII scrub/audit and hash split are scan-fused map
    passes: any Exchange in their plan is a regression. (Winnowing
    stats is excluded — _ensure_parallelism deliberately repartitions
    a single-file input before the CPU-heavy fingerprint math.)"""
    plan = plan_of(spark, name)
    assert "Exchange" not in plan, name


@pytest.mark.parametrize("name", ["simhash_dedup", "simhash_dedup_md5"])
def test_probabilistic_dedup_never_cross_joins(spark, name):
    """The whole point of LSH banding / pigeonhole chunking is that
    candidates come from equi-joins on (band, bucket) — a
    CartesianProduct or BroadcastNestedLoopJoin in any of these plans
    means the blocking silently degenerated to all-pairs."""
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


@pytest.mark.parametrize("hash_family", ["xxhash64", "md5"])
def test_minhash_lazy_plan_never_cross_joins(spark, hash_family):
    """Same property for MinHash-LSH. The call is fully lazy and
    cache-free since round 5, so the registered plan IS the join
    plan — candidates must come from the banded equi-join, never an
    all-pairs product."""
    from small_etl_spark.llm.dedup import minhash_lsh_pairs
    from small_etl_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    df = minhash_lsh_pairs(docs, jaccard_threshold=0.8,
                           hash_family=hash_family)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_value_histogram_single_exchange(spark):
    """Bucketing is map-side; the only shuffle is the final
    (event_type, bucket) aggregate, and the scan reads 2 columns."""
    plan = plan_of(spark, "value_histogram_events")
    assert plan.count("Exchange") == 1
    assert "ReadSchema: struct<event_type:string,value:double>" in plan


def test_mixture_resample_broadcasts_rate_table(spark):
    """The per-stratum rate table is tiny by construction and must
    come back to the corpus via a broadcast join — a shuffled join
    here would re-shuffle the whole corpus at 100 TB."""
    plan = final_plan_of(spark, "mixture_resample")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_corpus_clean_single_shuffle(spark):
    """The composed clean recipe must keep exactly one Exchange (the
    fingerprint groupBy) — the quality/lang filters fuse into the
    scan stage."""
    plan = plan_of(spark, "corpus_clean")
    assert plan.count("Exchange") == 1


def test_stratified_sample_filter_reaches_scan(spark):
    """The md5-bucket sampling predicate is a plain filter — no
    Exchange, no Python, evaluated in the scan pipeline."""
    plan = plan_of(spark, "stratified_sample_docs")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_q18_single_fact_scan_eager_agg(spark):
    """Round 12: q18 runs the eager-aggregation form — ONE lineitem
    scan feeding the per-order HAVING agg (the old shape scanned the
    fact twice: once for the HAVING set, once for the LeftSemi probe),
    and the hint-free dimension joins still resolve to broadcast at
    this SF with no sort-merge fallback."""
    plan = final_plan_of(spark, "q18_large_orders")
    final = plan.split("== Initial Plan ==")[0]  # AQE prints both
    assert final.count("FileScan parquet") == 3  # lineitem+orders+customer
    assert "LeftSemi" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q21_correlations_stay_hint_free_and_broadcast_at_test_sf(spark):
    """Q21's EXISTS/NOT-EXISTS legs are LeftSemi/LeftAnti on
    l_orderkey; at this SF AQE must broadcast them (no SortMergeJoin)
    and the source must not hint any lineitem-sized side."""
    import inspect

    plan = final_plan_of(spark, "q21_waiting_orders")
    assert "SortMergeJoin" not in plan
    src = inspect.getsource(REGISTRY["q21_waiting_orders"].builder)
    for line in src.splitlines():
        if "F.broadcast" in line:
            assert "(s)" in line or "(n)" in line or "(r)" in line, line.strip()


def test_q2_prunes_lineitem_scan(spark):
    """The part-supplier relation derives from a 3-column projection
    of lineitem — the scan must not read the other 8 columns."""
    plan = plan_of(spark, "q2_min_cost_supplier")
    assert "l_extendedprice" in plan
    assert "l_shipdate" not in plan and "l_returnflag" not in plan


def test_heavy_hitters_takes_ordered(spark):
    plan = plan_of(spark, "heavy_hitter_users")
    assert "TakeOrderedAndProject" in plan


def test_histogram_single_shuffle(spark):
    """Bucket assignment is map-side; the only exchange is the
    ≤buckets-group aggregation."""
    plan = plan_of(spark, "histogram_totalprice")
    assert plan.count("Exchange") == 1


def test_funnel_exchanges_key_on_user(spark):
    """Every exchange in the funnel chain hash-partitions on user_id
    (no stray repartition on another key)."""
    plan = plan_of(spark, "funnel_steps")
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "user_id" in line, line.strip()


def test_zscore_stats_broadcast_back(spark):
    """The per-group moments join back onto the fact scan as a
    broadcast — the fact side must not shuffle for the join."""
    plan = final_plan_of(spark, "zscore_outliers")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_scd2_big_side_never_sort_merges(spark):
    """All four SCD-2 legs probe the delta-derived changed-key set;
    at this SF every join is broadcast (the 100 TB shape: current
    stays in place, delta broadcasts)."""
    plan = final_plan_of(spark, "scd2_customers")
    assert "SortMergeJoin" not in plan


def test_unpivot_plans_as_expand_not_union(spark):
    """Melt must be one Expand over one scan — not the k-scan UNION
    ALL its oracle spells out."""
    plan = plan_of(spark, "unpivot_part_metrics")
    assert "Expand" in plan
    assert plan.count("Exchange") == 0
    assert plan.count("Scan parquet") == 1


def test_doc_ngram_novelty_no_pairwise_work(spark):
    """Novelty must scale like term counting: shingle-keyed min +
    equi-join back — never a cross join or nested-loop over docs."""
    plan = plan_of(spark, "doc_ngram_novelty")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_label_centroid_outliers_broadcasts_centroids(spark):
    """The (label,pos) centroid table is broadcast-sized by
    construction (labels × dim rows); the join back to the exploded
    view must be a broadcast hash join, and the final top-n a
    TakeOrdered, not a global sort."""
    plan = plan_of(spark, "embedding_label_outliers")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_hard_negatives_broadcast_query_side(spark):
    """Hard-negative scoring broadcasts the small query side over the
    corpus scan (BroadcastNestedLoopJoin — it's a theta join), same
    shape as cosine_topk; the corpus side must not be shuffled before
    scoring."""
    plan = plan_of(spark, "hard_negative_mining")
    assert "BroadcastNestedLoopJoin" in plan


def test_bigram_pmi_single_tokenize_pass(spark):
    """All three marginals derive from the pair-count table. The
    static plan repeats the tokenize subtree, but the pair-count
    exchange is identical in all four usages, so at runtime
    ReuseExchange must collapse them — the corpus is tokenized and
    shuffled ONCE, the marginals read the reused shuffle output."""
    plan = final_plan_of(spark, "bigram_pmi")
    final = plan.split("+- == Initial Plan ==")[0]
    assert final.count("ReusedExchange") >= 3
    # exactly one live scan of the corpus in the executed plan
    assert final.count("documents.parquet") == 1


def test_unigram_logprob_no_python_and_vocab_join(spark):
    """LM scoring is all built-ins: no Python evals in the plan, and
    the doc→LM join is a hash join (any flavor), never a cartesian."""
    plan = final_plan_of(spark, "unigram_logprob_score")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_temperature_mix_single_corpus_scan(spark):
    """α-sampling scans the corpus once: exactly one Exchange below
    the stratum aggregation feeds all the window math."""
    plan = plan_of(spark, "temperature_mix")
    assert plan.count("FileScan") == 1


def test_semantic_dedup_never_cross_joins(spark):
    plan = plan_of(spark, "semantic_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pca_projection_is_jvm_side(spark):
    """Phase 2 of PCA (the per-row projection) must be pure codegen'd
    expressions — the only Python allowed is the moments pass, which
    runs during construction, not in the returned plan."""
    plan = plan_of(spark, "pca_project")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # map-only over the corpus


def test_ewma_single_user_shuffle(spark):
    """EWMA is one window pass: a single shuffle keyed on user_id and
    zero Python."""
    plan = plan_of(spark, "ewma_user_values")
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(user_id" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_adamic_adar_never_cross_joins(spark):
    plan = plan_of(spark, "adamic_adar_parts")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan  # top-25, no global sort


def test_bpe_encode_corpus_scanned_twice_not_per_iter(spark):
    """The doc-level pass adds exactly one more corpus scan on top of
    the vocab build — merge iterations must not rescan documents.
    (localCheckpoint materializes the vocab table, so the final plan
    shows the two corpus scans plus checkpoint reads, regardless of
    iters.)"""
    plan = plan_of(spark, "bpe_encode_counts")
    assert plan.count("FileScan parquet") <= 2


def test_whitening_projection_is_jvm_map_only(spark):
    """The 64-coordinate whitening projection must stay codegen'd
    expressions with no Python eval and no shuffle in the returned
    plan (the moments pass runs at construction time)."""
    plan = plan_of(spark, "mahalanobis_outliers")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_zipf_ranks_after_takeordered_cut(spark):
    """Top-200 must come from TakeOrderedAndProject; the row_number
    window then runs over 200 rows, never the full vocabulary."""
    plan = plan_of(spark, "zipf_fit")
    assert "TakeOrderedAndProject" in plan


def test_group_kfold_is_map_only(spark):
    plan = plan_of(spark, "group_kfold")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_minhash_merge_contract_no_python(spark):
    plan = plan_of(spark, "minhash_merge_contract")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_skyline_2d_prefilters_before_global_window(spark):
    """The 2-D skyline's unpartitioned window (inherent to the sweep)
    must consume the MapInPandas local-frontier output, never the raw
    scan — the prefilter is what makes the single-task stage safe."""
    plan = plan_of(spark, "skyline_orders")
    assert "MapInPandas" in plan
    assert plan.index("MapInPandas") > plan.index("Window")  # child of it


def test_sorted_neighborhood_rank_is_partition_parallel(spark):
    """SNM's global rank must come from global_ordinal (per-partition
    windows over __pid__), not a whole-table single-task window."""
    plan = plan_of(spark, "snm_dup_customers")
    assert "__pid__" in plan


def test_global_ordinal_offsets_broadcast_not_casewhen(spark):
    """The (pid → offset) map in global_ordinal/global_cumsum must
    attach via a BROADCAST join of the tiny offsets table, never a
    chained CASE WHEN over pids: the chain is O(partitions) branch
    tests PER ROW, so its per-row cost grows with cluster size —
    the one shape that gets WORSE as the cluster gets bigger. Also
    pin the range exchange: the plan must read the localCheckpoint
    (Scan ExistingRDD), not re-execute the sampled repartitionByRange
    per job (sampling could re-draw different boundaries)."""
    for name in ("clv_deciles", "part_revenue_pareto", "snm_dup_customers"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "WHEN (__pid__" not in plan, name
        assert "ExistingRDD" in plan, name
