"""Registry-wide physical-plan audit: EVERY query's executed plan is
scanned for scale anti-patterns — all-pairs joins, row-at-a-time
Python evaluation, unpartitioned windows — with an explicit,
documented allowlist for the handful of queries where the pattern is
the point (e.g. the labeled exact-baseline crossJoin). New queries
get audited automatically just by being registered; an accidental
Cartesian product can no longer slip in unnoticed."""

from __future__ import annotations

import pytest

from small_etl_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"

# Queries allowed to contain an all-pairs join, each with the reason
# reviewed in PLANS.md / the operator docstring.
CARTESIAN_OK = {
    # documented exact-cosine baselines: similarity is all-pairs BY
    # DEFINITION; the scale paths (vectorized, IVF, LSH-blocked) sit
    # beside them in llm/similarity.py
    "cosine_topk",
    "embedding_near_dup",
    "semantic_dedup",
    "hard_negative_mining",
    "embedding_label_outliers",
    # scalar broadcast folds: crossJoin against a 1-row (or
    # constant-k) aggregate — corpus totals, avgdl, centroid tables,
    # probability normalizers. Constant-size build side, not n².
    "zipf_fit",
    "corpus_mix_report",
    "mixture_resample",
    "temperature_mix",
    "quantile_normalize_lengths",
    "kmeans_contract",
    "ivf_ann_topk",
    "ivf_recall_contract",
    "rolling_dau",
    "q11_important_stock",
    "q22_sales_opportunity",
    "vocab_coverage",
    "heavy_hitter_users",
    "bm25_scores_docs",
    "association_rules_parts",
    "bigram_pmi",
    "unigram_logprob_score",
    "dsir_doc_weights",
    "benford_audit_orders",
    "shard_plan",  # broadcast of the 1-row corpus token total
    "pq_recall_contract",  # exact-L2 crossJoin is the labeled ground
                           # truth the PQ recall is measured against
    "ivfpq_recall_contract",  # same exact-L2 ground-truth crossJoin,
                              # plus the broadcast 16-row centroid
                              # probe ranking (constant build side) —
                              # the composite being measured only
                              # touches probed cells by construction
    "hll_setops_contract",  # broadcast of a 1-row exact-count aggregate
    "rrf_fusion_docs",     # inherits bm25's corpus-constant folds
    "part_revenue_pareto",  # broadcast of the 1-row (n, total) fold
    "diff_in_diff_events",  # two scalar broadcasts (midpoint, DiD value)
    "curation_pipeline",  # two 1-row scalar broadcasts: the percentile
                          # quality cut and the token-budget fold
                          # (llm/pipeline.py) — constant build side
    "bigram_interp_logprob_score",  # 1-row (V, n_total) normalizer
                                    # broadcast for the interpolated
                                    # LM (llm/textstats.py) — constant
    "mmr_rerank_diverse",  # inherits cosine_topk's exact-baseline
                           # broadcast-queries crossJoin for the
                           # retrieve stage; MMR itself is grouped
}

# Unpartitioned windows allowed where the windowed frame is provably
# small or the single pass is the documented point: scalar totals
# (1-row), per-day/month series (calendar-bounded), frontier
# candidates (skyline), vocab tails after a TakeOrdered cut,
# source-count mixing tables.
GLOBAL_WINDOW_OK = {
    "running_total",       # demo of the pattern itself, documented
    "yoy_growth",          # monthly series — calendar-bounded
    "zipf_fit",            # top-200 vocabulary only
    "quantile_normalize_lengths",  # percent-rank axis: documented asof
    "equidepth_bins_orders",       # rank over already-aggregated bins
    "skyline_orders",      # global pass over local frontiers only
    "seasonal_decompose_revenue",  # one-row-per-day series
    "incremental_distinct_hll",    # running union over day sketches
    "rolling_dau",         # per-day series
    "resample_locf",       # per-key grids; audit sees outer frame
    "resample_interpolate",
    "cohort_retention",    # cohort×week matrix — bounded
    "global_ordinal_docs",  # the global_ordinal audit row itself
    # Round 13: every _ranged_with_offsets consumer (operators/
    # sort.py) now carries the partition-offset prefix sum as an
    # in-plan window over the (pid, total) AGGREGATE — one row per
    # partition of the pinned range exchange, partition-count-bounded
    # by construction. Pre-r13 the same single-threaded prefix ran
    # hidden on the driver (collect + createDataFrame); the audit now
    # sees it, which is the point.
    "computed_markers",
    "pack_sequences",
    "quality_tiers",
    "shard_plan",
    "curation_pipeline",
    "prefix_dedup_keep_longest",
    "length_bucketed_batches",
    "train_shuffle_shards",
    "snm_dup_customers",
    "gini_user_activity",
    "rrf_fusion_docs",
    "clv_deciles",
    "part_revenue_pareto",
    "corpus_mix_report",   # one row per (source,lang) — bounded
    "mixture_resample",    # same mixing table
    "temperature_mix",     # same mixing table
    "vocab_coverage",      # top-100 after TakeOrdered cut
    "length_drift_ks",     # CDF over DISTINCT lengths — bounded range
    "length_drift_psi",    # decile edges over distinct lengths
    "rfm_segments",        # customer-dimension ntiles; documented in
                           # its docstring as the dimension-sized pass
    "neyman_allocation",   # 5-row per-segment moment table
    "rolling_corr_events",  # one-row-per-day series, calendar-bounded
    "topn_plus_other_nations",  # rank over the 25-row nation aggregate
    "sprt_conversion_monitor",  # calendar-bounded daily LLR cumsum
}


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, spec in REGISTRY.items():
        try:
            df = spec.builder(spark, SF_DIR)
            out[name] = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 - audited below
            out[name] = f"__BUILD_ERROR__: {exc}"
    return out


def test_every_query_builds(plans):
    broken = [n for n, p in plans.items() if p.startswith("__BUILD_ERROR__")]
    assert broken == []


def test_no_undeclared_cartesian_products(plans):
    bad = [
        n
        for n, p in plans.items()
        if ("CartesianProduct" in p or "BroadcastNestedLoopJoin" in p)
        and n not in CARTESIAN_OK
    ]
    assert bad == [], f"undeclared all-pairs joins in: {bad}"


def test_no_row_at_a_time_python_udfs(plans):
    """Python may appear only Arrow-batched (ArrowEvalPython /
    MapInPandas / FlatMapGroupsInPandas); BatchEvalPython is the
    row-at-a-time path and is banned outright."""
    bad = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert bad == []


def test_no_undeclared_global_windows(plans):
    """An unpartitioned window (`Window [...]` with an empty
    partition spec) funnels its whole input through one task — allowed
    only where the input is provably bounded."""
    def has_unpartitioned_window(plan: str) -> bool:
        # operator print format (probed on this Spark version):
        #   part+order:  Window [exprs], [partCols], [orderCols]
        #   part only:   Window [exprs], [partCols]      (frame agg)
        #   order only:  Window [exprs], [col ASC ...]   ← single-task
        #   neither:     Window [exprs]                  ← single-task
        # A partition-only window is parallel; an order-only or bare
        # one funnels everything through one task. The two 1-group
        # cases are told apart by ASC/DESC in the trailing group.
        for line in plan.splitlines():
            s = line.strip().lstrip("+-: ")
            if not s.startswith("Window ["):
                continue
            groups = s.count("], [")
            if groups >= 2:
                continue  # partitioned with ordering
            if groups == 0:
                return True  # no partition spec at all
            trailing = s.rsplit("], [", 1)[1]
            if " ASC" in trailing or " DESC" in trailing:
                return True  # order-only ⇒ unpartitioned
        return False

    bad = [
        n
        for n, p in plans.items()
        if n not in GLOBAL_WINDOW_OK and has_unpartitioned_window(p)
    ]
    assert bad == [], f"undeclared unpartitioned windows in: {bad}"
