from __future__ import annotations

import os

import pytest

from small_etl_spark.session import get_spark

# ---------------------------------------------------------------------------
# Fast default tier (round 13, VERDICT r12 #1)
#
# The full suite outgrew the driver's verify window (~54 min at r12;
# VERIFY_r12 cut off at ~65% with zero failures). The driver invokes
# plain `pytest tests/ -x -q`, so the DEFAULT run now skips the
# long-runtime suites — Hypothesis model walks, 30×/stress tiers, the
# moto/S3 emulations and other multi-minute files — keeping a fast
# tier that covers every operator family. The FULL suite remains the
# builder's closing gate: SPARK_GRAFT_FULL_TESTS=1 runs everything
# (and is what the round ledgers record).
#
# Files are listed (rather than per-test markers) because the slow
# cost is file-level: session-scoped Spark work dominated by
# property-test walks and stress loops. Individual slow tests inside
# otherwise-fast files can be tagged @pytest.mark.slow.
# ---------------------------------------------------------------------------

# The 18 files whose summed call+setup durations exceeded ~40 s in the
# round-13 measured full run (49.1 min total; per-file aggregation of
# `--durations=0` — table in OPTIMIZATION_r13.md). Skipping them
# leaves a ~14 min default tier that still runs ~63 files covering
# every operator family; the skipped families (versioned protocol
# walks, txn, matview, SQL DML, sequencer, plan-audit-all, similarity
# identity pins) are all also exercised by the driver's own
# correctness gate and the 304-query oracle sweep.
_SLOW_FILES: set[str] = {
    "test_plan_audit_all.py",        # 382 s — builds all 304 plans
    "test_llm_similarity.py",        # 376 s — identity pins, 3 SFs
    "test_versioned.py",             # 206 s
    "test_versioned_properties.py",  # 147 s — Hypothesis model walks
    "test_sequencer.py",             # 141 s
    "test_sql_dml.py",               # 117 s
    "test_txn.py",                   # 103 s
    "test_matview.py",               # 102 s
    "test_graph.py",                 #  71 s
    "test_file_sources.py",          #  62 s
    "test_row_lineage.py",           #  59 s
    "test_merge_full.py",            #  58 s
    "test_clone_import.py",          #  57 s
    "test_scd2_properties.py",       #  57 s — Hypothesis
    "test_matview_stream.py",        #  56 s
    "test_order_primitive_properties.py",  # 46 s — Hypothesis
    "test_rewrite_rebase.py",        #  43 s
    "test_stateful_sessions.py",     #  42 s
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-runtime test, skipped unless SPARK_GRAFT_FULL_TESTS=1"
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_FULL_TESTS") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow tier (set SPARK_GRAFT_FULL_TESTS=1 for the full suite)"
    )
    for item in items:
        if item.fspath.basename in _SLOW_FILES or "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=4)
    yield s
