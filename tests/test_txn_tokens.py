"""Batch-writer idempotence tokens (commit_snapshot(txn=(app, v)) —
the public Delta ``txn`` action): a retried batch job cannot
double-append; marks ride every commit mode and never rewind, even
across RESTORE."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from small_etl_spark.sinks import versioned as V


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _kv(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def test_replayed_txn_is_a_noop(spark, table):
    V.commit_snapshot(_kv(spark, 0, 10), table, mode="overwrite")
    v = V.commit_snapshot(_kv(spark, 10, 20), table, mode="append",
                          txn=("etl_job", 1))
    assert v == 1
    # the retry (same app txn) commits nothing
    assert V.commit_snapshot(_kv(spark, 10, 20), table, mode="append",
                             txn=("etl_job", 1)) is None
    assert V.latest_version(table) == 1
    assert V.read_snapshot(spark, table).count() == 20
    # and leaves no orphan data behind
    assert V.remove_orphan_files(table, older_than_ms=0) == []
    # the next txn version commits normally
    assert V.commit_snapshot(_kv(spark, 20, 25), table, mode="append",
                             txn=("etl_job", 2)) == 2
    assert V.read_snapshot(spark, table).count() == 25


def test_apps_are_independent_and_marks_survive_ops(spark, table):
    V.commit_snapshot(_kv(spark, 0, 5), table, mode="overwrite",
                      txn=("a", 7))
    V.commit_snapshot(_kv(spark, 5, 10), table, mode="append",
                      txn=("b", 7))
    # same numeric version, different app -> both land
    assert V.read_snapshot(spark, table).count() == 10
    # marks survive maintenance + evolution + COW delete
    V.optimize_snapshot(spark, table)
    V.rename_column(table, "v", "val")
    V.delete_where(spark, table, F.col("k") >= 9)
    assert V.commit_snapshot(
        spark.range(0, 3).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("val")
        ),
        table, mode="append", txn=("a", 7),
    ) is None
    assert V.commit_snapshot(
        spark.range(50, 53).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("val")
        ),
        table, mode="append", txn=("a", 8),
    ) is not None


def test_marks_never_rewind_across_restore(spark, table):
    V.commit_snapshot(_kv(spark, 0, 5), table, mode="overwrite")  # v0
    V.commit_snapshot(_kv(spark, 5, 10), table, mode="append",
                      txn=("job", 3))  # v1
    V.restore_snapshot(table, 0)  # v2: pre-txn state
    # the data is rolled back, but the idempotence mark is NOT —
    # a replay of txn 3 after a restore must still be a no-op
    assert V.read_snapshot(spark, table).count() == 5
    assert V.commit_snapshot(_kv(spark, 5, 10), table, mode="append",
                             txn=("job", 3)) is None


def test_lower_and_equal_versions_skip_higher_commits(spark, table):
    V.commit_snapshot(_kv(spark, 0, 5), table, mode="overwrite",
                      txn=("j", 10))
    assert V.commit_snapshot(_kv(spark, 5, 8), table, mode="append",
                             txn=("j", 9)) is None
    assert V.commit_snapshot(_kv(spark, 5, 8), table, mode="append",
                             txn=("j", 10)) is None
    assert V.commit_snapshot(_kv(spark, 5, 8), table, mode="append",
                             txn=("j", 11)) == 1
