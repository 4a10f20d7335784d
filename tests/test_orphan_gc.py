"""Orphan-file GC (sinks/versioned.py::remove_orphan_files) and the
vacuum in-flight-writer age guard: the commit protocol writes data
BEFORE publishing the manifest, so a writer that loses the O_EXCL
race or dies mid-commit leaves fully-written data dirs no manifest
references. remove_orphan_files reclaims exactly those — never a
referenced byte — with an age cutoff so a racing vacuum can never
eat a commit that is about to publish (the public Iceberg
remove_orphan_files(older_than) contract)."""

from __future__ import annotations

import os

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


def _abandoned_write(spark, table, lo=100, hi=110):
    """Simulate a writer that wrote data but never won its commit."""
    _cid, entries = V._write_data_files(
        _kv(spark, lo, hi), table, ["k", "v"]
    )
    return [e["path"] for e in entries]


def test_orphans_removed_referenced_kept(spark, table):
    V.commit_snapshot(_kv(spark, 0, 20), table, mode="overwrite")
    V.commit_snapshot(_kv(spark, 20, 30), table, mode="append")
    orphans = _abandoned_write(spark, table)
    removed = V.remove_orphan_files(table, older_than_ms=0)
    assert sorted(orphans) == removed
    # every referenced file still present, table reads fine
    for ver in (0, 1):
        for e in V.read_manifest(table, ver)["files"]:
            assert os.path.exists(os.path.join(table, e["path"]))
    assert V.read_snapshot(spark, table).count() == 30


def test_age_guard_protects_inflight_writes(spark, table):
    V.commit_snapshot(_kv(spark, 0, 10), table, mode="overwrite")
    orphans = _abandoned_write(spark, table)
    # freshly written "in-flight" files survive a 1 h cutoff
    assert V.remove_orphan_files(table, older_than_ms=3600_000) == []
    for p in orphans:
        assert os.path.exists(os.path.join(table, p))
    # and are reclaimed once old enough
    assert V.remove_orphan_files(table, older_than_ms=0) == sorted(orphans)


def test_dry_run_lists_without_deleting(spark, table):
    V.commit_snapshot(_kv(spark, 0, 10), table, mode="overwrite")
    orphans = _abandoned_write(spark, table)
    listed = V.remove_orphan_files(table, older_than_ms=0, dry_run=True)
    assert listed == sorted(orphans)
    for p in orphans:
        assert os.path.exists(os.path.join(table, p))
    assert V.remove_orphan_files(table, older_than_ms=0) == listed


def test_branch_staged_files_are_not_orphans(spark, table):
    V.commit_snapshot(_kv(spark, 0, 10), table, mode="overwrite")
    root = V.branch_create(table, "audit")
    V.commit_snapshot(_kv(spark, 10, 15), root, mode="append")
    removed = V.remove_orphan_files(table, older_than_ms=0)
    assert removed == []
    # the staged branch still reads intact
    assert V.read_snapshot(spark, root).count() == 15


def test_orphans_under_partition_dirs(spark, table):
    df = spark.range(0, 20).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("part"),
        (F.col("id") * 2).alias("v"),
    )
    V.commit_snapshot(df, table, mode="overwrite", partition_by=["part"])
    _cid, entries = V._write_data_files(
        df, table, ["k", "v"], partition_by=["part"]
    )
    removed = V.remove_orphan_files(table, older_than_ms=0)
    assert removed == sorted(e["path"] for e in entries)
    assert V.read_snapshot(spark, table).count() == 20


def test_mor_dv_and_eq_delete_stores_are_referenced(spark, table):
    V.commit_snapshot(_kv(spark, 0, 20), table, mode="overwrite")
    V.delete_where_mor(spark, table, F.col("k") < 3)  # live DV
    assert V.remove_orphan_files(table, older_than_ms=0) == []
    V.compact_dv(spark, table)
    src = spark.createDataFrame([(5, 50)], "k bigint, v bigint")
    V.stream_upsert_batch(src, batch_id=0, table=table, key="k")
    # live equality-delete store must also be treated as referenced
    assert V.remove_orphan_files(table, older_than_ms=0) == []
    got = {r.k: r.v for r in V.read_snapshot(spark, table).collect()}
    assert 0 not in got and got[5] == 50


def test_vacuum_min_age_guard(spark, table):
    V.commit_snapshot(_kv(spark, 0, 10), table, mode="overwrite")
    f0 = [e["path"] for e in V.read_manifest(table, 0)["files"]]
    V.commit_snapshot(_kv(spark, 10, 20), table, mode="overwrite")
    # v0 is expired; the guard spares its DATA (seconds old — could
    # in principle be an in-flight writer's) while retention still
    # drops the record, exactly like Iceberg's expire-then-orphan split
    assert V.vacuum(table, keep_last=1, min_age_ms=3600_000) == 0
    assert all(os.path.exists(os.path.join(table, p)) for p in f0)
    # an unguarded pass reclaims them
    assert V.vacuum(table, keep_last=1) == len(f0)
    assert V.read_snapshot(spark, table).count() == 10


def test_empty_table_and_no_orphans(spark, table):
    assert V.remove_orphan_files(table, older_than_ms=0) == []
    V.commit_snapshot(_kv(spark, 0, 5), table, mode="overwrite")
    assert V.remove_orphan_files(table, older_than_ms=0) == []


def test_auto_maintain_orphan_sweep_opt_in(spark, table):
    """auto_maintain(orphans_older_than_ms=...) sweeps lost-race
    debris as part of the periodic policy call."""
    V.commit_snapshot(_kv(spark, 0, 10), table, mode="overwrite")
    _abandoned_write(spark, table)
    out = V.auto_maintain(spark, table, orphans_older_than_ms=0)
    assert any(a.startswith("orphans:") for a in out["actions"])
    assert V.remove_orphan_files(table, older_than_ms=0) == []
    assert V.read_snapshot(spark, table).count() == 10
    # without the opt-in, nothing is swept
    _abandoned_write(spark, table, 200, 205)
    out = V.auto_maintain(spark, table)
    assert not any(a.startswith("orphans:") for a in out["actions"])


def test_sort_order_property_upgrades_maintenance_to_cluster(
    spark, table
):
    """set_sort_order is metadata-only; auto_maintain's compaction
    becomes a Z-order rewrite with bounds derived from manifest stats,
    and the clustered layout then prunes on the declared columns."""
    df = spark.range(0, 400).select(
        (F.col("id") % 20).alias("x"), (F.col("id") / 20).cast(
            "long"
        ).alias("y"),
    )
    V.commit_snapshot(df.repartition(12), table, mode="overwrite")
    V.set_sort_order(table, ["x", "y"])
    assert V.read_manifest(table, 1)["mode"] == "set_sort_order"
    out = V.auto_maintain(spark, table, small_file_trigger=2,
                          target_bytes=2048)
    assert "cluster" in out["actions"]
    # clustered: a 2-D box predicate prunes files at the manifest level
    kept, total = V.plan_files(
        table, where=[("x", "<=", 2), ("y", "<=", 2)]
    )
    assert len(kept) < total
    got = V.read_snapshot(spark, table).count()
    assert got == 400
    # property survives maintenance; clearing it reverts to optimize
    assert V.read_manifest(
        table, V.latest_version(table)
    )["sort_order"] == ["x", "y"]
    V.set_sort_order(table, None)
    V.commit_snapshot(df.repartition(9), table, mode="append")
    out = V.auto_maintain(spark, table, small_file_trigger=2)
    assert "optimize" in out["actions"]


def test_sort_order_validation(spark, table):
    df = spark.createDataFrame([(1, "a")], "k bigint, s string")
    V.commit_snapshot(df, table, mode="overwrite")
    with pytest.raises(V.SchemaEvolutionError, match="numeric"):
        V.set_sort_order(table, ["s"])
    with pytest.raises(V.SchemaEvolutionError, match="no column"):
        V.set_sort_order(table, ["zz"])


def test_vacuum_then_orphan_gc_keeps_checkpoint_carried_files(
    spark, table
):
    """ADVICE r9 (high): after vacuum drops older base/delta
    manifests, files carried into retained DELTA versions are
    referenced only by the vN.checkpoint.json vacuum pinned — the
    surviving raw records hold just their own ``add`` lists. The
    orphan sweep must union retained checkpoints or it deletes live
    data files older than the cutoff, corrupting the table.
    auto_maintain(vacuum_keep_last=..., orphans_older_than_ms=...)
    runs exactly this sequence."""
    V.commit_snapshot(_kv(spark, 0, 10), table, mode="overwrite")
    for lo in range(10, 40, 10):
        V.commit_snapshot(_kv(spark, lo, lo + 10), table, mode="append")
    head = V.latest_version(table)
    assert "add" in V._read_record(table, head)  # delta-headed
    V.vacuum(table, keep_last=2)
    # base manifest v0 is gone; v0's data files are carried by the
    # retained deltas' pinned checkpoints only
    assert not os.path.exists(V._manifest_path(table, 0))
    assert V.remove_orphan_files(table, older_than_ms=0) == []
    assert V.read_snapshot(spark, table).count() == 40
    # the combined policy call must be equally safe
    V.commit_snapshot(_kv(spark, 40, 50), table, mode="append")
    V.auto_maintain(
        spark, table, vacuum_keep_last=2, orphans_older_than_ms=0
    )
    assert V.read_snapshot(spark, table).count() == 50


def test_orphan_gc_after_vacuum_still_removes_true_orphans(
    spark, table
):
    """The checkpoint union must not over-retain: a genuinely
    abandoned write is still reclaimed after a vacuum."""
    V.commit_snapshot(_kv(spark, 0, 10), table, mode="overwrite")
    for lo in range(10, 40, 10):
        V.commit_snapshot(_kv(spark, lo, lo + 10), table, mode="append")
    V.vacuum(table, keep_last=2)
    orphans = _abandoned_write(spark, table)
    assert V.remove_orphan_files(table, older_than_ms=0) == sorted(
        orphans
    )
    assert V.read_snapshot(spark, table).count() == 40
