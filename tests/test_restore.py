"""RESTORE (sinks/versioned.py::restore_snapshot): roll the table
forward to an earlier snapshot's exact state as one metadata-only
commit — the Delta RESTORE / Iceberg rollback primitive. History is
preserved, counters never rewind, vacuumed targets refuse loudly.

Reference parity note: the reference overwrites outputs in place
(contextual_pipeline.rs:1164-1229) and has no history to restore;
this is engine-side extension surface tested against the public
Delta/Iceberg semantics."""

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


def _state(spark, table, version=None):
    return {
        (r.k, r.v)
        for r in V.read_snapshot(spark, table, version=version).collect()
    }


def test_restore_reverts_state_and_preserves_history(spark, table):
    V.commit_snapshot(_kv(spark, 0, 20), table, mode="overwrite")
    V.commit_snapshot(_kv(spark, 20, 30), table, mode="append")
    V.delete_where(spark, table, F.col("k") < 5)
    want_v0 = {(k, 2 * k) for k in range(20)}
    v = V.restore_snapshot(table, 0)
    assert v == 3
    assert _state(spark, table) == want_v0
    # forensics: the bad commits are still readable
    assert _state(spark, table, version=2) == {
        (k, 2 * k) for k in range(5, 30)
    }
    # the restore record is metadata-only: no new data dir appeared
    assert V.read_manifest(table, 3)["mode"] == "restore"
    assert V.read_manifest(table, 3)["restored_from"] == 0
    f0 = {e["path"] for e in V.read_manifest(table, 0)["files"]}
    f3 = {e["path"] for e in V.read_manifest(table, 3)["files"]}
    assert f3 == f0


def test_restore_to_head_is_noop(spark, table):
    V.commit_snapshot(_kv(spark, 0, 5), table, mode="overwrite")
    assert V.restore_snapshot(table, 0) == 0
    assert V.latest_version(table) == 0


def test_restore_bounds_checked(spark, table):
    V.commit_snapshot(_kv(spark, 0, 5), table, mode="overwrite")
    with pytest.raises(ValueError, match="outside"):
        V.restore_snapshot(table, 7)


def test_restore_carries_live_dv(spark, table):
    V.commit_snapshot(_kv(spark, 0, 20), table, mode="overwrite")
    V.delete_where_mor(spark, table, F.col("k") < 3)  # v1: DV
    V.commit_snapshot(_kv(spark, 20, 25), table, mode="append")  # v2
    V.compact_dv(spark, table)  # v3: DV folded
    V.restore_snapshot(table, 2)  # back to DV-live state
    assert _state(spark, table) == {(k, 2 * k) for k in range(3, 25)}
    assert V.read_manifest(table, 4).get("dv")


def test_restore_carries_eq_deletes(spark, table):
    V.commit_snapshot(_kv(spark, 0, 10), table, mode="overwrite")
    src = spark.createDataFrame([(1, 100), (11, 22)], "k bigint, v bigint")
    V.stream_upsert_batch(src, batch_id=0, table=table, key="k")
    want = _state(spark, table)  # upserted state, eq-deletes live
    V.compact_eq_deletes(spark, table)  # v2: folded
    V.restore_snapshot(table, 1)
    assert _state(spark, table) == want
    assert V.read_manifest(table, 3).get("eq_deletes")


def test_restore_across_schema_evolution(spark, table):
    V.commit_snapshot(_kv(spark, 0, 10), table, mode="overwrite")
    V.rename_column(table, "v", "val")  # v1
    V.add_column(table, "tag", "string")  # v2
    V.restore_snapshot(table, 0)  # v3: old schema back
    df = V.read_snapshot(spark, table)
    assert df.columns == ["k", "v"]
    assert _state(spark, table) == {(k, 2 * k) for k in range(10)}
    # the head BEFORE the restore still shows the evolved schema
    assert V.read_snapshot(spark, table, version=2).columns == [
        "k", "val", "tag",
    ]
    # column ids never rewind: re-adding a column claims a fresh id
    m3 = V.read_manifest(table, 3)
    m2 = V.read_manifest(table, 2)
    assert m3["next_column_id"] == m2["next_column_id"]


def test_restore_never_reuses_row_ids(spark, table):
    V.commit_snapshot(_kv(spark, 0, 10), table, mode="overwrite")
    V.commit_snapshot(_kv(spark, 10, 20), table, mode="append")
    high = V.read_manifest(table, 1)["next_row_id"]
    V.restore_snapshot(table, 0)
    assert V.read_manifest(table, 2)["next_row_id"] == high
    V.commit_snapshot(_kv(spark, 50, 52), table, mode="append")
    ids = {
        r.k: r._row_id
        for r in V.read_snapshot(spark, table, with_lineage=True).collect()
    }
    assert min(ids[50], ids[51]) >= high


def test_restore_refuses_vacuumed_target(spark, table):
    V.commit_snapshot(_kv(spark, 0, 10), table, mode="overwrite")
    V.commit_snapshot(_kv(spark, 10, 20), table, mode="overwrite")
    V.vacuum(table, keep_last=1)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        V.restore_snapshot(table, 0)


def test_cdc_over_restore_is_exact_inverse(spark, table):
    V.commit_snapshot(_kv(spark, 0, 10), table, mode="overwrite")
    V.commit_snapshot(_kv(spark, 10, 13), table, mode="append")  # v1
    V.restore_snapshot(table, 0)  # v2 undoes the append
    ch = {
        (r._change_type, r.k)
        for r in V.table_changes(spark, table, 1, 2).collect()
    }
    assert ch == {("delete", 10), ("delete", 11), ("delete", 12)}
    # net CDC over append+restore is empty
    assert V.table_changes(spark, table, 0, 2).count() == 0


def test_append_after_restore_enforces_restored_schema(spark, table):
    V.commit_snapshot(_kv(spark, 0, 5), table, mode="overwrite")
    V.rename_column(table, "v", "val")
    V.restore_snapshot(table, 0)
    # appends speak the RESTORED schema again
    V.commit_snapshot(_kv(spark, 5, 8), table, mode="append")
    assert _state(spark, table) == {(k, 2 * k) for k in range(8)}


def test_restore_partitioned_table(spark, table):
    df = spark.range(0, 40).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("part"),
        (F.col("id") * 3).alias("v"),
    )
    V.commit_snapshot(df, table, mode="overwrite",
                      partition_by=["part"])
    V.delete_where(spark, table, F.col("part") == 2)
    V.restore_snapshot(table, 0)
    m = V.read_manifest(table, 2)
    assert m.get("partition_by") == ["part"]
    got = V.read_snapshot(spark, table, where=[("part", "=", 2)])
    assert got.count() == 10


def test_expire_snapshots_age_based(spark, table):
    """expire_snapshots drops versions older than the horizon (keeping
    keep_last regardless of age), honors tags, leaves young ones."""
    import json
    import os as _os

    for i in range(4):
        # overwrite lineages so expired versions own reclaimable files
        V.commit_snapshot(_kv(spark, 10 * i, 10 * i + 5), table,
                          mode="append" if i == 3 else "overwrite")
    # age v0/v1 artificially (3 days old); v2/v3 stay fresh
    for ver in (0, 1):
        p = V._manifest_path(table, ver)
        rec = json.load(open(p))
        rec["committed_at_ms"] -= 3 * 24 * 3600 * 1000
        _os.remove(p)
        json.dump(rec, open(p, "w"))
    V.create_tag(table, "pin0", version=0)
    # 1-day horizon: v0 (tagged -> survives), v1 expires
    deleted = V.expire_snapshots(table, older_than_ms=24 * 3600 * 1000)
    assert deleted > 0
    assert V.read_snapshot(spark, table, version=0).count() == 5  # tag
    with pytest.raises(FileNotFoundError):
        V.read_snapshot(spark, table, version=1)
    for ver in (2, 3):
        V.read_snapshot(spark, table, version=ver).count()
    # huge horizon: nothing else expires
    assert V.expire_snapshots(table,
                              older_than_ms=30 * 24 * 3600 * 1000) == 0


def test_expire_snapshots_keep_last_overrides_age(spark, table):
    import json
    import os as _os

    V.commit_snapshot(_kv(spark, 0, 5), table, mode="overwrite")
    V.commit_snapshot(_kv(spark, 5, 10), table, mode="append")
    for ver in (0, 1):  # BOTH ancient
        p = V._manifest_path(table, ver)
        rec = json.load(open(p))
        rec["committed_at_ms"] -= 10 * 24 * 3600 * 1000
        _os.remove(p)
        json.dump(rec, open(p, "w"))
    V.expire_snapshots(table, older_than_ms=24 * 3600 * 1000,
                       keep_last=2)
    # both inside keep_last -> both survive their age
    assert V.read_snapshot(spark, table, version=0).count() == 5
    assert V.read_snapshot(spark, table, version=1).count() == 10
