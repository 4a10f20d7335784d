"""COW UPDATE (sinks/versioned.py::update_where) and the fluent Table
handle (sinks/table_api.py): SQL UPDATE semantics (assignments see the
OLD row, WHERE-null rows untouched, file pruning, lineage-stable ids,
constraint enforcement on the rewritten output) plus a chained
end-to-end lifecycle through the DeltaTable-shape wrapper."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from small_etl_spark.sinks import versioned as V
from small_etl_spark.sinks.table_api import Table


@pytest.fixture()
def path(tmp_path):
    return str(tmp_path / "tbl")


def _kv(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def test_update_where_basic(spark, path):
    V.commit_snapshot(_kv(spark, 0, 10), path, mode="overwrite")
    V.update_where(spark, path, {"v": "v + 100"}, "k >= 7")
    got = {r.k: r.v for r in V.read_snapshot(spark, path).collect()}
    assert got == {k: 2 * k + (100 if k >= 7 else 0) for k in range(10)}


def test_update_assignments_see_old_row(spark, path):
    df = spark.createDataFrame([(1, 10, 20)], "k bigint, a bigint, b bigint")
    V.commit_snapshot(df, path, mode="overwrite")
    # swap: both expressions must read PRE-update values
    V.update_where(spark, path, {"a": "b", "b": "a"})
    r = V.read_snapshot(spark, path).first()
    assert (r.a, r.b) == (20, 10)


def test_update_without_where_touches_all(spark, path):
    V.commit_snapshot(_kv(spark, 0, 5), path, mode="overwrite")
    V.update_where(spark, path, {"v": "0"})
    assert {r.v for r in V.read_snapshot(spark, path).collect()} == {0}


def test_update_prune_carries_untouched_files(spark, path):
    V.commit_snapshot(
        _kv(spark, 0, 100).repartitionByRange(8, "k"), path,
        mode="overwrite",
    )
    V.update_where(
        spark, path, {"v": "v + 1"}, "k >= 95", prune=[("k", ">=", 95)]
    )
    f0 = {e["path"] for e in V.read_manifest(path, 0)["files"]}
    f1 = {e["path"] for e in V.read_manifest(path, 1)["files"]}
    assert len(f0 & f1) >= 6
    got = {r.k: r.v for r in V.read_snapshot(spark, path).collect()}
    assert got[99] == 199 and got[0] == 0


def test_update_keeps_lineage_ids(spark, path):
    V.commit_snapshot(_kv(spark, 0, 10), path, mode="overwrite")
    before = {
        r.k: r._row_id
        for r in V.read_snapshot(spark, path, with_lineage=True).collect()
    }
    V.update_where(spark, path, {"v": "v * 10"}, "k < 5")
    after = {
        r.k: r._row_id
        for r in V.read_snapshot(spark, path, with_lineage=True).collect()
    }
    assert after == before  # UPDATE mutates rows, ids stable


def test_update_respects_constraints(spark, path):
    V.commit_snapshot(_kv(spark, 0, 5), path, mode="overwrite")
    V.add_constraint(spark, path, "v_nonneg", "v >= 0")
    with pytest.raises(V.ConstraintViolation, match="update_where"):
        V.update_where(spark, path, {"v": "v - 100"}, "k = 3")
    assert V.latest_version(path) == 1  # nothing committed


def test_update_validations(spark, path):
    V.commit_snapshot(_kv(spark, 0, 5), path, mode="overwrite")
    with pytest.raises(ValueError, match="no column"):
        V.update_where(spark, path, {"zz": "1"})
    with pytest.raises(ValueError, match="at least one"):
        V.update_where(spark, path, {})
    V.delete_where_mor(spark, path, F.col("k") == 0)
    with pytest.raises(ValueError, match="deletion vector"):
        V.update_where(spark, path, {"v": "1"})


def test_update_partition_column_refused(spark, path):
    df = spark.range(0, 12).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("part")
    )
    V.commit_snapshot(df, path, mode="overwrite", partition_by=["part"])
    with pytest.raises(ValueError, match="partition column"):
        V.update_where(spark, path, {"part": "0"})


def test_cdc_over_update_only_changed_rows(spark, path):
    V.commit_snapshot(_kv(spark, 0, 10), path, mode="overwrite")
    V.update_where(spark, path, {"v": "v + 1"}, "k IN (2, 7)")
    ch = sorted(
        (r._change_type, r.k, r.v)
        for r in V.table_changes(spark, path, 0, 1).collect()
    )
    assert ch == [
        ("delete", 2, 4), ("delete", 7, 14),
        ("insert", 2, 5), ("insert", 7, 15),
    ]


def test_table_api_end_to_end_lifecycle(spark, path):
    t = Table(spark, path)
    assert not t.exists
    t.write(_kv(spark, 0, 20)).append(_kv(spark, 20, 30))
    assert t.version == 1 and t.read().count() == 30
    t.add_constraint("v_nonneg", "v >= 0")
    t.update({"v": "v + 1"}, where="k = 0")
    assert t.read().filter("k = 0").first().v == 1
    t.delete("k >= 25")
    assert t.read().count() == 25
    src = spark.createDataFrame([(1, 999), (50, 100)], "k bigint, v bigint")
    t.merge(
        src, on="k",
        matched=[{"action": "update", "set": "all"}],
        not_matched=[{"action": "insert", "values": "all"}],
    )
    got = {r.k: r.v for r in t.read().collect()}
    assert got[1] == 999 and got[50] == 100
    # metadata surfaces
    assert t.files().count() >= 1
    assert t.history().count() == t.version + 1
    r = t.agg({"n": ("count", "*")}).first()
    assert (r.n, r._served_from) == (26, "manifest")
    assert t.constraints() == {"v_nonneg": "v >= 0"}
    # history ops
    v = t.version
    t.restore(0)
    assert t.read().count() == 20 and t.version == v + 1
    # maintenance chain + orphan sweep
    t.optimize().vacuum(keep_last=1)
    assert t.remove_orphans(older_than_ms=0) == []
    # evolution chain
    t.rename_column("k", "key").add_column("tag", "string", default="x")
    assert t.read().columns == ["key", "v", "tag"]
    t.drop()
    assert not t.exists
