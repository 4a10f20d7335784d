"""Shallow CLONE + in-place parquet import
(sinks/versioned.py::clone_table / add_parquet_files): zero-copy table
birth referencing external files by relative path, with the
external_files header flag kept EXACT across every commit mode, and
the FULL op surface (MoR deletes, streaming upserts, CDC, lineage)
working on external files from birth — position extraction resolves
each external directory back to its manifest-relative ../ path. The
public Delta SHALLOW CLONE / Iceberg add_files designs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from small_etl_spark.sinks import versioned as V


@pytest.fixture()
def roots(tmp_path):
    return str(tmp_path / "src"), str(tmp_path / "dst")


def _kv(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def test_clone_is_zero_copy_and_reads_identically(spark, roots):
    src, dst = roots
    V.commit_snapshot(_kv(spark, 0, 50).repartition(4), src,
                      mode="overwrite")
    V.commit_snapshot(_kv(spark, 50, 60), src, mode="append")
    V.clone_table(src, dst)
    got = {(r.k, r.v) for r in V.read_snapshot(spark, dst).collect()}
    assert got == {(k, 2 * k) for k in range(60)}
    # zero-copy: the clone owns no data files of its own
    assert not os.path.isdir(os.path.join(dst, "data"))
    m = V.read_manifest(dst, 0)
    assert m["mode"] == "clone" and m["external_files"]
    assert all(e["path"].startswith("..") for e in m["files"])


def test_clone_diverges_independently(spark, roots):
    src, dst = roots
    V.commit_snapshot(_kv(spark, 0, 10), src, mode="overwrite")
    V.clone_table(src, dst)
    V.commit_snapshot(_kv(spark, 10, 15), dst, mode="append")
    V.delete_where(spark, dst, F.col("k") < 2)
    # source unchanged; clone evolved
    assert V.read_snapshot(spark, src).count() == 10
    assert V.read_snapshot(spark, dst).count() == 13
    assert V.latest_version(src) == 0
    # stats/pruning work on the clone from birth
    kept, total = V.plan_files(dst, where=[("k", ">=", 12)])
    assert len(kept) < total


def test_clone_of_version_and_properties(spark, roots):
    src, dst = roots
    V.commit_snapshot(_kv(spark, 0, 10), src, mode="overwrite")
    V.add_constraint(spark, src, "v_nonneg", "v >= 0")
    V.commit_snapshot(_kv(spark, 10, 20), src, mode="append")
    V.clone_table(src, dst, version=2)
    assert V.read_snapshot(spark, dst).count() == 20
    # the constraint came along and is enforced on the clone
    assert V.list_constraints(dst) == {"v_nonneg": "v >= 0"}
    with pytest.raises(V.ConstraintViolation):
        V.commit_snapshot(
            spark.createDataFrame([(1, -1)], "k bigint, v bigint"),
            dst, mode="append",
        )


def test_position_ops_work_on_external_files(spark, roots):
    """MoR delete + streaming upsert + CDC all work on a fresh clone:
    position extraction resolves external dirs to ../ paths."""
    src, dst = roots
    V.commit_snapshot(_kv(spark, 0, 40).repartition(8), src,
                      mode="overwrite")
    V.clone_table(src, dst)
    V.delete_where_mor(spark, dst, F.col("k") < 3)
    assert V.read_snapshot(spark, dst).count() == 37
    V.compact_dv(spark, dst)
    V.stream_upsert_batch(
        spark.createDataFrame([(5, 500), (99, 990)],
                              "k bigint, v bigint"),
        batch_id=0, table=dst, key="k",
    )
    vals = {r.k: r.v for r in V.read_snapshot(spark, dst).collect()}
    assert vals[5] == 500 and vals[99] == 990 and len(vals) == 38
    # source untouched through all of it
    assert V.read_snapshot(spark, src).count() == 40


def test_optimize_localizes_and_clears_flag(spark, roots):
    src, dst = roots
    V.commit_snapshot(_kv(spark, 0, 40).repartition(8), src,
                      mode="overwrite")
    V.clone_table(src, dst)
    V.optimize_snapshot(spark, dst, target_bytes=1 << 30)
    m = V.read_manifest(dst, V.latest_version(dst))
    assert m["external_files"] is False
    assert all(not e["path"].startswith("..") for e in m["files"])
    V.delete_where_mor(spark, dst, F.col("k") < 3)
    assert V.read_snapshot(spark, dst).count() == 37
    # and the clone survives a source vacuum once localized
    V.commit_snapshot(_kv(spark, 0, 1), src, mode="overwrite")
    V.vacuum(src, keep_last=1)
    assert V.read_snapshot(spark, dst).count() == 37


def test_clone_refuses_dv_eq_identity_partitions(spark, roots, tmp_path):
    src, dst = roots
    V.commit_snapshot(_kv(spark, 0, 10), src, mode="overwrite")
    V.delete_where_mor(spark, src, F.col("k") == 0)
    with pytest.raises(ValueError, match="deletion vector"):
        V.clone_table(src, dst)
    part = str(tmp_path / "part")
    df = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("p")
    )
    V.commit_snapshot(df, part, mode="overwrite", partition_by=["p"])
    with pytest.raises(ValueError, match="identity-partitioned"):
        V.clone_table(part, dst)
    with pytest.raises(ValueError, match="already exists"):
        V.clone_table(src, src)


def test_add_parquet_files_in_place(spark, roots):
    src, dst = roots
    _kv(spark, 0, 30).repartition(3).write.parquet(src)
    V.add_parquet_files(spark, src, dst)
    m = V.read_manifest(dst, 0)
    assert m["mode"] == "import" and m["external_files"]
    got = {(r.k, r.v) for r in V.read_snapshot(spark, dst).collect()}
    assert got == {(k, 2 * k) for k in range(30)}
    # footer stats were harvested: pruning works immediately
    kept, total = V.plan_files(dst, where=[("k", "=", -1)])
    assert len(kept) == 0 and total == 3
    # row lineage ranges were assigned at import
    ids = sorted(e["first_row_id"] for e in m["files"])
    assert ids[0] == 0 and m["next_row_id"] == 30
    # the imported table is immediately a full table
    V.commit_snapshot(_kv(spark, 30, 35), dst, mode="append")
    V.update_where(spark, dst, {"v": "v + 1"}, "k = 0")
    assert V.read_snapshot(spark, dst).count() == 35


def test_add_parquet_files_refuses_hive_and_existing(spark, roots):
    src, dst = roots
    df = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("p")
    )
    df.write.partitionBy("p").parquet(src)
    with pytest.raises(ValueError, match="hive-partitioned"):
        V.add_parquet_files(spark, src, dst)
    V.commit_snapshot(_kv(spark, 0, 3), dst, mode="overwrite")
    with pytest.raises(ValueError, match="already exists"):
        V.add_parquet_files(spark, src, dst)
