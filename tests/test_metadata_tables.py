"""Metadata tables + metadata-only aggregates
(sinks/versioned.py::table_files / table_partitions / manifest_agg):
the $files/$partitions inspection surface and the COUNT/MIN/MAX
push-down that answers from the manifest without opening a single
data file — with exactness guards (live DV / eq-deletes / stats-less
files) that force a real scan instead of ever returning a wrong
answer.

Reference parity note: the reference has no table metadata at all
(outputs are opaque ZIPs, contextual_pipeline.rs:1164-1229); this is
engine-side extension surface mirroring Iceberg's metadata tables and
scan-less aggregate push-down."""

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


def test_table_files_matches_manifest(spark, table):
    V.commit_snapshot(_kv(spark, 0, 100).repartition(4), table,
                      mode="overwrite")
    got = V.table_files(spark, table).collect()
    m = V.read_manifest(table, 0)
    assert len(got) == len(m["files"]) == 4
    assert sum(r.n_rows for r in got) == 100
    assert all(r.n_bytes > 0 and not r.lineage_materialized for r in got)
    assert {r.path for r in got} == {e["path"] for e in m["files"]}


def test_table_files_time_travel(spark, table):
    V.commit_snapshot(_kv(spark, 0, 10), table, mode="overwrite")
    V.commit_snapshot(_kv(spark, 10, 30), table, mode="append")
    assert (
        V.table_files(spark, table, version=0)
        .agg(F.sum("n_rows")).first()[0] == 10
    )
    assert (
        V.table_files(spark, table).agg(F.sum("n_rows")).first()[0] == 30
    )


def test_table_partitions_aggregates_by_partition(spark, table):
    df = spark.range(0, 60).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("part")
    )
    V.commit_snapshot(df, table, mode="overwrite", partition_by=["part"])
    got = {
        tuple(sorted((r.partition or {}).items())): (r.n_files, r.n_rows)
        for r in V.table_partitions(spark, table).collect()
    }
    assert set(got) == {
        (("part", "0"),), (("part", "1"),), (("part", "2"),),
    }
    assert all(rows == 20 for _files, rows in got.values())


def test_table_partitions_flat_table_single_null_row(spark, table):
    V.commit_snapshot(_kv(spark, 0, 10), table, mode="overwrite")
    got = V.table_partitions(spark, table).collect()
    assert len(got) == 1 and got[0].partition is None
    assert got[0].n_rows == 10


def test_manifest_agg_count_min_max_from_metadata(spark, table):
    V.commit_snapshot(_kv(spark, 5, 105).repartition(4), table,
                      mode="overwrite")
    r = V.manifest_agg(
        spark, table,
        {"n": ("count", "*"), "lo": ("min", "k"), "hi": ("max", "v")},
    ).first()
    assert (r.n, r.lo, r.hi, r._served_from) == (100, 5, 208, "manifest")


def test_manifest_agg_live_dv_falls_back_to_scan(spark, table):
    V.commit_snapshot(_kv(spark, 0, 20), table, mode="overwrite")
    V.delete_where_mor(spark, table, F.col("k") < 5)
    r = V.manifest_agg(
        spark, table, {"n": ("count", "*"), "lo": ("min", "k")}
    ).first()
    assert (r.n, r.lo, r._served_from) == (15, 5, "scan")
    with pytest.raises(ValueError, match="fallback=False"):
        V.manifest_agg(
            spark, table, {"n": ("count", "*")}, fallback=False
        )


def test_manifest_agg_eq_deletes_fall_back(spark, table):
    V.commit_snapshot(_kv(spark, 0, 10), table, mode="overwrite")
    src = spark.createDataFrame([(3, 999), (42, 84)], "k bigint, v bigint")
    V.stream_upsert_batch(src, batch_id=0, table=table, key="k")
    r = V.manifest_agg(
        spark, table, {"n": ("count", "*"), "hi": ("max", "v")}
    ).first()
    assert (r.n, r.hi, r._served_from) == (11, 999, "scan")
    # after compaction the metadata path serves again
    V.compact_eq_deletes(spark, table)
    r = V.manifest_agg(
        spark, table, {"n": ("count", "*"), "hi": ("max", "v")}
    ).first()
    assert (r.n, r.hi, r._served_from) == (11, 999, "manifest")


def test_manifest_agg_min_max_across_rename(spark, table):
    V.commit_snapshot(_kv(spark, 0, 50), table, mode="overwrite")
    V.rename_column(table, "v", "val")
    r = V.manifest_agg(spark, table, {"hi": ("max", "val")}).first()
    assert (r.hi, r._served_from) == (98, "manifest")


def test_manifest_agg_added_column_default(spark, table):
    V.commit_snapshot(_kv(spark, 0, 10), table, mode="overwrite")
    V.add_column(table, "score", "long", default=7)
    r = V.manifest_agg(
        spark, table, {"lo": ("min", "score"), "hi": ("max", "score")}
    ).first()
    # every row predates the column -> both extremes are the default
    assert (r.lo, r.hi, r._served_from) == (7, 7, "manifest")


def test_manifest_agg_added_column_no_default_all_null(spark, table):
    V.commit_snapshot(_kv(spark, 0, 10), table, mode="overwrite")
    V.add_column(table, "score", "long")
    r = V.manifest_agg(spark, table, {"lo": ("min", "score")}).first()
    assert (r.lo, r._served_from) == (None, "manifest")


def test_manifest_agg_string_min_max(spark, table):
    df = spark.createDataFrame(
        [(1, "apple"), (2, "zebra"), (3, "mango")], "k bigint, s string"
    )
    V.commit_snapshot(df.repartition(2), table, mode="overwrite")
    r = V.manifest_agg(
        spark, table, {"lo": ("min", "s"), "hi": ("max", "s")}
    ).first()
    assert (r.lo, r.hi, r._served_from) == ("apple", "zebra", "manifest")


def test_manifest_agg_rejects_bad_specs(spark, table):
    V.commit_snapshot(_kv(spark, 0, 5), table, mode="overwrite")
    with pytest.raises(ValueError, match="count/min/max"):
        V.manifest_agg(spark, table, {"s": ("sum", "v")})
    with pytest.raises(ValueError, match="COUNT"):
        V.manifest_agg(spark, table, {"n": ("count", "v")})
    with pytest.raises(ValueError, match="unknown column"):
        V.manifest_agg(spark, table, {"lo": ("min", "nope")})


def test_manifest_agg_matches_scan_on_every_version(spark, table):
    V.commit_snapshot(_kv(spark, 0, 30).repartition(3), table,
                      mode="overwrite")
    V.commit_snapshot(_kv(spark, 30, 40), table, mode="append")
    V.delete_where(spark, table, F.col("k") % 2 == 0)
    for ver in (0, 1, 2):
        fast = V.manifest_agg(
            spark, table,
            {"n": ("count", "*"), "lo": ("min", "k"), "hi": ("max", "k")},
            version=ver,
        ).first()
        slow = V.read_snapshot(spark, table, version=ver).agg(
            F.count(F.lit(1)), F.min("k"), F.max("k")
        ).first()
        assert fast._served_from == "manifest"
        assert (fast.n, fast.lo, fast.hi) == tuple(slow)
