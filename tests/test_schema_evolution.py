"""Column-ID schema evolution: rename/drop/widen/add as metadata-only
commits (sinks/versioned.py). The public Iceberg column-ID contract:
names are lookup keys, ids are identities — old files keep serving
through their id mapping, no data rewrite ever.

Reference parity note: the reference engine rewrites whole outputs per
run (src/app/pipelines/contextual_pipeline.rs:1017-1229) and has no
notion of an evolving persistent table; this layer is engine-side
extension surface, tested against the public Iceberg/Delta semantics.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from small_etl_spark.sinks import versioned as V


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).cast("int").alias("x"),
        F.lit(tag).alias("tag"),
    )


def test_rename_is_metadata_only(spark, table):
    V.commit_snapshot(_df(spark, 0, 50), table, mode="overwrite")
    files_before = {e["path"] for e in V.read_manifest(table, 0)["files"]}
    v = V.rename_column(table, "x", "score")
    m = V.read_manifest(table, v)
    assert {e["path"] for e in m["files"]} == files_before, (
        "rename must not touch a single data file"
    )
    got = V.read_snapshot(spark, table)
    assert got.columns == ["k", "score", "tag"]
    assert got.agg(F.sum("score")).first()[0] == sum(2 * i for i in range(50))
    # id stable across the rename
    assert m["column_ids"]["score"] == 2


def test_rename_validation(spark, table):
    V.commit_snapshot(_df(spark, 0, 5), table, mode="overwrite")
    with pytest.raises(V.SchemaEvolutionError, match="no column"):
        V.rename_column(table, "nope", "y")
    with pytest.raises(V.SchemaEvolutionError, match="already exists"):
        V.rename_column(table, "x", "tag")


def test_mixed_generation_read_and_append(spark, table):
    """Files written before AND after a rename resolve into one
    DataFrame; the post-rename append stamps the new physical name."""
    V.commit_snapshot(_df(spark, 0, 10), table, mode="overwrite")
    V.rename_column(table, "x", "score")
    post = spark.range(10, 15).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).cast("int").alias("score"),
        F.lit("b").alias("tag"),
    )
    V.commit_snapshot(post, table, mode="append")
    got = V.read_snapshot(spark, table)
    assert got.count() == 15
    assert got.agg(F.sum("score")).first()[0] == sum(2 * i for i in range(15))
    # both physical generations present in the manifest
    m = V.read_manifest(table, V.latest_version(table))
    phys = {
        c[1] for e in m["files"] for c in e["cols"] if c[0] == 2
    }
    assert phys == {"x", "score"}


def test_time_travel_across_evolution(spark, table):
    V.commit_snapshot(_df(spark, 0, 10), table, mode="overwrite")
    V.rename_column(table, "x", "score")
    V.widen_type(table, "score", "long")
    # pre-evolution snapshot still reads under its own names/types
    v0 = V.read_snapshot(spark, table, version=0)
    assert v0.columns == ["k", "x", "tag"]
    assert v0.schema["x"].dataType.simpleString() == "int"
    latest = V.read_snapshot(spark, table)
    assert latest.schema["score"].dataType.simpleString() == "bigint"
    assert latest.agg(F.sum("score")).first()[0] == 90


def test_widen_guards(spark, table):
    V.commit_snapshot(_df(spark, 0, 5), table, mode="overwrite")
    with pytest.raises(V.SchemaEvolutionError, match="not a safe widening"):
        V.widen_type(table, "k", "integer")  # narrowing long->int
    with pytest.raises(V.SchemaEvolutionError, match="not a safe widening"):
        V.widen_type(table, "tag", "long")  # cross-family
    V.widen_type(table, "x", "long")  # int->bigint ok
    # append with the widened type now passes schema enforcement
    V.commit_snapshot(
        spark.range(5, 8).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).alias("x"),
            F.lit("b").alias("tag"),
        ),
        table,
        mode="append",
    )
    assert V.read_snapshot(spark, table).count() == 8


def test_drop_guards_and_fresh_id_on_readd(spark, table):
    V.commit_snapshot(_df(spark, 0, 10), table, mode="overwrite")
    with pytest.raises(V.SchemaEvolutionError, match="no column"):
        V.drop_column(table, "nope")
    V.drop_column(table, "x")
    assert V.read_snapshot(spark, table).columns == ["k", "tag"]
    # re-adding the NAME creates a NEW column: old bytes stay invisible
    V.add_column(table, "x", "integer")
    got = V.read_snapshot(spark, table)
    assert got.filter(F.col("x").isNotNull()).count() == 0, (
        "re-added column must NOT resurrect dropped data (fresh id)"
    )
    m = V.read_manifest(table, V.latest_version(table))
    assert m["column_ids"]["x"] == 4  # not the retired id 2


def test_drop_last_column_refused(spark, table):
    V.commit_snapshot(
        spark.range(3).select(F.col("id").alias("k")), table,
        mode="overwrite",
    )
    with pytest.raises(V.SchemaEvolutionError, match="last column"):
        V.drop_column(table, "k")


def test_pruning_survives_rename(spark, table):
    """Footer stats and blooms are keyed by each file's physical name;
    predicates on the NEW name must still translate and prune."""
    docs = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("int").alias("x")
    )
    V.commit_snapshot(
        docs.repartitionByRange(8, "k"), table, mode="overwrite",
        bloom_columns=["k"],
    )
    V.rename_column(table, "k", "key")
    kept, total = V.plan_files(table, where=[("key", ">=", 3500)])
    assert 0 < len(kept) < total, "stats pruning must fire across rename"
    kept2, _ = V.plan_files(table, where=[("key", "=", 123)])
    assert 0 < len(kept2) < total, "bloom pruning must fire across rename"
    got = V.read_snapshot(spark, table, where=[("key", "=", 123)]).filter(
        F.col("key") == 123
    )
    assert got.count() == 1


def test_pre_column_files_prune_outright(spark, table):
    V.commit_snapshot(_df(spark, 0, 10), table, mode="overwrite")
    V.add_column(table, "extra", "long")
    V.commit_snapshot(
        spark.range(10, 20).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).cast("int").alias("x"),
            F.lit("b").alias("tag"),
            F.col("id").alias("extra"),
        ),
        table,
        mode="append",
    )
    n_old = len(V.read_manifest(table, 0)["files"])
    kept, total = V.plan_files(table, where=[("extra", ">=", 0)])
    assert total - len(kept) >= n_old, (
        "files predating a column are all-null there: prune them all"
    )
    got = V.read_snapshot(spark, table)
    assert got.filter(F.col("extra").isNull()).count() == 10


def test_rename_identity_partition_column(spark, table):
    """An identity-partitioned table's hive paths carry the OLD name;
    reads reconstruct via the physical schema, then alias to the new
    name. Appends must use the RENAMED partition_by spec."""
    df = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("p")
    )
    V.commit_snapshot(df, table, mode="overwrite", partition_by=["p"])
    V.rename_column(table, "p", "bucket_id")
    got = V.read_snapshot(spark, table)
    assert sorted(got.columns) == ["bucket_id", "k"]
    assert got.groupBy("bucket_id").count().count() == 4
    m = V.read_manifest(table, V.latest_version(table))
    assert m["partition_by"] == ["bucket_id"]
    # partition pruning on the new name still exact
    kept, total = V.plan_files(table, where=[("bucket_id", "=", 2)])
    assert 0 < len(kept) < total
    # appends speak the new spec
    V.commit_snapshot(
        spark.range(40, 48).select(
            F.col("id").alias("k"), (F.col("id") % 4).alias("bucket_id")
        ),
        table,
        mode="append",
        partition_by=["bucket_id"],
    )
    assert V.read_snapshot(spark, table).count() == 48


def test_rename_hidden_partition_base_column(spark, table):
    df = spark.range(0, 30).select(
        F.col("id").alias("k"),
        F.to_timestamp(
            F.concat(F.lit("2024-01-0"), (F.col("id") % 3 + 1))
        ).alias("ts"),
    )
    V.commit_snapshot(df, table, mode="overwrite", partition_by=["day(ts)"])
    V.rename_column(table, "ts", "event_ts")
    m = V.read_manifest(table, V.latest_version(table))
    assert m["partition_by"] == ["day(event_ts)"]
    # transform pruning through the renamed base column
    kept, total = V.plan_files(
        table, where=[("event_ts", "=", "2024-01-02 00:00:00")]
    )
    assert 0 < len(kept) < total
    got = V.read_snapshot(spark, table)
    assert got.columns == ["k", "event_ts"]
    assert got.count() == 30


def test_mor_delete_on_renamed_column(spark, table):
    """delete_where_mor with a predicate on the NEW name must hit rows
    in files physically written under the OLD name."""
    V.commit_snapshot(_df(spark, 0, 100), table, mode="overwrite")
    V.rename_column(table, "x", "score")
    V.delete_where_mor(spark, table, F.col("score") < 40)  # k<20
    got = V.read_snapshot(spark, table)
    assert got.count() == 80
    assert got.agg(F.min("score")).first()[0] == 40
    # compaction materializes under the new name
    V.compact_dv(spark, table)
    got2 = V.read_snapshot(spark, table)
    assert got2.count() == 80 and got2.columns == ["k", "score", "tag"]


def test_eq_delete_key_rename_and_upsert(spark, table):
    """Rename the live equality-delete KEY mid-upsert-stream: carried
    delete files keep their stored name, new batches write the new
    name, reads resolve both."""
    def kv(rows):
        return spark.createDataFrame(rows, "k LONG, v STRING")

    V.stream_upsert_batch(kv([(1, "a1"), (2, "a2")]), 0, table, key="k")
    V.stream_upsert_batch(kv([(2, "b2"), (3, "b3")]), 1, table, key="k")
    V.rename_column(table, "k", "kid")
    m = V.read_manifest(table, V.latest_version(table))
    assert all(d["key"] == "kid" for d in m["eq_deletes"])
    assert all(d.get("stored_as", "k") == "k" for d in m["eq_deletes"])
    got = {r.kid: r.v for r in V.read_snapshot(spark, table).collect()}
    assert got == {1: "a1", 2: "b2", 3: "b3"}
    # further upserts on the NEW key name
    V.stream_upsert_batch(
        spark.createDataFrame([(3, "c3"), (4, "c4")], "kid LONG, v STRING"),
        2, table, key="kid",
    )
    got = {r.kid: r.v for r in V.read_snapshot(spark, table).collect()}
    assert got == {1: "a1", 2: "b2", 3: "c3", 4: "c4"}
    # compaction folds everything under the current name
    V.compact_eq_deletes(spark, table)
    got = {r.kid: r.v for r in V.read_snapshot(spark, table).collect()}
    assert got == {1: "a1", 2: "b2", 3: "c3", 4: "c4"}
    # the key could not be dropped while deletes were live
    # (list is clear now, so drop of the non-key column works)
    V.drop_column(table, "v")
    assert V.read_snapshot(spark, table).columns == ["kid"]


def test_drop_live_eq_key_refused(spark, table):
    def kv(rows):
        return spark.createDataFrame(rows, "k LONG, v STRING")

    V.stream_upsert_batch(kv([(1, "a")]), 0, table, key="k")
    V.stream_upsert_batch(kv([(1, "b")]), 1, table, key="k")
    with pytest.raises(V.SchemaEvolutionError, match="equality-delete"):
        V.drop_column(table, "k")


def test_cdc_across_rename_with_merge(spark, table):
    """General-path CDC spanning a rename: the update's delete+insert
    pair must align BY ID (the old row surfaces under the new name)."""
    V.commit_snapshot(_df(spark, 0, 20), table, mode="overwrite")
    V.rename_column(table, "x", "score")
    src = spark.createDataFrame(
        [(5, 999, "upd")], "k LONG, score INT, tag STRING"
    )
    V.merge_upsert(spark, table, src, key="k")
    ch = V.table_changes(spark, table, 0)
    by_type = {
        r._change_type: r
        for r in ch.groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("score").alias("s"))
        .collect()
    }
    # one logical update: delete(old k=5, score=10) + insert(score=999)
    assert by_type["delete"].n == 1 and by_type["delete"].s == 10
    assert by_type["insert"].n == 1 and by_type["insert"].s == 999
    assert ch.columns == ["k", "score", "tag", "_change_type"]


def test_cdc_widen_alignment(spark, table):
    V.commit_snapshot(_df(spark, 0, 10), table, mode="overwrite")
    V.widen_type(table, "x", "long")
    V.delete_where(spark, table, F.col("x") >= 10)  # drops k>=5
    ch = V.table_changes(spark, table, 0)
    assert ch.schema["x"].dataType.simpleString() == "bigint"
    dels = ch.filter(F.col("_change_type") == "delete")
    assert dels.count() == 5
    assert dels.agg(F.sum("x")).first()[0] == sum(2 * k for k in range(5, 10))


def test_legacy_table_upgrade_on_first_evolution(spark, table):
    """A pre-column-id table (no column_ids header, no entry cols)
    upgrades on its first evolution op: ids assigned in field order,
    every entry restamped in ONE metadata commit, data untouched."""
    V.commit_snapshot(_df(spark, 0, 10), table, mode="overwrite")
    V.commit_snapshot(_df(spark, 10, 20, "b"), table, mode="append")
    # surgically strip the id metadata to simulate a legacy table
    for v in (0, 1):
        p = V._manifest_path(table, v)
        with open(p) as fh:
            m = json.load(fh)
        m.pop("column_ids", None)
        m.pop("next_column_id", None)
        for e in m.get("files", []) + m.get("add", []):
            e.pop("cols", None)
        os.remove(p)
        assert V._atomic_create(p, m)
    assert V.read_manifest(table, 1).get("column_ids") is None
    v = V.rename_column(table, "x", "score")
    m = V.read_manifest(table, v)
    assert m["column_ids"] == {"k": 1, "score": 2, "tag": 3}
    assert all(e.get("cols") for e in m["files"]), "upgrade restamps all"
    got = V.read_snapshot(spark, table)
    assert got.columns == ["k", "score", "tag"]
    assert got.count() == 20
    assert got.agg(F.sum("score")).first()[0] == sum(2 * i for i in range(20))


def test_evolution_occ_retry(spark, table, monkeypatch):
    """Evolution commits are metadata-only and re-plannable: losing a
    race to a concurrent append must retry against the new head, not
    fail."""
    V.commit_snapshot(_df(spark, 0, 10), table, mode="overwrite")
    real_create = V._atomic_create
    state = {"raced": False}

    def racing_create(path, payload):
        if payload.get("mode") == "rename_column" and not state["raced"]:
            state["raced"] = True
            V.commit_snapshot(_df(spark, 10, 15, "b"), table, mode="append")
            return False
        return real_create(path, payload)

    monkeypatch.setattr(V, "_atomic_create", racing_create)
    v = V.rename_column(table, "x", "score")
    assert v == 2  # append won v1; rename retried and landed at v2
    got = V.read_snapshot(spark, table)
    assert got.count() == 15 and "score" in got.columns


def test_evolution_on_wap_branch_publishes(spark, table):
    """Branches evolve like tables; publish fast-forwards main to the
    evolved schema."""
    V.commit_snapshot(_df(spark, 0, 10), table, mode="overwrite")
    br = V.branch_create(table, "evolve")
    V.rename_column(br, "x", "score")
    V.commit_snapshot(
        spark.range(10, 12).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).cast("int").alias("score"),
            F.lit("b").alias("tag"),
        ),
        br,
        mode="append",
    )
    assert V.read_snapshot(spark, table).columns == ["k", "x", "tag"]
    V.branch_publish(table, "evolve")
    got = V.read_snapshot(spark, table)
    assert got.columns == ["k", "score", "tag"]
    assert got.count() == 12


def test_vacuum_and_history_across_evolution(spark, table):
    V.commit_snapshot(_df(spark, 0, 10), table, mode="overwrite")
    V.rename_column(table, "x", "score")
    V.commit_snapshot(
        spark.range(10, 12).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).cast("int").alias("score"),
            F.lit("b").alias("tag"),
        ),
        table,
        mode="append",
    )
    hist = V.snapshot_history(spark, table)
    assert [r.mode for r in hist.orderBy("snapshot").collect()] == [
        "overwrite", "rename_column", "append",
    ]
    deleted = V.vacuum(table, keep_last=1)
    assert deleted == 0  # rename/append share v0's files: all still live
    got = V.read_snapshot(spark, table)
    assert got.count() == 12 and "score" in got.columns


def test_resolution_projection_stays_jvm_side(spark, table):
    """The per-generation resolution Project must be transparent to
    Catalyst: a filter on the RENAMED+WIDENED column pushes down to
    the parquet scan as a DataFilter on the PHYSICAL column, and no
    Python appears in the plan — at 100 TB the rename must not cost
    the scan its pushdown."""
    df = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") * 2).cast("int").alias("x")
    )
    V.commit_snapshot(df.repartitionByRange(4, "k"), table, mode="overwrite")
    V.rename_column(table, "x", "score")
    V.widen_type(table, "score", "long")
    q = (
        V.read_snapshot(spark, table)
        .filter(F.col("score") > 39000)
        .select("k", "score")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, "resolution must stay JVM-side"
    scan_lines = [l for l in plan.splitlines() if "FileScan" in l]
    assert any(
        "DataFilters" in l and "x#" in l.split("DataFilters")[1][:80]
        for l in scan_lines
    ), f"filter must push through the rename Project to the scan: {scan_lines}"
    assert q.count() == 499


def test_mixed_generations_one_scan_per_generation(spark, table):
    """N schema generations -> N scans unioned, not N×files scans and
    not one scan per file: the resolution groups by PLAN, so plan
    size stays O(generations), which is O(evolution ops), not
    O(table)."""
    V.commit_snapshot(_df(spark, 0, 10), table, mode="overwrite")
    V.rename_column(table, "x", "s1")
    V.commit_snapshot(
        spark.range(10, 20).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).cast("int").alias("s1"),
            F.lit("b").alias("tag"),
        ),
        table, mode="append",
    )
    V.rename_column(table, "s1", "s2")
    V.commit_snapshot(
        spark.range(20, 30).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).cast("int").alias("s2"),
            F.lit("c").alias("tag"),
        ),
        table, mode="append",
    )
    q = V.read_snapshot(spark, table)
    plan = q._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("FileScan")
    assert n_scans == 3, (
        f"3 physical layouts (x | s1 | s2) -> 3 scans, plan has {n_scans}"
    )
    assert q.count() == 30
    # another commit under the CURRENT schema joins the identity
    # group: scan count tracks schema GENERATIONS, never commits/files
    V.commit_snapshot(
        spark.range(30, 40).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).cast("int").alias("s2"),
            F.lit("d").alias("tag"),
        ),
        table, mode="append",
    )
    q2 = V.read_snapshot(spark, table)
    plan2 = q2._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("FileScan") == 3, "same-schema commits share a scan"
    assert q2.count() == 40


def test_add_column_initial_default(spark, table):
    """Iceberg-v3-style INITIAL DEFAULT: pre-add files read the
    constant (metadata-only backfill); post-add files store real
    values including real nulls; pruning and CDC honor it."""
    V.commit_snapshot(_df(spark, 0, 10), table, mode="overwrite")
    V.add_column(table, "lang", "string", default="en")
    got = V.read_snapshot(spark, table)
    assert got.filter(F.col("lang") == "en").count() == 10
    # post-add rows keep their written values — including real nulls
    V.commit_snapshot(
        spark.range(10, 14).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).cast("int").alias("x"),
            F.lit("b").alias("tag"),
            F.when(F.col("id") % 2 == 0, F.lit("fr")).alias("lang"),
        ),
        table,
        mode="append",
    )
    got = V.read_snapshot(spark, table)
    assert got.filter(F.col("lang") == "en").count() == 10
    assert got.filter(F.col("lang") == "fr").count() == 2
    assert got.filter(F.col("lang").isNull()).count() == 2, (
        "the default must never overwrite a post-add real null"
    )
    # pruning: '= default' must keep every PRE-add file (they all
    # read the default); stats may still drop post-add files that
    # hold only other values. '= other' drops all pre-add files.
    n_pre = len(V.read_manifest(table, 0)["files"])
    kept_en, total = V.plan_files(table, where=[("lang", "=", "en")])
    assert len(kept_en) >= n_pre, "default matches pre-add files"
    en = V.read_snapshot(spark, table, where=[("lang", "=", "en")])
    assert en.filter(F.col("lang") == "en").count() == 10
    kept_fr, _ = V.plan_files(table, where=[("lang", "=", "fr")])
    assert len(kept_fr) <= total - n_pre, (
        "pre-add files cannot hold a non-default value"
    )
    # CDC across a rewrite spanning the add: old side reads the default
    V.delete_where(spark, table, F.col("k") == 3)
    ch = V.table_changes(spark, table, 0).filter(
        F.col("_change_type") == "delete"
    )
    assert [(r.k, r.lang) for r in ch.collect()] == [(3, "en")]
    # time travel to pre-add shows no lang at all
    assert "lang" not in V.read_snapshot(spark, table, version=0).columns


def test_partition_spec_evolution(spark, table):
    """set_partition_spec: metadata-only spec change; old files keep
    their layout (and pruning), new appends write the new layout,
    and OPTIMIZE migrates everything — the Iceberg progressive
    migration story."""
    df = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("p")
    )
    V.commit_snapshot(df, table, mode="overwrite")  # unpartitioned
    files_v0 = {e["path"] for e in V.read_manifest(table, 0)["files"]}
    v = V.set_partition_spec(table, ["p"])
    m = V.read_manifest(table, v)
    assert m["partition_by"] == ["p"]
    assert {e["path"] for e in m["files"]} == files_v0, "no file moved"
    # appends now REQUIRE (and write) the new layout
    with pytest.raises(ValueError, match="partitioning"):
        V.commit_snapshot(
            spark.range(40, 44).select(
                F.col("id").alias("k"), (F.col("id") % 4).alias("p")
            ),
            table, mode="append",
        )
    V.commit_snapshot(
        spark.range(40, 48).select(
            F.col("id").alias("k"), (F.col("id") % 4).alias("p")
        ),
        table, mode="append", partition_by=["p"],
    )
    got = V.read_snapshot(spark, table)
    assert got.count() == 48
    # pruning fires for the new hive files; old flat files stay
    # (stats may prune them too, but never a wrong drop)
    kept, total = V.plan_files(table, where=[("p", "=", 2)])
    assert len(kept) < total
    sat = V.read_snapshot(spark, table, where=[("p", "=", 2)]).filter(
        F.col("p") == 2
    )
    assert sat.count() == 12
    # OPTIMIZE migrates old files into the new layout
    v2 = V.optimize_snapshot(spark, table, target_bytes=1 << 20)
    m2 = V.read_manifest(table, v2)
    assert all(
        "=" in e["path"].split("/")[-2] for e in m2["files"]
    ), "compaction output must land in the NEW hive layout"
    assert V.read_snapshot(spark, table).count() == 48
    # and the spec can evolve to a transform (no rewrite either)
    v3 = V.set_partition_spec(table, ["bucket(4, k)"])
    assert V.read_manifest(table, v3)["partition_by"] == ["bucket(4, k)"]
    V.commit_snapshot(
        spark.range(48, 52).select(
            F.col("id").alias("k"), (F.col("id") % 4).alias("p")
        ),
        table, mode="append", partition_by=["bucket(4, k)"],
    )
    assert V.read_snapshot(spark, table).count() == 52
    # unpartition for future writes
    V.set_partition_spec(table, None)
    V.commit_snapshot(
        spark.range(52, 54).select(
            F.col("id").alias("k"), (F.col("id") % 4).alias("p")
        ),
        table, mode="append",
    )
    assert V.read_snapshot(spark, table).count() == 54


def test_partition_spec_evolution_guards(spark, table):
    V.commit_snapshot(_df(spark, 0, 5), table, mode="overwrite")
    with pytest.raises(V.SchemaEvolutionError, match="not in schema"):
        V.set_partition_spec(table, ["nope"])
    # a transform whose derived name collides with a data column
    V.add_column(table, "x_day", "string")
    with pytest.raises(V.SchemaEvolutionError, match="collide"):
        V.set_partition_spec(table, ["day(x)"])
    # duplicate derived names in one spec
    with pytest.raises(V.SchemaEvolutionError, match="duplicate"):
        V.set_partition_spec(table, ["bucket(2, k)", "bucket(4, k)"])


def test_evolution_with_complex_typed_columns(spark, table):
    """array<float> columns (embeddings) must survive the id-aware
    read path: resolution signatures canonicalize complex types, so
    grouping stays hashable and renames resolve."""
    df = spark.range(0, 8).select(
        F.col("id").alias("k"),
        F.array(
            (F.col("id") * 1.0).cast("float"),
            (F.col("id") * 2.0).cast("float"),
        ).alias("emb"),
    )
    V.commit_snapshot(df, table, mode="overwrite")
    V.rename_column(table, "emb", "embedding")
    got = V.read_snapshot(spark, table)
    assert got.columns == ["k", "embedding"]
    assert got.schema["embedding"].dataType.simpleString() == "array<float>"
    s = got.select(
        F.sum(F.col("embedding")[0] + F.col("embedding")[1]).alias("s")
    ).first()[0]
    assert abs(s - sum(3.0 * i for i in range(8))) < 1e-6
    # append post-rename, mixed-generation read
    V.commit_snapshot(
        spark.range(8, 10).select(
            F.col("id").alias("k"),
            F.array(
                (F.col("id") * 1.0).cast("float"),
                (F.col("id") * 2.0).cast("float"),
            ).alias("embedding"),
        ),
        table, mode="append",
    )
    assert V.read_snapshot(spark, table).count() == 10
