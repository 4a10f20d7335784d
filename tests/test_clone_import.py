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


from hypothesis import HealthCheck, given, settings, strategies as st

_cl_op = st.tuples(
    st.sampled_from(["src", "dst"]),
    st.one_of(
        st.tuples(st.just("append"),
                  st.lists(st.integers(0, 19), min_size=1, max_size=4)),
        st.tuples(st.just("merge"),
                  st.lists(st.integers(0, 19), min_size=1, max_size=3)),
        st.tuples(st.just("delete"), st.integers(0, 19)),
        st.tuples(st.just("update"), st.integers(0, 19)),
        st.tuples(st.just("delete_mor"), st.integers(0, 19)),
        st.tuples(st.just("compact_dv"), st.none()),
        st.tuples(st.just("optimize"), st.none()),
    ),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_cl_op, min_size=1, max_size=6))
def test_cloned_table_matches_model(spark, tmp_path_factory, ops):
    """Source and shallow clone evolve independently under random DML
    (append / upsert-merge / COW delete / UPDATE / MoR delete +
    compact / optimize), each tracked against its own dict model —
    divergence in either direction, or any cross-contamination, fails.
    Time travel on the clone's v0 must keep serving the fork state
    (through the source's files) however far both sides move on."""
    root = tmp_path_factory.mktemp("clw")
    src, dst = str(root / "src"), str(root / "dst")
    tag = {"n": 0}

    def mk(keys):
        tag["n"] += 1
        rows = sorted({(k, tag["n"]) for k in keys})
        return (
            spark.createDataFrame(rows, "k LONG, ver LONG"), dict(rows)
        )

    df, m0 = mk(range(0, 12))
    V.commit_snapshot(df.repartition(3), src, mode="overwrite")
    V.clone_table(src, dst)
    models = {"src": dict(m0), "dst": dict(m0)}
    fork_state = sorted(m0.items())

    def dv_live(t):
        v = V.latest_version(t)
        return bool(V.read_manifest(t, v).get("dv"))

    for target, (kind, payload) in ops:
        t = src if target == "src" else dst
        model = models[target]
        if kind == "append":
            df, rows = mk(payload)
            fresh = {k: v for k, v in rows.items() if k not in model}
            if not fresh:
                continue
            V.commit_snapshot(
                spark.createDataFrame(sorted(fresh.items()),
                                      "k LONG, ver LONG"),
                t, mode="append",
            )
            model.update(fresh)
        elif kind == "merge":
            if dv_live(t):
                V.compact_dv(spark, t)
            df, rows = mk(payload)
            V.merge_upsert(
                spark, t,
                spark.createDataFrame(sorted(rows.items()),
                                      "k LONG, ver LONG"),
                key="k",
            )
            model.update(rows)
        elif kind == "delete":
            if dv_live(t):
                V.compact_dv(spark, t)
            V.delete_where(spark, t, F.col("k") >= payload,
                           prune=[("k", ">=", payload)])
            for k in [k for k in model if k >= payload]:
                del model[k]
        elif kind == "update":
            if dv_live(t):
                V.compact_dv(spark, t)
            V.update_where(spark, t, {"ver": "ver + 1000"},
                           F.col("k") >= payload)
            for k in list(model):
                if k >= payload:
                    model[k] += 1000
        elif kind == "delete_mor":
            V.delete_where_mor(spark, t, F.col("k") >= payload)
            for k in [k for k in model if k >= payload]:
                del model[k]
        elif kind == "compact_dv":
            V.compact_dv(spark, t)
        elif kind == "optimize":
            if dv_live(t):
                V.compact_dv(spark, t)
            V.optimize_snapshot(spark, t)

        for name, tbl in (("src", src), ("dst", dst)):
            got = sorted(
                (r.k, r.ver)
                for r in V.read_snapshot(spark, tbl).collect()
            )
            assert got == sorted(models[name].items()), (
                f"{name} diverged after {kind} on {target}"
            )
    # the fork point still serves through the source's files
    got0 = sorted(
        (r.k, r.ver)
        for r in V.read_snapshot(spark, dst, version=0).collect()
    )
    assert got0 == fork_state, "clone v0 lost the fork state"
