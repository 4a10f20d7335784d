"""CHECK constraints on versioned tables (sinks/versioned.py::
add_constraint / drop_constraint / _enforce_constraints): commit-time
batch validation with SQL CHECK semantics (NULL passes), enforced on
every data-adding path — append, overwrite, COW merge, multi-clause
MERGE (including manufactured UPDATE values), streaming batches and
upserts — while row-preserving maintenance skips the check. The
public Delta Lake constraints design, re-implemented on the manifest
header.

Reference parity note: the reference declares validation in config
but never enforces it (sequence_config.rs:102-108 has no reader);
this enforces at the table layer on top of the already-enforced
operator-level validation (operators/validation.py)."""

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


def _mk(spark, table):
    V.commit_snapshot(_kv(spark, 0, 20), table, mode="overwrite")
    V.add_constraint(spark, table, "v_nonneg", "v >= 0")
    return table


def test_add_constraint_is_metadata_only_and_listed(spark, table):
    _mk(spark, table)
    assert V.list_constraints(table) == {"v_nonneg": "v >= 0"}
    m = V.read_manifest(table, 1)
    assert m["mode"] == "add_constraint"
    f0 = {e["path"] for e in V.read_manifest(table, 0)["files"]}
    assert {e["path"] for e in m["files"]} == f0


def test_add_constraint_validates_existing_data(spark, table):
    V.commit_snapshot(
        spark.createDataFrame([(1, -5)], "k bigint, v bigint"),
        table, mode="overwrite",
    )
    with pytest.raises(V.ConstraintViolation, match="existing data"):
        V.add_constraint(spark, table, "v_nonneg", "v >= 0")
    assert V.list_constraints(table) == {}


def test_append_rejected_and_table_unchanged(spark, table):
    _mk(spark, table)
    bad = spark.createDataFrame([(100, 1), (101, -3)],
                                "k bigint, v bigint")
    with pytest.raises(V.ConstraintViolation, match="v_nonneg"):
        V.commit_snapshot(bad, table, mode="append")
    assert V.latest_version(table) == 1
    assert V.read_snapshot(spark, table).count() == 20
    # clean batches pass
    V.commit_snapshot(_kv(spark, 100, 105), table, mode="append")
    assert V.read_snapshot(spark, table).count() == 25


def test_overwrite_still_constrained(spark, table):
    _mk(spark, table)
    with pytest.raises(V.ConstraintViolation):
        V.commit_snapshot(
            spark.createDataFrame([(1, -1)], "k bigint, v bigint"),
            table, mode="overwrite",
        )


def test_null_passes_check_semantics(spark, table):
    _mk(spark, table)
    nulls = spark.createDataFrame([(200, None)], "k bigint, v bigint")
    V.commit_snapshot(nulls, table, mode="append")  # NULL check passes
    assert V.read_snapshot(spark, table).filter(
        F.col("v").isNull()
    ).count() == 1


def test_merge_upsert_source_checked(spark, table):
    _mk(spark, table)
    bad = spark.createDataFrame([(3, -7)], "k bigint, v bigint")
    with pytest.raises(V.ConstraintViolation, match="merge_upsert"):
        V.merge_upsert(spark, table, bad, key="k")


def test_multi_clause_merge_checks_manufactured_updates(spark, table):
    _mk(spark, table)
    src = spark.createDataFrame([(3, 10)], "k bigint, v bigint")
    with pytest.raises(V.ConstraintViolation, match="merge"):
        V.merge(
            spark, table, src, on="k",
            matched=[{"action": "update",
                      "set": {"v": "t.v - 1000"}}],  # 6 - 1000 < 0
        )
    # a clean conditional merge passes
    V.merge(
        spark, table, src, on="k",
        matched=[{"action": "update", "set": {"v": "t.v + s.v"}}],
    )
    got = {r.k: r.v for r in V.read_snapshot(spark, table).collect()}
    assert got[3] == 16


def test_stream_paths_checked(spark, table):
    _mk(spark, table)
    bad = spark.createDataFrame([(5, -1)], "k bigint, v bigint")
    with pytest.raises(V.ConstraintViolation, match="stream_upsert"):
        V.stream_upsert_batch(bad, batch_id=7, table=table, key="k")
    with pytest.raises(V.ConstraintViolation, match="stream_commit"):
        V.stream_commit_batch(bad, batch_id=7, table=table)


def test_maintenance_skips_check_and_carries_header(spark, table):
    _mk(spark, table)
    V.delete_where_mor(spark, table, F.col("k") < 2)
    V.compact_dv(spark, table)
    V.optimize_snapshot(spark, table)
    assert V.list_constraints(table) == {"v_nonneg": "v >= 0"}
    # still enforced after the maintenance chain
    with pytest.raises(V.ConstraintViolation):
        V.commit_snapshot(
            spark.createDataFrame([(1, -1)], "k bigint, v bigint"),
            table, mode="append",
        )


def test_drop_constraint_lifts_enforcement(spark, table):
    _mk(spark, table)
    V.drop_constraint(table, "v_nonneg")
    assert V.list_constraints(table) == {}
    V.commit_snapshot(
        spark.createDataFrame([(1, -1)], "k bigint, v bigint"),
        table, mode="append",
    )
    with pytest.raises(ValueError, match="no constraint"):
        V.drop_constraint(table, "nope")


def test_restore_restores_the_constraint_set(spark, table):
    V.commit_snapshot(_kv(spark, 0, 5), table, mode="overwrite")  # v0
    V.add_constraint(spark, table, "v_nonneg", "v >= 0")  # v1
    V.drop_constraint(table, "v_nonneg")  # v2
    V.restore_snapshot(table, 1)  # v3: constraint is back
    assert V.list_constraints(table) == {"v_nonneg": "v >= 0"}
    V.restore_snapshot(table, 0)  # v4: constraint-free era
    assert V.list_constraints(table) == {}


def test_rename_and_drop_of_constrained_column_refuse(spark, table):
    _mk(spark, table)
    with pytest.raises(V.SchemaEvolutionError, match="v_nonneg"):
        V.rename_column(table, "v", "val")
    with pytest.raises(V.SchemaEvolutionError, match="v_nonneg"):
        V.drop_column(table, "v")
    # unrelated columns still evolve freely
    V.rename_column(table, "k", "key")
    assert V.read_snapshot(spark, table).columns == ["key", "v"]


def test_incompatible_overwrite_schema_fails_loudly(spark, table):
    _mk(spark, table)
    with pytest.raises(V.ConstraintViolation, match="do not resolve"):
        V.commit_snapshot(
            spark.createDataFrame([(1, "x")], "k bigint, s string"),
            table, mode="overwrite",
        )


def test_duplicate_and_unparseable_constraints_rejected(spark, table):
    _mk(spark, table)
    with pytest.raises(ValueError, match="already exists"):
        V.add_constraint(spark, table, "v_nonneg", "v >= 0")
    with pytest.raises(ValueError, match="does not resolve"):
        V.add_constraint(spark, table, "bad", "nope_col > 0")


def test_branch_staged_writes_enforced_and_publish_adopts(spark, table):
    _mk(spark, table)
    root = V.branch_create(table, "stage")
    with pytest.raises(V.ConstraintViolation):
        V.commit_snapshot(
            spark.createDataFrame([(1, -1)], "k bigint, v bigint"),
            root, mode="append",
        )
    V.add_constraint(spark, root, "v_cap", "v <= 1000000")
    V.commit_snapshot(_kv(spark, 50, 55), root, mode="append")
    V.branch_publish(table, "stage")
    assert set(V.list_constraints(table)) == {"v_nonneg", "v_cap"}


def test_commit_revalidates_when_constraint_lands_mid_commit(
    spark, table, monkeypatch
):
    """ADVICE r9 (medium): commit_snapshot validates against the head
    read BEFORE writing data; if a concurrent add_constraint attaches
    between that read and the manifest race, the retry loop must
    re-validate — otherwise _carry_constraints stamps a predicate the
    batch was never checked against."""
    V.commit_snapshot(_kv(spark, 0, 20), table, mode="overwrite")
    real_write = V._write_data_files
    fired = {"done": False}

    def write_then_race(df, tbl, *a, **kw):
        out = real_write(df, tbl, *a, **kw)
        if not fired["done"]:
            fired["done"] = True
            # concurrent ALTER TABLE lands after our validation,
            # before our manifest attempt
            V.add_constraint(spark, table, "v_nonneg", "v >= 0")
        return out

    monkeypatch.setattr(V, "_write_data_files", write_then_race)
    bad = spark.createDataFrame([(99, -1)], "k bigint, v bigint")
    with pytest.raises(V.ConstraintViolation):
        V.commit_snapshot(bad, table, mode="append")
    # the table still reads clean and the loser's data files are not
    # left as orphan debris
    assert V.read_snapshot(spark, table).count() == 20
    assert V.remove_orphan_files(table, older_than_ms=0) == []
    # a passing batch against the new constraint still lands
    monkeypatch.setattr(V, "_write_data_files", real_write)
    V.commit_snapshot(
        spark.createDataFrame([(99, 1)], "k bigint, v bigint"),
        table, mode="append",
    )
    assert V.read_snapshot(spark, table).count() == 21


def test_add_constraint_revalidates_when_head_advances(
    spark, table, monkeypatch
):
    """Mirror TOCTOU: add_constraint validated the table AS OF head,
    then a concurrent append landed a violating row before the
    metadata attach. The attach must abort, re-validate the new head,
    and reject the constraint instead of stamping it unchecked."""
    V.commit_snapshot(_kv(spark, 0, 20), table, mode="overwrite")
    real_enforce = V._enforce_constraints
    state = {"raced": False}

    def enforce_then_race(df, pm, op):
        real_enforce(df, pm, op)
        if op == "add_constraint(existing data)" and not state["raced"]:
            state["raced"] = True
            V.commit_snapshot(
                spark.createDataFrame([(99, -1)], "k bigint, v bigint"),
                table, mode="append",
            )

    monkeypatch.setattr(V, "_enforce_constraints", enforce_then_race)
    with pytest.raises(V.ConstraintViolation):
        V.add_constraint(spark, table, "v_nonneg", "v >= 0")
    # no constraint attached; the violating row is durable (it won)
    assert V.list_constraints(table) == {}
    assert V.read_snapshot(spark, table).count() == 21


def test_add_constraint_retries_when_clean_writer_advances(
    spark, table, monkeypatch
):
    """Head advancing with CLEAN data must not fail the attach — the
    validate-then-attach loop re-validates and lands the constraint."""
    V.commit_snapshot(_kv(spark, 0, 20), table, mode="overwrite")
    real_enforce = V._enforce_constraints
    state = {"raced": False}

    def enforce_then_race(df, pm, op):
        real_enforce(df, pm, op)
        if op == "add_constraint(existing data)" and not state["raced"]:
            state["raced"] = True
            V.commit_snapshot(
                spark.createDataFrame([(99, 7)], "k bigint, v bigint"),
                table, mode="append",
            )

    monkeypatch.setattr(V, "_enforce_constraints", enforce_then_race)
    v = V.add_constraint(spark, table, "v_nonneg", "v >= 0")
    assert V.list_constraints(table) == {"v_nonneg": "v >= 0"}
    assert V.read_manifest(table, v)["mode"] == "add_constraint"
