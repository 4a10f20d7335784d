"""Multi-clause MERGE (sinks/versioned.py::merge): conditional
matched update/delete, conditional inserts, NOT MATCHED BY SOURCE,
clause ordering, cardinality violations, COW file pruning, and row
lineage across updates. The reference engine has no MERGE at all
(closest: merge-with-previous at src/app/pipelines/sequence_pipeline.rs
joins, no write-back); this is the full SQL:2023 / Delta surface."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from small_etl_spark.sinks import versioned as V


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "t")


def _base(spark, table, rows=None, parts=2):
    rows = rows or [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)]
    df = spark.createDataFrame(rows, "k bigint, name string, v bigint")
    V.commit_snapshot(
        df.repartitionByRange(parts, "k"), table, mode="overwrite"
    )
    return df


def _state(spark, table):
    return {
        (r.k, r.name, r.v)
        for r in V.read_snapshot(spark, table).collect()
    }


def test_update_all_insert_all_matches_merge_upsert(spark, table):
    _base(spark, table)
    src = spark.createDataFrame(
        [(2, "B", 200), (5, "e", 50)], "k bigint, name string, v bigint"
    )
    V.merge(
        spark, table, src, on="k",
        matched=[{"action": "update", "set": "all"}],
        not_matched=[{"action": "insert", "values": "all"}],
    )
    assert _state(spark, table) == {
        (1, "a", 10), (2, "B", 200), (3, "c", 30), (4, "d", 40),
        (5, "e", 50),
    }


def test_conditional_update_only_when_newer(spark, table):
    _base(spark, table)
    src = spark.createDataFrame(
        [(1, "A", 5), (2, "B", 999)], "k bigint, name string, v bigint"
    )
    V.merge(
        spark, table, src, on="k",
        matched=[{
            "action": "update", "set": "all", "condition": "s.v > t.v",
        }],
    )
    # k=1 source v=5 < 10 -> untouched; k=2 999 > 20 -> replaced
    assert _state(spark, table) == {
        (1, "a", 10), (2, "B", 999), (3, "c", 30), (4, "d", 40),
    }


def test_clause_order_first_applies(spark, table):
    _base(spark, table)
    src = spark.createDataFrame(
        [(1, "x", 0), (2, "x", 0)], "k bigint, name string, v bigint"
    )
    # update claims t.v < 15 rows FIRST; delete would also match k=1
    # but never sees it; k=2 falls through to delete
    V.merge(
        spark, table, src, on="k",
        matched=[
            {"action": "update", "set": {"v": "t.v + 1"},
             "condition": "t.v < 15"},
            {"action": "delete"},
        ],
    )
    assert _state(spark, table) == {
        (1, "a", 11), (3, "c", 30), (4, "d", 40),
    }


def test_matched_delete_condition(spark, table):
    _base(spark, table)
    src = spark.createDataFrame([(2,), (3,)], "k bigint")
    V.merge(
        spark, table, src, on="k",
        matched=[{"action": "delete", "condition": "t.v >= 30"}],
    )
    # only k=3 (v=30) deleted; k=2 matched but condition false -> kept
    assert _state(spark, table) == {
        (1, "a", 10), (2, "b", 20), (4, "d", 40),
    }


def test_partial_set_keeps_other_columns(spark, table):
    _base(spark, table)
    src = spark.createDataFrame([(2, 7)], "k bigint, delta bigint")
    V.merge(
        spark, table, src, on="k",
        matched=[{"action": "update", "set": {"v": "t.v + s.delta"}}],
    )
    assert _state(spark, table) == {
        (1, "a", 10), (2, "b", 27), (3, "c", 30), (4, "d", 40),
    }


def test_insert_values_dict_null_fills_missing(spark, table):
    _base(spark, table)
    src = spark.createDataFrame([(9, 90), (2, 0)], "k bigint, v bigint")
    V.merge(
        spark, table, src, on="k",
        not_matched=[{
            "action": "insert",
            "values": {"k": "s.k", "v": "s.v * 2"},
        }],
    )
    got = {(r.k, r.name, r.v) for r in
           V.read_snapshot(spark, table).collect()}
    assert (9, None, 180) in got
    assert (2, "b", 20) in got  # matched row untouched (no matched clause)
    assert len(got) == 5


def test_conditional_insert_filters_source(spark, table):
    _base(spark, table)
    src = spark.createDataFrame(
        [(8, "h", 1), (9, "i", 100)], "k bigint, name string, v bigint"
    )
    V.merge(
        spark, table, src, on="k",
        not_matched=[{
            "action": "insert", "values": "all", "condition": "s.v > 50",
        }],
    )
    st = _state(spark, table)
    assert (9, "i", 100) in st and not any(k == 8 for k, _, _ in st)


def test_not_matched_by_source_delete(spark, table):
    _base(spark, table)
    src = spark.createDataFrame([(1,), (3,)], "k bigint")
    V.merge(
        spark, table, src, on="k",
        not_matched_by_source=[{"action": "delete"}],
    )
    # keep only target keys present in source
    assert {k for k, _, _ in _state(spark, table)} == {1, 3}


def test_not_matched_by_source_update_marks_stale(spark, table):
    _base(spark, table)
    src = spark.createDataFrame([(1,), (2,)], "k bigint")
    V.merge(
        spark, table, src, on="k",
        not_matched_by_source=[{
            "action": "update", "set": {"name": "'stale'"},
            "condition": "t.v >= 40",
        }],
    )
    assert _state(spark, table) == {
        (1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "stale", 40),
    }


def test_full_sync_three_clause(spark, table):
    """The classic sync: upsert everything from source, delete target
    rows the source no longer has."""
    _base(spark, table)
    src = spark.createDataFrame(
        [(2, "B", 200), (5, "e", 50)], "k bigint, name string, v bigint"
    )
    V.merge(
        spark, table, src, on="k",
        matched=[{"action": "update", "set": "all"}],
        not_matched=[{"action": "insert", "values": "all"}],
        not_matched_by_source=[{"action": "delete"}],
    )
    assert _state(spark, table) == {(2, "B", 200), (5, "e", 50)}


def test_cardinality_violation_raises(spark, table):
    _base(spark, table)
    src = spark.createDataFrame(
        [(2, "x", 1), (2, "y", 2)], "k bigint, name string, v bigint"
    )
    with pytest.raises(V.MergeCardinalityError):
        V.merge(
            spark, table, src, on="k",
            matched=[{"action": "update", "set": "all"}],
        )


def test_duplicate_keys_inserting_only_are_legal(spark, table):
    _base(spark, table)
    src = spark.createDataFrame(
        [(7, "x", 1), (7, "y", 2)], "k bigint, name string, v bigint"
    )
    V.merge(
        spark, table, src, on="k",
        not_matched=[{"action": "insert", "values": "all"}],
    )
    assert sum(1 for k, _, _ in _state(spark, table) if k == 7) == 2


def test_cow_untouched_files_carry_by_reference(spark, table):
    df = _base(spark, table, rows=[(i, f"n{i}", i) for i in range(100)],
               parts=8)
    assert df.count() == 100
    src = spark.createDataFrame([(99, "Z", 0)],
                                "k bigint, name string, v bigint")
    V.merge(
        spark, table, src, on="k",
        matched=[{"action": "update", "set": "all"}],
    )
    f0 = {e["path"] for e in V.read_manifest(table, 0)["files"]}
    f1 = {e["path"] for e in V.read_manifest(table, 1)["files"]}
    assert len(f0 & f1) >= 6  # only the top-range file rewritten


def test_by_source_clause_reads_all_files(spark, table):
    _base(spark, table, rows=[(i, f"n{i}", i) for i in range(100)],
          parts=8)
    src = spark.createDataFrame([(0,)], "k bigint")
    V.merge(
        spark, table, src, on="k",
        not_matched_by_source=[{"action": "delete"}],
    )
    assert {k for k, _, _ in _state(spark, table)} == {0}


def test_multi_column_key(spark, table):
    V.commit_snapshot(
        spark.createDataFrame(
            [(1, 1, "a"), (1, 2, "b"), (2, 1, "c")],
            "k1 bigint, k2 bigint, name string",
        ),
        table, mode="overwrite",
    )
    src = spark.createDataFrame(
        [(1, 2, "B"), (3, 3, "d")], "k1 bigint, k2 bigint, name string"
    )
    V.merge(
        spark, table, src, on=["k1", "k2"],
        matched=[{"action": "update", "set": "all"}],
        not_matched=[{"action": "insert", "values": "all"}],
    )
    got = {(r.k1, r.k2, r.name)
           for r in V.read_snapshot(spark, table).collect()}
    assert got == {(1, 1, "a"), (1, 2, "B"), (2, 1, "c"), (3, 3, "d")}


def test_lineage_updates_keep_row_ids(spark, table):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k bigint, name string, v bigint",
    )
    V.commit_snapshot(df, table, mode="overwrite")
    before = {
        r.k: r._row_id
        for r in V.read_snapshot(spark, table, with_lineage=True).collect()
    }
    src = spark.createDataFrame(
        [(2, "B", 200), (9, "z", 90)], "k bigint, name string, v bigint"
    )
    V.merge(
        spark, table, src, on="k",
        matched=[{"action": "update", "set": "all"}],
        not_matched=[{"action": "insert", "values": "all"}],
    )
    after = {
        r.k: r._row_id
        for r in V.read_snapshot(spark, table, with_lineage=True).collect()
    }
    # an UPDATE mutates the row: ids stable for every pre-existing key
    for k in (1, 2, 3):
        assert after[k] == before[k]
    # the insert claimed a fresh id above the old high water mark
    assert after[9] > max(before.values())


def test_no_clause_applies_keeps_rows(spark, table):
    _base(spark, table)
    src = spark.createDataFrame([(1,), (6,)], "k bigint")
    V.merge(
        spark, table, src, on="k",
        matched=[{"action": "delete", "condition": "t.v > 1000"}],
    )
    assert len(_state(spark, table)) == 4


def test_merge_requires_clause_and_valid_actions(spark, table):
    _base(spark, table)
    src = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError, match="at least one"):
        V.merge(spark, table, src, on="k")
    with pytest.raises(ValueError, match="bad merge clause"):
        V.merge(spark, table, src, on="k",
                matched=[{"action": "insert"}])
    with pytest.raises(ValueError, match="not in table schema"):
        V.merge(spark, table, src, on="nope",
                matched=[{"action": "delete"}])


def test_merge_refuses_live_dv_and_eq_deletes(spark, table):
    _base(spark, table)
    V.delete_where_mor(spark, table, F.col("k") == 1)
    src = spark.createDataFrame([(2,)], "k bigint")
    with pytest.raises(ValueError, match="deletion vector"):
        V.merge(spark, table, src, on="k",
                matched=[{"action": "delete"}])


def test_cdc_over_conditional_merge(spark, table):
    _base(spark, table)
    src = spark.createDataFrame(
        [(2, "B", 200), (3, "x", 0)], "k bigint, name string, v bigint"
    )
    V.merge(
        spark, table, src, on="k",
        matched=[
            {"action": "update", "set": "all", "condition": "s.v > 100"},
            {"action": "delete"},
        ],
    )
    ch = {
        (r._change_type, r.k, r.v)
        for r in V.table_changes(spark, table, 0, 1).collect()
    }
    # k=2 updated (delete old + insert new); k=3 deleted; k=1/4 silent
    assert ch == {
        ("delete", 2, 20), ("insert", 2, 200), ("delete", 3, 30),
    }


def test_insert_only_dup_source_keys_matching_target_no_fanout(
    spark, table
):
    """ADVICE r9 (high): insert-only merge with duplicate source keys
    that MATCH an existing target row. The old path rewrote overlap
    files through the left_outer join, fanning the matched target row
    out N× with __act=0 — every copy survived. Now insert-only merges
    rewrite nothing: the matched row must appear exactly once and the
    duplicates must not insert."""
    _base(spark, table)
    src = spark.createDataFrame(
        [(2, "X", 1), (2, "Y", 2), (9, "n", 9)],
        "k bigint, name string, v bigint",
    )
    v = V.merge(
        spark, table, src, on="k",
        not_matched=[{"action": "insert", "values": "all"}],
    )
    st = _state(spark, table)
    assert sum(1 for k, _, _ in st if k == 2) == 1
    assert (2, "b", 20) in st and (9, "n", 9) in st
    # and nothing was rewritten: every v0 file carries by reference
    f0 = {e["path"] for e in V.read_manifest(table, 0)["files"]}
    f1 = {e["path"] for e in V.read_manifest(table, v)["files"]}
    assert f0 <= f1


def test_insert_only_merge_with_lineage_no_row_id_duplication(
    spark, table
):
    """Same shape on a lineage-tracked table: existing _row_ids must
    stay unique and stable; only the insert claims fresh ids."""
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k bigint, name string, v bigint"
    )
    V.commit_snapshot(df, table, mode="overwrite")
    before = {
        r.k: r._row_id
        for r in V.read_snapshot(spark, table, with_lineage=True)
        .collect()
    }
    src = spark.createDataFrame(
        [(2, "X", 1), (2, "Y", 2), (3, "c", 30)],
        "k bigint, name string, v bigint",
    )
    V.merge(
        spark, table, src, on="k",
        not_matched=[{"action": "insert", "values": "all"}],
    )
    rows = V.read_snapshot(spark, table, with_lineage=True).collect()
    ids = [r._row_id for r in rows]
    assert len(ids) == len(set(ids)) == 3
    after = {r.k: r._row_id for r in rows}
    assert after[1] == before[1] and after[2] == before[2]


def test_by_source_only_dup_source_keys_no_fanout(spark, table):
    """Duplicate source keys with ONLY a BY SOURCE clause: the join
    side is deduped to distinct keys (clauses reference t alone), so
    matched rows survive exactly once — legal SQL, no cardinality
    error, no duplication."""
    _base(spark, table)
    src = spark.createDataFrame(
        [(2, "X", 1), (2, "Y", 2)], "k bigint, name string, v bigint"
    )
    V.merge(
        spark, table, src, on="k",
        not_matched_by_source=[{"action": "delete"}],
    )
    assert _state(spark, table) == {(2, "b", 20)}
