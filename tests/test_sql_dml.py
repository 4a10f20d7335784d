"""SQL DML over versioned tables (small_etl_spark/sql.py): MERGE
INTO / UPDATE / DELETE FROM / INSERT INTO|OVERWRITE dispatching to
the versioned primitives with identical guarantees — CHECK
constraints, row lineage, CDC, OCC, stats-pruned rewrites. VERDICT
r9 item #1: the Delta/Iceberg statement UX over the existing
primitives (versioned.py merge/update_where/delete_where/
commit_snapshot).

Reference parity note: the reference has no SQL and no DML at all
(whole-output rewrites, contextual_pipeline.rs:1017-1229); this is
engine-side extension surface tested against the public SQL:2023 /
Delta MERGE semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from small_etl_spark.sinks import versioned as V
from small_etl_spark.sql import sql


@pytest.fixture()
def t(tmp_path, spark):
    root = str(tmp_path / "t")
    V.commit_snapshot(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
            "k bigint, name string, v bigint",
        ).repartitionByRange(2, "k"),
        root, mode="overwrite",
    )
    return {"t": root}


def _state(spark, roots, name="t"):
    return {
        (r.k, r.name, r.v)
        for r in V.read_snapshot(spark, roots[name]).collect()
    }


# ------------------------------------------------------------ UPDATE

def test_update_where(spark, t):
    out = sql(
        spark, "UPDATE t SET v = v + 1 WHERE k >= 3", t
    ).first()
    assert (out.op, out.table, out.version) == ("update", "t", 1)
    assert _state(spark, t) == {
        (1, "a", 10), (2, "b", 20), (3, "c", 31), (4, "d", 41),
    }


def test_update_alias_and_multi_assignment(spark, t):
    sql(
        spark,
        "UPDATE t AS x SET x.v = x.v * 2, name = upper(x.name) "
        "WHERE x.k = 2",
        t,
    )
    assert (2, "B", 40) in _state(spark, t)


def test_update_prunes_files_from_where(spark, t):
    """A range-keyed WHERE derives manifest prune predicates: the
    low-range file carries by reference (O(matched files) at 100 TB)."""
    sql(spark, "UPDATE t SET v = 0 WHERE k >= 3", t)
    f0 = {e["path"] for e in V.read_manifest(t["t"], 0)["files"]}
    f1 = {e["path"] for e in V.read_manifest(t["t"], 1)["files"]}
    assert f0 & f1, "low-range file should carry by reference"


def test_update_string_literal_with_keyword(spark, t):
    sql(
        spark,
        "UPDATE t SET name = 'set where and' WHERE k = 1",
        t,
    )
    assert (1, "set where and", 10) in _state(spark, t)


# ------------------------------------------------------------ DELETE

def test_delete_where_and_full_delete(spark, t):
    sql(spark, "DELETE FROM t WHERE k <= 2", t)
    assert {k for k, _, _ in _state(spark, t)} == {3, 4}
    sql(spark, "DELETE FROM t", t)
    assert _state(spark, t) == set()


def test_delete_with_alias(spark, t):
    sql(spark, "DELETE FROM t AS x WHERE x.name = 'a'", t)
    assert {k for k, _, _ in _state(spark, t)} == {2, 3, 4}


# ------------------------------------------------------------ INSERT

def test_insert_values_and_column_list_null_fill(spark, t):
    sql(spark, "INSERT INTO t VALUES (5, 'e', 50)", t)
    assert (5, "e", 50) in _state(spark, t)
    sql(spark, "INSERT INTO t (k, name) VALUES (6, 'f')", t)
    assert (6, "f", None) in _state(spark, t)


def test_insert_select_with_time_travel(spark, t):
    sql(spark, "DELETE FROM t WHERE k >= 3", t)
    # re-insert the deleted rows from the pre-delete snapshot
    sql(
        spark,
        "INSERT INTO t SELECT k, name, v FROM t VERSION AS OF 0 "
        "WHERE k >= 3",
        t,
    )
    assert _state(spark, t) == {
        (1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40),
    }


def test_insert_overwrite(spark, t):
    sql(
        spark,
        "INSERT OVERWRITE t SELECT k, name, v FROM t WHERE k = 1", t,
    )
    assert _state(spark, t) == {(1, "a", 10)}


def test_insert_positional_cast_and_arity_errors(spark, t):
    with pytest.raises(ValueError, match="column"):
        sql(spark, "INSERT INTO t VALUES (7, 'g')", t)
    with pytest.raises(ValueError, match="not in target schema"):
        sql(spark, "INSERT INTO t (k, nope, v) VALUES (7,'g',0)", t)


# ------------------------------------------------------------- MERGE

def test_merge_three_clause_full_sync(spark, t):
    src = spark.createDataFrame(
        [(2, "B", 200), (3, "c", 30), (9, "i", 90)],
        "k bigint, name string, v bigint",
    )
    src.createOrReplaceTempView("updates")
    out = sql(
        spark,
        """
        MERGE INTO t USING (SELECT * FROM updates) s ON t.k = s.k
        WHEN MATCHED AND s.v > t.v THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        WHEN NOT MATCHED BY SOURCE THEN DELETE
        """,
        t,
    ).first()
    assert out.op == "merge" and out.version == 1
    assert _state(spark, t) == {
        (2, "B", 200), (3, "c", 30), (9, "i", 90),
    }


def test_merge_clause_order_and_conditions(spark, t):
    src = spark.createDataFrame(
        [(1, "A", 5), (2, "B", 999)], "k bigint, name string, v bigint"
    )
    src.createOrReplaceTempView("updates2")
    sql(
        spark,
        """
        MERGE INTO t USING (SELECT * FROM updates2) s ON t.k = s.k
        WHEN MATCHED AND s.v > t.v THEN UPDATE SET v = s.v
        WHEN MATCHED THEN DELETE
        """,
        t,
    )
    st = _state(spark, t)
    assert (2, "b", 999) in st          # first clause won
    assert not any(k == 1 for k, _, _ in st)  # fell through to DELETE


def test_merge_insert_column_values_and_expressions(spark, t):
    src = spark.createDataFrame([(7, 70)], "k bigint, v bigint")
    src.createOrReplaceTempView("updates3")
    sql(
        spark,
        """
        MERGE INTO t USING (SELECT * FROM updates3) s ON t.k = s.k
        WHEN NOT MATCHED THEN
          INSERT (k, name, v) VALUES (s.k, concat('n', s.k), s.v * 2)
        """,
        t,
    )
    assert (7, "n7", 140) in _state(spark, t)


def test_merge_using_time_travel_source(spark, t):
    """USING t VERSION AS OF n — merge a table's own past into its
    head (the restore-by-merge idiom)."""
    sql(spark, "DELETE FROM t WHERE k >= 3", t)
    sql(
        spark,
        """
        MERGE INTO t USING t VERSION AS OF 0 old ON t.k = old.k
        WHEN NOT MATCHED THEN INSERT *
        """,
        t,
    )
    assert _state(spark, t) == {
        (1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40),
    }


def test_merge_by_source_update_with_target_aliases(spark, t):
    src = spark.createDataFrame([(1, "x", 0)],
                                "k bigint, name string, v bigint")
    src.createOrReplaceTempView("updates4")
    sql(
        spark,
        """
        MERGE INTO t AS tgt USING (SELECT * FROM updates4) AS src
        ON tgt.k = src.k
        WHEN NOT MATCHED BY SOURCE AND tgt.v >= 30
          THEN UPDATE SET name = concat(tgt.name, '!')
        """,
        t,
    )
    assert _state(spark, t) == {
        (1, "a", 10), (2, "b", 20), (3, "c!", 30), (4, "d!", 40),
    }


def test_merge_multi_key_on(spark, tmp_path, spark_tmp=None):
    root = str(tmp_path / "mk")
    spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b")], "k1 bigint, k2 bigint, name string"
    ).createOrReplaceTempView("mk_src")
    V.commit_snapshot(
        spark.createDataFrame(
            [(1, 1, "old"), (2, 1, "keep")],
            "k1 bigint, k2 bigint, name string",
        ),
        root, mode="overwrite",
    )
    sql(
        spark,
        """
        MERGE INTO mk USING (SELECT * FROM mk_src) s
        ON mk.k1 = s.k1 AND mk.k2 = s.k2
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """,
        {"mk": root},
    )
    got = {
        (r.k1, r.k2, r.name)
        for r in V.read_snapshot(spark, root).collect()
    }
    assert got == {(1, 1, "a"), (1, 2, "b"), (2, 1, "keep")}


def test_merge_theta_on_refused(spark, t):
    spark.createDataFrame([(1, 1)], "k bigint, v bigint") \
        .createOrReplaceTempView("theta_src")
    with pytest.raises(ValueError, match="same-name key equality"):
        sql(
            spark,
            """
            MERGE INTO t USING (SELECT * FROM theta_src) s ON t.k > s.k
            WHEN MATCHED THEN DELETE
            """,
            t,
        )


def test_merge_cardinality_error_surfaces(spark, t):
    spark.createDataFrame(
        [(2, "X", 1), (2, "Y", 2)], "k bigint, name string, v bigint"
    ).createOrReplaceTempView("dup_src")
    with pytest.raises(V.MergeCardinalityError):
        sql(
            spark,
            """
            MERGE INTO t USING (SELECT * FROM dup_src) s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET *
            """,
            t,
        )


# ------------------------------------------- guarantees ride through

def test_constraints_enforced_inside_sql_dml(spark, t):
    V.add_constraint(spark, t["t"], "v_nonneg", "v >= 0")
    with pytest.raises(V.ConstraintViolation):
        sql(spark, "UPDATE t SET v = -1 WHERE k = 1", t)
    with pytest.raises(V.ConstraintViolation):
        sql(spark, "INSERT INTO t VALUES (8, 'h', -5)", t)
    spark.createDataFrame(
        [(1, "a", -7)], "k bigint, name string, v bigint"
    ).createOrReplaceTempView("neg_src")
    with pytest.raises(V.ConstraintViolation):
        sql(
            spark,
            """
            MERGE INTO t USING (SELECT * FROM neg_src) s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET v = s.v
            """,
            t,
        )
    assert _state(spark, t) == {
        (1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40),
    }


def test_lineage_stable_through_sql_update(spark, t):
    before = {
        r.k: r._row_id
        for r in V.read_snapshot(
            spark, t["t"], with_lineage=True
        ).collect()
    }
    sql(spark, "UPDATE t SET v = v + 1 WHERE k = 4", t)
    after = {
        r.k: r._row_id
        for r in V.read_snapshot(
            spark, t["t"], with_lineage=True
        ).collect()
    }
    assert after == before  # UPDATE mutates, never replaces


def test_cdc_pairs_from_sql_update(spark, t):
    sql(spark, "UPDATE t SET v = v + 1 WHERE k = 4", t)
    cdc = V.table_changes(spark, t["t"], from_version=0, to_version=1)
    ops = sorted(
        (r._change_type, r.k) for r in cdc.collect()
    )
    assert ops == [("delete", 4), ("insert", 4)]


def test_merge_literal_with_clause_keyword_inside(spark, t):
    """Clause keywords inside string literals are data, not syntax."""
    spark.createDataFrame([(9,)], "k bigint") \
        .createOrReplaceTempView("kw_src")
    sql(
        spark,
        """
        MERGE INTO t USING (SELECT * FROM kw_src) s ON t.k = s.k
        WHEN NOT MATCHED THEN
          INSERT (k, name, v) VALUES (s.k, 'WHEN MATCHED THEN x', 0)
        """,
        t,
    )
    assert (9, "WHEN MATCHED THEN x", 0) in _state(spark, t)


def test_merge_when_condition_literal_with_then(spark, t):
    """A WHEN ... AND condition whose STRING LITERAL contains 'THEN'
    must not split the clause at the literal (the head scanner runs
    on the masked copy and slices the original by spans; ADVICE
    r10)."""
    spark.createDataFrame(
        [(1, "do THEN that"), (2, "other")], "k bigint, note string"
    ).createOrReplaceTempView("then_src")
    sql(
        spark,
        """
        MERGE INTO t USING (SELECT * FROM then_src) s ON t.k = s.k
        WHEN MATCHED AND s.note = 'do THEN that' THEN
          UPDATE SET v = 111
        WHEN MATCHED THEN UPDATE SET v = 222
        """,
        t,
    )
    got = _state(spark, t)
    assert (1, "a", 111) in got, got
    assert (2, "b", 222) in got, got


# ----------------------------------------- maintenance statements

def test_restore_statement(spark, t):
    sql(spark, "DELETE FROM t WHERE k >= 2", t)
    out = sql(
        spark, "RESTORE TABLE t TO VERSION AS OF 0", t
    ).first()
    assert out.op == "restore" and out.version == 2
    assert _state(spark, t) == {
        (1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40),
    }
    # timestamp form
    ms = V.read_manifest(t["t"], 1)["committed_at_ms"]
    sql(spark, f"RESTORE t TO TIMESTAMP AS OF '{ms}'", t)
    assert {k for k, _, _ in _state(spark, t)} == {1}


def test_optimize_statement_scoped_and_plain(spark, t):
    for i in range(5, 9):
        V.commit_snapshot(
            spark.createDataFrame(
                [(i, f"n{i}", i)], "k bigint, name string, v bigint"
            ),
            t["t"], mode="append",
        )
    head = V.latest_version(t["t"])
    n_before = len(V.read_manifest(t["t"], head)["files"])
    out = sql(spark, "OPTIMIZE t", t).first()
    assert out.op == "optimize" and out.version == head + 1
    m = V.read_manifest(t["t"], head + 1)
    assert len(m["files"]) < n_before
    # WHERE must be simple conjuncts
    import pytest as _pytest

    with _pytest.raises(ValueError, match="conjuncts"):
        sql(spark, "OPTIMIZE t WHERE k + 1 > 2", t)
    # scoped form accepted (nothing small enough left: head returned)
    out = sql(spark, "OPTIMIZE t WHERE k >= 5", t).first()
    assert out.op == "optimize"


def test_optimize_zorder_statement(spark, tmp_path):
    root = str(tmp_path / "z")
    df = spark.range(0, 400).selectExpr(
        "id % 20 AS x", "CAST(id / 20 AS LONG) AS y", "id AS v"
    )
    V.commit_snapshot(df.repartition(8), root, mode="overwrite")
    out = sql(
        spark, "OPTIMIZE z ZORDER BY (x, y)", {"z": root}
    ).first()
    assert out.op == "optimize"
    head = V.latest_version(root)
    assert V.read_manifest(root, head)["mode"] == "cluster"
    assert V.read_manifest(root, head)["sort_order"] == ["x", "y"]


def test_vacuum_statement(spark, t):
    sql(spark, "DELETE FROM t WHERE k = 1", t)
    sql(spark, "DELETE FROM t WHERE k = 2", t)
    out = sql(spark, "VACUUM t RETAIN 0 HOURS", t).first()
    assert out.op == "vacuum" and out.files_deleted >= 1
    # old versions expired; head still reads
    assert {k for k, _, _ in _state(spark, t)} == {3, 4}


def test_describe_history_statement(spark, t):
    sql(spark, "DELETE FROM t WHERE k = 1", t)
    rows = sql(spark, "DESCRIBE HISTORY t", t).collect()
    assert [r.snapshot for r in rows] == [0, 1]
    assert rows[1].mode == "delete"


# --------------------------------- SQL ≡ primitives equivalence walk

from hypothesis import HealthCheck, given, settings, strategies as st

_walk_op = st.one_of(
    st.tuples(st.just("update"), st.integers(0, 50), st.integers(1, 9)),
    st.tuples(st.just("delete"), st.integers(0, 50), st.just(0)),
    st.tuples(st.just("insert"), st.integers(100, 140), st.integers(1, 9)),
    st.tuples(st.just("merge"), st.integers(0, 140), st.integers(1, 9)),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(ops=st.lists(_walk_op, min_size=1, max_size=5))
def test_walk_sql_statements_equal_primitives(
    spark, tmp_path_factory, ops
):
    """Equivalence walk: the same random op sequence applied to twin
    tables — one through SQL statements, one through the Python
    primitives — must end in identical state after every step. Pins
    the parser/dispatcher against the primitive semantics (clause
    conditions, prune derivation, positional INSERT binding)."""
    tmp = tmp_path_factory.mktemp("sqlwalk")
    ts, tp = str(tmp / "sql"), str(tmp / "prim")
    base = spark.range(0, 40).selectExpr(
        "id AS k", "id * 2 AS v", "CAST(id % 5 AS STRING) AS tag"
    )
    for p in (ts, tp):
        V.commit_snapshot(base.repartitionByRange(3, "k"), p,
                          mode="overwrite")
    tb = {"t": ts}
    for kind, a, b in ops:
        if kind == "update":
            sql(spark, f"UPDATE t SET v = v + {b} WHERE k >= {a}", tb)
            V.update_where(
                spark, tp, {"v": f"v + {b}"}, f"k >= {a}",
                prune=[("k", ">=", a)],
            )
        elif kind == "delete":
            sql(spark, f"DELETE FROM t WHERE k < {a} AND tag = '1'", tb)
            V.delete_where(
                spark, tp, f"k < {a} AND tag = '1'",
                prune=[("k", "<", a)],
            )
        elif kind == "insert":
            sql(
                spark,
                f"INSERT INTO t VALUES ({a}, {b}, 'new')", tb,
            )
            V.commit_snapshot(
                spark.createDataFrame(
                    [(a, b, "new")], "k bigint, v bigint, tag string"
                ),
                tp, mode="append",
            )
        elif kind == "merge":
            stmt_src = (
                f"SELECT {a} AS k, {b} AS v, 'm' AS tag"
            )
            sql(
                spark,
                f"""
                MERGE INTO t USING ({stmt_src}) s ON t.k = s.k
                WHEN MATCHED AND s.v > t.v THEN UPDATE SET v = s.v
                WHEN NOT MATCHED THEN INSERT *
                """,
                tb,
            )
            V.merge(
                spark, tp,
                spark.createDataFrame(
                    [(a, b, "m")], "k bigint, v bigint, tag string"
                ),
                on="k",
                matched=[{
                    "action": "update",
                    "set": {"v": "s.v"},
                    "condition": "s.v > t.v",
                }],
                not_matched=[{"action": "insert", "values": "all"}],
            )
        got_s = sorted(
            (r.k, r.v, r.tag)
            for r in V.read_snapshot(spark, ts).collect()
        )
        got_p = sorted(
            (r.k, r.v, r.tag)
            for r in V.read_snapshot(spark, tp).collect()
        )
        assert got_s == got_p, f"diverged after {kind}({a},{b})"
