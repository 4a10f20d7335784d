"""SQL DDL over versioned tables (small_etl_spark/sql.py): CREATE
TABLE [AS SELECT] / ALTER TABLE / DROP TABLE dispatching to the
metadata-only schema-evolution primitives (VERDICT r10 #2 — the
statement surface a Delta/Iceberg user expects, their docs' first
example being CTAS).

Reference parity note: the reference has no DDL at all (TOML-declared
shapes, src/config/*.rs); this is engine-side extension surface
following the public Delta/Spark SQL grammar."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from small_etl_spark.sinks import versioned as V
from small_etl_spark.sql import sql


@pytest.fixture()
def roots(tmp_path):
    return {
        "t": str(tmp_path / "t"),
        "src": str(tmp_path / "src"),
        "other": str(tmp_path / "other"),
    }


def _seed(spark, roots, name="src"):
    V.commit_snapshot(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
            "k bigint, name string, v int",
        ),
        roots[name], mode="overwrite",
    )


# --------------------------------------------------------- CREATE

def test_create_table_with_schema_and_partition(spark, roots):
    out = sql(
        spark,
        "CREATE TABLE t (k bigint, day int, v string) "
        "PARTITIONED BY (day)",
        roots,
    ).collect()[0]
    assert (out.op, out.version) == ("create", 0)
    got = V.read_snapshot(spark, roots["t"])
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["k", "day", "v"]
    # the spec is live: an append lands hive-partitioned + prunable
    V.commit_snapshot(
        spark.createDataFrame([(1, 7, "x")], "k bigint, day int, v string"),
        roots["t"], mode="append", partition_by=["day"],
    )
    assert V.read_manifest(roots["t"], 1)["partition_by"] == ["day"]


def test_ctas_and_or_replace_and_if_not_exists(spark, roots):
    _seed(spark, roots)
    sql(
        spark,
        "CREATE TABLE t AS SELECT k, v * 2 AS v2 FROM src WHERE k <= 2",
        roots,
    )
    got = {(r.k, r.v2) for r in V.read_snapshot(spark, roots["t"]).collect()}
    assert got == {(1, 20), (2, 40)}
    # plain CREATE on an existing table refuses
    with pytest.raises(ValueError, match="already exists"):
        sql(spark, "CREATE TABLE t AS SELECT k FROM src", roots)
    # IF NOT EXISTS skips without touching the table
    out = sql(
        spark, "CREATE TABLE IF NOT EXISTS t AS SELECT k FROM src", roots
    ).collect()[0]
    assert out.op == "create_skipped"
    assert V.latest_version(roots["t"]) == 0
    # OR REPLACE overwrites (new snapshot, history intact)
    sql(
        spark,
        "CREATE OR REPLACE TABLE t AS SELECT k FROM src WHERE k = 3",
        roots,
    )
    assert V.latest_version(roots["t"]) == 1
    assert [r.k for r in V.read_snapshot(spark, roots["t"]).collect()] == [3]
    # time travel to the pre-replace snapshot still serves
    assert V.read_snapshot(spark, roots["t"], version=0).count() == 2


def test_ctas_source_time_travel_and_literal_safety(spark, roots):
    _seed(spark, roots)
    V.commit_snapshot(
        spark.createDataFrame([(9, "z", 90)], "k bigint, name string, v int"),
        roots["src"], mode="append",
    )
    # AS SELECT time-travels; a literal containing PARTITIONED BY is data
    sql(
        spark,
        "CREATE TABLE t AS SELECT k, 'PARTITIONED BY (day)' AS note "
        "FROM src VERSION AS OF 0",
        roots,
    )
    got = V.read_snapshot(spark, roots["t"])
    assert got.count() == 3  # v0, not the appended row
    assert got.select("note").first().note == "PARTITIONED BY (day)"


def test_create_requires_registered_root(spark, roots):
    with pytest.raises(ValueError, match="must be registered"):
        sql(spark, "CREATE TABLE nowhere (k bigint)", roots)


# ---------------------------------------------------------- ALTER

def test_alter_rename_widen_add_drop_column(spark, roots):
    _seed(spark, roots, "t")
    sql(spark, "ALTER TABLE t RENAME COLUMN v TO amount", roots)
    assert "amount" in V.read_snapshot(spark, roots["t"]).columns
    # time travel shows the pre-rename name
    assert "v" in V.read_snapshot(spark, roots["t"], version=0).columns
    sql(spark, "ALTER TABLE t ALTER COLUMN amount TYPE bigint", roots)
    got = V.read_snapshot(spark, roots["t"])
    assert dict(got.dtypes)["amount"] == "bigint"
    # narrowing refuses
    with pytest.raises(V.SchemaEvolutionError, match="widening"):
        sql(spark, "ALTER TABLE t ALTER COLUMN amount TYPE int", roots)
    # metadata-only backfill: old rows read the DEFAULT
    sql(spark, "ALTER TABLE t ADD COLUMN src string DEFAULT 'legacy'", roots)
    assert {
        r.src for r in V.read_snapshot(spark, roots["t"]).collect()
    } == {"legacy"}
    V.commit_snapshot(
        spark.createDataFrame(
            [(4, "d", 40, "fresh")],
            "k bigint, name string, amount bigint, src string",
        ),
        roots["t"], mode="append",
    )
    assert {
        r.src for r in V.read_snapshot(spark, roots["t"]).collect()
    } == {"legacy", "fresh"}
    sql(spark, "ALTER TABLE t DROP COLUMN name", roots)
    assert "name" not in V.read_snapshot(spark, roots["t"]).columns


def test_alter_constraint_lifecycle_through_sql(spark, roots):
    _seed(spark, roots, "t")
    sql(spark, "ALTER TABLE t ADD CONSTRAINT v_pos CHECK (v >= 0)", roots)
    assert V.list_constraints(roots["t"]) == {"v_pos": "v >= 0"}
    # a violating batch is refused THROUGH SQL DML too
    with pytest.raises(V.ConstraintViolation):
        sql(spark, "INSERT INTO t VALUES (9, 'x', -5)", roots)
    # existing-data validation: a born-broken constraint refuses
    with pytest.raises(V.ConstraintViolation):
        sql(
            spark,
            "ALTER TABLE t ADD CONSTRAINT v_big CHECK (v > 100)",
            roots,
        )
    # a constrained column refuses rename (the expr would dangle)
    with pytest.raises(V.SchemaEvolutionError):
        sql(spark, "ALTER TABLE t RENAME COLUMN v TO w", roots)
    sql(spark, "ALTER TABLE t DROP CONSTRAINT v_pos", roots)
    assert V.list_constraints(roots["t"]) == {}
    sql(spark, "INSERT INTO t VALUES (9, 'x', -5)", roots)  # now lands


def test_constraint_with_keyword_literal(spark, roots):
    """A CHECK expression whose string literal contains ')' and
    clause keywords must parse (masked paren matching)."""
    _seed(spark, roots, "t")
    sql(
        spark,
        "ALTER TABLE t ADD CONSTRAINT no_kw CHECK "
        "(name != 'CHECK (x) THEN )')",
        roots,
    )
    assert "no_kw" in V.list_constraints(roots["t"])


def test_set_partition_spec_statement(spark, roots):
    _seed(spark, roots, "t")
    sql(spark, "ALTER TABLE t SET PARTITION SPEC (bucket(4, k))", roots)
    head = V.latest_version(roots["t"])
    assert V.read_manifest(roots["t"], head)["partition_by"] == [
        "bucket(4, k)"
    ]
    sql(spark, "ALTER TABLE t SET PARTITION SPEC ()", roots)
    head = V.latest_version(roots["t"])
    assert not V.read_manifest(roots["t"], head).get("partition_by")


def test_alter_unsupported_action_message(spark, roots):
    _seed(spark, roots, "t")
    with pytest.raises(ValueError, match="unsupported ALTER TABLE"):
        sql(spark, "ALTER TABLE t CLUSTER BY (k)", roots)


# ----------------------------------------------------------- DROP

def test_drop_table_and_if_exists(spark, roots):
    _seed(spark, roots, "t")
    out = sql(spark, "DROP TABLE t", roots).collect()[0]
    assert out.op == "drop"
    assert V.latest_version(roots["t"]) is None
    with pytest.raises(FileNotFoundError):
        sql(spark, "DROP TABLE t", roots)
    out = sql(spark, "DROP TABLE IF EXISTS t", roots).collect()[0]
    assert out.op == "drop_skipped"


# ----------------------------------------------- composability

def test_ddl_composes_with_transaction_stage(spark, roots, tmp_path):
    """DDL statements run against a transaction's staged branch
    handle: the schema change publishes atomically with the data."""
    from small_etl_spark.sinks import txn as T

    _seed(spark, roots, "t")
    cat = str(tmp_path / "cat")
    V.catalog_commit(cat, {"t": roots["t"]})
    txn = T.begin_transaction(cat, {"t": roots["t"]})
    h = txn.stage("t")
    sql(spark, "ALTER TABLE s ADD COLUMN flag int DEFAULT 1", {"s": h})
    sql(spark, "INSERT INTO s VALUES (4, 'd', 40, 2)", {"s": h})
    # nothing visible on main pre-commit
    assert "flag" not in V.read_snapshot(spark, roots["t"]).columns
    txn.commit()
    got = V.read_catalog(spark, cat, "t")
    assert {r.flag for r in got.collect()} == {1, 2}


def test_full_evolution_walk_sql_equals_primitives(spark, roots, tmp_path):
    """The same evolution story driven through SQL and through the
    Python primitives lands identical final contents."""
    _seed(spark, roots)
    p_sql = roots["t"]
    p_py = str(tmp_path / "py")
    sql(spark, "CREATE TABLE t AS SELECT * FROM src", roots)
    base = V.read_snapshot(spark, roots["src"])
    V.commit_snapshot(base, p_py, mode="overwrite")
    sql(spark, "ALTER TABLE t RENAME COLUMN v TO amount", roots)
    V.rename_column(p_py, "v", "amount")
    sql(spark, "ALTER TABLE t ALTER COLUMN amount TYPE bigint", roots)
    V.widen_type(p_py, "amount", "long")
    sql(spark, "ALTER TABLE t ADD COLUMN score double DEFAULT 0.5", roots)
    V.add_column(p_py, "score", "double", default=0.5)
    sql(spark, "ALTER TABLE t DROP COLUMN name", roots)
    V.drop_column(p_py, "name")
    a = {tuple(r) for r in V.read_snapshot(spark, p_sql).collect()}
    b = {tuple(r) for r in V.read_snapshot(spark, p_py).collect()}
    assert a == b and a


# ------------------------------------------- admin statements

def test_describe_detail_and_show_create(spark, roots):
    _seed(spark, roots, "t")
    sql(spark, "ALTER TABLE t ADD CONSTRAINT v_pos CHECK (v >= 0)", roots)
    d = sql(spark, "DESCRIBE DETAIL t", roots).collect()[0]
    assert d.name == "t" and d.location == roots["t"]
    assert d.num_rows == 3 and d.num_files >= 1 and d.size_bytes > 0
    assert d.constraints == ["v_pos"]
    assert "k:bigint" in d.schema.replace(" ", "")
    stmt = sql(spark, "SHOW CREATE TABLE t", roots).collect()[0]
    assert "CREATE TABLE t (k bigint, name string, v int)" in (
        stmt.create_statement
    )
    assert (
        "ALTER TABLE t ADD CONSTRAINT v_pos CHECK (v >= 0)"
        in stmt.create_statement
    )


def test_create_table_like(spark, roots, tmp_path):
    V.commit_snapshot(
        spark.createDataFrame(
            [(1, 7, "x")], "k bigint, day int, v string"
        ),
        roots["src"], mode="overwrite", partition_by=["day"],
    )
    sql(spark, "CREATE TABLE t LIKE src", roots)
    got = V.read_snapshot(spark, roots["t"])
    assert got.count() == 0  # shape only, no data
    # compare the MANIFEST schemas (a hive-partitioned read reorders
    # partition columns last once data exists)
    assert (
        V.read_manifest(roots["t"], 0)["schema"]
        == V.read_manifest(roots["src"], 0)["schema"]
    )
    head = V.latest_version(roots["t"])
    assert V.read_manifest(roots["t"], head)["partition_by"] == ["day"]
    # LIKE composes with nothing else — trailing clauses refuse
    with pytest.raises(ValueError, match="CREATE TABLE needs"):
        sql(spark, "CREATE TABLE other LIKE src AS SELECT 1", roots)


def test_shallow_clone_statement(spark, roots):
    _seed(spark, roots)
    V.commit_snapshot(
        spark.createDataFrame([(9, "z", 90)], "k bigint, name string, v int"),
        roots["src"], mode="append",
    )
    out = sql(spark, "CREATE TABLE t SHALLOW CLONE src", roots).collect()[0]
    assert out.op == "clone" and out.version == 0
    got = {r.k for r in V.read_snapshot(spark, roots["t"]).collect()}
    assert got == {1, 2, 3, 9}
    # the clone diverges independently; src untouched
    sql(spark, "INSERT INTO t VALUES (50, 'c', 500)", roots)
    assert V.read_snapshot(spark, roots["t"]).count() == 5
    assert V.read_snapshot(spark, roots["src"]).count() == 4
    # time-traveled clone forks the OLD snapshot
    sql(
        spark,
        "CREATE TABLE other SHALLOW CLONE src VERSION AS OF 0",
        roots,
    )
    assert V.read_snapshot(spark, roots["other"]).count() == 3
    # IF NOT EXISTS skips; plain CREATE on existing refuses
    out = sql(
        spark, "CREATE TABLE IF NOT EXISTS t SHALLOW CLONE src", roots
    ).collect()[0]
    assert out.op == "create_skipped"
    with pytest.raises(ValueError, match="OR REPLACE does not compose"):
        sql(spark, "CREATE OR REPLACE TABLE t SHALLOW CLONE src", roots)


def test_changes_table_reference(spark, roots):
    _seed(spark, roots, "t")  # v0: k 1..3
    sql(spark, "INSERT INTO t VALUES (4, 'd', 40)", roots)  # v1
    sql(spark, "DELETE FROM t WHERE k = 1", roots)  # v2
    rows = sql(
        spark,
        "SELECT _change_type, k FROM CHANGES(t, 0) "
        "ORDER BY _change_type, k",
        roots,
    ).collect()
    assert [(r._change_type, r.k) for r in rows] == [
        ("delete", 1), ("insert", 4),
    ]
    # bounded range: only the v0->v1 insert
    rows = sql(
        spark, "SELECT _change_type, k FROM CHANGES(t, 0, 1)", roots
    ).collect()
    assert [(r._change_type, r.k) for r in rows] == [("insert", 4)]
    # composes with joins + the literal guard
    n = sql(
        spark,
        "SELECT c.k, s.name FROM CHANGES(t, 0, 1) c "
        "JOIN t s ON c.k = s.k WHERE s.name != 'CHANGES(t, 0)'",
        roots,
    ).count()
    assert n == 1
