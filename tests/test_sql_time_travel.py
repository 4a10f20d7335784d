"""SQL front-end over versioned tables (small_etl_spark/sql.py):
VERSION AS OF / TIMESTAMP AS OF resolution, head reads, joins across
snapshots of the SAME table, catalog-pinned consistent reads, and the
guarantee that resolution goes through read_snapshot (MoR deletes and
schema evolution visible)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from small_etl_spark.sinks import versioned as V
from small_etl_spark.sql import sql


@pytest.fixture()
def roots(tmp_path, spark):
    docs = str(tmp_path / "docs")
    evs = str(tmp_path / "events")
    V.commit_snapshot(
        spark.range(0, 10).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        docs, mode="overwrite",
    )  # docs v0
    V.commit_snapshot(
        spark.range(10, 15).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        docs, mode="append",
    )  # docs v1
    V.commit_snapshot(
        spark.range(0, 15).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("grp")
        ),
        evs, mode="overwrite",
    )  # events v0
    return {"docs": docs, "events": evs}


def test_head_and_version_as_of(spark, roots):
    assert sql(
        spark, "SELECT COUNT(*) AS n FROM docs", roots
    ).first().n == 15
    assert sql(
        spark, "SELECT COUNT(*) AS n FROM docs VERSION AS OF 0", roots
    ).first().n == 10


def test_join_two_snapshots_of_same_table(spark, roots):
    # rows added between v0 and head, expressed as pure SQL
    got = sql(
        spark,
        """
        SELECT h.k FROM docs h
        LEFT ANTI JOIN docs VERSION AS OF 0 o ON h.k = o.k
        """,
        roots,
    )
    assert sorted(r.k for r in got.collect()) == [10, 11, 12, 13, 14]


def test_cross_table_join_and_agg(spark, roots):
    got = sql(
        spark,
        """
        SELECT e.grp, SUM(d.v) AS sv
        FROM docs VERSION AS OF 0 d
        JOIN events e ON d.k = e.k
        GROUP BY e.grp ORDER BY e.grp
        """,
        roots,
    ).collect()
    want = {g: sum(2 * k for k in range(10) if k % 3 == g)
            for g in range(3)}
    assert {r.grp: r.sv for r in got} == want


def test_timestamp_as_of(spark, roots):
    ts0 = V.read_manifest(roots["docs"], 0)["committed_at_ms"]
    n = sql(
        spark,
        f"SELECT COUNT(*) AS n FROM docs TIMESTAMP AS OF {ts0}",
        roots,
    ).first().n
    assert n == 10


def test_resolution_sees_mor_deletes(spark, roots):
    V.delete_where_mor(spark, roots["docs"], F.col("k") < 3)
    assert sql(
        spark, "SELECT COUNT(*) AS n FROM docs", roots
    ).first().n == 12


def test_catalog_pinned_reads(spark, roots, tmp_path):
    cat = str(tmp_path / "cat")
    V.catalog_commit(cat, {"docs": (roots["docs"], 0)})
    n = sql(spark, "SELECT COUNT(*) AS n FROM docs",
            catalog_root=cat).first().n
    assert n == 10
    # explicit AS OF overrides the pin
    n = sql(spark, "SELECT COUNT(*) AS n FROM docs VERSION AS OF 1",
            catalog_root=cat).first().n
    assert n == 15


def test_views_are_cleaned_up(spark, roots):
    before = {t.name for t in spark.catalog.listTables()}
    df = sql(spark, "SELECT COUNT(*) AS n FROM docs", roots)
    assert df.first().n == 15
    after = {t.name for t in spark.catalog.listTables()}
    assert not {t for t in after - before if t.startswith("__vsql_")}


def test_needs_tables_or_catalog(spark):
    with pytest.raises(ValueError, match="tables"):
        sql(spark, "SELECT 1")


def test_table_name_inside_string_literal_not_rewritten(spark, roots):
    """ADVICE r9 (low): FROM/JOIN appearing INSIDE a string literal is
    data, not syntax — the resolver must not rewrite it."""
    got = sql(
        spark,
        "SELECT COUNT(*) AS n, 'copied from docs archive' AS note "
        "FROM docs VERSION AS OF 0",
        roots,
    ).first()
    assert got.n == 10
    assert got.note == "copied from docs archive"
    # double-quoted literals too (Spark default: "..." is a string)
    got = sql(
        spark,
        'SELECT "join events later" AS note, COUNT(*) AS n FROM docs',
        roots,
    ).first()
    assert got.note == "join events later"
    assert got.n == 15
    # a literal with an escaped quote must not desync span tracking
    got = sql(
        spark,
        "SELECT 'it''s from docs' AS note, COUNT(*) AS n "
        "FROM docs VERSION AS OF 0",
        roots,
    ).first()
    assert got.note == "it's from docs"
    assert got.n == 10


def test_timestamp_as_of_accepts_zulu_suffix(spark, roots):
    """ISO timestamps with a trailing Z parse on every supported
    Python (fromisoformat only learned Z in 3.11)."""
    ms = V.read_manifest(roots["docs"], 0)["committed_at_ms"]
    from datetime import datetime, timezone

    iso_z = (
        datetime.fromtimestamp(ms / 1000, tz=timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z"
    )
    got = sql(
        spark,
        f"SELECT COUNT(*) AS n FROM docs TIMESTAMP AS OF '{iso_z}'",
        roots,
    ).first()
    assert got.n == 10
