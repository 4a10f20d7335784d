"""Catalog + branch SQL surface (VERDICT r11 #3): ``t@branch``
addressing, branch/tag lifecycle DDL, PUBLISH BRANCH (WAP-in-SQL),
SHOW TABLES / SHOW BRANCHES / SHOW TAGS / DESCRIBE CATALOG, and
CHANGES() with TIMESTAMP bounds."""

from __future__ import annotations

import pytest

from small_etl_spark.sinks import versioned as V
from small_etl_spark.sql import sql


@pytest.fixture()
def env(tmp_path, spark):
    docs = str(tmp_path / "docs")
    V.commit_snapshot(
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30)], "k bigint, v bigint"
        ),
        docs, mode="overwrite",
    )
    return {"docs": docs}


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_wap_in_sql_end_to_end(spark, env):
    t = {"docs": env["docs"]}
    sql(spark, "ALTER TABLE docs CREATE BRANCH wap", tables=t)
    # Write: stage on the branch; main must be untouched
    sql(spark, "UPDATE docs@wap SET v = v + 100 WHERE k <= 2", tables=t)
    sql(spark, "INSERT INTO docs@wap VALUES (4, 40)", tables=t)
    assert _rows(
        sql(spark, "SELECT k, v FROM docs", tables=t)
    ) == {(1, 10), (2, 20), (3, 30)}
    # Audit: read the staged state
    assert _rows(
        sql(spark, "SELECT k, v FROM docs@wap", tables=t)
    ) == {(1, 110), (2, 120), (3, 30), (4, 40)}
    # Publish: one squashed fast-forward on main
    out = sql(spark, "ALTER TABLE docs PUBLISH BRANCH wap", tables=t)
    [(op, name, ver)] = [tuple(r) for r in out.collect()]
    assert (op, name) == ("publish_branch", "docs")
    assert ver == 1
    assert _rows(
        sql(spark, "SELECT k, v FROM docs", tables=t)
    ) == {(1, 110), (2, 120), (3, 30), (4, 40)}
    # the squashed delta is visible to CDC between cut and head
    ch = _rows(
        sql(
            spark,
            "SELECT _change_type, k, v FROM CHANGES(docs, 0)",
            tables=t,
        )
    )
    assert ("insert", 4, 40) in ch
    assert ("delete", 1, 10) in ch and ("insert", 1, 110) in ch


def test_branch_ref_requires_existing_branch(spark, env):
    with pytest.raises(ValueError, match="no branch 'nope'"):
        sql(
            spark, "SELECT * FROM docs@nope",
            tables={"docs": env["docs"]},
        )


def test_branch_drop_and_tags(spark, env):
    t = {"docs": env["docs"]}
    sql(spark, "ALTER TABLE docs CREATE BRANCH dead", tables=t)
    assert _rows(sql(spark, "SHOW BRANCHES docs", tables=t)) == {
        ("dead", 0, 0)
    }
    sql(spark, "ALTER TABLE docs DROP BRANCH dead", tables=t)
    assert _rows(sql(spark, "SHOW BRANCHES docs", tables=t)) == set()

    sql(spark, "INSERT INTO docs VALUES (9, 90)", tables=t)
    sql(
        spark,
        "ALTER TABLE docs CREATE TAG cut VERSION AS OF 0",
        tables=t,
    )
    sql(spark, "ALTER TABLE docs CREATE TAG head", tables=t)
    assert _rows(sql(spark, "SHOW TAGS docs", tables=t)) == {
        ("cut", 0), ("head", 1)
    }
    sql(spark, "ALTER TABLE docs DROP TAG cut", tables=t)
    assert _rows(sql(spark, "SHOW TAGS docs", tables=t)) == {("head", 1)}


def test_show_tables_pins_catalog_versions(spark, tmp_path, env):
    other = str(tmp_path / "other")
    V.commit_snapshot(
        spark.createDataFrame([(1,)], "x bigint"), other, mode="overwrite"
    )
    cat = str(tmp_path / "cat")
    V.catalog_commit(cat, {"docs": env["docs"], "other": other})
    # advance docs past the catalog pin: SHOW TABLES under the
    # catalog must still report the PINNED version
    sql(
        spark, "INSERT INTO docs VALUES (9, 90)",
        tables={"docs": env["docs"]},
    )
    assert _rows(sql(spark, "SHOW TABLES", catalog_root=cat)) == {
        ("docs", 0), ("other", 0)
    }
    # without a catalog: head versions
    assert _rows(
        sql(
            spark, "SHOW TABLES",
            tables={"docs": env["docs"], "other": other},
        )
    ) == {("docs", 1), ("other", 0)}


def test_describe_catalog_is_commit_history(spark, tmp_path, env):
    cat = str(tmp_path / "cat")
    V.catalog_commit(cat, {"docs": env["docs"]})
    V.catalog_commit(cat, {"docs": env["docs"]}, merge=True)
    hist = sql(
        spark, "DESCRIBE CATALOG",
        tables={"docs": env["docs"]}, catalog_root=cat,
    )
    assert hist.count() == 2
    with pytest.raises(ValueError, match="catalog_root"):
        sql(
            spark, "DESCRIBE CATALOG", tables={"docs": env["docs"]}
        )


def test_changes_timestamp_bounds(spark, env):
    t = {"docs": env["docs"]}
    ts0 = int(
        V.read_manifest(env["docs"], 0)["committed_at_ms"]
    )
    sql(spark, "INSERT INTO docs VALUES (4, 40)", tables=t)
    # TIMESTAMP 'iso' bound resolves via version_as_of: the snapshot
    # current AT the v0 instant is v0, so v0 → 1 is the appended row
    import datetime as dt

    iso0 = (
        dt.datetime.fromtimestamp(
            ts0 / 1000, tz=dt.timezone.utc
        ).isoformat()
    )
    got = _rows(
        sql(
            spark,
            "SELECT _change_type, k, v FROM "
            f"CHANGES(docs, TIMESTAMP '{iso0}', 1)",
            tables=t,
        )
    )
    assert got == {("insert", 4, 40)}
    # open upper bound with a TIMESTAMP lower bound
    got2 = _rows(
        sql(
            spark,
            "SELECT _change_type, k, v FROM "
            f"CHANGES(docs, TIMESTAMP '{iso0}')",
            tables=t,
        )
    )
    assert got2 == {("insert", 4, 40)}


def test_branch_ref_inside_literal_untouched(spark, env):
    t = {"docs": env["docs"]}
    out = sql(
        spark,
        "SELECT 'docs@wap' AS s FROM docs LIMIT 1",
        tables=t,
    )
    assert [r.s for r in out.collect()] == ["docs@wap"]
