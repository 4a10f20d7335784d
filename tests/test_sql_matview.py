"""SQL materialized-view DDL (sql.py → sinks/matview.py): CREATE
MATERIALIZED VIEW ... AS SELECT, REFRESH (CDC-driven), SELECT
resolution through read_matview, DROP."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from small_etl_spark.sinks import matview as M
from small_etl_spark.sinks import versioned as V
from small_etl_spark.sql import sql


@pytest.fixture()
def env(tmp_path, spark):
    base = str(tmp_path / "base")
    V.commit_snapshot(
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 5), (4, "b", -1)],
            "k bigint, g string, v bigint",
        ),
        base, mode="overwrite",
    )
    return {"base": base, "view": str(tmp_path / "view")}


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_create_refresh_select_drop(spark, env):
    t = {"docs": env["base"], "mv": env["view"]}
    out = sql(
        spark,
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT g, count(*) AS n, sum(v) AS sv, avg(v) AS av "
        "FROM docs WHERE v >= 0 GROUP BY g",
        tables=t,
    ).first()
    assert out["op"] == "create_matview"
    assert _rows(
        sql(spark, "SELECT g, n, sv FROM mv", tables=t)
    ) == {("a", 2, 30), ("b", 1, 5)}
    # base advances; REFRESH folds the delta, never recomputes
    V.commit_snapshot(
        spark.createDataFrame(
            [(5, "b", 100)], "k bigint, g string, v bigint"
        ),
        env["base"], mode="append",
    )
    r = sql(spark, "REFRESH MATERIALIZED VIEW mv", tables=t).first()
    assert r["op"] == "refresh_incremental"
    assert _rows(
        sql(spark, "SELECT g, n, sv FROM mv", tables=t)
    ) == {("a", 2, 30), ("b", 2, 105)}
    # the view joins with its base in one statement
    joined = sql(
        spark,
        "SELECT d.k, m.n FROM docs d JOIN mv m ON d.g = m.g "
        "WHERE d.v >= 100",
        tables=t,
    )
    assert _rows(joined) == {(5, 2)}
    sql(spark, "DROP MATERIALIZED VIEW mv", tables=t)
    assert V.latest_version(M._state_root(env["view"])) is None


def test_time_travel_on_view_refuses(spark, env):
    t = {"docs": env["base"], "mv": env["view"]}
    sql(
        spark,
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT g, count(*) AS n FROM docs GROUP BY g",
        tables=t,
    )
    with pytest.raises(ValueError, match="materialized view"):
        sql(spark, "SELECT * FROM mv VERSION AS OF 0", tables=t)


def test_bad_select_items_refused(spark, env):
    t = {"docs": env["base"], "mv": env["view"]}
    with pytest.raises(ValueError, match="GROUP BY"):
        sql(
            spark,
            "CREATE MATERIALIZED VIEW mv AS "
            "SELECT v, count(*) AS n FROM docs GROUP BY g",
            tables=t,
        )
    with pytest.raises(ValueError, match="AS <name>"):
        sql(
            spark,
            "CREATE MATERIALIZED VIEW mv AS "
            "SELECT g, count(*) FROM docs GROUP BY g",
            tables=t,
        )


def test_agg_expr_with_commas_and_where_literal(spark, env):
    """Nested commas inside agg exprs and WHERE literals containing
    keywords must survive the depth-0 split / literal masking."""
    t = {"docs": env["base"], "mv": env["view"]}
    sql(
        spark,
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT g, sum(v + coalesce(k, 0)) AS sk "
        "FROM docs WHERE g <> 'FROM GROUP BY' GROUP BY g",
        tables=t,
    )
    expected = {
        (r.g, r.sk)
        for r in V.read_snapshot(spark, env["base"])
        .groupBy("g")
        .agg(
            F.sum(
                F.col("v") + F.coalesce(F.col("k"), F.lit(0))
            ).alias("sk")
        )
        .collect()
    }
    assert _rows(sql(spark, "SELECT g, sk FROM mv", tables=t)) == expected
