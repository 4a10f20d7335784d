"""SQL transaction blocks (sql.py ``BEGIN; ...; COMMIT/ROLLBACK``
over sinks/txn.py): every inner statement runs against the staged
branches of one multi-table transaction; COMMIT is its single atomic
catalog swap (VERDICT r10 #3). Crash injection between inner
statements must leave nothing durable."""

from __future__ import annotations

import pytest

from small_etl_spark.sinks import txn as T
from small_etl_spark.sinks import versioned as V
from small_etl_spark.sql import sql


@pytest.fixture()
def env(tmp_path, spark):
    fact = str(tmp_path / "fact")
    dim = str(tmp_path / "dim")
    cat = str(tmp_path / "cat")
    V.commit_snapshot(
        spark.createDataFrame(
            [(1, 10), (2, 20)], "k bigint, v bigint"
        ),
        fact, mode="overwrite",
    )
    V.commit_snapshot(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "k bigint, tag string"
        ),
        dim, mode="overwrite",
    )
    V.catalog_commit(cat, {"fact": fact, "dim": dim})
    return {"fact": fact, "dim": dim, "cat": cat}


def _cat_state(spark, env):
    f = {
        (r.k, r.v)
        for r in V.read_catalog(spark, env["cat"], "fact").collect()
    }
    d = {
        (r.k, r.tag)
        for r in V.read_catalog(spark, env["cat"], "dim").collect()
    }
    return f, d


def test_block_commits_two_tables_atomically(spark, env):
    out = sql(
        spark,
        """
        BEGIN;
        UPDATE fact SET v = v + 100 WHERE k = 1;
        INSERT INTO fact VALUES (3, 30);
        UPDATE dim SET tag = 'patched' WHERE k = 1;
        COMMIT;
        """,
        catalog_root=env["cat"],
    )
    rows = [(r.op, r.seq) for r in out.collect()]
    assert rows[-1][0] == "commit"
    assert [op for op, _ in rows[:-1]] == [
        "update", "insert_append", "update",
    ]
    f, d = _cat_state(spark, env)
    assert f == {(1, 110), (2, 20), (3, 30)}
    assert d == {(1, "patched"), (2, "b")}
    # branches + intents cleaned
    assert V.list_branches(env["fact"]) == {}
    assert T._list_intents(env["cat"]) == []


def test_block_reads_are_snapshot_isolated_and_see_own_writes(
    spark, env
):
    """An inner INSERT ... SELECT reads the block's OWN staged state
    of another table, not main."""
    sql(
        spark,
        """
        BEGIN;
        INSERT INTO dim VALUES (3, 'c');
        INSERT INTO fact SELECT k, 99 FROM dim WHERE tag = 'c';
        COMMIT;
        """,
        catalog_root=env["cat"],
    )
    f, d = _cat_state(spark, env)
    assert (3, 99) in f and (3, "c") in d


def test_rollback_leaves_catalog_untouched(spark, env):
    out = sql(
        spark,
        """
        BEGIN;
        DELETE FROM fact WHERE k = 1;
        UPDATE dim SET tag = 'x';
        ROLLBACK;
        """,
        catalog_root=env["cat"],
    )
    assert out.collect()[-1].op == "rollback"
    f, d = _cat_state(spark, env)
    assert f == {(1, 10), (2, 20)} and d == {(1, "a"), (2, "b")}
    assert V.list_branches(env["fact"]) == {}
    assert V.list_branches(env["dim"]) == {}


def test_failing_inner_statement_aborts_everything(spark, env):
    with pytest.raises(Exception, match="nope_col"):
        sql(
            spark,
            """
            BEGIN;
            UPDATE fact SET v = v + 1;
            UPDATE dim SET nope_col = 1;
            COMMIT;
            """,
            catalog_root=env["cat"],
        )
    f, d = _cat_state(spark, env)
    assert f == {(1, 10), (2, 20)} and d == {(1, "a"), (2, "b")}
    assert V.list_branches(env["fact"]) == {}


def test_crash_between_statements_leaves_nothing_durable(
    spark, env, monkeypatch
):
    """Crash injection between inner statements: the first statement
    staged, the second dies mid-flight — nothing is visible, no
    intent exists (it only lands inside COMMIT), and the next block
    runs clean after orphan cleanup."""
    calls = {"n": 0}
    real_update = V.update_where

    def crashy_update(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt("simulated crash")  # not Exception
        return real_update(*a, **kw)

    monkeypatch.setattr(V, "update_where", crashy_update)
    from small_etl_spark import sql as sql_mod

    monkeypatch.setattr(sql_mod.V, "update_where", crashy_update)
    with pytest.raises(KeyboardInterrupt):
        sql(
            spark,
            """
            BEGIN;
            UPDATE fact SET v = v + 1;
            UPDATE dim SET tag = 'x';
            COMMIT;
            """,
            catalog_root=env["cat"],
        )
    monkeypatch.setattr(sql_mod.V, "update_where", real_update)
    monkeypatch.setattr(V, "update_where", real_update)
    # catalog + mains untouched; no intent
    f, d = _cat_state(spark, env)
    assert f == {(1, 10), (2, 20)} and d == {(1, "a"), (2, "b")}
    assert T._list_intents(env["cat"]) == []
    # a dangling _txn-* branch may remain (crash before abort ran);
    # orphan cleanup collects it and the next block commits fine
    T.recover_orphan_transactions(
        {"fact": env["fact"], "dim": env["dim"]},
        catalog_root=env["cat"],
    )
    assert V.list_branches(env["fact"]) == {}
    sql(
        spark,
        "BEGIN; INSERT INTO fact VALUES (5, 50); COMMIT;",
        catalog_root=env["cat"],
    )
    f, _ = _cat_state(spark, env)
    assert (5, 50) in f


def test_block_with_ddl_and_select(spark, env):
    """ALTER TABLE statements stage like DML; a SELECT runs read-only
    against the staged cut."""
    out = sql(
        spark,
        """
        BEGIN;
        ALTER TABLE fact ADD COLUMN src string DEFAULT 'old';
        INSERT INTO fact VALUES (7, 70, 'new');
        SELECT * FROM fact;
        COMMIT;
        """,
        catalog_root=env["cat"],
    )
    ops = [r.op for r in out.collect()]
    assert ops == ["add_column", "insert_append", "select", "commit"]
    got = V.read_catalog(spark, env["cat"], "fact")
    assert {r.src for r in got.collect()} == {"old", "new"}


def test_block_guardrails(spark, env):
    with pytest.raises(ValueError, match="catalog_root"):
        sql(
            spark, "BEGIN; COMMIT;",
            tables={"fact": env["fact"]},
        )
    with pytest.raises(ValueError, match="COMMIT or ROLLBACK"):
        sql(
            spark,
            "BEGIN; UPDATE fact SET v = 1;",
            catalog_root=env["cat"],
        )
    with pytest.raises(ValueError, match="nested BEGIN"):
        sql(
            spark,
            "BEGIN; BEGIN; COMMIT; COMMIT;",
            catalog_root=env["cat"],
        )
    with pytest.raises(ValueError, match="CREATE/DROP TABLE"):
        sql(
            spark,
            "BEGIN; CREATE TABLE q (k bigint); COMMIT;",
            catalog_root=env["cat"],
        )
    # literal semicolons are data, not statement separators
    sql(
        spark,
        "BEGIN; UPDATE dim SET tag = 'a;b' WHERE k = 1; COMMIT;",
        catalog_root=env["cat"],
    )
    _, d = _cat_state(spark, env)
    assert (1, "a;b") in d


def test_block_occ_conflict_aborts(spark, env):
    """A racer advancing a staged table's main between BEGIN and
    COMMIT: the pre-check conflicts, the block aborts, catalog
    untouched."""
    from small_etl_spark.sinks.txn import TransactionConflict

    # run the block manually to interleave: stage via the txn API,
    # then race, then commit through sql's path — simplest determinism
    # is a racer INSIDE the block via a monkeypatched publish; here we
    # instead pre-advance between two sql() calls by splitting blocks.
    txn = T.begin_transaction(env["cat"], {"fact": env["fact"]})
    sql(spark, "INSERT INTO f VALUES (9, 90)", {"f": txn.stage("fact")})
    V.commit_snapshot(
        spark.createDataFrame([(8, 80)], "k bigint, v bigint"),
        env["fact"], mode="append",
    )
    with pytest.raises(TransactionConflict):
        txn.commit()
    f, _ = _cat_state(spark, env)
    assert (9, 90) not in f and (8, 80) not in f  # catalog at old pin
