"""Round-12 advisor fixes (ADVICE.md r11):

1. catalog_commit(merge=True) must not silently drop a LIVE table
   whose pinned old manifest was vacuumed — re-pin at head; only a
   genuinely dropped table prunes.
2. branch publish idempotence matches (name, creation token), not
   name alone — a recycled branch name must never adopt a previous
   incarnation's publish record.
3. vacuum sweeps orphaned `*.tmp` commit temp files (crash between
   temp-write and hard-link in _atomic_create), age-guarded.
4. SQL BEGIN blocks tolerate a tables mapping that registers
   not-yet-created roots (CREATE TABLE's registration contract).
"""

from __future__ import annotations

import os

import pytest

from small_etl_spark import sql as Q
from small_etl_spark.sinks import txn as T
from small_etl_spark.sinks import versioned as V


@pytest.fixture()
def env(tmp_path, spark):
    fact = str(tmp_path / "fact")
    dim = str(tmp_path / "dim")
    cat = str(tmp_path / "cat")
    V.commit_snapshot(
        spark.createDataFrame([(0, 0)], "batch bigint, v bigint"),
        fact, mode="overwrite",
    )
    V.commit_snapshot(
        spark.createDataFrame([(0, "b0")], "batch bigint, tag string"),
        dim, mode="overwrite",
    )
    V.catalog_commit(cat, {"fact": fact, "dim": dim})
    return {"fact": fact, "dim": dim, "cat": cat}


# ---------------------------------------------------------------- #
# 1. vacuumed pin of a LIVE table re-pins at head, never prunes     #
# ---------------------------------------------------------------- #


def test_vacuumed_pin_of_live_table_repins_at_head(spark, env):
    # advance dim twice so the catalog's pin (v0) becomes expirable
    for b in (1, 2):
        V.commit_snapshot(
            spark.createDataFrame([(b, f"b{b}")], "batch bigint, tag string"),
            env["dim"], mode="append",
        )
    V.vacuum(env["dim"], keep_last=1)  # drops dim@0 — the pinned one
    assert not os.path.exists(
        V._manifest_path(env["dim"], 0)
    ), "precondition: the pinned manifest is gone"
    # a txn touching only fact carries dim's pin forward
    txn = T.begin_transaction(env["cat"], {"fact": env["fact"]})
    V.commit_snapshot(
        spark.createDataFrame([(1, 10)], "batch bigint, v bigint"),
        txn.stage("fact"), mode="append",
    )
    txn.commit()
    head = V.latest_version(env["cat"])
    tables = V.read_manifest(env["cat"], head)["tables"]
    assert "dim" in tables, "live table must NOT silently vanish"
    assert int(tables["dim"]["version"]) == V.latest_version(env["dim"])
    got = {
        r.batch
        for r in V.read_catalog(spark, env["cat"], "dim").collect()
    }
    assert got == {0, 1, 2}


def test_dropped_table_pin_still_prunes(spark, env):
    V.drop_table(env["dim"])
    v = V.catalog_commit(env["cat"], {"fact": env["fact"]}, merge=True)
    tables = V.read_manifest(env["cat"], v)["tables"]
    assert "dim" not in tables


# ---------------------------------------------------------------- #
# 2. recycled branch name never adopts the old incarnation          #
# ---------------------------------------------------------------- #


def test_recycled_branch_name_does_not_adopt_old_publish(spark, env):
    fact = env["fact"]
    # incarnation 1: cut at head, stage an append, publish
    h1 = V.branch_create(fact, "exp")
    V.commit_snapshot(
        spark.createDataFrame([(1, 10)], "batch bigint, v bigint"),
        h1, mode="append",
    )
    v1 = V.branch_publish(fact, "exp", rebase_appends=True)
    assert V._read_record(fact, v1).get("branch") == "exp"
    V.branch_abandon(fact, "exp")
    # incarnation 2: recycle the NAME, cut at the ORIGINAL base (v0)
    # so incarnation 1's publish sits inside the idempotence scan
    h2 = V.branch_create(fact, "exp", version=0)
    V.commit_snapshot(
        spark.createDataFrame([(2, 20)], "batch bigint, v bigint"),
        h2, mode="append",
    )
    v2 = V.branch_publish(fact, "exp", rebase_appends=True)
    # pre-fix: the scan matched incarnation 1's record by NAME and
    # returned v1, silently discarding batch 2
    assert v2 > v1, "new incarnation must publish its own commit"
    got = {
        r.batch for r in V.read_snapshot(spark, fact).collect()
    }
    assert got == {0, 1, 2}, "both incarnations' rows must land"


def test_owner_still_adopts_same_incarnation_publish(spark, env):
    """The guard must keep matching the SAME incarnation (recovery
    raced the owner): a second publish call of one incarnation is a
    no-op returning the recorded version."""
    fact = env["fact"]
    h = V.branch_create(fact, "once")
    V.commit_snapshot(
        spark.createDataFrame([(1, 10)], "batch bigint, v bigint"),
        h, mode="append",
    )
    # interloper forces the rebase path on the second call
    v1 = V.branch_publish(fact, "once", rebase_appends=True)
    v2 = V.branch_publish(fact, "once", rebase_appends=True)
    assert v2 == v1, "same incarnation republish must adopt, not dup"
    got = [
        r.batch
        for r in V.read_snapshot(spark, fact).collect()
        if r.batch == 1
    ]
    assert got == [1], "staged rows must land exactly once"


# ---------------------------------------------------------------- #
# 3. vacuum sweeps orphaned commit temp files                       #
# ---------------------------------------------------------------- #


def test_vacuum_sweeps_stale_commit_tmp_files(spark, env):
    mdir = os.path.join(env["fact"], V._MANIFEST_DIR)
    stale = os.path.join(mdir, "00000000000000000007.json.deadbeef.tmp")
    with open(stale, "w") as fh:
        fh.write("{")  # torn write — crash between temp and link
    old = os.path.getmtime(stale) - 7200
    os.utime(stale, (old, old))
    fresh = os.path.join(mdir, "00000000000000000008.json.cafecafe.tmp")
    with open(fresh, "w") as fh:
        fh.write("{")
    V.vacuum(env["fact"], keep_last=10, min_age_ms=3_600_000)
    assert not os.path.exists(stale), "old orphan must sweep"
    assert os.path.exists(fresh), "min_age_ms must protect in-flight"
    # default min_age_ms=0 still does NOT sweep a fresh tmp: the tmp
    # guard has a 1h floor (review r12 — sweeping an in-flight tmp
    # would crash a healthy commit between write and hard-link)
    V.vacuum(env["fact"], keep_last=10)
    assert os.path.exists(fresh), "tmp floor must protect in-flight"
    old2 = os.path.getmtime(fresh) - 7200
    os.utime(fresh, (old2, old2))
    V.vacuum(env["fact"], keep_last=10)
    assert not os.path.exists(fresh)
    # the table still reads fine
    assert V.read_snapshot(spark, env["fact"]).count() == 1


# ---------------------------------------------------------------- #
# 4. BEGIN block with a registered-but-uncreated root               #
# ---------------------------------------------------------------- #


def test_txn_block_ignores_uncreated_registered_roots(
    spark, env, tmp_path
):
    tables = {
        "fact": env["fact"],
        "dim": env["dim"],
        "pending": str(tmp_path / "not-yet-created"),
    }
    out = Q.sql(
        spark,
        """
        BEGIN;
        INSERT INTO fact VALUES (5, 50);
        COMMIT
        """,
        tables=tables,
        catalog_root=env["cat"],
    ).collect()
    assert out[-1]["op"] == "commit"
    got = {
        r.batch
        for r in V.read_catalog(spark, env["cat"], "fact").collect()
    }
    assert got == {0, 5}


def test_txn_block_statement_on_uncreated_root_targeted_error(
    spark, env, tmp_path
):
    tables = {
        "fact": env["fact"],
        "pending": str(tmp_path / "not-yet-created"),
    }
    with pytest.raises(ValueError, match="no committed snapshots"):
        Q.sql(
            spark,
            "BEGIN; INSERT INTO pending VALUES (1, 1); COMMIT",
            tables=tables,
            catalog_root=env["cat"],
        )
