"""Versioned-table metadata protocol on an OBJECT-STORE root (moto,
no Spark, no hadoop jars): the commit primitive is a conditional PUT
(sinks/store.py::S3Store) and everything above it — the manifest
log, OCC, catalog swaps, time travel, stats pruning, vacuum — is
pure metadata, so the whole protocol is exercisable against mock S3
directly. The Spark DATA side on s3a:// is covered by the jar-gated
test_s3a_versioned_walk (cluster distros); here data files are
stand-in objects, which is all vacuum/planning ever look at."""

from __future__ import annotations

import json

import pytest

from small_etl_spark.sinks import versioned as V
from small_etl_spark.sinks.store import store_for

moto = pytest.importorskip("moto")


@pytest.fixture()
def s3(monkeypatch):
    from moto import mock_aws

    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "testing")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "testing")
    monkeypatch.setenv("AWS_DEFAULT_REGION", "us-east-1")
    with mock_aws():
        import boto3

        boto3.client("s3").create_bucket(Bucket="graft-lake")
        # fresh client per moto context: the module-level singleton
        # would reuse a client bound to a dead mock
        import small_etl_spark.sinks.store as store_mod

        store_mod._S3 = None
        yield "s3://graft-lake"
        store_mod._S3 = None


SCHEMA = {
    "type": "struct",
    "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "long", "nullable": True, "metadata": {}},
    ],
}


def _commit(table, version, parent, files, mode="overwrite", **extra):
    """Hand-rolled commit record in the real manifest shape — the
    data files are stand-in objects (metadata tests never open them)."""
    st = store_for(table)
    payload = {
        "snapshot": version,
        "parent": parent,
        "mode": mode,
        "schema": SCHEMA,
        "commit_id": f"c{version:04d}",
        "stream_batch_high": -1,
        "committed_at_ms": V._now_ms(),
        **extra,
    }
    if mode == "append":
        payload["add"] = files
        payload["remove"] = []
    else:
        payload["files"] = files
    for e in files:
        st.put_json(f"{table}/{e['path']}", {"stand_in": True})
    return V._atomic_create(V._manifest_path(table, version), payload)


def _entry(cid, i, lo, hi, rows=10):
    return {
        "path": f"data/{cid}/part-{i:05d}.parquet",
        "rows": rows,
        "bytes": 1024,
        "stats": {"k": {"min": lo, "max": hi, "nulls": 0}},
    }


def test_manifest_log_and_occ_on_s3(s3):
    tbl = f"{s3}/events"
    assert V.latest_version(tbl) is None
    assert _commit(tbl, 0, None, [_entry("c0", 0, 0, 9)])
    assert _commit(tbl, 1, 0, [_entry("c1", 0, 10, 19)], mode="append")
    # OCC: a second v1 committer LOSES (conditional PUT returns False)
    assert not _commit(tbl, 1, 0, [_entry("cX", 0, 99, 99)], mode="append")
    assert V.latest_version(tbl) == 1
    m = V.read_manifest(tbl, 1)
    assert {e["path"] for e in m["files"]} == {
        "data/c0/part-00000.parquet",
        "data/c1/part-00000.parquet",
    }
    # the loser's record never became visible
    assert V.read_manifest(tbl, 1)["commit_id"] == "c0001"


def test_plan_files_prunes_on_s3(s3):
    tbl = f"{s3}/pruned"
    _commit(
        tbl, 0, None,
        [_entry("c0", i, i * 10, i * 10 + 9) for i in range(8)],
    )
    kept, total = V.plan_files(tbl, where=[("k", "=", 35)])
    assert total == 8
    assert kept == [f"{tbl}/data/c0/part-00003.parquet"]


def test_time_travel_and_vacuum_on_s3(s3):
    tbl = f"{s3}/tt"
    st = store_for(tbl)
    now = V._now_ms()
    _commit(tbl, 0, None, [_entry("c0", 0, 0, 9)],
            committed_at_ms=now - 10_000)
    t_after_v0 = now - 5_000
    _commit(tbl, 1, 0, [_entry("c1", 0, 10, 19)])  # overwrite drops c0
    assert V.version_as_of(tbl, t_after_v0) == 0
    assert V.version_as_of(tbl, V._now_ms()) == 1
    # tag v1 then vacuum: v0's manifest AND its unreferenced data go
    V.create_tag(tbl, "rel", version=1)
    deleted = V.vacuum(tbl, keep_last=1)
    assert deleted == 1  # v0's stand-in data object reclaimed
    # the old manifest is gone, the tagged one survives
    assert not st.exists(V._manifest_path(tbl, 0))
    assert st.exists(V._manifest_path(tbl, 1))
    assert V.resolve_tag(tbl, "rel") == 1


def test_vacuum_reclaims_unreferenced_data_on_s3(s3):
    tbl = f"{s3}/vac"
    st = store_for(tbl)
    _commit(tbl, 0, None, [_entry("c0", 0, 0, 9)])
    _commit(tbl, 1, 0, [_entry("c1", 0, 0, 9)])  # overwrite: c0 dead
    dead = f"{tbl}/data/c0/part-00000.parquet"
    assert st.exists(dead)
    deleted = V.vacuum(tbl, keep_last=1)
    assert deleted == 1
    assert not st.exists(dead)
    assert st.exists(f"{tbl}/data/c1/part-00000.parquet")


def test_catalog_swap_on_s3_catalog_root(s3, tmp_path):
    """The production mixed topology: per-table roots wherever they
    live (local here), the CATALOG — the transaction commit point —
    on the object store. One conditional PUT swings every pin."""
    cat = f"{s3}/_catalog"
    t1, t2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    for t in (t1, t2):
        # local stand-in tables with one committed version each
        store_for(t).makedirs(f"{t}/{V._MANIFEST_DIR}")
        assert V._atomic_create(
            V._manifest_path(t, 0),
            {
                "snapshot": 0, "parent": None, "mode": "overwrite",
                "schema": SCHEMA, "files": [], "commit_id": "x",
                "stream_batch_high": -1,
                "committed_at_ms": V._now_ms(),
            },
        )
    v0 = V.catalog_commit(cat, {"a": t1, "b": t2})
    assert v0 == 0
    v1 = V.catalog_commit(cat, {"a": (t1, 0)}, merge=True)
    tables = V.read_manifest(cat, v1)["tables"]
    assert set(tables) == {"a", "b"}, "merge carries the b pin forward"
    assert V.latest_version(cat) == 1


def test_branches_refuse_on_object_store(s3):
    tbl = f"{s3}/nb"
    _commit(tbl, 0, None, [_entry("c0", 0, 0, 9)])
    with pytest.raises(NotImplementedError, match="object-store"):
        V.branch_create(tbl, "wap")


def test_tmp_sweep_is_local_only_noop_on_s3(s3):
    """S3 conditional PUT leaves no temp objects; vacuum's .tmp sweep
    must not trip over that (S3 list returns no .tmp names)."""
    tbl = f"{s3}/clean"
    _commit(tbl, 0, None, [_entry("c0", 0, 0, 9)])
    assert V.vacuum(tbl, keep_last=5) == 0


def test_drop_table_on_s3(s3):
    tbl = f"{s3}/gone"
    _commit(tbl, 0, None, [_entry("c0", 0, 0, 9)])
    V.drop_table(tbl)
    assert V.latest_version(tbl) is None
    assert store_for(tbl).walk_files(tbl) == []
