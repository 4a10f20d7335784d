"""Metadata-store contract (sinks/store.py): the LOCAL flavor
(temp+fsync+hard-link) and the OBJECT-STORE flavor (S3 conditional
PUT, ``If-None-Match: "*"``) must be behaviorally interchangeable —
one parametrized contract body runs against both, the S3 side on a
moto mock (no Spark, no jars needed: the metadata layer talks boto3
directly; the jar-gated test_s3a_versioned_walk covers the Spark
data side on cluster distros)."""

from __future__ import annotations

import os
import threading

import pytest

from small_etl_spark.sinks.store import (
    LocalStore,
    S3Store,
    is_object_store,
    store_for,
)

moto = pytest.importorskip("moto")


@pytest.fixture()
def s3_root(monkeypatch):
    from moto import mock_aws

    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "testing")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "testing")
    monkeypatch.setenv("AWS_DEFAULT_REGION", "us-east-1")
    with mock_aws():
        import boto3

        boto3.client("s3").create_bucket(Bucket="graft-store")
        yield "s3://graft-store/tbl"


@pytest.fixture()
def local_root(tmp_path):
    root = tmp_path / "tbl"
    root.mkdir()
    return str(root)


def _contract(store, root):
    j = lambda *p: "/".join([root.rstrip("/"), *p])  # noqa: E731
    store.makedirs(j("_manifests"))
    # create-once: first wins, second loses with False (never raises)
    assert store.atomic_create(j("_manifests", "v0.json"), {"n": 1})
    assert not store.atomic_create(j("_manifests", "v0.json"), {"n": 2})
    assert store.read_json(j("_manifests", "v0.json")) == {"n": 1}
    # missing read raises FileNotFoundError (the protocol's signal)
    with pytest.raises(FileNotFoundError):
        store.read_json(j("_manifests", "v9.json"))
    assert store.exists(j("_manifests", "v0.json"))
    assert not store.exists(j("_manifests", "v9.json"))
    assert store.isdir(j("_manifests"))
    assert not store.isdir(j("_nothing"))
    # put_json overwrites (params files: last writer wins, never torn)
    store.put_json(j("_params.json"), {"m": 8})
    store.put_json(j("_params.json"), {"m": 16})
    assert store.read_json(j("_params.json")) == {"m": 16}
    # list = immediate child names
    assert store.atomic_create(j("_manifests", "v1.json"), {"n": 2})
    assert store.list(j("_manifests")) == ["v0.json", "v1.json"]
    assert store.list(j("_absent")) == []
    names = store.list(root)
    assert "_manifests" in names and "_params.json" in names
    # walk_files: recursive, full paths
    walked = store.walk_files(root)
    assert j("_manifests", "v0.json") in walked
    assert j("_params.json") in walked
    # mtime is readable and sane
    assert store.getmtime(j("_params.json")) > 0
    # remove
    store.remove(j("_manifests", "v1.json"))
    assert not store.exists(j("_manifests", "v1.json"))
    store.remove_if_exists(j("_manifests", "v1.json"))  # idempotent
    # remove_tree clears everything under the root
    store.remove_tree(root)
    assert store.walk_files(root) == []


def test_local_contract(local_root):
    _contract(LocalStore(), local_root)


def test_s3_contract(s3_root):
    _contract(S3Store(), s3_root)


def test_s3_concurrent_create_exactly_one_winner(s3_root):
    store = S3Store()
    path = s3_root + "/_manifests/v0.json"
    wins: list[int] = []
    barrier = threading.Barrier(8)

    def go(i):
        barrier.wait()
        if store.atomic_create(path, {"writer": i}):
            wins.append(i)

    ts = [threading.Thread(target=go, args=(i,)) for i in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert len(wins) == 1, f"exactly one winner, got {wins}"
    assert store.read_json(path) == {"writer": wins[0]}


def test_store_for_dispatch(tmp_path):
    assert isinstance(store_for(str(tmp_path)), LocalStore)
    assert is_object_store("s3://b/k") and is_object_store("s3a://b/k")
    assert not is_object_store("/data/tbl")
    assert not is_object_store("file:///data/tbl")


def test_local_atomic_create_full_visibility(local_root):
    """A reader that sees the path must see the FULL payload — the
    hard-link flavor's whole point (regression: O_EXCL fd exposed
    the name before its bytes)."""
    store = LocalStore()
    path = os.path.join(local_root, "v0.json")
    stop = threading.Event()
    torn: list[str] = []

    def reader():
        while not stop.is_set():
            try:
                store.read_json(path)
                return
            except FileNotFoundError:
                continue
            except ValueError as e:  # torn JSON
                torn.append(str(e))
                return

    t = threading.Thread(target=reader)
    t.start()
    store.atomic_create(path, {"files": list(range(5000))})
    stop.set()
    t.join()
    assert not torn
