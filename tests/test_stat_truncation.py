"""String-stat truncation in manifest entries
(sinks/versioned.py::_truncate_str_stats): long string min/max are
stored as short conservative BOUNDS (lower = prefix, upper = prefix
with last char incremented — the public Iceberg truncate(N) metrics
design), so a text column never embeds whole documents in every file
entry; pruning stays correct and manifest_agg refuses to serve a
truncated bound as an exact extremum."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from small_etl_spark.sinks import versioned as V


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def test_truncate_bounds_are_valid(spark):
    lo, hi, tr = V._truncate_str_stats("a" * 200, "b" * 200 + "z")
    assert tr and len(lo) == 64 and len(hi) == 64
    assert lo <= "a" * 200            # lower bound still holds
    assert hi > "b" * 200 + "z"       # upper bound still holds
    # short strings pass through untouched
    lo, hi, tr = V._truncate_str_stats("abc", "xyz")
    assert (lo, hi, tr) == ("abc", "xyz", False)
    # surrogate gap is skipped on increment
    s = "q" * 63 + "퟿"
    _lo, hi, tr = V._truncate_str_stats("a", s + "tail")
    assert tr and hi[-1] == ""


def test_manifest_entries_stay_small_for_long_text(spark, table):
    # ~1KB docs: the writer still emits footer stats (it drops them
    # entirely past ~2KB values — also handled: absent stats simply
    # skip the entry), and the manifest stores 64-char bounds
    docs = spark.createDataFrame(
        [(i, f"{chr(97 + i % 5)}-" + "lorem ipsum " * 80)
         for i in range(40)],
        "doc_id bigint, text string",
    )
    V.commit_snapshot(docs.repartition(4), table, mode="overwrite")
    m = V.read_manifest(table, 0)
    for e in m["files"]:
        st = e["stats"]["text"]
        assert st["trunc"] is True
        assert len(st["min"]) <= 64 and len(st["max"]) <= 64
    # the whole entry serializes compactly despite ~1KB documents
    assert all(len(json.dumps(e)) < 2000 for e in m["files"])


def test_pruning_still_correct_with_truncated_bounds(spark, table):
    rows = [(i, chr(97 + i % 4) * 100) for i in range(40)]
    V.commit_snapshot(
        spark.createDataFrame(rows, "k bigint, s string")
        .repartitionByRange(4, "s"),
        table, mode="overwrite",
    )
    # range-clustered on s: a point predicate on one letter-run must
    # prune files AND return exactly the matching rows
    kept, total = V.plan_files(table, where=[("s", "=", "c" * 100)])
    assert len(kept) < total
    got = V.read_snapshot(
        spark, table, where=[("s", "=", "c" * 100)]
    ).filter(F.col("s") == "c" * 100)
    assert got.count() == 10


def test_manifest_agg_falls_back_on_truncated_strings(spark, table):
    docs = spark.createDataFrame(
        [(i, chr(97 + i % 3) + "x" * 200) for i in range(30)],
        "k bigint, s string",
    )
    V.commit_snapshot(docs, table, mode="overwrite")
    r = V.manifest_agg(
        spark, table, {"lo": ("min", "s"), "n": ("count", "*")}
    ).first()
    # exact answer via the scan path, never a truncated bound
    assert r._served_from == "scan"
    assert r.lo == "a" + "x" * 200 and r.n == 30
    # count alone still serves from metadata
    r = V.manifest_agg(spark, table, {"n": ("count", "*")}).first()
    assert (r.n, r._served_from) == (30, "manifest")
