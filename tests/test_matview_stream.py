"""Streaming matview maintenance (sinks/matview.py::
stream_maintain_matview; VERDICT r11 #6): a foreachBatch loop
upserts each micro-batch into the view's base table and advances the
view incrementally — stream-fed state must equal a batch recompute
of the final base, through restarts and a crash between the base
commit and the refresh."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from small_etl_spark.sinks import matview as M
from small_etl_spark.sinks import versioned as V


@pytest.fixture()
def env(tmp_path, spark):
    base = str(tmp_path / "base")
    view = str(tmp_path / "view")
    V.commit_snapshot(
        spark.createDataFrame(
            [(0, "a", 10), (1, "b", 20)], "k bigint, g string, v bigint"
        ),
        base, mode="overwrite",
    )
    M.create_matview(
        spark, view, base, ["g"],
        {"n": ("count", "*"), "sv": ("sum", "v")},
    )
    return {
        "base": base,
        "view": view,
        "src": str(tmp_path / "src"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _emit(spark, src, rows):
    os.makedirs(src, exist_ok=True)
    n = len(os.listdir(src))
    spark.createDataFrame(
        rows, "k bigint, g string, v bigint"
    ).coalesce(1).write.parquet(f"{src}/f{n}", mode="overwrite")


def _stream(spark, src):
    return (
        spark.readStream.schema("k bigint, g string, v bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )


def _recompute(spark, base):
    return {
        (r.g, r.n, r.sv)
        for r in V.read_snapshot(spark, base)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        .collect()
    }


def _view_state(spark, view):
    return {
        (r.g, r.n, r.sv)
        for r in M.read_matview(spark, view).collect()
    }


def test_stream_fed_view_equals_batch_recompute(spark, env):
    _emit(spark, env["src"], [(2, "a", 5), (3, "c", 7)])
    _emit(spark, env["src"], [(0, "a", 99), (4, "b", 1)])  # updates k=0
    q = M.stream_maintain_matview(
        spark, _stream(spark, env["src"]), env["view"], env["ckpt"],
        key="k",
    )
    assert q.awaitTermination(180)
    assert _view_state(spark, env["view"]) == _recompute(
        spark, env["base"]
    )
    # restart with the same checkpoint: only NEW files process
    _emit(spark, env["src"], [(1, "b", -3), (5, "c", 8)])
    q2 = M.stream_maintain_matview(
        spark, _stream(spark, env["src"]), env["view"], env["ckpt"],
        key="k",
    )
    assert q2.awaitTermination(180)
    assert _view_state(spark, env["view"]) == _recompute(
        spark, env["base"]
    )
    # the watermark tracked the stream: view head == base head
    assert (
        M.matview_info(env["view"])["refreshed_to"]
        == V.latest_version(env["base"])
    )


def test_crash_between_base_commit_and_refresh(spark, env, monkeypatch):
    """Crash AFTER the base micro-batch committed but BEFORE the view
    refreshed: the restart replays the batch (base commit is a no-op
    by stream_batch_high) and the next refresh covers the missed
    delta from the view's own watermark — nothing lost, nothing
    double-counted."""
    _emit(spark, env["src"], [(7, "c", 70)])

    real = M.refresh_matview
    boom = {"armed": True}

    def flaky(spark_, view_root):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("injected crash before refresh")
        return real(spark_, view_root)

    monkeypatch.setattr(M, "refresh_matview", flaky)
    from pyspark.errors.exceptions.captured import StreamingQueryException

    q = M.stream_maintain_matview(
        spark, _stream(spark, env["src"]), env["view"], env["ckpt"],
        key="k",
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(180)
    # base took the batch; the view is stale at its old watermark
    assert _recompute(spark, env["base"]) != _view_state(
        spark, env["view"]
    )
    # restart with the same checkpoint heals everything
    q2 = M.stream_maintain_matview(
        spark, _stream(spark, env["src"]), env["view"], env["ckpt"],
        key="k",
    )
    assert q2.awaitTermination(180)
    assert _view_state(spark, env["view"]) == _recompute(
        spark, env["base"]
    )


def test_append_only_stream_without_key(spark, env):
    _emit(spark, env["src"], [(10, "a", 1), (11, "d", 2)])
    q = M.stream_maintain_matview(
        spark, _stream(spark, env["src"]), env["view"], env["ckpt"],
    )
    assert q.awaitTermination(180)
    assert _view_state(spark, env["view"]) == _recompute(
        spark, env["base"]
    )
