"""Streaming ⇄ batch equivalence: the same aggregation code run as an
availableNow stream must produce exactly the batch result."""

from __future__ import annotations

import os
import shutil

import pytest

from small_etl_spark.sources.tables import load_table
from small_etl_spark.streaming.windows import (
    read_events_stream,
    run_to_memory_sink,
    session_window_agg,
    sliding_window_agg,
    stream_dedup,
    tumbling_window_agg,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), d / "events.parquet")
    return str(d)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_stream_matches_batch(spark, events_dir):
    batch = tumbling_window_agg(load_table(spark, SF_DIR, "events"))
    stream = tumbling_window_agg(read_events_stream(spark, events_dir))
    assert stream.isStreaming
    run_to_memory_sink(stream, "tumbling_sink")
    assert _rows(spark.table("tumbling_sink")) == _rows(batch)


def test_sliding_stream_matches_batch(spark, events_dir):
    batch = sliding_window_agg(load_table(spark, SF_DIR, "events"))
    stream = sliding_window_agg(read_events_stream(spark, events_dir))
    run_to_memory_sink(stream, "sliding_sink")
    assert _rows(spark.table("sliding_sink")) == _rows(batch)


def test_session_stream_matches_batch(spark, events_dir):
    batch = session_window_agg(load_table(spark, SF_DIR, "events"))
    stream = session_window_agg(read_events_stream(spark, events_dir))
    run_to_memory_sink(stream, "session_sink")
    assert _rows(spark.table("session_sink")) == _rows(batch)


def test_session_agrees_with_batch_sessionize(spark):
    """Session-window session count per user == the lag/cumsum batch
    formulation (queries.q_sessionize) — same 30-min gap rule."""
    from small_etl_spark.queries import REGISTRY
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events")
    via_window = (
        session_window_agg(ev, gap="30 minutes")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    via_lag = (
        REGISTRY["sessionize"].builder(spark, SF_DIR)
        .groupBy("user_id")
        .agg(F.max("session_idx").alias("n_sessions"))
    )
    assert _rows(via_window) == _rows(via_lag)


def test_stream_static_enrich_matches_batch(spark, events_dir):
    """Stream-static broadcast join per micro-batch: windowed revenue
    per enrichment tier equals the batch run of the same code."""
    from pyspark.sql import functions as F

    from small_etl_spark.streaming.windows import stream_static_enrich

    dim = spark.createDataFrame(
        [(i, f"tier{i % 3}") for i in range(200)], "user_id bigint, tier string"
    )

    def agg(ev):
        return (
            stream_static_enrich(ev, dim, "user_id")
            .groupBy("tier")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
            )
        )

    stream = agg(read_events_stream(spark, events_dir).drop("ts"))
    run_to_memory_sink(stream, "stream_static_sink", output_mode="complete")
    got = spark.table("stream_static_sink")
    batch = agg(load_table(spark, SF_DIR, "events"))
    assert _rows(got.select(*batch.columns)) == _rows(batch)


def test_stream_dedup(spark, events_dir):
    stream = stream_dedup(read_events_stream(spark, events_dir))
    run_to_memory_sink(stream, "dedup_sink", output_mode="append")
    n_distinct = (
        load_table(spark, SF_DIR, "events").select("event_id").distinct().count()
    )
    assert spark.table("dedup_sink").count() == n_distinct


def test_stream_stream_interval_join_matches_batch(spark, events_dir):
    """Stream-stream interval join (click-attribution shape): the
    availableNow streaming run equals the identical predicate run as
    a batch range join. State is bounded by watermarks both sides."""
    from small_etl_spark.streaming.windows import stream_stream_interval_join

    ev_batch = load_table(spark, SF_DIR, "events")
    clicks_b = ev_batch.filter("event_type = 'click'")
    views_b = ev_batch.filter("event_type = 'view'")
    batch = stream_stream_interval_join(clicks_b, views_b)
    assert batch.count() > 0, "need click/view pairs in testdata"

    ev_s = read_events_stream(spark, events_dir)
    stream = stream_stream_interval_join(
        ev_s.filter("event_type = 'click'"), ev_s.filter("event_type = 'view'")
    )
    assert stream.isStreaming
    run_to_memory_sink(stream, "ss_join_sink", output_mode="append")
    assert _rows(spark.table("ss_join_sink")) == _rows(batch)


def test_stateful_running_user_stats(spark, events_dir):
    """applyInPandasWithState custom state: running totals equal the
    batch groupBy result after draining the stream."""
    from pyspark.sql import functions as F

    from small_etl_spark.streaming.stateful import running_user_stats

    stream = running_user_stats(read_events_stream(spark, events_dir))
    run_to_memory_sink(stream, "state_sink", output_mode="append")
    got = {
        r.user_id: (r.total_events, r.total_value)
        for r in spark.table("state_sink").collect()
    }
    expect = {
        r.user_id: (r.n, round(r.v, 2))
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert got == expect


def test_stream_to_files_foreachbatch(spark, events_dir, tmp_path):
    """foreachBatch bridges streams into the batch sink layer; the
    drained parquet equals the batch aggregation."""
    from small_etl_spark.streaming.windows import stream_to_files

    stream = tumbling_window_agg(read_events_stream(spark, events_dir))
    out = tmp_path / "out"
    stream_to_files(
        stream, str(out), ["parquet"], str(tmp_path / "ckpt"),
        output_mode="complete",
    )
    written = spark.read.parquet(f"{out}/batch=*/parquet")
    batch = tumbling_window_agg(load_table(spark, SF_DIR, "events"))
    assert _rows(written.select(*batch.columns)) == _rows(batch)


def test_stateful_exact_totals_multibatch(spark, tmp_path):
    """Exact-cents stateful op across FORCED multiple micro-batches:
    two source files + maxFilesPerTrigger=1 → two batches; state must
    carry between them and the final emission per user must equal the
    batch aggregate exactly (integer cents — no float drift)."""
    from pyspark.sql import functions as F

    from small_etl_spark.streaming.stateful import running_user_totals_exact

    import glob as _glob

    ev = load_table(spark, SF_DIR, "events")
    d = tmp_path / "events_split"
    d.mkdir()
    for name, pred in (("a", "event_id % 2 = 0"), ("b", "event_id % 2 = 1")):
        out = tmp_path / f"half_{name}"
        ev.filter(pred).coalesce(1).write.parquet(str(out))
        # the stream source wants plain files in its dir, not
        # part-file subdirectories
        (part,) = _glob.glob(str(out / "part-*.parquet"))
        shutil.copy(part, d / f"{name}.parquet")

    stream = running_user_totals_exact(
        read_events_stream(spark, str(d), max_files_per_trigger=1)
    )
    run_to_memory_sink(stream, "state_exact_sink", output_mode="append")
    emissions = spark.table("state_exact_sink")
    # state crossed batches: users emitted more than once
    assert emissions.count() > emissions.select("user_id").distinct().count()
    final = emissions.groupBy("user_id").agg(
        F.max("total_events").alias("n"), F.max("total_value_cents").alias("c")
    )
    expect = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("c"),
    )
    assert _rows(final) == _rows(expect)


def test_transform_with_state_totals(spark, events_dir):
    """Spark 4 transformWithStateInPandas (typed ValueState, RocksDB
    store): drained totals must equal the batch aggregate exactly.
    The twS state-server protocol imports protobuf in its driver
    worker — streaming.pbcompat wires in the container's SDK runtime
    (session.get_spark enables it before the JVM starts); skip only
    where no protobuf runtime exists at all."""
    from small_etl_spark.streaming.pbcompat import enable_container_protobuf

    if not enable_container_protobuf():
        pytest.skip("no protobuf runtime available in this environment")
    from pyspark.sql import functions as F

    from small_etl_spark.streaming.stateful import running_user_totals_tws

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = running_user_totals_tws(read_events_stream(spark, events_dir))
        run_to_memory_sink(stream, "tws_sink", output_mode="update")
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    got = spark.table("tws_sink")
    final = got.groupBy("user_id").agg(
        F.max("total_events").alias("n"), F.max("total_value_cents").alias("c")
    )
    expect = load_table(spark, SF_DIR, "events").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("c"),
    )
    assert _rows(final) == _rows(expect)


def test_topk_values_tws_matches_batch(spark, events_dir):
    """ListState on transformWithState: the drained per-user top-3
    (max over emissions per rank) must equal the batch top-3 computed
    with a window function over the same data."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from small_etl_spark.streaming.pbcompat import enable_container_protobuf
    from small_etl_spark.streaming.stateful import topk_values_tws

    if not enable_container_protobuf():
        pytest.skip("no protobuf runtime available in this environment")

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = topk_values_tws(read_events_stream(spark, events_dir), k=3)
        run_to_memory_sink(stream, "tws_topk_sink", output_mode="update")
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    got_df = spark.table("tws_topk_sink")
    # Update-mode memory sink keeps every emission; the LAST batch's
    # rows per (user, rank) are the final state = max value at rank
    final = got_df.groupBy("user_id", "rank").agg(
        F.max("value_cents").alias("value_cents")
    )
    ev = load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("c").desc())
    expect = (
        ev.select(
            "user_id",
            F.round(F.col("value") * 100).cast("bigint").alias("c"),
        )
        .dropna()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("user_id", "rank", F.col("c").alias("value_cents"))
    )
    assert _rows(final) == _rows(expect)
