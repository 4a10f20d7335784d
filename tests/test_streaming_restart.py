"""Checkpoint-restart recovery and the RocksDB state store.

Two production-critical streaming properties at 100 TB:

- **Exactly-once across restarts**: the parquet streaming sink commits
  files through a metadata log, and the checkpoint records which
  source files each batch consumed. Stopping a query, appending new
  source data, and restarting from the same checkpoint must process
  ONLY the new data and never double-write the old — that is the
  recovery contract a multi-day ingest job relies on.
- **RocksDB state store**: at large key cardinality streaming state
  cannot live on the JVM heap; Spark's RocksDB provider spills it to
  local disk. It must be a drop-in for stateful aggs (this test runs
  it JVM-side — no protobuf needed, unlike transformWithState).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from small_etl_spark.sources.tables import load_table
from small_etl_spark.streaming.windows import (
    read_events_stream,
    run_to_memory_sink,
    tumbling_window_agg,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _write_half(spark, ev, pred, dest_dir, name):
    tmp = dest_dir / f"__stage_{name}"
    ev.filter(pred).coalesce(1).write.parquet(str(tmp))
    (part,) = glob.glob(str(tmp / "part-*.parquet"))
    shutil.copy(part, dest_dir / f"{name}.parquet")
    shutil.rmtree(tmp)


def _drain_to_parquet(spark, src, out, ckpt):
    stream = read_events_stream(spark, src).select("event_id", "user_id", "value")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_file_sink_exactly_once_across_restart(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    _write_half(spark, ev, "event_id % 2 = 0", src, "a")
    _drain_to_parquet(spark, str(src), out, ckpt)
    half = spark.read.parquet(out)
    assert half.count() == ev.filter("event_id % 2 = 0").count()

    # append new source data, restart from the SAME checkpoint:
    # only the new file may be processed
    _write_half(spark, ev, "event_id % 2 = 1", src, "b")
    _drain_to_parquet(spark, str(src), out, ckpt)
    got = spark.read.parquet(out)
    assert _rows(got) == _rows(ev.select("event_id", "user_id", "value"))

    # a third restart with no new data must be a no-op
    _drain_to_parquet(spark, str(src), out, ckpt)
    assert spark.read.parquet(out).count() == ev.count()


def test_rocksdb_state_store_windowed_agg(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), src / "events.parquet")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = tumbling_window_agg(read_events_stream(spark, str(src)))
        run_to_memory_sink(stream, "rocksdb_sink", output_mode="complete")
        got = spark.table("rocksdb_sink")
        batch = tumbling_window_agg(load_table(spark, SF_DIR, "events"))
        assert _rows(got.select(*batch.columns)) == _rows(batch)
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
