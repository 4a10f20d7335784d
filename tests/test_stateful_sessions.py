"""Event-time-timeout state eviction: completed_sessions emits a
user's session only after the watermark passes 30 idle minutes, and
removes the state — the pattern that keeps custom streaming state
bounded."""

from __future__ import annotations

import os
import shutil
from datetime import datetime

from small_etl_spark.streaming.stateful import completed_sessions
from small_etl_spark.streaming.windows import run_to_memory_sink


def _write_single_file(df, tmp_path, name):
    outdir = tmp_path / f"_{name}"
    df.coalesce(1).write.parquet(str(outdir))
    part = next(p for p in os.listdir(outdir) if p.endswith(".parquet"))
    shutil.move(str(outdir / part), str(tmp_path / "stream" / name))


def test_completed_sessions_emit_on_idle_timeout(spark, tmp_path):
    from datetime import timedelta

    os.makedirs(tmp_path / "stream")
    base = datetime(2024, 1, 1, 12, 0)

    def ts(minutes):
        return base + timedelta(minutes=minutes)

    u1 = spark.createDataFrame(
        [(1, ts(0)), (1, ts(3)), (1, ts(5))], "user_id long, ts timestamp"
    )
    # user 2 arrives two hours later: its batch pushes the watermark
    # far past user 1's 30-minute idle deadline
    u2 = spark.createDataFrame(
        [(2, ts(120)), (2, ts(121))], "user_id long, ts timestamp"
    )
    _write_single_file(u1, tmp_path, "b1.parquet")
    _write_single_file(u2, tmp_path, "b2.parquet")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "stream"))
    )
    run_to_memory_sink(
        completed_sessions(stream), "sessions_sink", output_mode="append"
    )
    rows = spark.table("sessions_sink").collect()
    got = {r["user_id"]: (r["n_events"],
                          (r["session_end_us"] - r["session_start_us"])
                          // 60_000_000)
           for r in rows}
    # user 1's session closed by the watermark jump; user 2's is
    # still open (no later batch advanced the watermark past it)
    assert got == {1: (3, 5)}


def test_completed_sessions_tws_timers_match_v1(spark, tmp_path):
    """The transformWithState twin (explicit event-time TIMERS +
    ValueState, RocksDB store) must produce exactly what the v1
    setTimeoutTimestamp twin produces on the same two-batch stream:
    user 1's session closes when user 2's batch pushes the watermark
    past the idle gap; user 2's stays open."""
    from datetime import timedelta

    from small_etl_spark.streaming.pbcompat import enable_container_protobuf
    from small_etl_spark.streaming.stateful import completed_sessions_tws

    if not enable_container_protobuf():
        import pytest

        pytest.skip("no protobuf runtime available in this environment")

    os.makedirs(tmp_path / "stream")
    base = datetime(2024, 1, 1, 12, 0)

    def ts(minutes):
        return base + timedelta(minutes=minutes)

    u1 = spark.createDataFrame(
        [(1, ts(0)), (1, ts(3)), (1, ts(5))], "user_id long, ts timestamp"
    )
    u2 = spark.createDataFrame(
        [(2, ts(120)), (2, ts(121))], "user_id long, ts timestamp"
    )
    _write_single_file(u1, tmp_path, "b1.parquet")
    _write_single_file(u2, tmp_path, "b2.parquet")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "stream"))
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        run_to_memory_sink(
            completed_sessions_tws(stream), "tws_sessions_sink",
            output_mode="append",
        )
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    rows = spark.table("tws_sessions_sink").collect()
    got = {r["user_id"]: (r["n_events"],
                          (r["session_end_us"] - r["session_start_us"])
                          // 60_000_000)
           for r in rows}
    assert got == {1: (3, 5)}
