"""Streaming CDC source: version offsets, replay determinism,
change-commit policy."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from small_etl_spark.sinks import versioned as V
from small_etl_spark.sources.versioned_stream import (
    VersionedCdcDataSource,
    VersionedCdcStreamReader,
)


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def _reader(spark, table, **opts):
    src = VersionedCdcDataSource(
        {"path": table, **{k: str(v) for k, v in opts.items()}}
    )
    return src.simpleStreamReader(src.schema())


def test_offsets_and_rows(spark, table):
    V.commit_snapshot(_df(spark, 0, 5), table, mode="overwrite")
    V.commit_snapshot(_df(spark, 5, 8), table, mode="append")
    r = _reader(spark, table)
    assert r.initialOffset() == {"version": 0}
    rows, end = r.read({"version": 0})
    rows = list(rows)
    assert end == {"version": 2}
    assert sorted(x[0] for x in rows) == list(range(8))
    # per-row commit version tag
    assert {x[-1] for x in rows} == {0, 1}
    # caught up: no rows, offset unchanged
    rows2, end2 = r.read(end)
    assert list(rows2) == [] and end2 == end


def test_replay_is_deterministic(spark, table):
    V.commit_snapshot(_df(spark, 0, 5), table, mode="overwrite")
    V.commit_snapshot(_df(spark, 5, 8), table, mode="append")
    r = _reader(spark, table)
    a = sorted(r.readBetweenOffsets({"version": 1}, {"version": 2}))
    b = sorted(r.readBetweenOffsets({"version": 1}, {"version": 2}))
    assert a == b
    assert sorted(x[0] for x in a) == [5, 6, 7]


def test_change_commit_raises_unless_skipped(spark, table):
    V.commit_snapshot(_df(spark, 0, 20), table, mode="overwrite")
    V.delete_where(spark, table, F.col("k") >= 10)
    r = _reader(spark, table)
    with pytest.raises(ValueError, match="skip_change_commits"):
        list(r.readBetweenOffsets({"version": 1}, {"version": 2}))
    r2 = _reader(spark, table, skip_change_commits="true")
    assert list(r2.readBetweenOffsets({"version": 1}, {"version": 2})) == []


def test_starting_version_skips_history(spark, table):
    V.commit_snapshot(_df(spark, 0, 5), table, mode="overwrite")
    V.commit_snapshot(_df(spark, 5, 8), table, mode="append")
    r = _reader(spark, table, starting_version=1)
    assert r.initialOffset() == {"version": 1}
    rows, _ = r.read({"version": 1})
    assert sorted(x[0] for x in rows) == [5, 6, 7]


def test_end_to_end_stream(spark, table, tmp_path):
    V.commit_snapshot(_df(spark, 0, 5), table, mode="overwrite")
    spark.dataSource.register(VersionedCdcDataSource)
    q = (
        spark.readStream.format("versioned_cdc")
        .option("path", table)
        .load()
        .writeStream.format("memory")
        .queryName("vcdc_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 40
        # wait for the initial snapshot to land
        while time.time() < deadline:
            if spark.sql("SELECT COUNT(*) FROM vcdc_sink").first()[0] >= 5:
                break
            time.sleep(1)
        # commit a new snapshot mid-stream; it must arrive incrementally
        V.commit_snapshot(_df(spark, 5, 9), table, mode="append")
        while time.time() < deadline:
            if spark.sql("SELECT COUNT(*) FROM vcdc_sink").first()[0] >= 9:
                break
            time.sleep(1)
    finally:
        q.stop()
    got = spark.sql("SELECT k, _commit_version FROM vcdc_sink").collect()
    assert sorted(r.k for r in got) == list(range(9))
    assert {r._commit_version for r in got} == {0, 1}


def test_mor_delete_is_change_commit(spark, table):
    """A delete_where_mor commit touches no files but retires rows via
    the DV; streaming it as 'nothing happened' would keep stale rows
    live downstream — it must follow the change-commit policy."""
    V.commit_snapshot(_df(spark, 0, 20), table, mode="overwrite")
    V.delete_where_mor(spark, table, F.col("k") >= 10)
    r = _reader(spark, table)
    with pytest.raises(ValueError, match="skip_change_commits"):
        list(r.readBetweenOffsets({"version": 1}, {"version": 2}))
    r2 = _reader(spark, table, skip_change_commits="true")
    assert list(r2.readBetweenOffsets({"version": 1}, {"version": 2})) == []


def test_stream_upsert_is_change_commit(spark, table):
    """stream_upsert_batch commits add files AND grow the equality-
    delete list; emitting only the added rows would silently keep the
    retired keys' old rows downstream (ADVICE r8)."""
    V.commit_snapshot(_df(spark, 0, 5), table, mode="overwrite")
    V.stream_upsert_batch(
        _df(spark, 3, 7), 11, table, key="k"
    )
    r = _reader(spark, table)
    # v0 still streams fine
    assert sorted(x[0] for x in r.readBetweenOffsets(
        {"version": 0}, {"version": 1})) == [0, 1, 2, 3, 4]
    with pytest.raises(ValueError, match="skip_change_commits"):
        list(r.readBetweenOffsets({"version": 1}, {"version": 2}))
    r2 = _reader(spark, table, skip_change_commits="true")
    assert list(r2.readBetweenOffsets({"version": 1}, {"version": 2})) == []


def test_starting_timestamp_resolves_version(spark, table):
    """starting_timestamp begins at the first commit AT-OR-AFTER the
    instant (Delta's startingTimestamp contract), resolved through
    version_as_of's commit-time index."""
    V.commit_snapshot(_df(spark, 0, 3), table, mode="overwrite")
    V.commit_snapshot(_df(spark, 3, 6), table, mode="append")
    t1 = V._read_record(table, 1)["committed_at_ms"]
    V.commit_snapshot(_df(spark, 6, 9), table, mode="append")
    # exactly v1's instant -> start at v1
    r = _reader(spark, table, starting_timestamp=t1)
    assert r.initialOffset() == {"version": 1}
    rows, end = r.read({"version": 1})
    assert sorted(x[0] for x in rows) == list(range(3, 9))
    assert end == {"version": 3}
    # between v1 and v2 -> start at v2
    r2 = _reader(spark, table, starting_timestamp=t1 + 1)
    assert r2.initialOffset()["version"] >= 2
    # both options together refuse
    with pytest.raises(ValueError, match="not both"):
        _reader(
            spark, table, starting_version=0, starting_timestamp=t1
        )
