"""Timestamp-encoding contract (VERDICT r2 item 5).

The driver has shipped ``events.ts`` three different ways across
generator versions — parquet TIMESTAMP(NANOS), ``timestamp[us]``
without timezone (→ Spark TIMESTAMP_NTZ), and tz-aware ``timestamp[us]``
(→ TIMESTAMP). Round 2 went red because the engine only tolerated one
of them. This suite writes the SAME rows in all three encodings and
asserts every time-family operator (asof/range/sessionize/windows/
streaming) analyzes AND produces identical results on each — so this
class of bug can never reach the driver again.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from small_etl_spark.sources.tables import load_table
from small_etl_spark.streaming.windows import (
    read_events_stream,
    session_window_agg,
    tumbling_window_agg,
)

BASE = dt.datetime(2024, 3, 1, 12, 0, 0)
ROWS = [
    # (event_id, seconds_offset, user_id, event_type, value)
    (1, 0, 1, "click", 1.0),
    (2, 600, 1, "purchase", 9.5),
    (3, 4000, 1, "click", 2.0),
    (4, 30, 2, "click", 3.0),
    (5, 7300, 2, "purchase", 4.25),
    (6, 7400, 2, "click", 0.5),
]

ENCODINGS = {
    "nanos": pa.timestamp("ns"),
    "micros_ntz": pa.timestamp("us"),
    "micros_tz": pa.timestamp("us", tz="UTC"),
}


def _write_events(dir_path, ts_type) -> str:
    ts = [BASE + dt.timedelta(seconds=s) for _, s, *_ in ROWS]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array(ts).cast(ts_type),
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS], pa.string()),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array(["{}"] * len(ROWS), pa.string()),
        }
    )
    pq.write_table(table, str(dir_path / "events.parquet"))
    return str(dir_path)


@pytest.fixture(scope="module", params=sorted(ENCODINGS))
def enc_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"events_{request.param}")
    _write_events(d, ENCODINGS[request.param])
    return str(d)


def test_load_table_normalizes_to_timestamp(spark, enc_dir):
    df = load_table(spark, enc_dir, "events")
    ts_type = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)
    assert ts_type["ts"] == "timestamp"
    # epoch parity: encoding must not shift the instant (session TZ=UTC)
    got = {
        r.event_id: r.epoch
        for r in df.selectExpr(
            "event_id", "cast(ts as long) AS epoch"
        ).collect()
    }
    base_epoch = int(BASE.replace(tzinfo=dt.timezone.utc).timestamp())
    expect = {r[0]: base_epoch + r[1] for r in ROWS}
    assert got == expect


def _epoch_results(df, *cols):
    return sorted(tuple(row) for row in df.select(*cols).collect())


def test_time_operators_identical_across_encodings(spark, tmp_path_factory):
    """asof/range joins and batch session/tumbling windows give the
    same answer on every encoding."""
    from small_etl_spark.operators.joins import asof_join, range_join

    results: dict[str, dict[str, list]] = {}
    for name, ts_type in ENCODINGS.items():
        d = tmp_path_factory.mktemp(f"ops_{name}")
        ev = load_table(spark, _write_events(d, ts_type), "events")
        clicks = ev.filter("event_type = 'click'").select(
            "event_id", "ts", "user_id"
        )
        purchases = ev.filter("event_type = 'purchase'").select(
            "user_id", "ts", "value"
        )
        asof = asof_join(clicks, purchases, on="user_id")
        rng = range_join(
            clicks,
            purchases,
            on="user_id",
            left_ts="ts",
            right_ts="ts",
            lower_seconds=0.0,
            upper_seconds=3600.0,
        )
        per_enc = {
            "asof": _epoch_results(
                asof.selectExpr("event_id", "cast(ts as long) AS e", "value_asof"),
                "event_id",
                "e",
                "value_asof",
            ),
            "range": sorted(tuple(r) for r in rng.collect()),
            "tumbling": _epoch_results(
                tumbling_window_agg(ev), "window_start", "event_type", "n"
            ),
            "session": _epoch_results(
                session_window_agg(ev),
                "session_start",
                "user_id",
                "n_events",
            ),
        }
        results[name] = per_enc
    baseline = results["micros_tz"]
    for name, per_enc in results.items():
        assert per_enc == baseline, f"encoding {name} diverges"


def test_stream_reader_analyzes_on_every_encoding(spark, tmp_path_factory):
    for name, ts_type in ENCODINGS.items():
        d = tmp_path_factory.mktemp(f"stream_{name}")
        stream = read_events_stream(spark, _write_events(d, ts_type))
        ts_field = [f for f in stream.schema.fields if f.name == "ts"][0]
        assert ts_field.dataType.simpleString() == "timestamp", name
        # the windowed agg must ANALYZE (this is what broke round 2)
        agg = tumbling_window_agg(stream)
        assert "window_start" in agg.columns
