"""Time-series resample/LOCF and interval-RANGE rolling windows."""

from __future__ import annotations

import datetime as dt

from small_etl_spark.operators.timeseries import resample_locf, rolling_range_sum


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, value double"
    )


class TestResampleLocf:
    def test_grid_fill_and_leading_nulls(self, spark):
        rows = [
            (1, 1, _ts("2024-01-01T01:30:00"), 2.50),
            (2, 1, _ts("2024-01-01T01:45:00"), 1.00),  # same bin → 350 cents
            (3, 1, _ts("2024-01-01T03:10:00"), 9.99),
        ]
        out = resample_locf(
            _events(spark, rows), "2024-01-01", "2024-01-01T05:00:00", 3600
        )
        got = {
            r["bin_ts"].hour: r["cents_filled"]
            for r in out.filter("key = 1").collect()
        }
        assert len(got) == 5
        assert got[0] is None          # before first observation
        assert got[1] == 350           # in-bin sum
        assert got[2] == 350           # carried forward
        assert got[3] == 999           # new observation
        assert got[4] == 999           # carried to grid end

    def test_every_key_gets_full_grid(self, spark):
        rows = [
            (1, 1, _ts("2024-01-01T00:00:00"), 1.0),
            (2, 2, _ts("2024-01-01T02:00:00"), 1.0),
        ]
        out = resample_locf(
            _events(spark, rows), "2024-01-01", "2024-01-01T04:00:00", 3600
        )
        assert out.count() == 2 * 4

    def test_out_of_range_events_ignored(self, spark):
        rows = [(1, 1, _ts("2023-12-31T23:59:59"), 5.0)]
        out = resample_locf(
            _events(spark, rows), "2024-01-01", "2024-01-01T02:00:00", 3600
        )
        assert [r["cents_filled"] for r in out.collect()] == [None, None]


class TestRollingRangeSum:
    def test_time_keyed_not_row_keyed(self, spark):
        rows = [
            (1, 1, _ts("2024-01-01T00:00:00"), 1.00),
            (2, 1, _ts("2024-01-01T12:00:00"), 2.00),
            # >24h after event 1 → only event 2 remains in range
            (3, 1, _ts("2024-01-02T06:00:00"), 4.00),
            # co-timed burst with 3 (peer row): both include each other
            (4, 1, _ts("2024-01-02T06:00:00"), 8.00),
        ]
        out = {
            r["event_id"]: r["trailing_sum"]
            for r in rolling_range_sum(_events(spark, rows), 86400).collect()
        }
        assert out[1] == 1.0
        assert out[2] == 3.0
        assert out[3] == out[4] == 14.0  # 2.00 + 4.00 + 8.00, peers equal

    def test_partitioned_by_key(self, spark):
        rows = [
            (1, 1, _ts("2024-01-01T00:00:00"), 1.0),
            (2, 2, _ts("2024-01-01T00:30:00"), 7.0),
        ]
        out = {
            r["event_id"]: r["trailing_sum"]
            for r in rolling_range_sum(_events(spark, rows), 86400).collect()
        }
        assert out[1] == 1.0 and out[2] == 7.0
