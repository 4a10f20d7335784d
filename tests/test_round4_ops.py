"""Round-4 operators: event transitions, global shuffle shards,
equi-depth binning."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F

from small_etl_spark.llm.sampling import global_shuffle_shards
from small_etl_spark.operators.events import event_transitions
from small_etl_spark.operators.profiling import equidepth_bins

SF_DIR = "/root/testdata/sf0.001"


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


class TestEventTransitions:
    def test_known_matrix(self, spark):
        rows = [
            (1, 1, "view", _ts("2024-01-01T00:00:00")),
            (2, 1, "click", _ts("2024-01-01T01:00:00")),
            (3, 1, "view", _ts("2024-01-01T02:00:00")),
            (4, 2, "view", _ts("2024-01-02T00:00:00")),
            (5, 2, "click", _ts("2024-01-02T01:00:00")),
            (6, 3, "view", _ts("2024-01-03T00:00:00")),  # single event: no pair
        ]
        ev = spark.createDataFrame(
            rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
        )
        got = {
            (r["prev_type"], r["next_type"]): (r["transitions"], r["prob"])
            for r in event_transitions(ev).collect()
        }
        assert got == {
            ("view", "click"): (2, 1.0),
            ("click", "view"): (1, 1.0),
        }

    def test_tiebreak_on_equal_ts(self, spark):
        # same timestamp: event_id decides order deterministically
        rows = [
            (10, 1, "a", _ts("2024-01-01T00:00:00")),
            (11, 1, "b", _ts("2024-01-01T00:00:00")),
            (12, 1, "c", _ts("2024-01-01T00:00:00")),
        ]
        ev = spark.createDataFrame(
            rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
        )
        got = {(r["prev_type"], r["next_type"]) for r in event_transitions(ev).collect()}
        assert got == {("a", "b"), ("b", "c")}

    def test_probs_sum_to_one_per_prev(self, spark):
        from small_etl_spark.sources.tables import load_table

        ev = load_table(spark, SF_DIR, "events")
        out = (
            event_transitions(ev)
            .groupBy("prev_type")
            .agg(F.round(F.sum("prob"), 3).alias("s"))
            .collect()
        )
        assert out and all(abs(r["s"] - 1.0) < 0.01 for r in out)


class TestInterEventGaps:
    def test_buckets_and_stats(self, spark):
        from small_etl_spark.operators.events import inter_event_gaps

        rows = [
            (1, 1, "view", _ts("2024-01-01T00:00:00")),
            (2, 1, "view", _ts("2024-01-01T00:00:30")),   # gap 30 → <1m
            (3, 1, "view", _ts("2024-01-01T00:12:10")),   # gap 700 → 10m–1h
            (4, 2, "view", _ts("2024-01-02T00:00:00")),
            (5, 2, "view", _ts("2024-01-04T00:00:00")),   # gap 2d → ≥1d
        ]
        ev = spark.createDataFrame(
            rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
        )
        got = {
            r["bucket"]: (r["n"], r["min_gap_s"], r["max_gap_s"])
            for r in inter_event_gaps(ev).collect()
        }
        assert got == {
            "a_lt_1m": (1, 30, 30),
            "c_10m_1h": (1, 700, 700),
            "e_ge_1d": (1, 172800, 172800),
        }


class TestLastTouchAttribution:
    def test_rules(self, spark):
        from small_etl_spark.operators.events import last_touch_attribution

        rows = [
            # u1: view then TWO purchases — both credit the view
            (1, 1, "view", 0.0, _ts("2024-01-01T00:00:00")),
            (2, 1, "purchase", 10.0, _ts("2024-01-01T01:00:00")),
            (3, 1, "purchase", 5.0, _ts("2024-01-01T02:00:00")),
            # u2: purchase with no prior touch — dropped
            (4, 2, "purchase", 99.0, _ts("2024-01-02T00:00:00")),
            # u3: view then click then purchase — credits the click
            (5, 3, "view", 0.0, _ts("2024-01-03T00:00:00")),
            (6, 3, "click", 0.0, _ts("2024-01-03T01:00:00")),
            (7, 3, "purchase", 7.5, _ts("2024-01-03T02:00:00")),
        ]
        ev = spark.createDataFrame(
            rows,
            "event_id bigint, user_id bigint, event_type string,"
            " value double, ts timestamp",
        )
        got = {
            r["touch_type"]: (r["conversions"], r["revenue"])
            for r in last_touch_attribution(ev).collect()
        }
        assert got == {"view": (2, 15.0), "click": (1, 7.5)}


class TestGlobalShuffleShards:
    def test_matches_python_reference(self, spark):
        df = spark.range(0, 97).withColumnRenamed("id", "doc_id")
        out = {
            r["doc_id"]: (r["ordinal"], r["shard"], r["position"])
            for r in global_shuffle_shards(df, n_shards=5).collect()
        }
        ids = sorted(
            range(97),
            key=lambda i: (hashlib.md5(f"shuffle-v1|{i}".encode()).hexdigest(), i),
        )
        for ordinal, doc_id in enumerate(ids):
            assert out[doc_id] == (ordinal, ordinal % 5, ordinal // 5)

    def test_shard_sizes_differ_by_at_most_one(self, spark):
        df = spark.range(0, 97).withColumnRenamed("id", "doc_id")
        sizes = [
            r["n"]
            for r in global_shuffle_shards(df, n_shards=5)
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        assert len(sizes) == 5 and max(sizes) - min(sizes) <= 1

    def test_salt_changes_order_not_membership(self, spark):
        df = spark.range(0, 50).withColumnRenamed("id", "doc_id")
        a = global_shuffle_shards(df, salt="epoch-1")
        b = global_shuffle_shards(df, salt="epoch-2")
        assert a.select("doc_id").subtract(b.select("doc_id")).count() == 0
        joined = a.alias("a").join(b.alias("b"), "doc_id")
        assert joined.filter(F.col("a.ordinal") != F.col("b.ordinal")).count() > 0


class TestResampleInterpolate:
    def test_linear_between_observations(self, spark):
        from small_etl_spark.operators.timeseries import resample_interpolate

        rows = [
            (1, 1, "view", 1.0, _ts("2024-01-01T00:10:00")),   # bin h0: 100c
            (2, 1, "view", 5.0, _ts("2024-01-01T04:20:00")),   # bin h4: 500c
        ]
        ev = spark.createDataFrame(
            rows,
            "event_id bigint, user_id bigint, event_type string,"
            " value double, ts timestamp",
        )
        out = resample_interpolate(ev, "2024-01-01", "2024-01-01T08:00:00", 3600)
        got = {
            r["bin_ts"].hour: r["interp_millicents"] for r in out.collect()
        }
        assert got[0] == 100_000 and got[4] == 500_000        # observed
        assert (got[1], got[2], got[3]) == (200_000, 300_000, 400_000)
        assert got[5] is None and got[7] is None              # no extrapolation

    def test_truncating_division_is_exact(self, spark):
        from small_etl_spark.operators.timeseries import resample_interpolate

        # 100c at h0, 200c at h3 → h1 = (100*2+200*1)*1000 DIV 3 = 133333
        rows = [
            (1, 1, "view", 1.0, _ts("2024-01-01T00:00:00")),
            (2, 1, "view", 2.0, _ts("2024-01-01T03:00:00")),
        ]
        ev = spark.createDataFrame(
            rows,
            "event_id bigint, user_id bigint, event_type string,"
            " value double, ts timestamp",
        )
        out = resample_interpolate(ev, "2024-01-01", "2024-01-01T04:00:00", 3600)
        got = {r["bin_ts"].hour: r["interp_millicents"] for r in out.collect()}
        assert got[1] == 133_333 and got[2] == 166_666


class TestDrift:
    def test_ks_known_value(self, spark):
        from small_etl_spark.operators.drift import ks_statistic

        a = spark.createDataFrame([(1,), (2,), (3,)], "v int")
        b = spark.createDataFrame([(3,), (4,)], "v int")
        (row,) = ks_statistic(a, b, "v").collect()
        # union values 1,2,3,4 → |F_a−F_b| = 1/3, 2/3, 1/2, 0
        assert (row["n_a"], row["n_b"]) == (3, 2)
        assert abs(row["ks_stat"] - 2 / 3) < 1e-6

    def test_ks_identical_is_zero(self, spark):
        from small_etl_spark.operators.drift import ks_statistic

        a = spark.createDataFrame([(i % 7,) for i in range(50)], "v int")
        (row,) = ks_statistic(a, a, "v").collect()
        assert row["ks_stat"] == 0.0

    def test_psi_identical_is_zero_and_shift_registers(self, spark):
        from small_etl_spark.operators.drift import psi_report

        same = spark.createDataFrame([(i % 100,) for i in range(200)], "v int")
        (row,) = psi_report(same, same, "v", lo=0, hi=100, buckets=10).collect()
        assert row["psi"] == 0.0

        lo_side = spark.createDataFrame([(i % 30,) for i in range(200)], "v int")
        hi_side = spark.createDataFrame(
            [(70 + i % 30,) for i in range(200)], "v int"
        )
        (row,) = psi_report(lo_side, hi_side, "v", lo=0, hi=100, buckets=10).collect()
        assert row["psi"] > 0.25  # "significant shift" by the standard rule

    def test_psi_out_of_range_clamps(self, spark):
        from small_etl_spark.operators.drift import psi_report

        inside = spark.createDataFrame([(50,)] * 10, "v int")
        outside = spark.createDataFrame([(-5,)] * 5 + [(1000,)] * 5, "v int")
        (row,) = psi_report(outside, inside, "v", lo=0, hi=100, buckets=10).collect()
        assert (row["n_curr"], row["n_ref"]) == (10, 10)  # nothing dropped
        assert row["psi"] > 0.25


class TestFeatures:
    def test_groupwise_normalize_known(self, spark):
        from small_etl_spark.operators.features import groupwise_normalize

        df = spark.createDataFrame(
            [(i, "a", float(v)) for i, v in enumerate([1, 2, 3, 4, 5])]
            + [(9, "b", 7.0), (10, "b", 7.0)],
            "event_id bigint, event_type string, value double",
        )
        out = {
            r["event_id"]: r["z"]
            for r in groupwise_normalize(df, "event_type", "value").collect()
        }
        # group a: μ=3, σ=sqrt(2) (population, in cents: σ=100*sqrt2)
        assert out[2] == 0.0
        assert abs(out[4] - 2 / (2**0.5)) < 1e-6
        assert out[9] is None and out[10] is None  # σ=0 → no scale

    def test_winsorize_clips_tails_only(self, spark):
        from small_etl_spark.operators.features import winsorize

        vals = [float(v) for v in range(1, 100)] + [1000.0]  # one huge outlier
        df = spark.createDataFrame(
            [(i, "a", v) for i, v in enumerate(vals)],
            "event_id bigint, event_type string, value double",
        )
        out = winsorize(df, "event_type", "value", 0.01, 0.99)
        got = {r["event_id"]: r["clipped"] for r in out.collect()}
        assert got[99] < 1000.0          # outlier clamped down
        assert got[50] == vals[50]       # interior untouched
        assert min(got.values()) >= got[0]  # lower clamp applied


class TestEquidepthBins:
    def test_depths_and_edges(self, spark):
        # 25 rows into 4 bins by the (ord*k) DIV n rule:
        # thresholds at ceil(n*j/k) → sizes 7,6,6,6
        rows = [(float(v), v) for v in range(25)]
        df = spark.createDataFrame(rows, "val double, k bigint")
        out = {
            r["bin"]: (r["cnt"], r["lo"], r["hi"])
            for r in equidepth_bins(df, "val", "k", bins=4).collect()
        }
        assert out == {
            0: (7, 0.0, 6.0),
            1: (6, 7.0, 12.0),
            2: (6, 13.0, 18.0),
            3: (6, 19.0, 24.0),
        }

    def test_bins_partition_rows_and_are_ordered(self, spark):
        from small_etl_spark.sources.tables import load_table

        orders = load_table(spark, SF_DIR, "orders")
        out = (
            equidepth_bins(orders, "o_totalprice", "o_orderkey", bins=10)
            .orderBy("bin")
            .collect()
        )
        assert sum(r["cnt"] for r in out) == orders.count()
        assert len(out) == 10
        assert max(r["cnt"] for r in out) - min(r["cnt"] for r in out) <= 1
        for a, b in zip(out, out[1:]):
            assert a["hi"] <= b["lo"]
