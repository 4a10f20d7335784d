"""Profiling / diagnostics operators and incremental aggregates."""

from __future__ import annotations

from pyspark.sql import functions as F

from small_etl_spark.llm.textstats import bigram_stats
from small_etl_spark.operators.incremental import (
    merge_partials,
    partial_counts_sums,
)
from small_etl_spark.operators.profiling import (
    heavy_hitters,
    histogram_cents,
    profile_columns,
    zscore_outliers,
)


class TestProfileColumns:
    def test_nulls_distinct_minmax(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", None), (2, None, 3.5)],
            "id bigint, s string, v double",
        )
        prof = {r["column"]: r for r in profile_columns(df).collect()}
        assert prof["id"]["n_nulls"] == 0
        assert prof["id"]["n_distinct"] == 2
        assert prof["id"]["min_num"] == 1.0 and prof["id"]["max_num"] == 2.0
        assert prof["s"]["n_nulls"] == 1
        assert prof["s"]["min_str"] == "a" and prof["s"]["max_str"] == "b"
        assert prof["s"]["min_num"] is None
        assert prof["v"]["n_nulls"] == 1
        assert prof["v"]["max_num"] == 3.5


class TestHistogram:
    def test_edges_clamp_and_mass(self, spark):
        df = spark.createDataFrame(
            [(0.0,), (24.99,), (25.0,), (49.99,), (999.0,)], "x double"
        )
        out = {r["bucket"]: r for r in histogram_cents(df, "x", 0, 10_000, 4).collect()}
        assert out[0]["cnt"] == 2  # 0.00, 24.99
        assert out[1]["cnt"] == 2  # 25.00, 49.99
        assert out[3]["cnt"] == 1  # 999 clamps into last bucket
        assert out[0]["lo_edge"] == 0.0 and out[0]["hi_edge"] == 25.0
        assert sum(r["cnt"] for r in out.values()) == df.count()


class TestHeavyHitters:
    def test_top_and_share(self, spark):
        rows = [(1,)] * 6 + [(2,)] * 3 + [(3,)] * 1
        df = spark.createDataFrame(rows, "k bigint")
        out = heavy_hitters(df, "k", 2).orderBy(F.desc("cnt")).collect()
        assert [(r["key"], r["cnt"]) for r in out] == [(1, 6), (2, 3)]
        assert out[0]["share"] == 0.6


class TestZscoreOutliers:
    def test_flags_only_outliers(self, spark):
        rows = [(i, "g", 10.0) for i in range(20)] + [(99, "g", 1000.0)]
        df = spark.createDataFrame(rows, "event_id bigint, event_type string, value double")
        out = zscore_outliers(df, "event_type", "value", "event_id", 2.5).collect()
        assert [r["event_id"] for r in out] == [99]
        assert out[0]["zscore"] > 2.5

    def test_uniform_group_no_rows(self, spark):
        df = spark.createDataFrame(
            [(1, "g", 5.0), (2, "g", 5.0)],
            "event_id bigint, event_type string, value double",
        )
        # std == 0 → z is NaN/inf; must not crash and must not flag
        assert zscore_outliers(df, "event_type", "value", "event_id").count() == 0


class TestIncrementalMerge:
    def test_merge_equals_recompute(self, spark):
        df = spark.createDataFrame(
            [(1, 10.0), (1, 20.0), (2, 5.5), (2, 4.5), (3, 1.0)],
            "k bigint, v double",
        )
        full = partial_counts_sums(df, "k", "v")
        merged = merge_partials(
            partial_counts_sums(df.filter(F.col("v") < 10.0), "k", "v"),
            partial_counts_sums(df.filter(F.col("v") >= 10.0), "k", "v"),
        )
        assert sorted(map(tuple, full.collect())) == sorted(
            map(tuple, merged.collect())
        )

    def test_three_way_merge_associative(self, spark):
        df = spark.createDataFrame(
            [(1, 1.0), (1, 2.0), (1, 3.0)], "k bigint, v double"
        )
        parts = [
            partial_counts_sums(df.filter(F.col("v") == x), "k", "v")
            for x in (1.0, 2.0, 3.0)
        ]
        a = merge_partials(merge_partials(parts[0], parts[1]), parts[2])
        b = merge_partials(parts[0], merge_partials(parts[1], parts[2]))
        assert a.collect() == b.collect() == [
            type(a.collect()[0])(k=1, cnt=3, sum_cents=600)
        ]


class TestBigramStats:
    def test_counts_and_cond_p(self, spark):
        df = spark.createDataFrame(
            [("a b a b c",), ("a b",)], "text string"
        )
        out = {(r["w1"], r["w2"]): r for r in bigram_stats(df, top_n=10).collect()}
        # bigrams: (a,b)x3, (b,a)x1, (b,c)x1
        assert out[("a", "b")]["cnt"] == 3
        assert out[("a", "b")]["cond_p"] == 1.0
        assert out[("b", "a")]["cnt"] == 1
        assert out[("b", "a")]["cond_p"] == 0.5
        assert ("c", None) not in out and len(out) == 3

    def test_single_token_docs_ignored(self, spark):
        df = spark.createDataFrame([("solo",), ("",)], "text string")
        assert bigram_stats(df).count() == 0


class TestExpect:
    def test_single_pass_report(self, spark):
        from small_etl_spark.operators.profiling import expect

        df = spark.createDataFrame(
            [(1, 10.0), (2, -5.0), (3, None)], "id bigint, v double"
        )
        out = {
            r["rule"]: r
            for r in expect(
                df,
                [
                    ("v_nonneg", F.col("v") >= 0),
                    ("id_positive", F.col("id") > 0),
                ],
            ).collect()
        }
        # -5 violates; NULL counts as a violation too
        assert out["v_nonneg"]["violations"] == 2
        assert out["v_nonneg"]["passed"] is False
        assert out["id_positive"]["violations"] == 0
        assert out["id_positive"]["passed"] is True
        assert out["v_nonneg"]["total"] == 3


class TestApplyCdc:
    def test_latest_op_wins_and_deletes(self, spark):
        from small_etl_spark.operators.joins import apply_cdc

        log = spark.createDataFrame(
            [
                (1, "x", 1, "I"),
                (1, "y", 2, "U"),   # latest for key 1 → survives as y
                (2, "a", 1, "I"),
                (2, "a", 2, "D"),   # latest is D → key 2 gone
                (3, "z", 5, "D"),
                (3, "z2", 6, "I"),  # re-insert after delete → survives
            ],
            "k bigint, val string, seq bigint, op string",
        )
        out = {r["k"]: r["val"] for r in apply_cdc(log, "k", ["seq"]).collect()}
        assert out == {1: "y", 3: "z2"}

    def test_plan_is_aggregate_not_window(self, spark):
        from small_etl_spark.operators.joins import apply_cdc

        log = spark.createDataFrame(
            [(1, "x", 1, "I")], "k bigint, val string, seq bigint, op string"
        )
        plan = apply_cdc(log, "k", ["seq"])._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "max_by" in plan or "HashAggregate" in plan


class TestSnapshotDiff:
    def test_classification(self, spark):
        from small_etl_spark.operators.joins import snapshot_diff

        old = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
            "k bigint, s string, v bigint",
        )
        new = spark.createDataFrame(
            [(2, "b", 20), (3, "c2", 30), (4, "now", 40), (5, "e", 50)],
            "k bigint, s string, v bigint",
        )
        out = {r["k"]: r for r in snapshot_diff(old, new, "k").collect()}
        assert out[1]["change"] == "removed"
        assert out[3]["change"] == "changed"
        assert out[3]["old_s"] == "c" and out[3]["new_s"] == "c2"
        assert out[4]["change"] == "changed"  # NULL → value is a change
        assert out[5]["change"] == "added"
        assert 2 not in out  # unchanged key dropped


class TestDistinctSketches:
    def test_merge_equals_direct_and_tracks_exact(self, spark):
        from small_etl_spark.operators.incremental import (
            merge_distinct_sketches,
            partial_distinct_sketches,
        )
        from small_etl_spark.sources.tables import load_table

        li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
        direct = {
            r["l_returnflag"]: r["approx_distinct"]
            for r in merge_distinct_sketches(
                partial_distinct_sketches(li, "l_returnflag", "l_partkey")
            ).collect()
        }
        merged = {
            r["l_returnflag"]: r["approx_distinct"]
            for r in merge_distinct_sketches(
                partial_distinct_sketches(
                    li.filter("l_orderkey % 2 = 0"), "l_returnflag", "l_partkey"
                ),
                partial_distinct_sketches(
                    li.filter("l_orderkey % 2 = 1"), "l_returnflag", "l_partkey"
                ),
            ).collect()
        }
        # sketch union is lossless: slicing must not change estimates
        assert direct == merged
        exact = {
            r["l_returnflag"]: r["d"]
            for r in li.groupBy("l_returnflag")
            .agg(F.countDistinct("l_partkey").alias("d"))
            .collect()
        }
        for k, est in direct.items():
            assert abs(est - exact[k]) / exact[k] < 0.05


class TestNullSkewJoin:
    def test_semantics_match_plain_left_join(self, spark):
        from small_etl_spark.operators.skew import null_skew_left_join

        left = spark.createDataFrame(
            [(1, "a"), (None, "b"), (2, "c"), (None, "d"), (9, "e")],
            "k bigint, lv string",
        )
        right = spark.createDataFrame(
            [(1, "x"), (2, "y")], "k bigint, rv string"
        )
        from collections import Counter

        got = Counter(map(tuple, null_skew_left_join(left, right, "k").collect()))
        want = Counter(map(tuple, left.join(right, "k", "left").collect()))
        assert got == want

    def test_nulls_do_not_reach_the_join(self, spark):
        from small_etl_spark.operators.skew import null_skew_left_join

        left = spark.createDataFrame([(None, "b")], "k bigint, lv string")
        right = spark.createDataFrame([(1, "x")], "k bigint, rv string")
        plan = (
            null_skew_left_join(left, right, "k")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "isnotnull(k" in plan  # join branch filters nulls out


class TestApplyCdcRandomized:
    def test_matches_python_replay(self, spark):
        """A pseudorandom 600-op log (one Spark job) vs a sequential
        Python replay of the same log."""
        import random

        from small_etl_spark.operators.joins import apply_cdc

        rng = random.Random(42)
        rows = []
        for seq in range(600):
            k = rng.randrange(40)
            op = rng.choice(["I", "U", "U", "D"])
            rows.append((k, f"v{seq}", seq, op))
        df = spark.createDataFrame(rows, "k bigint, val string, seq bigint, op string")
        got = {r["k"]: r["val"] for r in apply_cdc(df, "k", ["seq"]).collect()}

        state: dict[int, str] = {}
        for k, val, seq, op in rows:  # already seq-ordered
            if op == "D":
                state.pop(k, None)
            else:
                state[k] = val
        assert got == state


def test_approx_quantile_rank_error_bound(spark):
    from small_etl_spark.operators.sketches import (
        approx_quantile_rank_error,
    )

    df = spark.range(0, 5000).select(
        (F.col("id") % 2).alias("g"),
        (F.col("id") * 7919 % 100000).cast("double").alias("v"),
    )
    out = approx_quantile_rank_error(df, "g", "v", accuracy=500)
    rows = out.collect()
    assert len(rows) == 6  # 2 groups × 3 quantiles
    for r in rows:
        assert r["n"] == 2500
        assert r["rank_err"] <= 5.0 / 500, r


def test_bloom_anti_join_equals_plain_anti(spark):
    from small_etl_spark.operators.sketches import bloom_anti_join

    left = spark.range(0, 500).select(
        F.col("id"), (F.col("id") % 97).alias("k")
    )
    right = spark.range(0, 40).select((F.col("id") * 3).alias("k"))
    got = sorted(
        map(tuple, bloom_anti_join(left, right, "k").collect())
    )
    want = sorted(
        map(tuple, left.join(right, "k", "left_anti").collect())
    )
    # unionByName reorders columns vs left_anti; compare as sets of
    # (id, k) regardless of column order
    got_ids = sorted(r for r in got)
    assert len(got) == len(want)
    assert {tuple(sorted(r)) for r in got} == {
        tuple(sorted(r)) for r in want
    }


def test_bloom_anti_join_tiny_filter_forces_fp_path(spark):
    """With an 64-bit filter nearly every row is a Bloom positive —
    the exact LeftAnti must still make the result correct."""
    from small_etl_spark.operators.sketches import bloom_anti_join

    left = spark.range(0, 300).select(F.col("id").alias("k"))
    right = spark.range(0, 300, 2).select(F.col("id").alias("k"))
    got = sorted(
        r["k"] for r in bloom_anti_join(left, right, "k", num_bits=64).collect()
    )
    assert got == list(range(1, 300, 2))
