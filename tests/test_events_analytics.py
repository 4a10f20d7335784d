"""Event analytics (funnel / cohort / trend), SCD-2, sampling, vocab,
k-means — round-2 additions."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from small_etl_spark.llm.sampling import hash_topk_per_group
from small_etl_spark.llm.similarity import kmeans_clusters
from small_etl_spark.llm.textstats import vocab_coverage
from small_etl_spark.operators.events import cohort_retention, funnel, grouped_trend
from small_etl_spark.operators.joins import scd2_upsert

SF_DIR = "/root/testdata/sf0.001"


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp"
    )


class TestFunnel:
    def test_strict_ordering(self, spark):
        # u1 converts fully; u2 clicked BEFORE viewing (click must not
        # count); u3 views only.
        rows = [
            (1, "view", _ts("2024-01-01T00:00:00")),
            (1, "click", _ts("2024-01-01T01:00:00")),
            (1, "purchase", _ts("2024-01-01T02:00:00")),
            (2, "click", _ts("2024-01-02T00:00:00")),
            (2, "view", _ts("2024-01-02T01:00:00")),
            (3, "view", _ts("2024-01-03T00:00:00")),
        ]
        out = funnel(_events(spark, rows), ["view", "click", "purchase"])
        got = {r["step"]: r["users"] for r in out.collect()}
        assert got == {"view": 3, "click": 1, "purchase": 1}

    def test_later_click_still_counts(self, spark):
        # first click precedes the view, but a second click follows it.
        rows = [
            (1, "click", _ts("2024-01-01T00:00:00")),
            (1, "view", _ts("2024-01-01T01:00:00")),
            (1, "click", _ts("2024-01-01T02:00:00")),
        ]
        out = funnel(_events(spark, rows), ["view", "click"])
        got = {r["step"]: r["users"] for r in out.collect()}
        assert got == {"view": 1, "click": 1}

    def test_monotone_on_testdata(self, spark):
        from small_etl_spark.sources.tables import load_table

        ev = load_table(spark, SF_DIR, "events")
        out = funnel(ev, ["view", "click", "purchase"]).orderBy("step_index")
        counts = [r["users"] for r in out.collect()]
        assert counts == sorted(counts, reverse=True)
        assert counts[0] > 0


class TestCohortRetention:
    def test_offsets_and_mass(self, spark):
        rows = [
            (1, "view", _ts("2024-01-01T10:00:00")),  # week of 2024-01-01
            (1, "view", _ts("2024-01-09T10:00:00")),  # next week
            (2, "view", _ts("2024-01-10T10:00:00")),  # cohort week 2
        ]
        out = cohort_retention(_events(spark, rows)).collect()
        by_key = {(r["cohort_week"], r["week_offset"]): r["users"] for r in out}
        w1 = int(_ts("2024-01-01T00:00:00").replace(tzinfo=dt.timezone.utc).timestamp())
        w2 = int(_ts("2024-01-08T00:00:00").replace(tzinfo=dt.timezone.utc).timestamp())
        assert by_key[(w1, 0)] == 1
        assert by_key[(w1, 1)] == 1
        assert by_key[(w2, 0)] == 1
        # offset-0 row exists for every cohort and counts every user once
        assert sum(v for (c, o), v in by_key.items() if o == 0) == 2


class TestGroupedTrend:
    def test_exact_line(self, spark):
        # y = 200 cents/hour * x + 500 cents, exactly on the grid
        rows = [
            (1, "a", _ts("2024-01-01T00:00:00"), 5.0),
            (1, "a", _ts("2024-01-01T01:00:00"), 7.0),
            (1, "a", _ts("2024-01-01T02:00:00"), 9.0),
            (1, "b", _ts("2024-01-01T00:00:00"), 1.0),
            (1, "b", _ts("2024-01-01T01:00:00"), 1.0),
        ]
        df = spark.createDataFrame(
            rows, "user_id bigint, event_type string, ts timestamp, value double"
        )
        out = {r["event_type"]: r for r in grouped_trend(df).collect()}
        assert out["a"]["slope_cents_per_hour"] == 200.0
        assert out["a"]["intercept_cents"] == 500.0
        assert out["b"]["slope_cents_per_hour"] == 0.0
        assert out["b"]["intercept_cents"] == 100.0


class TestScd2:
    def _current(self, spark):
        return spark.createDataFrame(
            [
                (1, "gold", "2020-01-01", None, True),
                (1, "silver", "2019-01-01", "2020-01-01", False),  # history
                (2, "bronze", "2020-01-01", None, True),
            ],
            "id bigint, tier string, valid_from string, valid_to string,"
            " is_current boolean",
        )

    def test_close_and_append(self, spark):
        updates = spark.createDataFrame(
            [(1, "platinum"), (2, "bronze")], "id bigint, tier string"
        )
        out = scd2_upsert(
            self._current(spark), updates, "id", ["tier"], "2024-06-01"
        )
        rows = {(r["id"], r["tier"], r["is_current"]): r for r in out.collect()}
        # id=1: history kept, gold closed, platinum opened
        assert rows[(1, "silver", False)]["valid_to"] == "2020-01-01"
        assert rows[(1, "gold", False)]["valid_to"] == "2024-06-01"
        assert rows[(1, "platinum", True)]["valid_from"] == "2024-06-01"
        assert rows[(1, "platinum", True)]["valid_to"] is None
        # id=2 unchanged (same tier): single open row, untouched
        assert rows[(2, "bronze", True)]["valid_from"] == "2020-01-01"
        assert len(rows) == 4

    def test_idempotent(self, spark):
        updates = spark.createDataFrame([(1, "platinum")], "id bigint, tier string")
        once = scd2_upsert(
            self._current(spark), updates, "id", ["tier"], "2024-06-01"
        )
        twice = scd2_upsert(once, updates, "id", ["tier"], "2024-07-01")
        assert sorted(map(tuple, once.collect())) == sorted(
            map(tuple, twice.collect())
        )


class TestHashTopkPerGroup:
    def test_k_per_group_and_determinism(self, spark):
        from small_etl_spark.sources.tables import load_table

        docs = load_table(spark, SF_DIR, "documents")
        s1 = hash_topk_per_group(docs, "lang", 5)
        per_group = {
            r["lang"]: r["n"]
            for r in s1.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert all(v <= 5 for v in per_group.values())
        ids1 = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
        ids2 = sorted(
            r["doc_id"]
            for r in hash_topk_per_group(docs, "lang", 5).select("doc_id").collect()
        )
        assert ids1 == ids2
        # growing k keeps the smaller sample as a prefix (stable ranks)
        ids10 = {
            r["doc_id"]
            for r in hash_topk_per_group(docs, "lang", 10).select("doc_id").collect()
        }
        assert set(ids1) <= ids10


class TestVocabCoverage:
    def test_counts_and_monotone(self, spark):
        df = spark.createDataFrame(
            [("a a a b b c",), ("a b  c",)], "text string"
        )
        out = vocab_coverage(df, top_n=10).orderBy("rank").collect()
        assert [(r["term"], r["cnt"]) for r in out] == [
            ("a", 4),
            ("b", 3),
            ("c", 2),
        ]
        cov = [r["coverage"] for r in out]
        assert cov == sorted(cov)
        assert abs(cov[-1] - 1.0) < 1e-9
        assert abs(cov[0] - round(4 / 9, 6)) < 1e-9


class TestKmeansClusters:
    def test_mass_and_determinism(self, spark):
        from small_etl_spark.sources.tables import load_table

        emb = load_table(spark, SF_DIR, "embeddings")
        out1 = kmeans_clusters(emb, k=4, iters=2).collect()
        assert sum(r["size"] for r in out1) == emb.count()
        assert len(out1) <= 4
        out2 = kmeans_clusters(emb, k=4, iters=2).collect()
        assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))


class TestGlobalOrdinal:
    def test_matches_single_partition_window(self, spark):
        from pyspark.sql import Window

        from small_etl_spark.operators.sort import global_ordinal
        from small_etl_spark.sources.tables import load_table

        docs = load_table(spark, SF_DIR, "documents")
        got = {
            r["doc_id"]: r["ordinal"]
            for r in global_ordinal(docs, ["n_chars", "doc_id"], num_partitions=7)
            .select("doc_id", "ordinal")
            .collect()
        }
        w = Window.orderBy("n_chars", "doc_id")
        want = {
            r["doc_id"]: r["o"]
            for r in docs.select(
                "doc_id", (F.row_number().over(w) - 1).cast("bigint").alias("o")
            ).collect()
        }
        assert got == want

    def test_windows_are_parallel(self, spark):
        from small_etl_spark.operators.sort import global_ordinal
        from small_etl_spark.sources.tables import load_table

        docs = load_table(spark, SF_DIR, "documents")
        plan = (
            global_ordinal(docs, ["n_chars", "doc_id"], num_partitions=7)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the ranking window partitions by pid — no SinglePartition
        # exchange feeding a Window node
        assert "windowspecdefinition(__pid__" in plan


class TestWeightedHashSample:
    def test_monotone_and_deterministic(self, spark):
        from small_etl_spark.llm.sampling import weighted_hash_sample
        from small_etl_spark.sources.tables import load_table

        docs = load_table(spark, SF_DIR, "documents")
        s1 = weighted_hash_sample(docs, "n_chars", 0.002)
        s2 = weighted_hash_sample(docs, "n_chars", 0.002)
        ids = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
        assert ids == sorted(r["doc_id"] for r in s2.select("doc_id").collect())
        # keep-rate for long docs must exceed keep-rate for short docs
        med = docs.approxQuantile("n_chars", [0.5], 0.01)[0]
        long_rate = s1.filter(F.col("n_chars") > med).count() / max(
            docs.filter(F.col("n_chars") > med).count(), 1
        )
        short_rate = s1.filter(F.col("n_chars") <= med).count() / max(
            docs.filter(F.col("n_chars") <= med).count(), 1
        )
        assert long_rate > short_rate

    def test_weight_one_always_kept(self, spark):
        from small_etl_spark.llm.sampling import weighted_hash_sample

        df = spark.createDataFrame(
            [(i, 1000.0) for i in range(50)], "doc_id bigint, w double"
        )
        # scale*w = 1000*0.01 = 10 ≥ 1 → probability clamps to 1
        assert weighted_hash_sample(df, "w", 0.01).count() == 50


class TestLengthBucketedBatches:
    def test_batches_bounded_and_homogeneous(self, spark):
        from small_etl_spark.llm.chunking import length_bucketed_batches

        rows = [(i, 2 ** (i % 5) * 10 + i % 3) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
        out = length_bucketed_batches(df, "n_tokens", 8)
        sizes = out.groupBy("bucket", "batch_id").count().collect()
        assert all(r["count"] <= 8 for r in sizes)
        # a batch never mixes buckets by construction; total preserved
        assert out.count() == 100
        # deterministic across runs
        a = sorted(map(tuple, out.collect()))
        b = sorted(
            map(tuple, length_bucketed_batches(df, "n_tokens", 8).collect())
        )
        assert a == b


def test_position_attribution_roles(spark):
    from small_etl_spark.operators.events import position_attribution

    # user 1: v c v p  → journey 0: v(first) c(middle) v(last), 10.00
    # user 2: v p      → journey 0: v(only), 5.00
    # user 3: v v      → no conversion, journey never credited
    rows = [
        (1, 1, "view", 0.0, 1.0), (2, 1, "click", 0.0, 2.0),
        (3, 1, "view", 0.0, 3.0), (4, 1, "purchase", 10.0, 4.0),
        (5, 2, "view", 0.0, 1.0), (6, 2, "purchase", 5.0, 2.0),
        (7, 3, "view", 0.0, 1.0), (8, 3, "view", 0.0, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "value double, ts double",
    )
    got = {
        (r["touch_type"], r["role"]): (r["touches"], r["influenced_revenue"])
        for r in position_attribution(df).collect()
    }
    assert got == {
        ("view", "first"): (1, 10.0),
        ("click", "middle"): (1, 10.0),
        ("view", "last"): (1, 10.0),
        ("view", "only"): (1, 5.0),
    }
