"""Unit tests for the round-7 additions: skyline (2-D window form and
n-D skyline-of-skylines), point-in-time SCD-2 join, count-min sketch,
salted skew join, sorted-neighborhood blocking, and DSIR weights."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def brute_skyline(points):
    """Reference dominance filter: keep distinct non-dominated points."""
    pts = sorted(set(points))
    out = []
    for p in pts:
        dominated = any(
            all(qi <= pi for qi, pi in zip(q, p))
            and any(qi < pi for qi, pi in zip(q, p))
            for q in pts
            if q != p
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def test_skyline_2d_matches_brute_force(spark):
    from small_etl_spark.operators.skyline import skyline_2d

    points = [(3, 1), (1, 3), (2, 2), (2, 2), (3, 3), (1, 3), (4, 0), (0, 4)]
    df = spark.createDataFrame(points, ["x", "y"])
    got = sorted((r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect())
    assert got == brute_skyline(points)  # duplicates collapse to one row


def test_skyline_2d_dominance_law(spark):
    """No output point may dominate another; every dropped point is
    dominated by some output point."""
    from small_etl_spark.operators.skyline import skyline_2d

    import random

    rng = random.Random(7)
    points = [(rng.randint(0, 20), rng.randint(0, 20)) for _ in range(200)]
    df = spark.createDataFrame(points, ["x", "y"])
    sky = sorted((r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect())
    assert sky == brute_skyline(points)


def test_skyline_nd_matches_brute_force(spark):
    from small_etl_spark.operators.skyline import skyline_nd

    import random

    rng = random.Random(11)
    points = [
        (rng.randint(0, 8), rng.randint(0, 8), rng.randint(0, 8))
        for _ in range(300)
    ]
    # spread over several partitions to exercise the local/merge path
    df = spark.createDataFrame(points, ["a", "b", "c"]).repartition(7)
    got = sorted(
        (int(r["a"]), int(r["b"]), int(r["c"]))
        for r in skyline_nd(df, ["a", "b", "c"]).collect()
    )
    assert got == brute_skyline(points)


def test_skyline_nd_no_cartesian_product(spark):
    """The n-D skyline must never plan an all-pairs join over input."""
    from small_etl_spark.operators.skyline import skyline_nd

    df = spark.range(100).select(
        (F.col("id") % 10).alias("a"), (F.col("id") % 7).alias("b"),
        (F.col("id") % 3).alias("c"),
    )
    plan = (
        skyline_nd(df, ["a", "b", "c"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_point_in_time_join_versions(spark):
    from small_etl_spark.operators.joins import point_in_time_join

    versions = spark.createDataFrame(
        [
            (1, "BRONZE", "2020-01-01", "2020-06-01"),
            (1, "GOLD", "2020-06-01", None),
            (2, "SILVER", "2020-01-01", None),
        ],
        ["k", "tier", "valid_from", "valid_to"],
    )
    facts = spark.createDataFrame(
        [
            (100, 1, "2020-03-15"),  # during BRONZE
            (101, 1, "2020-06-01"),  # boundary: valid_from inclusive
            (102, 1, "2021-01-01"),  # open GOLD row
            (103, 2, "2020-02-02"),
            (104, 3, "2020-02-02"),  # no dimension row at all
        ],
        ["fid", "k", "ts"],
    )
    got = {
        r["fid"]: r["tier"]
        for r in point_in_time_join(facts, versions, key="k", ts="ts").collect()
    }
    assert got == {100: "BRONZE", 101: "GOLD", 102: "GOLD", 103: "SILVER"}
    # left join keeps unmatched facts with NULL features
    left = {
        r["fid"]: r["tier"]
        for r in point_in_time_join(
            facts, versions, key="k", ts="ts", how="left"
        ).collect()
    }
    assert left[104] is None and len(left) == 5


def test_point_in_time_join_overlap_latest_wins(spark):
    from small_etl_spark.operators.joins import point_in_time_join

    versions = spark.createDataFrame(
        [(1, "OLD", "2020-01-01", None), (1, "NEW", "2020-03-01", None)],
        "k long, tier string, valid_from string, valid_to string",
    )
    facts = spark.createDataFrame([(7, 1, "2020-04-01")], ["fid", "k", "ts"])
    rows = point_in_time_join(facts, versions, key="k", ts="ts").collect()
    assert len(rows) == 1 and rows[0]["tier"] == "NEW"


def test_cms_overcount_only_and_merge(spark):
    from small_etl_spark.operators.sketches import (
        cms_build, cms_estimate, cms_merge,
    )

    vals = [i % 13 for i in range(400)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    true = {v: vals.count(v) for v in set(vals)}
    sketch = cms_build(df, "v", depth=4, width=64)
    items = spark.createDataFrame([(v,) for v in set(vals)], ["v"])
    est = {
        r["v"]: r["est_n"]
        for r in cms_estimate(sketch, items, "v", depth=4, width=64).collect()
    }
    for v, t in true.items():
        assert est[v] >= t  # CMS never undercounts

    # mergeability: sketch(A) + sketch(B) == sketch(A ∪ B), cell-exact
    a = df.filter(F.col("v") % 2 == 0)
    b = df.filter(F.col("v") % 2 == 1)
    merged = cms_merge(
        cms_build(a, "v", depth=4, width=64),
        cms_build(b, "v", depth=4, width=64),
    )
    whole = {(r["j"], r["bucket"]): r["cnt"] for r in sketch.collect()}
    got = {(r["j"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert got == whole


def test_salted_join_equals_plain_join(spark):
    from small_etl_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(i, i % 3) for i in range(60)], ["rid", "k"]
    )
    right = spark.createDataFrame(
        [(0, "a"), (1, "b"), (1, "bb"), (2, "c")], ["k", "v"]
    )
    plain = sorted(
        (r["rid"], r["k"], r["v"])
        for r in left.join(right, "k").collect()
    )
    salted = sorted(
        (r["rid"], r["k"], r["v"])
        for r in salted_join(
            left, right, on="k", distributor="rid", salt_buckets=4
        ).collect()
    )
    assert salted == plain
    # the salt must not leak into the output schema
    out = salted_join(left, right, on="k", distributor="rid")
    assert "__salt__" not in out.columns


def test_sorted_neighborhood_window_bound(spark):
    from small_etl_spark.operators.dedup import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha1"), (3, "alphx"), (4, "zzz")],
        ["id", "name"],
    )
    # sort order: alpha, alpha1, alphx, zzz; window=3 compares each
    # row to 2 successors → (alpha,alpha1) d=1, (alpha,alphx) d=1,
    # (alpha1,alphx) d=2 dropped, zzz unpaired
    pairs = sorted(
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(
            df, id_col="id", text_col="name", window=3, max_distance=1
        ).collect()
    )
    assert pairs == [(1, 2), (1, 3)]


def test_dsir_weights_favor_target_like_docs(spark):
    from small_etl_spark.llm.sampling import dsir_logratio_weights

    rows = [
        (i, "the quick brown fox jumps over the lazy dog", "en")
        for i in range(10)
    ] + [
        (100 + i, "der schnelle braune fuchs springt sehr hoch", "de")
        for i in range(10)
    ] + [(200, "the quick brown fox", "de")]  # target-like text, wrong label
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    w = {
        r["doc_id"]: r["logratio"]
        for r in dsir_logratio_weights(df, F.col("lang") == "en").collect()
    }
    # every English doc outscores every German doc
    assert min(w[i] for i in range(10)) > max(w[100 + i] for i in range(10))
    # and the mislabeled English-looking doc scores like the English ones
    assert w[200] > max(w[100 + i] for i in range(10))


def test_k_anonymity_report_flags_small_classes(spark):
    from small_etl_spark.operators.privacy import k_anonymity_report

    df = spark.createDataFrame(
        [("US", "A")] * 5 + [("US", "B")] * 2 + [("DE", "A")],
        ["country", "seg"],
    )
    rows = {
        (r["country"], r["seg"]): (r["class_n"], r["violates_k"])
        for r in k_anonymity_report(df, ["country", "seg"], k=5).collect()
    }
    assert rows[("US", "A")] == (5, False)
    assert rows[("US", "B")] == (2, True)
    assert rows[("DE", "A")] == (1, True)


def test_dp_noisy_counts_deterministic_and_centered(spark):
    from small_etl_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame(
        [(f"g{i % 40}",) for i in range(400)], ["g"]
    )
    # a salt is mandatory — a public default would void the guarantee
    with pytest.raises(ValueError, match="secret salt"):
        dp_noisy_counts(df, ["g"], epsilon=1.0)
    a = {r["g"]: r["noisy_n"] for r in
         dp_noisy_counts(df, ["g"], epsilon=1.0, salt="dp-v1").collect()}
    b = {r["g"]: r["noisy_n"] for r in
         dp_noisy_counts(df, ["g"], epsilon=1.0, salt="dp-v1").collect()}
    assert a == b  # hash-uniform → reproducible release
    errs = [v - 10.0 for v in a.values()]
    # Laplace(1): mean |err| ≈ 1, and the direction is ~balanced
    assert 0.2 < sum(abs(e) for e in errs) / len(errs) < 4.0
    assert any(e > 0 for e in errs) and any(e < 0 for e in errs)
    # a different salt draws an independent release
    c = {r["g"]: r["noisy_n"] for r in
         dp_noisy_counts(df, ["g"], epsilon=1.0, salt="dp-v2").collect()}
    assert c != a
    # tighter epsilon → bigger noise scale on the same uniforms
    d = {r["g"]: r["noisy_n"] for r in
         dp_noisy_counts(df, ["g"], epsilon=0.1, salt="dp-v1").collect()}
    assert all(abs(d[g] - 10.0) >= abs(a[g] - 10.0) for g in a)


def test_dup_span_coverage_hand_computed(spark):
    from small_etl_spark.llm.dedup import dup_span_coverage

    df = spark.createDataFrame(
        [
            (1, "a b c d e"),   # shares "a b c" with doc 2
            (2, "a b c x y"),
            (3, "p q r s t"),   # entirely unique
            (4, "a b"),         # shorter than n → no grams, 0 coverage
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: (r["n_tokens"], r["covered"], r["coverage"])
        for r in dup_span_coverage(df, n=3).collect()
    }
    # tokens a,b,c covered in docs 1 and 2 (positions 1..3 of 5)
    assert rows[1] == (5, 3, 0.6)
    assert rows[2] == (5, 3, 0.6)
    assert rows[3] == (5, 0, 0.0)
    assert rows[4] == (2, 0, 0.0)


def test_bloom_semi_join_exact_and_pruning(spark):
    from small_etl_spark.operators.sketches import bloom_semi_join

    facts = spark.createDataFrame([(i, i % 97) for i in range(2000)],
                                  ["fid", "k"])
    dim = spark.createDataFrame([(k,) for k in (3, 11, 42)], ["k"])
    got = sorted(r["fid"] for r in
                 bloom_semi_join(facts, dim, on="k").collect())
    want = sorted(r["fid"] for r in
                  facts.join(dim, "k", "left_semi").collect())
    assert got == want  # the trailing LeftSemi makes bloom FPs harmless
    # the probe must be a pre-join Filter with the bit test inline
    plan = (bloom_semi_join(facts, dim, on="k")
            ._jdf.queryExecution().executedPlan().toString())
    assert "shiftright" in plan


def test_fellegi_sunter_weight_hand_math(spark):
    import math

    from small_etl_spark.operators.dedup import fellegi_sunter_weight

    df = spark.createDataFrame([(True,), (False,)], ["agree"])
    rows = {
        r["agree"]: r["w"]
        for r in df.select(
            "agree",
            fellegi_sunter_weight(F.col("agree"), 0.9, 0.1).alias("w"),
        ).collect()
    }
    assert rows[True] == pytest.approx(math.log2(0.9 / 0.1))
    assert rows[False] == pytest.approx(math.log2(0.1 / 0.9))
    with pytest.raises(ValueError):
        fellegi_sunter_weight(F.col("agree"), 0.1, 0.9)  # m must exceed u


def test_flesch_reading_ease_hand_computed(spark):
    from small_etl_spark.llm.textstats import flesch_reading_ease

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran."), (2, "no terminator"), (3, "")],
        ["id", "text"],
    )
    rows = {
        r["id"]: r["f"]
        for r in df.select(
            "id", flesch_reading_ease("text").alias("f")
        ).collect()
    }
    # doc 1: words=6, sentences=2, syllable groups: e,a,a,e,o,a = 6
    want = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert rows[1] == pytest.approx(want)
    assert rows[2] is None and rows[3] is None  # no sentences / no words


def test_benford_audit_first_digit_extraction(spark):
    from small_etl_spark.operators.profiling import benford_audit

    df = spark.createDataFrame(
        [(1000.0,), (0.052,), (923.4,), (-5.0,), (0.0,), (2e6,)], ["v"]
    )
    rows = {r["digit"]: r["n"] for r in benford_audit(df, "v").collect()}
    # 1000→1, 0.052→5, 923.4→9, 2e6→2; negatives and zero excluded
    assert rows == {1: 1, 5: 1, 9: 1, 2: 1}
    out = benford_audit(df, "v").collect()
    for r in out:
        assert r["chi2_component"] >= 0.0


def test_event_pattern_matches_hand_case(spark):
    from small_etl_spark.operators.events import event_pattern_matches

    rows = [
        # user 1: v c p v p  → "v[^p]*p" matches twice (non-overlap)
        (1, 1, "view"), (2, 1, "click"), (3, 1, "purchase"),
        (4, 1, "view"), (5, 1, "purchase"),
        # user 2: v c v — never converts
        (6, 2, "view"), (7, 2, "click"), (8, 2, "view"),
        # user 3: unmapped type interrupts nothing for [^p]* (dot ≠ p)
        (9, 3, "view"), (10, 3, "error"), (11, 3, "purchase"),
    ]
    df = spark.createDataFrame(
        [(i, u, t, float(i)) for i, u, t in rows],
        "event_id long, user_id long, event_type string, ts double",
    )
    got = {
        r["user_id"]: (r["seq_len"], r["n_matches"])
        for r in event_pattern_matches(
            df,
            pattern=r"v[^p]*p",
            alphabet={"view": "v", "click": "c", "purchase": "p"},
        ).collect()
    }
    assert got == {1: (5, 2), 2: (3, 0), 3: (3, 1)}


def test_seasonal_decompose_identity_and_trend(spark):
    from small_etl_spark.operators.timeseries import seasonal_decompose_dow

    # 21 days of constant 100.00/day → trend 100, seasonal 0, residual 0
    days = [f"2024-01-{d:02d}" for d in range(1, 22)]
    df = spark.createDataFrame([(d, 10000) for d in days],
                               "day string, y_cents long")
    rows = {r["day"]: r for r in seasonal_decompose_dow(df).collect()}
    mid = rows["2024-01-10"]
    assert mid["trend"] == 100.0
    assert mid["seasonal"] == 0.0 and mid["residual"] == 0.0
    # edges (first/last 3 days) have no full 7-day window
    assert rows["2024-01-01"]["trend"] is None
    assert rows["2024-01-21"]["trend"] is None
    # y + (trend-less) identity: y == trend + seasonal + residual
    for r in rows.values():
        if r["trend"] is not None:
            assert r["y"] == pytest.approx(
                r["trend"] + r["seasonal"] + r["residual"]
            )


def test_gini_known_distributions(spark):
    from small_etl_spark.queries import REGISTRY  # noqa: F401 (style anchor)
    from small_etl_spark.operators.sort import global_ordinal

    def gini_of(counts):
        df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(counts)], ["user_id", "n"]
        )
        ranked = global_ordinal(df, ["n", "user_id"], ordinal_col="i0")
        row = ranked.agg(
            (
                2.0
                * F.sum((F.col("i0") + 1) * F.col("n")).cast("double")
                / (F.count(F.lit(1)) * F.sum("n").cast("double"))
                - (F.count(F.lit(1)) + F.lit(1.0)) / F.count(F.lit(1))
            ).alias("g")
        ).collect()[0]
        return row["g"]

    assert gini_of([5, 5, 5, 5]) == pytest.approx(0.0)  # perfect equality
    # one user owns everything → (n-1)/n
    assert gini_of([0, 0, 0, 100]) == pytest.approx(0.75)


def test_dispersion_index_poisson_vs_bursty(spark):
    from small_etl_spark.queries import REGISTRY

    # constant series → variance 0 → dispersion 0; bursty → > 1
    daily_const = [("a", f"d{i}", 5) for i in range(10)]
    daily_burst = [("b", f"d{i}", 1) for i in range(9)] + [("b", "d9", 91)]
    df = spark.createDataFrame(
        daily_const + daily_burst, ["event_type", "day", "cnt"]
    )
    s = df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("days"),
        F.sum("cnt").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("s2"),
    )
    rows = {
        r["event_type"]: (
            (r["s2"] - r["s1"] ** 2 / r["days"]) / r["days"]
        ) / (r["s1"] / r["days"])
        for r in s.collect()
    }
    assert rows["a"] == pytest.approx(0.0)
    assert rows["b"] > 10


def test_global_cumsum_matches_sequential(spark):
    from small_etl_spark.operators.sort import global_cumsum

    import random

    rng = random.Random(3)
    vals = [(i, rng.randint(0, 100)) for i in range(500)]
    df = spark.createDataFrame(vals, ["k", "v"]).repartition(13)
    got = {
        r["k"]: r["cs"]
        for r in global_cumsum(df, ["k"], "v", cumsum_col="cs").collect()
    }
    acc = 0
    for k, v in vals:  # already in k order
        acc += v
        assert got[k] == acc


def test_ntile_by_matches_sql_ntile(spark):
    from small_etl_spark.operators.sort import ntile_by

    for n, k in ((10, 4), (7, 3), (3, 5), (100, 8)):
        df = spark.createDataFrame(
            [(i, (i * 37) % n) for i in range(n)], ["id", "x"]
        ).repartition(5)
        got = {
            r["id"]: r["tile"]
            for r in ntile_by(df, ["x", "id"], k).collect()
        }
        df.createOrReplaceTempView("t_ntile")
        want = {
            r["id"]: r["nt"]
            for r in spark.sql(
                f"SELECT id, ntile({k}) OVER (ORDER BY x, id) AS nt "
                "FROM t_ntile"
            ).collect()
        }
        assert got == want, (n, k)


def test_ivm_join_delta_matches_full_rejoin(spark):
    from small_etl_spark.operators.incremental import ivm_join_delta

    A = spark.createDataFrame([(i, f"a{i}") for i in range(20)], ["k", "av"])
    B = spark.createDataFrame(
        [(i % 7, f"b{i}") for i in range(30)], ["k", "bv"]
    )
    bl, dl = A.filter("k % 4 != 0"), A.filter("k % 4 = 0")
    br, dr = B.filter("k % 3 != 0"), B.filter("k % 3 = 0")
    incremental = bl.join(br, "k").unionByName(
        ivm_join_delta(bl, dl, br, dr, on="k")
    )
    full = A.join(B, "k")
    got = sorted(map(tuple, incremental.collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want and len(want) > 0


def test_coalesced_intervals_are_disjoint_and_cover(spark):
    """Property check on the gaps-and-islands output: per user, spans
    are pairwise disjoint (gap > 0 between consecutive spans) and
    every event timestamp falls inside exactly one span."""
    from small_etl_spark.queries import REGISTRY
    from small_etl_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    spans = REGISTRY["coalesce_intervals_events"].builder(spark, sf).collect()
    by_user = {}
    for r in spans:
        by_user.setdefault(r["user_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    for user, ss in by_user.items():
        ss.sort()
        for (s1, e1), (s2, e2) in zip(ss, ss[1:]):
            assert s2 > e1, (user, s1, e1, s2, e2)  # strictly separated
    ev = load_table(spark, sf, "events").select("user_id", "ts").collect()
    import calendar

    for r in ev:
        t = calendar.timegm(r["ts"].timetuple())
        assert any(s <= t <= e for s, e in by_user[r["user_id"]])


def test_schema_compat_report_rules(spark):
    from pyspark.sql.types import (
        DoubleType, IntegerType, LongType, StringType, StructField,
        StructType,
    )

    from small_etl_spark.operators.validation import schema_compat_report

    old = StructType([
        StructField("id", LongType(), False),
        StructField("qty", IntegerType(), True),
        StructField("price", DoubleType(), True),
        StructField("note", StringType(), True),
        StructField("opt", StringType(), True),
    ])
    new = StructType([
        StructField("id", LongType(), True),        # required→nullable: ok
        StructField("qty", LongType(), True),       # widened: warn
        StructField("price", StringType(), True),   # incompatible: break
        # note removed: break
        StructField("opt", StringType(), False),    # nullable→required: break
        StructField("tag", StringType(), True),     # added nullable: ok
        StructField("must", LongType(), False),     # added required: break
    ])
    found = {
        (f["field"], f["change"]): f["severity"]
        for f in schema_compat_report(old, new)
    }
    assert found == {
        ("qty", "type:integer->long"): "warn",
        ("price", "type:double->string"): "break",
        ("note", "removed"): "break",
        ("opt", "nullable->required"): "break",
        ("tag", "added"): "ok",
        ("must", "added"): "break",
    }
    # identical schemas → clean report
    assert schema_compat_report(old, old) == []
