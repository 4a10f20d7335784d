"""Property-based semantic tests for the hand-built temporal joins.

``asof_join`` / ``range_join`` are custom union-merge / bucketed
compositions (no Spark built-in to lean on), so their semantics are
pinned here against a brute-force Python reference over randomized
inputs — the highest-risk operators get the strongest oracle.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from small_etl_spark.operators.joins import asof_join, range_join

BASE = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _events(draw_rows):
    # rows: (key, ts_offset_seconds, value) with unique (key, offset)
    seen = set()
    out = []
    for k, off, v in draw_rows:
        if (k, off) in seen:
            continue
        seen.add((k, off))
        out.append((k, off, v))
    return out


rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=1000),
        st.integers(min_value=-100, max_value=100),
    ),
    min_size=1,
    max_size=12,
)


def _df(spark, rows, prefix):
    return spark.createDataFrame(
        [
            (k, BASE + dt.timedelta(seconds=off), float(v))
            for k, off, v in rows
        ],
        f"user_id long, ts timestamp, {prefix}value double",
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=rows_strategy, right=rows_strategy)
def test_asof_join_matches_reference(spark, left, right):
    left, right = _events(left), _events(right)
    ldf = _df(spark, left, "l_")
    rdf = _df(spark, right, "r_")
    got = {
        (r.user_id, r.ts.replace(tzinfo=dt.timezone.utc)): r.r_value_asof
        for r in asof_join(ldf, rdf, on="user_id").collect()
    }
    assert len(got) == len(left)
    for k, off, _ in left:
        lts = BASE + dt.timedelta(seconds=off)
        cands = [(o, v) for (rk, o, v) in right if rk == k and o <= off]
        want = float(max(cands)[1]) if cands else None
        assert got[(k, lts)] == want, (k, off, cands)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=rows_strategy,
    right=rows_strategy,
    lower=st.integers(min_value=0, max_value=50),
    width=st.integers(min_value=1, max_value=300),
)
def test_range_join_matches_reference(spark, left, right, lower, width):
    left, right = _events(left), _events(right)
    ldf = _df(spark, left, "l_")
    rdf = _df(spark, right, "r_")
    out = range_join(
        ldf,
        rdf,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        lower_seconds=float(lower),
        upper_seconds=float(lower + width),
    )
    ts_cols = [c for c in out.columns if "ts" in c]
    got = sorted(
        (r.user_id, *(r[c].timestamp() for c in ts_cols))
        for r in out.collect()
    )
    want = sorted(
        (
            k,
            (BASE + dt.timedelta(seconds=lo)).timestamp(),
            (BASE + dt.timedelta(seconds=ro)).timestamp(),
        )
        for (k, lo, _) in left
        for (rk, ro, _) in right
        if rk == k and lower <= ro - lo <= lower + width
    )
    assert got == want


intervals_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # key
        st.integers(min_value=0, max_value=500),    # start offset s
        st.integers(min_value=0, max_value=200),    # duration s
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=intervals_st, right=intervals_st)
def test_interval_overlap_join_matches_reference(spark, left, right):
    from small_etl_spark.operators.joins import interval_overlap_join

    ldf = spark.createDataFrame(
        [(i, k, s, s + d) for i, (k, s, d) in enumerate(left)],
        "lid long, k long, ls long, le long",
    )
    rdf = spark.createDataFrame(
        [(i, k, s, s + d) for i, (k, s, d) in enumerate(right)],
        "rid long, k long, rs long, re long",
    )
    out = interval_overlap_join(
        ldf, rdf, "ls", "le", "rs", "re", on="k", bucket_seconds=60.0
    )
    got = sorted((r.lid, r.rid) for r in out.collect())
    want = sorted(
        (li, ri)
        for li, (lk, ls, ld) in enumerate(left)
        for ri, (rk, rs, rd) in enumerate(right)
        if lk == rk and ls <= rs + rd and rs <= ls + ld
    )
    assert got == want


def test_cogroup_asof_equals_window_asof(spark):
    """Mutual correctness check: the per-key pandas merge_asof
    (cogroup.applyInPandas) and the union-merge window formulation
    must produce identical results on the real events data —
    independent implementations agreeing on every row."""
    from pyspark.sql import functions as F

    from small_etl_spark.operators.joins import asof_join, asof_join_cogroup
    from small_etl_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    kw = dict(on="user_id", right_cols=["purchase_event_id", "purchase_value"])
    a = asof_join(clicks, purchases, **kw)
    b = asof_join_cogroup(clicks, purchases, **kw)
    ka = sorted(map(tuple, a.select(sorted(a.columns)).collect()))
    kb = sorted(map(tuple, b.select(sorted(b.columns)).collect()))
    assert ka == kb and len(ka) > 0


def test_cogroup_asof_handles_empty_sides(spark):
    from small_etl_spark.operators.joins import asof_join_cogroup

    left = spark.createDataFrame(
        [(1, 10.0, 100), (2, 5.0, 200)], "k long, ts double, lv long"
    )
    right = spark.createDataFrame([], "k long, ts double, rv long")
    out = {r["lv"]: r["rv_asof"]
           for r in asof_join_cogroup(left, right, on="k").collect()}
    assert out == {100: None, 200: None}  # all left rows survive, null-matched
