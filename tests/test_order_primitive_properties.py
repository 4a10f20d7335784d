"""Hypothesis property tests for the distributed order primitives
(operators/sort.py): global_ordinal, global_cumsum, and ntile_by must
agree with their sequential definitions on arbitrary inputs and any
partitioning."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from small_etl_spark.operators.sort import (
    global_cumsum,
    global_ordinal,
    ntile_by,
)

ROWS = st.lists(
    st.tuples(st.integers(0, 50), st.integers(-100, 100)),
    min_size=1,
    max_size=60,
)


@settings(max_examples=12, deadline=None)
@given(rows=ROWS, parts=st.integers(1, 7))
def test_global_ordinal_is_sequential_rank(spark, rows, parts):
    data = [(i, k, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, ["rid", "k", "v"]).repartition(parts)
    got = {
        r["rid"]: r["ord"]
        for r in global_ordinal(df, ["k", "rid"], ordinal_col="ord").collect()
    }
    want = {
        rid: i
        for i, (rid, _, _) in enumerate(
            sorted(data, key=lambda t: (t[1], t[0]))
        )
    }
    assert got == want


@settings(max_examples=12, deadline=None)
@given(rows=ROWS, parts=st.integers(1, 7))
def test_global_cumsum_is_sequential_prefix_sum(spark, rows, parts):
    data = [(i, k, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, ["rid", "k", "v"]).repartition(parts)
    got = {
        r["rid"]: r["cs"]
        for r in global_cumsum(
            df, ["k", "rid"], "v", cumsum_col="cs"
        ).collect()
    }
    acc, want = 0, {}
    for rid, _, v in sorted(data, key=lambda t: (t[1], t[0])):
        acc += v
        want[rid] = acc
    assert got == want


@settings(max_examples=10, deadline=None)
@given(rows=ROWS, k=st.integers(1, 9), parts=st.integers(1, 5))
def test_ntile_by_matches_sql_semantics(spark, rows, k, parts):
    data = [(i, kk, v) for i, (kk, v) in enumerate(rows)]
    df = spark.createDataFrame(data, ["rid", "k", "v"]).repartition(parts)
    got = {
        r["rid"]: r["tile"]
        for r in ntile_by(df, ["k", "rid"], k).collect()
    }
    n = len(data)
    q, r = divmod(n, k)
    order = [rid for rid, _, _ in sorted(data, key=lambda t: (t[1], t[0]))]
    want = {}
    for i, rid in enumerate(order):
        if q == 0:
            want[rid] = i + 1
        elif i < r * (q + 1):
            want[rid] = i // (q + 1) + 1
        else:
            want[rid] = r + (i - r * (q + 1)) // q + 1
    assert got == want
