"""Property tests: first-wins dedup and top-k against Python
references over randomized inputs (ordering/tie semantics are where
hand-rolled reductions quietly diverge)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from small_etl_spark.operators.dedup import dedup_by_fields_first_wins
from small_etl_spark.operators.sort import top_k

rows_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # key
        st.integers(min_value=0, max_value=9),   # order value
        st.integers(min_value=0, max_value=99),  # unique-ish payload
    ),
    min_size=1,
    max_size=15,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_st)
def test_first_wins_matches_reference(spark, rows):
    # make (ord, payload) unique per key so "first" is well-defined
    rows = list({(k, o, p) for k, o, p in rows})
    df = spark.createDataFrame(rows, "k long, ord long, payload long")
    got = {
        r.k: (r.ord, r.payload)
        for r in dedup_by_fields_first_wins(
            df, ["k"], order_col=["ord", "payload"]
        ).collect()
    }
    want = {}
    for k, o, p in sorted(rows, key=lambda r: (r[1], r[2])):
        want.setdefault(k, (o, p))
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_st, k=st.integers(min_value=1, max_value=6))
def test_top_k_matches_reference(spark, rows, k):
    rows = list({(a, b, c) for a, b, c in rows})
    df = spark.createDataFrame(rows, "a long, val long, tb long")
    got = [
        (r.a, r.val, r.tb)
        for r in top_k(df, "val", k, order="desc", tiebreak=["a", "tb"]).collect()
    ]
    want = sorted(rows, key=lambda r: (-r[1], r[0], r[2]))[:k]
    assert got == want
