"""Property test: connected_components against a union-find reference
on random pair sets (the oracle gate checks one dataset; this checks
arbitrary topologies — chains, stars, merges of merges)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from small_etl_spark.llm.dedup import connected_components

pairs_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ).filter(lambda p: p[0] < p[1]),
    max_size=12,
)


def _union_find(nodes, pairs):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=pairs_st)
def test_cc_matches_union_find(spark, pairs):
    nodes = list(range(10))
    ndf = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    pdf = spark.createDataFrame(
        pairs or [(0, 0)], "id_a long, id_b long"
    )
    if not pairs:
        pdf = pdf.filter("id_a <> id_a")  # empty edge set, keep schema
    got = {
        r.doc_id: r.component
        for r in connected_components(ndf, pdf).collect()
    }
    assert got == _union_find(nodes, pairs)
