"""PageRank: known-graph values, convergence, determinism."""

from __future__ import annotations

import pytest

from small_etl_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_cycle_graph_uniform(spark):
    # A→B→C→A: perfect symmetry → every rank must be exactly the
    # fixpoint 1.0 (r = 0.15 + 0.85 * r/1)
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    ranks = {r["node"]: r["rank"] for r in pagerank(e, iters=30).collect()}
    for v in ranks.values():
        assert v == pytest.approx(1.0, abs=1e-9)


def test_known_graph_matches_power_iteration(spark):
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")]
    e = _edges(spark, pairs)
    got = {r["node"]: r["rank"] for r in pagerank(e, iters=40).collect()}

    # reference power iteration (same simplified formulation)
    nodes = ["a", "b", "c"]
    out = {"a": ["b", "c"], "b": ["c"], "c": ["a"]}
    rank = {n: 1.0 for n in nodes}
    for _ in range(40):
        incoming = {n: 0.0 for n in nodes}
        for s, ds in out.items():
            for d in ds:
                incoming[d] += rank[s] / len(ds)
        rank = {n: 0.15 + 0.85 * incoming[n] for n in nodes}
    for n in nodes:
        assert got[n] == pytest.approx(rank[n], rel=1e-6)
    # c receives from both a and b → most central
    assert got["c"] > got["a"] > got["b"]


def test_star_center_dominates(spark):
    e = _edges(spark, [(f"leaf{i}", "hub") for i in range(5)])
    ranks = {r["node"]: r["rank"] for r in pagerank(e, iters=10).collect()}
    assert ranks["hub"] > 4 * ranks["leaf0"]
    # dangling hub contributes nothing; leaves sit at the floor
    assert ranks["leaf0"] == pytest.approx(0.15, abs=1e-9)


def test_triangle_counts_k4(spark):
    from small_etl_spark.operators.graph import triangle_counts

    # K4: every one of the 4 triangles contains 3 of the 4 nodes →
    # each node sits in exactly C(3,2)=3 triangles.
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)],
        "src long, dst long",
    )
    out = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_wedge_only_graph(spark):
    from small_etl_spark.operators.graph import triangle_counts

    # path 1-2-3-4 has wedges but no triangle; plus one triangle 5-6-7
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6), (5, 7), (6, 7)],
        "src long, dst long",
    )
    out = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert out == {5: 1, 6: 1, 7: 1}


def test_association_rules_hand_computed(spark):
    from small_etl_spark.operators.market import association_rules

    # baskets: {A,B} ×3, {A,C}, {B,C}, {A} — N=6
    rows = [
        (1, "A"), (1, "B"),
        (2, "A"), (2, "B"),
        (3, "A"), (3, "B"),
        (4, "A"), (4, "C"),
        (5, "B"), (5, "C"),
        (6, "A"),
    ]
    baskets = spark.createDataFrame(rows, "basket_id long, item_id string")
    out = association_rules(
        baskets, basket_col="basket_id", item_col="item_id", min_pair_count=2
    ).collect()
    assert len(out) == 1  # only (A,B) hits min_pair_count=2
    r = out[0]
    assert (r["item_a"], r["item_b"]) == ("A", "B")
    assert (r["n_ab"], r["n_a"], r["n_b"]) == (3, 5, 4)
    assert r["conf_a_to_b"] == 0.6           # 3/5
    assert r["conf_b_to_a"] == 0.75          # 3/4
    assert r["lift"] == 0.9                  # 3*6/(5*4)


def _uf_components(n_nodes, edge_list):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_nodes)}


def test_cc_two_phase_star_matches_union_find(spark):
    import random

    from small_etl_spark.operators.graph import cc_two_phase_star

    rng = random.Random(5)
    n = 200
    edge_list = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    edge_list = [(a, b) for a, b in edge_list if a != b]
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    got = {
        r["node"]: r["component"]
        for r in cc_two_phase_star(edges).collect()
    }
    want = _uf_components(n, edge_list)
    touched = {x for e in edge_list for x in e}
    assert got == {v: want[v] for v in touched}


def test_cc_two_phase_star_long_chain_converges_fast(spark):
    """A 200-node path has diameter 199 — min-label propagation needs
    ~200 rounds; the star algorithm must finish within its 12-round
    budget and label every node with node 0."""
    from small_etl_spark.operators.graph import cc_two_phase_star

    chain = [(i, i + 1) for i in range(199)]
    edges = spark.createDataFrame(chain, ["src", "dst"])
    got = {
        r["node"]: r["component"]
        for r in cc_two_phase_star(edges).collect()
    }
    assert got == {i: 0 for i in range(200)}
