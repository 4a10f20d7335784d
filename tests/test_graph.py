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
