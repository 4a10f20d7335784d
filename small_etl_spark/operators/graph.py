"""Graph analytics: PageRank power iteration.

Complements the connected-components canonicalizer
(llm/dedup.py::near_dup_components) with the other classic
distributed-graph workhorse — node importance over an edge list. No
reference equivalent (north-star op); the Spark-idiomatic shape is
N join+agg rounds with periodic lineage cuts, exactly the pattern
GraphX/GraphFrames execute under the hood.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Unnormalized PageRank (the r = (1-d) + d·Σ r_i/deg_i fixpoint)
    over an edge list. Returns ``(node, rank)``.

    Per iteration: one equi-join (ranks onto the degree-annotated
    edges, both sides hash-partitioned on the source node — the
    exchange is reused across iterations since the key never
    changes) + one sum-by-destination shuffle. ``localCheckpoint``
    every ``checkpoint_every`` rounds cuts the lineage so the plan
    doesn't grow unboundedly — same discipline as the
    connected-components loop. Dangling nodes (no out-edges)
    contribute nothing, the standard simplified formulation.

    At 100 TB: edge skew (celebrity nodes) is the hazard — AQE skew
    join handles the contribution join; the by-destination agg is
    map-side combined so hot destinations reduce early.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    deg = edges.groupBy(F.col(src).alias("__dn__")).agg(
        F.count(F.lit(1)).alias("__deg__")
    )
    ann = (
        edges.select(F.col(src).alias("__s__"), F.col(dst).alias("__d__"))
        .join(deg, F.col("__s__") == F.col("__dn__"))
        .select("__s__", "__d__", "__deg__")
        .localCheckpoint()
    )
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for i in range(iters):
        contribs = (
            ann.join(ranks, F.col("__s__") == F.col("node"))
            .select(
                F.col("__d__").alias("node"),
                (F.col("rank") / F.col("__deg__")).alias("__c__"),
            )
            .groupBy("node")
            .agg(F.sum("__c__").alias("__in__"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce(F.col("__in__"), F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    return ranks


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an undirected edge list (edges
    canonical ``src < dst``, distinct). Returns ``(node,
    n_triangles)`` for every node in at least one triangle.

    Degree-ordered enumeration (the standard distributed-triangle
    trick): every edge is oriented from its lower endpoint to its
    higher endpoint under the total order (degree, node), wedges are
    enumerated at the LOW-degree apex only, and a final equi-join
    closes them. Orienting by degree bounds every out-neighborhood by
    O(√m), so wedge count is O(m^1.5) instead of Σ deg² — the
    difference between "survives a celebrity node" and "does not".
    Each triangle x<y<z (by the order) is produced exactly once, as
    the wedge (y,z) at apex x closed by the oriented edge y→z.

    Shuffles: degree agg, two joins (apex self-join + closing-edge
    join, both plain equi-joins AQE can re-plan), final count agg.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ann = (
        e.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
    )
    low_u = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ann.select(
        F.when(low_u, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(low_u, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(low_u, F.col("dv")).otherwise(F.col("du")).alias("db"),
    ).localCheckpoint()
    x = oriented.select("a", F.col("b").alias("b1"), F.col("db").alias("db1"))
    y = oriented.select(
        F.col("a").alias("a2"), F.col("b").alias("b2"), F.col("db").alias("db2")
    )
    wedges = x.join(
        y,
        (F.col("a") == F.col("a2"))
        & (
            (F.col("db1") < F.col("db2"))
            | ((F.col("db1") == F.col("db2")) & (F.col("b1") < F.col("b2")))
        ),
    )
    closing = oriented.select(F.col("a").alias("b1"), F.col("b").alias("b2"))
    tri = wedges.join(closing, ["b1", "b2"])
    return (
        tri.select(F.explode(F.array("a", "b1", "b2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def adamic_adar(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Adamic–Adar link prediction over an undirected edge list
    (canonical ``src < dst`` rows): for every NON-adjacent node pair
    (x, y) with at least one common neighbor, score
    Σ_z 1/ln(deg(z)) over common neighbors z — frequent shared
    neighbors count for little, rare hubs for a lot. The classic
    "who should be connected next" recommender primitive.

    Returns ``(node_a, node_b, score)`` with node_a < node_b.

    Scale shape: symmetrize → wedge enumeration via one equi-join on
    the shared endpoint (cost Σ deg(z)², the same bound as triangle
    counting — real co-occurrence graphs keep deg(z) small after the
    frequency cut), degree table joined once, existing edges removed
    with a LeftAnti. Never all-pairs.
    """
    sym = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
    deg = sym.groupBy(F.col("a").alias("z")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    e1 = sym.select(F.col("a").alias("x"), F.col("b").alias("z"))
    e2 = sym.select(F.col("a").alias("y"), F.col("b").alias("z2"))
    wedges = e1.join(
        e2, (F.col("z") == F.col("z2")) & (F.col("x") < F.col("y"))
    ).select("x", "y", "z")
    # ln(deg)=0 for degree-1 hubs is undefined weight — excluded by
    # construction (a common neighbor has degree >= 2 already, but be
    # explicit for subgraphs)
    scored = (
        wedges.join(deg.filter(F.col("deg") >= 2), "z")
        .groupBy("x", "y")
        .agg(F.sum(F.lit(1.0) / F.log(F.col("deg"))).alias("score"))
    )
    existing = edges.select(
        F.col(src_col).alias("x"), F.col(dst_col).alias("y")
    )
    return (
        scored.join(existing, ["x", "y"], "left_anti")
        .select(
            F.col("x").alias("node_a"),
            F.col("y").alias("node_b"),
            F.round("score", 6).alias("score"),
        )
    )


def cc_two_phase_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 12,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond"): converges in O(log²) ROUNDS regardless of component
    diameter — the scale answer where plain min-label propagation
    (llm/dedup.py::connected_components) needs diameter-many rounds
    and dies on chain-shaped graphs (linked dup chains, reply
    threads). Returns ``(node, component)`` with component = the
    minimum node id, singletons excluded (nodes appear only if they
    touch an edge; union the isolated nodes back at the call site).

    Each round is two groupBy-min + explode passes over the edge
    list — pure DataFrame ops, lineage cut per round. Convergence =
    the edge multiset is a fixed point (every edge already points at
    its component minimum), detected with a subtract-count.

    - large-star: every neighbor LARGER than u re-attaches to u's
      neighborhood minimum (including u);
    - small-star: every neighbor ≤ u re-attaches to the minimum as
      well; alternating the two collapses every component into a
      star around its global minimum.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    def large_star(ed: DataFrame) -> DataFrame:
        nbrs = ed.unionByName(
            ed.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = nbrs.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        big = nbrs.filter(F.col("v") > F.col("u"))
        return (
            big.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(ed: DataFrame) -> DataFrame:
        # orient every edge large→small, group by the large end
        directed = ed.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = directed.groupBy("u").agg(F.min("v").alias("m"))
        relinked = (
            directed.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        return relinked

    converged = False
    for _ in range(max_rounds):
        nxt = small_star(large_star(e)).localCheckpoint()
        # one job, not two: either direction of the symmetric
        # difference being non-empty means not converged
        if (
            nxt.exceptAll(e)
            .unionByName(e.exceptAll(nxt))
            .limit(1)
            .count()
            == 0
        ):
            e = nxt
            converged = True
            break
        e = nxt
    if not converged:
        # Returning the non-fixed-point edge set would silently split
        # components (callers like golden_record_customers would emit
        # wrong clusters with no signal) — fail loudly instead. The
        # algorithm converges in O(log^2 n) rounds, so hitting this on
        # a real graph means max_rounds is set far too low.
        raise RuntimeError(
            f"cc_two_phase_star did not reach the large-star/small-star "
            f"fixed point within max_rounds={max_rounds}; component labels "
            "would be incorrect. Raise max_rounds (O(log^2 n) rounds "
            "suffice for n nodes)."
        )

    # fixed point: every edge is (node, component_min)
    labels = e.select(
        F.greatest("u", "v").alias("node"), F.least("u", "v").alias("component")
    )
    mins = labels.groupBy("node").agg(F.min("component").alias("component"))
    roots = mins.select(F.col("component").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    return mins.unionByName(roots).distinct()
