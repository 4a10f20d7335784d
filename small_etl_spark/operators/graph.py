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
