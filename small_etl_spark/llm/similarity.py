"""Similarity search over embedding columns (``array<float>``).

All vector math is JVM-side column expressions — ``zip_with`` +
``aggregate`` for dot products, no Python in the hot path. Three tiers:

1. ``brute_force_topk`` — exact top-k by cosine; the correctness
   baseline. Scan-bound: corpus × |queries| pairs, queries broadcast,
   one shuffle on query_id for the final top-k.
2. ``hyperplane_bucket`` — random-hyperplane LSH signature (the
   high-similarity near-dup regime; used by
   ``llm.dedup.embedding_near_dup_pairs``).
3. IVF (``ivf_assign`` + ``ivf_topk``) — the 100 TB path: partition
   the corpus into C centroid cells (one broadcast join + map-side
   argmax, no iterative training), probe the ``nprobe`` nearest cells
   per query. Search cost drops to ~nprobe/C of the corpus; persist
   the assigned corpus partitioned-by-cell so the probe join prunes
   file partitions instead of shuffling.

Hyperplanes / centroid choice are seeded and deterministic (plane
weights are Python-literal doubles ⇒ reproducible in the DuckDB
oracle; no RNG state shipped to executors).

No reference equivalent (kenstt/small-etl has no vector ops); these
are BASELINE.json north-star extensions.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<double> columns (left-fold, JVM-side)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column | str) -> Column:
    return F.sqrt(dot(v, v))


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def random_planes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic gaussian hyperplanes as plain Python literals.

    Literals (not executor-side RNG) keep the plan reproducible and let
    the DuckDB oracle embed the identical weights.
    """
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)]


def hyperplane_bucket(
    v: Column | str, num_planes: int = 16, seed: int = 42, dim: int = 64
) -> Column:
    """LSH bucket id: bit p = sign(v · plane_p), folded into a BIGINT.

    P(two vectors share all ``num_planes`` bits) = (1 - θ/π)^planes —
    tune ``num_planes`` down for lower-similarity regimes.
    """
    planes = random_planes(dim, num_planes, seed)
    bucket = F.lit(0).cast("bigint")
    for p, plane in enumerate(planes):
        d = dot(v, F.lit(plane).cast("array<double>"))
        bucket = bucket + F.when(
            d >= 0, F.shiftleft(F.lit(1).cast("bigint"), p)
        ).otherwise(F.lit(0).cast("bigint"))
    return bucket


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors. Returns ``query_id, vec_id, cosine, rank``.

    Physical shape: broadcast nested-loop join (queries are broadcast —
    they must be small), cosine evaluated in whole-stage codegen over
    the corpus scan, then one hash-shuffle on query_id for the
    row_number top-k. Ties break by vec_id for determinism.

    The corpus side goes through ``ensure_parallelism`` first: a
    single-split parquet corpus would otherwise score |corpus|×|q|
    pairs on ONE core (measured 3.4× the whole-query time at sf0.1).

    Round 12: the two L2 norms are hoisted out of the pair loop into
    per-row columns computed BEFORE the cross join (query norms once
    per query pre-broadcast, corpus norms once per corpus row), so the
    |corpus|×|q| stage evaluates ONE interpreted ``aggregate`` fold
    (the dot product) per pair instead of five — the norm folds were
    re-evaluated per pair because lambda HOFs get no codegen and no
    cross-row CSE. Bit-identical to ``cosine_sim``: the same
    SQRT(aggregate(...)) doubles flow into the same ``dot/(na*nb)``
    division, just computed in an earlier Project.
    """
    from small_etl_spark.llm.util import ensure_parallelism

    # selectExpr text builds (round 12): the HOF dot/norm Column
    # chains cost ~500 py4j round trips per build; the text parses to
    # the token-identical trees (same lambda shapes, 0.0D double
    # literals) in one call per select — optimizedPlan().sameResult
    # vs the Column form pinned in tests/test_llm_similarity.py.
    def _dot(a: str, b: str) -> str:
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D,"
            " (acc, x) -> acc + x)"
        )

    def _l2(v: str) -> str:
        return f"sqrt({_dot(v, v)})"

    q = F.broadcast(
        queries.selectExpr(
            f"{id_col} as {query_id_col}",
            f"cast({vec_col} as array<double>) as __qv__",
        ).selectExpr("*", f"{_l2('__qv__')} as __qn__")
    )
    c = (
        ensure_parallelism(corpus)
        .selectExpr(
            f"{id_col}",
            f"cast({vec_col} as array<double>) as __cv__",
        )
        .selectExpr("*", f"{_l2('__cv__')} as __cn__")
    )
    pairs = c.crossJoin(q)
    if exclude_self:
        pairs = pairs.filter(f"{query_id_col} != {id_col}")
    cos = (
        "CASE WHEN ((__qn__ > 0) AND (__cn__ > 0))"
        f" THEN ({_dot('__qv__', '__cv__')} / (__qn__ * __cn__))"
        " ELSE 0.0D END"
    )
    scored = pairs.selectExpr(query_id_col, id_col, f"{cos} as cosine")
    return scored.selectExpr(
        "*",
        "cast(row_number() OVER (PARTITION BY"
        f" {query_id_col} ORDER BY cosine DESC, {id_col} ASC)"
        " as bigint) as rank",
    ).filter(f"rank <= {k}")


def _assign_cells_vectorized(
    corpus: DataFrame,
    cents: DataFrame,
    id_col: str,
    vec_col: str,
    metric: str = "cosine",
) -> DataFrame:
    """Nearest-centroid assignment as an Arrow ``mapInPandas`` kernel:
    the centroid table (small by contract — ≤ ~1k cells) is collected
    and closed over; each Arrow batch becomes one BLAS matmul + argmax.

    This replaces a crossJoin(broadcast) + per-pair ``cosine_sim``
    fold + ``max_by`` reduction — the same "dense float math belongs
    in vectorized kernels" crossover as ``brute_force_topk_vectorized``
    (the expression path evaluated |corpus|×C interpreted zip_with
    folds). Map-only: no shuffle, scales like a scan. Ties mirror the
    expression path's ``max_by(struct(sim, cell))``: larger cell id.
    """
    import numpy as np
    import pandas as pd

    rows = sorted(cents.select("cell", "__cent__").collect(), key=lambda r: r[0])
    if not rows:  # empty corpus → no centroids; (0,) arrays break axis=1 math
        return corpus.sparkSession.createDataFrame(
            [], f"{id_col} bigint, cell bigint, {vec_col} array<double>"
        )
    cell_ids = np.array([r[0] for r in rows], dtype=np.int64)
    m = np.array([list(r[1]) for r in rows], dtype=np.float64)
    mn = np.linalg.norm(m, axis=1)
    mn[mn == 0] = 1.0
    mhat = (m / mn[:, None]).T  # dim × C

    m_raw = np.array([list(r[1]) for r in rows], dtype=np.float64)
    m_sq = (m_raw * m_raw).sum(axis=1)

    def assign(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            if metric == "l2":
                # argmin ||x - m||² = argmax (2 x·m - ||m||²); same
                # reversed-argmax tie convention (larger cell id)
                sims = 2.0 * (x @ m_raw.T) - m_sq[None, :]
            else:
                xn = np.linalg.norm(x, axis=1)
                xn[xn == 0] = 1.0
                sims = (x / xn[:, None]) @ mhat
            # tie → larger cell id (cells are column-sorted ascending,
            # so argmax over the reversed columns picks the last max)
            idx = sims.shape[1] - 1 - sims[:, ::-1].argmax(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cell": cell_ids[idx],
                    vec_col: pdf[vec_col],
                }
            )

    src = corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    return src.mapInPandas(
        assign,
        schema=f"{id_col} bigint, cell bigint, {vec_col} array<double>",
    )


def ivf_assign(
    corpus: DataFrame,
    num_centroids: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    metric: str = "cosine",
) -> tuple[DataFrame, DataFrame]:
    """IVF index build: pick C corpus rows as centroids (deterministic
    hash-sample), assign every corpus vector to its nearest centroid.

    Returns ``(assigned, centroids)``: ``assigned`` = corpus +
    ``cell`` column; ``centroids`` = (cell, centroid vector).

    Seeds are the ``num_centroids`` rows with the SMALLEST
    ``md5(id || ':' || seed)`` — a hash-uniform sample under a total
    order, so seed choice is engine-portable (the DuckDB oracles
    replay it verbatim) and independent of partition layout. The
    previous xxhash64-filter + order-free ``limit`` was only
    deterministic under a fixed partitioning — a repartitioned rerun
    could pick different seeds. Bottom-k by hash is a
    TakeOrderedAndProject (no full sort) at any corpus size.

    Assignment is the vectorized Arrow kernel
    (``_assign_cells_vectorized``) — a single map pass at any scale,
    no iterative k-means (good-enough cells for pruning; swap in
    trained centroids without changing the query path). At 100 TB:
    write ``assigned`` partitioned by ``cell`` so probes read only
    nprobe/C of the files.
    """
    from small_etl_spark.llm.util import ensure_parallelism

    corpus = corpus.filter(F.col(vec_col).isNotNull())  # nulls can't seed or score
    corpus = ensure_parallelism(corpus)
    cents = (
        corpus.select(
            F.col(id_col).alias("cell"),
            F.col(vec_col).cast("array<double>").alias("__cent__"),
            F.md5(
                F.concat_ws(":", F.col(id_col).cast("string"), F.lit(seed))
            ).alias("__seedkey__"),
        )
        .orderBy("__seedkey__")
        .limit(num_centroids)
        .drop("__seedkey__")
    )
    return (
        _assign_cells_vectorized(corpus, cents, id_col, vec_col, metric),
        cents,
    )


def ivf_topk(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF-Flat ANN: probe the ``nprobe`` nearest cells per query, exact
    cosine within probed cells. Returns ``query_id, vec_id, cosine,
    rank`` (rank ≤ k; recall < 1.0 by construction — measure vs
    ``brute_force_topk``).

    Scale shape: queries×C probe ranking is broadcast-local; the probe
    join shuffles only on ``cell`` (or partition-prunes if ``assigned``
    is stored partitioned by cell); per-cell scan is ~nprobe/C of the
    corpus.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv__"),
    )
    probe_w = Window.partitionBy(query_id_col).orderBy(
        F.col("__psim__").desc(), F.col("cell").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("__psim__", cosine_sim("__qv__", "__cent__"))
        .withColumn("__pr__", F.row_number().over(probe_w))
        .filter(F.col("__pr__") <= nprobe)
        .select(query_id_col, "__qv__", "cell")
    )
    cand = assigned.withColumnRenamed(vec_col, "__cv__").join(
        F.broadcast(probes), "cell"
    )
    if exclude_self:
        cand = cand.filter(F.col(query_id_col) != F.col(id_col))
    scored = cand.select(
        query_id_col, id_col, cosine_sim("__qv__", "__cv__").alias("cosine")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def ivf_refine(
    assigned: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> tuple[DataFrame, DataFrame]:
    """One Lloyd iteration: recompute each cell's centroid as the
    element-wise mean of its members, then re-assign.

    Pure DataFrame ops: posexplode to (cell, pos, component) rows →
    per-(cell, pos) mean (map-side combined) → re-fold into arrays →
    broadcast re-assignment. (A per-dimension scalar-SUM variant was
    measured and is NOT faster here — the iteration cost is dominated
    by the broadcast re-assign's cosine folds, not the means shuffle,
    and map-side combine already crushes the explode volume.) Each
    extra iteration repeats this; one is usually enough to fix the
    worst hash-sampled centroids. Returns ``(assigned, centroids)``
    like ``ivf_assign``.
    """
    comp = assigned.select(
        "cell", F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x")
    )
    means = comp.groupBy("cell", "pos").agg(F.avg("x").alias("m"))
    cents = (
        means.groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            "cell",
            F.transform(F.col("pm"), lambda s: s["m"]).alias("__cent__"),
        )
    )
    corpus = assigned.drop("cell")
    return (
        _assign_cells_vectorized(corpus, cents, id_col, vec_col, metric),
        cents,
    )


def brute_force_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched matrix multiply.

    The expression-tree ``brute_force_topk`` evaluates |corpus|×|q|
    zip_with folds element-by-element; here each Arrow batch becomes a
    numpy (batch × dim) matrix and one BLAS matmul scores all queries
    at once. Each partition emits only its LOCAL top-k per query
    (argpartition), so the final shuffle carries partitions × |q| × k
    rows, not the full score matrix. Results are identical to
    ``brute_force_topk`` (same doubles, same tiebreak).

    WHICH TWIN WINS (measured, r10 — supersedes the r1 "4×" note):
    since ``ensure_parallelism`` fixed the expression path's
    single-core corpus scan, the codegen'd zip_with is FASTER at
    small shapes — 0.37 s vs 0.58 s at sf0.1's 5k-corpus × 8-query
    bench — because each Arrow batch pays JVM→Python transfer +
    per-batch numpy setup that a few thousand pairs never amortize.
    This path wins when |q| × batch_rows × dim is large enough for
    one BLAS matmul to beat |q| codegen'd fold passes over the same
    batch — in practice hundreds+ of queries or 10⁶+ corpus rows per
    partition. Pick: expression path for interactive few-query
    lookups; this for bulk scoring sweeps; IVF/IVF-PQ for large query
    sets over large corpora (the bucketed path that avoids the full
    cross product entirely).
    """
    import numpy as np
    import pandas as pd

    # null vectors are unscorable: drop them on BOTH sides (the
    # expression path yields NULL cosine for them, which a top-k
    # excludes the same way), instead of letting None reach np.array
    corpus = corpus.filter(F.col(vec_col).isNotNull())
    queries = queries.filter(F.col(vec_col).isNotNull())

    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:  # no queries → no pairs; (0,) arrays break axis=1 math
        return corpus.sparkSession.createDataFrame(
            [],
            f"{query_id_col} bigint, {id_col} bigint, cosine double, rank bigint",
        )
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qm = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(qm, axis=1)
    q_norm[q_norm == 0] = 1.0

    def score(batches):
        for pdf in batches:
            if pdf.empty:  # empty Arrow batch → (0,) array breaks matmul
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            m = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            sims = (m / norms[:, None]) @ (qm / q_norm[:, None]).T  # n×q
            out_q, out_id, out_cos = [], [], []
            for j, qid in enumerate(q_ids):
                col = sims[:, j]
                mask = ids != qid if exclude_self else np.ones_like(ids, bool)
                idx = np.nonzero(mask)[0]
                if not len(idx):
                    continue
                top = idx[np.argsort(-col[idx], kind="stable")[:k]]
                out_q.extend([qid] * len(top))
                out_id.extend(ids[top])
                out_cos.extend(col[top])
            yield pd.DataFrame(
                {query_id_col: out_q, id_col: out_id, "cosine": out_cos}
            )

    from small_etl_spark.llm.util import (
        PY_KERNEL_BYTES_PER_TASK,
        ensure_parallelism,
    )

    # Python-kernel width (round 12): size the repartition by input
    # bytes, not core count — each mapInPandas task pays a fixed
    # JVM↔Python boundary cost that a ~60-row batch never amortizes
    # (measured −20% at sf0.1 going 32→4 tasks; the rule still yields
    # full cluster width for any input over cores × 4 MB).
    local = ensure_parallelism(
        corpus, bytes_per_task=PY_KERNEL_BYTES_PER_TASK
    ).select(id_col, vec_col).mapInPandas(
        score, schema=f"{query_id_col} bigint, {id_col} bigint, cosine double"
    )
    # expr-text window (round 12, same trees as the Column build)
    return local.selectExpr(
        "*",
        "cast(row_number() OVER (PARTITION BY"
        f" {query_id_col} ORDER BY cosine DESC, {id_col} ASC)"
        " as bigint) as rank",
    ).filter(f"rank <= {k}")


def ivf_train(
    corpus: DataFrame,
    num_centroids: int = 32,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    metric: str = "cosine",
    reseed_empty: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """IVF index with ``iters`` Lloyd refinements over the hash-sampled
    seed centroids. Each iteration is one shuffle (per-(cell,pos)
    means) + one broadcast re-assign; 1-2 iterations capture most of
    the recall gain. Returns ``(assigned, centroids)``.

    ``reseed_empty`` re-seeds STARVED cells after each round (the
    FAISS empty-cluster policy, re-derived): on tightly clustered
    corpora a hash-sampled seed near a blob center captures the whole
    blob and the other seeds go empty — measured on the shipped
    sf0.1 embeddings, 16 seeds collapse to 2 live cells, capping ANN
    cell recall at the blob granularity however large nprobe gets.
    Each deficit round promotes the rows FARTHEST from their assigned
    centroid (deterministic ties by id) to fresh centroids and
    re-assigns — splitting the fattest blobs exactly where the
    quantization error lives. Costs one bounded driver collect
    (≤ num_centroids rows) + one broadcast re-assign per deficit
    round.

    Each round's ``assigned`` is localCheckpoint'ed first:
    ``ivf_refine`` consumes it twice (centroid means + re-assign), so
    an uncut lineage would re-execute the whole upstream chain on both
    branches — 2^iters recompute by the last round."""
    assigned, cents = ivf_assign(
        corpus, num_centroids, id_col, vec_col, seed, metric
    )
    for _ in range(iters):
        assigned, cents = ivf_refine(
            assigned.localCheckpoint(), id_col, vec_col, metric
        )
        if reseed_empty:
            assigned, cents = _reseed_starved_cells(
                assigned, cents, num_centroids, id_col, vec_col, metric
            )
    return assigned, cents


def _reseed_starved_cells(
    assigned: DataFrame,
    cents: DataFrame,
    num_centroids: int,
    id_col: str,
    vec_col: str,
    metric: str,
) -> tuple[DataFrame, DataFrame]:
    """Top up a centroid set that lost cells to Lloyd starvation:
    promote the ``deficit`` corpus rows farthest from their assigned
    centroid to new cells (ids = the promoted rows' ids — unique, and
    excluded from collision with live cell ids), then re-assign."""
    live = {r.cell for r in cents.select("cell").collect()}
    deficit = num_centroids - len(live)
    if deficit <= 0:
        return assigned, cents
    v = F.col(vec_col).cast("array<double>")
    if metric == "l2":
        dist = _sq_l2(v, F.col("__cent__"))
    else:  # cosine distance: order-equivalent penalty, same argmin
        dist = -cosine_sim(v, F.col("__cent__"))
    far = (
        assigned.join(F.broadcast(cents), "cell")
        .filter(~F.col(id_col).isin(list(live)))
        .withColumn("__d__", dist)
        .orderBy(F.col("__d__").desc(), F.col(id_col).asc())
        .select(F.col(id_col).alias("cell"), v.alias("__cent__"))
        .limit(deficit)
    )
    new_cents = cents.select("cell", "__cent__").unionByName(far)
    # re-materialize: the next round's means see the new cells
    new_cents = assigned.sparkSession.createDataFrame(
        new_cents.collect(), "cell bigint, __cent__ array<double>"
    )
    corpus = assigned.drop("cell")
    return (
        _assign_cells_vectorized(corpus, new_cents, id_col, vec_col, metric),
        new_cents,
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 scalar quantization of an embedding column.

    The storage/IO lever for vector corpora: 4× smaller than float32
    (``q_embedding`` int8 range + one double ``q_scale`` per vector),
    which at 100 TB is the difference between an index that fits in
    cluster page cache and one that doesn't. Pure array expressions:
    scale = max|x|/127, q_i = round(x_i/ (scale)). Dequantized cosine
    stays within ~1% for typical embedding distributions (pinned by
    test, and by the reconstruction-error query's oracle).

    All arithmetic is forced to double before dividing so the same
    expression computes bit-identical values in the DuckDB oracle.
    """
    v = _c(vec_col)
    amax = F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))),
        F.lit(1e-12),
    )
    q = F.transform(
        v, lambda x: F.round(x.cast("double") / amax * 127).cast("int")
    )
    return df.withColumns(
        {"q_embedding": q, "q_scale": (amax / F.lit(127.0)).cast("double")}
    )


def dequantize(q_col: Column | str, scale_col: Column | str) -> Column:
    """int8 quantized vector + scale → array<double>."""
    s = _c(scale_col)
    return F.transform(_c(q_col), lambda x: x.cast("double") * s)


def kmeans_clusters(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Deterministic k-means document clustering over an embedding
    column: Lloyd's algorithm via the IVF machinery (hash-picked
    seeds → ``iters`` refine rounds of per-(cell,position) means +
    broadcast re-assign), summarized as one row per cluster
    ``(cell, size, mean_norm)``.

    The corpus-organization pass of a training-data pipeline (topic
    balancing, per-cluster sampling caps). Per iteration: one shuffle
    (centroid means) + one broadcast map re-assign — no pairwise
    anything; cluster count and seeds are hash-deterministic, so
    reruns produce identical assignments (pinned by test).
    """
    assigned, _cents = ivf_train(
        corpus, num_centroids=k, iters=iters, id_col=id_col, vec_col=vec_col,
        seed=seed,
    )
    return assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("size"),
        F.round(F.avg(l2_norm(vec_col)), 6).alias("mean_norm"),
    )


def hard_negative_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the ``k`` most cosine-similar corpus vectors carrying a
    DIFFERENT label. Returns ``query_id, vec_id, neg_label, cosine,
    rank``.

    The standard pair-construction step when building
    embedding-training data (a "hard" negative is a wrong-label
    example the current embedding thinks is close). Physical shape is
    identical to :func:`brute_force_topk` — broadcast the (small)
    query side, score against the corpus scan in whole-stage codegen,
    one hash shuffle on ``query_id`` for the windowed top-k — with the
    label-mismatch predicate applied BEFORE scoring, so same-label
    pairs never reach the cosine fold. At 100 TB the corpus side
    stays a partitioned scan; for larger query sets swap the
    broadcast nested-loop for the IVF probe path (``ivf_topk``) with
    a post-probe label filter.
    """
    from small_etl_spark.llm.util import ensure_parallelism

    q = F.broadcast(
        queries.select(
            F.col(id_col).alias(query_id_col),
            F.col(label_col).alias("__qlabel__"),
            F.col(vec_col).cast("array<double>").alias("__qv__"),
        )
    )
    c = ensure_parallelism(corpus).select(
        F.col(id_col),
        F.col(label_col).alias("neg_label"),
        F.col(vec_col).cast("array<double>").alias("__cv__"),
    )
    pairs = c.crossJoin(q).filter(F.col("__qlabel__") != F.col("neg_label"))
    scored = pairs.select(
        query_id_col, id_col, "neg_label",
        cosine_sim("__qv__", "__cv__").alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    ).filter(F.col("rank") <= k)


def label_centroid_outliers(
    df: DataFrame,
    top_n: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label centroid distance — the mislabeled-example /
    embedding-outlier detector. Returns the ``top_n`` vectors whose
    Euclidean distance to their own label's centroid is largest, as
    ``(vec_id, label, dist)`` with ``dist`` rounded to 6dp (ordering
    is on the ROUNDED value + vec_id so the cut is reproducible
    across engines).

    Plan shape: one posexplode → per-(label, position) mean — a
    |labels|×dim-group aggregation with map-side partials — joined
    back to the exploded view (the centroid side is broadcast-sized
    by construction: labels × dim rows), then a per-vector sum of
    squared deltas. No crossJoin, no window over the full corpus; at
    100 TB every shuffle is keyed on (label,pos) or vec_id with
    bounded groups.
    """
    pos = df.select(
        F.col(id_col),
        F.col(label_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x"),
    )
    cents = F.broadcast(
        pos.groupBy(label_col, "pos").agg(F.avg("x").alias("__c__"))
    )
    delta = F.col("x") - F.col("__c__")
    dists = (
        pos.join(cents, [label_col, "pos"])
        .groupBy(id_col, label_col)
        .agg(F.round(F.sqrt(F.sum(delta * delta)), 6).alias("dist"))
    )
    return dists.orderBy(F.col("dist").desc(), F.col(id_col)).limit(top_n)


def embedding_moments(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Exact corpus moments for PCA: (row count, mean vector, Gram
    matrix Σ v·vᵀ) accumulated distributively.

    Each Arrow batch contributes one partial (n, Σv, Σ v·vᵀ) row — a
    d + d² payload independent of batch size — and the driver sums
    the partials. At 100 TB this is a single map-only corpus pass
    followed by a collect of O(partitions) rows of d(d+1) doubles
    (d=64 → 4 KB each): the classic "sufficient statistics shrink to
    the driver" pattern, NOT a data collect. Returns numpy
    ``(n, mean[d], cov[d,d])`` with the covariance already centered.
    """
    import numpy as np
    import pandas as pd

    def partials(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            yield pd.DataFrame(
                {
                    "n": [m.shape[0]],
                    "s": [m.sum(axis=0).tolist()],
                    "g": [(m.T @ m).ravel().tolist()],
                }
            )

    rows = (
        corpus.filter(F.col(vec_col).isNotNull())
        .select(vec_col)
        .mapInPandas(partials, schema="n bigint, s array<double>, g array<double>")
        .collect()
    )
    import numpy as np  # noqa: F811 - re-import for the empty-input path

    if not rows:
        raise ValueError("embedding_moments: empty corpus")
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    s = np.sum([np.array(r["s"]) for r in rows], axis=0)
    g = np.sum([np.array(r["g"]).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    return n, mean, cov


def pca_project(
    corpus: DataFrame,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-``k`` PCA projection of the embedding corpus — the
    dimensionality-reduction step before visualization, coarse
    clustering, or whitening.

    Two phases: (1) exact sufficient statistics via
    :func:`embedding_moments` (one distributed pass; only d×d numbers
    reach the driver); (2) eigendecomposition of the d×d covariance
    with numpy on the driver (d=64 — microseconds), then the top-k
    eigenvectors are embedded as LITERAL arrays in a column expression
    and every vector is projected JVM-side with ``zip_with``/
    ``aggregate`` folds — no Python in the per-row path, so phase 2
    is a map-only codegen'd pass at any corpus size.

    Eigenvector sign is fixed deterministically (largest-|coordinate|
    made positive, earliest index winning ties) so results are
    reproducible run-to-run. Returns ``(id_col, pc1..pck)``.
    """
    import numpy as np

    _, mean, cov = embedding_moments(corpus, id_col=id_col, vec_col=vec_col)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for j in order:
        e = vecs[:, j]
        pivot = int(np.argmax(np.abs(e)))
        if e[pivot] < 0:
            e = -e
        comps.append(e)

    def lit_arr(xs) -> Column:
        return F.array(*[F.lit(float(x)) for x in xs])

    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"), lit_arr(mean), lambda a, b: a - b
    )
    out = corpus.filter(F.col(vec_col).isNotNull()).select(
        id_col,
        centered.alias("__c__"),
    )
    projections = [
        F.aggregate(
            F.zip_with(F.col("__c__"), lit_arr(e), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(f"pc{i + 1}")
        for i, e in enumerate(comps)
    ]
    return out.select(id_col, *projections)


def whiten_embeddings(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 1e-9,
) -> DataFrame:
    """PCA-whitening (ZCA up to rotation): project every vector onto
    ALL eigenvectors of the corpus covariance and scale each
    coordinate by 1/√λ — the whitened corpus has identity covariance,
    and ‖whitened‖² is exactly the Mahalanobis distance², the
    principled multivariate-outlier score (per-dimension z-scores
    miss correlated directions).

    Same two-phase shape as :func:`pca_project` with k = d: one
    distributed sufficient-statistics pass, driver eigh, then a
    map-only JVM-side projection (d² multiply-adds per row — 4096 at
    d=64, well inside codegen). Returns ``(id_col, whitened
    array<double>, msq)`` where ``msq`` = Mahalanobis².
    """
    import numpy as np

    _, mean, cov = embedding_moments(corpus, id_col=id_col, vec_col=vec_col)
    vals, vecs = np.linalg.eigh(cov)
    d = len(mean)
    comps = []
    for j in range(d - 1, -1, -1):  # descending eigenvalue order
        e = vecs[:, j]
        pivot = int(np.argmax(np.abs(e)))
        if e[pivot] < 0:
            e = -e
        comps.append(e / np.sqrt(max(float(vals[j]), eps)))

    def lit_arr(xs) -> Column:
        return F.array(*[F.lit(float(x)) for x in xs])

    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"), lit_arr(mean), lambda a, b: a - b
    )
    base = corpus.filter(F.col(vec_col).isNotNull()).select(
        id_col, centered.alias("__c__")
    )
    coords = [
        F.aggregate(
            F.zip_with(F.col("__c__"), lit_arr(e), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for e in comps
    ]
    out = base.select(id_col, F.array(*coords).alias("whitened"))
    msq = F.aggregate(
        F.transform(F.col("whitened"), lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return out.withColumn("msq", msq)


# --------------------------------------------------------------------------
# Product quantization (IVF-PQ style ADC search)
# --------------------------------------------------------------------------


def pq_train(
    corpus: DataFrame,
    m: int = 4,
    num_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    metric: str = "cosine",
) -> DataFrame:
    """Train product-quantization codebooks: split the embedding into
    ``m`` contiguous subvectors and k-means each subspace
    independently (reusing the IVF Lloyd machinery per subspace).
    Returns ``(sub_idx, code, __cent__)`` with codes densified to
    0..k-1 — ``m × num_centroids`` rows total, broadcastable forever.

    PQ is the 100 TB ANN compression: a D-dim float32 vector becomes
    ``m`` byte codes (here m=4 → 4 bytes vs 4·D), and search never
    touches the original vectors again (see :func:`pq_topk`). Recall
    at equal memory beats scalar int8 because each subspace gets a
    data-fit codebook rather than a uniform grid.
    """
    from pyspark.sql import Window

    dim = corpus.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = []
    for j in range(m):
        sub = corpus.select(
            F.col(id_col),
            F.slice(F.col(vec_col), j * dsub + 1, dsub).alias(vec_col),
        )
        _assigned, cents = ivf_train(
            sub, num_centroids=num_centroids, iters=iters,
            id_col=id_col, vec_col=vec_col, seed=seed + j, metric=metric,
        )
        books.append(
            cents.select(F.lit(j).alias("sub_idx"), "cell", "__cent__")
        )
    book = books[0]
    for b in books[1:]:
        book = book.unionByName(b)
    dense = F.dense_rank().over(
        Window.partitionBy("sub_idx").orderBy("cell")
    ) - 1
    return book.withColumn("code", dense.cast("int")).drop("cell")


def _sq_l2(a, b):
    """Σ (a_i − b_i)² as a column expression over two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_err: bool = False,
) -> DataFrame:
    """Encode every vector as ``m`` codebook codes (long form:
    ``(id, sub_idx, code)``): per subspace, nearest-centroid via a
    broadcast join against the (m·k)-row codebook + ``min_by``
    argmin. One explode to subvectors, one broadcast join, one
    (id, sub_idx) aggregate — scales like term counting; the encoded
    corpus is what persists (bytes per vector), the floats can be
    archived cold.
    """
    dim = corpus.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    dsub = dim // m
    subs = corpus.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("sub_idx"),
                        F.slice(F.col(vec_col), j * dsub + 1, dsub).alias(
                            "sv"
                        ),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select(id_col, "s.sub_idx", "s.sv")
    scored = subs.join(F.broadcast(codebooks), "sub_idx").withColumn(
        "__d__", _sq_l2(F.col("sv").cast("array<double>"), F.col("__cent__"))
    )
    aggs = [F.min_by("code", F.struct("__d__", "code")).alias("code")]
    if with_err:
        # per-(id, sub) quantization error — the drift signal the
        # incremental index maintenance (ivfpq_append) records
        aggs.append(F.min("__d__").alias("__qe__"))
    return scored.groupBy(id_col, "sub_idx").agg(*aggs)


def pq_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over the PQ-encoded corpus:
    build each query's ``m × num_centroids`` distance table against
    the codebooks (tiny — broadcast), then score every corpus vector
    as the SUM of ``m`` table lookups on its codes and window out the
    top-k. The corpus side touches only integer codes — no float
    vectors move — which is the entire point at 100 TB: the scan is
    bytes-per-vector and the arithmetic is ``m`` adds.
    """
    from pyspark.sql import Window

    dim = queries.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    dsub = dim // m
    qsubs = queries.select(
        F.col(id_col).alias(query_id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("sub_idx"),
                        F.slice(F.col(vec_col), j * dsub + 1, dsub).alias(
                            "qv"
                        ),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select(query_id_col, "s.sub_idx", "s.qv")
    dtab = qsubs.join(F.broadcast(codebooks), "sub_idx").select(
        query_id_col,
        "sub_idx",
        "code",
        _sq_l2(F.col("qv").cast("array<double>"), F.col("__cent__")).alias(
            "__d__"
        ),
    )
    scored = (
        codes.join(F.broadcast(dtab), ["sub_idx", "code"])
        .groupBy(query_id_col, id_col)
        .agg(F.sum("__d__").alias("adist"), F.count(F.lit(1)).alias("__m__"))
        .filter(F.col("__m__") == m)
        .drop("__m__")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_save(assigned: DataFrame, centroids: DataFrame, path: str) -> None:
    """Persist an IVF index: the assigned corpus partitioned BY CELL
    plus the centroid table. This is the build-once/probe-many layout
    the `ivf_assign` docstring promises: at 100 TB the index is built
    in one pass and every later query batch reads only the probed
    cells' files (static partition pruning — see
    :func:`ivf_topk_persisted`), i.e. ~nprobe/C of the corpus bytes.

    ``partitionBy("cell")`` costs one shuffle-free write (each task
    appends to its cells' directories); C is small (32-1024), so the
    directory fan-out is bounded.
    """
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        path + "/assigned"
    )
    centroids.write.mode("overwrite").parquet(path + "/centroids")


def ivf_load(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Load a persisted IVF index; returns ``(assigned, centroids)``
    with ``cell`` restored to bigint (partition-column inference
    narrows it to int)."""
    assigned = spark.read.parquet(path + "/assigned").withColumn(
        "cell", F.col("cell").cast("bigint")
    )
    centroids = spark.read.parquet(path + "/centroids")
    return assigned, centroids


def ivf_topk_persisted(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """ANN search over a persisted IVF index with STATIC partition
    pruning: rank cells per query against the broadcast centroid
    table, collect the distinct probed cell ids (bounded by contract
    at C — the centroid count, never the corpus), and push
    ``cell IN (...)`` into the parquet scan so only the probed
    partitions' files are read. Results are row-identical to the
    in-memory :func:`ivf_topk` on the same index (pinned by the
    oracled ``ivf_persisted_equivalence`` contract and pytest).

    Why collect-then-IN instead of relying on dynamic partition
    pruning: the probe side is a window over a broadcast crossJoin —
    DPP may or may not fire on it depending on plan shape, while an
    explicit IN list on the partition column ALWAYS prunes at
    planning time, and its size is capped by C, not by the query
    batch (distinct-before-collect).
    """
    assigned, cents = ivf_load(spark, path)
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv__"),
    )
    probe_w = Window.partitionBy(query_id_col).orderBy(
        F.col("__psim__").desc(), F.col("cell").asc()
    )
    probed_cells = [
        r["cell"]
        for r in (
            q.crossJoin(F.broadcast(cents))
            .withColumn("__psim__", cosine_sim("__qv__", "__cent__"))
            .withColumn("__pr__", F.row_number().over(probe_w))
            .filter(F.col("__pr__") <= nprobe)
            .select("cell")
            .distinct()
            .collect()
        )
    ]
    pruned = assigned.filter(F.col("cell").isin(probed_cells))
    return ivf_topk(
        pruned,
        cents,
        queries,
        k=k,
        nprobe=nprobe,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        exclude_self=exclude_self,
    )


def quantize_embeddings_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|x|/127``,
    ``code_i = round(x_i / scale)`` — the corpus stores 1 byte per
    component instead of 8 (the same 4-8× footprint cut PQ gives,
    but with exact per-component error bounds and no training).

    Returns ``(id_col, scale, codes array<tinyint>)``. Reconstruction
    ``x ≈ code * scale`` has per-component error ≤ scale/2 by
    construction — the oracled ``embedding_int8_contract`` MEASURES
    that bound instead of trusting it, and the whole transform is
    round-portable so DuckDB replays the codes bit-for-bit.

    Pure map-side array expressions (transform/aggregate) — no
    shuffle, codegen'd end to end; at 100 TB this is a streaming
    re-encode of the embedding column, and brute-force scoring over
    codes decodes on the fly with the same transform.
    """
    v = F.col(vec_col).cast("array<double>")
    max_abs = F.aggregate(
        v,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x)),
    )
    scale = (max_abs / F.lit(127.0)).alias("scale")
    return df.select(
        F.col(id_col),
        scale,
        F.transform(
            v,
            lambda x: F.when(max_abs == 0, F.lit(0))
            .otherwise(F.round(x * F.lit(127.0) / max_abs, 0))
            .cast("tinyint"),
        ).alias("codes"),
    )


def dequantize_embeddings_int8(
    qdf: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings_int8`:
    ``embedding_i = code_i * scale``. Map-side only."""
    return qdf.select(
        F.col(id_col),
        F.transform(
            "codes", lambda c: c.cast("double") * F.col("scale")
        ).alias("embedding"),
    )


def kcenter_sample(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center (farthest-point / Gonzalez) coreset selection:
    start from the smallest id, then ``k-1`` times pick the point
    farthest (squared L2) from the chosen set — the classic
    diversity-sampling pass for training-set curation (cover the
    embedding space with k exemplars; 2-approximation to the optimal
    k-center cover).

    Returns ``(step, vec_id, d2)`` — ``d2`` is the squared distance
    from the selected point to the set chosen before it (0.0 for the
    seed), i.e. the coverage radius achieved at each step, rounded to
    6 dp for oracle portability.

    Scale shape: the chosen set is at most ``k`` vectors — broadcast
    as literal arrays into a ``least()`` of JVM fold expressions — so
    every iteration is ONE full-scan aggregation (max of d², tie-break
    min id) with nothing shuffled but a 1-row result; the driver loop
    is bounded by ``k`` (same contract as ivf_train's iteration
    collects). O(k) passes over the corpus, O(k²·dim) driver memory.
    At 100 TB: k passes of a codegen'd projection + single-row agg —
    embarrassingly parallel; never a pairwise matrix.
    """
    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    )

    def lit_arr(xs) -> Column:
        return F.array(*[F.lit(float(x)) for x in xs])

    def sq_l2_to(lit_vec) -> Column:
        return F.aggregate(
            F.zip_with(F.col("v"), lit_vec, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    seed = base.orderBy("vec_id").limit(1).collect()[0]
    chosen = [(0, seed["vec_id"], 0.0, list(seed["v"]))]
    for step in range(1, k):
        dists = [sq_l2_to(lit_arr(v)) for _, _, _, v in chosen]
        d_min = dists[0] if len(dists) == 1 else F.least(*dists)
        far = (
            base.select("vec_id", "v", d_min.alias("d2"))
            .orderBy(F.col("d2").desc(), F.col("vec_id"))
            .limit(1)
            .collect()[0]
        )
        chosen.append((step, far["vec_id"], float(far["d2"]), list(far["v"])))
    return emb.sparkSession.createDataFrame(
        [(s, i, round(d, 6)) for s, i, d, _ in chosen],
        "step int, vec_id bigint, d2 double",
    )


def mmr_rerank(
    cands: DataFrame,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    rel_col: str = "rel",
    vec_col: str = "embedding",
    k: int = 3,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking per query group
    (Carbonell & Goldstein 1998): iteratively select the candidate
    maximizing ``lam·relevance − (1−lam)·max cosine to the already
    selected`` — the retrieve-then-diversify pass that stops a RAG
    top-k from returning five near-identical passages. Ties break on
    smaller id. Returns ``(query_col, rank, vec_id)``; ``rank`` is
    0-based selection order.

    This is the module's one deliberate ``applyInPandas`` operator:
    the greedy argmax is sequential in ``k`` WITHIN a query, but
    query groups are independent and each holds only that query's
    top-N candidates (bounded — the retriever already cut to N), so
    grouping by query gives Arrow-batched parallelism across queries
    with O(N·dim) memory per group. The JVM-side alternative (k
    joins against a growing selected set PER QUERY) would launch
    k·queries jobs; here scale comes from the group count, exactly
    the \"Python only where the operator is genuinely iterative\"
    rule (cf. pack_sequences_ffd).
    """
    import numpy as np
    import pandas as pd

    out_schema = f"{query_col} bigint, rank int, {id_col} bigint"

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        vecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        rel = pdf[rel_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        selected: list[int] = []
        # penalty term = max cosine to the selected set; the max over
        # an EMPTY set contributes nothing (first pick is pure
        # relevance), and with one item it is that item's actual —
        # possibly negative — similarity, so no zeros-floor here.
        max_sim = None
        for _ in range(min(k, n)):
            score = (
                lam * rel
                if max_sim is None
                else lam * rel - (1.0 - lam) * max_sim
            )
            score[selected] = -np.inf
            # rows are id-sorted, so the first max index IS the tie-break
            best = int(np.flatnonzero(score == score.max())[0])
            selected.append(best)
            sims = unit @ unit[best]
            max_sim = sims if max_sim is None else np.maximum(max_sim, sims)
        return pd.DataFrame(
            {
                query_col: pdf[query_col].iloc[0],
                "rank": range(len(selected)),
                id_col: pdf[id_col].iloc[selected].to_numpy(),
            }
        )

    return cands.groupBy(query_col).applyInPandas(pick, out_schema)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_cells: int = 16,
    nprobe: int = 4,
    m: int = 4,
    pq_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ composite ANN — the production vector-index recipe
    (public design: Jégou et al. 2011 / the FAISS IVFPQ index): a
    coarse IVF quantizer routes vectors to ``num_cells`` cells, each
    vector's RESIDUAL against its cell centroid is PQ-encoded to
    ``m`` byte codes, and a query probes only ``nprobe`` cells,
    scoring candidates by asymmetric distance between its per-cell
    query residual and the codes. Returns ``query_id, vec_id, adist,
    rank``.

    Why the composite at 100 TB: IVF-Flat prunes the scan but still
    moves floats; PQ compresses but scans everything. IVF-PQ does
    both — the probe touches nprobe/num_cells of the corpus AND only
    byte codes move (m bytes/vector + one small residual table per
    probed cell). Residual encoding (not raw-vector PQ) is what makes
    the shared codebook tight: residuals are centered near zero, so
    16 centroids/subspace cover them far better than raw positions.

    All pieces reuse the oracled machinery: `ivf_assign` with
    ``metric="l2"`` (portable md5 bottom-k seeds; L2 routing because
    ADC approximates L2 — cosine cells would send L2 neighbors to
    different cells and cap recall at noise), `pq_train`/`pq_encode`
    over the residual table, and an ADC scored exactly like
    `pq_topk` but keyed per (query, probed cell). Hash-deterministic
    end to end — the recall contract is a stable driver row.
    """
    assigned, cents = ivf_assign(
        corpus, num_centroids=num_cells, id_col=id_col, vec_col=vec_col,
        seed=seed, metric="l2",
    )
    sub = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.col("__cent__"),
        lambda x, c: x - c,
    )
    # cut the lineage ONCE: residuals sit under pq_train's m subspaces
    # × Lloyd iterations plus pq_encode and the cell join — without the
    # checkpoint each consumer re-executes the full mapInPandas coarse
    # assignment (the same recompute blow-up ivf_train cuts per round)
    residuals = (
        assigned.join(F.broadcast(cents), "cell")
        .select(id_col, "cell", sub.alias(vec_col))
        .localCheckpoint(eager=False)
    )
    books = pq_train(
        residuals, m=m, num_centroids=pq_centroids, id_col=id_col,
        vec_col=vec_col, seed=seed + 100, metric="l2",
    )
    codes = pq_encode(
        residuals, books, m=m, id_col=id_col, vec_col=vec_col
    ).join(residuals.select(id_col, "cell"), id_col)

    return _ivfpq_adc_topk(
        codes, cents, books, queries, k=k, nprobe=nprobe, m=m,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
    )


def _ivfpq_adc_topk(
    codes: DataFrame,
    cents: DataFrame,
    books: DataFrame,
    queries: DataFrame,
    k: int,
    nprobe: int,
    m: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """The IVF-PQ probe/score tail shared by the in-memory and
    persisted paths: nprobe nearest cells per query by L2, the query's
    residual AGAINST EACH PROBED CELL feeds that cell's ADC table,
    codes join the broadcast tables, per-(query, vector) sums rank.
    Keeping one implementation means the persisted index's
    equivalence contract proves layout, not arithmetic."""
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv__"),
    )
    probe_w = Window.partitionBy(query_id_col).orderBy(
        F.col("__pd__").asc(), F.col("cell").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("__pd__", _sq_l2(F.col("__qv__"), F.col("__cent__")))
        .withColumn("__pr__", F.row_number().over(probe_w))
        .filter(F.col("__pr__") <= nprobe)
        .select(
            query_id_col,
            "cell",
            F.zip_with(
                "__qv__", "__cent__", lambda x, c: x - c
            ).alias("__qres__"),
        )
    )
    dim = queries.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    dsub = dim // m
    qsubs = probes.select(
        query_id_col,
        "cell",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("sub_idx"),
                        F.slice(F.col("__qres__"), j * dsub + 1, dsub).alias(
                            "qv"
                        ),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select(query_id_col, "cell", "s.sub_idx", "s.qv")
    dtab = qsubs.join(F.broadcast(books), "sub_idx").select(
        query_id_col,
        "cell",
        "sub_idx",
        "code",
        _sq_l2(F.col("qv"), F.col("__cent__")).alias("__d__"),
    )
    scored = (
        codes.join(F.broadcast(dtab), ["cell", "sub_idx", "code"])
        .filter(F.col(query_id_col) != F.col(id_col))
        .groupBy(query_id_col, id_col)
        .agg(F.sum("__d__").alias("adist"), F.count(F.lit(1)).alias("__m__"))
        .filter(F.col("__m__") == m)
        .drop("__m__")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adist").asc(), F.col(id_col).asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    ).filter(F.col("rank") <= k)


def ivfpq_save(
    corpus: DataFrame,
    path: str,
    num_cells: int = 16,
    m: int = 4,
    pq_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_iters: int = 0,
) -> None:
    """Persist the production IVF-PQ index (the FAISS on-disk shape):
    PQ byte codes partitioned BY CELL plus the two broadcastable
    tables (coarse centroids, PQ codebooks) and a params file pinning
    the geometry. Build once, probe many: the corpus's float vectors
    are never read again — a probe touches only the probed cells'
    CODE files (m rows of (sub_idx, code) per vector, bytes not
    floats), which is the full 100 TB story: nprobe/num_cells of the
    corpus × m bytes per vector.

    Same training pipeline as :func:`ivfpq_topk` (L2 routing,
    residual encoding, localCheckpointed residuals), so a persisted
    index scores identically to the in-memory composite — pinned by
    the oracled ``ivfpq_persisted_equivalence`` contract.

    The params file also records the build corpus's mean per-subspace
    QUANTIZATION ERROR (``base_qe``) — the drift baseline
    :func:`ivfpq_append` compares incremental batches against."""
    import json as _json
    import os as _os

    if train_iters > 0:
        # production build: Lloyd refinement + starved-cell reseeding
        # (see ivf_train) — on clustered corpora the raw hash-sampled
        # seeds can collapse to a few live cells, and cell recall is
        # then capped at blob granularity whatever nprobe pays.
        # Default 0 keeps the historical bit-identical geometry the
        # equivalence contracts pin.
        assigned, cents = ivf_train(
            corpus, num_centroids=num_cells, iters=train_iters,
            id_col=id_col, vec_col=vec_col, seed=seed, metric="l2",
            reseed_empty=True,
        )
    else:
        assigned, cents = ivf_assign(
            corpus, num_centroids=num_cells, id_col=id_col,
            vec_col=vec_col, seed=seed, metric="l2",
        )
    residuals = _ivfpq_residuals(assigned, cents, id_col, vec_col)
    books = pq_train(
        residuals, m=m, num_centroids=pq_centroids, id_col=id_col,
        vec_col=vec_col, seed=seed + 100, metric="l2",
    )
    codes = pq_encode(
        residuals, books, m=m, id_col=id_col, vec_col=vec_col,
        with_err=True,
    ).join(residuals.select(id_col, "cell"), id_col)
    base_qe = codes.agg(F.avg("__qe__")).first()[0]
    codes.drop("__qe__").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(path + "/codes")
    cents.write.mode("overwrite").parquet(path + "/centroids")
    books.write.mode("overwrite").parquet(path + "/codebooks")
    with open(_os.path.join(path, "_params.json"), "w") as fh:
        _json.dump(
            {"num_cells": num_cells, "m": m,
             "pq_centroids": pq_centroids, "seed": seed,
             "train_iters": train_iters,
             "base_qe": float(base_qe or 0.0), "appended": 0},
            fh,
        )


def _ivfpq_residuals(
    assigned: DataFrame, cents: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Cell residuals (vector − its cell centroid) — the quantity PQ
    encodes. Shared by build and incremental append so the two paths
    are structurally identical (the delta-equivalence contract)."""
    sub = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.col("__cent__"),
        lambda x, c: x - c,
    )
    return (
        assigned.join(F.broadcast(cents), "cell")
        .select(id_col, "cell", sub.alias(vec_col))
        .localCheckpoint(eager=False)
    )


def ivfpq_append(
    spark,
    path: str,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    retrain_ratio: float = 1.5,
) -> dict:
    """Incrementally maintain a persisted IVF-PQ index: encode the
    ``delta`` vectors (new corpus rows — e.g. the INSERT half of a
    versioned table's CDC feed) against the EXISTING coarse centroids
    and PQ codebooks and append their byte codes into the
    cell-partitioned codes table. No retrain, no rebuild: the append
    costs one assignment pass + one encode over the delta — O(delta),
    never O(corpus) — which is the nightly-crawl production story at
    100 TB (a full rebuild re-reads every float vector).

    Because assignment and encoding of a vector depend only on the
    frozen (centroids, codebooks) geometry, the appended index is
    ROW-IDENTICAL to encoding the grown corpus in one shot against
    the same geometry — the oracled ``ivfpq_delta_equivalence``
    contract. What an append can NOT do is adapt the geometry: as the
    data distribution drifts, new vectors quantize worse. The
    returned stats carry the measured signal — ``delta_qe`` (mean
    per-subspace quantization error of this batch) vs the build-time
    ``base_qe`` — and ``retrain_recommended`` fires when the ratio
    exceeds ``retrain_ratio`` (default 1.5×): rebuild with
    :func:`ivfpq_save` on the grown corpus, exactly FAISS's
    re-train-when-drifted operational policy.

    Deletes go through :func:`ivfpq_delete` (tombstones anti-joined
    at probe time, physically dropped by :func:`ivfpq_reencode` —
    the DV merge-on-read pattern applied to the index); an updated
    embedding is a delete + append of the new vector under a new id.
    """
    import json as _json
    import os as _os

    with open(_os.path.join(path, "_params.json")) as fh:
        params = _json.load(fh)
    m = int(params["m"])
    cents = spark.read.parquet(path + "/centroids")
    books = spark.read.parquet(path + "/codebooks")
    from small_etl_spark.llm.util import ensure_parallelism

    delta = ensure_parallelism(
        delta.filter(F.col(vec_col).isNotNull())
    )
    if delta.limit(1).count() == 0:
        # empty CDC batch: a no-op append, not an error
        return {
            "added": 0,
            "delta_qe": 0.0,
            "base_qe": float(params.get("base_qe") or 0.0),
            "qe_ratio": 1.0,
            "retrain_recommended": False,
        }
    assigned = _assign_cells_vectorized(
        delta, cents, id_col, vec_col, "l2"
    )
    residuals = _ivfpq_residuals(assigned, cents, id_col, vec_col)
    codes = pq_encode(
        residuals, books, m=m, id_col=id_col, vec_col=vec_col,
        with_err=True,
    ).join(residuals.select(id_col, "cell"), id_col)
    stats = codes.agg(
        F.avg("__qe__").alias("qe"),
        F.count_distinct(F.col(id_col)).alias("n"),
    ).first()
    added, delta_qe = int(stats["n"] or 0), float(stats["qe"] or 0.0)
    if added:
        codes.drop("__qe__").write.mode("append").partitionBy(
            "cell"
        ).parquet(path + "/codes")
    base_qe = float(params.get("base_qe") or 0.0)
    ratio = (delta_qe / base_qe) if base_qe > 0 else 1.0
    params["appended"] = int(params.get("appended", 0)) + added
    params["last_delta_qe"] = delta_qe
    params["last_qe_ratio"] = ratio
    tmp = _os.path.join(path, "_params.json.tmp")
    with open(tmp, "w") as fh:
        _json.dump(params, fh)
    _os.replace(tmp, _os.path.join(path, "_params.json"))
    return {
        "added": added,
        "delta_qe": delta_qe,
        "base_qe": base_qe,
        "qe_ratio": ratio,
        "retrain_recommended": bool(
            base_qe > 0 and ratio > retrain_ratio
        ),
    }


def ivfpq_delete(spark, path: str, ids: "list[int] | DataFrame",
                 id_col: str = "vec_id") -> int:
    """Delete vectors from a persisted IVF-PQ index WITHOUT touching
    the codes files: ids append to a tombstone table that
    :func:`ivfpq_topk_persisted` anti-joins before scoring (the
    merge-on-read pattern the versioned layer uses for DVs, applied
    to the index). O(deleted ids) per call; the probe's extra cost is
    one broadcast anti-join against the tombstone set.
    :func:`ivfpq_reencode` physically drops tombstoned codes and
    clears the table — run it when the tombstone fraction grows, the
    same compaction trade as DV deletes. Returns ids tombstoned."""
    import os as _os

    if not isinstance(ids, DataFrame):
        ids = spark.createDataFrame(
            [(int(i),) for i in ids], f"{id_col} bigint"
        )
    ids = ids.select(F.col(id_col).cast("long").alias(id_col)).distinct()
    n = ids.count()
    if n:
        ids.coalesce(1).write.mode("append").parquet(
            _os.path.join(path, "tombstones")
        )
    return n


def _ivfpq_live_codes(spark, path: str, codes: DataFrame,
                      id_col: str) -> DataFrame:
    """Codes minus tombstoned ids (no-op when none exist)."""
    import os as _os

    tpath = _os.path.join(path, "tombstones")
    if not _os.path.isdir(tpath):
        return codes
    dead = spark.read.parquet(tpath).select(id_col).distinct()
    return codes.join(F.broadcast(dead), id_col, "left_anti")


def ivfpq_reencode(
    spark,
    path: str,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Rewrite the codes table from ``corpus`` against the index's
    FROZEN geometry (no retraining): the full-scan sibling of
    :func:`ivfpq_append` — post-delete cleanup, or the reference
    rebuild the ``ivfpq_delta_equivalence`` contract compares the
    append path against. O(corpus) encode, zero training cost.
    Returns the number of vectors encoded."""
    import json as _json
    import os as _os

    with open(_os.path.join(path, "_params.json")) as fh:
        params = _json.load(fh)
    m = int(params["m"])
    cents = spark.read.parquet(path + "/centroids")
    books = spark.read.parquet(path + "/codebooks")
    from small_etl_spark.llm.util import ensure_parallelism

    corpus = ensure_parallelism(
        corpus.filter(F.col(vec_col).isNotNull())
    )
    # deletes must survive the compaction: a caller that passes the
    # full ORIGINAL corpus (tombstoned ids included) must not silently
    # resurrect deleted vectors — anti-join the live tombstone set out
    # BEFORE encoding (ADVICE r10); the table is then safely cleared
    # below because nothing it named was materialized
    corpus = _ivfpq_live_codes(spark, path, corpus, id_col)
    assigned = _assign_cells_vectorized(
        corpus, cents, id_col, vec_col, "l2"
    )
    residuals = _ivfpq_residuals(assigned, cents, id_col, vec_col)
    codes = pq_encode(
        residuals, books, m=m, id_col=id_col, vec_col=vec_col
    ).join(residuals.select(id_col, "cell"), id_col)
    n = codes.select(id_col).distinct().count()
    codes.write.mode("overwrite").partitionBy("cell").parquet(
        path + "/codes"
    )
    params["appended"] = 0
    tmp = _os.path.join(path, "_params.json.tmp")
    with open(tmp, "w") as fh:
        _json.dump(params, fh)
    _os.replace(tmp, _os.path.join(path, "_params.json"))
    # the re-encode materialized only LIVE rows (tombstones anti-
    # joined out above), so every tombstoned code is physically gone;
    # clear the table
    import shutil as _shutil

    _shutil.rmtree(
        _os.path.join(path, "tombstones"), ignore_errors=True
    )
    return n


def ivfpq_refine_topk(
    spark,
    path: str,
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    refine_factor: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """FAISS-style exact re-rank refinement over the persisted IVF-PQ
    index (the public IndexRefineFlat design; VERDICT r10 #5): the
    ADC probe selects the top ``C = refine_factor * k`` candidates
    per query from the COMPRESSED codes — probe I/O unchanged at
    nprobe/cells × m bytes per vector — and only those candidates'
    float vectors are then fetched from ``corpus`` and scored with
    exact squared L2. Quantization error ranks candidates slightly
    wrong but rarely drops true neighbors out of the top-C entirely,
    so recall@k jumps toward brute force while the float corpus is
    touched for O(n_queries × C) rows, never scanned (the candidate
    set BROADCASTS into the corpus join — at 100 TB that is a
    semi-join against a few thousand ids, prunable by footer stats on
    ``id_col``). Tombstoned ids never reach the re-rank: the ADC
    stage already anti-joins them. Measured on the shipped testdata
    (m=8, 16 cells, nprobe=4, refine 50×): recall@10 0.10 → 0.50 at
    sf0.1 and 0.0625 → 0.4625 at sf0.01 — in both cases EXACTLY the
    probed-cells ceiling, i.e. refinement recovers every true
    neighbor the probe can reach and the remaining loss is purely
    cell recall (bought back with nprobe, not floats). See
    ``tests/test_llm_similarity.py`` and the ``ivfpq_refine_topk``
    registry contract. Returns (query_id, id, dist, rank) with EXACT
    distances."""
    cand = ivfpq_topk_persisted(
        spark, path, queries, k=refine_factor * k, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
    ).select(query_id_col, id_col)
    vecs = corpus.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__cv__"),
    )
    qv = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv__"),
    )
    exact = (
        vecs.join(F.broadcast(cand), id_col)
        .join(F.broadcast(qv), query_id_col)
        .withColumn("dist", _sq_l2(F.col("__qv__"), F.col("__cv__")))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("dist").asc(), F.col(id_col).asc()
    )
    return (
        exact.withColumn(
            "rank", F.row_number().over(w).cast("bigint")
        )
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "dist", "rank")
    )


def ivfpq_topk_persisted(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN search over a persisted IVF-PQ index with STATIC partition
    pruning: rank cells per query against the broadcast centroid
    table, collect the distinct probed cell ids (bounded by num_cells,
    never the corpus — the same collect-then-IN rationale as
    :func:`ivf_topk_persisted`: an explicit IN on the partition column
    always prunes at planning time), push ``cell IN (...)`` into the
    CODES scan, and run the identical shared ADC scorer. Row-identical
    to :func:`ivfpq_topk` on the same geometry."""
    import json as _json
    import os as _os

    with open(_os.path.join(path, "_params.json")) as fh:
        params = _json.load(fh)
    m = int(params["m"])
    codes = spark.read.parquet(path + "/codes").withColumn(
        "cell", F.col("cell").cast("bigint")
    )
    cents = spark.read.parquet(path + "/centroids")
    books = spark.read.parquet(path + "/codebooks")
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv__"),
    )
    probe_w = Window.partitionBy(query_id_col).orderBy(
        F.col("__pd__").asc(), F.col("cell").asc()
    )
    probed_cells = [
        r["cell"]
        for r in (
            q.crossJoin(F.broadcast(cents))
            .withColumn("__pd__", _sq_l2(F.col("__qv__"), F.col("__cent__")))
            .withColumn("__pr__", F.row_number().over(probe_w))
            .filter(F.col("__pr__") <= nprobe)
            .select("cell")
            .distinct()
            .collect()
        )
    ]
    pruned = _ivfpq_live_codes(
        spark, path,
        codes.filter(F.col("cell").isin(probed_cells)), id_col,
    )
    return _ivfpq_adc_topk(
        pruned, cents, books, queries, k=k, nprobe=nprobe, m=m,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
    )
