"""Skyline (Pareto frontier) operators (north-star; no reference
equivalent — the reference has no multi-criteria operator at all,
SURVEY §4).

A point p *dominates* q when p is ≤ q on every minimized dimension
and strictly < on at least one. The skyline is the set of
non-dominated points — the classic "cheapest AND earliest" frontier.

Two scale regimes:

- ``skyline_2d``: the 2-D case collapses to ONE window pass — after
  sorting by (x asc, y asc), a distinct point is dominated iff some
  preceding row has y ≤ its y, i.e. iff the running ``min(y)`` over
  the preceding frame is ≤ y. One global sort, zero self-joins,
  fully whole-stage-codegen — this survives 100 TB because it is
  exactly the shape of a window aggregate (range-partitioned sort).
  The identical formulation runs on DuckDB, so it is value-oracled.
- ``skyline_nd``: for d ≥ 3 the frontier is not 1-pass expressible;
  use the distributive identity skyline(A ∪ B) =
  skyline(skyline(A) ∪ skyline(B)): a per-partition local skyline
  (Arrow ``mapInPandas``, vectorized numpy dominance) shrinks each
  partition to its frontier, then the (small by skyline theory)
  candidate union is re-filtered in one task. Never an all-pairs
  crossJoin over the input — only over the already-reduced
  candidates.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window, functions as F


def skyline_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """Exact 2-D skyline, both dimensions minimized.

    Returns the distinct non-dominated ``(x, y)`` points. Duplicate
    points collapse to one row (neither strictly dominates the other;
    reporting the point once is the standard convention).

    Two phases so the global pass never sees the raw input: a
    partition-LOCAL prefilter (pandas cummin per Arrow batch — no
    shuffle, removes every locally-dominated point; sound by the
    skyline-of-skylines identity) feeds the exact global window.
    The global window is unpartitioned — the classic 2-D sweep needs
    a total order — but it runs over local frontiers only
    (O(frontier × partitions) rows), not the dataset; the same
    two-phase shape as :func:`skyline_nd`.
    """
    pts = df.select(x, y).distinct()
    schema = pts.schema

    def local(batches: Iterator) -> Iterator:
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf
                continue
            pdf = pdf.sort_values([x, y], kind="mergesort")
            prev = pdf[y].cummin().shift(1)
            yield pdf[prev.isna() | (prev > pdf[y])]

    candidates = pts.mapInPandas(local, schema=schema)
    w = (
        Window.orderBy(F.col(x).asc(), F.col(y).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # After lexicographic sort every preceding distinct row has
    # (x' < x) or (x' == x and y' < y); in either case y' ≤ y proves
    # dominance, so "not dominated" ⟺ running min(y) > y (or empty).
    prev_min = F.min(F.col(y)).over(w)
    return (
        candidates.withColumn("__prev_min__", prev_min)
        .filter(F.col("__prev_min__").isNull() | (F.col("__prev_min__") > F.col(y)))
        .drop("__prev_min__")
    )


def _pandas_skyline(pdf, cols):
    """Vectorized O(n·frontier) dominance filter on one pandas chunk."""
    import numpy as np

    if len(pdf) == 0:
        return pdf
    vals = pdf[list(cols)].to_numpy(dtype="float64")
    # Lexicographic presort: a row can only be dominated by an earlier
    # row, so one forward sweep against the running frontier suffices.
    order = np.lexsort(tuple(vals[:, i] for i in reversed(range(vals.shape[1]))))
    vals = vals[order]
    keep_idx = []
    frontier = []  # list of rows, each on the current skyline
    for i in range(vals.shape[0]):
        v = vals[i]
        dominated = False
        for f in frontier:
            if (f <= v).all() and (f < v).any():
                dominated = True
                break
        if not dominated:
            # equal duplicates: keep only the first occurrence
            if frontier and any((f == v).all() for f in frontier):
                continue
            frontier.append(v)
            keep_idx.append(order[i])
    return pdf.iloc[sorted(keep_idx)]


def skyline_nd(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact d-dimensional skyline, all ``cols`` minimized.

    Phase 1 computes each partition's local skyline (mapInPandas,
    numpy); phase 2 re-filters the union of local skylines in a
    single task — correct by the skyline-of-skylines identity and
    cheap because local frontiers are tiny relative to their
    partitions. Output is the distinct frontier points.
    """
    pts = df.select(*cols).distinct()
    schema = pts.schema

    def local(batches: Iterator) -> Iterator:
        for pdf in batches:
            yield _pandas_skyline(pdf, cols)

    candidates = pts.mapInPandas(local, schema=schema)
    # Global pass: the candidate set is O(frontier × partitions) —
    # small by construction, safe to funnel through one task.
    return candidates.coalesce(1).mapInPandas(local, schema=schema)
