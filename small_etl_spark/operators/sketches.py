"""Count-min sketch: mergeable frequency estimation (north-star; the
reference has no sketching at all — its summary agg is exact counts,
``/root/reference`` SURVEY §2 A1).

A CMS is a ``depth × width`` counter grid; item x increments cell
``(j, h_j(x))`` for each of the ``depth`` hash rows, and the estimate
is the MIN over its cells — an overcount-only bound (est ≥ true, and
est ≤ true + ε·N with probability 1-δ for width = e/ε, depth =
ln(1/δ)).

Why this is the 100 TB shape: the sketch build is ONE map-side
combined groupBy producing at most ``depth × width`` rows regardless
of input size, and two sketches MERGE by cell-wise addition — so
shards/streams/days can sketch independently and combine without
re-reading data (same story as the HLL union in
operators/incremental.py). The hashes are portable md5 buckets (the
house idiom, cf. ``hashing_tf``), so DuckDB replays the sketch
bit-for-bit and the driver can value-hash it — an *oracled* sketch,
not a rows-only one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bucket(j: F.Column, x: F.Column, width: int) -> F.Column:
    """Portable hash row j bucket: md5("j:x") first 4 hex chars mod width."""
    h = F.md5(
        F.concat_ws(":", j.cast("string"), x.cast("string")).cast("binary")
    )
    return F.pmod(
        F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint"), F.lit(width)
    ).alias("bucket")


def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Build a count-min sketch over ``df[col]``.

    Returns ``(j, bucket, cnt)`` — at most ``depth × width`` rows.
    The explode multiplies map-side rows by ``depth``, but the
    hash-aggregate combines locally, so the shuffle carries only
    ``depth × width`` partials per task.
    """
    rows = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
        F.col(col).alias("__x__"),
    )
    return (
        rows.select("j", _bucket(F.col("j"), F.col("__x__"), width))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of same-shaped sketches (the mergeability law)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, items: DataFrame, col: str, depth: int, width: int
) -> DataFrame:
    """Estimate each item's frequency: min over its ``depth`` cells.

    ``sketch`` is tiny (≤ depth×width rows) — Spark broadcasts it, so
    probing N items is a map-only pass over ``items``.
    """
    probes = items.select(
        F.col(col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
    )
    probes = probes.select(
        F.col(col), "j", _bucket(F.col("j"), F.col(col), width)
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy(col)
        .agg(F.min("cnt").alias("est_n"))
    )
