"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional scan pruning.

North-star operator (the reference writes output in arrival order —
``/root/reference/src/core/load.rs`` appends rows as received). At
100 TB, layout IS the query optimizer's best friend: parquet row-group
min/max stats prune scans only when rows with similar values are
physically together. A linear sort clusters ONE column; interleaving
the bits of several bucketed columns (the Morton / Z-order curve)
bounds EVERY participating column's span per file, so predicates on
any subset of the z-columns skip most row groups.

Usage shape at scale::

    zordered = zorder_by(df, [("user_id", 0, 1024), ("ts_h", 0, 744)])
    zordered.write.parquet(...)   # row groups now tight on both dims

The bucketing bounds are explicit literals (not a data pass) so the
layout is stable as the table grows — the 100 TB ingest can't afford
a min/max scan per write, and drifting bounds would interleave
incompatibly across days.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ZBITS_DEFAULT = 8


def _bucket(col: Column, lo: int, hi: int, bits: int) -> Column:
    """Scale an integer column in [lo, hi] to [0, 2^bits) with exact
    integer arithmetic (values past hi clamp into the top bucket)."""
    nb = 1 << bits
    span = hi - lo
    # div (IntegralDivide), not `/`: Spark's `/` is double division,
    # and a double mantissa shifts bucket edges by one for values near
    # multiples of span/2^bits at large magnitudes — the bucket
    # function must be bit-stable across days of ingest for the
    # interleaving to stay compatible. Bigint floor-division is exact
    # at any magnitude.
    scaled = F.call_function(
        "div",
        (col.cast("bigint") - F.lit(lo)) * nb,
        F.lit(span).cast("bigint"),
    )
    return F.greatest(
        F.lit(0).cast("bigint"),
        F.least(scaled, F.lit(nb - 1).cast("bigint")),
    )


def morton_code(buckets: list[Column], bits: int = ZBITS_DEFAULT) -> Column:
    """Interleave the low ``bits`` bits of each bucketed column into
    one Z-curve key. Pure JVM bit expressions (shift/and/or) — stays
    inside whole-stage codegen, no UDF."""
    n = len(buckets)
    code = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(buckets):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1).cast("bigint"))
            code = code.bitwiseOR(F.shiftleft(bit, b * n + i))
    return code


def zorder_by(
    df: DataFrame,
    cols: list[tuple[str, int, int]],
    bits: int = ZBITS_DEFAULT,
    num_partitions: int | None = None,
    code_col: str = "zcode",
) -> DataFrame:
    """Cluster ``df`` along the Z-curve of ``cols`` — each entry is
    ``(column, lo, hi)`` static bucketing bounds. Returns the frame
    range-partitioned and sorted by the Morton code (kept in
    ``code_col``), ready to write.

    One range-partitioning shuffle (sampled split points, so curve-
    dense regions still balance) + an in-partition sort — the same
    cost as a linear sort-by-one-column write, but every z-column
    gets file-level locality. Drop ``code_col`` after writing if the
    consumer shouldn't see it; keeping it costs one bigint and lets
    incremental appends reuse the same curve without recompute.
    """
    buckets = [_bucket(F.col(c), lo, hi, bits) for c, lo, hi in cols]
    out = df.withColumn(code_col, morton_code(buckets, bits))
    parts = [num_partitions] if num_partitions else []
    return out.repartitionByRange(*parts, code_col).sortWithinPartitions(code_col)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int,
    path: str | None = None,
) -> None:
    """Write ``df`` as a BUCKETED table: hash-partitioned into
    ``num_buckets`` files by ``key`` and sorted by it within each
    bucket — Spark's persisted co-location layout.

    The 100 TB payoff is in :func:`bucketed_join` below: two tables
    bucketed on the same key into the same bucket count join with
    ZERO Exchange on either side — the planner proves co-partitioning
    from the table metadata and emits a shuffle-free sort-merge join.
    For a fact table joined daily against the same dimensions, the
    shuffle is paid ONCE at write time instead of on every query;
    bucket-pruning on point predicates is free on top.

    ``path`` makes the table external (data at ``path``, metadata in
    the session catalog) so callers control the storage root; the
    catalog entry is what carries the bucket spec — bucketing is the
    one layout parquet files alone can't declare.
    """
    w = (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark,
    left_table: str,
    right_table: str,
    key: str,
) -> DataFrame:
    """Inner-join two bucketed tables on their bucket key. When both
    were written by :func:`write_bucketed` with the same bucket
    count, the physical plan contains NO shuffle Exchange on either
    side — assert ``"Exchange hashpartitioning" not in plan`` (pinned
    by the oracled ``bucketed_join_colocated`` contract and
    tests/test_layout.py).

    The ``merge`` hint forces the sort-merge strategy so the
    demonstration matches the 100 TB case: there BOTH sides exceed
    the broadcast threshold and the planner picks SMJ on its own; at
    test SF it would broadcast the small side instead (a
    BroadcastExchange, which says nothing about co-location).
    Bucketed SMJ needs no exchange AND no per-query sort (the
    sortBy at write time already ordered each bucket)."""
    return (
        spark.table(left_table)
        .hint("merge")
        .join(spark.table(right_table), key)
    )
