"""Shared helpers for the LLM-pipeline operator family."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(
    df: DataFrame,
    bytes_per_task: int | None = None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Spread a narrow input across the cluster before CPU-heavy
    per-row math (signatures, vector scoring).

    A small corpus arrives as one file split → one task, so 31 of 32
    cores idle. At 100 TB inputs already have thousands of splits and
    this is a no-op. Split estimation uses scan *metadata*
    (``df.inputFiles()`` + local file sizes vs maxPartitionBytes) —
    never ``df.rdd``, which would compile the plan to an RDD lineage
    just to read a partition count.

    ``bytes_per_task`` (round 12) sizes the repartition for
    Python-kernel consumers (``mapInPandas``/``mapInArrow``): each
    Python task pays a fixed boundary cost (worker handshake, Arrow
    setup, per-task numpy init), so a kilobyte-scale input split 32
    ways buys no compute parallelism and pays the overhead 32×
    (measured −20% at sf0.1 on the vectorized cosine top-k, min-of-4
    interleaved: 32 tasks 0.99 s → 4 tasks 0.79 s). The width is
    derived from input SIZE — ceil(bytes / bytes_per_task), clamped
    to [2, defaultParallelism] — so a 100 TB input still saturates
    the cluster; only tiny inputs get fewer, fatter batches. ``None``
    keeps the JVM-consumer behavior: full defaultParallelism width
    (codegen'd expression stages have no per-task boundary cost worth
    avoiding).

    ``key_cols`` (round 12) repartitions BY THOSE COLUMNS instead of
    round-robin, for consumers whose next operator requires a hash
    distribution on the same keys (window functions, groupBy): the
    explicit exchange then SATISFIES the operator's requirement
    (ENSURE_REQUIREMENTS reuses it — guide §2.4, "two operations keyed
    the same way share one exchange"), so the plan keeps its original
    exchange count while any map-side sort the operator would have
    pushed below the shuffle (e.g. the rank-pushdown partial
    WindowGroupLimit's Sort) moves to the parallel post-shuffle side.
    That trades the partial limit's shuffle reduction for map-side
    parallelism — the right trade exactly when the scan side is
    split-starved, which is the only case this helper acts on; at
    scale (splits ≥ cores/2) it returns the input untouched and the
    default partial-limit plan stands.
    """
    files = df.inputFiles()
    if not files:
        return df  # non-file source: partitioning was set upstream
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    floor = max(target // 2, 1)
    if len(files) >= floor:
        return df
    try:
        max_bytes = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
    except (TypeError, ValueError):
        max_bytes = 128 * 1024 * 1024
    import os
    import urllib.parse

    est_splits = 0
    total_bytes = 0
    for uri in files:
        parsed = urllib.parse.urlparse(uri)
        if parsed.scheme not in ("file", ""):
            return df  # remote store: trust the scan's own splitting
        try:
            size = os.path.getsize(parsed.path)
        except OSError:
            size = 0
        total_bytes += size
        est_splits += max(1, size // max_bytes)
    if est_splits < floor:
        if key_cols:
            from pyspark.sql import functions as F

            return df.repartition(*[F.col(c) for c in key_cols])
        if bytes_per_task:
            width = min(
                target, max(2, -(-total_bytes // bytes_per_task))
            )
            return df.repartition(width)
        return df.repartition(target)
    return df


# Fixed per-task cost of a Python-boundary stage is amortized over at
# least this many input bytes before another task is worth spawning.
PY_KERNEL_BYTES_PER_TASK = 4 * 1024 * 1024
