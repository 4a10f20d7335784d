"""Shared helpers for the LLM-pipeline operator family."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread a narrow input across the cluster before CPU-heavy
    per-row math (signatures, vector scoring).

    A small corpus arrives as one file split → one task, so 31 of 32
    cores idle. At 100 TB inputs already have thousands of splits and
    this is a no-op. Split estimation uses scan *metadata*
    (``df.inputFiles()`` + local file sizes vs maxPartitionBytes) —
    never ``df.rdd``, which would compile the plan to an RDD lineage
    just to read a partition count.
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
    for uri in files:
        parsed = urllib.parse.urlparse(uri)
        if parsed.scheme not in ("file", ""):
            return df  # remote store: trust the scan's own splitting
        try:
            size = os.path.getsize(parsed.path)
        except OSError:
            size = 0
        est_splits += max(1, size // max_bytes)
    if est_splits < floor:
        return df.repartition(target)
    return df
