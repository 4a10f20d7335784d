"""Bucketed tables: shuffle-free co-located joins (100 TB north-star).

At scale the dominant cost of a fact⋈fact equi-join is shuffling both
sides on the key. Writing both tables bucketed (and sorted) by the
join key makes the join a zero-exchange sort-merge: each task reads
matching bucket files from both sides. ``assert_no_exchange`` is used
by tests to prove the plan property instead of trusting it.

Spark bucketing requires ``saveAsTable`` (bucket metadata lives in the
catalog); plain ``parquet(path)`` cannot carry it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (+sorted) catalog table."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    With matching bucket specs Catalyst plans SortMergeJoin with NO
    Exchange on either side — verify via ``assert_no_exchange``.
    AQE is bypassed for bucketed scans automatically.
    """
    return spark.table(left_table).join(spark.table(right_table), on)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the executed plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")
