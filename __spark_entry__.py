"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multi-operator pipeline at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator catalog from
``small_etl_spark.queries`` for the DuckDB correctness gate at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from small_etl_spark import queries as catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY §7.2 P0).

    One operator from every §2 family: rename (P1) → threshold filter
    (F1) → enrich-join by key (J1) → dedup first-wins (A3) → markers
    (P8) → sort (O1) → limit (F4).
    """
    from pyspark.sql import functions as F

    from small_etl_spark.operators.dedup import dedup_by_fields_first_wins
    from small_etl_spark.operators.joins import merge_with_previous
    from small_etl_spark.operators.projections import (
        add_processing_markers,
        rename_fields,
    )
    from small_etl_spark.operators.sort import top_k
    from small_etl_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    li = load_table(spark, sf_dir, "lineitem")
    api = rename_fields(
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
        {"l_orderkey": "id", "l_quantity": "qty", "l_extendedprice": "price"},
    )
    api = api.filter(F.col("qty") > 20)
    prev = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("order_total"),
        F.col("o_orderstatus").alias("status"),
    )
    merged = merge_with_previous(api, prev, key="id")
    deduped = dedup_by_fields_first_wins(
        merged, ["id"], order_col=["l_linenumber", "price"]
    )
    marked = add_processing_markers(deduped, "flagship")
    return top_k(marked, "order_total", 100, order="desc", tiebreak=["id"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ north-star)."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return catalog.oracle_sql()
