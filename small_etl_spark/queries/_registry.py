"""Registry core for the query catalog.

``REGISTRY`` maps query name -> ``QuerySpec(builder, oracle, headline)``;
family modules populate it at import time via ``@register`` and
``small_etl_spark.queries.__init__`` imports them in gate order (the
driver's correctness gate reads the first 50 entries).

Duplicate names raise at import time: a silent dict overwrite cost the
catalog a query once (two ``grouping_sets_agg`` registrations — the
second shadowed the first until round 5 renamed it
``grouping_sets_flags``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    builder: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    headline: bool = False  # include in bench.py


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, headline: bool = False):
    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name!r}")
        REGISTRY[name] = QuerySpec(fn, oracle, headline)
        return fn

    return deco
