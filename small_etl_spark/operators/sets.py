"""Set operators (SURVEY §2.8, U1–U2) — heterogeneous union.

- U1 union-all of stages — /root/reference/src/app/pipelines/sequence_pipeline.rs:49-54
- U2 previous + API      — /root/reference/src/core/contextual_pipeline.rs:34-91

The reference concatenates ``Vec<Record>`` with heterogeneous,
schemaless rows. Spark needs schema reconciliation: ``unionByName``
with ``allowMissingColumns`` handles disjoint columns; conflicting
*types* for the same name (JSON Number vs String) are widened to
string — mirroring the reference, which stringifies everything at
output anyway (SURVEY §7.3).

Union is a zero-shuffle operator: partitions concatenate.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

_NUMERIC_WIDEN = {
    frozenset({"tinyint", "smallint"}): "smallint",
    frozenset({"tinyint", "int"}): "int",
    frozenset({"smallint", "int"}): "int",
    frozenset({"tinyint", "bigint"}): "bigint",
    frozenset({"smallint", "bigint"}): "bigint",
    frozenset({"int", "bigint"}): "bigint",
    frozenset({"float", "double"}): "double",
    frozenset({"int", "double"}): "double",
    frozenset({"bigint", "double"}): "double",
    frozenset({"int", "float"}): "double",
    frozenset({"bigint", "float"}): "double",
}


def _widen(sa: str, sb: str) -> str:
    """Pick a common type name for two conflicting column type names."""
    if sa == sb:
        return sa
    key = frozenset({sa, sb})
    if key in _NUMERIC_WIDEN:
        return _NUMERIC_WIDEN[key]
    return "string"


def union_all_by_name(dfs: list[DataFrame]) -> DataFrame:
    """U1: union-all with missing-column fill and type widening."""
    if not dfs:
        raise ValueError("union_all_by_name requires at least one DataFrame")
    if len(dfs) == 1:
        return dfs[0]
    # Resolve one target type name per column name across all inputs.
    target: dict[str, str] = {}
    for df in dfs:
        for f in df.schema.fields:
            s = f.dataType.simpleString()
            target[f.name] = _widen(target[f.name], s) if f.name in target else s
    aligned = []
    for df in dfs:
        casts = {
            f.name: F.col(f.name).cast(target[f.name])
            for f in df.schema.fields
            if f.dataType.simpleString() != target[f.name]
        }
        aligned.append(df.withColumns(casts) if casts else df)
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), aligned)
