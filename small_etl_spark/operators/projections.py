"""Projection / column operators (SURVEY §2.3, P1–P9).

Reference semantics re-expressed declaratively:

- P1 rename          — /root/reference/src/app/pipelines/mvp_pipeline.rs:85-96
- P2 nested paths    — /root/reference/src/core/contextual_pipeline.rs:681-836
- P3 array indexing  — /root/reference/src/core/contextual_pipeline.rs:746-815
- P4 ``[*]`` flatmap — /root/reference/src/core/contextual_pipeline.rs:762-780
- P5 keep-only       — /root/reference/src/core/contextual_pipeline.rs:901-924
- P6 exclude         — /root/reference/src/core/contextual_pipeline.rs:926-945
- P7 computed fields — /root/reference/src/core/contextual_pipeline.rs:964-977
- P8 markers         — /root/reference/src/core/contextual_pipeline.rs:981-987
- P9 default-fill    — /root/reference/src/app/pipelines/simple_pipeline.rs:88-100

All are single-pass narrow transformations (no shuffle) that fuse into
one whole-stage-codegen span; at 100 TB they cost one scan.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F


def rename_fields(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P1: rename columns per ``{source: target}``; unmapped pass through.

    Missing source columns are silently skipped (reference behavior:
    mapping is applied per-record key lookup, absent keys no-op).
    """
    existing = set(df.columns)
    renames = {a: b for a, b in mapping.items() if a in existing}
    return df.withColumnsRenamed(renames) if renames else df


_PATH_TOKEN = re.compile(r"([^.\[\]]+)|\[(\*|-?\d+)\]")


def _parse_path(path: str) -> list[str | int | None]:
    """Tokenize ``a.b[0].c[*]`` → ['a', 'b', 0, 'c', None] (None = [*])."""
    tokens: list[str | int | None] = []
    for name, idx in _PATH_TOKEN.findall(path):
        if name:
            tokens.append(name)
        elif idx == "*":
            tokens.append(None)
        else:
            tokens.append(int(idx))
    return tokens


def nested_path_col(path: str) -> Column:
    """P2/P3/P4: build a Column navigating a dot/bracket path.

    - ``user.profile.name``      → struct field access
    - ``employees[0].name``      → ``element_at`` (1-based; negative = from end)
    - ``employees[-1].name``     → last element
    - ``employees[*].name``      → array of each element's field, with
      null entries skipped (reference skips non-object/missing entries,
      contextual_pipeline.rs:762-780) and empty array preserved as [].

    Out-of-bounds index → null (``element_at`` with try semantics).
    """
    tokens = _parse_path(path)
    col: Column | None = None

    def field(c: Column | None, name: str) -> Column:
        return F.col(name) if c is None else c.getField(name)

    i = 0
    while i < len(tokens):
        tok = tokens[i]
        if tok is None:
            # [*] flat-map: apply the remaining path inside transform()
            rest = tokens[i + 1 :]
            if col is None:  # pragma: no cover - '[*]' can't lead a path
                raise ValueError("path cannot start with [*]")

            def make_apply(rest_tokens):
                def apply_rest(x: Column) -> Column:
                    c = x
                    for t in rest_tokens:
                        if t is None:
                            raise ValueError(
                                "nested [*] within [*] not supported; "
                                "use flatten() composition"
                            )
                        c = _element(c, t) if isinstance(t, int) else c.getField(t)
                    return c

                return apply_rest

            mapped = F.transform(col, make_apply(rest))
            # reference skips null/non-object entries in [*]
            return F.filter(mapped, lambda x: x.isNotNull())
        if isinstance(tok, int):
            col = _element(col, tok)
        else:
            col = field(col, tok)
        i += 1
    assert col is not None
    return col


def _element(arr: Column, idx: int) -> Column:
    """0-based indexing with negative-from-end, null when out of bounds.

    ``element_at`` is 1-based and *errors* on 0; ``try_element_at``
    nulls on out-of-bounds, matching the reference's None.
    """
    one_based = idx + 1 if idx >= 0 else idx
    return F.try_element_at(arr, F.lit(one_based))


def map_nested_fields(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P2: add ``target`` columns extracted from nested paths.

    Original top-level columns are retained (reference keeps unmapped
    keys, contextual_pipeline.rs:536-544). Paths whose root column is
    absent are skipped.
    """
    cols = dict.fromkeys(df.columns)
    out = df
    new_cols: dict[str, Column] = {}
    for path, target in mapping.items():
        root = _parse_path(path)[0]
        if isinstance(root, str) and root in cols:
            new_cols[target] = nested_path_col(path)
        elif isinstance(root, str) and root not in cols:
            continue
    return out.withColumns(new_cols) if new_cols else out


def keep_only_fields(df: DataFrame, fields: list[str]) -> DataFrame:
    """P5: project to the listed columns; missing names silently skipped.

    Takes precedence over exclude (caller's dispatch, matching
    contextual_pipeline.rs:901-924). Column pruning reaches the scan.
    """
    wanted = [c for c in fields if c in set(df.columns)]
    return df.select(*wanted)


def exclude_fields(df: DataFrame, fields: list[str]) -> DataFrame:
    """P6: drop the listed columns (absent names are no-ops)."""
    return df.drop(*fields)


def computed_fields(
    df: DataFrame,
    spec: dict[str, str],
    *,
    pipeline_name: str = "",
    execution_id: str = "",
    order_by: str | None = None,
) -> DataFrame:
    """P7: add computed columns.

    Expression keys (contextual_pipeline.rs:964-977):
    ``record_index`` (input ordinal), ``pipeline_name``,
    ``execution_id``; anything else is a literal string.

    ``record_index`` needs a total order; pass ``order_by`` for a
    deterministic one. The exact 0..n-1 sequence comes from
    ``operators.sort.global_ordinal`` (range-partition + prefix
    offsets — partition-parallel), never an unpartitioned
    ``row_number()`` window; prefer ``monotonically_increasing_id``
    when the exact sequence is not required.
    """
    out = df
    for name, expr in spec.items():
        if expr == "record_index":
            if order_by is not None:
                from small_etl_spark.operators.sort import global_ordinal

                out = global_ordinal(out, [order_by], ordinal_col=name)
            else:
                out = out.withColumn(name, F.monotonically_increasing_id())
        elif expr == "pipeline_name":
            out = out.withColumn(name, F.lit(pipeline_name))
        elif expr == "execution_id":
            out = out.withColumn(name, F.lit(execution_id))
        else:
            out = out.withColumn(name, F.lit(expr))
    return out


def add_processing_markers(df: DataFrame, pipeline_name: str | None = None) -> DataFrame:
    """P8: ``processed = true`` (+ ``processed_by`` in contextual mode)."""
    out = df.withColumn("processed", F.lit(True))
    if pipeline_name is not None:
        out = out.withColumn("processed_by", F.lit(pipeline_name))
    return out


def default_fill(df: DataFrame, defaults: dict[str, object]) -> DataFrame:
    """P9: replace nulls with per-column defaults; absent columns are added.

    Reference substitutes at use-sites (``unwrap_or(0)`` etc.,
    simple_pipeline.rs:88-100); we materialize it as ``coalesce``.
    """
    existing = set(df.columns)
    cols = {}
    for name, default in defaults.items():
        if name in existing:
            cols[name] = F.coalesce(F.col(name), F.lit(default))
        else:
            cols[name] = F.lit(default)
    return df.withColumns(cols)
