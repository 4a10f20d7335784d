"""SQL over versioned tables, with time travel.

``sql(spark, query, tables={...})`` runs a Spark SQL statement whose
FROM/JOIN references name versioned tables (sinks/versioned.py roots)
and may carry the standard time-travel suffixes::

    SELECT ... FROM docs VERSION AS OF 3 ...
    SELECT ... FROM docs TIMESTAMP AS OF '2026-08-16T00:00:00' ...
    SELECT d.*, e.v FROM docs d JOIN events VERSION AS OF 0 e ON ...

Each referenced (table, version) resolves through
``read_snapshot`` — so manifest planning, column-id resolution, MoR
deletes, equality deletes and hidden partitioning all apply exactly as
they do for the DataFrame API — and is registered as a throwaway temp
view; the rewritten statement then runs on Spark's own SQL engine
(Catalyst sees the whole statement, so joins/aggregations across
snapshots optimize as one plan). Views are dropped before returning;
the returned DataFrame's analyzed plan keeps serving.

With ``catalog_root`` (see versioned.catalog_commit), bare table names
resolve to the versions THAT CATALOG SNAPSHOT pinned — mutually
consistent cross-table reads — while explicit ``VERSION AS OF``
still overrides per reference.

Scope (documented, not hidden): table references are recognized after
``FROM``/``JOIN`` only, so a subquery alias shadowing a registered
table name would be rewritten too — choose distinct names. Text
inside string literals is never rewritten (quoted spans are skipped).
This is a resolver in front of Spark SQL, not a SQL parser;
everything after resolution is Catalyst's.

Reference parity note: the reference has no SQL at all (row-at-a-time
Rust transforms, contextual_pipeline.rs:879-1121); this front-end is
engine-side extension surface making the versioned layer usable from
plain SQL, the Delta/Iceberg ``table@v``/``AS OF`` UX."""

from __future__ import annotations

import re
import uuid
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from small_etl_spark.sinks import versioned as V


def _ts_to_ms(raw: str) -> int:
    if raw.isdigit():
        return int(raw)
    # 'Z' suffix: fromisoformat only learned it in Python 3.11
    if raw.endswith(("Z", "z")):
        raw = raw[:-1] + "+00:00"
    dt = datetime.fromisoformat(raw)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def sql(
    spark: SparkSession,
    query: str,
    tables: dict[str, str] | None = None,
    catalog_root: str | None = None,
    catalog_version: int | None = None,
) -> DataFrame:
    """Run ``query`` with versioned-table name resolution + AS OF."""
    tables = dict(tables or {})
    if catalog_root is not None:
        cv = (
            V.latest_version(catalog_root)
            if catalog_version is None
            else catalog_version
        )
        if cv is None:
            raise FileNotFoundError(
                f"no catalog commits at {catalog_root!r}"
            )
        pinned: dict[str, dict[str, Any]] = V.read_manifest(
            catalog_root, cv
        )["tables"]
        for name, entry in pinned.items():
            tables.setdefault(name, entry["table"])
    else:
        pinned = {}
    if not tables:
        raise ValueError("sql() needs tables={{name: root}} or a catalog")

    names = "|".join(
        re.escape(n) for n in sorted(tables, key=len, reverse=True)
    )
    pat = re.compile(
        rf"\b(FROM|JOIN)\s+({names})"
        r"(?:\s+VERSION\s+AS\s+OF\s+(\d+)"
        r"|\s+TIMESTAMP\s+AS\s+OF\s+(?:'([^']+)'|(\d+)))?(?![\w.])",
        re.IGNORECASE,
    )
    views: list[str] = []
    # string-literal spans ('' / "" escapes respected): a FROM/JOIN
    # that merely appears INSIDE a literal (WHERE note = 'copied from
    # docs archive') must not be rewritten — it is data, not syntax.
    # Matches are checked by START position, so a real time-travel
    # reference whose own timestamp literal follows still rewrites.
    spans = [
        (m.start(), m.end())
        for m in re.finditer(
            r"'(?:[^']|'')*'|\"(?:[^\"]|\"\")*\"", query
        )
    ]

    def _repl(m: re.Match) -> str:
        if any(s <= m.start() < e for s, e in spans):
            return m.group(0)
        kw, name, ver, ts_s, ts_n = m.groups()
        root = tables[name]
        if ver is not None:
            version: int | None = int(ver)
        elif ts_s is not None or ts_n is not None:
            version = V.version_as_of(root, _ts_to_ms(ts_s or ts_n))
        elif name in pinned:
            version = pinned[name]["version"]
        else:
            version = None  # head
        view = f"__vsql_{uuid.uuid4().hex[:12]}"
        V.read_snapshot(spark, root, version=version).createOrReplaceTempView(
            view
        )
        views.append(view)
        return f"{kw} {view}"

    rewritten = pat.sub(_repl, query)
    try:
        return spark.sql(rewritten)
    finally:
        for v in views:
            spark.catalog.dropTempView(v)
