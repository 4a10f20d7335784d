"""Ledger-doc drift guard (VERDICT r4 item 8): the query/rows-only
counts quoted in SURVEY.md, CATALOG.md and README.md must match
``len(REGISTRY)`` — the docs are the round-over-round ledger, and r3/r4
both shipped stale counts. A count appears in exactly one pinned
sentence per file so this can assert on the literal text."""

from __future__ import annotations

import os
import re

from small_etl_spark.queries import REGISTRY, oracle_sql

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(name: str) -> str:
    with open(os.path.join(REPO, name)) as fh:
        return fh.read()


def test_counts_are_consistent():
    total = len(REGISTRY)
    oracled = len(oracle_sql())
    rows_only = total - oracled

    survey = _read("SURVEY.md")
    m = re.search(
        r"Coverage count: (\d+) registry queries, (\d+) DuckDB-oracled "
        r"\((\d+) rows-only", survey)
    assert m, "SURVEY.md coverage-count sentence missing"
    assert tuple(map(int, m.groups())) == (total, oracled, rows_only), (
        f"SURVEY.md says {m.groups()}, registry has "
        f"({total}, {oracled}, {rows_only})"
    )

    catalog = _read("CATALOG.md")
    m = re.search(r"\((\d+) queries\)|wrote CATALOG", catalog)
    rows = len(re.findall(r"^\| \d+ \| `", catalog, re.M))
    assert rows == total, f"CATALOG.md has {rows} rows, registry {total}"

    readme = _read("README.md")
    m = re.search(r"`queries\(\)` \((\d+) named operators", readme)
    assert m, "README.md queries() sentence missing"
    assert int(m.group(1)) == total, (
        f"README.md says {m.group(1)}, registry has {total}"
    )
