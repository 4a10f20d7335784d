"""Anti-pattern guard: no ``.rdd`` anywhere in the package source.

Dropping a DataFrame to an RDD compiles the plan to an RDD lineage —
no Catalyst, no whole-stage codegen, per-row Python deserialization.
Round 4's verdict flagged the one remaining site (the fan-out
response-schema fallback in sources/http.py); it now infers via
driver-side sampling + JVM ``schema_of_json``/``from_json``. This test
keeps the invariant: future operators must use DataFrame/Arrow paths
(mapInPandas/applyInPandas) instead of ``df.rdd``."""

from __future__ import annotations

import ast
import os

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "small_etl_spark",
)


def test_no_rdd_in_package_source():
    hits = []
    for root, _dirs, files in os.walk(PKG):
        if "__pycache__" in root:
            continue
        for name in files:
            if not name.endswith(".py"):
                continue
            path = os.path.join(root, name)
            with open(path) as fh:
                tree = ast.parse(fh.read())
            for node in ast.walk(tree):
                if isinstance(node, ast.Attribute) and node.attr == "rdd":
                    hits.append(f"{path}:{node.lineno}")
    assert not hits, "RDD lineage in package source:\n" + "\n".join(hits)
