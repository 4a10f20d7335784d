#!/usr/bin/env python3
"""Headline-query timing harness for config/plan A/B experiments.

Usage:
    SPARK_GRAFT_EXP_CONF='{"spark.io.compression.codec": "zstd"}' \
        python scripts/exp_bench.py [--reps N] [name ...]

Same measurement discipline as bench.py (per-query untimed warmup at
the bench dir, then min-of-N noop sinks) but headline-only, no stress
sections, and with optional session-conf overrides from
$SPARK_GRAFT_EXP_CONF (JSON) so variants run in a fresh JVM each.
Prints one JSON line: {"conf": {...}, "total": s, "queries": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from small_etl_spark.queries import REGISTRY
from small_etl_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    conf = json.loads(os.environ.get("SPARK_GRAFT_EXP_CONF", "{}"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-bench", extra_conf=conf)

    names = args or [n for n, s in REGISTRY.items() if s.headline]

    # engine warmup (same shape as bench.py)
    from small_etl_spark.sources.tables import load_table

    warm = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    warm.groupBy("l_returnflag").count().write.format("noop").mode(
        "overwrite"
    ).save()
    for name in names:
        try:
            REGISTRY[name].builder(spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:  # noqa: BLE001
            pass

    timings: dict[str, float] = {}
    for name in names:
        spec = REGISTRY[name]
        try:
            # untimed warmup at the bench dir
            spec.builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                spec.builder(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
            timings[name] = round(best, 3)
        except Exception as exc:  # noqa: BLE001
            timings[name] = -1.0
            print(f"exp: {name} failed: {exc}", file=sys.stderr)

    total = round(sum(v for v in timings.values() if v > 0), 3)
    print(json.dumps({"conf": conf, "total": total, "queries": timings}))


if __name__ == "__main__":
    main()
