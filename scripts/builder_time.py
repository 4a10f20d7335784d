#!/usr/bin/env python3
"""Split each headline query's bench time into Python-side plan
construction ("builder": py4j chatter building the DataFrame) vs
execution (noop sink on the pre-built DataFrame).

Usage: python scripts/builder_time.py [--reps=N] [name ...]
Prints one line per query: name, build_ms (min of reps), exec_ms (min).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from small_etl_spark.queries import REGISTRY
from small_etl_spark.session import get_spark


def main() -> None:
    reps = 3
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        else:
            names.append(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("builder-time")
    names = names or [n for n, s in REGISTRY.items() if s.headline]

    # warmup: build + run each once untimed
    for name in names:
        df = REGISTRY[name].builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()

    out = []
    for name in names:
        builds, execs = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = REGISTRY[name].builder(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        out.append((name, min(builds) * 1000, min(execs) * 1000))
    out.sort(key=lambda r: -r[1])
    for name, b, e in out:
        print(f"{name:32s} build {b:7.1f} ms   exec {e:7.1f} ms")


if __name__ == "__main__":
    main()
