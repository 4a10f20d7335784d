#!/usr/bin/env python3
"""Per-stage profile of registry queries (guide §1.1: empirical loop).

Usage: python scripts/profile_query.py name [name ...] [--reps=N]

Runs each query with the noop sink and prints per-job/per-stage
wall-clock, task counts, and shuffle read/write bytes from the app
status store — the UI-less stand-in for the Stages tab.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from small_etl_spark.queries import REGISTRY
from small_etl_spark.session import get_spark


def stage_rows(spark):
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jvm = sc._jvm
    empty_doubles = sc._gateway.new_array(jvm.double, 0)
    it = store.stageList(
        jvm.java.util.ArrayList(), False, False, empty_doubles,
        jvm.java.util.ArrayList(),
    ).iterator()
    rows = []
    while it.hasNext():
        s = it.next()
        rows.append(
            {
                "stage": s.stageId(),
                "name": str(s.name())[:80],
                "tasks": s.numCompleteTasks(),
                "ms": (s.executorRunTime()),
                "cpu_ms": s.executorCpuTime() // 1_000_000,
                "sh_r": s.shuffleReadBytes(),
                "sh_w": s.shuffleWriteBytes(),
                "in": s.inputBytes(),
                "submitted": s.submissionTime(),
            }
        )
    return rows


def main() -> None:
    reps = 1
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        else:
            names.append(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    from small_etl_spark.sources.tables import load_table

    warm = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    warm.groupBy("l_returnflag").count().write.format("noop").mode(
        "overwrite"
    ).save()
    for name in names:
        spec = REGISTRY[name]
        # untimed warmup
        spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = None
        for _ in range(reps):
            before = {r["stage"] for r in stage_rows(spark)}
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            el = time.perf_counter() - t0
            if best is None or el < best:
                best = el
                time.sleep(0.3)  # let the listener queue drain
                after = [r for r in stage_rows(spark) if r["stage"] not in before]
        print(f"\n== {name}: {best:.3f}s wall ({reps} reps, best shown)")
        after.sort(key=lambda r: r["stage"])
        tot_ms = sum(r["ms"] for r in after)
        for r in after:
            print(
                f"  stage {r['stage']:>4} tasks={r['tasks']:>3} "
                f"run={r['ms']:>6}ms cpu={r['cpu_ms']:>6}ms "
                f"in={r['in']/1e6:7.2f}MB shR={r['sh_r']/1e6:6.2f}MB "
                f"shW={r['sh_w']/1e6:6.2f}MB  {r['name']}"
            )
        print(f"  total executor run-time {tot_ms}ms across {len(after)} stages")


if __name__ == "__main__":
    main()
