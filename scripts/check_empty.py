#!/usr/bin/env python3
"""Empty-input robustness sweep: every registry builder must analyze
AND execute against zero-row tables with the production schemas.

A 100 TB pipeline routinely meets empty inputs — a new date partition,
a filter that matched nothing, a replay window with no files. An
operator that throws on 0 rows turns "no data yet" into a paged
incident. Usage:

    python scripts/check_empty.py [name ...]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from small_etl_spark.queries import REGISTRY
from small_etl_spark.session import get_spark
from small_etl_spark.sources.tables import TABLES, load_table

SRC_SF = "/root/testdata/sf0.001"


def make_empty_dir(spark) -> str:
    d = tempfile.mkdtemp(prefix="sf_empty_")
    for t in TABLES:
        df = load_table(spark, SRC_SF, t)
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(f"{d}/__tmp_{t}")
        # the loaders expect <table>.parquet files; grab the single part
        import glob
        import shutil

        (part,) = glob.glob(f"{d}/__tmp_{t}/part-*.parquet")
        shutil.copy(part, f"{d}/{t}.parquet")
        shutil.rmtree(f"{d}/__tmp_{t}")
    return d


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark("empty-sweep", shuffle_partitions=4)
    d = make_empty_dir(spark)
    failed = []
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            n = spec.builder(spark, d).count()
            print(f"ok    {name}: rows={n} [{time.perf_counter()-t0:.1f}s]")
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            msg = f"{type(exc).__name__}: {exc}"[:200].replace("\n", " ")
            print(f"FAIL  {name}: {msg}")
    total = len(only) if only else len(REGISTRY)
    print(f"\n{total - len(failed)}/{total} passed on empty input")
    if failed:
        print("failed:", " ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
