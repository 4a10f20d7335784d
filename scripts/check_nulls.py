#!/usr/bin/env python3
"""Null-injection robustness sweep: every registry builder must run
against data where ~10% of every non-key column is NULL.

Parquet is nullable by default and upstream feeds WILL ship nulls —
a scraper that lost a text body, an event with no value, an embedding
row that failed to encode. JVM-side expressions are null-safe by
construction; the risk concentrates in Python kernels (a None inside
``np.array([list(v) ...])`` throws) and in join/window keys. This
sweep only asserts "no crash" — null SEMANTICS are pinned by the
oracle gate, which sees the same nulls on both engines. Usage:

    python scripts/check_nulls.py [name ...]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from small_etl_spark.queries import REGISTRY
from small_etl_spark.session import get_spark
from small_etl_spark.sources.tables import TABLES, load_table

SRC_SF = "/root/testdata/sf0.001"

# never null the primary/join keys — a feed that loses keys is a
# different failure class (constraint_report's job, not the operators')
KEEP = {
    "region": {"r_regionkey"},
    "nation": {"n_nationkey", "n_regionkey"},
    "customer": {"c_custkey", "c_nationkey"},
    "supplier": {"s_suppkey", "s_nationkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey", "o_custkey"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"},
    "events": {"event_id", "user_id", "ts"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
}


def make_nulled_dir(spark) -> str:
    d = tempfile.mkdtemp(prefix="sf_nulled_")
    import glob
    import shutil

    for t in TABLES:
        df = load_table(spark, SRC_SF, t)
        keep = KEEP.get(t, set())
        # deterministic 10%: md5 bucket of the row's first kept key
        key = next(iter(sorted(keep)), df.columns[0])
        mark = F.substring(
            F.md5(F.concat_ws("|", F.lit(t), F.col(key).cast("string")).cast("binary")),
            1,
            1,
        ).isin("0", "1")  # 2/16 ≈ 12.5%
        for c in df.columns:
            if c not in keep:
                df = df.withColumn(c, F.when(mark, F.lit(None)).otherwise(F.col(c)))
        tmp = os.path.join(d, f"__tmp_{t}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        shutil.copy(part, os.path.join(d, f"{t}.parquet"))
        shutil.rmtree(tmp)
    return d


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark("null-sweep", shuffle_partitions=4)
    d = make_nulled_dir(spark)
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
    print(f"\n{total - len(failed)}/{total} passed on nulled input")
    if failed:
        print("failed:", " ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
