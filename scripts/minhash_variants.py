#!/usr/bin/env python3
"""Head-to-head of minhash_lsh_pairs storage/structure schemes UNDER
BENCH CONDITIONS (same session, interleaved reps, noop sink, sf0.1).

r3 lazy persist = 0.96 s, r4 eager checkpoint = 1.4-1.6 s, r5 no
cache = 2.27-2.36 s in the judge's re-runs; each round's "fix" was
measured ad-hoc and didn't reproduce. This script interleaves ALL
variants rep-by-rep so host drift hits every variant equally, and
times exactly what bench.py times (builder + noop write).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, DataFrame, functions as F

from small_etl_spark.llm.dedup import (
    _ensure_parallelism,
    minhash_signature,
    word_shingles,
)
from small_etl_spark.session import get_spark
from small_etl_spark.sources.tables import load_table


def build(
    df: DataFrame,
    scheme: str,
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.8,
    seed: int = 42,
):
    """Rebuild minhash_lsh_pairs with a pluggable storage scheme.

    scheme:
      nocache    — r5 shipping code
      persist    — lazy MEMORY_AND_DISK persist of the shingle table (leaks)
      reshuffle  — repartition(sh, id): identical exchange on all three
                   consumers -> ReuseExchange computes shingles once
      bcastcand  — broadcast the deduped candidate pairs into both
                   verify joins (verify becomes two broadcast joins
                   over fresh scans instead of two shuffle joins)
      persist_sig — persist the banded (id, band, bucket) table instead
                   of the shingles (slim rows; verify still recomputes)
    Returns (result_df, cleanup_fn).
    """
    rpb = num_hashes // bands
    cleanup = lambda: None  # noqa: E731

    base = _ensure_parallelism(df).select(
        F.col("doc_id").alias("id"), F.col("text").alias("__t__")
    )
    sh = base.select("id", word_shingles("__t__", shingle_n).alias("sh"))

    if scheme == "persist":
        sh = sh.persist()
        cleanup = lambda: sh.unpersist(blocking=False)  # noqa: E731
    elif scheme == "reshuffle":
        sh = sh.repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), "id")

    def bucket_of(sig: Column, b: int) -> Column:
        joined = F.concat_ws(",", F.slice(sig, b * rpb + 1, rpb))
        return F.xxhash64(joined, F.lit(seed))

    p = (1 << 31) - 1
    sig_src = sh.withColumn(
        "__h__",
        F.transform(
            F.col("sh"), lambda x: F.pmod(F.xxhash64(x, F.lit(seed)), F.lit(p))
        ),
    )
    sig = minhash_signature(
        F.col("sh"), num_hashes, seed, "xxhash64", base_col=F.col("__h__")
    )
    banded = (
        sig_src.withColumn("sig", sig)
        .select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            bucket_of(F.col("sig"), b).alias("bucket"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        )
        .select(
            "id",
            F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
        )
    )
    if scheme == "persist_sig":
        banded = banded.persist()
        prev = cleanup
        cleanup = lambda: (prev(), banded.unpersist(blocking=False))  # noqa: E731

    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    if scheme == "bcastcand":
        cand = F.broadcast(cand)

    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    result = (
        cand.join(
            sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")),
            "id_a",
        )
        .join(
            sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")),
            "id_b",
        )
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return result, cleanup


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    schemes = (
        sys.argv[1].split(",")
        if len(sys.argv) > 1
        else ["nocache", "persist", "reshuffle", "bcastcand", "persist_sig"]
    )
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = get_spark("minhash-variants")

    # warm-up identical to bench.py: small-SF pass per variant
    warm = load_table(spark, "/root/testdata/sf0.001", "documents")
    for s in schemes:
        res, cln = build(warm, s)
        res.write.format("noop").mode("overwrite").save()
        cln()

    docs = load_table(spark, sf_dir, "documents")
    times: dict[str, list[float]] = {s: [] for s in schemes}
    counts: dict[str, int] = {}
    for rep in range(reps):
        for s in schemes:
            res, cln = build(docs, s)
            t0 = time.perf_counter()
            res.write.format("noop").mode("overwrite").save()
            times[s].append(time.perf_counter() - t0)
            cln()
        print(
            f"rep {rep}: "
            + " ".join(f"{s}={times[s][-1]:.3f}" for s in schemes),
            flush=True,
        )
    for s in schemes:
        res, cln = build(docs, s)
        counts[s] = res.count()
        cln()
    print("counts:", counts)
    print(
        "MIN:",
        {s: round(min(v), 3) for s, v in times.items()},
        "SPREAD:",
        {s: round(max(v) / min(v), 2) for s, v in times.items()},
    )


if __name__ == "__main__":
    main()
