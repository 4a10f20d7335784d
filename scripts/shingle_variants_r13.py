#!/usr/bin/env python3
"""Round-13 shingle-stage variants — the A/B evidence behind the two
word_shingles rewrites (OPTIMIZATION_r13.md, minhash section).

Usage: python scripts/shingle_variants_r13.py [--reps=N]

Times four forms of the (id, sh) shingle table at sf0.1, interleaved
min-of-N noop sinks, and asserts all four exceptAll-identical:
  A  pre-r13: toks subtree inline in size() AND the sliding lambda
  B  two-projection: tokens materialized as a column first
  C  lambda-bound tokens (r13 commit a7ad6ab)
  D  C + element_at windows (r13 commit 61b9915 — the shipped form)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from small_etl_spark.session import get_spark
from small_etl_spark.sources.tables import load_table
from small_etl_spark.llm.dedup import _word_shingles_sql
from small_etl_spark.llm.util import ensure_parallelism
from small_etl_spark.llm.textstats import WORD_RE

TOKS = f"regexp_extract_all(lower(__t__), '{WORD_RE}', 0)"
FORMS = {
    "A_pre_r13": (
        "array_distinct(transform(sequence(1, greatest(size({t})"
        " - 2, 1)), i -> concat_ws(' ', slice({t}, i, 3))))"
    ).format(t=TOKS),
    "B_two_proj": None,  # built structurally below
    "C_lambda_bound": (
        "element_at(transform(array({t}), tk -> "
        "array_distinct(transform(sequence(1, greatest(size(tk) - 2, 1)),"
        " i -> concat_ws(' ', slice(tk, i, 3))))), 1)"
    ).format(t=TOKS),
    "D_shipped": None,  # the live _word_shingles_sql
}


def build(spark, sf_dir, form):
    base = ensure_parallelism(
        load_table(spark, sf_dir, "documents")
    ).selectExpr("doc_id as id", "text as __t__")
    if form == "B_two_proj":
        toks = base.selectExpr("id", f"{TOKS} as __tk__")
        return toks.selectExpr(
            "id",
            "array_distinct(transform(sequence(1, greatest(size(__tk__)"
            " - 2, 1)), i -> concat_ws(' ', slice(__tk__, i, 3)))) as sh",
        )
    if form == "D_shipped":
        return base.selectExpr(
            "id", f"{_word_shingles_sql('__t__', 3)} as sh"
        )
    return base.selectExpr("id", f"{FORMS[form]} as sh")


def main() -> None:
    reps = 5
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("shingle-variants")
    names = list(FORMS)
    ref = build(spark, sf_dir, "D_shipped")
    for n in names:
        df = build(spark, sf_dir, n)
        assert df.exceptAll(ref).count() == 0 and ref.exceptAll(df).count() == 0, n
        df.write.format("noop").mode("overwrite").save()  # warm
    res = {n: [] for n in names}
    for _ in range(reps):
        for n in names:
            t0 = time.perf_counter()
            build(spark, sf_dir, n).write.format("noop").mode(
                "overwrite"
            ).save()
            res[n].append(time.perf_counter() - t0)
    for n in names:
        print(f"{n:16s} min={min(res[n]):.3f}s  reps={[round(x,3) for x in res[n]]}")


if __name__ == "__main__":
    main()
