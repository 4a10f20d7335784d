"""Determinism under parallelism: query results must be IDENTICAL at
any shuffle-partition count.

On a real cluster the same job runs at 32, 200, or 2000 reducers
depending on the day; an operator whose output depends on partition
count (unstable first-wins, partition-dependent sampling, tie-breaks
left to arrival order) silently produces different corpora on
different clusters. The order-sensitive operators all carry explicit
total orders / content-hash rules precisely so this holds.
"""

from __future__ import annotations

import pytest

from small_etl_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"

# the operators whose semantics most depend on ordering/placement
QUERIES = [
    "dedup_first_wins",          # first-wins needs its explicit order
    "full_record_dedup",
    "top_k",                     # global top-k with tie-break
    "limit_sorted",
    "global_ordinal_docs",       # distributed rank
    "train_shuffle_shards",      # hash permutation + striping
    "equidepth_bins_orders",     # rank-derived bins
    "sessionize",                # per-user windows
    "minhash_lsh_dedup_md5",     # banded LSH
    "train_val_split",           # hash membership
    "reservoir_sample_docs",     # deterministic k-per-stratum
    "salted_agg",                # split-then-merge aggregation
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_to_shuffle_partitions(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        low = _rows(REGISTRY[name].builder(spark, SF_DIR))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        high = _rows(REGISTRY[name].builder(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert low == high
