"""Empty-input robustness: operators must run (not throw) on 0-row
tables with production schemas — a new date partition, a filter that
matched nothing, a replay window with no files.

A representative query per family runs here; the FULL 157-query sweep
is ``scripts/check_empty.py`` (kept out of the default suite for
runtime). The three vectorized-embedding paths are pinned explicitly:
they collected 0 driver rows into (0,)-shaped numpy arrays and died on
``axis=1`` before the round-4 guards.
"""

from __future__ import annotations

import glob
import shutil

import pytest

from small_etl_spark.queries import REGISTRY
from small_etl_spark.sources.tables import TABLES, load_table

SRC_SF = "/root/testdata/sf0.001"

# one per operator family + the three historically-broken vectorized paths
SUBSET = [
    "rename_project",
    "json_path_extract",
    "threshold_filter",
    "dedup_first_wins",
    "merge_with_previous",
    "asof_join_events",
    "q1_pricing_summary",
    "sessionize",
    "top_k",
    "minhash_lsh_dedup_md5",
    "cosine_topk",
    "cosine_topk_vectorized",
    "ivf_ann_topk",
    "kmeans_clusters",
    "tfidf_top_terms",
    "train_val_split",
    "funnel_steps",
    "equidepth_bins_orders",
    "train_shuffle_shards",
    "event_transitions",
    "global_ordinal_docs",
    "scd2_customers",
    "quality_funnel",
    "grouping_sets_agg",
]


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        df = load_table(spark, SRC_SF, t)
        tmp = d / f"__tmp_{t}"
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(str(tmp))
        (part,) = glob.glob(str(tmp / "part-*.parquet"))
        shutil.copy(part, d / f"{t}.parquet")
        shutil.rmtree(tmp)
    return str(d)


@pytest.mark.parametrize("name", SUBSET)
def test_runs_on_empty_input(spark, empty_dir, name):
    REGISTRY[name].builder(spark, empty_dir).count()  # must not throw
