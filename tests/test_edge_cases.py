"""Empty-input and degenerate-shape hardening across operator families."""

from __future__ import annotations

from pyspark.sql import functions as F

from small_etl_spark.operators.dedup import (
    dedup_by_fields_first_wins,
    dedup_full_record,
)
from small_etl_spark.operators.filters import equality_filter, extract_filters
from small_etl_spark.operators.joins import asof_join, merge_with_previous
from small_etl_spark.operators.projections import keep_only_fields, rename_fields
from small_etl_spark.operators.sets import union_all_by_name
from small_etl_spark.operators.sort import top_k


def _empty(spark, schema="id long, v string"):
    return spark.createDataFrame([], schema)


def test_dedup_on_empty(spark):
    assert dedup_by_fields_first_wins(_empty(spark), ["id"]).count() == 0
    assert dedup_full_record(_empty(spark)).count() == 0


def test_filters_on_empty(spark):
    assert equality_filter(_empty(spark), {"id": 1}).count() == 0
    assert extract_filters(_empty(spark), {"v": ["a"]}).count() == 0


def test_projection_on_empty_and_all_missing(spark):
    df = _empty(spark)
    out = keep_only_fields(df, ["ghost1", "ghost2"])
    assert out.columns == [] and out.count() == 0
    assert rename_fields(df, {"nope": "x"}).columns == ["id", "v"]


def test_topk_beyond_size(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 3.0)], "id long, s double")
    assert top_k(df, "s", 100, tiebreak=["id"]).count() == 2


def test_union_of_empties_and_type_widening(spark):
    a = _empty(spark, "id long, v string")
    b = _empty(spark, "id long, w double")
    out = union_all_by_name([a, b])
    assert out.count() == 0
    assert set(out.columns) == {"id", "v", "w"}
    # conflicting types widen instead of erroring
    c = spark.createDataFrame([(1, 2)], "id long, v long")
    d = spark.createDataFrame([(2, "x")], "id long, v string")
    wide = union_all_by_name([c, d])
    assert wide.count() == 2
    assert dict(wide.dtypes)["v"] == "string"


def test_merge_with_empty_previous(spark):
    api = spark.createDataFrame([(1, 10.0)], "id long, total double")
    prev = _empty(spark, "id long, status string")
    out = merge_with_previous(api, prev, key="id").collect()
    assert len(out) == 1 and out[0].status is None


def test_asof_join_empty_right(spark):
    left = spark.createDataFrame([(1, 10, "a")], ["id", "ts", "k"])
    right = _empty(spark, "ts long, val string, k string")
    rows = asof_join(left, right, on="k", right_cols=["val"]).collect()
    assert len(rows) == 1 and rows[0].val_asof is None


def test_minhash_on_empty_and_blank_docs(spark):
    from small_etl_spark.llm.dedup import minhash_lsh_pairs

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real content here for matching")],
        ["doc_id", "text"],
    )
    # blank docs shingle to [''] and match each other as exact dups
    pairs = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(df, jaccard_threshold=0.9).collect()}
    assert pairs == {(1, 2)}


def test_sequencer_empty_stage_flows_through(spark):
    from small_etl_spark.plans.sequencer import run_sequence
    from small_etl_spark.plans.spec import sequence_from_dict

    seq = sequence_from_dict(
        {
            "pipelines": [
                {
                    "name": "empty",
                    "source": {
                        "type": "file",
                        "path": "/root/testdata/sf0.001/orders.parquet",
                        "filters": {"o_orderstatus": "NO_SUCH_STATUS"},
                    },
                },
                {
                    "name": "after",
                    "depends_on": ["empty"],
                    "source": {"type": "previous", "previous_pipeline": "empty"},
                },
            ]
        }
    )
    ctx = run_sequence(spark, seq)
    assert [r.record_count for r in ctx.results] == [0, 0]
    assert all(r.success for r in ctx.results)
