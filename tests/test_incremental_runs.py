"""Incremental sequence runs: fingerprint cache hits, chained
invalidation, shared-scalar replay."""

from __future__ import annotations

import copy

import pytest

from small_etl_spark.plans.spec import sequence_from_dict
from small_etl_spark.plans.sequencer import run_sequence

SAMPLE = [
    {"id": 1, "name": "Item 1", "value": 10},
    {"id": 2, "name": "Item 2", "value": 25},
    {"id": 3, "name": "Item 3", "value": 30},
]

SEQ = {
    "pipelines": [
        {
            "name": "extract",
            "source": {"type": "sample", "sample_data": SAMPLE},
            "transform": {"computed_fields": {"batch": "b1"}},
        },
        {
            "name": "enrich",
            "depends_on": ["extract"],
            "source": {"type": "previous", "previous_pipeline": "extract"},
            "transform": {"field_mapping": {"name": "label"}},
        },
    ]
}


def _hits(ctx):
    return [bool(r.metadata.get("cache_hit")) for r in ctx.results]


def test_second_run_hits_both_stages(spark, tmp_path):
    root = str(tmp_path / "inc")
    c1 = run_sequence(spark, sequence_from_dict(SEQ), incremental_root=root)
    assert _hits(c1) == [False, False]
    counts1 = [r.record_count for r in c1.results]
    c2 = run_sequence(spark, sequence_from_dict(SEQ), incremental_root=root)
    assert _hits(c2) == [True, True]
    assert [r.record_count for r in c2.results] == counts1
    # cached data equals recomputed data
    assert sorted(
        tuple(sorted(r.asDict().items())) for r in c2.results[1].df.collect()
    ) == sorted(
        tuple(sorted(r.asDict().items())) for r in c1.results[1].df.collect()
    )


def test_upstream_change_invalidates_chain(spark, tmp_path):
    root = str(tmp_path / "inc")
    run_sequence(spark, sequence_from_dict(SEQ), incremental_root=root)
    changed = copy.deepcopy(SEQ)
    changed["pipelines"][0]["transform"]["computed_fields"] = {"batch": "b2"}
    c = run_sequence(
        spark, sequence_from_dict(changed), incremental_root=root
    )
    # stage 1 changed -> both recompute (chained fingerprints)
    assert _hits(c) == [False, False]
    assert c.results[0].df.select("batch").distinct().first()[0] == "b2"
    # and the cache now holds the NEW result
    c2 = run_sequence(
        spark, sequence_from_dict(changed), incremental_root=root
    )
    assert _hits(c2) == [True, True]
    assert c2.results[0].df.select("batch").distinct().first()[0] == "b2"


def test_downstream_only_change_keeps_upstream_hit(spark, tmp_path):
    root = str(tmp_path / "inc")
    run_sequence(spark, sequence_from_dict(SEQ), incremental_root=root)
    changed = copy.deepcopy(SEQ)
    changed["pipelines"][1]["transform"]["field_mapping"] = {"name": "tag"}
    c = run_sequence(
        spark, sequence_from_dict(changed), incremental_root=root
    )
    assert _hits(c) == [True, False]
    assert "tag" in c.results[1].df.columns


def test_shared_exports_replayed_on_hit(spark, tmp_path):
    root = str(tmp_path / "inc")
    seq = {
        "pipelines": [
            {
                "name": "auth",
                "source": {
                    "type": "sample",
                    "sample_data": [{"token": "tk-123", "ttl": 60}],
                },
                "transform": {"shared_data_key": "auth"},
            }
        ]
    }
    c1 = run_sequence(spark, sequence_from_dict(seq), incremental_root=root)
    assert c1.shared_data.get("token") == "tk-123"
    c2 = run_sequence(spark, sequence_from_dict(seq), incremental_root=root)
    assert _hits(c2) == [True]
    assert c2.shared_data.get("token") == "tk-123"  # replayed, not re-run


def test_no_incremental_root_means_always_execute(spark, tmp_path):
    c1 = run_sequence(spark, sequence_from_dict(SEQ))
    c2 = run_sequence(spark, sequence_from_dict(SEQ))
    assert _hits(c1) == [False, False] and _hits(c2) == [False, False]
