"""P1–P9 projection semantics, pinned to the reference's test suite
(nested/array paths: /root/reference/src/core/contextual_pipeline.rs:1346-1944)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from small_etl_spark.operators.projections import (
    add_processing_markers,
    computed_fields,
    default_fill,
    exclude_fields,
    keep_only_fields,
    map_nested_fields,
    nested_path_col,
    rename_fields,
)


@pytest.fixture(scope="module")
def nested_df(spark):
    # Shape mirrors FIXTURES.md F6/F7 (reference nested/array tests)
    data = [
        {
            "id": 1,
            "user": {
                "personal": {"name": "Ada", "age": 36},
                "contact": {"email": "ada@x.io", "phone": {"primary": "111"}},
            },
            "employees": [
                {"name": "e0", "skills": ["a", "b"]},
                {"name": "e1", "skills": []},
            ],
            "empty_arr": [],
        },
        {
            "id": 2,
            "user": {
                "personal": {"name": None, "age": None},
                "contact": {"email": None, "phone": {"primary": None}},
            },
            "employees": [],
            "empty_arr": [],
        },
    ]
    import json

    return spark.read.json(spark.sparkContext.parallelize([json.dumps(d) for d in data]))


def test_rename_skips_missing(spark):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    out = rename_fields(df, {"name": "title", "ghost": "boo"})
    assert out.columns == ["id", "title"]


def test_keep_only_skips_missing_and_orders(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], "id long, name string, v double")
    out = keep_only_fields(df, ["v", "id", "ghost"])
    assert out.columns == ["v", "id"]


def test_exclude_noop_on_missing(spark):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    assert exclude_fields(df, ["name", "ghost"]).columns == ["id"]


def test_nested_dot_path(nested_df):
    rows = nested_df.select(
        nested_path_col("user.personal.name").alias("n"),
        nested_path_col("user.contact.phone.primary").alias("p"),
    ).orderBy("n").collect()
    assert [r.n for r in rows] == [None, "Ada"]
    assert sorted([r.p for r in rows], key=lambda x: (x is None, x)) == ["111", None]


def test_array_index_positive_negative_oob(nested_df):
    row = (
        nested_df.filter(F.col("id") == 1)
        .select(
            nested_path_col("employees[0].name").alias("first"),
            nested_path_col("employees[-1].name").alias("last"),
            nested_path_col("employees[5].name").alias("oob"),
        )
        .first()
    )
    assert row.first == "e0"
    assert row.last == "e1"
    assert row.oob is None


def test_flatmap_star(nested_df):
    r1 = nested_df.filter(F.col("id") == 1).select(
        nested_path_col("employees[*].name").alias("names")
    ).first()
    assert r1.names == ["e0", "e1"]
    # empty array → [] (reference: empty stays empty, not null)
    r2 = nested_df.filter(F.col("id") == 2).select(
        nested_path_col("employees[*].name").alias("names")
    ).first()
    assert r2.names == []


def test_flatmap_skips_null_entries(spark):
    df = spark.createDataFrame(
        [Row(arr=[Row(v="a"), Row(v=None), Row(v="c")])],
    )
    out = df.select(nested_path_col("arr[*].v").alias("vs")).first()
    assert out.vs == ["a", "c"]


def test_map_nested_fields_keeps_originals(nested_df):
    out = map_nested_fields(
        nested_df.filter(F.col("id") == 1),
        {"user.personal.name": "full_name", "ghost.path": "skipped"},
    )
    assert "full_name" in out.columns and "user" in out.columns
    assert "skipped" not in out.columns
    assert out.first().full_name == "Ada"


def test_computed_fields_and_markers(spark):
    df = spark.createDataFrame([(3,), (1,), (2,)], "k long")
    out = computed_fields(
        df,
        {"idx": "record_index", "pn": "pipeline_name", "ex": "execution_id", "lit": "x"},
        pipeline_name="p1",
        execution_id="e1",
        order_by="k",
    )
    out = add_processing_markers(out, "p1")
    rows = out.orderBy("k").collect()
    assert [r.idx for r in rows] == [0, 1, 2]
    assert rows[0].pn == "p1" and rows[0].ex == "e1" and rows[0].lit == "x"
    assert rows[0].processed is True and rows[0].processed_by == "p1"


def test_default_fill_existing_and_absent(spark):
    df = spark.createDataFrame([(1, None), (2, "b")], "id long, name string")
    out = default_fill(df, {"name": "Unknown", "value": 0})
    rows = {r.id: r for r in out.collect()}
    assert rows[1].name == "Unknown" and rows[2].name == "b"
    assert rows[1].value == 0
