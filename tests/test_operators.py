"""Filters, dedup, sort, sets, joins, validation semantics
(reference goldens: simple_pipeline.rs / contextual_pipeline.rs / sequence_pipeline.rs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from small_etl_spark.operators.dedup import (
    dedup_by_fields_first_wins,
    dedup_full_record,
)
from small_etl_spark.operators.filters import (
    equality_filter,
    extract_filters,
    limit_records,
    threshold_filter,
)
from small_etl_spark.operators.joins import (
    lookup_enrich,
    lookup_enrich_stub,
    merge_with_previous,
)
from small_etl_spark.operators.sets import union_all_by_name
from small_etl_spark.operators.sort import sort_by_field, top_k
from small_etl_spark.operators.validation import (
    ValidationError,
    ValidationSpec,
    validate_frame,
)


def test_threshold_filter_is_side_output(spark):
    # reference golden: value > 20 selects 2 of 3 (pipeline.rs:283-330)
    df = spark.createDataFrame(
        [(1, "Item 1", 10), (2, "Item 2", 25), (3, "Item 3", 30)],
        "id long, name string, value long",
    )
    inter = threshold_filter(df, "value", 20)
    assert {r.id for r in inter.collect()} == {2, 3}
    assert df.count() == 3  # full output untouched


def test_equality_filter_missing_field_matches_nothing(spark):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    assert equality_filter(df, {"ghost": "x"}).count() == 0
    assert equality_filter(df, {"name": "a", "id": 1}).count() == 1
    assert equality_filter(df, {}).count() == 1


def test_extract_filters_membership(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, t string")
    assert extract_filters(df, {"t": ["a", "c"]}).count() == 2
    assert extract_filters(df, {"t": "b", "id": 2}).count() == 1


def test_limit_and_first_record_only(spark):
    df = spark.range(10)
    assert limit_records(df, max_records=3).count() == 3
    assert limit_records(df, first_record_only=True).count() == 1
    assert limit_records(df).count() == 10


def test_dedup_first_wins(spark):
    # reference: first occurrence retained (contextual_pipeline.rs:614-629)
    df = spark.createDataFrame(
        [(0, 1, "first"), (1, 1, "second"), (2, 2, "only")],
        "ord long, key long, tag string",
    )
    out = dedup_by_fields_first_wins(df, ["key"], order_col="ord")
    got = {r.key: r.tag for r in out.collect()}
    assert got == {1: "first", 2: "only"}


def test_dedup_missing_field_treated_as_empty(spark):
    df = spark.createDataFrame([(0, "a"), (1, "b")], "ord long, v string")
    # dedup on a column that doesn't exist → all rows share key "" → 1 row
    out = dedup_by_fields_first_wins(df, ["ghost"], order_col="ord")
    rows = out.collect()
    assert len(rows) == 1 and rows[0].v == "a"
    assert "ghost" not in out.columns


def test_dedup_full_record(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "id long, v string")
    assert dedup_full_record(df).count() == 2


def test_sort_null_placement(spark):
    df = spark.createDataFrame([(1,), (None,), (3,)], "v int")
    asc = [r.v for r in sort_by_field(df, "v", "asc").collect()]
    desc = [r.v for r in sort_by_field(df, "v", "desc").collect()]
    assert asc == [1, 3, None]  # nulls last ascending
    assert desc == [None, 3, 1]  # nulls first descending


def test_sort_lexicographic_mode(spark):
    # reference compares JSON-rendered strings: 10 < 9 lexicographically
    df = spark.createDataFrame([(10,), (9,), (100,)], "v int")
    lex = [r.v for r in sort_by_field(df, "v", "asc", lexicographic=True).collect()]
    assert lex == [10, 100, 9]


def test_top_k_deterministic_with_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 1.0)], "id long, score double"
    )
    out = top_k(df, "score", 2, tiebreak=["id"]).collect()
    assert [r.id for r in out] == [1, 2]


def test_union_by_name_missing_cols_and_widening(spark):
    a = spark.createDataFrame([(1, "x", 1.5)], "id int, name string, v double")
    b = spark.createDataFrame([(2, 7)], "id bigint, v int")
    out = union_all_by_name([a, b])
    schema = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert schema["id"] == "bigint"  # int widened to bigint
    assert schema["v"] == "double"  # int widened to double
    rows = {r.id: r for r in out.collect()}
    assert rows[2].name is None and rows[2].v == 7.0


def test_union_type_conflict_falls_back_to_string(spark):
    a = spark.createDataFrame([(1,)], "v int")
    b = spark.createDataFrame([("x",)], "v string")
    out = union_all_by_name([a, b])
    assert out.schema.fields[0].dataType.simpleString() == "string"
    assert {r.v for r in out.collect()} == {"1", "x"}


def test_merge_with_previous_api_wins(spark):
    # pinned to sequence_pipeline.rs:77-108: api value wins, prev fills
    # nulls, unmatched api rows pass through, prev-only columns appended
    api = spark.createDataFrame(
        [(1, "api-name", None), (2, None, 20.0), (99, "orphan", 5.0)],
        "id long, name string, score double",
    )
    prev = spark.createDataFrame(
        [(1, "prev-name", 10.0, "extra1"), (2, "prev-2", 99.0, "extra2")],
        "id long, name string, score double, extra string",
    )
    out = {r.id: r for r in merge_with_previous(api, prev, key="id").collect()}
    assert out[1].name == "api-name"  # api wins
    assert out[1].score == 10.0  # prev fills null
    assert out[2].name == "prev-2"  # prev fills null
    assert out[2].score == 20.0  # api wins
    assert out[99].name == "orphan" and out[99].extra is None  # unmatched survives
    assert out[1].extra == "extra1"  # prev-only column appended


def test_lookup_enrich_stub_exact(spark):
    df = spark.createDataFrame([(1, "rome"), (2, None)], "id long, city string")
    out = {r.id: r for r in lookup_enrich_stub(df, {"city": "city_e"}).collect()}
    assert out[1].city_e == "enriched_rome"
    assert out[2].city_e is None


def test_lookup_enrich_broadcast_join(spark):
    facts = spark.createDataFrame([(1, 100), (2, 200)], "k long, v long")
    dim = spark.createDataFrame([(1, "one")], "k long, label string")
    out = {r.k: r for r in lookup_enrich(facts, dim, on="k").collect()}
    assert out[1].label == "one" and out[2].label is None
    # explicit broadcast=True forces the hint; the default leaves the
    # strategy to Catalyst/AQE (a forced hint on a big dim would OOM)
    plan = (
        lookup_enrich(facts, dim, on="k", broadcast=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_validation_enforced(spark):
    df = spark.createDataFrame([(1, "a")], "id bigint, name string")
    validate_frame(
        df,
        ValidationSpec(
            required_fields=["id", "name"],
            field_types={"id": "bigint"},
            min_records=1,
            max_records=5,
        ),
    )
    with pytest.raises(ValidationError, match="missing required"):
        validate_frame(df, ValidationSpec(required_fields=["ghost"]))
    with pytest.raises(ValidationError, match="has type"):
        validate_frame(df, ValidationSpec(field_types={"id": "string"}))
    with pytest.raises(ValidationError, match="min_records"):
        validate_frame(df, ValidationSpec(min_records=2))


def test_asof_join_semantics(spark):
    """Backward as-of: greatest right ts <= left ts per key; equal ts
    matches (inclusive); no right row before -> nulls."""
    from small_etl_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "a"), (3, 5, "b"), (4, 30, "a")],
        ["id", "ts", "k"],
    )
    right = spark.createDataFrame(
        [(10, "x", "a"), (20, "y", "a"), (25, "z", "a"), (50, "w", "b")],
        ["ts", "val", "k"],
    )
    out = {
        r.id: r.val_asof
        for r in asof_join(left, right, on="k", right_cols=["val"]).collect()
    }
    assert out == {1: "x", 2: "y", 4: "z", 3: None}


def test_upsert_merge_semantics(spark):
    """SCD-1: matched keys replaced, new keys inserted, others pass
    through; schema mismatch is an error, not silent column loss."""
    import pytest as _pytest

    from small_etl_spark.operators.joins import upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "name", "v"]
    )
    updates = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], ["id", "name", "v"]
    )
    got = {r.id: (r.name, r.v) for r in upsert(target, updates, "id").collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}

    with _pytest.raises(ValueError, match="missing target columns"):
        upsert(target, updates.drop("v"), "id")


def test_packed_dedup_matches_minby_on_lineitem(spark):
    """Round-12 pin: the bit-packed first-wins path equals the
    min_by(struct) path row-for-row on real data, same schema."""
    from small_etl_spark.operators.dedup import (
        dedup_by_fields_first_wins,
        dedup_by_fields_first_wins_packed,
    )
    from small_etl_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber", "l_quantity"
    )
    a = dedup_by_fields_first_wins(
        li, ["l_orderkey"],
        order_col=["l_linenumber", "l_partkey", "l_quantity"],
    )
    b = dedup_by_fields_first_wins_packed(
        li, ["l_orderkey"],
        [("l_linenumber", 8), ("l_partkey", 47), ("l_quantity", 8)],
    )
    assert a.schema == b.schema
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_packed_dedup_contract_violations_raise(spark):
    """Width overflow, negatives and fractional doubles must raise
    loudly — never silently pick a wrong survivor."""
    import pytest as _pytest

    from small_etl_spark.operators.dedup import (
        dedup_by_fields_first_wins_packed,
    )

    for rows, schema in (
        ([(1, 300)], "k bigint, v bigint"),      # > 2^8
        ([(1, -1)], "k bigint, v bigint"),       # negative
        ([(1, 2.5)], "k bigint, v double"),      # fractional
        ([(1, None)], "k bigint, v bigint"),     # null payload
    ):
        df = spark.createDataFrame(rows, schema)
        with _pytest.raises(Exception):
            dedup_by_fields_first_wins_packed(df, ["k"], [("v", 8)]).collect()


def test_packed_dedup_rejects_bad_specs(spark):
    from small_etl_spark.operators.dedup import (
        dedup_by_fields_first_wins_packed,
    )
    import pytest as _pytest

    df = spark.createDataFrame([(1, 2, 3)], "k bigint, a bigint, b bigint")
    with _pytest.raises(ValueError):  # >63 bits
        dedup_by_fields_first_wins_packed(df, ["k"], [("a", 32), ("b", 32)])
    with _pytest.raises(ValueError):  # column b not covered
        dedup_by_fields_first_wins_packed(df, ["k"], [("a", 8)])
    with _pytest.raises(ValueError):  # empty spec
        dedup_by_fields_first_wins_packed(df, ["k", "a", "b"], [])
    with _pytest.raises(ValueError):  # r13: ≥53-bit field — the
        # per-row integrality check compares as doubles (exact only
        # below 2^53), so a 60-bit spec must be rejected up front
        dedup_by_fields_first_wins_packed(df, ["k", "b"], [("a", 60)])
