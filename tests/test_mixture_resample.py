"""Unit tests: token_budget_resample (explicit-shares path) and the
normalize_ts property over arbitrary timestamps/encodings."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from small_etl_spark.llm.sampling import token_budget_resample


def _corpus(spark):
    rows = []
    # stratum a: 100 docs x 10 tokens; stratum b: 10 docs x 10 tokens
    for i in range(100):
        rows.append((i, "a", "w " * 10))
    for i in range(100, 110):
        rows.append((i, "b", "w " * 10))
    return spark.createDataFrame(rows, "doc_id long, src string, text string")


def test_explicit_target_shares_downsample_only(spark):
    df = _corpus(spark)
    out = token_budget_resample(
        df,
        ["src"],
        F.size(F.split(F.trim("text"), " ")),
        target_shares={("a",): 0.5, ("b",): 0.5},
    )
    rates = {
        r.src: r.keep_rate
        for r in out.select("src", "keep_rate").distinct().collect()
    }
    # total tokens 1100; target 550 each. b has 100 < 550 -> rate 1.0
    assert rates[("b")] == 1.0
    # a has 1000 tokens -> rate 550/1000
    assert abs(rates["a"] - 0.55) < 1e-9
    # b keeps everything (rate 1 means every bucket < 65536)
    assert out.filter("src = 'b'").count() == 10
    # a keeps roughly 55% deterministically (same salt -> same set)
    n_a = out.filter("src = 'a'").count()
    assert 35 <= n_a <= 75
    assert out.filter("src = 'a'").count() == n_a  # deterministic rerun


def test_unlisted_stratum_dropped(spark):
    df = _corpus(spark)
    out = token_budget_resample(
        df,
        ["src"],
        F.size(F.split(F.trim("text"), " ")),
        target_shares={("a",): 1.0},
    )
    assert out.filter("src = 'b'").count() == 0


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.datetimes(
            min_value=dt.datetime(1971, 1, 1),
            max_value=dt.datetime(2200, 1, 1),
        ).map(lambda d: d.replace(microsecond=(d.microsecond // 1000) * 1000)),
        min_size=1,
        max_size=5,
        unique=True,
    )
)
def test_normalize_ts_encoding_invariant(spark, tmp_path_factory, stamps):
    """Property: for ANY set of timestamps, the three parquet
    encodings load to identical epoch values via load_table."""
    from small_etl_spark.sources.tables import load_table

    seen = {}
    for name, typ in (
        ("nanos", pa.timestamp("ns")),
        ("ntz", pa.timestamp("us")),
        ("tz", pa.timestamp("us", tz="UTC")),
    ):
        d = tmp_path_factory.mktemp(f"prop_{name}")
        table = pa.table(
            {
                "event_id": pa.array(range(len(stamps)), pa.int64()),
                "ts": pa.array(stamps).cast(typ),
                "user_id": pa.array([0] * len(stamps), pa.int64()),
                "event_type": pa.array(["e"] * len(stamps), pa.string()),
                "value": pa.array([0.0] * len(stamps), pa.float64()),
                "props": pa.array(["{}"] * len(stamps), pa.string()),
            }
        )
        pq.write_table(table, str(d / "events.parquet"))
        df = load_table(spark, str(d), "events")
        seen[name] = sorted(
            r.e for r in df.selectExpr("cast(ts as double) AS e").collect()
        )
    assert seen["nanos"] == seen["ntz"] == seen["tz"]
