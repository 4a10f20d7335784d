"""Scale levers: skew-salted aggregation, bucketed co-located joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from small_etl_spark.operators.skew import salted_agg
from small_etl_spark.sources.bucketing import (
    bucketed_join,
    count_exchanges,
    write_bucketed,
)
from small_etl_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_salted_agg_matches_plain(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    plain = {
        (r.l_returnflag,): (r.n, r.qty, r.mx)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    li2 = li.withColumn("l_qty_int", F.col("l_quantity").cast("bigint"))
    salted = {
        (r.l_returnflag,): (r.n, r.qty, r.mx)
        for r in salted_agg(
            li2,
            ["l_returnflag"],
            {"n": "count", "qty": "sum:l_qty_int", "mx": "max:l_extendedprice"},
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_unknown():
    with pytest.raises(ValueError):
        salted_agg(None, ["k"], {"x": "median:v"})


def test_bucketed_join_has_no_exchange(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    try:
        write_bucketed(li, "b_lineitem", ["l_orderkey"], num_buckets=4)
        write_bucketed(
            o.withColumnRenamed("o_orderkey", "l_orderkey"),
            "b_orders",
            ["l_orderkey"],
            num_buckets=4,
        )
        joined = bucketed_join(spark, "b_lineitem", "b_orders", ["l_orderkey"])
        n = joined.count()
        assert n == li.count()  # every lineitem matches its order
        assert count_exchanges(joined) == 0, "bucketed join must not shuffle"

        # control: the same join on plain parquet frames DOES shuffle
        # (broadcast disabled to emulate fact-x-fact, where bucketing
        # is the only way to avoid the exchange)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plain = li.join(
                o.withColumnRenamed("o_orderkey", "l_orderkey"), ["l_orderkey"]
            )
            plain.count()
            assert count_exchanges(plain) > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """Dynamic partition pruning: joining a partition-layout fact to a
    FILTERED dim must inject a runtime subquery into the fact scan's
    PartitionFilters (``dynamicpruning``) so only matching partitions
    are read — the star-schema scan killer at 100 TB, where the
    partition list is only knowable after the dim filter runs."""
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "value", "event_type"
    )
    fact_dir = str(tmp_path / "fact")
    ev.write.partitionBy("event_type").parquet(fact_dir)

    dim = spark.createDataFrame(
        [("view", "browse"), ("click", "browse"), ("purchase", "buy")],
        "event_type string, category string",
    )
    fact = spark.read.parquet(fact_dir)
    joined = fact.join(dim.filter(F.col("category") == "buy"), "event_type")
    optimized = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "dynamicpruning" in optimized
    n_purchase = load_table(spark, SF_DIR, "events").filter(
        F.col("event_type") == "purchase"
    ).count()
    assert joined.count() == n_purchase


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join: with one hot key dominating the build of a
    sort-merge join, AQE must re-plan the oversized shuffle partition
    into parallel splits (``skew=true`` in the final plan) instead of
    letting one task process the whole hot key — the runtime answer
    to key skew when salting wasn't applied up front."""
    hot = spark.range(0, 40_000).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    rest = spark.range(0, 2_000).select(
        (F.col("id") % 50 + 2).alias("k"), F.col("id").alias("payload")
    )
    left = hot.unionAll(rest)
    right = spark.range(0, 51).select(
        (F.col("id") + 1).alias("k"), F.col("id").alias("tag")
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        # coalescing first would merge partitions below the skew
        # threshold again on this tiny input
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = left.join(right, "k")
        # execute THIS DataFrame's query execution (count() would plan
        # a separate query and leave this one un-finalized under AQE)
        assert len(joined.collect()) == 40_000 + 2_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """Hive-layout partitioned write -> a filter on the partition
    column reads only matching directories (PartitionFilters in the
    scan, not a data filter over everything)."""
    import os

    from small_etl_spark.sinks.files import write_outputs

    ev = load_table(spark, SF_DIR, "events").select("event_id", "value", "event_type")
    write_outputs(
        ev, str(tmp_path), ["parquet"], sorted_header=False,
        single_file=False, partition_by=["event_type"],
    )
    pq_dir = str(tmp_path / "parquet")
    assert sorted(
        d for d in os.listdir(pq_dir) if d.startswith("event_type=")
    )  # hive layout on disk

    back = spark.read.parquet(pq_dir).filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    n_click = load_table(spark, SF_DIR, "events").filter(
        F.col("event_type") == "click"
    ).count()
    assert back.count() == n_click
