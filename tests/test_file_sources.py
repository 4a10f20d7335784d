"""Round-trip tests: every format the sinks write, the file sources
read back losslessly (sources/files.py), schema-enforced."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from small_etl_spark.sinks.files import write_outputs
from small_etl_spark.sources.files import read_file, to_parquet

SCHEMA = "id BIGINT, name STRING, price DOUBLE, flag BOOLEAN"


@pytest.fixture()
def sample(spark):
    return spark.createDataFrame(
        [
            (1, "plain", 1.5, True),
            (2, 'quote "inner" comma, here', -2.25, False),
            (3, None, 0.0, None),
        ],
        SCHEMA,
    )


def rows_of(df):
    return sorted(
        (r["id"], r["name"], r["price"], r["flag"]) for r in df.collect()
    )


@pytest.mark.parametrize("fmt", ["csv", "json", "parquet", "orc"])
def test_sink_source_roundtrip(spark, sample, tmp_path, fmt):
    paths = write_outputs(
        sample, str(tmp_path), [fmt], sorted_header=False
    )
    got = read_file(spark, paths[fmt], fmt, schema=SCHEMA)
    assert rows_of(got) == rows_of(sample)


def test_tsv_roundtrip_after_sanitize(spark, tmp_path):
    # TSV sink sanitizes tabs/newlines instead of quoting — readback
    # is exact for values without those characters
    df = spark.createDataFrame([(1, "a b", 2.0, True)], SCHEMA)
    paths = write_outputs(df, str(tmp_path), ["tsv"], sorted_header=False)
    got = read_file(spark, paths["tsv"], "tsv", schema=SCHEMA)
    assert rows_of(got) == rows_of(df)


def test_read_file_failfast_on_malformed(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("id,name,price,flag\n1,ok,1.5,true\nnot_a_number,x,y,z\n")
    with pytest.raises(Exception):
        read_file(
            spark, str(p), "csv", schema=SCHEMA, mode="FAILFAST"
        ).collect()
    # PERMISSIVE keeps the good row and nulls the bad one
    got = read_file(spark, str(p), "csv", schema=SCHEMA).collect()
    assert len(got) == 2


def test_to_parquet_partitioned_prunes(spark, sample, tmp_path):
    out = str(tmp_path / "pq")
    to_parquet(sample.withColumn("part", F.col("id") % 2), out,
               partition_by=["part"])
    back = spark.read.parquet(out).filter(F.col("part") == 1)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(part" in plan
    assert {r["id"] for r in back.collect()} == {1, 3}


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError):
        read_file(spark, "/tmp/x", "avro")


def test_merge_schema_evolution_readback(spark, tmp_path):
    """Schema evolution across parquet writes: a later file adds a
    column; mergeSchema readback unions the schemas, nulling the
    missing column in old files — the append-only evolution pattern
    a long-lived 100 TB dataset relies on."""
    v1 = spark.createDataFrame([(1, "a")], "id BIGINT, name STRING")
    v2 = spark.createDataFrame(
        [(2, "b", 9.5)], "id BIGINT, name STRING, score DOUBLE"
    )
    v1.write.parquet(str(tmp_path / "pq"))
    v2.write.mode("append").parquet(str(tmp_path / "pq"))
    got = read_file(
        spark, str(tmp_path / "pq"), "parquet", mergeSchema="true"
    )
    assert set(got.columns) == {"id", "name", "score"}
    rows = {r["id"]: (r["name"], r["score"]) for r in got.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_ignore_corrupt_files_salvages_good_rows(spark, tmp_path):
    """One corrupt parquet file in a directory must not take down the
    whole scan when ignoreCorruptFiles is on — the salvage posture
    for a 100 TB lake where a bad object eventually happens."""
    d = tmp_path / "pq"
    spark.createDataFrame([(1, "ok")], "id BIGINT, name STRING").write.parquet(
        str(d)
    )
    (d / "part-corrupt.parquet").write_bytes(b"PAR1 this is not parquet")
    import pytest as _pytest

    with _pytest.raises(Exception):
        spark.read.parquet(str(d)).collect()  # default: fail loudly
    got = (
        spark.read.option("ignoreCorruptFiles", "true").parquet(str(d))
    ).collect()
    assert [(r["id"], r["name"]) for r in got] == [(1, "ok")]


def test_load_table_relation_cache(spark, tmp_path):
    """load_table memoizes the parquet relation per (session, dir,
    table): repeat calls return the SAME DataFrame object (no
    re-listing), use_cache=False returns a fresh one, and the fresh
    relation sees files the cached one's listing snapshot missed."""
    import pyspark.sql.functions as F

    from small_etl_spark.sources.tables import load_table

    d = tmp_path / "tbl"
    spark.range(5).withColumn("part", F.lit("a")).write.parquet(
        str(d / "part.parquet")
    )
    a = load_table(spark, str(d), "part")
    b = load_table(spark, str(d), "part")
    assert a is b  # cache hit — no second listing
    fresh = load_table(spark, str(d), "part", use_cache=False)
    assert fresh is not a
    assert fresh.count() == a.count() == 5

    # invalidation: after evicting, the next cached load is a NEW
    # relation (fresh file listing) — the overwrite-in-place escape
    # hatch that doesn't force every reader onto use_cache=False
    from small_etl_spark.sources.tables import invalidate_table_cache

    assert invalidate_table_cache(spark, str(d), "part") == 1
    c = load_table(spark, str(d), "part")
    assert c is not a
    assert invalidate_table_cache(spark, str(d), "nope") == 0


def test_write_training_shards(spark, tmp_path):
    """Shard writer: equal-token contiguous-id shards + manifest.
    Checks totals conservation, id-range contiguity across shards
    (the manifest doubles as a pruning index), within-shard sort, and
    token balance within one max-document of the ideal."""
    import json

    import pyspark.sql.functions as F

    from small_etl_spark.llm import textstats
    from small_etl_spark.sinks.files import write_training_shards
    from small_etl_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", textstats.token_count("text").alias("n_tokens")
    )
    out = str(tmp_path / "shards")
    manifest = write_training_shards(docs, out, 4, "n_tokens")
    with open(tmp_path / "shards" / "_manifest.json") as fh:
        assert json.load(fh) == manifest
    assert [s["shard"] for s in manifest["shards"]] == [0, 1, 2, 3]
    assert sum(s["docs"] for s in manifest["shards"]) == docs.count()
    total = docs.agg(F.sum("n_tokens")).collect()[0][0]
    assert sum(s["tokens"] for s in manifest["shards"]) == total
    # contiguous id ranges: shard k's id_max < shard k+1's id_min
    for a, b in zip(manifest["shards"], manifest["shards"][1:]):
        assert a["id_max"] < b["id_min"]
    # balance: every shard within ideal ± the largest single document
    max_doc = docs.agg(F.max("n_tokens")).collect()[0][0]
    ideal = total / 4
    for s in manifest["shards"]:
        assert abs(s["tokens"] - ideal) <= max_doc + ideal / 4
    # written data round-trips and is sorted within each shard
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    for k in range(4):
        ids = [r.doc_id for r in back.filter(F.col("shard") == k)
               .select("doc_id").collect()]
        # per-file sort: partition dirs may hold one file each; the
        # collected order within a single sorted file is ascending
        assert set(ids) == set(
            r.doc_id for r in docs.filter(
                (F.col("doc_id") >= manifest["shards"][k]["id_min"])
                & (F.col("doc_id") <= manifest["shards"][k]["id_max"])
            ).select("doc_id").collect()
        )


def test_write_training_shards_zero_token_corpus(spark, tmp_path):
    """Degenerate all-zero-token corpus: the bigint-ceil divisor is
    clamped to 1, so every row lands deterministically in shard 0 —
    previously ceil(0/n)=0 made the shard expression NULL and F.least
    silently dumped everything into the LAST shard."""
    from small_etl_spark.sinks.files import write_training_shards

    docs = spark.createDataFrame(
        [(i, "", 0) for i in range(10)], ["doc_id", "text", "n_tokens"]
    )
    out = str(tmp_path / "zshards")
    manifest = write_training_shards(docs, out, 4, "n_tokens")
    assert [s["shard"] for s in manifest["shards"]] == [0]
    assert manifest["shards"][0]["docs"] == 10
    assert manifest["shards"][0]["tokens"] == 0
