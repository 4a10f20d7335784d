"""Stateless LLM corpus ops (PII scrub, quality score, token count)
compose with Structured Streaming unchanged: the same column
expressions run per micro-batch with no state, so the drained stream
must equal the batch result exactly."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from small_etl_spark.llm.pii import scrub_pii
from small_etl_spark.llm.textstats import quality_score, token_count
from small_etl_spark.streaming.windows import run_to_memory_sink

SF_DIR = "/root/testdata/sf0.001"


def _clean_pipeline(df):
    return df.select(
        "doc_id",
        scrub_pii("text").alias("text_scrubbed"),
        token_count("text").alias("n_tokens"),
        F.round(quality_score("text"), 6).alias("quality"),
    ).filter(F.col("n_tokens") >= 5)


def test_streaming_scrub_equals_batch(spark, tmp_path):
    d = tmp_path / "docs_stream"
    os.makedirs(d)
    shutil.copy(os.path.join(SF_DIR, "documents.parquet"), d / "part0.parquet")

    batch_df = spark.read.parquet(str(d))
    stream_df = spark.readStream.schema(batch_df.schema).parquet(str(d))

    run_to_memory_sink(
        _clean_pipeline(stream_df), "scrub_sink", output_mode="append"
    )
    got = sorted(map(tuple, spark.table("scrub_sink").collect()))
    want = sorted(map(tuple, _clean_pipeline(batch_df).collect()))
    assert got == want and len(got) > 0
