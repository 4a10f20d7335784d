"""Incremental sketch maintenance over a stream: a count-min sketch
built micro-batch by micro-batch (foreachBatch + cell-wise merge)
must equal the one-shot batch sketch — the CMS mergeability law is
what makes sketches streamable/shardable at 100 TB without
re-reading history."""

from __future__ import annotations

import os
import shutil

from small_etl_spark.operators.sketches import cms_build, cms_merge
from small_etl_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_stream_built_cms_equals_batch_cms(spark, tmp_path):
    # two files → two micro-batches (maxFilesPerTrigger=1)
    ev = load_table(spark, SF_DIR, "events")
    d = tmp_path / "ev_stream"
    os.makedirs(d)
    for i, half in enumerate(
        (ev.filter(ev.event_id % 2 == 0), ev.filter(ev.event_id % 2 == 1))
    ):
        outdir = tmp_path / f"half{i}"
        half.coalesce(1).write.parquet(str(outdir))
        part = next(p for p in os.listdir(outdir) if p.endswith(".parquet"))
        shutil.move(str(outdir / part), str(d / f"half{i}.parquet"))

    batch_schema = spark.read.parquet(str(d)).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
    )

    sketches = []

    def absorb(batch_df, batch_id):
        # per-batch sketch is depth×width rows — collect is bounded
        sketches.append(
            spark.createDataFrame(
                cms_build(batch_df, "user_id", depth=4, width=128).collect(),
                "j int, bucket bigint, cnt bigint",
            )
        )

    q = stream.writeStream.foreachBatch(absorb).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    assert len(sketches) >= 2  # really incremental, not one big batch

    merged = cms_merge(*sketches)
    whole = cms_build(
        spark.read.parquet(str(d)), "user_id", depth=4, width=128
    )
    got = {(r["j"], r["bucket"]): r["cnt"] for r in merged.collect()}
    want = {(r["j"], r["bucket"]): r["cnt"] for r in whole.collect()}
    assert got == want
