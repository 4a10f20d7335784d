"""Windowed / stateful streaming aggregations (north-star, SURVEY §2.10).

Design rule: every aggregation here is written against a generic
DataFrame so the SAME function runs in batch (events parquet scan) and
in streaming (``readStream`` file source) — the batch run is what the
DuckDB oracle verifies, the streaming run is covered by availableNow
tests in ``tests/test_streaming.py``.

Scale notes (1000-executor shape):
- watermarks bound state: without ``withWatermark`` a streaming agg's
  state grows forever; the watermark also defines the late-data drop
  policy;
- state store is per-shuffle-partition — size
  ``spark.sql.shuffle.partitions`` to the key cardinality, not the
  default;
- ``dropDuplicatesWithinWatermark`` is the streaming twin of exact
  dedup: state holds only ids younger than the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_events_stream(
    spark: SparkSession,
    events_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a directory of events parquet files.

    File sources need an explicit schema (no inference mid-stream), but
    the on-disk ``ts`` encoding has varied across generator versions
    (TIMESTAMP(NANOS) / micros-NTZ / TIMESTAMP). We batch-read the
    directory's footers once to learn the real schema, feed that to the
    stream reader, then normalize ``ts`` with the same helper batch
    reads use (``sources.tables.normalize_ts``) — one-footer-read cost,
    and the stream analyzes correctly on every encoding.
    """
    from small_etl_spark.sources.tables import normalize_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        # NTZ→TIMESTAMP normalization is epoch-exact only under UTC
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:  # noqa: BLE001
        pass
    file_schema = spark.read.parquet(events_dir).schema
    reader = spark.readStream.schema(file_schema)
    if max_files_per_trigger is not None:
        # availableNow honors source limits: N files → ⌈N/limit⌉
        # micro-batches (how the multi-batch state tests force >1)
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return normalize_ts(reader.parquet(events_dir))


def tumbling_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling window per event_type: count + min/max(value).

    Batch twin: ``queries.q_window_agg_hourly``. The watermark is a
    no-op in batch, so both paths share this exact code.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n",
            "min_value",
            "max_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding window per event_type — each event lands in
    window/slide overlapping windows."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity. Batch twin: ``queries.q_sessionize`` (the explicit
    lag/cumsum formulation — same session boundaries)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").cast("long").alias("session_start"),
            F.col("w.end").cast("long").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def stream_stream_interval_join(
    clicks: DataFrame,
    views: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    max_delay: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join with an event-time interval: pair each
    left row with right rows of the same key whose timestamp falls in
    ``[left.ts - max_delay, left.ts]`` (the click-attribution shape).

    Both sides carry watermarks so Spark bounds the join state: a
    buffered right row is dropped once the left watermark passes
    ``right.ts + max_delay``. In batch the same predicate runs as a
    plain range join — one code path, so the batch twin is the oracle
    for the streaming run. Returns left ts/key plus the matched right
    ts and both values.
    """
    l_mark = clicks.withWatermark(ts_col, watermark) if clicks.isStreaming else clicks
    r_mark = views.withWatermark(ts_col, watermark) if views.isStreaming else views
    left = l_mark.select(
        F.col(key).alias("l_key"),
        F.col(ts_col).alias("l_ts"),
        F.col("value").alias("l_value"),
    )
    right = r_mark.select(
        F.col(key).alias("r_key"),
        F.col(ts_col).alias("r_ts"),
        F.col("value").alias("r_value"),
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {max_delay}"))
        & (F.col("r_ts") <= F.col("l_ts"))
    )
    return left.join(right, cond).select(
        F.col("l_key").alias(key),
        F.col("l_ts").cast("long").alias("l_ts"),
        F.col("r_ts").cast("long").alias("r_ts"),
        "l_value",
        "r_value",
    )


def stream_static_enrich(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich each micro-batch against a BATCH
    dimension table (the lookup-enrichment shape, streaming edition).

    The static side is re-planned per micro-batch — no state store is
    involved (unlike stream-stream joins), so the join is stateless
    and the dim can be updated between restarts. ``broadcast()`` pins
    the hash-join strategy: at 100 TB of stream the dim ships to
    executors once per batch instead of shuffling the stream.
    Identical code runs in batch (dim join dim), which is how the
    equivalence test oracles it.
    """
    return events.join(F.broadcast(dim), on, how)


def stream_dedup(
    events: DataFrame,
    watermark: str = "2 hours",
    keys: list[str] | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup on ``keys`` with bounded state
    (``dropDuplicatesWithinWatermark`` — state evicts keys older than
    the watermark; the streaming twin of A2/A3 exact dedup)."""
    keys = list(keys or ["event_id"])
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


def run_to_memory_sink(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> None:
    """Drain a stream with availableNow into a memory sink table named
    ``query_name`` (test/bench harness; batch-equivalent final result)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_to_files(
    stream_df: DataFrame,
    out_dir: str,
    formats: list[str],
    checkpoint_dir: str,
    output_mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Drain a stream through the engine's batch sink layer via
    ``foreachBatch``: each micro-batch writes with the same
    format/partitioning code paths as batch stages (K1–K6), under
    ``out_dir/batch=<id>/``. Checkpointing makes the sink restartable;
    at scale prefer ``partition_by`` + ``single_file=False`` so each
    micro-batch writes partition-parallel.
    """
    from small_etl_spark.sinks.files import write_outputs

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        write_outputs(
            batch_df,
            f"{out_dir}/batch={batch_id}",
            formats,
            sorted_header=False,
            single_file=partition_by is None,
            partition_by=partition_by,
        )

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_lsh_probe_to_parquet(
    spark,
    stream_docs: DataFrame,
    index_path: str,
    out_dir: str,
    checkpoint_dir: str,
    jaccard_threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Streaming incremental dedup: probe each micro-batch of arriving
    documents against a PERSISTED MinHash-LSH index
    (llm/dedup.py::minhash_lsh_index_write) and append the near-dup
    pairs to ``out_dir`` — the ingest-time "is this new page a
    near-dup of the corpus" gate, running continuously.

    Goes through ``foreachBatch`` deliberately: the probe pipeline
    contains a dropDuplicates and candidate joins that would need
    unbounded streaming state, but per-batch they are plain bounded
    batch jobs — each micro-batch is delta-sized, touches only index
    parquet + its own rows (plan pinned in the batch probe's tests),
    and appends idempotently under the checkpoint. Restart-safe: a
    replayed batch rewrites the same pairs (probe is deterministic),
    and the checkpoint skips committed batches. Probes are
    per-document independent, so the union over micro-batches equals
    one batch probe of the whole delta — the stream ≡ batch contract
    the oracle gate checks.
    """
    from small_etl_spark.llm.dedup import minhash_lsh_probe

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = minhash_lsh_probe(
            spark,
            index_path,
            batch_df,
            id_col=id_col,
            text_col=text_col,
            jaccard_threshold=jaccard_threshold,
        )
        out.write.mode("append").parquet(out_dir)

    q = (
        stream_docs.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
