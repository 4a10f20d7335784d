"""Ordered multi-pipeline execution (SURVEY §3.3 — the flagship).

Ports the reference's `execute_all` loop
(/root/reference/src/app/pipelines/sequence_pipeline.rs:175-273) to
DataFrame stages: for each enabled stage, gate (F6) → resolve source
(S1–S7) → extract-level processing (F4/F5, A2/A3, O1) → transform
chain (P1–P9, X1–X3, F3, J3, J4) → sinks (K1–K7) → record result in
the context. Failure policy stop|continue|retry is handled here for
real (the reference's retry branch is a no-op stub —
sequence_etl.rs:139-162).

Spark shapes:
- stage handoff = a named DataFrame (persisted when reused), not a
  record-vector clone;
- J1 merge-with-api = broadcast left join (the reference's O(n·m)
  loop);
- J4 shared-scalar export = a deliberate single-row `first()`
  materialization barrier between an auth stage and its consumers
  (SURVEY §7.3);
- gating counts use `df.count()` — at scale a parquet-footer rollup or
  cached-stage metadata, never a full recompute of a hot plan.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from small_etl_spark.functions.text import (
    clean_text,
    normalize_fields,
    remove_html_tags,
    trim_whitespace,
)
from small_etl_spark.operators.dedup import (
    dedup_by_fields_first_wins,
    dedup_full_record,
)
from small_etl_spark.operators.filters import (
    equality_filter,
    extract_filters,
    limit_records,
)
from small_etl_spark.operators.joins import lookup_enrich_stub, merge_with_previous
from small_etl_spark.operators.projections import (
    add_processing_markers,
    computed_fields,
    default_fill,
    keep_only_fields,
    exclude_fields as drop_fields,
    map_nested_fields,
    rename_fields,
)
from small_etl_spark.operators.sets import union_all_by_name
from small_etl_spark.operators.sort import sort_by_field
from small_etl_spark.operators.validation import ValidationSpec, validate_frame
from small_etl_spark.plans.context import PipelineContext, PipelineResult
from small_etl_spark.plans.spec import PipelineSpec, SequenceSpec
from small_etl_spark.sinks.files import render_filename, write_outputs, zip_output_dir
from small_etl_spark.sources.http import http_scan, records_to_df


class PipelineExecutionError(RuntimeError):
    def __init__(self, pipeline: str, cause: Exception):
        super().__init__(f"pipeline {pipeline!r} failed: {cause}")
        self.pipeline = pipeline
        self.cause = cause


# --------------------------------------------------------------------------
# source resolution (S1–S7 — contextual_pipeline.rs:31-92)
# --------------------------------------------------------------------------


def _resolve_source(
    spark: SparkSession, spec: PipelineSpec, ctx: PipelineContext
) -> DataFrame:
    src = spec.source
    if src.type == "sample":
        return records_to_df(spark, src.sample_data)
    if src.type == "file":
        reader = spark.read
        if src.format == "csv":
            return reader.option("header", True).option("inferSchema", True).csv(src.path)
        if src.format == "json":
            return reader.json(src.path)
        return reader.parquet(src.path)
    if src.type == "table":
        return spark.table(src.table)
    if src.type == "stream":
        return _stream_fetch(spark, spec)
    if src.type == "query":
        # analytics-catalog source: any registered query is a stage
        # input — the declarative bridge between the TOML sequencer
        # and the engine's query surface
        import os as _os

        from small_etl_spark.queries import REGISTRY as _QR

        sf_dir = src.sf_dir or _os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
        )
        return _QR[src.query].builder(spark, sf_dir)
    if src.type == "combined":
        prev = ctx.all_previous()
        if not prev:
            raise ValueError("combined source with no previous stages")
        return union_all_by_name(prev)
    if src.type == "previous":
        result = ctx.get(src.previous_pipeline)
        if result is None:
            raise ValueError(
                f"previous source {src.previous_pipeline!r} not found"
            )
        base = result.df
        has_api = bool(src.endpoint or src.urls)
        if src.merge_with_api and has_api:
            api = _api_fetch(spark, spec, ctx)
            # J1: api records enriched from previous by key; api wins
            return merge_with_previous(api, base, key=src.merge_key)
        if has_api:
            # union path (contextual_pipeline.rs:34-91): previous then api
            api = _api_fetch(spark, spec, ctx)
            return union_all_by_name([base, api])
        return base
    # "api"
    return _api_fetch(spark, spec, ctx)


def _stream_fetch(spark: SparkSession, spec: PipelineSpec) -> DataFrame:
    """``type = "stream"``: a Structured Streaming stage inside the
    sequence.

    ``readStream`` over a file directory (``path`` + ``schema`` DDL,
    ``format`` parquet/csv/json) or over HTTP endpoints (``urls`` →
    the http_json stream reader), optionally deduplicated within a
    ``watermark`` on ``stream_dedup_keys``, drained with
    ``availableNow`` into a uniquely-named memory sink and returned as
    a batch frame — so downstream stages, transforms, and sinks
    compose unchanged. In production the same plan runs unbounded by
    swapping the drain for ``stream_to_files`` (foreachBatch) with a
    checkpoint; availableNow here gives the batch-equivalent final
    result the correctness gate can compare.
    """
    import uuid

    from small_etl_spark.streaming.windows import run_to_memory_sink

    src = spec.source
    if src.urls:
        from small_etl_spark.sources.http_datasource import HttpJsonDataSource

        spark.dataSource.register(HttpJsonDataSource)
        stream = (
            spark.readStream.format("http_json")
            .schema(src.schema)
            .option("urls_json", json.dumps(src.urls))
            .option("timeout_seconds", str(src.timeout_seconds))
            .load()
        )
    else:
        if not src.path or not src.schema:
            raise ValueError("stream source requires path+schema or urls")
        if src.stream_ts_from_nanos:
            # must be set before the scan plans (load_table parity)
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        reader = spark.readStream.schema(src.schema)
        # FileStreamSource requires a directory path — globs are fine
        # (basePath = the non-glob prefix) but a literal single-file
        # path is rejected. Turn `…/events.parquet` into the
        # equivalent one-file glob `…/events.parque[t]` so users can
        # point a stream at one file like every batch source.
        path = src.path
        local = path[7:] if path.startswith("file://") else path
        if os.path.isfile(local):
            path = f"{path[:-1]}[{path[-1]}]"
        if src.format == "csv":
            stream = reader.option("header", True).csv(path)
        elif src.format == "json":
            stream = reader.json(path)
        else:
            stream = reader.parquet(path)
        if src.stream_ts_from_nanos:
            from pyspark.sql import functions as F2

            # integer DIV: `/` routes through double and loses µs at e18
            stream = stream.withColumn(
                src.stream_ts_col,
                F2.timestamp_micros(F2.expr(f"`{src.stream_ts_col}` DIV 1000")),
            )
    if src.stream_dedup_keys:
        from small_etl_spark.streaming.windows import stream_dedup

        stream = stream_dedup(
            stream,
            watermark=src.stream_watermark,
            keys=src.stream_dedup_keys,
            ts_col=src.stream_ts_col,
        )
    sink = f"stage_stream_{uuid.uuid4().hex[:8]}"
    run_to_memory_sink(stream, sink, output_mode="append")
    return spark.table(sink)


def _api_fetch(spark: SparkSession, spec: PipelineSpec, ctx: PipelineContext) -> DataFrame:
    src = spec.source
    if src.urls:
        # multi-endpoint scan → executor-side Python DataSource
        # (sources.http_datasource), one partition per URL
        from small_etl_spark.sources.http_datasource import HttpJsonDataSource

        spark.dataSource.register(HttpJsonDataSource)
        return (
            spark.read.format("http_json")
            .schema(src.schema)
            # JSON-array form: URLs with literal commas survive intact
            .option("urls_json", json.dumps(src.urls))
            .option("timeout_seconds", str(src.timeout_seconds))
            .option("retry_attempts", str(src.retry_attempts))
            .option("retry_delay_seconds", str(src.retry_delay_seconds))
            .load()
        )
    if src.parameterized:
        # S4 fan-out over the previous stage's records; responses are
        # parsed into record columns unless parse_response=false, so
        # the next stage consumes this like any other source.
        from small_etl_spark.sources.http import (
            parameterized_http_fanout,
            parse_fanout_responses,
        )

        prev = ctx.get(src.previous_pipeline)
        if prev is None:
            raise ValueError("parameterized api source requires a previous stage")
        raw = parameterized_http_fanout(
            prev.df,
            src.endpoint,
            method=src.method,
            headers=src.headers,
            shared_data=ctx.shared_data,
            timeout_seconds=src.timeout_seconds,
            retry_attempts=src.retry_attempts,
            retry_delay_seconds=src.retry_delay_seconds,
            rate_limit_ms=src.rate_limit_ms,
            payload_template=(
                src.payload_template
                if src.use_previous_data_as_params or src.payload_template
                else None
            ),
        )
        if not src.parse_response:
            return raw
        if src.response_schema is None:
            # schema inference samples the responses with its own
            # collect() action — without a barrier that re-FIRES every
            # HTTP call (disastrous for POST/PUT fan-outs: requests
            # would be sent twice). localCheckpoint materializes the
            # responses once; inference and downstream both read the
            # checkpoint. Fan-out results are API-response-sized.
            raw = raw.localCheckpoint()
        return parse_fanout_responses(raw, src.response_schema, spark=spark)
    # X7 payload params (contextual_pipeline.rs:270-327): template_params
    # maps {placeholder: upstream_field}; use_previous_data_as_params
    # exposes every field of the upstream's first record. Both resolve
    # AFTER shared_data (X4 priority).
    shared = dict(ctx.shared_data)
    if src.template_params or src.use_previous_data_as_params:
        prev = ctx.get(src.previous_pipeline)
        first = prev.df.first() if prev is not None else None
        if first is not None:
            rec = first.asDict()
            if src.use_previous_data_as_params:
                for k, v in rec.items():
                    shared.setdefault(k, v)
            for placeholder, field_name in src.template_params.items():
                if field_name in rec:
                    shared.setdefault(placeholder, rec[field_name])
    return http_scan(
        spark,
        src.endpoint,
        method=src.method,
        headers=src.headers,
        query_params=src.query_params,
        payload_template=src.payload_template,
        shared_data=shared,
        timeout_seconds=src.timeout_seconds,
        retry_attempts=src.retry_attempts,
        retry_delay_seconds=src.retry_delay_seconds,
        on_failure=src.on_api_failure,
        sample_data=src.sample_data,
    )


# --------------------------------------------------------------------------
# per-stage transform chain (ordering per contextual_pipeline.rs:596-677,
# 879-1121: extract-processing = dedup → sort; transform = clean →
# mapping → lookup → keep/exclude → computed → markers)
# --------------------------------------------------------------------------


def _apply_field_mapping(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    nested = {p: t for p, t in mapping.items() if any(ch in p for ch in ".[")}
    flat = {p: t for p, t in mapping.items() if p not in nested}
    if nested:
        # A nested single-object API response arrives as one
        # {"response": json-string} row (simple_pipeline.rs:49-55).
        # Nested mappings address the OBJECT's fields (the reference's
        # array_field_mapping_example), so structify the response
        # first — schema-inferred from_json, same path as the S4
        # fan-out parser.
        roots = {
            str(_parse_nested_root(p))
            for p in nested
        }
        if "response" in df.columns and not (roots & set(df.columns)):
            from small_etl_spark.sources.http import parse_fanout_responses

            df = parse_fanout_responses(df, spark=df.sparkSession)
        df = map_nested_fields(df, nested)  # P2/P3/P4
    if flat:
        df = rename_fields(df, flat)  # P1
    return df


def _parse_nested_root(path: str) -> str:
    from small_etl_spark.operators.projections import _parse_path

    return _parse_path(path)[0]


def _apply_extract(df: DataFrame, spec: PipelineSpec) -> DataFrame:
    src, tr = spec.source, spec.transform
    if src.filters:
        df = extract_filters(df, src.filters)  # F5, enforced
    df = limit_records(df, src.max_records, src.first_record_only)  # F4
    if tr.field_mapping:
        # the reference maps fields DURING extract, before dedup/sort
        # (contextual_pipeline.rs:530-550 inside the fetch, :609-676
        # after) — so dedup keys and sort_by use mapped names
        df = _apply_field_mapping(df, tr.field_mapping)
    if tr.deduplicate_fields:
        df = dedup_by_fields_first_wins(df, tr.deduplicate_fields)  # A3
    elif tr.deduplicate:
        df = dedup_full_record(df)  # A2
    if tr.sort_by:
        df = sort_by_field(df, tr.sort_by, tr.sort_order)  # O1 (typed sort)
    return df


def _apply_transform(
    df: DataFrame, spec: PipelineSpec, ctx: PipelineContext
) -> DataFrame:
    tr = spec.transform
    if tr.clean_text:
        df = clean_text(df)  # X1
    if tr.trim_whitespace:
        df = trim_whitespace(df)  # X3a
    if tr.remove_html_tags:
        df = remove_html_tags(df)  # X3b
    if tr.normalize_fields:
        df = normalize_fields(df, tr.normalize_fields)  # X2
    if tr.lookup_data:
        df = lookup_enrich_stub(df, tr.lookup_data)  # J3 stub form
    if tr.default_values:
        df = default_fill(df, tr.default_values)  # P9
    if tr.keep_only_fields:
        df = keep_only_fields(df, tr.keep_only_fields)  # P5 (precedence)
    elif tr.exclude_fields:
        df = drop_fields(df, tr.exclude_fields)  # P6
    if tr.computed_fields:
        df = computed_fields(
            df,
            tr.computed_fields,
            pipeline_name=spec.name,
            execution_id=ctx.execution_id,
        )  # P7
    if tr.add_markers:
        df = add_processing_markers(df, spec.name)  # P8
    return df


def _should_execute(spec: PipelineSpec, ctx: PipelineContext) -> tuple[bool, str]:
    """F6 gating (contextual_pipeline.rs:1231-1288)."""
    cond = spec.conditions
    if cond.require_previous_success and ctx.results:
        if not ctx.results[-1].success:
            return False, "previous pipeline failed"
    for dep in spec.depends_on:
        r = ctx.get(dep)
        if r is None or not r.success:
            return False, f"dependency {dep!r} not satisfied"
    if cond.when_pipeline or cond.min_records is not None or cond.max_records is not None:
        target = ctx.get(cond.when_pipeline)
        if target is None:
            return False, f"gating pipeline {cond.when_pipeline!r} missing"
        n = target.record_count
        if cond.min_records is not None and n < cond.min_records:
            return False, f"record count {n} < min {cond.min_records}"
        if cond.max_records is not None and n > cond.max_records:
            return False, f"record count {n} > max {cond.max_records}"
    for key, expected in cond.when_shared_data.items():
        if ctx.shared_data.get(key) != expected:
            return False, f"shared_data[{key!r}] != {expected!r}"
    return True, ""


def execute_pipeline(
    spark: SparkSession,
    spec: PipelineSpec,
    ctx: PipelineContext,
    output_root: str | None = None,
    txn=None,
) -> PipelineResult:
    """One stage: source → extract processing → transforms → validate →
    intermediate/shared export → sinks."""
    from small_etl_spark.monitor import PhaseMonitor

    t0 = time.time()
    phase_monitor = PhaseMonitor()
    df = _resolve_source(spark, spec, ctx)
    df = _apply_extract(df, spec)
    df = _apply_transform(df, spec, ctx)

    tr = spec.transform
    validate_frame(
        df,
        ValidationSpec(
            required_fields=tr.required_fields,
            field_types=tr.field_types,
            min_records=tr.min_records,
            max_records=tr.max_records,
            max_field_lengths=tr.max_field_lengths,
        ),
    )

    # stage output is consumed ≥2× (count, downstream stages, sinks)
    df = df.persist()
    record_count = df.count()

    intermediate = None
    if tr.title_length_threshold is not None and "title" in df.columns:
        # F1 threshold side-output: long-title rows to intermediate
        # (reference [transform.intermediate] title_length_threshold)
        from pyspark.sql import functions as F

        intermediate = df.filter(
            F.length("title") > tr.title_length_threshold
        )
    if tr.intermediate_conditions:
        base_for_eq = intermediate if intermediate is not None else df
        intermediate = equality_filter(base_for_eq, tr.intermediate_conditions)  # F3
    if tr.shared_data_key:
        # J4: export the first intermediate row — or the first stage
        # row when no intermediate filter is configured (reference
        # export_to_shared without conditions exports the stage data)
        src_for_export = intermediate if intermediate is not None else df
        first = src_for_export.first()  # J4 barrier (single row by design)
        if first is not None:
            ctx.export_shared(tr.shared_data_key, first.asDict())

    output_path = None
    if output_root and spec.load.formats:
        out_dir = os.path.join(output_root, spec.name)
        written = write_outputs(
            df, out_dir, spec.load.formats,
            sorted_header=spec.load.sorted_dynamic_header,
            single_file=spec.load.single_file,
            partition_by=spec.load.partition_by or None,
            branch=spec.load.branch,
            constraints=spec.load.constraints or None,
            txn=txn,
            txn_name=spec.name,
        )
        output_path = out_dir
        if spec.load.zip_outputs:
            zip_name = render_filename(
                spec.load.filename_pattern or "{pipeline_name}_output.zip",
                spec.name,
                ctx.execution_id,
            )
            metadata = None
            if spec.load.include_metadata:
                metadata = {
                    "pipeline_name": spec.name,
                    "execution_id": ctx.execution_id,
                    "record_count": record_count,
                }
            output_path = zip_output_dir(
                out_dir,
                written,
                zip_name,
                metadata=metadata,
                intermediate_df=intermediate if spec.load.include_intermediate else None,
                member_names=spec.load.filenames or None,
            )

    # phase monitor (§2.10 — the reference samples CPU%/memory per
    # phase, monitor.rs:9-106; PhaseMonitor covers driver + local JVM)
    import resource

    peak_rss_mb = round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1)
    return PipelineResult(
        pipeline_name=spec.name,
        df=df,
        record_count=record_count,
        duration_s=round(time.time() - t0, 6),
        output_path=output_path,
        success=True,
        intermediate=intermediate,
        metadata={
            "peak_rss_mb": peak_rss_mb,
            "monitor": phase_monitor.snapshot(spec.name),
        },
    )


def _dag_levels(specs: list[PipelineSpec]) -> list[list[PipelineSpec]]:
    """Group stages into dependency levels: every stage in level k
    depends only on stages in levels < k. Order within a level follows
    execution_order, so results land deterministically."""
    placed: dict[str, int] = {}
    levels: list[list[PipelineSpec]] = []
    remaining = list(specs)
    names = {s.name for s in specs}
    while remaining:
        this_level = [
            s
            for s in remaining
            if all(d in placed or d not in names for d in s.depends_on)
        ]
        if not this_level:  # unsatisfiable deps (validated earlier) — serialize
            this_level = [remaining[0]]
        for s in this_level:
            placed[s.name] = len(levels)
        levels.append(this_level)
        remaining = [s for s in remaining if s.name not in placed]
    return levels


def run_sequence_parallel(
    spark: SparkSession,
    seq: SequenceSpec,
    only: list[str] | None = None,
    skip: list[str] | None = None,
    output_root: str | None = None,
    max_workers: int | None = None,
) -> PipelineContext:
    """Execute independent DAG branches concurrently.

    The reference validates a ``concurrent_requests`` knob but runs
    strictly sequentially (SURVEY §2.10; contextual_pipeline.rs:
    126-145) — here concurrency is real: stages are grouped into
    dependency levels and each level's stages run on a thread pool
    (Spark's scheduler interleaves their jobs across the cluster).
    Stage gating that depends on *sequence position* rather than
    declared deps (``require_previous_success`` without ``depends_on``)
    is evaluated against the context as of the level start; declare
    ``depends_on`` for strict ordering. Results are appended in
    deterministic ``execution_order``.
    """
    from concurrent.futures import ThreadPoolExecutor

    if seq.atomic:
        raise ValueError(
            "[sequence] atomic is serial-only: run_sequence stages "
            "each versioned sink on the transaction in order"
        )
    ctx = PipelineContext()
    workers = max_workers or max(seq.concurrent_requests, 1)
    for level in _dag_levels(seq.enabled_in_order(only, skip)):
        outcomes: dict[str, PipelineResult | Exception] = {}

        def run_one(spec: PipelineSpec) -> None:
            ok, reason = _should_execute(spec, ctx)
            if not ok:
                outcomes[spec.name] = PipelineResult(
                    pipeline_name=spec.name,
                    df=spark.range(0).drop("id"),
                    record_count=0,
                    duration_s=0.0,
                    success=False,
                    metadata={"skipped": True, "reason": reason},
                )
                return
            try:
                outcomes[spec.name] = execute_pipeline(spark, spec, ctx, output_root)
            except Exception as e:  # noqa: BLE001
                outcomes[spec.name] = e

        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(run_one, level))

        for spec in level:  # deterministic append order
            result = outcomes[spec.name]
            if isinstance(result, Exception):
                if seq.on_pipeline_failure == "continue":
                    ctx.add_result(
                        PipelineResult(
                            pipeline_name=spec.name,
                            df=spark.range(0).drop("id"),
                            record_count=0,
                            duration_s=0.0,
                            success=False,
                            metadata={"error": str(result)},
                        )
                    )
                    continue
                raise PipelineExecutionError(spec.name, result)
            ctx.add_result(result)
    return ctx


LOOKUP_FILE_EXTENSIONS = ("csv", "tsv", "json")


def load_lookup_files(
    spark: SparkSession, ctx: PipelineContext, lookup_files: list[str]
) -> None:
    """S8 ``--lookup-files``: preload csv/tsv/json files as named
    stage results so any pipeline can reference them (``previous``
    source, merge, combined) under the file's basename stem.

    Extension allow-list matches the reference's validation
    (/root/reference/src/config/mod.rs:75-77, csv|tsv|json); the
    reference declares the flag (domain/ports.rs:17) but never
    consumes it — here the files become first-class catalog entries.
    """
    from small_etl_spark.plans.spec import SpecError

    for path in lookup_files:
        ext = os.path.splitext(path)[1].lstrip(".").lower()
        if ext not in LOOKUP_FILE_EXTENSIONS:
            raise SpecError(
                f"lookup_files: {path!r} has extension {ext!r}, "
                f"allowed: {LOOKUP_FILE_EXTENSIONS}"
            )
        if ext == "json":
            df = spark.read.json(path)
        else:
            df = (
                spark.read.option("header", True)
                .option("inferSchema", True)
                .option("sep", "\t" if ext == "tsv" else ",")
                .csv(path)
            )
        name = os.path.splitext(os.path.basename(path))[0]
        ctx.add_result(
            PipelineResult(
                pipeline_name=name,
                df=df,
                record_count=df.count(),
                duration_s=0.0,
                metadata={"lookup_file": path},
            )
        )


def run_sequence(
    spark: SparkSession,
    seq: SequenceSpec,
    only: list[str] | None = None,
    skip: list[str] | None = None,
    output_root: str | None = None,
    dry_run: bool = False,
    lookup_files: list[str] | None = None,
    mvp: bool | None = None,
    incremental_root: str | None = None,
) -> PipelineContext:
    """Execute the enabled stages in ``execution_order``.

    ``dry_run`` echoes each stage's logical plan without executing
    (toml_etl.rs:154-227's plan print → here the real ``df.explain``
    is available post-build, so dry-run prints spec summaries only).
    Failure policy (sequence_etl.rs:139-162): stop aborts, continue
    records the failure and moves on, retry re-runs the stage up to
    ``retry_attempts`` times (implemented for real).

    ``lookup_files`` preloads csv/tsv/json catalogs (S8); ``mvp``
    overrides every stage's ``first_record_only``
    (toml_etl.rs:54-57's CLI override of config.extract).

    ``incremental_root`` enables incremental runs (plans/increments.py):
    each executed stage's result is committed to a versioned cache
    table keyed by a chained spec fingerprint; on the next run,
    fingerprint-matched stages are served from the snapshot instead of
    re-executing (shared-scalar exports replayed, record counts from
    the manifest, file sinks skipped). The reference recomputes
    everything every run — this is the nightly-pipeline lever that
    makes re-runs cost only what changed.
    """
    ctx = PipelineContext()
    if lookup_files:
        load_lookup_files(spark, ctx, lookup_files)
    if mvp is not None:
        for spec in seq.pipelines:
            spec.source.first_record_only = mvp
    txn = None
    if seq.atomic and output_root and not dry_run:
        # [sequence] atomic: every versioned sink stages on ONE
        # multi-table transaction; the run's table outputs become
        # visible through <output_root>/_catalog together or not at
        # all (sinks/txn.py — intent + per-table publish + one
        # catalog swap, roll-forward recovery)
        from small_etl_spark.sinks.txn import begin_transaction

        txn = begin_transaction(
            os.path.join(output_root, "_catalog"), {}
        )
    fp_chain: list[str] = []
    for spec in seq.enabled_in_order(only, skip):
        if dry_run:
            print(f"[dry-run] {spec.name}: source={spec.source.type} "
                  f"formats={spec.load.formats}")
            continue
        fp: str | None = None
        if incremental_root:
            from small_etl_spark.plans.increments import (
                cache_lookup,
                stage_fingerprint,
            )

            fp = stage_fingerprint(spec, fp_chain)
            fp_chain.append(fp)
            hit = cache_lookup(spark, incremental_root, spec.name, fp)
            if hit is not None:
                df, n, shared = hit
                ctx.shared_data.update(shared)
                ctx.add_result(
                    PipelineResult(
                        pipeline_name=spec.name,
                        df=df,
                        record_count=n,
                        duration_s=0.0,
                        success=True,
                        metadata={"cache_hit": True, "fingerprint": fp},
                    )
                )
                continue
        ok, reason = _should_execute(spec, ctx)
        if not ok:
            ctx.add_result(
                PipelineResult(
                    pipeline_name=spec.name,
                    df=spark.range(0).drop("id"),
                    record_count=0,
                    duration_s=0.0,
                    success=False,
                    metadata={"skipped": True, "reason": reason},
                )
            )
            continue
        attempts = seq.retry_attempts if seq.on_pipeline_failure == "retry" else 0
        last_err: Exception | None = None
        shared_before = dict(ctx.shared_data)
        for _ in range(attempts + 1):
            try:
                ctx.add_result(
                    execute_pipeline(
                        spark, spec, ctx, output_root, txn=txn
                    )
                )
                if incremental_root and fp is not None:
                    from small_etl_spark.plans.increments import cache_store

                    exports = {
                        k: v
                        for k, v in ctx.shared_data.items()
                        if shared_before.get(k) != v
                    }
                    cache_store(
                        ctx.results[-1].df,
                        incremental_root,
                        spec.name,
                        fp,
                        exports,
                    )
                last_err = None
                break
            except Exception as e:  # noqa: BLE001
                last_err = e
                from small_etl_spark.errors import is_retryable

                if not is_retryable(e):
                    break  # config/validation errors don't burn retries
        if last_err is not None:
            if seq.on_pipeline_failure == "continue":
                ctx.add_result(
                    PipelineResult(
                        pipeline_name=spec.name,
                        df=spark.range(0).drop("id"),
                        record_count=0,
                        duration_s=0.0,
                        success=False,
                        metadata={"error": str(last_err)},
                    )
                )
                continue
            if txn is not None:
                # atomic sequence: a failed stage under the "stop"
                # policy aborts the whole transaction — no table the
                # run touched becomes visible through the catalog
                txn.abort()
            raise PipelineExecutionError(spec.name, last_err)
    if txn is not None:
        if txn.staged_tables:
            ctx.shared_data["atomic_catalog_version"] = txn.commit()
        else:
            txn.abort()  # no versioned sink ran: nothing to pin
    return ctx


def sequence_metrics(ctx: PipelineContext) -> dict[str, Any]:
    """K7 per-stage + summary metrics (sequence_etl.rs:336-400)."""
    return {
        "pipelines": [
            {
                "pipeline_name": r.pipeline_name,
                "records_processed": r.record_count,
                "duration_ms": round(r.duration_s * 1000, 3),
                "output_path": r.output_path,
                "success": r.success,
                **r.metadata,
            }
            for r in ctx.results
        ],
        "summary": ctx.summary(),
    }
