"""Pipeline spec: the declarative logical plan (TOML or dict).

Mirrors the reference's config surface
(/root/reference/src/config/sequence_config.rs:26-175 and
toml_config.rs:20-117) with the same section names — ``[source]``,
``[extract]``, ``[transform]``, ``[load]``, ``[[pipelines]]``,
``execution_order`` — compiled here into dataclasses that the
sequencer turns into DataFrame chains.

Validation ports the reference's checks for real:
- execution_order names exist           (sequence_config.rs:279-295)
- per-pipeline endpoint/path/concurrency (sequence_config.rs:307-348)
- dependency existence + cycle detection via DFS with a recursion
  stack                                  (sequence_config.rs:350-394)
- output format allow-list csv/tsv/json  (toml_config.rs:169-181)
- ``${VAR}`` env + shared-variable substitution at load time
  (toml_config.rs:138-149, sequence_config.rs:196-276)

The declared-but-unenforced config of the reference (``validation``,
``extract.filters``, ``retry_attempts``) is enforced for real by the
sequencer (SURVEY §7.2 P4).
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field
from typing import Any
from urllib.parse import urlparse

from small_etl_spark.functions.templating import substitute_env_vars

VALID_FORMATS = ("csv", "tsv", "json", "parquet", "orc", "versioned")
VALID_SOURCE_TYPES = (
    "api", "previous", "combined", "file", "table", "sample", "stream",
    "query",
)


class SpecError(ValueError):
    """Invalid pipeline spec (config-time, before any execution)."""


@dataclass
class SourceSpec:
    """Where a stage's input DataFrame comes from (SURVEY §2.1).

    type:
    - ``api``      — HTTP fetch (S1–S4); ``parameterized`` makes it a
      per-record fan-out against a previous stage's rows (S4).
    - ``previous`` — a named (or the latest) prior stage (S5).
    - ``combined`` — union of all prior stages (S6).
    - ``file``     — parquet/csv/json path scan (supersedes S8).
    - ``table``    — named table in the sf_dir catalog.
    - ``sample``   — inline literal records (S7 as a first-class source).
    - ``query``    — a named analytics-catalog query (queries.REGISTRY)
      run against ``sf_dir``; bridges the sequencer and the engine's
      full query surface.
    """

    type: str = "api"
    endpoint: str | None = None
    urls: list[str] = field(default_factory=list)  # multi-endpoint DataSource scan
    schema: str | None = None  # required with urls (DDL string)
    method: str = "GET"
    headers: dict[str, str] = field(default_factory=dict)
    query_params: dict[str, str] = field(default_factory=dict)
    payload_template: str | None = None
    template_params: dict[str, str] = field(default_factory=dict)
    use_previous_data_as_params: bool = False
    timeout_seconds: int = 30
    retry_attempts: int = 0
    retry_delay_seconds: float = 0.0
    on_api_failure: str = "error"  # "error" | "use_sample_data"
    sample_data: list[dict[str, Any]] = field(default_factory=list)
    previous_pipeline: str | None = None  # None ⇒ latest
    merge_with_api: bool = False
    merge_key: str = "id"
    parameterized: bool = False
    rate_limit_ms: int = 100  # S4 inter-call pacing (reference: fixed 100ms)
    # S4 response parsing: DDL of the per-record response fields. Set →
    # fan-out rows become real record columns (object → 1 record, array
    # → 1/element, contextual_pipeline.rs:530-585) entirely JVM-side;
    # unset → schema inference over the response strings.
    response_schema: str | None = None
    parse_response: bool = True  # False = raw (response, source_row) rows
    path: str | None = None  # file source
    format: str = "parquet"  # file source format
    table: str | None = None  # table source
    # stream source (Structured Streaming stage): dedup-within-watermark
    # keys, the event-time column, and the watermark delay
    stream_dedup_keys: list[str] = field(default_factory=list)
    stream_ts_col: str = "ts"
    stream_watermark: str = "2 hours"
    # TIMESTAMP(NANOS) parquet (see sources.tables.load_table): declare
    # the ts column as bigint in `schema` and set this to convert
    # nanos → microsecond timestamp after the scan
    stream_ts_from_nanos: bool = False
    # query source: a named entry from the analytics catalog
    # (small_etl_spark.queries.REGISTRY) run against `sf_dir` — lets a
    # TOML sequence stage consume any of the engine's 124 registered
    # queries as its input frame
    query: str | None = None
    sf_dir: str | None = None  # default: $SPARK_GRAFT_SF_DIR
    max_records: int | None = None  # F4 limit pushed into extract
    first_record_only: bool = False  # "MVP mode"
    filters: dict[str, Any] = field(default_factory=dict)  # F5, enforced


@dataclass
class TransformSpec:
    """Row/column transforms of a stage (SURVEY §2.3/§2.4/§2.6/§2.7/§2.9)."""

    field_mapping: dict[str, str] = field(default_factory=dict)  # P1/P2/P3/P4
    keep_only_fields: list[str] = field(default_factory=list)  # P5
    exclude_fields: list[str] = field(default_factory=list)  # P6
    computed_fields: dict[str, str] = field(default_factory=dict)  # P7
    add_markers: bool = True  # P8 processed/processed_by
    default_values: dict[str, Any] = field(default_factory=dict)  # P9
    clean_text: bool = False  # X1
    normalize_fields: list[str] = field(default_factory=list)  # X2
    trim_whitespace: bool = False  # X3a (declared-only in reference)
    remove_html_tags: bool = False  # X3b (declared-only in reference)
    deduplicate: bool = False  # A2
    deduplicate_fields: list[str] = field(default_factory=list)  # A3
    sort_by: str | None = None  # O1
    sort_order: str = "asc"
    lookup_data: dict[str, str] = field(default_factory=dict)  # J3 stub
    intermediate_conditions: dict[str, Any] = field(default_factory=dict)  # F3
    # F1 threshold side-output: rows with length(title) > threshold
    # land in the intermediate frame (reference [transform.intermediate]
    # title_length_threshold, simple_pipeline.rs threshold rule)
    title_length_threshold: int | None = None
    shared_data_key: str | None = None  # J4 export key
    # real validation (declared-but-unimplemented in the reference):
    required_fields: list[str] = field(default_factory=list)
    field_types: dict[str, str] = field(default_factory=dict)
    min_records: int | None = None
    max_records: int | None = None
    # reference [transform.validation] max_title_length /
    # max_content_length → per-column length caps, enforced for real
    max_field_lengths: dict[str, int] = field(default_factory=dict)


@dataclass
class LoadSpec:
    """Stage sink config (SURVEY §2.2)."""

    formats: list[str] = field(default_factory=lambda: ["csv"])  # K8 allow-list
    output_path: str | None = None
    filename_pattern: str | None = None  # K5 {pipeline_name}/{execution_id}/{timestamp:..}
    zip_outputs: bool = False  # K4
    include_intermediate: bool = True
    include_metadata: bool = False
    sorted_dynamic_header: bool = True  # reference header rule (§1.3)
    partition_by: list[str] = field(default_factory=list)  # hive layout
    # write-audit-publish for the "versioned" format: each run commits
    # to an ephemeral staging branch and atomically fast-forwards main
    # on success — main only ever observes complete stage outputs, and
    # a concurrent writer costs a re-staged retry, never a torn table.
    branch: str | None = None
    # CHECK constraints for the "versioned" format: {name = "sql
    # expr"} — added to the table once (validating existing data),
    # then every batch this or any other writer commits is rejected
    # if a row violates. The reference only DECLARES validation
    # (sequence_config.rs:102-108); this enforces it AT THE TABLE, so
    # it also protects writers that bypass the pipeline.
    constraints: dict[str, str] = field(default_factory=dict)
    single_file: bool = True  # coalesce(1); False = partition-parallel
    # reference [load.filenames] csv/tsv/json = explicit per-format
    # output names (production-example.toml) — overrides the default
    # <stage>.<ext> naming per format
    filenames: dict[str, str] = field(default_factory=dict)


@dataclass
class ConditionsSpec:
    """F6 stage gating (contextual_pipeline.rs:1231-1288)."""

    when_pipeline: str | None = None  # named stage whose count is checked
    min_records: int | None = None
    max_records: int | None = None
    when_shared_data: dict[str, Any] = field(default_factory=dict)
    require_previous_success: bool = True


@dataclass
class PipelineSpec:
    name: str
    enabled: bool = True
    depends_on: list[str] = field(default_factory=list)
    source: SourceSpec = field(default_factory=SourceSpec)
    transform: TransformSpec = field(default_factory=TransformSpec)
    load: LoadSpec = field(default_factory=LoadSpec)
    conditions: ConditionsSpec = field(default_factory=ConditionsSpec)


@dataclass
class SequenceSpec:
    pipelines: list[PipelineSpec]
    execution_order: list[str] = field(default_factory=list)
    shared_variables: dict[str, str] = field(default_factory=dict)
    on_pipeline_failure: str = "stop"  # stop | continue | retry
    retry_attempts: int = 1
    concurrent_requests: int = 1
    # [sequence] atomic = true: every versioned sink in the sequence
    # stages on a multi-table transaction (sinks/txn.py) and lands
    # through ONE catalog swap under <output_root>/_catalog — all of
    # the run's table outputs become visible together or not at all
    atomic: bool = False

    def __post_init__(self) -> None:
        if not self.execution_order:
            self.execution_order = [p.name for p in self.pipelines]

    def by_name(self) -> dict[str, PipelineSpec]:
        return {p.name: p for p in self.pipelines}

    def enabled_in_order(
        self, only: list[str] | None = None, skip: list[str] | None = None
    ) -> list[PipelineSpec]:
        """F7 ``--only``/``--skip`` selection preserving execution_order
        (sequence_etl.rs:215-236; sequence_config.rs:401-409)."""
        byname = self.by_name()
        names = [n for n in self.execution_order if byname[n].enabled]
        if only:
            names = [n for n in names if n in set(only)]
        if skip:
            names = [n for n in names if n not in set(skip)]
        return [byname[n] for n in names]


# --------------------------------------------------------------------------
# parsing
# --------------------------------------------------------------------------


def _sub(obj: Any, shared_vars: dict[str, str]) -> Any:
    """Recursive ``${VAR}`` substitution over every string in the config."""
    if isinstance(obj, str):
        return substitute_env_vars(obj, shared_vars)
    if isinstance(obj, dict):
        return {k: _sub(v, shared_vars) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_sub(v, shared_vars) for v in obj]
    return obj


def _pick(d: dict[str, Any], cls: type, **renames: str) -> dict[str, Any]:
    names = {f for f in cls.__dataclass_fields__}  # type: ignore[attr-defined]
    out = {}
    for k, v in d.items():
        key = renames.get(k, k)
        if key in names:
            out[key] = v
    return out


def pipeline_from_dict(d: dict[str, Any]) -> PipelineSpec:
    src = dict(d.get("source", d.get("extract", {})))
    # the reference splits source(endpoint/headers) and extract(limits/
    # filters/mapping); accept both merged and split layouts
    if "extract" in d and "source" in d:
        src = {**d["source"], **d["extract"]}
    # reference [pipelines.source.data_source] (sequence_config.rs
    # use_previous_output/from_pipeline/merge_with_api): previous-stage
    # wiring nested under the source. An api source fed by previous
    # rows with a {param} endpoint is the S4 per-record fan-out.
    ds = src.pop("data_source", None) or {}
    if ds.get("use_previous_output"):
        if ds.get("from_pipeline"):
            src["previous_pipeline"] = ds["from_pipeline"]
        src["merge_with_api"] = bool(ds.get("merge_with_api", False))
        if src.get("type", "api") == "api" and "{" in (src.get("endpoint") or ""):
            src["parameterized"] = True
        elif not ds.get("merge_with_api") and not src.get("endpoint"):
            src["type"] = "previous"
    # reference [pipelines.source.payload] (test_api_config.toml):
    # body template + use_previous_data_as_params
    payload = src.pop("payload", None) or {}
    if payload.get("body"):
        src["payload_template"] = payload["body"]
    if payload.get("use_previous_data_as_params"):
        src["use_previous_data_as_params"] = True
    # reference [source.parameters] = query-string params
    if "parameters" in src and "query_params" not in src:
        src["query_params"] = {
            str(k): str(v) for k, v in (src.pop("parameters") or {}).items()
        }
    tr = dict(d.get("transform", {}))
    # nested sub-tables of the reference layout: [transform.operations]
    # (clean_text/trim_whitespace/keep_only_fields...), [transform.
    # data_enrichment] (computed_fields), [transform.validation]
    tr.update(_pick(tr.pop("operations", {}) or {}, TransformSpec))
    tr.update(_pick(tr.pop("data_enrichment", {}) or {}, TransformSpec))
    val = tr.pop("validation", {}) or {}
    tr.update(_pick(val, TransformSpec))
    lengths = {}
    if val.get("max_title_length") is not None:
        lengths["title"] = int(val["max_title_length"])
    if val.get("max_content_length") is not None:
        lengths["content"] = int(val["max_content_length"])
    if lengths:
        tr["max_field_lengths"] = lengths
    inter = tr.pop("intermediate", None)
    if inter:
        tr["intermediate_conditions"] = inter.get("conditions", {})
        if inter.get("title_length_threshold") is not None:
            tr["title_length_threshold"] = int(inter["title_length_threshold"])
        if inter.get("export_to_shared") and inter.get("shared_key"):
            tr["shared_data_key"] = inter["shared_key"]
    # the reference puts field_mapping under [pipelines.extract]
    # (sequence_config.rs:66-71); we model it as a transform
    fm = d.get("field_mapping") or src.pop("field_mapping", None)
    if fm and "field_mapping" not in tr:
        tr["field_mapping"] = fm
    load = dict(d.get("load", d.get("output", {})) or {})
    # reference [load] output_formats / output_path aliases and the
    # [load.compression] table (enabled/filename/include_intermediate)
    comp = load.pop("compression", None) or {}
    if comp.get("enabled"):
        load["zip_outputs"] = True
        if comp.get("filename") and not load.get("filename_pattern"):
            load["filename_pattern"] = comp["filename"]
    if "include_intermediate" in comp:
        load["include_intermediate"] = bool(comp["include_intermediate"])
    return PipelineSpec(
        name=d["name"],
        enabled=d.get("enabled", True),
        depends_on=list(d.get("depends_on", d.get("dependencies", []))),
        source=SourceSpec(**_pick(src, SourceSpec, api_endpoint="endpoint")),
        transform=TransformSpec(**_pick(tr, TransformSpec)),
        load=LoadSpec(**_pick(load, LoadSpec, output_formats="formats")),
        conditions=ConditionsSpec(**_pick(d.get("conditions", {}), ConditionsSpec)),
    )


def sequence_from_dict(
    d: dict[str, Any], external_names: set[str] | None = None
) -> SequenceSpec:
    shared_vars = {
        str(k): str(v)
        for k, v in (d.get("global", {}).get("shared_variables", {}) or {}).items()
    }
    d = _sub(d, shared_vars)
    glob = d.get("global", {})
    # the reference nests execution_order under [sequence] and the
    # failure policy under [error_handling] (sequence_config.rs:10-24,
    # :169-175); accept those plus flat/global layouts
    seq_tbl = d.get("sequence", {})
    err_tbl = d.get("error_handling", {})
    order = (
        d.get("execution_order")
        or seq_tbl.get("execution_order")
        or glob.get("execution_order")
        or []
    )
    seq = SequenceSpec(
        pipelines=[pipeline_from_dict(p) for p in d.get("pipelines", [])],
        execution_order=list(order),
        shared_variables=shared_vars,
        on_pipeline_failure=err_tbl.get(
            "on_pipeline_failure", glob.get("on_pipeline_failure", "stop")
        ),
        retry_attempts=int(
            err_tbl.get("retry_attempts", glob.get("retry_attempts", 1))
        ),
        concurrent_requests=int(glob.get("concurrent_requests", 1)),
        atomic=bool(seq_tbl.get("atomic", glob.get("atomic", False))),
    )
    validate_sequence(seq, external_names)
    return seq


def sequence_from_toml(
    path: str, external_names: set[str] | None = None
) -> SequenceSpec:
    """``external_names``: catalog entries that exist outside the spec
    (e.g. ``--lookup-files`` stems) and are legal ``previous`` targets."""
    with open(path, "rb") as f:
        raw = tomllib.load(f)
    if "pipelines" not in raw:
        return single_from_dict(raw)
    return sequence_from_dict(raw, external_names)


def single_from_dict(d: dict[str, Any]) -> SequenceSpec:
    """The reference's single-pipeline TOML layout (toml_config.rs:
    20-117 — top-level [source]/[extract]/[transform]/[output] tables,
    the ``toml_etl`` binary's config): wrapped as a one-stage
    sequence. ``mvp_mode`` maps to first_record_only (toml_config.rs:
    201-209)."""
    shared_vars = {
        str(k): str(v)
        for k, v in (d.get("global", {}).get("shared_variables", {}) or {}).items()
    }
    d = _sub(d, shared_vars)
    name = d.get("pipeline", {}).get("name", d.get("name", "pipeline"))
    body: dict[str, Any] = {"name": name}
    for section in ("source", "extract", "transform", "conditions"):
        if section in d:
            body[section] = d[section]
    if "load" in d or "output" in d:
        body["load"] = d.get("load", d.get("output"))
    if d.get("pipeline", {}).get("mvp_mode") or d.get("mvp_mode"):
        body.setdefault("source", {})
        body["source"] = {**body.get("source", {}), "first_record_only": True}
    seq = SequenceSpec(
        pipelines=[pipeline_from_dict(body)], shared_variables=shared_vars
    )
    validate_sequence(seq)
    return seq


# --------------------------------------------------------------------------
# validation (ported for real)
# --------------------------------------------------------------------------


def _validate_url(url: str, name: str) -> None:
    parsed = urlparse(url)
    if parsed.scheme not in ("http", "https") or not parsed.netloc:
        raise SpecError(f"pipeline {name!r}: invalid endpoint URL {url!r}")


def validate_pipeline(p: PipelineSpec) -> None:
    if p.source.type not in VALID_SOURCE_TYPES:
        raise SpecError(f"pipeline {p.name!r}: unknown source type {p.source.type!r}")
    if p.source.type == "api":
        if p.source.urls:
            if not p.source.schema:
                raise SpecError(
                    f"pipeline {p.name!r}: multi-url api source requires schema"
                )
            for u in p.source.urls:
                _validate_url(u, p.name)
        elif not p.source.endpoint:
            raise SpecError(f"pipeline {p.name!r}: api source requires endpoint")
        else:
            _validate_url(p.source.endpoint, p.name)
    if p.source.type == "file" and not p.source.path:
        raise SpecError(f"pipeline {p.name!r}: file source requires path")
    if p.source.type == "stream":
        if not (p.source.urls or (p.source.path and p.source.schema)):
            raise SpecError(
                f"pipeline {p.name!r}: stream source requires path+schema or urls"
            )
        if p.source.urls and not p.source.schema:
            raise SpecError(
                f"pipeline {p.name!r}: stream urls source requires schema"
            )
    if p.source.type == "query":
        if not p.source.query:
            raise SpecError(f"pipeline {p.name!r}: query source needs 'query'")
        from small_etl_spark.queries import REGISTRY as _QR

        if p.source.query not in _QR:
            raise SpecError(
                f"pipeline {p.name!r}: unknown query {p.source.query!r}"
            )
    if p.source.type == "table" and not p.source.table:
        raise SpecError(f"pipeline {p.name!r}: table source requires table")
    for fmt in p.load.formats:
        if fmt not in VALID_FORMATS:
            raise SpecError(
                f"pipeline {p.name!r}: invalid output format {fmt!r} "
                f"(allowed: {', '.join(VALID_FORMATS)})"
            )
    if p.transform.sort_order not in ("asc", "desc"):
        raise SpecError(f"pipeline {p.name!r}: sort_order must be asc|desc")


def validate_sequence(
    seq: SequenceSpec, external_names: set[str] | None = None
) -> None:
    byname = seq.by_name()
    known = set(byname) | (external_names or set())
    if len(byname) != len(seq.pipelines):
        raise SpecError("duplicate pipeline names")
    for n in seq.execution_order:
        if n not in byname:
            raise SpecError(f"execution_order references unknown pipeline {n!r}")
    if seq.concurrent_requests < 1 or seq.concurrent_requests > 100:
        raise SpecError("concurrent_requests must be in 1..=100")
    if seq.on_pipeline_failure not in ("stop", "continue", "retry"):
        raise SpecError("on_pipeline_failure must be stop|continue|retry")
    for p in seq.pipelines:
        validate_pipeline(p)
        for dep in p.depends_on:
            if dep not in byname:
                raise SpecError(
                    f"pipeline {p.name!r} depends on unknown pipeline {dep!r}"
                )
        if p.source.type == "previous" and p.source.previous_pipeline:
            if p.source.previous_pipeline not in known:
                raise SpecError(
                    f"pipeline {p.name!r} sources unknown pipeline "
                    f"{p.source.previous_pipeline!r}"
                )
    _detect_cycles(seq)


def _detect_cycles(seq: SequenceSpec) -> None:
    """DFS with a recursion stack (sequence_config.rs:350-394)."""
    graph = {p.name: list(p.depends_on) for p in seq.pipelines}
    visited: set[str] = set()
    stack: set[str] = set()

    def dfs(node: str, path: list[str]) -> None:
        visited.add(node)
        stack.add(node)
        for dep in graph.get(node, []):
            if dep in stack:
                raise SpecError(
                    "circular dependency: " + " -> ".join(path + [node, dep])
                )
            if dep not in visited:
                dfs(dep, path + [node])
        stack.discard(node)

    for name in graph:
        if name not in visited:
            dfs(name, [])
