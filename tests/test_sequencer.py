"""Spec parsing/validation, sequencer execution, sinks, HTTP sources.

Mirrors the reference's integration-test strategy (SURVEY §5):
mock HTTP server + tempdir outputs + golden ZIP content.
"""

from __future__ import annotations

import http.server
import json
import os
import threading
import zipfile

import pytest

from small_etl_spark.plans.spec import (
    SpecError,
    sequence_from_dict,
    sequence_from_toml,
)
from small_etl_spark.plans.sequencer import (
    PipelineExecutionError,
    run_sequence,
    sequence_metrics,
)
from small_etl_spark.sinks.files import render_filename
from small_etl_spark.sources.http import http_scan, parameterized_http_fanout

SAMPLE = [
    {"id": 1, "name": "Item 1", "value": 10},
    {"id": 2, "name": "Item 2", "value": 25},
    {"id": 3, "name": "Item 3", "value": 30},
]

# the sample nested response the reference documents inside
# array_field_mapping_example.toml (trimmed to the fields its
# mapping catalog exercises)
DEPARTMENT_SAMPLE = {
    "department": {
        "id": "ENG001",
        "name": "Engineering",
        "locations": [
            {"office": {"name": "HQ", "address": {"city": "San Francisco"}}},
            {"office": {"name": "Remote", "address": {"city": "Austin"}}},
        ],
        "budget": {
            "history": [
                {"year": 2022, "amount": 500000},
                {"year": 2023, "amount": 750000},
                {"year": 2024, "amount": 1000000},
            ]
        },
    },
    "employees": [
        {
            "id": "EMP001",
            "name": "Alice Johnson",
            "email": "alice@company.com",
            "skills": ["Python", "Rust"],
            "projects": [
                {"name": "ETL Pipeline", "status": "active"},
                {"name": "Data Migration", "status": "completed"},
            ],
        },
        {
            "id": "EMP002",
            "name": "Bob Smith",
            "email": "bob@company.com",
            "skills": ["JavaScript"],
            "projects": [{"name": "Web Dashboard", "status": "active"}],
        },
        {
            "id": "EMP003",
            "name": "Charlie Brown",
            "email": "charlie@company.com",
            "skills": ["Python", "SQL"],
            "projects": [{"name": "Data Analysis", "status": "planning"}],
        },
    ],
}


# --------------------------------------------------------------------------
# spec parsing + validation
# --------------------------------------------------------------------------


def test_toml_roundtrip(tmp_path):
    cfg = tmp_path / "seq.toml"
    cfg.write_text(
        """
[global]
on_pipeline_failure = "continue"
[global.shared_variables]
BASE = "http://example.com"

execution_order = ["a", "b"]

[[pipelines]]
name = "a"
[pipelines.source]
type = "api"
endpoint = "${BASE}/posts"
[pipelines.load]
formats = ["csv", "json"]

[[pipelines]]
name = "b"
depends_on = ["a"]
[pipelines.source]
type = "previous"
previous_pipeline = "a"
"""
    )
    seq = sequence_from_toml(str(cfg))
    assert [p.name for p in seq.enabled_in_order()] == ["a", "b"]
    assert seq.by_name()["a"].source.endpoint == "http://example.com/posts"
    assert seq.on_pipeline_failure == "continue"


def test_cycle_detection():
    with pytest.raises(SpecError, match="circular"):
        sequence_from_dict(
            {
                "pipelines": [
                    {"name": "a", "depends_on": ["b"], "source": {"type": "sample"}},
                    {"name": "b", "depends_on": ["a"], "source": {"type": "sample"}},
                ]
            }
        )


def test_validation_errors():
    with pytest.raises(SpecError, match="unknown pipeline"):
        sequence_from_dict(
            {
                "pipelines": [{"name": "a", "source": {"type": "sample"}}],
                "execution_order": ["a", "ghost"],
            }
        )
    with pytest.raises(SpecError, match="invalid output format"):
        sequence_from_dict(
            {
                "pipelines": [
                    {
                        "name": "a",
                        "source": {"type": "sample"},
                        "load": {"formats": ["xml"]},
                    }
                ]
            }
        )
    with pytest.raises(SpecError, match="invalid endpoint URL"):
        sequence_from_dict(
            {"pipelines": [{"name": "a", "source": {"type": "api", "endpoint": "nope"}}]}
        )


# --------------------------------------------------------------------------
# sequencer execution
# --------------------------------------------------------------------------


def test_sequence_sample_transform_zip(spark, tmp_path):
    seq = sequence_from_dict(
        {
            "pipelines": [
                {
                    "name": "extract",
                    "source": {"type": "sample", "sample_data": SAMPLE},
                    "transform": {
                        "computed_fields": {"stage": "pipeline_name"},
                        "intermediate": {"conditions": {"value": 25}},
                    },
                    "load": {
                        "formats": ["csv", "tsv"],
                        "zip_outputs": True,
                        "filename_pattern": "{pipeline_name}_out.zip",
                        "include_metadata": True,
                    },
                },
                {
                    "name": "enrich",
                    "depends_on": ["extract"],
                    "source": {"type": "previous", "previous_pipeline": "extract"},
                    "transform": {
                        "field_mapping": {"name": "label"},
                        "keep_only_fields": ["id", "label", "value", "processed"],
                        "add_markers": False,
                    },
                },
            ]
        }
    )
    ctx = run_sequence(spark, seq, output_root=str(tmp_path))
    assert [r.pipeline_name for r in ctx.results] == ["extract", "enrich"]
    assert ctx.results[0].record_count == 3
    assert ctx.results[0].intermediate.count() == 1

    zpath = tmp_path / "extract" / "extract_out.zip"
    assert ctx.results[0].output_path == str(zpath)
    with zipfile.ZipFile(zpath) as zf:
        names = sorted(zf.namelist())
        assert names == [
            "intermediate.json",
            "metadata.json",
            "output.csv",
            "output.tsv",
        ]
        csv_text = zf.read("output.csv").decode()
        header = csv_text.splitlines()[0]
        # dynamic header = sorted column names (§1.3)
        assert header == ",".join(sorted(header.split(",")))
        meta = json.loads(zf.read("metadata.json"))
        assert meta["pipeline_name"] == "extract"
        inter = json.loads(zf.read("intermediate.json"))
        assert [r["id"] for r in inter] == [2]

    enriched = ctx.results[1].df
    assert set(enriched.columns) == {"id", "label", "value", "processed"}
    metrics = sequence_metrics(ctx)
    assert metrics["summary"]["total_records"] == 6
    assert metrics["summary"]["successful_pipelines"] == 2


def test_shared_data_gating(spark):
    seq = sequence_from_dict(
        {
            "pipelines": [
                {
                    "name": "auth",
                    "source": {
                        "type": "sample",
                        "sample_data": [{"access_token": "tok123", "user": "alice"}],
                    },
                    "transform": {
                        "intermediate": {"conditions": {"user": "alice"}},
                        "shared_data_key": "auth",
                        "add_markers": False,
                    },
                },
                {
                    "name": "gated-run",
                    "source": {"type": "previous"},
                    "conditions": {"when_shared_data": {"token": "tok123"}},
                },
                {
                    "name": "gated-skip",
                    "source": {"type": "previous"},
                    "conditions": {
                        "when_shared_data": {"token": "wrong"},
                        "require_previous_success": False,
                    },
                },
            ],
            "global": {"on_pipeline_failure": "continue"},
        }
    )
    ctx = run_sequence(spark, seq)
    # J4: access_token exported under "token"; other fields prefixed
    assert ctx.shared_data["token"] == "tok123"
    assert ctx.shared_data["auth_user"] == "alice"
    byname = {r.pipeline_name: r for r in ctx.results}
    assert byname["gated-run"].success
    assert not byname["gated-skip"].success
    assert byname["gated-skip"].metadata["skipped"]


def test_combined_source_and_failure_policy(spark):
    seq = sequence_from_dict(
        {
            "pipelines": [
                {"name": "s1", "source": {"type": "sample", "sample_data": SAMPLE[:2]}},
                {
                    "name": "boom",
                    "source": {"type": "sample", "sample_data": SAMPLE},
                    "transform": {"min_records": 99},
                    "conditions": {"require_previous_success": False},
                },
                {
                    "name": "all",
                    "source": {"type": "combined"},
                    "conditions": {"require_previous_success": False},
                },
            ],
            "global": {"on_pipeline_failure": "continue"},
        }
    )
    ctx = run_sequence(spark, seq)
    byname = {r.pipeline_name: r for r in ctx.results}
    assert not byname["boom"].success
    assert "min_records" in byname["boom"].metadata["error"]
    # combined = union of all previous incl. the empty failed frame
    assert byname["all"].record_count == 2

    seq_stop = sequence_from_dict(
        {
            "pipelines": [
                {
                    "name": "boom",
                    "source": {"type": "sample", "sample_data": SAMPLE},
                    "transform": {"min_records": 99},
                }
            ]
        }
    )
    with pytest.raises(PipelineExecutionError):
        run_sequence(spark, seq_stop)


def test_only_skip_selection(spark):
    seq = sequence_from_dict(
        {
            "pipelines": [
                {"name": n, "source": {"type": "sample", "sample_data": SAMPLE[:1]},
                 "conditions": {"require_previous_success": False}}
                for n in ("a", "b", "c")
            ]
        }
    )
    ctx = run_sequence(spark, seq, only=["a", "c"], skip=["c"])
    assert [r.pipeline_name for r in ctx.results] == ["a"]


def test_render_filename():
    import datetime as dt

    now = dt.datetime(2026, 8, 13, 12, 30, 0, tzinfo=dt.timezone.utc)
    out = render_filename(
        "{pipeline_name}_{execution_id}_{timestamp:%Y%m%d_%H%M%S}.zip", "p1", "e1", now
    )
    assert out == "p1_e1_20260813_123000.zip"


# --------------------------------------------------------------------------
# HTTP sources against a local mock server (reference uses httpmock)
# --------------------------------------------------------------------------


class _Handler(http.server.BaseHTTPRequestHandler):
    fail_next = 0
    seen_auth: list[str] = []
    seen_posts: list[str] = []

    def do_POST(self):  # noqa: N802
        cls = type(self)
        length = int(self.headers.get("Content-Length", 0))
        cls.seen_posts.append(self.rfile.read(length).decode())
        data = b'[{"ok": true}]'
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_PUT(self):  # noqa: N802 - test-api-config.toml update stage
        self.do_POST()

    def do_GET(self):  # noqa: N802
        cls = type(self)
        if cls.fail_next > 0:
            cls.fail_next -= 1
            self.send_error(500)
            return
        cls.seen_auth.append(self.headers.get("Authorization", ""))
        if self.path.startswith("/department"):
            # the nested sample response documented in the reference's
            # array_field_mapping_example.toml (commented block)
            body = json.dumps(DEPARTMENT_SAMPLE)
        elif self.path.startswith("/users/"):
            uid = int(self.path.rsplit("/", 1)[1])
            body = json.dumps(
                {"user_id": uid, "name": f"user{uid}", "email": f"u{uid}@x.io"}
            )
        elif self.path.startswith("/orders/"):
            uid = int(self.path.rsplit("/", 1)[1])
            # array response: 2 orders per user (fan-out must explode)
            body = json.dumps(
                [
                    {"order_id": uid * 10 + i, "user_id": uid, "amount": 5.0 * i}
                    for i in (1, 2)
                ]
            )
        else:
            body = json.dumps(SAMPLE)
        data = body.encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *args):  # silence
        pass


@pytest.fixture(scope="module")
def mock_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_scan_and_retry(spark, mock_server):
    df = http_scan(spark, f"{mock_server}/posts")
    rows = {r.id: r.value for r in df.collect()}
    assert rows == {1: 10, 2: 25, 3: 30}

    # first attempt 500s; retry succeeds (reference declares
    # retry_attempts but never implements it — we do)
    _Handler.fail_next = 1
    df = http_scan(spark, f"{mock_server}/posts", retry_attempts=1)
    assert df.count() == 3

    # exhausted retries + fallback policy
    _Handler.fail_next = 5
    df = http_scan(
        spark,
        f"{mock_server}/posts",
        retry_attempts=1,
        on_failure="use_sample_data",
        sample_data=[{"id": 99, "name": "fallback", "value": 0}],
    )
    assert [r.id for r in df.collect()] == [99]
    _Handler.fail_next = 0


def test_http_templated_auth_header(spark, mock_server):
    _Handler.seen_auth.clear()
    http_scan(
        spark,
        f"{mock_server}/posts",
        headers={"Authorization": "Bearer {{token}}"},
        shared_data={"token": "tok42"},
    )
    assert _Handler.seen_auth == ["Bearer tok42"]


def test_parameterized_fanout(spark, mock_server):
    upstream = spark.createDataFrame([(1,), (2,), (3,)], ["user_id"])
    out = parameterized_http_fanout(
        upstream.repartition(1),
        f"{mock_server}/users/{{user_id}}",
        rate_limit_ms=0,
    )
    parsed = sorted(json.loads(r.response)["user_id"] for r in out.collect())
    assert parsed == [1, 2, 3]


def test_parameterized_fanout_parses_object_responses(spark, mock_server):
    """S4 parity: with response_schema the fan-out returns record
    columns, not raw JSON (contextual_pipeline.rs:530-585)."""
    upstream = spark.createDataFrame([(1,), (2,)], ["user_id"])
    out = parameterized_http_fanout(
        upstream.repartition(1),
        f"{mock_server}/users/{{user_id}}",
        rate_limit_ms=0,
        response_schema="user_id bigint, name string, email string",
    )
    rows = {r.user_id: (r.name, r.email) for r in out.collect()}
    assert rows == {1: ("user1", "u1@x.io"), 2: ("user2", "u2@x.io")}


def test_parameterized_fanout_explodes_array_responses(spark, mock_server):
    """An array response yields one record per element (reference
    pushes each array item as its own Record)."""
    from small_etl_spark.sources.http import parse_fanout_responses

    upstream = spark.createDataFrame([(1,), (2,)], ["user_id"])
    out = parameterized_http_fanout(
        upstream.repartition(1),
        f"{mock_server}/orders/{{user_id}}",
        rate_limit_ms=0,
        response_schema="order_id bigint, user_id bigint, amount double",
    )
    rows = sorted((r.order_id, r.user_id, r.amount) for r in out.collect())
    assert rows == [(11, 1, 5.0), (12, 1, 10.0), (21, 2, 5.0), (22, 2, 10.0)]

    # schema-inference path (no DDL): same records via spark.read.json
    raw = parameterized_http_fanout(
        upstream.repartition(1), f"{mock_server}/orders/{{user_id}}", rate_limit_ms=0
    )
    inferred = parse_fanout_responses(raw, spark=spark)
    assert inferred.count() == 4
    assert {"order_id", "user_id", "amount"} <= set(inferred.columns)


def test_sequence_api_chain_with_fanout(spark, mock_server, tmp_path):
    """Mirror of /root/reference/tests/simple_api_chain_test.rs:12-299:
    stage 1 lists users from the API, stage 2 fans out one call per
    user and its *parsed* response flows through field_mapping into a
    stage-3 'previous' consumer like any other source."""
    seq = sequence_from_dict(
        {
            "pipelines": [
                {
                    "name": "get-users",
                    "source": {"type": "api", "endpoint": f"{mock_server}/posts"},
                    "transform": {
                        "field_mapping": {"id": "user_id"},
                        "keep_only_fields": ["user_id"],
                        "add_markers": False,
                    },
                },
                {
                    "name": "get-user-details",
                    "depends_on": ["get-users"],
                    "source": {
                        "type": "api",
                        "endpoint": f"{mock_server}/users/{{user_id}}",
                        "parameterized": True,
                        "previous_pipeline": "get-users",
                        "rate_limit_ms": 0,
                        "response_schema": "user_id bigint, name string, email string",
                    },
                    "transform": {
                        "field_mapping": {
                            "user_id": "detail_user_id",
                            "name": "detail_name",
                            "email": "detail_email",
                        },
                        "add_markers": False,
                    },
                },
                {
                    "name": "consume",
                    "depends_on": ["get-user-details"],
                    "source": {"type": "previous",
                               "previous_pipeline": "get-user-details"},
                    "transform": {
                        "keep_only_fields": ["detail_user_id", "detail_name"],
                        "add_markers": False,
                    },
                },
            ]
        }
    )
    ctx = run_sequence(spark, seq, output_root=str(tmp_path))
    details = ctx.results[1].df
    assert set(details.columns) == {"detail_user_id", "detail_name", "detail_email"}
    got = {r.detail_user_id: (r.detail_name, r.detail_email)
           for r in details.collect()}
    assert got == {
        1: ("user1", "u1@x.io"),
        2: ("user2", "u2@x.io"),
        3: ("user3", "u3@x.io"),
    }
    consumed = ctx.results[2].df
    assert set(consumed.columns) == {"detail_user_id", "detail_name"}
    assert consumed.count() == 3


def test_error_taxonomy():
    """§2.10 typed error taxonomy (error.rs:3-225), enforced for real."""
    from small_etl_spark.errors import Category, Severity, classify, exit_code
    from small_etl_spark.operators.validation import ValidationError
    from small_etl_spark.plans.spec import SpecError
    from small_etl_spark.sources.http import HttpFetchError

    spec = classify(SpecError("bad config"))
    assert (spec.severity, spec.category, spec.retryable) == (
        Severity.CRITICAL, Category.CONFIG, False)
    assert exit_code(SpecError("x")) == 1

    net = classify(HttpFetchError("boom"))
    assert net.retryable and net.category is Category.NETWORK
    assert exit_code(HttpFetchError("x")) == 2

    val = classify(ValidationError("missing"))
    assert not val.retryable and val.category is Category.VALIDATION


def test_metrics_include_monitor(spark):
    seq = sequence_from_dict(
        {"pipelines": [{"name": "m", "source": {"type": "sample",
                                                "sample_data": SAMPLE}}]}
    )
    ctx = run_sequence(spark, seq)
    m = sequence_metrics(ctx)["pipelines"][0]
    assert m["peak_rss_mb"] > 0
    # per-phase CPU/memory sampling (monitor.rs:9-106 parity)
    mon = m["monitor"]
    assert mon["phase"] == "m"
    assert mon["cpu_percent"] >= 0.0
    assert mon["memory_mb"] > 0
    assert mon["peak_memory_mb"] >= mon["memory_mb"]
    assert 0.0 <= mon["memory_percent"] <= 100.0
    assert mon["elapsed_s"] > 0


def test_reference_layout_toml(tmp_path):
    """The reference's config layout parses as-is: [sequence]
    execution_order, [error_handling], field_mapping under
    [pipelines.extract] (sequence_config.rs:10-24, :66-71, :169-175)."""
    cfg = tmp_path / "ref_layout.toml"
    cfg.write_text(
        """
[sequence]
name = "seq"
execution_order = ["a"]

[error_handling]
on_pipeline_failure = "continue"
retry_attempts = 3

[[pipelines]]
name = "a"
[pipelines.source]
type = "api"
endpoint = "https://example.com/posts"
[pipelines.extract]
max_records = 10
[pipelines.extract.field_mapping]
id = "post_id"
userId = "author_id"
"""
    )
    seq = sequence_from_toml(str(cfg))
    assert seq.on_pipeline_failure == "continue"
    assert seq.retry_attempts == 3
    p = seq.by_name()["a"]
    assert p.source.max_records == 10
    assert p.transform.field_mapping == {"id": "post_id", "userId": "author_id"}


def test_sort_on_mapped_field(spark):
    """Mapping applies during extract, so sort_by/dedup use mapped
    names (reference maps inside the fetch, contextual_pipeline.rs:
    530-550, then dedups/sorts :609-676)."""
    seq = sequence_from_dict(
        {
            "pipelines": [
                {
                    "name": "m",
                    "source": {"type": "sample", "sample_data": SAMPLE},
                    "transform": {
                        "field_mapping": {"value": "amount"},
                        "sort_by": "amount",
                        "sort_order": "desc",
                        "deduplicate_fields": ["amount"],
                        "add_markers": False,
                    },
                }
            ]
        }
    )
    ctx = run_sequence(spark, seq)
    rows = ctx.results[0].df.collect()
    assert [r.amount for r in rows] == [30, 25, 10]


def test_nested_mapping_example_config(spark):
    seq = sequence_from_toml("configs/nested-mapping-example.toml")
    ctx = run_sequence(spark, seq)
    rows = {r.id: (r.full_name, r.city) for r in ctx.results[0].df.collect()}
    assert rows == {1: ("Alice", "Zurich"), 2: ("Bob", "Oslo")}


def test_streaming_example_config(spark, tmp_path):
    """configs/streaming-example.toml runs end-to-end: stream stage
    over the nanos-timestamp events parquet (dedup within watermark),
    batch consumer, CSV export — record counts match the batch read."""
    from small_etl_spark.sources.tables import load_table

    seq = sequence_from_toml("configs/streaming-example.toml")
    ctx = run_sequence(spark, seq, output_root=str(tmp_path))
    n_batch = load_table(spark, "/root/testdata/sf0.001", "events").count()
    assert ctx.results[0].record_count == n_batch  # event_ids are unique
    assert ctx.results[1].record_count == n_batch
    assert set(ctx.results[0].df.columns) == {
        "event_id", "user_id", "event_type", "value"
    }


def test_parallel_sequence_matches_sequential(spark):
    """Independent stages run concurrently (real concurrency vs the
    reference's validated-but-sequential knob); diamond DAG results
    and order match the sequential run."""
    from small_etl_spark.plans.sequencer import run_sequence_parallel

    spec = {
        "pipelines": [
            {"name": "root", "source": {"type": "sample", "sample_data": SAMPLE}},
            {
                "name": "left",
                "depends_on": ["root"],
                "source": {"type": "previous", "previous_pipeline": "root"},
                "transform": {"field_mapping": {"value": "v"},
                              "add_markers": False},
            },
            {
                "name": "right",
                "depends_on": ["root"],
                "source": {"type": "previous", "previous_pipeline": "root"},
                "transform": {"computed_fields": {"tag": "r"},
                              "add_markers": False},
            },
            {
                "name": "merge",
                "depends_on": ["left", "right"],
                "source": {"type": "combined"},
            },
        ],
        "global": {"concurrent_requests": 4},
    }
    seq_par = sequence_from_dict(spec)
    ctx = run_sequence_parallel(spark, seq_par)
    names = [r.pipeline_name for r in ctx.results]
    assert names == ["root", "left", "right", "merge"]
    counts = {r.pipeline_name: r.record_count for r in ctx.results}
    # combined = union of root+left+right
    assert counts == {"root": 3, "left": 3, "right": 3, "merge": 9}
    seq_seq = sequence_from_dict(spec)
    ctx2 = run_sequence(spark, seq_seq)
    assert [r.record_count for r in ctx2.results] == [3, 3, 3, 9]


def test_single_pipeline_toml_layout(spark, tmp_path):
    """toml_etl single-pipeline layout: top-level [source]/[transform]/
    [output], mvp_mode -> first_record_only (toml_config.rs:20-117,
    :201-209)."""
    cfg = tmp_path / "mvp.toml"
    cfg.write_text(
        """
[pipeline]
name = "mvp"
mvp_mode = true

[source]
type = "file"
path = "/root/testdata/sf0.001/orders.parquet"

[transform]
field_mapping = { o_orderkey = "id" }
keep_only_fields = ["id", "processed"]

[output]
formats = ["csv"]
"""
    )
    seq = sequence_from_toml(str(cfg))
    assert [p.name for p in seq.pipelines] == ["mvp"]
    assert seq.pipelines[0].source.first_record_only
    ctx = run_sequence(spark, seq)
    assert ctx.results[0].record_count == 1
    assert set(ctx.results[0].df.columns) == {"id", "processed", "processed_by"}


def test_payload_template_params(spark, mock_server):
    """X7: payload placeholders fill from the upstream stage's first
    record via template_params / use_previous_data_as_params; shared
    data wins on conflicts (contextual_pipeline.rs:270-327, priority
    test :1992-2015)."""
    _Handler.seen_posts.clear()
    seq = sequence_from_dict(
        {
            "pipelines": [
                {
                    "name": "ids",
                    "source": {
                        "type": "sample",
                        "sample_data": [{"user_id": 7, "region": "eu"}],
                    },
                    "transform": {"add_markers": False},
                },
                {
                    "name": "post",
                    "depends_on": ["ids"],
                    "source": {
                        "type": "api",
                        "endpoint": f"{mock_server}/posts",
                        "method": "POST",
                        "payload_template": '{"uid": {{uid}}, "region": "{{region}}"}',
                        "template_params": {"uid": "user_id"},
                        "use_previous_data_as_params": True,
                        "previous_pipeline": "ids",
                    },
                },
            ]
        }
    )
    run_sequence(spark, seq)
    assert _Handler.seen_posts == ['{"uid": 7, "region": "eu"}']


def test_http_json_datasource(spark, mock_server):
    """Python DataSource: executor-side HTTP scan, one partition per
    URL, rows aligned to the declared schema."""
    from small_etl_spark.sources.http_datasource import HttpJsonDataSource

    spark.dataSource.register(HttpJsonDataSource)
    df = (
        spark.read.format("http_json")
        .schema("id long, name string, value long")
        .option("urls", f"{mock_server}/posts,{mock_server}/posts")
        .load()
    )
    assert df.rdd.getNumPartitions() == 2
    rows = sorted((r.id, r.name, r.value) for r in df.collect())
    assert len(rows) == 6  # 3 sample rows x 2 url partitions
    assert rows[0] == (1, "Item 1", 10)


def test_http_json_datasource_urls_json_with_commas(spark, mock_server):
    """URLs with literal commas in query strings (ids=1,2,3) survive
    via the JSON-array option; the comma-separated form would split
    them into invalid fragments."""
    from small_etl_spark.sources.http_datasource import HttpJsonDataSource

    spark.dataSource.register(HttpJsonDataSource)
    df = (
        spark.read.format("http_json")
        .schema("id long, name string, value long")
        .option("urls_json", json.dumps([f"{mock_server}/posts?ids=1,2,3"]))
        .load()
    )
    assert df.rdd.getNumPartitions() == 1
    assert df.count() == 3


def test_http_json_stream_reader(spark, mock_server, tmp_path):
    """The same http_json format under readStream: one poll per
    micro-batch (availableNow drains a single poll)."""
    from small_etl_spark.sources.http_datasource import HttpJsonDataSource

    spark.dataSource.register(HttpJsonDataSource)
    stream = (
        spark.readStream.format("http_json")
        .schema("id long, name string, value long")
        .option("urls", f"{mock_server}/posts")
        .load()
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("http_stream_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(r.id for r in spark.table("http_stream_sink").collect())
    assert rows == [1, 2, 3]


def test_http_json_stream_two_microbatches(spark, mock_server, tmp_path):
    """Two successive drains against one checkpoint advance the poll
    offset twice — the stream really is a sequence of micro-batches
    (poll 0→1, then 1→2), each fetching the endpoint once."""
    from small_etl_spark.sources.http_datasource import HttpJsonDataSource

    spark.dataSource.register(HttpJsonDataSource)
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "out2")
    for _ in range(2):
        stream = (
            spark.readStream.format("http_json")
            .schema("id long, name string, value long")
            .option("urls", f"{mock_server}/posts")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    rows = sorted(r.id for r in spark.read.parquet(out).collect())
    assert rows == [1, 1, 2, 2, 3, 3]
    # the checkpoint's committed offset reflects both polls
    import json as _json
    import os as _os

    odir = _os.path.join(ckpt, "offsets")
    batches = sorted(int(b) for b in _os.listdir(odir) if b.isdigit())
    assert batches == [0, 1]


def test_sequence_with_multi_url_source(spark, mock_server):
    seq = sequence_from_dict(
        {
            "pipelines": [
                {
                    "name": "multi",
                    "source": {
                        "type": "api",
                        "urls": [f"{mock_server}/posts", f"{mock_server}/posts"],
                        "schema": "id long, name string, value long",
                    },
                    "transform": {"add_markers": False},
                }
            ]
        }
    )
    ctx = run_sequence(spark, seq)
    assert ctx.results[0].record_count == 6

    with pytest.raises(SpecError, match="requires schema"):
        sequence_from_dict(
            {
                "pipelines": [
                    {
                        "name": "bad",
                        "source": {"type": "api", "urls": ["http://x.example/a"]},
                    }
                ]
            }
        )


def test_stream_source_stage(spark, tmp_path):
    """type='stream': a Structured Streaming stage in the sequence —
    file stream + dedup-within-watermark drained availableNow, its
    result consumed by a downstream batch stage like any other."""
    src_dir = tmp_path / "stream_in"
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "a"), (1, "2024-01-01 10:00:01", "a-dup"),
         (2, "2024-01-01 10:05:00", "b"), (3, "2024-01-01 10:06:00", "c")],
        "id long, ts_s string, v string",
    ).selectExpr("id", "CAST(ts_s AS TIMESTAMP) AS ts", "v")
    df.coalesce(1).write.parquet(str(src_dir))

    seq = sequence_from_dict(
        {
            "pipelines": [
                {
                    "name": "ingest",
                    "source": {
                        "type": "stream",
                        "path": str(src_dir),
                        "schema": "id long, ts timestamp, v string",
                        "stream_dedup_keys": ["id"],
                    },
                    "transform": {"add_markers": False},
                },
                {
                    "name": "consume",
                    "depends_on": ["ingest"],
                    "source": {"type": "previous", "previous_pipeline": "ingest"},
                    "transform": {
                        "keep_only_fields": ["id", "v"],
                        "add_markers": False,
                    },
                },
            ]
        }
    )
    ctx = run_sequence(spark, seq, output_root=str(tmp_path / "out"))
    assert ctx.results[0].record_count == 3  # id=1 deduped within watermark
    got = {r.id for r in ctx.results[1].df.collect()}
    assert got == {1, 2, 3}


def test_stream_source_http_urls(spark, mock_server):
    """type='stream' over HTTP endpoints via the http_json stream
    reader (one poll drained availableNow)."""
    seq = sequence_from_dict(
        {
            "pipelines": [
                {
                    "name": "http-stream",
                    "source": {
                        "type": "stream",
                        "urls": [f"{mock_server}/posts"],
                        "schema": "id long, name string, value long",
                    },
                    "transform": {"add_markers": False},
                }
            ]
        }
    )
    ctx = run_sequence(spark, seq)
    assert ctx.results[0].record_count == 3

    with pytest.raises(SpecError, match="stream source requires"):
        sequence_from_dict(
            {"pipelines": [{"name": "bad", "source": {"type": "stream"}}]}
        )


def test_zip_members_have_no_duplicated_rows(spark, tmp_path):
    """Regression: overlapping part-file globs must not duplicate the
    data rows inside ZIP members."""
    import zipfile as _zf

    from small_etl_spark.sinks.files import write_outputs, zip_output_dir

    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    written = write_outputs(df, str(tmp_path), ["csv", "json"])
    z = zip_output_dir(str(tmp_path), written, "out.zip")
    with _zf.ZipFile(z) as zf:
        csv_lines = zf.read("output.csv").decode().strip().splitlines()
        json_lines = zf.read("output.json").decode().strip().splitlines()
    assert csv_lines == ["id,v", "1,a", "2,b", "3,c"]
    assert len(json_lines) == 3


def test_second_storage_root_file_uri(spark, tmp_path):
    """K6: a non-cwd file:// root works end-to-end — Spark writers take
    the URI, the driver-side ZIP post-pass resolves it locally, and the
    output reads back. Proves path handling is not cwd-relative
    (reference S3 impl: /root/reference/src/config/lambda.rs:173-246;
    the s3a:// conf block lives in session.S3A_CONF — same code path,
    different scheme)."""
    import zipfile as _zf

    from small_etl_spark.sinks.files import write_outputs, zip_output_dir

    root = f"file://{tmp_path}/other-root/stage"
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    written = write_outputs(df, root, ["csv", "parquet"])
    assert written["csv"].startswith("file://")
    # read back through Spark using the URI (writer side)
    back = spark.read.option("header", True).csv(written["csv"])
    assert back.count() == 2
    # driver-side post-pass resolves the URI to a local path
    z = zip_output_dir(root, written, "out.zip")
    assert z == f"{tmp_path}/other-root/stage/out.zip"
    with _zf.ZipFile(z) as zf:
        assert "output.csv" in zf.namelist()


def test_s3a_conf_block_shape():
    """K6: the documented S3 conf merges cleanly into a builder conf
    dict (jars absent in this container, so no live s3a round-trip)."""
    from small_etl_spark.session import S3A_CONF

    assert all(k.startswith("spark.") for k in S3A_CONF)
    assert S3A_CONF["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert all(isinstance(v, str) for v in S3A_CONF.values())


def test_zip_with_parquet_stores_raw_bytes(spark, tmp_path):
    """Regression: formats=['parquet'] + zip_outputs must not try to
    utf-8-decode binary part files; they land as raw-bytes members
    readable back as parquet."""
    import io
    import zipfile as _zf

    from small_etl_spark.sinks.files import write_outputs, zip_output_dir

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    written = write_outputs(df, str(tmp_path), ["parquet", "csv"])
    z = zip_output_dir(str(tmp_path), written, "out.zip")
    with _zf.ZipFile(z) as zf:
        names = zf.namelist()
        pq_members = [n for n in names if n.startswith("output.parquet/")]
        assert len(pq_members) == 1
        assert "output.csv" in names
        import pyarrow.parquet as pq

        table = pq.read_table(io.BytesIO(zf.read(pq_members[0])))
        assert table.num_rows == 2


def test_orc_roundtrip_and_zip(spark, tmp_path):
    """K8 extension: ORC is the second bundled columnar format —
    write, read back identical, and ZIP stores it as raw-bytes
    members like parquet."""
    import zipfile

    from small_etl_spark.plans.spec import VALID_FORMATS
    from small_etl_spark.sinks.files import write_outputs, zip_output_dir

    assert "orc" in VALID_FORMATS
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, s string")
    written = write_outputs(df, str(tmp_path), ["orc"])
    back = spark.read.orc(written["orc"])
    assert sorted(map(tuple, back.collect())) == [(1, "a"), (2, "b")]
    z = zip_output_dir(str(tmp_path), written, "out.zip")
    names = zipfile.ZipFile(z).namelist()
    assert any(n.startswith("output.orc/") for n in names)


def test_query_catalog_source_stage(spark, tmp_path):
    """type='query' source: a sequence stage consumes a registered
    analytics query as its input and downstream stages see it like
    any other result."""
    from small_etl_spark.plans.sequencer import run_sequence
    from small_etl_spark.plans.spec import sequence_from_dict

    seq = sequence_from_dict(
        {
            "sequence": {"name": "qsrc", "output_root": str(tmp_path)},
            "pipelines": [
                {
                    "name": "top_customers",
                    "source": {
                        "type": "query",
                        "query": "heavy_hitter_users",
                        "sf_dir": "/root/testdata/sf0.001",
                    },
                    "output": {"formats": ["json"]},
                },
                {
                    "name": "downstream",
                    "source": {"type": "previous",
                               "previous_pipeline": "top_customers"},
                    "transform": {"computed_fields": {"tagged": "'yes'"}},
                    "output": {"formats": ["csv"]},
                },
            ],
        }
    )
    ctx = run_sequence(spark, seq)
    by_name = {n: ctx.get(n) for n in ("top_customers", "downstream")}
    assert by_name["top_customers"].record_count == 10
    assert by_name["downstream"].record_count == 10
    assert "share" in by_name["downstream"].df.columns


def test_query_source_unknown_name_rejected(spark):
    from small_etl_spark.plans.spec import SpecError, sequence_from_dict

    import pytest as _pytest

    with _pytest.raises(SpecError, match="unknown query"):
        sequence_from_dict(
            {
                "sequence": {"name": "bad"},
                "pipelines": [
                    {"name": "x",
                     "source": {"type": "query", "query": "nope"},
                     "output": {"formats": ["json"]}},
                ],
            }
        )


def test_compact_dir_merges_small_files(spark, tmp_path):
    from small_etl_spark.sinks.files import compact_dir

    df = spark.range(1000).withColumnRenamed("id", "v")
    p = str(tmp_path / "frag")
    df.repartition(50).write.parquet(p)
    import glob as _glob

    assert len(_glob.glob(f"{p}/part-*")) == 50
    compact_dir(spark, p, target_rows_per_file=500)
    parts = _glob.glob(f"{p}/part-*")
    assert len(parts) == 2
    back = spark.read.parquet(p)
    assert back.count() == 1000
    assert sorted(r["v"] for r in back.collect()) == list(range(1000))


def test_mvp_simple_example_config(spark, tmp_path):
    """configs/mvp-simple.toml (reference single-[pipeline] layout):
    first_record_only truncates to one record and the csv+json
    outputs land zipped under the configured name."""
    import os

    seq = sequence_from_toml("configs/mvp-simple.toml")
    ctx = run_sequence(spark, seq, output_root=str(tmp_path))
    rows = ctx.results[0].df.collect()
    assert len(rows) == 1 and rows[0].id == 1 and rows[0].title == "first post"
    zips = [
        os.path.join(root, f)
        for root, _, files in os.walk(tmp_path)
        for f in files
        if f.endswith(".zip")
    ]
    assert any(os.path.basename(z) == "mvp_output.zip" for z in zips)


def test_stage_output_persist_is_reused_downstream(spark):
    """The sequencer persists each stage output before counting it;
    a downstream previous-stage consumer must read the cached data
    (InMemoryTableScan in its plan), not recompute the upstream
    pipeline."""
    seq = {
        "pipelines": [
            {"name": "root", "source": {"type": "sample", "sample_data": SAMPLE}},
            {
                "name": "child",
                "depends_on": ["root"],
                "source": {"type": "previous", "previous_pipeline": "root"},
                "transform": {"add_markers": False},
            },
        ]
    }
    ctx = run_sequence(spark, sequence_from_dict(seq))
    child_df = ctx.results[1].df
    plan = child_df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan


def test_parse_fanout_strict_catches_late_keys(spark):
    """Schema inference samples the first n_samples responses;
    from_json silently drops keys it never saw. strict=True must
    surface exactly that silent loss (a key first appearing after the
    sample window) as a loud error naming the key, and a larger
    n_samples that covers the key must make the same parse succeed."""
    import pytest as _pytest

    from small_etl_spark.sources.http import parse_fanout_responses

    rows = [(f'{{"a": {i}}}',) for i in range(20)] + [
        ('{"a": 99, "late_key": "x"}',),
        ('[{"a": 1, "arr_key": 2}]',),
    ]
    raw = spark.createDataFrame(rows, ["response"]).coalesce(1)

    # default window misses both late keys -> strict raises, names them
    with _pytest.raises(ValueError) as exc:
        parse_fanout_responses(raw, spark=spark, n_samples=8, strict=True)
    assert "late_key" in str(exc.value) and "arr_key" in str(exc.value)

    # widened sample covers every shape -> strict parse succeeds
    out = parse_fanout_responses(raw, spark=spark, n_samples=64, strict=True)
    assert {"a", "late_key", "arr_key"} <= set(out.columns)
    assert out.count() == len(rows)


# --------------------------------------------------------------------------
# mirrored reference example configs run end-to-end under the mock API
# --------------------------------------------------------------------------


def _run_config(spark, path, mock_server, tmp_path, monkeypatch, **kw):
    from small_etl_spark.plans.sequencer import run_sequence
    from small_etl_spark.plans.spec import sequence_from_toml

    monkeypatch.setenv("API_BASE", mock_server)
    seq = sequence_from_toml(path)
    return run_sequence(spark, seq, output_root=str(tmp_path), **kw)


def test_config_simple_api_chain(spark, mock_server, tmp_path, monkeypatch):
    """configs/simple-api-chain-example.toml (reference twin): stage 1
    lists 3 users, exports the first to shared data, stage 2 fans out
    one /users/{user_id} call per row via [source.data_source]
    use_previous_output — the reference's own TOML layout end-to-end."""
    ctx = _run_config(
        spark, "configs/simple-api-chain-example.toml",
        mock_server, tmp_path, monkeypatch,
    )
    by = {r.pipeline_name: r for r in ctx.results}
    assert by["get-users"].record_count == 3
    assert by["get-user-details"].record_count == 3
    assert ctx.shared_data["user_ids_user_id"] in (1, 2, 3)
    details = by["get-user-details"].df
    assert {"full_name", "email_address"} <= set(details.columns)
    assert sorted(r.full_name for r in details.collect()) == [
        "user1", "user2", "user3",
    ]


def test_config_dev_testing(spark, mock_server, tmp_path, monkeypatch):
    """configs/dev-testing.toml (reference twin): single-[pipeline]
    layout with [transform.operations], required-field validation and
    a zipped csv+json bundle."""
    import zipfile as _zf

    ctx = _run_config(
        spark, "configs/dev-testing.toml", mock_server, tmp_path, monkeypatch
    )
    res = ctx.results[0]
    assert res.record_count == 3
    assert "test_data" in res.df.columns
    z = tmp_path / "dev-testing" / "test_output.zip"
    assert z.exists()
    with _zf.ZipFile(z) as zf:
        assert {"output.csv", "output.json"} <= set(zf.namelist())


def test_config_production_example(spark, mock_server, tmp_path, monkeypatch):
    """configs/production-example.toml (reference twin): templated
    auth header, query parameters, retries, max_title_length
    validation, the F1 title_length_threshold intermediate, and a ZIP
    whose members carry the [load.filenames] explicit names."""
    import zipfile as _zf

    monkeypatch.setenv("API_TOKEN", "prod-secret")
    _Handler.seen_auth.clear()
    ctx = _run_config(
        spark, "configs/production-example.toml",
        mock_server, tmp_path, monkeypatch,
    )
    res = ctx.results[0]
    assert res.record_count == 3
    assert "prod-secret" in _Handler.seen_auth
    z = tmp_path / "production-etl" / "production_data.zip"
    assert z.exists()
    with _zf.ZipFile(z) as zf:
        names = set(zf.namelist())
        # [load.filenames] names, not the default output.<fmt>
        assert {
            "processed_data.csv", "processed_data.tsv", "full_data.json",
        } <= names
        # F1 side-output: every title ("Item N") is longer than the
        # threshold of 5 -> all 3 rows land in intermediate.json
        inter = json.loads(zf.read("intermediate.json"))
        assert len(inter) == 3


def test_config_test_api_methods(spark, mock_server, tmp_path, monkeypatch):
    """configs/test-api-config.toml (reference twin): GET list, POST
    with a fixed JSON body, PUT with a {{key}}-templated body rendered
    per previous-stage record (use_previous_data_as_params)."""
    _Handler.seen_posts.clear()
    ctx = _run_config(
        spark, "configs/test-api-config.toml",
        mock_server, tmp_path, monkeypatch,
    )
    by = {r.pipeline_name: r for r in ctx.results}
    assert by["get_users"].record_count == 3
    assert by["create_user"].record_count == 1
    assert by["update_user_with_data"].record_count == 3
    fixed = [p for p in _Handler.seen_posts if "Test User" in p]
    assert len(fixed) == 1
    updated = sorted(p for p in _Handler.seen_posts if "(Updated)" in p)
    assert len(updated) == 3
    assert '"name": "Item 1 (Updated)"' in updated[0]
    assert '"id": 1' in updated[0] and '"value": 10' in updated[0]


def test_config_array_field_mapping(spark, mock_server, tmp_path, monkeypatch):
    """configs/array-field-mapping-example.toml (reference twin): the
    P2/P3/P4 array-path mapping catalog — positive/negative index,
    [*] flat map, nested array-of-array paths — over the reference's
    documented sample response."""
    ctx = _run_config(
        spark, "configs/array-field-mapping-example.toml",
        mock_server, tmp_path, monkeypatch,
    )
    row = ctx.results[0].df.collect()[0]
    assert row.dept_id == "ENG001"
    assert row.dept_name == "Engineering"
    assert row.team_lead_name == "Alice Johnson"
    assert row.team_lead_email == "alice@company.com"
    assert list(row.all_employee_names) == [
        "Alice Johnson", "Bob Smith", "Charlie Brown",
    ]
    assert list(row.all_employee_emails) == [
        "alice@company.com", "bob@company.com", "charlie@company.com",
    ]
    assert list(row.office_cities) == ["San Francisco", "Austin"]
    assert row.latest_budget == 1000000


def test_versioned_sink_in_sequence(spark, tmp_path):
    """output.formats = ["versioned"]: each sequence run APPENDS an
    atomic snapshot; re-running the same pipeline accumulates history
    instead of clobbering the previous output (the lakehouse form of
    a recurring stage sink)."""
    from small_etl_spark.sinks import versioned as V

    seq = sequence_from_dict(
        {
            "pipelines": [
                {
                    "name": "snap",
                    "source": {"type": "sample", "sample_data": SAMPLE},
                    "load": {"formats": ["versioned"]},
                }
            ]
        }
    )
    run_sequence(spark, seq, output_root=str(tmp_path))
    table = str(tmp_path / "snap" / "versioned")
    assert V.latest_version(table) == 0
    assert V.read_snapshot(spark, table).count() == 3
    # re-run: appends snapshot 1, snapshot 0 still readable
    run_sequence(spark, seq, output_root=str(tmp_path))
    assert V.latest_version(table) == 1
    assert V.read_snapshot(spark, table).count() == 6
    assert V.read_snapshot(spark, table, version=0).count() == 3


def test_versioned_sink_partitioned_in_sequence(spark, tmp_path):
    """load.partition_by flows through the versioned sink: the stage
    output lands as a hive-partitioned snapshot table with the
    manifest contract, so downstream reads prune on the partition."""
    from small_etl_spark.sinks import versioned as V

    seq = sequence_from_dict(
        {
            "pipelines": [
                {
                    "name": "psnap",
                    "source": {"type": "sample", "sample_data": SAMPLE},
                    "load": {
                        "formats": ["versioned"],
                        "partition_by": ["value"],
                    },
                }
            ]
        }
    )
    run_sequence(spark, seq, output_root=str(tmp_path))
    table = str(tmp_path / "psnap" / "versioned")
    m = V.read_manifest(table, 0)
    assert m["partition_by"] == ["value"]
    kept, total = V.plan_files(table, where=[("value", "=", 25)])
    assert 0 < len(kept) < total
    got = V.read_snapshot(spark, table, where=[("value", "=", 25)])
    assert [r.id for r in got.collect()] == [2]


def test_versioned_format_validates(spark):
    with pytest.raises(SpecError, match="invalid output format"):
        sequence_from_dict(
            {
                "pipelines": [
                    {
                        "name": "bad",
                        "source": {"type": "sample", "sample_data": SAMPLE},
                        "load": {"formats": ["xlsx"]},
                    }
                ]
            }
        )


def test_config_two_stage_param_chain(spark, mock_server, tmp_path, monkeypatch):
    """configs/two-stage-param-chain.toml (reference sam.toml twin):
    stage 1 scans and renames to the chain's parameter names, stage 2
    issues one /users/{ma_id} call per stage-1 record with
    use_previous_output — plus required-field validation and an
    explicitly disabled compression block."""
    ctx = _run_config(
        spark, "configs/two-stage-param-chain.toml",
        mock_server, tmp_path, monkeypatch,
    )
    by = {r.pipeline_name: r for r in ctx.results}
    assert by["get-ma"].record_count == 3
    assert "ma_ref" in by["get-ma"].df.columns
    assert by["get-calc"].record_count == 3
    got = sorted(r.full_name for r in by["get-calc"].df.collect())
    assert got == ["user1", "user2", "user3"]
    # compression disabled -> no zip artifact
    assert not list((tmp_path / "get-ma").glob("*.zip"))


def test_versioned_sink_wap_branch_in_sequence(spark, tmp_path):
    """load.branch turns the versioned sink write-audit-publish: each
    run stages on an ephemeral branch and atomically fast-forwards
    main, so every main commit is a 'publish' (whole stage outputs
    only — never a torn table), and the staging branches are abandoned
    after publishing."""
    from small_etl_spark.sinks import versioned as V

    seq = sequence_from_dict(
        {
            "pipelines": [
                {
                    "name": "wsnap",
                    "source": {"type": "sample", "sample_data": SAMPLE},
                    "load": {"formats": ["versioned"], "branch": "stage"},
                }
            ]
        }
    )
    run_sequence(spark, seq, output_root=str(tmp_path))
    table = str(tmp_path / "wsnap" / "versioned")
    assert V.latest_version(table) == 0  # bootstrap commit
    assert V.read_snapshot(spark, table).count() == 3
    run_sequence(spark, seq, output_root=str(tmp_path))
    assert V.latest_version(table) == 1
    assert V.read_snapshot(spark, table).count() == 6
    rec = V._read_record(table, 1)
    assert rec["mode"] == "publish"
    assert rec["branch"].startswith("stage-")
    assert V.list_branches(table) == {}  # ephemeral branches cleaned up


def test_versioned_sink_wap_retries_lost_publish_race(
    spark, tmp_path, monkeypatch
):
    """A concurrent writer advancing main between branch cut and
    publish costs one re-stage, not a failure — and the torn state is
    never visible on main."""
    from pyspark.sql import functions as F

    from small_etl_spark.sinks import versioned as V
    from small_etl_spark.sinks.files import _wap_append

    table = str(tmp_path / "tbl")
    base = spark.range(0, 5).select(F.col("id").alias("k"))
    _wap_append(base, table, "stage")  # bootstrap
    real_create = V.branch_create
    raced = {"done": False}

    def racing_create(tbl, name, version=None):
        root = real_create(tbl, name, version)
        if not raced["done"]:
            raced["done"] = True
            # concurrent writer lands on main AFTER the branch is cut
            V.commit_snapshot(
                spark.range(100, 103).select(F.col("id").alias("k")),
                tbl, mode="append",
            )
        return root

    monkeypatch.setattr(V, "branch_create", racing_create)
    _wap_append(
        spark.range(5, 8).select(F.col("id").alias("k")), table, "stage"
    )
    got = V.read_snapshot(spark, table)
    assert got.count() == 11  # 5 base + 3 racer + 3 staged
    assert V.list_branches(table) == {}  # both branches abandoned


def test_versioned_sink_constraints_in_sequence(spark, tmp_path):
    """load.constraints on the versioned sink: declared once in the
    config, added to the TABLE on first run (validating existing
    data), enforced on every later batch — including writers that
    bypass the pipeline entirely."""
    import pytest as _pytest

    from small_etl_spark.sinks import versioned as V

    seq = sequence_from_dict(
        {
            "pipelines": [
                {
                    "name": "snap",
                    "source": {"type": "sample", "sample_data": SAMPLE},
                    "load": {
                        "formats": ["versioned"],
                        "constraints": {"value_pos": "value > 0"},
                    },
                }
            ]
        }
    )
    run_sequence(spark, seq, output_root=str(tmp_path))
    table = str(tmp_path / "snap" / "versioned")
    assert V.list_constraints(table) == {"value_pos": "value > 0"}
    # a second run re-declares idempotently and appends
    run_sequence(spark, seq, output_root=str(tmp_path))
    assert V.latest_version(table) == 2  # commit, add_constraint, commit
    # the table now protects itself from ANY writer
    bad = spark.createDataFrame(
        [(9, "x", -1)], "id bigint, name string, value bigint"
    )
    with _pytest.raises(V.ConstraintViolation):
        V.commit_snapshot(bad, table, mode="append")


def test_versioned_sink_constraints_gate_the_first_batch(
    spark, tmp_path
):
    """ADVICE r9 (low): the FIRST run's own batch must pass the
    declared CHECK too. Previously the first batch committed before
    add_constraint ran — a violating first batch landed durably and
    the add_constraint validation then failed every later run."""
    import pytest as _pytest

    from small_etl_spark.sinks import versioned as V

    bad_sample = [
        {"id": 1, "name": "ok", "value": 10},
        {"id": 2, "name": "bad", "value": -5},
    ]
    seq = sequence_from_dict(
        {
            "pipelines": [
                {
                    "name": "snap",
                    "source": {"type": "sample",
                               "sample_data": bad_sample},
                    "load": {
                        "formats": ["versioned"],
                        "constraints": {"value_pos": "value > 0"},
                    },
                }
            ]
        }
    )
    from small_etl_spark.plans.sequencer import PipelineExecutionError

    with _pytest.raises(PipelineExecutionError) as ei:
        run_sequence(spark, seq, output_root=str(tmp_path))
    assert isinstance(ei.value.cause, V.ConstraintViolation)
    # nothing landed: no table version exists
    table = str(tmp_path / "snap" / "versioned")
    assert V.latest_version(table) is None


def test_atomic_sequence_lands_all_versioned_sinks_together(
    spark, tmp_path
):
    """[sequence] atomic = true: every versioned sink stages on one
    multi-table transaction and the run's outputs become visible
    through <output_root>/_catalog together."""
    from small_etl_spark.sinks import versioned as V

    seq = sequence_from_dict(
        {
            "sequence": {"atomic": True},
            "pipelines": [
                {
                    "name": "a",
                    "source": {"type": "sample", "sample_data": SAMPLE},
                    "load": {"formats": ["versioned"]},
                },
                {
                    "name": "b",
                    "source": {"type": "sample", "sample_data": SAMPLE},
                    "load": {"formats": ["versioned"]},
                },
            ],
        }
    )
    ctx = run_sequence(spark, seq, output_root=str(tmp_path))
    cat = str(tmp_path / "_catalog")
    assert ctx.shared_data["atomic_catalog_version"] == 0
    for name in ("a", "b"):
        got = V.read_catalog(spark, cat, name)
        assert got.count() == len(SAMPLE)
    # second run: catalog advances, both tables gain one publish
    run_sequence(spark, seq, output_root=str(tmp_path))
    assert V.latest_version(cat) == 1
    for name in ("a", "b"):
        assert V.read_catalog(spark, cat, name).count() == 2 * len(
            SAMPLE
        )


def test_atomic_sequence_failure_aborts_everything(spark, tmp_path):
    """A failing stage under the stop policy aborts the transaction:
    nothing the run staged becomes visible through the catalog, even
    though an earlier pipeline had already written."""
    import pytest as _pytest

    from small_etl_spark.plans.sequencer import PipelineExecutionError
    from small_etl_spark.sinks import versioned as V

    good = {
        "name": "a",
        "source": {"type": "sample", "sample_data": SAMPLE},
        "load": {"formats": ["versioned"]},
    }
    ok_seq = sequence_from_dict(
        {"sequence": {"atomic": True}, "pipelines": [dict(good)]}
    )
    run_sequence(spark, ok_seq, output_root=str(tmp_path))
    cat = str(tmp_path / "_catalog")
    assert V.read_catalog(spark, cat, "a").count() == len(SAMPLE)

    bad_seq = sequence_from_dict(
        {
            "sequence": {"atomic": True},
            "pipelines": [
                dict(good),
                {
                    "name": "boom",
                    "source": {
                        "type": "file",
                        "format": "parquet",
                        "path": str(tmp_path / "no_such_dir"),
                    },
                    "load": {"formats": ["versioned"]},
                },
            ],
        }
    )
    with _pytest.raises(PipelineExecutionError):
        run_sequence(spark, bad_seq, output_root=str(tmp_path))
    # catalog unchanged; a's staged second batch invisible
    assert V.latest_version(cat) == 0
    assert V.read_catalog(spark, cat, "a").count() == len(SAMPLE)
    # and no leftover txn branches
    assert V.list_branches(str(tmp_path / "a" / "versioned")) == {}


def test_atomic_sequence_abort_drops_bootstrapped_new_tables(
    spark, tmp_path
):
    """An aborted atomic FIRST run must leave no half-created table:
    the empty schema-carrying v0 bootstrap is tracked on the txn and
    dropped on abort (ADVICE r10 low). Pre-existing tables are left
    exactly as they were."""
    import pytest as _pytest

    from small_etl_spark.plans.sequencer import PipelineExecutionError
    from small_etl_spark.sinks import versioned as V

    good = {
        "name": "a",
        "source": {"type": "sample", "sample_data": SAMPLE},
        "load": {"formats": ["versioned"]},
    }
    # a exists from a prior (non-atomic-failure) run
    run_sequence(
        spark,
        sequence_from_dict(
            {"sequence": {"atomic": True}, "pipelines": [dict(good)]}
        ),
        output_root=str(tmp_path),
    )
    bad_seq = sequence_from_dict(
        {
            "sequence": {"atomic": True},
            "pipelines": [
                dict(good),
                {
                    "name": "brand_new",
                    "source": {"type": "sample", "sample_data": SAMPLE},
                    "load": {"formats": ["versioned"]},
                },
                {
                    "name": "boom",
                    "source": {
                        "type": "file",
                        "format": "parquet",
                        "path": str(tmp_path / "no_such_dir"),
                    },
                    "load": {"formats": ["versioned"]},
                },
            ],
        }
    )
    with _pytest.raises(PipelineExecutionError):
        run_sequence(spark, bad_seq, output_root=str(tmp_path))
    # the brand-new table's bootstrap v0 is gone, not a durable stub
    assert V.latest_version(str(tmp_path / "brand_new" / "versioned")) is None
    # the pre-existing table is untouched (v0 bootstrap + published
    # first batch = v1 from the successful run)
    assert V.latest_version(str(tmp_path / "a" / "versioned")) == 1


def test_atomic_sequence_with_constraints_and_branch_refusal(
    spark, tmp_path
):
    from small_etl_spark.sinks import versioned as V

    seq = sequence_from_dict(
        {
            "sequence": {"atomic": True},
            "pipelines": [
                {
                    "name": "snap",
                    "source": {"type": "sample", "sample_data": SAMPLE},
                    "load": {
                        "formats": ["versioned"],
                        "constraints": {"value_pos": "value > 0"},
                    },
                }
            ],
        }
    )
    run_sequence(spark, seq, output_root=str(tmp_path))
    tbl = str(tmp_path / "snap" / "versioned")
    # the constraint landed WITH the publish (branch properties win)
    assert V.list_constraints(tbl) == {"value_pos": "value > 0"}
    # atomic + load.branch is refused loudly
    import pytest as _pytest

    bad = sequence_from_dict(
        {
            "sequence": {"atomic": True},
            "pipelines": [
                {
                    "name": "w",
                    "source": {"type": "sample", "sample_data": SAMPLE},
                    "load": {"formats": ["versioned"], "branch": "x"},
                }
            ],
        }
    )
    from small_etl_spark.plans.sequencer import PipelineExecutionError

    with _pytest.raises(PipelineExecutionError):
        run_sequence(spark, bad, output_root=str(tmp_path / "w2"))
