"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``): HTTP
JSON as a first-class ``spark.read.format("http_json")`` source.

Where ``sources.http.http_scan`` fetches on the driver (right for one
endpoint), this source fetches on EXECUTORS — one input partition per
URL — so a scan over many endpoints/pages parallelizes like any other
table scan and composes with the full reader API:

    spark.dataSource.register(HttpJsonDataSource)
    df = (spark.read.format("http_json")
          .schema("id long, name string, value long")
          .option("urls", "https://api/x?page=1,https://api/x?page=2")
          .option("timeout_seconds", "10")
          .option("retry_attempts", "2")
          .load())

An explicit schema is required (a planning-time network call to infer
one would make plan construction side-effecting); rows are aligned to
it by field name, missing keys → null — the reference's schemaless
record semantics (SURVEY §1.3) under an explicit contract.

This is the scale path the reference's sequential fetch loop
(/root/reference/src/core/contextual_pipeline.rs:126-145) cannot
express: URL partitions fan out across the cluster, each with its own
retry policy.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


class UrlPartition(InputPartition):
    def __init__(self, url: str):
        self.url = url


class HttpJsonDataSource(DataSource):
    """``format("http_json")`` — executor-side HTTP JSON scan."""

    @classmethod
    def name(cls) -> str:
        return "http_json"

    def schema(self) -> str:
        raise NotImplementedError(
            "http_json requires an explicit .schema(...) — planning-time "
            "inference would issue network calls during analysis"
        )

    def reader(self, schema: StructType) -> "HttpJsonReader":
        return HttpJsonReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> "HttpJsonStreamReader":
        return HttpJsonStreamReader(schema, self.options)


class HttpJsonReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_fields = [f.name for f in schema.fields]
        # urls_json (JSON array) is the lossless form — URLs may legally
        # contain commas in query strings (ids=1,2,3), which the
        # comma-separated 'urls' option would split apart.
        if options.get("urls_json"):
            parsed = json.loads(options["urls_json"])
            if not isinstance(parsed, list):
                raise ValueError("http_json option 'urls_json' must be a JSON array")
            self.urls = [str(u).strip() for u in parsed if str(u).strip()]
        else:
            self.urls = [
                u.strip() for u in options.get("urls", "").split(",") if u.strip()
            ]
        if not self.urls:
            raise ValueError(
                "http_json requires option 'urls' (comma-separated) or "
                "'urls_json' (JSON array)"
            )
        self.timeout = float(options.get("timeout_seconds", "30"))
        self.retries = int(options.get("retry_attempts", "0"))
        self.retry_delay = float(options.get("retry_delay_seconds", "0"))
        self.headers = json.loads(options.get("headers_json", "{}"))

    def partitions(self) -> Sequence[UrlPartition]:
        return [UrlPartition(u) for u in self.urls]

    def read(self, partition: UrlPartition) -> Iterator[tuple]:
        # executor-side import: keep the plan picklable and light
        from small_etl_spark.sources.http import fetch_records

        records = fetch_records(
            partition.url,
            headers=self.headers,
            timeout_seconds=self.timeout,
            retry_attempts=self.retries,
            retry_delay_seconds=self.retry_delay,
        )
        for rec in records:
            yield tuple(rec.get(name) for name in self.schema_fields)


class HttpJsonStreamReader(SimpleDataSourceStreamReader):
    """Poll-based micro-batch stream: each batch fetches every URL once
    (offset = poll counter). At-least-once on replay — an HTTP
    endpoint cannot be re-read at a past offset, so
    ``readBetweenOffsets`` re-fetches (document the semantic; for
    exactly-once land the fetches in files and stream those).
    Subclasses the Spark 4 SimpleDataSourceStreamReader so the
    protocol's optional hooks (``commit`` — called on checkpoint
    recovery and cache eviction) inherit their defaults instead of
    failing the query at the first restart.
    """

    def __init__(self, schema: StructType, options: dict):
        self.inner = HttpJsonReader(schema, options)

    def initialOffset(self) -> dict:
        return {"poll": 0}

    def _fetch_all(self) -> Iterator[tuple]:
        for part in self.inner.partitions():
            yield from self.inner.read(part)

    def read(self, start: dict):
        rows = list(self._fetch_all())
        return iter(rows), {"poll": int(start["poll"]) + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return self._fetch_all()
