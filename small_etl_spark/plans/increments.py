"""Incremental sequence runs: skip stages whose inputs didn't change.

The reference recomputes every pipeline end-to-end on every invocation
(src/app/pipelines/sequence_pipeline.rs:175-273 has no memo of past
runs). At 100 TB that is the difference between a 10-minute and a
10-hour nightly: most stages' specs AND inputs are unchanged day to
day, so their outputs are too. This module gives ``run_sequence`` the
standard incremental-build contract (the dbt/Bazel model, applied to
DataFrame stages):

- Every stage gets a FINGERPRINT: sha256 over its canonical spec dict
  chained with the fingerprints of all stages before it in execution
  order. Chaining the whole prefix is deliberately conservative —
  any upstream edit invalidates everything downstream, so a cache hit
  can never serve a stale result through an un-declared dependency
  (shared-scalar exports, ``previous``/``combined`` sources, and
  gating all flow strictly forward).
- After a stage executes, its result lands as a snapshot in a
  versioned table under ``{incremental_root}/{stage}`` with the
  fingerprint and the stage's NEW shared-scalar exports in the
  manifest's ``extra`` — the cache entry commits atomically with the
  data it describes.
- On the next run, a stage whose fingerprint matches the cached one is
  NOT executed: its DataFrame is the snapshot read (manifest-planned,
  no recompute, no directory LIST), its record count comes from
  manifest row counts (no count scan), and its shared exports are
  replayed into the context so downstream gating and templating see
  exactly what a fresh run would.

Caveats by design: a cache hit skips the stage's file sinks too (the
outputs already exist from the producing run), and HTTP-sourced stages
are cached like any other — opting into ``incremental_root`` declares
"yesterday's fetch is valid until something upstream changes".
Shared-scalar values round-trip through JSON (non-JSON scalars are
stringified)."""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

CACHE_VERSION = 1  # bump to invalidate every cache after semantic changes


def stage_fingerprint(spec: Any, upstream: list[str]) -> str:
    payload = json.dumps(
        {
            "v": CACHE_VERSION,
            "spec": dataclasses.asdict(spec),
            "upstream": upstream,
        },
        sort_keys=True,
        default=str,
    )
    return hashlib.sha256(payload.encode()).hexdigest()


def stage_cache_path(incremental_root: str, stage: str) -> str:
    return os.path.join(incremental_root, stage)


def cache_lookup(
    spark: SparkSession, incremental_root: str, stage: str, fp: str
) -> tuple[DataFrame, int, dict[str, Any]] | None:
    """(df, record_count, shared_exports) on a fingerprint hit, else
    None. Reads one manifest; the data itself stays lazy."""
    from small_etl_spark.sinks import versioned as V

    path = stage_cache_path(incremental_root, stage)
    v = V.latest_version(path)
    if v is None:
        return None
    manifest = V.read_manifest(path, v)
    extra = manifest.get("extra") or {}
    if extra.get("fingerprint") != fp:
        return None
    n = sum(e["rows"] for e in manifest["files"])
    return (
        V.read_snapshot(spark, path, version=v),
        n,
        extra.get("shared", {}),
    )


def cache_store(
    df: DataFrame,
    incremental_root: str,
    stage: str,
    fp: str,
    shared_exports: dict[str, Any],
) -> None:
    """Commit the stage result + cache metadata atomically."""
    from small_etl_spark.sinks import versioned as V

    shared_json = json.loads(json.dumps(shared_exports, default=str))
    V.commit_snapshot(
        df,
        stage_cache_path(incremental_root, stage),
        mode="overwrite",
        extra={"fingerprint": fp, "shared": shared_json},
    )
