"""Cross-stage execution state (SURVEY §1.1 PipelineContext).

The reference keeps ``Vec<PipelineResult>`` + ``shared_data`` +
``pipeline_data`` maps in one process
(/root/reference/src/app/pipelines/sequence_pipeline.rs:17-116); here
the exchange format is a *named, persisted DataFrame* — the lazy plan
(or its cached materialization) replaces the in-memory record clone at
:111-115, and a driver-side dict of scalars carries tokens between
stages.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field
from functools import reduce
from typing import Any

from pyspark.sql import DataFrame


@dataclass
class PipelineResult:
    """Per-stage result (sequence_pipeline.rs:8-15)."""

    pipeline_name: str
    df: DataFrame
    record_count: int
    duration_s: float
    output_path: str | None = None
    success: bool = True
    intermediate: DataFrame | None = None
    metadata: dict[str, Any] = field(default_factory=dict)


@dataclass
class PipelineContext:
    """Catalog + runtime state threaded through the sequence."""

    execution_id: str = field(default_factory=lambda: uuid.uuid4().hex[:12])
    started_at: float = field(default_factory=time.time)
    results: list[PipelineResult] = field(default_factory=list)
    shared_data: dict[str, Any] = field(default_factory=dict)

    def add_result(self, result: PipelineResult) -> None:
        import re

        view = "stage_" + re.sub(r"\W", "_", result.pipeline_name)
        result.df.createOrReplaceTempView(view)
        self.results.append(result)

    def get(self, name: str | None = None) -> PipelineResult | None:
        """Named lookup, or the latest result (S5 semantics —
        contextual_pipeline.rs:40-66)."""
        if name is None:
            return self.results[-1] if self.results else None
        for r in reversed(self.results):
            if r.pipeline_name == name:
                return r
        return None

    def all_previous(self) -> list[DataFrame]:
        """S6 combined source (sequence_pipeline.rs:49-54)."""
        return [r.df for r in self.results]

    def export_shared(self, key: str, row: dict[str, Any]) -> None:
        """J4 shared-scalar export (contextual_pipeline.rs:1086-1116):
        ``token``/``access_token`` fields map to the ``token`` key;
        other fields are prefixed ``{key}_{field}``."""
        for f_name, value in row.items():
            if f_name in ("token", "access_token"):
                self.shared_data["token"] = value
            else:
                self.shared_data[f"{key}_{f_name}"] = value

    def summary(self) -> dict[str, Any]:
        """A1 execution summary (sequence_pipeline.rs:276-306)."""
        return {
            "execution_id": self.execution_id,
            "total_pipelines": len(self.results),
            "successful_pipelines": sum(1 for r in self.results if r.success),
            "total_records": sum(r.record_count for r in self.results),
            "total_duration_s": round(
                reduce(lambda a, r: a + r.duration_s, self.results, 0.0), 6
            ),
            "pipeline_names": [r.pipeline_name for r in self.results],
        }

    def unpersist_all(self) -> None:
        """Release every stage's cached DataFrame (call when the
        sequence's outputs are fully consumed — long-lived sessions
        otherwise hold all stage caches until LRU eviction)."""
        for r in self.results:
            try:
                r.df.unpersist()
            except Exception:  # noqa: BLE001 - already released / empty frame
                pass
