"""Declarative pipeline specs + the multi-stage sequencer.

The reference's flagship capability (SURVEY §3.3): an ordered DAG of
pipelines where later stages consume earlier stages' DataFrames, merge
them with new source data by key, and pass scalar state (tokens)
through a shared-data context into request templates.

- ``spec``      — TOML/dict → validated stage specs (the logical plan)
- ``context``   — cross-stage state: ``{name: DataFrame}`` + shared scalars
- ``sequencer`` — ordered execution with gating, transforms, sinks, metrics
"""

from small_etl_spark.plans.spec import (  # noqa: F401
    LoadSpec,
    PipelineSpec,
    SequenceSpec,
    SourceSpec,
    SpecError,
    TransformSpec,
)
from small_etl_spark.plans.context import PipelineContext, PipelineResult  # noqa: F401
from small_etl_spark.plans.sequencer import run_sequence  # noqa: F401
