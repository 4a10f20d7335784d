"""Typed error taxonomy (SURVEY §2.10).

Ports /root/reference/src/utils/error.rs:3-225: every engine error
carries a severity (exit-code class), a category, retryability, and a
recovery suggestion. The reference *declares* retry behavior but its
retry branch is a no-op (sequence_etl.rs:139-162); here
``is_retryable`` actually drives the sequencer's retry policy and the
HTTP fetcher's backoff.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum


class Severity(Enum):
    WARNING = 0  # recoverable, execution continues
    ERROR = 1  # stage fails, policy decides
    CRITICAL = 2  # config/spec problems, abort before execution


class Category(Enum):
    CONFIG = "config"
    VALIDATION = "validation"
    EXTRACT = "extract"
    TRANSFORM = "transform"
    LOAD = "load"
    NETWORK = "network"


@dataclass
class ErrorInfo:
    severity: Severity
    category: Category
    retryable: bool
    suggestion: str


def classify(exc: Exception) -> ErrorInfo:
    """Map an exception to the reference's severity/category/retryable
    taxonomy (error.rs:112-141 severity map, :176-185 is_retryable)."""
    from small_etl_spark.operators.validation import ValidationError
    from small_etl_spark.plans.spec import SpecError
    from small_etl_spark.sources.http import HttpFetchError

    if isinstance(exc, SpecError):
        return ErrorInfo(
            Severity.CRITICAL, Category.CONFIG, False,
            "fix the pipeline spec (names, URLs, formats, dependencies)",
        )
    if isinstance(exc, ValidationError):
        return ErrorInfo(
            Severity.ERROR, Category.VALIDATION, False,
            "check required_fields/field_types/min_records against the data",
        )
    if isinstance(exc, HttpFetchError):
        return ErrorInfo(
            Severity.ERROR, Category.NETWORK, True,
            "transient network failure — retry with backoff or use sample fallback",
        )
    if isinstance(exc, (TimeoutError, ConnectionError, OSError)):
        return ErrorInfo(
            Severity.ERROR, Category.NETWORK, True,
            "transient I/O failure — retry",
        )
    return ErrorInfo(
        Severity.ERROR, Category.TRANSFORM, False,
        "inspect the stage's plan and input schema",
    )


def is_retryable(exc: Exception) -> bool:
    return classify(exc).retryable


def exit_code(exc: Exception) -> int:
    """Severity → process exit code (main.rs:59-68)."""
    return {Severity.WARNING: 0, Severity.ERROR: 2, Severity.CRITICAL: 1}[
        classify(exc).severity
    ]
