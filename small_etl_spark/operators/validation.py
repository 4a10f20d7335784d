"""Schema/record validation (SURVEY §1.3) — declared-only in the reference.

The reference's config carries ``required_fields``, ``field_types``,
``min_records``, ``max_records``
(/root/reference/src/config/sequence_config.rs:102-108) but no runtime
reads them. We enforce them for real (SURVEY §7.2 P4):

- required_fields — every listed column exists in the schema;
- field_types     — listed columns have the given Spark SQL type;
- min/max_records — row-count bounds (one ``count()`` action).

Schema checks are metadata-only (free). The count is the only action —
at 100 TB it's a parquet-footer rollup when no filter precedes it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


class ValidationError(ValueError):
    """A validation rule failed."""


@dataclass
class ValidationSpec:
    required_fields: list[str] = field(default_factory=list)
    field_types: dict[str, str] = field(default_factory=dict)
    min_records: int | None = None
    max_records: int | None = None


def validate_frame(df: DataFrame, spec: ValidationSpec) -> DataFrame:
    """Validate ``df`` against ``spec``; returns ``df`` unchanged on success."""
    cols = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    missing = [c for c in spec.required_fields if c not in cols]
    if missing:
        raise ValidationError(f"missing required fields: {missing}")
    for name, expected in spec.field_types.items():
        actual = cols.get(name)
        if actual is None:
            raise ValidationError(f"typed field absent: {name}")
        if actual != expected.lower():
            raise ValidationError(
                f"field {name!r} has type {actual}, expected {expected}"
            )
    if spec.min_records is not None or spec.max_records is not None:
        n = df.count()
        if spec.min_records is not None and n < spec.min_records:
            raise ValidationError(f"{n} records < min_records={spec.min_records}")
        if spec.max_records is not None and n > spec.max_records:
            raise ValidationError(f"{n} records > max_records={spec.max_records}")
    return df
