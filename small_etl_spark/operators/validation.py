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
    # per-column character-length caps (reference max_title_length /
    # max_content_length — declared-only there, enforced here);
    # columns absent from the frame are skipped (the reference only
    # declares the caps for frames that carry those fields)
    max_field_lengths: dict[str, int] = field(default_factory=dict)


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
    caps = {c: m for c, m in spec.max_field_lengths.items() if c in cols}
    if caps:
        from pyspark.sql import functions as F

        row = df.agg(
            *[F.max(F.length(F.col(c).cast("string"))).alias(c) for c in caps]
        ).first()
        for c, m in caps.items():
            got = row[c]
            if got is not None and got > m:
                raise ValidationError(
                    f"field {c!r} length {got} exceeds max {m}"
                )
    return df


def schema_compat_report(
    old: "StructType", new: "StructType"
) -> list[dict[str, str]]:
    """Backward-compatibility check between two schema versions — the
    gate an append-only 100 TB dataset runs before accepting a new
    writer. Returns a list of findings, each
    ``{"field", "change", "severity"}``; an empty list means fully
    backward-compatible.

    Rules (parquet/Avro-style resolution):
    - added nullable field       → ok (readers see nulls on old data)
    - added NON-nullable field   → break (old files can't supply it)
    - removed field              → break (readers referencing it fail)
    - type widened (int→long, float→double, int→double) → warn
      (safe for readers that re-cast, but splits file schemas)
    - any other type change      → break
    - nullable → required        → break (old nulls violate it)
    - required → nullable        → ok
    """
    widenings = {
        ("integer", "long"),
        ("integer", "double"),
        ("long", "double"),
        ("float", "double"),
    }
    findings: list[dict[str, str]] = []
    old_fields = {f.name: f for f in old.fields}
    new_fields = {f.name: f for f in new.fields}
    for name, f in new_fields.items():
        if name not in old_fields:
            findings.append(
                {
                    "field": name,
                    "change": "added",
                    "severity": "ok" if f.nullable else "break",
                }
            )
    for name, f in old_fields.items():
        if name not in new_fields:
            findings.append(
                {"field": name, "change": "removed", "severity": "break"}
            )
            continue
        g = new_fields[name]
        canon = {"int": "integer", "bigint": "long"}
        ot = canon.get(f.dataType.simpleString(), f.dataType.simpleString())
        nt = canon.get(g.dataType.simpleString(), g.dataType.simpleString())
        if ot != nt:
            sev = "warn" if (ot, nt) in widenings else "break"
            findings.append(
                {
                    "field": name,
                    "change": f"type:{ot}->{nt}",
                    "severity": sev,
                }
            )
        if f.nullable and not g.nullable:
            findings.append(
                {
                    "field": name,
                    "change": "nullable->required",
                    "severity": "break",
                }
            )
    return findings
