"""Control-plane templating (SURVEY §2.9, X4–X7).

Templating configures *requests and configs*, not data rows, so it
runs driver-side in plain Python (the reference does the same in Rust):

- X4 ``{{key}}`` substitution — /root/reference/src/core/contextual_pipeline.rs:156-216
  (headers) and :219-339 (payloads). Priority: shared_data FIRST,
  then record fields (test :1992-2015); unresolved left as-is.
- X5 endpoint ``{param}``/``{{param}}`` — :342-431; unresolved ⇒ error.
- X6 ``${VAR}`` env/shared-variable config substitution —
  /root/reference/src/config/toml_config.rs:138-149 and
  sequence_config.rs:196-276; unknown left as ``${VAR}``.
"""

from __future__ import annotations

import json
import os
import re

_DOUBLE = re.compile(r"\{\{([^}]+)\}\}")
_SINGLE_OR_DOUBLE = re.compile(r"\{\{([^{}]+)\}\}|\{([^{}]+)\}")
_ENV = re.compile(r"\$\{([^}]+)\}")


def _stringify(value: object) -> str:
    """JSON values → template text: strings unquoted, scalars via
    ``to_string``, nested values compact JSON (contextual_pipeline.rs:171-180)."""
    if isinstance(value, str):
        return value
    if isinstance(value, bool):
        return "true" if value else "false"
    if value is None:
        return ""
    if isinstance(value, (int, float)):
        return json.dumps(value)
    return json.dumps(value, separators=(",", ":"))


def substitute_template(
    text: str,
    shared_data: dict[str, object] | None = None,
    record: dict[str, object] | None = None,
) -> str:
    """X4: replace ``{{key}}`` — shared_data first, then record fields;
    unresolved placeholders are left verbatim."""
    shared = shared_data or {}
    rec = record or {}

    def repl(m: re.Match[str]) -> str:
        key = m.group(1).strip()
        if key in shared:
            return _stringify(shared[key])
        if key in rec:
            return _stringify(rec[key])
        return m.group(0)

    return _DOUBLE.sub(repl, text)


class UnresolvedParamError(ValueError):
    """X5: an endpoint placeholder had no value (reference errors here)."""


def substitute_endpoint_params(endpoint: str, record: dict[str, object]) -> str:
    """X5: replace ``{field}`` / ``{{field}}`` from a record's fields;
    any placeholder left unresolved is an error
    (contextual_pipeline.rs:342-431).

    Unresolved placeholders are detected *during* substitution (keys
    missing from the record), never by re-scanning the substituted
    output — a record value that itself contains braces (e.g. a nested
    field stringified to compact JSON) must not trip the check."""
    unresolved: list[str] = []

    def repl(m: re.Match[str]) -> str:
        key = (m.group(1) or m.group(2)).strip()
        if key in record:
            return _stringify(record[key])
        unresolved.append(m.group(0))
        return m.group(0)

    out = _SINGLE_OR_DOUBLE.sub(repl, endpoint)
    if unresolved:
        raise UnresolvedParamError(
            f"unresolved endpoint parameter {unresolved[0]!r} in {out!r} "
            f"(available fields: {sorted(map(str, record))})"
        )
    return out


def substitute_env_vars(
    text: str, shared_variables: dict[str, str] | None = None
) -> str:
    """X6: ``${VAR}`` from the environment, then shared_variables;
    unknown names stay as ``${VAR}``."""
    shared = shared_variables or {}

    def repl(m: re.Match[str]) -> str:
        name = m.group(1)
        if name in os.environ:
            return os.environ[name]
        if name in shared:
            return str(shared[name])
        return m.group(0)

    return _ENV.sub(repl, text)
