"""Text functions + control-plane templating (X1–X7 semantics,
pinned to /root/reference/src/core/contextual_pipeline.rs templating tests)."""

from __future__ import annotations

import pytest

from small_etl_spark.functions.templating import (
    UnresolvedParamError,
    substitute_endpoint_params,
    substitute_env_vars,
    substitute_template,
)
from small_etl_spark.functions.text import (
    clean_text,
    normalize_fields,
    remove_html_tags,
    trim_whitespace,
)


def test_clean_text_trim_and_newlines(spark):
    df = spark.createDataFrame([("  a\nb  ", 1)], "t string, id long")
    assert clean_text(df).first().t == "a b"


def test_normalize_fields_only_listed(spark):
    df = spark.createDataFrame([("AbC", "DeF")], "a string, b string")
    row = normalize_fields(df, ["a", "ghost"]).first()
    assert row.a == "abc" and row.b == "DeF"


def test_remove_html_and_trim(spark):
    df = spark.createDataFrame([("  <b>hi</b> there <br/> ",)], "t string")
    assert remove_html_tags(df).first().t == "  hi there  "
    assert trim_whitespace(remove_html_tags(df)).first().t == "hi there"


# --- templating (driver-side) ---


def test_template_shared_over_record_priority():
    # contextual_pipeline.rs:1992-2015: shared_data beats record fields
    out = substitute_template(
        "Bearer {{token}} for {{user}}",
        shared_data={"token": "S"},
        record={"token": "R", "user": "u1"},
    )
    assert out == "Bearer S for u1"


def test_template_unresolved_left_verbatim():
    assert substitute_template("x {{missing}} y", {}, {}) == "x {{missing}} y"


def test_template_stringification():
    out = substitute_template(
        "{{n}}|{{b}}|{{nul}}|{{obj}}",
        shared_data={"n": 5, "b": True, "nul": None, "obj": {"a": 1}},
    )
    assert out == '5|true||{"a":1}'


def test_endpoint_params_single_and_double():
    assert (
        substitute_endpoint_params("/users/{user_id}/x/{{site}}", {"user_id": 7, "site": "s"})
        == "/users/7/x/s"
    )


def test_endpoint_unresolved_errors():
    with pytest.raises(UnresolvedParamError):
        substitute_endpoint_params("/users/{nope}", {"user_id": 7})


def test_endpoint_brace_valued_field_is_not_unresolved():
    """A record value containing braces (nested field stringified to
    compact JSON) must not trip the unresolved-placeholder check —
    detection happens during substitution, not by re-scanning output."""
    out = substitute_endpoint_params(
        "/search?q={payload}", {"payload": {"a": 1, "b": [2, 3]}}
    )
    assert out == '/search?q={"a":1,"b":[2,3]}'


def test_env_var_substitution(monkeypatch):
    monkeypatch.setenv("SES_TEST_VAR", "live")
    assert substitute_env_vars("${SES_TEST_VAR}") == "live"
    assert substitute_env_vars("${SES_SHARED}", {"SES_SHARED": "sh"}) == "sh"
    assert substitute_env_vars("${SES_UNKNOWN}") == "${SES_UNKNOWN}"
