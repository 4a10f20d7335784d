"""Property-based tests (hypothesis) for the driver-side control plane.

The reference has zero property/randomized testing (SURVEY §5); these
pin the templating/spec/filename invariants under generated inputs.
Spark-side operators are covered example-based elsewhere (per-example
Spark jobs make hypothesis impractical there).
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from small_etl_spark.functions.templating import (
    UnresolvedParamError,
    substitute_endpoint_params,
    substitute_env_vars,
    substitute_template,
)
from small_etl_spark.plans.spec import SpecError, sequence_from_dict
from small_etl_spark.sinks.files import render_filename

import pytest

keys = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")), min_size=1,
    max_size=12,
)
scalars = st.one_of(
    st.integers(-1_000_000, 1_000_000),
    st.booleans(),
    st.text(max_size=20).filter(lambda s: "{" not in s and "}" not in s),
)


@given(shared=st.dictionaries(keys, scalars, max_size=5), key=keys)
@settings(max_examples=50, deadline=None)
def test_template_shared_priority(shared, key):
    """X4: {{key}} resolves from shared_data first, record second;
    unresolved placeholders survive verbatim."""
    record = {key: "FROM_RECORD"}
    out = substitute_template(f"x {{{{{key}}}}} y", shared, record)
    if key in shared:
        assert "FROM_RECORD" not in out
    else:
        assert "FROM_RECORD" in out
    untouched = substitute_template("a {{definitely_missing_key}} b", shared, record)
    assert "{{definitely_missing_key}}" in untouched


@given(record=st.dictionaries(keys, scalars, min_size=1, max_size=5))
@settings(max_examples=50, deadline=None)
def test_endpoint_substitution_total(record):
    """X5: every placeholder resolved from the record; any leftover
    placeholder raises."""
    key = sorted(record)[0]
    out = substitute_endpoint_params(f"https://api/x/{{{key}}}", record)
    assert "{" not in out
    with pytest.raises(UnresolvedParamError):
        substitute_endpoint_params("https://api/{not_in_record_xyz}", record)


@given(
    name=keys,
    val=st.text(max_size=15).filter(
        lambda s: "$" not in s and "{" not in s and "}" not in s
    ),
)
@settings(max_examples=50, deadline=None)
def test_env_var_substitution(name, val):
    """X6: ${VAR} from shared_variables; unknown stays as-is."""
    var = f"zz_test_{name}"  # prefix avoids real environment collisions
    out = substitute_env_vars(f"pre ${{{var}}} post", {var: val})
    assert out == f"pre {val} post"
    assert (
        substitute_env_vars("keep ${UNKNOWN_VAR_ZZZ} x", {})
        == "keep ${UNKNOWN_VAR_ZZZ} x"
    )


@given(
    pname=st.text(alphabet="abcdefgh-", min_size=1, max_size=10),
    eid=st.text(alphabet="0123456789abcdef", min_size=1, max_size=12),
)
@settings(max_examples=30, deadline=None)
def test_render_filename_total(pname, eid):
    out = render_filename("{pipeline_name}_{execution_id}_{timestamp:%Y}.zip", pname, eid)
    assert out.startswith(f"{pname}_{eid}_")
    assert re.search(r"_\d{4}\.zip$", out)


@given(order=st.permutations(["a", "b", "c"]))
@settings(max_examples=20, deadline=None)
def test_execution_order_preserved(order):
    seq = sequence_from_dict(
        {
            "pipelines": [
                {"name": n, "source": {"type": "sample"}} for n in ("a", "b", "c")
            ],
            "execution_order": list(order),
        }
    )
    assert [p.name for p in seq.enabled_in_order()] == list(order)


@given(deps=st.lists(st.sampled_from([("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]),
                     min_size=1, max_size=4, unique=True))
@settings(max_examples=30, deadline=None)
def test_cycle_detection_never_false_negative(deps):
    """Any dependency set containing a directed cycle must be rejected;
    acyclic sets must be accepted."""
    graph = {"a": [], "b": [], "c": []}
    for child, parent in deps:
        if parent not in graph[child]:
            graph[child].append(parent)

    def has_cycle() -> bool:
        seen, stack = set(), set()

        def dfs(n):
            seen.add(n)
            stack.add(n)
            for d in graph[n]:
                if d in stack or (d not in seen and dfs(d)):
                    return True
            stack.discard(n)
            return False

        return any(dfs(n) for n in graph if n not in seen)

    spec = {
        "pipelines": [
            {"name": n, "depends_on": graph[n], "source": {"type": "sample"}}
            for n in graph
        ]
    }
    if has_cycle():
        with pytest.raises(SpecError):
            sequence_from_dict(spec)
    else:
        sequence_from_dict(spec)
