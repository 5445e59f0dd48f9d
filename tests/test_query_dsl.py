"""Query-DSL validation semantics (reference: queries.py::Query /
QueryValidator / QueryValidationError — SURVEY.md §2A A9/A10)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datapipelines_python_spark.pipeline import (
    Query,
    QueryValidationError,
    validate_query,
)


def test_required_key_present_passes_through():
    v = Query.has("id").as_(int)
    assert v.validate({"id": 3}) == {"id": 3}


def test_required_key_missing_raises():
    v = Query.has("id")
    with pytest.raises(QueryValidationError):
        v.validate({})


def test_coercion_str_to_int():
    v = Query.has("id").as_(int)
    assert v.validate({"id": "42"}) == {"id": 42}


def test_coercion_failure_raises():
    v = Query.has("id").as_(int)
    with pytest.raises(QueryValidationError):
        v.validate({"id": "not-a-number"})


def test_optional_with_default_applied():
    v = Query.can_have("name").as_(str).with_default("AFRICA")
    assert v.validate({}) == {"name": "AFRICA"}


def test_optional_without_default_absent():
    v = Query.can_have("name").as_(str)
    assert v.validate({}) == {}


def test_none_default_preserved_not_stringified():
    # ADVICE r3: .as_(str).with_default(None) must keep None, not 'None'
    v = Query.can_have("name").as_(str).with_default(None)
    assert v.validate({}) == {"name": None}


def test_or_alternative_key_normalized():
    v = Query.can_have("limit").as_(int).or_("max_rows")
    assert v.validate({"max_rows": "7"}) == {"limit": 7}


def test_also_chaining_full_dsl():
    v = (
        Query.has("region_key").as_(int)
        .also.can_have("name").as_(str).with_default("AFRICA")
        .also.can_have("limit").as_(int).or_("max_rows")
    )
    out = v.validate({"region_key": "3", "max_rows": 5})
    assert out == {"region_key": 3, "name": "AFRICA", "limit": 5}


def test_validate_query_decorator():
    v = Query.has("id").as_(int)

    class Src:
        @validate_query(v)
        def handler(self, table, query):
            return query

    assert Src().handler("t", {"id": "9"}) == {"id": 9}
    with pytest.raises(QueryValidationError):
        Src().handler("t", {})


# -- property tests ----------------------------------------------------------

keys = st.text(alphabet="abcdef", min_size=1, max_size=4)


@settings(deadline=None)  # Spark JVM activity in-process can stall any tick
@given(req=st.sets(keys, max_size=4), extra=st.dictionaries(keys, st.integers(), max_size=4))
def test_required_keys_enforced(req, extra):
    v = None
    for k in sorted(req):
        v = (v.also.has(k) if v else Query.has(k)).as_(int)
    query = {**extra, **{k: 1 for k in req}}
    if v is None:
        return
    out = v.validate(query)
    assert all(k in out for k in req)
    # dropping any one required key must raise
    for k in sorted(req):
        q2 = dict(query)
        del q2[k]
        with pytest.raises(QueryValidationError):
            v.validate(q2)


@settings(deadline=None)
@given(st.dictionaries(keys, st.integers() | st.text(max_size=5), max_size=5))
def test_unvalidated_keys_pass_through(query):
    v = Query.can_have("zzz").as_(int).with_default(0)
    out = v.validate(query)
    for k, val in query.items():
        if k != "zzz":
            assert out[k] == val
    assert "zzz" in out
