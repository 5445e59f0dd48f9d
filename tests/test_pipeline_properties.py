"""Property-based adversarial coverage of the §2A pipeline layer
(VERDICT r2 "Next round" #8): randomized multi-key filter specs, provider
orderings, write-back round-trips, validator algebra, and min-cost chain
planning — the same hypothesis treatment the engine operators get from
test_predicate_differential.py.

All Spark-side properties run over the 25-row nation / 5-row region
fixtures so each hypothesis example costs a couple of tiny local jobs.
"""

from __future__ import annotations

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datapipelines_python_spark.catalog import load_table
from datapipelines_python_spark.pipeline import (
    DataPipeline,
    DataTransformer,
    FixtureSource,
    MemoryCache,
    NotFoundError,
    Query,
    QueryValidationError,
)
from tests.conftest import SF_SMOKE

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# -- randomized multi-key equality query dicts over nation -----------------

_NATION_QUERIES = st.dictionaries(
    keys=st.sampled_from(["n_nationkey", "n_regionkey", "n_name"]),
    values=st.integers(min_value=0, max_value=30),
    max_size=3,
).map(
    # n_name is a string column: make its value a (sometimes-matching) name
    lambda q: {
        k: (["ALGERIA", "BRAZIL", "CANADA", "NOPE"][v % 4] if k == "n_name" else v)
        for k, v in q.items()
    }
)


def _expected_nation(spark, query):
    df = load_table(spark, SF_SMOKE, "nation")
    for k, v in query.items():
        df = df.filter(F.col(k) == F.lit(v))
    return sorted(tuple(r) for r in df.collect())


@settings(**_SETTINGS)
@given(query=_NATION_QUERIES, order=st.permutations([0, 1, 2]))
def test_get_many_invariant_under_provider_ordering(spark, query, order):
    """Property 1: for ANY permutation of (empty MemoryCache, narrowed
    FixtureSource that cannot serve nation, full FixtureSource) and ANY
    multi-key equality query, get_many returns exactly the directly-loaded,
    directly-filtered table — provider order may change who serves, never
    what is served."""
    elements = [
        MemoryCache(),
        FixtureSource(SF_SMOKE, tables={"region"}),  # must be skipped
        FixtureSource(SF_SMOKE),
    ]
    pipe = DataPipeline([elements[i] for i in order], spark=spark)
    got = sorted(tuple(r) for r in pipe.get_many("nation", query).collect())
    assert got == _expected_nation(spark, query)


@settings(**_SETTINGS)
@given(q1=_NATION_QUERIES, q2=_NATION_QUERIES)
def test_write_back_cache_serves_any_later_query(spark, q1, q2):
    """Property 2 (A14 write-back): after ANY first query resolves from the
    cold source, the earlier MemoryCache holds the UNFILTERED table (the
    cache stores the table, not the first call's predicate-subset), so ANY
    second query — including a wider one — served from the cache is still
    exactly the direct filtered load."""
    mem = MemoryCache()
    pipe = DataPipeline([mem, FixtureSource(SF_SMOKE)], spark=spark)
    try:
        pipe.get_many("nation", q1).collect()
        assert "nation" in mem.provides
        full = load_table(spark, SF_SMOKE, "nation").count()
        assert mem._store["nation"].count() == full
        got = sorted(tuple(r) for r in pipe.get_many("nation", q2).collect())
        # the cache (earliest provider) is what served the second call
        assert got == _expected_nation(spark, q2)
    finally:
        mem.evict()


@settings(**_SETTINGS)
@given(query=_NATION_QUERIES)
def test_get_one_object_contract(spark, query):
    """Property 3: pipeline.get returns a single row satisfying every
    equality predicate, or raises NotFoundError exactly when the filtered
    table is empty — never a wrong row, never a silent None."""
    pipe = DataPipeline([FixtureSource(SF_SMOKE)], spark=spark)
    expected = _expected_nation(spark, query)
    if not expected:
        with pytest.raises(NotFoundError):
            pipe.get("nation", query)
    else:
        row = pipe.get("nation", query)
        for k, v in query.items():
            assert row[k] == v


# -- validator algebra ------------------------------------------------------

_CLAUSE = st.tuples(
    st.sampled_from(["alpha", "beta", "gamma", "delta"]),  # canonical key
    st.booleans(),  # required?
    st.sampled_from([None, int, str]),  # coercion type
    st.one_of(st.none(), st.integers(0, 9)),  # default (optional only)
    st.lists(st.sampled_from(["alt1", "alt2"]), max_size=1, unique=True),
)


def _build_validator(clauses):
    v = Query
    first = True
    seen = set()
    spec = []
    for key, required, type_, default, alts in clauses:
        if key in seen:
            continue  # one clause per canonical key keeps semantics crisp
        seen.add(key)
        alts = [a for a in alts if a not in seen]
        seen.update(alts)
        builder = (v.has if first else v.also.has) if required else (
            v.can_have if first else v.also.can_have
        )
        v = builder(key)
        if type_ is not None:
            v = v.as_(type_)
        for a in alts:
            v = v.or_(a)
        if not required and default is not None:
            v = v.with_default(default)
        spec.append((key, required, type_, default, alts))
        first = False
    return v, spec


_QUERY_VALUES = st.one_of(st.integers(0, 99), st.sampled_from(["7", "x", "12"]))


@settings(**_SETTINGS)
@given(
    clauses=st.lists(_CLAUSE, min_size=1, max_size=4),
    query=st.dictionaries(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "alt1", "alt2", "extra"]),
        _QUERY_VALUES,
        max_size=5,
    ),
)
def test_validator_model_differential(clauses, query):
    """Property 4: QueryValidator.validate against an independent model —
    for ANY clause set (required/optional × int/str coercion × defaults ×
    alternative key names) and ANY query dict: it raises exactly when the
    model says a required key is missing or a coercion must fail; otherwise
    the output carries coerced canonical keys, applied defaults, dropped
    alternatives, and untouched undeclared keys. Re-validating the output
    is a fixpoint (idempotence)."""
    validator, spec = _build_validator(clauses)

    def model():
        out = dict(query)
        for key, required, type_, default, alts in spec:
            present = [k for k in (key, *alts) if k in query]
            if not present:
                if required:
                    return None  # must raise
                if default is not None:
                    # defaults are coerced through the declared type too
                    out[key] = str(default) if type_ is str else default
                continue
            value = query[present[0]]
            if type_ is int and isinstance(value, str):
                try:
                    value = int(value)
                except ValueError:
                    return None  # must raise
            elif type_ is str and not isinstance(value, str):
                value = str(value)
            if present[0] != key:
                out.pop(present[0], None)
            out[key] = value
        return out

    expected = model()
    if expected is None:
        with pytest.raises(QueryValidationError):
            validator.validate(query)
    else:
        got = validator.validate(query)
        assert dict(got) == expected
        assert dict(validator.validate(got)) == dict(got)  # fixpoint


# -- min-cost transformer chains against brute force ------------------------

_NODES = ["t0", "t1", "t2", "t3"]


@settings(**_SETTINGS)
@given(
    edges=st.lists(
        st.tuples(
            st.sampled_from(_NODES),
            st.sampled_from(_NODES),
            st.integers(min_value=1, max_value=9),
        ),
        max_size=8,
    ),
    endpoints=st.tuples(st.sampled_from(_NODES), st.sampled_from(_NODES)),
)
def test_chain_is_min_cost_vs_brute_force(spark, edges, endpoints):
    """Property 5: DataPipeline.chain (Dijkstra) returns a valid frm→to
    transformer chain whose cost equals the brute-force minimum over all
    simple paths in the random graph, and returns None exactly when no
    path exists."""
    frm, to = endpoints
    ts = [
        DataTransformer(a, b, (lambda d: d), cost=c) for a, b, c in edges if a != b
    ]
    pipe = DataPipeline([], transformers=ts, spark=spark)

    # brute force: min cost over all simple paths frm -> to
    best = 0 if frm == to else None
    if frm != to:
        adj = {}
        for t in ts:
            adj.setdefault(t.frm, []).append(t)
        stack = [(frm, 0, {frm})]
        while stack:
            node, cost, seen = stack.pop()
            for t in adj.get(node, []):
                if t.to == to and (best is None or cost + t.cost < best):
                    best = cost + t.cost
                if t.to not in seen:
                    stack.append((t.to, cost + t.cost, seen | {t.to}))

    chain = pipe.chain(frm, to)
    if best is None:
        assert chain is None
    else:
        assert chain is not None
        assert sum(t.cost for t in chain) == best
        # the chain is structurally valid: seams line up frm -> ... -> to
        cur = frm
        for t in chain:
            assert t.frm == cur
            cur = t.to
        assert cur == to or (chain == [] and frm == to)
