"""Same-SQL-TEXT differential: one randomized ANSI statement, executed
VERBATIM by both engines.

The other differential files drive Spark through the DataFrame API and
DuckDB through SQL; this one removes the translation layer entirely — a
single SQL string goes to ``spark.sql`` and ``duckdb.execute`` unchanged,
so any divergence is a genuine engine-semantics difference, not a
transcription bug. Focus: the aggregate shapes with the subtlest engine
internals — multiple DISTINCT aggregates in one SELECT (expand-based
rewrites), aggregate FILTER clauses, and their interaction with GROUP BY
and HAVING. Integer-valued measures only, so agreement is exact.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datapipelines_python_spark.catalog import register_views
from tests.conftest import SF_SMOKE, norm_rows

_SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def spark_views(spark):
    register_views(spark, SF_SMOKE, ("orders",))
    return spark


_GROUP = st.sampled_from(["o_orderstatus", "o_orderpriority"])
_PRED = st.one_of(
    st.integers(min_value=0, max_value=6).map(lambda v: f"o_orderkey % 7 <= {v}"),
    st.sampled_from(["F", "P", "O"]).map(lambda v: f"o_orderstatus <> '{v}'"),
)
_MOD = st.integers(min_value=2, max_value=50)


@settings(**_SETTINGS)
@given(g=_GROUP, pred=_PRED, m1=_MOD, m2=_MOD, having=st.booleans())
def test_multi_distinct_filter_aggs_same_sql(spark_views, duck, g, pred, m1, m2, having):
    """Two DISTINCT aggregates over different expressions + a FILTER-clause
    aggregate + plain aggregates in ONE grouped SELECT (exercising the
    multi-distinct expand rewrite), optionally under HAVING — identical
    SQL text must yield identical grouped results on both engines."""
    hav = f"HAVING COUNT(*) > {m2}" if having else ""
    sql = (
        f"SELECT {g} AS grp, "
        f"COUNT(*) AS n, "
        f"COUNT(DISTINCT o_custkey % {m1}) AS d1, "
        f"COUNT(DISTINCT o_orderkey % {m2}) AS d2, "
        f"SUM(o_orderkey % 97) AS chk, "
        f"COUNT(*) FILTER (WHERE {pred}) AS nf, "
        f"MIN(o_orderkey) FILTER (WHERE {pred}) AS mf "
        f"FROM orders GROUP BY {g} {hav}"
    )
    got = sorted(
        tuple(None if v is None else int(v) if not isinstance(v, str) else v for v in r)
        for r in spark_views.sql(sql).collect()
    )
    want = sorted(
        tuple(None if v is None else int(v) if not isinstance(v, str) else v for v in r)
        for r in duck.execute(sql).fetchall()
    )
    assert got == want, sql


@settings(**_SETTINGS)
@given(
    g=_GROUP,
    pred=_PRED,
    mode=st.sampled_from(["ROLLUP", "CUBE"]),
    m=_MOD,
)
def test_grouping_id_same_sql(spark_views, duck, g, pred, mode, m):
    """GROUPING(...) markers on super-aggregate rows under ROLLUP/CUBE —
    identical SQL text, identical (group, grouping-flag, count, checksum)
    multisets. GROUPING() is how downstream code distinguishes 'NULL key
    value' from 'super-aggregate row', so the flag must agree exactly."""
    sql = (
        f"SELECT {g} AS grp, CAST(GROUPING({g}) AS INT) AS gflag, "
        f"COUNT(*) AS n, SUM(o_orderkey % {m}) AS chk "
        f"FROM orders WHERE {pred} GROUP BY {mode} ({g})"
    )
    got = norm_rows(tuple(r) for r in spark_views.sql(sql).collect())
    want = norm_rows(duck.execute(sql).fetchall())
    assert got == want, sql


@settings(**_SETTINGS)
@given(
    pred=_PRED,
    neg=st.booleans(),
    scalar=st.booleans(),
)
def test_correlated_subquery_same_sql(spark_views, duck, pred, neg, scalar):
    """Correlated [NOT] EXISTS and correlated scalar-aggregate compare —
    the decorrelation rewrites (Spark: rewrite to semi/anti join + groups;
    DuckDB: its own flattening) must agree row-for-row on identical SQL,
    including the empty-correlation-group edge where the scalar subquery
    yields NULL and the comparison drops the row."""
    ex = "NOT EXISTS" if neg else "EXISTS"
    if scalar:
        # integer MIN keeps the comparison exact on both engines (an AVG
        # here would pit Spark's decimal average against DuckDB's double
        # average and flip boundary rows)
        inner = (
            f"o1.o_orderkey % 89 > (SELECT MIN(o2.o_orderkey % 89) FROM orders o2 "
            f"WHERE o2.o_custkey = o1.o_custkey AND {pred.replace('o_', 'o2.o_')})"
        )
    else:
        inner = (
            f"{ex} (SELECT 1 FROM orders o2 WHERE o2.o_custkey = o1.o_custkey "
            f"AND o2.o_orderkey <> o1.o_orderkey AND {pred.replace('o_', 'o2.o_')})"
        )
    sql = (
        f"SELECT o1.o_orderstatus AS grp, COUNT(*) AS n, "
        f"SUM(o1.o_orderkey % 97) AS chk "
        f"FROM orders o1 WHERE {inner} GROUP BY o1.o_orderstatus"
    )
    got = sorted(
        (r[0], int(r[1]), int(r[2])) for r in spark_views.sql(sql).collect()
    )
    want = sorted((r[0], int(r[1]), int(r[2])) for r in duck.execute(sql).fetchall())
    assert got == want, sql
