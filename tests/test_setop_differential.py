"""Property-based set-operation differential vs DuckDB.

The other differential files cover predicates/joins, windows, and
rollup/cube; this one sweeps the remaining ANSI corner with genuinely
tricky semantics: bag arithmetic. INTERSECT ALL keeps min(m, n) copies of
a row, EXCEPT ALL keeps max(m - n, 0), UNION deduplicates across BOTH
inputs, and in every distinct-flavored operator NULLs compare EQUAL
(unlike `=`). Each case projects orders down to low-cardinality columns
(so real duplicate multiplicities arise), injects NULLs via CASE WHEN,
splits the table by two random predicates, and demands the full result
multiset match DuckDB exactly.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datapipelines_python_spark.catalog import load_table
from tests.conftest import SF_SMOKE, norm_rows

_SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# Low-cardinality projections so multiplicities are large; one variant
# injects NULLs so null-equality in distinct-flavored ops is exercised.
_PROJS = st.sampled_from(
    [
        "o_orderstatus, o_orderpriority",
        "o_orderstatus, CAST(year(o_orderdate) AS INT) AS y",
        "CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderstatus END AS s, "
        "o_orderpriority",
        "CASE WHEN o_custkey % 3 = 0 THEN NULL "
        "ELSE CAST(o_custkey % 10 AS INT) END AS ck, o_orderstatus",
    ]
)

_PREDS = st.one_of(
    st.sampled_from(["F", "P", "O"]).map(lambda v: f"o_orderstatus = '{v}'"),
    st.integers(min_value=0, max_value=6).map(lambda v: f"o_orderkey % 7 <= {v}"),
    st.integers(min_value=0, max_value=300_000).map(lambda v: f"o_totalprice > {v}"),
)

# (Spark DataFrame method, SQL operator)
_OPS = [
    ("unionAll", "UNION ALL"),
    ("union_distinct", "UNION"),
    ("intersect", "INTERSECT"),
    ("intersectAll", "INTERSECT ALL"),
    ("exceptAll", "EXCEPT ALL"),
    ("subtract", "EXCEPT"),
]


@settings(**_SETTINGS)
@given(proj=_PROJS, p1=_PREDS, p2=_PREDS, op=st.sampled_from(_OPS))
def test_setop_multiset_matches_duckdb(spark, duck, proj, p1, p2, op):
    """(orders WHERE p1) <setop> (orders WHERE p2) over a duplicate-heavy
    projection: the exact result multiset — including how many copies of
    each row survive, and whether NULL rows pair up — must match DuckDB."""
    method, sql_op = op
    base = f"SELECT {proj} FROM orders WHERE"
    sql = f"({base} {p1}) {sql_op} ({base} {p2})"

    o = load_table(spark, SF_SMOKE, "orders")
    lhs = o.filter(p1).selectExpr(*proj.split(", "))
    rhs = o.filter(p2).selectExpr(*proj.split(", "))
    if method == "union_distinct":
        got_df = lhs.union(rhs).distinct()
    else:
        got_df = getattr(lhs, method)(rhs)

    got = norm_rows(tuple(r) for r in got_df.collect())
    want = norm_rows(duck.execute(sql).fetchall())
    assert got == want, f"{sql_op}: {sql}"


@settings(**_SETTINGS)
@given(
    desc=st.booleans(),
    nulls_first=st.booleans(),
    mod=st.integers(min_value=2, max_value=9),
    k=st.integers(min_value=1, max_value=50),
)
def test_order_by_nulls_limit_matches_duckdb(spark, duck, desc, nulls_first, mod, k):
    """Top-k under an explicitly null-ordered sort. Engine DEFAULTS differ
    (Spark ASC puts NULLS FIRST, DuckDB ASC puts NULLS LAST), so any
    top-k/limit surface must always spell the null placement; this pins
    that with both spelled orders + a unique tiebreak key the exact
    ordered prefix matches DuckDB element-for-element."""
    from pyspark.sql import functions as F

    o = load_table(spark, SF_SMOKE, "orders")
    key = F.when(F.col("o_custkey") % mod == 0, None).otherwise(
        F.col("o_totalprice")
    )
    col = key.desc_nulls_first() if (desc and nulls_first) else (
        key.desc_nulls_last() if desc else
        key.asc_nulls_first() if nulls_first else key.asc_nulls_last()
    )
    got = [
        (r[0], r[1])
        for r in o.select(key.alias("sk"), "o_orderkey")
        .orderBy(col, F.col("o_orderkey").asc())
        .limit(k)
        .collect()
    ]
    dirn = "DESC" if desc else "ASC"
    nstr = "NULLS FIRST" if nulls_first else "NULLS LAST"
    want = duck.execute(
        f"SELECT CASE WHEN o_custkey % {mod} = 0 THEN NULL ELSE o_totalprice END AS sk,"
        f" o_orderkey FROM orders ORDER BY sk {dirn} {nstr}, o_orderkey LIMIT {k}"
    ).fetchall()
    assert got == [tuple(r) for r in want], f"ORDER BY sk {dirn} {nstr} LIMIT {k}"
