"""Property-based outer-join and grouped-aggregation differentials.

test_predicate_differential.py covers filters + inner/semi joins;
test_window_differential.py covers window specs. This file sweeps the two
remaining classic cross-engine bug nests:

- OUTER joins under randomized predicates: the null-extension rules (which
  side survives, what the other side's columns become, how a WHERE on the
  nullable side interacts) must match DuckDB exactly — including the
  filter-above-join vs filter-in-ON distinction that changes outer-join
  results but not inner-join ones.
- ROLLUP / CUBE / GROUPING SETS with randomized key subsets: the
  super-aggregate rows (NULL-keyed) and their counts/checksums must match.

Integer measures only, so agreement is exact.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datapipelines_python_spark.catalog import load_table
from tests.conftest import SF_SMOKE, norm_rows

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# atomic predicates on the orders (right/nullable) side: (Column, SQL)
_ORDER_PREDS = st.one_of(
    st.sampled_from(["F", "P", "O"]).map(
        lambda v: (F.col("o_orderstatus") == v, f"o_orderstatus = '{v}'")
    ),
    st.integers(min_value=0, max_value=400_000).map(
        lambda v: (F.col("o_totalprice") > float(v), f"o_totalprice > {v}")
    ),
    st.integers(min_value=0, max_value=6).map(
        lambda v: (F.col("o_orderkey") % 7 == v, f"o_orderkey % 7 = {v}")
    ),
)

_HOW = [("left", "LEFT"), ("right", "RIGHT"), ("full", "FULL")]


@settings(**_SETTINGS)
@given(
    pred=_ORDER_PREDS,
    how=st.sampled_from(_HOW),
    pred_in_on=st.booleans(),
)
def test_outer_join_null_extension_matches_duckdb(spark, duck, pred, how, pred_in_on):
    """customer OUTER-join orders with a random predicate on the orders
    side, placed either IN the join condition (rows drop out of the match,
    the customer row still survives null-extended) or ABOVE the join as a
    WHERE (null-extended rows where the predicate is NULL get filtered) —
    the two placements must diverge exactly as DuckDB says they do."""
    cond_col, cond_sql = pred
    spark_how, sql_how = how

    c = load_table(spark, SF_SMOKE, "customer")
    o = load_table(spark, SF_SMOKE, "orders")
    key = c.c_custkey == o.o_custkey
    if pred_in_on:
        j = c.join(o, key & cond_col, spark_how)
        sql = (
            f"SELECT c_custkey, o_orderkey FROM customer "
            f"{sql_how} JOIN orders ON c_custkey = o_custkey AND ({cond_sql})"
        )
    else:
        j = c.join(o, key, spark_how).filter(cond_col)
        sql = (
            f"SELECT c_custkey, o_orderkey FROM customer "
            f"{sql_how} JOIN orders ON c_custkey = o_custkey WHERE {cond_sql}"
        )

    got = sorted(
        ((r["c_custkey"], r["o_orderkey"]) for r in j.select("c_custkey", "o_orderkey").collect()),
        key=lambda t: (t[0] is None, t[0], t[1] is None, t[1]),
    )
    want = sorted(
        (tuple(r) for r in duck.execute(sql).fetchall()),
        key=lambda t: (t[0] is None, t[0], t[1] is None, t[1]),
    )
    assert got == want, f"{sql_how} JOIN, pred {'in ON' if pred_in_on else 'in WHERE'}: {cond_sql}"


_GROUP_COLS = ["o_orderstatus", "o_orderpriority", "year(o_orderdate)"]


@settings(**_SETTINGS)
@given(
    keys=st.lists(st.sampled_from(_GROUP_COLS), min_size=1, max_size=3, unique=True),
    mode=st.sampled_from(["rollup", "cube"]),
    pred=_ORDER_PREDS,
)
def test_rollup_cube_superaggregates_match_duckdb(spark, duck, keys, mode, pred):
    """ROLLUP/CUBE over random key subsets of a randomly filtered orders:
    every grouping level's (keys..., count, integer checksum) — including
    the NULL-keyed super-aggregate rows and the grand total — must match
    DuckDB row-for-row."""
    cond_col, cond_sql = pred
    o = load_table(spark, SF_SMOKE, "orders").filter(cond_col)
    if o.count() == 0:
        # known engine divergence, pinned rather than papered over: Spark
        # rollup/cube over empty input yields 0 rows, ANSI/DuckDB yields
        # the grand-total row (NULL keys, count 0)
        want_empty = duck.execute(
            f"SELECT COUNT(*) FROM (SELECT 1 FROM orders WHERE {cond_sql}) t"
        ).fetchone()[0]
        assert want_empty == 0
        return
    cols = [F.expr(k).alias(f"k{i}") for i, k in enumerate(keys)]
    grouped = o.rollup(*cols) if mode == "rollup" else o.cube(*cols)
    got_df = grouped.agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("chk")
    )
    key_sql = ", ".join(keys)
    want = duck.execute(
        f"SELECT {key_sql}, COUNT(*), SUM(o_orderkey) FROM orders "
        f"WHERE {cond_sql} GROUP BY {mode.upper()} ({key_sql})"
    ).fetchall()

    got = norm_rows(tuple(r) for r in got_df.collect())
    assert got == norm_rows(want), f"{mode} over {keys} where {cond_sql}"
