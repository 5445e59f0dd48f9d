"""Property-based differential: randomized filter specs evaluated by the
engine (Spark, with parquet pushdown) and by DuckDB over the same files
must agree (SURVEY.md §5.2 item 4).

Predicates are drawn over `orders` columns of every comparison shape the
pipeline layer emits; agreement is checked on count + an integer checksum
(sum of o_orderkey), which is order- and float-independent.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datapipelines_python_spark.catalog import load_table
from tests.conftest import SF_SMOKE

_STATUSES = ["F", "P", "O"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


# one atomic predicate: (spark Column builder, duckdb SQL string)
def _atoms():
    return st.one_of(
        st.sampled_from(_STATUSES).map(
            lambda v: (F.col("o_orderstatus") == v, f"o_orderstatus = '{v}'")
        ),
        st.sampled_from(_PRIORITIES).map(
            lambda v: (F.col("o_orderpriority") != v, f"o_orderpriority <> '{v}'")
        ),
        st.integers(min_value=0, max_value=400_000).map(
            lambda v: (F.col("o_totalprice") > float(v), f"o_totalprice > {v}")
        ),
        st.integers(min_value=0, max_value=1500).map(
            lambda v: (F.col("o_custkey") <= v, f"o_custkey <= {v}")
        ),
        st.tuples(
            st.integers(min_value=0, max_value=750),
            st.integers(min_value=0, max_value=750),
        ).map(
            lambda lo_hi: (
                F.col("o_custkey").between(min(lo_hi), min(lo_hi) + max(lo_hi)),
                f"o_custkey BETWEEN {min(lo_hi)} AND {min(lo_hi) + max(lo_hi)}",
            )
        ),
        st.sampled_from(["1996", "1998", "2000"]).map(
            lambda y: (
                F.col("o_orderdate") >= f"{y}-01-01",
                f"o_orderdate >= TIMESTAMP '{y}-01-01'",
            )
        ),
    )


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    atoms=st.lists(_atoms(), min_size=1, max_size=4),
    ops=st.lists(st.sampled_from(["AND", "OR"]), min_size=3, max_size=3),
    negate=st.booleans(),
)
def test_random_predicates_match_duckdb(spark, duck, atoms, ops, negate):
    cond, sql = atoms[0]
    for (c, s), op in zip(atoms[1:], ops):
        cond = (cond & c) if op == "AND" else (cond | c)
        sql = f"({sql}) {op} ({s})"
    if negate:
        cond, sql = ~cond, f"NOT ({sql})"

    got = (
        load_table(spark, SF_SMOKE, "orders")
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("o_orderkey"), F.lit(0)).alias("chk"),
        )
        .collect()[0]
    )
    want = duck.execute(
        f"SELECT COUNT(*), COALESCE(SUM(o_orderkey), 0) FROM orders WHERE {sql}"
    ).fetchone()
    assert (got["n"], got["chk"]) == want, f"predicate mismatch for: {sql}"


_GROUP_KEYS = ["c_mktsegment", "o_orderstatus", "c_nationkey"]
_JOIN_TYPES = [("inner", "JOIN"), ("left_semi", "SEMI JOIN")]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    atom=_atoms(),
    key=st.sampled_from(_GROUP_KEYS),
    how=st.sampled_from(_JOIN_TYPES),
)
def test_random_join_agg_match_duckdb(spark, duck, atom, key, how):
    """Randomized join+groupBy differential: a filtered orders side joined
    to customer, grouped on a random key from either side, must produce
    identical per-group counts and integer checksums in both engines —
    exercises join planning (broadcast vs shuffle picked freely by AQE)
    under predicates the oracle harness never enumerates."""
    cond, sql = atom
    spark_how, sql_join = how
    o = load_table(spark, SF_SMOKE, "orders").filter(cond)
    c = load_table(spark, SF_SMOKE, "customer")
    if spark_how == "left_semi":
        j = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        chk_col, chk_sql = "c_custkey", "c_custkey"
        if key.startswith("o_"):
            return  # semi join keeps only customer columns
        got_df = j.groupBy(key).agg(
            F.count(F.lit(1)).alias("n"), F.sum(chk_col).alias("chk")
        )
        want = duck.execute(
            f"SELECT {key}, COUNT(*), SUM({chk_sql}) FROM customer "
            f"WHERE EXISTS (SELECT 1 FROM orders WHERE ({sql}) "
            f"AND o_custkey = c_custkey) GROUP BY {key} ORDER BY {key}"
        ).fetchall()
    else:
        j = o.join(c, o.o_custkey == c.c_custkey)
        got_df = j.groupBy(key).agg(
            F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("chk")
        )
        want = duck.execute(
            f"SELECT {key}, COUNT(*), SUM(o_orderkey) "
            f"FROM orders JOIN customer ON o_custkey = c_custkey "
            f"WHERE {sql} GROUP BY {key} ORDER BY {key}"
        ).fetchall()
    got = sorted(
        [(r[key], r["n"], r["chk"]) for r in got_df.collect()],
        key=lambda x: (x[0] is None, x[0]),
    )
    assert got == [tuple(w) for w in want], f"join+agg mismatch: {sql} by {key}"
