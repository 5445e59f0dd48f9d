"""Property-based window-function differential: randomized (partition key ×
order direction × function × ROWS frame) window specs evaluated by Spark
and by DuckDB over the same parquet must agree row-for-row.

Complements test_predicate_differential.py (filters/joins/aggs) with the
window surface — the driver's oracle harness checks only the fixed window
specs the registry registers; this sweeps the spec space around them.

Determinism discipline mirrors the engine's own conventions: every ORDER
BY ends with the unique o_orderkey so ranking/navigation/frame functions
are well-defined under ties in BOTH engines; measures are integers so
agreement is exact, not approximate. rank/dense_rank additionally get a
deliberately non-unique ordering variant, because tie semantics (same
rank, gap/no-gap) must match even when row order within ties does not.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datapipelines_python_spark.catalog import load_table
from tests.conftest import SF_SMOKE

_SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_PARTITION_KEYS = ["o_orderstatus", "o_orderpriority", "o_custkey % 7"]


# (label, spark window-function builder, duckdb SQL fragment builder);
# builders receive the frame clause where relevant
_FUNCS = {
    "row_number": (lambda: F.row_number(), lambda fr: "ROW_NUMBER()"),
    "ntile4": (lambda: F.ntile(4), lambda fr: "NTILE(4)"),
    "lag2": (
        lambda: F.lag("o_orderkey", 2, -1),
        lambda fr: "COALESCE(LAG(o_orderkey, 2) OVER w_nof, -1)",
    ),
    "lead1": (
        lambda: F.lead("o_orderkey", 1, -1),
        lambda fr: "COALESCE(LEAD(o_orderkey, 1) OVER w_nof, -1)",
    ),
    "sum_frame": (
        lambda: F.sum("o_orderkey"),
        lambda fr: f"SUM(o_orderkey) OVER w_f",
    ),
    "count_frame": (
        lambda: F.count(F.lit(1)),
        lambda fr: f"COUNT(*) OVER w_f",
    ),
    "min_frame": (
        lambda: F.min("o_orderkey"),
        lambda fr: f"MIN(o_orderkey) OVER w_f",
    ),
    "max_frame": (
        lambda: F.max("o_orderkey"),
        lambda fr: f"MAX(o_orderkey) OVER w_f",
    ),
    "first_value_frame": (
        lambda: F.first("o_orderkey"),
        lambda fr: f"FIRST_VALUE(o_orderkey) OVER w_f",
    ),
}
_FRAMED = {"sum_frame", "count_frame", "min_frame", "max_frame", "first_value_frame"}


@settings(**_SETTINGS)
@given(
    pkey=st.sampled_from(_PARTITION_KEYS),
    desc=st.booleans(),
    fname=st.sampled_from(sorted(_FUNCS)),
    preceding=st.integers(min_value=0, max_value=5),
    following=st.integers(min_value=0, max_value=3),
)
def test_random_window_specs_match_duckdb(spark, duck, pkey, desc, fname, preceding, following):
    f_spark, f_sql = _FUNCS[fname]

    order_cols = [
        F.col("o_orderdate").desc() if desc else F.col("o_orderdate").asc(),
        F.col("o_orderkey").asc(),  # total order under date ties
    ]
    w = W.partitionBy(F.expr(pkey)).orderBy(*order_cols)
    if fname in _FRAMED:
        w = w.rowsBetween(-preceding, following)

    got_df = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", f_spark().over(w).cast("long").alias("val")
    )
    got = sorted((r["o_orderkey"], r["val"]) for r in got_df.collect())

    direction = "DESC" if desc else "ASC"
    order_sql = f"o_orderdate {direction}, o_orderkey ASC"
    frame_sql = f"ROWS BETWEEN {preceding} PRECEDING AND {following} FOLLOWING"
    expr = f_sql(frame_sql)
    if "OVER w" not in expr:
        expr = f"{expr} OVER w_nof"
    want = duck.execute(
        f"SELECT o_orderkey, CAST({expr} AS BIGINT) FROM orders "
        f"WINDOW w_nof AS (PARTITION BY {pkey} ORDER BY {order_sql}), "
        f"w_f AS (PARTITION BY {pkey} ORDER BY {order_sql} {frame_sql}) "
        f"ORDER BY o_orderkey"
    ).fetchall()
    assert got == [tuple(r) for r in want], f"{fname} over {pkey} {direction} -{preceding}/+{following}"


@settings(**_SETTINGS)
@given(
    pkey=st.sampled_from(_PARTITION_KEYS),
    okey=st.sampled_from(["o_orderdate", "o_custkey", "o_totalprice"]),
    dense=st.booleans(),
)
def test_rank_tie_semantics_match_duckdb(spark, duck, pkey, okey, dense):
    """rank/dense_rank over a deliberately NON-unique ordering: tie groups
    must get the same rank with (rank) or without (dense_rank) gaps,
    identically in both engines, even though row order within a tie group
    is unspecified."""
    fn = F.dense_rank() if dense else F.rank()
    name = "DENSE_RANK" if dense else "RANK"
    w = W.partitionBy(F.expr(pkey)).orderBy(F.col(okey).asc())
    got = sorted(
        (r["o_orderkey"], r["val"])
        for r in load_table(spark, SF_SMOKE, "orders")
        .select("o_orderkey", fn.over(w).cast("long").alias("val"))
        .collect()
    )
    want = duck.execute(
        f"SELECT o_orderkey, CAST({name}() OVER "
        f"(PARTITION BY {pkey} ORDER BY {okey} ASC) AS BIGINT) "
        f"FROM orders ORDER BY o_orderkey"
    ).fetchall()
    assert got == [tuple(r) for r in want], f"{name} by {okey} within {pkey}"
