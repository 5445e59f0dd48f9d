"""Property-based checks for the cross-engine determinism helpers
(`operators/_helpers.py`) — the conventions every oracle pair leans on:

- `round4` must agree bit-for-bit with its DuckDB twin `sql_round4` on
  arbitrary doubles (it is pure IEEE floor/multiply arithmetic, unlike
  engine ROUND which differs between Spark and DuckDB).
- `dsum` must be partition-count invariant: the decimal-internal sum of a
  double column gives the same double back no matter how the rows are
  split (float summation is not associative; the decimal path is).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datapipelines_python_spark.operators._helpers import (
    dsum,
    round4,
    sql_round4,
)

_reasonable_doubles = st.floats(
    min_value=-1e12,
    max_value=1e12,
    allow_nan=False,
    allow_infinity=False,
    width=64,
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_reasonable_doubles, min_size=1, max_size=16))
def test_round4_matches_duckdb_twin(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = [
        r["r"] for r in df.select(round4(F.col("x")).alias("r"))
        .collect()
    ]
    con = duckdb.connect()
    expected = [
        con.execute(f"SELECT {sql_round4('CAST(? AS DOUBLE)')}", [x]).fetchone()[0]
        for x in xs
    ]
    assert got == expected, (xs, got, expected)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(_reasonable_doubles, min_size=2, max_size=40),
    st.integers(min_value=1, max_value=8),
)
def test_dsum_partition_invariant(spark, xs, nparts):
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    one = df.coalesce(1).agg(dsum(F.col("x")).alias("s")).collect()[0]["s"]
    many = (
        df.repartition(nparts)
        .agg(dsum(F.col("x")).alias("s"))
        .collect()[0]["s"]
    )
    assert one == many, (xs, nparts, one, many)


def test_round4_half_up_at_boundary(spark):
    # the floor(x*1e4 + 0.5) trick rounds .5 cases up — pin one exactly
    # representable boundary so the convention never silently flips
    df = spark.createDataFrame([(0.00005,), (-0.00005,)], "x double")
    got = [r["r"] for r in df.select(round4(F.col("x")).alias("r")).collect()]
    assert got[0] == pytest.approx(0.0001)
    # -0.00005*1e4 + 0.5 == 0.0 exactly -> floor 0.0 (half-up toward +inf)
    assert got[1] == 0.0
