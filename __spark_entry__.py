"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``datapipelines_python_spark`` (see SURVEY.md §2B
for the operator inventory this registry fills in).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datapipelines_python_spark import all_oracles, all_queries
from datapipelines_python_spark.session import tune_session

_SMOKE_SF = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    tune_session(spark)
    from datapipelines_python_spark.operators.aggregations import agg_groupby

    return agg_groupby(spark, _SMOKE_SF)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query. Omitted keys produce NO driver check
    at all (CORRECTNESS records ``err: no_oracle`` — observed r5); as of
    round 6 every registered operator carries an exact oracle."""
    return all_oracles()
