"""datapipelines_python_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL/pipeline framework (``meraki-analytics/datapipelines-python``,
see SURVEY.md), re-expressed Spark-first:

- **Pipeline framework layer** (``datapipelines_python_spark.pipeline``):
  typed sources / sinks / transformers / ``get``-with-query / write-back
  caching / fluent query validation — the reference's own API surface
  (SURVEY.md §2A), operating natively on DataFrames.
- **Analytics operator layer** (``datapipelines_python_spark.operators``,
  ``.streaming``): the ~120-operator relational + streaming + LLM-pipeline
  inventory (SURVEY.md §2B, incl. §2B.11 extensions), each declared as a
  DataFrame plan so Catalyst
  (pushdown, pruning, AQE, whole-stage codegen) optimizes it.

Designed for 100 TB scale: no driver-side collects in any operator, joins
broadcast-hinted where one side is dimension-sized, dedup/similarity have
LSH-banded scale paths, streaming state bounded by watermarks.
"""

from datapipelines_python_spark.catalog import TABLES, load_table, register_views
from datapipelines_python_spark.registry import QuerySpec, all_queries, all_oracles, get_registry
from datapipelines_python_spark.session import get_spark

__all__ = [
    "TABLES",
    "QuerySpec",
    "all_oracles",
    "all_queries",
    "get_registry",
    "get_spark",
    "load_table",
    "register_views",
]

__version__ = "0.1.0"
