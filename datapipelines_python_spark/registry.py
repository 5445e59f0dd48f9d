"""Operator registry: name -> (Spark callable, DuckDB oracle SQL).

Every operator from SURVEY.md §2B registers here via the ``@query``
decorator; ``__spark_entry__.py`` exposes the registry to the driver's
correctness harness. Keeping the Spark plan and its oracle SQL side by side
in one decorator is the discipline that makes the hash check pass: aliases,
casts, and rounding are written once, together.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that register operators on import.
_OPERATOR_MODULES = (
    "datapipelines_python_spark.operators.scans",
    "datapipelines_python_spark.operators.projections",
    "datapipelines_python_spark.operators.joins",
    "datapipelines_python_spark.operators.aggregations",
    "datapipelines_python_spark.operators.windows",
    "datapipelines_python_spark.operators.sorts_setops",
    "datapipelines_python_spark.operators.scalar_functions",
    "datapipelines_python_spark.operators.udfs",
    "datapipelines_python_spark.operators.llm",
    "datapipelines_python_spark.operators.llm_training",
    "datapipelines_python_spark.operators.workloads",
    "datapipelines_python_spark.operators.stats",
    "datapipelines_python_spark.streaming.ops",
)


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None -> driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), bench: bool = False):
    """Register an operator. ``oracle`` is DuckDB SQL over the fixture views."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate operator name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    _LOADED = True


def get_registry() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def _tuned(fn: QueryFn) -> QueryFn:
    """Apply engine session defaults (UTC timezone, AQE) before the plan is
    built: the driver calls these with ITS OWN SparkSession, whose timezone
    would otherwise leak into collected timestamp values."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from datapipelines_python_spark.session import tune_session

        tune_session(spark)
        return fn(spark, sf_dir)

    return wrapped


def all_queries() -> dict[str, QueryFn]:
    return {name: _tuned(spec.fn) for name, spec in get_registry().items()}


def all_oracles() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in get_registry().items() if spec.oracle is not None
    }
