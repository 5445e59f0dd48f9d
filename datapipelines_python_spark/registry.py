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

# Driver-slice rotation (VERDICT r2 "Next round" #1): the driver's
# CORRECTNESS check covers the FIRST 50 registered names only. Rounds 1–2
# spent that slice on scans/filters/joins (green twice); round 3 rotates in
# 50 ops with zero driver-green history — the flagship agg family, windows,
# sort/setops, scalar-function families, UDF surfaces, the LLM dedup/
# similarity headliners, streaming, and the newly registered ANN-candidate
# twins (VERDICT #2). After every module loads, _ensure_loaded reorders the
# registry so these names come first; everything else keeps its original
# registration order behind them. tests/test_registry.py pins the slice.
DRIVER_SLICE: tuple[str, ...] = (
    # §2B.4 aggregates (13) — incl. the never-driver-checked flagship
    "agg_groupby",
    "agg_global",
    "agg_having",
    "agg_count_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_collect_list",
    "agg_stats",
    "agg_percentile",
    "agg_min_max_by",
    "agg_first_last",
    "agg_partial_final",
    # §2B.5 windows (8)
    "win_row_number",
    "win_rank_dense",
    "win_lag_lead",
    "win_running_sum",
    "win_moving_avg",
    "win_range_frame",
    "win_first_last_value",
    "topk_per_group",
    # §2B.6 sorts / set ops (6)
    "sort_multi",
    "limit_topk_global",
    "setop_union_all",
    "setop_union_distinct",
    "setop_intersect",
    "setop_except",
    # §2B.7 scalar function families (9)
    "fn_string",
    "fn_regexp",
    "fn_date",
    "fn_timestamp",
    "fn_math",
    "fn_array",
    "fn_array_hof",
    "fn_map",
    "fn_json",
    # §2B.8 UDF surfaces (4)
    "udf_python_scalar",
    "udf_pandas_scalar",
    "udf_grouped_map",
    "udaf_pandas_agg",
    # LLM-pipeline headliners (4)
    "llm_dedup_exact",
    "llm_dedup_near",
    "llm_similarity_topk",
    "llm_tfidf",
    # §2B.9 streaming (3) — first-ever driver-checked streaming rows
    "stream_tumbling_agg",
    "stream_session_window",
    "stream_dedup",
    # ANN-candidate twins (3, new this round — VERDICT r2 #2)
    "graph_ann_edge_table",
    "graph_triangle_count_ann",
    "llm_hard_negative_mining_ann",
)

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
    fn: QueryFn  # canonicalized (driver-safe output schema)
    oracle: str | None = None  # DuckDB SQL (canon-wrapped); None -> rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set
    raw_fn: QueryFn | None = None  # pre-canonicalization plan (for snapshot gen)
    canonicalized: bool = True  # False only for diag_probe_* canonicalizer probes


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    canonicalize: bool = True,
):
    """Register an operator. ``oracle`` is DuckDB SQL over the fixture views.

    Both sides are canonicalized for the driver's pandas-based result
    comparison (see ``canon.py``): the Spark plan gets DECIMAL→double casts
    appended to its final select, and the oracle SQL is wrapped with the
    matching DuckDB casts from the committed ``canon_snapshot``.
    ``tests/test_schema_safety.py`` pins snapshot ↔ live-schema agreement.
    """

    def deco(fn: QueryFn) -> QueryFn:
        from datapipelines_python_spark.canon import canonicalize_df, wrap_oracle
        from datapipelines_python_spark.canon_snapshot import CANON_COLS

        if name in _REGISTRY:
            raise ValueError(f"duplicate operator name {name!r}")

        if canonicalize:

            def canon_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
                return canonicalize_df(fn(spark, sf_dir))

            canon_fn.__name__ = fn.__name__
            canon_fn.__doc__ = fn.__doc__
            reg_fn = canon_fn
            reg_oracle = (
                wrap_oracle(oracle, CANON_COLS.get(name, {})) if oracle is not None else None
            )
        else:  # diag_probe_*: deliberately raw, to measure the driver's hasher
            reg_fn, reg_oracle = fn, oracle
        _REGISTRY[name] = QuerySpec(
            name=name,
            fn=reg_fn,
            oracle=reg_oracle,
            tags=tags,
            bench=bench,
            raw_fn=fn,
            canonicalized=canonicalize,
        )
        return fn

    return deco


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return
    # flag set BEFORE the loop: each module import re-enters this function
    # via operators/__init__.py; the guard makes those re-entries no-ops so
    # the canonical _OPERATOR_MODULES order wins no matter which module was
    # imported first. Reset on failure so a broken module import re-raises
    # on every call instead of leaving a silently truncated registry.
    _LOADED = True
    try:
        for mod in _OPERATOR_MODULES:
            importlib.import_module(mod)
    except BaseException:
        _LOADED = False
        raise
    # Rotate the driver's first-50 correctness slice to DRIVER_SLICE order
    # (dict insertion order is the registration order the driver sees).
    ordered: dict[str, QuerySpec] = {}
    for name in DRIVER_SLICE:
        spec = _REGISTRY.get(name)
        if spec is not None:
            ordered[name] = spec
    for name, spec in _REGISTRY.items():
        ordered.setdefault(name, spec)
    _REGISTRY.clear()
    _REGISTRY.update(ordered)


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
