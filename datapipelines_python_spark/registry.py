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
# spent that slice on scans/filters/joins; round 3 on the agg/window/setop/
# fn/UDF/LLM/streaming headliners + ANN twins (all green, CORRECTNESS_r03).
# Round 4 rotates in the next 50 ops with zero driver-green history — the
# full join long tail (asof/interval/skew/bucketed/fuzzy/correlated/geo),
# the advanced aggregate family, the remaining window surfaces, the ALL/
# DISTINCT set-op variants, and fn_try_safe (swapped in per ADVICE r3: its
# all-NULL DATE column drives the uncast-DATE path through the driver's
# hasher). After every module loads, _ensure_loaded reorders the registry
# so these names come first; everything else keeps its original
# registration order behind them. tests/test_registry.py pins the slice;
# scripts/next_rotation.py proposed it from CORRECTNESS_r*.json history.
DRIVER_SLICE: tuple[str, ...] = (
    # §2B.3 join long tail (22)
    "join_cross",
    "join_theta_range",
    "join_range_bucketed",
    "join_multi_key",
    "join_broadcast",
    "join_self",
    "join_asof",
    "join_interval",
    "join_skew_salted",
    "join_bucketed_colocated",
    "join_lateral_topk",
    "join_null_safe_eq",
    "join_asof_nearest",
    "join_asof_tolerance",
    "join_fuzzy_blocked",
    "join_null_aware_anti",
    "join_correlated_scalar",
    "join_tuple_in_subquery",
    "sql_hint_merge_join",
    "join_star_denormalize",
    "join_exists_correlated",
    "join_geo_bucketed",
    # §2B.4 advanced aggregates (17)
    "agg_bool_bitwise",
    "agg_salted_two_phase",
    "agg_multi_distinct",
    "agg_histogram",
    "agg_mode",
    "agg_string_agg",
    "agg_moments",
    "agg_weighted_avg",
    "agg_bitmap_distinct",
    "agg_filter_clause",
    "agg_corr_matrix",
    "agg_percentile_family",
    "agg_geometric_mean",
    "agg_grouping_id",
    "agg_regr_builtins",
    "agg_listagg_builtin",
    "agg_bitmap_algebra",
    # §2B.5 window long tail (8)
    "win_sessionize_batch",
    "win_range_interval",
    "win_running_distinct",
    "win_share_of_total",
    "win_following_frame",
    "win_nth_value",
    "win_forward_fill",
    "win_rank_fractions",
    # §2B.6 set-op variants (2)
    "setop_except_distinct",
    "setop_intersect_all",
    # ADVICE r3 (medium): all-NULL DATE column through the driver hasher
    "fn_try_safe",
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
