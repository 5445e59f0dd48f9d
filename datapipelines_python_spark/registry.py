"""Operator registry: name -> (Spark callable, DuckDB oracle SQL).

Every operator from SURVEY.md §2B registers here via the ``@query``
decorator; ``__spark_entry__.py`` exposes the registry to the driver's
correctness harness. Keeping the Spark plan and its oracle SQL side by side
in one decorator is the discipline that makes the hash check pass: aliases,
casts, and rounding are written once, together.
"""

from __future__ import annotations

import importlib
import sys
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Driver-slice rotation (VERDICT r2 "Next round" #1): the driver's
# CORRECTNESS check covers the FIRST 50 registered names only. Rounds 1–2
# spent that slice on scans/filters/joins; round 3 on the agg/window/setop/
# fn/UDF/LLM/streaming headliners + ANN twins; round 4 on the join/agg/
# window long tail; round 5 on 16 family digests + the §2B base/streaming
# long tail (42/50 green — the 8 non-green adjudicated in VERDICT r5).
# Round 6 spent the slice on the 17 digests + the 3 fixed r5 reds + the 5
# rewritten sketch aggregates + 7 ANN twins + 18 double-bearing fills
# (50/50 green, CORRECTNESS_r06.json). Round 7 kept the 17 digests + 33
# digest-only rotations (50/50 green, CORRECTNESS_r07.json). Round 8
# (VERDICT r7 "Next round" #2): the digest lane is COMPRESSED 17 → 8 —
# coarser family pools (llm+mm, workload+tpch, ml, fn+graph+sql+misc,
# stream) with 70-member chunks, regenerated over the post-r7 evidence gap
# (405 members: the 243 individually-green ops left the membership) — and
# the 9 freed slots widen the individual-rotation lane to 42 fresh
# never-individually-checked ops, round-robin across family prefixes in
# registry order. After every module loads, _ensure_loaded reorders the
# registry so these names come first; everything else keeps its original
# registration order behind them. tests/test_registry.py pins the slice.
DRIVER_SLICE: tuple[str, ...] = (
    # family digests — 405 ops value-certified in 8 rows, every round
    "digest_fx",
    "digest_llm_1",
    "digest_llm_2",
    "digest_ml_1",
    "digest_ml_2",
    "digest_stream",
    "digest_wl_1",
    "digest_wl_2",
    # Round 11 rotation (VERDICT r10 #7): 14 slots go to the round-10/11
    # TOUCHED ops so each carries an individual raw-double hash row on
    # exactly the code this round changed (several were last individually
    # checked rounds ago); the remaining 28 are the next
    # never-individually-checked ops in round-robin family order
    # (scripts/next_rotation.py — llm_rouge_pairs and llm_dedup_clusters
    # from that list are themselves r10/r11-touched).
    "agg_groupby",
    "agg_percentile_family",
    "join_fuzzy_blocked",
    "ml_kmeans_lloyd",
    "udf_grouped_map",
    "udaf_pandas_window",
    "workload_basket_affinity",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q9_product_type_profit",
    "tpch_q18_large_volume_customer",
    "workload_item_item_cf",
    "workload_frequent_triples",
    "sink_python_datasource",
    # never-individually-checked tail (next_rotation.py order)
    "fn_date_extra",
    "llm_embed_dim_audit",
    "ml_markov_stationary",
    "workload_forecast_seasonal",
    "fn_try_overflow",
    "llm_position_kl",
    "ml_mutual_info",
    "workload_queue_depth",
    "fn_sequence_zip",
    "llm_domain_shift_bits",
    "ml_calibration_bins",
    "workload_new_vs_returning",
    "fn_mask",
    "llm_jsd_lang_pair",
    "ml_kaplan_meier",
    "workload_peak_detection",
    "fn_timestamp_parse",
    "llm_corpus_health",
    "ml_psi_drift",
    "workload_path_3step",
    "fn_row_fingerprint",
    "llm_rouge_pairs",
    "ml_shapley_closed_form",
    "workload_funnel_conversion_time",
    "fn_to_json",
    "llm_keyword_rake",
    "ml_precision_recall",
    "llm_dedup_clusters",
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
    # digests compose the registered specs of every other module, so they
    # must load LAST (operators/digests.py reads _REGISTRY at import)
    "datapipelines_python_spark.operators.digests",
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
    #
    # In-flight-module trap (round 7): `streaming.ops` lives OUTSIDE the
    # operators package but imports helpers from inside it, so a DIRECT
    # `import datapipelines_python_spark.streaming.ops` triggers this
    # eager load while that module is still mid-body — the loop's own
    # import of it returns the partial sys.modules entry (none of its ops
    # registered yet) and `digests`, which composes over the COMPLETE
    # registry at import, blows up on the missing members. Detect any
    # in-flight canonical module (its importlib spec still has
    # `_initializing` set), skip `digests` for this pass, and leave
    # _LOADED False so the next get_registry() — necessarily called after
    # every import has finished — re-runs the loop (no-op re-imports),
    # loads digests over the now-complete registry, and rotates the slice.
    _LOADED = True
    in_flight = [
        m
        for m in _OPERATOR_MODULES
        if (mm := sys.modules.get(m)) is not None
        and getattr(getattr(mm, "__spec__", None), "_initializing", False)
    ]
    try:
        for mod in _OPERATOR_MODULES:
            if in_flight and mod.rsplit(".", 1)[-1] == "digests":
                continue
            importlib.import_module(mod)
    except BaseException:
        _LOADED = False
        raise
    if in_flight:
        # Partial pass: digests skipped, the in-flight module's later ops
        # not yet registered. Warn so a caller that snapshots the registry
        # during this window (e.g. module-level code in the directly-
        # imported module) is detectable instead of silently incomplete
        # (ADVICE r7 #2); the next get_registry() after imports settle
        # re-runs the loop and completes the registry.
        import warnings

        warnings.warn(
            "get_registry(): returning a PARTIAL registry — module(s) "
            f"{[m.rsplit('.', 1)[-1] for m in in_flight]} are mid-import, "
            "digests skipped; re-call after imports finish for the full set",
            RuntimeWarning,
            stacklevel=3,
        )
        _LOADED = False
        return
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
