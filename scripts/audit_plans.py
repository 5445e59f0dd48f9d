"""Registry-wide physical-plan audit.

tests/test_plan_quality.py pins ~60 hand-picked plans; this walks ALL
registered batch operators, builds each DataFrame at a small SF (plans
only — nothing is executed), and tallies the physical operators that
matter at 100 TB:

- `Exchange` count (shuffle budget),
- join strategy mix (BroadcastHash / SortMerge / ShuffledHash),
- `CartesianProduct` and *conditional* BroadcastNestedLoopJoin — the two
  shapes that explode at scale (unconditioned BNLJ-Cross is the
  sanctioned broadcast-scalar assembly pattern and is counted
  separately),
- Python-eval nodes (`BatchEvalPython` row-at-a-time vs Arrow-batched
  `ArrowEvalPython` / `MapInPandas` / `FlatMapGroupsInPandas` …),
- `WholeStageCodegen` span count.

Writes PLAN_AUDIT.json; tests/test_plan_audit.py pins the repo-wide
invariants against the same walk so the artifact can't go stale silently.

Note on checkpointed loops: ``localCheckpoint`` — even with
``eager=False`` — replaces the logical plan with a LogicalRDD scan
immediately (only the materialization job is deferred), so ops like
``graph_kcore`` are audited at their truncated post-checkpoint shape,
matching what executes.

Usage: python scripts/audit_plans.py [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipelines_python_spark import get_registry, get_spark

# ops whose *point* is the flagged shape: physical cartesian, and the
# row-at-a-time Python UDF surface (each has Arrow-batched siblings)
CARTESIAN_OK = {"join_cross"}
ROW_PYTHON_OK = {"udf_python_scalar", "sql_scalar_udf"}

_COUNTERS = {
    # every shuffle exchange prints "Exchange <Partitioning>" (hash, range,
    # SinglePartition, RoundRobinPartitioning from repartition(n)/REBALANCE);
    # BroadcastExchange is one word, so \b excludes it
    "exchange": re.compile(r"\bExchange \w+"),
    "bhj": re.compile(r"\bBroadcastHashJoin\b"),
    "smj": re.compile(r"\bSortMergeJoin\b"),
    "shj": re.compile(r"\bShuffledHashJoin\b"),
    "cartesian": re.compile(r"\bCartesianProduct\b"),
    "bnlj_cross": re.compile(r"BroadcastNestedLoopJoin Build(Left|Right), Cross(?!,)"),
    "bnlj_cond": re.compile(
        r"BroadcastNestedLoopJoin Build(?:Left|Right), (?!Cross)\w+|"
        r"BroadcastNestedLoopJoin Build(?:Left|Right), Cross, "
    ),
    "window": re.compile(r"\bWindow(Exec)?\b \["),
    "window_group_limit": re.compile(r"\bWindowGroupLimit\b"),
    "batch_eval_python": re.compile(r"\bBatchEvalPython\b"),
    "arrow_eval_python": re.compile(r"\bArrowEvalPython\b"),
    "pandas_map": re.compile(
        r"\b(MapInPandas|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas|"
        r"AggregateInPandas|WindowInPandas|MapInArrow|PythonMapInArrow)\b"
    ),
    "codegen": re.compile(r"\*\(\d+\)"),
}


def audit(spark, sf: str, only=None) -> dict:
    # Digest ops with the threaded executor eagerly run + collect all ~70
    # member jobs inside spec.fn and return a LocalRelation — a plan-only
    # audit would both pay full execution and record ~zero exchanges for
    # them. Force the lazy-union path (value-identical; read per call by
    # operators/digests._digest_threads) so digests are audited at their
    # real 70-way union shape, for free (ADVICE r9).
    os.environ["SPARK_GRAFT_DIGEST_THREADS"] = "1"
    reg = get_registry()
    if only:
        unknown = set(only) - set(reg)
        if unknown:  # a typo'd --only must not exit 0 on zero ops audited
            raise SystemExit(f"unknown operator name(s) in --only: {sorted(unknown)}")
    out, errors = {}, {}
    for name, spec in reg.items():
        if only and name not in only:
            continue
        try:
            df = spec.fn(spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # streaming writers etc. surface here
            errors[name] = f"{type(e).__name__}: {e}"[:200]
            continue
        counts = {k: len(rx.findall(plan)) for k, rx in _COUNTERS.items()}
        counts["codegen"] = len(set(_COUNTERS["codegen"].findall(plan)))
        out[name] = counts
    return {"sf": sf, "n_ops": len(out), "ops": out, "errors": errors}


def build_summary(ops: dict) -> dict:
    """Registry-wide rollup of the per-op counters. The *_op_names lists
    exist so an auditor can `jq .summary.row_python_op_names` straight to
    the offending ops instead of reverse-engineering which per-op counter
    fed each count (VERDICT r8 #5); tests/test_plan_audit.py asserts each
    count equals the length of its name list, derived from the same ops."""
    return {
        "total_exchanges": sum(c["exchange"] for c in ops.values()),
        "max_exchanges": max(
            ((c["exchange"], n) for n, c in ops.items()), default=(0, "")),
        "join_mix": {
            k: sum(c[k] for c in ops.values()) for k in ("bhj", "smj", "shj")
        },
        "bnlj_cross_scalar_assembly": sum(c["bnlj_cross"] for c in ops.values()),
        "arrow_python_ops": sum(
            1 for c in ops.values() if c["arrow_eval_python"] or c["pandas_map"]),
        "row_python_ops": sum(1 for c in ops.values() if c["batch_eval_python"]),
        "row_python_op_names": sorted(
            n for n, c in ops.items() if c["batch_eval_python"]),
        "arrow_python_op_names": sorted(
            n for n, c in ops.items()
            if c["arrow_eval_python"] or c["pandas_map"]),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLAN_AUDIT.json"))
    args = ap.parse_args()

    spark = get_spark(app_name="plan-audit")
    res = audit(spark, args.sf, set(args.only.split(",")) if args.only else None)

    ops = res["ops"]
    bad_cart = [n for n, c in ops.items() if c["cartesian"] and n not in CARTESIAN_OK]
    bad_py = [
        n for n, c in ops.items()
        if c["batch_eval_python"] and n not in ROW_PYTHON_OK
    ]
    res["violations"] = {"cartesian": bad_cart, "row_python": bad_py}
    # Conditional BNLJ is legal ONLY against a bounded broadcast side
    # (scalar-subquery compares, generated calendars, sampled dims, query
    # sets, K·n edge tables). Boundedness isn't statically checkable, so
    # the audit *names* the set and tests/test_plan_audit.py pins it — a
    # new op acquiring a theta-BNLJ fails until reviewed + allowlisted.
    res["theta_bnlj_ops"] = sorted(n for n, c in ops.items() if c["bnlj_cond"])
    res["summary"] = build_summary(ops)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)
    print(json.dumps({k: res[k] for k in ("n_ops", "violations", "summary")},
                     default=str))
    print(f"wrote {args.out}")
    return 1 if any(res["violations"].values()) else 0


if __name__ == "__main__":
    raise SystemExit(main())
