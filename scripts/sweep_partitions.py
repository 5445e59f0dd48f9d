"""Partition-count invariance sweep (VERDICT r2 "Next round" #7).

Result correctness at 100 TB requires that answers do not depend on the
physical partitioning — a query whose output drifts with
``spark.sql.shuffle.partitions`` would silently produce different numbers
on a 1000-executor cluster than it does in CI. This harness executes every
registered batch operator at a given scale factor under several
``spark.sql.shuffle.partitions`` settings (the conf is runtime-mutable, so
one session sweeps all of them) and compares, per operator and setting:

- row count, and
- an order-insensitive content hash: ``sum(CAST(xxhash64(all columns) AS
  decimal(38,0)))`` — commutative/associative so row order and partition
  merge order cannot affect it, decimal-width so it cannot overflow, and
  (unlike a bit_xor fold) duplicate-sensitive: identical rows do NOT
  cancel pairwise, so only the exact multiset of rows fingerprints equal.

Between settings every cache is dropped (``spark.catalog.clearCache()``
plus the module-level kNN/ANN edge-table dict caches), so each sweep
recomputes from parquet under the new partitioning — nothing is reused.

Streaming ops run via Trigger.AvailableNow inside their definitions and
participate like any other op. Ops are executed with the same ``@query``
canonicalization the driver sees.

Usage:
    python scripts/sweep_partitions.py [--sf /root/testdata/sf0.1]
        [--partitions 8,32,200] [--only a,b] [--out SWEEP.json]

Exit code 1 if any operator's (count, hash) differs across settings.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipelines_python_spark import get_registry, get_spark


def clear_all_caches(spark) -> None:
    from datapipelines_python_spark.operators import workloads as w

    for cache in (w._COSINE_PAIRS_CACHE, w._ANN_EDGE_CACHE, w._MUTUAL_5NN_CACHE):
        for df in cache.values():
            try:
                df.unpersist()
            except Exception:
                pass
        cache.clear()
    spark.catalog.clearCache()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--partitions", default="8,32,200")
    ap.add_argument("--only", default="")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    settings = [int(x) for x in args.partitions.split(",")]
    spark = get_spark(app_name="partition-sweep")
    registry = get_registry()
    names = [n.strip() for n in args.only.split(",") if n.strip()] or list(registry)
    unknown = [n for n in names if n not in registry]
    if unknown:  # fail loud: a typo'd --only must never report a false green
        print(f"unknown operators: {unknown}", file=sys.stderr)
        return 1

    from pyspark.sql import functions as F

    def fingerprint(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")
            ).alias("h"),
        ).first()
        return int(row["n"]), (int(row["h"]) if row["h"] is not None else None)

    results: dict[str, dict[int, tuple[int, int | None]]] = {}
    op_times: dict[str, dict[int, float]] = {}
    errors: dict[str, str] = {}
    walls: dict[int, float] = {}
    for p in settings:
        spark.conf.set("spark.sql.shuffle.partitions", str(p))
        clear_all_caches(spark)
        t0 = time.time()
        for name in names:
            spec = registry.get(name)
            if spec is None:
                continue
            try:
                t_op = time.time()
                n, h = fingerprint(spec.fn(spark, args.sf))
                op_times.setdefault(name, {})[p] = round(time.time() - t_op, 2)
                # rows-only ops (oracle=None: sketch estimates whose VALUES
                # are legitimately merge-order-dependent, e.g. KLL
                # compaction) are held to count-invariance only — the same
                # weaker contract the driver applies to them
                results.setdefault(name, {})[p] = (
                    (n, None) if spec.oracle is None else (n, h)
                )
            except Exception as e:  # noqa: BLE001 - report, don't abort sweep
                errors[f"{name}@{p}"] = f"{type(e).__name__}: {e}"[:300]
        walls[p] = round(time.time() - t0, 1)
        print(f"== shuffle.partitions={p}: {len(names)} ops in {walls[p]}s", flush=True)

    divergent = {
        name: {str(p): fp for p, fp in fps.items()}
        for name, fps in results.items()
        if len({fp for fp in fps.values()}) > 1
    }
    report = {
        "sf": args.sf,
        "partitions": settings,
        "n_ops": len(results),
        "wall_s": walls,
        "divergent": divergent,
        "errors": errors,
        "op_times": {k: {str(p): t for p, t in v.items()} for k, v in op_times.items()},
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1, default=str)
    print(
        json.dumps(
            {k: report[k] for k in ("sf", "partitions", "n_ops", "wall_s")},
            default=str,
        )
    )
    if divergent:
        print(f"DIVERGENT ({len(divergent)}):")
        for name, fps in divergent.items():
            print(f"  {name}: {fps}")
    if errors:
        print(f"ERRORS ({len(errors)}):")
        for k, v in errors.items():
            print(f"  {k}: {v}")
    print("PARTITION-INVARIANT" if not divergent and not errors else "SWEEP NOT CLEAN")
    return 1 if (divergent or errors) else 0


if __name__ == "__main__":
    sys.exit(main())
