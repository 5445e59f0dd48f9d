"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each bench-flagged operator from the registry is executed to completion
(count-sink — forces the full plan, no driver materialization of rows) after
one warm-up of the flagship to amortize JVM/session startup. Per-query times
are wall-clock seconds for the *second* (warm) run; `value` is their sum.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datapipelines_python_spark import get_registry
from datapipelines_python_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench")

    registry = get_registry()
    bench_ops = {n: s for n, s in registry.items() if s.bench}
    if not bench_ops:  # safety net: never emit an empty bench
        bench_ops = {"agg_groupby": registry["agg_groupby"]}

    # Warm-up: JVM JIT, parquet footer cache, Python worker pool.
    next(iter(bench_ops.values())).fn(spark, sf_dir).count()

    times: dict[str, float] = {}
    for name, spec in bench_ops.items():
        spec.fn(spark, sf_dir).count()  # warm: codegen/JIT for THIS plan
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).count()
        times[name] = round(time.perf_counter() - t0, 3)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_num: float | str = float(sf)
    except ValueError:
        sf_num = sf
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf_num,
            }
        )
    )


if __name__ == "__main__":
    main()
