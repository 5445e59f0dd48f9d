"""One-off probe: drain stream_join_then_window and print per-batch
durationMs breakdown from the StreamingQuery progress events (guide §1:
measure where the time goes before touching anything)."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipelines_python_spark import get_registry, get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OP = sys.argv[2] if len(sys.argv) > 2 else "stream_join_then_window"

spark = get_spark(app_name="probe_stream")

# Re-implement the drain inline so we keep the query handle.
from datapipelines_python_spark.streaming import ops as S

fn_src = {
    "stream_join_then_window": S.stream_join_then_window,
    "stream_tumbling_agg": S.stream_tumbling_agg,
}

# monkeypatch drain_to_memory to capture the query object
captured = {}
orig = S.drain_to_memory


def capturing_drain(df, name, output_mode="append", sf=None):
    spark_ = df.sparkSession
    spark_.catalog.dropTempView(name)
    with S._state_sized(spark_, sf):
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        captured["q"] = q
    return spark_.table(name)


S.drain_to_memory = capturing_drain
try:
    t0 = time.perf_counter()
    df = fn_src[OP](spark, SF)
    n = df.count()
    wall = time.perf_counter() - t0
finally:
    S.drain_to_memory = orig

print(f"\n=== {OP} wall={wall:.2f}s rows={n}")
q = captured.get("q")
if q is None:
    raise SystemExit(
        f"{OP} never reached drain_to_memory — no query handle captured"
    )
tot = {}
for p in q.recentProgress:
    d = p["durationMs"]
    print(
        "batch", p["batchId"], {k: d.get(k) for k in sorted(d)},
        "rows", p["numInputRows"],
    )
    for k, v in d.items():
        tot[k] = tot.get(k, 0) + v
    for so in p.get("stateOperators", []):
        print(
            "   state:", so.get("operatorName"),
            "commitMs", so.get("commitTimeMs"),
            "rowsUpdated", so.get("numRowsUpdated"),
            "shufflePartitions", so.get("numShufflePartitions"),
        )
print("TOTAL durationMs:", json.dumps(tot, indent=None, sort_keys=True))
