"""Observation API: pipeline health metrics collected DURING a query run
(no second pass over the data) — the production pattern for row-count /
null-rate / domain checks on a 100 TB job where re-scanning for metrics
would double the bill. `df.observe()` attaches aggregate expressions to a
point in the plan; results surface after the action completes.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from datapipelines_python_spark.catalog import load_table
from tests.conftest import SF_SMOKE


def test_observe_collects_inflight_metrics(spark):
    obs = Observation("ingest_health")
    li = load_table(spark, SF_SMOKE, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0)).alias(
            "null_qty"
        ),
        F.max("l_quantity").alias("max_qty"),
    )
    out = li.filter(F.col("l_quantity") > 30).groupBy("l_returnflag").count()
    result = {r["l_returnflag"]: r["count"] for r in out.collect()}

    # observation saw the PRE-filter stream: full row count, domain bounds
    metrics = obs.get
    assert metrics["rows_seen"] == li.count()
    assert metrics["null_qty"] == 0
    assert metrics["max_qty"] <= 50.0  # TPC-H quantity domain
    assert sum(result.values()) < metrics["rows_seen"]  # filter did filter


def test_observe_on_written_output(spark, tmp_path):
    # the write-side twin: count what was actually persisted, in-flight
    obs = Observation("sink_count")
    df = load_table(spark, SF_SMOKE, "region").observe(
        obs, F.count(F.lit(1)).alias("rows_written")
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "region_out"))
    assert obs.get["rows_written"] == 5
