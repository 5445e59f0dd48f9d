"""Adaptive Query Execution pins (SURVEY.md §4.2): AQE is the 100 TB
safety net — runtime re-planning from TRUE sizes instead of stale
estimates. These tests pin the two behaviors the engine's scale story
leans on: runtime conversion of a shuffle join to broadcast once the
small side's real size is known, and post-shuffle partition coalescing so
a 32-partition config doesn't schedule 32 near-empty tasks at small SF.

The plans are inspected AFTER execution — AQE finalizes only when the
query runs.
"""

from __future__ import annotations

from contextlib import contextmanager

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


@contextmanager
def _conf(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        try:
            old[key] = spark.conf.get(key)
        except Exception:
            old[key] = None
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def _final_plan(df) -> str:
    df.collect()  # AQE final plan exists only after execution
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_converts_shuffle_join_to_broadcast_at_runtime(spark):
    # Static planning can't see through the selective filter (disable the
    # static broadcast threshold entirely); AQE must still discover the
    # filtered side is tiny at runtime and swap in a broadcast join.
    with _conf(
        spark,
        spark__sql__adaptive__enabled="true",
        spark__sql__autoBroadcastJoinThreshold="-1",
        spark__sql__adaptive__autoBroadcastJoinThreshold="10485760",
    ):
        o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").filter(
            F.col("c_custkey") < 20
        )
        plan = _final_plan(
            o.join(c, o["o_custkey"] == c["c_custkey"]).select(
                "o_orderkey", "c_custkey"
            )
        )
        assert "isFinalPlan=true" in plan
        assert "BroadcastHashJoin" in plan


def test_aqe_coalesces_post_shuffle_partitions(spark):
    # 8 configured shuffle partitions over a tiny aggregate: AQE's
    # coalesced shuffle read collapses them instead of running 8 tasks.
    with _conf(
        spark,
        spark__sql__adaptive__enabled="true",
        spark__sql__adaptive__coalescePartitions__enabled="true",
    ):
        e = spark.read.parquet(f"{SF_SMOKE}/region.parquet")
        df = e.groupBy("r_name").count()
        plan = _final_plan(df)
        assert "isFinalPlan=true" in plan
        assert "AQEShuffleRead coalesced" in plan
