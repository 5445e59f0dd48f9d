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


def test_aqe_splits_skewed_join_partition(spark):
    # The third AQE behavior the 100 TB story leans on: a hot join key
    # (here half of one side collapses onto key 0) produces one oversized
    # shuffle partition; with skewJoin enabled AQE splits it into
    # multiple tasks at runtime instead of letting one straggler carry
    # the join. Two preconditions this test documents because each
    # silently suppressed the split while writing it:
    #  - the skewed side needs MULTIPLE map tasks (16 here): a skewed
    #    reduce partition is split along mapper boundaries, so a
    #    single-file/single-mapper input has nothing to split;
    #  - nothing with a required distribution may sit between the
    #    shuffle and the join (a distinct/final-agg on a join input, or
    #    a groupBy on the join key above it, makes AQE decline the split
    #    to avoid introducing a new shuffle).
    # Thresholds are lowered so fixture-scale data walks the same code
    # path a hot customer/shingle would at 100 TB.
    with _conf(
        spark,
        spark__sql__adaptive__enabled="true",
        spark__sql__adaptive__skewJoin__enabled="true",
        spark__sql__adaptive__skewJoin__skewedPartitionFactor="2",
        spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes="16KB",
        spark__sql__adaptive__advisoryPartitionSizeInBytes="8KB",
        spark__sql__autoBroadcastJoinThreshold="-1",
        spark__sql__adaptive__autoBroadcastJoinThreshold="-1",
    ):
        skewed = spark.range(0, 60_000, 1, 16).select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            (F.col("id") * 1.0).alias("val"),
        )
        dim = spark.range(0, 60_000, 1, 4).select(F.col("id").alias("k"))
        df = skewed.join(dim, "k").agg(F.sum("val").alias("s"))
        plan = _final_plan(df)
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE skew split did not fire"
        assert "skewed" in plan  # the AQEShuffleRead marker
