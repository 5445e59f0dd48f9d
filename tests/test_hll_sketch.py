"""agg_hll_sketch has no SQL oracle (sketch bytes are implementation-
specific); these tests pin the semantics instead: estimates within the
published HLL error envelope of exact COUNT(DISTINCT), and sketch merge
associativity (union of per-day sketches == one sketch over everything —
the property that makes the pattern work at 100 TB)."""

from pyspark.sql import functions as F

from datapipelines_python_spark.catalog import load_table
from datapipelines_python_spark.registry import get_registry

SF = "/root/testdata/sf0.01"


def test_hll_estimate_within_tolerance(spark):
    got = {
        r["event_type"]: r["approx_users"]
        for r in get_registry()["agg_hll_sketch"].fn(spark, SF).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for et, est in got.items():
        # lgK=12 -> ~1.6% relative standard error; 5% is > 3 sigma
        assert abs(est - exact[et]) <= max(2, 0.05 * exact[et]), (
            et,
            est,
            exact[et],
        )


def test_hll_merge_equals_whole(spark):
    e = load_table(spark, SF, "events")
    whole = e.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id"), F.lit(12))
        ).alias("est")
    ).collect()[0]["est"]
    merged = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg(F.col("user_id"), F.lit(12)).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    assert merged == whole
