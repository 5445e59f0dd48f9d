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


def test_kll_quantiles_within_rank_tolerance(spark):
    rows = get_registry()["agg_kll_sketch"].fn(spark, SF).collect()
    e = load_table(spark, SF, "events")
    for r in rows:
        if r["event_type"] == "ALL":
            vals = e
        else:
            vals = e.filter(F.col("event_type") == r["event_type"])
        # k=200 -> ~1.3% rank error (3 sigma ~ 2%); check the VALUE at
        # quantile q matches the exact value at q +- 3% rank
        for est, q in ((r["p50_est"], 0.5), (r["p95_est"], 0.95)):
            lo, hi = vals.agg(
                F.percentile("value", F.lit(max(0.0, q - 0.03))).alias("lo"),
                F.percentile("value", F.lit(min(1.0, q + 0.03))).alias("hi"),
            ).collect()[0]
            assert lo - 1e-9 <= est <= hi + 1e-9, (r["event_type"], q, est, lo, hi)


def test_theta_overlap_obeys_set_algebra(spark):
    row = get_registry()["agg_theta_sketch"].fn(spark, SF).collect()[0]
    e = load_table(spark, SF, "events")
    exact_p = e.filter(F.col("event_type") == "purchase").select("user_id").distinct().count()
    exact_c = e.filter(F.col("event_type") == "click").select("user_id").distinct().count()
    exact_u = (
        e.filter(F.col("event_type").isin("purchase", "click"))
        .select("user_id").distinct().count()
    )
    exact_i = exact_p + exact_c - exact_u
    for est, exact in (
        (row["purchasers_est"], exact_p),
        (row["clickers_est"], exact_c),
        (row["union_est"], exact_u),
        (row["overlap_est"], exact_i),
    ):
        assert abs(est - exact) <= max(2, 0.05 * exact), (est, exact)
    # inclusion-exclusion must hold approximately among the estimates too
    assert abs(
        (row["purchasers_est"] + row["clickers_est"] - row["union_est"])
        - row["overlap_est"]
    ) <= max(2, 0.05 * row["union_est"])
