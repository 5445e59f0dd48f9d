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
    """The op emits the tolerance DECISION (merged sketch within
    5%·exact + 1); assert every flag fired and the exact side matches an
    independent COUNT(DISTINCT)."""
    rows = get_registry()["agg_hll_sketch"].fn(spark, SF).collect()
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r["event_type"] for r in rows} == set(exact)
    for r in rows:
        assert r["merged_within_5pct"] == 1, r
        assert r["n_users_exact"] == exact[r["event_type"]], r


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
    """Op-level rank flags must all fire (per type AND the merged 'ALL'
    row), and an independent raw KLL sketch must land its p50/p95 inside
    the exact q ± 3%-rank value band — the flag logic and the sketch are
    checked separately so a broken flag can't certify itself."""
    rows = get_registry()["agg_kll_sketch"].fn(spark, SF).collect()
    assert {r["event_type"] for r in rows} >= {"ALL"}
    for r in rows:
        assert r["ok_p50"] == 1 and r["ok_p95"] == 1, r

    e = load_table(spark, SF, "events")
    est = e.agg(
        F.kll_sketch_get_quantile_double(
            F.kll_sketch_agg_double(F.col("value"), F.lit(200)),
            F.array(F.lit(0.5), F.lit(0.95)),
        ).alias("q")
    ).collect()[0]["q"]
    for est_v, q in ((est[0], 0.5), (est[1], 0.95)):
        lo, hi = e.agg(
            F.percentile("value", F.lit(max(0.0, q - 0.03))).alias("lo"),
            F.percentile("value", F.lit(min(1.0, q + 0.03))).alias("hi"),
        ).collect()[0]
        assert lo - 1e-9 <= est_v <= hi + 1e-9, (q, est_v, lo, hi)


def test_theta_overlap_obeys_set_algebra(spark):
    """All four tolerance flags must fire, the emitted exact counts must
    match independent distinct counts, and the raw theta estimates
    (recomputed here, independent of the op's flag logic) must obey
    inclusion-exclusion within tolerance."""
    row = get_registry()["agg_theta_sketch"].fn(spark, SF).collect()[0]
    e = load_table(spark, SF, "events")
    exact_p = e.filter(F.col("event_type") == "purchase").select("user_id").distinct().count()
    exact_c = e.filter(F.col("event_type") == "click").select("user_id").distinct().count()
    exact_u = (
        e.filter(F.col("event_type").isin("purchase", "click"))
        .select("user_id").distinct().count()
    )
    assert row["purchasers_exact"] == exact_p
    assert row["clickers_exact"] == exact_c
    assert row["union_exact"] == exact_u
    for flag in ("purchasers_ok", "clickers_ok", "union_ok", "overlap_ok"):
        assert row[flag] == 1, (flag, row)

    est = e.agg(
        F.theta_sketch_estimate(
            F.theta_sketch_agg(
                F.when(F.col("event_type") == "purchase", F.col("user_id"))
            )
        ).alias("p"),
        F.theta_sketch_estimate(
            F.theta_sketch_agg(
                F.when(F.col("event_type") == "click", F.col("user_id"))
            )
        ).alias("c"),
        F.theta_sketch_estimate(
            F.theta_union(
                F.theta_sketch_agg(
                    F.when(F.col("event_type") == "purchase", F.col("user_id"))
                ),
                F.theta_sketch_agg(
                    F.when(F.col("event_type") == "click", F.col("user_id"))
                ),
            )
        ).alias("u"),
        F.theta_sketch_estimate(
            F.theta_intersection(
                F.theta_sketch_agg(
                    F.when(F.col("event_type") == "purchase", F.col("user_id"))
                ),
                F.theta_sketch_agg(
                    F.when(F.col("event_type") == "click", F.col("user_id"))
                ),
            )
        ).alias("i"),
    ).collect()[0]
    assert abs((est["p"] + est["c"] - est["u"]) - est["i"]) <= max(
        2, 0.05 * est["u"]
    )
