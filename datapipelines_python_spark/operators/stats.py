"""Statistical-audit operators: distributional law checks, concentration
and dispersion indices, independence tests, and point-process statistics.

These extend SURVEY.md §2B.11's workload family with the fraud-audit /
data-profiling staples (Benford's law, Gini concentration, chi-square
independence, Fano-factor burstiness, inter-arrival latency). Every one
follows the repo's determinism conventions (`_helpers`): counts and ranks
stay integer, money stays decimal, the single final float expression is
identical IEEE on both engines, `round4` absorbs display rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from datapipelines_python_spark.catalog import load_table
from datapipelines_python_spark.operators._helpers import (
    davg,
    dsum,
    round4,
    sql_davg,
    sql_dsum,
    sql_round4,
)
from datapipelines_python_spark.registry import query


@query(
    "workload_benford",
    oracle=f"""
        WITH cents AS (
            SELECT CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
            FROM orders
        ),
        digits AS (
            SELECT CAST(SUBSTRING(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit
            FROM cents
        )
        SELECT digit,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               {sql_round4("CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM orders)")} AS share,
               {sql_round4("LOG10(1.0 + 1.0 / digit)")} AS benford_expected
        FROM digits
        GROUP BY digit
    """,
    tags=("workload", "stats", "audit"),
)
def workload_benford(spark: SparkSession, sf: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    fraud/data-fabrication screen. The leading digit is extracted through
    an integer path (price → half-up cents → BIGINT → string head) so
    both engines see the same digit even where float formatting differs;
    the observed share sits next to the Benford expectation
    log10(1 + 1/d). One 9-group aggregate: partial counts map-side, a
    9-row shuffle — at 100 TB this is a scan-bound single pass, and the
    tiny scalar subquery total comes from the same partial counts."""
    o = load_table(spark, sf, "orders")
    total = o.count()
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")
    return (
        o.select(
            F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .select(
            "digit",
            "n_orders",
            round4(F.col("n_orders").cast("double") / F.lit(float(total))).alias(
                "share"
            ),
            round4(F.log10(1.0 + 1.0 / F.col("digit"))).alias(
                "benford_expected"
            ),
        )
    )


@query(
    "workload_gini",
    oracle=f"""
        WITH rev AS (
            SELECT o_custkey,
                   SUM(CAST(o_totalprice AS DECIMAL(38,8))) AS r
            FROM orders GROUP BY o_custkey
        ),
        ranked AS (
            SELECT r, ROW_NUMBER() OVER (ORDER BY r, o_custkey) AS i FROM rev
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(r) AS tot,
                   SUM(i * r) AS weighted
            FROM ranked
        )
        SELECT n AS n_customers,
               CAST(CAST(tot AS VARCHAR) AS DOUBLE) AS total_rev,
               {sql_round4(
                   "(2.0 * CAST(CAST(weighted AS VARCHAR) AS DOUBLE)"
                   " - (n + 1.0) * CAST(CAST(tot AS VARCHAR) AS DOUBLE))"
                   " / (n * CAST(CAST(tot AS VARCHAR) AS DOUBLE))"
               )} AS gini
        FROM s
    """,
    tags=("workload", "stats"),
)
def workload_gini(spark: SparkSession, sf: str) -> DataFrame:
    """Gini coefficient of revenue concentration across customers —
    G = (2·Σ i·rᵢ − (n+1)·Σr) / (n·Σr) over revenues ranked ascending.
    Per-customer revenue is an exact decimal sum; rank·revenue products
    and their sums stay decimal-exact, so the coefficient is one float
    expression at the very end. The global rank is the one
    single-partition window (customer-cardinality input, already
    aggregated); at 100 TB it becomes a two-pass range-partitioned rank
    with broadcast per-partition offsets — the same evolution as
    `ml_auc_roc`."""
    o = load_table(spark, sf, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,8)")).alias("r")
    )
    ranked = rev.select(
        "r", F.row_number().over(W.orderBy("r", "o_custkey")).alias("i")
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").alias("tot"),
        F.sum(F.col("i") * F.col("r")).alias("weighted"),
    )
    tot_d = F.col("tot").cast("double")
    w_d = F.col("weighted").cast("double")
    n = F.col("n")
    return s.select(
        n.alias("n_customers"),
        tot_d.alias("total_rev"),
        round4((2.0 * w_d - (n + 1.0) * tot_d) / (n * tot_d)).alias("gini"),
    )


@query(
    "ml_chi2_independence",
    oracle=f"""
        WITH obs AS (
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
            FROM documents GROUP BY lang, source
        ),
        rows_ AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS rt FROM documents GROUP BY lang),
        cols_ AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ct FROM documents GROUP BY source),
        n_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        cells AS (
            SELECT r.lang, c.source, r.rt, c.ct,
                   COALESCE(o.o, 0) AS o, n_.n
            FROM rows_ r CROSS JOIN cols_ c CROSS JOIN n_
            LEFT JOIN obs o ON o.lang = r.lang AND o.source = c.source
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_docs,
               CAST((COUNT(DISTINCT lang) - 1) * (COUNT(DISTINCT source) - 1) AS BIGINT) AS dof,
               {sql_round4(
                   "SUM(POWER(o - CAST(rt AS DOUBLE) * ct / n, 2)"
                   " / (CAST(rt AS DOUBLE) * ct / n))"
               )} AS chi2
        FROM cells
    """,
    tags=("ml", "stats"),
)
def ml_chi2_independence(spark: SparkSession, sf: str) -> DataFrame:
    """Pearson chi-square test of independence between document language
    and source — the drift/stratification check run before trusting a
    corpus mix. Observed counts, row totals, and column totals are exact
    integers; zero-observed cells are restored by a dims-cross-join (they
    still carry expectation mass), and χ² = Σ(O−E)²/E is computed with E
    left as the rational rt·ct/n inside one IEEE expression. Everything
    after the first count aggregate is dimension-sized (5×20 cells), so
    at 100 TB the cost is one map-side-combined count; χ² sums over 100
    numbers on the driver-side plan."""
    d = load_table(spark, sf, "documents")
    obs = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    rows_ = d.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("rt"))
    cols_ = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("ct")
    )
    n_docs = d.count()
    cells = (
        rows_.crossJoin(cols_)
        .join(obs, ["lang", "source"], "left")
        .select(
            "lang",
            "source",
            "rt",
            "ct",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
        )
    )
    e = F.col("rt").cast("double") * F.col("ct") / F.lit(float(n_docs))
    return cells.agg(
        F.lit(n_docs).cast("bigint").alias("n_docs"),
        (
            (F.countDistinct("lang") - 1) * (F.countDistinct("source") - 1)
        ).cast("bigint").alias("dof"),
        round4(F.sum(F.pow(F.col("o") - e, F.lit(2.0)) / e)).alias("chi2"),
    )


@query(
    "workload_burstiness",
    oracle=f"""
        WITH bounds AS (
            SELECT DATE_TRUNC('hour', MIN(ts)) AS lo,
                   DATE_TRUNC('hour', MAX(ts)) AS hi
            FROM events
        ),
        grid AS (
            SELECT t.event_type, g.h
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN (
                SELECT UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 HOUR)) AS h
                FROM bounds
            ) g
        ),
        counts AS (
            SELECT event_type, DATE_TRUNC('hour', ts) AS h,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ),
        dense AS (
            SELECT g.event_type, COALESCE(c.x, 0) AS x
            FROM grid g LEFT JOIN counts c
              ON c.event_type = g.event_type AND c.h = g.h
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_hours,
               {sql_round4("CAST(SUM(x) AS DOUBLE) / COUNT(*)")} AS mean_per_hour,
               {sql_round4(
                   "CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DOUBLE)"
                   " / (CAST(COUNT(*) AS DOUBLE) * SUM(x))"
               )} AS fano
        FROM dense
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("workload", "stats", "timeseries"),
)
def workload_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    """Fano factor (variance-to-mean ratio of hourly arrival counts) per
    event type — the burstiness dial: ≈1 for a Poisson process, >1 for
    bursty traffic. The hour grid is densified over the observed span
    (zero hours carry variance!) exactly like `workload_gap_fill_calendar`
    — a generated sequence cross-joined with the 5 types, never a scan of
    missing data. Var/mean reduces to integers only:
    (n·Σx² − (Σx)²)/(n·Σx), one float division at the end. At 100 TB the
    hourly pre-aggregate is the only fact-sized shuffle; the grid join is
    calendar-sized."""
    e = load_table(spark, sf, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = (
        e.select("event_type")
        .distinct()
        .crossJoin(
            bounds.select(
                F.explode(
                    F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
                ).alias("h")
            )
        )
    )
    counts = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    dense = grid.join(counts, ["event_type", "h"], "left").select(
        "event_type", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )
    n = F.count(F.lit(1))
    sx = F.sum("x")
    sxx = F.sum(F.col("x") * F.col("x"))
    return (
        dense.groupBy("event_type")
        .agg(
            n.cast("bigint").alias("n_hours"),
            round4(sx.cast("double") / n).alias("mean_per_hour"),
            round4(
                (n * sxx - sx * sx).cast("double") / (n.cast("double") * sx)
            ).alias("fano"),
        )
        .orderBy("event_type")
    )


@query(
    "workload_interarrival",
    oracle=f"""
        WITH gaps AS (
            SELECT event_type,
                   EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id
                   ) AS gap_us
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
               {sql_round4("CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) / 1e6")} AS mean_gap_s,
               {sql_round4("QUANTILE_CONT(gap_us, 0.5) / 1e6")} AS p50_gap_s,
               {sql_round4("CAST(MAX(gap_us) AS DOUBLE) / 1e6")} AS max_gap_s
        FROM gaps
        GROUP BY event_type
    """,
    tags=("workload", "stats", "timeseries"),
)
def workload_interarrival(spark: SparkSession, sf: str) -> DataFrame:
    """Inter-arrival time distribution per event type — the point-process
    twin of `workload_latency_percentiles`: lag-differenced epoch
    microseconds (integers; ties broken by event_id so the gap sequence
    is partition-order invariant), then mean/median/max converted to
    seconds by one float division each. One shuffle on the 5-ary type key
    for both the window and the aggregate (Catalyst reuses the
    partitioning); at 100 TB the skew of a 5-value key is the real
    hazard — the evolution is a salted two-phase aggregate over
    pre-binned gaps (`agg_salted_two_phase`)."""
    e = load_table(spark, sf, "events")
    us = F.unix_micros(F.col("ts"))
    gap = (
        us
        - F.lag(us).over(
            W.partitionBy("event_type").orderBy("ts", "event_id")
        )
    ).alias("gap_us")
    gaps = e.select("event_type", gap)
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").cast("bigint").alias("n_gaps"),
        round4(
            F.sum("gap_us").cast("double") / F.count("gap_us") / 1e6
        ).alias("mean_gap_s"),
        round4(F.percentile("gap_us", F.lit(0.5)) / 1e6).alias("p50_gap_s"),
        round4(F.max("gap_us").cast("double") / 1e6).alias("max_gap_s"),
    )
