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
    DEC,
    davg,
    dsum,
    round4,
    spread,
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
        -- scalar-subquery n, not MAX(n) over cells: on an empty corpus the
        -- cells frame is empty and MAX would be NULL, but n_docs is 0
        SELECT CAST((SELECT n FROM n_) AS BIGINT) AS n_docs,
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


@query(
    "workload_autocorr",
    oracle=f"""
        WITH bounds AS (
            SELECT DATE_TRUNC('day', MIN(o_orderdate)) AS lo,
                   DATE_TRUNC('day', MAX(o_orderdate)) AS hi
            FROM orders
        ),
        cal AS (
            SELECT UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 DAY)) AS d
            FROM bounds
        ),
        rev AS (
            SELECT DATE_TRUNC('day', o_orderdate) AS d,
                   SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS x
            FROM orders GROUP BY 1
        ),
        dense AS (
            SELECT cal.d, CAST(COALESCE(rev.x, 0) AS HUGEINT) AS x
            FROM cal LEFT JOIN rev ON rev.d = cal.d
        ),
        ser AS (
            SELECT x,
                   LAG(x, 1) OVER (ORDER BY d) AS x1,
                   LAG(x, 7) OVER (ORDER BY d) AS x7
            FROM dense
        ),
        s1 AS (
            SELECT 1 AS lag, COUNT(*) AS n, SUM(x1) AS sx, SUM(x) AS sy,
                   SUM(x1 * x) AS sxy, SUM(x1 * x1) AS sxx, SUM(x * x) AS syy
            FROM ser WHERE x1 IS NOT NULL
        ),
        s7 AS (
            SELECT 7 AS lag, COUNT(*) AS n, SUM(x7) AS sx, SUM(x) AS sy,
                   SUM(x7 * x) AS sxy, SUM(x7 * x7) AS sxx, SUM(x * x) AS syy
            FROM ser WHERE x7 IS NOT NULL
        ),
        u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s7)
        SELECT lag, CAST(n AS BIGINT) AS n_pairs,
               {sql_round4(
                   "CAST(n * sxy - sx * sy AS DOUBLE)"
                   " / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)"
                   "        * CAST(n * syy - sy * sy AS DOUBLE))"
               )} AS acf
        FROM u
        ORDER BY lag
    """,
    tags=("workload", "stats", "timeseries"),
)
def workload_autocorr(spark: SparkSession, sf: str) -> DataFrame:
    """Lag-1 and lag-7 autocorrelation of the daily-revenue series — the
    momentum/weekly-seasonality dial behind `workload_forecast_seasonal`'s
    lag-7 model choice. Revenue is integer cents summed per calendar-
    densified day (absent days are real zeros, as in
    `workload_burstiness`); both lag columns come from ONE window sort;
    and the Pearson form n·Σxy−Σx·Σy keeps every sum an exact integer —
    Spark carries them as decimal(38,0), the oracle as HUGEINT — so the
    one sqrt-and-divide at the end sees identical operands. The global
    day-ordered window runs on a day-cardinality frame (thousands of
    rows regardless of fact size); the fact-sized work is only the
    map-side-combined daily pre-aggregate."""
    o = load_table(spark, sf, "orders")
    day = F.date_trunc("day", F.col("o_orderdate"))
    rev = o.groupBy(day.alias("d")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")
        ).alias("x")
    )
    bounds = o.agg(
        F.date_trunc("day", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("day", F.max("o_orderdate")).alias("hi"),
    )
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    dense = cal.join(rev, "d", "left").select(
        "d", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )
    w = W.orderBy("d")
    ser = dense.select(
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 7).over(w).alias("x7"),
    )

    def acf_at(lagcol: str, k: int) -> DataFrame:
        dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
        s = ser.filter(F.col(lagcol).isNotNull()).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec(lagcol)).alias("sx"),
            F.sum(dec("x")).alias("sy"),
            F.sum(dec(lagcol) * dec("x")).alias("sxy"),
            F.sum(dec(lagcol) * dec(lagcol)).alias("sxx"),
            F.sum(dec("x") * dec("x")).alias("syy"),
        )
        n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
        sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
        return s.select(
            F.lit(k).alias("lag"),
            n.cast("bigint").alias("n_pairs"),
            round4(
                (n * sxy - sx * sy).cast("double")
                / F.sqrt(
                    (n * sxx - sx * sx).cast("double")
                    * (n * syy - sy * sy).cast("double")
                )
            ).alias("acf"),
        )

    return acf_at("x1", 1).unionByName(acf_at("x7", 7)).orderBy("lag")


@query(
    "workload_cusum",
    oracle="""
        WITH bounds AS (
            SELECT DATE_TRUNC('day', MIN(o_orderdate)) AS lo,
                   DATE_TRUNC('day', MAX(o_orderdate)) AS hi
            FROM orders
        ),
        cal AS (
            SELECT UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 DAY)) AS d
            FROM bounds
        ),
        cnt AS (
            SELECT DATE_TRUNC('day', o_orderdate) AS d,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM orders GROUP BY 1
        ),
        dense AS (
            SELECT cal.d, COALESCE(cnt.x, 0) AS x
            FROM cal LEFT JOIN cnt ON cnt.d = cal.d
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(x) AS BIGINT) AS total
            FROM dense
        ),
        pre AS (
            SELECT d, x,
                   SUM(n_days * x - total) OVER (
                       ORDER BY d ROWS UNBOUNDED PRECEDING
                   ) AS r
            FROM dense, tot
        ),
        refl AS (
            SELECT d, x, r,
                   LEAST(0, MIN(r) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING))
                       AS floor_r
            FROM pre
        )
        SELECT d, x,
               CAST(r - floor_r AS BIGINT) AS cusum,
               r - floor_r > 4 * (SELECT total FROM tot) AS alarm
        FROM refl
    """,
    tags=("workload", "stats", "timeseries"),
)
def workload_cusum(spark: SparkSession, sf: str) -> DataFrame:
    """CUSUM changepoint detector over the daily order-count series:
    S_t = max(0, S_{t-1} + (x_t − μ)). The textbook recursion looks
    inherently sequential, but by the reflection identity
    S_t = R_t − min(0, min_{j≤t} R_j) (R = running sum of deviations) it
    decomposes into two running-window primitives — which is exactly what
    makes it distributable: running sum and running min are both
    two-pass per-partition scans with broadcast carry at any scale, no
    per-row state machine. Deviations are scaled by n_days
    (n·x_t − total) so everything stays integer; μ never materializes as
    a float. The alarm threshold (4·total in scaled units ≙ 4·μ̄ raw) is
    arbitrary but deterministic — the detector shape, not the tuning, is
    the artifact."""
    o = load_table(spark, sf, "orders")
    day = F.date_trunc("day", F.col("o_orderdate"))
    cnt = o.groupBy(day.alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    bounds = o.agg(
        F.date_trunc("day", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("day", F.max("o_orderdate")).alias("hi"),
    )
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    dense = cal.join(cnt, "d", "left").select(
        "d", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )
    tot = dense.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").cast("bigint").alias("total"),
    )
    pre = dense.crossJoin(tot).select(
        "d",
        "x",
        "total",
        F.sum(F.col("n_days") * F.col("x") - F.col("total"))
        .over(W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("r"),
    )
    floor_r = F.least(
        F.lit(0).cast("bigint"),
        F.min("r").over(
            W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    refl = pre.select("d", "x", "r", "total", floor_r.alias("floor_r"))
    return refl.select(
        "d",
        "x",
        (F.col("r") - F.col("floor_r")).cast("bigint").alias("cusum"),
        (F.col("r") - F.col("floor_r") > 4 * F.col("total")).alias("alarm"),
    )


@query(
    "ml_ks_test",
    oracle=f"""
        WITH pooled AS (
            SELECT CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS v,
                   CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS a,
                   CASE WHEN c.c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END AS b
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
        ),
        per_v AS (
            SELECT v, CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb
            FROM pooled GROUP BY v
        ),
        cum AS (
            SELECT SUM(na) OVER (ORDER BY v) AS ca,
                   SUM(nb) OVER (ORDER BY v) AS cb
            FROM per_v
        ),
        tot AS (
            SELECT CAST(SUM(na) AS BIGINT) AS n1, CAST(SUM(nb) AS BIGINT) AS n2
            FROM per_v
        ),
        d AS (
            SELECT MAX(ABS(tot.n2 * cum.ca - tot.n1 * cum.cb)) AS numer
            FROM cum, tot
        )
        SELECT tot.n1 AS n_building, tot.n2 AS n_machinery,
               {sql_round4("CAST(d.numer AS DOUBLE) / (tot.n1 * tot.n2)")} AS ks_d,
               {sql_round4(
                   "1.358 * SQRT((tot.n1 + tot.n2)"
                   " / (CAST(tot.n1 AS DOUBLE) * tot.n2))"
               )} AS crit_05,
               CAST(d.numer AS DOUBLE) / (tot.n1 * tot.n2)
                   > 1.358 * SQRT((tot.n1 + tot.n2)
                                  / (CAST(tot.n1 AS DOUBLE) * tot.n2))
                   AS reject_05
        FROM d, tot
    """,
    tags=("ml", "stats"),
)
def ml_ks_test(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test: do BUILDING and MACHINERY
    customers draw order totals from the same distribution? The KS
    statistic D = max|F₁(v) − F₂(v)| is computed entirely in integers:
    prices become cents, the pooled distinct-value axis carries running
    counts (c₁, c₂), and the sup is max|n₂·c₁ − n₁·c₂| — one division by
    n₁·n₂ at the very end. Ties are handled correctly by aggregating to
    distinct values BEFORE the cumulative window (ECDF is evaluated
    after each distinct value, the standard ties treatment). The global
    cumulative window runs over the distinct-cents axis — already
    aggregated, orders of magnitude below fact size; at 100 TB it
    becomes the two-pass range-partitioned prefix sum. The 1.358/√̄n
    asymptotic critical value (α=0.05) makes it a decision, not just a
    number."""
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    pooled = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("bigint")
            .alias("v"),
            F.when(F.col("c_mktsegment") == "BUILDING", 1)
            .otherwise(0)
            .alias("a"),
            F.when(F.col("c_mktsegment") == "MACHINERY", 1)
            .otherwise(0)
            .alias("b"),
        )
    )
    per_v = pooled.groupBy("v").agg(
        F.sum("a").cast("bigint").alias("na"),
        F.sum("b").cast("bigint").alias("nb"),
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = per_v.select(
        F.sum("na").over(w).alias("ca"), F.sum("nb").over(w).alias("cb")
    )
    tot = per_v.agg(
        F.sum("na").cast("bigint").alias("n1"),
        F.sum("nb").cast("bigint").alias("n2"),
    )
    d = cum.crossJoin(tot).agg(
        F.max(
            F.abs(F.col("n2") * F.col("ca") - F.col("n1") * F.col("cb"))
        ).alias("numer"),
        F.first("n1").alias("n1"),
        F.first("n2").alias("n2"),
    )
    n1, n2, numer = F.col("n1"), F.col("n2"), F.col("numer")
    ks = numer.cast("double") / (n1 * n2)
    crit = 1.358 * F.sqrt((n1 + n2) / (n1.cast("double") * n2))
    return d.select(
        n1.alias("n_building"),
        n2.alias("n_machinery"),
        round4(ks).alias("ks_d"),
        round4(crit).alias("crit_05"),
        (ks > crit).alias("reject_05"),
    )


@query(
    "workload_seasonal_decompose",
    oracle=f"""
        WITH bounds AS (
            SELECT DATE_TRUNC('day', MIN(o_orderdate)) AS lo,
                   DATE_TRUNC('day', MAX(o_orderdate)) AS hi
            FROM orders
        ),
        cal AS (
            SELECT UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 DAY)) AS d
            FROM bounds
        ),
        rev AS (
            SELECT DATE_TRUNC('day', o_orderdate) AS d,
                   SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS x
            FROM orders GROUP BY 1
        ),
        dense AS (
            SELECT cal.d, COALESCE(rev.x, 0) AS x
            FROM cal LEFT JOIN rev ON rev.d = cal.d
        ),
        ma AS (
            SELECT d, x,
                   SUM(x) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
                                AND 3 FOLLOWING) AS s7,
                   COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
                                  AND 3 FOLLOWING) AS w
            FROM dense
        ),
        dev AS (
            SELECT CAST(DAYOFWEEK(CAST(d AS DATE)) + 1 AS INT) AS dow,
                   7 * x - s7 AS e
            FROM ma WHERE w = 7
        )
        SELECT dow,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               {sql_round4("CAST(SUM(e) AS DOUBLE) / COUNT(*) / 700.0")}
                   AS seasonal_idx_dollars
        FROM dev
        GROUP BY dow
        ORDER BY dow
    """,
    tags=("workload", "stats", "timeseries"),
)
def workload_seasonal_decompose(spark: SparkSession, sf: str) -> DataFrame:
    """Classical additive seasonal decomposition, day-of-week component:
    detrend daily revenue with a centered 7-day moving average, then
    average the residual per weekday. The 1/7 division never happens —
    the residual is kept as the scaled integer 7·x_t − Σ₇x (zero-mean by
    construction over full weeks), and a single divide-by-700 converts
    the per-dow mean to dollars at the end. Edge days without a full
    7-day window are excluded (w = 7), matching the textbook treatment.
    Day-cardinality windows as in `workload_autocorr`; the complementary
    op `workload_forecast_seasonal` consumes exactly this weekly
    structure as its model."""
    o = load_table(spark, sf, "orders")
    day = F.date_trunc("day", F.col("o_orderdate"))
    rev = o.groupBy(day.alias("d")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")
        ).alias("x")
    )
    bounds = o.agg(
        F.date_trunc("day", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("day", F.max("o_orderdate")).alias("hi"),
    )
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    dense = cal.join(rev, "d", "left").select(
        "d", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )
    w7 = W.orderBy("d").rowsBetween(-3, 3)
    ma = dense.select(
        "d",
        "x",
        F.sum("x").over(w7).alias("s7"),
        F.count(F.lit(1)).over(w7).alias("w"),
    )
    dev = ma.filter(F.col("w") == 7).select(
        F.dayofweek(F.col("d").cast("date")).alias("dow"),
        (7 * F.col("x") - F.col("s7")).alias("e"),
    )
    return (
        dev.groupBy("dow")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            round4(
                F.sum("e").cast("double") / F.count(F.lit(1)) / 700.0
            ).alias("seasonal_idx_dollars"),
        )
        .orderBy("dow")
    )


@query(
    "workload_bollinger",
    oracle=f"""
        WITH bounds AS (
            SELECT DATE_TRUNC('day', MIN(o_orderdate)) AS lo,
                   DATE_TRUNC('day', MAX(o_orderdate)) AS hi
            FROM orders
        ),
        cal AS (
            SELECT UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 DAY)) AS d
            FROM bounds
        ),
        rev AS (
            SELECT DATE_TRUNC('day', o_orderdate) AS d,
                   SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS x
            FROM orders GROUP BY 1
        ),
        dense AS (
            SELECT cal.d, CAST(COALESCE(rev.x, 0) AS HUGEINT) AS x
            FROM cal LEFT JOIN rev ON rev.d = cal.d
        ),
        roll AS (
            SELECT d, x,
                   SUM(x) OVER w AS s1,
                   SUM(x * x) OVER w AS s2,
                   COUNT(*) OVER w AS w_n
            FROM dense
            WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        )
        SELECT d,
               CAST(x AS BIGINT) AS cents,
               {sql_round4("CAST(s1 AS DOUBLE) / 700.0")} AS ma7_dollars,
               {sql_round4(
                   "SQRT(CAST(7 * s2 - s1 * s1 AS DOUBLE)) / 700.0"
               )} AS sigma_dollars,
               7 * x - s1 > 0
                   AND (7 * x - s1) * (7 * x - s1) > 4 * (7 * s2 - s1 * s1)
                   AS breakout_up,
               7 * x - s1 < 0
                   AND (7 * x - s1) * (7 * x - s1) > 4 * (7 * s2 - s1 * s1)
                   AS breakout_down
        FROM roll WHERE w_n = 7
    """,
    tags=("workload", "stats", "timeseries"),
)
def workload_bollinger(spark: SparkSession, sf: str) -> DataFrame:
    """Bollinger-band breakout detection on daily revenue: rolling 7-day
    mean ± 2σ, with the breakout predicate algebraically cleared of both
    the division and the square root — x > μ + 2σ becomes
    (7x − s₁) > 0 ∧ (7x − s₁)² > 4·(7s₂ − s₁²) — so the FLAGS are exact
    integer comparisons (decimal(38,0) on Spark, HUGEINT in the oracle;
    squares of scaled cents overflow int64) and only the display columns
    (band center/width in dollars) touch floats. This
    integer-predicate-first discipline is what makes alert pipelines
    reproducible across engines and partitionings. Rolling power sums
    over the day axis: same two-pass-prefix scale path as
    `workload_cusum`."""
    o = load_table(spark, sf, "orders")
    day = F.date_trunc("day", F.col("o_orderdate"))
    rev = o.groupBy(day.alias("d")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")
        ).alias("x")
    )
    bounds = o.agg(
        F.date_trunc("day", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("day", F.max("o_orderdate")).alias("hi"),
    )
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    dec = "decimal(38,0)"
    dense = cal.join(rev, "d", "left").select(
        "d", F.coalesce(F.col("x"), F.lit(0)).cast(dec).alias("x")
    )
    w = W.orderBy("d").rowsBetween(-6, 0)
    roll = dense.select(
        "d",
        "x",
        F.sum("x").over(w).alias("s1"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("s2"),
        F.count(F.lit(1)).over(w).alias("w_n"),
    ).filter(F.col("w_n") == 7)
    x, s1, s2 = F.col("x"), F.col("s1"), F.col("s2")
    devi = 7 * x - s1
    var49 = 7 * s2 - s1 * s1
    return roll.select(
        "d",
        x.cast("bigint").alias("cents"),
        round4(s1.cast("double") / 700.0).alias("ma7_dollars"),
        round4(F.sqrt(var49.cast("double")) / 700.0).alias("sigma_dollars"),
        ((devi > 0) & (devi * devi > 4 * var49)).alias("breakout_up"),
        ((devi < 0) & (devi * devi > 4 * var49)).alias("breakout_down"),
    )


@query(
    "ml_theil_sen",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, date_part('day', ts) AS d,
                   FLOOR({sql_dsum('value')} * 100.0 + 0.5) AS y
            FROM events GROUP BY event_type, date_part('day', ts)
        ),
        slopes AS (
            SELECT a.event_type,
                   (b.y - a.y) / CAST(b.d - a.d AS DOUBLE) AS slope
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND a.d < b.d
        )
        SELECT event_type,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM daily x
                WHERE x.event_type = slopes.event_type) AS n_days,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               {sql_round4('QUANTILE_CONT(slope, 0.5) / 100.0')} AS sen_slope
        FROM slopes
        GROUP BY event_type
    """,
    tags=("ml", "timeseries", "robust"),
)
def ml_theil_sen(spark: SparkSession, sf: str) -> DataFrame:
    """Theil–Sen robust trend: the median of all pairwise slopes of the
    per-type daily revenue series — breakdown point 29%, immune to the
    outlier days that wreck an OLS fit (ml_ols_regression is the
    fragile twin). Daily cents are decimal-exact; each slope is one
    double division of exact integers (bit-identical both engines);
    the median rides the same quantile_cont+round4 convention as
    agg_percentile. The pair product is per-series O(days²) — 435
    pairs here — computed AFTER the aggregation to day grain, so at
    100 TB the corpus-sized work is one map-side-combined groupBy and
    the quadratic part touches only series_length rows per key."""
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.dayofmonth("ts").alias("d")
    ).agg(F.floor(dsum(F.col("value")) * 100.0 + 0.5).alias("y")).persist()
    # persisted: the pair self-join and n_days both read the day grain
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("b.y") - F.col("a.y")) / (F.col("b.d") - F.col("a.d")).cast("double")).alias("slope"),
    )
    n_days = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    agg = slopes.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        round4(F.percentile("slope", F.lit(0.5)) / 100.0).alias("sen_slope"),
    )
    return n_days.join(agg, "event_type").select(
        "event_type", "n_days", "n_pairs", "sen_slope"
    )


@query(
    "ml_subsample_ci",
    oracle=f"""
        WITH halves AS (
            SELECT o.o_orderpriority, b.b,
                   {sql_davg('o.o_totalprice')} AS mb
            FROM orders o
            CROSS JOIN (SELECT UNNEST(range(0, 8)) AS b) b
            WHERE ascii(SUBSTRING(
                      md5(CAST(o.o_orderkey AS VARCHAR) || ':'
                          || CAST(b.b AS VARCHAR)), 1, 1)) % 2 = 0
            GROUP BY o.o_orderpriority, b.b
        ),
        full_m AS (
            SELECT o_orderpriority, {sql_davg('o_totalprice')} AS mean_full
            FROM orders GROUP BY o_orderpriority
        )
        SELECT f.o_orderpriority,
               {sql_round4('f.mean_full')} AS mean_full,
               {sql_round4('STDDEV_SAMP(h.mb)')} AS half_sample_sd,
               {sql_round4('f.mean_full - 2.0 * STDDEV_SAMP(h.mb)')} AS ci_lo,
               {sql_round4('f.mean_full + 2.0 * STDDEV_SAMP(h.mb)')} AS ci_hi
        FROM halves h JOIN full_m f ON h.o_orderpriority = f.o_orderpriority
        GROUP BY f.o_orderpriority, f.mean_full
    """,
    tags=("ml", "stats", "uncertainty"),
)
def ml_subsample_ci(spark: SparkSession, sf: str) -> DataFrame:
    """Half-sample (delete-d jackknife flavored) confidence interval for
    the per-priority mean order value: B=8 deterministic half-samples —
    membership decided by the parity of an md5 over (key, replicate),
    replayable on any engine, unlike RNG bootstrap — each yields a
    decimal-exact mean; their spread estimates the sampling SD and a
    ±2·SD band around the full mean. The scalable uncertainty recipe:
    the corpus is scanned ONCE against a broadcast 8-row replicate
    table (membership is a filter, not a shuffle), partial aggregation
    keeps the fan-out map-side, and the final stats run on B rows per
    group. At 100 TB swap md5 for xxhash64 — same plan, same bands."""
    o = load_table(spark, sf, "orders")
    reps = spark.range(8).select(F.col("id").cast("bigint").alias("b"))
    halves = (
        o.crossJoin(F.broadcast(reps))
        .filter(
            F.ascii(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("o_orderkey").cast("string"),
                            F.lit(":"),
                            F.col("b").cast("string"),
                        )
                    ),
                    1, 1,
                )
            ) % 2
            == 0
        )
        .groupBy("o_orderpriority", "b")
        .agg(davg(F.col("o_totalprice")).alias("mb"))
    )
    full_m = o.groupBy("o_orderpriority").agg(
        davg(F.col("o_totalprice")).alias("mean_full")
    )
    sd = F.stddev_samp("mb")
    return (
        halves.join(full_m, "o_orderpriority")
        .groupBy("o_orderpriority", "mean_full")
        .agg(
            round4(F.col("mean_full")).alias("mf"),
            round4(sd).alias("half_sample_sd"),
            round4(F.col("mean_full") - 2.0 * sd).alias("ci_lo"),
            round4(F.col("mean_full") + 2.0 * sd).alias("ci_hi"),
        )
        .select(
            "o_orderpriority",
            F.col("mf").alias("mean_full"),
            "half_sample_sd", "ci_lo", "ci_hi",
        )
    )


@query(
    "ml_markov_stationary",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events
        ),
        counts AS (
            SELECT prev_type, event_type AS next_type, COUNT(*) AS n
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY prev_type, next_type
        ),
        p AS (
            SELECT c.prev_type, c.next_type,
                   CAST(c.n AS DOUBLE) / r.tot AS p
            FROM counts c
            JOIN (SELECT prev_type, SUM(n) AS tot
                  FROM counts GROUP BY prev_type) r
              ON c.prev_type = r.prev_type
        ),
        states AS (SELECT DISTINCT prev_type AS state FROM counts),
        pi0 AS (
            SELECT state,
                   1.0 / (SELECT COUNT(*) FROM states) AS pi
            FROM states
        ),
        pi1 AS (
            SELECT p.next_type AS state,
                   {sql_round4(sql_dsum('pi0.pi * p.p'))} AS pi
            FROM p JOIN pi0 ON p.prev_type = pi0.state
            GROUP BY p.next_type
        ),
        pi2 AS (
            SELECT p.next_type AS state,
                   {sql_round4(sql_dsum('pi1.pi * p.p'))} AS pi
            FROM p JOIN pi1 ON p.prev_type = pi1.state
            GROUP BY p.next_type
        )
        SELECT pi2.state, pi1.pi AS pi_iter1, pi2.pi AS pi_iter2
        FROM pi2 JOIN pi1 ON pi2.state = pi1.state
    """,
    tags=("ml", "graph", "timeseries"),
)
def ml_markov_stationary(spark: SparkSession, sf: str) -> DataFrame:
    """Stationary distribution of the user-behavior Markov chain: the
    event-type transition matrix (workload_event_transitions' counts,
    row-normalized) powered twice from a uniform start — π·P·P — the
    steady-state mix of user activity, i.e. PageRank's little sibling
    on the behavioral graph. Each iteration is one equi-join of the
    K²-row transition table with the K-row distribution plus a
    decimal-summed matvec reduce; round4 after every iteration keeps
    both engines on the identical probability grid (the same fixed-
    round unroll discipline as ml_kmeans_lloyd/graph_pagerank). The
    corpus-sized work — lag + pair counts — happens ONCE; iterations
    touch only K-sized state, so at 100 TB you run 50 iterations for
    the same corpus cost as 2."""
    ev = load_table(spark, sf, "events")
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(
            W.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("prev_type"),
    )
    counts = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()  # reused by row totals, P, and the state list
    )
    row = counts.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    p = counts.join(row, "prev_type").select(
        "prev_type", "next_type",
        (F.col("n").cast("double") / F.col("tot")).alias("p"),
    ).persist()  # both power iterations read it
    states = counts.select(F.col("prev_type").alias("state")).distinct()
    k = states.agg(F.count(F.lit(1)).alias("k"))
    pi0 = states.crossJoin(F.broadcast(k)).select(
        "state", (F.lit(1.0) / F.col("k")).alias("pi")
    )

    def step(pi: DataFrame) -> DataFrame:
        return (
            p.join(F.broadcast(pi), p.prev_type == pi.state)
            .groupBy(F.col("next_type").alias("state"))
            .agg(round4(dsum(F.col("pi") * F.col("p"))).alias("pi"))
        )

    pi1 = step(pi0)
    pi2 = step(pi1)
    return pi2.join(
        pi1.withColumnRenamed("pi", "pi_iter1"), "state"
    ).select("state", "pi_iter1", F.col("pi").alias("pi_iter2"))


@query(
    "ml_mutual_info",
    oracle=f"""
        WITH cells AS (
            SELECT lang, source, COUNT(*) AS c
            FROM documents GROUP BY lang, source
        ),
        m AS (
            SELECT lang, source, CAST(c AS DOUBLE) AS c,
                   CAST(SUM(c) OVER () AS DOUBLE) AS n,
                   CAST(SUM(c) OVER (PARTITION BY lang) AS DOUBLE) AS rl,
                   CAST(SUM(c) OVER (PARTITION BY source) AS DOUBLE) AS cs
            FROM cells
        ),
        s AS (
            SELECT {sql_dsum('(c / n) * LN((c * n) / (rl * cs))')} AS mi,
                   {sql_dsum('-(c / n) * LN(rl / n)')} AS h_lang,
                   {sql_dsum('-(c / n) * LN(cs / n)')} AS h_source
            FROM m
        )
        SELECT {sql_round4('mi')} AS mutual_info_nats,
               {sql_round4('h_lang')} AS h_lang,
               {sql_round4('h_source')} AS h_source,
               {sql_round4('mi / SQRT(h_lang * h_source)')} AS nmi
        FROM s
    """,
    tags=("ml", "stats", "information"),
)
def ml_mutual_info(spark: SparkSession, sf: str) -> DataFrame:
    """Mutual information between the corpus's lang and source labels
    (nats), with marginal entropies and the geometric-mean-normalized
    NMI — the information-theoretic 'are these two metadata columns
    redundant' dial that chi-square (ml_chi2_independence) answers
    only as a yes/no. ONE corpus scan builds the |langs|x|sources|
    contingency table; margins and the grand total are WINDOW sums
    over those ~20 cells (not re-aggregations of the corpus — the
    naive DataFrame DAG re-scans the table once per margin, 8x at
    100 TB), and both entropies reduce over the same cell rows via the
    cell-weighted identity H(X) = Σ_cells (c/n)·(−ln(m_x/n)). Each
    cell's p·ln term is row-wise IEEE; the three sums ride the decimal
    convention in a single final aggregate."""
    d = load_table(spark, sf, "documents")
    cells = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("c"))
    m = cells.select(
        F.col("c").cast("double").alias("c"),
        F.sum("c").over(W.partitionBy()).cast("double").alias("n"),
        F.sum("c").over(W.partitionBy("lang")).cast("double").alias("rl"),
        F.sum("c").over(W.partitionBy("source")).cast("double").alias("cs"),
    )
    s_ = m.agg(
        dsum(
            (F.col("c") / F.col("n"))
            * F.log((F.col("c") * F.col("n")) / (F.col("rl") * F.col("cs")))
        ).alias("mi"),
        dsum(
            -(F.col("c") / F.col("n")) * F.log(F.col("rl") / F.col("n"))
        ).alias("h_lang"),
        dsum(
            -(F.col("c") / F.col("n")) * F.log(F.col("cs") / F.col("n"))
        ).alias("h_source"),
    )
    return s_.select(
        round4(F.col("mi")).alias("mutual_info_nats"),
        round4(F.col("h_lang")).alias("h_lang"),
        round4(F.col("h_source")).alias("h_source"),
        round4(F.try_divide(F.col("mi"), F.sqrt(F.col("h_lang") * F.col("h_source")))).alias("nmi"),
    )


@query(
    "ml_calibration_bins",
    oracle=f"""
        WITH scored AS (
            SELECT o_orderkey,
                   1.0 / (1.0 + EXP(-((o_totalprice - 150000.0) / 50000.0)))
                       AS p_hat,
                   CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1.0 ELSE 0.0 END AS y
            FROM orders
        ),
        binned AS (
            SELECT CAST(LEAST(FLOOR(p_hat * 10.0), 9) AS INT) AS bin,
                   p_hat, y, (p_hat - y) * (p_hat - y) AS sq
            FROM scored
        )
        SELECT bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               {sql_round4(sql_davg('p_hat'))} AS mean_predicted,
               {sql_round4(sql_davg('y'))} AS actual_rate,
               {sql_round4(sql_davg('sq'))} AS brier_contrib
        FROM binned GROUP BY bin
    """,
    tags=("ml", "eval", "calibration"),
)
def ml_calibration_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Calibration curve + per-bin Brier decomposition for a fixed
    logistic scorer (sigmoid of scaled order value) predicting
    high-priority orders: ten fixed-width probability bins, each with
    mean predicted probability vs realized rate — the reliability
    diagram that tells you whether a score can be thresholded as a
    probability, plus the Brier contribution per bin. Fixed-width
    binning (floor(p·10)) instead of quantile bins keeps the op
    embarrassingly parallel — binning is pure projection, no sort, no
    NTILE window — and at 100 TB this is one map-side-combined
    aggregate over the scored stream. Sigmoid is row-wise IEEE;
    per-bin means ride the decimal convention."""
    o = load_table(spark, sf, "orders")
    p_hat = 1.0 / (
        1.0 + F.exp(-((F.col("o_totalprice") - 150000.0) / 50000.0))
    )
    y = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1.0
    ).otherwise(0.0)
    scored = o.select(p_hat.alias("p_hat"), y.alias("y"))
    binned = scored.select(
        F.least(F.floor(F.col("p_hat") * 10.0), F.lit(9)).cast("int").alias("bin"),
        "p_hat", "y",
        ((F.col("p_hat") - F.col("y")) * (F.col("p_hat") - F.col("y"))).alias("sq"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        round4(davg(F.col("p_hat"))).alias("mean_predicted"),
        round4(davg(F.col("y"))).alias("actual_rate"),
        round4(davg(F.col("sq"))).alias("brier_contrib"),
    )


@query(
    "ml_kaplan_meier",
    oracle=f"""
        WITH lag AS (
            SELECT o.o_orderkey,
                   DATE_DIFF('day', o.o_orderdate, MIN(l.l_shipdate)) AS raw_t
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey, o.o_orderdate
        ),
        obs AS (
            SELECT LEAST(raw_t, 60) AS t,
                   CASE WHEN raw_t <= 60 THEN 1 ELSE 0 END AS ev
            FROM lag
        ),
        per_t AS (
            SELECT t, SUM(ev) AS d, COUNT(*) AS c FROM obs GROUP BY t
        ),
        risk AS (
            SELECT t, d, c,
                   (SELECT COUNT(*) FROM obs)
                       - COALESCE(SUM(c) OVER (
                             ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                         ), 0) AS n_risk
            FROM per_t
        ),
        surv AS (
            SELECT t, d, n_risk,
                   EXP(CAST(CAST(SUM(CAST(LN(1.0 - CAST(d AS DOUBLE) / n_risk)
                                         AS DECIMAL(38,8))) OVER (
                           ORDER BY t
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS VARCHAR) AS DOUBLE)) AS s
            FROM risk
        )
        SELECT CAST(t AS BIGINT) AS t_day,
               CAST(n_risk AS BIGINT) AS n_risk,
               CAST(d AS BIGINT) AS n_events,
               {sql_round4('s')} AS survival
        FROM surv
    """,
    tags=("ml", "stats", "survival"),
)
def ml_kaplan_meier(spark: SparkSession, sf: str) -> DataFrame:
    """Kaplan-Meier survival curve of order-to-first-ship lag with
    right-censoring at a 60-day horizon (lag > 60 = 'still open' at
    analysis time) — the estimator behind every time-to-event question
    (churn, fulfillment SLA, incident TTR) that naive averaging gets
    wrong in the presence of censoring. S(t) = Π(1 − d_i/n_i): the
    corpus-sized work is ONE orderkey-co-partitioned join + a day-grain
    aggregate; the product telescopes as exp of a decimal-summed
    running ln over ≤ 61 distinct-day rows (the same
    aggregate-then-tiny-window discipline as ml_ks_test — the risk-set
    window never sees raw orders). Factors are row-wise IEEE; round4
    seals the curve."""
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    lag = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.min("l_shipdate").alias("first_ship"))
        .select(
            F.datediff(F.col("first_ship"), F.col("o_orderdate")).alias("raw_t")
        )
    )
    obs = lag.select(
        F.least(F.col("raw_t"), F.lit(60)).alias("t"),
        F.when(F.col("raw_t") <= 60, 1).otherwise(0).alias("ev"),
    ).persist()  # read by both the day grain and the risk-set total
    per_t = obs.groupBy("t").agg(
        F.sum("ev").alias("d"), F.count(F.lit(1)).alias("c")
    )
    total = obs.agg(F.count(F.lit(1)).alias("total"))
    wprev = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    wrun = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    risk = per_t.crossJoin(F.broadcast(total)).select(
        "t", "d", "c",
        (
            F.col("total")
            - F.coalesce(F.sum("c").over(wprev), F.lit(0))
        ).alias("n_risk"),
    )
    lnterm = F.log(1.0 - F.col("d").cast("double") / F.col("n_risk"))
    surv = risk.select(
        "t", "d", "n_risk",
        F.exp(F.sum(lnterm.cast(DEC)).over(wrun).cast("double")).alias("s"),
    )
    return surv.select(
        F.col("t").cast("bigint").alias("t_day"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").cast("bigint").alias("n_events"),
        round4(F.col("s")).alias("survival"),
    )


@query(
    "workload_sprt",
    oracle="""
        WITH arms AS (
            SELECT CASE WHEN ascii(SUBSTRING(
                            md5(CAST(user_id AS VARCHAR)), 1, 1)) % 2 = 0
                        THEN 'control' ELSE 'treatment' END AS arm,
                   CASE WHEN event_type = 'purchase'
                        THEN CAST(0.25 AS DOUBLE)
                        ELSE CAST(-0.015625 AS DOUBLE) END AS w,
                   ts, event_id
            FROM events
        ),
        walk AS (
            SELECT arm, w,
                   ROW_NUMBER() OVER (
                       PARTITION BY arm ORDER BY ts, event_id) AS rn,
                   SUM(w) OVER (
                       PARTITION BY arm ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS llr
            FROM arms
        )
        SELECT arm,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(CASE WHEN rn = (SELECT MAX(rn) FROM walk w2
                                   WHERE w2.arm = walk.arm)
                        THEN llr END) AS final_llr,
               CAST(MIN(CASE WHEN llr >= 3.0 THEN rn END) AS BIGINT)
                   AS first_upper_cross,
               CAST(MIN(CASE WHEN llr <= -3.0 THEN rn END) AS BIGINT)
                   AS first_lower_cross,
               CASE
                   WHEN COALESCE(MIN(CASE WHEN llr >= 3.0 THEN rn END),
                                 9223372036854775807)
                        < COALESCE(MIN(CASE WHEN llr <= -3.0 THEN rn END),
                                   9223372036854775807)
                       THEN 'accept_h1'
                   WHEN MIN(CASE WHEN llr <= -3.0 THEN rn END) IS NOT NULL
                       THEN 'accept_h0'
                   ELSE 'continue' END AS decision
        FROM walk GROUP BY arm
    """,
    tags=("workload", "stats", "sequential"),
)
def workload_sprt(spark: SparkSession, sf: str) -> DataFrame:
    """Wald's sequential probability ratio test over the hash-split A/B
    arms: each event moves a per-arm log-likelihood random walk
    (+0.25 on conversion, −1/64 otherwise — the a-priori log ratios
    quantized to exact dyadic weights so 30k-step cumulative sums are
    bit-exact on both engines with no decimal crutch), and the test
    reports the FIRST boundary crossing (±3.0 ≈ ln 19, α=β=5%) — stop
    early, ship sooner, the whole point of sequential testing vs the
    fixed-horizon workload_ab_test. One window sort per arm computes
    the entire walk; first-crossing and final state fall out of a
    single aggregate. Sequential tests are inherently order-serial, so
    at 100 TB the walk runs per (arm, day) with day-boundary carryover
    — same operators, chunked."""
    ev = load_table(spark, sf, "events")
    arm = F.when(
        F.ascii(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)) % 2
        == 0,
        "control",
    ).otherwise("treatment")
    w_ = F.when(F.col("event_type") == "purchase", 0.25).otherwise(-0.015625)
    arms = ev.select(arm.alias("arm"), w_.alias("w"), "ts", "event_id")
    wspec = W.partitionBy("arm").orderBy("ts", "event_id")
    walk = arms.select(
        "arm",
        F.row_number().over(wspec).alias("rn"),
        F.sum("w").over(wspec.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("llr"),
    )
    up = F.min(F.when(F.col("llr") >= 3.0, F.col("rn")))
    lo = F.min(F.when(F.col("llr") <= -3.0, F.col("rn")))
    big = F.lit(9223372036854775807)
    return walk.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max_by("llr", "rn").alias("final_llr"),
        up.cast("bigint").alias("first_upper_cross"),
        lo.cast("bigint").alias("first_lower_cross"),
        F.when(F.coalesce(up, big) < F.coalesce(lo, big), "accept_h1")
        .when(lo.isNotNull(), "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    )


@query(
    "ml_psi_drift",
    oracle=f"""
        WITH split AS (
            SELECT CASE WHEN ascii(SUBSTRING(
                            md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) % 2 = 0
                        THEN 'ref' ELSE 'cur' END AS cohort,
                   CAST(LEAST(FLOOR(o_totalprice / 50000.0), 9) AS INT) AS bin
            FROM orders
        ),
        cells AS (
            SELECT bin,
                   SUM(CASE WHEN cohort = 'ref' THEN 1 ELSE 0 END) AS a,
                   SUM(CASE WHEN cohort = 'cur' THEN 1 ELSE 0 END) AS b
            FROM split GROUP BY bin
        ),
        probs AS (
            SELECT bin,
                   (a + 0.5) / CAST(SUM(a + 0.5) OVER () AS DOUBLE) AS pa,
                   (b + 0.5) / CAST(SUM(b + 0.5) OVER () AS DOUBLE) AS pb
            FROM cells
        )
        SELECT bin,
               {sql_round4('pa')} AS p_ref,
               {sql_round4('pb')} AS p_cur,
               {sql_round4('(pa - pb) * LN(pa / pb)')} AS psi_contrib
        FROM probs
    """,
    tags=("ml", "drift", "monitoring"),
)
def ml_psi_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Population stability index between a reference and a current
    cohort (deterministic md5 halves standing in for yesterday/today)
    over fixed 50k-wide order-value bins: PSI = Σ (p_ref − p_cur)·
    ln(p_ref/p_cur), THE production drift alarm for model inputs
    (>0.25 = retrain). Laplace-(+½)-smoothed so empty bins stay finite
    and deterministic. One corpus scan → conditional-count cells → bin
    probabilities as window sums over ≤10 rows (the single-scan
    margins discipline of ml_mutual_info, SCALE.md §5); each
    contribution is row-wise IEEE + round4. At 100 TB the cohorts are
    partition predicates (date=yesterday vs today) and the scan prunes
    to exactly two partitions."""
    o = load_table(spark, sf, "orders")
    cohort = F.when(
        F.ascii(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)) % 2
        == 0,
        "ref",
    ).otherwise("cur")
    b = F.least(F.floor(F.col("o_totalprice") / 50000.0), F.lit(9)).cast("int")
    split = o.select(cohort.alias("cohort"), b.alias("bin"))
    cells = split.groupBy("bin").agg(
        F.sum(F.when(F.col("cohort") == "ref", 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("cohort") == "cur", 1).otherwise(0)).alias("b"),
    )
    wall = W.partitionBy()
    probs = cells.select(
        "bin",
        ((F.col("a") + 0.5) / F.sum(F.col("a") + 0.5).over(wall).cast("double")).alias("pa"),
        ((F.col("b") + 0.5) / F.sum(F.col("b") + 0.5).over(wall).cast("double")).alias("pb"),
    )
    return probs.select(
        "bin",
        round4(F.col("pa")).alias("p_ref"),
        round4(F.col("pb")).alias("p_cur"),
        round4((F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb"))).alias("psi_contrib"),
    )


@query(
    "ml_shapley_closed_form",
    oracle=f"""
        WITH feats AS (
            SELECT o_orderkey, o_orderpriority,
                   o_totalprice / 50000.0 AS x1,
                   -- TRY_CAST: a non-numeric priority prefix is a NULL
                   -- feature, not a crashed stage (unistr hazard fixture)
                   CAST(TRY_CAST(SUBSTRING(o_orderpriority, 1, 1) AS INTEGER)
                        AS DOUBLE) AS x2
            FROM orders
        ),
        mu AS (
            SELECT {sql_round4(sql_davg('x1'))} AS m1,
                   {sql_round4(sql_davg('x2'))} AS m2
            FROM feats
        ),
        phi AS (
            SELECT o_orderpriority,
                   0.5 * ((1.0/(1.0+EXP(-(-2.0 + 0.8*x1 + 0.3*m2)))
                           - 1.0/(1.0+EXP(-(-2.0 + 0.8*m1 + 0.3*m2))))
                        + (1.0/(1.0+EXP(-(-2.0 + 0.8*x1 + 0.3*x2)))
                           - 1.0/(1.0+EXP(-(-2.0 + 0.8*m1 + 0.3*x2)))))
                       AS phi1,
                   0.5 * ((1.0/(1.0+EXP(-(-2.0 + 0.8*m1 + 0.3*x2)))
                           - 1.0/(1.0+EXP(-(-2.0 + 0.8*m1 + 0.3*m2))))
                        + (1.0/(1.0+EXP(-(-2.0 + 0.8*x1 + 0.3*x2)))
                           - 1.0/(1.0+EXP(-(-2.0 + 0.8*x1 + 0.3*m2)))))
                       AS phi2,
                   1.0/(1.0+EXP(-(-2.0 + 0.8*x1 + 0.3*x2)))
                       - 1.0/(1.0+EXP(-(-2.0 + 0.8*m1 + 0.3*m2))) AS total
            FROM feats, mu
        )
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               {sql_round4(sql_davg('phi1'))} AS mean_phi_price,
               {sql_round4(sql_davg('phi2'))} AS mean_phi_priority,
               {sql_round4(sql_davg('phi1 + phi2 - total'))} AS efficiency_gap
        FROM phi GROUP BY o_orderpriority
    """,
    tags=("ml", "explainability"),
)
def ml_shapley_closed_form(spark: SparkSession, sf: str) -> DataFrame:
    """Exact Shapley attribution for a fixed 2-feature logistic scorer
    (σ(−2 + 0.8·price/50k + 0.3·priority_rank)): with two features the
    2! orderings enumerate in closed form, so each row's φ is ½ the sum
    of both marginal contributions against the feature-mean baseline —
    no sampling, no surrogate model. Per-priority mean attributions
    answer 'what drives the score here', and the efficiency_gap column
    audits the Shapley identity φ₁+φ₂ = f(x)−f(baseline) (≡0 up to
    round4 — shipped as a built-in self-check). Baseline means are
    round4-pinned and broadcast; everything else is row-wise IEEE in
    ONE scan + one small aggregate. The exponential-in-features blowup
    starts at d>10 — there you sample orderings with the deterministic
    md5 trick of ml_subsample_ci, same plan shape."""
    o = load_table(spark, sf, "orders")
    feats = o.select(
        "o_orderpriority",
        (F.col("o_totalprice") / 50000.0).alias("x1"),
        F.substring("o_orderpriority", 1, 1)
        .try_cast("integer")
        .cast("double")
        .alias("x2"),
    )
    mu = feats.agg(
        round4(davg(F.col("x1"))).alias("m1"),
        round4(davg(F.col("x2"))).alias("m2"),
    )

    def sig(x1, x2):
        return 1.0 / (1.0 + F.exp(-(F.lit(-2.0) + 0.8 * x1 + 0.3 * x2)))

    j = feats.crossJoin(F.broadcast(mu))
    x1, x2, m1, m2 = F.col("x1"), F.col("x2"), F.col("m1"), F.col("m2")
    phi1 = 0.5 * ((sig(x1, m2) - sig(m1, m2)) + (sig(x1, x2) - sig(m1, x2)))
    phi2 = 0.5 * ((sig(m1, x2) - sig(m1, m2)) + (sig(x1, x2) - sig(x1, m2)))
    total = sig(x1, x2) - sig(m1, m2)
    phi = j.select(
        "o_orderpriority",
        phi1.alias("phi1"), phi2.alias("phi2"), total.alias("total"),
    )
    return phi.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        round4(davg(F.col("phi1"))).alias("mean_phi_price"),
        round4(davg(F.col("phi2"))).alias("mean_phi_priority"),
        round4(davg(F.col("phi1") + F.col("phi2") - F.col("total"))).alias("efficiency_gap"),
    )


@query(
    "ml_precision_recall",
    oracle=f"""
        WITH scored AS (
            SELECT CAST(LEAST(FLOOR(
                       (1.0 / (1.0 + EXP(-((o_totalprice - 150000.0)
                                           / 50000.0)))) * 10.0), 9) AS INT)
                       AS bin,
                   CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS y
            FROM orders
        ),
        per_bin AS (
            SELECT bin, COUNT(*) AS n, SUM(y) AS pos
            FROM scored GROUP BY bin
        ),
        totals AS (
            SELECT SUM(pos) AS p_total FROM per_bin
        ),
        thr AS (
            SELECT CAST(range AS INT) AS t_bin FROM range(1, 10)
        ),
        confusion AS (
            SELECT thr.t_bin,
                   COALESCE(SUM(CASE WHEN per_bin.bin >= thr.t_bin
                                     THEN per_bin.pos END), 0) AS tp,
                   COALESCE(SUM(CASE WHEN per_bin.bin >= thr.t_bin
                                     THEN per_bin.n - per_bin.pos END), 0) AS fp
            FROM thr CROSS JOIN per_bin
            GROUP BY thr.t_bin
        )
        SELECT CAST(t_bin AS DOUBLE) / 10.0 AS threshold,
               CAST(tp AS BIGINT) AS tp,
               CAST(fp AS BIGINT) AS fp,
               CAST(t.p_total - tp AS BIGINT) AS fn,
               {sql_round4('CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0)')}
                   AS precision,
               {sql_round4('CAST(tp AS DOUBLE) / t.p_total')} AS recall,
               {sql_round4(
                   'CAST(2 * tp AS DOUBLE) / NULLIF(2 * tp + fp + (t.p_total - tp), 0)'
               )} AS f1
        FROM confusion CROSS JOIN totals t
    """,
    tags=("ml", "eval"),
)
def ml_precision_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Precision/recall/F1 sweep for the fixed logistic scorer of
    ``ml_calibration_bins`` at thresholds 0.1…0.9. Scale shape: the raw
    scores are first collapsed into ten (bin, n, pos) count rows — one
    map-side-combined aggregate over the scored stream — and the 9-way
    threshold sweep then runs on that fixed-width table, so the per-
    threshold confusion matrix never rescans the data (contrast with the
    naive scores×thresholds cross join). Threshold semantics are exact:
    bin k holds p∈[k/10,(k+1)/10), so p_hat ≥ t ⟺ bin ≥ 10t at these
    bin-edge thresholds. All counts integer; three final float divisions."""
    o = load_table(spark, sf, "orders")
    p_hat = 1.0 / (1.0 + F.exp(-((F.col("o_totalprice") - 150000.0) / 50000.0)))
    y = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
    scored = o.select(
        F.least(F.floor(p_hat * 10.0), F.lit(9)).cast("int").alias("bin"),
        y.alias("y"),
    )
    per_bin = scored.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    ).persist()  # ten rows; read by both the totals agg and the sweep
    totals = per_bin.agg(F.sum("pos").alias("p_total"))
    thr = spark.range(1, 10).select(F.col("id").cast("int").alias("t_bin"))
    confusion = (
        F.broadcast(thr)
        .crossJoin(per_bin)
        .groupBy("t_bin")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("bin") >= F.col("t_bin"), F.col("pos"))),
                F.lit(0),
            ).alias("tp"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("bin") >= F.col("t_bin"), F.col("n") - F.col("pos")
                    )
                ),
                F.lit(0),
            ).alias("fp"),
        )
    )
    out = confusion.crossJoin(F.broadcast(totals))
    fn_ = F.col("p_total") - F.col("tp")
    return out.select(
        (F.col("t_bin").cast("double") / 10.0).alias("threshold"),
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        fn_.cast("bigint").alias("fn"),
        round4(
            F.col("tp").cast("double") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0))
        ).alias("precision"),
        round4(F.try_divide(F.col("tp").cast("double"), F.col("p_total"))).alias("recall"),
        round4(
            (2 * F.col("tp")).cast("double")
            / F.nullif(2 * F.col("tp") + F.col("fp") + fn_, F.lit(0))
        ).alias("f1"),
    )


@query(
    "ml_lift_gains",
    oracle=f"""
        WITH scored AS (
            SELECT o_orderkey,
                   1.0 / (1.0 + EXP(-((o_totalprice - 150000.0) / 50000.0)))
                       AS p_hat,
                   CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS y
            FROM orders
        ),
        deciled AS (
            SELECT y,
                   CAST(NTILE(10) OVER (ORDER BY p_hat DESC, o_orderkey)
                        AS INT) AS decile
            FROM scored
        ),
        per_d AS (
            SELECT decile, COUNT(*) AS n, SUM(y) AS pos
            FROM deciled GROUP BY decile
        ),
        cum AS (
            SELECT decile, n, pos,
                   SUM(pos) OVER (ORDER BY decile
                       ROWS UNBOUNDED PRECEDING) AS cum_pos,
                   SUM(n) OVER (ORDER BY decile
                       ROWS UNBOUNDED PRECEDING) AS cum_n,
                   SUM(pos) OVER () AS total_pos,
                   SUM(n) OVER () AS total_n
            FROM per_d
        )
        SELECT decile,
               CAST(n AS BIGINT) AS n,
               CAST(pos AS BIGINT) AS pos,
               {sql_round4('CAST(cum_pos AS DOUBLE) / total_pos')} AS gains,
               {sql_round4(
                   '(CAST(pos AS DOUBLE) / n) / (CAST(total_pos AS DOUBLE) / total_n)'
               )} AS lift,
               {sql_round4(
                   '(CAST(cum_pos AS DOUBLE) / cum_n) / (CAST(total_pos AS DOUBLE) / total_n)'
               )} AS cum_lift
        FROM cum
    """,
    tags=("ml", "eval"),
)
def ml_lift_gains(spark: SparkSession, sf: str) -> DataFrame:
    """Decile lift & cumulative-gains table for the fixed logistic
    scorer — the campaign-targeting readout ("mailing the top 2 deciles
    captures X% of responders at Y× random"). Scores are cut into exact
    NTILE(10) deciles ordered by score with o_orderkey tie-break (fully
    deterministic across engines), then ALL ratios derive from the
    10-row (decile, n, pos) count table: the global sort touches rows
    once, every window after it runs on ten rows. At 100 TB swap the
    exact NTILE for fixed score bins (``ml_precision_recall``'s shape)
    or distributed quantiles; the downstream lift algebra is unchanged.
    Counts are integers; the three ratios are single float expressions."""
    o = load_table(spark, sf, "orders")
    p_hat = 1.0 / (1.0 + F.exp(-((F.col("o_totalprice") - 150000.0) / 50000.0)))
    y = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
    scored = o.select("o_orderkey", p_hat.alias("p_hat"), y.alias("y"))
    w_ntile = W.orderBy(F.desc("p_hat"), F.asc("o_orderkey"))
    deciled = scored.select(
        "y", F.ntile(10).over(w_ntile).cast("int").alias("decile")
    )
    per_d = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    w_cum = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    w_all = W.orderBy("decile").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = per_d.select(
        "decile", "n", "pos",
        F.sum("pos").over(w_cum).alias("cum_pos"),
        F.sum("n").over(w_cum).alias("cum_n"),
        F.sum("pos").over(w_all).alias("total_pos"),
        F.sum("n").over(w_all).alias("total_n"),
    )
    rate_all = F.col("total_pos").cast("double") / F.col("total_n")
    return cum.select(
        "decile",
        F.col("n").cast("bigint").alias("n"),
        F.col("pos").cast("bigint").alias("pos"),
        round4(F.try_divide(F.col("cum_pos").cast("double"), F.col("total_pos"))).alias("gains"),
        round4(
            F.try_divide(F.col("pos").cast("double") / F.col("n"), rate_all)
        ).alias("lift"),
        round4(
            F.try_divide(
                F.col("cum_pos").cast("double") / F.col("cum_n"), rate_all
            )
        ).alias("cum_lift"),
    )


@query(
    "ml_propensity_matching",
    oracle=f"""
        WITH feats AS (
            SELECT user_id,
                   CAST(('0x' || SUBSTRING(MD5(
                        CAST(user_id AS VARCHAR) || ':psm'), 1, 8))
                        ::BIGINT % 2 AS INT) AS treated,
                   COUNT(*) AS n_events,
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS n_purch
            FROM events GROUP BY user_id
        ),
        scored AS (
            SELECT user_id, treated,
                   CAST(20 * n_purch + n_events AS BIGINT) AS score
            FROM feats
        ),
        swept AS (
            SELECT user_id, treated, score,
                   LAST_VALUE(CASE WHEN treated = 0 THEN score END
                              IGNORE NULLS) OVER wb AS before_s,
                   LAST_VALUE(CASE WHEN treated = 0 THEN user_id END
                              IGNORE NULLS) OVER wb AS before_u,
                   FIRST_VALUE(CASE WHEN treated = 0 THEN score END
                               IGNORE NULLS) OVER wa AS after_s,
                   FIRST_VALUE(CASE WHEN treated = 0 THEN user_id END
                               IGNORE NULLS) OVER wa AS after_u
            FROM scored
            WINDOW wb AS (ORDER BY score, user_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   wa AS (ORDER BY score, user_id
                          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        ),
        matched AS (
            SELECT user_id, score,
                   CASE WHEN after_s IS NULL THEN before_u
                        WHEN before_s IS NULL THEN after_u
                        WHEN score - before_s <= after_s - score THEN before_u
                        ELSE after_u END AS control_id,
                   CASE WHEN after_s IS NULL THEN before_s
                        WHEN before_s IS NULL THEN after_s
                        WHEN score - before_s <= after_s - score THEN before_s
                        ELSE after_s END AS control_score
            FROM swept WHERE treated = 1
        )
        SELECT user_id AS treated_id,
               CAST(control_id AS BIGINT) AS control_id,
               CAST(score AS BIGINT) AS t_score,
               CAST(control_score AS BIGINT) AS c_score,
               CAST(ABS(score - control_score) AS BIGINT) AS score_gap,
               FLOOR((1.0 / (1.0 + EXP(-(0.01 * score - 2.0)))) * 10000.0
                     + 0.5) / 10000.0 AS t_propensity
        FROM matched
    """,
    tags=("ml", "causal"),
)
def ml_propensity_matching(spark: SparkSession, sf: str) -> DataFrame:
    """Propensity-score matching — the causal-inference workhorse: every
    treated user (md5-keyed arm split) is paired with the control whose
    propensity is nearest. The naive treated×control product is O(n²);
    this is the sort-sweep formulation: ONE global ordering by
    (score, user_id), then the nearest control is either the last
    control before or the first after — two frame-bounded IGNORE NULLS
    windows sharing one sort, with a deterministic prefer-before tie
    rule. Matching runs on the INTEGER linear score (20·purchases +
    events — the logistic's argument, monotone-equivalent for nearest-
    neighbor purposes): a float sigmoid axis would hinge nearest-control
    decisions on sub-ulp EXP differences between engines/libms, exactly
    the class of bug that makes matched cohorts irreproducible across
    platforms. The display propensity applies the sigmoid after
    matching. At 100 TB the window runs per score-range partition
    (range-partition the integer axis), never a pairwise join."""
    e = load_table(spark, sf, "events")
    feats = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "n_purch"
        ),
    )
    treated = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":psm"))), 1, 8
            ),
            16, 10,
        ).cast("bigint")
        % 2
    ).cast("int")
    score = (20 * F.col("n_purch") + F.col("n_events")).cast("bigint")
    scored = feats.select(
        "user_id", treated.alias("treated"), score.alias("score")
    )
    # Both sweeps as ACCUMULATING frames (round 8, sf1 profile): Spark
    # evaluates a (1, unboundedFollowing) frame by rescanning the
    # remainder of the partition per row — O(n²), measured 19.5×/decade
    # here — while (unboundedPreceding, -1) frames update incrementally
    # in O(1)/row. "First non-null after me in ascending order" IS "last
    # non-null before me in descending order", so the forward sweep runs
    # as a second accumulating frame over the reversed sort.
    order = W.orderBy("score", "user_id")
    wb = order.rowsBetween(W.unboundedPreceding, -1)
    wa = W.orderBy(F.desc("score"), F.desc("user_id")).rowsBetween(
        W.unboundedPreceding, -1
    )
    ctrl_s = F.when(F.col("treated") == 0, F.col("score"))
    ctrl_u = F.when(F.col("treated") == 0, F.col("user_id"))
    swept = scored.select(
        "user_id", "treated", "score",
        F.last(ctrl_s, ignorenulls=True).over(wb).alias("before_s"),
        F.last(ctrl_u, ignorenulls=True).over(wb).alias("before_u"),
        F.last(ctrl_s, ignorenulls=True).over(wa).alias("after_s"),
        F.last(ctrl_u, ignorenulls=True).over(wa).alias("after_u"),
    )
    take_before = (
        F.col("after_s").isNull()
        | (
            F.col("before_s").isNotNull()
            & (F.col("score") - F.col("before_s") <= F.col("after_s") - F.col("score"))
        )
    )
    matched = swept.filter(F.col("treated") == 1).select(
        F.col("user_id").alias("treated_id"),
        "score",
        F.when(take_before, F.col("before_u")).otherwise(F.col("after_u"))
        .cast("bigint")
        .alias("control_id"),
        F.when(take_before, F.col("before_s")).otherwise(F.col("after_s")).alias(
            "control_score"
        ),
    )
    return matched.select(
        "treated_id",
        "control_id",
        F.col("score").cast("bigint").alias("t_score"),
        F.col("control_score").cast("bigint").alias("c_score"),
        F.abs(F.col("score") - F.col("control_score")).cast("bigint").alias("score_gap"),
        round4(
            1.0 / (1.0 + F.exp(-(0.01 * F.col("score").cast("double") - 2.0)))
        ).alias("t_propensity"),
    )


@query(
    "ml_embedding_drift",
    oracle=f"""
        WITH ex AS (
            SELECT CASE WHEN ascii(SUBSTRING(
                            md5(CAST(vec_id AS VARCHAR) || ':drift'), 1, 1))
                            % 2 = 0
                        THEN 'ref' ELSE 'cur' END AS cohort,
                   GENERATE_SUBSCRIPTS(embedding, 1) AS dim,
                   UNNEST(embedding) AS val
            FROM embeddings
        ),
        per AS (
            SELECT dim,
                   {sql_davg("CASE WHEN cohort = 'ref' THEN CAST(val AS DOUBLE) END")}
                       AS mean_ref,
                   {sql_davg("CASE WHEN cohort = 'cur' THEN CAST(val AS DOUBLE) END")}
                       AS mean_cur
            FROM ex GROUP BY dim
        ),
        rounded AS (
            SELECT dim,
                   {sql_round4('mean_ref')} AS mean_ref,
                   {sql_round4('mean_cur')} AS mean_cur
            FROM per
        )
        SELECT CAST(dim AS INT) AS dim,
               mean_ref,
               mean_cur,
               {sql_round4('ABS(mean_cur - mean_ref)')} AS abs_shift,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY ABS(mean_cur - mean_ref) DESC, dim) AS INT)
                   AS drift_rank
        FROM rounded
    """,
    tags=("ml", "monitoring", "embedding"),
)
def ml_embedding_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Per-dimension embedding drift between two md5-keyed cohorts (the
    stand-in for last-month vs this-month encodings): mean activation
    per dimension per cohort, absolute shift, and a drift ranking — the
    embedding-space companion to ``ml_psi_drift``'s scalar PSI. A real
    drifted dimension (encoder update, input-distribution change)
    surfaces at the top ranks; here the cohorts are exchangeable so the
    shifts ARE the null distribution — what a healthy monitor reads.
    Shuffle is (64 dims × 2 cohorts) cells via posexplode + map-side
    combine, decimal-exact means, one 64-row ranking window."""
    emb = load_table(spark, sf, "embeddings")
    cohort = F.when(
        F.ascii(
            F.substring(
                F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(":drift"))),
                1, 1,
            )
        )
        % 2
        == 0,
        "ref",
    ).otherwise("cur")
    ex = emb.select(
        cohort.alias("cohort"),
        F.posexplode("embedding").alias("dim0", "val"),
    ).select((F.col("dim0") + 1).alias("dim"), "cohort", "val")
    per = ex.groupBy("dim").agg(
        round4(
            davg(F.when(F.col("cohort") == "ref", F.col("val").cast("double")))
        ).alias("mean_ref"),
        round4(
            davg(F.when(F.col("cohort") == "cur", F.col("val").cast("double")))
        ).alias("mean_cur"),
    )
    shift = F.abs(F.col("mean_cur") - F.col("mean_ref"))
    w_rank = W.orderBy(F.desc(shift), F.asc("dim"))
    return per.select(
        F.col("dim").cast("int").alias("dim"),
        "mean_ref",
        "mean_cur",
        round4(shift).alias("abs_shift"),
        F.row_number().over(w_rank).cast("int").alias("drift_rank"),
    )


@query(
    "ml_ab_cuped",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(('0x' || SUBSTRING(MD5(
                        CAST(user_id AS VARCHAR) || ':cuped'), 1, 8))
                        ::BIGINT % 2 AS INT) AS arm,
                   CAST(CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-15'
                                      THEN CAST(value AS DECIMAL(38,8))
                                      ELSE CAST(0 AS DECIMAL(38,8)) END)
                             AS VARCHAR) AS DOUBLE) AS pre,
                   CAST(CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15'
                                      THEN CAST(value AS DECIMAL(38,8))
                                      ELSE CAST(0 AS DECIMAL(38,8)) END)
                             AS VARCHAR) AS DOUBLE) AS post
            FROM events GROUP BY user_id
        ),
        g AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('pre')} AS sx,
                   {sql_dsum('post')} AS sy,
                   {sql_dsum('pre * post')} AS sxy,
                   {sql_dsum('pre * pre')} AS sxx,
                   {sql_dsum('post * post')} AS syy
            FROM per_user
        ),
        arms AS (
            SELECT arm,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   {sql_dsum('pre')} AS a_sx,
                   {sql_dsum('post')} AS a_sy
            FROM per_user GROUP BY arm
        )
        SELECT arm, n_users,
               {sql_round4('a_sy / n_users')} AS raw_mean,
               {sql_round4(
                   'a_sy / n_users - ((g.n * g.sxy - g.sx * g.sy) /'
                   ' (g.n * g.sxx - g.sx * g.sx))'
                   ' * (a_sx / n_users - g.sx / g.n)'
               )} AS cuped_mean,
               {sql_round4(
                   '((g.n * g.sxy - g.sx * g.sy) * (g.n * g.sxy - g.sx * g.sy))'
                   ' / ((g.n * g.sxx - g.sx * g.sx) * (g.n * g.syy - g.sy * g.sy))'
               )} AS variance_reduction
        FROM arms CROSS JOIN g
    """,
    tags=("ml", "experimentation"),
)
def ml_ab_cuped(spark: SparkSession, sf: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data) — the
    variance-reduction standard of every experimentation platform: each
    user's post-period metric is adjusted by θ·(pre − mean(pre)) where
    θ = cov(pre,post)/var(pre), cutting metric variance by exactly the
    squared pre/post correlation (reported as variance_reduction) so
    experiments reach significance with ~1/(1−r²)× less traffic. Shape:
    one per-user aggregate (pre/post decimal-exact sums), then θ from
    five global power sums and per-arm adjusted means — all
    map-side-combinable, no window, no second scan of raw events. The
    arm split is md5-keyed and oracle-replayed."""
    e = load_table(spark, sf, "events")
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":cuped"))),
                1, 8,
            ),
            16, 10,
        ).cast("bigint")
        % 2
    ).cast("int")
    per_user = e.groupBy("user_id").agg(
        F.first(arm).alias("arm"),
        F.sum(
            F.when(F.col("ts") < cutoff, F.col("value")).otherwise(0.0).cast(DEC)
        ).cast("double").alias("pre"),
        F.sum(
            F.when(F.col("ts") >= cutoff, F.col("value")).otherwise(0.0).cast(DEC)
        ).cast("double").alias("post"),
    ).persist()  # read by the global power sums AND the per-arm rollup
    x, y = F.col("pre"), F.col("post")
    g = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum(x * y).alias("sxy"),
        dsum(x * x).alias("sxx"),
        dsum(y * y).alias("syy"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        dsum(x).alias("a_sx"),
        dsum(y).alias("a_sy"),
    )
    out = arms.crossJoin(F.broadcast(g))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    theta = F.try_divide(n * sxy - sx * sy, n * sxx - sx * sx)
    return out.select(
        "arm", "n_users",
        round4(F.col("a_sy") / F.col("n_users")).alias("raw_mean"),
        round4(
            F.col("a_sy") / F.col("n_users")
            - theta * (F.col("a_sx") / F.col("n_users") - sx / n)
        ).alias("cuped_mean"),
        round4(
            F.try_divide(
                (n * sxy - sx * sy) * (n * sxy - sx * sy),
                (n * sxx - sx * sx) * (n * syy - sy * sy),
            )
        ).alias("variance_reduction"),
    )


@query(
    "ml_ab_did",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(('0x' || SUBSTRING(MD5(
                        CAST(user_id AS VARCHAR) || ':did'), 1, 8))
                        ::BIGINT % 2 AS INT) AS arm,
                   CAST(CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-15'
                                      THEN CAST(value AS DECIMAL(38,8))
                                      ELSE CAST(0 AS DECIMAL(38,8)) END)
                             AS VARCHAR) AS DOUBLE) AS pre,
                   CAST(CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15'
                                      THEN CAST(value AS DECIMAL(38,8))
                                      ELSE CAST(0 AS DECIMAL(38,8)) END)
                             AS VARCHAR) AS DOUBLE) AS post
            FROM events GROUP BY user_id
        ),
        arms AS (
            SELECT arm,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   {sql_dsum('pre')} AS s_pre,
                   {sql_dsum('post')} AS s_post
            FROM per_user GROUP BY arm
        ),
        wide AS (
            SELECT
                MAX(CASE WHEN arm = 1 THEN s_post / n_users END) AS t_post,
                MAX(CASE WHEN arm = 1 THEN s_pre / n_users END) AS t_pre,
                MAX(CASE WHEN arm = 0 THEN s_post / n_users END) AS c_post,
                MAX(CASE WHEN arm = 0 THEN s_pre / n_users END) AS c_pre,
                CAST(SUM(n_users) AS BIGINT) AS n_total
            FROM arms
        )
        SELECT n_total,
               {sql_round4('t_pre')} AS treat_pre,
               {sql_round4('t_post')} AS treat_post,
               {sql_round4('c_pre')} AS control_pre,
               {sql_round4('c_post')} AS control_post,
               {sql_round4('(t_post - t_pre) - (c_post - c_pre)')}
                   AS did_estimate
        FROM wide
    """,
    tags=("ml", "causal"),
)
def ml_ab_did(spark: SparkSession, sf: str) -> DataFrame:
    """Difference-in-differences: the treatment effect is the change in
    the treated arm's mean minus the change in the control arm's —
    each arm serves as its own pre-period baseline, so any level
    difference between arms and any common time shock cancels (the
    parallel-trends workhorse for rollouts that can't be randomized;
    its randomized-experiment cousin with a variance story is
    ``ml_ab_cuped``). One per-user aggregate, one arm-level rollup,
    one 2×2 pivot — the estimate is four means and three subtractions,
    all decimal-exact until the final float expression."""
    e = load_table(spark, sf, "events")
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":did"))),
                1, 8,
            ),
            16, 10,
        ).cast("bigint")
        % 2
    ).cast("int")
    per_user = e.groupBy("user_id").agg(
        F.first(arm).alias("arm"),
        F.sum(
            F.when(F.col("ts") < cutoff, F.col("value")).otherwise(0.0).cast(DEC)
        ).cast("double").alias("pre"),
        F.sum(
            F.when(F.col("ts") >= cutoff, F.col("value")).otherwise(0.0).cast(DEC)
        ).cast("double").alias("post"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        dsum(F.col("pre")).alias("s_pre"),
        dsum(F.col("post")).alias("s_post"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 1, F.col("s_post") / F.col("n_users"))).alias("t_post"),
        F.max(F.when(F.col("arm") == 1, F.col("s_pre") / F.col("n_users"))).alias("t_pre"),
        F.max(F.when(F.col("arm") == 0, F.col("s_post") / F.col("n_users"))).alias("c_post"),
        F.max(F.when(F.col("arm") == 0, F.col("s_pre") / F.col("n_users"))).alias("c_pre"),
        F.sum("n_users").cast("bigint").alias("n_total"),
    )
    return wide.select(
        "n_total",
        round4(F.col("t_pre")).alias("treat_pre"),
        round4(F.col("t_post")).alias("treat_post"),
        round4(F.col("c_pre")).alias("control_pre"),
        round4(F.col("c_post")).alias("control_post"),
        round4(
            (F.col("t_post") - F.col("t_pre")) - (F.col("c_post") - F.col("c_pre"))
        ).alias("did_estimate"),
    )


@query(
    "ml_outlier_iqr",
    oracle=f"""
        WITH fences AS (
            SELECT event_type,
                   quantile_cont(value, 0.25) AS q1,
                   quantile_cont(value, 0.75) AS q3
            FROM events GROUP BY event_type
        ),
        judged AS (
            SELECT e.event_type, e.value,
                   f.q1 - 1.5 * (f.q3 - f.q1) AS lo,
                   f.q3 + 1.5 * (f.q3 - f.q1) AS hi
            FROM events e JOIN fences f ON e.event_type = f.event_type
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               {sql_round4('MIN(lo)')} AS lo_fence,
               {sql_round4('MIN(hi)')} AS hi_fence,
               CAST(COUNT(CASE WHEN value < lo OR value > hi THEN 1 END)
                    AS BIGINT) AS n_outliers
        FROM judged
        GROUP BY event_type
    """,
    tags=("ml", "stats", "outliers"),
)
def ml_outlier_iqr(spark: SparkSession, sf: str) -> DataFrame:
    """Tukey IQR fences per series: values beyond Q1−1.5·IQR / Q3+1.5·IQR
    are flagged — the distribution-free outlier rule (robust where
    ``workload_anomaly_zscore``'s mean±kσ is dragged by the outliers
    themselves). Two passes by necessity (exact quantiles, then the
    fence test) with the 5-row fence table broadcast back onto the
    stream; at 100 TB swap exact ``percentile`` for the t-digest sketch
    (``agg_approx_percentile``) and the second pass is unchanged. Exact
    linear-interpolated quantiles match DuckDB's quantile_cont on
    identical sorted doubles; round4 absorbs the one interpolation
    product."""
    e = load_table(spark, sf, "events")
    fences = e.groupBy("event_type").agg(
        F.percentile(F.col("value"), F.lit(0.25)).alias("q1"),
        F.percentile(F.col("value"), F.lit(0.75)).alias("q3"),
    )
    judged = e.join(F.broadcast(fences), "event_type").select(
        "event_type", "value",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    return judged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        round4(F.min("lo")).alias("lo_fence"),
        round4(F.min("hi")).alias("hi_fence"),
        F.count(
            F.when((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1)
        ).cast("bigint").alias("n_outliers"),
    )


@query(
    "ml_woe_iv",
    oracle=f"""
        WITH scored AS (
            SELECT o_totalprice,
                   CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS bad
            FROM orders
        ),
        binned AS (
            SELECT bad,
                   CAST(NTILE(5) OVER (ORDER BY o_totalprice, bad) AS INT)
                       AS bin
            FROM scored
        ),
        cells AS (
            SELECT bin,
                   SUM(1 - bad) AS n_good,
                   SUM(bad) AS n_bad
            FROM binned GROUP BY bin
        ),
        tot AS (
            SELECT SUM(n_good) AS tg, SUM(n_bad) AS tb FROM cells
        )
        SELECT bin,
               CAST(n_good AS BIGINT) AS n_good,
               CAST(n_bad AS BIGINT) AS n_bad,
               {sql_round4(
                   'LN((CAST(n_good AS DOUBLE) * tb) / (CAST(n_bad AS DOUBLE) * tg))'
               )} AS woe,
               {sql_round4(
                   '(CAST(n_good AS DOUBLE) / tg - CAST(n_bad AS DOUBLE) / tb)'
                   ' * LN((CAST(n_good AS DOUBLE) * tb) / (CAST(n_bad AS DOUBLE) * tg))'
               )} AS iv_contrib
        FROM cells CROSS JOIN tot
    """,
    tags=("ml", "credit", "features"),
)
def ml_woe_iv(spark: SparkSession, sf: str) -> DataFrame:
    """Weight-of-Evidence / Information-Value binning — the credit-risk
    feature-screening standard: order value is cut into quintiles, each
    bin's WOE = ln(good-share/bad-share) measures its separation, and
    the IV contributions sum to the variable's predictive power (rule
    of thumb: IV > 0.3 = strong). The WOE argument is a ratio of exact
    integer products (cross-multiplied to avoid two divisions before
    the log), so LN sees identical bits on both engines. NTILE with a
    deterministic tie-break cuts the bins; all downstream algebra runs
    on the 5-row cell table. At scale, swap NTILE for approx-quantile
    cuts exactly as in ``ml_lift_gains``."""
    o = load_table(spark, sf, "orders")
    bad = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
    scored = o.select("o_totalprice", bad.alias("bad"))
    w = W.orderBy("o_totalprice", "bad")
    binned = scored.select(
        "bad", F.ntile(5).over(w).cast("int").alias("bin")
    )
    cells = binned.groupBy("bin").agg(
        F.sum(1 - F.col("bad")).alias("n_good"),
        F.sum("bad").alias("n_bad"),
    )
    tot = cells.agg(
        F.sum("n_good").alias("tg"), F.sum("n_bad").alias("tb")
    )
    out = cells.crossJoin(F.broadcast(tot))
    woe = F.log(
        F.try_divide(
            F.col("n_good").cast("double") * F.col("tb"),
            F.col("n_bad").cast("double") * F.col("tg"),
        )
    )
    return out.select(
        "bin",
        F.col("n_good").cast("bigint").alias("n_good"),
        F.col("n_bad").cast("bigint").alias("n_bad"),
        round4(woe).alias("woe"),
        round4(
            (
                F.try_divide(F.col("n_good").cast("double"), F.col("tg"))
                - F.try_divide(F.col("n_bad").cast("double"), F.col("tb"))
            )
            * woe
        ).alias("iv_contrib"),
    )


@query(
    "ml_kfold_assignment",
    oracle="""
        WITH assigned AS (
            SELECT label,
                   CAST(('0x' || SUBSTRING(MD5(
                        CAST(vec_id AS VARCHAR) || ':fold'), 1, 8))
                        ::BIGINT % 5 AS INT) AS fold
            FROM embeddings
        )
        SELECT fold, label,
               CAST(COUNT(*) AS BIGINT) AS n_samples
        FROM assigned
        GROUP BY fold, label
    """,
    tags=("ml", "split", "cv"),
)
def ml_kfold_assignment(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment with a per-
    (fold, label) occupancy audit: fold membership is a salted hash of
    the sample key — reproducible across engines/partitionings/reruns
    (``llm_train_val_split``'s rule generalized to k folds), and the
    occupancy table IS the stratification check: a label whose counts
    are lopsided across folds needs hash-within-stratum assignment
    instead. One projection + one map-side-combinable aggregate; at
    100 TB fold filters push into the scan exactly like the split op's."""
    emb = load_table(spark, sf, "embeddings")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(":fold"))),
                1, 8,
            ),
            16, 10,
        ).cast("bigint")
        % 5
    ).cast("int")
    return (
        emb.select(fold.alias("fold"), "label")
        .groupBy("fold", "label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_samples"))
    )


@query(
    "ml_conformal_interval",
    oracle=f"""
        WITH obs AS (
            SELECT doc_id,
                   LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1
                       AS n_tokens,
                   n_chars,
                   CASE WHEN CAST(('0x' || SUBSTRING(MD5(
                            CAST(doc_id AS VARCHAR) || ':conf'), 1, 8))
                            ::BIGINT % 2 AS INT) = 0
                        THEN 'cal' ELSE 'test' END AS side
            FROM documents
        ),
        fit AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('CAST(n_tokens AS DOUBLE)')} AS sx,
                   {sql_dsum('CAST(n_chars AS DOUBLE)')} AS sy,
                   {sql_dsum('CAST(n_tokens AS DOUBLE) * n_chars')} AS sxy,
                   {sql_dsum('CAST(n_tokens AS DOUBLE) * n_tokens')} AS sxx
            FROM obs WHERE side = 'cal'
        ),
        scored AS (
            SELECT obs.side,
                   ABS(n_chars - (
                       ((f.n * f.sxy - f.sx * f.sy) / (f.n * f.sxx - f.sx * f.sx))
                       * n_tokens
                       + (f.sy - ((f.n * f.sxy - f.sx * f.sy)
                                  / (f.n * f.sxx - f.sx * f.sx)) * f.sx) / f.n
                   )) AS abs_resid
            FROM obs CROSS JOIN fit f
        ),
        qhat AS (
            SELECT quantile_cont(abs_resid, 0.9) AS q
            FROM scored WHERE side = 'cal'
        )
        SELECT side,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               {sql_round4('(SELECT q FROM qhat)')} AS interval_halfwidth,
               CAST(COUNT(CASE WHEN abs_resid <= (SELECT q FROM qhat)
                               THEN 1 END) AS BIGINT) AS n_covered,
               {sql_round4(
                   'CAST(COUNT(CASE WHEN abs_resid <= (SELECT q FROM qhat)'
                   ' THEN 1 END) AS DOUBLE) / COUNT(*)'
               )} AS coverage
        FROM scored
        GROUP BY side
    """,
    tags=("ml", "uncertainty"),
)
def ml_conformal_interval(spark: SparkSession, sf: str) -> DataFrame:
    """Split-conformal prediction intervals — distribution-free
    uncertainty with a finite-sample guarantee: fit a point model
    (closed-form OLS of chars on tokens) on the calibration half
    (hash-split, replayable), take the 90th percentile of calibration
    |residuals| as the interval half-width, and audit empirical
    coverage on the held-out half (the guarantee says ≥ ~90% there
    regardless of the data's distribution — THE property worth paying
    one quantile for). Shape: one power-sum fit, residuals as
    projection against the broadcast model, one exact percentile
    (sketch-swappable at scale), one coverage count."""
    d = load_table(spark, sf, "documents")
    side = F.when(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":conf"))),
                    1, 8,
                ),
                16, 10,
            ).cast("bigint")
            % 2
        )
        == 0,
        "cal",
    ).otherwise("test")
    obs = d.select(
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        ).cast("double").alias("n_tokens"),
        F.col("n_chars").cast("double").alias("n_chars"),
        side.alias("side"),
    ).persist()  # read by the fit, the scoring pass, and the quantile
    x, y = F.col("n_tokens"), F.col("n_chars")
    fit = obs.filter(F.col("side") == "cal").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum(x * y).alias("sxy"),
        dsum(x * x).alias("sxx"),
    )
    scored = obs.crossJoin(F.broadcast(fit))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    slope = F.try_divide(n * sxy - sx * sy, n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    scored = scored.select(
        "side", F.abs(y - (slope * x + intercept)).alias("abs_resid")
    ).persist()  # read by the calibration quantile AND the coverage audit
    qhat = scored.filter(F.col("side") == "cal").agg(
        F.percentile(F.col("abs_resid"), F.lit(0.9)).alias("q")
    )
    out = scored.crossJoin(F.broadcast(qhat))
    covered = F.count(F.when(F.col("abs_resid") <= F.col("q"), 1))
    return out.groupBy("side").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        round4(F.max("q")).alias("interval_halfwidth"),
        covered.cast("bigint").alias("n_covered"),
        round4(covered.cast("double") / F.count(F.lit(1))).alias("coverage"),
    )


@query(
    "ml_ts_feature_pack",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2
        ),
        seq AS (
            SELECT event_type, day, y,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                       AS t,
                   LAG(y) OVER (PARTITION BY event_type ORDER BY day)
                       AS y_prev
            FROM daily
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               {sql_round4('CAST(SUM(y) AS DOUBLE) / COUNT(*)')} AS mean_y,
               {sql_round4(
                   'SQRT((SUM(y * y) - CAST(SUM(y) AS DOUBLE) * SUM(y)'
                   ' / COUNT(*)) / (COUNT(*) - 1))'
               )} AS sd_y,
               CAST(MIN(y) AS BIGINT) AS min_y,
               CAST(MAX(y) AS BIGINT) AS max_y,
               {sql_round4(
                   '(COUNT(y_prev) * SUM(CASE WHEN y_prev IS NOT NULL'
                   ' THEN y * y_prev END)'
                   ' - SUM(CASE WHEN y_prev IS NOT NULL THEN y END)'
                   ' * SUM(y_prev))'
                   ' / NULLIF(COUNT(y_prev)'
                   ' * SUM(CASE WHEN y_prev IS NOT NULL THEN y_prev * y_prev END)'
                   ' - CAST(SUM(y_prev) AS DOUBLE) * SUM(y_prev), 0)'
               )} AS acf1_slope,
               {sql_round4(
                   '(COUNT(*) * SUM(CAST(t AS DOUBLE) * y)'
                   ' - SUM(CAST(t AS DOUBLE)) * SUM(y))'
                   ' / (COUNT(*) * SUM(CAST(t AS DOUBLE) * t)'
                   ' - SUM(CAST(t AS DOUBLE)) * SUM(CAST(t AS DOUBLE)))'
               )} AS trend_slope
        FROM seq
        GROUP BY event_type
    """,
    tags=("ml", "timeseries", "features"),
)
def ml_ts_feature_pack(spark: SparkSession, sf: str) -> DataFrame:
    """Automated time-series feature extraction (the tsfresh shape):
    each series' daily counts reduce to one fixed-width feature row —
    level (mean), scale (sd), range, lag-1 autoregression slope
    (momentum), and linear trend — the features a downstream
    classifier/forecaster consumes instead of the raw series. One
    day-grain aggregate, one per-series lag window, then ALL features
    from a single pass of integer power sums (counts are exact, so the
    only doubles are the final closed-form expressions). At 100 TB
    this is per-series work keyed on the series id — embarrassingly
    parallel feature engineering."""
    e = load_table(spark, sf, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    w = W.partitionBy("event_type").orderBy("day")
    seq = daily.select(
        "event_type", "y",
        F.row_number().over(w).alias("t"),
        F.lag("y").over(w).alias("y_prev"),
    )
    n = F.count(F.lit(1))
    y, yp, t = F.col("y"), F.col("y_prev"), F.col("t").cast("double")
    has_prev = yp.isNotNull()
    npairs = F.count(yp)
    sxy_l = F.sum(F.when(has_prev, y * yp))
    sx_l = F.sum(F.when(has_prev, y))
    sy_l = F.sum(yp)
    sxx_l = F.sum(F.when(has_prev, yp * yp))
    return seq.groupBy("event_type").agg(
        n.cast("bigint").alias("n_days"),
        round4(F.sum(y).cast("double") / n).alias("mean_y"),
        round4(
            F.sqrt(
                F.try_divide(
                    F.sum(y * y) - F.sum(y).cast("double") * F.sum(y) / n,
                    n - 1,
                )
            )
        ).alias("sd_y"),
        F.min(y).cast("bigint").alias("min_y"),
        F.max(y).cast("bigint").alias("max_y"),
        round4(
            (npairs * sxy_l - sx_l * sy_l)
            / F.nullif(
                npairs * sxx_l - sy_l.cast("double") * sy_l, F.lit(0)
            )
        ).alias("acf1_slope"),
        round4(
            F.try_divide(
                n * F.sum(t * y) - F.sum(t) * F.sum(y),
                n * F.sum(t * t) - F.sum(t) * F.sum(t),
            )
        ).alias("trend_slope"),
    )


@query(
    "ml_als_one_factor",
    oracle=f"""
        WITH cells AS (
            SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS r
            FROM events GROUP BY user_id, event_type
        ),
        users AS (
            SELECT user_id,
                   CAST(SUM(r) AS DOUBLE) / COUNT(*) AS u
            FROM cells GROUP BY user_id
        ),
        joined AS (
            SELECT c.event_type, c.r, us.u
            FROM cells c JOIN users us ON c.user_id = us.user_id
        ),
        items AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   {sql_dsum('r * u')} / {sql_dsum('u * u')} AS v
            FROM joined GROUP BY event_type
        ),
        scored AS (
            SELECT j.event_type, i.n_users, i.v,
                   (j.r - j.u * i.v) * (j.r - j.u * i.v) AS sq_err
            FROM joined j JOIN items i ON j.event_type = i.event_type
        )
        SELECT event_type,
               CAST(MAX(n_users) AS BIGINT) AS n_users,
               {sql_round4('MAX(v)')} AS item_factor,
               {sql_round4('SQRT(' + sql_dsum('sq_err') + ' / COUNT(*))')}
                   AS rmse
        FROM scored
        GROUP BY event_type
    """,
    tags=("ml", "recommender"),
)
def ml_als_one_factor(spark: SparkSession, sf: str) -> DataFrame:
    """One alternating-least-squares round of a rank-1 implicit-feedback
    factorization over the user×event_type count matrix: user factors
    solve in closed form against the all-ones item init (u_i = mean
    observed rating), item factors then solve against those users
    (v_j = Σru/Σu² — each an exact decimal-summed ratio), and the
    per-item reconstruction RMSE shows where one latent dimension
    already explains the interaction matrix. The recommender shape of
    the repo's unrolled-iteration family (k-means, PageRank, power
    iteration): every ALS half-step is two map-side-combinable
    aggregates and a broadcast join — no MLlib, no per-user solver
    loop."""
    e = load_table(spark, sf, "events")
    cells = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("r")
    ).persist()  # read by the user solve and the item solve
    users = cells.groupBy("user_id").agg(
        (F.sum("r").cast("double") / F.count(F.lit(1))).alias("u")
    )
    joined = cells.join(users, "user_id").select("event_type", "r", "u").persist()
    items = joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        (dsum(F.col("r") * F.col("u")) / dsum(F.col("u") * F.col("u"))).alias("v"),
    )
    scored = joined.join(F.broadcast(items), "event_type").select(
        "event_type", "n_users", "v",
        ((F.col("r") - F.col("u") * F.col("v"))
         * (F.col("r") - F.col("u") * F.col("v"))).alias("sq_err"),
    )
    return scored.groupBy("event_type").agg(
        F.max("n_users").cast("bigint").alias("n_users"),
        round4(F.max("v")).alias("item_factor"),
        round4(F.sqrt(dsum(F.col("sq_err")) / F.count(F.lit(1)))).alias("rmse"),
    )


@query(
    "ml_iv_wald",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(('0x' || SUBSTRING(MD5(
                        CAST(user_id AS VARCHAR) || ':iv'), 1, 8))
                        ::BIGINT % 2 AS INT) AS z,
                   CAST(SUM(CASE WHEN event_type IN ('view', 'click')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS x,
                   CAST(CAST(SUM(CASE WHEN event_type = 'purchase'
                                      THEN CAST(value AS DECIMAL(38,8))
                                      ELSE CAST(0 AS DECIMAL(38,8)) END)
                             AS VARCHAR) AS DOUBLE) AS y
            FROM events GROUP BY user_id
        ),
        arms AS (
            SELECT z,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   {sql_dsum('y')} AS sy
            FROM per_user GROUP BY z
        ),
        wide AS (
            SELECT
                MAX(CASE WHEN z = 1 THEN CAST(sx AS DOUBLE) / n END) AS x1,
                MAX(CASE WHEN z = 0 THEN CAST(sx AS DOUBLE) / n END) AS x0,
                MAX(CASE WHEN z = 1 THEN sy / n END) AS y1,
                MAX(CASE WHEN z = 0 THEN sy / n END) AS y0,
                CAST(SUM(n) AS BIGINT) AS n_total
            FROM arms
        )
        SELECT n_total,
               {sql_round4('y1 - y0')} AS itt_effect,
               {sql_round4('x1 - x0')} AS first_stage,
               {sql_round4('(y1 - y0) / (x1 - x0)')} AS late_wald
        FROM wide
    """,
    tags=("ml", "causal"),
)
def ml_iv_wald(spark: SparkSession, sf: str) -> DataFrame:
    """Instrumental-variable Wald estimator — the third member of the
    causal family (``ml_ab_cuped`` randomized, ``ml_ab_did``
    observational-parallel-trends): when the instrument z (an
    encouragement, here hash-assigned) shifts engagement x but can
    only affect revenue y THROUGH x, the local average treatment
    effect is the ratio of intent-to-treat effects — Δy/Δx — per unit
    of induced engagement. A weak first stage (Δx≈0, reported
    explicitly) is the classic failure mode and here the instrument is
    placebo by construction, so first_stage IS the null reading. One
    per-user aggregate, one 2-row arm rollup, three subtractions and a
    division."""
    e = load_table(spark, sf, "events")
    z = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":iv"))),
                1, 8,
            ),
            16, 10,
        ).cast("bigint")
        % 2
    ).cast("int")
    per_user = e.groupBy("user_id").agg(
        F.first(z).alias("z"),
        F.sum(
            F.when(F.col("event_type").isin("view", "click"), 1).otherwise(0)
        ).cast("bigint").alias("x"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(0.0)
            .cast(DEC)
        ).cast("double").alias("y"),
    )
    arms = per_user.groupBy("z").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        dsum(F.col("y")).alias("sy"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("z") == 1, F.col("sx").cast("double") / F.col("n"))).alias("x1"),
        F.max(F.when(F.col("z") == 0, F.col("sx").cast("double") / F.col("n"))).alias("x0"),
        F.max(F.when(F.col("z") == 1, F.col("sy") / F.col("n"))).alias("y1"),
        F.max(F.when(F.col("z") == 0, F.col("sy") / F.col("n"))).alias("y0"),
        F.sum("n").cast("bigint").alias("n_total"),
    )
    return wide.select(
        "n_total",
        round4(F.col("y1") - F.col("y0")).alias("itt_effect"),
        round4(F.col("x1") - F.col("x0")).alias("first_stage"),
        round4(
            F.try_divide(F.col("y1") - F.col("y0"), F.col("x1") - F.col("x0"))
        ).alias("late_wald"),
    )


@query(
    "ml_beta_binomial_shrinkage",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS k
            FROM events GROUP BY user_id
        ),
        cohorts AS (
            SELECT CAST(user_id % 10 AS INT) AS cohort,
                   SUM(n) AS n, SUM(k) AS k
            FROM per_user GROUP BY 1
        )
        SELECT cohort,
               CAST(n AS BIGINT) AS n_events,
               CAST(k AS BIGINT) AS n_purchases,
               {sql_round4('CAST(k AS DOUBLE) / n')} AS raw_rate,
               {sql_round4('CAST(k + 2 AS DOUBLE) / (n + 52)')}
                   AS posterior_mean,
               {sql_round4(
                   '(CAST(k + 2 AS DOUBLE) / (n + 52))'
                   ' * (1.0 - CAST(k + 2 AS DOUBLE) / (n + 52)) / (n + 53)'
               )} AS posterior_var,
               {sql_round4(
                   'ABS(CAST(k AS DOUBLE) / n - CAST(k + 2 AS DOUBLE) / (n + 52))'
               )} AS shrinkage
        FROM cohorts
    """,
    tags=("ml", "bayes"),
)
def ml_beta_binomial_shrinkage(spark: SparkSession, sf: str) -> DataFrame:
    """Beta-Binomial shrinkage of conversion rates: each cohort's
    purchase rate gets a Beta(2, 50) prior (the portfolio-wide ~4%
    belief), so low-traffic cohorts report the regularized posterior
    mean (k+α)/(n+α+β) instead of a noisy raw k/n — the estimator that
    stops dashboards from ranking a 1-of-3 cohort above a 300-of-10000
    one. Posterior mean, variance, and the shrinkage magnitude are all
    closed-form ratios of exact integers (conjugacy means no sampling,
    no special functions); the whole op is two count aggregates."""
    e = load_table(spark, sf, "events")
    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("k"),
    )
    cohorts = per_user.groupBy(
        (F.col("user_id") % 10).cast("int").alias("cohort")
    ).agg(F.sum("n").alias("n"), F.sum("k").alias("k"))
    n, k = F.col("n"), F.col("k")
    post = (k + 2).cast("double") / (n + 52)
    return cohorts.select(
        "cohort",
        n.cast("bigint").alias("n_events"),
        k.cast("bigint").alias("n_purchases"),
        round4(k.cast("double") / n).alias("raw_rate"),
        round4(post).alias("posterior_mean"),
        round4(post * (1.0 - post) / (n + 53)).alias("posterior_var"),
        round4(F.abs(k.cast("double") / n - post)).alias("shrinkage"),
    )


@query(
    "ml_mean_excess_tail",
    oracle=f"""
        WITH fences AS (
            SELECT quantile_cont(o_totalprice, 0.90) AS u90,
                   quantile_cont(o_totalprice, 0.95) AS u95,
                   quantile_cont(o_totalprice, 0.99) AS u99
            FROM orders
        ),
        thresholds AS (
            SELECT CAST(0.90 AS DOUBLE) AS q, u90 AS u FROM fences
            UNION ALL SELECT CAST(0.95 AS DOUBLE), u95 FROM fences
            UNION ALL SELECT CAST(0.99 AS DOUBLE), u99 FROM fences
        )
        SELECT t.q AS quantile,
               {sql_round4('MIN(t.u)')} AS threshold,
               CAST(COUNT(CASE WHEN o.o_totalprice > t.u THEN 1 END)
                    AS BIGINT) AS n_exceed,
               {sql_round4(
                   sql_dsum('CASE WHEN o.o_totalprice > t.u'
                            ' THEN o.o_totalprice - t.u ELSE 0 END')
                   + ' / NULLIF(COUNT(CASE WHEN o.o_totalprice > t.u'
                   ' THEN 1 END), 0)'
               )} AS mean_excess
        FROM orders o CROSS JOIN thresholds t
        GROUP BY t.q
    """,
    tags=("ml", "risk", "tail"),
)
def ml_mean_excess_tail(spark: SparkSession, sf: str) -> DataFrame:
    """Mean-excess (mean residual life) tail diagnostic — extreme-value
    theory's workhorse plot: for thresholds at p90/p95/p99, the average
    exceedance above each threshold. A mean-excess that GROWS with the
    threshold indicates a heavy (Pareto-type) tail where 'expected
    overrun' keeps expanding — the input to capacity margins and
    reinsurance pricing; flat-to-falling means exponential-type tails
    and simple percentile headroom suffices. Exact quantiles (sketch-
    swappable) broadcast back over one scan; excesses ride the decimal
    convention."""
    o = load_table(spark, sf, "orders")
    fences = o.agg(
        F.percentile(F.col("o_totalprice"), F.lit(0.90)).alias("u90"),
        F.percentile(F.col("o_totalprice"), F.lit(0.95)).alias("u95"),
        F.percentile(F.col("o_totalprice"), F.lit(0.99)).alias("u99"),
    )
    thresholds = (
        fences.select(F.lit(0.90).alias("q"), F.col("u90").alias("u"))
        .unionByName(fences.select(F.lit(0.95).alias("q"), F.col("u95").alias("u")))
        .unionByName(fences.select(F.lit(0.99).alias("q"), F.col("u99").alias("u")))
    )
    joined = o.crossJoin(F.broadcast(thresholds))
    exceed = F.when(F.col("o_totalprice") > F.col("u"), 1)
    excess = F.when(
        F.col("o_totalprice") > F.col("u"), F.col("o_totalprice") - F.col("u")
    ).otherwise(0.0)
    return joined.groupBy(F.col("q").alias("quantile")).agg(
        round4(F.min("u")).alias("threshold"),
        F.count(exceed).cast("bigint").alias("n_exceed"),
        round4(
            dsum(excess) / F.nullif(F.count(exceed), F.lit(0))
        ).alias("mean_excess"),
    )


@query(
    "ml_uplift_two_model",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(('0x' || SUBSTRING(MD5(
                        CAST(user_id AS VARCHAR) || ':uplift'), 1, 8))
                        ::BIGINT % 2 AS INT) AS treated,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(MAX(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS INT) AS converted
            FROM events GROUP BY user_id
        ),
        segmented AS (
            SELECT CASE WHEN n_events >= 1000 THEN 'heavy'
                        WHEN n_events >= 500 THEN 'medium'
                        ELSE 'light' END AS segment,
                   treated, converted
            FROM per_user
        ),
        cells AS (
            SELECT segment,
                   SUM(CASE WHEN treated = 1 THEN 1 ELSE 0 END) AS n_t,
                   SUM(CASE WHEN treated = 1 THEN converted ELSE 0 END) AS k_t,
                   SUM(CASE WHEN treated = 0 THEN 1 ELSE 0 END) AS n_c,
                   SUM(CASE WHEN treated = 0 THEN converted ELSE 0 END) AS k_c
            FROM segmented GROUP BY segment
        )
        SELECT segment,
               CAST(n_t AS BIGINT) AS n_treated,
               CAST(n_c AS BIGINT) AS n_control,
               {sql_round4('CAST(k_t AS DOUBLE) / NULLIF(n_t, 0)')}
                   AS rate_treated,
               {sql_round4('CAST(k_c AS DOUBLE) / NULLIF(n_c, 0)')}
                   AS rate_control,
               {sql_round4(
                   'CAST(k_t AS DOUBLE) / NULLIF(n_t, 0)'
                   ' - CAST(k_c AS DOUBLE) / NULLIF(n_c, 0)'
               )} AS uplift,
               {sql_round4(
                   '(CAST(k_t AS DOUBLE) / NULLIF(n_t, 0)'
                   ' - CAST(k_c AS DOUBLE) / NULLIF(n_c, 0)) * n_t'
               )} AS incremental_conversions
        FROM cells
    """,
    tags=("ml", "causal", "uplift"),
)
def ml_uplift_two_model(spark: SparkSession, sf: str) -> DataFrame:
    """Two-model uplift by segment — heterogeneous treatment effects,
    the question AFTER the experiment reads positive: WHO moved?
    Conversion rates are estimated separately for the hash-assigned
    treated/control arms within each activity segment; the per-segment
    difference is the uplift and uplift×n_treated the incremental
    conversions — negative-uplift segments are the 'do-not-disturb'
    customers every targeting policy must exclude (the aggregate
    effect hides them; that is uplift modeling's whole point). One
    per-user aggregate, one segment×arm cell rollup, ratios of exact
    integers. Completes the causal suite: ``ml_ab_cuped`` (precision),
    ``ml_ab_did`` (identification), ``ml_iv_wald`` (noncompliance),
    uplift (heterogeneity)."""
    e = load_table(spark, sf, "events")
    treated = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":uplift"))),
                1, 8,
            ),
            16, 10,
        ).cast("bigint")
        % 2
    ).cast("int")
    per_user = e.groupBy("user_id").agg(
        F.first(treated).alias("treated"),
        F.count(F.lit(1)).alias("n_events"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    segment = (
        F.when(F.col("n_events") >= 1000, "heavy")
        .when(F.col("n_events") >= 500, "medium")
        .otherwise("light")
    )
    cells = per_user.select(
        segment.alias("segment"), "treated", "converted"
    ).groupBy("segment").agg(
        F.sum(F.when(F.col("treated") == 1, 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(F.col("treated") == 1, F.col("converted")).otherwise(0)).alias("k_t"),
        F.sum(F.when(F.col("treated") == 0, 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(F.col("treated") == 0, F.col("converted")).otherwise(0)).alias("k_c"),
    )
    rate_t = F.col("k_t").cast("double") / F.nullif(F.col("n_t"), F.lit(0))
    rate_c = F.col("k_c").cast("double") / F.nullif(F.col("n_c"), F.lit(0))
    return cells.select(
        "segment",
        F.col("n_t").cast("bigint").alias("n_treated"),
        F.col("n_c").cast("bigint").alias("n_control"),
        round4(rate_t).alias("rate_treated"),
        round4(rate_c).alias("rate_control"),
        round4(rate_t - rate_c).alias("uplift"),
        round4((rate_t - rate_c) * F.col("n_t")).alias("incremental_conversions"),
    )


@query(
    "ml_info_gain_rank",
    oracle=f"""
        WITH labeled AS (
            SELECT CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END AS y,
                   o_orderstatus, o_orderpriority
            FROM orders
        ),
        base AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(y) AS pos
            FROM labeled
        ),
        feats AS (
            SELECT 'o_orderstatus' AS feature, o_orderstatus AS v, y
            FROM labeled
            UNION ALL
            SELECT 'o_orderpriority', o_orderpriority, y FROM labeled
        ),
        cells AS (
            SELECT feature, v, COUNT(*) AS nv, SUM(y) AS kv
            FROM feats GROUP BY feature, v
        ),
        cond AS (
            SELECT feature,
                   {sql_dsum(
                       'CASE WHEN kv IN (0, nv) THEN 0.0 ELSE '
                       '(CAST(nv AS DOUBLE) / (SELECT n FROM base)) * ('
                       '-(CAST(kv AS DOUBLE)/nv) * LN(CAST(kv AS DOUBLE)/nv)'
                       ' - (1.0 - CAST(kv AS DOUBLE)/nv)'
                       ' * LN(1.0 - CAST(kv AS DOUBLE)/nv)) END'
                   )} AS h_cond,
                   CAST(COUNT(*) AS BIGINT) AS n_values
            FROM cells GROUP BY feature
        ),
        prior AS (
            SELECT CASE WHEN pos IN (0, n) THEN 0.0 ELSE
                   -(CAST(pos AS DOUBLE)/n) * LN(CAST(pos AS DOUBLE)/n)
                   - (1.0 - CAST(pos AS DOUBLE)/n)
                   * LN(1.0 - CAST(pos AS DOUBLE)/n) END AS h0
            FROM base
        )
        SELECT feature, n_values,
               {sql_round4('(SELECT h0 FROM prior)')} AS label_entropy,
               {sql_round4('h_cond')} AS conditional_entropy,
               {sql_round4('(SELECT h0 FROM prior) - h_cond')} AS info_gain,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY (SELECT h0 FROM prior) - h_cond DESC, feature)
                   AS INT) AS rank
        FROM cond
    """,
    tags=("ml", "features", "selection"),
)
def ml_info_gain_rank(spark: SparkSession, sf: str) -> DataFrame:
    """Information-gain feature ranking — the decision-tree split
    criterion applied as a feature screen: for each categorical
    candidate, H(label) − H(label|feature) measures how much knowing
    the feature shrinks label uncertainty (``ml_woe_iv``'s
    information-theoretic sibling, and the per-feature generalization
    of ``ml_mutual_info``). Both candidate features unpivot into one
    long stream → one cell aggregate each; entropies come from exact
    integer cell counts (pure-cell 0·ln0 guarded to 0), LN sees
    identical ratios of exact doubles on both engines, and the final
    ranking orders the gains. At 100 TB add features as more UNION
    branches — the plan stays one scan per feature, cells-sized
    shuffles."""
    o = load_table(spark, sf, "orders")
    labeled = o.select(
        F.when(F.col("o_totalprice") > 200000.0, 1).otherwise(0).alias("y"),
        "o_orderstatus", "o_orderpriority",
    ).persist()  # read by the base rates and both feature branches
    base = labeled.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"), F.sum("y").alias("pos")
    )
    feats = labeled.select(
        F.lit("o_orderstatus").alias("feature"),
        F.col("o_orderstatus").alias("v"),
        "y",
    ).unionByName(
        labeled.select(
            F.lit("o_orderpriority").alias("feature"),
            F.col("o_orderpriority").alias("v"),
            "y",
        )
    )
    cells = feats.groupBy("feature", "v").agg(
        F.count(F.lit(1)).alias("nv"), F.sum("y").alias("kv")
    )
    joined = cells.crossJoin(F.broadcast(base))
    p = F.col("kv").cast("double") / F.col("nv")
    term = F.when(
        (F.col("kv") == 0) | (F.col("kv") == F.col("nv")), F.lit(0.0)
    ).otherwise(
        (F.col("nv").cast("double") / F.col("n"))
        * (-(p) * F.log(p) - (1.0 - p) * F.log(1.0 - p))
    )
    cond = joined.groupBy("feature").agg(
        dsum(term).alias("h_cond"),
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
    )
    p0 = F.col("pos").cast("double") / F.col("n")
    prior = base.select(
        F.when((F.col("pos") == 0) | (F.col("pos") == F.col("n")), F.lit(0.0))
        .otherwise(-(p0) * F.log(p0) - (1.0 - p0) * F.log(1.0 - p0))
        .alias("h0")
    )
    out = cond.crossJoin(F.broadcast(prior))
    gain = F.col("h0") - F.col("h_cond")
    w_rank = W.orderBy(F.desc(gain), F.asc("feature"))
    return out.select(
        "feature", "n_values",
        round4(F.col("h0")).alias("label_entropy"),
        round4(F.col("h_cond")).alias("conditional_entropy"),
        round4(gain).alias("info_gain"),
        F.row_number().over(w_rank).cast("int").alias("rank"),
    )


@query(
    "ml_anova_oneway",
    oracle=f"""
        WITH groups AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('CAST(n_chars AS DOUBLE)')} AS s1,
                   {sql_dsum('CAST(n_chars AS DOUBLE) * n_chars')} AS s2
            FROM documents GROUP BY source
        ),
        tot AS (
            SELECT SUM(n) AS n_tot, COUNT(*) AS k,
                   {sql_dsum('s1')} AS g1,
                   {sql_dsum('s2')} AS g2
            FROM groups
        ),
        parts AS (
            SELECT t.k, t.n_tot,
                   {sql_dsum('g.s1 * g.s1 / g.n')}
                       - t.g1 * t.g1 / t.n_tot AS ss_between,
                   t.g2 - {sql_dsum('g.s1 * g.s1 / g.n')} AS ss_within
            FROM groups g CROSS JOIN tot t
            GROUP BY t.k, t.n_tot, t.g1, t.g2
        )
        SELECT CAST(k AS BIGINT) AS n_groups,
               CAST(n_tot AS BIGINT) AS n_docs,
               {sql_round4('ss_between')} AS ss_between,
               {sql_round4('ss_within')} AS ss_within,
               {sql_round4(
                   '(ss_between / (k - 1)) / (ss_within / (n_tot - k))'
               )} AS f_stat
        FROM parts
    """,
    tags=("ml", "stats", "test"),
)
def ml_anova_oneway(spark: SparkSession, sf: str) -> DataFrame:
    """One-way ANOVA across sources (do document lengths differ by
    source beyond noise?): between/within sums of squares from per-group
    power sums — Σ(G_i²/n_i) − G²/N and Σx² − Σ(G_i²/n_i) — so the F
    statistic needs ONE map-side-combinable aggregate per group and a
    20-row reduction, never a second centered pass (the textbook
    two-pass formulation doubles the corpus scans for nothing).
    Completes the classical-test suite: chi-square (independence), KS
    (two-sample shape), Welch (two means), ANOVA (k means). F ≫ 1 here
    means per-source length profiles are real signal — the same fact
    ``llm_dataset_mixture`` exploits."""
    d = load_table(spark, sf, "documents")
    x = F.col("n_chars").cast("double")
    groups = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(x).alias("s1"),
        dsum(x * F.col("n_chars")).alias("s2"),
    ).persist()  # read by the totals AND the partition sums
    tot = groups.agg(
        F.sum("n").alias("n_tot"),
        F.count(F.lit(1)).alias("k"),
        dsum(F.col("s1")).alias("g1"),
        dsum(F.col("s2")).alias("g2"),
    )
    joined = groups.crossJoin(F.broadcast(tot))
    parts = joined.groupBy("k", "n_tot", "g1", "g2").agg(
        dsum(F.col("s1") * F.col("s1") / F.col("n")).alias("explained"),
    )
    ss_between = F.col("explained") - F.col("g1") * F.col("g1") / F.col("n_tot")
    ss_within = F.col("g2") - F.col("explained")
    return parts.select(
        F.col("k").cast("bigint").alias("n_groups"),
        F.col("n_tot").cast("bigint").alias("n_docs"),
        round4(ss_between).alias("ss_between"),
        round4(ss_within).alias("ss_within"),
        round4(
            F.try_divide(
                ss_between / (F.col("k") - 1),
                ss_within / (F.col("n_tot") - F.col("k")),
            )
        ).alias("f_stat"),
    )


@query(
    "ml_kendall_tau",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(FLOOR({sql_dsum('value')} * 100.0 + 0.5) AS BIGINT)
                       AS rev_cents
            FROM events GROUP BY 1
        ),
        pairs AS (
            SELECT
                SUM(CASE WHEN (a.n_events - b.n_events)
                              * (a.rev_cents - b.rev_cents) > 0
                         THEN 1 ELSE 0 END) AS concordant,
                SUM(CASE WHEN (a.n_events - b.n_events)
                              * (a.rev_cents - b.rev_cents) < 0
                         THEN 1 ELSE 0 END) AS discordant,
                SUM(CASE WHEN a.n_events = b.n_events
                           OR a.rev_cents = b.rev_cents
                         THEN 1 ELSE 0 END) AS ties,
                COUNT(*) AS n_pairs
            FROM daily a JOIN daily b ON a.day < b.day
        )
        SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
               CAST(concordant AS BIGINT) AS concordant,
               CAST(discordant AS BIGINT) AS discordant,
               CAST(ties AS BIGINT) AS tied_pairs,
               {sql_round4(
                   'CAST(concordant - discordant AS DOUBLE) / n_pairs'
               )} AS kendall_tau_a
        FROM pairs
    """,
    tags=("ml", "stats", "correlation"),
)
def ml_kendall_tau(spark: SparkSession, sf: str) -> DataFrame:
    """Kendall's τ between daily traffic and daily revenue — the
    rank-concordance correlation that, unlike Pearson (``agg_stats``'s
    corr), is immune to outlier days and monotone transforms: count
    concordant vs discordant day pairs. The O(n²) pair enumeration is
    legal ONLY because it runs on the day-grain aggregate (≤30 rows →
    ≤435 pairs; the ``ml_theil_sen`` rule: quadratic after reduction,
    never on raw events). Revenue is compared in exact integer cents so
    concordance decisions are engine-identical; τ-a reported with the
    tie count alongside (τ-b's tie correction is a two-line extension)."""
    e = load_table(spark, sf, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.floor(dsum(F.col("value")) * 100.0 + 0.5).cast("bigint").alias(
            "rev_cents"
        ),
    )
    a = daily.select(
        F.col("day").alias("day_a"),
        F.col("n_events").alias("x_a"),
        F.col("rev_cents").alias("y_a"),
    )
    b = daily.select(
        F.col("day").alias("day_b"),
        F.col("n_events").alias("x_b"),
        F.col("rev_cents").alias("y_b"),
    )
    pairs = a.join(b, F.col("day_a") < F.col("day_b"))
    sign = (F.col("x_a") - F.col("x_b")) * (F.col("y_a") - F.col("y_b"))
    agg = pairs.agg(
        F.sum(F.when(sign > 0, 1).otherwise(0)).alias("concordant"),
        F.sum(F.when(sign < 0, 1).otherwise(0)).alias("discordant"),
        F.sum(
            F.when(
                (F.col("x_a") == F.col("x_b")) | (F.col("y_a") == F.col("y_b")), 1
            ).otherwise(0)
        ).alias("ties"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    return agg.select(
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.col("concordant").cast("bigint").alias("concordant"),
        F.col("discordant").cast("bigint").alias("discordant"),
        F.col("ties").cast("bigint").alias("tied_pairs"),
        round4(
            (F.col("concordant") - F.col("discordant")).cast("double")
            / F.col("n_pairs")
        ).alias("kendall_tau_a"),
    )


@query(
    "ml_winsorized_mean",
    oracle=f"""
        WITH fences AS (
            SELECT event_type,
                   quantile_cont(value, 0.05) AS lo,
                   quantile_cont(value, 0.95) AS hi
            FROM events GROUP BY event_type
        ),
        clamped AS (
            SELECT e.event_type,
                   e.value,
                   LEAST(GREATEST(e.value, f.lo), f.hi) AS wvalue,
                   CASE WHEN e.value < f.lo OR e.value > f.hi
                        THEN 1 ELSE 0 END AS clipped
            FROM events e JOIN fences f ON e.event_type = f.event_type
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(clipped) AS BIGINT) AS n_clipped,
               {sql_round4(sql_davg('value'))} AS raw_mean,
               {sql_round4(sql_davg('wvalue'))} AS winsorized_mean,
               {sql_round4(
                   sql_davg('value') + ' - (' + sql_davg('wvalue') + ')'
               )} AS outlier_pull
        FROM clamped
        GROUP BY event_type
    """,
    tags=("ml", "stats", "robust"),
)
def ml_winsorized_mean(spark: SparkSession, sf: str) -> DataFrame:
    """5/95% winsorized mean per series: tail values are CLAMPED to the
    percentile fences (not dropped — winsorizing keeps n and weights,
    unlike trimming: ``udaf_pandas_agg``'s trimmed mean is the dropping
    twin), and outlier_pull = raw − winsorized quantifies exactly how
    much the tails were steering the headline KPI. Same two-pass
    broadcast-fences shape as ``ml_outlier_iqr`` (sketch-swappable
    percentiles at 100 TB); both means ride the decimal convention so
    the pull is a difference of exact quantities, not noise."""
    e = load_table(spark, sf, "events")
    fences = e.groupBy("event_type").agg(
        F.percentile(F.col("value"), F.lit(0.05)).alias("lo"),
        F.percentile(F.col("value"), F.lit(0.95)).alias("hi"),
    )
    clamped = e.join(F.broadcast(fences), "event_type").select(
        "event_type", "value",
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias(
            "wvalue"
        ),
        F.when(
            (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1
        ).otherwise(0).alias("clipped"),
    )
    return clamped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("clipped").cast("bigint").alias("n_clipped"),
        round4(davg(F.col("value"))).alias("raw_mean"),
        round4(davg(F.col("wvalue"))).alias("winsorized_mean"),
        round4(davg(F.col("value")) - davg(F.col("wvalue"))).alias(
            "outlier_pull"
        ),
    )


@query(
    "ml_spearman",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x,
                   CAST(FLOOR({sql_dsum('value')} * 100.0 + 0.5) AS BIGINT)
                       AS y
            FROM events GROUP BY 1
        ),
        ranked AS (
            SELECT day,
                   RANK() OVER (ORDER BY x)
                       + (COUNT(*) OVER (PARTITION BY x) - 1) / 2.0 AS rx,
                   RANK() OVER (ORDER BY y)
                       + (COUNT(*) OVER (PARTITION BY y) - 1) / 2.0 AS ry
            FROM daily
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('rx')} AS sx,
                   {sql_dsum('ry')} AS sy,
                   {sql_dsum('rx * rx')} AS sxx,
                   {sql_dsum('ry * ry')} AS syy,
                   {sql_dsum('rx * ry')} AS sxy
            FROM ranked
        )
        SELECT n AS n_days,
               {sql_round4(
                   '(n * sxy - sx * sy)'
                   ' / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy))'
               )} AS spearman_rho
        FROM s
    """,
    tags=("ml", "stats", "correlation"),
)
def ml_spearman(spark: SparkSession, sf: str) -> DataFrame:
    """Spearman's ρ between daily traffic and daily revenue — Pearson
    correlation computed on fractional (average-tie) ranks, the robust
    companion to ``ml_kendall_tau`` on the same day-grain series. Ranks
    come from RANK() plus half the tie-group size, so they are exact
    multiples of 0.5 and every power sum underneath the closed-form
    Pearson expression is decimal-exact; the single float expression at
    the end is engine-identical. Windows are global but legal: they run
    on the ≤31-row daily aggregate (quadratic/ordered work only after
    reduction — at 100 TB the day grain is still tiny)."""
    e = load_table(spark, sf, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x"),
        F.floor(dsum(F.col("value")) * 100.0 + 0.5).cast("bigint").alias("y"),
    )
    rx = (
        F.rank().over(W.orderBy("x"))
        + (F.count(F.lit(1)).over(W.partitionBy("x")) - 1) / 2.0
    )
    ry = (
        F.rank().over(W.orderBy("y"))
        + (F.count(F.lit(1)).over(W.partitionBy("y")) - 1) / 2.0
    )
    ranked = daily.select(rx.alias("rx"), ry.alias("ry"))
    s = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(F.col("rx")).alias("sx"),
        dsum(F.col("ry")).alias("sy"),
        dsum(F.col("rx") * F.col("rx")).alias("sxx"),
        dsum(F.col("ry") * F.col("ry")).alias("syy"),
        dsum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    return s.select(
        n.alias("n_days"),
        round4(
            F.try_divide(
                n * F.col("sxy") - sx * sy,
                F.sqrt((n * F.col("sxx") - sx * sx) * (n * F.col("syy") - sy * sy)),
            )
        ).alias("spearman_rho"),
    )


@query(
    "ml_mann_whitney",
    oracle=f"""
        WITH both_groups AS (
            SELECT event_type, value
            FROM events
            WHERE event_type IN ('purchase', 'click')
        ),
        ranked AS (
            SELECT event_type,
                   RANK() OVER (ORDER BY value)
                       + (COUNT(*) OVER (PARTITION BY value) - 1) / 2.0
                       AS r
            FROM both_groups
        ),
        s AS (
            SELECT
                CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n1,
                CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n2,
                CAST(CAST(SUM(CASE WHEN event_type = 'purchase'
                                   THEN CAST(r AS DECIMAL(38,8)) END)
                          AS VARCHAR) AS DOUBLE) AS r1
            FROM ranked
        )
        SELECT n1, n2,
               {sql_round4('r1 - n1 * (n1 + 1) / 2.0')} AS u_stat,
               {sql_round4(
                   '(r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)'
                   ' / SQRT(n1 * n2 * (n1 + n2 + 1.0) / 12.0)'
               )} AS z_score
        FROM s
    """,
    tags=("ml", "stats", "test"),
)
def ml_mann_whitney(spark: SparkSession, sf: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) test: do purchase and click
    events draw `value` from the same distribution? Nonparametric
    two-sample companion to the Welch/KS tests already in the suite —
    rank the pooled sample with average-tie ranks, sum group-1 ranks,
    U₁ = R₁ − n₁(n₁+1)/2, and the large-sample normal z (tie variance
    correction omitted — values are continuous doubles, ties are
    measure-zero and both engines apply the identical formula). Ranks
    are 0.5-multiples so R₁'s decimal sum is exact. The global rank is
    the one single-partition window — the ``ml_auc_roc`` pattern; at
    100 TB it becomes a two-pass range-partitioned rank (per-partition
    local ranks + broadcast cumulative offsets)."""
    e = load_table(spark, sf, "events")
    both = e.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_type", "value"
    )
    r = (
        F.rank().over(W.orderBy("value"))
        + (F.count(F.lit(1)).over(W.partitionBy("value")) - 1) / 2.0
    )
    ranked = both.select("event_type", r.alias("r"))
    s = ranked.agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("r").cast(DEC))
        )
        .cast("double")
        .alias("r1"),
    )
    n1, n2, r1 = F.col("n1"), F.col("n2"), F.col("r1")
    u = r1 - n1 * (n1 + 1) / 2.0
    return s.select(
        n1,
        n2,
        round4(u).alias("u_stat"),
        round4(
            (u - n1 * n2 / 2.0)
            / F.sqrt(n1 * n2 * (n1 + n2 + 1.0) / 12.0)
        ).alias("z_score"),
    )


@query(
    "ml_levene_test",
    oracle=f"""
        WITH means AS (
            SELECT source, {sql_davg('CAST(n_chars AS DOUBLE)')} AS m
            FROM documents GROUP BY source
        ),
        dev AS (
            SELECT d.source, ABS(CAST(d.n_chars AS DOUBLE) - ms.m) AS z
            FROM documents d JOIN means ms ON d.source = ms.source
        ),
        groups AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('z')} AS s1,
                   {sql_dsum('z * z')} AS s2
            FROM dev GROUP BY source
        ),
        tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   {sql_dsum('s1')} AS g1,
                   {sql_dsum('s2')} AS g2
            FROM groups
        ),
        parts AS (
            SELECT t.k, t.n_tot,
                   {sql_dsum('g.s1 * g.s1 / g.n')}
                       - t.g1 * t.g1 / t.n_tot AS ss_between,
                   t.g2 - {sql_dsum('g.s1 * g.s1 / g.n')} AS ss_within
            FROM groups g CROSS JOIN tot t
            GROUP BY t.k, t.n_tot, t.g1, t.g2
        )
        SELECT k AS n_groups,
               n_tot AS n_docs,
               {sql_round4(
                   '(ss_between / (k - 1)) / (ss_within / (n_tot - k))'
               )} AS levene_w
        FROM parts
    """,
    tags=("ml", "stats", "test"),
)
def ml_levene_test(spark: SparkSession, sf: str) -> DataFrame:
    """Levene's test for homogeneity of variance across sources — do
    document-length *spreads* differ by source, not just their means
    (``ml_anova_oneway`` answers the means question on the same table)?
    Mean-centered variant: z = |x − x̄_g|, then the one-way-ANOVA F on
    z. Two scan passes by necessity (means, then deviations), but the
    second pass joins the 20-row group means via broadcast so nothing
    reshuffles the corpus; the F itself reduces from per-group power
    sums exactly as ANOVA does. Heteroscedastic lengths invalidate the
    pooled-variance assumption of plain ANOVA — run this first."""
    d = load_table(spark, sf, "documents")
    x = F.col("n_chars").cast("double")
    means = d.groupBy("source").agg(davg(x).alias("m"))
    dev = d.join(F.broadcast(means), "source").select(
        "source", F.abs(x - F.col("m")).alias("z")
    )
    groups = dev.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(F.col("z")).alias("s1"),
        dsum(F.col("z") * F.col("z")).alias("s2"),
    )
    tot = groups.agg(
        F.sum("n").cast("bigint").alias("n_tot"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        dsum(F.col("s1")).alias("g1"),
        dsum(F.col("s2")).alias("g2"),
    )
    parts = (
        groups.crossJoin(F.broadcast(tot))
        .groupBy("k", "n_tot", "g1", "g2")
        .agg(dsum(F.col("s1") * F.col("s1") / F.col("n")).alias("explained"))
    )
    ss_between = F.col("explained") - F.col("g1") * F.col("g1") / F.col("n_tot")
    ss_within = F.col("g2") - F.col("explained")
    return parts.select(
        F.col("k").alias("n_groups"),
        F.col("n_tot").alias("n_docs"),
        round4(
            F.try_divide(
                ss_between / (F.col("k") - 1),
                ss_within / (F.col("n_tot") - F.col("k")),
            )
        ).alias("levene_w"),
    )


@query(
    "ml_grubbs_test",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(FLOOR({sql_dsum('value')} * 100.0 + 0.5) AS BIGINT)
                       AS rev_cents
            FROM events GROUP BY 1
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('rev_cents')} AS s1,
                   {sql_dsum('CAST(rev_cents AS DOUBLE) * rev_cents')} AS s2
            FROM daily
        ),
        scored AS (
            SELECT d.day, d.rev_cents, s.n,
                   ABS(d.rev_cents - s.s1 / s.n)
                       / SQRT((s.n * s.s2 - s.s1 * s.s1) / (s.n * (s.n - 1.0)))
                       AS g
            FROM daily d CROSS JOIN s
        )
        SELECT n AS n_days,
               day AS outlier_day,
               rev_cents,
               {sql_round4('g')} AS g_stat
        FROM scored
        ORDER BY g DESC, day ASC
        LIMIT 1
    """,
    tags=("ml", "stats", "test", "outlier"),
)
def ml_grubbs_test(spark: SparkSession, sf: str) -> DataFrame:
    """Grubbs' maximum-studentized-deviate test on the daily-revenue
    series: G = max|xᵢ − x̄|/s — is the most extreme day an outlier
    beyond what a normal series of n days would produce? The series is
    integer cents at day grain, so the power sums behind x̄ and the
    sample s are exact and the studentization is one engine-identical
    float expression; argmax ties break on the day. Reduction-first
    discipline: the quadratic-free single pass aggregates 100 TB of
    events to ≤31 rows before any per-row scoring, and the 1-row stats
    frame is broadcast, not windowed."""
    e = load_table(spark, sf, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.floor(dsum(F.col("value")) * 100.0 + 0.5).cast("bigint").alias(
            "rev_cents"
        )
    )
    s = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(F.col("rev_cents")).alias("s1"),
        dsum(F.col("rev_cents").cast("double") * F.col("rev_cents")).alias(
            "s2"
        ),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    g = F.try_divide(
        F.abs(F.col("rev_cents") - s1 / n),
        F.sqrt(F.try_divide(n * s2 - s1 * s1, n * (n - 1.0))),
    )
    return (
        daily.crossJoin(F.broadcast(s))
        .select(
            n.alias("n_days"),
            F.col("day").alias("outlier_day"),
            "rev_cents",
            round4(g).alias("g_stat"),
            g.alias("_g"),
        )
        .orderBy(F.col("_g").desc(), F.col("outlier_day").asc())
        .limit(1)
        .drop("_g")
    )


@query(
    "ml_cronbach_alpha",
    oracle=f"""
        WITH items AS (
            SELECT CAST(embedding[1] AS DOUBLE) AS x1,
                   CAST(embedding[2] AS DOUBLE) AS x2,
                   CAST(embedding[3] AS DOUBLE) AS x3,
                   CAST(embedding[4] AS DOUBLE) AS x4,
                   CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
                       + CAST(embedding[3] AS DOUBLE)
                       + CAST(embedding[4] AS DOUBLE) AS t
            FROM embeddings
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('x1')} AS s1_1, {sql_dsum('x1 * x1')} AS s2_1,
                   {sql_dsum('x2')} AS s1_2, {sql_dsum('x2 * x2')} AS s2_2,
                   {sql_dsum('x3')} AS s1_3, {sql_dsum('x3 * x3')} AS s2_3,
                   {sql_dsum('x4')} AS s1_4, {sql_dsum('x4 * x4')} AS s2_4,
                   {sql_dsum('t')} AS st1, {sql_dsum('t * t')} AS st2
            FROM items
        ),
        v AS (
            SELECT n,
                   (n * s2_1 - s1_1 * s1_1) / (n * (n - 1.0))
                 + (n * s2_2 - s1_2 * s1_2) / (n * (n - 1.0))
                 + (n * s2_3 - s1_3 * s1_3) / (n * (n - 1.0))
                 + (n * s2_4 - s1_4 * s1_4) / (n * (n - 1.0)) AS item_var,
                   (n * st2 - st1 * st1) / (n * (n - 1.0)) AS total_var
            FROM s
        )
        SELECT n AS n_vecs,
               CAST(4 AS BIGINT) AS k_items,
               {sql_round4('item_var')} AS sum_item_var,
               {sql_round4('total_var')} AS total_var,
               {sql_round4('(4.0 / 3.0) * (1.0 - item_var / total_var)')}
                   AS cronbach_alpha
        FROM v
    """,
    tags=("ml", "stats", "embedding"),
)
def ml_cronbach_alpha(spark: SparkSession, sf: str) -> DataFrame:
    """Cronbach's α internal-consistency coefficient treating the first
    four embedding dimensions as scale items: α = k/(k−1)·(1 − Σσ²ᵢ/σ²ₜ)
    where σ²ₜ is the variance of the per-row item sum. The embedding
    audit question it answers: do leading dimensions co-vary like one
    latent factor (α→1) or carry independent signal (α→0 or negative —
    what a well-trained decorrelated embedding should show)? One
    aggregation pass collects all ten power sums; float32 dims are cast
    to double identically on both engines and every sum is decimal-
    exact, leaving one float expression per output cell."""
    em = load_table(spark, sf, "embeddings")
    xs = [F.col("embedding")[i].cast("double") for i in range(4)]
    t = xs[0] + xs[1] + xs[2] + xs[3]
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for i, x in enumerate(xs, 1):
        aggs.append(dsum(x).alias(f"s1_{i}"))
        aggs.append(dsum(x * x).alias(f"s2_{i}"))
    aggs.append(dsum(t).alias("st1"))
    aggs.append(dsum(t * t).alias("st2"))
    s = em.agg(*aggs)
    n = F.col("n")
    denom = n * (n - 1.0)
    item_var = sum(
        (n * F.col(f"s2_{i}") - F.col(f"s1_{i}") * F.col(f"s1_{i}")) / denom
        for i in range(1, 5)
    )
    total_var = (n * F.col("st2") - F.col("st1") * F.col("st1")) / denom
    return s.select(
        n.alias("n_vecs"),
        F.lit(4).cast("bigint").alias("k_items"),
        round4(item_var).alias("sum_item_var"),
        round4(total_var).alias("total_var"),
        round4((4.0 / 3.0) * (1.0 - item_var / total_var)).alias(
            "cronbach_alpha"
        ),
    )


@query(
    "ml_durbin_watson",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(FLOOR({sql_dsum('value')} * 100.0 + 0.5) AS BIGINT)
                       AS y
            FROM events GROUP BY 1
        ),
        idx AS (
            SELECT day, y,
                   CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
            FROM daily
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('i')} AS si, {sql_dsum('CAST(i AS DOUBLE) * i')} AS sii,
                   {sql_dsum('y')} AS sy, {sql_dsum('CAST(i AS DOUBLE) * y')} AS siy
            FROM idx
        ),
        fit AS (
            SELECT n,
                   (n * siy - si * sy) / (n * sii - si * si) AS b,
                   sy / n - (n * siy - si * sy) / (n * sii - si * si) * si / n
                       AS a
            FROM s
        ),
        resid AS (
            SELECT x.day, x.i,
                   x.y - (f.a + f.b * x.i) AS e,
                   f.n
            FROM idx x CROSS JOIN fit f
        ),
        lagged AS (
            SELECT n, e,
                   e - LAG(e) OVER (ORDER BY i) AS de
            FROM resid
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_days,
               {sql_round4(f"{sql_dsum('de * de')} / {sql_dsum('e * e')}")}
                   AS durbin_watson
        FROM lagged
    """,
    tags=("ml", "stats", "timeseries"),
)
def ml_durbin_watson(spark: SparkSession, sf: str) -> DataFrame:
    """Durbin–Watson autocorrelation test on detrended daily revenue:
    fit the OLS trend line in closed form (power sums, one pass over the
    day grain), take residuals, and report DW = Σ(eₜ−eₜ₋₁)²/Σeₜ² — ≈2
    means white-noise residuals, →0 positive serial correlation (the
    trend missed a regime), →4 negative (overdifferencing). The lag
    window and row-number run on the ≤31-row daily series after the
    100 TB-of-events reduction; residuals are doubles fed through
    decimal sums so the ratio is partition-order invariant."""
    e = load_table(spark, sf, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.floor(dsum(F.col("value")) * 100.0 + 0.5).cast("bigint").alias("y")
    )
    idx = daily.select(
        "day", "y", F.row_number().over(W.orderBy("day")).cast("bigint").alias("i")
    )
    s = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(F.col("i")).alias("si"),
        dsum(F.col("i").cast("double") * F.col("i")).alias("sii"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("i").cast("double") * F.col("y")).alias("siy"),
    )
    n = F.col("n")
    b = F.try_divide(
        n * F.col("siy") - F.col("si") * F.col("sy"),
        n * F.col("sii") - F.col("si") * F.col("si"),
    )
    fit = s.select("n", b.alias("b"), (F.col("sy") / n - b * F.col("si") / n).alias("a"))
    resid = idx.crossJoin(F.broadcast(fit)).select(
        "n", "i", (F.col("y") - (F.col("a") + F.col("b") * F.col("i"))).alias("e")
    )
    lagged = resid.select(
        "n", "e", (F.col("e") - F.lag("e").over(W.orderBy("i"))).alias("de")
    )
    return lagged.agg(
        F.max("n").cast("bigint").alias("n_days"),
        round4(
            dsum(F.col("de") * F.col("de")) / dsum(F.col("e") * F.col("e"))
        ).alias("durbin_watson"),
    )


@query(
    "ml_jackknife_ratio",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x,
                   CAST(FLOOR({sql_dsum('value')} * 100.0 + 0.5) AS BIGINT)
                       AS y
            FROM events GROUP BY 1
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy
            FROM daily
        ),
        loo AS (
            SELECT t.n, t.sx, t.sy,
                   CAST(t.sy - d.y AS DOUBLE) / (t.sx - d.x) AS r_i
            FROM daily d CROSS JOIN tot t
        ),
        s AS (
            SELECT n, sx, sy,
                   {sql_dsum('r_i')} AS s1,
                   {sql_dsum('r_i * r_i')} AS s2
            FROM loo GROUP BY n, sx, sy
        )
        SELECT n AS n_days,
               {sql_round4('CAST(sy AS DOUBLE) / sx')} AS ratio_cents,
               {sql_round4('(n - 1.0) * (s1 / n - CAST(sy AS DOUBLE) / sx)')}
                   AS jack_bias,
               {sql_round4(
                   'SQRT((n - 1.0) / n * (s2 - s1 * s1 / n))'
               )} AS jack_se
        FROM s
    """,
    tags=("ml", "stats", "resampling"),
)
def ml_jackknife_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """Delete-one jackknife for the ratio estimator revenue-per-event
    (a nonlinear statistic whose naive SE is biased): with day-grain
    totals (xᵢ events, yᵢ cents), each leave-one-out replicate is the
    closed form (Sy−yᵢ)/(Sx−xᵢ) — no resampling pass, just the totals
    broadcast back over the 31 rows. Reports the plug-in ratio, the
    jackknife bias estimate (n−1)(R̄₍₋₎−R̂), and the jackknife SE from
    power sums of the replicates. The whole procedure is two tiny
    aggregates after the one corpus scan, the pattern for jackknifing
    any smooth statistic at 100 TB: replicate over GROUPS, not rows."""
    e = load_table(spark, sf, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x"),
        F.floor(dsum(F.col("value")) * 100.0 + 0.5).cast("bigint").alias("y"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
    )
    loo = daily.crossJoin(F.broadcast(tot)).select(
        "n", "sx", "sy",
        F.try_divide((F.col("sy") - F.col("y")).cast("double"), F.col("sx") - F.col("x")).alias("r_i"),
    )
    s = loo.groupBy("n", "sx", "sy").agg(
        dsum(F.col("r_i")).alias("s1"),
        dsum(F.col("r_i") * F.col("r_i")).alias("s2"),
    )
    n = F.col("n")
    ratio = F.col("sy").cast("double") / F.col("sx")
    return s.select(
        n.alias("n_days"),
        round4(ratio).alias("ratio_cents"),
        round4((n - 1.0) * (F.col("s1") / n - ratio)).alias("jack_bias"),
        round4(
            F.sqrt((n - 1.0) / n * (F.col("s2") - F.col("s1") * F.col("s1") / n))
        ).alias("jack_se"),
    )


@query(
    "ml_ridge_path",
    oracle=f"""
        WITH s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('l_quantity')} AS sx1,
                   {sql_dsum('l_discount')} AS sx2,
                   {sql_dsum('l_extendedprice')} AS sy,
                   {sql_dsum('l_quantity * l_quantity')} AS sx1x1,
                   {sql_dsum('l_quantity * l_discount')} AS sx1x2,
                   {sql_dsum('l_discount * l_discount')} AS sx2x2,
                   {sql_dsum('l_quantity * l_extendedprice')} AS sx1y,
                   {sql_dsum('l_discount * l_extendedprice')} AS sx2y,
                   {sql_dsum('l_extendedprice * l_extendedprice')} AS syy
            FROM lineitem
        ),
        r AS (
            SELECT n,
                   (n * sx1x2 - sx1 * sx2)
                       / SQRT((n * sx1x1 - sx1 * sx1) * (n * sx2x2 - sx2 * sx2))
                       AS r12,
                   (n * sx1y - sx1 * sy)
                       / SQRT((n * sx1x1 - sx1 * sx1) * (n * syy - sy * sy))
                       AS r1y,
                   (n * sx2y - sx2 * sy)
                       / SQRT((n * sx2x2 - sx2 * sx2) * (n * syy - sy * sy))
                       AS r2y
            FROM s
        )
        SELECT CAST(lam AS DOUBLE) AS lam,
               {sql_round4(
                   '((1.0 + lam) * r1y - r12 * r2y)'
                   ' / ((1.0 + lam) * (1.0 + lam) - r12 * r12)'
               )} AS beta_qty_std,
               {sql_round4(
                   '((1.0 + lam) * r2y - r12 * r1y)'
                   ' / ((1.0 + lam) * (1.0 + lam) - r12 * r12)'
               )} AS beta_disc_std
        FROM r CROSS JOIN (VALUES (0.0), (0.1), (1.0), (10.0)) AS l(lam)
    """,
    tags=("ml", "regression"),
)
def ml_ridge_path(spark: SparkSession, sf: str) -> DataFrame:
    """Ridge regularization path for the standardized two-feature
    regression price ~ quantity + discount: solve (R + λI)β = r on the
    correlation matrix at λ ∈ {0, 0.1, 1, 10} — λ=0 reproduces OLS
    (``ml_linreg_multi``'s standardized twin), growing λ shows the
    coefficients shrinking toward zero, the collinearity diagnostic in
    four rows. The key scale property: ALL λ values share the single
    sufficient-statistics pass (9 decimal-exact power sums); the path is
    a 4-row cross join against one broadcast row, so exploring 100
    λ values costs zero extra scans of 100 TB. ``spread`` fans the
    serial fixture scan cores-wide — the decimal power sums are
    order-independent, so the path is bit-identical."""
    li = spread(
        load_table(spark, sf, "lineitem"), "l_orderkey", sf=sf, table="lineitem"
    )
    x1, x2, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    s = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(x1).alias("sx1"),
        dsum(x2).alias("sx2"),
        dsum(y).alias("sy"),
        dsum(x1 * x1).alias("sx1x1"),
        dsum(x1 * x2).alias("sx1x2"),
        dsum(x2 * x2).alias("sx2x2"),
        dsum(x1 * y).alias("sx1y"),
        dsum(x2 * y).alias("sx2y"),
        dsum(y * y).alias("syy"),
    )
    n = F.col("n")
    r12 = F.try_divide(
        n * F.col("sx1x2") - F.col("sx1") * F.col("sx2"),
        F.sqrt(
            (n * F.col("sx1x1") - F.col("sx1") * F.col("sx1"))
            * (n * F.col("sx2x2") - F.col("sx2") * F.col("sx2"))
        ),
    )
    r1y = F.try_divide(
        n * F.col("sx1y") - F.col("sx1") * F.col("sy"),
        F.sqrt(
            (n * F.col("sx1x1") - F.col("sx1") * F.col("sx1"))
            * (n * F.col("syy") - F.col("sy") * F.col("sy"))
        ),
    )
    r2y = F.try_divide(
        n * F.col("sx2y") - F.col("sx2") * F.col("sy"),
        F.sqrt(
            (n * F.col("sx2x2") - F.col("sx2") * F.col("sx2"))
            * (n * F.col("syy") - F.col("sy") * F.col("sy"))
        ),
    )
    r = s.select("n", r12.alias("r12"), r1y.alias("r1y"), r2y.alias("r2y"))
    # λ grid as a JVM-side explode, not createDataFrame(list) (round 10,
    # guide §4: the pickled-rows local relation plans a Python-RDD scan
    # per invocation just to emit 4 constant doubles)
    joined = r.select(
        "n", "r12", "r1y", "r2y",
        F.explode(
            F.array(F.lit(0.0), F.lit(0.1), F.lit(1.0), F.lit(10.0))
        ).alias("lam"),
    )
    det = (1.0 + F.col("lam")) * (1.0 + F.col("lam")) - F.col("r12") * F.col("r12")
    return joined.select(
        "lam",
        round4(
            ((1.0 + F.col("lam")) * F.col("r1y") - F.col("r12") * F.col("r2y")) / det
        ).alias("beta_qty_std"),
        round4(
            ((1.0 + F.col("lam")) * F.col("r2y") - F.col("r12") * F.col("r1y")) / det
        ).alias("beta_disc_std"),
    )


@query(
    "ml_poisson_dispersion",
    oracle=f"""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(c) AS BIGINT) AS s1,
                   {sql_dsum('CAST(c AS DOUBLE) * c')} AS s2
            FROM hourly
        )
        SELECT n AS n_hours,
               {sql_round4('CAST(s1 AS DOUBLE) / n')} AS mean_count,
               {sql_round4('(n * s2 - CAST(s1 AS DOUBLE) * s1) / (n * (n - 1.0))')}
                   AS var_count,
               {sql_round4(
                   '((n * s2 - CAST(s1 AS DOUBLE) * s1) / (n * (n - 1.0)))'
                   ' / (CAST(s1 AS DOUBLE) / n)'
               )} AS dispersion_index,
               {sql_round4(
                   '(((n * s2 - CAST(s1 AS DOUBLE) * s1) / (n * (n - 1.0)))'
                   ' / (CAST(s1 AS DOUBLE) / n) - 1.0)'
                   ' * SQRT(GREATEST((n - 1.0) / 2.0, 0.0))'
               )} AS z_score
        FROM s
    """,
    tags=("ml", "stats", "test"),
)
def ml_poisson_dispersion(spark: SparkSession, sf: str) -> DataFrame:
    """Poisson dispersion (index-of-dispersion) test on hourly event
    counts: D = s²/x̄ with the normal approximation z ≈ (D−1)·√((n−1)/2)
    — D ≈ 1 is Poisson arrivals, D ≫ 1 overdispersion (bursty traffic ⇒
    negative-binomial capacity models; ``workload_burstiness``'s Fano
    factor at a different grain answers the same question per type,
    this is the corpus-level significance test). Counts reduce 100 TB
    of events to ~720 hourly rows in one aggregate; power sums are
    exact (integer counts through decimal), and mean/variance/z are
    single float expressions."""
    e = load_table(spark, sf, "events")
    hourly = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    s = hourly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s1"),
        dsum(F.col("c").cast("double") * F.col("c")).alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    # try_divide everywhere a count can hit 0 (empty) or 1 (total-skew
    # collapses all events to one hour): DuckDB's x/0 is already NULL.
    # Duck guards its SQRT with GREATEST; Spark's sqrt(-x)=NaN is absorbed
    # by the NULL numerator in the same degenerate cases.
    mean = F.try_divide(s1.cast("double"), n)
    var = F.try_divide(n * s2 - s1.cast("double") * s1, n * (n - 1.0))
    return s.select(
        n.alias("n_hours"),
        round4(mean).alias("mean_count"),
        round4(var).alias("var_count"),
        round4(F.try_divide(var, mean)).alias("dispersion_index"),
        round4(
            (F.try_divide(var, mean) - 1.0) * F.sqrt((n - 1.0) / 2.0)
        ).alias("z_score"),
    )


@query(
    "ml_runs_test",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(FLOOR({sql_dsum('value')} * 100.0 + 0.5) AS BIGINT)
                       AS y
            FROM events GROUP BY 1
        ),
        flagged AS (
            SELECT day, y,
                   CASE WHEN CAST(y AS DOUBLE)
                             > CAST(SUM(y) OVER () AS DOUBLE)
                               / COUNT(*) OVER ()
                        THEN 1 ELSE 0 END AS above
            FROM daily
        ),
        runs AS (
            SELECT above,
                   CASE WHEN above <> LAG(above) OVER (ORDER BY day)
                          OR LAG(above) OVER (ORDER BY day) IS NULL
                        THEN 1 ELSE 0 END AS new_run
            FROM flagged
        ),
        s AS (
            SELECT CAST(SUM(new_run) AS BIGINT) AS r,
                   CAST(SUM(above) AS BIGINT) AS n1,
                   CAST(SUM(1 - above) AS BIGINT) AS n2
            FROM runs
        )
        SELECT n1 AS n_above,
               n2 AS n_below,
               r AS n_runs,
               {sql_round4('2.0 * n1 * n2 / (n1 + n2) + 1.0')} AS expected_runs,
               {sql_round4(
                   '(r - (2.0 * n1 * n2 / (n1 + n2) + 1.0))'
                   ' / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)'
                   '        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0)))'
               )} AS z_score
        FROM s
    """,
    tags=("ml", "stats", "test"),
)
def ml_runs_test(spark: SparkSession, sf: str) -> DataFrame:
    """Wald–Wolfowitz runs test for randomness of the daily revenue
    series around its mean: count maximal runs of consecutive
    above/below days, compare against E[R] = 2n₁n₂/n + 1 with the
    exact-permutation variance — too FEW runs means sticky regimes
    (serial dependence; cf. ``ml_durbin_watson`` on residuals), too
    many means oscillation. Run starts are lag transitions (no
    gaps-and-islands grouping needed when only the COUNT of runs
    matters), flags compare exact integer cents to the exact-ratio
    mean, and the z is one float expression over three integers."""
    e = load_table(spark, sf, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.floor(dsum(F.col("value")) * 100.0 + 0.5).cast("bigint").alias("y")
    )
    wall = W.orderBy("day").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    flagged = daily.select(
        "day",
        F.when(
            F.col("y").cast("double")
            > F.sum("y").over(wall).cast("double") / F.count(F.lit(1)).over(wall),
            1,
        )
        .otherwise(0)
        .alias("above"),
    )
    lag = F.lag("above").over(W.orderBy("day"))
    runs = flagged.select(
        "above",
        F.when(lag.isNull() | (F.col("above") != lag), 1).otherwise(0).alias(
            "new_run"
        ),
    )
    s = runs.agg(
        F.sum("new_run").cast("bigint").alias("r"),
        F.sum("above").cast("bigint").alias("n1"),
        F.sum(1 - F.col("above")).cast("bigint").alias("n2"),
    )
    r, n1, n2 = F.col("r"), F.col("n1"), F.col("n2")
    n = n1 + n2
    er = 2.0 * n1 * n2 / n + 1.0
    vr = F.try_divide(
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2), n * n * (n - 1.0)
    )
    return s.select(
        n1.alias("n_above"),
        n2.alias("n_below"),
        r.alias("n_runs"),
        round4(er).alias("expected_runs"),
        round4(F.try_divide(r - er, F.sqrt(vr))).alias("z_score"),
    )


@query(
    "ml_cohens_d",
    oracle=f"""
        WITH g AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('value')} AS s1,
                   {sql_dsum('value * value')} AS s2
            FROM events
            WHERE event_type IN ('purchase', 'click')
            GROUP BY event_type
        ),
        w AS (
            SELECT
                MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
                MAX(CASE WHEN event_type = 'purchase' THEN s1 END) AS a1,
                MAX(CASE WHEN event_type = 'purchase' THEN s2 END) AS a2,
                MAX(CASE WHEN event_type = 'click' THEN n END) AS n2,
                MAX(CASE WHEN event_type = 'click' THEN s1 END) AS b1,
                MAX(CASE WHEN event_type = 'click' THEN s2 END) AS b2
            FROM g
        ),
        d AS (
            SELECT n1, n2,
                   a1 / n1 - b1 / n2 AS mean_diff,
                   SQRT((
                       (a2 - a1 * a1 / n1) + (b2 - b1 * b1 / n2)
                   ) / (n1 + n2 - 2.0)) AS sd_pooled
            FROM w
        )
        SELECT CAST(n1 AS BIGINT) AS n_purchase,
               CAST(n2 AS BIGINT) AS n_click,
               {sql_round4('mean_diff')} AS mean_diff,
               {sql_round4('sd_pooled')} AS sd_pooled,
               {sql_round4('mean_diff / sd_pooled')} AS cohens_d,
               {sql_round4(
                   '(mean_diff / sd_pooled)'
                   ' * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))'
               )} AS hedges_g
        FROM d
    """,
    tags=("ml", "stats", "effect-size"),
)
def ml_cohens_d(spark: SparkSession, sf: str) -> DataFrame:
    """Standardized effect size between purchase and click values:
    Cohen's d on the pooled SD plus Hedges' g small-sample correction —
    the number a significance test (``ml_mann_whitney``, Welch) should
    always ship with, because at 100 TB row counts EVERYTHING is
    significant and only effect size says whether it matters. One
    grouped aggregate collects both groups' power sums; the pivot to
    one row is a 2-row MAX-CASE (no join), and mean-difference, pooled
    SD, d and g are single float expressions over decimal-exact sums."""
    e = load_table(spark, sf, "events")
    g = (
        e.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            dsum(F.col("value")).alias("s1"),
            dsum(F.col("value") * F.col("value")).alias("s2"),
        )
    )
    p = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    w = g.agg(
        F.max(F.when(p == 1, F.col("n"))).alias("n1"),
        F.max(F.when(p == 1, F.col("s1"))).alias("a1"),
        F.max(F.when(p == 1, F.col("s2"))).alias("a2"),
        F.max(F.when(p == 0, F.col("n"))).alias("n2"),
        F.max(F.when(p == 0, F.col("s1"))).alias("b1"),
        F.max(F.when(p == 0, F.col("s2"))).alias("b2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    mean_diff = F.col("a1") / n1 - F.col("b1") / n2
    sd_pooled = F.sqrt(
        (
            (F.col("a2") - F.col("a1") * F.col("a1") / n1)
            + (F.col("b2") - F.col("b1") * F.col("b1") / n2)
        )
        / (n1 + n2 - 2.0)
    )
    d = mean_diff / sd_pooled
    return w.select(
        n1.cast("bigint").alias("n_purchase"),
        n2.cast("bigint").alias("n_click"),
        round4(mean_diff).alias("mean_diff"),
        round4(sd_pooled).alias("sd_pooled"),
        round4(d).alias("cohens_d"),
        round4(d * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))).alias("hedges_g"),
    )


@query(
    "ml_hill_tail_index",
    oracle=f"""
        WITH ranked AS (
            SELECT o_totalprice,
                   ROW_NUMBER() OVER (ORDER BY o_totalprice DESC,
                                      o_orderkey ASC) AS rn
            FROM orders
        ),
        topk AS (SELECT o_totalprice, rn FROM ranked WHERE rn <= 101),
        xk AS (SELECT o_totalprice AS x_k FROM topk WHERE rn = 101)
        SELECT CAST(100 AS BIGINT) AS k,
               {sql_round4('MIN(x.x_k)')} AS threshold,
               {sql_round4(sql_davg('LN(t.o_totalprice / x.x_k)'))}
                   AS mean_log_excess,
               {sql_round4(
                   f"1.0 / ({sql_davg('LN(t.o_totalprice / x.x_k)')})"
               )} AS hill_alpha
        FROM topk t CROSS JOIN xk x
        WHERE t.rn <= 100
    """,
    tags=("ml", "stats", "tail"),
)
def ml_hill_tail_index(spark: SparkSession, sf: str) -> DataFrame:
    """Hill estimator of the Pareto tail index on order values: α̂ =
    1/mean(ln(x₍ᵢ₎/x₍ₖ₊₁₎)) over the top k=100 order statistics — the
    standard answer to 'how heavy is the spend tail' that decides
    whether mean-based LTV math is even finite (α ≤ 1: infinite mean;
    α ≤ 2: infinite variance — see ``ml_mean_excess_tail`` for the
    complementary mean-excess view). Top-(k+1) comes from a rank window
    that Spark ≥3.5 executes as a pushed-down window-group-limit (no
    global sort materialization); the log-excess mean uses the decimal
    sum convention. At 100 TB, k ≪ n makes this a top-k reduction, not
    a sort."""
    o = load_table(spark, sf, "orders")
    ranked = o.select(
        "o_totalprice",
        F.row_number()
        .over(W.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc()))
        .alias("rn"),
    ).filter(F.col("rn") <= 101)
    xk = ranked.filter(F.col("rn") == 101).select(
        F.col("o_totalprice").alias("x_k")
    )
    top = ranked.filter(F.col("rn") <= 100)
    j = top.crossJoin(F.broadcast(xk))
    log_excess = F.log(F.col("o_totalprice") / F.col("x_k"))
    return j.agg(
        F.lit(100).cast("bigint").alias("k"),
        round4(F.min("x_k")).alias("threshold"),
        round4(davg(log_excess)).alias("mean_log_excess"),
        round4(F.lit(1.0) / davg(log_excess)).alias("hill_alpha"),
    )


@query(
    "ml_friedman_test",
    oracle=f"""
        WITH cell AS (
            SELECT CAST(ts AS DATE) AS day, event_type,
                   CAST(FLOOR({sql_dsum('value')} * 100.0 + 0.5) AS BIGINT)
                       AS y
            FROM events GROUP BY 1, 2
        ),
        full_days AS (
            SELECT day FROM cell GROUP BY day HAVING COUNT(*) = 5
        ),
        ranked AS (
            SELECT c.day, c.event_type,
                   RANK() OVER (PARTITION BY c.day ORDER BY c.y)
                       + (COUNT(*) OVER (PARTITION BY c.day, c.y) - 1) / 2.0
                       AS r
            FROM cell c JOIN full_days f ON c.day = f.day
        ),
        rsum AS (
            SELECT event_type, {sql_dsum('r')} AS rj,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM ranked GROUP BY event_type
        )
        SELECT CAST(MIN(n) AS BIGINT) AS n_days,
               CAST(COUNT(*) AS BIGINT) AS k_treatments,
               {sql_round4(
                   f"12.0 / (MIN(n) * COUNT(*) * (COUNT(*) + 1))"
                   f" * {sql_dsum('rj * rj')}"
                   f" - 3.0 * MIN(n) * (COUNT(*) + 1)"
               )} AS friedman_q
        FROM rsum
    """,
    tags=("ml", "stats", "test"),
)
def ml_friedman_test(spark: SparkSession, sf: str) -> DataFrame:
    """Friedman's rank test — the repeated-measures ANOVA without
    normality: within each day (block), rank the five event types by
    revenue, then Q = 12/(nk(k+1))·ΣR_j² − 3n(k+1) asks whether any
    type systematically out-earns the others across days, immune to
    day-level scale shifts that would dominate the raw two-way layout.
    Ranks are within-block windows (partitioned by day — fully
    distributed, no global sort), average-tie fractional so rank sums
    stay decimal-exact; incomplete blocks are filtered first, as the
    test requires. χ²₍ₖ₋₁₎ reference: Q > 9.49 rejects at 5% for
    k=5."""
    e = load_table(spark, sf, "events")
    cell = e.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(
        F.floor(dsum(F.col("value")) * 100.0 + 0.5).cast("bigint").alias("y")
    )
    full_days = cell.groupBy("day").agg(F.count(F.lit(1)).alias("kk")).filter(
        F.col("kk") == 5
    ).select("day")
    r = (
        F.rank().over(W.partitionBy("day").orderBy("y"))
        + (F.count(F.lit(1)).over(W.partitionBy("day", "y")) - 1) / 2.0
    )
    ranked = cell.join(F.broadcast(full_days), "day").select(
        "event_type", r.alias("r")
    )
    rsum = ranked.groupBy("event_type").agg(
        dsum(F.col("r")).alias("rj"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    n, k = F.min("n"), F.count(F.lit(1))
    return rsum.agg(
        n.cast("bigint").alias("n_days"),
        k.cast("bigint").alias("k_treatments"),
        round4(
            12.0 / (n * k * (k + 1)) * dsum(F.col("rj") * F.col("rj"))
            - 3.0 * n * (k + 1)
        ).alias("friedman_q"),
    )


@query(
    "ml_fleiss_kappa",
    oracle=f"""
        WITH votes AS (
            SELECT doc_id,
                   CAST(CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END
                      + CASE WHEN LEN(STRING_SPLIT(text, ' ')) >= 40
                             THEN 1 ELSE 0 END
                      + CASE WHEN CAST(n_chars AS DOUBLE)
                                  / LEN(STRING_SPLIT(text, ' ')) >= 6.0
                             THEN 1 ELSE 0 END AS BIGINT) AS n_pos
            FROM documents
        ),
        agree AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('(n_pos * n_pos + (3 - n_pos) * (3 - n_pos) - 3)'
                             ' / 6.0')} AS sum_pi,
                   {sql_dsum('n_pos')} AS tot_pos
            FROM votes
        )
        SELECT n AS n_docs,
               {sql_round4('sum_pi / n')} AS p_bar,
               {sql_round4(
                   'POWER(tot_pos / (3.0 * n), 2)'
                   ' + POWER(1.0 - tot_pos / (3.0 * n), 2)'
               )} AS p_e,
               {sql_round4(
                   '(sum_pi / n - (POWER(tot_pos / (3.0 * n), 2)'
                   ' + POWER(1.0 - tot_pos / (3.0 * n), 2)))'
                   ' / (1.0 - (POWER(tot_pos / (3.0 * n), 2)'
                   ' + POWER(1.0 - tot_pos / (3.0 * n), 2)))'
               )} AS fleiss_kappa
        FROM agree
    """,
    tags=("ml", "stats", "agreement"),
)
def ml_fleiss_kappa(spark: SparkSession, sf: str) -> DataFrame:
    """Fleiss' κ agreement among three deterministic quality 'raters'
    (char-length, word-count, and word-length screens voting each
    document good/bad) — the multi-rater generalization of
    ``ml_cohens_kappa``, and the exact computation a labeling pipeline
    runs over rater triples before trusting majority vote. Per-item
    agreement P_i = (Σn_ij² − r)/(r(r−1)) with r=3 reduces to a
    closed form in the positive-vote count, so the whole test is ONE
    aggregate over per-row integer votes; chance agreement comes from
    the pooled category shares. κ near 0 here means the three
    heuristics measure different things — stack them, don't vote
    them."""
    d = load_table(spark, sf, "documents")
    words = F.size(F.split("text", " "))
    n_pos = (
        F.when(F.col("n_chars") >= 250, 1).otherwise(0)
        + F.when(words >= 40, 1).otherwise(0)
        + F.when(F.col("n_chars").cast("double") / words >= 6.0, 1).otherwise(0)
    ).cast("bigint")
    votes = d.select(n_pos.alias("n_pos"))
    pi = (
        F.col("n_pos") * F.col("n_pos")
        + (3 - F.col("n_pos")) * (3 - F.col("n_pos"))
        - 3
    ) / 6.0
    agree = votes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(pi).alias("sum_pi"),
        dsum(F.col("n_pos")).alias("tot_pos"),
    )
    n = F.col("n")
    p_bar = F.col("sum_pi") / n
    share = F.col("tot_pos") / (3.0 * n)
    p_e = F.pow(share, 2) + F.pow(1.0 - share, 2)
    return agree.select(
        n.alias("n_docs"),
        round4(p_bar).alias("p_bar"),
        round4(p_e).alias("p_e"),
        round4(F.try_divide(p_bar - p_e, 1.0 - p_e)).alias("fleiss_kappa"),
    )


# Normal CDF via the Abramowitz–Stegun 7.1.26 erf polynomial — the SAME
# closed-form arithmetic on both engines (neither ships erf as SQL), so
# p-values are bit-identical by construction rather than by library luck.
def _sql_norm_sf(z: str) -> str:
    t = f"(1.0 / (1.0 + 0.3275911 * ({z}) / 1.4142135623730951))"
    poly = (
        f"({t} * (0.254829592 + {t} * (-0.284496736 + {t} * (1.421413741 "
        f"+ {t} * (-1.453152027 + {t} * 1.061405429)))))"
    )
    # sf(z) = (1 - erf(z/sqrt(2))) / 2 for z >= 0
    return f"({poly} * EXP(-(({z}) * ({z})) / 2.0) / 2.0)"


def _norm_sf(z):
    t = 1.0 / (1.0 + 0.3275911 * z / 1.4142135623730951)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return poly * F.exp(-(z * z) / 2.0) / 2.0


@query(
    "ml_benjamini_hochberg",
    oracle=f"""
        WITH g AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('value')} AS s1,
                   {sql_dsum('value * value')} AS s2
            FROM events GROUP BY event_type
        ),
        tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS nt,
                   {sql_dsum('s1')} AS t1,
                   {sql_dsum('s2')} AS t2,
                   CAST(COUNT(*) AS BIGINT) AS m
            FROM g
        ),
        z AS (
            SELECT g.event_type, g.n, t.m,
                   ABS((g.s1 / g.n - t.t1 / t.nt)
                       / SQRT(((t.nt * t.t2 - t.t1 * t.t1)
                               / (t.nt * (t.nt - 1.0))) / g.n)) AS zabs
            FROM g CROSS JOIN tot t
        ),
        p AS (
            SELECT event_type, n, m, zabs,
                   2.0 * {_sql_norm_sf('zabs')} AS p_value
            FROM z
        ),
        ranked AS (
            SELECT event_type, n, m, zabs, p_value,
                   ROW_NUMBER() OVER (ORDER BY p_value, event_type) AS i
            FROM p
        ),
        thresh AS (
            SELECT MAX(CASE WHEN p_value <= 0.05 * i / m THEN i ELSE 0 END)
                       AS k
            FROM ranked
        )
        SELECT r.event_type,
               CAST(r.i AS BIGINT) AS p_rank,
               {sql_round4('r.zabs')} AS z_abs,
               {sql_round4('r.p_value')} AS p_value,
               {sql_round4('0.05 * r.i / r.m')} AS bh_threshold,
               r.i <= t.k AS rejected
        FROM ranked r CROSS JOIN thresh t
    """,
    tags=("ml", "stats", "multiple-testing"),
)
def ml_benjamini_hochberg(spark: SparkSession, sf: str) -> DataFrame:
    """Benjamini–Hochberg FDR control over the family of five 'does this
    event type's mean value differ from the corpus mean' z-tests: rank
    p-values ascending, find the largest i with p₍ᵢ₎ ≤ (i/m)·q at
    q=0.05, reject everything at or below it (the step-up rule — note a
    test can be rejected with p ABOVE its own threshold if a later one
    passes). p-values come from a shared Abramowitz–Stegun normal-CDF
    polynomial evaluated identically on both engines — the portable
    answer when neither SQL dialect ships erf. At 100 TB multiple
    testing is the default condition (every dashboard is a test
    family); the whole correction here is a 5-row window after one
    aggregate pass."""
    e = load_table(spark, sf, "events")
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(F.col("value")).alias("s1"),
        dsum(F.col("value") * F.col("value")).alias("s2"),
    )
    tot = g.agg(
        F.sum("n").cast("bigint").alias("nt"),
        dsum(F.col("s1")).alias("t1"),
        dsum(F.col("s2")).alias("t2"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    j = g.crossJoin(F.broadcast(tot))
    var = (F.col("nt") * F.col("t2") - F.col("t1") * F.col("t1")) / (
        F.col("nt") * (F.col("nt") - 1.0)
    )
    zabs = F.abs(
        F.try_divide(
            F.col("s1") / F.col("n") - F.col("t1") / F.col("nt"),
            F.sqrt(var / F.col("n")),
        )
    )
    p = j.select(
        "event_type", "n", "m",
        zabs.alias("zabs"),
        (2.0 * _norm_sf(zabs)).alias("p_value"),
    )
    ranked = p.select(
        "event_type", "m", "zabs", "p_value",
        F.row_number().over(W.orderBy("p_value", "event_type")).alias("i"),
    )
    thresh = ranked.agg(
        F.max(
            F.when(F.col("p_value") <= 0.05 * F.col("i") / F.col("m"), F.col("i"))
            .otherwise(0)
        ).alias("k")
    )
    return ranked.crossJoin(F.broadcast(thresh)).select(
        "event_type",
        F.col("i").cast("bigint").alias("p_rank"),
        round4(F.col("zabs")).alias("z_abs"),
        round4(F.col("p_value")).alias("p_value"),
        round4(0.05 * F.col("i") / F.col("m")).alias("bh_threshold"),
        (F.col("i") <= F.col("k")).alias("rejected"),
    )


@query(
    "ml_tost_equivalence",
    oracle=f"""
        WITH g AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('value')} AS s1,
                   {sql_dsum('value * value')} AS s2
            FROM events
            WHERE event_type IN ('view', 'click')
            GROUP BY event_type
        ),
        w AS (
            SELECT
                MAX(CASE WHEN event_type = 'view' THEN n END) AS n1,
                MAX(CASE WHEN event_type = 'view' THEN s1 END) AS a1,
                MAX(CASE WHEN event_type = 'view' THEN s2 END) AS a2,
                MAX(CASE WHEN event_type = 'click' THEN n END) AS n2,
                MAX(CASE WHEN event_type = 'click' THEN s1 END) AS b1,
                MAX(CASE WHEN event_type = 'click' THEN s2 END) AS b2
            FROM g
        ),
        d AS (
            SELECT n1, n2,
                   a1 / n1 - b1 / n2 AS diff,
                   SQRT((n1 * a2 - a1 * a1) / (n1 * (n1 - 1.0)) / n1
                      + (n2 * b2 - b1 * b1) / (n2 * (n2 - 1.0)) / n2) AS se
            FROM w
        )
        SELECT CAST(n1 AS BIGINT) AS n_view,
               CAST(n2 AS BIGINT) AS n_click,
               {sql_round4('diff')} AS mean_diff,
               {sql_round4('(diff + 2.0) / se')} AS z_lower,
               {sql_round4('(diff - 2.0) / se')} AS z_upper,
               (diff + 2.0) / se > 1.6448536269514722
                   AND (diff - 2.0) / se < -1.6448536269514722 AS equivalent
        FROM d
    """,
    tags=("ml", "stats", "test"),
)
def ml_tost_equivalence(spark: SparkSession, sf: str) -> DataFrame:
    """TOST equivalence test (two one-sided tests): are view and click
    mean values equivalent within ±δ=2.0 — the inferentially correct
    way to claim 'no meaningful difference', which a non-significant
    t-test does NOT license (absence of evidence ≠ evidence of
    absence). Both one-sided z's must clear ±z₀.₀₅: z_lower =
    (diff+δ)/SE > 1.645 and z_upper = (diff−δ)/SE < −1.645. Welch SE
    from per-group power sums, one aggregate pass + a 2-row pivot; the
    guardrail-metric pattern every launch review at scale actually
    needs ('did we NOT hurt latency/quality by more than δ')."""
    e = load_table(spark, sf, "events")
    g = (
        e.filter(F.col("event_type").isin("view", "click"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            dsum(F.col("value")).alias("s1"),
            dsum(F.col("value") * F.col("value")).alias("s2"),
        )
    )
    isv = F.when(F.col("event_type") == "view", 1).otherwise(0)
    w = g.agg(
        F.max(F.when(isv == 1, F.col("n"))).alias("n1"),
        F.max(F.when(isv == 1, F.col("s1"))).alias("a1"),
        F.max(F.when(isv == 1, F.col("s2"))).alias("a2"),
        F.max(F.when(isv == 0, F.col("n"))).alias("n2"),
        F.max(F.when(isv == 0, F.col("s1"))).alias("b1"),
        F.max(F.when(isv == 0, F.col("s2"))).alias("b2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    diff = F.col("a1") / n1 - F.col("b1") / n2
    se = F.sqrt(
        (n1 * F.col("a2") - F.col("a1") * F.col("a1")) / (n1 * (n1 - 1.0)) / n1
        + (n2 * F.col("b2") - F.col("b1") * F.col("b1")) / (n2 * (n2 - 1.0)) / n2
    )
    zcrit = 1.6448536269514722
    return w.select(
        n1.cast("bigint").alias("n_view"),
        n2.cast("bigint").alias("n_click"),
        round4(diff).alias("mean_diff"),
        round4((diff + 2.0) / se).alias("z_lower"),
        round4((diff - 2.0) / se).alias("z_upper"),
        (((diff + 2.0) / se > zcrit) & ((diff - 2.0) / se < -zcrit)).alias(
            "equivalent"
        ),
    )


@query(
    "ml_power_sample_size",
    oracle=f"""
        WITH g AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('value')} AS s1,
                   {sql_dsum('value * value')} AS s2
            FROM events
            WHERE event_type IN ('purchase', 'click')
            GROUP BY event_type
        ),
        w AS (
            SELECT
                MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
                MAX(CASE WHEN event_type = 'purchase' THEN s1 END) AS a1,
                MAX(CASE WHEN event_type = 'purchase' THEN s2 END) AS a2,
                MAX(CASE WHEN event_type = 'click' THEN n END) AS n2,
                MAX(CASE WHEN event_type = 'click' THEN s1 END) AS b1,
                MAX(CASE WHEN event_type = 'click' THEN s2 END) AS b2
            FROM g
        ),
        d AS (
            SELECT n1, n2,
                   ABS(a1 / n1 - b1 / n2)
                   / SQRT(((a2 - a1 * a1 / n1) + (b2 - b1 * b1 / n2))
                          / (n1 + n2 - 2.0)) AS d_abs
            FROM w
        )
        SELECT {sql_round4('d_abs')} AS effect_d,
               CAST(CEIL(2.0 * POWER((1.959963984540054
                                      + 0.8416212335729143) / d_abs, 2))
                    AS BIGINT) AS n_required_per_arm,
               CAST(LEAST(n1, n2) AS BIGINT) AS n_smallest_arm,
               LEAST(n1, n2) >= CEIL(2.0 * POWER((1.959963984540054
                                      + 0.8416212335729143) / d_abs, 2))
                   AS adequately_powered
        FROM d
    """,
    tags=("ml", "stats", "design"),
)
def ml_power_sample_size(spark: SparkSession, sf: str) -> DataFrame:
    """Prospective power analysis closed form: per-arm n = 2·((z₀.₀₂₅ +
    z₀.₂)/d)² to detect the OBSERVED standardized effect d (from
    ``ml_cohens_d``'s pooled-SD formula) at 80% power / two-sided 5% —
    the design arithmetic that belongs NEXT to every A/B readout
    (``workload_ab_test``): an 'insignificant' result from an
    underpowered arm is noise, not news. The z quantiles are fixed
    constants so the whole op stays closed-form; one aggregate pass,
    2-row pivot, one output row with the verdict against the smaller
    arm."""
    e = load_table(spark, sf, "events")
    g = (
        e.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            dsum(F.col("value")).alias("s1"),
            dsum(F.col("value") * F.col("value")).alias("s2"),
        )
    )
    isp = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    w = g.agg(
        F.max(F.when(isp == 1, F.col("n"))).alias("n1"),
        F.max(F.when(isp == 1, F.col("s1"))).alias("a1"),
        F.max(F.when(isp == 1, F.col("s2"))).alias("a2"),
        F.max(F.when(isp == 0, F.col("n"))).alias("n2"),
        F.max(F.when(isp == 0, F.col("s1"))).alias("b1"),
        F.max(F.when(isp == 0, F.col("s2"))).alias("b2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    d_abs = F.abs(F.col("a1") / n1 - F.col("b1") / n2) / F.sqrt(
        (
            (F.col("a2") - F.col("a1") * F.col("a1") / n1)
            + (F.col("b2") - F.col("b1") * F.col("b1") / n2)
        )
        / (n1 + n2 - 2.0)
    )
    zsum = 1.959963984540054 + 0.8416212335729143
    n_req = F.ceil(2.0 * F.pow(zsum / d_abs, 2))
    return w.select(
        round4(d_abs).alias("effect_d"),
        n_req.cast("bigint").alias("n_required_per_arm"),
        F.least(n1, n2).cast("bigint").alias("n_smallest_arm"),
        (F.least(n1, n2) >= n_req).alias("adequately_powered"),
    )


@query(
    "ml_gmm_em_step",
    oracle=f"""
        WITH resp AS (
            SELECT value,
                   0.5 * EXP(-POWER(value - 20.0, 2) / (2.0 * 400.0)) / 20.0
                       AS w1,
                   0.5 * EXP(-POWER(value - 80.0, 2) / (2.0 * 400.0)) / 20.0
                       AS w2
            FROM events
        ),
        gamma AS (
            SELECT value,
                   w1 / (w1 + w2) AS g1,
                   w2 / (w1 + w2) AS g2
            FROM resp
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('g1')} AS n1,
                   {sql_dsum('g2')} AS n2,
                   {sql_dsum('g1 * value')} AS s1,
                   {sql_dsum('g2 * value')} AS s2,
                   {sql_dsum('g1 * value * value')} AS q1,
                   {sql_dsum('g2 * value * value')} AS q2
            FROM gamma
        )
        SELECT n AS n_rows,
               {sql_round4('n1 / n')} AS pi1_new,
               {sql_round4('s1 / n1')} AS mu1_new,
               {sql_round4('SQRT(q1 / n1 - (s1 / n1) * (s1 / n1))')}
                   AS sigma1_new,
               {sql_round4('s2 / n2')} AS mu2_new,
               {sql_round4('SQRT(q2 / n2 - (s2 / n2) * (s2 / n2))')}
                   AS sigma2_new
        FROM m
    """,
    tags=("ml", "clustering", "em"),
)
def ml_gmm_em_step(spark: SparkSession, sf: str) -> DataFrame:
    """One exact EM step for a two-component 1-D Gaussian mixture on
    event values, from the fixed init (π=.5/.5, µ=20/80, σ=20/20):
    E-step responsibilities are row-local Gaussian-density arithmetic
    (the shared constant normalizer cancels in γ, kept anyway for
    clarity), M-step is ONE aggregate of γ-weighted power sums — the
    same sufficient-statistics discipline as ``ml_kmeans_lloyd``'s hard
    assignments, with soft weights. This is the induction step of the
    full algorithm: iterating is re-running this plan with updated
    constants, each iteration one scan + a 7-number shuffle at any
    scale. Weighted sums ride decimals so the updated parameters are
    partition-invariant."""
    e = load_table(spark, sf, "events")
    v = F.col("value")
    w1 = 0.5 * F.exp(-F.pow(v - 20.0, 2) / (2.0 * 400.0)) / 20.0
    w2 = 0.5 * F.exp(-F.pow(v - 80.0, 2) / (2.0 * 400.0)) / 20.0
    gamma = e.select(
        v.alias("value"),
        (w1 / (w1 + w2)).alias("g1"),
        (w2 / (w1 + w2)).alias("g2"),
    )
    m = gamma.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(F.col("g1")).alias("n1"),
        dsum(F.col("g2")).alias("n2"),
        dsum(F.col("g1") * v).alias("s1"),
        dsum(F.col("g2") * v).alias("s2"),
        dsum(F.col("g1") * v * v).alias("q1"),
        dsum(F.col("g2") * v * v).alias("q2"),
    )
    mu1 = F.try_divide(F.col("s1"), F.col("n1"))
    mu2 = F.try_divide(F.col("s2"), F.col("n2"))
    return m.select(
        F.col("n").alias("n_rows"),
        round4(F.col("n1") / F.col("n")).alias("pi1_new"),
        round4(mu1).alias("mu1_new"),
        round4(
            F.sqrt(F.try_divide(F.col("q1"), F.col("n1")) - mu1 * mu1)
        ).alias("sigma1_new"),
        round4(mu2).alias("mu2_new"),
        round4(
            F.sqrt(F.try_divide(F.col("q2"), F.col("n2")) - mu2 * mu2)
        ).alias("sigma2_new"),
    )


@query(
    "ml_bayes_ab",
    oracle=f"""
        WITH arms AS (
            SELECT CASE WHEN event_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS conv
            FROM events
        ),
        g AS (
            SELECT arm,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(conv) AS BIGINT) AS x
            FROM arms GROUP BY arm
        ),
        w AS (
            SELECT
                MAX(CASE WHEN arm = 'A' THEN n END) AS na,
                MAX(CASE WHEN arm = 'A' THEN x END) AS xa,
                MAX(CASE WHEN arm = 'B' THEN n END) AS nb,
                MAX(CASE WHEN arm = 'B' THEN x END) AS xb
        FROM g
        ),
        post AS (
            SELECT na, xa, nb, xb,
                   (xa + 1.0) / (na + 2.0) AS ma,
                   (xb + 1.0) / (nb + 2.0) AS mb,
                   (xa + 1.0) * (na - xa + 1.0)
                       / (POWER(na + 2.0, 2) * (na + 3.0)) AS va,
                   (xb + 1.0) * (nb - xb + 1.0)
                       / (POWER(nb + 2.0, 2) * (nb + 3.0)) AS vb
            FROM w
        )
        SELECT CAST(na AS BIGINT) AS n_a, CAST(xa AS BIGINT) AS conv_a,
               CAST(nb AS BIGINT) AS n_b, CAST(xb AS BIGINT) AS conv_b,
               {sql_round4('ma')} AS posterior_mean_a,
               {sql_round4('mb')} AS posterior_mean_b,
               {sql_round4(
                   'CASE WHEN ma >= mb THEN 1.0 - '
                   + _sql_norm_sf('ABS((ma - mb) / SQRT(va + vb))')
                   + ' ELSE ' + _sql_norm_sf('ABS((ma - mb) / SQRT(va + vb))')
                   + ' END'
               )} AS p_a_beats_b
        FROM post
    """,
    tags=("ml", "stats", "bayesian"),
)
def ml_bayes_ab(spark: SparkSession, sf: str) -> DataFrame:
    """Bayesian A/B readout with Beta(1,1) priors on the purchase-
    conversion rate of two deterministic arms (event-id parity): exact
    Beta posterior means/variances in closed form, and P(A>B) via the
    normal approximation to the posterior difference (the same shared
    erf polynomial as ``ml_benjamini_hochberg``, so both engines agree
    bitwise; at these counts the approximation error is ≪ the decision
    threshold). This is the always-valid-ish dashboard number product
    teams actually read — 'probability A is better' — vs the p-value
    machinery of ``workload_ab_test``; one pass, 2-row pivot, zero
    iteration."""
    e = load_table(spark, sf, "events")
    arms = e.select(
        F.when(F.col("event_id") % 2 == 0, "A").otherwise("B").alias("arm"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
    )
    g = arms.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("conv").cast("bigint").alias("x"),
    )
    isa = F.when(F.col("arm") == "A", 1).otherwise(0)
    w = g.agg(
        F.max(F.when(isa == 1, F.col("n"))).alias("na"),
        F.max(F.when(isa == 1, F.col("x"))).alias("xa"),
        F.max(F.when(isa == 0, F.col("n"))).alias("nb"),
        F.max(F.when(isa == 0, F.col("x"))).alias("xb"),
    )
    na, xa, nb, xb = F.col("na"), F.col("xa"), F.col("nb"), F.col("xb")
    ma = (xa + 1.0) / (na + 2.0)
    mb = (xb + 1.0) / (nb + 2.0)
    va = (xa + 1.0) * (na - xa + 1.0) / (F.pow(na + 2.0, 2) * (na + 3.0))
    vb = (xb + 1.0) * (nb - xb + 1.0) / (F.pow(nb + 2.0, 2) * (nb + 3.0))
    zab = F.abs(ma - mb) / F.sqrt(va + vb)
    p_ab = F.when(ma >= mb, 1.0 - _norm_sf(zab)).otherwise(_norm_sf(zab))
    return w.select(
        na.cast("bigint").alias("n_a"),
        xa.cast("bigint").alias("conv_a"),
        nb.cast("bigint").alias("n_b"),
        xb.cast("bigint").alias("conv_b"),
        round4(ma).alias("posterior_mean_a"),
        round4(mb).alias("posterior_mean_b"),
        round4(p_ab).alias("p_a_beats_b"),
    )


@query(
    "ml_offpolicy_ips",
    oracle=f"""
        WITH logged AS (
            SELECT user_id % 3 AS segment, event_type AS action, value AS r
            FROM events
        ),
        prop AS (
            SELECT segment, action,
                   CAST(COUNT(*) AS BIGINT) AS n_sa
            FROM logged GROUP BY segment, action
        ),
        seg AS (
            SELECT segment, CAST(SUM(n_sa) AS BIGINT) AS n_s
            FROM prop GROUP BY segment
        ),
        weighted AS (
            SELECT l.segment, l.action, l.r,
                   CASE WHEN l.action IN ('purchase', 'click')
                        THEN 0.5 / (CAST(p.n_sa AS DOUBLE) / s.n_s)
                        ELSE 0.0 END AS w
            FROM logged l
            JOIN prop p ON l.segment = p.segment AND l.action = p.action
            JOIN seg s ON l.segment = s.segment
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_logged,
               CAST(SUM(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_matched,
               {sql_round4(sql_davg('r'))} AS logging_policy_value,
               {sql_round4(f"{sql_dsum('w * r')} / COUNT(*)")}
                   AS ips_value,
               {sql_round4(f"{sql_dsum('w * r')} / {sql_dsum('w')}")}
                   AS snips_value
        FROM weighted
    """,
    tags=("ml", "counterfactual", "policy"),
)
def ml_offpolicy_ips(spark: SparkSession, sf: str) -> DataFrame:
    """Off-policy evaluation by inverse propensity scoring: estimate
    what a TARGET policy (uniform 50/50 over purchase/click) would have
    earned from logs collected under the empirical logging policy —
    weight each logged reward by π_target/π_logging, where the logging
    propensities are the per-segment action frequencies (3 user
    segments). Reports plain IPS (unbiased, high variance) and the
    self-normalized SNIPS (Σwr/Σw — biased but variance-controlled; the
    production default). Propensity table is a 15-row broadcast; the
    estimate is one weighted pass — the counterfactual-dashboard shape
    that lets 100 TB of logged interactions evaluate a policy change
    without an A/B test. Off-support actions get weight 0 explicitly."""
    e = load_table(spark, sf, "events")
    logged = e.select(
        (F.col("user_id") % 3).alias("segment"),
        F.col("event_type").alias("action"),
        F.col("value").alias("r"),
    )
    prop = logged.groupBy("segment", "action").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sa")
    )
    seg = prop.groupBy("segment").agg(
        F.sum("n_sa").cast("bigint").alias("n_s")
    )
    j = logged.join(F.broadcast(prop), ["segment", "action"]).join(
        F.broadcast(seg), "segment"
    )
    w = F.when(
        F.col("action").isin("purchase", "click"),
        0.5 / (F.col("n_sa").cast("double") / F.col("n_s")),
    ).otherwise(0.0)
    weighted = j.select("r", w.alias("w"))
    return weighted.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_logged"),
        F.sum(F.when(F.col("w") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_matched"),
        round4(davg(F.col("r"))).alias("logging_policy_value"),
        round4(dsum(F.col("w") * F.col("r")) / F.count(F.lit(1))).alias(
            "ips_value"
        ),
        round4(F.try_divide(dsum(F.col("w") * F.col("r")), dsum(F.col("w")))).alias(
            "snips_value"
        ),
    )


@query(
    "ml_tail_dependence",
    oracle=f"""
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   {sql_dsum('o_totalprice')} AS spend
            FROM orders GROUP BY o_custkey
        ),
        q AS (
            SELECT quantile_cont(CAST(n_orders AS DOUBLE), 0.8) AS qx,
                   quantile_cont(spend, 0.8) AS qy
            FROM per_cust
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CASE WHEN p.n_orders > q.qx THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_x_tail,
               CAST(SUM(CASE WHEN p.spend > q.qy THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_y_tail,
               CAST(SUM(CASE WHEN p.n_orders > q.qx AND p.spend > q.qy
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_joint_tail,
               {sql_round4(
                   'CAST(SUM(CASE WHEN p.n_orders > q.qx AND p.spend > q.qy'
                   ' THEN 1 ELSE 0 END) AS DOUBLE)'
                   ' / SUM(CASE WHEN p.spend > q.qy THEN 1 ELSE 0 END)'
               )} AS upper_tail_dep,
               {sql_round4(
                   'CAST(SUM(CASE WHEN p.n_orders > q.qx THEN 1 ELSE 0 END)'
                   ' AS DOUBLE) / COUNT(*)'
               )} AS x_tail_rate
        FROM per_cust p CROSS JOIN q
    """,
    tags=("ml", "stats", "risk"),
)
def ml_tail_dependence(spark: SparkSession, sf: str) -> DataFrame:
    """Empirical upper-tail dependence between order frequency and total
    spend per customer: λ̂_U = P(X > q₀.₈(X) | Y > q₀.₈(Y)) — the copula
    question Pearson correlation cannot answer (two variables can be
    0.5-correlated with INDEPENDENT extremes, or weakly correlated with
    extremes that always co-occur; risk lives in the second case).
    Compare λ̂ against the x-tail base rate (0.2 under independence):
    the ratio is the tail lift. One customer-grain reduction, two
    broadcast percentile thresholds, one conditional-count pass —
    scale-free, and the natural companion to ``ml_hill_tail_index``
    (how heavy) and ``ml_mean_excess_tail`` (how far)."""
    o = load_table(spark, sf, "orders")
    per = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("spend"),
    )
    q = per.agg(
        F.percentile(F.col("n_orders").cast("double"), F.lit(0.8)).alias("qx"),
        F.percentile(F.col("spend"), F.lit(0.8)).alias("qy"),
    )
    j = per.crossJoin(F.broadcast(q))
    in_x = F.col("n_orders") > F.col("qx")
    in_y = F.col("spend") > F.col("qy")
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.when(in_x, 1).otherwise(0)).cast("bigint").alias("n_x_tail"),
        F.sum(F.when(in_y, 1).otherwise(0)).cast("bigint").alias("n_y_tail"),
        F.sum(F.when(in_x & in_y, 1).otherwise(0))
        .cast("bigint")
        .alias("n_joint_tail"),
        round4(
            F.try_divide(
                F.sum(F.when(in_x & in_y, 1).otherwise(0)).cast("double"),
                F.sum(F.when(in_y, 1).otherwise(0)),
            )
        ).alias("upper_tail_dep"),
        round4(
            F.sum(F.when(in_x, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("x_tail_rate"),
    )


@query(
    "ml_brier_decomposition",
    oracle=f"""
        WITH labeled AS (
            SELECT user_id % 5 AS segment,
                   event_id % 2 AS fold,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
        ),
        fc AS (
            SELECT segment,
                   CAST(SUM(y) AS DOUBLE) / COUNT(*) AS f_k
            FROM labeled WHERE fold = 1 GROUP BY segment
        ),
        test AS (
            SELECT l.segment, l.y, fc.f_k
            FROM labeled l JOIN fc ON l.segment = fc.segment
            WHERE l.fold = 0
        ),
        bins AS (
            SELECT segment, f_k,
                   CAST(COUNT(*) AS BIGINT) AS n_k,
                   CAST(SUM(y) AS DOUBLE) / COUNT(*) AS o_k
            FROM test GROUP BY segment, f_k
        ),
        tot AS (
            SELECT CAST(SUM(n_k) AS BIGINT) AS n,
                   {sql_dsum('n_k * o_k')} / SUM(n_k) AS o_bar
            FROM bins
        )
        SELECT t.n AS n_test,
               {sql_round4(f"{sql_dsum('b.n_k * (b.f_k - b.o_k) * (b.f_k - b.o_k)')} / MIN(t.n)")}
                   AS reliability,
               {sql_round4(f"{sql_dsum('b.n_k * (b.o_k - t.o_bar) * (b.o_k - t.o_bar)')} / MIN(t.n)")}
                   AS resolution,
               {sql_round4('MIN(t.o_bar) * (1.0 - MIN(t.o_bar))')}
                   AS uncertainty,
               {sql_round4(
                   f"{sql_dsum('b.n_k * (b.f_k - b.o_k) * (b.f_k - b.o_k)')} / MIN(t.n)"
                   f" - {sql_dsum('b.n_k * (b.o_k - t.o_bar) * (b.o_k - t.o_bar)')} / MIN(t.n)"
                   f" + MIN(t.o_bar) * (1.0 - MIN(t.o_bar))"
               )} AS brier_score
        FROM bins b CROSS JOIN tot t
        GROUP BY t.n
    """,
    tags=("ml", "eval", "calibration"),
)
def ml_brier_decomposition(spark: SparkSession, sf: str) -> DataFrame:
    """Murphy decomposition of the Brier score — BS = REL − RES + UNC —
    for a segment-rate forecaster of purchase probability, fit on odd
    events and scored on even ones (the parity split keeps it honest;
    in-sample the reliability term is identically zero and teaches
    nothing). Reliability says how far forecast probabilities sit from
    observed frequencies (calibration — ``ml_calibration_bins``' scalar
    summary), resolution how much the forecasts separate outcomes
    (sharpness), uncertainty the irreducible base-rate variance. All
    three are weighted sums over 5 forecast bins — two aggregate
    passes, exact-count ratios, one broadcast."""
    e = load_table(spark, sf, "events")
    labeled = e.select(
        (F.col("user_id") % 5).alias("segment"),
        (F.col("event_id") % 2).alias("fold"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    fc = (
        labeled.filter(F.col("fold") == 1)
        .groupBy("segment")
        .agg((F.sum("y").cast("double") / F.count(F.lit(1))).alias("f_k"))
    )
    test = labeled.filter(F.col("fold") == 0).join(F.broadcast(fc), "segment")
    bins = test.groupBy("segment", "f_k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_k"),
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("o_k"),
    )
    tot = bins.agg(
        F.sum("n_k").cast("bigint").alias("n"),
        (dsum(F.col("n_k") * F.col("o_k")) / F.sum("n_k")).alias("o_bar"),
    )
    j = bins.crossJoin(F.broadcast(tot))
    rel = dsum(
        F.col("n_k") * (F.col("f_k") - F.col("o_k")) * (F.col("f_k") - F.col("o_k"))
    ) / F.min("n")
    res = dsum(
        F.col("n_k")
        * (F.col("o_k") - F.col("o_bar"))
        * (F.col("o_k") - F.col("o_bar"))
    ) / F.min("n")
    unc = F.min("o_bar") * (1.0 - F.min("o_bar"))
    return j.groupBy("n").agg(
        round4(rel).alias("reliability"),
        round4(res).alias("resolution"),
        round4(unc).alias("uncertainty"),
        round4(rel - res + unc).alias("brier_score"),
    ).select(
        F.col("n").alias("n_test"),
        "reliability", "resolution", "uncertainty", "brier_score",
    )


@query(
    "ml_markov_entropy_rate",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_type,
                   LEAD(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS nxt
            FROM events
        ),
        trans AS (
            SELECT event_type AS s, nxt AS t, CAST(COUNT(*) AS BIGINT) AS n
            FROM seq WHERE nxt IS NOT NULL
            GROUP BY event_type, nxt
        ),
        row_tot AS (
            SELECT s, CAST(SUM(n) AS BIGINT) AS n_s FROM trans GROUP BY s
        ),
        all_tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS n_all FROM trans
        )
        SELECT CAST(MIN(a.n_all) AS BIGINT) AS n_transitions,
               {sql_round4(
                   "-"
                   + sql_dsum(
                       "(CAST(r.n_s AS DOUBLE) / a.n_all)"
                       " * (CAST(t.n AS DOUBLE) / r.n_s)"
                       " * LN(CAST(t.n AS DOUBLE) / r.n_s) / LN(2.0)"
                   )
               )} AS entropy_rate_bits,
               {sql_round4('LN(5.0) / LN(2.0)')} AS max_entropy_bits
        FROM trans t
        JOIN row_tot r ON t.s = r.s
        CROSS JOIN all_tot a
    """,
    tags=("ml", "stats", "markov"),
)
def ml_markov_entropy_rate(spark: SparkSession, sf: str) -> DataFrame:
    """Entropy rate of the per-user event-type Markov chain: H = −Σᵢ πᵢ
    Σⱼ pᵢⱼ log₂ pᵢⱼ with the stationary weights taken empirically from
    transition row masses — bits of genuine surprise per user action
    after conditioning on the previous action. Against the log₂5
    uniform ceiling this is the predictability budget for next-event
    models (``workload_event_transitions`` gives the matrix, this
    scores it; a near-ceiling rate says sequence models can't beat
    marginal frequency). Transitions come from one lead window keyed by
    user (distributed), then everything is a 25-cell reduction."""
    e = load_table(spark, sf, "events")
    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(wl).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("s"), F.col("nxt").alias("t")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    row_tot = trans.groupBy("s").agg(F.sum("n").cast("bigint").alias("n_s"))
    all_tot = trans.agg(F.sum("n").cast("bigint").alias("n_all"))
    j = trans.join(F.broadcast(row_tot), "s").crossJoin(F.broadcast(all_tot))
    pij = F.col("n").cast("double") / F.col("n_s")
    pi = F.col("n_s").cast("double") / F.col("n_all")
    term = pi * pij * F.log(pij) / F.log(F.lit(2.0))
    return j.agg(
        F.min("n_all").cast("bigint").alias("n_transitions"),
        round4(-dsum(term)).alias("entropy_rate_bits"),
        round4(F.log(F.lit(5.0)) / F.log(F.lit(2.0))).alias(
            "max_entropy_bits"
        ),
    )


@query(
    "ml_pinball_loss",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(FLOOR({sql_dsum('value')} * 100.0 + 0.5) AS BIGINT)
                       AS y
            FROM events GROUP BY 1
        ),
        q AS (
            SELECT quantile_cont(CAST(y AS DOUBLE), 0.9) AS f90,
                   quantile_cont(CAST(y AS DOUBLE), 0.5) AS f50
            FROM daily
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               {sql_round4('MIN(q.f90)')} AS forecast_p90,
               {sql_round4(sql_davg(
                   'CASE WHEN d.y >= q.f90 THEN 0.9 * (d.y - q.f90)'
                   ' ELSE 0.1 * (q.f90 - d.y) END'
               ))} AS pinball_p90,
               {sql_round4(sql_davg(
                   'CASE WHEN d.y >= q.f50 THEN 0.5 * (d.y - q.f50)'
                   ' ELSE 0.5 * (q.f50 - d.y) END'
               ))} AS pinball_p50
        FROM daily d CROSS JOIN q
    """,
    tags=("ml", "eval", "forecast"),
)
def ml_pinball_loss(spark: SparkSession, sf: str) -> DataFrame:
    """Pinball (quantile) loss — the scoring rule under which the true
    q-quantile is the optimal forecast, and therefore the ONLY honest
    way to evaluate the p90 stocking levels ``workload_newsvendor`` and
    ``workload_reorder_point`` emit (MAE silently rewards median
    forecasts, never quantile ones): L_q(y,ŷ) = q·(y−ŷ)⁺ + (1−q)·(ŷ−y)⁺,
    reported for constant p90 and p50 forecasters over daily revenue.
    In-sample the empirical quantile minimizes this by construction —
    the op is the eval harness shape; swap the broadcast scalar for any
    model's per-day predictions and the plan is unchanged at any
    scale."""
    e = load_table(spark, sf, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.floor(dsum(F.col("value")) * 100.0 + 0.5).cast("bigint").alias("y")
    )
    q = daily.agg(
        F.percentile(F.col("y").cast("double"), F.lit(0.9)).alias("f90"),
        F.percentile(F.col("y").cast("double"), F.lit(0.5)).alias("f50"),
    )
    j = daily.crossJoin(F.broadcast(q))
    y = F.col("y").cast("double")

    def pinball(f: F.Column, qq: float) -> F.Column:
        return F.when(y >= f, qq * (y - f)).otherwise((1.0 - qq) * (f - y))

    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        round4(F.min("f90")).alias("forecast_p90"),
        round4(davg(pinball(F.col("f90"), 0.9))).alias("pinball_p90"),
        round4(davg(pinball(F.col("f50"), 0.5))).alias("pinball_p50"),
    )


@query(
    "ml_gumbel_block_maxima",
    oracle=f"""
        WITH maxima AS (
            SELECT CAST(ts AS DATE) AS day, MAX(value) AS m
            FROM events GROUP BY 1
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('m')} AS s1,
                   {sql_dsum('m * m')} AS s2
            FROM maxima
        ),
        fit AS (
            SELECT n,
                   SQRT((n * s2 - s1 * s1) / (n * (n - 1.0)))
                       * 0.7796968012336761 AS beta,
                   s1 / n - 0.5772156649015329
                       * SQRT((n * s2 - s1 * s1) / (n * (n - 1.0)))
                       * 0.7796968012336761 AS mu
            FROM s
        )
        SELECT n AS n_blocks,
               {sql_round4('mu')} AS gumbel_mu,
               {sql_round4('beta')} AS gumbel_beta,
               {sql_round4('mu - beta * LN(-LN(1.0 - 1.0 / 100.0))')}
                   AS return_level_100
        FROM fit
    """,
    tags=("ml", "stats", "extreme-value"),
)
def ml_gumbel_block_maxima(spark: SparkSession, sf: str) -> DataFrame:
    """Extreme-value analysis by block maxima: daily maxima of event
    value, Gumbel fit by method of moments (β = s·√6/π, µ = x̄ − γβ
    with Euler's γ — both constants inlined so the arithmetic is
    engine-identical), and the 100-block return level µ − β·ln(−ln(1 −
    1/100)) — 'the worst single event we should expect once per 100
    days'. The design question this answers (capacity headroom, fraud
    ceilings, rate-limit sizing) cannot be read off quantiles of the
    raw data: extremes need their own distribution. Complements the
    threshold-side ``ml_hill_tail_index`` / ``ml_mean_excess_tail``;
    one day-grain reduce plus power sums — scale-free."""
    e = load_table(spark, sf, "events")
    maxima = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.max("value").alias("m")
    )
    s = maxima.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(F.col("m")).alias("s1"),
        dsum(F.col("m") * F.col("m")).alias("s2"),
    )
    n = F.col("n")
    sd = F.sqrt(
        F.try_divide(n * F.col("s2") - F.col("s1") * F.col("s1"), n * (n - 1.0))
    )
    beta = sd * 0.7796968012336761
    mu = F.col("s1") / n - 0.5772156649015329 * beta
    return s.select(
        n.alias("n_blocks"),
        round4(mu).alias("gumbel_mu"),
        round4(beta).alias("gumbel_beta"),
        round4(mu - beta * F.log(-F.log(F.lit(1.0 - 1.0 / 100.0)))).alias(
            "return_level_100"
        ),
    )


@query(
    "ml_seasonal_strength",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(FLOOR({sql_dsum('value')} * 100.0 + 0.5) AS BIGINT)
                       AS y
            FROM events GROUP BY 1
        ),
        ma AS (
            SELECT day, y,
                   CASE WHEN COUNT(*) OVER w = 7
                        THEN CAST(SUM(y) OVER w AS DOUBLE) / 7.0 END AS trend
            FROM daily
            WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
                         AND 3 FOLLOWING)
        ),
        detr AS (
            SELECT dayofweek(day) + 1 AS dow, y - trend AS d
            FROM ma WHERE trend IS NOT NULL
        ),
        season AS (
            SELECT dow, {sql_davg('d')} AS s FROM detr GROUP BY dow
        ),
        rem AS (
            SELECT t.d, t.d - se.s AS r
            FROM detr t JOIN season se ON t.dow = se.dow
        ),
        v AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('d')} AS d1, {sql_dsum('d * d')} AS d2,
                   {sql_dsum('r')} AS r1, {sql_dsum('r * r')} AS r2
            FROM rem
        )
        SELECT n AS n_days,
               {sql_round4('(n * d2 - d1 * d1) / (n * (n - 1.0))')}
                   AS var_detrended,
               {sql_round4('(n * r2 - r1 * r1) / (n * (n - 1.0))')}
                   AS var_remainder,
               {sql_round4(
                   'GREATEST(0.0, 1.0 - ((n * r2 - r1 * r1) / (n * (n - 1.0)))'
                   ' / ((n * d2 - d1 * d1) / (n * (n - 1.0))))'
               )} AS seasonal_strength
        FROM v
    """,
    tags=("ml", "timeseries", "seasonality"),
)
def ml_seasonal_strength(spark: SparkSession, sf: str) -> DataFrame:
    """Hyndman's seasonal-strength measure F_s = max(0, 1 −
    Var(remainder)/Var(detrended)): detrend by the centered 7-day MA,
    estimate the weekly component as per-DOW means of the detrended
    series (additive decomposition — ``workload_seasonal_index`` is the
    multiplicative twin), and ask how much detrended variance the
    seasonal component actually explains. F_s near 0 says the 'weekly
    pattern' on the dashboard is noise; near 1 says forecasting without
    DOW features is malpractice (``workload_forecast_backtest``'s
    seasonal-naive should win exactly when this is high). One window +
    two small joins + power sums, all on the day grain."""
    e = load_table(spark, sf, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.floor(dsum(F.col("value")) * 100.0 + 0.5).cast("bigint").alias("y")
    )
    w7 = W.orderBy("day").rowsBetween(-3, 3)
    ma = daily.select(
        "day", "y",
        F.when(
            F.count(F.lit(1)).over(w7) == 7,
            F.sum("y").over(w7).cast("double") / 7.0,
        ).alias("trend"),
    ).filter(F.col("trend").isNotNull())
    detr = ma.select(
        F.dayofweek("day").alias("dow"),
        (F.col("y") - F.col("trend")).alias("d"),
    )
    season = detr.groupBy("dow").agg(davg(F.col("d")).alias("s"))
    rem = detr.join(F.broadcast(season), "dow").select(
        "d", (F.col("d") - F.col("s")).alias("r")
    )
    v = rem.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(F.col("d")).alias("d1"),
        dsum(F.col("d") * F.col("d")).alias("d2"),
        dsum(F.col("r")).alias("r1"),
        dsum(F.col("r") * F.col("r")).alias("r2"),
    )
    n = F.col("n")
    var_d = (n * F.col("d2") - F.col("d1") * F.col("d1")) / (n * (n - 1.0))
    var_r = (n * F.col("r2") - F.col("r1") * F.col("r1")) / (n * (n - 1.0))
    return v.select(
        n.alias("n_days"),
        round4(var_d).alias("var_detrended"),
        round4(var_r).alias("var_remainder"),
        round4(F.greatest(F.lit(0.0), 1.0 - var_r / var_d)).alias(
            "seasonal_strength"
        ),
    )


@query(
    "ml_chi2_residuals",
    oracle=f"""
        WITH cells AS (
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
            FROM documents
            WHERE source IN ('src0', 'src1', 'src2', 'src3')
            GROUP BY lang, source
        ),
        margins AS (
            SELECT c.lang, c.source, c.o,
                   SUM(c.o) OVER (PARTITION BY c.lang) AS row_tot,
                   SUM(c.o) OVER (PARTITION BY c.source) AS col_tot,
                   SUM(c.o) OVER () AS n
            FROM cells c
        ),
        resid AS (
            SELECT lang, source, o,
                   CAST(row_tot AS DOUBLE) * col_tot / n AS expected,
                   (o - CAST(row_tot AS DOUBLE) * col_tot / n)
                       / SQRT(CAST(row_tot AS DOUBLE) * col_tot / n
                              * (1.0 - CAST(row_tot AS DOUBLE) / n)
                              * (1.0 - CAST(col_tot AS DOUBLE) / n))
                       AS std_resid
            FROM margins
        )
        SELECT lang, source, o AS observed,
               {sql_round4('expected')} AS expected,
               {sql_round4('std_resid')} AS std_residual,
               ABS(std_resid) > 2.0 AS significant_cell
        FROM resid
    """,
    tags=("ml", "stats", "test"),
)
def ml_chi2_residuals(spark: SparkSession, sf: str) -> DataFrame:
    """Standardized (adjusted) residuals for the lang × source
    contingency table — the follow-up ``ml_chi2_independence`` demands:
    a significant omnibus χ² says 'dependence somewhere', the residuals
    (O−E)/√(E(1−r/n)(1−c/n)) say WHICH cells, each ~N(0,1) under
    independence so |resid| > 2 flags the driving cells directly. One
    cell aggregate plus margin windows over the tiny 20-cell frame
    (source-restricted to keep output reviewable); counts exact, one
    float expression per cell. At 100 TB the cell table is still tiny —
    residual analysis is free once the contingency aggregate exists."""
    d = load_table(spark, sf, "documents")
    cells = (
        d.filter(F.col("source").isin("src0", "src1", "src2", "src3"))
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    margins = cells.select(
        "lang", "source", "o",
        F.sum("o").over(W.partitionBy("lang")).alias("row_tot"),
        F.sum("o").over(W.partitionBy("source")).alias("col_tot"),
        F.sum("o").over(W.partitionBy()).alias("n"),
    )
    expected = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("n")
    std_resid = F.try_divide(
        F.col("o") - expected,
        F.sqrt(
        expected
        * (1.0 - F.col("row_tot").cast("double") / F.col("n"))
        * (1.0 - F.col("col_tot").cast("double") / F.col("n"))
        )
    )
    return margins.select(
        "lang", "source",
        F.col("o").alias("observed"),
        round4(expected).alias("expected"),
        round4(std_resid).alias("std_residual"),
        (F.abs(std_resid) > 2.0).alias("significant_cell"),
    )


@query(
    "ml_bland_altman",
    oracle=f"""
        WITH pairs AS (
            SELECT o.o_orderkey,
                   CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
                       AS m1,
                   CAST(FLOOR({sql_dsum('l.l_extendedprice * (1 + l.l_tax)')}
                              * 100.0 + 0.5) AS BIGINT) AS m2
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey, o.o_totalprice
        ),
        d AS (
            SELECT CAST(m1 - m2 AS DOUBLE) / 100.0 AS diff FROM pairs
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('diff')} AS s1,
                   {sql_dsum('diff * diff')} AS s2
            FROM d
        )
        SELECT n AS n_pairs,
               {sql_round4('s1 / n')} AS mean_diff,
               {sql_round4(
                   's1 / n - 1.96 * SQRT((n * s2 - s1 * s1)'
                   ' / (n * (n - 1.0)))'
               )} AS loa_lower,
               {sql_round4(
                   's1 / n + 1.96 * SQRT((n * s2 - s1 * s1)'
                   ' / (n * (n - 1.0)))'
               )} AS loa_upper
        FROM s
    """,
    tags=("ml", "stats", "agreement"),
)
def ml_bland_altman(spark: SparkSession, sf: str) -> DataFrame:
    """Bland–Altman agreement analysis between two 'measurements' of the
    same quantity — the order header total vs the tax-inclusive line
    sum: mean bias and the 95% limits of agreement (bias ± 1.96s).
    Where ``workload_ledger_reconciliation`` counts exact mismatches,
    Bland–Altman characterizes the DISTRIBUTION of disagreement — the
    right tool when the two systems legitimately measure with noise
    (currency conversion timing, rounding regimes) and the question is
    'are they interchangeable within tolerance', not 'are they equal'.
    Correlation is the famously wrong answer here (two methods can
    correlate at .99 and still disagree by 10%); the LoA interval is
    the honest one. Exact cents in, power sums, three closed forms."""
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.floor(
                dsum(F.col("l_extendedprice") * (1 + F.col("l_tax"))) * 100.0
                + 0.5
            )
            .cast("bigint")
            .alias("m2")
        )
        .select(
            (
                (
                    F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")
                    - F.col("m2")
                ).cast("double")
                / 100.0
            ).alias("diff")
        )
    )
    s = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(F.col("diff")).alias("s1"),
        dsum(F.col("diff") * F.col("diff")).alias("s2"),
    )
    n = F.col("n")
    mean = F.col("s1") / n
    sd = F.sqrt((n * F.col("s2") - F.col("s1") * F.col("s1")) / (n * (n - 1.0)))
    return s.select(
        n.alias("n_pairs"),
        round4(mean).alias("mean_diff"),
        round4(mean - 1.96 * sd).alias("loa_lower"),
        round4(mean + 1.96 * sd).alias("loa_upper"),
    )


# standard normal quantiles for p = 0.05, 0.15, ..., 0.95 (decile
# midpoints) — fixed constants so the QQ comparison is pure arithmetic on
# both engines (no probit function needed anywhere)
_QQ_PS = (0.05, 0.15, 0.25, 0.35, 0.45, 0.55, 0.65, 0.75, 0.85, 0.95)
_QQ_Z = (
    -1.6448536269514722, -1.0364333894937898, -0.6744897501960817,
    -0.38532046640756773, -0.12566134685507402, 0.12566134685507402,
    0.38532046640756773, 0.6744897501960817, 1.0364333894937898,
    1.6448536269514722,
)


@query(
    "ml_qq_normality",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(FLOOR({sql_dsum('value')} * 100.0 + 0.5) AS BIGINT)
                       AS y
            FROM events GROUP BY 1
        ),
        qarr AS (
            SELECT quantile_cont(CAST(y AS DOUBLE),
                [{", ".join(str(p) for p in _QQ_PS)}]) AS arr
            FROM daily
        ),
        qs AS (
            SELECT UNNEST(qarr.arr) AS emp_q,
                   GENERATE_SUBSCRIPTS(qarr.arr, 1) AS i
            FROM qarr
        ),
        zq AS (
            SELECT q.emp_q,
                   [{", ".join(str(z) for z in _QQ_Z)}][q.i] AS z
            FROM qs q
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   {sql_dsum('z')} AS sx, {sql_dsum('emp_q')} AS sy,
                   {sql_dsum('z * z')} AS sxx,
                   {sql_dsum('emp_q * emp_q')} AS syy,
                   {sql_dsum('z * emp_q')} AS sxy
            FROM zq
        )
        SELECT k AS n_quantiles,
               {sql_round4(
                   '(k * sxy - sx * sy)'
                   ' / SQRT((k * sxx - sx * sx) * (k * syy - sy * sy))'
               )} AS qq_correlation,
               {sql_round4('(k * sxy - sx * sy) / (k * sxx - sx * sx)')}
                   AS qq_slope_sigma,
               {sql_round4('sy / k')} AS qq_intercept_mu
        FROM s
    """,
    tags=("ml", "stats", "normality"),
)
def ml_qq_normality(spark: SparkSession, sf: str) -> DataFrame:
    """QQ-correlation normality diagnostic (the Shapiro–Francia idea,
    distributable): empirical quantiles of daily revenue at ten decile
    midpoints regressed against the corresponding STANDARD NORMAL
    quantiles — inlined as constants, so no probit function is needed
    on either engine. QQ correlation near 1 passes normality; the
    regression slope and intercept double as robust σ̂ and µ̂ estimates
    (read straight off the QQ line, outlier-resistant unlike moment
    estimates). This is the assumption-check that should precede every
    z-based test in this suite (``ml_grubbs_test``, ``workload_ab_test``
    lean on normal-ish tails). Ten quantile aggregates over the day
    grain, then the power-sum correlation."""
    e = load_table(spark, sf, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.floor(dsum(F.col("value")) * 100.0 + 0.5).cast("bigint").alias("y")
    )
    qarr = daily.agg(
        F.percentile(
            F.col("y").cast("double"),
            F.array(*[F.lit(p) for p in _QQ_PS]),
        ).alias("qs")
    )
    zarr = F.array(*[F.lit(z) for z in _QQ_Z])
    qs = qarr.select(
        F.posexplode("qs").alias("i", "emp_q")
    ).select(
        "emp_q", F.element_at(zarr, F.col("i") + 1).alias("z")
    )
    s = qs.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        dsum(F.col("z")).alias("sx"),
        dsum(F.col("emp_q")).alias("sy"),
        dsum(F.col("z") * F.col("z")).alias("sxx"),
        dsum(F.col("emp_q") * F.col("emp_q")).alias("syy"),
        dsum(F.col("z") * F.col("emp_q")).alias("sxy"),
    )
    k = F.col("k")
    corr = F.try_divide(
        k * F.col("sxy") - F.col("sx") * F.col("sy"),
        F.sqrt(
        (k * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (k * F.col("syy") - F.col("sy") * F.col("sy"))
        )
    )
    slope = (k * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        k * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        k.alias("n_quantiles"),
        round4(corr).alias("qq_correlation"),
        round4(slope).alias("qq_slope_sigma"),
        round4(F.col("sy") / k).alias("qq_intercept_mu"),
    )


@query(
    "ml_james_stein",
    oracle=f"""
        WITH seg AS (
            SELECT c_mktsegment,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_davg('c_acctbal')} AS xbar,
                   {sql_dsum('c_acctbal * c_acctbal')} AS s2raw,
                   {sql_dsum('c_acctbal')} AS s1raw
            FROM customer GROUP BY c_mktsegment
        ),
        grand AS (
            SELECT {sql_dsum('s1raw')} / SUM(n) AS gbar,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   ({sql_dsum('s2raw')} - {sql_dsum('s1raw')}
                        * ({sql_dsum('s1raw')} / SUM(n)))
                       / (SUM(n) - 1.0) AS pooled_var,
                   {sql_davg('CAST(n AS DOUBLE)')} AS nbar
            FROM seg
        ),
        dev AS (
            SELECT g.k, g.gbar, g.pooled_var, g.nbar,
                   {sql_dsum('(s.xbar - g.gbar) * (s.xbar - g.gbar)')}
                       AS ssdev
            FROM seg s CROSS JOIN grand g
            GROUP BY g.k, g.gbar, g.pooled_var, g.nbar
        ),
        shrink AS (
            SELECT k, gbar,
                   GREATEST(0.0, 1.0 - (k - 3.0)
                       * (pooled_var / nbar) / ssdev) AS b
            FROM dev
        )
        SELECT s.c_mktsegment,
               s.n,
               {sql_round4('s.xbar')} AS raw_mean,
               {sql_round4('sh.b')} AS shrink_factor,
               {sql_round4('sh.gbar + sh.b * (s.xbar - sh.gbar)')}
                   AS js_mean
        FROM seg s CROSS JOIN shrink sh
    """,
    tags=("ml", "stats", "shrinkage"),
)
def ml_james_stein(spark: SparkSession, sf: str) -> DataFrame:
    """James–Stein shrinkage of per-segment mean account balances toward
    the grand mean: x̂ᵢ = x̄ + b(x̄ᵢ − x̄) with b = max(0, 1 −
    (k−3)(σ²/n̄)/Σ(x̄ᵢ−x̄)²) — the estimator that DOMINATES the raw
    per-group means in total squared error whenever k ≥ 4, the
    counterintuitive fact that founded empirical Bayes (and the
    Gaussian-mean sibling of ``ml_beta_binomial_shrinkage``'s rate
    shrinkage). Between-group spread and pooled variance both come from
    the same one-pass per-group power sums; the positive-part factor is
    one broadcast scalar applied back over the 5 segment rows."""
    c = load_table(spark, sf, "customer")
    x = F.col("c_acctbal")
    seg = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        davg(x).alias("xbar"),
        dsum(x * x).alias("s2raw"),
        dsum(x).alias("s1raw"),
    )
    grand = seg.agg(
        (dsum(F.col("s1raw")) / F.sum("n")).alias("gbar"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        (
            (
                dsum(F.col("s2raw"))
                - dsum(F.col("s1raw")) * (dsum(F.col("s1raw")) / F.sum("n"))
            )
            / (F.sum("n") - 1.0)
        ).alias("pooled_var"),
        davg(F.col("n").cast("double")).alias("nbar"),
    )
    dev = (
        seg.crossJoin(F.broadcast(grand))
        .groupBy("k", "gbar", "pooled_var", "nbar")
        .agg(
            dsum(
                (F.col("xbar") - F.col("gbar"))
                * (F.col("xbar") - F.col("gbar"))
            ).alias("ssdev")
        )
    )
    shrink = dev.select(
        "gbar",
        F.greatest(
            F.lit(0.0),
            1.0
            - F.try_divide(
                (F.col("k") - 3.0) * (F.col("pooled_var") / F.col("nbar")),
                F.col("ssdev"),
            ),
        ).alias("b"),
    )
    return seg.crossJoin(F.broadcast(shrink)).select(
        "c_mktsegment", "n",
        round4(F.col("xbar")).alias("raw_mean"),
        round4(F.col("b")).alias("shrink_factor"),
        round4(F.col("gbar") + F.col("b") * (F.col("xbar") - F.col("gbar"))).alias(
            "js_mean"
        ),
    )


@query(
    "ml_negbin_fit",
    oracle=f"""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(c) AS BIGINT) AS s1,
                   {sql_dsum('CAST(c AS DOUBLE) * c')} AS s2,
                   CAST(SUM(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_zero
            FROM hourly
        ),
        mv AS (
            SELECT n, n_zero,
                   CAST(s1 AS DOUBLE) / n AS m,
                   (n * s2 - CAST(s1 AS DOUBLE) * s1) / (n * (n - 1.0)) AS v
            FROM s
        )
        SELECT n AS n_hours,
               {sql_round4('m')} AS mean_count,
               {sql_round4('v')} AS var_count,
               {sql_round4('m * m / (v - m)')} AS nb_r,
               {sql_round4('m / v')} AS nb_p,
               {sql_round4('EXP(-m)')} AS poisson_p_zero,
               {sql_round4('POWER(m / v, m * m / (v - m))')} AS negbin_p_zero,
               {sql_round4('CAST(n_zero AS DOUBLE) / n')} AS observed_p_zero
        FROM mv
    """,
    tags=("ml", "stats", "fit"),
)
def ml_negbin_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Negative-binomial fit for overdispersed hourly arrival counts by
    method of moments — r = m²/(v−m), p = m/v — with the model-choice
    receipt attached: the zero-probability under Poisson (e^−m) vs
    NB ((p)^r) vs observed. When ``ml_poisson_dispersion`` rejects
    D = 1, this is the distribution you refit with; the zero-prob
    triptych makes the refit's value VISIBLE (Poisson catastrophically
    underpredicts quiet hours on bursty traffic). Same one-pass power
    sums as the dispersion test — the two ops share a scan at 100 TB
    if composed."""
    e = load_table(spark, sf, "events")
    hourly = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    s = hourly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s1"),
        dsum(F.col("c").cast("double") * F.col("c")).alias("s2"),
        F.sum(F.when(F.col("c") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero"),
    )
    n = F.col("n")
    m = F.col("s1").cast("double") / n
    v = F.try_divide(
        n * F.col("s2") - F.col("s1").cast("double") * F.col("s1"),
        n * (n - 1.0),
    )
    r = F.try_divide(m * m, v - m)
    p = F.try_divide(m, v)
    return s.select(
        n.alias("n_hours"),
        round4(m).alias("mean_count"),
        round4(v).alias("var_count"),
        round4(r).alias("nb_r"),
        round4(p).alias("nb_p"),
        round4(F.exp(-m)).alias("poisson_p_zero"),
        round4(F.pow(p, r)).alias("negbin_p_zero"),
        round4(F.col("n_zero").cast("double") / n).alias("observed_p_zero"),
    )


@query(
    "ml_circular_hour_stats",
    oracle=f"""
        WITH hours AS (
            SELECT event_type,
                   (date_part('hour', ts) * 60.0 + date_part('minute', ts))
                       * 2.0 * PI() / 1440.0 AS theta
            FROM events
        ),
        s AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('SIN(theta)')} AS ss,
                   {sql_dsum('COS(theta)')} AS sc
            FROM hours GROUP BY event_type
        )
        SELECT event_type, n,
               {sql_round4(
                   '((ATAN2(ss, sc) + 2.0 * PI())'
                   ' - FLOOR((ATAN2(ss, sc) + 2.0 * PI()) / (2.0 * PI()))'
                   ' * (2.0 * PI())) * 1440.0 / (2.0 * PI()) / 60.0'
               )} AS mean_hour,
               {sql_round4('SQRT(ss * ss + sc * sc) / n')}
                   AS resultant_r,
               {sql_round4(
                   'SQRT(-2.0 * LN(LEAST(SQRT(ss * ss + sc * sc) / n, 1.0)))'
               )} AS circular_sd
        FROM s
    """,
    tags=("ml", "stats", "circular"),
)
def ml_circular_hour_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Circular statistics of event time-of-day per type: map each
    timestamp to an angle on the 24 h circle, then the circular mean
    hour (atan2 of the sine/cosine resultants — immune to the midnight
    wraparound that makes the LINEAR mean of {23:00, 01:00} report
    noon), the resultant length R ∈ [0,1] (1 = sharply peaked daily
    rhythm, 0 = uniform — the concentration readout that decides
    whether hour-of-day is worth a feature), and the circular SD
    √(−2 ln R). Sin/cos sums are the sufficient statistics — one
    grouped pass; the modulo-wrapped atan2 is a single closed
    expression on both engines."""
    e = load_table(spark, sf, "events")
    two_pi = 2.0 * 3.141592653589793
    theta = (
        (F.hour("ts") * 60.0 + F.minute("ts")) * two_pi / 1440.0
    )
    s = e.select("event_type", theta.alias("theta")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(F.sin(F.col("theta"))).alias("ss"),
        dsum(F.cos(F.col("theta"))).alias("sc"),
    )
    ang = F.atan2(F.col("ss"), F.col("sc")) + two_pi
    wrapped = ang - F.floor(ang / two_pi) * two_pi
    r = F.sqrt(F.col("ss") * F.col("ss") + F.col("sc") * F.col("sc")) / F.col("n")
    return s.select(
        "event_type", "n",
        round4(wrapped * 1440.0 / two_pi / 60.0).alias("mean_hour"),
        round4(r).alias("resultant_r"),
        round4(F.sqrt(-2.0 * F.log(F.least(r, F.lit(1.0))))).alias("circular_sd"),
    )


@query(
    "ml_anova_twoway",
    oracle=f"""
        WITH cells AS (
            SELECT dayofweek(CAST(ts AS DATE)) + 1 AS dow,
                   event_type,
                   {sql_davg('value')} AS m
            FROM events
            GROUP BY 1, 2
        ),
        margins AS (
            SELECT c.dow, c.event_type, c.m,
                   CAST(CAST(SUM(CAST(c.m AS DECIMAL(38,8)))
                        OVER (PARTITION BY c.dow) AS VARCHAR) AS DOUBLE)
                       / COUNT(*) OVER (PARTITION BY c.dow) AS row_m,
                   CAST(CAST(SUM(CAST(c.m AS DECIMAL(38,8)))
                        OVER (PARTITION BY c.event_type) AS VARCHAR)
                        AS DOUBLE)
                       / COUNT(*) OVER (PARTITION BY c.event_type)
                       AS col_m,
                   CAST(CAST(SUM(CAST(c.m AS DECIMAL(38,8)))
                        OVER () AS VARCHAR) AS DOUBLE)
                       / COUNT(*) OVER () AS grand_m
            FROM cells c
        ),
        ss AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
                   {sql_dsum('(row_m - grand_m) * (row_m - grand_m)')}
                       AS ss_rows,
                   {sql_dsum('(col_m - grand_m) * (col_m - grand_m)')}
                       AS ss_cols,
                   {sql_dsum(
                       '(m - row_m - col_m + grand_m)'
                       ' * (m - row_m - col_m + grand_m)'
                   )} AS ss_resid
            FROM margins
        )
        SELECT n_cells,
               {sql_round4('ss_rows')} AS ss_dow,
               {sql_round4('ss_cols')} AS ss_type,
               {sql_round4('ss_resid')} AS ss_interaction,
               {sql_round4(
                   '(ss_rows / 6.0) / (ss_resid / 24.0)'
               )} AS f_dow,
               {sql_round4(
                   '(ss_cols / 4.0) / (ss_resid / 24.0)'
               )} AS f_type
        FROM ss
    """,
    tags=("ml", "stats", "test"),
)
def ml_anova_twoway(spark: SparkSession, sf: str) -> DataFrame:
    """Two-way ANOVA on the day-of-week × event-type cell-mean table
    (additive model, unweighted cell means — the balanced-design
    formulation appropriate once each cell holds hundreds of rows):
    SS_dow, SS_type, and the interaction/residual SS from the margin
    decomposition m̂ᵢⱼ = row + col − grand, with F ratios on (6, 24)
    and (4, 24) degrees of freedom for the 7×5 grid. Answers the
    question ``ml_anova_oneway`` can't: do weekday and type effects
    BOTH exist, and do they interact (a big residual SS says type
    profiles differ by weekday — the signal that kills a simple
    additive dashboard model). One cell aggregate + margin windows on
    35 rows."""
    e = load_table(spark, sf, "events")
    cells = e.groupBy(
        F.dayofweek(F.col("ts").cast("date")).alias("dow"),
        "event_type",
    ).agg(davg(F.col("value")).alias("m"))
    def wavg(w):
        return (
            F.sum(F.col("m").cast(DEC)).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        )

    margins = cells.select(
        "m",
        wavg(W.partitionBy("dow")).alias("row_m"),
        wavg(W.partitionBy("event_type")).alias("col_m"),
        wavg(W.partitionBy()).alias("grand_m"),
    )
    ss = margins.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        dsum(
            (F.col("row_m") - F.col("grand_m"))
            * (F.col("row_m") - F.col("grand_m"))
        ).alias("ss_rows"),
        dsum(
            (F.col("col_m") - F.col("grand_m"))
            * (F.col("col_m") - F.col("grand_m"))
        ).alias("ss_cols"),
        dsum(
            (F.col("m") - F.col("row_m") - F.col("col_m") + F.col("grand_m"))
            * (F.col("m") - F.col("row_m") - F.col("col_m") + F.col("grand_m"))
        ).alias("ss_resid"),
    )
    return ss.select(
        "n_cells",
        round4(F.col("ss_rows")).alias("ss_dow"),
        round4(F.col("ss_cols")).alias("ss_type"),
        round4(F.col("ss_resid")).alias("ss_interaction"),
        round4(
            F.try_divide(F.col("ss_rows") / 6.0, F.col("ss_resid") / 24.0)
        ).alias("f_dow"),
        round4(
            F.try_divide(F.col("ss_cols") / 4.0, F.col("ss_resid") / 24.0)
        ).alias("f_type"),
    )


@query(
    "workload_ipf_raking",
    oracle=f"""
        WITH cells AS (
            SELECT c_mktsegment AS seg, c_nationkey % 5 AS region_band,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM customer GROUP BY 1, 2
        ),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_all FROM cells),
        -- target margins: uniform 1/5 on each axis
        rowadj AS (
            SELECT c.seg, c.region_band,
                   CAST(c.n AS DOUBLE)
                       * ((t.n_all / 5.0)
                          / SUM(c.n) OVER (PARTITION BY c.seg)) AS w1
            FROM cells c CROSS JOIN tot t
        ),
        coladj AS (
            SELECT seg, region_band,
                   w1 * (((SELECT n_all FROM tot) / 5.0)
                         / SUM(w1) OVER (PARTITION BY region_band)) AS w2
            FROM rowadj
        ),
        check_m AS (
            SELECT r.seg,
                   SUM(r.w2) AS row_mass,
                   MIN(t.n_all / 5.0) AS target
            FROM coladj r CROSS JOIN tot t
            GROUP BY r.seg
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               {sql_round4('MIN(target)')} AS target_margin,
               {sql_round4(
                   'MAX(ABS(row_mass - target) / target)'
               )} AS max_row_margin_error
        FROM check_m
    """,
    tags=("workload", "stats", "weighting"),
)
def workload_ipf_raking(spark: SparkSession, sf: str) -> DataFrame:
    """One sweep of iterative proportional fitting (raking): reweight
    the segment × nation-band contingency table so BOTH margins match
    uniform targets — scale every cell to its row target, then to its
    column target — and report the row-margin error the column pass
    reintroduced (the quantity IPF drives to zero geometrically;
    iterating is re-running this plan, same shape every sweep — the
    ``ml_gmm_em_step`` convention for iterative algorithms). This is
    the survey-weighting workhorse behind ``llm_post_stratification``
    when MARGINAL targets are all you know (joint targets ⇒ direct
    post-stratification, no iteration). Cell-grain windows only; the
    raw table is touched once."""
    c = load_table(spark, sf, "customer")
    cells = c.groupBy(
        F.col("c_mktsegment").alias("seg"),
        (F.col("c_nationkey") % 5).alias("region_band"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = cells.agg(F.sum("n").cast("bigint").alias("n_all"))
    j = cells.crossJoin(F.broadcast(tot))
    target = F.col("n_all") / 5.0
    w1 = F.col("n").cast("double") * (
        target / F.sum("n").over(W.partitionBy("seg"))
    )
    rowadj = j.select("seg", "region_band", "n_all", w1.alias("w1"))
    w2 = F.col("w1") * (
        (F.col("n_all") / 5.0) / F.sum("w1").over(W.partitionBy("region_band"))
    )
    coladj = rowadj.select("seg", "n_all", w2.alias("w2"))
    check = coladj.groupBy("seg").agg(
        F.sum("w2").alias("row_mass"),
        F.min(F.col("n_all") / 5.0).alias("target"),
    )
    return check.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        round4(F.min("target")).alias("target_margin"),
        round4(
            F.max(F.abs(F.col("row_mass") - F.col("target")) / F.col("target"))
        ).alias("max_row_margin_error"),
    )


@query(
    "ml_logrank_test",
    oracle=f"""
        WITH lag AS (
            SELECT o.o_orderkey,
                   CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS grp,
                   date_diff('day', o.o_orderdate, MIN(l.l_shipdate)) AS raw_t
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
        ),
        obs AS (
            SELECT grp,
                   LEAST(raw_t, 60) AS t,
                   CASE WHEN raw_t <= 60 THEN 1 ELSE 0 END AS ev
            FROM lag
        ),
        day_grp AS (
            SELECT t, grp,
                   CAST(SUM(ev) AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM obs GROUP BY t, grp
        ),
        risk AS (
            SELECT t, grp, d,
                   CAST(SUM(c) OVER (PARTITION BY grp ORDER BY t
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                        AS BIGINT) AS n_at_risk
            FROM day_grp
        ),
        merged AS (
            SELECT t,
                   CAST(SUM(d) AS BIGINT) AS d_all,
                   CAST(SUM(n_at_risk) AS BIGINT) AS n_all,
                   CAST(SUM(CASE WHEN grp = 1 THEN d ELSE 0 END) AS BIGINT)
                       AS d1,
                   CAST(SUM(CASE WHEN grp = 1 THEN n_at_risk ELSE 0 END)
                        AS BIGINT) AS n1
            FROM risk GROUP BY t
        ),
        terms AS (
            SELECT t, d1,
                   CAST(d_all AS DOUBLE) * n1 / n_all AS e1,
                   CASE WHEN n_all > 1 THEN
                       d_all * (CAST(n1 AS DOUBLE) / n_all)
                       * (1.0 - CAST(n1 AS DOUBLE) / n_all)
                       * (n_all - d_all) / (n_all - 1.0)
                   ELSE 0.0 END AS v1
            FROM merged WHERE d_all > 0
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_event_times,
               {sql_round4(sql_dsum('d1 - e1'))} AS observed_minus_expected,
               {sql_round4(
                   f"POWER({sql_dsum('d1 - e1')}, 2)"
                   f" / NULLIF({sql_dsum('v1')}, 0)"
               )} AS logrank_chi2
        FROM terms
    """,
    tags=("ml", "stats", "survival"),
)
def ml_logrank_test(spark: SparkSession, sf: str) -> DataFrame:
    """Log-rank test comparing fulfillment survival curves of urgent
    (priority 1–2) vs normal orders — the censoring-aware answer to
    'does priority actually ship faster' that a mean-lag t-test gets
    wrong whenever slow orders are right-censored at the horizon (same
    60-day censoring as ``ml_kaplan_meier``, whose curves this test
    formally compares): at each event day, observed group-1 deaths vs
    the hypergeometric expectation d·n₁/n, χ²₁ = (Σ(O−E))²/ΣV. At-risk
    counts are REVERSE cumulative sums over the ≤61-day grid — the
    entire test after the one orderkey-co-partitioned join runs on a
    day-grain frame. χ² > 3.84 rejects equal curves at 5%."""
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    lag = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.min("l_shipdate").alias("first_ship"))
        .select(
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            )
            .otherwise(0)
            .alias("grp"),
            F.datediff(F.col("first_ship"), F.col("o_orderdate")).alias(
                "raw_t"
            ),
        )
    )
    obs = lag.select(
        "grp",
        F.least(F.col("raw_t"), F.lit(60)).alias("t"),
        F.when(F.col("raw_t") <= 60, 1).otherwise(0).alias("ev"),
    )
    day_grp = obs.groupBy("t", "grp").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    wr = (
        W.partitionBy("grp")
        .orderBy("t")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    risk = day_grp.select(
        "t", "grp", "d",
        F.sum("c").over(wr).cast("bigint").alias("n_at_risk"),
    )
    merged = risk.groupBy("t").agg(
        F.sum("d").cast("bigint").alias("d_all"),
        F.sum("n_at_risk").cast("bigint").alias("n_all"),
        F.sum(F.when(F.col("grp") == 1, F.col("d")).otherwise(0))
        .cast("bigint")
        .alias("d1"),
        F.sum(F.when(F.col("grp") == 1, F.col("n_at_risk")).otherwise(0))
        .cast("bigint")
        .alias("n1"),
    )
    share = F.col("n1").cast("double") / F.col("n_all")
    terms = merged.filter(F.col("d_all") > 0).select(
        "d1",
        (F.col("d_all").cast("double") * share).alias("e1"),
        F.when(
            F.col("n_all") > 1,
            F.col("d_all")
            * share
            * (1.0 - share)
            * (F.col("n_all") - F.col("d_all"))
            / (F.col("n_all") - 1.0),
        )
        .otherwise(0.0)
        .alias("v1"),
    )
    ome = dsum(F.col("d1") - F.col("e1"))
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_event_times"),
        round4(ome).alias("observed_minus_expected"),
        # try_divide: a single-group degenerate cohort has zero variance —
        # the test statistic is undefined (NULL), not a zero-division
        # (unistr hazard fixture rotated every priority out of group 1)
        round4(F.try_divide(F.pow(ome, 2), dsum(F.col("v1")))).alias("logrank_chi2"),
    )


@query(
    "ml_boxcox_profile",
    oracle=f"""
        WITH x AS (
            SELECT CAST(value AS DOUBLE) AS v FROM events
            WHERE value > 0 AND NOT ISNAN(value)
        ),
        grid AS (SELECT CAST(UNNEST([-1.0, -0.5, 0.0, 0.5, 1.0, 2.0]) AS DOUBLE) AS lam),
        t AS (
            SELECT g.lam,
                   CASE WHEN g.lam = 0.0 THEN LN(x.v)
                        ELSE (POW(x.v, g.lam) - 1.0) / g.lam END AS y,
                   LN(x.v) AS lnv
            FROM x CROSS JOIN grid g
        ),
        s AS (
            SELECT lam,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(CAST(SUM(CAST(y AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS sy,
                   CAST(CAST(SUM(CAST(y * y AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE)
                       AS syy,
                   CAST(CAST(SUM(CAST(lnv AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE)
                       AS slnv
            FROM t GROUP BY lam
        )
        SELECT lam, n,
               {sql_round4(
                   'CASE WHEN (syy - sy * sy / n) / n <= 0 THEN NULL ELSE '
                   '-0.5 * n * LN((syy - sy * sy / n) / n)'
                   ' + (lam - 1.0) * slnv END'
               )}
                   AS profile_loglik,
               {sql_round4('(syy - sy * sy / n) / n')} AS var_transformed
        FROM s
    """,
    tags=("ml", "transform", "stats"),
)
def ml_boxcox_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Box-Cox λ selection by profile log-likelihood over a fixed grid —
    the feature-engineering pass that picks the variance-stabilizing power
    transform before regression/anomaly models: ℓ(λ) = −n/2·ln σ̂²_λ +
    (λ−1)·Σln x, with y_λ = (x^λ−1)/λ (ln x at λ=0). One broadcast
    grid fan-out (6 rows) over one corpus scan; per-λ variance comes from
    decimal-exact power sums, so the whole profile is a single grouped
    aggregation — cost is the scan, not the grid, and the argmax row is
    read off the 6-row result. Positive-value gate mirrors the
    transform's domain."""
    e = load_table(spark, sf, "events")
    x = e.filter((F.col("value") > 0) & ~F.isnan("value")).select(
        F.col("value").cast("double").alias("v")
    )
    grid = spark.createDataFrame([(l,) for l in (-1.0, -0.5, 0.0, 0.5, 1.0, 2.0)], "lam double")
    y = F.when(F.col("lam") == 0.0, F.log(F.col("v"))).otherwise(
        (F.pow(F.col("v"), F.col("lam")) - 1.0) / F.col("lam")
    )
    t = x.crossJoin(F.broadcast(grid)).select(
        "lam", y.alias("y"), F.log(F.col("v")).alias("lnv")
    )
    s = t.groupBy("lam").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
        dsum(F.col("lnv")).alias("slnv"),
    )
    n, sy, syy, slnv = (F.col(c) for c in ("n", "sy", "syy", "slnv"))
    var_t = (syy - sy * sy / n) / n
    return s.select(
        "lam", "n",
        round4(-0.5 * n * F.log(var_t) + (F.col("lam") - 1.0) * slnv).alias("profile_loglik"),
        round4(var_t).alias("var_transformed"),
    )


@query(
    "ml_ljung_box",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE)
                       AS v
            FROM events GROUP BY 1
        ),
        c AS (
            SELECT day, v, AVG(v) OVER () AS mu,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n,
                   ROW_NUMBER() OVER (ORDER BY day) AS i
            FROM daily
        ),
        lagged AS (
            SELECT k.k, c.n,
                   (a.v - a.mu) * (c.v - c.mu) AS num_term,
                   (c.v - c.mu) * (c.v - c.mu) AS den_term
            FROM c
            CROSS JOIN (SELECT UNNEST(RANGE(1, 8)) AS k) k
            LEFT JOIN c a ON a.i = c.i - k.k
        ),
        rho AS (
            SELECT k, MAX(n) AS n,
                   SUM(num_term) / SUM(den_term) AS r
            FROM lagged GROUP BY k
        ),
        q AS (
            SELECT k, n, r,
                   SUM(n * (n + 2.0) * r * r / (n - k))
                       OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS q_stat
            FROM rho
        )
        SELECT CAST(k AS INT) AS lag, n,
               {sql_round4('r')} AS rho,
               {sql_round4('q_stat')} AS q_cumulative
        FROM q
    """,
    tags=("ml", "timeseries", "test"),
)
def ml_ljung_box(spark: SparkSession, sf: str) -> DataFrame:
    """Ljung-Box portmanteau autocorrelation test on the daily revenue
    series: ρ̂_k for lags 1..7 (self-join on shifted day index — at day
    grain this is a ~30-row frame, so the lag fan-out is free) and the
    cumulative Q_h = n(n+2)·Σ ρ̂²_k/(n−k), the statistic compared to
    χ²_h to reject 'residuals are white noise'. The standard diagnostic
    AFTER a forecast fit (``workload_forecast_backtest``): significant Q
    says the model left structure on the table. Q is emitted per lag so
    the caller reads any h without re-running."""
    e = load_table(spark, sf, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        dsum(F.col("value")).alias("v")
    )
    wall = W.partitionBy()
    c = daily.select(
        "day", "v",
        F.avg("v").over(wall).alias("mu"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n"),
        F.row_number().over(W.orderBy("day")).alias("i"),
    )
    ks = spark.range(1, 8).select(F.col("id").cast("bigint").alias("k"))
    a = c.select(F.col("i").alias("ai"), (F.col("v") - F.col("mu")).alias("ad"))
    lagged = (
        c.crossJoin(F.broadcast(ks))
        .join(a, F.col("ai") == F.col("i") - F.col("k"), "left")
        .select(
            "k", "n",
            (F.col("ad") * (F.col("v") - F.col("mu"))).alias("num_term"),
            ((F.col("v") - F.col("mu")) * (F.col("v") - F.col("mu"))).alias("den_term"),
        )
    )
    rho = lagged.groupBy("k").agg(
        F.max("n").alias("n"), (F.sum("num_term") / F.sum("den_term")).alias("r")
    )
    wq = W.orderBy("k").rowsBetween(W.unboundedPreceding, W.currentRow)
    q = rho.withColumn(
        "q_stat",
        F.sum(F.col("n") * (F.col("n") + 2.0) * F.col("r") * F.col("r") / (F.col("n") - F.col("k"))).over(wq),
    )
    return q.select(
        F.col("k").cast("int").alias("lag"), "n",
        round4(F.col("r")).alias("rho"),
        round4(F.col("q_stat")).alias("q_cumulative"),
    )


@query(
    "workload_sax_paa",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE)
                       AS v
            FROM events GROUP BY 1
        ),
        z AS (
            SELECT day, v,
                   (v - AVG(v) OVER ()) / STDDEV_SAMP(v) OVER () AS zv,
                   NTILE(8) OVER (ORDER BY day) AS seg
            FROM daily
        ),
        paa AS (
            SELECT seg,
                   CAST(COUNT(*) AS BIGINT) AS n_days,
                   AVG(zv) AS paa
            FROM z GROUP BY seg
        )
        SELECT CAST(seg AS INT) AS seg, n_days,
               {sql_round4('paa')} AS paa_z,
               CASE WHEN paa < -0.6745 THEN 'a'
                    WHEN paa < 0.0 THEN 'b'
                    WHEN paa < 0.6745 THEN 'c'
                    ELSE 'd' END AS symbol
        FROM paa
    """,
    tags=("workload", "timeseries", "mining"),
)
def workload_sax_paa(spark: SparkSession, sf: str) -> DataFrame:
    """SAX (Symbolic Aggregate approXimation): z-normalize the daily
    series, Piecewise-Aggregate into 8 equal-count segments (ntile over
    the day order — deterministic on both engines), then map each segment
    mean to a 4-letter alphabet at the N(0,1) quartile breakpoints
    (±0.6745, 0). The output word ('bdca…') is the classic low-cost
    time-series index: motif discovery, anomaly grep, and whole-series
    similarity all become STRING operations downstream. Day-grain input →
    the global windows ride ~30 rows; the one scan is the cost."""
    e = load_table(spark, sf, "events")
    daily = e.groupBy(F.col("ts").cast("date").cast("string").alias("day")).agg(
        dsum(F.col("value")).alias("v")
    )
    wall = W.partitionBy()
    z = daily.select(
        "day",
        ((F.col("v") - F.avg("v").over(wall)) / F.stddev_samp("v").over(wall)).alias("zv"),
        F.ntile(8).over(W.orderBy("day")).alias("seg"),
    )
    paa = z.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"), F.avg("zv").alias("paa")
    )
    symbol = (
        F.when(F.col("paa") < -0.6745, "a")
        .when(F.col("paa") < 0.0, "b")
        .when(F.col("paa") < 0.6745, "c")
        .otherwise("d")
    )
    return paa.select(
        F.col("seg").cast("int").alias("seg"), "n_days",
        round4(F.col("paa")).alias("paa_z"),
        symbol.alias("symbol"),
    )


@query(
    "ml_hurst_rs",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE)
                       AS v
            FROM events GROUP BY 1
        ),
        idx AS (
            SELECT v, ROW_NUMBER() OVER (ORDER BY day) - 1 AS i FROM daily
        ),
        blocks AS (
            SELECT n.n, i // n.n AS b, i, v
            FROM idx CROSS JOIN (SELECT UNNEST([8, 16]) AS n) n
        ),
        stats AS (
            SELECT n, b, i, v,
                   AVG(v) OVER (PARTITION BY n, b) AS mu,
                   STDDEV_POP(v) OVER (PARTITION BY n, b) AS sd,
                   CAST(COUNT(*) OVER (PARTITION BY n, b) AS BIGINT) AS bn
            FROM blocks
        ),
        cum AS (
            SELECT n, b, sd, bn,
                   SUM(v - mu) OVER (PARTITION BY n, b ORDER BY i
                                     ROWS UNBOUNDED PRECEDING) AS c
            FROM stats
        ),
        rs AS (
            SELECT n, b,
                   (MAX(c) - MIN(c)) / MAX(sd) AS rs_val
            FROM cum
            WHERE bn = n AND sd > 0
            GROUP BY n, b, sd
        ),
        agg AS (
            SELECT n, AVG(rs_val) AS mean_rs, CAST(COUNT(*) AS BIGINT) AS n_blocks
            FROM rs GROUP BY n
        )
        SELECT CAST(n AS INT) AS window_n, n_blocks,
               {sql_round4('mean_rs')} AS mean_rs,
               {sql_round4('LN(mean_rs) / LN(CAST(n AS DOUBLE))')} AS h_point
        FROM agg
    """,
    tags=("ml", "timeseries", "fractal"),
)
def ml_hurst_rs(spark: SparkSession, sf: str) -> DataFrame:
    """Hurst exponent ingredients by rescaled-range (R/S) analysis of the
    daily series: split into complete blocks of n ∈ {8, 16} days, per
    block take range(cumulative deviations)/σ, average per n, and emit
    ln(R/S)/ln(n) — H ≈ 0.5 is a random walk, > 0.5 persistent
    (trending), < 0.5 mean-reverting; the two-point slope
    (ln RS₁₆ − ln RS₈)/ln 2 is the classical H estimate, left to the
    caller so each n's diagnostics stay visible. Everything is windows
    over (n, block) partitions on the ~30-row day grain — the fan-out is
    the 2-row n grid, not the data."""
    e = load_table(spark, sf, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        dsum(F.col("value")).alias("v")
    )
    idx = daily.select(
        "v", (F.row_number().over(W.orderBy("day")) - 1).alias("i")
    )
    ns = spark.createDataFrame([(8,), (16,)], "n long")
    blocks = idx.crossJoin(F.broadcast(ns)).select(
        "n", (F.col("i") / F.col("n")).cast("bigint").alias("b"), "i", "v"
    )
    wb = W.partitionBy("n", "b")
    stats = blocks.select(
        "n", "b", "i", "v",
        F.avg("v").over(wb).alias("mu"),
        F.stddev_pop("v").over(wb).alias("sd"),
        F.count(F.lit(1)).over(wb).cast("bigint").alias("bn"),
    )
    wcum = W.partitionBy("n", "b").orderBy("i").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = stats.select(
        "n", "b", "sd", "bn", F.sum(F.col("v") - F.col("mu")).over(wcum).alias("c")
    )
    rs = (
        cum.filter((F.col("bn") == F.col("n")) & (F.col("sd") > 0))
        .groupBy("n", "b", "sd")
        .agg(((F.max("c") - F.min("c")) / F.max("sd")).alias("rs_val"))
    )
    agg = rs.groupBy("n").agg(
        F.avg("rs_val").alias("mean_rs"), F.count(F.lit(1)).cast("bigint").alias("n_blocks")
    )
    return agg.select(
        F.col("n").cast("int").alias("window_n"), "n_blocks",
        round4(F.col("mean_rs")).alias("mean_rs"),
        round4(F.log(F.col("mean_rs")) / F.log(F.col("n").cast("double"))).alias("h_point"),
    )



@query(
    "ml_mahalanobis_t2",
    oracle=f"""
        WITH s AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   AVG(l_quantity) AS mx, AVG(l_extendedprice) AS my,
                   VAR_SAMP(l_quantity) AS sxx,
                   VAR_SAMP(l_extendedprice) AS syy,
                   COVAR_SAMP(l_quantity, l_extendedprice) AS sxy
            FROM lineitem GROUP BY l_returnflag
        ),
        g AS (
            SELECT AVG(l_quantity) AS gx, AVG(l_extendedprice) AS gy
            FROM lineitem
        ),
        t AS (
            SELECT s.l_returnflag, s.n,
                   (s.mx - g.gx) AS dx, (s.my - g.gy) AS dy,
                   s.sxx, s.syy, s.sxy,
                   s.sxx * s.syy - s.sxy * s.sxy AS det
            FROM s CROSS JOIN g
        )
        SELECT l_returnflag, n,
               {sql_round4('dx')} AS delta_qty,
               {sql_round4('dy / 1000.0')} AS delta_price_k,
               {sql_round4('n * (dx * (syy * dx - sxy * dy) + dy * (sxx * dy - sxy * dx)) / det')}
                   AS hotelling_t2,
               n * (dx * (syy * dx - sxy * dy) + dy * (sxx * dy - sxy * dx)) / det
                   > 13.8 AS sig_001
        FROM t
    """,
    tags=("ml", "multivariate", "test"),
)
def ml_mahalanobis_t2(spark: SparkSession, sf: str) -> DataFrame:
    """Hotelling T² per return-flag group: the squared Mahalanobis
    distance of the group's (quantity, price) mean vector from the global
    mean, scaled by n — the multivariate 'is this segment different'
    test that two separate t-tests get wrong when the features correlate
    (the 2×2 covariance inverse is inlined by Cramer's rule, no linear
    algebra library). χ²₂ 0.1% critical value (13.8) inlined as the
    verdict. One pass for the five per-group moments + one for the global
    mean; all algebra on a 3-row frame. The per-ROW Mahalanobis outlier
    variant reuses the same inverse against each row's deviation —
    omitted here because the per-group test is the decision-grade
    output."""
    li = load_table(spark, sf, "lineitem")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("l_quantity").alias("mx"),
        F.avg("l_extendedprice").alias("my"),
        F.var_samp("l_quantity").alias("sxx"),
        F.var_samp("l_extendedprice").alias("syy"),
        F.covar_samp("l_quantity", "l_extendedprice").alias("sxy"),
    )
    g = li.agg(
        F.avg("l_quantity").alias("gx"), F.avg("l_extendedprice").alias("gy")
    )
    t = s.crossJoin(F.broadcast(g)).select(
        "l_returnflag", "n",
        (F.col("mx") - F.col("gx")).alias("dx"),
        (F.col("my") - F.col("gy")).alias("dy"),
        "sxx", "syy", "sxy",
        (F.col("sxx") * F.col("syy") - F.col("sxy") * F.col("sxy")).alias("det"),
    )
    dx, dy = F.col("dx"), F.col("dy")
    sxx, syy, sxy, det, n = (F.col(c) for c in ("sxx", "syy", "sxy", "det", "n"))
    t2 = F.try_divide(
        n * (dx * (syy * dx - sxy * dy) + dy * (sxx * dy - sxy * dx)), det
    )
    return t.select(
        "l_returnflag", "n",
        round4(dx).alias("delta_qty"),
        round4(dy / 1000.0).alias("delta_price_k"),
        round4(t2).alias("hotelling_t2"),
        (t2 > 13.8).alias("sig_001"),
    )


@query(
    "ml_fisher_lda",
    oracle=f"""
        WITH feat AS (
            SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS cls,
                   CAST(n_chars AS DOUBLE) AS f1,
                   CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) AS f2
            FROM documents
        ),
        s AS (
            SELECT cls, CAST(COUNT(*) AS BIGINT) AS n,
                   AVG(f1) AS m1, AVG(f2) AS m2,
                   VAR_SAMP(f1) AS v11, VAR_SAMP(f2) AS v22,
                   COVAR_SAMP(f1, f2) AS v12
            FROM feat GROUP BY cls
        ),
        w AS (
            SELECT
                MAX(CASE WHEN cls = 1 THEN m1 END) - MAX(CASE WHEN cls = 0 THEN m1 END) AS d1,
                MAX(CASE WHEN cls = 1 THEN m2 END) - MAX(CASE WHEN cls = 0 THEN m2 END) AS d2,
                (SUM((n - 1) * v11)) / (SUM(n) - 2) AS p11,
                (SUM((n - 1) * v22)) / (SUM(n) - 2) AS p22,
                (SUM((n - 1) * v12)) / (SUM(n) - 2) AS p12,
                CAST(SUM(n) AS BIGINT) AS n_total
            FROM s
        )
        SELECT n_total,
               {sql_round4('(p22 * d1 - p12 * d2) / (p11 * p22 - p12 * p12)')} AS w1,
               {sql_round4('(p11 * d2 - p12 * d1) / (p11 * p22 - p12 * p12)')} AS w2,
               {sql_round4('(d1 * (p22 * d1 - p12 * d2) + d2 * (p11 * d2 - p12 * d1)) / (p11 * p22 - p12 * p12)')}
                   AS fisher_separation
        FROM w
    """,
    tags=("ml", "classification", "multivariate"),
)
def ml_fisher_lda(spark: SparkSession, sf: str) -> DataFrame:
    """Fisher linear discriminant, closed form: the direction w = S_w⁻¹
    (μ₁ − μ₀) that maximally separates English vs non-English documents
    in the (chars, tokens) feature plane, with the pooled within-class
    covariance inverted by Cramer's rule and the Mahalanobis separation
    Δᵀ S_w⁻¹ Δ (= the discriminability the classifier can achieve) as the
    quality scalar. Two grouped aggregates → six numbers → algebra on one
    row; the projection w·x then scores 100 TB of rows as one fused
    expression — train-free, iteration-free, the LDA complement of the
    per-class Naive Bayes op."""
    d = load_table(spark, sf, "documents")
    feat = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("cls"),
        F.col("n_chars").cast("double").alias("f1"),
        F.size(F.split("text", " ")).cast("double").alias("f2"),
    )
    s = feat.groupBy("cls").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("f1").alias("m1"), F.avg("f2").alias("m2"),
        F.var_samp("f1").alias("v11"), F.var_samp("f2").alias("v22"),
        F.covar_samp("f1", "f2").alias("v12"),
    )
    w = s.agg(
        (F.max(F.when(F.col("cls") == 1, F.col("m1"))) - F.max(F.when(F.col("cls") == 0, F.col("m1")))).alias("d1"),
        (F.max(F.when(F.col("cls") == 1, F.col("m2"))) - F.max(F.when(F.col("cls") == 0, F.col("m2")))).alias("d2"),
        (F.sum((F.col("n") - 1) * F.col("v11")) / (F.sum("n") - 2)).alias("p11"),
        (F.sum((F.col("n") - 1) * F.col("v22")) / (F.sum("n") - 2)).alias("p22"),
        (F.sum((F.col("n") - 1) * F.col("v12")) / (F.sum("n") - 2)).alias("p12"),
        F.sum("n").cast("bigint").alias("n_total"),
    )
    d1, d2 = F.col("d1"), F.col("d2")
    p11, p22, p12 = F.col("p11"), F.col("p22"), F.col("p12")
    det = p11 * p22 - p12 * p12
    w1 = (p22 * d1 - p12 * d2) / det
    w2 = (p11 * d2 - p12 * d1) / det
    return w.select(
        "n_total",
        round4(w1).alias("w1"),
        round4(w2).alias("w2"),
        round4(d1 * w1 + d2 * w2).alias("fisher_separation"),
    )



@query(
    "ml_weibull_fit",
    oracle=f"""
        WITH gaps AS (
            SELECT CAST(epoch_us(ts) AS DOUBLE) / 1000000.0
                   - CAST(epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id))
                          AS DOUBLE) / 1000000.0 AS t
            FROM events WHERE event_type = 'purchase'
        ),
        pos AS (
            SELECT t,
                   ROW_NUMBER() OVER (ORDER BY t) AS i,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM gaps WHERE t IS NOT NULL AND t > 0
        ),
        lin AS (
            SELECT LN(t) AS x,
                   LN(-LN(1.0 - (i - 0.3) / (n + 0.4))) AS y,
                   n
            FROM pos
        ),
        s AS (
            SELECT MAX(n) AS n, COUNT(*) AS m,
                   SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
                   SUM(x * x) AS sxx, SUM(y * y) AS syy
            FROM lin
        )
        SELECT n,
               {sql_round4('(m * sxy - sx * sy) / (m * sxx - sx * sx)')} AS shape_beta,
               {sql_round4('EXP(-((sy - ((m * sxy - sx * sy) / (m * sxx - sx * sx)) * sx) / m) / ((m * sxy - sx * sy) / (m * sxx - sx * sx))) / 3600.0')}
                   AS scale_eta_hours,
               {sql_round4('((m * sxy - sx * sy) * (m * sxy - sx * sy)) / ((m * sxx - sx * sx) * (m * syy - sy * sy))')}
                   AS r2
        FROM s
    """,
    tags=("ml", "reliability", "survival"),
)
def ml_weibull_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Weibull fit of inter-purchase times by median-rank regression:
    sort the gaps, Bernard's approximation F_i = (i−0.3)/(n+0.4) for the
    plotting positions, then ln(−ln(1−F)) = β·ln t − β·ln η is a straight
    line whose OLS slope IS the shape β and intercept yields the scale η
    (reported in hours). β < 1 says bursty/clustered repeat purchasing
    (the 'infant mortality' analogue), β ≈ 1 memoryless, β > 1 a regular
    cadence — the reliability-engineering read of customer rhythm,
    complementing ``ml_kaplan_meier``'s nonparametric curve with a
    2-parameter model. One lag window + one global rank + closed-form
    OLS; the float sums ride ln-transformed values whose magnitudes are
    tame, so plain double sums replay exactly."""
    e = load_table(spark, sf, "events").filter(F.col("event_type") == "purchase")
    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        (F.col("ts").cast("double") - F.lag("ts").over(wl).cast("double")).alias("t")
    ).filter(F.col("t").isNotNull() & (F.col("t") > 0))
    wall = W.partitionBy()
    pos = gaps.select(
        "t",
        F.row_number().over(W.orderBy("t")).alias("i"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n"),
    )
    lin = pos.select(
        F.log("t").alias("x"),
        F.log(-F.log(1.0 - (F.col("i") - 0.3) / (F.col("n") + 0.4))).alias("y"),
        "n",
    )
    s = lin.agg(
        F.max("n").alias("n"), F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"), F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"), F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    m, sx, sy = F.col("m"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    eta = F.exp(-((sy - beta * sx) / m) / beta) / 3600.0
    r2 = ((m * sxy - sx * sy) * (m * sxy - sx * sy)) / ((m * sxx - sx * sx) * (m * syy - sy * sy))
    return s.select(
        "n",
        round4(beta).alias("shape_beta"),
        round4(eta).alias("scale_eta_hours"),
        round4(r2).alias("r2"),
    )


@query(
    "ml_tukey_hsd",
    oracle=f"""
        WITH g AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE)
                       / COUNT(*) AS m,
                   VAR_SAMP(CAST(value AS DOUBLE)) AS v
            FROM events
            -- Spark's isnan(NULL) is FALSE (NULL rows survive
            -- ~isnan); DuckDB's ISNAN(NULL) is NULL — keep NULLs
            WHERE value IS NULL OR NOT ISNAN(value)
            GROUP BY event_type
        ),
        mse AS (
            SELECT SUM((n - 1) * v) / SUM(n - 1) AS mse FROM g
        ),
        pairs AS (
            SELECT a.event_type AS g1, b.event_type AS g2,
                   a.m - b.m AS diff,
                   SQRT(mse.mse / 2.0 * (1.0 / a.n + 1.0 / b.n)) AS se_q
            FROM g a JOIN g b ON a.event_type < b.event_type
            CROSS JOIN mse
        )
        SELECT g1, g2,
               {sql_round4('diff')} AS mean_diff,
               {sql_round4('se_q')} AS se_q,
               {sql_round4('ABS(diff) / se_q')} AS q_stat,
               ABS(diff) / se_q > 3.86 AS significant
        FROM pairs
    """,
    tags=("ml", "test", "posthoc"),
)
def ml_tukey_hsd(spark: SparkSession, sf: str) -> DataFrame:
    """Tukey HSD post-hoc pairwise comparisons across event types — the
    step AFTER ``ml_anova_oneway``'s omnibus F says 'some mean differs':
    every pair's studentized range statistic q = |Δmean| / √(MSE/2·
    (1/n_i + 1/n_j)) against the k=5, df=∞ 5% critical value 3.86,
    controlling family-wise error where 10 naive t-tests would inflate
    it. MSE pools the per-group variances from ONE grouped aggregate;
    the 10 pairs come from a self-join of the 5-row group frame —
    post-hoc inference is algebra, never a rescan."""
    e = load_table(spark, sf, "events").filter(~F.isnan("value"))
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        davg(F.col("value").cast("double")).alias("m"),
        F.var_samp(F.col("value").cast("double")).alias("v"),
    )
    mse = g.agg(
        (F.sum((F.col("n") - 1) * F.col("v")) / F.sum(F.col("n") - 1)).alias("mse")
    )
    a = g.select(F.col("event_type").alias("g1"), F.col("n").alias("n1"), F.col("m").alias("m1"))
    b = g.select(F.col("event_type").alias("g2"), F.col("n").alias("n2"), F.col("m").alias("m2"))
    pairs = (
        a.join(b, F.col("g1") < F.col("g2"))
        .crossJoin(F.broadcast(mse))
        .select(
            "g1", "g2",
            (F.col("m1") - F.col("m2")).alias("diff"),
            F.sqrt(F.col("mse") / 2.0 * (1.0 / F.col("n1") + 1.0 / F.col("n2"))).alias("se_q"),
        )
    )
    q = F.abs(F.col("diff")) / F.col("se_q")
    return pairs.select(
        "g1", "g2",
        round4(F.col("diff")).alias("mean_diff"),
        round4(F.col("se_q")).alias("se_q"),
        round4(q).alias("q_stat"),
        (q > 3.86).alias("significant"),
    )
