"""Window-function operators (SURVEY.md §2B.5).

All orderings are made total (unique tiebreak column) so ranking and frame
results are deterministic on both engines. Double sums over frames use the
decimal trick from ``_helpers`` (window sums are sequential but engines may
use pairwise/segment-tree accumulation — decimal is order-independent).

Scale note: every window here partitions by a real key (customer, user,
returnflag) so work distributes; the two global-ordering ops (sort_multi in
sorts_setops, limit_topk_global) are the only single-partition windows and
exist to test that exact surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from datapipelines_python_spark.catalog import load_table
from datapipelines_python_spark.operators._helpers import DEC
from datapipelines_python_spark.registry import query

_DEC = "decimal(38,8)"


def _sql_wdsum(expr: str, over: str) -> str:
    """Window decimal-sum rendered back to double (VARCHAR hop, see _helpers)."""
    return f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(38,8))) OVER {over} AS VARCHAR) AS DOUBLE)"


@query(
    "win_row_number",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
               ) AS INT) AS rn
        FROM orders
    """,
    tags=("window",),
)
def win_row_number(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return o.select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rn"))


@query(
    "win_rank_dense",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(RANK() OVER w AS INT) AS rnk,
               CAST(DENSE_RANK() OVER w AS INT) AS drnk,
               PERCENT_RANK() OVER w AS prnk,
               CAST(NTILE(4) OVER w AS INT) AS quartile,
               CUME_DIST() OVER w AS cdist
        FROM lineitem
        WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber)
    """,
    tags=("window", "rank"),
)
def win_rank_dense(spark: SparkSession, sf: str) -> DataFrame:
    """Full ranking family. Ordering includes (l_orderkey, l_linenumber) so
    NTILE's tie-splitting is deterministic."""
    li = load_table(spark, sf, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy("l_quantity", "l_orderkey", "l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "win_lag_lead",
    oracle="""
        SELECT event_id, user_id, value,
               LAG(value) OVER w AS prev_value,
               LEAD(value) OVER w AS next_value,
               LAG(value, 2, -1.0) OVER w AS prev2_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "offset"),
)
def win_lag_lead(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_value"),
    )


@query(
    "win_running_sum",
    oracle=f"""
        SELECT o_custkey, o_orderkey,
               {_sql_wdsum('o_totalprice',
                           '(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey '
                           'ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)')} AS running_spend
        FROM orders
    """,
    tags=("window", "frame"),
)
def win_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    """Cumulative sum per customer over order history."""
    o = load_table(spark, sf, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double").alias("running_spend"),
    )


@query(
    "win_moving_avg",
    oracle=f"""
        SELECT event_id, user_id,
               {_sql_wdsum('value',
                           '(PARTITION BY user_id ORDER BY ts, event_id '
                           'ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)')}
               / COUNT(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg
        FROM events
    """,
    tags=("window", "frame"),
)
def win_moving_avg(spark: SparkSession, sf: str) -> DataFrame:
    """3-row sliding mean of event value per user (decimal-sum / count)."""
    e = load_table(spark, sf, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        (F.sum(F.col("value").cast(_DEC)).over(w).cast("double") / F.count("value").over(w)).alias(
            "moving_avg"
        ),
    )


@query(
    "win_range_frame",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               CAST(COUNT(*) OVER (
                   PARTITION BY o_orderstatus ORDER BY o_totalprice
                   RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n_within_10k_below
        FROM orders
    """,
    tags=("window", "range"),
)
def win_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE frame on a numeric ordering: peers within a value distance,
    not a row count — deterministic under ties by definition."""
    o = load_table(spark, sf, "orders")
    w = (
        W.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_within_10k_below"),
    )


@query(
    "win_first_last_value",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               FIRST_VALUE(l_quantity) OVER w AS first_qty,
               LAST_VALUE(l_quantity) OVER w AS last_qty,
               LAST_VALUE(l_quantity) OVER (
                   PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS final_qty
        FROM lineitem
        WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "frame"),
)
def win_first_last_value(spark: SparkSession, sf: str) -> DataFrame:
    """first/last_value with explicit frames (the default growing frame vs
    the whole-partition frame — the classic last_value gotcha).

    (l_orderkey, l_linenumber) is NOT unique in the fixtures; ordering also
    by l_quantity means remaining ties are between equal values, so the
    emitted first/last values are deterministic.
    """
    li = load_table(spark, sf, "lineitem")
    growing = (
        W.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_quantity")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    full = (
        W.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_quantity")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.first("l_quantity").over(growing).alias("first_qty"),
        F.last("l_quantity").over(growing).alias("last_qty"),
        F.last("l_quantity").over(full).alias("final_qty"),
    )


@query(
    "topk_per_group",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        ) <= 3
    """,
    tags=("window", "topk"),
    bench=True,
)
def topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 orders per customer. Spark ≥3.5 pushes the rn<=k filter into
    the window sort (InferWindowGroupLimit) — per-partition heap, no full
    materialization of ranked rows."""
    o = load_table(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "win_sessionize_batch",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                             OR LAG(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts, event_id,
                   SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS session_seq
            FROM flagged
        )
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sess
        GROUP BY user_id, session_seq
    """,
    tags=("window", "sessionize"),
)
def win_sessionize_batch(spark: SparkSession, sf: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands, 30-minute gap): the
    lag-flag + running-sum formulation — one shuffle on user_id, then two
    window passes and a hash agg inside the same partitioning (Catalyst
    reuses the exchange). Batch twin of ``stream_session_window``; at
    scale this backfills history while the streaming variant handles the
    live edge — both must agree on the session definition, which this
    shared-oracle pair pins."""
    e = load_table(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0).alias("is_new"),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "win_range_interval",
    oracle="""
        SELECT event_id, user_id, ts,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
               CAST(CAST(SUM(CAST(value AS DECIMAL(38,8))) OVER w AS VARCHAR)
                    AS DOUBLE) AS sum_last_hour
        FROM events
        WINDOW w AS (
            PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
        )
    """,
    tags=("window",),
)
def win_range_interval(spark: SparkSession, sf: str) -> DataFrame:
    """Time-interval range frame: per user, rolling one-hour count/sum at
    every event. Spark's rangeBetween needs a numeric ordering key, so the
    frame orders by epoch microseconds with a 3.6e9 µs lookback — exactly
    DuckDB's RANGE BETWEEN INTERVAL 1 HOUR on the raw timestamp (events.ts
    is µs precision in both engines). One shuffle on user_id; within the
    partition the running frame is a sliding two-pointer, not O(n²)."""
    e = load_table(spark, sf, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("sum_last_hour"),
    )


@query(
    "win_running_distinct",
    oracle="""
        WITH first_day AS (
            SELECT event_type, user_id,
                   MIN(CAST(ts AS DATE)) AS d0
            FROM events GROUP BY event_type, user_id
        ),
        per_day AS (
            SELECT event_type, d0 AS day, COUNT(*) AS new_users
            FROM first_day GROUP BY event_type, d0
        )
        SELECT event_type, day,
               CAST(new_users AS BIGINT) AS new_users,
               CAST(SUM(new_users) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_distinct_users
        FROM per_day
    """,
    tags=("window", "scale"),
)
def win_running_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Running COUNT(DISTINCT) per key over time — the DAU/cumulative-reach
    query. Neither engine supports DISTINCT aggregates in a window frame at
    scale (a naive ``size(collect_set() OVER ...)`` materializes the full
    set per row — O(users) state PER ROW, dead at 100 TB). The scalable
    identity: a user is distinct-new only on their FIRST day, so
    min-per-(type,user) → count new users per day → running SUM. Two
    partial-agg shuffles plus a window over ~30 rows per type."""
    e = load_table(spark, sf, "events")
    first_day = e.groupBy("event_type", "user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d0")
    )
    per_day = first_day.groupBy("event_type", F.col("d0").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return per_day.select(
        "event_type",
        "day",
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w).cast("bigint").alias("cum_distinct_users"),
    )


@query(
    "win_share_of_total",
    oracle="""
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,8)))
                        AS VARCHAR) AS DOUBLE) AS cust_total
            FROM orders GROUP BY o_custkey
        ),
        tot AS (
            SELECT o_custkey, cust_total,
                   CAST(CAST(SUM(CAST(cust_total AS DECIMAL(38,8))) OVER ()
                        AS VARCHAR) AS DOUBLE) AS grand_total
            FROM per_cust
        )
        SELECT o_custkey, cust_total,
               FLOOR((cust_total / grand_total) * 10000.0 + 0.5) / 10000.0
                   AS share
        FROM tot
    """,
    tags=("window", "bi"),
)
def win_share_of_total(spark: SparkSession, sf: str) -> DataFrame:
    """Share-of-total: per-customer revenue over an unpartitioned window
    sum — the percent-of-whole column every BI layer needs. The window
    input is the ALREADY-AGGREGATED per-customer frame (cardinality =
    customers, not orders), so the single-partition window is cheap; the
    decimal window sum keeps the denominator identical on both engines
    and under any partitioning."""
    o = load_table(spark, sf, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("cust_total")
    )
    w = W.partitionBy()
    grand = F.sum(F.col("cust_total").cast(DEC)).over(w).cast("double")
    return per_cust.select(
        "o_custkey", "cust_total",
        (F.floor((F.col("cust_total") / grand) * 10000.0 + 0.5) / 10000.0)
            .alias("share"),
    )


@query(
    "win_following_frame",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderdate,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,8))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING
               ) AS VARCHAR) AS DOUBLE) AS next3_total,
               CAST(COUNT(*) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
               ) AS BIGINT) AS n_later
        FROM orders
    """,
    tags=("window",),
)
def win_following_frame(spark: SparkSession, sf: str) -> DataFrame:
    """Forward-looking frames (CURRENT ROW .. k FOLLOWING, and 1 FOLLOWING
    .. UNBOUNDED): the look-ahead twin of the running/moving frames — how
    much will this customer spend over their next three orders, how many
    orders remain. Same single shuffle+sort as any window; frame direction
    is free. Decimal window sum keeps the money math engine-exact;
    (date, key) ordering makes tie order deterministic."""
    o = load_table(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.sum(F.col("o_totalprice").cast(DEC))
            .over(w.rowsBetween(W.currentRow, 2))
            .cast("double").alias("next3_total"),
        F.count(F.lit(1))
            .over(w.rowsBetween(1, W.unboundedFollowing))
            .cast("bigint").alias("n_later"),
    )


@query(
    "win_nth_value",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice,
               NTH_VALUE(o_totalprice, 2) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS second_order_price,
               FIRST_VALUE(o_orderkey) OVER (
                   PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS biggest_order_key
        FROM orders
    """,
    tags=("window",),
)
def win_nth_value(spark: SparkSession, sf: str) -> DataFrame:
    """``nth_value`` over the full partition (second order ever placed)
    plus a differently-ordered ``first_value`` in the same select — two
    window specs, two sorts, one shuffle each on the same key; Catalyst
    shares the exchange between them. Explicit full-frame bounds because
    the default frame stops at CURRENT ROW, which silently turns
    nth_value into 'nth so far' — a classic window-frame bug."""
    o = load_table(spark, sf, "orders")
    w1 = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    w2 = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey", "o_orderkey", "o_totalprice",
        F.nth_value("o_totalprice", 2).over(w1).alias("second_order_price"),
        F.first("o_orderkey").over(w2).alias("biggest_order_key"),
    )


@query(
    "win_forward_fill",
    oracle="""
        WITH gappy AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                   CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
            FROM events
        )
        SELECT event_id, user_id, ts, v,
               LAST_VALUE(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS v_filled
        FROM gappy
    """,
    tags=("window", "gapfill"),
)
def win_forward_fill(spark: SparkSession, sf: str) -> DataFrame:
    """Forward fill (last observation carried forward): ``last(...,
    ignorenulls=True)`` over a running frame propagates the latest
    non-null reading into gaps — the sensor/metric gap-repair primitive
    (a third of events nulled here to create gaps). One window shuffle on
    the series key; rows before the first observation stay NULL, which
    is the honest answer (fabricating a backfill needs a policy, not a
    default)."""
    e = load_table(spark, sf, "events")
    gappy = e.select(
        "event_id", "user_id", "ts",
        F.when(F.col("event_id") % 3 == 0, None).otherwise(F.col("value"))
            .alias("v"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return gappy.select(
        "event_id", "user_id", "ts", "v",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
    )


@query(
    "win_rank_fractions",
    oracle="""
        WITH ranked AS (
            SELECT event_type,
                   value,
                   PERCENT_RANK() OVER (PARTITION BY event_type
                                        ORDER BY value) AS pr,
                   CUME_DIST() OVER (PARTITION BY event_type
                                     ORDER BY value) AS cd,
                   NTILE(4) OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS quartile
            FROM events
        )
        SELECT event_type,
               quartile,
               CAST(COUNT(*) AS BIGINT) AS n,
               FLOOR(MIN(pr) * 10000.0 + 0.5) / 10000.0 AS min_pr,
               FLOOR(MAX(pr) * 10000.0 + 0.5) / 10000.0 AS max_pr,
               FLOOR(MAX(cd) * 10000.0 + 0.5) / 10000.0 AS max_cd
        FROM ranked
        GROUP BY event_type, quartile
    """,
    tags=("window", "rank"),
)
def win_rank_fractions(spark: SparkSession, sf: str) -> DataFrame:
    """The fractional-rank window family in one plan: PERCENT_RANK,
    CUME_DIST, and NTILE(4) per event type, summarized per quartile (the
    quartile boundaries in percent-rank/cume-dist terms). NTILE's
    ordering adds event_id as tiebreak because its bucketing — unlike
    percent_rank's — depends on total order among equal keys. All three
    functions share ONE window sort per partition key; Spark evaluates
    them in a single WindowExec pass, and partitioning by event_type
    keeps the sort distributed (no global window — the 100 TB shape)."""
    e = load_table(spark, sf, "events")
    w = W.partitionBy("event_type").orderBy("value")
    wt = W.partitionBy("event_type").orderBy("value", "event_id")
    ranked = e.select(
        "event_type",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(wt).alias("quartile"),
    )
    r4 = lambda c: F.floor(c * 10000.0 + 0.5) / 10000.0
    return ranked.groupBy("event_type", "quartile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        r4(F.min("pr")).alias("min_pr"),
        r4(F.max("pr")).alias("max_pr"),
        r4(F.max("cd")).alias("max_cd"),
    )
