"""Composite analytical workloads: TPC-H queries adapted to the fixture
star schema (SURVEY.md §1.2 — a column subset of real TPC-H, so predicates
on missing columns are re-targeted to existing ones; each docstring notes
the deviation).

These are the "a user could run their whole workload here" proof: multi-join
star queries, exists/anti-join subqueries, group-wise top-k — each one plan
composed entirely of operators from §2B, exercised end-to-end through
Catalyst (join reordering, broadcast selection via AQE, partial aggregation).

Scale notes: every query keeps the fact table (lineitem/orders) on the
probe side; dimensions (region/nation/supplier/part) are broadcast-sized at
any realistic SF and AQE picks broadcast joins for them without hints.
Top-k uses window `row_number() <= k` with full tie-breaks — deterministic
under any partitioning, and Spark ≥3.5 pushes a window-group-limit below
the shuffle.
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

_DISC_PRICE = "l_extendedprice * (1 - l_discount)"


def _disc_price() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
        WITH agg AS (
            SELECT l_orderkey,
                   {sql_dsum(_DISC_PRICE)} AS revenue,
                   o_orderdate
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-03-15'
              AND l_shipdate > TIMESTAMP '1998-03-15'
            GROUP BY l_orderkey, o_orderdate
        )
        SELECT l_orderkey, revenue, o_orderdate
        FROM agg
        QUALIFY ROW_NUMBER() OVER (ORDER BY revenue DESC, l_orderkey) <= 10
    """,
    tags=("workload", "tpch"),
    bench=True,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 (shipping priority), minus the missing o_shippriority
    column: unshipped BUILDING-segment orders by pending revenue, top 10.
    Plan: two fact joins → hash agg → global top-k (TakeOrdered after the
    window-group-limit pushdown)."""
    c = load_table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = load_table(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    agg = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(_disc_price()).alias("revenue"))
    )
    w = W.orderBy(F.desc("revenue"), F.asc("l_orderkey"))
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01'
          AND o_orderdate < TIMESTAMP '1997-10-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
    """,
    tags=("workload", "tpch"),
)
def tpch_q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking). The fixture has no
    l_commitdate/l_receiptdate, so "late" is re-defined as any line shipped
    after the order date. Plan: left-semi join (EXISTS) before the agg."""
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1997-07-01") & (F.col("o_orderdate") < "1997-10-01")
    )
    li = load_table(spark, sf, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
        SELECT n_name, {sql_dsum(_DISC_PRICE)} AS revenue
        FROM region
        JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1999-01-01'
        GROUP BY n_name
    """,
    tags=("workload", "tpch"),
    bench=True,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue from orders where the
    supplier and customer share a nation, per nation of one region.
    Six-table star join — the join-reordering/broadcast showcase."""
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf, "nation")
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1999-01-01")
    )
    li = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier")
    joined = (
        F.broadcast(r)
        .join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
    )
    return joined.groupBy("n_name").agg(dsum(_disc_price()).alias("revenue"))


@query(
    "tpch_q6_revenue_forecast",
    oracle=f"""
        SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    tags=("workload", "tpch"),
)
def tpch_q6_revenue_forecast(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan-filter-agg; every
    predicate reaches the parquet reader as a pushed filter."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        ).agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
        WITH agg AS (
            SELECT c_custkey, c_name,
                   {sql_dsum(_DISC_PRICE)} AS revenue,
                   c_acctbal, n_name
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE o_orderdate >= TIMESTAMP '1997-10-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_returnflag = 'R'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
        )
        SELECT c_custkey, c_name, revenue, c_acctbal, n_name
        FROM agg
        QUALIFY ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey) <= 20
    """,
    tags=("workload", "tpch"),
)
def tpch_q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top 20 customers by revenue
    lost to returns in a quarter."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1997-10-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf, "nation")
    agg = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_disc_price()).alias("revenue"))
    )
    w = W.orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
        WITH per_cust AS (
            SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM per_cust
        GROUP BY c_count
    """,
    tags=("workload", "tpch"),
)
def tpch_q13_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): two-level aggregation over a
    left outer join — the histogram-of-histograms shape."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_q14_promo_effect",
    oracle=f"""
        SELECT {sql_round4(
            "100.0 * "
            + sql_dsum(f"CASE WHEN p_type LIKE 'PROMO%' THEN {_DISC_PRICE} ELSE 0 END")
            + " / " + sql_dsum(_DISC_PRICE)
        )} AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
    tags=("workload", "tpch"),
)
def tpch_q14_promo_effect(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): share of revenue from PROMO parts in
    one month. Conditional aggregation over a fact⋈dim broadcast join."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = load_table(spark, sf, "part")
    promo = F.when(F.col("p_type").like("PROMO%"), _disc_price()).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            round4(100.0 * dsum(promo) / dsum(_disc_price())).alias(
                "promo_revenue_pct"
            )
        )
    )


@query(
    "tpch_q18_large_volume_customer",
    oracle=f"""
        WITH big AS (
            SELECT l_orderkey, {sql_dsum('l_quantity')} AS total_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(38,8))) > 200
        )
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               total_qty
        FROM big
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
    """,
    tags=("workload", "tpch"),
    bench=True,
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): orders whose total quantity
    exceeds 200 (threshold scaled to the fixture's ~4 lines/order), with
    customer detail. Agg-then-join keeps the HAVING before the joins, so
    only qualifying orders shuffle onward."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
    )


@query(
    "tpch_q19_discounted_revenue",
    oracle=f"""
        SELECT {sql_dsum(_DISC_PRICE)} AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30
                   AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#2'  AND p_size BETWEEN 20 AND 50
                   AND l_quantity BETWEEN 20 AND 50)
    """,
    tags=("workload", "tpch"),
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): disjunction of brand/size/quantity
    triples across the join — the OR-of-ANDs predicate-pushdown test."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#19") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 50))
    )
    return j.filter(cond).agg(
        dsum(_disc_price()).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "tpch_q22_sales_opportunity",
    oracle=f"""
        WITH avg_bal AS (
            SELECT {sql_davg('c_acctbal')} AS a FROM customer WHERE c_acctbal > 0
        )
        SELECT n_name,
               CAST(COUNT(*) AS BIGINT) AS n_custs,
               {sql_dsum('c_acctbal')} AS total_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        CROSS JOIN avg_bal
        WHERE c_acctbal > a
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '2000-01-01'
          )
        GROUP BY n_name
    """,
    tags=("workload", "tpch"),
)
def tpch_q22_sales_opportunity(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: the fixture has no
    c_phone country codes and every customer has orders, so the target is
    rich customers (above-average positive balance) with no RECENT orders
    (none since 2000). Scalar-subquery broadcast + anti-join + agg."""
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    o = load_table(spark, sf, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        davg(F.col("c_acctbal")).alias("a")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("a"))
    no_recent = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        no_recent.join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dsum(F.col("c_acctbal")).alias("total_bal"),
        )
    )
