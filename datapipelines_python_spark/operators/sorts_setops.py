"""Sort / limit / top-k / set operators (SURVEY.md §2B.6).

The driver's value hash is order-insensitive, so sort operators encode the
order in a ``row_number`` column computed over the same (made-unique) sort
key on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from datapipelines_python_spark.catalog import load_table
from datapipelines_python_spark.registry import query


@query(
    "sort_multi",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
               ) AS INT) AS sort_pos
        FROM orders
        WHERE o_totalprice > 250000
    """,
    tags=("sort",),
)
def sort_multi(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-key sort; o_orderkey tiebreak makes the order total, so
    sort_pos is deterministic on both engines."""
    o = load_table(spark, sf, "orders").filter(F.col("o_totalprice") > 250000)
    w = W.orderBy(
        F.col("o_orderstatus").asc(), F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .withColumn("sort_pos", F.row_number().over(w))
        .orderBy("sort_pos")
    )


@query(
    "limit_topk_global",
    oracle="""
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10
    """,
    tags=("sort", "topk"),
)
def limit_topk_global(spark: SparkSession, sf: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    top-k then a k-row merge on the driver, never a full sort. The unique
    o_orderkey tiebreak makes the k-set deterministic."""
    o = load_table(spark, sf, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .limit(10)
    )


@query(
    "setop_union_all",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 2 = 0
        UNION ALL
        SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 2 = 1
        UNION ALL
        SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal > 5000
    """,
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf: str) -> DataFrame:
    """Bag union (keeps duplicates): parity halves + an overlapping slice."""
    c = load_table(spark, sf, "customer").select("c_custkey", "c_name", "c_acctbal")
    evens = c.filter(F.col("c_custkey") % 2 == 0)
    odds = c.filter(F.col("c_custkey") % 2 == 1)
    rich = c.filter(F.col("c_acctbal") > 5000)
    return evens.unionByName(odds).unionByName(rich)


@query(
    "setop_union_distinct",
    oracle="""
        SELECT n_nationkey, n_regionkey FROM nation WHERE n_regionkey < 3
        UNION
        SELECT n_nationkey, n_regionkey FROM nation WHERE n_nationkey >= 10
    """,
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf: str) -> DataFrame:
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    a = n.filter(F.col("n_regionkey") < 3)
    b = n.filter(F.col("n_nationkey") >= 10)
    return a.union(b).distinct()


@query(
    "setop_intersect",
    oracle="""
        SELECT o_custkey AS custkey FROM orders
        INTERSECT
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf: str) -> DataFrame:
    """Customers that both placed orders and are in the BUILDING segment."""
    o = load_table(spark, sf, "orders").select(F.col("o_custkey").alias("custkey"))
    c = (
        load_table(spark, sf, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    return o.intersect(c)


@query(
    "setop_except",
    oracle="""
        SELECT p_brand FROM part
        EXCEPT ALL
        SELECT p_brand FROM part WHERE p_size > 10
    """,
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL): per-brand counts shrink by the
    number of large parts of that brand — duplicates preserved."""
    p = load_table(spark, sf, "part")
    all_brands = p.select("p_brand")
    large_brands = p.filter(F.col("p_size") > 10).select("p_brand")
    return all_brands.exceptAll(large_brands)


@query(
    "setop_except_distinct",
    oracle="""
        SELECT p_brand FROM part
        EXCEPT
        SELECT p_brand FROM part WHERE p_size > 10
    """,
    tags=("setop",),
)
def setop_except_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Set difference: brands where every part is small."""
    p = load_table(spark, sf, "part")
    return p.select("p_brand").subtract(p.filter(F.col("p_size") > 10).select("p_brand"))


@query(
    "setop_intersect_all",
    oracle="""
        SELECT l_returnflag AS flag, l_linenumber AS ln FROM lineitem
        INTERSECT ALL
        SELECT l_linestatus AS flag, l_linenumber AS ln
        FROM lineitem WHERE l_quantity > 25
    """,
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf: str) -> DataFrame:
    """Bag intersection (INTERSECT ALL): multiplicity = min of the two
    sides' counts. Spark plans it as a count-compare aggregate on the
    union, so one shuffle on the row value — same cost class as
    distinct."""
    a = load_table(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("flag"), F.col("l_linenumber").alias("ln")
    )
    b = (
        load_table(spark, sf, "lineitem")
        .filter(F.col("l_quantity") > 25)
        .select(F.col("l_linestatus").alias("flag"), F.col("l_linenumber").alias("ln"))
    )
    return a.intersectAll(b)


@query(
    "setop_union_evolved",
    oracle="""
        SELECT n_nationkey, n_name, n_regionkey,
               CAST(NULL AS VARCHAR) AS n_comment_class
        FROM nation WHERE n_regionkey < 2
        UNION ALL
        SELECT n_nationkey, n_name, n_regionkey,
               CASE WHEN n_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END
        FROM nation WHERE n_regionkey >= 2
    """,
    tags=("setop", "schema-evolution"),
)
def setop_union_evolved(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-evolution union: the old extract lacks a column the new one
    has; ``unionByName(allowMissingColumns=True)`` aligns by NAME and
    NULL-fills the gap — the correct behavior when a pipeline's upstream
    adds fields over time. Positional ``union`` here would silently
    misalign columns, the classic schema-drift corruption."""
    n = load_table(spark, sf, "nation")
    old = n.filter(F.col("n_regionkey") < 2).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    new = n.filter(F.col("n_regionkey") >= 2).select(
        "n_nationkey", "n_name", "n_regionkey",
        F.when(F.col("n_nationkey") % 2 == 0, "even").otherwise("odd")
            .alias("n_comment_class"),
    )
    return old.unionByName(new, allowMissingColumns=True)


@query(
    "sort_limit_offset",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 50 OFFSET 100
    """,
    tags=("sort", "limit", "pagination"),
)
def sort_limit_offset(spark: SparkSession, sf: str) -> DataFrame:
    """LIMIT/OFFSET pagination over a total order (the unique o_orderkey
    tiebreak makes page boundaries deterministic across engines). Spark
    plans this as one global sort with a GlobalLimit of offset+limit and a
    skip — rows are cut on the reduce side, never collected to the driver.
    Scale note: OFFSET-based paging re-sorts the prefix every page, so deep
    pagination at 100 TB should switch to keyset pagination (WHERE
    (price, key) < last_seen ORDER BY ... LIMIT n — an indexable/pushdown
    predicate instead of a growing skip); this op pins the surface and the
    shallow-page plan."""
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    return o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).offset(100).limit(50)
