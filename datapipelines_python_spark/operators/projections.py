"""Projection / filter / predicate operators (SURVEY.md §2B.2).

All predicates are real ``Column`` expressions so Catalyst pushes them into
the parquet scan (PushedFilters) — never Python-side filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelines_python_spark.catalog import load_table
from datapipelines_python_spark.registry import query


@query(
    "project_compute",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue,
               l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
        FROM lineitem
    """,
    tags=("projection",),
    bench=True,
)
def project_compute(spark: SparkSession, sf: str) -> DataFrame:
    # Raw doubles: identical IEEE expression on both engines ⇒ identical bits
    # (no rounding needed row-wise; see _helpers docstring).
    li = load_table(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias(
            "charge"
        ),
    )


@query(
    "filter_simple",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 30",
    tags=("filter",),
)
def filter_simple(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_linenumber", "l_quantity")


@query(
    "filter_compound",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_orderstatus = 'F'
          AND (o_totalprice > 100000 OR o_orderpriority = '1-URGENT')
          AND NOT o_orderpriority = '5-LOW'
    """,
    tags=("filter",),
)
def filter_compound(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "F")
        & ((F.col("o_totalprice") > 100000) | (F.col("o_orderpriority") == "1-URGENT"))
        & ~(F.col("o_orderpriority") == "5-LOW")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "filter_in_between_like",
    oracle="""
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
          AND o_totalprice BETWEEN 50000 AND 200000
          AND o_orderpriority LIKE '%-%'
    """,
    tags=("filter",),
)
def filter_in_between_like(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(50000, 200000)
        & F.col("o_orderpriority").like("%-%")
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


@query(
    "filter_null_handling",
    oracle="""
        SELECT event_id,
               NULLIF(event_type, 'click') AS et_nullable,
               COALESCE(NULLIF(event_type, 'click'), 'CLICKED') AS et_coalesced,
               (NULLIF(event_type, 'click') IS NULL) AS was_click
        FROM events
    """,
    tags=("filter", "null"),
)
def filter_null_handling(spark: SparkSession, sf: str) -> DataFrame:
    """NULL surface: inject nulls via nullif, recover via coalesce, test IS NULL."""
    e = load_table(spark, sf, "events")
    nullable = F.nullif(F.col("event_type"), F.lit("click"))
    return e.select(
        "event_id",
        nullable.alias("et_nullable"),
        F.coalesce(nullable, F.lit("CLICKED")).alias("et_coalesced"),
        nullable.isNull().alias("was_click"),
    )


@query(
    "project_cast",
    oracle="""
        SELECT l_orderkey,
               CAST(l_extendedprice AS DECIMAL(12,2)) AS price_dec,
               CAST(l_quantity AS BIGINT) AS qty_int,
               CAST(l_shipdate AS DATE) AS ship_date,
               CAST(l_linenumber AS VARCHAR) AS line_str
        FROM lineitem
    """,
    tags=("projection", "cast"),
)
def project_cast(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_extendedprice").cast("decimal(12,2)").alias("price_dec"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_linenumber").cast("string").alias("line_str"),
    )


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    tags=("projection", "distinct"),
)
def distinct_rows(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "case_when",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_quantity < 10 THEN 'small'
                    WHEN l_quantity < 30 THEN 'medium'
                    ELSE 'large' END AS qty_band,
               CASE WHEN l_returnflag = 'R' THEN -l_extendedprice
                    ELSE l_extendedprice END AS signed_price
        FROM lineitem
    """,
    tags=("projection", "conditional"),
)
def case_when(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "medium")
        .otherwise("large")
        .alias("qty_band"),
        F.when(F.col("l_returnflag") == "R", -F.col("l_extendedprice"))
        .otherwise(F.col("l_extendedprice"))
        .alias("signed_price"),
    )


@query(
    "reshape_unpivot",
    oracle="""
        SELECT p_partkey, metric, value FROM (
            SELECT p_partkey, 'p_retailprice' AS metric,
                   p_retailprice AS value
            FROM part
            UNION ALL
            SELECT p_partkey, 'p_size' AS metric,
                   CAST(p_size AS DOUBLE) AS value
            FROM part
        ) u
    """,
    tags=("projection", "reshape"),
)
def reshape_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """Wide-to-long reshape (melt): one row per (id, metric). Spark's
    ``unpivot`` plans as an Expand node — each input row fans out in the
    same task, no shuffle, so it scales as a pure map at any width. The
    twin of the pivot in ``llm_lang_distribution``."""
    p = load_table(spark, sf, "part").withColumn(
        "p_size_d", F.col("p_size").cast("double")
    )
    return (
        p.unpivot(
            "p_partkey",
            [F.col("p_retailprice"), F.col("p_size_d")],
            "metric",
            "value",
        )
        .withColumn(
            "metric",
            F.when(F.col("metric") == "p_size_d", "p_size").otherwise(
                F.col("metric")
            ),
        )
        .select("p_partkey", "metric", "value")
    )


@query(
    "sample_hash_deterministic",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)
              IN ('0', '1')
    """,
    tags=("projection", "sampling"),
)
def sample_hash_deterministic(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic ~12.5% Bernoulli sample keyed on a content hash —
    reproducible across engines, partitionings, and runs, unlike
    ``df.sample`` (seeded per-partition RNG, stable only for a fixed
    partitioning). The md5-prefix trick is the cross-engine-portable form;
    at 100 TB the same predicate drives consistent subsampling of a corpus
    regardless of cluster shape, and joins of two tables sampled on the
    same key stay aligned."""
    o = load_table(spark, sf, "orders")
    bucket = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
    return o.filter(bucket.isin("0", "1")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query(
    "sample_weighted_ares",
    oracle="""
        WITH pr AS (
            SELECT doc_id, n_chars,
                   LN((list_reduce(list_prepend(CAST(0 AS BIGINT),
                           list_transform(string_split(substring(md5(CAST(doc_id AS VARCHAR)), 1, 8), ''),
                                          c -> CAST(ascii(c) AS BIGINT))),
                           (a, b) -> a * 16 + (b - CASE WHEN b >= 97 THEN 87 ELSE 48 END))
                       + 0.5) / 4294967296.0) / n_chars AS k
            FROM documents WHERE n_chars > 0
        )
        SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
               FLOOR(k * 10000.0 + 0.5) / 10000.0 AS rank_key
        FROM pr
        ORDER BY k DESC, doc_id
        LIMIT 20
    """,
    tags=("projection", "sampling"),
)
def sample_weighted_ares(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted sampling without replacement, A-Res style (Efraimidis &
    Spirtes): each doc gets key ln(u)/w — the log form of u^(1/w), same
    ordering, one libm call instead of pow — with u a deterministic
    uniform folded from the doc's md5 prefix (cross-engine replayable,
    unlike an RNG), w = n_chars so long documents are proportionally
    favored. Top-20 by key is the weighted sample — the data-mixing
    primitive for 'sample this source at rate ∝ length'. The plan is
    one projection + TakeOrderedAndProject: each partition keeps its
    local top-20 and only those reach the driver-side merge, so at
    100 TB there is no global sort and no shuffle of the corpus —
    exactly how distributed weighted reservoir sampling should look."""
    d = load_table(spark, sf, "documents").filter(F.col("n_chars") > 0)
    h = F.expr(
        "aggregate(split(substring(md5(CAST(doc_id AS STRING)), 1, 8), ''), 0L,"
        " (acc, c) -> acc * 16 +"
        " (ascii(c) - CASE WHEN ascii(c) >= 97 THEN 87 ELSE 48 END))"
    )
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    keyed = d.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("weight"),
        (F.log(u) / F.col("n_chars")).alias("k"),
    )
    from datapipelines_python_spark.operators._helpers import round4

    return (
        keyed.orderBy(F.desc("k"), F.asc("doc_id"))
        .limit(20)
        .select("doc_id", "weight", round4(F.col("k")).alias("rank_key"))
    )


from datapipelines_python_spark.operators._helpers import (  # noqa: E402
    davg,
    round4,
    sql_davg,
    sql_round4,
)

_PIV_SOURCES = ("src0", "src1", "src2", "src3")


def _piv_mc_sql(src: str) -> str:
    num = (
        f"CAST(CAST(SUM(CASE WHEN source = '{src}' "
        f"THEN CAST(n_chars AS DECIMAL(38,8)) END) AS VARCHAR) AS DOUBLE)"
    )
    den = f"COUNT(CASE WHEN source = '{src}' THEN 1 END)"
    return sql_round4(f"{num} / {den}")


@query(
    "reshape_pivot_multi",
    oracle=f"""
        SELECT lang,
               {', '.join(
                   f"COUNT(CASE WHEN source = '{s}' THEN 1 END) AS {s}_docs, "
                   + _piv_mc_sql(s) + f" AS {s}_mc"
                   for s in _PIV_SOURCES
               )}
        FROM documents
        WHERE source IN ('src0', 'src1', 'src2', 'src3')
        GROUP BY lang
    """,
    tags=("reshape", "pivot"),
)
def reshape_pivot_multi(spark: SparkSession, sf: str) -> DataFrame:
    """PIVOT with MULTIPLE aggregates per cell (count + mean chars):
    Spark names the output columns ``{pivotValue}_{aggAlias}``. Passing the
    pivot values explicitly matters doubly at scale: it skips the extra
    collect-distinct job Spark otherwise runs to discover them, AND it
    keeps the plan a single hash aggregate (lang × 4 sources × 2 aggs is a
    fixed-width row, so map-side partials do all the work). The oracle is
    the classic conditional-aggregation rewrite. Empty cells: count is
    coalesced to 0 on both sides, the mean stays NULL on both sides."""
    d = load_table(spark, sf, "documents").filter(
        F.col("source").isin(*_PIV_SOURCES)
    )
    piv = (
        d.groupBy("lang")
        .pivot("source", list(_PIV_SOURCES))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs"),
            round4(davg(F.col("n_chars").cast("double"))).alias("mc"),
        )
    )
    cols = [F.col("lang")]
    for s in _PIV_SOURCES:
        cols.append(
            F.coalesce(F.col(f"{s}_docs"), F.lit(0).cast("bigint")).alias(f"{s}_docs")
        )
        cols.append(F.col(f"{s}_mc"))
    return piv.select(*cols)
