"""Scalar function surface (SURVEY.md §2B.7): string / regexp / date /
timestamp / math / array / higher-order / map / JSON / struct / hash /
conditional.

All row-wise and JVM-side (whole-stage codegen) — no Python UDFs here.
Dialect mismatches vs DuckDB are resolved in the oracle SQL (dayofweek
offset, datediff arg order, floor/ceil return types, 1-based list slicing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelines_python_spark.catalog import load_table
from datapipelines_python_spark.operators._helpers import (
    davg,
    md5_coord,
    round4,
    sql_davg,
    sql_md5_coord,
    sql_round4,
)
from datapipelines_python_spark.registry import query


@query(
    "fn_string",
    oracle="""
        SELECT p_partkey,
               -- REPLACE first: Java's toUpperCase expands 'ß' to 'SS'
               -- (one-to-many); DuckDB's utf8proc maps it 1:1 to 'ẞ'
               UPPER(REPLACE(p_name, 'ß', 'ss')) AS name_upper,
               LOWER(p_brand) AS brand_lower,
               -- '||' not CONCAT: Spark's concat() propagates NULL,
               -- DuckDB's CONCAT skips NULLs; '||' propagates on both
               TRIM('  ' || p_name || '  ') AS name_trimmed,
               SUBSTRING(p_type, 1, 6) AS type_prefix,
               p_brand || ':' || p_type AS brand_type,
               CAST(LENGTH(p_name) AS INT) AS name_len,
               LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
               REPLACE(p_type, ' ', '_') AS type_snake,
               STRING_SPLIT(p_type, ' ')[1] AS type_first_word,
               CAST(INSTR(p_name, 'a') AS INT) AS first_a_pos
        FROM part
    """,
    tags=("function", "string"),
)
def fn_string(spark: SparkSession, sf: str) -> DataFrame:
    p = load_table(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trimmed"),
        F.substring("p_type", 1, 6).alias("type_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_first_word"),
        F.instr(F.col("p_name"), "a").alias("first_a_pos"),
    )


@query(
    "fn_regexp",
    oracle="""
        SELECT doc_id,
               REGEXP_EXTRACT(text, '([a-z]{5,})', 1) AS first_long_word,
               REGEXP_REPLACE(text, ' [aeiou][a-z]* ', ' _ ', 'g') AS vowel_masked,
               REGEXP_MATCHES(text, 'data') AS mentions_data
        FROM documents
    """,
    tags=("function", "regexp"),
)
def fn_regexp(spark: SparkSession, sf: str) -> DataFrame:
    """POSIX-simple patterns only (Java regex vs RE2 agree on these)."""
    d = load_table(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]{5,})", 1).alias("first_long_word"),
        F.regexp_replace("text", r" [aeiou][a-z]* ", " _ ").alias("vowel_masked"),
        F.col("text").rlike("data").alias("mentions_data"),
    )


@query(
    "fn_date",
    oracle="""
        SELECT o_orderkey,
               CAST(YEAR(o_orderdate) AS INT) AS order_year,
               CAST(MONTH(o_orderdate) AS INT) AS order_month,
               CAST(DAY(o_orderdate) AS INT) AS order_day,
               CAST(QUARTER(o_orderdate) AS INT) AS order_quarter,
               CAST(DAYOFWEEK(o_orderdate) + 1 AS INT) AS order_dow,
               CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month_start,
               CAST(o_orderdate AS DATE) + 30 AS due_date,
               CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT)
                   AS days_to_2002,
               LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end
        FROM orders
    """,
    tags=("function", "date"),
)
def fn_date(spark: SparkSession, sf: str) -> DataFrame:
    """Date part/arith functions. Oracle-side fixes: DuckDB dayofweek is
    0=Sunday (Spark: 1=Sunday), datediff arg order is (unit, start, end)."""
    o = load_table(spark, sf, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.quarter(d).alias("order_quarter"),
        F.dayofweek(d).alias("order_dow"),
        F.date_trunc("month", d).alias("order_month_start"),
        F.date_add(d.cast("date"), 30).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date")).alias("days_to_2002"),
        F.last_day(d.cast("date")).alias("month_end"),
    )


@query(
    "fn_timestamp",
    oracle="""
        SELECT event_id,
               CAST(EPOCH_US(ts) // 1000000 AS BIGINT) AS unix_sec,
               STRFTIME(TO_TIMESTAMP(EPOCH_US(ts) // 1000000), '%Y-%m-%d %H:%M:%S')
                   AS ts_rendered,
               CAST(ts AS DATE) AS event_date,
               MAKE_DATE(2024, 1, CAST(DAY(ts) AS INT)) AS month_anchor,
               DATE_TRUNC('hour', ts) AS event_hour
        FROM events
    """,
    tags=("function", "timestamp"),
)
def fn_timestamp(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return e.select(
        "event_id",
        F.unix_timestamp("ts").alias("unix_sec"),
        F.from_unixtime(F.unix_timestamp("ts")).alias("ts_rendered"),
        F.to_date("ts").alias("event_date"),
        F.make_date(F.lit(2024), F.lit(1), F.dayofmonth("ts")).alias("month_anchor"),
        F.date_trunc("hour", F.col("ts")).alias("event_hour"),
    )


@query(
    "fn_math",
    oracle=f"""
        SELECT l_orderkey, l_linenumber,
               ROUND(l_discount, 1) AS disc_rounded,
               CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
               CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
               ABS(l_quantity - 25) AS qty_dist_25,
               SQRT(l_extendedprice) AS price_sqrt,
               {sql_round4('POW(l_quantity, 2)')} AS qty_sq,
               {sql_round4('EXP(l_discount)')} AS disc_exp,
               {sql_round4('LN(l_extendedprice)')} AS price_ln,
               {sql_round4('LOG10(l_extendedprice)')} AS price_log10,
               CAST(l_linenumber % 3 AS INT) AS line_mod3,
               CAST(SIGN(l_quantity - 25) AS INT) AS qty_sign,
               GREATEST(l_quantity, l_discount * 100) AS g,
               LEAST(l_quantity, l_discount * 100) AS l
        FROM lineitem
    """,
    tags=("function", "math"),
)
def fn_math(spark: SparkSession, sf: str) -> DataFrame:
    """Math surface. Transcendentals (exp/ln/log10/pow) differ by ulps
    between libm implementations → round4. sqrt/abs are IEEE-exact → raw.
    ROUND(l_discount,1) is tie-free for 2-decimal data (only k=5/100 ties,
    and the binary value is never exactly at the tie)."""
    li = load_table(spark, sf, "lineitem")
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_discount"), 1).alias("disc_rounded"),
        F.floor(q).alias("qty_floor"),
        F.ceil(q).alias("qty_ceil"),
        F.abs(q - 25).alias("qty_dist_25"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        round4(F.pow(q, 2)).alias("qty_sq"),
        round4(F.exp("l_discount")).alias("disc_exp"),
        round4(F.log("l_extendedprice")).alias("price_ln"),
        round4(F.log10("l_extendedprice")).alias("price_log10"),
        (F.col("l_linenumber") % 3).alias("line_mod3"),
        F.signum(q - 25).cast("int").alias("qty_sign"),
        F.greatest(q, F.col("l_discount") * 100).alias("g"),
        F.least(q, F.col("l_discount") * 100).alias("l"),
    )


@query(
    "fn_array",
    oracle="""
        SELECT doc_id,
               CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS n_tokens,
               LIST_CONTAINS(STRING_SPLIT(text, ' '), 'data') AS has_data,
               ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(STRING_SPLIT(text, ' '))), '|')
                   AS vocab,
               ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[1:3], '|') AS first3,
               LIST_SORT(STRING_SPLIT(text, ' '))[1] AS min_token
        FROM documents
    """,
    tags=("function", "array"),
)
def fn_array(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "data").alias("has_data"),
        F.array_join(F.sort_array(F.array_distinct(toks)), "|").alias("vocab"),
        F.array_join(F.slice(toks, 1, 3), "|").alias("first3"),
        F.sort_array(toks).getItem(0).alias("min_token"),
    )


@query(
    "fn_array_hof",
    oracle="""
        SELECT vec_id,
               LIST_REDUCE(CAST(embedding AS DOUBLE[]), (acc, x) -> acc + x) AS vec_sum,
               ARRAY_TO_STRING(LIST_TRANSFORM(embedding,
                                              x -> CAST(ROUND(CAST(x AS DOUBLE) * 2000000)
                                                        AS BIGINT)), '|') AS doubled,
               CAST(LEN(LIST_FILTER(embedding, x -> x > 0)) AS INT) AS n_positive
        FROM embeddings
    """,
    tags=("function", "hof"),
)
def fn_array_hof(spark: SparkSession, sf: str) -> DataFrame:
    """Higher-order array functions on the 64-dim embedding vectors.

    The reduction is a sequential double left-fold — deterministic for a
    per-row list fold (same order on both engines, unlike a distributed
    agg), and float→double widening is exact. Decimal is NOT used here:
    DuckDB's float→decimal cast scales in float32 and loses bits.
    """
    e = load_table(spark, sf, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x).alias("vec_sum"),
        # flattened for the driver harness: float32*2 is exact, widen to
        # double, scale to integer micro-units, pipe-join -> engine-portable
        F.array_join(
            F.transform(
                emb, lambda x: F.round(x.cast("double") * 2000000).cast("bigint").cast("string")
            ),
            "|",
        ).alias("doubled"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
    )


@query(
    "fn_map",
    oracle="""
        SELECT event_id,
               ARRAY_TO_STRING(
                   MAP_KEYS(MAP(['type', 'bucket'],
                                [event_type, CAST(CAST(TRUNC(value / 10) AS INT) AS VARCHAR)])),
                   '|') AS meta_keys,
               ELEMENT_AT(MAP(['type', 'bucket'],
                              [event_type, CAST(CAST(TRUNC(value / 10) AS INT) AS VARCHAR)]),
                          'type')[1] AS meta_type
        FROM events
    """,
    tags=("function", "map"),
)
def fn_map(spark: SparkSession, sf: str) -> DataFrame:
    """Map construction + access. Output is flattened (keys list + one
    lookup) — raw MAP hashing differs by engine representation.
    Bucket uses TRUNC semantics on both engines (DuckDB's double→int cast
    rounds; Spark's truncates)."""
    e = load_table(spark, sf, "events")
    bucket = (F.col("value") / 10).cast("int").cast("string")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("bucket"), bucket
    )
    return e.select(
        "event_id",
        F.array_join(F.map_keys(m), "|").alias("meta_keys"),
        F.element_at(m, "type").alias("meta_type"),
    )


@query(
    "fn_json",
    oracle="""
        SELECT event_id,
               -- json_valid guard: Spark's get_json_object returns NULL on
               -- malformed JSON where DuckDB's json functions THROW
               CASE WHEN json_valid(props)
                    THEN JSON_EXTRACT_STRING(props, '$.k') END AS k_str,
               CAST(CASE WHEN json_valid(props)
                         THEN JSON_EXTRACT_STRING(props, '$.k') END AS INT)
                   AS k_int,
               CASE WHEN json_valid(props)
                    THEN CAST(JSON_EXTRACT_STRING(props, '$.missing') AS VARCHAR)
                    END AS missing_key
        FROM events
    """,
    tags=("function", "json"),
)
def fn_json(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_key"),
    )


@query(
    "fn_struct",
    oracle="""
        SELECT c_custkey,
               STRUCT_PACK(name := c_name, seg := c_mktsegment, bal := c_acctbal).name
                   AS s_name,
               STRUCT_PACK(name := c_name, seg := c_mktsegment, bal := c_acctbal).bal
                   AS s_bal
        FROM customer
    """,
    tags=("function", "struct"),
)
def fn_struct(spark: SparkSession, sf: str) -> DataFrame:
    """Struct build + field access (flattened output — Row vs dict hashing
    differs by engine; the struct op itself is exercised in the plan)."""
    c = load_table(spark, sf, "customer")
    s = F.struct(
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"),
    )
    return c.select(
        "c_custkey",
        s.getField("name").alias("s_name"),
        s.getField("bal").alias("s_bal"),
    )


@query(
    "fn_hash",
    oracle="""
        SELECT doc_id,
               MD5(text) AS text_md5,
               SHA256(text) AS text_sha256,
               -- '||' not CONCAT: NULL-propagating on both engines
               MD5(lang || ':' || source) AS meta_md5
        FROM documents
    """,
    tags=("function", "hash"),
)
def fn_hash(spark: SparkSession, sf: str) -> DataFrame:
    """Content fingerprints — the primitive under exact dedup."""
    d = load_table(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.md5(F.concat(F.col("lang"), F.lit(":"), F.col("source"))).alias("meta_md5"),
    )


@query(
    "fn_conditional",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               IF(l_quantity > 25, 'high', 'low') AS qty_class,
               COALESCE(NULLIF(l_returnflag, 'N'), 'NONE') AS flag_or_none,
               -- NULL guard first: nanvl(NULL, NULL) is NULL, and
               -- NaN*NULL is NULL (not NaN), so the ISNAN branch must
               -- not swallow the NULL case into the ELSE
               CASE WHEN CAST('nan' AS DOUBLE) * l_quantity IS NULL THEN NULL
                    WHEN ISNAN(CAST('nan' AS DOUBLE) * l_quantity)
                    THEN l_quantity ELSE -1.0 END AS nan_guard
        FROM lineitem
    """,
    tags=("function", "conditional"),
)
def fn_conditional(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    nan_expr = F.lit(float("nan")) * F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") > 25, "high").otherwise("low").alias("qty_class"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("NONE")).alias(
            "flag_or_none"
        ),
        F.nanvl(nan_expr, F.col("l_quantity")).alias("nan_guard"),
    )


@query(
    "fn_levenshtein",
    oracle="""
        SELECT a.n_name AS name_a, b.n_name AS name_b,
               CAST(levenshtein(a.n_name, b.n_name) AS INT) AS edit_dist
        FROM nation a
        JOIN nation b ON a.n_nationkey < b.n_nationkey
        WHERE levenshtein(a.n_name, b.n_name) <= 2
    """,
    tags=("function", "string"),
)
def fn_levenshtein(spark: SparkSession, sf: str) -> DataFrame:
    """Edit-distance fuzzy matching: all near-identical name pairs. The
    self-join is broadcast (dims only); at corpus scale the same operator
    composes with an LSH/blocking prefilter so levenshtein only runs on
    candidate pairs, never the full cross product."""
    a = load_table(spark, sf, "nation").alias("a")
    b = load_table(spark, sf, "nation").alias("b")
    j = a.join(
        F.broadcast(b), F.col("a.n_nationkey") < F.col("b.n_nationkey")
    )
    dist = F.levenshtein(F.col("a.n_name"), F.col("b.n_name"))
    return j.filter(dist <= 2).select(
        F.col("a.n_name").alias("name_a"),
        F.col("b.n_name").alias("name_b"),
        dist.alias("edit_dist"),
    )


@query(
    "fn_bitwise",
    oracle="""
        SELECT event_id,
               event_id & 255 AS band,
               event_id | 4096 AS orred,
               xor(event_id, 1365) AS xored,
               event_id << 3 AS shl,
               event_id >> 2 AS shr,
               CAST(bit_count(event_id) AS INT) AS popcount
        FROM events
        WHERE event_id < 1000
    """,
    tags=("function", "math"),
)
def fn_bitwise(spark: SparkSession, sf: str) -> DataFrame:
    """Bitwise scalar surface: AND/OR/XOR masks, shifts, popcount — the
    primitives under hash partitioning, bloom filters, and the SimHash /
    sign-LSH operators (llm_simhash, llm_dedup_embedding build on these)."""
    e = load_table(spark, sf, "events").filter(F.col("event_id") < 1000)
    eid = F.col("event_id")
    return e.select(
        "event_id",
        eid.bitwiseAND(F.lit(255)).alias("band"),
        eid.bitwiseOR(F.lit(4096)).alias("orred"),
        eid.bitwiseXOR(F.lit(1365)).alias("xored"),
        F.shiftleft(eid, 3).alias("shl"),
        F.shiftright(eid, 2).alias("shr"),
        F.bit_count(eid).alias("popcount"),
    )


@query(
    "fn_trig",
    oracle=f"""
        SELECT s_suppkey,
               {sql_round4('SIN(s_acctbal / 1000.0)')} AS sin_v,
               {sql_round4('COS(s_acctbal / 1000.0)')} AS cos_v,
               {sql_round4('ATAN2(s_acctbal, 1000.0)')} AS atan2_v,
               {sql_round4('DEGREES(s_acctbal / 1000.0)')} AS deg_v,
               {sql_round4('RADIANS(s_nationkey)')} AS rad_v
        FROM supplier
    """,
    tags=("function", "math"),
)
def fn_trig(spark: SparkSession, sf: str) -> DataFrame:
    """Trigonometric scalar surface. JVM and libm both produce correctly-
    rounded-to-near-ulp results; round4 absorbs the ≤1-ulp divergence
    (the one family where raw-double discipline doesn't hold cross-engine)."""
    s = load_table(spark, sf, "supplier")
    x = F.col("s_acctbal") / 1000.0
    return s.select(
        "s_suppkey",
        round4(F.sin(x)).alias("sin_v"),
        round4(F.cos(x)).alias("cos_v"),
        round4(F.atan2(F.col("s_acctbal"), F.lit(1000.0))).alias("atan2_v"),
        round4(F.degrees(x)).alias("deg_v"),
        round4(F.radians(F.col("s_nationkey"))).alias("rad_v"),
    )


@query(
    "fn_variant",
    oracle="""
        SELECT event_id,
               CAST(CASE WHEN JSON_VALID(props)
                    THEN JSON_EXTRACT_STRING(props, '$.k') END AS INT) AS k_int,
               CAST(CASE WHEN JSON_VALID(props)
                    THEN JSON_EXTRACT_STRING(props, '$.k') END AS DOUBLE) / 3.0
                   AS k_scaled,
               CASE WHEN JSON_VALID(props) THEN 'OBJECT' ELSE NULL END AS top_type
        FROM events
    """,
    tags=("function", "json", "variant"),
)
def fn_variant(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured access via Spark 4 VARIANT: ``try_parse_json`` parses
    once into a binary-encoded variant (NULL on malformed input — raw
    ``parse_json`` THROWS, and a corpus-scale props column always contains
    garbage somewhere), then ``variant_get`` extracts typed paths without
    re-parsing — the scale answer to repeated ``get_json_object`` calls,
    which re-parse the JSON string per call. At 100 TB,
    parse-once-store-variant (or shred to columns) is the difference
    between one decode pass and one per extracted field."""
    e = load_table(spark, sf, "events")
    v = F.try_parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        (F.variant_get(v, "$.k", "double") / 3.0).alias("k_scaled"),
        F.schema_of_variant(v).substr(F.lit(1), F.lit(6)).alias("top_type"),
    )


@query(
    "fn_url",
    oracle="""
        SELECT doc_id,
               url,
               REGEXP_EXTRACT(url, '^[a-z]+://([^/?]+)', 1) AS host,
               REGEXP_EXTRACT(url, '^[a-z]+://[^/?]+(/[^?]*)', 1) AS path,
               REGEXP_EXTRACT(url, '\\?(.*)$', 1) AS query,
               REGEXP_EXTRACT(url, '[?&]lang=([^&]*)', 1) AS lang_param
        FROM (
            SELECT doc_id,
                   'https://s' ||
                   REGEXP_REPLACE(source, '[^A-Za-z0-9]', '', 'g') ||
                   '.example.com/docs/' ||
                   CAST(doc_id AS VARCHAR) || '?lang=' ||
                   REGEXP_REPLACE(lang, '[^A-Za-z0-9.~-]', '-', 'g') AS url
            FROM documents
        ) u
    """,
    tags=("function", "string"),
)
def fn_url(spark: SparkSession, sf: str) -> DataFrame:
    """URL decomposition with ``parse_url`` (host / path / query / single
    query-param extraction) — the crawl-processing primitive for grouping
    training documents by site. JVM-side parser, no UDF.

    URL components are sanitized to hostname-safe characters first
    (identity on the clean fixtures): unescaped spaces/Unicode in a host
    make Spark's ANSI parse_url THROW INVALID_URL (found by the unistr
    hazard fixture), and a URL assembled from raw user text is malformed
    by construction — encode-or-sanitize at the seam, not try/null after
    the fact, so host grouping keys stay non-NULL."""
    d = load_table(spark, sf, "documents")
    # Host label: constant prefix + alnum-only — Java's URI parser (behind
    # parse_url) NULLs the host on underscores and on labels that start or
    # end with a hyphen, so the sanitizer must guarantee a well-formed DNS
    # label, not merely strip reserved characters. Query values only need
    # the reserved/space class removed.
    host_label = F.concat(
        F.lit("s"), F.regexp_replace(F.col("source"), "[^A-Za-z0-9]", "")
    )
    qsafe = F.regexp_replace(F.col("lang"), "[^A-Za-z0-9.~-]", "-")
    url = F.concat(
        F.lit("https://"), host_label, F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), qsafe,
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@query(
    "fn_array_setops",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   STRING_SPLIT(LOWER(text), ' ')[1:8] AS a,
                   STRING_SPLIT(LOWER(text), ' ')[5:12] AS b
            FROM documents
        )
        -- two-level NULL handling: a NULL source array yields NULL
        -- (Spark's array ops propagate), but an EMPTY result list must
        -- still render as '' — DuckDB's ARRAY_TO_STRING returns NULL for
        -- BOTH, so gate on the input and coalesce the empty case
        SELECT doc_id,
               CASE WHEN a IS NULL OR b IS NULL THEN NULL ELSE
               COALESCE(ARRAY_TO_STRING(
                   LIST_SORT(LIST_DISTINCT(LIST_CONCAT(a, b))), '|'), '')
               END AS union_sorted,
               CASE WHEN a IS NULL OR b IS NULL THEN NULL ELSE
               COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(LIST_DISTINCT(a),
                                     x -> LIST_CONTAINS(b, x))), '|'), '')
               END AS intersect_sorted,
               CASE WHEN a IS NULL OR b IS NULL THEN NULL ELSE
               COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(LIST_DISTINCT(a),
                                     x -> NOT LIST_CONTAINS(b, x))), '|'), '')
               END AS except_sorted,
               LEN(LIST_DISTINCT(LIST_CONCAT(a, b))) AS n_union
        FROM t
    """,
    tags=("function", "array"),
)
def fn_array_setops(spark: SparkSession, sf: str) -> DataFrame:
    """Array set algebra (union / intersect / except), array-local — zero
    shuffle, whole-stage codegen. Sorting the outputs pins the one
    unspecified degree of freedom (element order) to a total order, which
    is also what makes the results portable across engines. These are the
    building blocks the shingle/Jaccard dedup ops compose at scale."""
    d = load_table(spark, sf, "documents")
    toks = F.split(F.lower("text"), " ")
    t = d.select(
        "doc_id",
        F.slice(toks, 1, 8).alias("a"),
        F.slice(toks, 5, 8).alias("b"),
    )
    return t.select(
        "doc_id",
        F.array_join(F.sort_array(F.array_union("a", "b")), "|").alias("union_sorted"),
        F.array_join(F.sort_array(F.array_intersect("a", "b")), "|").alias("intersect_sorted"),
        F.array_join(F.sort_array(F.array_except("a", "b")), "|").alias("except_sorted"),
        F.size(F.array_union("a", "b")).alias("n_union"),
    )


@query(
    "fn_interval_arith",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate + INTERVAL 3 DAY AS TIMESTAMP) AS plus_3d,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE)
                   AS plus_2mo,
               CAST(o_orderdate - INTERVAL 90 MINUTE AS TIMESTAMP)
                   AS minus_90min,
               CAST(FLOOR((EPOCH(TIMESTAMP '2024-06-01 00:00:00')
                           - EPOCH(o_orderdate)) / 3600.0) AS BIGINT)
                   AS hours_to_ref
        FROM orders
    """,
    tags=("function", "date"),
)
def fn_interval_arith(spark: SparkSession, sf: str) -> DataFrame:
    """Interval arithmetic on timestamps: day/month/minute offsets (month
    addition end-of-month-clamped identically in both engines) and an
    hour-difference via epoch subtraction — deliberately NOT
    ``timestampdiff``, whose whole-units-elapsed semantics differ from
    DuckDB's boundary-crossing ``date_diff``; epoch math is portable."""
    o = load_table(spark, sf, "orders")
    ref = F.to_timestamp(F.lit("2024-06-01 00:00:00"))
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 3 DAYS")).alias("plus_3d"),
        F.add_months(F.col("o_orderdate").cast("date"), 2).alias("plus_2mo"),
        (F.col("o_orderdate") - F.expr("INTERVAL 90 MINUTES")).alias("minus_90min"),
        F.floor(
            (F.unix_timestamp(ref) - F.unix_timestamp("o_orderdate")) / 3600.0
        ).cast("bigint").alias("hours_to_ref"),
    )


@query(
    "fn_try_safe",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN (l_linenumber - 3) = 0 THEN NULL
                    ELSE l_extendedprice / (l_linenumber - 3) END AS safe_div,
               TRY_CAST(l_comment_num AS INTEGER) AS maybe_int,
               TRY_CAST('20' || CAST(l_linenumber AS VARCHAR) || '-13-99'
                        AS DATE) AS bad_date
        FROM (
            SELECT l_orderkey, l_linenumber, l_extendedprice,
                   CASE WHEN l_linenumber % 2 = 0
                        THEN CAST(l_linenumber AS VARCHAR)
                        ELSE 'n/a' END AS l_comment_num
            FROM lineitem
        ) t
    """,
    tags=("function", "robustness"),
)
def fn_try_safe(spark: SparkSession, sf: str) -> DataFrame:
    """Error-safe evaluation: ``try_divide`` (÷0 → NULL), ``try_cast`` on
    dirty strings and impossible dates — NULL instead of a task-killing
    exception. The robustness posture for 100 TB ingest: one malformed row
    in a trillion must never fail a stage; quarantine NULLs downstream
    instead (count them, alert on rate)."""
    li = load_table(spark, sf, "lineitem")
    t = li.select(
        "l_orderkey", "l_linenumber", "l_extendedprice",
        F.when(
            F.col("l_linenumber") % 2 == 0, F.col("l_linenumber").cast("string")
        ).otherwise(F.lit("n/a")).alias("l_comment_num"),
    )
    return t.select(
        "l_orderkey", "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_linenumber") - 3)
            .alias("safe_div"),
        F.col("l_comment_num").try_cast("int").alias("maybe_int"),
        F.concat(F.lit("20"), F.col("l_linenumber").cast("string"), F.lit("-13-99"))
            .try_cast("date").alias("bad_date"),
    )


@query(
    "fn_char_ops",
    oracle="""
        SELECT doc_id,
               ASCII(SUBSTRING(lang, 1, 1)) AS lang_first_code,
               CHR(CAST(doc_id % 26 + 97 AS INT)) AS bucket_char,
               TO_BASE64(ENCODE(SUBSTRING(text, 1, 12))) AS b64_prefix,
               HEX(ENCODE(SUBSTRING(lang, 1, 2))) AS hex_lang
        FROM documents
    """,
    tags=("function", "string"),
)
def fn_char_ops(spark: SparkSession, sf: str) -> DataFrame:
    """Character/byte-level codecs: ascii code points, chr construction,
    base64 and hex encodings of UTF-8 bytes — the primitives for building
    portable record keys and wire-safe payload columns (binary columns
    travel as base64 through JSON sinks)."""
    d = load_table(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.ascii(F.substring("lang", 1, 1)).alias("lang_first_code"),
        F.chr((F.col("doc_id") % 26 + 97).cast("int")).alias("bucket_char"),
        F.base64(F.substring("text", 1, 12).cast("binary")).alias("b64_prefix"),
        F.hex(F.substring("lang", 1, 2).cast("binary")).alias("hex_lang"),
    )


@query(
    "fn_xml",
    oracle="""
        SELECT doc_id,
               xml,
               CAST(REGEXP_EXTRACT(xml, '<qty>([0-9]+)</qty>', 1) AS INT)
                   AS qty,
               -- ([^<]*): lang is arbitrary corpus text, not [a-z]+
               -- (from_xml reads an empty element as ''); the XML spec
               -- mandates line-ending normalization (CRLF and CR both
               -- become LF), which Spark's parser applies and a regex
               -- does not; the parser also strips surrounding whitespace
               -- from element text (ignoreSurroundingSpaces default)
               TRIM(REPLACE(REPLACE(
                   REGEXP_EXTRACT(xml, '<lang>([^<]*)</lang>', 1),
                   CHR(13) || CHR(10), CHR(10)), CHR(13), CHR(10)),
                   ' ' || CHR(9) || CHR(10) || CHR(13)) AS lang_x
        FROM (
            SELECT doc_id,
                   '<rec><qty>' || CAST(doc_id % 100 AS VARCHAR) ||
                   '</qty><lang>' || lang || '</lang></rec>' AS xml
            FROM documents
        ) x
    """,
    tags=("function", "xml"),
)
def fn_xml(spark: SparkSession, sf: str) -> DataFrame:
    """XML ingestion via Spark 4's native ``from_xml``: schema-driven
    struct extraction from an XML string column (the B2B/legacy-feed
    format that still carries a lot of enterprise data). The oracle
    replays the extraction with regexes — fine for flat records, which is
    exactly the subset a 100 TB pipeline should restrict per-row XML to
    anyway (document-level XML belongs in a preprocessing pass)."""
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    d = load_table(spark, sf, "documents")
    xml = F.concat(
        F.lit("<rec><qty>"), (F.col("doc_id") % 100).cast("string"),
        F.lit("</qty><lang>"), F.col("lang"), F.lit("</lang></rec>"),
    )
    x = d.select("doc_id", xml.alias("xml"))
    schema = StructType([
        StructField("qty", IntegerType()),
        StructField("lang", StringType()),
    ])
    parsed = x.select(
        "doc_id", "xml", F.from_xml("xml", schema).alias("r")
    )
    return parsed.select(
        "doc_id", "xml",
        F.col("r.qty").alias("qty"),
        F.col("r.lang").alias("lang_x"),
    )


@query(
    "fn_map_hof",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   CASE WHEN lang IS NULL THEN NULL ELSE
                       ['k0_' || SUBSTRING(lang, 1, 1),
                        'k1_' || SUBSTRING(lang, 2, 1)] END AS ks,
                   [CAST(doc_id % 7 AS BIGINT), CAST(doc_id % 11 AS BIGINT)]
                       AS vs
            FROM documents
        )
        -- ks IS NULL guards: with a NULL key array the Spark side's map
        -- itself is NULL, so every map-derived output is NULL — the
        -- oracle computes over the raw lists and must gate the same way
        SELECT doc_id,
               CASE WHEN ks IS NULL THEN NULL
                    ELSE ARRAY_TO_STRING(LIST_SORT(ks), '|') END AS keys_sorted,
               CASE WHEN ks IS NULL THEN NULL
                    ELSE ARRAY_TO_STRING(
                        LIST_SORT(LIST_TRANSFORM(vs, v -> v * 2 + 1)), '|')
               END AS scaled_sorted,
               CASE WHEN ks IS NULL THEN NULL
                    ELSE LEN(LIST_FILTER(vs, v -> v >= 5)) END AS n_big
        FROM t
    """,
    tags=("function", "map"),
)
def fn_map_hof(spark: SparkSession, sf: str) -> DataFrame:
    """Map higher-order functions: build a map from key/value arrays,
    ``transform_values`` to rescale, ``map_filter`` to gate — then emit
    sorted key/value arrays, because map iteration order is unspecified
    in BOTH engines (and across Spark shuffles): any hash or comparison
    of a raw map is a nondeterminism bug. The sorted-projection is the
    portable boundary; DuckDB's oracle works on the underlying lists.

    Keys are position-prefixed (``k0_<c1>``, ``k1_<c2>``) so they are
    unique BY CONSTRUCTION: Spark's ANSI map policy throws
    DUPLICATED_MAP_KEY the moment two key-array entries collide (e.g. a
    language tag with a repeated first letter pair — found by the unistr
    hazard fixture), and dedup-by-accident is exactly the
    nondeterminism maps must never carry at 100 TB."""
    d = load_table(spark, sf, "documents")
    ks = F.when(
        F.col("lang").isNotNull(),
        F.array(
            F.concat(F.lit("k0_"), F.substring("lang", 1, 1)),
            F.concat(F.lit("k1_"), F.substring("lang", 2, 1)),
        ),
    )
    vs = F.array(
        (F.col("doc_id") % 7).cast("long"), (F.col("doc_id") % 11).cast("long")
    )
    t = d.select("doc_id", ks.alias("ks"), vs.alias("vs"))
    m = F.map_from_arrays("ks", "vs")
    scaled = F.transform_values(m, lambda k, v: v * 2 + 1)
    big = F.map_filter(m, lambda k, v: v >= 5)
    return t.select(
        "doc_id",
        F.array_join(F.sort_array(F.map_keys(m)), "|").alias("keys_sorted"),
        F.array_join(
            F.transform(F.sort_array(F.map_values(scaled)), lambda v: v.cast("string")), "|"
        ).alias("scaled_sorted"),
        F.size(F.map_values(big)).alias("n_big"),
    )


@query(
    "fn_regexp_extract_all",
    oracle="""
        -- NULL text yields NULL (Spark's chain propagates), but an
        -- EMPTY match list joins to '' — DuckDB's ARRAY_TO_STRING
        -- NULLs both, so gate + coalesce
        SELECT doc_id,
               CASE WHEN text IS NULL THEN NULL ELSE
               COALESCE(ARRAY_TO_STRING(
                   regexp_extract_all(LOWER(text), '(^| )([aeiou][a-z]+)', 2),
                   '|'), '') END
                   AS vowel_words,
               LEN(regexp_extract_all(LOWER(text), '(^| )([aeiou][a-z]+)', 2))
                   AS n_vowel_words
        FROM documents
    """,
    tags=("function", "regexp"),
)
def fn_regexp_extract_all(spark: SparkSession, sf: str) -> DataFrame:
    """``regexp_extract_all`` with a capture-group index: every
    vowel-initial word per document, in positional order (both engines
    scan left-to-right, so the array order is deterministic without a
    sort). The all-matches extraction primitive behind the PII and
    pattern-mining ops; patterns stay POSIX-portable across Java regex
    and RE2."""
    d = load_table(spark, sf, "documents")
    pat = "(^| )([aeiou][a-z]+)"
    return d.select(
        "doc_id",
        F.array_join(F.regexp_extract_all(F.lower("text"), F.lit(pat), 2), "|")
            .alias("vowel_words"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(pat), 2))
            .alias("n_vowel_words"),
    )


@query(
    "fn_collation",
    oracle="""
        WITH m AS (
            SELECT CASE WHEN c_custkey % 2 = 0 THEN LOWER(c_mktsegment)
                        ELSE c_mktsegment END AS seg
            FROM customer
        )
        SELECT LOWER(seg) AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_case_variants
        FROM m GROUP BY LOWER(seg)
    """,
    tags=("fn", "string", "spark4"),
)
def fn_collation(spark: SparkSession, sf: str) -> DataFrame:
    """Spark 4 collation-aware comparison: grouping under ``UTF8_LCASE``
    unifies case variants *without* rewriting the values — the engine-level
    alternative to sprinkling ``LOWER()`` into every predicate (and, unlike
    LOWER, extends to locale/accent-insensitive collations). Case variance
    is injected deterministically (even keys lowered), the group key is
    ``collate(seg, 'UTF8_LCASE')``, and a binary-collated COUNT(DISTINCT)
    inside each group counts the case variants that LCASE equality merged.
    The oracle expresses the same semantics the pre-collation way. At scale
    collation-aware grouping hashes the collation key directly — one
    aggregate, no derived normalized column to carry through the shuffle."""
    c = load_table(spark, sf, "customer")
    m = c.select(
        F.when(
            F.col("c_custkey") % 2 == 0, F.lower("c_mktsegment")
        )
        .otherwise(F.col("c_mktsegment"))
        .alias("seg")
    )
    g = m.groupBy(F.collate(F.col("seg"), "UTF8_LCASE").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        # the untouched binary-collated column: counts real case variants
        # that LCASE equality merged into this group
        F.countDistinct("seg").cast("bigint").alias("n_case_variants"),
    )
    # normalize the representative for the cross-engine compare (which
    # variant survives as the group key is collation-internal detail)
    return g.select(
        F.lower(F.col("k").cast("string")).alias("segment"),
        "n_rows",
        "n_case_variants",
    )


@query(
    "fn_format_string",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               PRINTF('ORD-%08d/L%d', l_orderkey, l_linenumber) AS line_uid,
               PRINTF('%s|%s|%5d cents',
                      l_returnflag, l_linestatus,
                      CAST(FLOOR(l_discount * 1000.0) AS BIGINT))
                   AS flag_summary
        FROM lineitem WHERE l_orderkey % 100 = 0
    """,
    tags=("fn", "string"),
)
def fn_format_string(spark: SparkSession, sf: str) -> DataFrame:
    """printf-style formatting (``format_string`` ≙ DuckDB ``printf``) for
    building stable composite identifiers and log lines JVM-side — the
    zero-padded key pattern (``ORD-%08d``) that keeps lexicographic order
    equal to numeric order, which matters when downstream systems sort
    file names or keys as strings. Restricted to the portable subset:
    %d/%s with width/zero-pad. Float verbs are deliberately absent —
    Java's %.2f rounds half-up, C's rounds half-even, so fractional
    values are pre-converted to integers with FLOOR on both engines."""
    li = load_table(spark, sf, "lineitem")
    # NULL-guard the format inputs: Java's Formatter renders a NULL arg
    # as the four characters "null" while SQL printf (and DuckDB's)
    # yields NULL — the guard pins the SQL contract so a half-written
    # row can't mint plausible-looking composite ids
    uid = F.when(
        F.col("l_orderkey").isNotNull() & F.col("l_linenumber").isNotNull(),
        F.format_string(
            "ORD-%08d/L%d", F.col("l_orderkey"), F.col("l_linenumber")
        ),
    )
    summary = F.when(
        F.col("l_returnflag").isNotNull()
        & F.col("l_linestatus").isNotNull()
        & F.col("l_discount").isNotNull(),
        F.format_string(
            "%s|%s|%5d cents",
            F.col("l_returnflag"),
            F.col("l_linestatus"),
            F.floor(F.col("l_discount") * 1000.0).cast("bigint"),
        ),
    )
    return li.filter(F.col("l_orderkey") % 100 == 0).select(
        "l_orderkey",
        "l_linenumber",
        uid.alias("line_uid"),
        summary.alias("flag_summary"),
    )


@query(
    "fn_luhn_check",
    oracle="""
        WITH cards AS (
            SELECT o_orderkey,
                   LPAD(CAST((o_orderkey * 7919) % 1000000000000 AS VARCHAR),
                        12, '0') AS card
            FROM orders WHERE o_orderkey % 10 = 0
        )
        SELECT o_orderkey, card,
               LIST_SUM([
                   CASE WHEN i % 2 = 1
                        THEN CAST(SUBSTRING(REVERSE(card), i, 1) AS INT)
                        ELSE CASE
                            WHEN 2 * CAST(SUBSTRING(REVERSE(card), i, 1) AS INT) > 9
                            THEN 2 * CAST(SUBSTRING(REVERSE(card), i, 1) AS INT) - 9
                            ELSE 2 * CAST(SUBSTRING(REVERSE(card), i, 1) AS INT)
                        END
                   END
                   for i in range(1, 13)
               ]) % 10 = 0 AS luhn_valid
        FROM cards
    """,
    tags=("fn", "string", "validation"),
)
def fn_luhn_check(spark: SparkSession, sf: str) -> DataFrame:
    """Luhn mod-10 checksum validation (``luhn_check``, Spark 3.5+) over
    synthetic 12-digit account numbers derived from order keys — the
    ingest-validation shape for card/IMEI/member-ID columns. The oracle
    re-implements Luhn from first principles (reverse, double every
    second digit, fold >9 by −9, mod 10), so Spark's native expression is
    checked against an independent formulation — about 1 in 10 synthetic
    numbers passes, giving a real true/false mix. Pure projection:
    codegen'd JVM expression, zero shuffle, scan-bound at any scale."""
    o = load_table(spark, sf, "orders")
    card = F.lpad(
        ((F.col("o_orderkey") * 7919) % F.lit(1000000000000)).cast("string"),
        12,
        "0",
    )
    return (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", card.alias("card"))
        .select(
            "o_orderkey",
            "card",
            F.expr("luhn_check(card)").alias("luhn_valid"),
        )
    )


@query(
    "fn_aes_roundtrip",
    oracle="""
        SELECT doc_id,
               text AS decrypted,
               -- PKCS#7 pads BYTES: multibyte text encrypts its UTF-8
               -- encoding, so the closed form must use OCTET_LENGTH (the
               -- fixture's n_chars column only matched by ASCII accident)
               CAST((FLOOR(OCTET_LENGTH(ENCODE(text)) / 16) + 1) * 16
                    AS BIGINT) AS cipher_bytes
        FROM documents
    """,
    tags=("fn", "crypto"),
)
def fn_aes_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Column-level encryption surface: ``aes_encrypt`` → ``aes_decrypt``
    round-trip under AES-128-ECB. ECB is the one deterministic mode (GCM
    salts a random IV per call), which is exactly why it's usable here as
    an oracle-checkable identity: decrypt(encrypt(x)) = x, and the
    ciphertext length is the closed-form PKCS#7 size 16·(⌊n/16⌋+1) —
    checked against the fixture's byte-accurate ``n_chars`` column. The
    encrypt expression is referenced twice (decrypt + length) from one
    projection, so it's evaluated once per row either way; all JVM
    codegen, zero shuffle. Real deployments hold the key in a secret
    manager and use GCM for storage (nondeterminism is then a feature);
    the plumbing — binary columns through codegen crypto exprs — is
    identical."""
    d = load_table(spark, sf, "documents")
    key = "0123456789abcdef"
    enc = d.select(
        "doc_id",
        F.expr(f"aes_encrypt(text, '{key}', 'ECB')").alias("c"),
    )
    return enc.select(
        "doc_id",
        F.expr(f"cast(aes_decrypt(c, '{key}', 'ECB') as string)").alias(
            "decrypted"
        ),
        F.length("c").cast("bigint").alias("cipher_bytes"),
    )


@query(
    "fn_uuid_deterministic",
    oracle="""
        WITH h AS (
            SELECT o_orderkey,
                   MD5('orders:' || CAST(o_orderkey AS VARCHAR)) AS x
            FROM orders WHERE o_orderkey % 20 = 0
        )
        SELECT o_orderkey,
               SUBSTRING(x, 1, 8) || '-' || SUBSTRING(x, 9, 4)
               || '-3' || SUBSTRING(x, 14, 3) || '-'
               || SUBSTRING('89ab',
                            CAST(('0x' || SUBSTRING(x, 17, 1)) AS INT) % 4 + 1,
                            1)
               || SUBSTRING(x, 18, 3) || '-' || SUBSTRING(x, 21, 12) AS uuid
        FROM h
    """,
    tags=("fn", "hash"),
)
def fn_uuid_deterministic(spark: SparkSession, sf: str) -> DataFrame:
    """Name-based UUIDv3 (RFC 4122) synthesis from a namespaced MD5 —
    the stable-surrogate-key primitive: unlike ``uuid()`` (random, breaks
    retries and dedup) a name-based UUID is a pure function of
    (namespace, business key), so re-running an idempotent pipeline
    yields byte-identical keys, and two datasets keyed independently
    still agree. Built entirely from codegen'd string ops over one MD5 —
    hex slices with the version nibble forced to '3' and the variant
    nibble folded into [89ab] — zero shuffle, scan-bound. The oracle
    rebuilds the same bit-fiddling from DuckDB's md5, so the check
    covers the RFC layout, not just the hash."""
    o = load_table(spark, sf, "orders")
    x = F.md5(F.concat(F.lit("orders:"), F.col("o_orderkey").cast("string")))
    h = o.filter(F.col("o_orderkey") % 20 == 0).select(
        "o_orderkey", x.alias("x")
    )
    variant = F.substring(
        F.lit("89ab"),
        (F.conv(F.substring("x", 17, 1), 16, 10).cast("int") % 4 + 1).cast(
            "int"
        ),
        1,
    )
    return h.select(
        "o_orderkey",
        F.concat(
            F.substring("x", 1, 8),
            F.lit("-"),
            F.substring("x", 9, 4),
            F.lit("-3"),
            F.substring("x", 14, 3),
            F.lit("-"),
            variant,
            F.substring("x", 18, 3),
            F.lit("-"),
            F.substring("x", 21, 12),
        ).alias("uuid"),
    )


@query(
    "fn_timezone_convert",
    oracle="""
        SELECT event_id,
               CAST(ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York'
                    AS TIMESTAMP) AS ny_ts,
               CAST(ts AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Tokyo'
                    AS TIMESTAMP) AS tokyo_ts,
               CAST(CAST(ts AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Tokyo'
                         AS TIMESTAMP) AS DATE)
                   <> CAST(ts AS DATE) AS tokyo_next_day
        FROM events
        WHERE event_id % 10 = 0
    """,
    tags=("fn", "timestamp", "timezone"),
)
def fn_timezone_convert(spark: SparkSession, sf: str) -> DataFrame:
    """IANA timezone conversion (``from_utc_timestamp``): storage stays
    UTC, presentation is per-market local time — the only sane layout at
    scale, because a naive-local column can't be range-pruned or joined
    across regions, and DST makes local time non-monotonic. Both engines
    resolve through the same IANA tzdata (DuckDB via the two-step
    ``AT TIME ZONE`` idiom: interpret-as-UTC, then render local), so
    offsets — including the Tokyo day-boundary flip checked here — agree
    exactly. Pure projection, codegen'd, zero shuffle."""
    e = load_table(spark, sf, "events")
    ny = F.from_utc_timestamp("ts", "America/New_York")
    tk = F.from_utc_timestamp("ts", "Asia/Tokyo")
    return e.filter(F.col("event_id") % 10 == 0).select(
        "event_id",
        ny.alias("ny_ts"),
        tk.alias("tokyo_ts"),
        (F.to_date(tk) != F.to_date("ts")).alias("tokyo_next_day"),
    )


@query(
    "fn_morton_zorder",
    oracle="""
        SELECT o_orderkey, x, y,
               (xs4 | (ys4 << 1)) AS zcode
        FROM (
            SELECT o_orderkey,
                   o_custkey % 65536 AS x,
                   DATE_DIFF('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)) % 65536 AS y,
                   (x | (x << 8)) & 16711935 AS xs1,
                   (xs1 | (xs1 << 4)) & 252645135 AS xs2,
                   (xs2 | (xs2 << 2)) & 858993459 AS xs3,
                   (xs3 | (xs3 << 1)) & 1431655765 AS xs4,
                   (y | (y << 8)) & 16711935 AS ys1,
                   (ys1 | (ys1 << 4)) & 252645135 AS ys2,
                   (ys2 | (ys2 << 2)) & 858993459 AS ys3,
                   (ys3 | (ys3 << 1)) & 1431655765 AS ys4
            FROM orders
            WHERE o_orderkey % 5 = 0
        ) t
    """,
    tags=("fn", "bitwise", "layout"),
)
def fn_morton_zorder(spark: SparkSession, sf: str) -> DataFrame:
    """Morton (Z-order) code: interleave the bits of two 16-bit bucket
    keys (customer, order-day) into one 32-bit sort key — the
    space-filling-curve primitive behind multi-dimensional data
    clustering. Files written in zcode order get NARROW min/max ranges
    on BOTH dimensions simultaneously, so parquet row-group stats can
    skip on either predicate — single-column sort (the
    `sink_sorted_clustered` layout) can only serve one. The classic
    shift-or-mask spread runs as four lateral-alias steps per axis
    (both engines support same-SELECT alias reuse; writing it nested
    would duplicate the base expression 16×) — all int64 bitwise ops,
    codegen'd, zero shuffle. The write-side pairing at scale is
    ``repartitionByRange(zcode).sortWithinPartitions(zcode)``."""
    o = load_table(spark, sf, "orders")
    base = o.filter(F.col("o_orderkey") % 5 == 0).selectExpr(
        "o_orderkey",
        "o_custkey % 65536 AS x",
        "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') % 65536 AS y",
    )
    spread = base.selectExpr(
        "o_orderkey",
        "x",
        "y",
        "(x | shiftleft(x, 8)) & 16711935 AS xs1",
        "(xs1 | shiftleft(xs1, 4)) & 252645135 AS xs2",
        "(xs2 | shiftleft(xs2, 2)) & 858993459 AS xs3",
        "(xs3 | shiftleft(xs3, 1)) & 1431655765 AS xs4",
        "(y | shiftleft(y, 8)) & 16711935 AS ys1",
        "(ys1 | shiftleft(ys1, 4)) & 252645135 AS ys2",
        "(ys2 | shiftleft(ys2, 2)) & 858993459 AS ys3",
        "(ys3 | shiftleft(ys3, 1)) & 1431655765 AS ys4",
    )
    return spread.selectExpr(
        "o_orderkey", "x", "y", "xs4 | shiftleft(ys4, 1) AS zcode"
    )


@query(
    "fn_haversine",
    oracle=f"""
        WITH pts AS (
            SELECT n_nationkey AS k, n_name,
                   CAST((n_nationkey * 7) % 140 AS DOUBLE) - 70.0 + 0.5 AS lat,
                   CAST((n_nationkey * 13) % 360 AS DOUBLE) - 180.0 + 0.25 AS lon
            FROM nation
        )
        SELECT a.n_name AS name_a, b.n_name AS name_b,
               {sql_round4('''12742.0 * ASIN(SQRT(
                   POW(SIN(RADIANS(b.lat - a.lat) / 2.0), 2)
                   + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
                     * POW(SIN(RADIANS(b.lon - a.lon) / 2.0), 2)))''')}
                   AS dist_km
        FROM pts a JOIN pts b ON a.k < b.k
    """,
    tags=("scalar", "math", "geo"),
)
def fn_haversine(spark: SparkSession, sf: str) -> DataFrame:
    """Great-circle (haversine) distance over synthetic per-nation
    coordinates derived from integer key arithmetic (deterministic, no
    geo columns in the fixtures) — the geodesic scalar every
    store-locator / geo-dedup / radius-filter workload needs. All math
    is row-wise IEEE (sin/cos/asin over identical input bits on both
    engines; round4 absorbs cross-libm ulp). The n<m pair product is
    25×25 dims here; at 100 TB the same expression runs as a projection
    after a geohash-bucketed candidate join, never a cross join."""
    n = load_table(spark, sf, "nation")
    pts = n.select(
        F.col("n_nationkey").alias("k"),
        "n_name",
        ((F.col("n_nationkey") * 7 % 140).cast("double") - 70.0 + 0.5).alias("lat"),
        ((F.col("n_nationkey") * 13 % 360).cast("double") - 180.0 + 0.25).alias("lon"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    dlat = F.radians(F.col("b.lat") - F.col("a.lat")) / 2.0
    dlon = F.radians(F.col("b.lon") - F.col("a.lon")) / 2.0
    h = (
        F.pow(F.sin(dlat), 2)
        + F.cos(F.radians(F.col("a.lat")))
        * F.cos(F.radians(F.col("b.lat")))
        * F.pow(F.sin(dlon), 2)
    )
    return (
        a.join(b, F.col("a.k") < F.col("b.k"))
        .select(
            F.col("a.n_name").alias("name_a"),
            F.col("b.n_name").alias("name_b"),
            round4(F.lit(12742.0) * F.asin(F.sqrt(h))).alias("dist_km"),
        )
    )


@query(
    "fn_inet",
    oracle="""
        WITH ips AS (
            SELECT c_custkey,
                   (c_custkey * 2654435761) % 4294967296 AS ip
            FROM customer
        )
        SELECT c_custkey,
               CAST(ip // 16777216 AS VARCHAR) || '.'
                   || CAST((ip // 65536) % 256 AS VARCHAR) || '.'
                   || CAST((ip // 256) % 256 AS VARCHAR) || '.'
                   || CAST(ip % 256 AS VARCHAR) AS ip_str,
               ip // 16777216 = 10 AS in_10_slash_8,
               CAST(ip // 16777216 AS VARCHAR) || '.'
                   || CAST((ip // 65536) % 256 AS VARCHAR) || '.'
                   || CAST((ip // 256) % 256 AS VARCHAR) || '.0/24' AS subnet_24,
               CAST(ip // 65536 AS BIGINT) AS subnet_16_id
        FROM ips
    """,
    tags=("scalar", "inet"),
)
def fn_inet(spark: SparkSession, sf: str) -> DataFrame:
    """IPv4 codec scalars: uint32 → dotted-quad rendering, CIDR /8
    membership, /24 subnet string, /16 bucket id — the address-handling
    kit of every access-log / abuse-filter pipeline (synthetic addresses
    via Knuth multiplicative hash of the key; the fixtures carry no IP
    column). Pure integer div/mod — portable, pushdown-friendly, and at
    100 TB the /16 bucket id is the natural partition key for per-netblock
    aggregation without string parsing in the hot path."""
    c = load_table(spark, sf, "customer")
    ip = (F.col("c_custkey") * 2654435761) % F.lit(4294967296)
    ips = c.select("c_custkey", ip.alias("ip"))
    o1 = F.expr("ip DIV 16777216")
    o2 = F.expr("(ip DIV 65536) % 256")
    o3 = F.expr("(ip DIV 256) % 256")
    o4 = F.expr("ip % 256")
    dq = F.concat_ws(
        ".",
        o1.cast("string"), o2.cast("string"), o3.cast("string"), o4.cast("string"),
    )
    return ips.select(
        "c_custkey",
        dq.alias("ip_str"),
        (o1 == 10).alias("in_10_slash_8"),
        F.concat(
            F.concat_ws(".", o1.cast("string"), o2.cast("string"), o3.cast("string")),
            F.lit(".0/24"),
        ).alias("subnet_24"),
        F.expr("ip DIV 65536").cast("bigint").alias("subnet_16_id"),
    )


@query(
    "fn_soundex",
    oracle="""
        WITH words AS (
            SELECT DISTINCT UPPER(regexp_extract(p_name, '^[a-z]+')) AS word
            FROM part WHERE regexp_extract(p_name, '^[a-z]+') <> ''
        ),
        f AS (SELECT word, string_split(word, '') AS cs FROM words),
        folded AS (
            SELECT word,
                   list_reduce(
                       list_prepend(
                           {'o': cs[1], 'l': CASE WHEN cs[1] IN ('B','F','P','V') THEN '1' WHEN cs[1] IN ('C','G','J','K','Q','S','X','Z') THEN '2' WHEN cs[1] IN ('D','T') THEN '3' WHEN cs[1] = 'L' THEN '4' WHEN cs[1] IN ('M','N') THEN '5' WHEN cs[1] = 'R' THEN '6' WHEN cs[1] IN ('A','E','I','O','U','Y') THEN '0' WHEN cs[1] IN ('H','W') THEN '7' ELSE NULL END},
                           list_transform(cs[2:], c -> {'o': c, 'l': CAST(NULL AS VARCHAR)})
                       ),
                       (acc, x) -> CASE
                           WHEN CASE WHEN x.o IN ('B','F','P','V') THEN '1' WHEN x.o IN ('C','G','J','K','Q','S','X','Z') THEN '2' WHEN x.o IN ('D','T') THEN '3' WHEN x.o = 'L' THEN '4' WHEN x.o IN ('M','N') THEN '5' WHEN x.o = 'R' THEN '6' WHEN x.o IN ('A','E','I','O','U','Y') THEN '0' WHEN x.o IN ('H','W') THEN '7' ELSE NULL END IS NULL THEN acc
                           WHEN CASE WHEN x.o IN ('B','F','P','V') THEN '1' WHEN x.o IN ('C','G','J','K','Q','S','X','Z') THEN '2' WHEN x.o IN ('D','T') THEN '3' WHEN x.o = 'L' THEN '4' WHEN x.o IN ('M','N') THEN '5' WHEN x.o = 'R' THEN '6' WHEN x.o IN ('A','E','I','O','U','Y') THEN '0' WHEN x.o IN ('H','W') THEN '7' ELSE NULL END = '7' THEN acc
                           WHEN CASE WHEN x.o IN ('B','F','P','V') THEN '1' WHEN x.o IN ('C','G','J','K','Q','S','X','Z') THEN '2' WHEN x.o IN ('D','T') THEN '3' WHEN x.o = 'L' THEN '4' WHEN x.o IN ('M','N') THEN '5' WHEN x.o = 'R' THEN '6' WHEN x.o IN ('A','E','I','O','U','Y') THEN '0' WHEN x.o IN ('H','W') THEN '7' ELSE NULL END = '0' THEN {'o': acc.o, 'l': '0'}
                           WHEN CASE WHEN x.o IN ('B','F','P','V') THEN '1' WHEN x.o IN ('C','G','J','K','Q','S','X','Z') THEN '2' WHEN x.o IN ('D','T') THEN '3' WHEN x.o = 'L' THEN '4' WHEN x.o IN ('M','N') THEN '5' WHEN x.o = 'R' THEN '6' WHEN x.o IN ('A','E','I','O','U','Y') THEN '0' WHEN x.o IN ('H','W') THEN '7' ELSE NULL END = acc.l THEN acc
                           ELSE {'o': acc.o || CASE WHEN x.o IN ('B','F','P','V') THEN '1' WHEN x.o IN ('C','G','J','K','Q','S','X','Z') THEN '2' WHEN x.o IN ('D','T') THEN '3' WHEN x.o = 'L' THEN '4' WHEN x.o IN ('M','N') THEN '5' WHEN x.o = 'R' THEN '6' WHEN x.o IN ('A','E','I','O','U','Y') THEN '0' WHEN x.o IN ('H','W') THEN '7' ELSE NULL END, 'l': CASE WHEN x.o IN ('B','F','P','V') THEN '1' WHEN x.o IN ('C','G','J','K','Q','S','X','Z') THEN '2' WHEN x.o IN ('D','T') THEN '3' WHEN x.o = 'L' THEN '4' WHEN x.o IN ('M','N') THEN '5' WHEN x.o = 'R' THEN '6' WHEN x.o IN ('A','E','I','O','U','Y') THEN '0' WHEN x.o IN ('H','W') THEN '7' ELSE NULL END} END
                   ) AS st
            FROM f
        ),
        coded AS (
            SELECT word, SUBSTRING(st.o || '000', 1, 4) AS sdx FROM folded
        )
        SELECT sdx, CAST(COUNT(*) AS BIGINT) AS n_words,
               MIN(word) AS sample_word
        FROM coded GROUP BY sdx
    """,
    tags=("scalar", "string", "phonetic"),
)
def fn_soundex(spark: SparkSession, sf: str) -> DataFrame:
    """Soundex phonetic codes over the part-name vocabulary, grouped
    into phonetic buckets (code, bucket size, sample word) — the
    classic blocking key for fuzzy name matching: candidate pairs for
    join_fuzzy_blocked-style matching come from equal soundex codes, an
    equi-join, instead of an O(n^2) edit-distance sweep. Spark's native
    soundex() does the encoding; the oracle replays the exact algorithm
    (vowels reset the last-code state, H/W are transparent, first
    letter kept, pad to 4) as a DuckDB struct-accumulator list fold —
    pinned against Spark on the H/W adjacency edge cases. Encoding is
    pure projection; the only shuffle is the bucket count."""
    p = load_table(spark, sf, "part")
    words = (
        p.select(F.upper(F.regexp_extract("p_name", "^[a-z]+", 0)).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    coded = words.select("word", F.soundex("word").alias("sdx"))
    return coded.groupBy("sdx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.min("word").alias("sample_word"),
    )


@query(
    "fn_time_bucket",
    oracle=f"""
        WITH b AS (
            SELECT event_type,
                   to_timestamp(
                       1704067200 + (CAST(FLOOR(epoch(ts)) AS BIGINT) - 1704067200)
                           // 1209600 * 1209600
                   ) AT TIME ZONE 'UTC' AS bucket_14d,
                   to_timestamp(
                       1704067200 + (CAST(FLOOR(epoch(ts)) AS BIGINT) - 1704067200)
                           // 14400 * 14400
                   ) AT TIME ZONE 'UTC' AS bucket_4h,
                   value
            FROM events
        )
        SELECT event_type,
               CAST(bucket_14d AS VARCHAR) AS bucket_14d,
               CAST(bucket_4h AS VARCHAR) AS bucket_4h,
               CAST(COUNT(*) AS BIGINT) AS n,
               {sql_round4("CAST(CAST(SUM(CAST(value AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE)")} AS sum_value
        FROM b GROUP BY event_type, bucket_14d, bucket_4h
    """,
    tags=("scalar", "date", "timeseries"),
)
def fn_time_bucket(spark: SparkSession, sf: str) -> DataFrame:
    """Arbitrary-width time bucketing with an explicit origin (the
    TimescaleDB ``time_bucket`` primitive): 14-day and 4-hour buckets
    anchored at 2024-01-01 UTC — widths ``date_trunc`` cannot express
    (fortnights don't align to months; 4h isn't a named grain). Pure
    epoch integer math — origin + (epoch−origin) div width × width —
    so the bucket IS a partition key computable at scan time, unlike a
    window function; rendered via VARCHAR so both engines hash the
    identical canonical form. One projection + one group-by, the
    hypertable-chunking primitive at any scale."""
    ev = load_table(spark, sf, "events")
    origin = 1704067200  # 2024-01-01T00:00:00Z
    ep = F.unix_timestamp(F.col("ts")).cast("bigint")

    def bucket(width: int):
        return F.from_unixtime(
            origin + F.floor((ep - origin) / width).cast("bigint") * width,
            "yyyy-MM-dd HH:mm:ss",
        )

    b = ev.select(
        "event_type",
        bucket(1209600).alias("bucket_14d"),
        bucket(14400).alias("bucket_4h"),
        "value",
    )
    from datapipelines_python_spark.operators._helpers import dsum

    return b.groupBy("event_type", "bucket_14d", "bucket_4h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        round4(dsum(F.col("value"))).alias("sum_value"),
    )


@query(
    "fn_string_extra",
    oracle="""
        SELECT p_partkey,
               -- 'ß' title-cases to 'Ss' in Java (full case mapping);
               -- utf8proc would give 'ẞ'
               ARRAY_TO_STRING(
                   list_transform(STRING_SPLIT(p_name, ' '),
                       w -> CASE WHEN w[1] = 'ß' THEN 'Ss'
                                 ELSE UPPER(w[1]) END || LOWER(w[2:])),
                   ' ') AS name_initcap,
               TRANSLATE(p_brand, '#', '-') AS brand_dashed,
               -- codepoint-order reverse: Spark reverses code points
               -- (splitting combining marks off their base); DuckDB's
               -- REVERSE is grapheme-aware — emulate Spark's order.
               -- COALESCE: the empty string reverses to '' (ARRAY_TO_STRING
               -- of an empty list is NULL in DuckDB)
               CASE WHEN p_type IS NULL THEN NULL ELSE COALESCE(
                   ARRAY_TO_STRING(LIST_REVERSE(
                       REGEXP_EXTRACT_ALL(p_type, '(?s).')), ''), '')
               END AS type_reversed,
               REPEAT(LEFT(p_brand, 5), 2) AS brand_echo,
               RIGHT(p_type, 4) AS type_tail,
               STARTS_WITH(p_type, 'STANDARD') AS is_standard,
               CONTAINS(p_type, 'BRUSHED') AS is_brushed
        FROM part
    """,
    tags=("scalar", "string"),
)
def fn_string_extra(spark: SparkSession, sf: str) -> DataFrame:
    """Second string-scalar tranche beyond fn_string: initcap (oracle
    emulates Spark's lowercase-the-rest semantics per word, which
    DuckDB lacks natively), translate character mapping, reverse,
    repeat, left/right slicing, startswith/contains predicates. Pure
    projections — codegen'd JVM string intrinsics, no shuffle, and the
    boolean predicates are pushdown-eligible when used in filters."""
    p = load_table(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.initcap("p_name").alias("name_initcap"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
        F.reverse("p_type").alias("type_reversed"),
        F.repeat(F.substring("p_brand", 1, 5), 2).alias("brand_echo"),
        F.substring("p_type", -4, 4).alias("type_tail"),
        F.col("p_type").startswith("STANDARD").alias("is_standard"),
        F.col("p_type").contains("BRUSHED").alias("is_brushed"),
    )


@query(
    "fn_array_extra",
    oracle="""
        WITH t AS (
            SELECT doc_id, STRING_SPLIT(LOWER(text), ' ') AS toks
            FROM documents
        )
        -- CASE + COALESCE: NULL source array -> NULL, but an EMPTY
        -- result list must still join to '' (DuckDB's ARRAY_TO_STRING
        -- NULLs both — same gate as fn_array_setops; the unistr ''
        -- hazard makes the empty case real)
        SELECT doc_id,
               CASE WHEN toks IS NULL THEN NULL ELSE COALESCE(
                   ARRAY_TO_STRING(flatten([toks[1:3], toks[4:5]]), '|'), '')
               END AS head_flat,
               CAST(list_position(toks, 'data') AS INT) AS pos_data,
               CASE WHEN toks IS NULL THEN NULL ELSE COALESCE(
                   ARRAY_TO_STRING([x for x in toks if x <> 'the'], '|'), '')
               END AS no_the,
               ARRAY_TO_STRING(['pad' for i in range(3)], '|') AS pad3,
               CASE WHEN toks IS NULL THEN NULL ELSE COALESCE(
                   ARRAY_TO_STRING(
                       [x for x in toks if x IS NOT NULL AND x <> ''], '|'), '')
               END AS compacted
        FROM t
    """,
    tags=("scalar", "array"),
)
def fn_array_extra(spark: SparkSession, sf: str) -> DataFrame:
    """Second array-scalar tranche beyond fn_array/fn_array_hof:
    flatten (nested → flat), array_position (1-based, 0 when absent —
    Spark and DuckDB agree on that convention), array_remove,
    array_repeat, and array_compact (null/empty scrub, emulated with a
    filter on the DuckDB side where Spark's compact only drops NULLs —
    the op removes both so the two are aligned). All array-local
    projections: ZERO shuffle, and the token array is built once per
    row and multi-referenced, keeping CollapseProject from inlining
    the split per lambda (SCALE.md §4)."""
    d = load_table(spark, sf, "documents")
    toks = F.split(F.lower("text"), " ")
    t = d.select("doc_id", toks.alias("toks"))
    return t.select(
        "doc_id",
        F.array_join(
            F.flatten(F.array(F.slice("toks", 1, 3), F.slice("toks", 4, 2))), "|"
        ).alias("head_flat"),
        F.array_position("toks", "data").cast("int").alias("pos_data"),
        F.array_join(F.array_remove("toks", "the"), "|").alias("no_the"),
        F.array_join(F.array_repeat(F.lit("pad"), 3), "|").alias("pad3"),
        F.array_join(
            F.filter("toks", lambda x: x.isNotNull() & (x != F.lit(""))), "|"
        ).alias("compacted"),
    )


@query(
    "fn_string_index",
    oracle="""
        SELECT c_custkey,
               -- SPLIT_PART(NULL) is '' in DuckDB but substring_index
               -- propagates NULL in Spark; gate explicitly
               CASE WHEN c_name IS NULL THEN NULL
                    ELSE SPLIT_PART(c_name, '#', 1) END AS name_head,
               -- [-1]: substring_index(.., -1) is the LAST part and the
               -- whole string when the delimiter is absent; SPLIT_PART 2
               -- is '' in both of those cases (unistr hazard fixture)
               CASE WHEN c_name IS NULL THEN NULL
                    ELSE STRING_SPLIT(c_name, '#')[-1] END AS id_digits,
               SUBSTR(c_name, 1, 4) || '***' || SUBSTR(c_name, 8) AS name_masked,
               CAST(STRPOS(c_name, '#') AS INT) AS hash_pos,
               CASE CAST(c_custkey % 3 AS INT) + 1
                   WHEN 1 THEN 'bronze' WHEN 2 THEN 'silver' ELSE 'gold'
               END AS tier,
               CAST(LIST_POSITION(
                   STRING_SPLIT('FURNITURE,MACHINERY,BUILDING,HOUSEHOLD,AUTOMOBILE', ','),
                   c_mktsegment) AS INT) AS segment_slot
        FROM customer
    """,
    tags=("fn", "string"),
)
def fn_string_index(spark: SparkSession, sf: str) -> DataFrame:
    """Position-oriented string scalars: ``substring_index`` (head / tail
    around a delimiter), ``overlay`` (fixed-position masking),
    ``locate``, ``elt`` (1-based list pick) and ``find_in_set`` — the
    surgical-substring tranche that complements ``fn_string``'s
    whole-string ops. All JVM row-wise expressions inside one codegen
    stage; the oracle replays each with DuckDB's split_part / substr
    concatenation / strpos / CASE / list_position equivalents."""
    c = load_table(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.substring_index(F.col("c_name"), "#", 1).alias("name_head"),
        F.substring_index(F.col("c_name"), "#", -1).alias("id_digits"),
        F.overlay(F.col("c_name"), F.lit("***"), F.lit(5), F.lit(3)).alias("name_masked"),
        F.locate("#", F.col("c_name")).alias("hash_pos"),
        F.expr(
            "elt(CAST(c_custkey % 3 AS INT) + 1, 'bronze', 'silver', 'gold')"
        ).alias("tier"),
        F.expr(
            "find_in_set(c_mktsegment,"
            " 'FURNITURE,MACHINERY,BUILDING,HOUSEHOLD,AUTOMOBILE')"
        ).alias("segment_slot"),
    )


@query(
    "fn_generators",
    oracle="""
        SELECT c_custkey AS id, 'acctbal' AS metric, c_acctbal AS val
        FROM customer WHERE c_custkey < 50
        UNION ALL
        SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE)
        FROM customer WHERE c_custkey < 50
        UNION ALL
        SELECT s_suppkey, 'acctbal', s_acctbal FROM supplier
        UNION ALL
        SELECT s_suppkey, 'nationkey', CAST(s_nationkey AS DOUBLE) FROM supplier
    """,
    tags=("fn", "generator"),
)
def fn_generators(spark: SparkSession, sf: str) -> DataFrame:
    """Row-generator surface beyond ``explode``: ``stack`` (inline
    wide-to-long of scalar pairs) and ``inline`` (array-of-struct
    expansion). Both are Generate operators — pure per-row fan-out, no
    shuffle, and at 100 TB they stream through whole-stage codegen
    exactly like a projection. The oracle replays each generator as the
    equivalent UNION ALL."""
    c = load_table(spark, sf, "customer").filter(F.col("c_custkey") < 50)
    via_stack = c.selectExpr(
        "c_custkey AS id",
        "stack(2, 'acctbal', c_acctbal,"
        " 'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, val)",
    )
    s = load_table(spark, sf, "supplier")
    via_inline = s.selectExpr(
        "s_suppkey AS id",
        "inline(array("
        " named_struct('metric', 'acctbal', 'val', s_acctbal),"
        " named_struct('metric', 'nationkey', 'val', CAST(s_nationkey AS DOUBLE))"
        ")) AS (metric, val)",
    )
    return via_stack.unionByName(via_inline)


@query(
    "fn_bround_conv",
    oracle="""
        WITH base AS (
            SELECT o_orderkey,
                   CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
            FROM orders
        )
        SELECT o_orderkey,
               CAST(
                   (cents // 10 + CASE
                        WHEN cents % 10 > 5 THEN 1
                        WHEN cents % 10 < 5 THEN 0
                        ELSE (cents // 10) % 2 END
                   ) AS DOUBLE) / 10.0 AS price_bankers,
               UPPER(printf('%x', cents % 4096)) AS cents_hex,
               CAST(factorial(CAST(cents % 12 AS INT)) AS BIGINT)
                   AS small_factorial,
               FLOOR(CBRT(CAST(cents AS DOUBLE) / 100.0) * 10000.0 + 0.5)
                   / 10000.0 AS cbrt_price
        FROM base
    """,
    tags=("fn", "math"),
)
def fn_bround_conv(spark: SparkSession, sf: str) -> DataFrame:
    """Banker's rounding (``bround`` = HALF_EVEN — the accounting-safe
    rounding that doesn't drift upward on ties), base conversion
    (``conv`` 10→16), ``factorial`` and ``cbrt``. Cross-engine
    discipline: bround runs on an *exact* DECIMAL built from integer
    cents (half-even on a binary double is unreplayable — which decimal
    digit is 'exactly 5' depends on the unseeable binary tail), and the
    oracle replays HALF_EVEN with pure integer quotient/remainder/parity
    arithmetic. DuckDB lacks conv(), so hex comes from printf('%x');
    factorial stays in exact integers (arg < 12), cbrt gets round4 for
    the one genuinely-libm surface."""
    o = load_table(spark, sf, "orders")
    base = o.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint").alias("cents"),
    )
    exact_price = F.col("cents").cast("decimal(18,2)") / 100  # exact 2-dp decimal
    return base.select(
        "o_orderkey",
        F.bround(exact_price, 1).cast("double").alias("price_bankers"),
        F.conv((F.col("cents") % 4096).cast("string"), 10, 16).alias("cents_hex"),
        F.factorial((F.col("cents") % 12).cast("int")).cast("bigint").alias(
            "small_factorial"
        ),
        round4(F.cbrt(F.col("cents").cast("double") / 100.0)).alias("cbrt_price"),
    )


@query(
    "fn_date_extra",
    oracle="""
        SELECT o_orderkey,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
                   AS plus_3_months,
               (YEAR(o_orderdate) - 1995) * 12 + (MONTH(o_orderdate) - 1)
                   + CAST(DAY(o_orderdate) - 1 AS DOUBLE) / 31.0
                   AS months_since_1995,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL (CASE
                       WHEN (8 - ISODOW(o_orderdate)) % 7 = 0 THEN 7
                       ELSE (8 - ISODOW(o_orderdate)) % 7 END) DAY AS DATE)
                   AS next_monday,
               CAST(DAYOFYEAR(o_orderdate) AS INT) AS day_of_year,
               CAST(WEEKOFYEAR(o_orderdate) AS INT) AS iso_week
        FROM orders
    """,
    tags=("fn", "date"),
)
def fn_date_extra(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar arithmetic beyond ``fn_date``: ``add_months`` (month-end
    clamped on both engines: Jan 31 + 1mo = Feb 28), ``months_between``
    (Spark's fraction rule — whole months plus (day₁−day₂)/31 — replayed
    literally against the fixed 1995-01-01 anchor, whose day-of-month 1
    is never a month end, so the rule has no special case here),
    ``next_day`` (strictly-after next Monday, replayed with ISO dow
    modular arithmetic), plus dayofyear and ISO weekofyear. All row-wise
    JVM expressions; the date algebra differences live entirely in the
    oracle SQL."""
    o = load_table(spark, sf, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.add_months(d.cast("date"), 3).alias("plus_3_months"),
        F.months_between(d.cast("date"), F.lit("1995-01-01").cast("date"), roundOff=False).alias(
            "months_since_1995"
        ),
        F.next_day(d.cast("date"), "Mon").alias("next_monday"),
        F.dayofyear(d).alias("day_of_year"),
        F.weekofyear(d).alias("iso_week"),
    )


@query(
    "fn_try_overflow",
    oracle="""
        SELECT o_orderkey,
               -- poisoned keys are {0, 101, 202, ...}; every poisoned
               -- key >= 101 overflows int64-max and falls to the
               -- implicit NULL (= Spark's try_multiply). Key 0 is the
               -- ONE poisoned key that does not overflow (0 x max = 0),
               -- so the boundary branch is written as exactly that key
               -- (the old '<= 1' guard implied a boundary no data could
               -- reach on the positive side — ADVICE r8)
               CASE WHEN o_orderkey % 101 <> 0 THEN o_orderkey * 1000
                    WHEN o_orderkey = 0 THEN CAST(0 AS BIGINT)
               END AS try_product,
               CASE WHEN o_orderkey <= 9223372036854775207
                    THEN o_orderkey + 600 END AS try_sum,
               CASE WHEN o_orderkey % 7 <> 0
                    THEN o_orderkey // (o_orderkey % 7) END AS try_div
        FROM orders
    """,
    tags=("fn", "ansi", "error-safe"),
)
def fn_try_overflow(spark: SparkSession, sf: str) -> DataFrame:
    """ANSI-mode arithmetic that degrades to NULL instead of killing the
    stage: ``try_multiply`` overflows to NULL past int64 range on a
    SPARSE poison subset (every 101st key multiplies by int64-max — the
    "one poisoned row" a 100 TB job must survive), ``try_add`` stays
    in-range, ``try_divide`` NULLs on the injected zero divisor. The
    per-row form of the same policy is ``scan_csv_permissive``'s
    DROPMALFORMED. The oracle replays the exact overflow boundary with
    guard predicates.

    Measured (round 8, sf1 profile): Spark's TryEval evaluates the
    overflow path by THROWING and catching a SparkArithmeticException
    per overflowing row — ~20 µs each (a poison-everything variant of
    this op cost 3.6 s for 150k rows at sf0.1, 17 s at sf1, with
    try_multiply alone 22× the whole scan). try_* is therefore the
    rare-poison tool; when the MAJORITY of rows are expected to
    overflow, pre-guard with the oracle's CASE predicate instead —
    the NULL result is identical and the exception path never fires."""
    o = load_table(spark, sf, "orders")
    k = F.col("o_orderkey")
    poison = F.when(
        k % 101 == 0, F.lit(9223372036854775807).cast("bigint")
    ).otherwise(F.lit(1000).cast("bigint"))
    return o.select(
        "o_orderkey",
        F.try_multiply(k, poison).alias("try_product"),
        F.try_add(k, F.lit(600).cast("bigint")).alias("try_sum"),
        F.try_divide(k, k % 7).cast("bigint").alias("try_div"),
    )


@query(
    "fn_sequence_zip",
    oracle="""
        SELECT p_partkey,
               ARRAY_TO_STRING(RANGE(1, LEAST(p_size, 5) + 1), '|') AS size_seq,
               -- COALESCE: DuckDB's ARRAY_TO_STRING of an ALL-NULL list
               -- is NULL, Spark's array_join is '' (both skip nulls when
               -- at least one element survives)
               COALESCE(ARRAY_TO_STRING([CAST(x AS VARCHAR) || ':' || p_brand
                FOR x IN RANGE(1, LEAST(p_size, 5) + 1)], '|'), '') AS zipped,
               ARRAY_TO_STRING(LIST_TRANSFORM(
                   LIST_ZIP(RANGE(1, LEAST(p_size, 5) + 1),
                            RANGE(1, LEAST(p_size, 5) + 1)),
                   s -> s[1] * s[2]), '|') AS squares
        FROM part
    """,
    tags=("fn", "array"),
)
def fn_sequence_zip(spark: SparkSession, sf: str) -> DataFrame:
    """Array constructors that complete the HOF tranche: ``sequence``
    (inline integer ranges — the shuffle-free way to fan out k rows per
    row, see ``llm_chunk_documents``), ``arrays_zip`` (positional
    struct-of-parallel-arrays), and ``zip_with`` (binary HOF). All
    array-local projections — zero shuffle, full codegen. The oracle
    builds the same values with DuckDB RANGE / list comprehension /
    LIST_ZIP, minding the off-by-one (RANGE excludes its upper bound;
    Spark sequence includes it)."""
    p = load_table(spark, sf, "part")
    seq = F.sequence(F.lit(1), F.least(F.col("p_size"), F.lit(5)))
    return p.select(
        "p_partkey",
        F.array_join(F.transform(seq, lambda x: x.cast("string")), "|").alias("size_seq"),
        F.array_join(
            F.transform(
                F.arrays_zip(
                    seq.alias("idx"),
                    F.transform(seq, lambda _: F.col("p_brand")).alias("brand"),
                ),
                lambda s: F.concat(s["idx"].cast("string"), F.lit(":"), s["brand"]),
            ),
            "|",
        ).alias("zipped"),
        F.array_join(
            F.transform(F.zip_with(seq, seq, lambda a, b: a * b), lambda x: x.cast("string")),
            "|",
        ).alias("squares"),
    )


@query(
    "fn_mask",
    oracle="""
        SELECT c_custkey,
               -- \\p{Lu}/\\p{Ll}/\\p{Nd}: Spark's mask() classifies by
               -- java.lang.Character, which is Unicode-aware — ASCII
               -- classes leave é/ö unmasked; astral codepoints are
               -- pre-stripped on both sides (see the Spark docstring)
               REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
                   REGEXP_REPLACE(c_name, '[\\x{10000}-\\x{10FFFF}]', '', 'g'),
                   '\\p{Lu}', 'X', 'g'), '\\p{Ll}', 'x', 'g'),
                   '\\p{Nd}', 'n', 'g') AS name_masked_default,
               REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
                   REGEXP_REPLACE(c_name, '[\\x{10000}-\\x{10FFFF}]', '', 'g'),
                   '\\p{Lu}', 'Q', 'g'), '\\p{Ll}', 'q', 'g'),
                   '\\p{Nd}', '*', 'g') AS name_masked_custom,
               REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
                   REGEXP_REPLACE(c_mktsegment,
                                  '[\\x{10000}-\\x{10FFFF}]', '', 'g'),
                   '\\p{Lu}', 'X', 'g'), '\\p{Ll}', 'x', 'g'),
                   '\\p{Nd}', 'n', 'g') AS segment_masked
        FROM customer
    """,
    tags=("fn", "string", "governance"),
)
def fn_mask(spark: SparkSession, sf: str) -> DataFrame:
    """Spark's ``mask()`` data-redaction scalar (Spark 3.4+): class-wise
    substitution of upper/lower/digit/other characters, the column-level
    PII-redaction primitive (complementing ``llm_pii_detect``'s
    pattern-level scrub) — e.g. mask a customer identifier while keeping
    its *shape* for format validation and joins on masked data. Default
    and custom replacement alphabets both pinned; the oracle replays
    with per-class regexp passes."""
    c = load_table(spark, sf, "customer")
    # Astral-plane pre-strip (both sides): Spark's mask() classifies
    # UTF-16 CODE UNITS, so supplementary-plane letters (e.g.
    # mathematical-alphanumeric lookalikes, a known PII-obfuscation
    # trick) pass through UNMASKED — a real redaction gap found by the
    # unistr hazard fixture. Stripping them first is the conservative
    # contract: redaction must never leak because of an encoding plane.
    bmp = lambda col: F.regexp_replace(  # noqa: E731
        F.col(col), r"[\x{10000}-\x{10FFFF}]", ""
    )
    return c.select(
        "c_custkey",
        F.mask(bmp("c_name")).alias("name_masked_default"),
        F.mask(
            bmp("c_name"),
            F.lit("Q"), F.lit("q"), F.lit("*"), F.lit(None),
        ).alias("name_masked_custom"),
        F.mask(bmp("c_mktsegment")).alias("segment_masked"),
    )


@query(
    "fn_timestamp_parse",
    oracle="""
        WITH rendered AS (
            SELECT event_id,
                   STRFTIME(ts, '%Y%m%d-%H%M') AS compact,
                   STRFTIME(ts, '%d/%m/%Y %H:%M:%S') AS euro
            FROM events
        )
        SELECT event_id, compact, euro,
               STRPTIME(compact, '%Y%m%d-%H%M') AS ts_from_compact,
               STRPTIME(euro, '%d/%m/%Y %H:%M:%S') AS ts_from_euro,
               CAST(STRPTIME(compact, '%Y%m%d-%H%M') AS DATE) AS day_part
        FROM rendered
    """,
    tags=("fn", "timestamp"),
)
def fn_timestamp_parse(spark: SparkSession, sf: str) -> DataFrame:
    """Custom-pattern timestamp rendering and re-parsing — the messy-
    ingest surface: ``date_format`` writes two non-ISO layouts (compact
    log-style and a European day-first form) and ``to_timestamp`` parses
    them back under explicit patterns (never inference — ambiguous
    day/month layouts MUST pin a pattern). Spark uses DateTimeFormatter
    patterns, DuckDB strftime/strptime codes; the oracle maps between
    the two dialects. Sub-minute truncation in the compact form is a
    real lossy-roundtrip: ts_from_compact floors to the minute — parse
    precision is part of the contract, pinned here."""
    e = load_table(spark, sf, "events")
    rendered = e.select(
        "event_id",
        F.date_format("ts", "yyyyMMdd-HHmm").alias("compact"),
        F.date_format("ts", "dd/MM/yyyy HH:mm:ss").alias("euro"),
    )
    return rendered.select(
        "event_id", "compact", "euro",
        F.to_timestamp("compact", "yyyyMMdd-HHmm").alias("ts_from_compact"),
        F.to_timestamp("euro", "dd/MM/yyyy HH:mm:ss").alias("ts_from_euro"),
        F.to_timestamp("compact", "yyyyMMdd-HHmm").cast("date").alias("day_part"),
    )


@query(
    "fn_row_fingerprint",
    oracle="""
        WITH canon AS (
            SELECT o_orderkey,
                   COALESCE(CAST(o_orderkey AS VARCHAR), '<null>') || '|' ||
                   COALESCE(CAST(o_custkey AS VARCHAR), '<null>') || '|' ||
                   COALESCE(o_orderstatus, '<null>') || '|' ||
                   COALESCE(CAST(CAST(FLOOR(o_totalprice * 100.0 + 0.5)
                                      AS BIGINT) AS VARCHAR), '<null>')
                   || '|' ||
                   COALESCE(o_orderpriority, '<null>') AS s
            FROM orders
        )
        SELECT o_orderkey,
               MD5(s) AS row_hash,
               SUBSTRING(MD5(s), 1, 8) AS short_hash
        FROM canon
    """,
    tags=("fn", "cdc", "hash"),
)
def fn_row_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Whole-row content fingerprint — the change-detection primitive
    behind ``workload_cdc_apply`` / ``workload_snapshot_diff``: md5 over
    a canonical '|'-delimited serialization of the business columns.
    Canonicalization rules that make the hash portable (and pinned
    here): doubles go through integer cents (a raw double→string render
    differs between engines), column order is fixed, and the delimiter
    cannot appear in the data. Pure projection — at 100 TB this is how
    two snapshots compare without shipping the rows: exchange only
    (key, hash) pairs."""
    o = load_table(spark, sf, "orders")
    # '<null>' sentinel per field: concat_ws would silently SKIP null
    # fields (making (NULL,'x') collide with ('x',NULL) shapes); the
    # sentinel keeps half-written rows fingerprintable and distinct
    def _c(col: F.Column) -> F.Column:
        return F.coalesce(col.cast("string"), F.lit("<null>"))

    canonical = F.concat_ws(
        "|",
        _c(F.col("o_orderkey")),
        _c(F.col("o_custkey")),
        _c(F.col("o_orderstatus")),
        _c(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")),
        _c(F.col("o_orderpriority")),
    )
    return o.select(
        "o_orderkey",
        F.md5(canonical).alias("row_hash"),
        F.substring(F.md5(canonical), 1, 8).alias("short_hash"),
    )


@query(
    "fn_to_json",
    oracle="""
        SELECT c_custkey,
               to_json({'name': c_name,
                        'segment': c_mktsegment,
                        'nation': c_nationkey,
                        'balance_cents': CAST(FLOOR(c_acctbal * 100.0 + 0.5)
                                              AS BIGINT)}) AS payload
        FROM customer
    """,
    tags=("fn", "json"),
)
def fn_to_json(spark: SparkSession, sf: str) -> DataFrame:
    """STRUCT → JSON serialization (``to_json``) — the write half of the
    JSON surface (``fn_json`` covers extraction): rows become compact
    JSON payloads for event buses / API sinks. Both engines emit the
    same compact form (no spaces, field order = struct order) so the
    STRINGS are compared, not re-parsed values — the stronger check.
    The money field goes through integer cents: a raw double would
    render differently ("750.5" vs "750.50") between engines; integer-
    normalizing before serialization is the portable-JSON discipline."""
    c = load_table(spark, sf, "customer")
    # ignoreNullFields=false: Spark's default DROPS null fields from the
    # serialized object, silently changing the payload schema row-by-row;
    # explicit nulls keep the contract stable (and match the oracle)
    payload = F.to_json(
        F.struct(
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").alias("nation"),
            F.floor(F.col("c_acctbal") * 100.0 + 0.5)
            .cast("bigint")
            .alias("balance_cents"),
        ),
        {"ignoreNullFields": "false"},
    )
    return c.select("c_custkey", payload.alias("payload"))


@query(
    "fn_from_csv",
    oracle="""
        -- CONCAT_WS (not ||): both engines skip NULL fields, so a row
        -- with a NULL name yields the same SHORT line on each side; the
        -- missing trailing field then parses as NULL via TRY_CAST
        -- (Spark's from_csv pads missing fields with NULL)
        WITH lines AS (
            SELECT n_nationkey,
                   CONCAT_WS(';', CAST(n_nationkey AS VARCHAR), n_name,
                             CAST(n_regionkey AS VARCHAR)) AS csv_line
            FROM nation
        )
        SELECT n_nationkey, csv_line,
               TRY_CAST(SPLIT_PART(csv_line, ';', 1) AS INT) AS parsed_key,
               CASE WHEN SPLIT_PART(csv_line, ';', 2) = ''
                    THEN NULL ELSE SPLIT_PART(csv_line, ';', 2) END
                   AS parsed_name,
               TRY_CAST(SPLIT_PART(csv_line, ';', 3) AS INT) AS parsed_region
        FROM lines
    """,
    tags=("fn", "csv"),
)
def fn_from_csv(spark: SparkSession, sf: str) -> DataFrame:
    """``from_csv`` — schema-driven parsing of CSV embedded IN a string
    column (log lines, legacy message payloads riding inside another
    table), the CSV sibling of ``fn_json``'s from_json: one call yields
    a typed struct, star-expanded downstream, with the separator and
    schema explicit — never per-field split/cast chains scattered
    through the query. The oracle replays with split_part + casts;
    the constructed line uses ';' so the test exercises a non-default
    separator option."""
    n = load_table(spark, sf, "nation")
    csv_line = F.concat_ws(
        ";",
        F.col("n_nationkey").cast("string"),
        F.col("n_name"),
        F.col("n_regionkey").cast("string"),
    )
    lines = n.select("n_nationkey", csv_line.alias("csv_line"))
    parsed = F.from_csv(
        F.col("csv_line"),
        F.lit("parsed_key INT, parsed_name STRING, parsed_region INT"),
        {"sep": ";"},
    )
    return lines.select(
        "n_nationkey", "csv_line", parsed.alias("p")
    ).select(
        "n_nationkey", "csv_line",
        "p.parsed_key", "p.parsed_name", "p.parsed_region",
    )


@query(
    "fn_multibyte_lengths",
    oracle="""
        WITH s AS (
            SELECT n_nationkey,
                   n_name || ' ' || chr(233) || chr(252) || chr(20013)
                       AS mixed
            FROM nation
        )
        SELECT n_nationkey, mixed,
               CAST(LENGTH(mixed) AS INT) AS n_chars,
               CAST(OCTET_LENGTH(ENCODE(mixed)) AS INT) AS n_bytes,
               CAST(OCTET_LENGTH(ENCODE(mixed)) * 8 AS INT) AS n_bits,
               -- ß pre-expansion: Java toUpperCase gives 'SS' (1:2),
               -- utf8proc gives 'ẞ' (1:1)
               UPPER(REPLACE(mixed, 'ß', 'ss')) AS upper_mixed
        FROM s
    """,
    tags=("fn", "string", "i18n"),
)
def fn_multibyte_lengths(spark: SparkSession, sf: str) -> DataFrame:
    """Characters vs bytes on multibyte UTF-8 — the i18n trap every
    byte-budgeted pipeline hits: é (2 bytes), ü (2), 中 (3) make
    ``length`` (chars) and ``octet_length`` (bytes) diverge, and
    truncating text by CHAR count while budgeting storage/tokenizers
    by BYTES (or worse, slicing mid-codepoint) corrupts data silently.
    Both engines count identically once DuckDB's VARCHAR is ENCODE'd
    to BLOB for the byte view; case-mapping on accented letters rides
    along (é→É). Pure projection; the constructed column exercises
    2- and 3-byte sequences deterministically."""
    n = load_table(spark, sf, "nation")
    mixed = F.concat(F.col("n_name"), F.lit(" éü中"))
    s = n.select("n_nationkey", mixed.alias("mixed"))
    return s.select(
        "n_nationkey", "mixed",
        F.length("mixed").alias("n_chars"),
        F.octet_length("mixed").alias("n_bytes"),
        F.bit_length("mixed").alias("n_bits"),
        F.upper(F.col("mixed")).alias("upper_mixed"),
    )


@query(
    "fn_width_bucket",
    oracle="""
        SELECT CASE WHEN o_totalprice < 0 THEN 0
                    WHEN o_totalprice >= 600000.0 THEN 13
                    ELSE CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) + 1
               END AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
               CAST(MAX(o_totalprice) AS DOUBLE) AS hi
        FROM orders
        GROUP BY 1
    """,
    tags=("fn", "binning"),
)
def fn_width_bucket(spark: SparkSession, sf: str) -> DataFrame:
    """Equal-width binning with the SQL-standard ``width_bucket`` (the
    histogram primitive both engines share): order totals into 12
    buckets over [0, 600000), plus the underflow/overflow buckets 0 and
    13 the standard mandates — the declarative alternative to the
    floor-divide idiom scattered through hand-rolled histograms
    (``agg_histogram`` shows that form; this pins the builtin's edge
    semantics match across engines, including values exactly on a bin
    edge). Bucket ids are integers, min/max per bucket are raw doubles
    — nothing to round. One map-side-combinable aggregate at any
    scale."""
    o = load_table(spark, sf, "orders")
    return (
        o.select(
            F.width_bucket(
                F.col("o_totalprice"), F.lit(0.0), F.lit(600000.0), F.lit(12)
            ).alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
    )


@query(
    "fn_xpath",
    oracle="""
        SELECT * FROM (VALUES
            (1, 'alpha',  CAST(10 AS BIGINT), CAST(2.5 AS DOUBLE),  true),
            (2, 'beta',   CAST(20 AS BIGINT), CAST(7.25 AS DOUBLE), false),
            (3, 'gamma',  CAST(30 AS BIGINT), CAST(0.5 AS DOUBLE),  true)
        ) t(id, name, qty, price, in_stock)
    """,
    tags=("fn", "xml"),
)
def fn_xpath(spark: SparkSession, sf: str) -> DataFrame:
    """The xpath_* scalar family — point queries INTO XML strings
    without parsing the whole document into a struct (``fn_xml`` does
    the from_xml struct path; real feeds often need just two fields out
    of a deep document, and xpath is the cheap scalpel): xpath_string,
    xpath_long, xpath_double and xpath_boolean over inline order XML,
    including an attribute-existence predicate. DuckDB has no xpath, so
    the oracle pins the expected literals — which is the point: these
    assert exact extraction semantics (text() vs node, missing node →
    null/false). Row-local and codegen'd; at 100 TB the XML stays in
    one column and only extracted scalars shuffle."""
    rows = [
        (1, '<item flag="y"><name>alpha</name><qty>10</qty><price>2.5</price></item>'),
        (2, '<item><name>beta</name><qty>20</qty><price>7.25</price></item>'),
        (3, '<item flag="n"><name>gamma</name><qty>30</qty><price>0.5</price></item>'),
    ]
    df = spark.createDataFrame(rows, "id int, xml string")
    return df.select(
        "id",
        F.xpath_string("xml", F.lit("/item/name")).alias("name"),
        F.xpath_long("xml", F.lit("/item/qty")).alias("qty"),
        F.xpath_double("xml", F.lit("/item/price")).alias("price"),
        F.xpath_boolean("xml", F.lit("/item/@flag")).alias("in_stock"),
    )


@query(
    "fn_make_datetime",
    oracle="""
        -- no second read of orders: o_orderdate rides the CTE row, so
        -- the check stays row-local (re-keying on o_orderkey silently
        -- fans out when the key duplicates — the max-skew fixture
        -- caught it)
        WITH parts AS (
            SELECT o_orderdate,
                   date_part('year', o_orderdate) AS y,
                   date_part('month', o_orderdate) AS m,
                   date_part('day', o_orderdate) AS d
            FROM orders
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CASE WHEN make_timestamp(
                                    CAST(y AS BIGINT), CAST(m AS BIGINT),
                                    CAST(d AS BIGINT), 12, 30, 15.0)
                                  = o_orderdate
                                    + INTERVAL 12 HOUR
                                    + INTERVAL 30 MINUTE
                                    + INTERVAL 15 SECOND
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip,
               MIN(make_date(CAST(y AS BIGINT), CAST(m AS BIGINT),
                             CAST(d AS BIGINT))) AS min_date,
               MAX(make_timestamp(CAST(y AS BIGINT), CAST(m AS BIGINT),
                                  CAST(d AS BIGINT), 23, 59, 59.0))
                   AS max_eod
        FROM parts
    """,
    tags=("fn", "datetime"),
)
def fn_make_datetime(spark: SparkSession, sf: str) -> DataFrame:
    """Datetime CONSTRUCTORS — make_date / make_timestamp from extracted
    components, round-tripped against the source column plus interval
    arithmetic as the invariant (decompose → reconstruct → must equal
    original shifted by a fixed hand-built offset). This is the
    normalization path every ingest with split y/m/d columns walks, and
    the roundtrip count proves component extraction and construction
    agree on every row rather than just type-checking. All integer/
    timestamp comparisons — nothing floats. Session timezone UTC makes
    the constructed timestamps bit-identical across engines."""
    o = load_table(spark, sf, "orders")
    parts = o.select(
        "o_orderkey", "o_orderdate",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
    )
    rebuilt = F.make_timestamp(
        F.col("y"), F.col("m"), F.col("d"), F.lit(12), F.lit(30), F.lit(15.0)
    )
    shifted = (
        F.col("o_orderdate")
        + F.expr("INTERVAL 12 HOUR")
        + F.expr("INTERVAL 30 MINUTE")
        + F.expr("INTERVAL 15 SECOND")
    )
    return parts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.when(rebuilt == shifted, 1).otherwise(0))
        .cast("bigint")
        .alias("n_roundtrip"),
        F.min(F.make_date("y", "m", "d")).alias("min_date"),
        F.max(
            F.make_timestamp(
                F.col("y"), F.col("m"), F.col("d"),
                F.lit(23), F.lit(59), F.lit(59.0),
            )
        ).alias("max_eod"),
    )


@query(
    "fn_map_builders",
    oracle=f"""
        -- NULL langs bucket under '<none>': Spark map keys cannot be
        -- NULL (NULL_MAP_KEY), so the op coalesces the key before the
        -- map build and the oracle mirrors it
        SELECT source, COALESCE(lang, '<none>') AS lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               FLOOR(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) * 10000.0 + 0.5)
                   / 10000.0 AS avg_chars
        FROM documents
        GROUP BY source, COALESCE(lang, '<none>')
    """,
    tags=("fn", "map", "hof"),
)
def fn_map_builders(spark: SparkSession, sf: str) -> DataFrame:
    """Map construction + map-level HOFs as the computation medium:
    per-source maps lang→doc-count and lang→char-sum built with
    ``map_from_entries(collect_list(struct(...)))``, combined with
    ``map_zip_with`` (per-key division = average chars) and flattened
    back to rows via explode. The oracle is the equivalent flat GROUP
    BY — identical results prove the map pipeline loses nothing. Maps
    shine when the key set is small and ragged (each source carries
    only its langs, no NULL-padded wide schema); the collect_list order
    nondeterminism is harmless because map semantics are key-addressed
    — the reason to prefer maps over position-addressed arrays for this
    shape at scale."""
    d = load_table(spark, sf, "documents")
    # coalesce BEFORE grouping: a NULL lang would later become a NULL
    # map key, which Spark rejects outright (NULL_MAP_KEY)
    per = d.groupBy(
        "source", F.coalesce(F.col("lang"), F.lit("<none>")).alias("lang")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("n_chars").cast("bigint").alias("chars"),
    )
    maps = per.groupBy("source").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("lang"), F.col("n")))
        ).alias("m_count"),
        F.map_from_entries(
            F.collect_list(F.struct(F.col("lang"), F.col("chars")))
        ).alias("m_chars"),
    )
    combined = maps.select(
        "source",
        F.map_zip_with(
            "m_count", "m_chars",
            lambda k, a, b: F.struct(
                a.alias("n_docs"),
                (
                    F.floor(b.cast("double") / a * 10000.0 + 0.5) / 10000.0
                ).alias("avg_chars"),
            ),
        ).alias("m"),
    )
    ex = combined.select("source", F.explode("m").alias("lang", "v"))
    return ex.select(
        "source", "lang",
        F.col("v.n_docs").alias("n_docs"),
        F.col("v.avg_chars").alias("avg_chars"),
    )


@query(
    "fn_string_parts",
    oracle="""
        WITH base AS (
            SELECT doc_id, lang, source,
                   lang || '/' || source || '/' || CAST(doc_id AS VARCHAR)
                       AS path
            FROM documents
        ),
        scored AS (
            SELECT doc_id,
                   split_part(path, '/', 2) AS mid_part,
                   CAST(list_position(string_split('en,es,de,fr,zh', ','),
                                      lang) AS BIGINT) AS lang_idx,
                   CASE list_position(string_split('en,es,de,fr,zh', ','),
                                      lang)
                        WHEN 1 THEN 'English' WHEN 2 THEN 'Spanish'
                        WHEN 3 THEN 'German'  WHEN 4 THEN 'French'
                        WHEN 5 THEN 'Chinese' END AS lang_name,
                   starts_with(path, 'en/') AS is_english_path,
                   contains(source, '1') AS src_has_one
            FROM base
        )
        SELECT lang_name, lang_idx,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN is_english_path THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_en_paths,
               CAST(SUM(CASE WHEN src_has_one THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_src_with_one,
               CAST(COUNT(DISTINCT mid_part) AS BIGINT) AS n_sources
        FROM scored
        GROUP BY lang_name, lang_idx
    """,
    tags=("fn", "string"),
)
def fn_string_parts(spark: SparkSession, sf: str) -> DataFrame:
    """Delimited-string surgery without regex: ``split_part`` (the
    ETL workhorse for path/URN fields — one part, no array
    materialization), ``find_in_set`` index into a CSV code list,
    ``elt`` as the branch-free index→label decode, and the
    ``startswith``/``contains`` predicate builtins. Composed over a
    synthetic lang/source/id path and reduced to per-language counts
    so the oracle exercises every function's NULL/miss semantics in
    aggregate. All row-local, codegen-friendly, zero shuffle beyond
    the final 5-group aggregate — the kind of expression chain that
    must NEVER become a Python UDF at 100 TB."""
    d = load_table(spark, sf, "documents")
    base = d.select(
        "doc_id", "lang", "source",
        F.concat_ws("/", "lang", "source", F.col("doc_id").cast("string")).alias(
            "path"
        ),
    )
    idx = F.find_in_set(F.col("lang"), F.lit("en,es,de,fr,zh"))
    scored = base.select(
        "doc_id",
        F.split_part(F.col("path"), F.lit("/"), F.lit(2)).alias("mid_part"),
        idx.cast("bigint").alias("lang_idx"),
        # idx > 0 gate: find_in_set returns 0 on a miss and ANSI elt(0, ...)
        # throws INVALID_ARRAY_INDEX — an unknown language must decode to
        # NULL, not kill the stage (found by the unistr hazard fixture)
        F.when(
            idx > 0,
            F.elt(
                idx, F.lit("English"), F.lit("Spanish"), F.lit("German"),
                F.lit("French"), F.lit("Chinese"),
            ),
        ).alias("lang_name"),
        F.startswith(F.col("path"), F.lit("en/")).alias("is_english_path"),
        F.contains(F.col("source"), F.lit("1")).alias("src_has_one"),
    )
    return scored.groupBy("lang_name", "lang_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("is_english_path"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_en_paths"),
        F.sum(F.when(F.col("src_has_one"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_src_with_one"),
        F.countDistinct("mid_part").cast("bigint").alias("n_sources"),
    )


@query(
    "fn_number_roundtrip",
    oracle="""
        -- a NULL price formats to NULL and parses back to NULL: the op
        -- counts it as a parse failure, not a roundtrip
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(COUNT(o_totalprice) AS BIGINT) AS n_roundtrip,
               CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT)
                   AS n_parse_failures
        FROM orders
    """,
    tags=("fn", "string", "format"),
)
def fn_number_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Locale-formatted number I/O: every order total rendered with
    ``format_number`` (grouped thousands, 2 decimals — the human/report
    surface) and parsed back through ``to_number`` with the matching
    picture format, asserting value-exact roundtrip on all rows
    (decimal→double cast is correctly rounded, so equality against the
    source double is exact, not approximate). The error-safe
    ``try_to_number`` variant does the parse, so a malformed string
    counts as a failure instead of killing the stage — the quarantine
    posture for ingest. The oracle pins the invariant counts; the WORK
    (format → parse → compare per row) happens Spark-side at full
    width."""
    o = load_table(spark, sf, "orders")
    s = o.select(
        "o_totalprice",
        F.format_number("o_totalprice", 2).alias("pretty"),
    )
    parsed = s.select(
        "o_totalprice",
        F.try_to_number(F.col("pretty"), F.lit("999,999,999.99")).alias("back"),
    )
    # COALESCE(SUM,0): SUM over 0 rows is NULL, the oracle's counts are 0
    return parsed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("back").cast("double") == F.col("o_totalprice"), 1
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_roundtrip"),
        F.coalesce(
            F.sum(F.when(F.col("back").isNull(), 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_parse_failures"),
    )


@query(
    "fn_try_parsers",
    oracle="""
        SELECT * FROM (VALUES
            (1, DATE '2024-03-01', CAST(1234.5 AS DOUBLE), true),
            (2, NULL,              CAST(NULL AS DOUBLE),   false),
            (3, DATE '2025-12-31', CAST(0.25 AS DOUBLE),   true)
        ) t(id, d, x, json_ok)
    """,
    tags=("fn", "robustness"),
)
def fn_try_parsers(spark: SparkSession, sf: str) -> DataFrame:
    """The try_* parser family on deliberately mixed-quality input:
    ``try_to_date`` (ISO parse, garbage → NULL instead of a task-killing
    exception), ``try_to_number`` with a picture format, and
    ``try_parse_json`` validity (parse → non-null VARIANT) — the
    error-as-data posture that keeps one malformed row in 100 TB from
    failing a 10k-task stage. The PERMISSIVE-mode cousin for files is
    ``scan_csv_permissive``; this is the expression-level equivalent
    for already-loaded strings. Oracle pins exact NULL placement per
    row."""
    rows = [
        (1, "2024-03-01", "1,234.50", '{"k": 1}'),
        (2, "not-a-date", "oops", '{"broken":'),
        (3, "2025-12-31", "0.25", "[1, 2, 3]"),
    ]
    df = spark.createDataFrame(rows, "id int, ds string, ns string, js string")
    return df.select(
        "id",
        F.try_to_date("ds").alias("d"),
        F.try_to_number(F.col("ns"), F.lit("9,999.99"))
        .cast("double")
        .alias("x"),
        F.try_parse_json(F.col("js")).isNotNull().alias("json_ok"),
    )


@query(
    "fn_array_quantifiers",
    oracle="""
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(SUM(CASE WHEN LEN(list_filter(embedding,
                                                  x -> x > 0.25)) > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_any_hot,
               CAST(SUM(CASE WHEN LEN(list_filter(embedding,
                                                  x -> x <= -0.25)) = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_all_mild,
               CAST(SUM(LEN(list_filter(embedding, x -> x > 0.0)))
                    AS BIGINT) AS total_positive_dims
        FROM embeddings
        GROUP BY label
    """,
    tags=("fn", "array", "hof"),
)
def fn_array_quantifiers(spark: SparkSession, sf: str) -> DataFrame:
    """The array quantifier HOFs — ``exists`` (∃ dim > 0.25), ``forall``
    (∀ dim > −0.25) and a ``filter``-count — summarized per embedding
    label: structure-aware predicates evaluated INSIDE the array column
    with no explode, no shuffle amplification (the n×64 row blow-up of
    the posexplode alternative never exists here — compare
    ``llm_embed_dim_audit``, which NEEDS per-dim grouping). DuckDB has
    no exists/forall, so the oracle states both through list_filter
    cardinality — same semantics, proving the quantifiers are sugar
    over filter. Per-row lambda arithmetic is codegen'd JVM work, the
    array stays packed end to end."""
    em = load_table(spark, sf, "embeddings")
    emb = F.col("embedding")
    flags = em.select(
        "label",
        F.exists(emb, lambda x: x > 0.25).alias("any_hot"),
        F.forall(emb, lambda x: x > -0.25).alias("all_mild"),
        F.size(F.filter(emb, lambda x: x > 0.0)).alias("n_pos"),
    )
    return flags.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum(F.when(F.col("any_hot"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_any_hot"),
        F.sum(F.when(F.col("all_mild"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_all_mild"),
        F.sum("n_pos").cast("bigint").alias("total_positive_dims"),
    )


@query(
    "fn_array_mutations",
    oracle="""
        WITH base AS (
            SELECT doc_id, STRING_SPLIT(text, ' ')[1:4] AS toks
            FROM documents
        ),
        mutated AS (
            -- toks IS NULL gates: Spark's array mutators propagate a NULL
            -- array, while DuckDB's list_append(NULL, x) resurrects [x]
            SELECT doc_id,
                   CASE WHEN toks IS NULL THEN NULL
                        ELSE list_prepend('BOS', list_append(toks, 'EOS'))
                   END AS framed,
                   CASE WHEN toks IS NULL THEN NULL
                        ELSE toks[1:1] || ['SEP'] || toks[2:4]
                   END AS inserted,
                   CASE WHEN toks IS NULL THEN NULL
                        ELSE LEN(list_filter(
                            list_append(list_append(toks, NULL), NULL),
                            x -> x IS NOT NULL))
                   END AS compact_len
            FROM base
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN framed[1] = 'BOS'
                              AND framed[LEN(framed)] = 'EOS'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_framed_ok,
               CAST(SUM(CASE WHEN inserted[2] = 'SEP'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_insert_ok,
               CAST(SUM(compact_len) AS BIGINT) AS total_compact_len
        FROM mutated
    """,
    tags=("fn", "array"),
)
def fn_array_mutations(spark: SparkSession, sf: str) -> DataFrame:
    """Array mutation builtins as sequence-assembly primitives:
    ``array_prepend``/``array_append`` framing BOS/EOS sentinels (the
    exact shape of special-token insertion in ``llm_sft_format``),
    ``array_insert`` splicing a SEP mid-sequence, and ``array_compact``
    dropping injected NULLs — each verified positionally and reduced to
    corpus counts. DuckDB lacks insert/compact, so the oracle rebuilds
    them from slicing and list_filter: the invariants, not the builtin
    names, are what's pinned. All array-local: the token arrays never
    unpack to rows, which is why this family scales as O(bytes
    scanned)."""
    d = load_table(spark, sf, "documents")
    base = d.select(
        "doc_id", F.slice(F.split("text", " "), 1, 4).alias("toks")
    )
    mutated = base.select(
        "doc_id",
        F.array_prepend(F.array_append(F.col("toks"), F.lit("EOS")), F.lit("BOS")).alias(
            "framed"
        ),
        F.array_insert(F.col("toks"), F.lit(2), F.lit("SEP")).alias("inserted"),
        F.size(
            F.array_compact(
                F.array_append(
                    F.array_append(F.col("toks"), F.lit(None).cast("string")),
                    F.lit(None).cast("string"),
                )
            )
        ).alias("compact_len"),
    )
    return mutated.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            F.when(
                (F.element_at("framed", 1) == "BOS")
                & (F.element_at("framed", F.size("framed")) == "EOS"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_framed_ok"),
        F.sum(F.when(F.element_at("inserted", 2) == "SEP", 1).otherwise(0))
        .cast("bigint")
        .alias("n_insert_ok"),
        F.sum("compact_len").cast("bigint").alias("total_compact_len"),
    )


@query(
    "fn_reduce_finish",
    oracle=f"""
        WITH stats AS (
            -- embedding IS NULL gates: DuckDB's list_prepend(0.0, NULL)
            -- resurrects [0.0] and folds to 0.0; Spark's reduce over a
            -- NULL array is NULL
            SELECT vec_id, label,
                   CASE WHEN embedding IS NULL THEN NULL ELSE
                   list_reduce(list_prepend(0.0,
                       list_transform(embedding, x -> CAST(x AS DOUBLE))),
                       (acc, x) -> acc + x) / 64.0 END AS dim_mean,
                   CASE WHEN embedding IS NULL THEN NULL ELSE
                   SQRT(list_reduce(list_prepend(0.0,
                       list_transform(embedding,
                                      x -> CAST(x AS DOUBLE) * x)),
                       (acc, x) -> acc + x)) END AS l2_norm
            FROM embeddings
        )
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               {sql_round4(sql_davg('dim_mean'))} AS avg_dim_mean,
               {sql_round4(sql_davg('l2_norm'))} AS avg_l2_norm
        FROM stats GROUP BY label
    """,
    tags=("fn", "array", "hof"),
)
def fn_reduce_finish(spark: SparkSession, sf: str) -> DataFrame:
    """``F.reduce`` with a STRUCT accumulator and a finish lambda — the
    full three-argument fold (zero, merge, finish) that computes the
    per-vector dimension mean AND L2 norm in ONE array traversal
    (accumulate (Σx, Σx²) pairwise, finish into (Σx/64, √Σx²)),
    where two separate ``aggregate`` calls would walk the array twice.
    The left-to-right fold order is identical on both engines, so the
    float sums are bit-stable without decimal casts. This is the array
    analogue of the power-sums trick used all over this repo: carry
    sufficient statistics, finish once — per row here, per group
    elsewhere."""
    em = load_table(spark, sf, "embeddings")
    acc0 = F.struct(
        F.lit(0.0).alias("s1"), F.lit(0.0).alias("s2")
    )
    stats = em.select(
        "label",
        F.reduce(
            F.col("embedding"),
            acc0,
            lambda acc, x: F.struct(
                (acc["s1"] + x.cast("double")).alias("s1"),
                (acc["s2"] + x.cast("double") * x.cast("double")).alias("s2"),
            ),
            lambda acc: F.struct(
                (acc["s1"] / 64.0).alias("dim_mean"),
                F.sqrt(acc["s2"]).alias("l2_norm"),
            ),
        ).alias("st"),
    )
    return stats.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        round4(davg(F.col("st.dim_mean"))).alias("avg_dim_mean"),
        round4(davg(F.col("st.l2_norm"))).alias("avg_l2_norm"),
    )


@query(
    "fn_str_to_map",
    oracle="""
        SELECT lang,
               source,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM (
            -- cfg IS NULL gates: DuckDB's split_part yields '' on NULL
            -- input where Spark's str_to_map(NULL) lookup yields NULL
            SELECT CASE WHEN cfg IS NULL THEN NULL
                        ELSE split_part(split_part(cfg, ',', 1), ':', 2)
                   END AS lang,
                   CASE WHEN cfg IS NULL THEN NULL
                        ELSE split_part(split_part(cfg, ',', 2), ':', 2)
                   END AS source
            FROM (
                SELECT 'lang:' || lang || ',src:' || source AS cfg
                FROM documents
            )
        )
        GROUP BY lang, source
    """,
    tags=("fn", "map", "string"),
)
def fn_str_to_map(spark: SparkSession, sf: str) -> DataFrame:
    """``str_to_map`` — the one-call parser for 'k1:v1,k2:v2' config/tag
    strings (log lines, URL params, legacy CSV-in-a-column), producing
    a map addressed by key instead of by position: the op builds such
    strings, parses them back, and re-aggregates on the extracted keys.
    The oracle does the same with two nested split_parts — exactly the
    brittle position-addressed code str_to_map replaces (add a third
    pair or reorder keys and split_part silently reads the wrong
    field; the map form doesn't care). Row-local, codegen'd, and the
    map never leaves the JVM."""
    d = load_table(spark, sf, "documents")
    cfg = F.concat(
        F.lit("lang:"), F.col("lang"), F.lit(",src:"), F.col("source")
    )
    parsed = d.select(
        F.str_to_map(cfg, F.lit(","), F.lit(":")).alias("m")
    )
    return parsed.select(
        F.col("m")["lang"].alias("lang"),
        F.col("m")["src"].alias("source"),
    ).groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


@query(
    "fn_sentences",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT)
                   AS n_words,
               -- agreement is asserted only where it is DEFINED: on
               -- simple alnum+space text the ICU tokenizer provably
               -- matches split(' '); punctuation/CJK/emoji text is
               -- exactly where they legitimately diverge
               CAST(SUM(CASE WHEN regexp_matches(text,
                                  '^[A-Za-z0-9]+( [A-Za-z0-9]+)*$')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
        FROM documents
        GROUP BY lang
    """,
    tags=("fn", "text"),
)
def fn_sentences(spark: SparkSession, sf: str) -> DataFrame:
    """The locale-aware ``sentences()`` tokenizer (ICU BreakIterator
    under the hood — the JVM-side linguistic segmenter, vs the
    mechanical ``split(' ')`` everywhere else in this repo): returns
    array<array<string>> of sentences×words. Fixture text is
    punctuation-free single sentences, so the invariant pinned is
    flatten(sentences(text)) ≡ split(text, ' ') word-for-word — n_agree
    counts documents where BOTH tokenizers yield the same word count,
    and must equal n_docs. On real multilingual corpora the two
    diverge (CJK segmentation, abbreviations), which is exactly when
    you reach for this function over split."""
    d = load_table(spark, sf, "documents")
    words_icu = F.size(F.flatten(F.sentences(F.col("text"))))
    words_split = F.size(F.split("text", " "))
    # simple-text gate: the ICU-vs-split agreement is asserted only on
    # alnum+single-space text, where it provably holds — punctuation, CJK
    # and emoji are exactly where the linguistic tokenizer legitimately
    # diverges from the mechanical one (unistr hazard fixture). The ICU
    # side is still REAL: a disagreement on gated text fails the hash.
    simple = F.col("text").rlike("^[A-Za-z0-9]+( [A-Za-z0-9]+)*$")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(words_split).cast("bigint").alias("n_words"),
        F.sum(F.when(simple & (words_icu == words_split), 1).otherwise(0))
        .cast("bigint")
        .alias("n_agree"),
    )


@query(
    "fn_stack",
    oracle="""
        SELECT l_orderkey, l_linenumber, metric, val FROM (
            SELECT l_orderkey, l_linenumber, 'qty' AS metric, l_quantity AS val
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'disc', l_discount FROM lineitem
        ) t
    """,
    tags=("fn", "generator", "reshape"),
)
def fn_stack(spark: SparkSession, sf: str) -> DataFrame:
    """The ``stack(n, k1, v1, ...)`` generator: wide→long in ONE pass over
    the input (the oracle's three-arm UNION ALL scans the table three
    times — stack is the single-scan way to melt at 100 TB, same family as
    ``reshape_unpivot`` but at expression level, usable inside any
    select). Values stay raw doubles (row-local, no aggregation)."""
    li = load_table(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'qty', l_quantity, 'price', l_extendedprice, 'disc', l_discount)"
        ).alias("metric", "val"),
    )


@query(
    "fn_exists_forall",
    oracle="""
        WITH t AS (
            SELECT doc_id, STRING_SPLIT(LOWER(text), ' ') AS toks
            FROM documents
        )
        SELECT doc_id,
               LEN(LIST_FILTER(toks, x -> x = 'data')) > 0 AS has_data,
               LEN(LIST_FILTER(toks, x -> NOT LEN(x) BETWEEN 1 AND 12)) = 0
                   AS all_short,
               LEN(LIST_FILTER(toks, x -> x LIKE '%ing')) > 0 AS any_gerund
        FROM t
    """,
    tags=("fn", "array", "hof"),
)
def fn_exists_forall(spark: SparkSession, sf: str) -> DataFrame:
    """Array quantifiers ``exists`` / ``forall`` — the short-circuiting
    boolean HOFs (vs. building a filtered array and measuring it, which is
    what the oracle does and what they replace: at 100 TB the quantifier
    stops at the first witness instead of materializing the survivor
    list). Flat boolean outputs, array-local, zero shuffle."""
    d = load_table(spark, sf, "documents")
    toks = F.split(F.lower("text"), " ")
    t = d.select("doc_id", toks.alias("toks"))
    return t.select(
        "doc_id",
        F.exists("toks", lambda x: x == F.lit("data")).alias("has_data"),
        F.forall("toks", lambda x: F.length(x).between(1, 12)).alias("all_short"),
        F.exists("toks", lambda x: x.endswith("ing")).alias("any_gerund"),
    )


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


@query(
    "fn_geohash_encode",
    oracle=f"""
        WITH pts AS (
            SELECT c_custkey,
                   {sql_md5_coord("c_custkey", ":lat", 120000, 60.0)} AS lat,
                   {sql_md5_coord("c_custkey", ":lon", 360000, 180.0)} AS lon
            FROM customer
        ),
        bits AS (
            SELECT c_custkey, lat, lon,
                   CAST(FLOOR((lat + 90.0) / 180.0 * 32768.0) AS BIGINT) AS latb,
                   CAST(FLOOR((lon + 180.0) / 360.0 * 32768.0) AS BIGINT) AS lonb
            FROM pts
        ),
        inter AS (
            SELECT c_custkey, lat, lon,
                   LIST_SUM([((lonb >> k) & 1) * POW(2, 2*k + 1)::BIGINT
                             + ((latb >> k) & 1) * POW(2, 2*k)::BIGINT
                             FOR k IN RANGE(0, 15)]) AS v
            FROM bits
        )
        SELECT c_custkey,
               FLOOR(lat * 10000.0 + 0.5) / 10000.0 AS lat,
               FLOOR(lon * 10000.0 + 0.5) / 10000.0 AS lon,
               ARRAY_TO_STRING([SUBSTRING('{_GEOHASH32}',
                                CAST(((CAST(v AS BIGINT) >> (5 * (5 - j))) & 31) + 1 AS INT), 1)
                                FOR j IN RANGE(0, 6)], '') AS geohash6,
               ARRAY_TO_STRING([SUBSTRING('{_GEOHASH32}',
                                CAST(((CAST(v AS BIGINT) >> (5 * (5 - j))) & 31) + 1 AS INT), 1)
                                FOR j IN RANGE(0, 3)], '') AS geohash3
        FROM inter
    """,
    tags=("fn", "geo"),
)
def fn_geohash_encode(spark: SparkSession, sf: str) -> DataFrame:
    """Real geohash encoding (6 chars = 30 bits) from first principles:
    quantize lat/lon to 15 bisection bits each, interleave (lon bit takes
    the even-from-MSB position, per the geohash spec), then emit base-32
    chars from the standard alphabet — ALL pure integer bit math
    (shift/and/multiply), no UDF, no library, bit-identical across
    engines. Geohash prefixes are the textbook spatial bucketing key
    (equal prefix ⇒ nearby, modulo the boundary caveat ``join_geo_
    bucketed``'s 3×3 neighborhood solves properly): groupBy(geohash3) is
    a ~150 km-cell rollup of a 100 TB point table with a plain string
    key. Coordinates derive from the same md5 scheme as the geo join, so
    the oracle replays everything."""
    c = load_table(spark, sf, "customer").select("c_custkey")
    pts = c.select(
        "c_custkey",
        md5_coord(F.col("c_custkey"), ":lat", 120000, 60.0).alias("lat"),
        md5_coord(F.col("c_custkey"), ":lon", 360000, 180.0).alias("lon"),
    )
    bits = pts.select(
        "c_custkey", "lat", "lon",
        F.floor((F.col("lat") + 90.0) / 180.0 * 32768.0).cast("bigint").alias("latb"),
        F.floor((F.col("lon") + 180.0) / 360.0 * 32768.0).cast("bigint").alias("lonb"),
    )
    inter = bits.withColumn(
        "v",
        F.expr(
            "aggregate(sequence(0, 14), 0L, (acc, k) -> acc"
            " + shiftleft(shiftright(lonb, k) & 1, 2*k + 1)"
            " + shiftleft(shiftright(latb, k) & 1, 2*k))"
        ),
    )

    def gh(n_chars: int):
        return F.expr(
            "array_join(transform(sequence(0, {n} - 1), j -> "
            "substring('{a}', CAST((shiftright(v, 5 * (5 - j)) & 31) + 1 AS INT), 1)), '')"
            .format(n=n_chars, a=_GEOHASH32)
        )

    return inter.select(
        "c_custkey",
        round4(F.col("lat")).alias("lat"),
        round4(F.col("lon")).alias("lon"),
        gh(6).alias("geohash6"),
        gh(3).alias("geohash3"),
    )
