"""Fixture-table catalog: the ten driver tables as DataFrames / temp views.

Scans are plain ``spark.read.parquet`` so Catalyst's predicate pushdown and
column pruning reach the file scan (verify with ``.explain``: PushedFilters /
ReadSchema). At 100 TB these would be partitioned/bucketed external tables;
the loader shape is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to TIMESTAMP across fixture generations.

    The driver has shipped ``events.ts`` both as TIMESTAMP(MICROS) (read
    natively) and as TIMESTAMP(NANOS) parquet, which Spark rejects outright
    unless read as raw nanos via ``spark.sql.legacy.parquet.nanosAsLong``.
    When the column arrives as a raw LONG of epoch-nanos, convert with
    integer division (``DIV 1000`` — epoch-nanos ≈ 1.7e18 exceeds double's
    2^53, so float division would corrupt it). DuckDB truncates ns→µs the
    same way.

    Micros parquet without a timezone arrives as TIMESTAMP_NTZ; cast it to
    TIMESTAMP (session tz is pinned to UTC, so the cast is value-preserving)
    because watermarks/windows require the LTZ type and every oracle pair
    was written against it.
    """
    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif isinstance(dt, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; schema comes from parquet footer (no inference)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_events_ts(spark.read.parquet(table_path(sf_dir, name)))
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every fixture table as a temp view (for the SQL entry path)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
