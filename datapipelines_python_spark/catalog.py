"""Fixture-table catalog: the ten driver tables as DataFrames / temp views.

Scans are plain ``spark.read.parquet`` so Catalyst's predicate pushdown and
column pruning reach the file scan (verify with ``.explain``: PushedFilters /
ReadSchema). At 100 TB these would be partitioned/bucketed external tables;
the loader shape is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; schema comes from parquet footer (no inference).

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark rejects outright;
    read it as raw nanos (legacy conf) and convert with integer division
    (``DIV 1000`` — epoch-nanos ≈ 1.7e18 exceeds double's 2^53, so float
    division would corrupt it). DuckDB truncates ns→µs the same way.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(table_path(sf_dir, name))
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every fixture table as a temp view (for the SQL entry path)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
