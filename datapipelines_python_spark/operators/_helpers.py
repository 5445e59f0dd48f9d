"""Cross-engine numeric determinism helpers.

The driver hashes values from Spark and DuckDB; doubles must match
bit-for-bit (or at a fixed decimal). Engine ``ROUND()`` is NOT portable:
Spark rounds the shortest decimal repr (via BigDecimal.valueOf), DuckDB
rounds the binary value — they disagree on e.g. 17947.60995. Conventions
used by every operator here:

- **Row-wise double math**: emit the raw double. Identical input bits +
  identical IEEE-754 expression ⇒ identical output bits on both engines.
- **Double aggregates (SUM/AVG)**: cast inputs to DECIMAL(38,8) first —
  decimal sums are exact and order-independent (float summation is not
  associative, and Spark's partial-agg order differs run to run) — then
  cast the final result back to DOUBLE. ``dsum`` / ``davg`` below.
- **Unavoidable rounding** (stddev/corr/percentile, where both engines do
  float math internally): ``round4`` = ``floor(x*1e4 + 0.5)/1e4`` — pure
  IEEE ops, so identical given identical/near-identical inputs, unlike
  engine ROUND.

At 100 TB the decimal-sum convention is also the *correct* choice for
money columns: float sums drift with partition count; decimal sums don't.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEC = "decimal(38,8)"


@lru_cache(maxsize=None)
def _scan_meta(sf_dir: str, table: str) -> tuple[int, int | None]:
    """(scan parallelism upper bound, row count) of a fixture table.

    Parquet scan tasks are ROW-GROUP-granular: a task only produces rows
    for row groups whose midpoint falls inside its byte split, so the
    total row-group count across the table's files — not
    ``maxPartitionBytes`` and not the split count — bounds how many tasks
    can do real work. The fixture files ship exactly ONE row group each,
    so every scan-rooted stage runs serially regardless of cores; a
    production layout (many files / ~128 MB row groups) reaches the core
    count on its own. Footer-only reads, cached per (dir, table); any
    non-local or unreadable layout is reported as "already parallel"
    (rows unknown) so :func:`spread` degrades to a no-op rather than
    guessing.
    """
    path = f"{sf_dir.rstrip('/')}/{table}.parquet"
    try:
        if os.path.isdir(path):
            files = [
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            ]
        else:
            files = [path]
        if not files:
            return 1 << 30, None
        if len(files) >= 64:  # enough file-level tasks; skip footer reads
            return len(files), None
        import pyarrow.parquet as pq

        groups = rows = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            groups += md.num_row_groups
            rows += md.num_rows
        return groups, rows
    except Exception:
        return 1 << 30, None


def scan_parallelism(sf_dir: str, table: str) -> int:
    """Upper bound on a fixture table's parquet scan parallelism (see
    :func:`_scan_meta`)."""
    return _scan_meta(sf_dir, table)[0]


def py_stage_partitions(spark) -> int:
    """Partition count for a stage whose cost is per-row/per-group PYTHON
    work (applyInPandas, pandas window frames): parallelism, not
    partition byte-size, is what matters there, so AQE's byte-based
    coalescing (which lands a skinny shuffle on 1-2 partitions) is the
    wrong sizer. Use the session's core count, or the configured shuffle
    width when a deployment sets it higher — i.e. exactly what the
    ENSURE_REQUIREMENTS exchange would have used before coalescing."""
    try:
        conf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        conf = 0
    return max(spark.sparkContext.defaultParallelism, conf)


def spread(
    df: DataFrame,
    *keys: str | Column,
    sf: str,
    table: str,
    rows_per_task: int = 20_000,
) -> DataFrame:
    """Hash-redistribute a serial scan across idle cores.

    Guide §2.5 (input skew: "one huge unsplittable file … repartition
    immediately after the read") / §2.6 (idle capacity): when the parquet
    layout cannot feed more than a fraction of the cores (single-row-group
    fixture files ⇒ ONE working scan task), everything upstream of the
    first exchange — projections, decimal casts, explodes, partial
    aggregation — runs serially. One hash repartition on an existing
    high-cardinality key (never round-robin: keyless ``repartition(n)``
    pays the sort-before-repartition pass and re-draws under retry,
    SPARK-38388) converts that stage to cores-wide.

    Scale-adaptive, not a local[32] constant: the trigger is the
    *measured* row-group count of the table's files, so on a production
    many-row-group layout this is an exact no-op; and the TARGET (round
    11, VERDICT r10 #1) is sized to the measured work — ``ceil(table
    rows / rows_per_task)``, capped at the session's cores — instead of
    a flat ``defaultParallelism``. Round 10 fanned every spread to the
    core count, and the driver's 8-vs-32-core probe showed the
    join-chain ops (tpch q9/q21, ml_kmeans_lloyd) ANTI-scaling: at
    fixture volume, 32 near-empty shuffle partitions cost more exchange
    and task-scheduling overhead than the serial stage they replace.
    ``rows_per_task`` is per-call-site, calibrated by the measured
    per-row downstream cost (a partition should carry tens of
    milliseconds of work, guide §2.2 "fewer, larger partitions"): dense
    multi-aggregate scans keep the 20k default; join-chain pipelines
    ride 75k–150k; the tiny-but-compute-explosive embedding ops set
    their own (see call sites). At the next decade (sf1, 6M rows) every
    site reaches the core cap, so large-scale behavior is unchanged.
    ``SPARK_GRAFT_SPREAD_PARTITIONS`` force-overrides the computed
    target (deployment escape hatch / A-B harness).

    Apply only AFTER pushed filters/projections (shuffle fewer bytes,
    guide §2.3) and only in operators whose aggregates are
    order-independent (decimal sums, counts, min/max, exact percentiles,
    totally-ordered windows) so results stay bit-identical under any
    partitioning.
    """
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    scan_par, rows = _scan_meta(sf, table)
    if scan_par >= cores:
        return df
    v = os.environ.get("SPARK_GRAFT_SPREAD_PARTITIONS")
    if v:
        n = max(1, int(v))
    elif rows is None:
        n = cores
    else:
        n = min(cores, -(-rows // max(1, rows_per_task)))
    if n <= max(1, scan_par):
        return df
    return df.repartition(n, *keys)


def round4(col: Column) -> Column:
    """Deterministic half-up rounding to 4 decimals (portable vs DuckDB)."""
    return F.floor(col * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


def sql_round4(expr: str) -> str:
    """DuckDB-side twin of :func:`round4`."""
    return f"FLOOR(({expr}) * 10000.0 + 0.5) / 10000.0"


def dsum(col: Column) -> Column:
    """Order-independent SUM of a double column (exact decimal internally)."""
    return F.sum(col.cast(DEC)).cast("double")


def sql_dsum(expr: str) -> str:
    # VARCHAR round-trip: DuckDB's decimal→double cast double-rounds
    # (int128→double, then /1e8) and can be 1 ulp off Spark's correctly
    # rounded BigDecimal→double; string→double parse is correctly rounded.
    return f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE)"


def davg(col: Column) -> Column:
    """Order-independent AVG: exact decimal sum, then one double division."""
    return F.sum(col.cast(DEC)).cast("double") / F.count(col)


def sql_davg(expr: str) -> str:
    return f"{sql_dsum(expr)} / COUNT({expr})"


def md5_coord(key, salt: str, span: int, shift: float) -> Column:
    """Deterministic synthetic coordinate from an integer key: md5 bucket
    scaled into [−shift, span/1000 − shift). Shared by the geo operators
    (``join_geo_bucketed``, ``fn_geohash_encode``) so the point scheme and
    both oracles can never drift apart."""
    h = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8), 16, 10
    ).cast("bigint")
    return (h % span) / 1000.0 - shift


def sql_md5_coord(key_expr: str, salt: str, span: int, shift: float) -> str:
    """DuckDB twin of :func:`md5_coord`."""
    return (
        f"('0x' || SUBSTRING(MD5(CAST({key_expr} AS VARCHAR) || '{salt}'), 1, 8))::BIGINT"
        f" % {span} / 1000.0 - {shift}"
    )
