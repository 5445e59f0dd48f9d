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

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,8)"


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
