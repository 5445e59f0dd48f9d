"""Local oracle-differential harness — mimics the driver's correctness check.

Runs every registered operator's Spark plan AND its DuckDB oracle SQL on the
same parquet fixtures, then compares row-count + schema-width + an
order-insensitive value comparison (columns sorted by name, rows sorted,
values normalized). Reports PASS/FAIL per query with the first differing row.

Usage:
    python scripts/check_oracle.py [--sf /root/testdata/sf0.001] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import datetime as dt
import decimal
import math
import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipelines_python_spark import get_registry, get_spark
from datapipelines_python_spark.catalog import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir.rstrip('/')}/{t}.parquet')"
        )
    return con


def norm_value(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        # exact bits — queries are written so both engines produce identical
        # doubles; approx_equal flags near-misses as driver-hash risks
        return ("f", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(norm_value(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, norm_value(x)) for k, x in v.items())))
    return str(v)


def sortable(row):
    return tuple((str(type(x)), repr(x)) for x in row)


def normalize_result(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    out = [tuple(norm_value(r[i]) for i in order) for r in rows]
    out.sort(key=sortable)
    return cols_sorted, out


def approx_equal(a, b) -> bool:
    if isinstance(a, tuple) and isinstance(b, tuple) and a and b and a[0] == b[0] == "f":
        x, y = a[1], b[1]
        if x == "nan" or y == "nan":
            return x == y
        return math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, tuple) and isinstance(b, tuple) and a and b and a[0] == b[0] == "l":
        return len(a[1]) == len(b[1]) and all(approx_equal(x, y) for x, y in zip(a[1], b[1]))
    return a == b


def rows_equal(a, b) -> bool:
    return len(a) == len(b) and all(approx_equal(x, y) for x, y in zip(a, b))


def compare(name: str, spark_df, duck_rel) -> tuple[bool, str]:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = list(duck_rel.columns)
    d_rows = duck_rel.fetchall()

    if len(s_rows) != len(d_rows):
        return False, f"rowcount spark={len(s_rows)} duck={len(d_rows)}"
    sc, sr = normalize_result(s_cols, s_rows)
    dc, dr = normalize_result(d_cols, d_rows)
    if [c.lower() for c in sc] != [c.lower() for c in dc]:
        return False, f"columns spark={sc} duck={dc}"
    exact = True
    for i, (a, b) in enumerate(zip(sr, dr)):
        if a != b:
            exact = False
            if not rows_equal(a, b):
                return False, f"row {i} differs:\n  spark={a}\n  duck ={b}"
    return True, "exact" if exact else "approx (float tolerance — tighten rounding!)"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--sample", type=int, default=None,
        help="check a random sample of N operators (seeded; see --seed)",
    )
    ap.add_argument("--seed", type=int, default=0, help="sample seed")
    args = ap.parse_args()

    registry = get_registry()
    names = list(registry)
    if args.only:
        names = [n for n in args.only.split(",") if n]
    if args.sample is not None:
        import random

        names = sorted(random.Random(args.seed).sample(names, min(args.sample, len(names))))

    spark = get_spark("oracle-check")
    con = duck_connect(args.sf)

    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name in names:
        spec = registry[name]
        t0 = time.time()
        try:
            df = spec.fn(spark, args.sf)
            if spec.oracle is None:
                cnt = df.count()
                n_rows_only += 1
                print(f"  ROWS-ONLY {name}: {cnt} rows ({time.time()-t0:.1f}s)")
                continue
            rel = con.sql(spec.oracle)
            ok, msg = compare(name, df, rel)
        except Exception:
            ok, msg = False, traceback.format_exc(limit=10)
        took = time.time() - t0
        if ok:
            n_pass += 1
            flag = "" if msg == "exact" else f"  [{msg}]"
            print(f"  PASS {name} ({took:.1f}s){flag}")
        else:
            n_fail += 1
            failures.append(name)
            print(f"  FAIL {name} ({took:.1f}s): {msg}")
    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only, "
        f"{len(names)} total @ {args.sf}"
    )
    if failures:
        print("failing:", ",".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
