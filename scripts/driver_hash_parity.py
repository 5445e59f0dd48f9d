"""Driver-hasher parity harness (VERDICT r5 "Next round" #7).

``check_oracle.py`` compares Spark ``.collect()`` rows against DuckDB
``.fetchall()`` tuples — it predicted r3/r4 driver results perfectly but
missed r5's three hash-reds. The driver, however, compares PANDAS frames
(Spark ``toPandas()`` vs DuckDB ``fetchdf()``), a different conversion
path with its own dtype coercions: a nullable BIGINT becomes float64
(5 → 5.0), object columns stringify differently, and raw doubles are
rendered per-cell rather than compared as Python floats.

This harness replays that path with the STRICTEST plausible rendering —
shortest-round-trip ``repr`` per float cell, i.e. bit-exact doubles —
so any op that passes here passes every weaker real hasher too. For each
op it reports:

- ``hash``: sha256 over (columns sorted by name, rows sorted, cells
  rendered) from both engines — the driver-style verdict;
- ``dtype``: pandas dtype-FAMILY agreement per column (int/float/bool/
  datetime/object) — the coercion trap check_oracle cannot see;
- on mismatch, the first differing rendered row.

Usage:
    python scripts/driver_hash_parity.py [--sf DIR] [--only a,b] [--slice]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
from datetime import date as dt_date
from datetime import datetime as dt_datetime

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipelines_python_spark import get_registry, get_spark
from datapipelines_python_spark.catalog import TABLES


def render_cell(v) -> str:
    """Strictest plausible driver rendering: bit-exact floats via shortest
    round-trip repr; everything else via str with NULL/NaT sentinels."""
    if v is None:
        return "<NULL>"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "<NaN>"
        if math.isinf(f):
            return "<+Inf>" if f > 0 else "<-Inf>"
        return repr(f)
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, (pd.Timestamp,)):
        if pd.isna(v):
            return "<NULL>"
        return v.isoformat()
    # DATE alignment: Spark toPandas yields datetime.date objects while
    # DuckDB fetchdf yields midnight datetime64 for the same DATE column.
    # The real driver hashes DATE columns clean (r2 diag probe), so the
    # harness renders a date as its midnight instant — without this, 32
    # date-bearing ops false-FAIL while being driver-green on record.
    if isinstance(v, dt_date) and not isinstance(v, dt_datetime):
        return v.isoformat() + "T00:00:00"
    if isinstance(v, dt_datetime):
        # pd.NaT subclasses datetime — it must render as NULL, not "NaT"
        return "<NULL>" if pd.isna(v) else v.isoformat()
    if v is pd.NaT:
        return "<NULL>"
    try:
        if pd.isna(v):  # covers pd.NA and friends; raises on arrays
            return "<NULL>"
    except (TypeError, ValueError):
        pass
    return str(v)


def dtype_family(dt) -> str:
    s = str(dt)
    if "int" in s.lower():
        return "int"
    if "float" in s.lower() or "double" in s.lower():
        return "float"
    if "bool" in s.lower():
        return "bool"
    if "datetime" in s.lower() or "timestamp" in s.lower():
        return "datetime"
    if s == "object" or "string" in s.lower():
        return "object"
    return s


def frame_digest(pdf: pd.DataFrame) -> tuple[str, list[str], dict[str, str]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rendered = [
        tuple(render_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    rendered.sort()
    h = hashlib.sha256()
    for row in rendered:
        for cell in row:
            h.update(cell.encode())
            h.update(b"\x1f")
        h.update(b"\x1e")
    families = {c: dtype_family(pdf[c].dtype) for c in cols}
    return h.hexdigest(), [" | ".join(r) for r in rendered], families


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--slice", action="store_true",
        help="run the first-50 driver slice (registration order)",
    )
    args = ap.parse_args()

    reg = get_registry()
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
    elif args.slice:
        names = list(reg)[:50]
    else:
        names = list(reg)

    spark = get_spark("hash-parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf.rstrip('/')}/{t}.parquet')"
        )

    n_pass = n_fail = n_skip = 0
    for name in names:
        spec = reg.get(name)
        if spec is None:
            print(f"  SKIP {name}: not registered")
            n_skip += 1
            continue
        if spec.oracle is None:
            print(f"  SKIP {name}: rows-only (no oracle)")
            n_skip += 1
            continue
        try:
            spdf = spec.fn(spark, args.sf).toPandas()
            dpdf = con.execute(spec.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"  ERR  {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sh, srows, sfam = frame_digest(spdf)
        dh, drows, dfam = frame_digest(dpdf)
        dtype_diff = {
            c: (sfam.get(c), dfam.get(c))
            for c in set(sfam) | set(dfam)
            if sfam.get(c) != dfam.get(c)
        }
        if sh == dh:
            flag = f"  (dtype families differ: {dtype_diff})" if dtype_diff else ""
            print(f"  PASS {name}{flag}")
            n_pass += 1
        else:
            n_fail += 1
            print(f"  FAIL {name}: hash {sh[:12]} != {dh[:12]}")
            if dtype_diff:
                print(f"       dtype families differ: {dtype_diff}")
            for a, b in zip(srows, drows):
                if a != b:
                    print(f"       spark : {a}\n       oracle: {b}")
                    break
            if len(srows) != len(drows):
                print(f"       row counts: {len(srows)} vs {len(drows)}")
    print(f"{n_pass} pass, {n_fail} fail, {n_skip} skip @ {args.sf}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
