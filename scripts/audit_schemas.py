"""Audit every registered operator's OUTPUT schema for driver-canonicalizer
risk.

The driver compares Spark vs DuckDB results through a pandas canonicalizer;
round-1 evidence (CORRECTNESS_r01.json):

- top-level ARRAY/MAP/STRUCT columns crash it (``TypeError: unhashable type:
  'list'`` on ``scan_json_nested``),
- DECIMAL columns hash-mismatch (``decimal.Decimal`` objects vs DuckDB
  float64 on ``project_cast``),
- DATE columns hash clean (round-2 ``diag_probe_date``, so DateType was
  dropped from FORBIDDEN_TYPES in round 3).

This script builds each op's plan at sf0.001 (analysis only — nothing is
executed unless the op itself executes work) and reports ops whose final
schema contains DecimalType / ArrayType / MapType / StructType.

Usage: python scripts/audit_schemas.py [--only a,b] [--skip-streaming]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

from datapipelines_python_spark import get_registry, get_spark
from datapipelines_python_spark.canon import FORBIDDEN_TYPES


def risky_fields(schema: T.StructType) -> list[tuple[str, str]]:
    out = []
    for f in schema.fields:
        for cls in FORBIDDEN_TYPES:
            if isinstance(f.dataType, cls):
                out.append((f.name, cls.__name__.removesuffix("Type").lower()))
                break
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    ap.add_argument("--skip-streaming", action="store_true")
    args = ap.parse_args()

    spark = get_spark()
    reg = get_registry()
    only = set(args.only.split(",")) if args.only else None

    flagged: dict[str, list] = {}
    errors: dict[str, str] = {}
    t0 = time.time()
    for i, (name, spec) in enumerate(reg.items()):
        if only and name not in only:
            continue
        if args.skip_streaming and "streaming" in spec.tags:
            continue
        try:
            df = spec.fn(spark, args.sf)
            bad = risky_fields(df.schema)
            if bad:
                flagged[name] = bad
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"[:200]
        if (i + 1) % 50 == 0:
            print(f"... {i + 1}/{len(reg)} audited ({time.time() - t0:.0f}s)", file=sys.stderr)

    print(json.dumps({"flagged": flagged, "errors": errors, "n_flagged": len(flagged)}, indent=1))


if __name__ == "__main__":
    main()
