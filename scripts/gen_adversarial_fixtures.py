"""Generate adversarial fixture variants for robustness differentials.

Two degenerate shapes every 100 TB pipeline hits in the wild and the
sf fixtures never exercise:

- ``empty``: every table with its exact parquet schema and 0 rows — the
  shape of a fully-pruned partition, an empty ingest day, or a filter
  that matched nothing. An operator that crashes here (``.first()`` →
  None, ``collect()[0]`` IndexError, driver-side division by a zero
  count) fails a real stage at scale.
- ``dup``: every table = its first row repeated N times — maximal key
  skew (every join key collides, every group collapses to one, every
  window is one giant tied partition). Crashes or cross-engine
  divergences here are skew bugs, not fixture quirks.

Schemas are copied bit-for-bit with pyarrow (no engine round-trip), so
physical types (timestamp[us], list<float>) survive exactly.

Usage:
    python scripts/gen_adversarial_fixtures.py [--src /root/testdata/sf0.001]
        [--out /tmp/advfixtures] [--dup-rows 50]

Then run the standard differential against each variant:
    python scripts/check_oracle.py --sf /tmp/advfixtures/empty
    python scripts/check_oracle.py --sf /tmp/advfixtures/dup
"""

from __future__ import annotations

import argparse
import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq


# Identity-ish columns kept intact in the null-flood variant: keys keep
# joins/groupings structurally alive while every payload goes missing —
# the failed-enrichment / half-written-ingest shape.
_KEYISH = ("key", "_id", "doc_id", "vec_id")


def _is_keyish(col: str) -> bool:
    c = col.lower()
    return c.endswith("key") or c.endswith("_id") or c in ("id",)


def generate(src: str, out: str, dup_rows: int) -> None:
    tables = sorted(glob.glob(os.path.join(src, "*.parquet")))
    if not tables:
        raise SystemExit(f"no parquet tables under {src}")
    for variant in ("empty", "dup", "nullpay"):
        os.makedirs(os.path.join(out, variant), exist_ok=True)
    for path in tables:
        name = os.path.basename(path)
        t = pq.read_table(path)
        empty = t.schema.empty_table()
        pq.write_table(empty, os.path.join(out, "empty", name))
        first = t.slice(0, 1)
        dup = pa.concat_tables([first] * dup_rows)
        pq.write_table(dup, os.path.join(out, "dup", name))
        # null-flood: every nullable non-key column becomes all-NULL,
        # schema (incl. nullability flags) preserved bit-for-bit
        n = t.num_rows
        cols = []
        for field, col in zip(t.schema, t.columns):
            if field.nullable and not _is_keyish(field.name):
                cols.append(pa.nulls(n, type=field.type))
            else:
                cols.append(col)
        nullpay = pa.Table.from_arrays(cols, schema=t.schema)
        pq.write_table(nullpay, os.path.join(out, "nullpay", name))
        nulled = [f.name for f in t.schema
                  if f.nullable and not _is_keyish(f.name)]
        print(
            f"  {name}: empty=0 rows, dup={dup.num_rows} rows, "
            f"nullpay={n} rows ({len(nulled)} cols nulled)"
        )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/advfixtures")
    ap.add_argument("--dup-rows", type=int, default=50)
    args = ap.parse_args()
    generate(args.src, args.out, args.dup_rows)
    print(f"wrote {args.out}/empty and {args.out}/dup")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
