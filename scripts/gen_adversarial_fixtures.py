"""Generate adversarial fixture variants for robustness differentials.

Degenerate shapes every 100 TB pipeline hits in the wild and the
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
- ``nullpay``: every nullable non-key column all-NULL — the
  failed-enrichment / half-written-ingest shape.
- ``dupnull``: ``dup`` × ``nullpay`` composed — one hot key whose
  payloads are all missing; skew and null handling probed together.

Schemas are copied bit-for-bit with pyarrow (no engine round-trip), so
physical types (timestamp[us], list<float>) survive exactly.

Usage:
    python scripts/gen_adversarial_fixtures.py [--src /root/testdata/sf0.001]
        [--out /tmp/advfixtures] [--dup-rows 50]

Then run the standard differential against each variant:
    python scripts/check_oracle.py --sf /tmp/advfixtures/empty
    python scripts/check_oracle.py --sf /tmp/advfixtures/dup
    python scripts/check_oracle.py --sf /tmp/advfixtures/nullpay
    python scripts/check_oracle.py --sf /tmp/advfixtures/dupnull
"""

from __future__ import annotations

import argparse
import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq


def _is_keyish(col: str) -> bool:
    """Identity-ish columns kept intact in the null-flood variants: keys keep
    joins/groupings structurally alive while every payload goes missing —
    the failed-enrichment / half-written-ingest shape."""
    c = col.lower()
    return c.endswith("key") or c.endswith("_id") or c in ("id",)


def generate(src: str, out: str, dup_rows: int) -> None:
    tables = sorted(glob.glob(os.path.join(src, "*.parquet")))
    if not tables:
        raise SystemExit(f"no parquet tables under {src}")
    for variant in ("empty", "dup", "nullpay", "dupnull"):
        os.makedirs(os.path.join(out, variant), exist_ok=True)

    def null_flood(src_t: pa.Table) -> pa.Table:
        # every nullable non-key column becomes all-NULL, schema (incl.
        # nullability flags) preserved bit-for-bit
        cols = []
        for field, col in zip(src_t.schema, src_t.columns):
            if field.nullable and not _is_keyish(field.name):
                cols.append(pa.nulls(src_t.num_rows, type=field.type))
            else:
                cols.append(col)
        return pa.Table.from_arrays(cols, schema=src_t.schema)

    for path in tables:
        name = os.path.basename(path)
        t = pq.read_table(path)
        empty = t.schema.empty_table()
        pq.write_table(empty, os.path.join(out, "empty", name))
        first = t.slice(0, 1)
        dup = pa.concat_tables([first] * dup_rows)
        pq.write_table(dup, os.path.join(out, "dup", name))
        pq.write_table(null_flood(t), os.path.join(out, "nullpay", name))
        # composed shape: one hot key AND all payloads missing at once —
        # the failed-enrichment-on-the-hot-tenant case (skew bugs and
        # null bugs can mask each other when probed one axis at a time)
        pq.write_table(null_flood(dup), os.path.join(out, "dupnull", name))
        nulled = [f.name for f in t.schema
                  if f.nullable and not _is_keyish(f.name)]
        print(
            f"  {name}: empty=0 rows, dup={dup.num_rows} rows, "
            f"nullpay={t.num_rows} rows ({len(nulled)} cols nulled), "
            f"dupnull={dup.num_rows} rows"
        )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/advfixtures")
    ap.add_argument("--dup-rows", type=int, default=50)
    args = ap.parse_args()
    generate(args.src, args.out, args.dup_rows)
    print(
        f"wrote {args.out}/{{empty,dup,nullpay,dupnull}} "
        f"({args.dup_rows} rows per dup variant)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
