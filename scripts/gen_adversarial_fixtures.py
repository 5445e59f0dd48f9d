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


def generate(src: str, out: str, dup_rows: int) -> None:
    tables = sorted(glob.glob(os.path.join(src, "*.parquet")))
    if not tables:
        raise SystemExit(f"no parquet tables under {src}")
    for variant in ("empty", "dup"):
        os.makedirs(os.path.join(out, variant), exist_ok=True)
    for path in tables:
        name = os.path.basename(path)
        t = pq.read_table(path)
        empty = t.schema.empty_table()
        pq.write_table(empty, os.path.join(out, "empty", name))
        first = t.slice(0, 1)
        dup = pa.concat_tables([first] * dup_rows)
        pq.write_table(dup, os.path.join(out, "dup", name))
        print(f"  {name}: empty=0 rows, dup={dup.num_rows} rows")


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
