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
- ``unistr``: every string payload column rotated through a Unicode
  hazard set (CJK, emoji incl. astral-plane, RTL Arabic, combining
  accents, ß casing, tabs/newlines, SQL-metacharacters, a 5 kB blob,
  empty and whitespace-only strings) — the shape of a real multilingual
  LLM corpus. Probes the Java-regex vs RE2 seam, codepoint-vs-byte
  length assumptions, and tokenizer/casing/normalization divergence
  between engines.

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
    for variant in ("empty", "dup", "nullpay", "dupnull", "unistr"):
        os.makedirs(os.path.join(out, variant), exist_ok=True)

    # Deterministic Unicode hazard rotation (row i gets HAZARDS[i % len]):
    # multilingual scripts, astral-plane emoji, RTL, combining marks,
    # casing traps, control whitespace, metacharacters, a long blob,
    # empty/whitespace-only. Join keys/ids stay intact so plans keep their
    # shape; only payload TEXT changes.
    _HAZARDS = (
        "héllo wörld",
        "日本語のテキストです。これは長めの文で、句読点も含みます。",
        "🚀🔥 emoji soup 🎉🐍 \U0001F9E0\U0001F680",
        "مرحبا بالعالم هذا نص عربي",
        "a\tb\nc\rd",
        "straße STRASSE ß SS",
        "café vs café",
        "\U0001D518\U0001D52B\U0001D526 astral \U0001D520\U0001D52C\U0001D521\U0001D522",
        "'; DROP TABLE x; -- $^.*+?()[]{}|\\",
        "x" * 5000,
        "",
        "  leading and trailing  ",
        "ЗДРАВСТВУЙ мир падежи",
        "한국어 텍스트 조각",
    )

    # Partition-layout key columns (partitionBy targets in the scan/sink
    # ops): hazardous but LENGTH-BOUNDED. A partition VALUE becomes a
    # filesystem path component, and path components are capped at 255
    # bytes on every mainstream filesystem — an unbounded-text partition
    # key is a data-modeling error (the layout ops document it), not an
    # engine bug the fixture should manufacture. Same principle as
    # keeping join keys intact in the null-flood variants.
    _PARTITION_KEY_COLS = {"l_returnflag", "o_orderstatus"}

    def uni_rotate(src_t: pa.Table) -> pa.Table:
        cols = []
        n = src_t.num_rows
        for field, col in zip(src_t.schema, src_t.columns):
            if pa.types.is_string(field.type) and not _is_keyish(field.name):
                clip = 24 if field.name in _PARTITION_KEY_COLS else None
                vals = [_HAZARDS[i % len(_HAZARDS)][:clip] for i in range(n)]
                cols.append(pa.array(vals, type=field.type))
            else:
                cols.append(col)
        return pa.Table.from_arrays(cols, schema=src_t.schema)

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
        pq.write_table(uni_rotate(t), os.path.join(out, "unistr", name))
        nulled = [f.name for f in t.schema
                  if f.nullable and not _is_keyish(f.name)]
        rotated = [f.name for f in t.schema
                   if pa.types.is_string(f.type) and not _is_keyish(f.name)]
        print(
            f"  {name}: empty=0 rows, dup={dup.num_rows} rows, "
            f"nullpay={t.num_rows} rows ({len(nulled)} cols nulled), "
            f"dupnull={dup.num_rows} rows, "
            f"unistr={t.num_rows} rows ({len(rotated)} text cols rotated)"
        )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/advfixtures")
    ap.add_argument("--dup-rows", type=int, default=50)
    args = ap.parse_args()
    generate(args.src, args.out, args.dup_rows)
    print(
        f"wrote {args.out}/{{empty,dup,nullpay,dupnull,unistr}} "
        f"({args.dup_rows} rows per dup variant)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
