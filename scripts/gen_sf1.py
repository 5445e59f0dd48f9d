"""Synthesize sf1 locally: key-shifted ×10 replication of sf0.1.

VERDICT r6 "Next round" #3: the scaling story needs a third data decade.
No sf1 fixture ships in /root/testdata, so this script manufactures one
from sf0.1 (~6M lineitem / 1M events / 50k documents) into
``.localdata/sf1`` (gitignored — it is a 10× derived artifact, fully
reproducible from this script; only the timing numbers it produces are
committed, in SCALE.md §10).

Construction — 10 replicas of every fact table, replica 0 the identity:

- **Surrogate keys are stride-shifted** per replica (stride = next power
  of ten above the key's max across ALL tables sharing the key family),
  so referential integrity holds *within* a replica and never collides
  *across* replicas: orders.o_custkey and customer.c_custkey shift by the
  same custkey stride, lineitem's l_orderkey/l_partkey/l_suppkey track
  orders/part/supplier. Value columns (prices, dates, flags, timestamps)
  are copied verbatim — every per-key distribution, group cardinality
  ratio, and selectivity is preserved, which is what makes the replica
  honest for *timing* (the verdict's stated bar).
- **nation/region are NOT replicated** (fixed dimensions, as in TPC-H at
  every SF), so c_nationkey/s_nationkey stay valid unshifted.
- **documents.text is de-duplicated across replicas** by inserting a
  replica token after every 3rd word (replica 0 untouched): the minhash
  family shingles word 3-grams, so ~2/3 of each replica's shingles differ
  from the original's and from every other replica's. Without this, each
  doc would appear 10× verbatim and every LSH bucket would grow 10× →
  Σ bucket² pair-verification cost grows 100×, and the scaling curve
  would report a fake super-linearity that no real corpus decade causes
  (within-replica near-dup structure, which IS realistic, is preserved).
  n_chars is recomputed (= len(text), the sf0.1 invariant).
- **part.p_name is prefixed with the replica digit** (replica 0
  untouched): the fuzzy self-join blocks on the 3-char name prefix, so
  verbatim replication makes every block 10× denser on both sides and
  adds ~100× genuine cross-replica matches (identical names at edit
  distance 0) — the sf1 curve would then measure the fixture's
  duplication, not the plan (measured: 5 s → 61 s). A digit prefix keeps
  every replica's block structure and match set identical to sf0.1's
  while cross-replica pairs never share a block. Bench ops only match
  p_name infix ('%red%'), which a prefix cannot disturb.
- **embeddings are rotated** by r positions per replica (np.roll):
  norm- and distribution-preserving but makes replicas distinct vectors,
  so kNN neighbor sets are not degenerate 10-way exact ties.

Usage: python scripts/gen_sf1.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPLICAS = 10
ROW_GROUP = 256 * 1024  # ~10-25 MB groups -> plenty of Spark input splits

# key family -> [(table, column), ...]; stride shared per family
KEY_FAMILIES = {
    # events.user_id FK-joins customer.c_custkey (stream_static_join et
    # al.), so it must ride the custkey stride (ADVICE r8 #1): as its own
    # family it strode by 10,000 (max 1,499) while custkey strode by
    # 100,000 — replica-1 events matched replica-0 customers and replicas
    # 2-9 events matched nothing, understating every user_id=c_custkey
    # join's sf1 work by ~80%.
    "custkey": [
        ("customer", "c_custkey"),
        ("orders", "o_custkey"),
        ("events", "user_id"),
    ],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event_id": [("events", "event_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}

FIXED_TABLES = ("nation", "region")
FACT_TABLES = (
    "customer",
    "orders",
    "lineitem",
    "part",
    "supplier",
    "events",
    "documents",
    "embeddings",
)


def _stride(max_val: int) -> int:
    s = 1
    while s <= max_val:
        s *= 10
    return s


def _salt_text(text: str, r: int) -> str:
    words = text.split(" ")
    out = []
    tok = f"zz{r}"
    for i, w in enumerate(words):
        out.append(w)
        if (i + 1) % 3 == 0:
            out.append(tok)
    return " ".join(out)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata", "sf1")
    )
    os.makedirs(out, exist_ok=True)

    tables = {t: pq.read_table(os.path.join(src, f"{t}.parquet")) for t in FACT_TABLES + FIXED_TABLES}

    strides: dict[str, int] = {}
    for fam, sites in KEY_FAMILIES.items():
        m = max(pc.max(tables[t][c]).as_py() for t, c in sites)
        strides[fam] = _stride(int(m))
    shift_cols = {(t, c): strides[fam] for fam, sites in KEY_FAMILIES.items() for t, c in sites}

    for t in FIXED_TABLES:
        pq.write_table(tables[t], os.path.join(out, f"{t}.parquet"), row_group_size=ROW_GROUP)
        print(f"{t}: copied {tables[t].num_rows} rows (fixed dimension)")

    for t in FACT_TABLES:
        base = tables[t]
        replicas = []
        for r in range(REPLICAS):
            cols = {}
            for name in base.column_names:
                col = base[name]
                stride = shift_cols.get((t, name))
                if stride is not None and r > 0:
                    col = pc.add(col, pa.scalar(r * stride, type=col.type))
                cols[name] = col
            if t == "part" and r > 0:
                names = pc.binary_join_element_wise(
                    pa.scalar(str(r % 10)), base["p_name"].combine_chunks(), ""
                )
                cols["p_name"] = pa.chunked_array([names])
            if t == "documents" and r > 0:
                texts = [_salt_text(x.as_py(), r) for x in base["text"]]
                cols["text"] = pa.chunked_array([pa.array(texts, type=pa.string())])
                cols["n_chars"] = pa.chunked_array(
                    [pa.array([len(x) for x in texts], type=pa.int64())]
                )
            if t == "embeddings" and r > 0:
                mat = np.stack(base["embedding"].combine_chunks().to_numpy(zero_copy_only=False))
                mat = np.roll(mat, r, axis=1)
                cols["embedding"] = pa.chunked_array(
                    [pa.array(list(mat), type=base.schema.field("embedding").type)]
                )
            replicas.append(pa.table(cols, schema=base.schema))
        big = pa.concat_tables(replicas)
        pq.write_table(big, os.path.join(out, f"{t}.parquet"), row_group_size=ROW_GROUP)
        print(f"{t}: {base.num_rows} -> {big.num_rows} rows")

    print(f"sf1 written to {out}")


if __name__ == "__main__":
    main()
