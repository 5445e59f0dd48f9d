"""Numpy simulation: close the single-table dedup recall gap (VERDICT r9 #4).

llm_dedup_embedding's measured pair-recall at sf1 is 0.114 vs the 0.143
sf0.1 fixture pin — one table = one chance, even with margin-ranked
multi-probe. Before touching SQL (the SCALE.md §22 rule), this simulates
candidate generation exactly as both engines would compute it (float
margins, integer buckets, position tie-breaks) for the strategies the
verdict names, and reports pair-recall vs exact float64 truth plus the
candidate-pair count (the cost axis: work scales with Σ per-bucket
occupancy products, measured here directly as distinct candidate pairs).

Strategies (all keep n <= 2000 degeneration exact by construction —
every addition is gated on nbits > 4, i.e. n > 2000):
  S0  current: 1 table over dims[0:nbits], home + E=nbits-4 one-bit probes
  S1  2 independent tables (dims[0:nbits], dims[nbits:2*nbits]), home only
  S2  2 tables, home + E probes each
  S3  1 table, deeper probe set: all 1-bit flips of the E smallest
      margins PLUS the pairwise (2-bit) flips among them
  S4  2 tables, home + E probes on table 0, home-only table 1

Usage: python scripts/sim_dedup_second_table.py [--sf .localdata/sf1]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

import numpy as np
import pyarrow.parquet as pq

SIGN_BITS = 4
TAU = 0.35


def load(sf_dir: str):
    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.asarray(tbl["vec_id"])
    X = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    return ids, X


def exact_pairs(ids, X, tau=TAU):
    n = X.shape[0]
    Xn = X / np.sqrt((X * X).sum(1))[:, None]
    pairs = set()
    for s in range(0, n, 2048):
        e = min(s + 2048, n)
        sims = Xn[s:e] @ Xn.T
        for r in range(e - s):
            row = sims[r]
            row[s + r] = -np.inf
            u = int(ids[s + r])
            for j in np.nonzero(row >= tau)[0]:
                v = int(ids[j])
                if u < v:
                    pairs.add((u, v))
    return pairs


def nbits_of(n: int) -> int:
    m = (max(n, 1) - 1) // 2000
    return SIGN_BITS + (m.bit_length() if m > 0 else 0)


def buckets(X, lo: int, nb: int):
    """Sign bucket over dims [lo, lo+nb) — engine semantics: x > 0 sets
    the bit. Returns int64 bucket per row."""
    B = (X[:, lo : lo + nb] > 0).astype(np.int64)
    return B @ (1 << np.arange(nb, dtype=np.int64))


def probe_masks(X, lo: int, nb: int, e: int, two_bit: bool = False):
    """Per-row probe masks: home (0) + flips of the e smallest-|x| bits
    (position tie-break), mirroring _SPARK_PROBE_MASKS. With two_bit,
    also the pairwise XORs of those e single-bit masks."""
    n = X.shape[0]
    absd = np.abs(X[:, lo : lo + nb])
    # lexsort by (|x|, position): engine sorts structs ('m', 'p') ascending
    order = np.lexsort((np.arange(nb)[None, :].repeat(n, 0), absd), axis=-1)
    masks = [np.zeros(n, dtype=np.int64)]
    singles = [(1 << order[:, i].astype(np.int64)) for i in range(e)]
    masks += singles
    if two_bit:
        for a, b in itertools.combinations(range(e), 2):
            masks.append(singles[a] | singles[b])
    return masks  # list of (n,) arrays


def candidate_pairs(tables):
    """tables: list of (bucket_array, masks_list). Candidates: i~j iff
    some table t and some probe mask m of i has bucket_t[i]^m ==
    bucket_t[j] (symmetrized — the engines union both directions)."""
    n = len(tables[0][0])
    cand = set()
    for b, masks in tables:
        home = {}
        for j in range(n):
            home.setdefault(int(b[j]), []).append(j)
        for m in masks:
            probed = b ^ m
            for i in range(n):
                for j in home.get(int(probed[i]), ()):
                    if i != j:
                        cand.add((i, j) if i < j else (j, i))
    return cand


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".localdata/sf1")
    args = ap.parse_args()

    ids, X = load(args.sf)
    n = len(ids)
    nb = nbits_of(n)
    e = nb - SIGN_BITS
    t0 = time.time()
    truth = exact_pairs(ids, X)
    print(
        f"# n={n} nbits={nb} E={e} true_pairs={len(truth)} "
        f"(truth {time.time()-t0:.0f}s)",
        file=sys.stderr,
    )

    b0 = buckets(X, 0, nb)
    b1 = buckets(X, nb, nb)
    p_home = [np.zeros(n, dtype=np.int64)]
    p0 = probe_masks(X, 0, nb, e)
    p1 = probe_masks(X, nb, nb, e)
    p0_deep = probe_masks(X, 0, nb, e, two_bit=True)

    strategies = {
        "S0_current_1t_probes": [(b0, p0)],
        "S1_2t_home_only": [(b0, p_home), (b1, p_home)],
        "S2_2t_probes_both": [(b0, p0), (b1, p1)],
        "S3_1t_two_bit_probes": [(b0, p0_deep)],
        "S4_2t_probes_t0_only": [(b0, p0), (b1, p_home)],
    }

    idx_pair_truth = {
        (u, v) for (u, v) in truth
    }  # ids are 0..n-1-ish; map through ids array
    id_of = {i: int(ids[i]) for i in range(n)}

    for name, tabs in strategies.items():
        t0 = time.time()
        cand = candidate_pairs(tabs)
        found = set()
        for i, j in cand:
            u, v = id_of[i], id_of[j]
            pair = (u, v) if u < v else (v, u)
            if pair in idx_pair_truth:
                found.add(pair)
        rec = len(found) / len(truth) if truth else 1.0
        print(
            json.dumps(
                {
                    "strategy": name,
                    "pair_recall": round(rec, 4),
                    "candidate_pairs": len(cand),
                    "cand_per_row": round(len(cand) / n, 1),
                    "sim_s": round(time.time() - t0, 1),
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
