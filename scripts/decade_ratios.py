"""Compare PROFILE_SF1.json against PROFILE_SF01.json per op.

The geo/pca class of defect — right answer, quadratically wrong plan
(typically a fan-out or pair loop serialized onto one task) — is
invisible at sf0.1 and shows up as a super-linear wall at the next
decade. VERDICT r7 #3: every op whose sf1 wall is >THRESHOLD× its sf0.1
wall must be either fixed or adjudicated-intrinsic in SCALE.md.

Floor: ops under FLOOR_S at sf0.1 are overhead-dominated; their ratios
are noise (0.2 s → 1.3 s is a 6.5× "blowup" of nothing). They are listed
separately only if the sf1 wall itself exceeds FLOOR_ABS_S.

Usage: python scripts/decade_ratios.py [--threshold 6] [--top 40]
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(name: str) -> dict[str, float]:
    with open(os.path.join(REPO, name)) as f:
        prof = json.load(f)
    out: dict[str, float] = {}
    for op, by_part in prof["op_times"].items():
        # single-setting profiles: one entry; take the only/first value
        out[op] = float(next(iter(by_part.values())))
    return out


FLOOR_S = 0.5  # sf0.1 walls below this are overhead-dominated
FLOOR_ABS_S = 5.0  # ...unless the sf1 wall alone is material


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=6.0)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    small = load("PROFILE_SF01.json")
    big = load("PROFILE_SF1.json")
    common = sorted(set(small) & set(big))
    missing = sorted(set(small) ^ set(big))
    if missing:
        print(f"ops in only one profile ({len(missing)}): {missing[:10]}...")

    rows = []
    floor_rows = []
    for op in common:
        s, b = small[op], big[op]
        ratio = b / s if s > 0 else float("inf")
        if s < FLOOR_S:
            if b >= FLOOR_ABS_S:
                floor_rows.append((b, ratio, op, s))
            continue
        rows.append((ratio, b, op, s))

    rows.sort(reverse=True)
    print(f"\n== decade ratios (sf0.1 wall >= {FLOOR_S}s), top {args.top} ==")
    print(f"{'ratio':>7} {'sf0.1':>8} {'sf1':>8}  op")
    flagged = 0
    for ratio, b, op, s in rows[: args.top]:
        mark = "  <-- SUPER-LINEAR" if ratio > args.threshold else ""
        if ratio > args.threshold:
            flagged += 1
        print(f"{ratio:7.1f} {s:8.2f} {b:8.2f}  {op}{mark}")

    print(f"\n== overhead-floored at sf0.1 but material at sf1 (>{FLOOR_ABS_S}s) ==")
    for b, ratio, op, s in sorted(floor_rows, reverse=True):
        print(f"{ratio:7.1f} {s:8.2f} {b:8.2f}  {op}")

    n_over = sum(1 for r, *_ in rows if r > args.threshold)
    print(
        f"\n{len(rows)} comparable ops; {n_over} over {args.threshold}x/decade; "
        f"{len(floor_rows)} floored-but-material"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
