"""Propose the next driver-slice rotation.

The driver's CORRECTNESS check only ever sees the first 50 registered
names, so each round the registration order should rotate in 50 ops with
no driver-green history (VERDICT r2 #1). This reads every committed
CORRECTNESS_r*.json, collects the names that have ever produced a green
row (rows+schema+hash all true, or rows-true for rows-only ops), and
prints the first 50 never-checked exact-oracle ops in current registry
order — the suggested `registry.DRIVER_SLICE` for next round, plus a
coverage summary.

Run at the START of a round, BEFORE the driver's check, never after the
current slice has been locally verified mid-round.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipelines_python_spark import all_oracles, all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def driver_green_names(rows_only: set[str]) -> set[str]:
    """Names with a fully-green driver row on record: exact-oracle ops
    need rows+schema+hash all true; rows-only ops (no oracle — the driver
    records hash_match=False for them) are as green as they can get once
    rows+schema match."""
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            ok = bool(row.get("rows_match")) and bool(row.get("schema_match"))
            if name not in rows_only:
                ok = ok and bool(row.get("hash_match"))
            if ok:
                green.add(name)
    return green


def main() -> int:
    order = list(all_queries())
    oracles = all_oracles()
    rows_only = {n for n in order if not oracles.get(n)}
    green = driver_green_names(rows_only)

    # digest certification (round 5+): a green digest_<family> row
    # hash-certifies every member's values, so members count as covered
    # even without an individual driver row
    digest_covered: set[str] = set()
    try:
        from datapipelines_python_spark.digest_snapshot import DIGEST_FAMILIES

        for fam, members in DIGEST_FAMILIES.items():
            if f"digest_{fam}" in green:
                digest_covered |= set(members)
    except ImportError:
        pass

    covered = green | digest_covered
    never = [n for n in order if n not in covered]
    never_exact = [n for n in never if oracles.get(n)]
    print(f"registry: {len(order)} ops; driver-green ever: "
          f"{len(green & set(order))}; digest-certified: "
          f"{len(digest_covered - green)}; uncovered: {len(never)} "
          f"({len(never_exact)} with exact oracles)")
    if never_exact:
        print("\nsuggested next DRIVER_SLICE (first 50 uncovered, "
              "current registry order):")
        for i, n in enumerate(never_exact[:50]):
            print(f"  {i + 1:2d}. {n}")
        return 0

    # Everything is covered by green ∪ digest. The remaining rotation
    # target (VERDICT r8 #2) is the digest-only tail: ops certified via a
    # family digest but never INDIVIDUALLY raw-hash green. Rotate the next
    # 42 of those in round-robin across family prefixes (matching the r8
    # slice style) so each round's slice samples every family.
    digest_only = [n for n in order if n in digest_covered and n not in green]
    by_family: dict[str, list[str]] = {}
    for n in digest_only:
        by_family.setdefault(n.split("_", 1)[0], []).append(n)
    rr: list[str] = []
    fams = sorted(by_family)
    idx = {f: 0 for f in fams}
    while len(rr) < min(42, len(digest_only)):
        progressed = False
        for f in fams:
            if idx[f] < len(by_family[f]) and len(rr) < 42:
                rr.append(by_family[f][idx[f]])
                idx[f] += 1
                progressed = True
        if not progressed:
            break
    print(f"\ndigest-only individual tail: {len(digest_only)} ops; "
          "suggested next 42 rotation slots (8 digests stay):")
    for i, n in enumerate(rr):
        print(f"  {i + 1:2d}. {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
