"""Rotation planner for the driver's 50-query correctness cap.

The driver checks only the FIRST 50 `queries()` entries per round, so each
round's head must rotate so every query eventually earns a driver
CORRECTNESS row. This reads every CORRECTNESS_r*.json in the repo root,
reports per-query driver coverage, and prints a suggested next-round head:
never-checked queries first (registry order), then the longest-unchecked,
leaving the most-recently-certified for the tail.

Run:  python scripts/plan_rotation.py
"""
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAD_CAP = 50


def main() -> None:
    import __spark_entry__ as entry

    names = list(entry.queries())
    rounds = {}
    for path in sorted(glob.glob(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "CORRECTNESS_r*.json"))):
        # match on the basename only (an '_r<digits>' in an ancestor dir
        # must not win) and skip non-numeric suffixes the glob admits
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json",
                         os.path.basename(path))
        if not m:
            continue
        rounds[int(m.group(1))] = json.load(open(path))

    last_green = {}  # name -> latest round with a fully green row
    ever_row = set()
    for rn in sorted(rounds):
        for name, row in rounds[rn].items():
            if name not in names:
                continue
            ever_row.add(name)
            if (row.get("rows_match") and row.get("schema_match")
                    and row.get("hash_match") and not row.get("err")):
                last_green[name] = rn

    never = [n for n in names if n not in ever_row]
    stale = sorted((n for n in names if n in ever_row),
                   key=lambda n: (last_green.get(n, -1), names.index(n)))
    head = (never + stale)[:HEAD_CAP]

    print(f"{len(names)} queries; driver rows exist for {len(ever_row)}; "
          f"never driver-checked: {len(never)}")
    for n in never:
        print(f"  NEVER    {n}")
    for n in stale[:10]:
        print(f"  r{last_green.get(n, '?'):<7} {n}")
    print(f"\nsuggested next-round head ({len(head)}):")
    for n in head:
        print(f"  {n}")
    tail = [n for n in names if n not in head]
    print(f"\ntail ({len(tail)}): {', '.join(tail)}")


if __name__ == "__main__":
    main()
