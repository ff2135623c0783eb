"""Driver-gate coverage report: which registry entries have a driver
CORRECTNESS row, from which round, and what the next 50-query window
should therefore contain.

The external driver samples only the FIRST 50 entries of ``queries()``
per round (dict order = ``__spark_entry__._gate_order``), so window
rotation is how the whole registry earns external verification over
rounds. This tool automates the selection VERDICT asked for manually:
never-sampled queries first, then the stalest greens.

Usage: python tools/gate_coverage.py            # report
       python tools/gate_coverage.py --window   # print a ready 50-list
"""

from __future__ import annotations

import json
import sys
from glob import glob
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from openmaptiles_zh_modifier_spark.registry import QUERIES

    repo = Path(__file__).resolve().parent.parent
    rounds: dict[str, int] = {}  # query -> latest round with a driver row
    red: dict[str, str] = {}
    for path in sorted(glob(str(repo / "CORRECTNESS_r*.json"))):
        rnum = int(Path(path).stem.split("_r")[1])
        for name, row in json.load(open(path)).items():
            rounds[name] = max(rounds.get(name, 0), rnum)
            ok = row.get("hash_match") or (
                row.get("err") is None and row.get("rows_match") and
                "hash_match" not in row
            )
            if rounds[name] == rnum:
                red[name] = "green" if ok else f"RED:{row.get('err') or 'mismatch'}"

    never = [q for q in QUERIES if q not in rounds]
    by_staleness = sorted(
        (q for q in QUERIES if q in rounds), key=lambda q: (rounds[q], q)
    )
    if "--window" in sys.argv:
        picks = (never + by_staleness)[:50]
        for q in picks:
            print(f'    "{q}",')
        return 0

    print(f"registry: {len(QUERIES)} queries; driver rows: {len(rounds)}")
    print(f"never driver-sampled: {len(never)}")
    for q in never:
        print(f"  [never] {q}")
    reds = [q for q, s in red.items() if s != "green"]
    print(f"latest-row red: {len(reds)}")
    for q in reds:
        print(f"  [red]   {q}: {red[q]}")
    stale = [q for q in by_staleness if q not in never][:15]
    print("stalest greens (next-window tail candidates):")
    for q in stale:
        print(f"  [r{rounds[q]:02d}]  {q}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
