"""Emit the driver-window plan for a round — THE single source for
the `_R<N>_WINDOW` tuple, its comment counts, and the
`tests/test_oracle.py` guard (VERDICT r13 next #1: the deferral
counts were hand-written twice and wrong twice; this script computes
the list and the count from the same place as the staleness
histogram, so the three bookkeeping sites can never disagree again).

Policy (unchanged since r11): the external driver gate checks the
FIRST 50 `queries()` entries only.  The window leads with the current
round's additions (queries with no hard driver row yet), then the
stalest cohorts by last-hard-row round, registry order within each
cohort, until 50.

Usage: python scripts/window_plan.py [round_number]
Prints the histogram, the window as a Python tuple body, and the
cohort breakdown for the window comment.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def last_hard_rows() -> dict[str, int]:
    """query -> round of its most recent hard driver-gate row."""
    last: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(path[len("CORRECTNESS_r"):-len(".json")])
        with open(path) as f:
            for name in json.load(f):
                last[name] = max(last.get(name, 0), rnd)
    return last


def plan(round_num: int | None = None):
    import __spark_entry__ as entrymod

    registry = list(entrymod._all_queries())
    last = last_hard_rows()
    additions = [q for q in registry if q not in last]
    cohorts: dict[int, list[str]] = {}
    for q in registry:
        if q in last:
            cohorts.setdefault(last[q], []).append(q)
    window: list[str] = list(additions)
    breakdown: list[tuple[str, int]] = [("additions", len(additions))]
    for rnd in sorted(cohorts):
        take = cohorts[rnd][: WINDOW - len(window)]
        if not take:
            break
        window.extend(take)
        breakdown.append((f"last hard row r{rnd:02d}", len(take)))
        if len(window) >= WINDOW:
            break
    return registry, last, window[:WINDOW], breakdown


def main() -> None:
    registry, last, window, breakdown = plan()
    import collections

    hist = collections.Counter(last.values())
    print("staleness histogram (last hard row -> #queries):")
    for rnd in sorted(hist):
        print(f"  r{rnd:02d}: {hist[rnd]}")
    unchecked = [q for q in registry if q not in last]
    print(f"  never:  {len(unchecked)}  {unchecked}")
    print(f"\nwindow ({len(window)}):")
    for kind, n in breakdown:
        print(f"  {kind}: {n}")
    print("\n_WINDOW tuple body:")
    for name in window:
        print(f'    "{name}",')


if __name__ == "__main__":
    main()
