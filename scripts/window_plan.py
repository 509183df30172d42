"""Emit the driver-window plan for a round — THE single source for
the `_R<N>_WINDOW` tuple, its comment counts, and the
`tests/test_oracle.py` guard (VERDICT r13 next #1: the deferral
counts were hand-written twice and wrong twice; this script computes
the list and the count from the same place as the staleness
histogram, so the three bookkeeping sites can never disagree again).

VERDICT r14 #1: plan() previously ignored its ``round_num`` and
globbed every ``CORRECTNESS_r*.json`` in the CWD, so the moment the
driver wrote the CURRENT round's artifact the emitted plan flipped to
the NEXT round's window and the pytest guard went red for the rest of
the round cycle.  Now the plan for round N is computed from hard rows
of rounds < N only (the state at round-N start, whether or not the
round-N artifact has landed yet), and the glob is anchored to the
repo root so the plan is CWD-independent.

Policy (unchanged since r11): the external driver gate checks the
FIRST 50 `queries()` entries only.  The window leads with the current
round's additions (queries with no hard driver row yet), then the
stalest cohorts by last-hard-row round, registry order within each
cohort, until 50.

Usage: python scripts/window_plan.py ROUND_NUMBER
Prints the histogram, the window as a Python tuple body, and the
cohort breakdown for the window comment.
"""

from __future__ import annotations

import glob
import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

WINDOW = 50


def last_hard_rows(round_num: int) -> dict[str, int]:
    """query -> round of its most recent hard driver-gate row, over
    artifacts from rounds BEFORE ``round_num`` only (the current
    round's own sweep must not count — it lands mid-round and would
    flip the plan under the guard's feet)."""
    last: dict[str, int] = {}
    for path in sorted(
        glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json"))
    ):
        base = os.path.basename(path)
        rnd = int(base[len("CORRECTNESS_r"):-len(".json")])
        if rnd >= round_num:
            continue
        with open(path) as f:
            for name in json.load(f):
                last[name] = max(last.get(name, 0), rnd)
    return last


def plan(round_num: int):
    import __spark_entry__ as entrymod

    registry = list(entrymod._all_queries())
    last = last_hard_rows(round_num)
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
    if len(sys.argv) < 2:
        raise SystemExit(
            "usage: python scripts/window_plan.py ROUND_NUMBER"
        )
    round_num = int(sys.argv[1])
    registry, last, window, breakdown = plan(round_num)
    import collections

    hist = collections.Counter(last.values())
    print(f"plan for round {round_num} (hard rows < r{round_num}):")
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
