"""Cross-round bench comparison with calibration normalization.

VERDICT r7 "what's wrong" #1: a uniform cross-round bench shift was
indistinguishable from a diffuse code regression because the
artifacts recorded nothing about the machine.  BENCH_LOCAL_r08+
records two fixed-cost calibrations (a single-core Python spin and a
cached-parquet scan) — this tool divides the raw per-query ratios by
the calibration ratio so machine drift cancels and what remains is
plan drift.

Usage:
    python scripts/bench_compare.py BENCH_LOCAL_r08.json BENCH_LOCAL_r09.json
"""

from __future__ import annotations

import json
import math
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def spin(rec: dict, prefix: str = "spin") -> float | None:
    h = rec.get("host") or {}
    xs = [h.get(f"{prefix}_sec_start"), h.get(f"{prefix}_sec_end")]
    xs = [x for x in xs if x]
    return sum(xs) / len(xs) if xs else None


def main() -> None:
    a, b = load(sys.argv[1]), load(sys.argv[2])
    qa, qb = a["queries"], b["queries"]
    shared = sorted(k for k in qa if k in qb and qa[k] > 0 and qb[k] > 0)
    raw = math.exp(sum(math.log(qb[k] / qa[k]) for k in shared) / len(shared))
    print(f"shared queries: {len(shared)}")
    print(f"raw geomean (B/A):        {raw:.3f}")
    # Prefer the PARALLEL spin (r9, VERDICT r8 "what's wrong" #1):
    # unlike the single-core spin it contends for every core, so a
    # co-tenant saturating other cores — which slows the 32-thread
    # Spark stages but not a lone spinner — moves it too.  Both
    # artifacts must carry it AND run the same gang width.
    pa, pb = spin(a, "pspin"), spin(b, "pspin")
    na = (a.get("host") or {}).get("pspin_procs")
    nb = (b.get("host") or {}).get("pspin_procs")
    sa, sb = spin(a), spin(b)
    if pa and pb and na == nb:
        cal = pb / pa
        print(f"pspin calibration (B/A):  {cal:.3f}  ({na} procs, preferred)")
        print(f"normalized geomean:       {raw / cal:.3f}  "
              "(machine + contention drift divided out)")
        if sa and sb:
            print(f"spin calibration (B/A):   {sb / sa:.3f}  "
                  "(single-core, for reference)")
    elif sa and sb:
        cal = sb / sa
        print(f"spin calibration (B/A):   {cal:.3f}")
        print(f"normalized geomean:       {raw / cal:.3f}  "
              "(machine drift divided out; no parallel spin in one "
              "artifact — contention not covered)")
    else:
        print("no calibration fields in one of the records "
              "(pre-r8 artifact) — raw ratio only")
    ha, hb = (a.get("host") or {}), (b.get("host") or {})
    if ha.get("scan_sec") and hb.get("scan_sec"):
        print(f"scan calibration (B/A):   {hb['scan_sec']/ha['scan_sec']:.3f}")
    # Stream-trigger overhead (r16, VERDICT r15 #8): the heavy
    # stream-lifecycle rows are dominated by trigger scheduling +
    # checkpoint commits, pure harness cost the pspin gang never
    # touches.  When both artifacts carry the per-trigger
    # calibration, report it and re-normalize the trigger-bound rows
    # (stream_*/auto_*/fold_* drives) by IT instead of pspin — what
    # remains on those rows is operator drift, not harness drift.
    oa, ob = spin(a, "stream_overhead"), spin(b, "stream_overhead")
    if oa and ob:
        so = ob / oa
        print(f"stream-trigger overhead (B/A): {so:.3f}  "
              f"({oa:.3f}s -> {ob:.3f}s per trigger)")
        trig = [k for k in shared
                if k.startswith(("stream_", "auto_", "fold_"))]
        if trig:
            traw = math.exp(
                sum(math.log(qb[k] / qa[k]) for k in trig) / len(trig)
            )
            print(f"trigger-bound rows ({len(trig)}): raw {traw:.3f}, "
                  f"overhead-normalized {traw / so:.3f}")
    ranked = sorted(shared, key=lambda k: qb[k] / qa[k])
    print("\nbiggest regressions (raw):")
    for k in ranked[-5:][::-1]:
        print(f"  {k}: {qa[k]:.3f} -> {qb[k]:.3f}  ({qb[k]/qa[k]:.2f}x)")
    print("biggest improvements (raw):")
    for k in ranked[:5]:
        print(f"  {k}: {qa[k]:.3f} -> {qb[k]:.3f}  ({qb[k]/qa[k]:.2f}x)")


if __name__ == "__main__":
    main()
