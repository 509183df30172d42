"""Capture .explain("formatted") output for declared queries:
``python scripts/capture_plans.py <suffix> name1 name2 ...`` writes
``plans/$CDP_PLANS_ROUND (default r17)/<name>_<suffix>.txt`` for each query (suffix = before/after).

Streaming/lifecycle queries execute their side-effect phases while the
frame is being built (the returned frame is a materialized memory-sink
table); their capture is the final frame's plan, which is honest but
trivial — the interesting phases for those are documented in
OPTIMIZATION_r16.md instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from cdp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("CDP_PLANS_ROUND", "r17")
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("cdp_spark_plans")
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
