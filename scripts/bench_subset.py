"""Targeted re-bench of named queries with bench.py's methodology
(same session confs, warmup cache, pass-major, median of 3 timed
count()s): ``python scripts/bench_subset.py name1 name2 ...``.
Prints one line per query; for comparing touched rows between full
bench runs, not a replacement for bench.py.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from cdp_spark.session import get_spark, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    spark = get_spark("cdp_spark_bench_subset")
    for t in ("lineitem", "orders", "customer", "part", "events",
              "documents", "embeddings"):
        load_table(spark, SF_DIR, t).cache().count()
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        for name in names:
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).count()
            samples[name].append(time.perf_counter() - t0)
    for name in names:
        s = samples[name]
        med = sorted(s)[len(s) // 2]
        print(f"{name:36s} median {med:7.3f}s of {[round(x, 3) for x in s]}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
