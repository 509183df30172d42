"""One-query bisect probe (VERDICT r13 next #2/#5): run a single
registered query N times in one bare session at a given SF, print the
per-rep wall times, median, and the host calibrations bench.py uses
(single-core spin, all-core parallel spin, cached-parquet scan), as
ONE JSON line.  Run it on two commits on the same day to separate
code movement from host drift.

Usage: python scripts/bisect_query.py <query> [reps] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    import bench
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"bisect_{name}")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "query": name,
        "sf_dir": sf_dir,
        "commit": os.popen("git rev-parse --short HEAD").read().strip(),
        "spin_sec": round(bench._spin_calibration(), 3),
        "pspin_sec": round(bench._parallel_spin_calibration(), 3),
    }
    fn = entrymod._all_queries()[name]
    times = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn(spark, sf_dir).collect()
        times.append(round(time.monotonic() - t0, 3))
    out["scan_sec"] = round(bench._scan_calibration(spark, sf_dir), 3)
    out["reps"] = times
    out["median_sec"] = round(statistics.median(times), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
