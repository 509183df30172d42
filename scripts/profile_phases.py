"""Phase-level wall-clock breakdown of the heaviest bench queries —
mirrors each query body with timers between phases (same helpers, same
params) so the optimization targets the measured phase, not a guess.

Usage: python scripts/profile_phases.py [fold_mh|stream_hll|kw|ewma]...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entry
from cdp_spark.datapipe import dedup as ddp
from cdp_spark.session import get_spark, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class T:
    def __init__(self):
        self.t0 = time.perf_counter()
        self.last = self.t0

    def lap(self, label):
        now = time.perf_counter()
        print(f"  {label:45s} {now - self.last:7.3f}s")
        self.last = now

    def total(self, label="TOTAL"):
        print(f"  {label:45s} {time.perf_counter() - self.t0:7.3f}s")


def profile_fold_mh(spark):
    import tempfile
    from cdp_spark.datapipe import dedup_index as di

    print("== fold_incremental_dedup phases ==")
    t = T()
    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    inc1 = docs.where(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    inc2 = docs.where(F.col("doc_id") % 10 == 5).select("doc_id", "text")
    path = entry._fold_index_dir("cdp_prof_mh_")
    di.minhash_index_write(corpus, path, num_perm=32, n=3, hash_fn=ddp.md5_hash60)
    t.lap("index_write(corpus sigs->parquet)")
    idx, meta = di.minhash_index_load(spark, path)
    flagged1 = di.flag_against_minhash_index(inc1, idx, meta, threshold=0.5, bands=8)
    flagged1_ids = flagged1.select("doc_id")
    flagged1_ids.write.format("noop").mode("overwrite").save()
    t.lap("flag_inc1(batch)")
    di.minhash_index_fold(inc1, flagged1.select("doc_id"), path)
    t.lap("fold_inc1")
    idx2, meta2 = di.minhash_index_load(spark, path)
    src = tempfile.mkdtemp(prefix="cdp_prof_mh_src_")
    inc2.repartition(4).write.mode("overwrite").json(src)
    t.lap("stage_inc2(json write)")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out = di.flag_against_minhash_index(stream, idx2, meta2, threshold=0.5, bands=8)
    t.lap("stream_plan_build(incl iter_checkpoint)")
    mat = entry._drive_memory_stream(spark, out, "cdp_prof_mh_", src, output_mode="complete")
    t.lap("stream_4_microbatches")
    mat.count()
    t.lap("materialized_read")
    t.total()


def profile_stream_hll(spark):
    import tempfile
    from cdp_spark.datapipe import sketches as sk

    print("== stream_hll_users phases ==")
    t = T()
    ev = load_table(spark, SF_DIR, "events").select("user_id")
    src = tempfile.mkdtemp(prefix="cdp_prof_hll_src_")
    ev.repartition(4).write.mode("overwrite").json(src)
    t.lap("stage(json write)")
    stream = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    regs = sk.hll_registers(stream, "user_id", 8)
    table = entry._drive_memory_stream(spark, regs, "cdp_prof_hll_", src, "complete")
    t.lap("stream_4_microbatches")
    sk.hll_estimate_from_registers(table, 8).count()
    t.lap("estimate")
    t.total()


def profile_kw(spark):
    print("== stream_keyed_windows (whole query) ==")
    t = T()
    entry.q_stream_keyed_windows(spark, SF_DIR).count()
    t.total()


def profile_ewma(spark):
    print("== ewma_user_value phases ==")
    t = T()
    ev = (
        load_table(spark, SF_DIR, "events")
        .where(F.col("user_id").isNotNull() & F.col("value").isNotNull())
        .select("event_id", "user_id", "ts", "value")
    )
    n_users = ev.select("user_id").distinct().count()
    n = ev.count()
    t.lap(f"input({n} rows, {n_users} users)")
    from cdp_spark.datapipe import analytics as an

    out = an.ewma(ev, "user_id", ["ts", "event_id"], "value", alpha=0.5)
    out.write.format("noop").mode("overwrite").save()
    t.lap("ewma(applyInPandas)")
    t.total()


PROFILES = {
    "fold_mh": profile_fold_mh,
    "stream_hll": profile_stream_hll,
    "kw": profile_kw,
    "ewma": profile_ewma,
}


def main():
    spark = get_spark("profile_phases")
    for tname in ("documents", "events"):
        load_table(spark, SF_DIR, tname).cache().count()
    names = sys.argv[1:] or list(PROFILES)
    for name in names:
        PROFILES[name](spark)
    spark.stop()


if __name__ == "__main__":
    main()
