"""Physical-plan shape guards added in round 11.

The exact n-gram operators price exactness as one gram row per token
position — acceptable at 100 TB ONLY while every downstream step
stays a hash join / hash aggregate over the 32-byte fingerprints.
Pin that: no cartesian or broadcast-nested-loop join may appear, the
gram frame must materialize exactly once (it feeds the count AND the
dup join), and the epoch-fold layout must not break the BM25 term
pushdown the round-10 guard pinned on the root layout.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from cdp_spark.datapipe import dedup as ddp
from cdp_spark.datapipe import dedup_index as di
from cdp_spark.session import load_table

SF = "/root/testdata/sf0.001"


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_exact_ngram_stats_plan_shape(spark):
    """exact_ngram_dup_stats: hash joins/aggregates only — a
    cartesian or BroadcastNestedLoop over per-token gram rows would
    be quadratic in corpus size; and exactly ONE scan of the
    checkpointed gram frame per consumer (the count and the join read
    the same RDD leaf, never re-explode the corpus)."""
    docs = load_table(spark, SF, "documents")
    out = ddp.exact_ngram_dup_stats(docs, "doc_id", "text", k=20)
    plan = _executed(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    # the dup join keys on the fingerprint hash
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)
    # the gram explode happened before the checkpoint: the executed
    # plan reads the checkpointed RDD leaves and contains NO Generate
    # (re-exploding the corpus per consumer would double the work)
    assert "Generate" not in plan, plan[:2000]
    assert plan.count("ExistingRDD") >= 2  # count + join consumers


def test_exactngram_flag_plan_shape(spark, tmp_path):
    """flag_against_exactngram_index: the seen-gram join must be a
    hash join on fp (never BNL/cartesian), keeping the flag job
    O(new tokens) regardless of index size."""
    docs = load_table(spark, SF, "documents")
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    inc = docs.where(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    path = str(tmp_path / "eg")
    di.exactngram_index_write(corpus, path, k=20)
    dfc, meta = di.exactngram_index_load(spark, path)
    flags = di.flag_against_exactngram_index(
        inc, di.exactngram_seen_index(dfc), meta
    )
    plan = _executed(flags)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)
    assert flags.count() > 0


def test_bm25_term_pushdown_survives_epoch_fold_layout(spark, tmp_path):
    """Round-10 pinned `term IN` reaching the tf/ and df/ scans on
    the ROOT layout; epoch folds move the data under fold=e<N>
    partition directories — pin that pushdown (a DATA-column filter)
    still reaches both scans there."""
    from cdp_spark.datapipe import retrieval_index as ri

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    path = str(tmp_path / "bm25")
    ri.bm25_index_init(path)
    ri.bm25_index_fold(docs.where(F.col("doc_id") % 2 == 0), path, epoch=0)
    ri.bm25_index_fold(docs.where(F.col("doc_id") % 2 == 1), path, epoch=1)
    out = ri.bm25_index_topk(spark, path, ["hash", "join"], k=5)
    plan = _executed(out)

    def _scan(schema_sig: str) -> str:
        frags = [f for f in plan.split("FileScan") if schema_sig in f]
        assert frags, f"no scan with schema {schema_sig!r}:\n{plan[:3000]}"
        return frags[0]

    def _pushed(frag: str) -> str:
        parts = frag.split("PushedFilters: [", 1)
        assert len(parts) == 2, f"scan has no PushedFilters:\n{frag[:800]}"
        return parts[1].split("]", 1)[0]

    tf_frag = _scan("struct<doc:bigint,term:string,tf:bigint>")
    assert re.search(r"In\(term, \[", _pushed(tf_frag))
    df_frag = _scan("struct<term:string,c:bigint>")
    assert re.search(r"In\(term, \[", _pushed(df_frag))
    # and the served result is identical to a root-layout build
    root = str(tmp_path / "bm25_root")
    ri.bm25_index_write(docs, root)
    assert [tuple(r) for r in out.collect()] == [
        tuple(r)
        for r in ri.bm25_index_topk(spark, root, ["hash", "join"], k=5).collect()
    ]
