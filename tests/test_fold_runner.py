"""Automated fold lifecycle (VERDICT r9 next-round #2).

The contract: a stream driven through ``IncrementFoldRunner`` with
automatic fold triggers must produce, per increment, flags identical
to the hand-driven fold-then-flag sequence — which is itself oracled
equal to flag-against-rebuilt-corpus (tests/test_dedup_index.py and
the fold_incremental_dedup driver row).  Two full automatic cycles,
both index kinds."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdp_spark.datapipe import dedup as ddp
from cdp_spark.datapipe import dedup_index as di
from cdp_spark.session import load_table
from cdp_spark.streaming.analytics import reduce_substring_flags
from cdp_spark.streaming.fold_runner import IncrementFoldRunner

SF = "/root/testdata/sf0.001"


def _roles(spark):
    docs = load_table(spark, SF, "documents")
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    inc1 = docs.where(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    inc2 = docs.where(F.col("doc_id") % 10 == 5).select("doc_id", "text")
    return corpus, inc1, inc2


def _run_two_increments(spark, tmp_path, runner_path, kind_writer):
    """Drive inc1 then inc2 through the runner as two availableNow
    passes over a shared source dir + checkpoint: each increment is 2
    json files = 2 micro-batches, fold_every_batches=2 fires the fold
    automatically at each increment's last batch."""
    corpus, inc1, inc2 = _roles(spark)
    kind_writer(corpus, runner_path)

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    work = str(tmp_path / "work")
    inc1.repartition(2).write.mode("append").json(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    runner = IncrementFoldRunner(
        stream,
        runner_path,
        work,
        threshold=0.5,
        bands=8,
        fold_every_batches=2,
    )
    q = runner.start(checkpoint_dir=ckpt, available_now=True)
    q.awaitTermination(120)
    assert runner.folds_done == 1 and runner.cycle == 1

    inc2.repartition(2).write.mode("append").json(src)
    q = runner.start(checkpoint_dir=ckpt, available_now=True)
    q.awaitTermination(120)
    assert runner.folds_done == 2 and runner.cycle == 2
    return runner, corpus, inc1, inc2


def test_minhash_auto_fold_two_cycles_match_hand_driven(spark, tmp_path):
    runner_path = str(tmp_path / "mh")

    def writer(corpus, path):
        di.minhash_index_write(
            corpus, path, num_perm=32, n=3, hash_fn=ddp.md5_hash60
        )

    runner, corpus, inc1, inc2 = _run_two_increments(
        spark, tmp_path, runner_path, writer
    )

    # hand-driven replay on a fresh index copy
    hand = str(tmp_path / "mh_hand")
    writer(corpus, hand)
    idx, meta = di.minhash_index_load(spark, hand)
    f1 = di.flag_against_minhash_index(
        inc1, idx, meta, threshold=0.5, bands=8
    )
    expected1 = {tuple(r) for r in f1.collect()}
    di.minhash_index_fold(inc1, f1.select("doc_id"), hand)
    idx2, meta2 = di.minhash_index_load(spark, hand)
    expected2 = {
        tuple(r)
        for r in di.flag_against_minhash_index(
            inc2, idx2, meta2, threshold=0.5, bands=8
        ).collect()
    }

    flags = runner.flags()
    got1 = {
        tuple(r)
        for r in flags.where(F.col("inc") == 0)
        .select("doc_id", "dup_of", "jaccard")
        .collect()
    }
    got2 = {
        tuple(r)
        for r in flags.where(F.col("inc") == 1)
        .select("doc_id", "dup_of", "jaccard")
        .collect()
    }
    assert got1 == expected1 and expected1, "cycle-1 flags drifted"
    assert got2 == expected2 and expected2, "cycle-2 flags drifted"
    # the runner's folded index equals the hand-driven one row-for-row
    ridx, _ = di.minhash_index_load(spark, runner_path)
    hidx, _ = di.minhash_index_load(spark, hand)
    # (hand index lacks inc2's fold; fold it for the comparison)
    di.minhash_index_fold(
        inc2,
        spark.createDataFrame(
            [(i,) for (i, *_rest) in expected2], "doc_id long"
        ),
        hand,
    )
    hidx2, _ = di.minhash_index_load(spark, hand)
    assert ridx.count() == hidx2.count()
    assert {r["id"] for r in ridx.select("id").collect()} == {
        r["id"] for r in hidx2.select("id").collect()
    }


def test_substring_auto_fold_two_cycles_match_hand_driven(spark, tmp_path):
    runner_path = str(tmp_path / "ss")

    def writer(corpus, path):
        di.substring_index_write(
            corpus, path, k=30, w=12, max_df=50, hash_fn=ddp.md5_hash60
        )

    runner, corpus, inc1, inc2 = _run_two_increments(
        spark, tmp_path, runner_path, writer
    )

    hand = str(tmp_path / "ss_hand")
    writer(corpus, hand)
    fps, dfc, meta = di.substring_index_load(spark, hand)
    cands1 = di.flag_against_substring_index(inc1, fps, dfc, meta)
    expected1 = {
        tuple(r) for r in reduce_substring_flags(cands1).collect()
    }
    di.substring_index_fold(
        inc1, cands1.select("id").distinct(), hand
    )
    fps2, dfc2, meta2 = di.substring_index_load(spark, hand)
    expected2 = {
        tuple(r)
        for r in reduce_substring_flags(
            di.flag_against_substring_index(inc2, fps2, dfc2, meta2)
        ).collect()
    }

    flags = runner.flags()
    got1 = {
        tuple(r)
        for r in flags.where(F.col("inc") == 0)
        .select("doc_id", "dup_of", "n_shared")
        .collect()
    }
    got2 = {
        tuple(r)
        for r in flags.where(F.col("inc") == 1)
        .select("doc_id", "dup_of", "n_shared")
        .collect()
    }
    assert got1 == expected1 and expected1, "cycle-1 flags drifted"
    assert got2 == expected2 and expected2, "cycle-2 flags drifted"


def test_bm25_stream_ingest_equals_from_scratch(spark, tmp_path):
    """run_bm25_ingest_stream: per-batch folds into an empty
    initialized index compose to exactly the from-scratch corpus
    statistics — served top-k is bit-identical to a one-shot build
    AND the scan-computed bm25_topk, regardless of batch boundaries."""
    from cdp_spark.datapipe import retrieval_index as ri
    from cdp_spark.datapipe.analytics import bm25_topk
    from cdp_spark.streaming.fold_runner import run_bm25_ingest_stream

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    terms = ["hash", "join", "stream", "vector"]

    path = str(tmp_path / "bm25")
    ri.bm25_index_init(path)
    src = str(tmp_path / "src")
    docs.repartition(4).write.mode("overwrite").json(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = run_bm25_ingest_stream(
        stream, path, checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    assert q.awaitTermination(120)

    streamed = [
        tuple(r) for r in ri.bm25_index_topk(spark, path, terms, k=20).collect()
    ]
    rebuilt_path = str(tmp_path / "bm25_rebuilt")
    ri.bm25_index_write(docs, rebuilt_path)
    rebuilt = [
        tuple(r)
        for r in ri.bm25_index_topk(spark, rebuilt_path, terms, k=20).collect()
    ]
    scanned = [
        tuple(r)
        for r in bm25_topk(
            load_table(spark, SF, "documents"), terms, k=20
        ).collect()
    ]
    assert streamed == rebuilt == scanned
    assert streamed


def test_bm25_ingest_rejects_wrong_kind(spark, tmp_path):
    from cdp_spark.streaming.fold_runner import run_bm25_ingest_stream
    import pytest

    corpus, _, _ = _roles(spark)
    path = str(tmp_path / "mh")
    di.minhash_index_write(corpus.limit(10), path, hash_fn=ddp.md5_hash60)
    src = tmp_path / "emptysrc"
    src.mkdir()
    stream = spark.readStream.schema("doc_id long, text string").json(
        str(src)
    )
    with pytest.raises(ValueError, match="bm25"):
        run_bm25_ingest_stream(stream, path)


def test_explicit_fold_signal_and_empty_flags_schema(spark, tmp_path):
    """request_fold() folds at the next batch boundary even without a
    count trigger, and flags() is empty-but-typed before anything is
    flagged."""
    corpus, inc1, _ = _roles(spark)
    path = str(tmp_path / "mh")
    di.minhash_index_write(
        corpus, path, num_perm=32, n=3, hash_fn=ddp.md5_hash60
    )
    src = str(tmp_path / "src")
    inc1.repartition(1).write.mode("append").json(src)
    stream = spark.readStream.schema("doc_id long, text string").json(src)
    runner = IncrementFoldRunner(stream, path, str(tmp_path / "work"))
    # pre-stream: typed empty frame
    empty = runner.flags()
    assert empty.count() == 0
    assert set(empty.columns) >= {"doc_id", "dup_of", "jaccard"}
    runner.request_fold()
    q = runner.start(
        checkpoint_dir=str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)
    assert runner.folds_done == 1
    # the fold grew the index by inc1's survivors
    idx, _ = di.minhash_index_load(spark, path)
    n_flagged = runner.flags().count()
    n_inc1 = inc1.filter(F.size(ddp.tokens(F.col("text"))) > 0).count()
    n_corpus = corpus.filter(
        F.size(ddp.tokens(F.col("text"))) > 0
    ).count()
    assert idx.count() == n_corpus + n_inc1 - n_flagged
    assert os.path.isdir(os.path.join(str(tmp_path / "work"), "flags"))


def test_simhash_auto_fold_two_cycles_match_hand_driven(spark, tmp_path):
    """r16 (VERDICT r15 next #4): the SimHash index joins the
    automated fold lifecycle — two auto-folded cycles must equal the
    hand-driven fold-then-flag sequence (itself oracled equal to
    flag-vs-rebuilt in the fold_simhash_dedup driver row), and the
    runner's folded index must hold exactly corpus ∪ survivors."""
    runner_path = str(tmp_path / "sh")

    def writer(corpus, path):
        di.simhash_index_write(
            corpus, path, bits=60, hash_fn=ddp.md5_hash60
        )

    runner, corpus, inc1, inc2 = _run_two_increments(
        spark, tmp_path, runner_path, writer
    )

    hand = str(tmp_path / "sh_hand")
    writer(corpus, hand)
    idx, meta = di.simhash_index_load(spark, hand)
    f1 = di.flag_against_simhash_index(
        inc1, idx, meta, max_hamming=5, n_chunks=6
    )
    expected1 = {tuple(r) for r in f1.collect()}
    di.simhash_index_fold(inc1, f1.select("doc_id"), hand)
    idx2, meta2 = di.simhash_index_load(spark, hand)
    expected2 = {
        tuple(r)
        for r in di.flag_against_simhash_index(
            inc2, idx2, meta2, max_hamming=5, n_chunks=6
        ).collect()
    }

    flags = runner.flags()
    got1 = {
        tuple(r)
        for r in flags.where(F.col("inc") == 0)
        .select("doc_id", "dup_of", "hamming")
        .collect()
    }
    got2 = {
        tuple(r)
        for r in flags.where(F.col("inc") == 1)
        .select("doc_id", "dup_of", "hamming")
        .collect()
    }
    assert got1 == expected1 and expected1, "cycle-1 flags drifted"
    assert got2 == expected2 and expected2, "cycle-2 flags drifted"
    di.simhash_index_fold(
        inc2,
        spark.createDataFrame(
            [(i,) for (i, *_rest) in expected2], "doc_id long"
        ),
        hand,
    )
    ridx, _ = di.simhash_index_load(spark, runner_path)
    hidx2, _ = di.simhash_index_load(spark, hand)
    assert sorted(tuple(r) for r in ridx.collect()) == sorted(
        tuple(r) for r in hidx2.collect()
    )
