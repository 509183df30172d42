"""Persisted dedup indexes + the incremental FOLD (VERDICT r8 #3).

The contract under test: *fold-then-flag == flag-against-rebuilt-
corpus*.  Flagging increment 2 against an index that absorbed
increment 1's survivors via ``fold`` must be bit-identical to
flagging it against an index built from scratch over
corpus ∪ survivors — the property that lets a long-running
incremental-dedup stream reset its state after every fold without
changing any answer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdp_spark.datapipe import dedup as ddp
from cdp_spark.datapipe import dedup_index as di
from cdp_spark.session import load_table
from cdp_spark.streaming.analytics import reduce_substring_flags

SF = "/root/testdata/sf0.001"


def _roles(spark):
    docs = load_table(spark, SF, "documents")
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    inc1 = docs.where(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    inc2 = docs.where(F.col("doc_id") % 10 == 5).select("doc_id", "text")
    return corpus, inc1, inc2


def test_minhash_fold_equals_rebuild(spark, tmp_path):
    corpus, inc1, inc2 = _roles(spark)
    path = str(tmp_path / "mh")
    di.minhash_index_write(
        corpus, path, num_perm=32, n=3, hash_fn=ddp.md5_hash60
    )
    idx, meta = di.minhash_index_load(spark, path)
    flagged1 = di.flag_against_minhash_index(
        inc1, idx, meta, threshold=0.5, bands=8
    )
    di.minhash_index_fold(inc1, flagged1.select("doc_id"), path)
    idx2, meta2 = di.minhash_index_load(spark, path)
    folded = {
        tuple(r)
        for r in di.flag_against_minhash_index(
            inc2, idx2, meta2, threshold=0.5, bands=8
        ).collect()
    }

    # rebuild from scratch: corpus ∪ survivors(inc1)
    survivors = inc1.join(
        flagged1.select(F.col("doc_id").alias("_f")),
        inc1["doc_id"] == F.col("_f"),
        "left_anti",
    )
    rebuilt_path = str(tmp_path / "mh_rebuilt")
    di.minhash_index_write(
        corpus.select("doc_id", "text").unionByName(survivors),
        rebuilt_path,
        num_perm=32,
        n=3,
        hash_fn=ddp.md5_hash60,
    )
    ridx, rmeta = di.minhash_index_load(spark, rebuilt_path)
    rebuilt = {
        tuple(r)
        for r in di.flag_against_minhash_index(
            inc2, ridx, rmeta, threshold=0.5, bands=8
        ).collect()
    }
    assert folded == rebuilt
    assert folded, "fixture should flag at least one inc2 doc"
    # the fold actually grew the index by the survivor count
    n_surv = survivors.filter(
        F.size(ddp.tokens(F.col("text"))) > 0
    ).count()
    assert idx2.count() == idx.count() + n_surv


def test_simhash_fold_equals_rebuild_and_bruteforce(spark, tmp_path):
    """The SimHash-index fold contract, PLUS the banding guarantee in
    one test: fold-then-flag equals flag-against-rebuilt-corpus, and
    both equal brute-force hamming <= k against corpus ∪ survivors
    (the Manku chunks are a lossless candidate generator)."""
    corpus, inc1, inc2 = _roles(spark)
    path = str(tmp_path / "sh")
    di.simhash_index_write(corpus, path, bits=60, hash_fn=ddp.md5_hash60)
    idx, meta = di.simhash_index_load(spark, path)
    flagged1 = di.flag_against_simhash_index(
        inc1, idx, meta, max_hamming=5, n_chunks=6
    )
    di.simhash_index_fold(inc1, flagged1.select("doc_id"), path)
    idx2, meta2 = di.simhash_index_load(spark, path)
    folded = {
        tuple(r)
        for r in di.flag_against_simhash_index(
            inc2, idx2, meta2, max_hamming=5, n_chunks=6
        ).collect()
    }

    survivors = inc1.join(
        flagged1.select(F.col("doc_id").alias("_f")),
        inc1["doc_id"] == F.col("_f"),
        "left_anti",
    )
    rebuilt_path = str(tmp_path / "sh_rebuilt")
    di.simhash_index_write(
        corpus.select("doc_id", "text").unionByName(survivors),
        rebuilt_path, bits=60, hash_fn=ddp.md5_hash60,
    )
    ridx, rmeta = di.simhash_index_load(spark, rebuilt_path)
    rebuilt = {
        tuple(r)
        for r in di.flag_against_simhash_index(
            inc2, ridx, rmeta, max_hamming=5, n_chunks=6
        ).collect()
    }
    assert folded == rebuilt
    assert folded, "fixture should flag at least one inc2 doc"

    # brute force against the rebuilt index frame: closest partner
    # per new doc at hamming <= 5, ties to the lowest corpus id
    new_fp = di._fingerprint_frame(inc2, "doc_id", "text", ddp.md5_hash60)
    brute = (
        new_fp.crossJoin(
            ridx.select(F.col("id").alias("_o"), F.col("s").alias("_os"))
        )
        .withColumn("hamming", ddp.hamming64(F.col("s"), F.col("_os")))
        .filter(F.col("hamming") <= 5)
    )
    best = {}
    for r in brute.collect():
        k = r["id"]
        v = (r["hamming"], r["_o"])
        if k not in best or v < best[k]:
            best[k] = v
    assert folded == {(k, o, h) for k, (h, o) in best.items()}

    # epoch idempotence: replaying a committed fold is a no-op.  The
    # flagged ids are materialized first — an epoch fold migrates the
    # index to the fold= layout, so a LAZY flag frame still scanning
    # the pre-migration files would fail mid-write (the runner always
    # passes concrete per-batch ids, never a plan over the index).
    flagged_rows = [
        (r["doc_id"],) for r in flagged1.select("doc_id").collect()
    ]
    flagged_df = spark.createDataFrame(flagged_rows, "doc_id long")
    n_before = di.simhash_index_load(spark, path)[0].count()
    di.simhash_index_fold(inc1, flagged_df, path, epoch=7, lineage="s")
    n_mid = di.simhash_index_load(spark, path)[0].count()
    di.simhash_index_fold(inc1, flagged_df, path, epoch=7, lineage="s")
    assert di.simhash_index_load(spark, path)[0].count() == n_mid > n_before


def test_substring_fold_equals_rebuild(spark, tmp_path):
    corpus, inc1, inc2 = _roles(spark)
    path = str(tmp_path / "ss")
    di.substring_index_write(
        corpus, path, k=30, w=12, max_df=50, hash_fn=ddp.md5_hash60
    )
    fps, dfc, meta = di.substring_index_load(spark, path)
    flagged1 = (
        di.flag_against_substring_index(inc1, fps, dfc, meta)
        .select("id")
        .distinct()
    )
    di.substring_index_fold(inc1, flagged1, path)
    fps2, dfc2, meta2 = di.substring_index_load(spark, path)
    folded = {
        tuple(r)
        for r in reduce_substring_flags(
            di.flag_against_substring_index(inc2, fps2, dfc2, meta2)
        ).collect()
    }

    survivors = inc1.join(
        flagged1.select(F.col("id").alias("_f")),
        inc1["doc_id"] == F.col("_f"),
        "left_anti",
    )
    rebuilt_path = str(tmp_path / "ss_rebuilt")
    di.substring_index_write(
        corpus.select("doc_id", "text").unionByName(survivors),
        rebuilt_path,
        k=30,
        w=12,
        max_df=50,
        hash_fn=ddp.md5_hash60,
    )
    rfps, rdfc, rmeta = di.substring_index_load(spark, rebuilt_path)
    rebuilt = {
        tuple(r)
        for r in reduce_substring_flags(
            di.flag_against_substring_index(inc2, rfps, rdfc, rmeta)
        ).collect()
    }
    assert folded == rebuilt
    assert folded, "fixture should flag at least one inc2 doc"
    # folded df equals the rebuilt corpus-wide document frequency
    folded_df = {(r["fp"], r["df"]) for r in dfc2.collect()}
    rebuilt_df = {(r["fp"], r["df"]) for r in rdfc.collect()}
    assert folded_df == rebuilt_df


def test_index_meta_validation(spark, tmp_path):
    corpus, _, _ = _roles(spark)
    path = str(tmp_path / "mh")
    di.minhash_index_write(
        corpus.limit(20), path, num_perm=32, n=3, hash_fn=ddp.md5_hash60
    )
    # kind mismatch is loud
    with pytest.raises(ValueError, match="kind"):
        di.substring_index_load(spark, path)
    # unnamed hash callables cannot be recorded -> loud
    with pytest.raises(ValueError, match="named hashes"):
        di.minhash_index_write(
            corpus.limit(5),
            str(tmp_path / "bad"),
            hash_fn=lambda c: F.lit(0),
        )


def test_fold_joins_string_ids_on_natural_type(spark, tmp_path):
    """ADVICE r9 (medium): the fold used to cast flagged ids to long,
    so string ids nulled out, the anti-join matched nothing, and every
    flagged duplicate was silently folded in.  With natural-type joins
    a string-id corpus folds exactly its survivors."""
    rows = [
        ("doc-a", "alpha beta gamma delta epsilon zeta eta theta"),
        ("doc-b", "alpha beta gamma delta epsilon zeta eta theta"),
        ("doc-c", "one two three four five six seven eight nine ten"),
    ]
    inc = spark.createDataFrame(rows, ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [("doc-z", "alpha beta gamma delta epsilon zeta eta theta")],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "mh_str")
    di.minhash_index_write(corpus, path, hash_fn=ddp.md5_hash60)
    idx, meta = di.minhash_index_load(spark, path)
    flagged = di.flag_against_minhash_index(
        inc, idx, meta, threshold=0.5, bands=8
    )
    flagged_ids = {r["doc_id"] for r in flagged.collect()}
    assert flagged_ids == {"doc-a", "doc-b"}
    di.minhash_index_fold(inc, flagged.select("doc_id"), path)
    idx2, _ = di.minhash_index_load(spark, path)
    assert {r["id"] for r in idx2.select("id").collect()} == {
        "doc-z",
        "doc-c",
    }


def test_fold_rejects_uncastable_flagged_ids(spark, tmp_path):
    """When flagged ids MUST be cast (type mismatch) and the cast
    nulls a non-null id, the fold refuses instead of silently folding
    flagged duplicates."""
    corpus, inc1, _ = _roles(spark)
    path = str(tmp_path / "mh")
    di.minhash_index_write(corpus.limit(20), path, hash_fn=ddp.md5_hash60)
    bogus = spark.createDataFrame([("not-a-number",)], ["doc_id"])
    with pytest.raises(ValueError, match="does not cast"):
        di.minhash_index_fold(inc1, bogus, path)


def test_flag_rejects_nondivisible_bands(spark, tmp_path):
    """ADVICE r9: num_perm % bands != 0 used to band only a prefix of
    the signature, silently cutting recall."""
    corpus, inc1, _ = _roles(spark)
    path = str(tmp_path / "mh")
    di.minhash_index_write(
        corpus.limit(20), path, num_perm=32, hash_fn=ddp.md5_hash60
    )
    idx, meta = di.minhash_index_load(spark, path)
    with pytest.raises(ValueError, match="does not divide"):
        di.flag_against_minhash_index(inc1, idx, meta, bands=5)


def test_bm25_index_fold_equals_rebuild(spark, tmp_path):
    """The retrieval twin: a folded BM25 index serves scores
    bit-identical to (a) a from-scratch index over the full corpus
    and (b) the scan-computed bm25_topk."""
    from cdp_spark.datapipe import retrieval_index as ri
    from cdp_spark.datapipe.analytics import bm25_topk

    docs = load_table(spark, SF, "documents")
    terms = ["hash", "join", "stream", "vector"]

    path = str(tmp_path / "bm25")
    ri.bm25_index_write(docs.where(F.col("doc_id") % 5 != 0), path)
    ri.bm25_index_fold(docs.where(F.col("doc_id") % 5 == 0), path)
    folded = [tuple(r) for r in ri.bm25_index_topk(spark, path, terms, k=20).collect()]

    rebuilt_path = str(tmp_path / "bm25_rebuilt")
    ri.bm25_index_write(docs, rebuilt_path)
    rebuilt = [tuple(r) for r in ri.bm25_index_topk(spark, rebuilt_path, terms, k=20).collect()]

    scanned = [tuple(r) for r in bm25_topk(docs, terms, k=20).collect()]
    assert folded == rebuilt == scanned
    assert folded, "fixture should rank at least one document"


def test_bm25_index_fold_rejects_wrong_kind(spark, tmp_path):
    import pytest as _pytest
    from cdp_spark.datapipe import retrieval_index as ri

    corpus, _, _ = _roles(spark)
    path = str(tmp_path / "mh")
    di.minhash_index_write(corpus.limit(10), path, hash_fn=ddp.md5_hash60)
    with _pytest.raises(ValueError, match="bm25"):
        ri.bm25_index_fold(corpus.limit(5), path)
