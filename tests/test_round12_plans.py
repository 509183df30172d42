"""Round-12 guards.

VERDICT r11 wrong #1: ``exact_ngram_clean`` hint-forced
``F.broadcast`` on its removal-positions frame, whose size is
proportional to the corpus's duplicate density — a driver OOM on the
high-duplication corpora the operator exists for.  The hint is gone;
pin that the operator (a) stays correct with broadcast joins disabled
entirely (the shuffle-join degradation path a 100 TB run takes), and
(b) no longer forces a broadcast when the planner is told not to.

Also pins the round-12 additions: the cleaned-TEXT emission's
hash-equals-payload contract, and the fold-lifecycle IVF dim guard.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdp_spark.datapipe import dedup as ddp
from cdp_spark.session import load_table

SF = "/root/testdata/sf0.001"


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_exact_ngram_clean_survives_broadcast_disabled(spark):
    """The removal-positions rejoin must degrade to a shuffle join
    when broadcasting is off (AQE decides; nothing is hint-forced) —
    and produce identical results."""
    docs = load_table(spark, SF, "documents")
    expected = _rows(ddp.exact_ngram_clean(docs, "doc_id", "text", k=20))
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": None,
        "spark.sql.adaptive.autoBroadcastJoinThreshold": None,
    }
    for key in confs:
        try:
            confs[key] = spark.conf.get(key)
        except Exception:
            confs[key] = None
        spark.conf.set(key, "-1")
    try:
        out = ddp.exact_ngram_clean(docs, "doc_id", "text", k=20)
        plan = _executed(out)
        assert "BroadcastHashJoin" not in plan, (
            "a join is still hint-forced to broadcast:\n" + plan[:2000]
        )
        assert "BroadcastNestedLoop" not in plan
        assert _rows(out) == expected
    finally:
        for key, old in confs.items():
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)


def test_exact_ngram_clean_text_hash_contract(spark):
    """emit_text=True: cleaned_text is the actual kept payload and
    cleaned_fp is its md5 per row; the stat columns are unchanged
    from the hash-only variant."""
    docs = load_table(spark, SF, "documents")
    txt = ddp.exact_ngram_clean(docs, "doc_id", "text", k=20, emit_text=True)
    assert txt.columns == [
        "doc_id", "n_tokens", "n_kept_tokens", "cleaned_text", "cleaned_fp",
    ]
    bad = txt.where(F.md5(F.col("cleaned_text")) != F.col("cleaned_fp"))
    assert bad.count() == 0
    # a cleaned doc's text really is shorter, a clean doc's unchanged
    assert txt.where(
        (F.col("n_kept_tokens") < F.col("n_tokens"))
        != (F.size(F.split(F.col("cleaned_text"), r"\s+"))
            < F.col("n_tokens"))
    ).where(F.col("n_kept_tokens") > 0).count() == 0
    assert _rows(txt.drop("cleaned_text")) == _rows(
        ddp.exact_ngram_clean(docs, "doc_id", "text", k=20)
    )


def test_clean_against_index_removes_all_indexed_grams(spark, tmp_path):
    """clean_against_exactngram_index: after the splice, NO k-gram of
    any cleaned document may remain in the index's seen set (the
    defining postcondition), untouched documents pass through
    verbatim, and n_tokens - n_kept_tokens accounting is consistent
    with the emitted text."""
    from cdp_spark.datapipe import dedup_index as di

    docs = load_table(spark, SF, "documents")
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    inc = docs.where(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    path = str(tmp_path / "eg")
    di.exactngram_index_write(corpus, path, k=20)
    dfc, meta = di.exactngram_index_load(spark, path)
    seen = di.exactngram_seen_index(dfc)
    out = di.clean_against_exactngram_index(
        inc, seen, meta, emit_text=True
    )
    # postcondition: the cleaned text's own 20-gram set is disjoint
    # from the index
    residue = (
        out.select(
            "doc_id",
            F.explode(
                ddp.ngram_fingerprints(F.col("cleaned_text"), 20)
            ).alias("fp"),
        )
        .join(seen, "fp")
        .count()
    )
    assert residue == 0
    # every non-empty increment doc keeps a row; clean docs unchanged
    n_inc = inc.where(F.size(ddp.tokens(F.col("text"))) > 0).count()
    assert out.count() == n_inc
    untouched = out.where(F.col("n_kept_tokens") == F.col("n_tokens"))
    joined = untouched.join(inc, "doc_id").where(
        F.col("cleaned_text") != F.array_join(ddp.tokens(F.col("text")), " ")
    )
    assert joined.count() == 0
    # accounting: kept count equals the emitted text's token count
    assert out.where(
        F.size(ddp.tokens(F.col("cleaned_text"))) != F.col("n_kept_tokens")
    ).where(F.col("n_kept_tokens") > 0).count() == 0


def test_ivf_index_topk_rejects_mismatched_dim(spark, tmp_path):
    """ADVICE r11: a query vector of the wrong dimensionality must
    fail fast, not silently probe a different anchor space."""
    import pytest

    from cdp_spark.datapipe import similarity as sim

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    path = str(tmp_path / "ivf")
    sim.ivf_index_init(path, dim=64, n_centroids=8, seed=7)
    sim.ivf_index_fold(emb, path, epoch=0)
    with pytest.raises(ValueError, match="dim"):
        sim.ivf_index_topk(spark, path, [1.0] * 32, k=5)
