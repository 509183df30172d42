"""Curation ops: decontamination, chunking, repetition stats, PII.

Cross-engine parity for these lives in test_oracle (they are oracled
driver queries); these tests pin the operator-level semantics on
hand-built rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdp_spark.datapipe import curate


def test_word_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([("a b",), ("a b c d",)], ["text"])
    out = df.select(curate.word_ngrams(F.col("text"), 3).alias("g")).collect()
    assert out[0].g == []
    assert out[1].g == ["a b c", "b c d"]


def test_decontaminate_flags_overlap(spark):
    train = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5"), (2, "x1 x2 x3 x4 x5")], ["id", "text"]
    )
    eval_set = spark.createDataFrame([(9, "zz w1 w2 w3 yy")], ["id", "text"])
    out = curate.decontaminate(train, eval_set, "id", "text", n=3).collect()
    assert [(r.id, r.n_shared) for r in out] == [(1, 1)]


def test_contamination_score_fractions(spark):
    # doc 1: grams {w1 w2 w3, w2 w3 w4, w3 w4 w5}; eval shares only
    # "w1 w2 w3" -> 1/3.  doc 2 shares nothing -> 0.0 but still rows.
    train = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5"), (2, "x1 x2 x3 x4 x5")], ["id", "text"]
    )
    eval_set = spark.createDataFrame([(9, "zz w1 w2 w3 yy")], ["id", "text"])
    out = {
        r.id: r
        for r in curate.contamination_score(
            train, eval_set, "id", "text", n=3
        ).collect()
    }
    assert out[1].n_grams == 3 and out[1].n_shared == 1
    assert out[1].contamination == pytest.approx(1 / 3, abs=1e-6)
    assert out[2].n_grams == 3 and out[2].n_shared == 0
    assert out[2].contamination == 0.0


def test_token_kl_drift_orders_by_skew(spark):
    from cdp_spark.datapipe.text import token_kl_drift

    # pooled corpus is uniform (a8 b8); group "balanced" mirrors it
    # exactly (KL 0 under add-one smoothing), the two skewed groups
    # drift symmetrically and must score strictly higher.
    rows = [
        ("a_heavy", "a a a b"),
        ("b_heavy", "a b b b"),
        ("balanced", "a a b b a a b b"),
    ]
    df = spark.createDataFrame(rows, ["source", "text"])
    out = {r.source: r.kl for r in token_kl_drift(df, top_v=10).collect()}
    assert out["balanced"] == pytest.approx(0.0, abs=1e-6)
    assert out["a_heavy"] > out["balanced"]
    assert out["b_heavy"] > out["balanced"]


def test_chunk_by_tokens_sizes_and_anchors(spark):
    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, "solo")], ["id", "text"])
    rows = sorted(
        curate.chunk_by_tokens(df, "id", "text", budget=4).collect(),
        key=lambda r: (r.id, r.chunk_id),
    )
    got = [(r.id, r.chunk_id, r.n_tokens, r.anchor) for r in rows]
    assert got == [
        (1, 0, 4, "t0"),
        (1, 1, 4, "t4"),
        (1, 2, 2, "t8"),
        (2, 0, 1, "solo"),
    ]


def test_repetition_stats_values(spark):
    df = spark.createDataFrame([("a a a b",), ("a b c d",)], ["text"])
    out = df.select(curate.repetition_stats(F.col("text")).alias("r")).collect()
    assert out[0].r.dup_word_frac == pytest.approx(0.5)
    assert out[0].r.top_word_frac == pytest.approx(0.75)
    assert out[1].r.dup_word_frac == 0.0
    assert out[1].r.top_word_frac == 0.25


def test_pack_greedy_bins(spark):
    rows = [
        ("s1", 1, 100),
        ("s1", 2, 300),   # 100+300=400 <= 512 → bin 0
        ("s1", 3, 200),   # 400+200 > 512 → bin 1
        ("s1", 4, 600),   # oversize → own bin 2
        ("s1", 5, 10),    # 600+10 > 512 → bin 3
        ("s2", 1, 512),   # fresh group → bin 0
        ("s2", 2, 1),     # 512+1 > 512 → bin 1
    ]
    df = spark.createDataFrame(rows, ["source", "doc_id", "w"])
    out = curate.pack_greedy(df, "w", 512, ["source"], "doc_id")
    got = {(r.source, r.doc_id): r.bin for r in out.collect()}
    assert got == {
        ("s1", 1): 0, ("s1", 2): 0, ("s1", 3): 1, ("s1", 4): 2, ("s1", 5): 3,
        ("s2", 1): 0, ("s2", 2): 1,
    }


def test_redact_pii_and_counts(spark):
    df = spark.createDataFrame(
        [("mail bob.smith+x@corp.example.org now call +1-555-0199 twice 1-555-0200",)],
        ["text"],
    )
    out = df.select(
        curate.redact_pii(F.col("text")).alias("red"),
        curate.pii_counts(F.col("text")).alias("c"),
    ).collect()[0]
    assert out.red == "mail [EMAIL] now call [PHONE] twice [PHONE]"
    assert (out.c.n_emails, out.c.n_phones) == (1, 2)


def test_chunk_texts_rejoins_budgeted_tokens(spark):
    from cdp_spark.datapipe.curate import chunk_texts

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x"), (3, "")],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_texts(df, "doc_id", "text", budget=2).collect()
    }
    assert rows[(1, 0)] == (2, "a b")
    assert rows[(1, 1)] == (2, "c d")
    assert rows[(1, 2)] == (1, "e")  # short tail
    assert rows[(2, 0)] == (1, "x")
    assert not any(k[0] == 3 for k in rows)  # empty doc -> no chunks


def test_ngram_novelty_flags_shared_grams(spark):
    """Two docs sharing a 5-gram run: the shared grams have df=2 so
    they are not novel; unique tails are."""
    from cdp_spark.datapipe.curate import ngram_novelty

    shared = "one two three four five"
    df = spark.createDataFrame(
        [
            (1, shared + " alpha"),   # grams: [one..five], [two..alpha]
            (2, shared + " beta"),    # grams: [one..five], [two..beta]
            (3, "wholly different text with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in ngram_novelty(df, n=5).collect()}
    assert got[1]["n_grams"] == 2 and got[1]["n_novel"] == 1
    assert got[1]["novelty"] == 0.5
    assert got[2]["novelty"] == 0.5
    assert got[3]["novelty"] == 1.0
