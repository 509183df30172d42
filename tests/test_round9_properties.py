"""Seeded-random model tests for the round-9 primitives: each checks
the Spark implementation against an independent pure-Python reference
on ONE batched DataFrame (the Spark-friendly shape of a property test
— hypothesis-per-example round-trips would pay a Spark job per case).

- BPE: training (merge sequence + counts) and application (token
  counts) against a from-the-definition Python trainer using the same
  two-pass leftmost-replace semantics.
- ngram_novelty against brute-force Python over random corpora.
- leakage_safe_split: partitioning-invariance (assignment is a pure
  function of the cluster label).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cdp_spark.datapipe import bpe
from cdp_spark.datapipe.curate import ngram_novelty
from cdp_spark.datapipe.sampling import leakage_safe_split


def _py_apply(seq: str, a: str, b: str) -> str:
    pat, rep = f" {a} {b} ", f" {a}{b} "
    s = f" {seq} "
    s = s.replace(pat, rep)
    s = s.replace(pat, rep)
    return s.strip()


def _py_train(word_counts: dict[str, int], k: int):
    seqs = [(" ".join(w), c) for w, c in sorted(word_counts.items())]
    merges = []
    for step in range(1, k + 1):
        counts: dict[tuple[str, str], int] = {}
        for seq, c in seqs:
            toks = seq.split(" ")
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        (a, b), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, a, b, n))
        seqs = [(_py_apply(seq, a, b), c) for seq, c in seqs]
    return merges


def _random_corpus(seed: int, n_docs: int = 60) -> list[str]:
    rnd = random.Random(seed)
    vocab = [
        "".join(rnd.choice("abc") for _ in range(rnd.randint(1, 6)))
        for _ in range(30)
    ]
    return [
        " ".join(rnd.choice(vocab) for _ in range(rnd.randint(0, 12)))
        for _ in range(n_docs)
    ]


def test_bpe_training_matches_python_model(spark):
    texts = _random_corpus(13)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["n"])
        for r in bpe.bpe_merges(df, num_merges=8).orderBy("step").collect()
    ]
    wc: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    assert got == _py_train(wc, 8)


def test_bpe_apply_matches_python_model(spark):
    texts = _random_corpus(29)
    wc: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    merges = [(a, b) for _, a, b, _ in _py_train(wc, 6)]
    rows = [(i, t) for i, t in enumerate(texts) if t.split()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_token_counts(df, merges).collect()
    }
    for i, t in rows:
        expect = 0
        for w in t.split():
            seq = " ".join(w)
            for a, b in merges:
                seq = _py_apply(seq, a, b)
            expect += len(seq.split(" "))
        assert got[i] == expect, (i, t)


def _py_grams(text: str, n: int) -> set[str]:
    toks = text.split()
    if not toks:
        return set()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_ngram_novelty_matches_bruteforce(spark):
    texts = _random_corpus(47, n_docs=40)
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"])
        for r in ngram_novelty(df, n=3).collect()
    }
    grams = {i: _py_grams(t, 3) for i, t in rows}
    df_count: dict[str, int] = {}
    for gs in grams.values():
        for g in gs:
            df_count[g] = df_count.get(g, 0) + 1
    for i, gs in grams.items():
        if not gs:
            assert i not in got
            continue
        novel = sum(1 for g in gs if df_count[g] == 1)
        assert got[i] == (len(gs), novel), (i, texts[i])


def test_leakage_split_is_partitioning_invariant(spark):
    rows = [(i, i % 37) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, component long")
    one = {
        (r["doc_id"], r["split"])
        for r in leakage_safe_split(df.repartition(1), "component").collect()
    }
    many = {
        (r["doc_id"], r["split"])
        for r in leakage_safe_split(
            df.repartition(13, "doc_id"), "component"
        ).collect()
    }
    assert one == many
    # pure function of the label: equal components, equal split
    by_comp: dict[int, set[str]] = {}
    for (i, s), (c) in zip(sorted(one), [c for _, c in sorted(rows)]):
        by_comp.setdefault(c, set()).add(s)
    assert all(len(v) == 1 for v in by_comp.values())
