"""exact_ngram_dup_stats vs an independent pure-Python model — the
true Lee et al. 2022 ExactSubstr semantics (VERDICT r10 missing #4):
any >= k-token substring appearing verbatim elsewhere is found
exactly, spans are maximal, removal keeps the corpus-wide first
occurrence."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cdp_spark.datapipe import dedup as ddp
from cdp_spark.session import load_table

SF = "/root/testdata/sf0.001"


def _model(docs: dict[int, str], k: int):
    """Independent reference: dict-of-gram occurrence lists, maximal
    runs and interval unions computed with plain Python."""
    toks = {d: t.split() for d, t in docs.items()}
    occ: dict[tuple, list] = {}
    for d in sorted(toks):
        tk = toks[d]
        for p in range(len(tk) - k + 1):
            occ.setdefault(tuple(tk[p : p + k]), []).append((d, p))
    dup_pos: dict[int, list[int]] = {}
    rm_pos: dict[int, list[int]] = {}
    for g, places in occ.items():
        if len(places) < 2:
            continue
        first = min(places)
        for d, p in places:
            dup_pos.setdefault(d, []).append(p)
            if (d, p) != first:
                rm_pos.setdefault(d, []).append(p)

    def spans(ps):
        ps = sorted(ps)
        n_spans, max_run, run = 0, 0, 0
        prev = None
        for p in ps:
            if prev is not None and p == prev + 1:
                run += 1
            else:
                n_spans += 1
                run = 1
            max_run = max(max_run, run)
            prev = p
        return n_spans, max_run

    def covered(ps):
        ps = sorted(ps)
        total, start, prev = 0, None, None
        for p in ps:
            if start is None:
                start, prev = p, p
            elif p - prev <= k:
                prev = p
            else:
                total += prev - start + k
                start, prev = p, p
        if start is not None:
            total += prev - start + k
        return total

    out = {}
    for d, ps in dup_pos.items():
        n = len(toks[d])
        n_spans, max_run = spans(ps)
        out[d] = (
            n,
            n - k + 1,
            len(ps),
            n_spans,
            max_run + k - 1,
            round(covered(ps) / n, 6),
            covered(rm_pos.get(d, [])),
        )
    return out


def _run_both(spark, docs: dict[int, str], k: int):
    sdf = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_grams"],
            r["n_dup_grams"],
            r["n_spans"],
            r["max_span_tokens"],
            round(r["dup_token_frac"], 6),
            r["n_removed_tokens"],
        )
        for r in ddp.exact_ngram_dup_stats(
            sdf, "doc_id", "text", k=k
        ).collect()
    }
    assert got == _model(docs, k), (got, _model(docs, k))
    return got


def test_planted_spans_and_first_occurrence_removal(spark):
    """Hand-built corpus: doc 1 plants one shared 6-token run inside
    doc 2 and a SECOND disjoint shared run in doc 3 — two spans in
    doc 1, removal charged to the later (doc, pos) occurrences only."""
    a = "p q r s t u"          # shared run A (6 tokens, k=4 -> 3 grams)
    b = "j1 j2 j3 j4 j5 j6"    # shared run B
    docs = {
        1: f"w1 w2 {a} w3 w4 w5 {b} w6",
        2: f"z1 z2 z3 {a} z4 z5",
        3: f"{b} y1 y2 y3 y4 y5 y6",
        4: "lone doc with no duplicated window at all here",
    }
    got = _run_both(spark, docs, k=4)
    assert set(got) == {1, 2, 3}          # doc 4 never appears
    assert got[1][3] == 2                  # two spans in doc 1
    assert got[1][6] == 0                  # doc 1 holds both firsts
    assert got[2][6] > 0 and got[3][6] > 0
    assert got[2][4] == 6 and got[3][4] == 6  # max span = the run


def test_seeded_random_corpus_matches_model(spark):
    """120 random docs over a tiny vocabulary (heavy accidental gram
    sharing) + planted verbatim copies — exact agreement with the
    independent model on every output column."""
    rnd = random.Random(11)
    vocab = [f"t{i}" for i in range(12)]
    docs = {}
    for d in range(120):
        docs[d] = " ".join(rnd.choice(vocab) for _ in range(rnd.randint(6, 40)))
    # planted exact copies and substring inclusions
    docs[200] = docs[0]
    docs[201] = "x0 x1 " + docs[1] + " x2"
    _run_both(spark, docs, k=5)


def test_fixture_corpus_sanity(spark):
    """At sf0.001 the planted near-dup fixtures must surface: every
    reported doc has max_span_tokens >= k and a self-consistent
    gram/span arithmetic."""
    docs = load_table(spark, SF, "documents")
    out = ddp.exact_ngram_dup_stats(docs, "doc_id", "text", k=20).collect()
    assert out
    for r in out:
        assert r["max_span_tokens"] >= 20
        assert r["n_dup_grams"] <= r["n_grams"]
        assert r["n_spans"] >= 1
        assert 0.0 < r["dup_token_frac"] <= 1.0
        assert r["n_removed_tokens"] <= r["n_tokens"]
