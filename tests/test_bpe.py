"""BPE merge learning/application (cdp_spark/datapipe/bpe.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdp_spark.datapipe import bpe


def test_bpe_learns_expected_merges(spark):
    # 'abab' x3 + 'ab' x2: pair (a,b) occurs 3*2+2 = 8 times, (b,a)
    # 3 times — first merge must be (a,b); second merge then sees
    # 'ab ab' x3 so (ab, ab) wins with 3.
    df = spark.createDataFrame(
        [("abab abab abab ab ab",)], "text string"
    )
    rows = bpe.bpe_merges(df, num_merges=2).orderBy("step").collect()
    got = [(r["step"], r["left_sym"], r["right_sym"], r["n"]) for r in rows]
    assert got == [(1, "a", "b", 8), (2, "ab", "ab", 3)]


def test_bpe_two_pass_merge_handles_alternating_runs(spark):
    # 'ababab' = run of three (a,b) pairs: pass 1 takes the odd
    # occurrences, pass 2 the rest — all three must merge.
    df = spark.createDataFrame([(7, "ababab")], "doc_id long, text string")
    out = bpe.bpe_token_counts(df, [("a", "b")]).collect()
    assert out[0]["n_bpe_tokens"] == 3  # 'ab ab ab'


def test_bpe_two_pass_same_symbol_run_divergence_is_pinned(spark):
    """ADVICE r9: the two-pass leftmost replace deviates from
    canonical sequential BPE on SAME-symbol runs — deterministically,
    identically in Spark and the DuckDB oracle.  Pin the known
    divergence cases so the deviation stays intentional: if
    _apply_merge ever changes semantics (e.g. toward canonical), this
    test fails loudly and the oracle SQL must change in lockstep."""
    cases = [
        # (symbol seq, two-pass result, canonical sequential result)
        ("a a a", "aa a", "aa a"),            # agree
        ("a a a a", "aa aa", "aa aa"),        # agree
        ("a a a a a", "aa a aa", "aa aa a"),  # diverge: 3rd a pairs right
        ("a a a a a a", "aa a aa a", "aa aa aa"),  # diverge: count too
        ("a b a b a b", "a b a b a b", "a b a b a b"),  # no (a,a) pair
        ("a a b a a", "aa b aa", "aa b aa"),  # agree across separator
    ]
    df = spark.createDataFrame(
        [(s,) for s, _, _ in cases], "seq string"
    )
    got = {
        r["seq"]: r["merged"]
        for r in df.select(
            "seq", bpe._apply_merge(F.col("seq"), "a", "a").alias("merged")
        ).collect()
    }
    for seq, two_pass, _canonical in cases:
        assert got[seq] == two_pass, (
            f"{seq!r}: two-pass semantics drifted "
            f"({got[seq]!r} != pinned {two_pass!r})"
        )
    # the divergence is real (not a stale comment): exactly the two
    # >=5-symbol runs differ from canonical
    diverging = [s for s, tp, c in cases if tp != c]
    assert diverging == ["a a a a a", "a a a a a a"]


def test_bpe_token_counts_apply_in_training_order(spark):
    # merges [(a,b), (ab,c)]: 'abc' -> 'ab c' -> 'abc' = 1 token;
    # 'cab' -> 'c ab' = 2 tokens (no (c,ab) merge learned).
    df = spark.createDataFrame(
        [(1, "abc cab"), (2, "abc abc")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_token_counts(
            df, [("a", "b"), ("ab", "c")]
        ).collect()
    }
    assert got == {1: 3, 2: 2}


def test_production_trainer_equals_distributed_on_50_merge_prefix(spark):
    """VERDICT r9 #3: the collect-and-train production trainer must
    learn the IDENTICAL merge sequence (steps, symbols, counts) as the
    per-merge-job trainer on a shared 50-merge prefix at sf0.01 —
    the equality that licenses using it for vocab sizes where 32k job
    pairs are unaffordable."""
    from cdp_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    dist = [
        tuple(r)
        for r in bpe.bpe_merges(docs, num_merges=50)
        .orderBy("step")
        .collect()
    ]
    prod = [
        tuple(r)
        for r in bpe.bpe_merges_production(docs, num_merges=50)
        .orderBy("step")
        .collect()
    ]
    assert len(dist) == 50
    assert prod == dist


def test_production_trainer_equality_on_wide_seeded_vocabulary(spark):
    """The sf documents share a ~31-word vocabulary, so the 50-merge
    prefix test exercises deep merged symbols but few argmax ties.
    Complement it with a seeded 400-type corpus (heavy tie pressure
    among count-1 pairs, where only the (count DESC, left, right)
    total order decides) — both trainers must still agree exactly."""
    import random

    rng = random.Random(1234)
    alpha = "abcdefgh"
    words = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(2, 9)))
        for _ in range(400)
    ]
    docs = [
        (i, " ".join(rng.choices(words, k=30))) for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    dist = [
        tuple(r)
        for r in bpe.bpe_merges(df, num_merges=30).orderBy("step").collect()
    ]
    prod = [
        tuple(r)
        for r in bpe.bpe_merges_production(df, num_merges=30)
        .orderBy("step")
        .collect()
    ]
    assert len(dist) == 30
    assert prod == dist


def test_production_trainer_same_symbol_runs_and_min_count(spark):
    """The two-pass merge semantics (incl. the pinned same-symbol-run
    divergence) and the min_count cutoff behave identically in the
    driver-side loop."""
    df = spark.createDataFrame(
        [("aaaaa aaaaa aaaaa bb",)], "text string"
    )
    dist = [
        tuple(r)
        for r in bpe.bpe_merges(df, num_merges=3).orderBy("step").collect()
    ]
    prod = [
        tuple(r)
        for r in bpe.bpe_merges_production(df, num_merges=3)
        .orderBy("step")
        .collect()
    ]
    assert prod == dist
    # min_count drops the hapax 'bb' type in both trainers
    d2 = [
        tuple(r)
        for r in bpe.bpe_merges(df, num_merges=2, min_count=2)
        .orderBy("step")
        .collect()
    ]
    p2 = [
        tuple(r)
        for r in bpe.bpe_merges_production(df, num_merges=2, min_count=2)
        .orderBy("step")
        .collect()
    ]
    assert p2 == d2
    assert all(m[1] != "b" and m[2] != "b" for m in p2)


def test_production_trainer_merge_loop_depends_on_types_only(spark):
    """The driver-side merge loop sees the TYPE table, not the corpus:
    duplicating every document changes nothing but the counts (exactly
    2x) — the 'train time independent of corpus scale after the
    counting pass' property, asserted on identity rather than time."""
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df2 = df.unionByName(df.withColumn("doc_id", F.col("doc_id") + 100))
    m1 = [
        tuple(r)
        for r in bpe.bpe_merges_production(df, num_merges=6)
        .orderBy("step")
        .collect()
    ]
    m2 = [
        tuple(r)
        for r in bpe.bpe_merges_production(df2, num_merges=6)
        .orderBy("step")
        .collect()
    ]
    assert [(s, a, b) for s, a, b, _ in m1] == [(s, a, b) for s, a, b, _ in m2]
    assert [n * 2 for *_, n in m1] == [n for *_, n in m2]


def test_bpe_training_runs_on_word_types_not_corpus(spark):
    """The merge loop's input frame must be the aggregated word-type
    table: duplicating every document must not change the learned
    merges' identity or order (counts scale exactly 2x)."""
    rows = [(i, "the quick brown fox the lazy dog") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df2 = df.unionByName(df.withColumn("doc_id", F.col("doc_id") + 100))
    m1 = [
        (r["left_sym"], r["right_sym"], r["n"])
        for r in bpe.bpe_merges(df, num_merges=5).orderBy("step").collect()
    ]
    m2 = [
        (r["left_sym"], r["right_sym"], r["n"])
        for r in bpe.bpe_merges(df2, num_merges=5).orderBy("step").collect()
    ]
    assert [(a, b) for a, b, _ in m1] == [(a, b) for a, b, _ in m2]
    assert [n * 2 for _, _, n in m1] == [n for _, _, n in m2]
