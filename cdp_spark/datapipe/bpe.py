"""Byte-pair-encoding merge learning and application, Spark-first.

The tokenizer-training step of an LLM data pipeline (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units"):
count adjacent symbol pairs over the word-frequency table, merge the
most frequent pair, repeat.  The reference engine has no tokenizer
training (its text handling stops at jq/jsonnet transforms) — this is
superset scope for the training-data use case, like the dedup/ANN
families.

Scale shape: the corpus is scanned ONCE into the (word, count)
frequency table — BPE statistics are a function of word TYPES weighted
by counts, so every merge iteration runs over the Zipf-small type
table, never the corpus.  Each iteration is one adjacent-pair
aggregate (map-side combined) + one driver-side argmax of a single
row (the model state, like k-means centroids) + one whole-stage-codegen
string rewrite of the type table, `iter_checkpoint`ed so the loop's
lineage and stats stay flat.

Merge application semantics (IDENTICAL in Spark and the DuckDB
oracle, by construction): a learned pair (a, b) is applied to the
space-joined symbol string as TWO passes of leftmost-non-overlapping
literal replace of " a b " with " ab " on the space-padded string.
Two passes make every alternating run merge completely (pass 1 takes
the odd occurrences, whose consumed trailing space isolates the even
ones for pass 2).  For pathological SAME-symbol runs ("a a a a a")
this deviates from strict left-to-right sequential BPE — the third
'a' pairs right instead of left — deterministically and identically
in both engines; real vocabularies hit this only on degenerate
repetition strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def _char_seq(col: Column) -> Column:
    """'hello' -> 'h e l l o': every character becomes a symbol."""
    return F.trim(F.regexp_replace(col, "(.)", "$1 "))


def _apply_merge(seq: Column, w1: str, w2: str) -> Column:
    """Two-pass leftmost-non-overlapping merge of (w1, w2) on a
    space-joined symbol string (see module docstring)."""
    pat = F.lit(f" {w1} {w2} ")
    rep = F.lit(f" {w1}{w2} ")
    padded = F.concat(F.lit(" "), seq, F.lit(" "))
    return F.trim(F.replace(F.replace(padded, pat, rep), pat, rep))


def word_frequencies(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, cnt) over whitespace tokens — the ONE corpus scan BPE
    training needs; everything after runs on word types."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """Adjacent symbol-pair occurrence counts over (seq, cnt) word
    types, weighted by word count.  Occurrences, not types: a pair
    appearing twice inside one word counts twice (standard BPE)."""
    toks = F.split(F.col("seq"), " ")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (
        seqs.select(F.explode(pairs).alias("p"), F.col("cnt"))
        .groupBy("p.w1", "p.w2")
        .agg(F.sum("cnt").alias("n"))
    )


def bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 10,
    min_count: int = 1,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from the corpus.  Returns the
    merge table (step, left, right, n) — the tokenizer model, one row
    per merge, built driver-side like the k-means centroid state
    (``num_merges`` single-row argmax collects over the type table).

    Ties break on (count DESC, left ASC, right ASC) — a total order,
    so both engines learn the identical merge sequence.

    Regime note for production vocab sizes: each merge costs one
    Spark job over the word-TYPE table, which amortizes fine for
    analysis-scale merge counts but not for a 32k-merge production
    vocabulary (32k job round-trips).  The 100 TB shape there is:
    (1) the distributed part is the ONE corpus scan building the
    (word, cnt) table — that is what needs the cluster; (2) apply
    ``min_count`` to drop hapax types (standard practice — they
    cannot influence early merges' argmax and shrink the type table
    by the Zipf tail); (3) the cutoff table is a few-hundred-MB
    artifact — collect it once and run the merge loop driver-side
    (or single-partition), exactly like every production tokenizer
    trainer does after its own distributed counting pass.  This
    function keeps the per-merge-job form because its merge counts
    are analysis-scale and each step stays oracle-checkable."""
    from ..session import iter_checkpoint

    spark = df.sparkSession
    wf = word_frequencies(df, text_col)
    if min_count > 1:
        wf = wf.where(F.col("cnt") >= min_count)
    cur = iter_checkpoint(
        wf.select(_char_seq(F.col("w")).alias("seq"), "cnt")
    )
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, num_merges + 1):
        top = (
            _pair_counts(cur)
            .orderBy(F.col("n").desc(), "w1", "w2")
            .limit(1)
            .collect()
        )
        if not top:
            break
        w1, w2, n = top[0]["w1"], top[0]["w2"], int(top[0]["n"])
        merges.append((step, w1, w2, n))
        cur = iter_checkpoint(
            cur.select(
                _apply_merge(F.col("seq"), w1, w2).alias("seq"), "cnt"
            )
        )
    return spark.createDataFrame(
        merges, "step int, left_sym string, right_sym string, n long"
    )


def bpe_merges_production(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 10,
    min_count: int = 1,
) -> DataFrame:
    """The PRODUCTION-vocab training regime the per-merge-job trainer's
    docstring describes (VERDICT r9 #3): the distributed part is the
    ONE corpus scan building the (word, cnt) type table; after the
    ``min_count`` cutoff the table is collected ONCE and the merge
    loop runs driver-side — zero Spark jobs per merge, so a 32k-merge
    vocabulary costs one counting pass instead of 32k job pairs.
    Exactly every real tokenizer trainer's shape after its own
    distributed counting pass.

    Semantics are IDENTICAL to :func:`bpe_merges` by construction —
    same pair-occurrence counting (a pair twice in one word counts
    twice, weighted by word count), same total-order tie-break
    (count DESC, left ASC, right ASC), same two-pass leftmost
    non-overlapping merge application (Python ``str.replace`` and
    Spark ``F.replace`` share leftmost-replace-all semantics) — so
    both trainers learn the same merge sequence on the same corpus
    (pinned by test on a shared 50-merge prefix).

    Driver memory: the cutoff type table — Zipf-small; the docstring
    math in :func:`bpe_merges` (a few hundred MB at 100 TB corpus
    scale with a sane min_count).  Per-merge cost: one substring scan
    over the type table to find affected words, pair-count DELTAS
    applied only for those — the counting dict is never rebuilt."""
    from collections import Counter

    spark = df.sparkSession
    wf = word_frequencies(df, text_col)
    if min_count > 1:
        wf = wf.where(F.col("cnt") >= min_count)
    items: list[list] = [
        [" ".join(r["w"]), int(r["cnt"])] for r in wf.collect()
    ]

    def _pairs(seq: str) -> list[tuple[str, str]]:
        toks = seq.split(" ")
        return list(zip(toks, toks[1:]))

    counts: Counter = Counter()
    for seq, cnt in items:
        for p in _pairs(seq):
            counts[p] += cnt

    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, num_merges + 1):
        counts += Counter()  # drop zero/negative residue
        if not counts:
            break
        (w1, w2), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, w1, w2, int(n)))
        pat = f" {w1} {w2} "
        rep = f" {w1}{w2} "
        for item in items:
            padded = " " + item[0] + " "
            if pat not in padded:
                continue
            cnt = item[1]
            for p in _pairs(item[0]):
                counts[p] -= cnt
            item[0] = (
                padded.replace(pat, rep).replace(pat, rep).strip()
            )
            for p in _pairs(item[0]):
                counts[p] += cnt
    return spark.createDataFrame(
        merges, "step int, left_sym string, right_sym string, n long"
    )


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge list to every document and count the
    resulting BPE tokens: per word, symbols = characters, then each
    merge applied in training order; the doc's token count is the sum
    of per-word symbol counts.  Pure map + one aggregate — the
    tokenize path never shuffles anything but (id, count)."""
    seq = _char_seq(F.col("w"))
    for w1, w2 in merges:
        seq = _apply_merge(seq, w1, w2)
    n_symbols = F.size(F.split(seq, " "))
    return (
        df.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w")
        )
        .select(F.col(id_col), n_symbols.alias("_n"))
        .groupBy(id_col)
        .agg(F.sum("_n").alias("n_bpe_tokens"))
    )
