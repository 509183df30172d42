"""Deterministic sampling for training-data curation.

Random sampling is unusable in a reproducible data pipeline: re-runs
must select the same documents, different engines must agree, and a
sample must be extensible (raising a stratum's rate keeps every
previously-selected row — the hash threshold just moves).  The
standard trick is hash-based bucketing: a document is in the sample
iff a stable content/id hash falls below the stratum's threshold.

All expressions stay JVM-side (md5 + substring comparisons), so the
sample predicate pushes into the scan stage and costs one pass with
no shuffle — at 100 TB the sampler is scan-bound, exactly as cheap
as a filter can be.  MD5 is used (not xxhash64) because it is
bit-identical across engines, which keeps the operation
oracle-checkable and portable.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket_hex(col: Column, chars: int = 4) -> Column:
    """First ``chars`` hex digits of md5(col-as-text): a uniform
    label in [0, 16^chars) that lexicographic string comparison
    orders numerically (fixed width, lowercase both here and in
    SQL engines)."""
    return F.substring(F.md5(col.cast("string").cast("binary")), 1, chars)


def rate_to_hex_threshold(rate: float, chars: int = 4) -> str:
    """Largest hex prefix t such that P(bucket < t) ~= rate."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    space = 16 ** chars
    if rate >= 1.0:
        return "g" * chars  # 'g' > every hex digit -> always true
    n = min(int(round(rate * space)), space - 1)
    return format(n, f"0{chars}x")


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    chars: int = 4,
) -> DataFrame:
    """Keep each row iff md5-bucket(id) < threshold(stratum): a
    deterministic per-stratum downsample (e.g. 100% books, 25% web).
    Same (id, stratum) always makes the same decision — across runs,
    partitions, and engines."""
    bucket = hash_bucket_hex(F.col(id_col), chars)
    threshold = F.lit(rate_to_hex_threshold(default_rate, chars))
    for value, rate in rates.items():
        threshold = F.when(
            F.col(stratum_col) == value, F.lit(rate_to_hex_threshold(rate, chars))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def dataset_mix(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    weights: Mapping[str, float],
    chars: int = 4,
) -> DataFrame:
    """Weighted dataset mixing: each stratum appears ``weight`` times
    in the output (an ``epoch`` column numbers the repetitions) — the
    standard pretraining-mix operation ("2.3 epochs of books, 0.5 of
    web").  The integer part replicates whole epochs; the fractional
    part is a deterministic md5-bucket subsample (same discipline as
    stratified_sample, so re-runs and engines agree row-for-row).

    Plan shape: explode over a per-row epoch array — a narrow map
    (no shuffle, no join); output size = sum(weight_s * |stratum_s|)
    exactly as predicted, which is what capacity planning needs at
    100 TB.  Strata absent from ``weights`` get weight 0 (dropped).
    """
    whole_br = {k: int(w) for k, w in weights.items()}
    frac_thr = {
        k: rate_to_hex_threshold(w - int(w), chars) for k, w in weights.items()
    }
    bucket = hash_bucket_hex(F.col(id_col), chars)

    whole = F.lit(0)
    for value, n in whole_br.items():
        whole = F.when(F.col(stratum_col) == value, F.lit(n)).otherwise(whole)
    frac = F.lit("0" * chars)
    for value, thr in frac_thr.items():
        frac = F.when(F.col(stratum_col) == value, F.lit(thr)).otherwise(frac)

    n_epochs = whole + F.when(bucket < frac, F.lit(1)).otherwise(F.lit(0))
    # sequence(1, 0) infers a DESCENDING step and yields [1, 0] — gate
    # zero-epoch rows to an empty array so explode drops them.
    epochs = F.when(
        n_epochs >= 1, F.sequence(F.lit(1), n_epochs)
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn("epoch", F.explode(epochs))


def temperature_mix(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    alpha: float = 0.5,
    chars: int = 4,
) -> DataFrame:
    """Temperature-scaled mixture sampling (the multilingual
    balancing rule of XLM-R / mT5: sample stratum ``i`` with
    probability proportional to ``p_i ** alpha``): computes the
    per-stratum epoch weights FROM THE DATA and replicates rows like
    :func:`dataset_mix` — whole epochs explode, the fractional epoch
    is a deterministic md5-bucket subsample.  The output totals
    approximately the input size, redistributed toward small strata
    (alpha < 1) — epochs_i = (q_i / p_i) with q ∝ p^alpha.

    Everything stays IN the plan (no driver collect): one tiny
    groupBy(stratum) count, one single-row total, and a broadcast
    join of the per-stratum weight frame back onto the data — the
    weight table is O(#strata) regardless of corpus size.

    Cross-engine determinism: p^alpha is rounded to the nearest
    integer "share unit" before any ratio (integer products, then ONE
    IEEE division), the fractional threshold is
    ``floor(frac * 16**chars)`` (multiplying by a power of two is
    exact), and the md5 bucket compares as an integer — every step is
    bit-reproducible in any IEEE engine, so the oracle replays the
    mix row-for-row.
    """
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n"))
    scaled = counts.withColumn(
        "_sn", F.round(F.pow(F.col("_n"), F.lit(float(alpha)))).cast("long")
    )
    totals = scaled.agg(
        F.sum("_n").alias("_tot"), F.sum("_sn").alias("_stot")
    )
    epochs_raw = (F.col("_sn") * F.col("_tot")).cast("double") / (
        F.col("_stot") * F.col("_n")
    ).cast("double")
    weights = (
        scaled.crossJoin(F.broadcast(totals))
        .withColumn("_whole", F.floor(epochs_raw).cast("long"))
        .withColumn(
            "_thr",
            F.floor((epochs_raw - F.col("_whole")) * F.lit(16**chars)).cast("long"),
        )
        .select(stratum_col, "_whole", "_thr")
    )
    bucket_int = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, chars), 16, 10
    ).cast("long")
    n_epochs = F.col("_whole") + F.when(bucket_int < F.col("_thr"), 1).otherwise(0)
    epochs = F.when(
        n_epochs >= 1, F.sequence(F.lit(1).cast("long"), n_epochs)
    ).otherwise(F.array().cast("array<long>"))
    return (
        df.join(F.broadcast(weights), stratum_col)
        .withColumn("epoch", F.explode(epochs))
        .drop("_whole", "_thr")
    )


# Hash-derived uniform for the samplers.  md5_hash60 (the audited
# cross-engine 60-bit hash) reduced mod a prime: u in (0, 1), exact
# integer arithmetic with NO overflow for any id (a multiplicative
# id*BIG_CONST hash overflows int64 for ids >= ~2^33 — Spark would
# silently wrap while DuckDB hard-errors), and the final division of
# exact integers is one correctly-rounded IEEE op, so u is
# bit-identical everywhere.  (The md5-hex trick above gives an
# ORDERED LABEL, which threshold filters need; A-ES/Gumbel need a
# NUMERIC uniform.)  Distinct ids may share a u (2^20 buckets); keys
# still differ through the weight/score and ties break by id —
# harmless for sampling.
_AES_MOD = 1048573  # prime < 2^20


def hash_uniform(id_col: Column) -> Column:
    """Deterministic uniform in (0, 1): (md5_hash60(id) % p + 1)/(p+1).
    DuckDB twin:
    ``(CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15) AS BIGINT)
    % 1048573 + 1) / 1048574.0``."""
    from .dedup import md5_hash60

    h = md5_hash60(id_col.cast("string"))
    return (h % F.lit(_AES_MOD) + F.lit(1)) / F.lit(float(_AES_MOD + 1))


def weighted_sample_key(id_col: Column, weight_col: Column, round_digits: int = 6) -> Column:
    """The Efraimidis–Spirakis A-ES priority key ``-ln(u)/w`` (an
    Exp(w) draw): the k SMALLEST keys are a weighted-without-
    replacement sample of size k.  Rounded so the only cross-engine
    nondeterminism (libm ln differs by <=1 ulp between JVM and C) is
    absorbed; ties under rounding break by id downstream."""
    return F.round(
        -F.ln(hash_uniform(id_col)) / weight_col.cast("double"), round_digits
    )


def gumbel_topk(
    df: DataFrame,
    id_col: str,
    score_col: str,
    k: int,
    stratum_col: str | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Gumbel-top-k sampling without replacement with probability
    proportional to ``exp(score)`` — the LOG-space twin of
    :func:`weighted_sample` (identical distribution; argmax_k of
    score+Gumbel ~ A-ES over w=exp(score)), for scores that live in
    log space where exp(w) would over/underflow — e.g. DSIR
    importance log-ratios.

    gumbel = -ln(-ln(u)) from the same hash uniform; the k LARGEST
    (score + gumbel) keys win, ties broken by id on the rounded key.
    Same determinism and WindowGroupLimit shape as weighted_sample.
    """
    key = F.round(
        F.col(score_col).cast("double") - F.ln(-F.ln(hash_uniform(F.col(id_col)))),
        round_digits,
    )
    part = [stratum_col] if stratum_col else []
    w = Window.partitionBy(*part).orderBy(
        F.col("_gum_key").desc(), F.col(id_col)
    )
    return (
        df.withColumn("_gum_key", key)
        .withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= k)
        .drop("_rank")
        .withColumnRenamed("_gum_key", "gumbel_key")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    stratum_col: str | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (A-ES,
    Efraimidis & Spirakis 2006): every row draws priority ``-ln(u)/w``
    from its own Exp(weight) and the k smallest priorities win —
    P(selection) is proportional to weight, exactly the importance-
    weighted pick a curation pipeline needs ("sample 10k docs biased
    by quality score").

    Deterministic twice over: u is a hash uniform of the id (not a
    PRNG), and the top-k rank orders by (rounded key, id) so engines
    agree row-for-row.  Rows with non-positive weight are EXCLUDED
    (selection probability proportional to w means w <= 0 never
    selects; unguarded, w = 0 would yield a NULL key that Spark's
    NULLS FIRST ordering selects with certainty while SQL engines
    with NULLS LAST never would).

    Scale shape: the key is a codegen expression; per-stratum top-k is
    one window rank over a (stratum) shuffle — with few strata and
    small k, Spark's WindowGroupLimit pushes the limit map-side so the
    shuffle carries ~k rows per partition per stratum, not the input.
    Unstratified calls get a single-partition rank over rows that
    survive the same map-side limit (k rows per input partition).
    """
    key = weighted_sample_key(F.col(id_col), F.col(weight_col), round_digits)
    part = [stratum_col] if stratum_col else []
    w = Window.partitionBy(*part).orderBy(F.col("_aes_key"), F.col(id_col))
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("_aes_key", key)
        .withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= k)
        .drop("_rank")
        .withColumnRenamed("_aes_key", "aes_key")
    )


def leakage_safe_split(
    df: DataFrame,
    cluster_col: str,
    fractions: Mapping[str, float] | None = None,
    chars: int = 4,
) -> DataFrame:
    """Train/val/test assignment as a PURE FUNCTION of the duplicate
    CLUSTER label — the split a training pipeline must use after
    dedup: hashing document ids would scatter a near-dup cluster
    across splits (test-set leakage, the failure Lee et al. 2022
    measure); hashing the cluster label keeps every member together
    by construction, no bookkeeping join needed.

    ``fractions`` maps split name to its share in declaration order
    (cumulative md5-hex thresholds, the stratified_sample idiom);
    they must sum to ~1.  Deterministic across runs, partitions, and
    engines — the same cluster always lands in the same split.

    Scale shape: one codegen expression per row (the md5 bucket and a
    chain of string comparisons); zero shuffles beyond whatever
    produced the cluster column.  Adds a ``split`` column.
    """
    if fractions is None:
        fractions = {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bucket = hash_bucket_hex(F.col(cluster_col), chars)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        thr = rate_to_hex_threshold(acc, chars)
        cond = bucket < F.lit(thr)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn("split", expr)


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    stratum_col: str,
    budget_tokens: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic TOKEN-BUDGET sampling per stratum — the "take N
    tokens of each language" pretraining-mix primitive (the token
    sibling of ``stratified_sample``'s row rates): order each
    stratum's documents by a stable md5 shuffle key, accumulate token
    counts, and keep every document that STARTS below the budget (so
    the crossing document is included and the selection reaches the
    budget whenever the stratum can).  Same-key ties break on the id
    — a total order, so re-runs and other engines select the same
    rows, and raising the budget only ever ADDS documents.

    Scale shape — the naive formulation is one running-sum window per
    stratum, which serializes each stratum onto a single task (a
    1-stratum 100 TB corpus would sort on one core).  Instead the
    shuffle key's leading 16 bits bucket each stratum into
    ``n_buckets`` ORDER-PRESERVING ranges (bucket = prefix div
    (65536/n_buckets), monotone in the key, so bucket-major order ==
    key order): per-(stratum, bucket) token sums are a tiny
    aggregate, bucket offsets a window over n_buckets rows, and the
    per-document running sum windows over (stratum, bucket)
    partitions — n_buckets-way parallel, each partition ~1/n_buckets
    of the stratum.  Buckets wholly past the budget are dropped by a
    filter BEFORE the document window ever sorts them.

    Output: (id_col, stratum_col, n_tokens, cum_tokens) for the
    selected documents; ``cum_tokens`` is the stratum-wide running
    total INCLUDING the row (== the naive single-window formulation,
    which is what the oracle replays).
    """
    from .text import tokens

    if 65536 % n_buckets != 0:
        raise ValueError(
            f"n_buckets={n_buckets} must divide 65536 so the bucket "
            "is an order-preserving function of the shuffle key"
        )
    width = 65536 // n_buckets
    base = (
        df.where(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col),
            F.col(stratum_col),
            F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
            F.md5(F.col(id_col).cast("string").cast("binary")).alias("_key"),
        )
        .withColumn(
            "_b",
            (F.conv(F.substring("_key", 1, 4), 16, 10).cast("long")
             / width).cast("int"),
        )
    )
    # tiny per-(stratum, bucket) totals -> cumulative bucket offsets
    boff = (
        base.groupBy(stratum_col, "_b")
        .agg(F.sum("n_tokens").alias("_bsum"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_bsum").over(
                    Window.partitionBy(stratum_col)
                    .orderBy("_b")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select(stratum_col, "_b", "_off")
    )
    scoped = base.join(F.broadcast(boff), [stratum_col, "_b"]).where(
        # buckets that START past the budget can never contain a
        # selected document — pruned before the document window
        F.col("_off") < F.lit(int(budget_tokens))
    )
    w = (
        Window.partitionBy(stratum_col, "_b")
        .orderBy("_key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = scoped.withColumn(
        "cum_tokens", (F.col("_off") + F.sum("n_tokens").over(w)).cast("long")
    )
    return out.where(
        F.col("cum_tokens") - F.col("n_tokens") < F.lit(int(budget_tokens))
    ).select(id_col, stratum_col, "n_tokens", "cum_tokens")


def shuffle_to_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: int = 42,
    hash_col=None,
) -> DataFrame:
    """Deterministic global shuffle into ``n_shards`` training shards —
    the pipeline's last mile: training wants the corpus in a
    pseudo-random order that is REPRODUCIBLE (re-runs and engines must
    agree on both shard assignment and within-shard order, or a resume
    reads different data) and WRITABLE as fixed-count shard files.

    Each row gets ``shard`` (which shard file it lands in) and ``pos``
    (its 1-based position within the shard): a keyed hash of the id
    drives both, so assignment is a pure function of (id, seed) — no
    RNG state, no partition-count dependence, extensible semantics
    (the same id always lands in the same place for a given seed; a
    new seed is a fresh global shuffle).

    Scale shape: computing the hash is a narrow map over the scan; the
    ONE shuffle is the repartition-by-shard Spark plans for the window,
    and the within-shard ``row_number`` is a per-shard sort — exactly
    the work a shard writer must do anyway to emit ordered shard
    files.  Size ``n_shards`` so a shard's rows fit an executor's sort
    spill budget (at 100 TB: thousands of shards, not tens).

    ``hash_col`` maps an id Column to its hash Column; the default is
    the cross-engine md5-based 60-bit hash so the shuffle replays
    bit-for-bit in DuckDB/any SQL engine (pass
    ``dedup.default_hash64``-style xxhash64 for raw speed when
    cross-engine reproducibility does not matter).

    No analog in the reference (its sinks stream events in arrival
    order, src/step-functions/send-file.ts); this is part of the
    LLM-curation surface the brief adds on top.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if hash_col is None:
        from .dedup import md5_hash60

        hash_col = md5_hash60
    h = hash_col(
        F.concat(F.col(id_col).cast("string"), F.lit(f"|{int(seed)}"))
    )
    with_shard = df.withColumn("_h", h).withColumn(
        "shard", F.pmod(F.col("_h"), F.lit(int(n_shards))).cast("long")
    )
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return (
        with_shard.withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_h")
    )
