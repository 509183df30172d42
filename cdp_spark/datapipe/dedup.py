"""Deduplication at training-data scale.

- exact: hash-groupBy on content (one shuffle on the digest — the
  minimum possible; AQE coalesces small partitions).
- MinHash + LSH: shingle -> per-permutation min-hash -> band buckets
  -> candidate pairs via self-join on (band, bucket).  The join key is
  the band hash, so the shuffle touches only (id, band-hash) pairs —
  never the documents — and real pairs are verified afterwards with
  exact Jaccard on the shingle sets.
- SimHash: 64-bit sign-aggregated token hashes; near-dups differ in
  few bits (hamming via xor+popcount).
- n-gram Jaccard: exact verification primitive.

Everything is JVM-side (xxhash64, higher-order array functions,
bitwise aggregates): no Python in the hot path, deterministic across
runs (fixed seeds), linear row amplification bounded by
num_perm/bands.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

# Mersenne prime modulus for the universal-hash permutations.  31-bit
# so a*x + b stays < 2^62 — no long overflow under ANSI arithmetic.
_MERSENNE = (1 << 31) - 1


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct), as an array of strings."""
    tk = tokens(col)
    cnt = F.size(tk)
    starts = F.when(cnt >= n, F.sequence(F.lit(1), cnt - n + 1)).otherwise(
        F.when(cnt > 0, F.array(F.lit(1))).otherwise(F.array().cast("array<int>"))
    )
    grams = F.transform(
        starts, lambda i: F.array_join(F.slice(tk, i, F.least(F.lit(n), cnt)), " ")
    )
    return F.array_distinct(grams)


def shingle_hashes(col: Column, n: int = 3) -> Column:
    """Shingle set hashed to non-negative longs (xxhash64 & maxLong)."""
    return F.transform(
        shingles(col, n),
        lambda s: F.abs(F.xxhash64(s)) % F.lit(_MERSENNE),
    )


def _permutation_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a*x + b) mod p."""
    import random

    rnd = random.Random(seed)
    return [(rnd.randrange(1, _MERSENNE), rnd.randrange(0, _MERSENNE)) for _ in range(num_perm)]


def minhash_signature(col: Column, num_perm: int = 64, n: int = 3, seed: int = 42) -> Column:
    """MinHash signature: array<long> of length num_perm.

    Single-pass construction: ONE aggregate over the shingle-hash
    array updates all permutation minima together via zip_with —
    the shingle pipeline is evaluated once per row, not once per
    permutation (num_perm-fold re-evaluation would dominate at scale).
    """
    params = _permutation_params(num_perm, seed)
    consts = F.array(
        *[F.struct(F.lit(a).alias("a"), F.lit(b).alias("b")) for a, b in params]
    )
    init = F.array(*[F.lit(_MERSENNE).cast("long") for _ in range(num_perm)])
    hashes = shingle_hashes(col, n)
    return F.aggregate(
        hashes,
        init,
        lambda acc, x: F.zip_with(
            acc, consts, lambda m, c: F.least(m, (c["a"] * x + c["b"]) % F.lit(_MERSENNE))
        ),
    )


def lsh_band_keys(signature: Column, bands: int, rows: int) -> Column:
    """Band the signature: array of (band_idx, band_hash) structs.
    bands*rows must equal the signature length."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(F.array_join(F.slice(signature, b * rows + 1, rows), ",")).alias(
                "bucket"
            ),
        ),
    )


def minhash_signatures_df(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, signature array<long>) via the shuffle-based plan: explode
    shingle hashes to (id, h) rows, then num_perm codegen'd ``min``
    aggregates in ONE groupBy.  Unlike the single-expression
    ``minhash_signature``, every arithmetic op here runs inside
    whole-stage codegen — this is the 100 TB path (the shuffle carries
    only (id, h) longs, combiners pre-aggregate map-side)."""
    params = _permutation_params(num_perm, seed)
    exploded = df.select(
        F.col(id_col).alias("_id"), F.explode(shingle_hashes(F.col(text_col), n)).alias("_h")
    )
    aggs = [
        F.min((F.lit(a) * F.col("_h") + F.lit(b)) % F.lit(_MERSENNE)).alias(f"_m{i}")
        for i, (a, b) in enumerate(params)
    ]
    sigs = exploded.groupBy("_id").agg(*aggs)
    return sigs.select(
        "_id", F.array(*[F.col(f"_m{i}") for i in range(num_perm)]).alias("signature")
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) that share at least
    one LSH bucket.  Scale shape: explode to (id, band, bucket) — the
    only shuffled payload — self-join on (band, bucket), dedupe pairs.
    """
    rows = num_perm // bands
    sig = minhash_signatures_df(df, id_col, text_col, num_perm, n, seed).select(
        "_id",
        F.explode(lsh_band_keys(F.col("signature"), bands, rows)).alias("bk"),
    ).select("_id", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))
    left = sig.alias("l")
    right = sig.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )
    return pairs


def jaccard(col_a: Column, col_b: Column, n: int = 3) -> Column:
    """Exact word-n-gram Jaccard similarity between two text columns."""
    sa, sb = shingles(col_a, n), shingles(col_b, n)
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    union = F.size(F.array_union(sa, sb)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def verified_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
) -> DataFrame:
    """MinHash-LSH candidates verified with exact Jaccard >= threshold.
    The verify join re-reads only candidate documents (semi-join
    pattern) — at 100 TB candidates are a tiny fraction of pairs."""
    cands = minhash_candidate_pairs(df, id_col, text_col, num_perm, bands, n)
    docs = df.select(F.col(id_col).alias("_vid"), F.col(text_col).alias("_vtext"))
    joined = (
        cands.join(docs.withColumnRenamed("_vid", "id_a").withColumnRenamed("_vtext", "text_a"), "id_a")
        .join(docs.withColumnRenamed("_vid", "id_b").withColumnRenamed("_vtext", "text_b"), "id_b")
    )
    return (
        joined.withColumn("jaccard", F.round(jaccard(F.col("text_a"), F.col("text_b"), n), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


_SIMHASH_MASKS = [1 << b for b in range(63)] + [-(1 << 63)]


def simhash64(col: Column) -> Column:
    """64-bit SimHash over whitespace tokens: for each bit, sum +1/-1
    across token hashes, take the sign.

    Single-pass: one aggregate over the token-hash array carries all
    64 bit counters (zip_with against a constant mask array), then a
    final fold ORs the positive-counter masks together.  Evaluating
    the token pipeline per bit would be a 64x re-evaluation."""
    tk = tokens(col)
    hashes = F.transform(tk, lambda t: F.xxhash64(t))
    masks = F.array(*[F.lit(m).cast("long") for m in _SIMHASH_MASKS])
    init = F.array(*[F.lit(0).cast("long") for _ in _SIMHASH_MASKS])
    votes = F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda cnt, m: cnt + F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    signed = F.zip_with(votes, masks, lambda cnt, m: F.when(cnt > 0, m).otherwise(F.lit(0).cast("long")))
    return F.aggregate(signed, F.lit(0).cast("long"), lambda acc, m: acc.bitwiseOR(m))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def exact_dup_clusters(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Exact dedup via content-hash groupBy: one row per distinct
    content with the surviving (minimum) id and the duplicate count."""
    return (
        df.groupBy(F.md5(F.col(content_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
