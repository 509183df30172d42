"""Optimization r16: the vectorized Arrow kernels (minhash signature,
simhash fingerprint) must be BIT-IDENTICAL to
the original Catalyst higher-order-function formulations they replaced
— same int64 arithmetic, same null/empty semantics, same element
order.  Each test evaluates the retired Column fold inline (copied
verbatim from the pre-optimization source) next to the shipped kernel
on real corpus text plus adversarial edge rows, and asserts exact
equality row by row."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdp_spark.datapipe import dedup as ddp
from cdp_spark.session import load_table

SF = "/root/testdata/sf0.001"


def _edge_rows(spark):
    return spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "   "),
            (4, "one"),
            (5, "one two"),
            (6, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
            (7, "dup dup dup dup dup"),
            (8, "x" * 500),
        ],
        "doc_id long, text string",
    )


def _docs(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    return docs.unionByName(_edge_rows(spark))


def _legacy_signature_from_shingles(sh, num_perm, seed, hash_fn):
    params = ddp._permutation_params(num_perm, seed)
    consts = F.array(
        *[F.struct(F.lit(a).alias("a"), F.lit(b).alias("b")) for a, b in params]
    )
    init = F.array(*[F.lit(ddp._MERSENNE).cast("long") for _ in range(num_perm)])
    hashes = F.transform(sh, lambda s: hash_fn(s) % F.lit(ddp._MERSENNE))
    return F.aggregate(
        hashes,
        init,
        lambda acc, x: F.zip_with(
            acc,
            consts,
            lambda m, c: F.least(m, (c["a"] * x + c["b"]) % F.lit(ddp._MERSENNE)),
        ),
    )


def _legacy_simhash64(col, hash_fn):
    tk = ddp.tokens(col)
    token_hash = hash_fn if hash_fn is not None else F.xxhash64
    hashes = F.transform(tk, lambda t: token_hash(t))
    masks = F.array(*[F.lit(m).cast("long") for m in ddp._SIMHASH_MASKS])
    init = F.array(*[F.lit(0).cast("long") for _ in ddp._SIMHASH_MASKS])
    votes = F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda cnt, m: cnt
            + F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    signed = F.zip_with(
        votes,
        masks,
        lambda cnt, m: F.when(cnt > 0, m).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        signed, F.lit(0).cast("long"), lambda acc, m: acc.bitwiseOR(m)
    )


@pytest.mark.parametrize(
    "num_perm,hash_fn", [(32, ddp.md5_hash60), (64, ddp.default_hash64)]
)
def test_minhash_kernel_matches_column_fold(spark, num_perm, hash_fn):
    docs = _docs(spark)
    sh = ddp.shingles(F.col("text"), 3)
    rows = (
        docs.select(
            "doc_id",
            ddp.signature_from_shingles(sh, num_perm, 42, hash_fn).alias("new"),
            _legacy_signature_from_shingles(sh, num_perm, 42, hash_fn).alias(
                "old"
            ),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert r.new == r.old, r.doc_id


def test_banding_explode_over_kernel_signature_runs(spark):
    """Regression for the Spark 4.1.2 Python-UDF extraction gap: a
    kernel-produced signature column consumed by the LSH banding
    explode, with the _ensure_parallelism repartition below, dies with
    "Cannot evaluate expression: PythonUDF" unless the checkpoint
    barrier in minhash_candidate_pairs is in place.  Executing the
    full candidate pipeline proves the barrier holds."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    pairs = ddp.minhash_candidate_pairs(
        docs, "doc_id", "text", num_perm=32, bands=8, hash_fn=ddp.md5_hash60
    )
    assert pairs.count() > 0


@pytest.mark.parametrize("hash_fn", [ddp.md5_hash60, None])
def test_simhash_kernel_matches_column_fold(spark, hash_fn):
    docs = _docs(spark)
    rows = (
        docs.select(
            "doc_id",
            ddp.simhash64(F.col("text"), hash_fn=hash_fn).alias("new"),
            _legacy_simhash64(F.col("text"), hash_fn).alias("old"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert r.new == r.old, r.doc_id
