"""PageRank, A-ES weighted sampling, and SemDeDup semantic dedup —
the round-6 graph/curation additions."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from cdp_spark.datapipe.graph import pagerank
from cdp_spark.datapipe.sampling import weighted_sample
from cdp_spark.datapipe.similarity import semantic_dedup


# ---------------------------------------------------------------- pagerank


def _pr(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    return {r["node"]: r["pr"] for r in pagerank(df, **kw).collect()}


def test_pagerank_checkpoint_every_preserves_values(spark):
    # periodic stats-safe truncation (iter_checkpoint) must be
    # value-invariant: each round's ranks are rounded to round_digits
    # before the next round, so materializing is a no-op numerically.
    edges = [("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 1.0), ("a", "c", 0.5)]
    plain = _pr(spark, edges, iters=10, checkpoint_every=0)
    ckpt = _pr(spark, edges, iters=10, checkpoint_every=3)
    assert ckpt == plain


def test_pagerank_symmetric_pair_is_uniform(spark):
    # two nodes pointing at each other: stationary distribution is
    # uniform regardless of damping
    pr = _pr(spark, [("a", "b", 1.0), ("b", "a", 1.0)], iters=5)
    assert pr["a"] == pytest.approx(0.5, abs=1e-9)
    assert pr["b"] == pytest.approx(0.5, abs=1e-9)


def test_pagerank_sink_attracts_mass(spark):
    # star into "hub" (hub has a self-loop so nothing dangles):
    # hub must outrank every spoke
    edges = [("s1", "hub", 1.0), ("s2", "hub", 1.0), ("s3", "hub", 1.0),
             ("hub", "hub", 1.0)]
    pr = _pr(spark, edges, iters=3)
    assert pr["hub"] > pr["s1"] == pr["s2"] == pr["s3"]


def test_pagerank_mass_conserved_without_dangling(spark):
    # every node has out-edges -> total mass stays 1 (up to rounding)
    edges = [("a", "b", 2.0), ("b", "c", 1.0), ("c", "a", 3.0),
             ("a", "c", 1.0)]
    pr = _pr(spark, edges, iters=4)
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_weight_bias(spark):
    # a splits 3:1 between b and c; b and c both return to a.
    # b must collect ~3x c's inbound contribution.
    edges = [("a", "b", 3.0), ("a", "c", 1.0),
             ("b", "a", 1.0), ("c", "a", 1.0)]
    pr = _pr(spark, edges, iters=6)
    assert pr["b"] > pr["c"]
    # contribution ratio from a is exactly 3 (teleport dilutes the
    # final rank ratio below 3)
    assert (pr["b"] - 0.05) / (pr["c"] - 0.05) == pytest.approx(3.0, rel=0.05)


def test_pagerank_matches_dense_reference(spark):
    # hand-rolled dense power method with the same rounding discipline
    edges = [("a", "b", 1.0), ("b", "c", 2.0), ("b", "a", 1.0),
             ("c", "a", 5.0)]
    nodes = ["a", "b", "c"]
    outw = {"a": 1.0, "b": 3.0, "c": 5.0}
    p = {("a", "b"): 1.0 / 1.0, ("b", "c"): 2.0 / 3.0,
         ("b", "a"): 1.0 / 3.0, ("c", "a"): 5.0 / 5.0}
    pr = {n: round(1.0 / 3, 9) for n in nodes}
    for _ in range(3):
        nxt = {}
        for v in nodes:
            s = sum(pr[u] * p[(u, w)] for (u, w) in p if w == v)
            nxt[v] = round(0.15 / 3 + 0.85 * s, 9)
        pr = nxt
    got = _pr(spark, edges, iters=3)
    for n in nodes:
        assert got[n] == pytest.approx(pr[n], abs=1e-9), n


# ---------------------------------------------------------- weighted_sample


def _orders(spark, n=200):
    rows = [(i, "g" + str(i % 2), float(1 + (i % 7))) for i in range(n)]
    return spark.createDataFrame(rows, "id long, grp string, w double")


def test_weighted_sample_is_deterministic(spark):
    df = _orders(spark)
    a = sorted(r["id"] for r in weighted_sample(df, "id", "w", 10, "grp").collect())
    b = sorted(r["id"] for r in weighted_sample(df, "id", "w", 10, "grp").collect())
    assert a == b and len(a) == 20  # 10 per each of 2 strata


def test_weighted_sample_k_bound_per_stratum(spark):
    df = _orders(spark, 50)
    out = weighted_sample(df, "id", "w", 5, "grp")
    counts = {r["grp"]: r["n"] for r in
              out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"g0": 5, "g1": 5}


def test_weighted_sample_matches_bruteforce(spark):
    # replicate the A-ES key in plain python and check membership
    df = _orders(spark, 120)
    k = 8
    got = sorted(r["id"] for r in
                 weighted_sample(df, "id", "w", k, "grp").collect())
    keys = []
    for i in range(120):
        u = (int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
             % 1048573 + 1) / 1048574.0
        keys.append((("g" + str(i % 2)), round(-math.log(u) / (1 + i % 7), 6), i))
    want = []
    for g in ("g0", "g1"):
        grp = sorted((t for t in keys if t[0] == g), key=lambda t: (t[1], t[2]))
        want += [t[2] for t in grp[:k]]
    assert got == sorted(want)


def test_weighted_sample_unstratified(spark):
    df = _orders(spark, 60)
    out = weighted_sample(df, "id", "w", 7)
    assert out.count() == 7


def test_weighted_sample_bias_toward_heavy_weights(spark):
    # weights 100 vs 1: the heavy stratum of ids must dominate the
    # sample (probabilistic in design, deterministic in this fixture)
    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = [r["id"] for r in weighted_sample(df, "id", "w", 20).collect()]
    heavy = sum(1 for i in got if i < 50)
    # 5% of rows hold ~84% of the mass; uniform sampling would give
    # ~1 heavy pick in 20 — a clear majority proves the weight bias
    # (deterministically 13 with the current hash constants)
    assert heavy >= 10


# ----------------------------------------------------------- semantic_dedup


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_drops_near_twins_min_id_wins(spark):
    # 0 and 1 nearly identical; 2 orthogonal.  k=1 puts everything in
    # one cluster -> pair (0,1) crosses the threshold -> 1 dropped.
    vecs = [[1.0, 0.0, 0.0], [0.999, 0.01, 0.0], [0.0, 1.0, 0.0]]
    out = {r["vec_id"]: r["keep"]
           for r in semantic_dedup(_emb(spark, vecs), dim=3, k=1,
                                   iters=1, threshold=0.95).collect()}
    assert out == {0: True, 1: False, 2: True}


def test_semantic_dedup_high_threshold_keeps_all(spark):
    vecs = [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0]]
    out = semantic_dedup(_emb(spark, vecs), dim=2, k=1, iters=1,
                         threshold=1.01)
    assert all(r["keep"] for r in out.collect())


def test_semantic_dedup_cluster_isolation(spark):
    # identical vectors in DIFFERENT clusters are never compared:
    # with k=2 and two tight opposite groups, twins within a group
    # drop but the groups don't interact
    vecs = [[1.0, 0.0], [1.0, 0.0], [-1.0, 0.0], [-1.0, 0.0]]
    out = {r["vec_id"]: (r["cid"], r["keep"])
           for r in semantic_dedup(_emb(spark, vecs), dim=2, k=2,
                                   iters=2, threshold=0.95).collect()}
    # one keeper per cluster, min id wins inside each
    keeps = [vid for vid, (_, kp) in out.items() if kp]
    assert len(keeps) == 2 and 0 in keeps
    assert out[0][1] and not out[1][1]


# ------------------------------------------------------- gumbel_topk / DSIR


def test_gumbel_topk_matches_bruteforce(spark):
    from cdp_spark.datapipe.sampling import gumbel_topk

    rows = [(i, float(i % 5) - 2.0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, score double")
    got = sorted(r["id"] for r in gumbel_topk(df, "id", "score", 10).collect())
    keys = []
    for i, s in rows:
        u = (int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
             % 1048573 + 1) / 1048574.0
        keys.append((round(s - math.log(-math.log(u)), 6), -i))
    keys.sort(reverse=True)
    want = sorted(-neg for _, neg in keys[:10])
    assert got == want


def test_gumbel_topk_biases_toward_high_scores(spark):
    from cdp_spark.datapipe.sampling import gumbel_topk

    # score gap of 5 nats ~ 150x likelihood ratio: the high-score
    # half must dominate the sample
    rows = [(i, 5.0 if i % 2 == 0 else 0.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, score double")
    got = [r["id"] for r in gumbel_topk(df, "id", "score", 20).collect()]
    # uniform sampling would give ~10 even ids; deterministically 16
    # with the current hash constants
    assert sum(1 for i in got if i % 2 == 0) >= 14


def test_dsir_logratio_prefers_target_like_docs(spark):
    from cdp_spark.datapipe.text import dsir_logratio
    from pyspark.sql import functions as F

    rows = (
        # target: about cats
        [(i, "cat feline purr cat whiskers", True) for i in range(10)]
        # pool doc 100 looks like the target, 101 does not
        + [(100, "cat purr feline cat", False),
           (101, "stock market futures trading", False)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    out = {r["doc_id"]: r["logratio"]
           for r in dsir_logratio(df, F.col("is_t")).collect()}
    assert set(out) == {100, 101}  # pool only
    assert out[100] > 0 > out[101]


def test_weighted_sample_large_ids_no_overflow(spark):
    # ids >= 2^33 would overflow an id*CONST multiplicative hash
    # (Spark wraps silently, DuckDB errors); the md5-based uniform
    # must handle snowflake-scale ids with finite keys
    base = 1 << 60
    rows = [(base + i, 1.0 + i) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, w double")
    out = weighted_sample(df, "id", "w", 5)
    got = out.collect()
    assert len(got) == 5
    assert all(r["aes_key"] is not None and r["aes_key"] > 0 for r in got)


def test_weighted_sample_excludes_nonpositive_weights(spark):
    # w=0 would make -ln(u)/w NULL (selected with certainty under
    # Spark's NULLS FIRST); w<=0 rows must simply never be sampled
    rows = [(1, 0.0), (2, -3.0), (3, 1.0), (4, 2.0), (5, 1.5)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = sorted(r["id"] for r in weighted_sample(df, "id", "w", 3).collect())
    assert got == [3, 4, 5]


def test_leakage_safe_split_never_straddles_clusters(spark):
    """r9: split is a pure function of the cluster label, so no
    cluster may span two splits, every doc is assigned, and the
    empirical fractions sit near the requested 80/10/10."""
    import __spark_entry__ as entrymod
    from cdp_spark.datapipe.sampling import leakage_safe_split
    from cdp_spark.session import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    docs = load_table(spark, sf, "documents")
    comp = entrymod.q_dup_clusters(spark, sf)
    full = docs.select("doc_id").join(comp, "doc_id", "left").withColumn(
        "component", F.coalesce(F.col("component"), F.col("doc_id"))
    )
    assigned = leakage_safe_split(full, "component")
    # every document assigned exactly once
    assert assigned.count() == docs.count()
    # no cluster straddles splits
    straddle = (
        assigned.groupBy("component")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert straddle == 0
    # fractions in the right ballpark (cluster-level hashing is
    # coarser than doc-level, so allow wide tolerance)
    by = {r["split"]: r["cnt"] for r in
          assigned.groupBy("split").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    total = sum(by.values())
    assert 0.6 <= by.get("train", 0) / total <= 0.95
    assert by.get("val", 0) > 0 and by.get("test", 0) > 0


def test_leakage_safe_split_rejects_bad_fractions(spark):
    import pytest as _pytest
    from cdp_spark.datapipe.sampling import leakage_safe_split

    df = spark.createDataFrame([(1,)], "component long")
    with _pytest.raises(ValueError, match="sum to 1"):
        leakage_safe_split(df, "component", {"train": 0.5, "val": 0.2})
