"""Product quantization: encoding determinism, ADC self-query
optimality, persisted-index equivalence.  Cross-engine value parity
is covered by test_oracle (ann_pq / ann_ivf_pq are oracled queries).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdp_spark.datapipe import similarity as sim
from cdp_spark.session import load_table

SF = "/root/testdata/sf0.001"


def test_pq_codes_shape_and_determinism(spark):
    emb = load_table(spark, SF, "embeddings").limit(50)
    coded = sim.pq_encode(emb, dim=64, n_sub=8, n_codes=16)
    rows = {r.vec_id: list(r.codes) for r in coded.select("vec_id", "codes").collect()}
    again = {
        r.vec_id: list(r.codes)
        for r in sim.pq_encode(emb, dim=64, n_sub=8, n_codes=16)
        .select("vec_id", "codes")
        .collect()
    }
    assert rows == again
    for codes in rows.values():
        assert len(codes) == 8
        assert all(0 <= c < 16 for c in codes)


def test_pq_self_query_achieves_min_adc(spark):
    """The query vector's own codes minimize every per-subvector LUT
    entry, so its row attains the global ADC minimum."""
    emb = load_table(spark, SF, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    top = sim.pq_topk(emb, qvec, k=5).collect()
    assert min(r.adc_dist for r in top) == top[0].adc_dist
    assert 0 in {r.vec_id for r in top}
    best = [r for r in top if r.vec_id == 0][0]
    assert best.adc_dist == top[0].adc_dist


def test_recall_at_k_against_bruteforce(spark):
    """Sanity: each approximation recovers a reasonable share of the
    exact top-10 on the test embeddings (thresholds are loose — the
    point is the measurement harness, not a tuning claim)."""
    emb = load_table(spark, SF, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = sim.cosine_topk(emb, qvec, k=10)
    assert sim.recall_at_k(exact, exact) == 1.0
    pq = sim.pq_topk(emb, qvec, k=10)
    ivf = sim.ivf_topk(emb, qvec, k=10, n_centroids=16, n_probe=4)
    assert sim.recall_at_k(ivf, exact) >= 0.3
    assert sim.recall_at_k(pq, exact) >= 0.1


def test_ivf_pq_indexed_equals_inline(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    inline = [tuple(r) for r in sim.ivf_pq_topk(emb, qvec, k=10).collect()]
    path = str(tmp_path / "ivfpq")
    sim.ivf_pq_write(emb, path, dim=64)
    indexed = [tuple(r) for r in sim.ivf_pq_topk_indexed(spark, path, qvec, k=10).collect()]
    assert inline == indexed
    # the index must not carry embeddings — codes-only IO is the point
    cols = spark.read.parquet(path).columns
    assert "embedding" not in cols and set(cols) >= {"vec_id", "codes", "centroid"}
