"""IVF serving-generation re-fit lifecycle (VERDICT r11 next #4).

The fold-lifecycle IVF index gains an automated re-fit: occupancy
accumulates from fold count-deltas, a skew trigger trains k-means on
everything folded, builds the next immutable generation, and swaps
the serving pointer atomically.  Pin: (a) refit-then-serve equals a
from-scratch trained build over the same data, (b) post-refit folds
assign to the TRAINED lists and the union stays exact under full
probing, (c) committed epochs keep replay-skipping across the swap,
(d) the streaming policy actually fires and advances the generation.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from cdp_spark.datapipe import similarity as sim
from cdp_spark.session import load_table

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return load_table(spark, SF, "embeddings").select("vec_id", "embedding")


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_refit_equals_from_scratch_trained_build(spark, tmp_path):
    emb = _emb(spark)
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    root = str(tmp_path / "serve")
    sim.ivf_serving_init(root, dim=64, n_centroids=8, seed=7)
    sim.ivf_serving_fold(emb.where(F.col("vec_id") % 2 == 0), root, epoch=0)
    sim.ivf_serving_fold(emb.where(F.col("vec_id") % 2 == 1), root, epoch=1)
    cents, counts = sim.ivf_serving_refit(spark, root, iters=2)
    assert sim.ivf_serving_path(root).endswith("gen-1")
    assert sum(counts.values()) == emb.count()

    served = _rows(
        sim.ivf_serving_topk(spark, root, qv, k=10, n_probe=4, round_digits=4)
    )
    scratch = str(tmp_path / "scratch")
    sim.ivf_kmeans_write(emb, scratch, dim=64, n_centroids=8, iters=2, seed=7)
    assert served == _rows(
        sim.ivf_kmeans_topk_indexed(
            spark, scratch, qv, k=10, n_probe=4, round_digits=4
        )
    )


def test_post_refit_folds_assign_to_trained_lists(spark, tmp_path):
    emb = _emb(spark)
    first = emb.where(F.col("vec_id") % 3 != 2)
    later = emb.where(F.col("vec_id") % 3 == 2)
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    root = str(tmp_path / "serve")
    sim.ivf_serving_init(root, dim=64, n_centroids=8, seed=7)
    sim.ivf_serving_fold(first, root, epoch=0)
    cents, _ = sim.ivf_serving_refit(spark, root, iters=2)
    sim.ivf_serving_fold(later, root, epoch=1)

    # the increment's rows landed in the trained argmin lists
    from cdp_spark.datapipe.dedup_index import _read_meta

    gen = sim.ivf_serving_path(root)
    meta = _read_meta(gen, "ivf")
    assert meta["centroids"] == [[float(x) for x in c] for c in cents]
    folded = spark.read.parquet(os.path.join(gen, "fold=e1"))
    expect = sim._ivf_meta_assign(later, meta).select("vec_id", "centroid")
    got = folded.select("vec_id", "centroid")
    assert sorted(_rows(got)) == sorted(_rows(expect))

    # probing ALL lists over the union is exact: equals brute force
    assert _rows(
        sim.ivf_serving_topk(spark, root, qv, k=10, n_probe=8,
                             round_digits=4)
    ) == _rows(sim.cosine_topk(emb, qv, k=10, round_digits=4))


def test_committed_epochs_skip_replay_across_the_swap(spark, tmp_path):
    emb = _emb(spark)
    b0 = emb.where(F.col("vec_id") % 2 == 0)
    root = str(tmp_path / "serve")
    sim.ivf_serving_init(root, dim=64, n_centroids=8, seed=7)
    sim.ivf_serving_fold(b0, root, epoch=0, lineage="s1")
    sim.ivf_serving_refit(spark, root, iters=1)
    gen = sim.ivf_serving_path(root)
    n_before = spark.read.parquet(gen).count()
    # replay of the pre-refit epoch: watermark carried -> no-op
    assert sim.ivf_serving_fold(b0, root, epoch=0, lineage="s1",
                                return_counts=True) is None
    assert spark.read.parquet(gen).count() == n_before


def test_post_refit_serving_prunes_partitions(spark, tmp_path):
    """The trained generation must keep the listing-time pruning: the
    served query's scan carries PartitionFilters on centroid and
    reads ONLY the probed lists — across both the refit-written base
    rows and a post-refit epoch fold."""
    emb = _emb(spark)
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    root = str(tmp_path / "serve")
    sim.ivf_serving_init(root, dim=64, n_centroids=8, seed=7)
    sim.ivf_serving_fold(emb.where(F.col("vec_id") % 2 == 0), root, epoch=0)
    sim.ivf_serving_refit(spark, root, iters=1)
    sim.ivf_serving_fold(emb.where(F.col("vec_id") % 2 == 1), root, epoch=1)
    out = sim.ivf_serving_topk(spark, root, qv, k=5, n_probe=2,
                               round_digits=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "centroid" in m.group(1), plan[:2000]
    assert out.count() == 5


def test_streaming_skew_policy_fires_and_advances_generation(
    spark, tmp_path
):
    from cdp_spark.streaming.fold_runner import run_ivf_serving_stream

    emb = _emb(spark)
    root = str(tmp_path / "serve")
    sim.ivf_serving_init(root, dim=64, n_centroids=8, seed=7)
    src = str(tmp_path / "src")
    emb.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    ckpt = str(tmp_path / "ckpt")
    # random anchors over real embeddings are never perfectly
    # balanced: a 1.05x-fair-share trigger fires on the fixture
    q = run_ivf_serving_stream(
        stream, root, checkpoint_dir=ckpt, available_now=True,
        refit_skew=1.05, refit_min_rows=10,
    )
    assert q.awaitTermination(300), "serving stream still running"
    occ = json.load(open(os.path.join(root, "_ivf_occupancy.json")))
    assert occ.get("refits", 0) >= 1
    assert not sim.ivf_serving_path(root).endswith("gen-0")
    assert occ["total"] == emb.count()
    # the served index holds every vector exactly once and serves
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    assert _rows(
        sim.ivf_serving_topk(spark, root, qv, k=10, n_probe=8,
                             round_digits=4)
    ) == _rows(sim.cosine_topk(emb, qv, k=10, round_digits=4))
