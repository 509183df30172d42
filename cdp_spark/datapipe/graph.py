"""Distributed graph analytics over edge DataFrames.

Connected components (the dedup-cluster primitive) lives in
``datapipe/dedup.py``; this module adds fixed-iteration PageRank, the
other iterative-join workhorse (influence/centrality scoring over
similarity graphs, link graphs, interaction graphs).

Design: the power method expressed as DataFrame joins — per iteration
one equi-join of the rank frame with the transition frame (shuffle on
src) and one aggregation (shuffle on dst).  No collect() anywhere:
the node count enters the plan as a broadcast-scalar cross join, so
the whole computation stays declarative and Catalyst/AQE pick the
physical strategy per iteration.  With a fixed iteration count the
lineage depth is bounded (iters ~ 3-20); long chains are truncated
every ``checkpoint_every`` rounds with the stats-safe
``session.iter_checkpoint`` (see the connected-components loop in
dedup.py for why plain localCheckpoint is not enough).

Determinism (the repo-wide oracle discipline): every per-node sum
folds in DECIMAL(28,15) — exact, associative, order-independent —
and each iteration's ranks round to ``round_digits``, so partition
splits and engines cannot disagree.  The teleport term is an explicit
parameter (not computed as ``1 - damping``) because ``1 - 0.85`` is
not the double ``0.15`` — callers pin both sides exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import iter_checkpoint


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    iters: int = 3,
    damping: float = 0.85,
    teleport: float = 0.15,
    round_digits: int = 9,
    checkpoint_every: int = 8,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """Weighted PageRank with a fixed iteration count:

        pr_0(v)   = round(1/N, r)
        pr_t+1(v) = round(teleport/N
                          + damping * Σ_u pr_t(u) * w(u,v)/outw(u), r)

    Dangling mass (nodes with no out-edges) is dropped, not
    redistributed — the simple variant; normalize downstream if a
    proper distribution is needed.  Output: one row per node,
    columns (node, pr).

    Scale shape: the transition frame (src, dst, p) is computed once
    and reused every iteration; each round shuffles on src (join) and
    dst (agg) — both map-side combined.  At 100 TB pre-partition the
    transition frame by src and persist it so only the small rank
    frame moves per round.

    ``checkpoint_every``: every N rounds the rank frame is
    materialized via ``session.iter_checkpoint`` (stats-safe eager
    localCheckpoint).  The rank frame enters each round's plan once,
    so lineage depth and estimated-stats digits grow only LINEARLY
    per round (unlike connected components' 4-branch round body,
    which squares them) — but a long run (iters ~ 50+) would still
    accumulate a deep plan whose analysis/optimization cost grows
    per round, plus a full recompute-from-source on any partition
    loss.  Periodic truncation bounds both; results are unaffected
    (each iteration's ranks are rounded to ``round_digits``, so the
    values are identical with or without materialization).  Set 0 to
    disable (the 3-iteration oracled query never reaches the first
    checkpoint either way).

    Join-strategy note (ADVICE r7): after the first
    ``iter_checkpoint`` the rank frame's leaf carries
    ``defaultSizeInBytes`` (effectively infinite) stats, so the
    static planner will never pick it as the broadcast side again —
    the repo session runs with AQE enabled, and AQE's RUNTIME size of
    the materialized rank frame is what restores the
    broadcast/shuffle choice on later rounds.  When the node set is
    known to be broadcast-sized (similarity clusters, per-entity
    graphs — not web-scale link graphs), pass
    ``broadcast_ranks=True`` to pin the hint explicitly and keep the
    large transition frame from ever shuffling; the default stays
    False because PageRank's contract allows rank frames far beyond
    executor memory, where a forced broadcast would OOM.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n_df = nodes.agg(F.count(F.lit(1)).alias("_n"))
    outw = edges.groupBy(src).agg(
        F.round(F.sum(F.col(weight).cast("decimal(28,6)")), 6)
        .cast("double")
        .alias("_outw")
    )
    trans = edges.join(outw, src).select(
        F.col(src).alias("_src"),
        F.col(dst).alias("_dst"),
        (F.col(weight).cast("double") / F.col("_outw")).alias("_p"),
    )
    pr = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", F.round(F.lit(1.0) / F.col("_n"), round_digits).alias("pr")
    )
    for it in range(iters):
        ranks = pr.withColumnRenamed("node", "_src")
        if broadcast_ranks:
            ranks = F.broadcast(ranks)
        contribs = (
            trans.join(ranks, "_src")
            .select(
                F.col("_dst").alias("node"),
                (F.col("pr") * F.col("_p")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum(F.col("_c").cast("decimal(28,15)")).cast("double").alias("_s"))
        )
        pr = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                F.round(
                    F.lit(teleport) / F.col("_n")
                    + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0)),
                    round_digits,
                ).alias("pr"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            pr = iter_checkpoint(pr)
    return pr
