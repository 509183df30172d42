"""Physical-plan shape guards for the round-6 session-3 operators
(relational pack, sampling, SemDeDup, PageRank, DSIR) — pinning the
scale properties SCALE.md claims for them."""

from __future__ import annotations

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_reach_the_scan(spark):
    plan = _plan(entry.queries()["q6_revenue_change"](spark, SF))
    pushed = plan.split("PushedFilters: ")[1].split("]")[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed
    scan_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    # 4 needed columns only — no orderkey/partkey/flags
    assert "l_orderkey" not in scan_schema and "l_returnflag" not in scan_schema


def test_weighted_sample_rank_prunes_map_side(spark):
    plan = _plan(entry.q_weighted_sample(spark, SF))
    # WindowGroupLimit pushes the per-stratum top-k below the
    # exchange: ~k rows per partition move, not the orders table
    assert "WindowGroupLimit" in plan


def test_gumbel_and_aes_keys_are_codegen(spark):
    # the priority keys are pure expressions — no PythonUDF / BatchEval
    for q in (entry.q_weighted_sample, entry.q_dsir_sample):
        plan = _plan(q(spark, SF))
        assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_semantic_dedup_pairs_join_on_cluster_id(spark):
    plan = _plan(entry.q_semantic_dedup(spark, SF))
    # the pairwise stage must be an equi-join on cid, never a
    # cartesian/nested-loop over the vectors
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # some join line keys on cid (BHJ at tiny SF, SMJ at scale)
    join_lines = [
        ln for ln in plan.splitlines()
        if ("HashJoin" in ln or "SortMergeJoin" in ln) and "[cid" in ln
    ]
    assert join_lines, plan[:2000]


def test_pagerank_rank_updates_are_equi_joins(spark):
    plan = _plan(entry.q_pagerank_nations(spark, SF))
    # per-iteration rank joins are hash/SMJ equi-joins; the only
    # nested-loop joins are the broadcast SCALAR (node count) crosses
    assert "CartesianProduct" not in plan
    for frag in plan.split("BroadcastNestedLoopJoin")[1:]:
        # each BNLJ must be building on a single-row aggregate side
        assert "BuildRight" in frag[:80] or "BuildLeft" in frag[:80]


def test_dsir_scalars_are_one_broadcast_row(spark):
    plan = _plan(entry.q_dsir_sample(spark, SF))
    assert "PythonUDF" not in plan
    # corpus totals enter as a broadcast of ONE aggregated row, not a
    # re-scan per document
    assert "BroadcastNestedLoopJoin" in plan


def test_hll_union_merge_is_register_sized(spark):
    plan = _plan(entry.q_hll_union_entities(spark, SF))
    # the merge aggregates (register, max_rank) — grouping must be on
    # register, and both inputs partially aggregate before exchange
    assert "hashpartitioning(register" in plan


def test_triangle_edges_materialize_once(spark):
    # Spark inlines repeated CTE references (the shared-SQL text scans
    # lineitem 8x); the Spark-side implementation must materialize the
    # edge list once — the final plan reads only checkpointed RDDs
    plan = _plan(entry.q_triangle_count_nations(spark, SF))
    assert "FileScan parquet [l_" not in plan
    assert "Scan ExistingRDD" in plan
