"""Physical-plan shape guards for the round-7 relational completion
pack (q11/q17/q20/q21 adaptations) — pinning that Catalyst plans the
subquery shapes the way SCALE.md assumes: decorrelated aggregates,
semi/anti joins, no nested-loop re-execution per row."""

from __future__ import annotations

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = entry.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q17_correlated_avg_decorrelates(spark):
    plan = _plan(spark, "q17_small_qty_revenue")
    # the per-part 0.2*avg threshold must become aggregate + equi-join,
    # never a per-row re-execution of the subquery
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the decorrelated aggregate joins back on partkey
    join_lines = [
        ln for ln in plan.splitlines()
        if ("HashJoin" in ln or "SortMergeJoin" in ln) and "l_partkey" in ln
    ]
    assert join_lines, plan[:2000]


def test_q21_exists_pair_plans_semi_and_anti(spark):
    plan = _plan(spark, "q21_waiting_suppliers")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q20_nested_in_plans_semi_joins(spark):
    plan = _plan(spark, "q20_excess_suppliers")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q11_having_threshold_is_scalar_subquery(spark):
    plan = _plan(spark, "q11_important_stock")
    # the global threshold enters as a scalar subquery result, not a
    # join explosion; the only lineitem reads are the two aggregates
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") <= 2
