"""Physical-plan shape guards for the analytics operators — the scale
properties SCALE.md claims, pinned so a refactor can't silently
reintroduce the expensive shapes (double explode, global sort,
per-stage exchanges)."""

from __future__ import annotations

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_funnel_stages_share_one_user_exchange(spark):
    plan = _plan(entry.q_funnel_steps(spark, SF))
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert plan.count("Window [") == 3  # one per funnel stage


def test_pareto_uses_topk_not_global_sort(spark):
    plan = _plan(entry.q_pareto_customers(spark, SF))
    assert "TakeOrderedAndProject" in plan
    # the only ordering machinery is the TopK + the bounded cumulative
    # window; a full Sort + Exchange rangepartitioning would mean a
    # global sort of the customer aggregate
    assert "rangepartitioning" not in plan


def test_tfidf_explodes_tokens_once(spark):
    plan = _plan(entry.q_tfidf_top_terms(spark, SF))
    assert plan.count("Generate explode") == 1
    # top-k prunes per partition before the exchange
    assert "WindowGroupLimit" in plan


def test_cohort_reads_only_needed_columns(spark):
    plan = _plan(entry.q_cohort_retention(spark, SF))
    # column pruning reached the scan: events has 6 columns, the
    # cohort needs exactly ts + user_id
    assert "ReadSchema: struct<ts:" in plan.replace("timestamp_ntz", "") or (
        "user_id" in plan.split("ReadSchema")[1][:120]
    )
    scan_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "event_type" not in scan_schema and "props" not in scan_schema


def test_hopping_window_is_single_aggregate(spark):
    plan = _plan(entry.q_hopping_window_agg(spark, SF))
    assert plan.count("Exchange") == 1  # one shuffle for the groupBy
    assert "partial_count" in plan  # map-side partials before it
