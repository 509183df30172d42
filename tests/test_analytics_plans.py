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


def test_unigram_logprob_has_no_global_window(spark):
    """The corpus total must be a broadcast scalar cross join, never a
    Window.partitionBy() over the whole token frame."""
    plan = _plan(entry.q_unigram_logprob(spark, SF))
    assert "Window [" not in plan
    # the corpus total is a build-time literal, NOT a third pass over
    # the exploded tokens: exactly two explodes (vocabulary + scoring)
    # and no broadcast-nested-loop cross join for a scalar
    assert plan.count("Generate explode") == 2
    assert "BroadcastNestedLoopJoin" not in plan


def test_kmeans_assignment_is_shuffle_free(spark):
    """The returned fit: counts aggregate one shuffle on cid; the
    argmin assignment itself is a codegen projection (no exchange
    between scan and the partial aggregation)."""
    plan = _plan(entry.q_kmeans_centroids(spark, SF))
    # counts + the broadcast of the centroid frame; per-dim mean
    # updates already ran at build time (model state), so the SERVED
    # plan has exactly one hash exchange (the cid count)
    assert plan.count("Exchange hashpartitioning") == 1


def test_trained_ivf_probe_filters_before_scoring(spark):
    plan = _plan(entry.q_ann_ivf_kmeans(spark, SF))
    # probe filter is a pushable IN over the assignment's cid column,
    # and the top-k is TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


def test_multiband_exchanges_never_carry_vectors(spark):
    plan = _plan(entry.q_embedding_near_dup_multiband(spark, SF))
    exchanges = [ln for ln in plan.splitlines() if "hashpartitioning" in ln]
    assert exchanges, "expected shuffles for the candidate join"
    assert not any("embedding" in ln for ln in exchanges), exchanges


def test_hll_partial_aggregates_before_exchange(spark):
    # map-side combine collapses every partition to <= 2^p register
    # rows before the single exchange; the scan reads ONE column
    plan = _plan(entry.q_hll_distinct_users(spark, SF))
    assert "partial_max" in plan
    read = plan.split("ReadSchema")[1][:80]
    assert "user_id" in read and "event_type" not in read


def test_cms_probe_join_broadcasts_the_sketch(spark):
    # the sketch side is <= depth*width rows: must broadcast, never
    # shuffle the probe side against it
    plan = _plan(entry.q_cms_heavy_users(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_bloom_probe_join_broadcasts_positions(spark):
    plan = _plan(entry.q_bloom_filter_parts(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_near_dedup_corpus_anti_join_broadcasts_drop_list(spark):
    # the corpus is never shuffled: the (tiny) drop list broadcasts.
    # The drop side is a checkpointed RDD with no static stats, so the
    # sort-merge -> broadcast conversion is AQE's runtime call —
    # execute first and assert on the FINAL adaptive plan.
    df = entry.q_near_dedup_corpus(spark, SF)
    # count() builds a separate agg Dataset with its own execution;
    # collect() runs THIS Dataset's queryExecution so AQE finalizes it
    df.collect()
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_salted_totals_spread_over_salt_subkeys(spark):
    # phase 1 must exchange on (user_id, _salt) — the hot-key spread —
    # before the final user_id fold
    plan = _plan(entry.q_salted_user_totals(spark, SF))
    import re

    assert re.search(r"Exchange hashpartitioning\(user_id#\d+L, _salt", plan)
    assert plan.count("Exchange hashpartitioning(user_id") == 2
