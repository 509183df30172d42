"""token_budget_sample: the bucketed distributed plan must equal the
naive per-stratum running-sum window, selections must be extensible
(a bigger budget only adds), and every stratum that can reach the
budget does."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cdp_spark.datapipe.sampling import token_budget_sample
from cdp_spark.datapipe.text import tokens
from cdp_spark.session import load_table

SF = "/root/testdata/sf0.001"


def _naive(docs, budget):
    """The single-window formulation the oracle replays."""
    base = docs.where(F.length(F.trim("text")) > 0).select(
        "doc_id",
        "lang",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string").cast("binary")).alias("_key"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .where(F.col("cum_tokens") - F.col("n_tokens") < budget)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_bucketed_equals_naive_window(spark):
    docs = load_table(spark, SF, "documents")
    for budget in (1, 500, 2000, 10**9):
        got = _rows(token_budget_sample(docs, "doc_id", "text", "lang", budget))
        assert got == _rows(_naive(docs, budget)), f"budget={budget}"


def test_budget_monotone_and_reached(spark):
    docs = load_table(spark, SF, "documents")
    small = _rows(token_budget_sample(docs, "doc_id", "text", "lang", 800))
    big = _rows(token_budget_sample(docs, "doc_id", "text", "lang", 2000))
    assert {t[0] for t in small} <= {t[0] for t in big}, "not extensible"
    # every stratum reaches the budget (all fixture langs have > 2000
    # tokens) and stops at the crossing doc
    per = (
        token_budget_sample(docs, "doc_id", "text", "lang", 2000)
        .groupBy("lang")
        .agg(F.max("cum_tokens").alias("got"), F.count("*").alias("n"))
        .collect()
    )
    assert len(per) == 5
    for r in per:
        assert r["got"] >= 2000, r
    # the crossing doc is included, nothing after it: cum - n < budget
    # for every selected row is the definition; check the boundary
    sel = token_budget_sample(docs, "doc_id", "text", "lang", 2000)
    bad = sel.where(F.col("cum_tokens") - F.col("n_tokens") >= 2000).count()
    assert bad == 0


def test_rejects_non_divisor_buckets(spark):
    import pytest

    docs = load_table(spark, SF, "documents")
    with pytest.raises(ValueError, match="order-preserving"):
        token_budget_sample(docs, "doc_id", "text", "lang", 100, n_buckets=48)
