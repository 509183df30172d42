"""Semantics tests for cdp_spark.datapipe.analytics — hand-built
fixtures pin the edge cases the sf-data oracles can't isolate (strict
funnel ordering, cohort week boundaries, Pareto tie-breaks)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cdp_spark.datapipe import analytics


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, value double"
    )


def test_funnel_strict_ordering(spark):
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        # u1 completes in order: view < click < purchase
        (1, "view", t(0), 1.0),
        (1, "click", t(1), 1.0),
        (1, "purchase", t(2), 1.0),
        # u2 clicks BEFORE its first view: click must not count
        (2, "click", t(0), 1.0),
        (2, "view", t(1), 1.0),
        # u3 purchases before clicking: purchase must not count
        (3, "view", t(0), 1.0),
        (3, "purchase", t(1), 1.0),
        (3, "click", t(2), 1.0),
        # u4 never views
        (4, "click", t(0), 1.0),
        (4, "purchase", t(1), 1.0),
    ]
    out = analytics.funnel(_events(spark, rows), ["view", "click", "purchase"])
    got = {r["step"]: r["n_users"] for r in out.collect()}
    assert got == {"1:view": 3, "2:click": 2, "3:purchase": 1}


def test_funnel_requalification_uses_first_stage_time(spark):
    # a second view cannot "re-open" the funnel: only events after the
    # FIRST view count for clicks
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        (1, "click", t(0), 1.0),
        (1, "view", t(1), 1.0),
        (1, "click", t(2), 1.0),  # after first view -> qualifies
    ]
    out = analytics.funnel(_events(spark, rows), ["view", "click"])
    got = {r["step"]: r["n_users"] for r in out.collect()}
    assert got == {"1:view": 1, "2:click": 1}


def test_cohort_retention_week_boundaries(spark):
    # 2024-01-01 is a Monday: users cohort on their first week and are
    # counted once per distinct active week
    rows = [
        (1, "view", dt.datetime(2024, 1, 1, 12), 1.0),   # wk0
        (1, "view", dt.datetime(2024, 1, 3, 9), 1.0),    # wk0 again (dedup)
        (1, "view", dt.datetime(2024, 1, 8, 1), 1.0),    # wk1
        (2, "view", dt.datetime(2024, 1, 9, 5), 1.0),    # cohort wk of Jan 8
    ]
    out = analytics.cohort_retention(_events(spark, rows))
    got = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in out.collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
    }


def test_value_histogram_bins(spark):
    rows = [
        (1, "view", dt.datetime(2024, 1, 1), 0.0),
        (1, "view", dt.datetime(2024, 1, 1), 24.99),
        (1, "view", dt.datetime(2024, 1, 1), 25.0),
        (1, "view", dt.datetime(2024, 1, 1), None),
    ]
    out = analytics.value_histogram(_events(spark, rows), width=25.0)
    got = {r["bin_start"]: r["n_events"] for r in out.collect()}
    assert got == {0.0: 2, 25.0: 1}


def test_pareto_tie_break_and_share(spark):
    orders = spark.createDataFrame(
        [(1, 100.0), (2, 100.0), (3, 50.0), (4, 250.0)],
        "o_custkey long, o_totalprice double",
    )
    out = analytics.pareto_top_customers(orders, top=3).collect()
    assert [r["custkey"] for r in out] == [4, 1, 2]  # ties by custkey
    assert out[0]["cum_share"] == 0.5
    assert out[2]["cum_share"] == 0.9


def test_embedding_centroids(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 3.0], 0), (2, [3.0, 5.0], 0), (3, [10.0, 20.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    out = analytics.embedding_centroids(emb)
    got = {(r["label"], r["dim"]): (r["avg_x"], r["n"]) for r in out.collect()}
    assert got == {
        (0, 1): (2.0, 2),
        (0, 2): (4.0, 2),
        (1, 1): (10.0, 1),
        (1, 2): (20.0, 1),
    }


def test_bm25_topk_ranking_and_saturation(spark):
    docs = spark.createDataFrame(
        [
            (1, "hash join hash join extra words here"),   # both terms, tf=2 each
            (2, "hash filler filler filler filler filler"),  # one term, long doc
            (3, "hash"),                                   # one term, short doc
            (4, "nothing relevant at all"),                # no terms -> unscored
        ],
        "doc_id long, text string",
    )
    out = analytics.bm25_topk(docs, ["hash", "join"], k=10)
    rows = out.collect()
    by_id = {r["doc_id"]: r for r in rows}
    # doc 4 matches nothing and is not scored
    assert 4 not in by_id and len(rows) == 3
    # matching both query terms beats matching one
    assert by_id[1]["n_matched"] == 2
    assert by_id[1]["bm25"] > by_id[2]["bm25"]
    # length normalization: same tf in a shorter doc scores higher
    assert by_id[3]["bm25"] > by_id[2]["bm25"]
    # ordering is score desc then id asc
    scores = [(r["bm25"], r["doc_id"]) for r in rows]
    assert scores == sorted(scores, key=lambda t: (-t[0], t[1]))


def test_bm25_topk_queries_matches_per_query_single(spark):
    """Multi-query BM25 must equal running bm25_topk per query
    (same corpus-level df/idf, same rounding), dedupe repeated query
    terms, and ignore terms absent from the corpus."""
    docs = spark.createDataFrame(
        [
            (1, "hash join hash join extra words here"),
            (2, "hash filler filler filler filler filler"),
            (3, "hash"),
            (4, "nothing relevant at all"),
            (5, "join merge join sort words"),
        ],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame(
        [
            ("a", ["hash", "join"]),
            # duplicate term + a term not in the corpus
            ("b", ["merge", "merge", "watermark"]),
        ],
        "query_id string, terms array<string>",
    )
    out = analytics.bm25_topk_queries(docs, qdf, k=10).collect()
    got = {
        (r["query_id"], r["doc_id"]): (r["n_matched"], r["bm25"]) for r in out
    }
    for qid, terms in (("a", ["hash", "join"]), ("b", ["merge"])):
        solo = analytics.bm25_topk(docs, terms, k=10).collect()
        want = {(qid, r["doc_id"]): (r["n_matched"], r["bm25"]) for r in solo}
        assert {k: v for k, v in got.items() if k[0] == qid} == want
    # per-query top-k: k=1 keeps exactly one (the best) doc per query
    top1 = analytics.bm25_topk_queries(docs, qdf, k=1).collect()
    assert sorted(r["query_id"] for r in top1) == ["a", "b"]


def test_bm25_topk_queries_plan_broadcasts_terms(spark):
    """The scale contract: query-term joins broadcast (adding queries
    must not reshuffle the corpus) and per-query top-k plans as a
    WindowGroupLimit, not a global sort."""
    docs = spark.createDataFrame(
        [(1, "hash join"), (2, "hash")], "doc_id long, text string"
    )
    qdf = spark.createDataFrame(
        [("a", ["hash"])], "query_id string, terms array<string>"
    )
    plan = (
        analytics.bm25_topk_queries(docs, qdf, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    # qterms, dfc, and the semi-join term filter are all hinted: at
    # least 3 broadcast joins.  (The tf-doclen join is deliberately
    # NOT pinned — big-big at corpus scale, AQE's call.)
    assert plan.count("BroadcastHashJoin") >= 3


def test_top_terms_per_doc_ranking(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "cherry cherry common"),
        ],
        "doc_id long, text string",
    )
    out = analytics.top_terms_per_doc(docs, k=2)
    rows = {(r["doc_id"], r["rank"]): r["term"] for r in out.collect()}
    # doc 1: apple tf=2 df=1 -> 6.0 beats banana (tf=1 df=2 -> 1.5)
    assert rows[(1, 1)] == "apple"
    # doc 3: cherry tf=2 df=2 -> 3.0 beats common (tf=1 df=3 -> 1.0)
    assert rows[(3, 1)] == "cherry"
    # ties broken alphabetically: doc 2 banana/cherry both tf=1 df=2
    assert rows[(2, 1)] == "banana"
