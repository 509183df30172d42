"""Connected-components dedup clustering + deterministic stratified
sampling (training-data curation operators)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdp_spark.datapipe.dedup import connected_components
from cdp_spark.datapipe.sampling import (
    hash_bucket_hex,
    rate_to_hex_threshold,
    stratified_sample,
)


def _components(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components(df).collect()
    return {r["id"]: r["component"] for r in rows}


def test_two_components(spark):
    comp = _components(spark, [(1, 2), (2, 3), (10, 11)])
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_multi_hop(spark):
    # path graph 0-1-2-...-40: worst case for plain propagation;
    # pointer jumping must still converge inside max_iter
    comp = _components(spark, [(i, i + 1) for i in range(40)])
    assert set(comp.values()) == {0}
    assert len(comp) == 41


def test_iter_checkpoint_stats_stay_bounded(spark):
    # Spark 4's localCheckpoint copies the origin plan's ESTIMATED
    # sizeInBytes onto the new leaf; CC's round body references the
    # label frame in four join branches, so the size-only product
    # estimate squares per round and its BigInt digit count DOUBLES
    # per iteration — by round ~20 the driver burns minutes
    # multiplying 100M-digit integers in stats estimation (found by
    # the r7 10x scale probe).  iter_checkpoint resets the leaf to
    # default stats; this pins that a long chain (many pointer-jump
    # rounds) leaves the result's estimate at a sane magnitude.
    df = spark.createDataFrame([(i, i + 1) for i in range(400)], "src long, dst long")
    out = connected_components(df)
    digits = len(
        str(out._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    assert digits < 40, f"carried-over stats blowup: {digits} digits"
    assert out.filter(F.col("component") != 0).count() == 0


def test_star_and_cycle(spark):
    comp = _components(spark, [(5, 1), (5, 2), (5, 3), (7, 8), (8, 9), (9, 7)])
    assert comp[1] == comp[2] == comp[3] == comp[5] == 1
    assert comp[7] == comp[8] == comp[9] == 7


def test_direction_irrelevant(spark):
    assert _components(spark, [(2, 1), (3, 2)]) == {1: 1, 2: 1, 3: 1}


def test_rate_to_hex_threshold():
    assert rate_to_hex_threshold(0.0) == "0000"
    assert rate_to_hex_threshold(0.25) == "4000"
    assert rate_to_hex_threshold(0.5) == "8000"
    assert rate_to_hex_threshold(1.0) == "gggg"
    # near-1 rates clamp below the full space instead of wrapping to 0
    assert rate_to_hex_threshold(0.99999) == "ffff"
    with pytest.raises(ValueError):
        rate_to_hex_threshold(1.5)


def _docs(spark, n=400):
    return spark.createDataFrame(
        [(i, ["web", "books", "wiki"][i % 3]) for i in range(n)],
        "doc_id long, source string",
    )


def test_stratified_sample_rates_and_determinism(spark):
    docs = _docs(spark)
    rates = {"books": 1.0, "web": 0.5, "wiki": 0.0}
    out = stratified_sample(docs, "doc_id", "source", rates)
    by_source = {
        r["source"]: r["cnt"]
        for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_source.get("books") == 133  # all of them (i % 3 == 1 over 0..399)
    assert by_source.get("wiki") is None  # rate 0
    web = by_source.get("web", 0)
    assert 40 <= web <= 94  # ~50% of 133, binomial spread
    # deterministic: identical selection on rerun
    again = stratified_sample(docs, "doc_id", "source", rates)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_stratified_sample_extensible(spark):
    # raising a rate keeps every previously selected row
    docs = _docs(spark)
    small = {
        r["doc_id"]
        for r in stratified_sample(docs, "doc_id", "source", {"web": 0.2}).collect()
    }
    large = {
        r["doc_id"]
        for r in stratified_sample(docs, "doc_id", "source", {"web": 0.6}).collect()
    }
    assert small <= large


def test_default_rate_applies_to_unlisted_strata(spark):
    docs = _docs(spark, 300)
    out = stratified_sample(
        docs, "doc_id", "source", {"books": 0.0}, default_rate=1.0
    )
    sources = {r["source"] for r in out.select("source").distinct().collect()}
    assert sources == {"web", "wiki"}


def test_hash_bucket_is_fixed_width_hex(spark):
    rows = (
        _docs(spark, 50)
        .select(hash_bucket_hex(F.col("doc_id")).alias("b"))
        .collect()
    )
    assert all(len(r["b"]) == 4 and all(c in "0123456789abcdef" for c in r["b"]) for r in rows)


def test_dataset_mix_epochs(spark):
    from cdp_spark.datapipe.sampling import dataset_mix

    docs = _docs(spark, 300)  # 100 each of web/books/wiki
    out = dataset_mix(docs, "doc_id", "source", {"books": 2.0, "web": 0.5})
    counts = {
        (r["source"], r["epoch"]): r["cnt"]
        for r in out.groupBy("source", "epoch").agg(F.count("*").alias("cnt")).collect()
    }
    # books: exactly 2 full epochs of all 100 docs
    assert counts[("books", 1)] == 100 and counts[("books", 2)] == 100
    assert ("books", 3) not in counts
    # web: one fractional epoch of ~half
    assert 30 <= counts[("web", 1)] <= 70
    assert ("web", 2) not in counts
    # wiki absent from weights -> dropped entirely
    assert not any(s == "wiki" for s, _ in counts)
    # deterministic
    again = dataset_mix(docs, "doc_id", "source", {"books": 2.0, "web": 0.5})
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_dataset_mix_fractional_subset_of_full(spark):
    from cdp_spark.datapipe.sampling import dataset_mix

    docs = _docs(spark, 150)
    half = {
        r["doc_id"]
        for r in dataset_mix(docs, "doc_id", "source", {"web": 0.4}).collect()
    }
    more = {
        r["doc_id"]
        for r in dataset_mix(docs, "doc_id", "source", {"web": 0.9}).collect()
    }
    assert half <= more


def test_near_dedup_survivors_keeps_one_per_cluster(spark):
    from cdp_spark.datapipe.dedup import near_dedup_survivors

    # corpus 1..8; clusters {1,2,3} and {5,6}; 4,7,8 never linked
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(1, 9)], "doc_id long, text string"
    )
    edges = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "src long, dst long")
    comp = connected_components(edges)
    out = near_dedup_survivors(docs, "doc_id", comp)
    assert {r["doc_id"] for r in out.collect()} == {1, 4, 5, 7, 8}
    # idempotent: re-running dedup over the survivors changes nothing
    again = near_dedup_survivors(out, "doc_id", comp)
    assert again.count() == out.count()


def test_incremental_near_dups_never_pairs_old_with_old(spark):
    from cdp_spark.datapipe.dedup import incremental_near_dups

    # docs 1,2 are OLD near-identical twins; 10 is a NEW copy of 1;
    # 11 a NEW copy of 10; 20 NEW and unique.
    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, text), (2, text),              # old twins: must NOT be flagged
        (10, text), (11, text),            # new copies
        (20, "totally different words here nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: (r["dup_of"], r["jaccard"]) for r in incremental_near_dups(
        df, "doc_id", "text",
        is_new_col=(F.col("doc_id") >= 10),
        threshold=0.8, num_perm=32, bands=8,
    ).collect()}
    # only NEW ids appear, old-old dup (1,2) is never reported
    assert set(out) == {10, 11}
    # precedence: old partners win over new ones (10's dup_of is an
    # old doc, not 11); 11 could match either but old still wins
    assert out[10][0] in (1, 2) and out[11][0] in (1, 2)
    assert out[10][1] == 1.0


# ---------------------------------------------------------------------------
# winnowing exact-substring dedup (r8)


def test_winnow_guarantee_shared_long_substring(spark):
    """Winnowing's core property (Schleimer et al. 2003): any two
    documents sharing an exact substring of length >= k + w - 1 share
    at least one selected fingerprint."""
    from cdp_spark.datapipe import dedup as ddp

    shared = "the quick brown fox jumps over the lazy dog near the river"
    df = spark.createDataFrame(
        [
            (1, "PREFIX AAA " + shared + " SUFFIX BBB"),
            (2, "completely different framing text " + shared),
            (3, "no overlap with anything else whatsoever in this row"),
        ],
        "doc_id long, text string",
    )
    k, w = 20, 8
    assert len(shared) >= k + w - 1
    fps = {
        r["doc_id"]: set(r["f"])
        for r in df.select(
            "doc_id",
            ddp.winnow_fingerprints(F.col("text"), k=k, w=w).alias("f"),
        ).collect()
    }
    assert fps[1] & fps[2], "guaranteed shared fingerprint missing"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_winnow_short_doc_edges(spark):
    from cdp_spark.datapipe import dedup as ddp

    df = spark.createDataFrame(
        [(1, "ab"), (2, "abcdef"), (3, "")],
        "doc_id long, text string",
    )
    # k=5: doc 1 and 3 too short -> no fingerprints; doc 2 has 2 grams
    # (< w) -> exactly one fingerprint (the whole-doc window minimum)
    rows = {
        r["doc_id"]: r["f"]
        for r in df.select(
            "doc_id",
            ddp.winnow_fingerprints(F.col("text"), k=5, w=3).alias("f"),
        ).collect()
    }
    assert rows[1] == [] and rows[3] == []
    assert len(rows[2]) == 1


def test_exact_substring_pairs_max_df_drops_boilerplate(spark):
    """A fingerprint present in more than max_df docs must not
    generate pairs (stop-gram discipline), while rare shared
    substrings still pair."""
    from cdp_spark.datapipe import dedup as ddp

    boiler = "this exact boilerplate license header appears everywhere"
    rare = "a genuinely distinctive shared passage of text right here"
    rows = [(i, f"doc {i} unique padding {i} " + boiler) for i in range(1, 6)]
    rows += [(10, "X " + rare), (11, "Y " + rare)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ddp.exact_substring_pairs(
        df, "doc_id", "text", k=20, w=8, max_df=3
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (10, 11) in got
    # the boilerplate quintet (df=5 > 3) must contribute no pairs
    assert not any(a < 10 and b < 10 for a, b in got)


def test_exact_substring_dedup_corpus_keeps_min_id(spark):
    from cdp_spark.datapipe import dedup as ddp

    shared = "one very long duplicated passage that links these docs"
    df = spark.createDataFrame(
        [
            (5, "AA " + shared),
            (2, "BB " + shared),
            (9, "unrelated text with no duplication in it at all okay"),
        ],
        "doc_id long, text string",
    )
    surv = sorted(
        r["doc_id"]
        for r in ddp.exact_substring_dedup_corpus(
            df, "doc_id", "text", k=20, w=8
        ).collect()
    )
    assert surv == [2, 9]
