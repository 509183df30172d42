"""Round-16 relational-analytics/time-series pack contracts:
a-priori association rules, SCD2 gaps-and-islands compaction, MAD
modified-z outliers, Holt double exponential smoothing, the
distributed-rank NTILE profile, and the key-skew diagnostics.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from cdp_spark.datapipe import analytics as an


def _ts(i: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i)


# ---------------------------------------------------------------- assoc


def _baskets(spark):
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
        # duplicate line in a basket must not double-count the pair
        (2, "a"),
    ]
    return spark.createDataFrame(rows, ["b", "i"])


def test_association_rules_counts_and_metrics(spark):
    """Hand corpus: pairs (a,b) and (a,c) co-occur twice, (b,c) once
    — min_pair_count=2 keeps exactly the two, with textbook support /
    confidence / lift off the raw counts (4 baskets; a:3 b:3 c:2)."""
    out = {
        (r["item_a"], r["item_b"]): r
        for r in an.association_rules(
            _baskets(spark), "b", "i",
            min_item_count=1, min_pair_count=2,
        ).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c")}
    ab = out[("a", "b")]
    assert (ab["pair_n"], ab["n_a"], ab["n_b"], ab["n_baskets"]) == (
        2, 3, 3, 4
    )
    assert ab["support"] == pytest.approx(0.5)
    assert ab["conf_ab"] == pytest.approx(round(2 / 3, 6))
    assert ab["conf_ba"] == pytest.approx(round(2 / 3, 6))
    assert ab["lift"] == pytest.approx(round(2 * 4 / 9, 6))
    ac = out[("a", "c")]
    assert (ac["pair_n"], ac["n_a"], ac["n_b"]) == (2, 3, 2)
    assert ac["lift"] == pytest.approx(round(2 * 4 / 6, 6))


def test_association_rules_apriori_prune(spark):
    """min_item_count=3 drops item c (2 baskets) BEFORE the
    self-join, so the (a,c) pair can never form even though it meets
    min_pair_count — the a-priori guarantee says nothing is lost:
    c's pairs cannot reach a support its members don't have when the
    thresholds agree, and here the explicit prune is visible."""
    out = an.association_rules(
        _baskets(spark), "b", "i", min_item_count=3, min_pair_count=2
    ).collect()
    assert [(r["item_a"], r["item_b"]) for r in out] == [("a", "b")]


def test_association_rules_plan_broadcasts_prune(spark):
    """The singleton-prune join and the count joins ride broadcasts;
    the only full-width exchanges key on the basket id (self-join)
    and the pair key (final aggregate) — the detail table is never
    hash-exchanged on anything else."""
    plan = (
        an.association_rules(_baskets(spark), "b", "i")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# ----------------------------------------------------------------- scd2


def test_scd2_intervals_runs(spark):
    """u1's A,A,B,A stream compacts to three intervals: A[t0,t2),
    B[t2,t3), A[t3,NULL] — the re-appearing attribute opens a NEW
    interval (type-2, not type-1), run lengths count the collapsed
    rows, and only the last interval is current."""
    rows = [
        (1, "u1", _ts(0), "A"),
        (2, "u1", _ts(1), "A"),
        (3, "u1", _ts(2), "B"),
        (4, "u1", _ts(3), "A"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type"]
    )
    out = sorted(
        an.scd2_intervals(
            df, "user_id", ["ts", "event_id"], "event_type"
        ).collect(),
        key=lambda r: r["valid_from"],
    )
    assert [
        (r["event_type"], r["valid_from"], r["valid_to"], r["n_events"],
         r["is_current"])
        for r in out
    ] == [
        ("A", _ts(0), _ts(2), 2, False),
        ("B", _ts(2), _ts(3), 1, False),
        ("A", _ts(3), None, 1, True),
    ]


def test_scd2_intervals_tied_timestamps_deterministic(spark):
    """Two runs can START at the same timestamp (boundary events with
    equal ts) — the interval chain must order by the run's first
    global row number (ts, event_id), never by valid_from alone, so
    the earlier event_id's run closes at the SAME instant it opened
    and the chain stays deterministic."""
    rows = [
        (1, "u2", _ts(0), "A"),
        (2, "u2", _ts(0), "B"),
        (3, "u2", _ts(1), "B"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type"]
    )
    out = sorted(
        an.scd2_intervals(
            df, "user_id", ["ts", "event_id"], "event_type"
        ).collect(),
        key=lambda r: (r["valid_from"], r["event_type"]),
    )
    assert [
        (r["event_type"], r["valid_from"], r["valid_to"], r["n_events"])
        for r in out
    ] == [
        ("A", _ts(0), _ts(0), 1),
        ("B", _ts(0), None, 2),
    ]


# ------------------------------------------------------------------ mad


def test_mad_outliers_flags_heavy_tail(spark):
    """1..9 plus 1000 in one group: med 5.5, MAD 2.5 — the 1000 is
    the only |mod_z| > 3.5 row, and the score matches the Iglewicz &
    Hoaglin arithmetic exactly."""
    rows = [(i, "g", float(v)) for i, v in enumerate(range(1, 10))]
    rows.append((9, "g", 1000.0))
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    out = an.mad_outliers(df, "event_type", "value", threshold=3.5).collect()
    assert [(r["event_id"], r["value"]) for r in out] == [(9, 1000.0)]
    assert out[0]["mod_z"] == pytest.approx(0.6745 * (1000 - 5.5) / 2.5)


def test_mad_outliers_zero_mad_group_is_silent(spark):
    """A constant-majority group has MAD 0 — by definition it yields
    NO outliers (guarded filter), never a divide-by-zero or an
    everything-is-an-outlier explosion."""
    rows = [(i, "g", 10.0) for i in range(9)] + [(9, "g", 1000.0)]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    assert an.mad_outliers(df, "event_type", "value").count() == 0


# ----------------------------------------------------------------- holt


def test_holt_matches_reference_recurrence(spark):
    """The operator walks the textbook two-state recurrence: verified
    against a pure-Python replay on one key, bit-for-bit (alpha =
    beta = 0.5 keep every step exactly representable-friendly)."""
    vals = [10.0, 12.0, 11.0, 15.0, 14.0, 20.0]
    rows = [(i, "u", _ts(i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    out = {
        r["event_id"]: (r["level"], r["trend"])
        for r in an.holt(
            df, "user_id", ["ts", "event_id"], "value",
            alpha=0.5, beta=0.5,
        ).collect()
    }
    l, b = vals[0], 0.0
    expect = {0: (l, b)}
    for i in range(1, len(vals)):
        l_new = 0.5 * vals[i] + 0.5 * (l + b)
        b = 0.5 * (l_new - l) + 0.5 * b
        l = l_new
        expect[i] = (l, b)
    assert out == expect


# ---------------------------------------------------------------- ntile


def test_ntile_profile_ansi_bucket_sizes(spark):
    """25 rows into 10 tiles: ANSI NTILE gives the first 5 buckets 3
    rows and the rest 2 (q=2, r=5) — the distributed-rank arithmetic
    must reproduce that exactly, with bins ordered by value."""
    rows = [(i, float(100 - i)) for i in range(25)]
    df = spark.createDataFrame(rows, ["event_id", "value"])
    out = {
        r["tile"]: r
        for r in an.ntile_profile(df, "value", ["event_id"], 10).collect()
    }
    assert [out[t]["n"] for t in range(1, 11)] == [3] * 5 + [2] * 5
    # tile 1 holds the three smallest values 76,77,78
    assert (out[1]["min_v"], out[1]["max_v"]) == (76.0, 78.0)
    assert out[10]["max_v"] == 100.0


def test_ntile_profile_plan_has_no_global_window(spark):
    """The scale contract: NO Window operator (the naive
    ntile().over(orderBy) plan would move the table to a single
    partition) — ranks come from the bucket exchange +
    FlatMapGroupsInPandas instead."""
    rows = [(i, float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, ["event_id", "value"])
    plan = (
        an.ntile_profile(df, "value", ["event_id"], 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "FlatMapGroupsInPandas" in plan


# ----------------------------------------------------------------- skew


def test_key_skew_profile_stats(spark):
    """Hand distribution a:5 b:3 c:1 d:1 — the profile reports the
    exact count stats (mean 2.5, skew 2.0, interpolated p50/p99) and
    the heavy keys in deterministic (count desc, key) order."""
    rows = (
        [(i, "a") for i in range(5)]
        + [(i, "b") for i in range(3)]
        + [(0, "c"), (0, "d")]
    )
    df = spark.createDataFrame(rows, ["x", "k"])
    out = an.key_skew_profile(df, "k", top_k=2).collect()
    assert [(r["rank"], r["key"], r["n_rows"]) for r in out] == [
        (1, "a", 5), (2, "b", 3)
    ]
    r = out[0]
    assert (r["n_keys"], r["total_rows"], r["max_rows"]) == (4, 10, 5)
    assert r["skew_ratio"] == pytest.approx(2.0)
    # counts sorted [1,1,3,5]: p50 = 1 + (3-1)*0.5 = 2.0,
    # p99 = 3 + (5-3)*0.97 = 4.94
    assert r["p50_rows"] == pytest.approx(2.0)
    assert r["p99_rows"] == pytest.approx(4.94)


def test_key_skew_profile_ignores_null_keys(spark):
    rows = [(0, "a"), (1, "a"), (2, None)]
    df = spark.createDataFrame(rows, ["x", "k"])
    out = an.key_skew_profile(df, "k", top_k=5).collect()
    assert [(r["key"], r["n_rows"]) for r in out] == [("a", 2)]
    assert out[0]["n_keys"] == 1 and out[0]["total_rows"] == 2


# ----------------------------------------------------------- stream holt


def test_stream_holt_equals_batch(spark, tmp_path):
    """The streaming Holt carry equals the batch operator exactly
    when each key's rows arrive in order across micro-batches: 3
    hand-staged batches interleaving two keys, one batch empty for a
    key (its (level, trend) state must persist untouched), shuffled
    within-batch row order (the state function sorts), alpha=0.25 /
    beta=0.75 to exercise non-default smoothing."""
    import os
    import time

    from cdp_spark.datapipe.analytics import holt
    from cdp_spark.streaming.analytics import stream_holt

    rows = [
        (1, "a", 1, 10.0), (2, "a", 2, 20.0), (3, "b", 1, 5.0),
        (4, "a", 3, 30.0), (5, "a", 4, 2.0),
        (6, "b", 2, 7.0), (7, "a", 5, 40.0), (8, "b", 3, 1.0),
    ]
    batches = [rows[:3], rows[3:5], rows[5:]]
    src = tmp_path / "src"
    src.mkdir()
    base = time.time() - 300
    for k, batch in enumerate(batches):
        p = src / f"batch-{k}.json"
        with open(p, "w") as f:
            for eid, key, seq, val in reversed(batch):
                f.write(
                    f'{{"event_id": {eid}, "k": "{key}", '
                    f'"seq": {seq}, "value": {val}}}\n'
                )
        os.utime(p, (base + 60 * k, base + 60 * k))
    stream = (
        spark.readStream.schema(
            "event_id long, k string, seq long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = stream_holt(stream, "k", ["seq"], "value", alpha=0.25, beta=0.75)
    name = "sholt_t16"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        r["event_id"]: (r["level"], r["trend"])
        for r in spark.table(name).collect()
    }

    df = spark.createDataFrame(
        rows, "event_id long, k string, seq long, value double"
    )
    want = {
        r["event_id"]: (r["level"], r["trend"])
        for r in holt(
            df, "k", ["seq"], "value", alpha=0.25, beta=0.75
        ).collect()
    }
    assert got == want and len(got) == len(rows)
