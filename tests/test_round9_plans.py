"""Physical-plan shape guards for the round-9 operators: BPE
tokenize-apply must stay a pure map + one aggregate; the dedup-index
flag path must keep the corpus side of the (band, bucket) exchange
id-only; leakage_safe_split must add no shuffle beyond the component
computation and its final aggregate."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

import __spark_entry__ as entry
from cdp_spark.datapipe import bpe
from cdp_spark.session import load_table

SF = "/root/testdata/sf0.001"


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bpe_apply_is_map_plus_one_aggregate(spark):
    """The tokenize serve path: one word explode (Generate), one
    exchange (the id-count aggregate) — the merge rewrites are
    codegen string expressions, never a join or extra shuffle."""
    docs = load_table(spark, SF, "documents")
    out = bpe.bpe_token_counts(docs, [("e", "r"), ("i", "n"), ("o", "w")])
    plan = _executed(out)
    assert plan.count("Generate") == 1, plan[:2000]
    assert len(re.findall(r"Exchange", plan)) == 1, plan[:2000]
    assert "Join" not in plan, plan[:2000]


def test_bpe_pair_counts_have_mapside_combine(spark):
    """Each training iteration's pair aggregate must partial-aggregate
    before the exchange (HashAggregate both sides of the shuffle)."""
    docs = load_table(spark, SF, "documents")
    seqs = bpe.word_frequencies(docs).select(
        bpe._char_seq(F.col("w")).alias("seq"), "cnt"
    )
    plan = _executed(bpe._pair_counts(seqs))
    # partial + final aggregate pairs around each exchange
    assert plan.count("HashAggregate") >= 2, plan[:2000]


def test_fold_flag_corpus_band_frame_is_id_only(spark):
    """flag_against_minhash_index: the INDEX side of the
    (band, bucket) join — the 100 TB side — must shuffle only
    (id, band, bucket); its shingle arrays join in later by id.  Pin
    that no exchange keyed on (band, bucket) carries the shingles
    column."""
    from cdp_spark.datapipe import dedup as ddp
    from cdp_spark.datapipe import dedup_index as di

    docs = load_table(spark, SF, "documents")
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    inc = docs.where(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    path = "/tmp/r9_plan_mh_idx"
    di.minhash_index_write(
        corpus, path, num_perm=32, n=3, hash_fn=ddp.md5_hash60
    )
    idx, meta = di.minhash_index_load(spark, path)
    out = di.flag_against_minhash_index(inc, idx, meta, bands=8)
    # at sf0.001 AQE broadcast-converts everything; force the shuffled
    # regime (the 100 TB shape) so the band exchange exists to inspect
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        for k in old:
            spark.conf.set(k, "-1")
        plan = _executed(out)
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
    band_exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "band" in ln
    ]
    assert band_exchanges, plan[:2000]
    # the index side's band exchange must not mention shingles; the
    # stream/new side legitimately carries its own _new_sh (one small
    # increment row per band, verified in-join)
    assert not any("shingles" in ln for ln in band_exchanges), band_exchanges


def test_leakage_split_adds_no_extra_exchange(spark):
    """split assignment is a codegen expression: the only exchanges in
    the summary query are the component computation's own and the
    final split aggregate — no shuffle keyed on the split column's
    md5 bucket."""
    plan = _executed(entry.queries()["leakage_safe_split"](spark, SF))
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert not any("md5" in ln for ln in exchanges), exchanges


def test_stream_quality_gate_plan_is_stateless(spark, tmp_path):
    """The gate claims stateless append: its streaming plan must
    contain no stateful operator (no StateStore, no aggregation
    before the sink) — just the codegen map over each micro-batch."""
    import json as _json

    from cdp_spark.streaming.analytics import stream_quality_gate

    src = tmp_path / "src"
    src.mkdir()
    (src / "b.json").write_text(
        _json.dumps({"doc_id": 1, "text": "the quick brown fox " * 20})
        + "\n"
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .json(str(src))
    )
    q = (
        stream_quality_gate(stream)
        .writeStream.format("memory")
        .queryName("qgate_plan")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # stateOperators in the progress report is the engine's own
    # statement of what state the query keeps
    progress = q.lastProgress
    assert progress is not None
    assert progress["stateOperators"] == [], progress["stateOperators"]
