"""Stream-static decontamination: batch/stream semantic parity.

A document stream curated per micro-batch (foreachBatch) must emit
exactly the documents the batch operator keeps.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdp_spark.datapipe.curate import filter_contaminated
from cdp_spark.streaming import curate_stream

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _mk_docs():
    eval_text = "alpha beta gamma delta epsilon zeta eta theta iota"
    docs = [
        # contaminated: contains the eval 8-gram span
        (1, "x " + " ".join(eval_text.split()[:8]) + " y"),
        # clean
        (2, "one two three four five six seven eight nine ten"),
        # short doc, clean
        (3, "tiny doc"),
        # contaminated: full eval text verbatim
        (4, eval_text),
    ]
    return docs, eval_text


def test_stream_matches_batch_decontamination(spark, tmp_path):
    docs, eval_text = _mk_docs()
    src = tmp_path / "docs_in"
    src.mkdir()
    # two files → at least one micro-batch each under availableNow
    (src / "a.ndjson").write_text(
        "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in docs[:2]) + "\n"
    )
    (src / "b.ndjson").write_text(
        "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in docs[2:]) + "\n"
    )
    eval_set = spark.createDataFrame([(99, eval_text)], ["doc_id", "text"])
    batch_docs = spark.createDataFrame(docs, ["doc_id", "text"])
    expected = {
        r.doc_id for r in filter_contaminated(batch_docs, eval_set, "doc_id", "text").collect()
    }
    assert expected == {2, 3}

    stream = spark.readStream.schema(DOC_SCHEMA).json(str(src))
    got: list[int] = []
    q = curate_stream(
        stream,
        eval_set,
        "doc_id",
        "text",
        sink=lambda clean, epoch: got.extend(r.doc_id for r in clean.collect()),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(60)
    assert set(got) == expected
