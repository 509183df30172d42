"""Broker input body-splitting path (src/input/amqp.ts:299-320
framing), tested without a broker via in-memory stand-ins for the
Kafka message DataFrame — the factored message_bodies_to_events is
exactly what stream_kafka_events applies after .load()."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cdp_spark.streaming.kafka import message_bodies_to_events


def _messages(spark, bodies: list[bytes]):
    return spark.createDataFrame([(b,) for b in bodies], "value binary")


def test_multiline_body_becomes_event_vector(spark):
    df = _messages(
        spark,
        [
            b'{"n":"a","d":1}\n{"n":"b","d":2}\n',
            b'{"n":"c","d":3}',
        ],
    )
    got = [(r["n"], r["d"]) for r in message_bodies_to_events(df).collect()]
    assert sorted(got) == [("a", "1"), ("b", "2"), ("c", "3")]


def test_blank_lines_and_trailing_newlines_dropped(spark):
    df = _messages(spark, [b'\n\n{"n":"x","d":0}\n\n\n'])
    assert message_bodies_to_events(df).count() == 1


def test_wrap_applies_per_line(spark):
    df = _messages(spark, [b"1\n2\n3"])
    got = [(r["n"], r["d"]) for r in message_bodies_to_events(df, wrap="m").collect()]
    assert sorted(got) == [("m", "1"), ("m", "2"), ("m", "3")]


def test_array_bodies_flatten(spark):
    df = _messages(spark, [b'[{"n":"a","d":1},{"n":"b","d":2}]'])
    got = [(r["n"], r["d"]) for r in message_bodies_to_events(df).collect()]
    assert sorted(got) == [("a", "1"), ("b", "2")]


def test_streaming_memory_standin(spark, tmp_path):
    # same path under a real streaming plan: file stream of raw bodies
    src = tmp_path / "bodies"
    src.mkdir()
    (src / "m1.txt").write_text('{"n":"s1","d":9}')
    raw = spark.readStream.format("text").load(str(src))
    out = str(tmp_path / "out")
    q = (
        message_bodies_to_events(raw)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert [(r["n"], r["d"]) for r in rows] == [("s1", "9")]
