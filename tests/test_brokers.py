"""Broker sink executor tests against fake clients: payload framing,
routing-key/QoS defaults, RPUSH-vs-PUBLISH dispatch, and the compiled
pipeline integration.  Mirrors the dispatch semantics of
src/step-functions/send-{redis,amqp,mqtt}.ts (no broker or client
library needed — the publish logic is what's under test).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from cdp_spark.io import brokers
from cdp_spark.io.brokers import (
    AmqpPublisher,
    MqttPublisher,
    RedisPublisher,
    amqp_publish_options,
    amqp_routing,
    frame_value,
    frame_vector,
    mqtt_topic,
)
from cdp_spark.pipeline import compile_pipeline, from_yaml


class FakeRedis:
    def __init__(self):
        self.calls = []

    def publish(self, channel, message):
        self.calls.append(("publish", channel, message))

    def rpush(self, key, *messages):
        self.calls.append(("rpush", key, list(messages)))

    def lpush(self, key, *messages):
        self.calls.append(("lpush", key, list(messages)))


class FakeAmqpChannel:
    def __init__(self):
        self.declared = []
        self.published = []

    def exchange_declare(self, exchange, exchange_type, durable, auto_delete):
        self.declared.append((exchange, exchange_type, durable, auto_delete))

    def basic_publish(self, exchange, routing_key, body, properties):
        self.published.append((exchange, routing_key, body, properties))


class FakeMqtt:
    def __init__(self):
        self.published = []

    def publish(self, topic, payload, qos, properties):
        self.published.append((topic, payload, qos, properties))


# ---------------------------------------------------------------------------
# framing


def test_frame_vector_ndjson():
    msg = frame_vector(['{"n":"a"}', '{"n":"b"}'], [10.0, 20.5])
    assert msg.body == '{"n":"a"}\n{"n":"b"}\n'
    assert msg.content_type == "application/x-ndjson"
    assert msg.timestamp == 20  # truncated max event timestamp


def test_frame_value_string_vs_object():
    s = frame_value('"hello"')
    assert (s.body, s.content_type) == ("hello", "text/plain")
    o = frame_value('{"k": 1}')
    assert (o.body, o.content_type) == ('{"k": 1}', "application/json")


# ---------------------------------------------------------------------------
# routing / options


@pytest.mark.parametrize(
    "ex_type, expected_key",
    [("direct", "cdp"), ("fanout", ""), ("topic", "cdp")],
)
def test_amqp_default_routing_key_by_exchange_type(ex_type, expected_key):
    name, typ, key, declare = amqp_routing({"exchange": {"type": ex_type}})
    assert (name, typ, key) == ("cdp", ex_type, expected_key)
    assert declare == {"durable": True, "auto_delete": False}


def test_amqp_routing_overrides():
    name, typ, key, declare = amqp_routing(
        {
            "exchange": {"name": "ex1", "type": "fanout", "durable": "false", "auto-delete": "true"},
            "routing-key": "custom.key",
        }
    )
    assert (name, typ, key) == ("ex1", "fanout", "custom.key")
    assert declare == {"durable": False, "auto_delete": True}


def test_amqp_publish_options_string_coercion():
    assert amqp_publish_options(
        {"expiration": "1000", "priority": 3, "persistent": "true"}
    ) == {"expiration": 1000, "priority": 3, "persistent": True}
    assert amqp_publish_options({}) == {}


def test_mqtt_topic_default():
    assert mqtt_topic({}, "pipe", "step1") == "cdp/pipe/step1"
    assert mqtt_topic({"topic": "t/x"}, "pipe", "step1") == "t/x"


# ---------------------------------------------------------------------------
# dispatch


def test_redis_publish_one_call_per_message():
    client = FakeRedis()
    RedisPublisher(client, {"publish": "chan"}).send(["m1", "m2"])
    assert client.calls == [("publish", "chan", "m1"), ("publish", "chan", "m2")]


def test_redis_rpush_single_call_all_messages():
    client = FakeRedis()
    RedisPublisher(client, {"rpush": "lst"}).send(["m1", "m2"])
    assert client.calls == [("rpush", "lst", ["m1", "m2"])]


def test_redis_lpush_dispatch():
    client = FakeRedis()
    RedisPublisher(client, {"lpush": "lst"}).send(["m1"])
    assert client.calls == [("lpush", "lst", ["m1"])]


def test_redis_mode_validation():
    with pytest.raises(ValueError, match="exactly one"):
        RedisPublisher(FakeRedis(), {})
    with pytest.raises(ValueError, match="exactly one"):
        RedisPublisher(FakeRedis(), {"publish": "a", "rpush": "b"})


def test_amqp_publisher_declares_and_publishes():
    client = FakeAmqpChannel()
    pub = AmqpPublisher(client, {"priority": 5})
    pub.send(frame_vector(['{"n":"a"}'], [100.0]))
    assert client.declared == [("cdp", "topic", True, False)]
    (exchange, key, body, props) = client.published[0]
    assert (exchange, key) == ("cdp", "cdp")
    assert body == b'{"n":"a"}\n'
    assert props["content_type"] == "application/x-ndjson"
    assert props["timestamp"] == 100
    assert props["priority"] == 5


def test_mqtt_publisher_qos_and_topic():
    client = FakeMqtt()
    pub = MqttPublisher(client, {"qos": 1}, "p", "s")
    pub.send(frame_value('"raw"'))
    topic, payload, qos, props = client.published[0]
    assert (topic, payload, qos) == ("cdp/p/s", "raw", 1)
    assert props == {"content_type": "text/plain"}


# ---------------------------------------------------------------------------
# DataFrame integration (vector framing per window + pipeline wiring)


def _events(spark, rows, window_ids=None):
    data = [
        (i, n, d, window_ids[i] if window_ids else i)
        for i, (n, d) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "rn long, n string, d string, w long")
    return df.select(
        "n",
        "d",
        F.lit(None).cast("array<struct<i double, p string, h string>>").alias("t"),
        F.col("rn").alias("_ord"),
        F.col("w").alias("_w"),
    )


def test_publish_events_redis_per_event_messages(spark):
    client = FakeRedis()
    df = _events(spark, [("a", "1"), ("b", "2"), ("c", "3")], window_ids=[0, 0, 1])
    brokers.publish_events("send-redis", df, {"rpush": "lst"}, client=client)
    # window 0: one rpush with both events; window 1: one rpush with one
    assert [c[0] for c in client.calls] == ["rpush", "rpush"]
    first = [json.loads(m)["n"] for m in client.calls[0][2]]
    assert first == ["a", "b"]
    assert [json.loads(m)["n"] for m in client.calls[1][2]] == ["c"]


def test_publish_events_amqp_ndjson_per_window(spark):
    client = FakeAmqpChannel()
    df = _events(spark, [("a", "1"), ("b", "2")], window_ids=[0, 0])
    brokers.publish_events("send-amqp", df, {}, client=client)
    assert len(client.published) == 1
    body = client.published[0][2].decode()
    names = [json.loads(line)["n"] for line in body.strip().split("\n")]
    assert names == ["a", "b"]


def test_pipeline_send_redis_sink(spark):
    client = FakeRedis()
    brokers.set_client_factory(lambda kind, opts: client)
    try:
        t = from_yaml(
            """
name: p
input: {stdin: }
steps:
  out:
    reduce:
      send-redis: {instance: "redis://x", rpush: "mylist"}
"""
        )
        df = _events(spark, [("a", "1"), ("b", "2")]).drop("_w")
        result = compile_pipeline(spark, t, input_df=df, arrival_ts=1000.0)
        result.run_sinks()
    finally:
        brokers.set_client_factory(None)
    # default 1-event windows: one rpush per event
    assert [c[0] for c in client.calls] == ["rpush", "rpush"]
    assert json.loads(client.calls[0][2][0])["n"] == "a"
    # pass-through: pipeline output still carries both events
    assert result.output.count() == 2
