"""Broker input consumers (amqp/mqtt/redis) against injectable fake
clients: declaration/binding/mode mapping, backpressure behavior per
broker (amqp: hold acks + recover; mqtt: delay; redis: skip pops),
and the spool -> Spark file-stream bridge end-to-end."""

from __future__ import annotations

import json
import threading
import time

import pytest

from cdp_spark.streaming.consumers import (
    AmqpConsumer,
    MessageSpool,
    MqttConsumer,
    RedisConsumer,
    amqp_binding_pattern,
    amqp_queue_declaration,
    redis_mode,
    set_consumer_client_factory,
    stream_broker,
)


# ---------------------------------------------------------------------------
# pure option mapping (reference: src/input/amqp.ts:231-283,
# src/input/redis.ts:110-117)


def test_amqp_queue_declaration_defaults_and_arguments():
    name, declare, args = amqp_queue_declaration({})
    assert name == ""  # server-generated queue
    assert declare == {"durable": True, "auto_delete": False}
    assert args == {}

    name, declare, args = amqp_queue_declaration(
        {
            "queue": {
                "name": "q1",
                "durable": "false",
                "auto-delete": True,
                "message-ttl": "30000",
                "expires": 60000,
                "dead-letter-exchange": "dlx",
                "max-length": "9",
                "max-priority": 5,
            }
        }
    )
    assert name == "q1"
    assert declare == {"durable": False, "auto_delete": True}
    assert args == {
        "x-message-ttl": 30000,
        "x-expires": 60000,
        "x-dead-letter-exchange": "dlx",
        "x-max-length": 9,
        "x-max-priority": 5,
    }


def test_amqp_binding_pattern_defaults_by_exchange_type():
    assert amqp_binding_pattern({}) == "#"  # default exchange type is topic
    assert amqp_binding_pattern({"exchange": {"type": "direct"}}) == "cdp"
    assert amqp_binding_pattern({"exchange": {"type": "fanout"}}) == ""
    assert amqp_binding_pattern({"binding-pattern": "a.*"}) == "a.*"


def test_redis_mode_exactly_one():
    assert redis_mode({"subscribe": "ch"}) == ("subscribe", ["ch"])
    assert redis_mode({"blpop": ["k1", "k2"]}) == ("blpop", ["k1", "k2"])
    with pytest.raises(ValueError):
        redis_mode({})
    with pytest.raises(ValueError):
        redis_mode({"subscribe": "a", "brpop": "b"})


# ---------------------------------------------------------------------------
# fakes


class FakeAmqpClient:
    def __init__(self):
        self.calls = []
        self.acked = []
        self.recovers = 0
        self._cb = None

    def exchange_declare(self, **kw):
        self.calls.append(("exchange_declare", kw))

    def queue_declare(self, queue, arguments, **kw):
        self.calls.append(("queue_declare", queue, arguments, kw))
        return queue or "amq.gen-test"

    def queue_bind(self, **kw):
        self.calls.append(("queue_bind", kw))

    def basic_consume(self, queue, on_message_callback):
        self._cb = on_message_callback
        return "tag-1"

    def deliver(self, tag, body):
        self._cb(tag, body)

    def basic_ack(self, tag):
        self.acked.append(tag)

    def basic_recover(self, requeue):
        self.recovers += 1

    def basic_cancel(self, tag):
        self.calls.append(("basic_cancel", tag))

    def close(self):
        self.calls.append(("close",))


class FakeMqttClient:
    def __init__(self):
        self.subscribed = []
        self.on_message = None

    def subscribe(self, topic, qos):
        self.subscribed.append((topic, qos))

    def unsubscribe(self, topic):
        self.subscribed = [(t, q) for t, q in self.subscribed if t != topic]

    def disconnect(self):
        pass


class FakeRedisClient:
    def __init__(self, items=None):
        self.items = list(items or [])
        self.subscribed = []
        self.quit_called = False

    def subscribe(self, cb, *channels):
        self.subscribed = list(channels)
        self._cb = cb

    def unsubscribe(self, *channels):
        self.subscribed = []

    def publish(self, message):
        self._cb(message)

    def blpop(self, keys, timeout):
        return ("k", self.items.pop(0)) if self.items else None

    brpop = blpop

    def quit(self):
        self.quit_called = True


# ---------------------------------------------------------------------------
# consumer behavior


def test_amqp_consumer_declares_binds_acks(tmp_path):
    client = FakeAmqpClient()
    spool = MessageSpool(str(tmp_path / "spool"))
    consumer = AmqpConsumer(
        client, {"exchange": {"type": "direct", "name": "ex1"}}, spool
    )
    assert ("queue_bind", {"queue": "amq.gen-test", "exchange": "ex1", "routing_key": "cdp"}) in client.calls
    client.deliver(1, b'{"n": "a"}')
    client.deliver(2, b'{"n": "b"}')
    assert client.acked == [1, 2]
    assert spool.backlog() == 2
    consumer.close()
    assert ("basic_cancel", "tag-1") in client.calls


def test_amqp_backpressure_holds_acks_then_recovers(tmp_path):
    client = FakeAmqpClient()
    spool = MessageSpool(str(tmp_path / "spool"), max_backlog_files=1)
    consumer = AmqpConsumer(client, {}, spool)
    client.deliver(1, b"one")  # fills the backlog
    client.deliver(2, b"two")  # saturated: not spooled, not acked
    assert client.acked == [1]
    assert spool.backlog() == 1
    # drain the spool -> next delivery triggers exactly one recover
    for f in (tmp_path / "spool").iterdir():
        f.unlink()
    client.deliver(3, b"three")
    assert client.recovers == 1
    assert client.acked == [1, 3]
    consumer.close()


def test_mqtt_consumer_delays_never_drops(tmp_path):
    client = FakeMqttClient()
    spool = MessageSpool(str(tmp_path / "spool"), max_backlog_files=1)
    consumer = MqttConsumer(client, {"topic": "t/#", "qos": 1}, spool)
    assert client.subscribed == [("t/#", 1)]
    client.on_message("t/x", b"first")
    assert spool.backlog() == 1

    # saturated: the delivery blocks until the spool drains
    done = threading.Event()

    def deliver_blocked():
        client.on_message("t/x", b"second")
        done.set()

    t = threading.Thread(target=deliver_blocked, daemon=True)
    t.start()
    time.sleep(0.2)
    assert not done.is_set()  # delayed, not dropped
    for f in (tmp_path / "spool").iterdir():
        f.unlink()
    assert done.wait(2.0)
    assert spool.backlog() == 1
    consumer.close()


def test_redis_pubsub_and_list_modes(tmp_path):
    # pub/sub: callback messages spool immediately
    client = FakeRedisClient()
    spool = MessageSpool(str(tmp_path / "ps"))
    consumer = RedisConsumer(client, {"subscribe": "ch"}, spool)
    assert client.subscribed == ["ch"]
    client.publish(b'{"n": "x"}')
    assert spool.backlog() == 1
    consumer.close()
    assert client.quit_called

    # blpop: the poll thread drains the list
    client = FakeRedisClient(items=[b"v1", b"v2"])
    spool = MessageSpool(str(tmp_path / "lp"))
    consumer = RedisConsumer(client, {"blpop": "k"}, spool)
    deadline = time.time() + 5
    while spool.backlog() < 2 and time.time() < deadline:
        time.sleep(0.05)
    assert spool.backlog() == 2
    consumer.close()


# ---------------------------------------------------------------------------
# end-to-end: consumer -> spool -> Spark file stream -> events


def test_stream_broker_end_to_end(spark, tmp_path):
    client = FakeAmqpClient()
    stream, consumer = stream_broker(
        spark, "amqp", {}, spool_dir=str(tmp_path / "spool"), client=client
    )
    # a multi-line NDJSON body is one event vector, exactly like the
    # reference's body parsing (amqp.ts:299-320)
    client.deliver(1, b'{"n": "a", "d": 1}\n{"n": "b", "d": 2}')
    query = (
        stream.writeStream.format("memory")
        .queryName("broker_e2e")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(60)
    rows = spark.sql("SELECT n, d FROM broker_e2e ORDER BY n").collect()
    assert [(r["n"], json.loads(r["d"])) for r in rows] == [("a", 1), ("b", 2)]
    consumer.close()


def test_run_pipeline_managed_with_broker_input(spark, tmp_path):
    """The runner's input form dispatch reaches the broker consumers
    through the injectable factory and registers load watchers."""
    from cdp_spark.metrics import PipelineMetrics
    from cdp_spark.pipeline import from_yaml
    from cdp_spark.streaming.runner import run_pipeline_managed

    client = FakeRedisClient()
    set_consumer_client_factory(lambda kind, options: client)
    try:
        template = from_yaml(
            """
name: broker
input:
  redis:
    subscribe: events
steps: {}
"""
        )
        metrics = PipelineMetrics()
        runner = run_pipeline_managed(
            template,
            spark,
            metrics=metrics,
            checkpoint_dir=str(tmp_path / "ckpt"),
            trigger_seconds=3600,
        )
        try:
            assert client.subscribed == ["events"]
            assert len(metrics._queue_watchers) == 1
            client.publish(b'{"n": "x"}')
            assert metrics.queued_events() == 1
        finally:
            runner.close(drain_timeout=0.5)
        assert client.quit_called  # ordered drain closed the consumer
    finally:
        set_consumer_client_factory(None)
