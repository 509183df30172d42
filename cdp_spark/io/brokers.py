"""Broker sink executors: send-amqp / send-mqtt / send-redis.

Payload framing, routing, and dispatch mirror the reference:

- send-redis (src/step-functions/send-redis.ts:99-138): exactly one of
  ``publish`` / ``rpush`` / ``lpush`` names the channel or list key.
  publish sends one PUBLISH per message; rpush/lpush send ONE
  RPUSH/LPUSH call carrying all of a vector's messages.  Without a
  jq-expr each event's JSON is its own message; with one, each
  produced value is.
- send-amqp (src/step-functions/send-amqp.ts:127-264): exchange
  defaults name="cdp" type="topic"; routing key defaults by exchange
  type (direct->"cdp", fanout->"", topic->"cdp"); expiration /
  priority / persistent publish options accept string or native
  values.  Without jq the vector is one NDJSON message
  (application/x-ndjson, timestamp = max event timestamp); with jq
  each value is its own message (text/plain for strings,
  application/json otherwise, timestamp = now).
- send-mqtt (src/step-functions/send-mqtt.ts:86-185): topic defaults
  to ``cdp/<pipeline>/<step>``, qos defaults to 0; same NDJSON /
  per-value framing as amqp.

The constructors take an injectable ``client`` so the logic is
unit-testable with fakes; :func:`default_client_factory` gates the
real clients (pika / paho-mqtt / redis) behind imports since no broker
client library is installed in this environment.  All sinks are
pass-through: the pipeline forwards events unchanged regardless.

Scale note: these executors iterate driver-side (toLocalIterator,
bounded memory) for ordered parity with the reference's sequential
publisher.  On a cluster where per-message global order is not
required, wrap the same publisher objects in ``foreachPartition``
exactly like make_http_action — the framing logic is identical.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable, Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..events import serialize_events

DEFAULT_EXCHANGE_NAME = "cdp"
DEFAULT_EXCHANGE_TYPE = "topic"
_DEFAULT_ROUTING_KEY = {"direct": "cdp", "fanout": "", "topic": "cdp"}


# ---------------------------------------------------------------------------
# Message framing (pure)


@dataclass
class BrokerMessage:
    """One message to publish: body + content type + unix timestamp."""

    body: str
    content_type: str
    timestamp: int = field(default_factory=lambda: int(time.time()))


def frame_vector(event_jsons: list[str], event_timestamps: list[float]) -> BrokerMessage:
    """NDJSON-frame one window's events as a single message
    (send-amqp.ts:219-236: trailing newline, x-ndjson, max event ts)."""
    ts = int(max(event_timestamps)) if event_timestamps else int(time.time())
    return BrokerMessage(
        body="\n".join(event_jsons) + "\n",
        content_type="application/x-ndjson",
        timestamp=ts,
    )


def frame_value(val_json: str) -> BrokerMessage:
    """Frame one jq-produced value: JSON string values are sent
    verbatim as text/plain, everything else as its JSON encoding
    (the reference's ``typeof message === "string"`` branch)."""
    if val_json.startswith('"'):
        return BrokerMessage(body=json.loads(val_json), content_type="text/plain")
    return BrokerMessage(body=val_json, content_type="application/json")


def amqp_publish_options(options: dict) -> dict:
    """Parse expiration/priority/persistent, accepting string or
    native values (send-amqp.ts:138-165)."""
    out: dict[str, Any] = {}
    if options.get("expiration") is not None:
        e = options["expiration"]
        out["expiration"] = int(e) if isinstance(e, str) else e
    if options.get("priority") is not None:
        p = options["priority"]
        out["priority"] = int(p) if isinstance(p, str) else p
    if options.get("persistent") is not None:
        pe = options["persistent"]
        out["persistent"] = (pe == "true") if isinstance(pe, str) else bool(pe)
    return out


def amqp_routing(options: dict) -> tuple[str, str, str, dict]:
    """(exchange name, exchange type, routing key, exchange declare
    opts) with the reference's defaults (send-amqp.ts:113-117,
    127-136, 170-183)."""
    ex = options.get("exchange") or {}
    ex_name = ex.get("name", DEFAULT_EXCHANGE_NAME)
    ex_type = ex.get("type", DEFAULT_EXCHANGE_TYPE)
    routing_key = options.get("routing-key")
    if routing_key is None:
        routing_key = _DEFAULT_ROUTING_KEY.get(ex_type, "cdp")
    durable = ex.get("durable", True)
    durable = (durable == "true") if isinstance(durable, str) else bool(durable)
    auto_delete = ex.get("auto-delete", False)
    auto_delete = (
        (auto_delete == "true") if isinstance(auto_delete, str) else bool(auto_delete)
    )
    return ex_name, ex_type, routing_key, {"durable": durable, "auto_delete": auto_delete}


def mqtt_topic(options: dict, pipeline_name: str, step_name: str) -> str:
    return options.get("topic") or f"cdp/{pipeline_name}/{step_name}"


# ---------------------------------------------------------------------------
# Publishers (dispatch against an injectable client)


class RedisPublisher:
    """Dispatch to PUBLISH / RPUSH / LPUSH per the configured mode.
    ``client`` needs publish(channel, message), rpush(key, *messages),
    lpush(key, *messages)."""

    def __init__(self, client: Any, options: dict):
        modes = [m for m in ("publish", "rpush", "lpush") if options.get(m)]
        if len(modes) != 1:
            raise ValueError(
                "send-redis needs exactly one of publish/rpush/lpush, got "
                f"{modes or 'none'}"
            )
        self.client = client
        self.mode = modes[0]
        self.key = options[self.mode]

    def send(self, messages: list[str]) -> None:
        if not messages:
            return
        if self.mode == "publish":
            for m in messages:
                self.client.publish(self.key, m)
        elif self.mode == "rpush":
            self.client.rpush(self.key, *messages)
        else:
            self.client.lpush(self.key, *messages)


class AmqpPublisher:
    """``client`` needs exchange_declare(exchange, exchange_type,
    durable, auto_delete) and basic_publish(exchange, routing_key,
    body, properties)."""

    def __init__(self, client: Any, options: dict):
        self.client = client
        self.exchange, self.exchange_type, self.routing_key, declare = amqp_routing(options)
        self.publish_options = amqp_publish_options(options)
        client.exchange_declare(
            exchange=self.exchange, exchange_type=self.exchange_type, **declare
        )

    def send(self, message: BrokerMessage) -> None:
        self.client.basic_publish(
            exchange=self.exchange,
            routing_key=self.routing_key,
            body=message.body.encode(),
            properties={
                "content_type": message.content_type,
                "timestamp": message.timestamp,
                **self.publish_options,
            },
        )


class MqttPublisher:
    """``client`` needs publish(topic, payload, qos, properties)."""

    def __init__(self, client: Any, options: dict, pipeline_name: str, step_name: str):
        self.client = client
        self.topic = mqtt_topic(options, pipeline_name, step_name)
        self.qos = int(options.get("qos", 0))

    def send(self, message: BrokerMessage) -> None:
        self.client.publish(
            self.topic,
            message.body,
            qos=self.qos,
            properties={"content_type": message.content_type},
        )


# ---------------------------------------------------------------------------
# Client factories — real clients are import-gated


def default_client_factory(kind: str, options: dict) -> Any:
    """Connect a real broker client.  Import-gated: raises
    NotImplementedError with guidance when the client library is not
    installed (none are, in this environment)."""
    if kind == "send-redis":
        try:
            import redis  # type: ignore[import-not-found]
        except ImportError as err:
            raise NotImplementedError(
                "send-redis requires the 'redis' client library"
            ) from err
        return redis.Redis.from_url(options.get("instance", "redis://localhost:6379"))
    if kind == "send-amqp":
        try:
            import pika  # type: ignore[import-not-found]
        except ImportError as err:
            raise NotImplementedError("send-amqp requires the 'pika' client library") from err
        conn = pika.BlockingConnection(pika.URLParameters(options["url"]))
        channel = conn.channel()

        class _PikaChannel:  # pragma: no cover — needs a live broker
            """Adapt the seam's dict-shaped publish properties to
            pika.BasicProperties (the injectable-fake contract stays a
            plain dict so tests never need pika installed)."""

            def exchange_declare(self, exchange, exchange_type, **declare):
                channel.exchange_declare(
                    exchange=exchange, exchange_type=exchange_type, **declare
                )

            def basic_publish(self, exchange, routing_key, body, properties):
                p = properties or {}
                props = pika.BasicProperties(
                    content_type=p.get("content_type"),
                    timestamp=(
                        int(p["timestamp"]) if p.get("timestamp") is not None else None
                    ),
                    expiration=(
                        str(p["expiration"]) if p.get("expiration") is not None else None
                    ),
                    priority=p.get("priority"),
                    delivery_mode=2 if p.get("persistent") else None,
                )
                channel.basic_publish(
                    exchange=exchange,
                    routing_key=routing_key,
                    body=body,
                    properties=props,
                )

        return _PikaChannel()
    if kind == "send-mqtt":
        try:
            import paho.mqtt.client as mqtt  # type: ignore[import-not-found]
        except ImportError as err:
            raise NotImplementedError(
                "send-mqtt requires the 'paho-mqtt' client library"
            ) from err
        from urllib.parse import urlparse

        url = options["url"]
        parsed = urlparse(url if "//" in url else f"mqtt://{url}")
        client = mqtt.Client()
        client.connect(parsed.hostname or "localhost", parsed.port or 1883)  # pragma: no cover
        client.loop_start()  # pragma: no cover — background network thread

        class _PahoClient:  # pragma: no cover — needs a live broker
            """paho's v3 publish() takes no properties argument; the
            content-type rides only on MQTT v5.  Drop it here rather
            than upgrading the protocol under the caller."""

            def publish(self, topic, payload, qos=0, properties=None):
                client.publish(topic, payload, qos=qos)

        return _PahoClient()
    raise ValueError(f"unknown broker sink '{kind}'")


_client_factory: Callable[[str, dict], Any] = default_client_factory


def set_client_factory(factory: Optional[Callable[[str, dict], Any]]) -> None:
    """Override the broker client factory (tests inject fakes here;
    deployments can wire pooled/preconfigured clients)."""
    global _client_factory
    _client_factory = factory if factory is not None else default_client_factory


# ---------------------------------------------------------------------------
# DataFrame -> vectors -> publish


def _iter_vectors(df: DataFrame, order_col: str = "_ord") -> Iterator[tuple[list[str], list[float]]]:
    """Yield (event JSON lines, event timestamps) per window, in
    window order.  Events without trace points take the current time
    (matching Event.timestamp's fallback).  Driver-side ordered
    iteration — same parity contract as the stdout/file sinks."""
    w = "_w" if "_w" in df.columns else None
    ts = F.coalesce(F.expr("array_max(t.i)"), F.lit(float(time.time())))
    cols = [F.col(order_col).alias("_o"), serialize_events(df).alias("line"), ts.alias("_ts")]
    if w:
        cols.append(F.col(w).alias("_grp"))
        it = df.select(*cols).orderBy("_grp", "_o").toLocalIterator()
    else:
        it = df.select(*cols).orderBy("_o").toLocalIterator()
    cur_key, lines, stamps = None, [], []
    for row in it:
        key = row["_grp"] if w else row["_o"]
        if cur_key is not None and key != cur_key and lines:
            yield lines, stamps
            lines, stamps = [], []
        cur_key = key
        lines.append(row["line"])
        stamps.append(row["_ts"])
    if lines:
        yield lines, stamps


def publish_events(
    kind: str,
    df: DataFrame,
    options: dict,
    pipeline_name: str = "cdp",
    step_name: str = "step",
    client: Any = None,
) -> None:
    """Publish a (windowed) event DataFrame without a jq-expr: NDJSON
    vector per message for amqp/mqtt, per-event messages for redis."""
    client = client if client is not None else _client_factory(kind, options)
    if kind == "send-redis":
        pub = RedisPublisher(client, options)
        for lines, _stamps in _iter_vectors(df):
            pub.send(lines)
    elif kind == "send-amqp":
        apub = AmqpPublisher(client, options)
        for lines, stamps in _iter_vectors(df):
            apub.send(frame_vector(lines, stamps))
    elif kind == "send-mqtt":
        mpub = MqttPublisher(client, options, pipeline_name, step_name)
        for lines, stamps in _iter_vectors(df):
            mpub.send(frame_vector(lines, stamps))
    else:
        raise ValueError(f"unknown broker sink '{kind}'")


def publish_values(
    kind: str,
    values: Iterable[str],
    options: dict,
    pipeline_name: str = "cdp",
    step_name: str = "step",
    client: Any = None,
) -> None:
    """Publish jq-produced values (JSON text, already ordered): one
    message per value for amqp/mqtt, one redis message per value."""
    client = client if client is not None else _client_factory(kind, options)
    if kind == "send-redis":
        pub = RedisPublisher(client, options)
        # The reference's processor channel drains value-by-value
        # (send-redis.ts:156-161): each produced value is its own
        # PUBLISH / single-element RPUSH call.
        for v in values:
            pub.send([frame_value(v).body])
    elif kind == "send-amqp":
        apub = AmqpPublisher(client, options)
        for v in values:
            apub.send(frame_value(v))
    elif kind == "send-mqtt":
        mpub = MqttPublisher(client, options, pipeline_name, step_name)
        for v in values:
            mpub.send(frame_value(v))
    else:
        raise ValueError(f"unknown broker sink '{kind}'")
