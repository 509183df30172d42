"""Kafka as the canonical broker — the deployment target for the
reference's amqp/mqtt/redis input forms and send-* sinks
(src/input/amqp.ts:181-343, src/input/mqtt.ts:109-213,
src/input/redis.ts:130-237; SURVEY §2.1).

Semantics mapping:

| reference | Kafka |
|---|---|
| amqp exchange + binding-pattern | topic subscribe / subscribePattern |
| broker-managed acks/redelivery | consumer offsets in the query checkpoint |
| mqtt topic + QoS | topic; QoS ≈ at-least-once micro-batch delivery |
| redis SUBSCRIBE/BLPOP | topic; BLPOP at-most-once ≈ startingOffsets=latest, no replay |
| send-amqp routing-key / send-mqtt topic | message key / topic |

Requires the ``spark-sql-kafka-0-10`` connector on the classpath
(``spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``).
This environment has no broker or connector jar; the wrappers build
the correct plans and raise a clear error otherwise — they are the
documented bridge point, exercised in integration deployments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..events import WrapDirective, serialize_events
from .sources import lines_to_events

_CONNECTOR_HINT = (
    "Kafka source requires the spark-sql-kafka-0-10 connector "
    "(add spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version>)"
)


def stream_kafka_events(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str | None = None,
    subscribe_pattern: str | None = None,
    wrap: WrapDirective = None,
    starting_offsets: str = "latest",
    options: dict | None = None,
) -> DataFrame:
    """Consume NDJSON event lines from Kafka.  ``subscribe_pattern``
    is the analog of the AMQP binding pattern; per-message multi-line
    bodies are split so one message may carry an event vector, like
    the reference's NDJSON-over-AMQP payloads."""
    if (topics is None) == (subscribe_pattern is None):
        raise ValueError("pass exactly one of topics / subscribe_pattern")
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("startingOffsets", starting_offsets)
    )
    if topics is not None:
        reader = reader.option("subscribe", topics)
    else:
        reader = reader.option("subscribePattern", subscribe_pattern)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    try:
        raw = reader.load()
    except Exception as e:  # connector jar missing
        raise RuntimeError(_CONNECTOR_HINT) from e
    return message_bodies_to_events(raw, wrap)


def message_bodies_to_events(
    messages: DataFrame, wrap: WrapDirective = None, value_col: str = "value"
) -> DataFrame:
    """Broker message body -> events: split multi-line bodies (one
    message may carry an NDJSON event vector, the reference's payload
    framing over amqp/mqtt/redis — src/input/amqp.ts:299-320), drop
    blank lines, then the shared tolerant line parse.  Factored out of
    the Kafka reader so the path is testable without a broker: any
    (streaming or batch) DataFrame with a binary/string ``value``
    column works — tests drive it with an in-memory stand-in."""
    lines = messages.select(
        F.explode(F.split(F.col(value_col).cast("string"), "\n")).alias("value")
    ).filter(F.length(F.trim("value")) > 0)
    return lines_to_events(lines, wrap)


def kafka_event_sink(
    events: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    key_from_name: bool = True,
    options: dict | None = None,
):
    """send-amqp/mqtt/redis analog: publish events as NDJSON values;
    the event name becomes the message key (≈ AMQP routing key,
    src/step-functions/send-amqp.ts:127-264) so per-name ordering is
    preserved within a partition.  Returns the DataStreamWriter —
    call ``.start()`` to run."""
    payload = events.select(
        (F.col("n") if key_from_name else F.lit(None).cast("string")).alias("key"),
        serialize_events(events).alias("value"),
    )
    writer = (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    return writer
