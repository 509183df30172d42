"""Streaming input forms.

| reference input | here |
|---|---|
| generator (src/input/generator.ts:80-128) | rate source shaped into events |
| tail (src/input/tail.ts:76-141) | file-source NDJSON dir (new-file discovery IS the idiomatic tail; Trigger.AvailableNow for catch-up) |
| stdin (src/input/stdin.ts) | batch path (cdp_spark.events.read_ndjson) |
| http/poll (src/input/{http,poll}.ts) | custom DataSource or ingest bridge — documented, not shipped: no server surface in an engine library |
| amqp/mqtt/redis (src/input/{amqp,mqtt,redis}.ts) | Kafka source as the canonical broker (`spark.readStream.format("kafka")`); broker bridges are deployment glue |

Every source yields the event schema (n, d, t) and stamps new-event
trace points exactly like the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..events import TRACE_TYPE, WrapDirective, validate_wrap, variants_to_events


def stream_generator(
    spark: SparkSession,
    name: str = "_generated",
    rows_per_second: int | None = None,
    seconds: float | None = None,
) -> DataFrame:
    """Generator input: emits {n: name, d: <float>} events — the rate
    source gives (timestamp, value); we shape value into a payload.
    The reference emits random floats; we emit value/1000 offsets for
    determinism (tests care about flow, not the sampled number).

    ``seconds`` is the reference's cadence knob (one event every N
    seconds, src/input/generator.ts:80-128).  Sub-second intervals map
    to rowsPerSecond; intervals over a second emit at 1 row/s and keep
    every k-th value (the rate source rejects rowsPerSecond <= 0, so
    1/seconds must never truncate to zero).
    """
    downsample = None
    if rows_per_second is None:
        s = 1.0 if seconds is None else float(seconds)
        if s <= 1.0:
            rows_per_second = max(1, round(1.0 / s))
        else:
            rows_per_second = 1
            downsample = max(1, round(s))
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    if downsample is not None:
        rate = rate.filter(F.col("value") % downsample == 0)
    return rate.select(
        F.lit(name).alias("n"),
        F.concat(F.lit(""), (F.col("value") / 1000.0).cast("string")).alias("d"),
        F.array(
            F.struct(
                F.unix_timestamp("timestamp").cast("double").alias("i"),
                F.lit("generator").alias("p"),
                F.lit("").alias("h"),
            )
        ).alias("t"),
    )


def lines_to_events(lines: DataFrame, wrap: WrapDirective = None) -> DataFrame:
    """Shared line→event shaping for every line-oriented source (file
    drop, poll, Kafka value column): tolerant NDJSON parse + wrap
    directives (src/event.ts:322-411).  Input needs a ``value`` string
    column; invalid lines are dropped (dead-letter is a second query,
    see stream_dead_letters)."""
    validate_wrap(wrap)
    if wrap is not None:
        name = wrap if isinstance(wrap, str) else wrap["name"]
        if isinstance(wrap, dict) and wrap.get("raw"):
            return lines.select(
                F.lit(name).alias("n"),
                F.expr(
                    "substring(to_json(array(value)), 2, length(to_json(array(value))) - 2)"
                ).alias("d"),
                F.lit(None).cast(TRACE_TYPE).alias("t"),
            )
        parsed = lines.select(F.try_parse_json("value").alias("_v")).filter(
            F.col("_v").isNotNull()
        )
        return parsed.select(
            F.lit(name).alias("n"),
            F.to_json("_v").alias("d"),
            F.lit(None).cast(TRACE_TYPE).alias("t"),
        )
    parsed = lines.select(F.try_parse_json("value").alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    ev = variants_to_events(parsed, keep_cols=[])
    return ev.filter(F.col("_reason").isNull()).select("n", "d", "t")


def stream_ndjson_files(
    spark: SparkSession,
    path: str,
    wrap: WrapDirective = None,
    max_files_per_trigger: int | None = None,
    clean_source: str | None = None,
) -> DataFrame:
    """Tail analog: follow a directory of NDJSON files.  Tolerant
    parsing matches the batch reader: invalid lines are dropped (the
    streaming dead-letter pattern is a second query over the same
    source filtering `_reason IS NOT NULL`).

    ``clean_source``: Spark file-source cleanup of processed files —
    "delete" or "archive" (spool-style inputs pass "delete" so the
    directory holds only pending work; a tailed log directory owned
    by someone else must leave it unset)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if clean_source is not None:
        reader = reader.option("cleanSource", clean_source)
    return lines_to_events(reader.load(path), wrap)


def stream_dead_letters(spark: SparkSession, path: str) -> DataFrame:
    """The streaming dead-letter channel for a file-drop source: a
    second query over the same directory yielding (line, reason) for
    every rejected input line — unparseable JSON or an invalid event
    envelope (src/dead-letter.ts:19-32; batch analog returns the same
    shape from read_ndjson).  Route it to its own sink / table."""
    lines = spark.readStream.format("text").load(path)
    parsed = lines.select(
        F.col("value").alias("line"), F.try_parse_json("value").alias("_v")
    )
    unparseable = parsed.filter(F.col("_v").isNull()).select(
        "line", F.lit("unparseable JSON").alias("reason")
    )
    invalid = (
        variants_to_events(parsed.filter(F.col("_v").isNotNull()), keep_cols=["line"])
        .filter(F.col("_reason").isNotNull())
        .select("line", F.col("_reason").alias("reason"))
    )
    return unparseable.unionByName(invalid)
