"""``poll`` input form — periodic HTTP GET as a custom Python
streaming data source (reference: src/input/poll.ts:106-189).

The reference GETs ``target`` every ``seconds`` and suppresses
duplicate responses via ETag comparison (src/input/poll.ts:123-146).
Here that maps onto Spark's source-offset model exactly: the offset
carries (poll counter, last ETag); a micro-batch whose response ETag
equals the stored one yields no rows.  Conditional requests send
``If-None-Match`` so a compliant server answers 304 with no body.

Built on :class:`pyspark.sql.datasource.SimpleDataSourceStreamReader`
— polling is a driver-side, low-volume activity (one request per
trigger); rows enter the DataFrame as (value string) lines, to be
shaped by the same wrap/event parsing as every other source.  Poll
cadence is governed by the query trigger interval, the idiomatic
Spark knob for "every N seconds".
"""

from __future__ import annotations

import json
from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition
from pyspark.sql.types import StringType, StructField, StructType

SCHEMA = StructType([StructField("value", StringType())])


def _fetch(target: str, etag: str | None, headers: dict | None, timeout: float):
    """GET target; returns (status, body_text, etag) — (304, "", old)
    when the server honors If-None-Match."""
    import urllib.request

    req = urllib.request.Request(target)
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    if etag:
        req.add_header("If-None-Match", etag)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = resp.read().decode("utf-8", errors="replace")
            return resp.status, body, resp.headers.get("ETag")
    except Exception as e:  # noqa: BLE001 — 304 arrives as HTTPError
        status = getattr(e, "code", None)
        if status == 304:
            return 304, "", etag
        # Unreachable/erroring target: like the reference, poll again
        # next interval (errors are logged, not fatal —
        # src/input/poll.ts catches request failures).
        return status or -1, "", etag


class _PollReader:
    """Shared reader logic (SimpleDataSourceStreamReader contract)."""

    def __init__(self, options: dict):
        self.target = options["target"]
        self.timeout = float(options.get("timeout", "10"))
        self.headers = json.loads(options["headers"]) if options.get("headers") else None

    def initialOffset(self) -> dict:
        return {"poll": 0, "etag": None}

    def read(self, start: dict) -> Tuple[Iterator[Tuple[str]], dict]:
        status, body, etag = _fetch(
            self.target, start.get("etag"), self.headers, self.timeout
        )
        nxt = {"poll": int(start.get("poll", 0)) + 1, "etag": etag}
        if status == 304 or (etag is not None and etag == start.get("etag")):
            # ETag unchanged — suppress the duplicate response
            # (src/input/poll.ts:123-146).
            return iter([]), nxt
        if status != 200 or not body:
            return iter([]), nxt
        return iter([(line,) for line in body.splitlines() if line.strip()]), nxt

    def readBetweenOffsets(self, start: dict, end: dict):
        # Replay after restart: the polled resource is not a log — the
        # reference re-GETs and moves on; an empty replay matches its
        # at-most-once delivery.
        return iter([])

    def commit(self, end: dict) -> None:
        pass


class PollDataSource(DataSource):
    """``spark.readStream.format("cdp-poll").option("target", url)``.

    Register per-session with
    ``spark.dataSource.register(PollDataSource)``.
    """

    @classmethod
    def name(cls) -> str:
        return "cdp-poll"

    def schema(self) -> StructType:
        return SCHEMA

    def simpleStreamReader(self, schema: StructType):  # noqa: ARG002
        return _PollReader(self.options)


def stream_poll(spark, target: str, wrap=None, headers: dict | None = None):
    """Poll ``target`` as an event stream: lines → events with the
    same wrap/validation semantics as the file sources."""
    from .sources import lines_to_events

    spark.dataSource.register(PollDataSource)
    reader = spark.readStream.format("cdp-poll").option("target", target)
    if headers:
        reader = reader.option("headers", json.dumps(headers))
    return lines_to_events(reader.load(), wrap)
