"""Pass-through sink step functions (batch executors).

Reference shape (e.g. src/step-functions/send-file.ts:121-135): a sink
forwards its input events unchanged and drains a side-effect channel.
Batch mapping: the compiler forwards the DataFrame and records an
*action* (a thunk) per sink; running the pipeline executes the
actions.  The emitted payload is either the events themselves (NDJSON)
or, with ``jq-expr``, each value the jq program produces
(src/step-functions/index.ts:35-48).

Driver-side sinks (stdout, single-file append) iterate with
``toLocalIterator`` — bounded memory, used for parity/debug.  The
scale path for files is ``dir=True`` (distributed text write), and
send-http posts from executors via ``foreachPartition``.
"""

from __future__ import annotations

import json
import sys
from typing import Callable, Iterable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..events import serialize_events
from ..operators.transform import jq_produced_values, jsonnet_produced_values


def sink_payload_lines(
    df: DataFrame,
    order_col: str = "_ord",
    jq_expr: Optional[str] = None,
    jq_prelude: Optional[str] = None,
    jsonnet_expr: Optional[str] = None,
    jsonnet_prelude: Optional[str] = None,
) -> DataFrame:
    """DataFrame of one output line per emitted value, with an order
    column: events as NDJSON, or each jq/jsonnet-produced value
    verbatim when an expr is given (src/step-functions/index.ts:35-48)."""
    if jq_expr is None and jsonnet_expr is None:
        return df.select(F.col(order_col).alias("_ord"), serialize_events(df).alias("line"))
    if jsonnet_expr is not None:
        produced = jsonnet_produced_values(
            df, jsonnet_expr, order_col=order_col, prelude=jsonnet_prelude
        )
    else:
        produced = jq_produced_values(df, jq_expr, order_col=order_col, prelude=jq_prelude)

    # Reference rule for every expr-sink (send-stdout.ts:75-78,
    # send-file.ts:95-98, http-client.ts sendThing): STRING values are
    # emitted raw, everything else compact-JSON.  _val is JSON text,
    # so unquote string values here.
    @F.pandas_udf("string")
    def raw_line(vals):  # noqa: ANN001
        import pandas as pd  # noqa: F401

        def conv(t):
            try:
                v = json.loads(t)
            except ValueError:
                return t
            return v if isinstance(v, str) else t

        return vals.map(conv)

    # Dense (window, index) renumber — see _values_to_events for why
    # the packed-long form overflows at >=1024 input partitions.
    from pyspark.sql.window import Window

    return produced.select(
        F.row_number().over(Window.orderBy("_worder", "_idx")).cast("long").alias("_ord"),
        raw_line(F.col("_val")).alias("line"),
    )


def _iter_lines(df: DataFrame) -> Iterable[str]:
    for row in df.orderBy("_ord").select("line").toLocalIterator():
        yield row["line"]


def make_stdout_action(lines_df: DataFrame, stream=None) -> Callable[[], None]:
    """send-stdout (src/step-functions/send-stdout.ts:64-113)."""

    def action() -> None:
        out = stream if stream is not None else sys.stdout
        for line in _iter_lines(lines_df):
            out.write(line + "\n")

    return action


def make_file_action(lines_df: DataFrame, path: str) -> Callable[[], None]:
    """send-file append-NDJSON (src/step-functions/send-file.ts:80-135).
    Driver-side append to ONE file for reference parity; use
    make_file_dir_action for the distributed write."""

    def action() -> None:
        with open(path, "a", encoding="utf-8") as fh:
            for line in _iter_lines(lines_df):
                fh.write(line + "\n")

    return action


def make_file_dir_action(lines_df: DataFrame, path: str) -> Callable[[], None]:
    """Distributed variant: a directory of part files (the shape a
    100 TB pipeline actually wants)."""

    def action() -> None:
        lines_df.select(F.col("line").alias("value")).write.mode("append").text(path)

    return action


def make_http_action(
    lines_df: DataFrame,
    target: str,
    method: str = "POST",
    headers: Optional[dict[str, str]] = None,
    max_retries: int = 4,
    backoff_factor: float = 1.0,
    timeout: float = 60.0,
    batch_size: int = 500,
) -> Callable[[], None]:
    """send-http fire-and-forget (src/step-functions/send-http.ts:88-154)
    with 5xx retry + exponential backoff (src/io/http-client.ts:28-56).
    Executes on executors via foreachPartition; concurrency is the
    partition count (the reference's 10-in-flight window becomes
    cluster parallelism)."""

    def action() -> None:
        hdrs = {"Content-Type": "application/x-ndjson", **(headers or {})}

        def send_partition(rows) -> None:  # noqa: ANN001
            import time

            import requests

            session = requests.Session()
            buf: list[str] = []

            def flush() -> None:
                if not buf:
                    return
                body = ("\n".join(buf) + "\n").encode()
                for attempt in range(max_retries + 1):
                    try:
                        resp = session.request(method, target, data=body, headers=hdrs, timeout=timeout)
                        if resp.status_code >= 500 and attempt < max_retries:
                            time.sleep(backoff_factor * (2**attempt))
                            continue
                        break
                    except requests.RequestException:
                        if attempt < max_retries:
                            time.sleep(backoff_factor * (2**attempt))
                        else:
                            break
                buf.clear()

            for row in rows:
                buf.append(row["line"])
                if len(buf) >= batch_size:
                    flush()
            flush()

        lines_df.select("line").foreachPartition(send_partition)

    return action


def make_http_value_action(
    lines_df: DataFrame,
    target: str,
    method: str = "POST",
    headers: Optional[dict[str, str]] = None,
    max_retries: int = 4,
    backoff_factor: float = 1.0,
    timeout: float = 60.0,
) -> Callable[[], None]:
    """send-http with a jq/jsonnet expr: ONE request per produced
    value, body = the value itself (raw for strings — already
    unquoted by sink_payload_lines — compact JSON otherwise), no
    implicit Content-Type (http-client.ts sendThing:111-124).  This
    is how e.g. the filebeat-opensearch example assembles a single
    _bulk NDJSON body per window."""

    def action() -> None:
        hdrs = dict(headers or {})

        def send_partition(rows) -> None:  # noqa: ANN001
            import time

            import requests

            session = requests.Session()
            for row in rows:
                body = row["line"].encode()
                for attempt in range(max_retries + 1):
                    try:
                        resp = session.request(
                            method, target, data=body, headers=hdrs, timeout=timeout
                        )
                        if resp.status_code >= 500 and attempt < max_retries:
                            time.sleep(backoff_factor * (2**attempt))
                            continue
                        break
                    except requests.RequestException:
                        if attempt < max_retries:
                            time.sleep(backoff_factor * (2**attempt))
                        else:
                            break

        lines_df.select("line").foreachPartition(send_partition)

    return action


# expose-http buffers by step name, so tests / embedding apps can query
# what a pipeline exposed (and serve it with expose.ExposeServer).
_EXPOSE_BUFFERS: dict[str, "ExposeBuffer"] = {}


def get_expose_buffer(step_name: str) -> Optional["ExposeBuffer"]:
    return _EXPOSE_BUFFERS.get(step_name)


def make_expose_action(
    df: DataFrame,
    step_name: str,
    options: Optional[dict] = None,
    jq_prelude: Optional[str] = None,
    jsonnet_prelude: Optional[str] = None,
) -> Callable[[], None]:
    """expose-http (src/step-functions/expose-http.ts:165-291): slide
    each window (or each jq/jsonnet-produced value) into a fixed-size
    response ring buffer with ETag + Link-paging semantics
    (cdp_spark.io.expose).  When a ``port`` option is given, an HTTP
    server serves the buffer at ``endpoint``; otherwise the buffer is
    queryable via :func:`get_expose_buffer` (embedding apps own the
    server lifecycle)."""
    from .expose import ExposeBuffer, ExposeServer

    o = options or {}
    responses = int(o.get("responses", 1))
    jq_expr = o.get("jq-expr")
    jsonnet_expr = o.get("jsonnet-expr")

    def action() -> None:
        # The action runs once per batch (streaming: every micro-batch)
        # — the ring buffer accumulates across runs and the server
        # binds once, matching the reference's continuously-fed window
        # buffer (expose-http.ts:179-199).
        buffer = _EXPOSE_BUFFERS.get(step_name)
        if buffer is None or buffer.size != responses:
            buffer = ExposeBuffer(responses)
            _EXPOSE_BUFFERS[step_name] = buffer
        if jq_expr is not None or jsonnet_expr is not None:
            if jsonnet_expr is not None:
                produced = jsonnet_produced_values(df, jsonnet_expr, prelude=jsonnet_prelude)
            else:
                produced = jq_produced_values(df, jq_expr, prelude=jq_prelude)
            for row in (
                produced.orderBy("_worder", "_idx").select("_val").toLocalIterator()
            ):
                buffer.register_value(row["_val"])
        else:
            from .brokers import _iter_vectors

            for lines, _stamps in _iter_vectors(df):
                buffer.register_window(lines)
        if o.get("port") is not None and step_name not in _EXPOSE_SERVERS:
            server = ExposeServer(
                buffer,
                endpoint=o.get("endpoint", "/events"),
                port=int(o["port"]),
                headers=o.get("headers"),
            )
            _EXPOSE_SERVERS[step_name] = server.start()
        elif step_name in _EXPOSE_SERVERS:
            # rebind the (possibly new) buffer into the live server
            _EXPOSE_SERVERS[step_name].buffer = buffer

    return action


_EXPOSE_SERVERS: dict[str, object] = {}


def get_expose_server(step_name: str):
    return _EXPOSE_SERVERS.get(step_name)


def make_broker_action(
    kind: str,
    df: DataFrame,
    options: Optional[dict] = None,
    pipeline_name: str = "cdp",
    step_name: str = "step",
    jq_expr: Optional[str] = None,
    jq_prelude: Optional[str] = None,
    jsonnet_expr: Optional[str] = None,
    jsonnet_prelude: Optional[str] = None,
) -> Callable[[], None]:
    """send-amqp / send-mqtt / send-redis publisher action.  Framing,
    routing, and dispatch live in :mod:`cdp_spark.io.brokers`
    (unit-tested against fake clients); the real client connection is
    import-gated in ``default_client_factory`` — inject one with
    ``brokers.set_client_factory``.
    (src/step-functions/send-{amqp,mqtt,redis}.ts)"""
    from . import brokers

    opts = options or {}

    def action() -> None:
        if jq_expr is not None or jsonnet_expr is not None:
            if jsonnet_expr is not None:
                produced = jsonnet_produced_values(
                    df, jsonnet_expr, prelude=jsonnet_prelude
                )
            else:
                produced = jq_produced_values(df, jq_expr, prelude=jq_prelude)
            vals = (
                row["_val"]
                for row in produced.orderBy("_worder", "_idx").select("_val").toLocalIterator()
            )
            brokers.publish_values(kind, vals, opts, pipeline_name, step_name)
        else:
            brokers.publish_events(kind, df, opts, pipeline_name, step_name)

    return action
