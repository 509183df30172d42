"""HTTP server input — the reference's main ingestion path
(src/input/http.ts:90-165, examples/basic-http-input).

Contract: ``POST <endpoint>`` with an NDJSON body feeds events into
the pipeline; ``GET /healthz`` answers a health document
(application/health+json, src/input/http.ts:126-139); anything else is
404; ingestion under backpressure answers 503 (http.ts:115-117).

Spark-first shape: the server is driver-side and spools each request
body as one atomically-renamed NDJSON file; the pipeline reads the
spool with Spark's file stream (``stream_ndjson_files``), which gives
exactly-once offsets, distributed parsing, and replayable input for
free — the same bridge pattern a cluster deployment would use with an
object-store spool and a fleet of stateless ingest pods.  Parsing and
wrap semantics are shared with every other line-oriented source
(``lines_to_events``).

Backpressure: the reference flips 503 while its internal queue is
saturated (src/backpressure.ts).  Here the analog signal is the spool
backlog — requests are refused once ``max_backlog_files`` spooled
files await pickup, which bounds spool growth when the stream stalls.
The stream deletes files it has committed (file-source
``cleanSource=delete``), so the backlog gauge is pending work, not a
cumulative counter — a drained pipeline accepts new POSTs forever.
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..events import WrapDirective
from .sources import stream_ndjson_files

HEALTH_ENDPOINT = "/healthz"  # HTTP_SERVER_HEALTH_ENDPOINT, src/conf.ts:174-178
DEFAULT_PORT = 8000  # HTTP_SERVER_DEFAULT_PORT, src/conf.ts:143-148


class HttpIngestServer:
    """Accept POSTed NDJSON and spool it for a Spark file stream."""

    def __init__(
        self,
        spool_dir: str,
        endpoint: str = "/events",
        port: int = 0,
        max_backlog_files: int = 1024,
        healthy: Optional[callable] = None,
    ):
        os.makedirs(spool_dir, exist_ok=True)
        self.spool_dir = spool_dir
        self.endpoint = endpoint if endpoint.startswith("/") else "/" + endpoint
        self.max_backlog_files = max_backlog_files
        self.received = 0
        self._seq_lock = threading.Lock()
        self._healthy = healthy if healthy is not None else (lambda: True)
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args: object) -> None:
                pass

            def do_POST(self) -> None:
                path = self.path.split("?", 1)[0].rstrip("/") or "/"
                if path != server.endpoint.rstrip("/"):
                    self.send_error(404)
                    return
                if server.backlog() >= server.max_backlog_files:
                    self.send_error(503)
                    return
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                server._spool(body)
                # ctx.body = null -> 204-equivalent empty success
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()

            def do_GET(self) -> None:
                path = self.path.split("?", 1)[0]
                if path != HEALTH_ENDPOINT:
                    self.send_error(404)
                    return
                ok = server._healthy()
                doc = json.dumps({"status": "pass" if ok else "fail"})
                body = doc.encode()
                self.send_response(200 if ok else 500)
                self.send_header("Content-Type", "application/health+json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    def _spool(self, body: bytes) -> None:
        """One request -> one file, atomic rename so the file stream
        never reads a partial write.  The sequence number is taken
        under a lock: ThreadingHTTPServer handles POSTs concurrently,
        and an unguarded counter could hand two requests the same
        ordering prefix (and drop increments)."""
        with self._seq_lock:
            seq = self.received
            self.received += 1
        name = f"{seq:012d}-{uuid.uuid4().hex}.ndjson"
        tmp = os.path.join(self.spool_dir, "." + name + ".tmp")
        final = os.path.join(self.spool_dir, name)
        with open(tmp, "wb") as f:
            if body and not body.endswith(b"\n"):
                body += b"\n"
            f.write(body)
        os.rename(tmp, final)

    def backlog(self) -> int:
        """Files awaiting pickup.  Valid as a pending gauge because the
        consuming stream runs with cleanSource=delete (committed files
        leave the directory); archived/compacted spool layouts would
        need a stream-progress gauge instead."""
        return sum(
            1 for n in os.listdir(self.spool_dir) if not n.startswith(".")
        )

    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}{self.endpoint}"

    def start(self) -> "HttpIngestServer":
        self._thread.start()
        return self

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


def stream_http(
    spark: SparkSession,
    spool_dir: str,
    endpoint: str = "/events",
    port: int = 0,
    wrap: WrapDirective = None,
    max_backlog_files: int = 1024,
    max_files_per_trigger: Optional[int] = None,
) -> tuple[DataFrame, HttpIngestServer]:
    """HTTP input: start the ingest server and return (event stream,
    server handle).  The stream is the standard file stream over the
    spool; callers own the server lifecycle (``server.close()``)."""
    server = HttpIngestServer(
        spool_dir,
        endpoint=endpoint,
        port=port,
        max_backlog_files=max_backlog_files,
    ).start()
    stream = stream_ndjson_files(
        spark,
        spool_dir,
        wrap=wrap,
        max_files_per_trigger=max_files_per_trigger,
        clean_source="delete",
    )
    return stream, server
