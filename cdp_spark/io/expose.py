"""expose-http: ring buffer of windowed responses + HTTP serving.

Reimplements the reference's expose-http contract
(src/step-functions/expose-http.ts:101-291):

- A fixed-size sliding buffer of the latest N responses.  Without a
  jq/jsonnet expr each window becomes one NDJSON response
  (``application/x-ndjson``, expose-http.ts:126-133); with an expr
  each produced value becomes one response (string verbatim, anything
  else JSON-encoded, expose-http.ts:140-154).
- ETag = base64url(SHA-1(JSON.stringify(body))) (utils.ts:58-83 hashes
  the JSON-encoded body string).
- ``GET <endpoint>`` serves the latest response; ``GET
  <endpoint>/<etag>/`` serves a buffered response by key; each carries
  ``ETag: "<key>"`` and a ``Link: <...previous...>; rel="next"``
  header walking backward through the buffer, omitted when the walk
  would wrap past the oldest entry (expose-http.ts:235-251).
- Anything else is 404; an empty slot is 503.

The buffer is driver-side state fed by a sink action (same parity
contract as the stdout/file sinks: window order preserved).  At scale
the accumulation is bounded by N responses regardless of input volume
— the DataFrame side only ships the final window payloads.
"""

from __future__ import annotations

import base64
import hashlib
import json
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional


def response_etag(body: str) -> str:
    """base64url(SHA-1(JSON.stringify(body))) — getSignature
    (src/utils.ts:58-83) hashes the JSON-encoded string, unpadded
    base64url like Node's "base64url" encoding."""
    encoded = json.dumps(body, ensure_ascii=False, separators=(",", ":"))
    digest = hashlib.sha1(encoded.encode("utf-8")).digest()
    return base64.urlsafe_b64encode(digest).rstrip(b"=").decode("ascii")


@dataclass
class ExposedResponse:
    body: str
    etag: str
    content_type: Optional[str]
    # ETag of the previous (older) buffered response, for Link paging;
    # None at the oldest reachable entry.
    link_key: Optional[str] = None


@dataclass
class ExposeBuffer:
    """The fixed-size sliding response buffer (expose-http.ts:179-199).

    ``register_*`` slides a new response in, evicting the oldest;
    ``get()`` returns the latest, ``get(key)`` a buffered response by
    ETag.  Thread-safe: the HTTP server reads while the sink writes.
    """

    size: int
    _keys: list[Optional[str]] = field(init=False)
    _responses: list[Optional[tuple[str, Optional[str]]]] = field(init=False)
    _index: dict[str, int] = field(init=False, default_factory=dict)
    _current: int = field(init=False)
    _lock: threading.Lock = field(init=False, default_factory=threading.Lock)

    def __post_init__(self) -> None:
        if self.size < 1:
            raise ValueError("expose-http responses must be >= 1")
        self._keys = [None] * self.size
        self._responses = [None] * self.size
        self._current = self.size - 1

    def _register(self, body: str, content_type: Optional[str]) -> str:
        key = response_etag(body)
        with self._lock:
            index = (self._current + 1) % self.size
            previous = self._keys[index]
            # Only drop the evicted slot's mapping when it still points
            # here: a duplicate body buffered later re-maps the same
            # ETag to a newer slot, and that live mapping must survive
            # (otherwise a key still advertised via Link 404s).
            if previous is not None and self._index.get(previous) == index:
                self._index.pop(previous, None)
            self._keys[index] = key
            self._index[key] = index
            self._responses[index] = (body, content_type)
            self._current = index
        return key

    def register_window(self, event_jsons: list[str]) -> str:
        """One window -> one NDJSON response (expose-http.ts:126-133)."""
        return self._register("\n".join(event_jsons) + "\n", "application/x-ndjson")

    def register_value(self, val_json: str) -> str:
        """One jq/jsonnet value -> one response: JSON strings verbatim,
        anything else as its JSON encoding (expose-http.ts:140-154)."""
        if val_json.startswith('"'):
            return self._register(json.loads(val_json), None)
        return self._register(val_json, None)

    def get(self, key: Optional[str] = None) -> Optional[ExposedResponse]:
        with self._lock:
            if key is None:
                index = self._current
            elif key in self._index:
                index = self._index[key]
            else:
                return None
            entry = self._responses[index]
            if entry is None:
                return None
            body, ctype = entry
            prev_index = (index - 1) % self.size
            link = None
            if prev_index != self._current and self._keys[prev_index] is not None:
                link = self._keys[prev_index]
            return ExposedResponse(body, self._keys[index] or "", ctype, link)

    def latest_key(self) -> Optional[str]:
        with self._lock:
            return self._keys[self._current]


class ExposeServer:
    """Minimal HTTP serving layer over an ExposeBuffer
    (expose-http.ts:252-283): GET endpoint -> latest, GET
    endpoint/<key>/ -> by ETag, 404 otherwise, 503 for empty slots."""

    def __init__(
        self,
        buffer: ExposeBuffer,
        endpoint: str = "/events",
        port: int = 0,
        headers: Optional[dict[str, str]] = None,
    ):
        self.buffer = buffer
        self.endpoint = endpoint.rstrip("/") or "/"
        self.headers = dict(headers or {})
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args: object) -> None:  # quiet
                pass

            def do_GET(self) -> None:
                path = self.path.split("?", 1)[0]
                key: Optional[str] = None
                if path in (server.endpoint, server.endpoint + "/"):
                    pass
                elif path.startswith(server.endpoint + "/"):
                    rest = path[len(server.endpoint) + 1 :].rstrip("/")
                    if not rest or "/" in rest:
                        self.send_error(404)
                        return
                    key = rest
                else:
                    self.send_error(404)
                    return
                resp = server.buffer.get(key)
                if resp is None and key is not None:
                    self.send_error(404)
                    return
                if resp is None:
                    self.send_error(503)
                    return
                body = resp.body.encode("utf-8")
                self.send_response(200)
                for h, v in server.headers.items():
                    self.send_header(h, v)
                if resp.content_type:
                    self.send_header("Content-Type", resp.content_type)
                if resp.link_key:
                    self.send_header(
                        "Link", f'<{server.endpoint}/{resp.link_key}/>; rel="next"'
                    )
                self.send_header("ETag", f'"{resp.etag}"')
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    def start(self) -> "ExposeServer":
        self._thread.start()
        return self

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
