"""Dead-letter forwarding (reference: src/dead-letter.ts:19-32).

Input lines that couldn't be turned into events are captured as a
``(line, reason)`` DataFrame channel by the parsers in
:mod:`cdp_spark.events`.  The reference logs each dead event and, when
``DEAD_LETTER_TARGET`` is configured (src/conf.ts:109-139), forwards
them as an NDJSON body to that URI using
``DEAD_LETTER_TARGET_METHOD`` (POST | PUT | PATCH, default POST) and
``DEAD_LETTER_TARGET_HEADERS`` (a JSON object of extra headers).

Spark-first shape: the forwarding reuses the distributed send-http
action (``io.sinks.make_http_action`` — executor-side posts with
retry/backoff, NDJSON framing identical to the reference's
``sendEvents`` transform at src/io/http-client.ts:71-98), so a 100 TB
run never funnels dead letters through the driver.
"""

from __future__ import annotations

import json
import logging
import os
import re
from typing import Mapping, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .io.sinks import make_http_action

logger = logging.getLogger("cdp_spark.dead-letter")

_TARGET_RE = re.compile(r"^https?://\S+$")
_METHODS = ("POST", "PUT", "PATCH")


def dead_letter_config(
    env: Optional[Mapping[str, str]] = None,
) -> Optional[tuple[str, str, dict[str, str]]]:
    """Read (target, method, headers) from the environment, mirroring
    the reference's conf schema checks (src/conf.ts:109-139).  Returns
    None when no valid target is configured."""
    env = os.environ if env is None else env
    target = env.get("DEAD_LETTER_TARGET") or ""
    if not _TARGET_RE.match(target):
        if target:
            logger.warning("ignoring invalid DEAD_LETTER_TARGET %r", target)
        return None
    method = (env.get("DEAD_LETTER_TARGET_METHOD") or "POST").upper()
    if method not in _METHODS:
        logger.warning(
            "invalid DEAD_LETTER_TARGET_METHOD %r; using POST", method
        )
        method = "POST"
    headers: dict[str, str] = {}
    raw = env.get("DEAD_LETTER_TARGET_HEADERS")
    if raw:
        try:
            parsed = json.loads(raw)
            if not isinstance(parsed, dict):
                raise ValueError("not an object")
            headers = {str(k): str(v) for k, v in parsed.items()}
        except (ValueError, TypeError) as err:
            logger.warning("ignoring DEAD_LETTER_TARGET_HEADERS: %s", err)
    return target, method, headers


def ship_dead_letters(
    dead: Optional[DataFrame],
    env: Optional[Mapping[str, str]] = None,
) -> bool:
    """Forward the dead-letter channel to ``DEAD_LETTER_TARGET`` if
    configured.  The body is the raw failed input lines as NDJSON —
    the closest analog of the reference's one-JSON-per-line event dump
    (src/io/http-client.ts:81-84); the parse-failure reason travels in
    an ``X-CDP-Dead-Letter`` header tag rather than mutating the data.

    Returns True when a send was attempted (target configured and the
    channel exists).  Errors are logged, never raised — dead-letter
    forwarding is fire-and-forget like the reference's handler."""
    if dead is None:
        return False
    cfg = dead_letter_config(env)
    if cfg is None:
        return False
    target, method, headers = cfg
    try:
        action = make_http_action(
            dead.select(F.col("line")),
            target,
            method=method,
            headers={"X-CDP-Dead-Letter": "true", **headers},
        )
        action()
        return True
    except Exception as err:  # fire-and-forget (dead-letter.ts:19-32)
        logger.warning("couldn't forward dead letters: %s", err)
        return True
