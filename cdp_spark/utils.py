"""Small utilities ported for behavioral parity with the reference.

- get_signature: SHA-1 (base64url, unpadded) over the JSON encoding of
  the arguments (reference: src/utils.ts:58-84).  Used to stamp every
  event with the identity of the pipeline that processed it.
- envsubst: ``${VAR}`` substitution across a parsed YAML/JSON tree
  (reference: src/utils.ts:105-120).
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import re


def json_stringify(value: object) -> str:
    """JSON encoding matching JS ``JSON.stringify`` closely enough for
    signature stability: compact separators, insertion-ordered keys,
    raw (non-ascii-escaped) unicode."""
    return json.dumps(value, separators=(",", ":"), ensure_ascii=False)


def get_signature(*args: object) -> str:
    """SHA-1 base64url (no padding) of the concatenated JSON encodings
    of the non-None arguments (src/utils.ts:58-84; None stands in for
    JS ``undefined``, which the reference filters out)."""
    present = [a for a in args if a is not None]
    if not present:
        raise ValueError("no valid argument was given")
    h = hashlib.sha1()
    for arg in present:
        h.update(json_stringify(arg).encode("utf-8"))
    return base64.urlsafe_b64encode(h.digest()).decode("ascii").rstrip("=")


_ENV_RE = re.compile(r"\$\{[A-Za-z]\w*\}")


def envsubst(thing: object, env: dict[str, str] | None = None) -> object:
    """Replace ``${VAR}`` placeholders throughout a parsed document
    (src/utils.ts:105-120); missing variables become empty strings."""
    lookup = os.environ if env is None else env

    if isinstance(thing, str):
        return _ENV_RE.sub(lambda m: lookup.get(m.group(0)[2:-1], ""), thing)
    if isinstance(thing, list):
        return [envsubst(x, env) for x in thing]
    if isinstance(thing, dict):
        return {envsubst(k, env): envsubst(v, env) for k, v in thing.items()}
    return thing
