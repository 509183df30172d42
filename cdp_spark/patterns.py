"""Event-name pattern algebra, compiled to Spark Column predicates.

Semantics parity with the reference's RabbitMQ-style routing patterns
(reference: src/pattern.ts:1-198):

- An event *name* is dot-separated words over ``[A-Za-z0-9-_$:]``
  (src/pattern.ts:11-17); every word must be non-empty
  (src/pattern.ts:46-48).
- A string *pattern* additionally allows two wildcard words:
  ``*`` matches exactly one word, ``#`` matches zero or more words
  (src/pattern.ts:19-29,146-166).
- Patterns are closed under ``{"and": [...]}, {"or": [...]},
  {"not": ...}`` combinators (src/pattern.ts:77-81).

Spark-first design: a pattern compiles to a single anchored regular
expression per string pattern (evaluated JVM-side via ``rlike``, inside
whole-stage codegen — no Python UDF), and combinators compile to
``&``/``|``/``~`` over Columns.  ``match_name`` is a direct pure-Python
port of the reference matcher (src/pattern.ts:146-166) used only for
validation and property tests — never in the data path.
"""

from __future__ import annotations

import re
from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_SEPARATOR = "."
SINGLE_WILDCARD = "*"
MULTI_WILDCARD = "#"

_NAME_CHARS = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ" "abcdefghijklmnopqrstuvwxyz" "0123456789" "-_$:" + WORD_SEPARATOR
)
_PATTERN_CHARS = _NAME_CHARS | {SINGLE_WILDCARD, MULTI_WILDCARD}

# A pattern is a string or an and/or/not combinator over patterns.
Pattern = Union[str, dict]


def is_valid_event_name(name: str) -> bool:
    """Port of ``isValidEventName`` (src/pattern.ts:46-48)."""
    if not isinstance(name, str) or not name:
        return False
    return all(c in _NAME_CHARS for c in name) and all(
        len(w) > 0 for w in name.split(WORD_SEPARATOR)
    )


def _is_valid_pattern_string(pattern: str) -> bool:
    """Port of ``isValidPatternString`` (src/pattern.ts:61-71)."""
    if not isinstance(pattern, str) or not pattern:
        return False
    if not all(c in _PATTERN_CHARS for c in pattern):
        return False
    for word in pattern.split(WORD_SEPARATOR):
        if len(word) == 0:
            return False
        if len(word) > 1 and (SINGLE_WILDCARD in word or MULTI_WILDCARD in word):
            return False
    return True


def is_valid_pattern(pattern: object) -> bool:
    """Port of ``isValidPattern`` (src/pattern.ts:117-134)."""
    if isinstance(pattern, str):
        return _is_valid_pattern_string(pattern)
    if isinstance(pattern, dict):
        if set(pattern.keys()) == {"and"} and isinstance(pattern["and"], list):
            return all(is_valid_pattern(p) for p in pattern["and"])
        if set(pattern.keys()) == {"or"} and isinstance(pattern["or"], list):
            return all(is_valid_pattern(p) for p in pattern["or"])
        if set(pattern.keys()) == {"not"}:
            return is_valid_pattern(pattern["not"])
    return False


def _words_match(s_words: list[str], p_words: list[str]) -> bool:
    """Pure-Python port of ``wordsMatchPatternWords``
    (src/pattern.ts:146-166). Reference oracle for the regex compiler."""
    if len(p_words) == 1 and p_words[0] == MULTI_WILDCARD:
        return True
    if not s_words and not p_words:
        return True
    if not s_words or not p_words:
        return False
    s_word, s_rest = s_words[0], s_words[1:]
    p_word, p_rest = p_words[0], p_words[1:]
    if p_word == MULTI_WILDCARD:
        return (
            _words_match(s_rest, p_words)
            or _words_match(s_rest, p_rest)
            or _words_match(s_words, p_rest)
        )
    if p_word == SINGLE_WILDCARD:
        return _words_match(s_rest, p_rest)
    return s_word == p_word and _words_match(s_rest, p_rest)


def match_name(name: str, pattern: Pattern) -> bool:
    """Port of ``match`` (src/pattern.ts:171-198); test oracle only."""
    if isinstance(pattern, str):
        return _words_match(name.split(WORD_SEPARATOR), pattern.split(WORD_SEPARATOR))
    if "and" in pattern:
        return all(match_name(name, p) for p in pattern["and"])
    if "or" in pattern:
        return any(match_name(name, p) for p in pattern["or"])
    if "not" in pattern:
        return not match_name(name, pattern["not"])
    return False


def pattern_to_regex(pattern: str) -> str:
    """Compile one string pattern to an anchored regex with identical
    accept-set to the recursive matcher (property-tested in
    tests/test_patterns.py).

    Token translation: literal word -> escaped literal, ``*`` ->
    ``[^.]+``; then ``#`` and its adjacent separator collapse into a
    zero-or-more-words group so that ``a.#.b`` accepts ``a.b``.
    """
    raw_words = pattern.split(WORD_SEPARATOR)
    # Reference quirk (src/pattern.ts:150-152): with input exhausted,
    # only a remaining pattern of [] or exactly ["#"] accepts — so a
    # TRAILING run of >=2 hashes demands at least one more word, while
    # internal hash runs (and a single trailing '#') match zero-or-more.
    trailing = 0
    while trailing < len(raw_words) and raw_words[-1 - trailing] == MULTI_WILDCARD:
        trailing += 1
    if trailing == len(raw_words):
        # Pattern made only of hashes accepts everything the matcher
        # accepts (any split yields >=1 word; lone '#' short-circuits
        # at src/pattern.ts:149).
        return r"^.*$"
    # Collapse each hash run to one hash: zero-or-more twice is still
    # zero-or-more, and it keeps the separator rewrite unambiguous.
    words = [
        w
        for i, w in enumerate(raw_words)
        if not (w == MULTI_WILDCARD and i > 0 and raw_words[i - 1] == MULTI_WILDCARD)
    ]
    parts = []
    for w in words:
        if w == MULTI_WILDCARD:
            parts.append("#")
        elif w == SINGLE_WILDCARD:
            parts.append(r"[^.]+")
        else:
            parts.append(re.escape(w))
    body = r"\.".join(parts)
    # '#.' -> zero or more (word + dot); '.#' (only at end) -> zero or
    # more (dot + word); both make the '#' and its separator optional
    # together, which is what gives the zero-word match.
    body = body.replace(r"#\.", r"(?:[^.]+\.)*")
    if trailing >= 2:
        body = body[: -len(r"\.#")] + r"(?:\.[^.]+)+" if body.endswith(r"\.#") else body
    else:
        body = body.replace(r"\.#", r"(?:\.[^.]+)*")
    return "^" + body + "$"


def pattern_to_column(pattern: Pattern, name_col: Union[str, Column] = "n") -> Column:
    """Compile a full pattern (string or combinator) to a boolean
    Column over the event-name column.

    The result is a pure JVM-side expression (``rlike`` + boolean
    algebra): Catalyst can push it into scans and it stays inside
    whole-stage codegen — the Spark analog of the reference applying
    the pattern filter at step ingress (src/step.ts:174,184).
    """
    col = F.col(name_col) if isinstance(name_col, str) else name_col
    if isinstance(pattern, str):
        if not _is_valid_pattern_string(pattern):
            raise ValueError(f"invalid pattern string: {pattern!r}")
        return col.rlike(pattern_to_regex(pattern))
    if isinstance(pattern, dict):
        if "and" in pattern and set(pattern.keys()) == {"and"}:
            out = F.lit(True)
            for p in pattern["and"]:
                out = out & pattern_to_column(p, col)
            return out
        if "or" in pattern and set(pattern.keys()) == {"or"}:
            out = F.lit(False)
            for p in pattern["or"]:
                out = out | pattern_to_column(p, col)
            return out
        if "not" in pattern and set(pattern.keys()) == {"not"}:
            return ~pattern_to_column(pattern["not"], col)
    raise ValueError(f"invalid pattern: {pattern!r}")


def pattern_to_sql(pattern: Pattern, name_expr: str = "n") -> str:
    """Render the same predicate as ANSI SQL (regexp_matches) for the
    DuckDB oracle — keeps oracle_sql() in lockstep with the Spark plan."""
    if isinstance(pattern, str):
        regex = pattern_to_regex(pattern)
        return f"regexp_matches({name_expr}, '{regex}')"
    if "and" in pattern:
        return "(" + " AND ".join(pattern_to_sql(p, name_expr) for p in pattern["and"]) + ")"
    if "or" in pattern:
        return "(" + " OR ".join(pattern_to_sql(p, name_expr) for p in pattern["or"]) + ")"
    if "not" in pattern:
        return f"(NOT {pattern_to_sql(pattern['not'], name_expr)})"
    raise ValueError(f"invalid pattern: {pattern!r}")
