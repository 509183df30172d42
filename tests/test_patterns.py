"""Pattern algebra tests.

Truth tables ported from the reference's __tests__/pattern.ts:1-58,
plus a hypothesis property test: the regex compiler must agree with the
direct port of the recursive matcher (src/pattern.ts:146-166) on every
(name, pattern) pair.  These are pure-Python (no Spark) — the Column
compilation is exercised in test_operators_spark.py.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from cdp_spark.patterns import (
    is_valid_event_name,
    is_valid_pattern,
    match_name,
    pattern_to_regex,
)


def regex_match(name: str, pattern: str) -> bool:
    return re.match(pattern_to_regex(pattern), name) is not None


def both(name: str, pattern: str) -> tuple[bool, bool]:
    return match_name(name, pattern), regex_match(name, pattern)


# --- ported truth tables (reference __tests__/pattern.ts) ---


def test_event_name_validity():
    assert is_valid_event_name("foo.bar.baz")
    assert not is_valid_event_name(".bar.baz")
    assert not is_valid_event_name("*.bar.baz")


def test_fixed_pattern():
    assert match_name("foo.bar.baz", "foo.bar.baz")
    assert not match_name("foo.bar.bars", "foo.bar.baz")
    assert not match_name("foo.bar", "foo.bar.baz")


def test_star_wildcard():
    assert match_name("foo.bar.baz", "foo.*.baz")


def test_hash_wildcard_zero_occurrences():
    assert match_name("foo.bar.baz", "#.foo.bar.baz")
    assert match_name("foo", "foo.#")


def test_hash_wildcard_many():
    assert match_name("foo.bar.baz", "#.baz")


def test_pattern_validity():
    assert is_valid_pattern("foo.#.*")
    assert not is_valid_pattern("")
    assert not is_valid_pattern("foo*.bar")
    assert is_valid_pattern({"or": ["foo.bar", "foo.baz"]})
    assert is_valid_pattern({"and": ["foo.bar", "foo.baz"]})
    assert is_valid_pattern({"not": "foo.bar"})
    assert not is_valid_pattern({"xor": ["foo.bar", "foo.baz"]})


def test_composite_patterns():
    assert match_name("foo.bar.baz", {"not": {"or": ["foo.bar", "foo.baz"]}})
    assert match_name("foo.bar.baz", {"and": ["#.baz", "foo.#"]})


# --- regex compiler parity (string patterns) ---


def test_regex_matches_truth_table():
    cases = [
        ("foo.bar.baz", "foo.bar.baz", True),
        ("foo.bar.bars", "foo.bar.baz", False),
        ("foo.bar", "foo.bar.baz", False),
        ("foo.bar.baz", "foo.*.baz", True),
        ("foo.bar.baz", "#.foo.bar.baz", True),
        ("foo", "foo.#", True),
        ("foo.bar.baz", "#.baz", True),
        ("a.b", "a.#.b", True),
        ("a.x.y.b", "a.#.b", True),
        ("a.b.c", "#", True),
        ("a", "#.#", True),
        ("a.b", "foo.#.#", False),
        ("foo.x", "foo.#.#", True),
        # Reference quirk: a trailing run of >=2 hashes requires at
        # least one more word (src/pattern.ts:150-152 early return).
        ("foo", "foo.#.#", False),
        ("x.foo", "#.#.foo", True),
        ("foo", "#.#.foo", True),
        ("a.b.c", "*.*.*", True),
        ("a.b", "*.*.*", False),
    ]
    for name, pattern, expected in cases:
        got_ref, got_rx = both(name, pattern)
        assert got_ref == expected, (name, pattern)
        assert got_rx == expected, ("regex", name, pattern, pattern_to_regex(pattern))


_word = st.sampled_from(["a", "b", "ab", "x1", "z-z"])
_name = st.lists(_word, min_size=1, max_size=5).map(".".join)
_pword = st.sampled_from(["a", "b", "ab", "x1", "*", "#"])
_pattern = st.lists(_pword, min_size=1, max_size=5).map(".".join)


@settings(max_examples=2000, deadline=None)
@given(name=_name, pattern=_pattern)
def test_regex_compiler_agrees_with_reference_matcher(name: str, pattern: str):
    assert regex_match(name, pattern) == match_name(name, pattern)
