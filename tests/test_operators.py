"""Step-function operator tests: rename, deduplicate (all 8 key
configurations), keep first/last, keep-when (native + jsonschema
fallback paths) — semantics from src/step-functions/.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdp_spark.operators import deduplicate, keep, keep_when, rename, validate_rename
from cdp_spark.operators.keep_when import compile_schema_predicate
from cdp_spark.windows import tumbling_count_windows


def events_df(spark, rows):
    """rows: (rn, n, d, t_json) with d as JSON text or None."""
    return spark.createDataFrame(
        [(rn, n, d, t) for rn, n, d, t in rows],
        "rn long, n string, d string, t_raw string",
    ).withColumn(
        "t", F.from_json("t_raw", "array<struct<i double, p string, h string>>")
    ).drop("t_raw")


# --- rename ---


def test_rename_replace_and_affixes(spark):
    df = events_df(spark, [(0, "a.b", None, None)])
    assert rename(df, replace="x.y").first()["n"] == "x.y"
    assert rename(df, prepend="pre.", append=".post").first()["n"] == "pre.a.b.post"
    assert rename(df, append="x").first()["n"] == "a.bx"


def test_rename_validation():
    with pytest.raises(ValueError):
        validate_rename(replace=".bad")
    with pytest.raises(ValueError):
        validate_rename(append=".")
    with pytest.raises(ValueError):
        validate_rename(prepend="..a")
    with pytest.raises(ValueError):
        validate_rename(replace="a", append="b")
    validate_rename(append=".ok")
    validate_rename(prepend="ok.")
    validate_rename(append="ok")


# --- deduplicate ---

DUP_ROWS = [
    (0, "a", '{"x":1}', '[{"i":1.0,"p":"p","h":"h"}]'),
    (1, "a", '{"x":1}', '[{"i":2.0,"p":"p","h":"h"}]'),  # same n+d, diff trace
    (2, "a", '{"x":2}', '[{"i":1.0,"p":"p","h":"h"}]'),  # same n, diff d
    (3, "b", '{"x":1}', '[{"i":1.0,"p":"p","h":"h"}]'),  # diff n
]


def surviving(spark, **kwargs):
    df = events_df(spark, DUP_ROWS)
    out = deduplicate(df, "rn", window_col=None, **kwargs)
    return sorted(r["rn"] for r in out.collect())


def test_dedup_default_name_data(spark):
    assert surviving(spark) == [0, 2, 3]


def test_dedup_name_only(spark):
    assert surviving(spark, consider_data=False) == [0, 3]


def test_dedup_data_only(spark):
    assert surviving(spark, consider_name=False) == [0, 2]


def test_dedup_all_three(spark):
    assert surviving(spark, consider_trace=True) == [0, 1, 2, 3]


def test_dedup_trace_only(spark):
    assert surviving(spark, consider_name=False, consider_data=False, consider_trace=True) == [0, 1]


def test_dedup_none_keeps_first_only(spark):
    assert surviving(spark, consider_name=False, consider_data=False) == [0]


def test_dedup_canonicalizes_json(spark):
    df = events_df(
        spark,
        [(0, "a", '{"x":1,"y":2}', None), (1, "a", '{"y": 2, "x": 1}', None)],
    )
    assert [r["rn"] for r in deduplicate(df, "rn", window_col=None).collect()] == [0]


def test_dedup_within_windows(spark):
    df = events_df(
        spark,
        [(i, "a", '{"x":1}', None) for i in range(4)],
    )
    win = tumbling_count_windows(df, 2, "rn")
    out = deduplicate(win, "rn")
    assert sorted(r["rn"] for r in out.collect()) == [0, 2]


# --- keep ---


def test_keep_first_last(spark):
    df = events_df(spark, [(i, "a", str(i), None) for i in range(5)])
    win = tumbling_count_windows(df, 3, "rn")
    assert sorted(r["rn"] for r in keep(win, "rn", first=2).collect()) == [0, 1, 3, 4]
    assert sorted(r["rn"] for r in keep(win, "rn", last=1).collect()) == [2, 4]
    with pytest.raises(ValueError):
        keep(win, "rn")
    with pytest.raises(ValueError):
        keep(win, "rn", first=1, last=1)


# --- keep-when ---


def test_keep_when_native_path(spark):
    schema = {
        "type": "object",
        "required": ["temperature"],
        "properties": {"temperature": {"type": "number", "minimum": 0}},
    }
    _, native = compile_schema_predicate(schema)
    assert native
    df = events_df(
        spark,
        [
            (0, "a", '{"temperature": 20.5}', None),
            (1, "a", '{"temperature": -4}', None),
            (2, "a", '{"temperature": "hot"}', None),
            (3, "a", '{"humidity": 0.5}', None),
            (4, "a", "[1,2]", None),
            (5, "a", None, None),
        ],
    )
    assert sorted(r["rn"] for r in keep_when(df, schema).collect()) == [0]


def test_keep_when_type_scalars(spark):
    df = events_df(
        spark,
        [
            (0, "a", "1", None),
            (1, "a", "1.5", None),
            (2, "a", '"s"', None),
            (3, "a", "null", None),
            (4, "a", "true", None),
        ],
    )
    assert sorted(r["rn"] for r in keep_when(df, {"type": "number"}).collect()) == [0, 1]
    assert sorted(r["rn"] for r in keep_when(df, {"type": "integer"}).collect()) == [0]
    assert sorted(r["rn"] for r in keep_when(df, {"type": "string"}).collect()) == [2]
    assert sorted(r["rn"] for r in keep_when(df, {"type": "null"}).collect()) == [3]
    assert sorted(r["rn"] for r in keep_when(df, {"type": "boolean"}).collect()) == [4]


def test_keep_when_fallback_matches_native(spark):
    # 'pattern' forces the jsonschema fallback path
    schema_native = {"type": "object", "required": ["x"]}
    schema_fallback = {"type": "object", "required": ["x"], "pattern": None}
    del schema_fallback["pattern"]
    schema_fallback["patternProperties"] = {}
    _, native = compile_schema_predicate(schema_fallback)
    assert not native
    df = events_df(
        spark,
        [
            (0, "a", '{"x": 1}', None),
            (1, "a", '{"y": 1}', None),
            (2, "a", '{"x": null}', None),
            (3, "a", "7", None),
        ],
    )
    got_native = sorted(r["rn"] for r in keep_when(df, schema_native).collect())
    got_fb = sorted(r["rn"] for r in keep_when(df, schema_fallback).collect())
    # 7 fails type:object; {"x":null} still satisfies required:["x"]
    assert got_native == got_fb == [0, 2]


def test_keep_when_combinators_native(spark):
    # anyOf / allOf / oneOf / not are native (pure predicate logic)
    for schema in (
        {"anyOf": [{"type": "integer"}, {"type": "string"}]},
        {"allOf": [{"type": "number"}, {"minimum": 0}]},
        {"oneOf": [{"type": "number"}, {"minimum": 0}]},
        {"not": {"type": "string"}},
    ):
        _, native = compile_schema_predicate(schema)
        assert native, schema
    df = events_df(
        spark,
        [
            (0, "a", "1", None),
            (1, "a", "1.5", None),
            (2, "a", '"s"', None),
            (3, "a", "-2", None),
            (4, "a", "true", None),
        ],
    )
    assert sorted(
        r["rn"] for r in keep_when(df, {"anyOf": [{"type": "integer"}, {"type": "string"}]}).collect()
    ) == [0, 2, 3]
    assert sorted(
        r["rn"] for r in keep_when(df, {"allOf": [{"type": "number"}, {"minimum": 0}]}).collect()
    ) == [0, 1]
    # oneOf: number XOR (minimum 0): -2 is number but fails min -> one
    # match; true passes minimum vacuously (non-number) but isn't a
    # number -> one match; 1/1.5 match both -> excluded
    assert sorted(
        r["rn"] for r in keep_when(df, {"oneOf": [{"type": "number"}, {"minimum": 0}]}).collect()
    ) == [2, 3, 4]
    assert sorted(r["rn"] for r in keep_when(df, {"not": {"type": "string"}}).collect()) == [
        0, 1, 3, 4,
    ]


def test_keep_when_pattern_native(spark):
    schema = {"type": "object", "properties": {"id": {"type": "string", "pattern": "^ev-[0-9]+$"}}}
    _, native = compile_schema_predicate(schema)
    assert native
    df = events_df(
        spark,
        [
            (0, "a", '{"id": "ev-123"}', None),
            (1, "a", '{"id": "bad"}', None),
            (2, "a", '{"id": 7}', None),  # fails the sub-schema's type: string
            (3, "a", '{"other": 1}', None),  # missing: properties vacuous
        ],
    )
    assert sorted(r["rn"] for r in keep_when(df, schema).collect()) == [0, 3]


def test_keep_when_items_native(spark):
    schema = {"type": "array", "items": {"type": "number", "minimum": 0}}
    _, native = compile_schema_predicate(schema)
    assert native
    df = events_df(
        spark,
        [
            (0, "a", "[1, 2.5, 3]", None),
            (1, "a", "[1, -2]", None),
            (2, "a", '[1, "x"]', None),
            (3, "a", "[]", None),
            (4, "a", "7", None),  # not an array -> fails type
        ],
    )
    assert sorted(r["rn"] for r in keep_when(df, schema).collect()) == [0, 3]


def test_keep_when_new_native_keys_match_jsonschema(spark):
    # cross-check every newly-native construct against the jsonschema
    # library (the fallback oracle)
    import jsonschema

    payloads = [
        "1", "-1", "1.5", '"ev-1"', '"zz"', "true", "null",
        "[1,2]", "[-1]", '["a"]', "[]",
        '{"id":"ev-9"}', '{"id":"x"}', '{"id":3}', "{}",
    ]
    schemas = [
        {"anyOf": [{"type": "integer"}, {"type": "string", "pattern": "^ev-"}]},
        {"allOf": [{"type": "number"}, {"not": {"minimum": 0}}]},
        {"oneOf": [{"type": "array"}, {"minimum": 0}]},
        {"items": {"type": "number"}},
        {"properties": {"id": {"pattern": "^ev-"}}},
    ]
    df = events_df(spark, [(i, "a", p, None) for i, p in enumerate(payloads)])
    import json as _json

    for schema in schemas:
        _, native = compile_schema_predicate(schema)
        assert native, schema
        got = sorted(r["rn"] for r in keep_when(df, schema).collect())
        validator = jsonschema.Draft7Validator(schema)
        want = sorted(
            i for i, p in enumerate(payloads) if validator.is_valid(_json.loads(p))
        )
        assert got == want, (schema, got, want)
