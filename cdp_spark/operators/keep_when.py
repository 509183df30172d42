"""keep-when — filter events whose payload validates against a JSON
Schema (src/step-functions/keep-when.ts:44-55).

Two compilation paths:

1. A *native* compiler for the common schema subset (type, const,
   enum, required, properties, minimum/maximum, minLength/maxLength) —
   pure variant-expression Columns, JVM-side, pushdown-friendly.
2. A general fallback: Arrow-batched pandas UDF wrapping the
   ``jsonschema`` library — exact Draft-07 semantics for anything the
   native path can't express.

``compile_schema_predicate`` returns (Column, is_native) so callers
can tell which path a schema took.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NATIVE_KEYS = {
    "type",
    "const",
    "enum",
    "required",
    "properties",
    "minimum",
    "maximum",
    "exclusiveMinimum",
    "exclusiveMaximum",
    "minLength",
    "maxLength",
    "pattern",
    "anyOf",
    "allOf",
    "oneOf",
    "not",
    "items",
}

_TYPE_TO_VARIANT = {
    "object": "OBJECT",
    "array": "ARRAY",
    "string": "STRING",
    "boolean": "BOOLEAN",
    "null": "VOID",
}


def _is_native(schema: Any) -> bool:
    if not isinstance(schema, dict):
        return False
    if set(schema.keys()) - _NATIVE_KEYS:
        return False
    for key in ("anyOf", "allOf", "oneOf"):
        if key in schema and not all(_is_native(s) for s in schema[key]):
            return False
    if "not" in schema and not _is_native(schema["not"]):
        return False
    if "items" in schema and not _is_native(schema["items"]):
        return False
    props = schema.get("properties", {})
    return all(_is_native(v) for v in props.values())


def _type_check(v: Column, typ: str) -> Column:
    sch = F.schema_of_variant(v)
    if typ == "number":
        return sch.isin("BIGINT", "DOUBLE", "DECIMAL(38,9)") | sch.startswith("DECIMAL")
    if typ == "integer":
        return sch == "BIGINT"
    if typ in _TYPE_TO_VARIANT:
        tag = _TYPE_TO_VARIANT[typ]
        return sch.startswith(tag) if typ in ("object", "array") else (sch == tag)
    raise ValueError(f"unsupported type: {typ}")


def _compile_native(v: Column, schema: dict) -> Column:
    """Predicate over a variant Column v (never SQL-null here)."""
    pred = F.lit(True)
    if "type" in schema:
        types = schema["type"] if isinstance(schema["type"], list) else [schema["type"]]
        tcheck = F.lit(False)
        for t in types:
            tcheck = tcheck | _type_check(v, t)
        pred = pred & tcheck
    if "const" in schema:
        pred = pred & (F.to_json(v) == F.lit(json.dumps(schema["const"], separators=(",", ":"))))
    if "enum" in schema:
        opts = [json.dumps(x, separators=(",", ":")) for x in schema["enum"]]
        pred = pred & F.to_json(v).isin(opts)
    for bound, op in (
        ("minimum", ">="),
        ("maximum", "<="),
        ("exclusiveMinimum", ">"),
        ("exclusiveMaximum", "<"),
    ):
        if bound in schema:
            num = F.try_variant_get(v, "$", "double")
            lim = F.lit(float(schema[bound]))
            cmp = {
                ">=": num >= lim,
                "<=": num <= lim,
                ">": num > lim,
                "<": num < lim,
            }[op]
            # Bounds only constrain numbers (non-numbers pass, per
            # JSON Schema semantics).
            pred = pred & F.when(num.isNotNull(), cmp).otherwise(F.lit(True))
    if "minLength" in schema or "maxLength" in schema:
        s = F.try_variant_get(v, "$", "string")
        is_str = F.schema_of_variant(v) == "STRING"
        ln = F.length(s)
        cond = F.lit(True)
        if "minLength" in schema:
            cond = cond & (ln >= int(schema["minLength"]))
        if "maxLength" in schema:
            cond = cond & (ln <= int(schema["maxLength"]))
        pred = pred & F.when(is_str, cond).otherwise(F.lit(True))
    if "required" in schema:
        is_obj = F.schema_of_variant(v).startswith("OBJECT")
        for name in schema["required"]:
            pred = pred & F.when(
                is_obj, F.try_variant_get(v, f"$.{name}", "variant").isNotNull()
                | _field_is_json_null(v, name)
            ).otherwise(F.lit(True))
    if "properties" in schema:
        is_obj = F.schema_of_variant(v).startswith("OBJECT")
        for name, sub in schema["properties"].items():
            field = F.try_variant_get(v, f"$.{name}", "variant")
            sub_ok = F.when(field.isNull(), F.lit(True)).otherwise(
                _compile_native(field, sub)
            )
            pred = pred & F.when(is_obj, sub_ok).otherwise(F.lit(True))
    if "pattern" in schema:
        # JSON Schema specifies ECMA-262 regexes; RLIKE is Java regex —
        # identical for the practical subset (classes, anchors,
        # quantifiers, alternation). Non-strings pass, per the spec.
        s = F.try_variant_get(v, "$", "string")
        is_str = F.schema_of_variant(v) == "STRING"
        pred = pred & F.when(is_str, s.rlike(schema["pattern"])).otherwise(F.lit(True))
    if "items" in schema and isinstance(schema["items"], dict):
        arr = F.try_variant_get(v, "$", "array<variant>")
        sub = schema["items"]
        pred = pred & F.when(
            arr.isNotNull(), F.forall(arr, lambda el: _compile_native(el, sub))
        ).otherwise(F.lit(True))
    if "allOf" in schema:
        for sub in schema["allOf"]:
            pred = pred & _compile_native(v, sub)
    if "anyOf" in schema:
        any_ok = F.lit(False)
        for sub in schema["anyOf"]:
            any_ok = any_ok | _compile_native(v, sub)
        pred = pred & any_ok
    if "oneOf" in schema:
        matches = sum(
            (_compile_native(v, sub).cast("int") for sub in schema["oneOf"]),
            F.lit(0),
        )
        pred = pred & (matches == 1)
    if "not" in schema:
        pred = pred & ~_compile_native(v, schema["not"])
    return pred


def _field_is_json_null(v: Column, name: str) -> Column:
    field = F.try_variant_get(v, f"$.{name}", "variant")
    return field.isNotNull() & F.is_variant_null(field)


def compile_schema_predicate(schema: dict, data_col: str = "d") -> tuple[Column, bool]:
    """Compile a JSON Schema to a boolean Column over the JSON-text
    payload column.  Absent payload (SQL NULL) validates like JS
    ``undefined`` fed to Ajv — i.e. it does not match any type, but an
    empty schema {} accepts it (matching keep-when validating
    ``event.data``)."""
    d = F.col(data_col)
    if _is_native(schema):
        # Let-bind the parsed variant via a one-element transform
        # lambda: the compiled predicate references it ~6-8 times and
        # each expression-tree reference would re-parse the JSON
        # (measured 6x slowdown on the events table without this).
        bound = F.element_at(
            F.transform(
                F.array(F.try_parse_json(d)), lambda v: _compile_native(v, schema)
            ),
            1,
        )
        pred = F.when(d.isNull(), F.lit(not schema)).otherwise(bound)
        return pred, True

    import jsonschema  # noqa: deferred; only for the fallback path

    validator = jsonschema.Draft7Validator(schema)

    @F.pandas_udf("boolean")
    def _validates(s):  # type: ignore[no-untyped-def]
        import pandas as pd

        def check(x):
            if x is None:
                return not schema
            try:
                return validator.is_valid(json.loads(x))
            except (ValueError, TypeError):
                return False

        return s.map(check).astype("boolean")

    return _validates(d), False


def keep_when(df: DataFrame, schema: dict, data_col: str = "d") -> DataFrame:
    pred, _ = compile_schema_predicate(schema, data_col)
    return df.filter(pred)
