"""Jsonnet evaluator + send-receive-jsonnet pipeline tests.

The language tests pin the subset's semantics against real Jsonnet
behavior (checked by hand against the language spec and go-jsonnet
output); the pipeline tests mirror the jq family in test_pipeline.py,
since the reference treats the two as sibling transform languages
(src/step-functions/send-receive-{jq,jsonnet}.ts).
"""

from __future__ import annotations

import json

import pytest

from cdp_spark.jsonnet import (
    JsonnetError,
    JsonnetParseError,
    JsonnetRuntimeError,
    evaluate_snippet,
    manifest_json,
    parse,
)
from tests.test_pipeline import run_pipeline


# ---------------------------------------------------------------------------
# language semantics


@pytest.mark.parametrize(
    "src, expected",
    [
        # literals / arithmetic
        ("1 + 2 * 3", 7),
        ("(1 + 2) * 3", 9),
        ("7 / 2", 3.5),
        ("-5 % 3", -2),  # fmod semantics, sign of dividend
        ("2 + 3.5", 5.5),
        ("1e2 + 1", 101.0),
        # strings
        ("'a' + 'b'", "ab"),
        ('"a" + 1', "a1"),  # string coercion via toString
        ("1 + 'a'", "1a"),
        ("std.toString(1.0)", "1"),  # integral floats render as ints
        ("std.toString([1, 'x'])", '[1,"x"]'),
        ("'x%d-%s' % [3, 'y']", "x3-y"),
        ("'%05.1f' % 2.25", "002.2"),
        ("'%s' % [[1, 2]]", "[1,2]"),
        ("@'raw\\n' + 'z'", "raw\\nz"),  # verbatim string keeps backslash
        # bool / comparison
        ("1 < 2 && 2 <= 2", True),
        ("'a' < 'b'", True),
        ("[1, 2] < [1, 3]", True),
        ("1 == 1.0", True),
        ("[1, {a: 2}] == [1, {a: 2}]", True),
        ("!false || error 'short circuit'", True),
        ("'a' in {a: 1}", True),
        ("'b' in {a: 1}", False),
        # bitwise
        ("5 & 3", 1),
        ("5 | 3", 7),
        ("1 << 4", 16),
        # arrays / objects / indexing / slicing
        ("[1, 2, 3][1]", 2),
        ("[1, 2, 3][1:]", [2, 3]),
        ("'hello'[1:4]", "ell"),
        ("{a: 1, b: 2}.b", 2),
        ("{a: 1}['a']", 1),
        ("{['k' + '1']: 2}", {"k1": 2}),
        ("{a: 1} + {b: 2, a: 3}", {"a": 3, "b": 2}),
        ("[1] + [2]", [1, 2]),
        # if / local / functions
        ("if 1 < 2 then 'y' else 'n'", "y"),
        ("if false then 'y'", None),  # no else -> null
        ("local x = 2, y = x + 1; y", 3),
        ("local f(x) = x * 2; f(4)", 8),
        ("local f(a, b=10) = a + b; f(1)", 11),
        ("local f(a, b=10) = a + b; f(1, b=2)", 3),
        ("local f(x) = if x == 0 then 1 else x * f(x - 1); f(5)", 120),
        ("(function(x) x + 1)(41)", 42),
        # comprehensions
        ("[x * 2 for x in std.range(1, 4) if x % 2 == 0]", [4, 8]),
        ("[[x, y] for x in [1, 2] for y in ['a']]", [[1, "a"], [2, "a"]]),
        ("{[k]: std.length(k) for k in ['ab', 'c']}", {"ab": 2, "c": 1}),
        # std library
        ("std.length([1, 2])", 2),
        ("std.length('abc')", 3),
        ("std.length({a: 1})", 1),
        ("std.type([])", "array"),
        ("std.map(function(x) x + 1, [1, 2])", [2, 3]),
        ("std.filter(function(x) x > 1, [1, 2, 3])", [2, 3]),
        ("std.flatMap(function(x) [x, x], [1, 2])", [1, 1, 2, 2]),
        ("std.foldl(function(a, b) a + b, [1, 2, 3], 0)", 6),
        ("std.foldr(function(el, acc) acc + [el], [1, 2], [])", [2, 1]),
        ("std.join(', ', ['a', 'b'])", "a, b"),
        ("std.join([0], [[1], [2]])", [1, 0, 2]),
        ("std.split('a,b,c', ',')", ["a", "b", "c"]),
        ("std.range(2, 5)", [2, 3, 4, 5]),
        ("std.makeArray(3, function(i) i * i)", [0, 1, 4]),
        ("std.sort([3, 1, 2])", [1, 2, 3]),
        ("std.sort(['b', 'a'], function(x) x)", ["a", "b"]),
        ("std.uniq([1, 1, 2, 2, 3])", [1, 2, 3]),
        ("std.reverse([1, 2])", [2, 1]),
        ("std.member([1, 2], 2)", True),
        ("std.count([1, 2, 1], 1)", 2),
        ("std.objectFields({b: 1, a: 2})", ["a", "b"]),  # sorted
        ("std.objectValues({b: 1, a: 2})", [2, 1]),
        ("std.objectHas({a: 1}, 'a')", True),
        ("std.get({a: 1}, 'b', 42)", 42),
        ("std.substr('abcdef', 1, 3)", "bcd"),
        ("std.strReplace('a-b-c', '-', '+')", "a+b+c"),
        ("std.asciiUpper('aB')", "AB"),
        ("std.startsWith('abc', 'ab')", True),
        ("std.parseInt('-42')", -42),
        ("std.parseJson('{\"k\": [1, 2]}').k[1]", 2),
        ("std.format('%d items', [3])", "3 items"),
        ("std.abs(-2)", 2),
        ("std.max(1, 2) + std.min(3, 4)", 5),
        ("std.floor(2.7) + std.ceil(2.1)", 5),
        ("std.sum([1, 2, 3])", 6),
        ("std.all([true, true])", True),
        ("std.any([false, true])", True),
        ("std.prune({a: null, b: [], c: 1})", {"c": 1}),
        ("std.isNumber(1) && !std.isNumber(true)", True),
        ("std.mapWithIndex(function(i, x) i + x, [10, 20])", [10, 21]),
        ("std.stringChars('ab')", ["a", "b"]),
        ("std.escapeStringJson('a\"b')", '"a\\"b"'),
        # ||| text block
        ("|||\n  line1\n  line2\n|||", "line1\nline2\n"),
    ],
)
def test_language_cases(src, expected):
    assert evaluate_snippet(src) == expected


def test_function_tla_call():
    assert evaluate_snippet("function(events) std.length(events)", [[1, 2, 3]]) == 3


def test_non_function_ignores_tla():
    assert evaluate_snippet("41 + 1", [["ignored"]]) == 42


def test_mutual_recursion():
    src = """
local even(n) = if n == 0 then true else odd(n - 1),
      odd(n) = if n == 0 then false else even(n - 1);
[even(10), odd(10)]
"""
    assert evaluate_snippet(src) == [True, False]


def test_closure_capture():
    src = "local mk(a) = function(b) a + b; local add2 = mk(2); add2(3)"
    assert evaluate_snippet(src) == 5


def test_object_methods_and_locals():
    src = "local o = {local two = 2, double(x): x * two, k: two}; [o.double(21), o.k]"
    assert evaluate_snippet(src) == [42, 2]


def test_manifest_json_jsonnet_number_style():
    assert manifest_json({"a": 1.0, "b": 1.5}) == '{"a":1,"b":1.5}'
    assert manifest_json([True, None]) == "[true,null]"


@pytest.mark.parametrize(
    "src",
    [
        "function(",  # syntax
        "local x = ; x",
        "[1, 2",
        "import foo",  # import path must be a string literal
    ],
)
def test_parse_errors(src):
    with pytest.raises(JsonnetParseError):
        parse(src)


@pytest.mark.parametrize(
    "src",
    [
        "self.a",  # self outside any object
        "$.a",  # $ outside any object
        "{a: super.a}",  # super with no super class
    ],
)
def test_oo_outside_object_errors(src):
    with pytest.raises(JsonnetRuntimeError):
        evaluate_snippet(src)


@pytest.mark.parametrize(
    "src",
    [
        "{a: 1}.missing",
        "[1][5]",
        "1 + 'a' - 2",  # '1a' - 2
        "error 'boom'",
        "if 1 then 2 else 3",  # non-bool condition
        "true && 1",
        "undefined_var",
        "1 / 0",
        "std.parseInt('zz')",
        "local f(a) = a; f(1, 2)",  # too many args
        "local f(a) = a; f()",  # missing arg
    ],
)
def test_runtime_errors(src):
    with pytest.raises(JsonnetRuntimeError):
        evaluate_snippet(src)


def test_exposition_example():
    # the reference's own prometheus-exposition program
    # (examples/exposition/pipeline.yaml) runs unmodified
    prelude = """
local eventPipeline(event) =
  event.t[std.length(event.t) - 1].p;
local eventSignature(event) =
  event.t[std.length(event.t) - 1].h;
"""
    prog = prelude + """
function(events)
  "# TYPE " + events[0].n + " gauge\\n" +
  std.join(
    "\\n",
    std.map(
      function(event)
        event.n +
        "{pipeline=\\"" + eventPipeline(event) + "\\"," +
        "signature=\\"" + eventSignature(event) + "\\"} " +
        std.toString(event.d),
      events
    )
  ) +
  "\\n"
"""
    events = [
        {"n": "m", "d": 1.5, "t": [{"i": 1.0, "p": "pipe", "h": "sig"}]},
        {"n": "m", "d": 2.0, "t": [{"i": 2.0, "p": "pipe", "h": "sig"}]},
    ]
    out = evaluate_snippet(prog, [events])
    assert out == (
        "# TYPE m gauge\n"
        'm{pipeline="pipe",signature="sig"} 1.5\n'
        'm{pipeline="pipe",signature="sig"} 2\n'
    )


# ---------------------------------------------------------------------------
# pipeline integration (mirrors the jq family)


def test_windowed_jsonnet_aggregation(spark):
    _, got = run_pipeline(
        spark,
        """
name: p
input: {stdin: }
steps:
  sum:
    window: {events: 2, seconds: 3600}
    reduce:
      send-receive-jsonnet: |-
        function(events)
          {n: "sum", d: std.sum([e.d for e in events])}
""",
        [("x", "1"), ("x", "2"), ("x", "3"), ("x", "4"), ("x", "5")],
    )
    assert got == [("sum", "3"), ("sum", "7"), ("sum", "5")]


def test_jsonnet_trace_stamped_old(spark):
    result, _ = run_pipeline(
        spark,
        """
name: stamped
input: {stdin: }
steps:
  t:
    reduce:
      send-receive-jsonnet: 'function(events) {n: events[0].n, d: 1}'
""",
        [("a", "0")],
    )
    row = result.output.first()
    assert [tp["p"] for tp in row["t"]] == ["stamped"]
    assert row["t"][0]["h"] == result.signature


def test_jsonnet_wrap(spark):
    _, got = run_pipeline(
        spark,
        """
name: p
input: {stdin: }
steps:
  t:
    reduce:
      send-receive-jsonnet:
        jsonnet-expr: "function(events) events[0].d"
        wrap: "wrapped"
""",
        [("a", '{"x":5}')],
    )
    assert got == [("wrapped", '{"x":5}')]


def test_jsonnet_prelude_from_template(spark):
    _, got = run_pipeline(
        spark,
        """
name: p
input: {stdin: }
jsonnet-prelude: |-
  local double(x) = x * 2;
steps:
  t:
    reduce:
      send-receive-jsonnet: |-
        function(events) {n: "out", d: double(std.length(events))}
""",
        [("a", "0"), ("b", "1")],
    )
    assert got == [("out", "2"), ("out", "2")]


def test_jsonnet_erroring_window_skipped(spark):
    # first window errors (missing field), second still produced —
    # parity with stream-jsonnet skipping erroring inputs (main.go:46-52)
    _, got = run_pipeline(
        spark,
        """
name: p
input: {stdin: }
steps:
  t:
    reduce:
      send-receive-jsonnet: |-
        function(events)
          if events[0].n == "bad" then error "skip me"
          else {n: "ok", d: events[0].d}
""",
        [("bad", "0"), ("good", "7")],
    )
    assert got == [("ok", "7")]


def test_invalid_jsonnet_fails_at_compile(spark):
    with pytest.raises(JsonnetError):
        run_pipeline(
            spark,
            """
name: p
input: {stdin: }
steps:
  t:
    reduce:
      send-receive-jsonnet: "function(events"
""",
            [("a", "0")],
        )


def test_jsonnet_sink_payload(spark, tmp_path):
    # send-file with jsonnet-expr: each window's produced value is its
    # own output line
    out_file = tmp_path / "out.txt"
    result, got = run_pipeline(
        spark,
        f"""
name: p
input: {{stdin: }}
steps:
  out:
    window: {{events: 2, seconds: 3600}}
    reduce:
      send-file:
        path: {out_file}
        jsonnet-expr: "function(events) std.length(events)"
""",
        [("a", "1"), ("b", "2"), ("c", "3")],
    )
    result.run_sinks()
    lines = out_file.read_text().strip().split("\n")
    assert lines == ["2", "1"]
    # pass-through preserved
    assert [n for n, _ in got] == ["a", "b", "c"]


# ---------------------------------------------------------------------------
# Object orientation: self / $ / super / :: / +: / assert
# (expected values checked against go-jsonnet semantics, the engine
# the reference embeds: stream-jsonnet/main.go:18-70)

@pytest.mark.parametrize(
    ("src", "want"),
    [
        # self, order-independent field resolution
        ("{a: 1, b: self.a + 1}", {"a": 1, "b": 2}),
        ("{b: self.a + 1, a: 1}", {"a": 1, "b": 2}),
        # $ reaches the root from nested literals
        ("{a: {b: $.c}, c: 5}", {"a": {"b": 5}, "c": 5}),
        ("{top: 1} + {a: {b: $.top}}", {"top": 1, "a": {"b": 1}}),
        # hidden fields: accessible via self/index, absent from output
        ("{f:: 3, g: self.f * 2}", {"g": 6}),
        ("{sq(x):: x * x, y: self.sq(4)}", {"y": 16}),
        ("{f:: 1} + {g: self.f}", {"g": 1}),
        # visibility override rules (':' inherits, ':::' unhides)
        ("{f:: 1} + {f: 2}", {}),
        ("{f:: 1} + {f::: 2}", {"f": 2}),
        # inheritance with super
        ("{a: 1} + {a: super.a + 10}", {"a": 11}),
        ("({a: 1} + {b: super.a + 1}) + {c: super.b + 1}",
         {"a": 1, "b": 2, "c": 3}),
        # late-bound self through a merge (the canonical laziness test)
        ("{name: self.x, x: 1} + {x: 2}", {"name": 2, "x": 2}),
        ("local base = {x: 1, y: self.x + 1}; base + {x: 10}",
         {"x": 10, "y": 11}),
        # +: field-level merge
        ("{arr: [1]} + {arr+: [2]}", {"arr": [1, 2]}),
        ("{o: {a: 1}} + {o+: {b: 2}}", {"o": {"a": 1, "b": 2}}),
        ("{s: 'a'} + {s+: 'b'}", {"s": "ab"}),
        # h+: e desugars to h: super[h] + e, so super inside the
        # override binds to the BASE FIELD value (jsonnet spec 4.4)
        ("{o: {a: 1}} + {o+: {b: super.a + 1}}", {"o": {"a": 1, "b": 2}}),
        ("{o: {a: 1}} + {o+: {a: super.a * 10}}", {"o": {"a": 10}}),
        # e in super
        ("{x: 1} + {y: if 'x' in super then super.x else 0}",
         {"x": 1, "y": 1}),
        # asserts
        ("assert 1 < 2; 5", 5),
        ("{a: 1, assert self.a == 1}", {"a": 1}),
        # method recursion through self with guard
        ("{fact(k):: if k <= 1 then 1 else k * self.fact(k - 1), "
         "out: self.fact(4)}", {"out": 24}),
    ],
)
def test_object_orientation(src, want):
    assert evaluate_snippet(src) == want


def test_object_orientation_std_visibility():
    assert evaluate_snippet("std.objectFields({a: 1, b:: 2})") == ["a"]
    assert evaluate_snippet("std.objectFieldsAll({a: 1, b:: 2})") == ["a", "b"]
    assert evaluate_snippet("std.objectHas({b:: 2}, 'b')") is False
    assert evaluate_snippet("std.objectHasAll({b:: 2}, 'b')") is True
    # hidden fields never manifest
    assert json.loads(evaluate_snippet("std.manifestJsonEx({a: 1, h:: 2}, '')")) == {"a": 1}


@pytest.mark.parametrize(
    "src",
    [
        "{a: self.b, b: self.a}",  # field cycle
        "{assert false : 'nope'}",  # failing object assert
        "assert false; 1",  # failing expression assert
        "{a: super.a} + {b: 1}",  # super in the LHS literal: no base
    ],
)
def test_object_orientation_errors(src):
    with pytest.raises(JsonnetRuntimeError):
        evaluate_snippet(src)


# ---------------------------------------------------------------------------
# import / importstr via the injectable importer seam (the reference's
# go-jsonnet VM ships a FileImporter: stream-jsonnet/main.go:41 MakeVM)


def test_import_code_and_str(tmp_path):
    from cdp_spark.jsonnet import file_importer

    (tmp_path / "lib.libsonnet").write_text("{ double(x):: x * 2, K: 7 }")
    (tmp_path / "msg.txt").write_text("hello")
    imp = file_importer(str(tmp_path))
    assert (
        evaluate_snippet(
            "local lib = import 'lib.libsonnet'; lib.double(21) + lib.K",
            importer=imp,
        )
        == 49
    )
    assert evaluate_snippet("importstr 'msg.txt'", importer=imp) == "hello"
    # an imported object participates in inheritance like any other
    assert evaluate_snippet(
        "(import 'lib.libsonnet') + {K: super.K + 1}", importer=imp
    ) == {"K": 8}


def test_import_requires_importer_and_literal_path(tmp_path):
    with pytest.raises(JsonnetRuntimeError):
        evaluate_snippet("import 'x.libsonnet'")  # no importer wired
    with pytest.raises(JsonnetParseError):
        parse("import foo")  # path must be a string literal
    from cdp_spark.jsonnet import file_importer

    with pytest.raises(JsonnetRuntimeError):
        evaluate_snippet(
            "import 'missing.libsonnet'", importer=file_importer(str(tmp_path))
        )


# ---------------------------------------------------------------------------
# laziness (go-jsonnet semantics): thunked locals, deferred object
# fields, lazy hidden fields, assert-on-access


def test_unused_erroring_local_never_evaluates():
    assert evaluate_snippet("local boom = error 'never'; 42") == 42
    # ...including in function bodies and nested locals
    assert (
        evaluate_snippet(
            "local f = function(x) local bad = error 'no'; x + 1; f(1)"
        )
        == 2
    )


def test_guarded_recursion_in_locals():
    # function self-recursion guarded by if/then/else
    assert (
        evaluate_snippet(
            "local f = function(x) if x == 0 then 1 else x * f(x - 1); f(5)"
        )
        == 120
    )
    # value bindings may reference later siblings (lazy, order-free)
    assert evaluate_snippet("local a = b + 1, b = 2; a") == 3
    # a genuinely cyclic VALUE binding is an error, not a hang
    with pytest.raises(JsonnetRuntimeError):
        evaluate_snippet("local a = b, b = a; a")


def test_hidden_abstract_base_idiom():
    # the go-jsonnet abstract-base pattern: an erroring hidden field
    # overridden before anything forces it
    assert evaluate_snippet(
        "({required:: error 'override me'} + {required: 3}).required"
    ) == 3
    # hidden fields are not manifested, so the base alone is fine...
    assert evaluate_snippet("{required:: error 'override me'}") == {}
    # ...until the erroring hidden field itself is accessed
    with pytest.raises(JsonnetRuntimeError):
        evaluate_snippet("{required:: error 'override me'}.required")


def test_overridden_erroring_field_never_evaluates():
    assert evaluate_snippet("({a: error 'boom'} + {a: 1}).a") == 1
    assert evaluate_snippet("{a: error 'boom'} + {a: 1}") == {"a": 1}
    # a standalone-evaluated LHS stored in a local first works too
    assert evaluate_snippet(
        "local base = {a: error 'boom'}; (base + {a: 2}).a"
    ) == 2


def test_super_literal_via_local_binding():
    # pre-laziness gap: an object literal referencing super had to be
    # the syntactic right operand of '+'; a thunked local defers the
    # field bodies so this now matches go-jsonnet
    assert evaluate_snippet(
        "local o = {a: super.a + 1}; {a: 1} + o"
    ) == {"a": 2}


def test_field_access_forces_only_that_field():
    assert evaluate_snippet("{a: error 'x', b: 1}.b") == 1
    # but asserts run on ANY field access
    with pytest.raises(JsonnetRuntimeError):
        evaluate_snippet("{assert false, b: 1}.b")
    # and manifesting the whole object still forces every visible field
    with pytest.raises(JsonnetRuntimeError):
        evaluate_snippet("{a: error 'x', b: 1}")


def test_unobserved_object_never_raises():
    assert evaluate_snippet("local o = {assert false, a: error 'x'}; 7") == 7


def test_transitive_import_resolves_relative_to_importing_file(tmp_path):
    from cdp_spark.jsonnet import file_importer

    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "sibling.libsonnet").write_text("{w: 10}")
    (sub / "lib.libsonnet").write_text(
        "local s = import 'sibling.libsonnet'; {v: s.w + 1}"
    )
    # top-level resolves against base_dir; lib's import of its sibling
    # resolves against sub/, not base_dir
    assert evaluate_snippet(
        "(import 'sub/lib.libsonnet').v", importer=file_importer(str(tmp_path))
    ) == 11


def test_import_cache_keys_on_resolved_path(tmp_path):
    from cdp_spark.jsonnet import Evaluator, parse as jparse

    (tmp_path / "lib.libsonnet").write_text("{k: 1}")
    reads: list[str] = []

    def importer(path, from_dir=None):
        import os

        root = from_dir if from_dir else str(tmp_path)
        resolved = os.path.abspath(os.path.normpath(os.path.join(root, path)))
        reads.append(resolved)
        with open(resolved, encoding="utf-8") as fh:
            return resolved, fh.read()

    ev = Evaluator(importer=importer)
    src = "(import 'lib.libsonnet').k + (import './sub/../lib.libsonnet').k"
    assert ev.eval_ast(jparse(src)) == 2
    # two spellings, one resolved path -> a single cached evaluation
    assert len(set(reads)) == 1


def test_lazy_call_arguments():
    # an erroring-but-unused argument never evaluates...
    assert evaluate_snippet(
        "local f = function(a, b) a; f(1, error 'never')"
    ) == 1
    # ...but a USED erroring argument still raises
    with pytest.raises(JsonnetRuntimeError):
        evaluate_snippet("local f = function(a, b) a + b; f(1, error 'boom')")
    # used-twice arguments evaluate once (memoized thunk): count via
    # a side-effect-free construction — deep recursion would blow the
    # stack if re-evaluated exponentially
    assert evaluate_snippet(
        "local dbl = function(x) x + x;"
        "local f = function(n, v) if n == 0 then v else f(n - 1, dbl(v));"
        "f(40, 1)"
    ) == 2 ** 40
    # tailstrict forces arguments eagerly (spec behavior)
    with pytest.raises(JsonnetRuntimeError):
        evaluate_snippet(
            "local f = function(a, b) a; f(1, error 'eager') tailstrict"
        )
