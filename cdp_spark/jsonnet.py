"""Minimal pure-Python Jsonnet evaluator for the CDP transform contract.

The reference evaluates ``function(events)`` Jsonnet programs over each
window's event vector (src/step-functions/send-receive-jsonnet.ts:70-97
feeding stream-jsonnet/main.go:18-70, which binds the vector as a
top-level argument and emits one compacted JSON value per input).  No
Jsonnet library ships in this environment, so this module implements
the language subset those programs actually use:

- literals, strings (``"``, ``'``, verbatim ``@"..."``, ``|||`` blocks)
- ``local`` bindings (incl. function sugar), ``function(params)`` with
  default and named arguments, ``if/then/else``, ``error``
- arrays / objects, array and object comprehensions (``for``/``if``)
- full operator set (arithmetic, comparison, boolean, bitwise, ``in``,
  ``+`` as concat/merge, ``%`` as number-mod / string-format)
- indexing, slicing, field access, and a ~130-function ``std`` library
  (conformance table below)
- object orientation: ``self``, ``$``, ``super``, hidden fields
  (``::`` / ``:::``), ``+:`` field merges, object-level and
  expression-level ``assert``.  Objects retain their field
  expressions, so inheritance (``base + {override}``) re-evaluates
  fields with late-bound ``self``/``$`` exactly like go-jsonnet —
  ``{a: self.x, x: 1} + {x: 2}`` manifests ``{a: 2, x: 2}``.

``import`` / ``importstr`` resolve through an injectable importer
(``Evaluator(importer=...)`` / ``evaluate_snippet(importer=...)``;
:func:`file_importer` gives the reference VM's FileImporter behavior:
transitive imports resolve against the importing file's directory and
the cache keys on the resolved absolute path).  Without an importer
configured they raise a runtime error — the distributed transform
sandbox has no implicit file-system contract.

Evaluation is LAZY like go-jsonnet: ``local`` bindings are thunks (an
unused erroring binding never evaluates; value bindings may reference
later siblings; guarded recursion terminates), and objects defer all
field evaluation until OBSERVED — manifestation/iteration forces the
visible fields, ``.f`` access forces the asserts plus that field only,
and hidden (``::``) fields only ever force on explicit access, so the
``{required:: error 'override me'} + {required: x}`` abstract-base
idiom and ``{a: error 'x'} + {a: 1}`` overrides behave exactly as in
go-jsonnet.  Function-call arguments are lazy too (``tailstrict``
opts back into eager, as specified), and object ``local``s memoize
per (object, layer) like any other thunk.

``std`` conformance vs go-jsonnet (r7 sweep; the reference's own
jsonnet programs use only length/map/toString/join):

- **Implemented** (~130): the full type/object/array/string/math
  families (length, type, is*, object*, map/filter/fold/flatten/
  set*/sort/uniq, substr/split*/strip*/trim/findSubstr/format/
  escapeString{Json,Bash,Dollars,Python,Xml}, floor/ceil/round/pow/
  exp/log/log2/log10/exponent/mantissa/trig/atan2/hypot/deg2rad/
  rad2deg/clamp/mod/isEven/isOdd/isInteger/isDecimal/xor/xnor),
  encoding+hashing (base64*, encodeUTF8/decodeUTF8, md5/sha1/sha256/
  sha512/sha3, parseInt/parseHex/parseOctal/parseJson),
  manifestation (manifestJson/Ex/Minified, manifestIni,
  manifestPython(+Vars), manifestXmlJsonml, manifestYamlDoc/Stream),
  mergePatch, primitiveEquals/equals, minArray/maxArray, remove/
  removeAt/objectRemoveKey, lines/deepJoin, prune, trace,
  assertEqual, extVar (via ``Evaluator(ext_vars=...)``), id.
- ``parseYaml`` (r8): implemented over PyYAML safe_load_all with a
  go-jsonnet-matching JSON normalization (string keys, ISO-string
  timestamps; multi-doc stream -> array).  Raises loudly if PyYAML
  is absent from the environment.
- ``manifestTomlEx`` / ``manifestToml`` (r16): tables,
  arrays-of-tables, inline value arrays/objects, bare-vs-quoted keys
  — the documented go-jsonnet semantics; ``null``/functions error
  (TOML has no null).
- **Not implemented BY DESIGN** (error loudly if called): ``native``
  (binds Go host functions registered on the embedding VM — a
  distributed evaluator has no host VM to bind against) and
  ``thisFile`` (needs the importing file's path; snippets evaluated
  from pipeline templates have none).  A program touching one fails
  with "std has no field", which the runner routes to dead-letter —
  never a silently wrong value.
"""

from __future__ import annotations

import inspect
import json
import math
import os
import re
from typing import Any, Callable, Optional


class JsonnetError(Exception):
    """Base for parse and runtime errors."""


class JsonnetParseError(JsonnetError):
    pass


class JsonnetRuntimeError(JsonnetError):
    pass


# Env key carrying the importing file's directory (not a legal jsonnet
# identifier, so user programs can never shadow it).
_IMPORT_DIR = "//import_dir"


# ---------------------------------------------------------------------------
# Lexer

_KEYWORDS = {
    "local", "function", "if", "then", "else", "true", "false", "null",
    "for", "in", "error", "import", "importstr", "self", "super",
    "assert", "tailstrict",
}

_OPS = sorted(
    [
        "|||", ":::", "::", "||", "&&", "==", "!=", "<=", ">=", "<<", ">>",
        "+", "-", "*", "/", "%", "<", ">", "!", "~", "&", "|", "^",
        ".", "[", "]", "(", ")", "{", "}", ",", ":", ";", "=", "$",
    ],
    key=len,
    reverse=True,
)

_ESCAPES = {'"': '"', "'": "'", "\\": "\\", "/": "/", "b": "\b",
            "f": "\f", "n": "\n", "r": "\r", "t": "\t"}

_NUM_RE = re.compile(r"\d+(\.\d+)?([eE][+-]?\d+)?")
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _lex(src: str) -> list[tuple[str, Any, int]]:
    """Tokens: (kind, value, pos); kinds num/str/ident/kw/op/eof."""
    toks: list[tuple[str, Any, int]] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in " \t\r\n":
            i += 1
            continue
        if c == "#" or src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i + 2)
            if j < 0:
                raise JsonnetParseError(f"unterminated comment at {i}")
            i = j + 2
            continue
        if src.startswith("|||", i):
            # text block: lines until a line whose content is |||,
            # dedented by the first line's indentation
            j = src.find("\n", i + 3)
            if j < 0:
                raise JsonnetParseError("unterminated ||| block")
            body_start = j + 1
            end = src.find("|||", body_start)
            while end > 0 and src[src.rfind("\n", 0, end) + 1 : end].strip():
                end = src.find("|||", end + 3)
            if end < 0:
                raise JsonnetParseError("unterminated ||| block")
            lines = src[body_start : src.rfind("\n", 0, end) + 1].split("\n")
            first = next((ln for ln in lines if ln.strip()), "")
            indent = len(first) - len(first.lstrip())
            text = "\n".join(ln[indent:] if len(ln) >= indent else ln for ln in lines[:-1])
            toks.append(("str", text + "\n", i))
            i = end + 3
            continue
        if c == "@" and i + 1 < n and src[i + 1] in "\"'":
            q = src[i + 1]
            j = i + 2
            out = []
            while j < n:
                if src[j] == q:
                    if j + 1 < n and src[j + 1] == q:  # doubled quote escape
                        out.append(q)
                        j += 2
                        continue
                    break
                out.append(src[j])
                j += 1
            else:
                raise JsonnetParseError(f"unterminated verbatim string at {i}")
            toks.append(("str", "".join(out), i))
            i = j + 1
            continue
        if c in "\"'":
            j = i + 1
            out = []
            while j < n and src[j] != c:
                if src[j] == "\\":
                    if j + 1 >= n:
                        raise JsonnetParseError(f"bad escape at {j}")
                    e = src[j + 1]
                    if e == "u":
                        out.append(chr(int(src[j + 2 : j + 6], 16)))
                        j += 6
                        continue
                    if e not in _ESCAPES:
                        raise JsonnetParseError(f"bad escape \\{e} at {j}")
                    out.append(_ESCAPES[e])
                    j += 2
                    continue
                out.append(src[j])
                j += 1
            if j >= n:
                raise JsonnetParseError(f"unterminated string at {i}")
            toks.append(("str", "".join(out), i))
            i = j + 1
            continue
        m = _NUM_RE.match(src, i)
        if m and c.isdigit():
            text = m.group(0)
            val = float(text)
            if val.is_integer() and "." not in text and "e" not in text.lower():
                toks.append(("num", int(text), i))
            else:
                toks.append(("num", val, i))
            i = m.end()
            continue
        m = _IDENT_RE.match(src, i)
        if m:
            word = m.group(0)
            toks.append(("kw" if word in _KEYWORDS else "ident", word, i))
            i = m.end()
            continue
        for op in _OPS:
            if src.startswith(op, i):
                toks.append(("op", op, i))
                i += len(op)
                break
        else:
            raise JsonnetParseError(f"unexpected character {c!r} at {i}")
    toks.append(("eof", None, n))
    return toks


# ---------------------------------------------------------------------------
# Parser — AST as tuples; precedence climbing

_BINPREC = {
    "||": 1, "&&": 2, "|": 3, "^": 4, "&": 5, "==": 6, "!=": 6,
    "<": 7, ">": 7, "<=": 7, ">=": 7, "in": 7, "<<": 8, ">>": 8,
    "+": 9, "-": 9, "*": 10, "/": 10, "%": 10,
}

class _Parser:
    def __init__(self, src: str):
        self.toks = _lex(src)
        self.pos = 0

    def peek(self) -> tuple[str, Any, int]:
        return self.toks[self.pos]

    def next(self) -> tuple[str, Any, int]:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, kind: str, value: Any = None) -> Any:
        k, v, p = self.next()
        if k != kind or (value is not None and v != value):
            raise JsonnetParseError(f"expected {value or kind}, got {v!r} at {p}")
        return v

    def at_op(self, op: str) -> bool:
        k, v, _ = self.peek()
        return k == "op" and v == op

    def eat_op(self, op: str) -> bool:
        if self.at_op(op):
            self.pos += 1
            return True
        return False

    # -- entry
    def parse(self) -> Any:
        e = self.expr()
        k, v, p = self.peek()
        if k != "eof":
            raise JsonnetParseError(f"trailing input {v!r} at {p}")
        return e

    def expr(self, minprec: int = 0) -> Any:
        left = self.unary()
        while True:
            k, v, _ = self.peek()
            op = v if (k == "op" or (k == "kw" and v == "in")) else None
            prec = _BINPREC.get(op) if op else None
            if prec is None or prec < minprec:
                return left
            self.next()
            right = self.expr(prec + 1)
            left = ("binop", op, left, right)

    def unary(self) -> Any:
        k, v, _ = self.peek()
        if k == "op" and v in ("!", "~", "-", "+"):
            self.next()
            return ("unop", v, self.unary())
        return self.postfix(self.primary())

    def postfix(self, e: Any) -> Any:
        while True:
            if self.eat_op("."):
                name = self.expect("ident")
                e = ("index", e, ("lit", name))
            elif self.at_op("["):
                self.next()
                # index or slice
                first = None if self.at_op(":") else self.expr()
                if self.eat_op("]"):
                    if first is None:
                        raise JsonnetParseError("empty index")
                    e = ("index", e, first)
                    continue
                self.expect("op", ":")
                second = None if (self.at_op(":") or self.at_op("]")) else self.expr()
                third = None
                if self.eat_op(":"):
                    third = None if self.at_op("]") else self.expr()
                self.expect("op", "]")
                e = ("slice", e, first, second, third)
            elif self.at_op("("):
                self.next()
                args, kwargs = [], []
                while not self.at_op(")"):
                    k, v, _ = self.peek()
                    if (
                        k == "ident"
                        and self.toks[self.pos + 1][:2] == ("op", "=")
                    ):
                        self.next()
                        self.next()
                        kwargs.append((v, self.expr()))
                    else:
                        args.append(self.expr())
                    if not self.eat_op(","):
                        break
                self.expect("op", ")")
                # optional tailstrict marker: recorded so the
                # evaluator forces those args eagerly (its purpose)
                tail = False
                k, v, _ = self.peek()
                if k == "kw" and v == "tailstrict":
                    self.next()
                    tail = True
                e = ("call", e, args, kwargs, tail)
            else:
                return e

    def params(self) -> list[tuple[str, Any]]:
        out = []
        self.expect("op", "(")
        while not self.at_op(")"):
            name = self.expect("ident")
            default = None
            if self.eat_op("="):
                default = self.expr()
            out.append((name, default))
            if not self.eat_op(","):
                break
        self.expect("op", ")")
        return out

    def bind(self) -> tuple[str, Any]:
        name = self.expect("ident")
        if self.at_op("("):
            ps = self.params()
            self.expect("op", "=")
            return name, ("fn", ps, self.expr())
        self.expect("op", "=")
        return name, self.expr()

    def compspecs(self) -> list[tuple[str, ...]]:
        specs: list[tuple[str, ...]] = []
        while True:
            k, v, _ = self.peek()
            if k == "kw" and v == "for":
                self.next()
                var = self.expect("ident")
                kk, vv, p = self.next()
                if (kk, vv) != ("kw", "in"):
                    raise JsonnetParseError(f"expected 'in' at {p}")
                specs.append(("for", var, self.expr()))
            elif k == "kw" and v == "if":
                self.next()
                specs.append(("if", self.expr()))
            else:
                return specs

    def primary(self) -> Any:
        k, v, p = self.next()
        if k == "num" or k == "str":
            return ("lit", v)
        if k == "ident":
            return ("var", v)
        if k == "kw":
            if v == "true":
                return ("lit", True)
            if v == "false":
                return ("lit", False)
            if v == "null":
                return ("lit", None)
            if v == "local":
                binds = [self.bind()]
                while self.eat_op(","):
                    binds.append(self.bind())
                self.expect("op", ";")
                return ("local", binds, self.expr())
            if v == "function":
                return ("fn", self.params(), self.expr())
            if v == "if":
                cond = self.expr()
                kk, vv, pp = self.next()
                if (kk, vv) != ("kw", "then"):
                    raise JsonnetParseError(f"expected 'then' at {pp}")
                a = self.expr()
                k2, v2, _ = self.peek()
                if k2 == "kw" and v2 == "else":
                    self.next()
                    return ("if", cond, a, self.expr())
                return ("if", cond, a, ("lit", None))
            if v == "error":
                return ("error", self.expr())
            if v == "self":
                return ("self",)
            if v == "super":
                # super is only legal indexed (super.f / super[e]) or
                # as the RHS of `in`; bare form is resolved in _binop.
                if self.eat_op("."):
                    return ("superindex", ("lit", self.expect("ident")))
                if self.eat_op("["):
                    e = self.expr()
                    self.expect("op", "]")
                    return ("superindex", e)
                return ("super",)
            if v == "assert":
                cond = self.expr()
                msg = self.expr() if self.eat_op(":") else None
                self.expect("op", ";")
                return ("assert", cond, msg, self.expr())
            if v in ("import", "importstr"):
                k2, v2, p2 = self.next()
                if k2 != "str":
                    raise JsonnetParseError(
                        f"{v} path must be a string literal at {p2}"
                    )
                return (v, v2)
            raise JsonnetParseError(f"unexpected keyword {v!r} at {p}")
        if k == "op":
            if v == "(":
                e = self.expr()
                self.expect("op", ")")
                return e
            if v == "[":
                if self.eat_op("]"):
                    return ("array", [])
                first = self.expr()
                k2, v2, _ = self.peek()
                if k2 == "kw" and v2 == "for":
                    specs = self.compspecs()
                    self.expect("op", "]")
                    return ("arrcomp", first, specs)
                items = [first]
                while self.eat_op(","):
                    if self.at_op("]"):
                        break
                    items.append(self.expr())
                self.expect("op", "]")
                return ("array", items)
            if v == "{":
                return self.object_rest()
            if v == "$":
                return ("dollar",)
        raise JsonnetParseError(f"unexpected token {v!r} at {p}")

    def _field_sep(self, pos: int) -> tuple[str, bool]:
        """Parse ``[+] : | :: | :::`` after a field name; returns the
        separator (visibility) and whether ``+:`` merge was used."""
        plus = self.eat_op("+")
        k, v, p = self.peek()
        if k == "op" and v in (":", "::", ":::"):
            self.next()
            return v, plus
        raise JsonnetParseError(f"expected ':' after field at {pos}")

    def object_rest(self) -> Any:
        # fields: (key expr, value expr, sep ":"|"::"|":::", plus)
        fields: list[tuple[Any, Any, str, bool]] = []
        locals_: list[tuple[str, Any]] = []
        asserts: list[tuple[Any, Any]] = []  # (cond expr, msg expr|None)
        if self.eat_op("}"):
            return ("object", fields, locals_, asserts)
        while True:
            k, v, p = self.peek()
            if k == "op" and v == "}":
                break  # trailing comma before '}' (legal jsonnet)
            if k == "kw" and v == "local":
                self.next()
                locals_.append(self.bind())
            elif k == "kw" and v == "assert":
                self.next()
                cond = self.expr()
                msg = self.expr() if self.eat_op(":") else None
                asserts.append((cond, msg))
            elif k == "op" and v == "[":
                self.next()
                key = self.expr()
                self.expect("op", "]")
                sep, plus = self._field_sep(p)
                val = self.expr()
                k3, v3, _ = self.peek()
                if k3 == "kw" and v3 == "for":
                    specs = self.compspecs()
                    self.expect("op", "}")
                    return ("objcomp", key, val, specs, fields, locals_)
                fields.append((key, val, sep, plus))
            elif k in ("ident", "str") or (
                k == "kw"
                and v not in ("self", "super", "local", "assert",
                              "import", "importstr")
            ):
                self.next()
                name = v
                if k == "ident" and self.at_op("("):
                    ps = self.params()
                    sep, plus = self._field_sep(p)
                    fields.append((("lit", name), ("fn", ps, self.expr()), sep, plus))
                else:
                    sep, plus = self._field_sep(p)
                    fields.append((("lit", str(name)), self.expr(), sep, plus))
            else:
                raise JsonnetParseError(f"unexpected object token {v!r} at {p}")
            if not self.eat_op(","):
                break
        self.expect("op", "}")
        return ("object", fields, locals_, asserts)


def parse(src: str) -> Any:
    """Parse a Jsonnet snippet to an AST; raises JsonnetParseError
    (the pipeline-start syntax gate, parity with SnippetToAST in
    stream-jsonnet/main.go:36-40)."""
    return _Parser(src).parse()


# ---------------------------------------------------------------------------
# Evaluator

class _Env:
    __slots__ = ("vars", "parent")

    def __init__(self, vars: dict[str, Any], parent: Optional["_Env"]):
        self.vars = vars
        self.parent = parent

    def lookup(self, name: str) -> Any:
        env: Optional[_Env] = self
        while env is not None:
            if name in env.vars:
                return env.vars[name]
            env = env.parent
        raise JsonnetRuntimeError(f"unknown variable: {name}")


class Closure:
    __slots__ = ("params", "body", "env")

    def __init__(self, params: list[tuple[str, Any]], body: Any, env: _Env):
        self.params = params
        self.body = body
        self.env = env


class _Thunk:
    """A lazily evaluated ``local`` binding (go-jsonnet semantics: an
    unused erroring binding never evaluates; value bindings may
    reference later siblings).  Forced at variable lookup, memoized,
    cycle-checked."""

    __slots__ = ("ev", "expr", "env", "state", "value")

    def __init__(self, ev: "Evaluator", expr: Any, env: _Env):
        self.ev = ev
        self.expr = expr
        self.env = env
        self.state = 0  # 0 unforced, 1 forcing, 2 done
        self.value: Any = None

    def force(self) -> Any:
        if self.state == 2:
            return self.value
        if self.state == 1:
            raise JsonnetRuntimeError("recursive local binding")
        self.state = 1
        self.value = self.ev._eval(self.expr, self.env)
        self.state = 2
        self.expr = self.env = None  # free the AST + env chain
        return self.value


def _env_has(env: Optional[_Env], name: str) -> bool:
    while env is not None:
        if name in env.vars:
            return True
        env = env.parent
    return False


class _Layer:
    """One object literal's contribution to a (possibly inherited)
    object: field expressions, object-locals, asserts, and the lexical
    env they were written in.  ``root`` marks literals with no
    enclosing object — their fields late-bind ``$`` to the final
    merged object (go-jsonnet's outermost-self rule)."""

    __slots__ = ("fields", "locals", "env", "asserts", "root")

    def __init__(self, fields: dict, locals_: list, env: _Env,
                 asserts: list, root: bool):
        self.fields = fields  # name -> (vexpr, sep, plus)
        self.locals = locals_
        self.env = env
        self.asserts = asserts
        self.root = root


class _Super:
    """Binding target for ``super`` while a field of ``obj``'s layer
    ``idx`` evaluates: lookups resolve in layers strictly below."""

    __slots__ = ("obj", "idx")

    def __init__(self, obj: "JObj", idx: int):
        self.obj = obj
        self.idx = idx


class JObj(dict):
    """A Jsonnet object: retains its layered field expressions for
    ``self``/``super``/``$`` late binding and ``+`` inheritance, plus a
    ``hidden`` name set for ``::`` fields.

    Construction is LAZY (go-jsonnet semantics): no field evaluates
    until the object is OBSERVED — manifested, compared, iterated,
    indexed, or passed to a std function.  The dict interface is the
    observation membrane: every read-side dict method forces the
    visible fields first (after which the plain-dict storage holds
    exactly the manifested value, so equality / json paths see real
    data).  Merging (``+``) concatenates layers WITHOUT observing, so
    ``{a: error 'x'} + {a: 1}`` never evaluates the overridden body,
    and hidden fields are never forced unless accessed — the
    ``{required:: error 'override me'} + {required: x}`` abstract-base
    idiom works."""

    __slots__ = ("layers", "hidden", "_cache", "_forcing", "_ev", "_forced",
                 "_asserted", "_fenvs")

    def __init__(self, layers: list[_Layer], ev: "Evaluator"):
        super().__init__()
        self.layers = layers
        self.hidden: set[str] = set()
        self._cache: dict[str, Any] = {}
        self._forcing: set = set()
        self._ev = ev
        self._forced = False
        self._asserted = False
        self._fenvs: dict[int, _Env] = {}

    def _ensure(self) -> None:
        if not self._forced:
            self._ev._force_object(self)

    # -- observation membrane: force-on-read dict interface
    def __getitem__(self, name: str) -> Any:
        self._ensure()
        if dict.__contains__(self, name):
            return dict.__getitem__(self, name)
        # mid-force access (a field body observing self through the
        # dict interface): resolve through the layers like _index
        return self._ev._obj_get(self, name)

    def get(self, name: str, default: Any = None) -> Any:
        self._ensure()
        return dict.get(self, name, default)

    def __contains__(self, name: object) -> bool:
        self._ensure()
        return dict.__contains__(self, name)

    def __iter__(self):
        self._ensure()
        return dict.__iter__(self)

    def __len__(self) -> int:
        self._ensure()
        return dict.__len__(self)

    def keys(self):
        self._ensure()
        return dict.keys(self)

    def values(self):
        self._ensure()
        return dict.values(self)

    def items(self):
        self._ensure()
        return dict.items(self)

    def __eq__(self, other: object) -> bool:
        self._ensure()
        if isinstance(other, JObj):
            other._ensure()
        return dict.__eq__(self, other)

    def __ne__(self, other: object) -> bool:
        return not self.__eq__(other)


def _typename(v: Any) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "object"
    if isinstance(v, Closure) or callable(v):
        return "function"
    raise JsonnetRuntimeError(f"unknown value type {type(v)}")


def _num_repr(x: Any) -> str:
    if isinstance(x, bool):
        return "true" if x else "false"
    f = float(x)
    if f.is_integer() and abs(f) < 1e17:
        return str(int(f))
    return repr(f)


def manifest_json(v: Any, indent: Optional[int] = None) -> str:
    """Jsonnet-style JSON manifestation: integral numbers render
    without a decimal point (std.toString(1.0) == "1")."""
    def conv(x: Any) -> Any:
        if isinstance(x, float) and x.is_integer() and abs(x) < 1e17:
            return int(x)
        if isinstance(x, list):
            return [conv(i) for i in x]
        if isinstance(x, dict):
            return {k: conv(val) for k, val in sorted(x.items())}
        if isinstance(x, (Closure,)) or callable(x):
            raise JsonnetRuntimeError("cannot manifest a function")
        return x

    if indent is None:
        return json.dumps(conv(v), separators=(",", ":"), ensure_ascii=False)
    return json.dumps(conv(v), indent=indent, ensure_ascii=False)


def _to_string(v: Any) -> str:
    if isinstance(v, str):
        return v
    return manifest_json(v)


def _want(v: Any, kind: str, what: str) -> Any:
    if _typename(v) != kind:
        raise JsonnetRuntimeError(f"{what}: expected {kind}, got {_typename(v)}")
    return v


def _num(v: Any, what: str = "operand") -> Any:
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise JsonnetRuntimeError(f"{what}: expected number, got {_typename(v)}")
    return v


_FMT_RE = re.compile(r"%([-+ #0]*)(\d*)(?:\.(\d+))?([diouxXeEfgGcs%])")


def std_format(fmt: str, vals: Any) -> str:
    if not isinstance(vals, list):
        vals = [vals]
    out: list[str] = []
    i, vi = 0, 0
    while i < len(fmt):
        c = fmt[i]
        if c != "%":
            out.append(c)
            i += 1
            continue
        m = _FMT_RE.match(fmt, i)
        if not m:
            raise JsonnetRuntimeError(f"invalid format spec at {i} in {fmt!r}")
        i = m.end()
        conv = m.group(4)
        if conv == "%":
            out.append("%")
            continue
        if vi >= len(vals):
            raise JsonnetRuntimeError("not enough format values")
        v = vals[vi]
        vi += 1
        spec = "%" + m.group(1) + m.group(2) + ("." + m.group(3) if m.group(3) else "")
        if conv == "s":
            out.append((spec + "s") % _to_string(v))
        elif conv in "diouxX":
            out.append((spec + ("d" if conv == "i" else conv)) % int(_num(v)))
        elif conv in "eEfgG":
            out.append((spec + conv) % float(_num(v)))
        elif conv == "c":
            out.append(v if isinstance(v, str) and len(v) == 1 else chr(int(_num(v))))
    return "".join(out)


def _jsonnet_mod(a: Any, b: Any) -> Any:
    if isinstance(a, str):
        return std_format(a, b)
    a, b = _num(a), _num(b)
    if b == 0:
        raise JsonnetRuntimeError("division by zero")
    r = math.fmod(a, b)
    if isinstance(a, int) and isinstance(b, int):
        return int(r)
    return r


def _eq(a: Any, b: Any) -> bool:
    ta, tb = _typename(a), _typename(b)
    if ta != tb:
        return False
    if ta == "function":
        raise JsonnetRuntimeError("cannot test equality of functions")
    if ta == "array":
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    if ta == "object":
        return set(a) == set(b) and all(_eq(a[k], b[k]) for k in a)
    return a == b


def _cmp_ok(a: Any, b: Any, what: str) -> None:
    ta, tb = _typename(a), _typename(b)
    if ta != tb or ta not in ("number", "string", "array"):
        raise JsonnetRuntimeError(f"cannot compare {ta} with {tb} ({what})")
    if ta == "array":
        for x, y in zip(a, b):
            _cmp_ok(x, y, what)


class Evaluator:
    """Evaluate parsed Jsonnet.  One instance per worker; stateless
    between calls apart from the shared std table and import cache.

    ``importer``: ``path -> source text`` for import/importstr (the
    go-jsonnet VM the reference embeds uses a FileImporter by default;
    pass :func:`file_importer` for that behavior).  None -> imports
    raise at runtime."""

    def __init__(
        self,
        importer: Optional[Callable[..., Any]] = None,
        ext_vars: Optional[dict[str, Any]] = None,
    ) -> None:
        self.ext_vars = dict(ext_vars or {})
        self.std = _make_std(self)
        self.root = _Env({"std": self.std}, None)
        self.importer = importer
        self._import_cache: dict[tuple[str, bool], Any] = {}
        if importer is None:
            self._importer_arity = 0
        else:
            try:
                self._importer_arity = len(
                    inspect.signature(importer).parameters
                )
            except (TypeError, ValueError):
                self._importer_arity = 1

    def _import(self, path: str, as_code: bool, from_dir: Optional[str]) -> Any:
        if self.importer is None:
            raise JsonnetRuntimeError(
                f"cannot {'import' if as_code else 'importstr'} {path!r}: "
                "no importer configured (Evaluator(importer=...))"
            )
        try:
            if self._importer_arity >= 2:
                # (path, from_dir) -> (resolved_key, source): the cache
                # keys on the RESOLVED path, so two spellings of one
                # file share an entry
                resolved, src = self.importer(path, from_dir)
            else:  # legacy path -> source callables key on the literal
                resolved, src = path, self.importer(path)
        except OSError as err:
            raise JsonnetRuntimeError(f"import failed: {path}: {err}") from err
        key = (resolved, as_code)
        if key in self._import_cache:
            return self._import_cache[key]
        # Imports evaluate once per VM in a clean environment (jsonnet
        # imports are closed expressions), then memoize.  The imported
        # file's directory rides in the ENV (not evaluator state):
        # laziness means its thunked imports may force long after this
        # frame returns, and they must still resolve relative to the
        # importing file (go-jsonnet FileImporter).
        if as_code:
            env = _Env({_IMPORT_DIR: os.path.dirname(resolved) or None}, self.root)
            val = self._eval(parse(src), env)
        else:
            val = src
        self._import_cache[key] = val
        return val

    @staticmethod
    def _import_dir_of(env: Optional[_Env]) -> Optional[str]:
        while env is not None:
            if _IMPORT_DIR in env.vars:
                return env.vars[_IMPORT_DIR]
            env = env.parent
        return None

    # -- public
    def eval_ast(self, ast: Any, extra_vars: Optional[dict[str, Any]] = None) -> Any:
        env = self.root if not extra_vars else _Env(dict(extra_vars), self.root)
        return self._eval(ast, env)

    def call(self, fn: Any, args: list[Any], kwargs: Optional[dict[str, Any]] = None) -> Any:
        return self._call_value(fn, args, kwargs or {})

    # -- machinery
    def _call_value(self, fn: Any, args: list[Any], kwargs: dict[str, Any]) -> Any:
        if callable(fn) and not isinstance(fn, Closure):
            return fn(*args, **kwargs)
        if not isinstance(fn, Closure):
            raise JsonnetRuntimeError(f"cannot call a {_typename(fn)}")
        names = [p for p, _ in fn.params]
        bound: dict[str, Any] = {}
        if len(args) > len(names):
            raise JsonnetRuntimeError(
                f"too many arguments: {len(args)} > {len(names)}"
            )
        for name, val in zip(names, args):
            bound[name] = val
        for key, val in kwargs.items():
            if key not in names:
                raise JsonnetRuntimeError(f"unknown named argument {key!r}")
            if key in bound:
                raise JsonnetRuntimeError(f"argument {key!r} bound twice")
            bound[key] = val
        env = _Env(bound, fn.env)
        for name, default in fn.params:
            if name not in bound:
                if default is None:
                    raise JsonnetRuntimeError(f"missing argument {name!r}")
                bound[name] = self._eval(default, env)
        return self._eval(fn.body, env)

    def _eval(self, node: Any, env: _Env) -> Any:
        tag = node[0]
        if tag == "lit":
            return node[1]
        if tag == "var":
            val = env.lookup(node[1])
            return val.force() if isinstance(val, _Thunk) else val
        if tag == "array":
            return [self._eval(e, env) for e in node[1]]
        if tag == "object":
            # LAZY: no field evaluates until the object is observed
            # (manifested / indexed / iterated / compared)
            _, fields, locals_, asserts = node
            return JObj([self._make_layer(fields, locals_, asserts, env)], self)
        if tag == "self":
            return env.lookup("self")
        if tag == "dollar":
            if not _env_has(env, "$"):
                raise JsonnetRuntimeError("no top-level object ('$' outside an object)")
            return env.lookup("$")
        if tag == "super":
            raise JsonnetRuntimeError(
                "'super' is only valid as super.f, super[e], or e in super"
            )
        if tag == "superindex":
            if not _env_has(env, "super"):
                raise JsonnetRuntimeError("attempt to use super when there is no super class")
            sup = env.lookup("super")
            name = _want(self._eval(node[1], env), "string", "super index")
            return self._obj_get(sup.obj, name, upto=sup.idx)
        if tag == "assert":
            _, cond, msg, rest = node
            if self._eval(cond, env) is not True:
                text = "assertion failed" if msg is None else _to_string(self._eval(msg, env))
                raise JsonnetRuntimeError(text)
            return self._eval(rest, env)
        if tag == "import":
            return self._import(node[1], True, self._import_dir_of(env))
        if tag == "importstr":
            return self._import(node[1], False, self._import_dir_of(env))
        if tag == "local":
            return self._eval(node[2], self._bind_locals(node[1], env))
        if tag == "fn":
            return Closure(node[1], node[2], env)
        if tag == "if":
            cond = self._eval(node[1], env)
            if not isinstance(cond, bool):
                raise JsonnetRuntimeError("if condition must be boolean")
            return self._eval(node[2] if cond else node[3], env)
        if tag == "error":
            raise JsonnetRuntimeError(_to_string(self._eval(node[1], env)))
        if tag == "call":
            fn = self._eval(node[1], env)
            tailstrict = node[4] if len(node) > 4 else False
            if isinstance(fn, Closure) and not tailstrict:
                # lazy arguments (go-jsonnet): an erroring-but-unused
                # argument never evaluates; param lookups force the
                # thunk once.  Builtins take real values (they're
                # Python), and `tailstrict` opts back into eager.
                args: list[Any] = [_Thunk(self, a, env) for a in node[2]]
                kwargs: dict[str, Any] = {
                    k: _Thunk(self, v, env) for k, v in node[3]
                }
            else:
                args = [self._eval(a, env) for a in node[2]]
                kwargs = {k: self._eval(v, env) for k, v in node[3]}
            return self._call_value(fn, args, kwargs)
        if tag == "index":
            return self._index(self._eval(node[1], env), self._eval(node[2], env))
        if tag == "slice":
            base = self._eval(node[1], env)
            if not isinstance(base, (list, str)):
                raise JsonnetRuntimeError(f"cannot slice {_typename(base)}")
            a = None if node[2] is None else int(_num(self._eval(node[2], env)))
            b = None if node[3] is None else int(_num(self._eval(node[3], env)))
            c = None if node[4] is None else int(_num(self._eval(node[4], env)))
            return base[a:b:c]
        if tag == "arrcomp":
            out: list[Any] = []
            self._comp(node[2], 0, env, lambda e: out.append(self._eval(node[1], e)))
            return out
        if tag == "objcomp":
            _, kexpr, vexpr, specs, fields, locals_ = node
            res: dict[str, Any] = {}
            base_env = self._bind_locals(locals_, env)

            def add(e: _Env) -> None:
                key = self._eval(kexpr, e)
                if key is None:
                    return
                res[_want(key, "string", "object key")] = self._eval(vexpr, e)

            for kexpr2, vexpr2, sep2, _plus2 in fields:
                if sep2 == "::":
                    continue  # hidden static field in a comprehension: not manifested
                key = self._eval(kexpr2, base_env)
                if key is not None:
                    res[_want(key, "string", "object key")] = self._eval(vexpr2, base_env)
            self._comp(specs, 0, base_env, add)
            return res
        if tag == "binop":
            return self._binop(node[1], node[2], node[3], env)
        if tag == "unop":
            v = self._eval(node[2], env)
            op = node[1]
            if op == "!":
                return not _want(v, "boolean", "'!'")
            if op == "-":
                return -_num(v)
            if op == "+":
                return _num(v)
            if op == "~":
                return float(~int(_num(v)))
            raise JsonnetRuntimeError(f"unknown unary {op}")
        raise JsonnetRuntimeError(f"unknown node {tag}")

    def _bind_locals(self, binds: list[tuple[str, Any]], env: _Env) -> _Env:
        if not binds:
            return env
        vars: dict[str, Any] = {}
        new_env = _Env(vars, env)
        # every binding closes over new_env (mutual recursion among
        # functions AND values); non-function values are thunked so an
        # unused erroring binding never evaluates and siblings may
        # reference each other in any order (go-jsonnet laziness)
        for name, expr in binds:
            if expr[0] == "fn":  # fast path: no thunk allocation
                vars[name] = Closure(expr[1], expr[2], new_env)
            else:
                vars[name] = _Thunk(self, expr, new_env)
        return new_env

    # -- object orientation (self / $ / super / :: / +:)

    def _make_layer(self, fields: list, locals_: list, asserts: list,
                    env: _Env) -> _Layer:
        """Evaluate field NAMES now (Jsonnet computes keys eagerly,
        without self in scope); keep field bodies as expressions."""
        if any(k[0] != "lit" for k, _v, _s, _p in fields):
            keyenv = self._bind_locals(locals_, env)
        else:
            keyenv = env
        fmap: dict[str, tuple] = {}
        for kexpr, vexpr, sep, plus in fields:
            key = self._eval(kexpr, keyenv) if kexpr[0] != "lit" else kexpr[1]
            if key is None:
                continue  # null computed key -> field omitted
            fmap[_want(key, "string", "object key")] = (vexpr, sep, plus)
        return _Layer(fmap, locals_, env, asserts, root=not _env_has(env, "$"))

    def _field_env(self, obj: "JObj", idx: int) -> _Env:
        # memoized per (object, layer): object locals are thunks in
        # this env, so caching it makes them evaluate at most once per
        # object instead of once per field access
        cached = obj._fenvs.get(idx)
        if cached is not None:
            return cached
        layer = obj.layers[idx]
        vars: dict[str, Any] = {"self": obj, "super": _Super(obj, idx)}
        if layer.root:
            vars["$"] = obj
        env = self._bind_locals(layer.locals, _Env(vars, layer.env))
        obj._fenvs[idx] = env
        return env

    def _obj_get(self, obj: "JObj", name: str, upto: Optional[int] = None) -> Any:
        """Resolve field ``name`` against the topmost defining layer
        below ``upto`` (None = whole object), late-binding self/$ to
        the full object and super to the layers beneath."""
        limit = len(obj.layers) if upto is None else upto
        idxs = [i for i in range(limit) if name in obj.layers[i].fields]
        if not idxs:
            where = "super" if upto is not None else "object"
            raise JsonnetRuntimeError(f"field does not exist in {where}: {name}")
        if upto is None and name in obj._cache:
            return obj._cache[name]
        i = idxs[-1]
        if (name, i) in obj._forcing:
            raise JsonnetRuntimeError(f"cyclic object field reference: {name}")
        vexpr, _sep, plus = obj.layers[i].fields[name]
        obj._forcing.add((name, i))
        try:
            # ``h+: e`` desugars to ``h: super[h] + e`` (jsonnet spec),
            # so an object-literal e inherits FROM THE BASE FIELD —
            # build its layer unforced exactly like binop +.
            if plus and len(idxs) > 1:
                baseval = self._obj_get(obj, name, upto=i)
                if vexpr[0] == "object" and isinstance(baseval, dict):
                    val = self._merge_with_literal(
                        baseval, vexpr, self._field_env(obj, i))
                else:
                    val = self._plus_values(
                        baseval, self._eval(vexpr, self._field_env(obj, i)))
            else:
                val = self._eval(vexpr, self._field_env(obj, i))
        finally:
            obj._forcing.discard((name, i))
        if upto is None:
            obj._cache[name] = val
        return val

    def _force_object(self, obj: "JObj") -> "JObj":
        """Force the VISIBLE fields into the dict storage (first
        observation).  Hidden (``::``) fields are recorded by name only
        and evaluate on access through the layers — never here — so the
        ``{required:: error 'override me'}`` abstract-base idiom holds.
        Object asserts (all layers') run first, like go-jsonnet runs
        them on any field access or manifestation."""
        if obj._forced:
            return obj
        obj._forced = True  # reentrancy: a field body may observe self
        # visibility: ':' inherits the base field's visibility,
        # '::' forces hidden, ':::' forces visible (go-jsonnet rules)
        vis: dict[str, Optional[bool]] = {}
        for layer in obj.layers:
            for name, (_v, sep, _p) in layer.fields.items():
                if sep == "::":
                    vis[name] = True
                elif sep == ":::":
                    vis[name] = False
                elif name not in vis:
                    vis[name] = False
        obj.hidden = {name for name, h in vis.items() if h}
        self._run_asserts(obj)
        for name in sorted(vis):
            if not vis[name]:
                dict.__setitem__(obj, name, self._obj_get(obj, name))
        return obj

    def _run_asserts(self, obj: "JObj") -> None:
        """Run every layer's object asserts once — triggered by any
        field access or manifestation (go-jsonnet), NOT construction,
        so an unobserved failing object never raises."""
        if obj._asserted:
            return
        obj._asserted = True  # set first: asserts may access self
        for i, layer in enumerate(obj.layers):
            for cond, msg in layer.asserts:
                env = self._field_env(obj, i)
                if self._eval(cond, env) is not True:
                    text = ("object assertion failed" if msg is None
                            else _to_string(self._eval(msg, env)))
                    raise JsonnetRuntimeError(text)

    @staticmethod
    def _layers_of(v: dict) -> list[_Layer]:
        if isinstance(v, JObj):
            return v.layers
        # plain dict (e.g. parsed event data): a value layer
        fmap = {k: (("lit", val), ":", False) for k, val in v.items()}
        return [_Layer(fmap, [], _Env({}, None), [], root=False)]

    def _merge_objects(self, a: dict, b: dict) -> "JObj":
        # merging only concatenates layers — observation forces later
        return JObj(self._layers_of(a) + self._layers_of(b), self)

    def _merge_with_literal(self, a: dict, objnode: Any, env: _Env) -> "JObj":
        """``a + {literal}``: build the literal's layer WITHOUT forcing
        it standalone, so its fields may reference super."""
        _, fields, locals_, asserts = objnode
        layer = self._make_layer(fields, locals_, asserts, env)
        return JObj(self._layers_of(a) + [layer], self)

    def _plus_values(self, a: Any, b: Any) -> Any:
        if isinstance(a, str) or isinstance(b, str):
            return _to_string(a) + _to_string(b)
        if isinstance(a, list) and isinstance(b, list):
            return a + b
        if isinstance(a, dict) and isinstance(b, dict):
            return self._merge_objects(a, b)
        return _num(a) + _num(b)

    def _comp(self, specs: list[tuple[str, ...]], i: int, env: _Env,
              emit: Callable[[_Env], None]) -> None:
        if i == len(specs):
            emit(env)
            return
        spec = specs[i]
        if spec[0] == "for":
            _, var, arrexpr = spec
            arr = self._eval(arrexpr, env)
            if not isinstance(arr, list):
                raise JsonnetRuntimeError(
                    f"comprehension 'in' expects array, got {_typename(arr)}"
                )
            for item in arr:
                self._comp(specs, i + 1, _Env({var: item}, env), emit)
        else:
            cond = self._eval(spec[1], env)
            if not isinstance(cond, bool):
                raise JsonnetRuntimeError("comprehension 'if' must be boolean")
            if cond:
                self._comp(specs, i + 1, env, emit)

    def _index(self, base: Any, idx: Any) -> Any:
        if isinstance(base, JObj):
            # field access forces the asserts + THAT field only
            # (go-jsonnet: {a: error 'x', b: 1}.b is 1); resolve
            # through the layers (memoized) — the object may be
            # mid-force, so dict storage can lag behind (self.x before
            # x's slot is populated)
            self._run_asserts(base)
            return self._obj_get(base, _want(idx, "string", "object index"))
        if isinstance(base, dict):
            key = _want(idx, "string", "object index")
            if key in base:
                return base[key]
            raise JsonnetRuntimeError(f"field does not exist: {key}")
        if isinstance(base, list):
            i = int(_num(idx, "array index"))
            if i < 0 or i >= len(base):
                raise JsonnetRuntimeError(f"array index {i} out of bounds")
            return base[i]
        if isinstance(base, str):
            i = int(_num(idx, "string index"))
            if i < 0 or i >= len(base):
                raise JsonnetRuntimeError(f"string index {i} out of bounds")
            return base[i]
        raise JsonnetRuntimeError(f"cannot index {_typename(base)}")

    def _binop(self, op: str, lexpr: Any, rexpr: Any, env: _Env) -> Any:
        if op == "&&":
            left = self._eval(lexpr, env)
            if not isinstance(left, bool):
                raise JsonnetRuntimeError("'&&' expects booleans")
            if not left:
                return False
            return _want(self._eval(rexpr, env), "boolean", "'&&'")
        if op == "||":
            left = self._eval(lexpr, env)
            if not isinstance(left, bool):
                raise JsonnetRuntimeError("'||' expects booleans")
            if left:
                return True
            return _want(self._eval(rexpr, env), "boolean", "'||'")
        if op == "in" and rexpr == ("super",):
            if not _env_has(env, "super"):
                raise JsonnetRuntimeError("attempt to use super when there is no super class")
            sup = env.lookup("super")
            name = _want(self._eval(lexpr, env), "string", "'in'")
            return any(name in sup.obj.layers[i].fields for i in range(sup.idx))
        if op == "+" and rexpr[0] == "object":
            # Defer the object-literal RHS: its fields may reference
            # super, which only exists once merged onto the LHS.
            a = self._eval(lexpr, env)
            if isinstance(a, dict):
                return self._merge_with_literal(a, rexpr, env)
            b = self._eval(rexpr, env)
        else:
            a = self._eval(lexpr, env)
            b = self._eval(rexpr, env)
        if op == "==":
            return _eq(a, b)
        if op == "!=":
            return not _eq(a, b)
        if op == "in":
            key = _want(a, "string", "'in'")
            obj = _want(b, "object", "'in'")
            return key in obj or key in getattr(obj, "hidden", {})
        if op == "+":
            return self._plus_values(a, b)
        if op == "-":
            return _num(a) - _num(b)
        if op == "*":
            return _num(a) * _num(b)
        if op == "/":
            if _num(b) == 0:
                raise JsonnetRuntimeError("division by zero")
            return _num(a) / _num(b)
        if op == "%":
            return _jsonnet_mod(a, b)
        if op in ("<", "<=", ">", ">="):
            _cmp_ok(a, b, op)
            return {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}[op]
        if op in ("&", "|", "^", "<<", ">>"):
            x, y = int(_num(a)), int(_num(b))
            r = {"&": x & y, "|": x | y, "^": x ^ y,
                 "<<": x << y, ">>": x >> y}[op]
            return r
        raise JsonnetRuntimeError(f"unknown operator {op}")


# ---------------------------------------------------------------------------
# std library

def _make_std(ev: Evaluator) -> dict[str, Any]:
    def call1(f: Any, x: Any) -> Any:
        return ev.call(f, [x])

    def length(x: Any) -> Any:
        if isinstance(x, (str, list)):
            return len(x)
        if isinstance(x, dict):
            return len(x)
        if isinstance(x, Closure):
            return len(x.params)
        raise JsonnetRuntimeError(f"std.length of {_typename(x)}")

    def _keyf(keyF: Any) -> Callable[[Any], Any]:
        if keyF is None:
            return lambda x: x
        return lambda x: call1(keyF, x)

    def sort(arr: Any, keyF: Any = None) -> Any:
        return sorted(arr, key=_keyf(keyF))

    def uniq(arr: Any, keyF: Any = None) -> Any:
        kf = _keyf(keyF)
        out: list[Any] = []
        for x in arr:
            if not out or not _eq(kf(out[-1]), kf(x)):
                out.append(x)
        return out

    def set_(arr: Any, keyF: Any = None) -> Any:
        return uniq(sort(arr, keyF), keyF)

    def member(arr: Any, x: Any) -> bool:
        if isinstance(arr, str):
            return _want(x, "string", "std.member") in arr
        return any(_eq(v, x) for v in arr)

    def range_(a: Any, b: Any) -> list[Any]:
        return list(range(int(_num(a)), int(_num(b)) + 1))

    def fold(f: Any, arr: Any, init: Any, left: bool) -> Any:
        acc = init
        for x in (arr if left else reversed(arr)):
            acc = ev.call(f, [acc, x] if left else [x, acc])
        return acc

    def parse_int(s: Any) -> int:
        s = _want(s, "string", "std.parseInt")
        try:
            return int(s, 10)
        except ValueError as e:
            raise JsonnetRuntimeError(f"std.parseInt: {s!r}") from e

    def parse_json(s: Any) -> Any:
        try:
            return json.loads(_want(s, "string", "std.parseJson"))
        except ValueError as e:
            raise JsonnetRuntimeError(f"std.parseJson: {e}") from e

    def parse_yaml(s: Any) -> Any:
        """go-jsonnet std.parseYaml: single document -> its value,
        multi-document stream -> array of values.  go-jsonnet routes
        YAML through a JSON round-trip (sigs.k8s.io/yaml), so
        timestamps surface as strings and object keys are strings —
        normalize PyYAML's richer types to match."""
        s = _want(s, "string", "std.parseYaml")
        try:
            import yaml
        except ImportError as e:  # pragma: no cover - env-dependent
            raise JsonnetRuntimeError(
                "std.parseYaml: PyYAML is not available in this "
                "environment"
            ) from e

        def norm(v: Any) -> Any:
            import datetime as _dt

            if isinstance(v, dict):
                return {str(k): norm(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [norm(x) for x in v]
            if isinstance(v, (_dt.datetime, _dt.date)):
                return v.isoformat()
            if isinstance(v, bytes):
                return v.decode("utf-8", "replace")
            return v

        try:
            docs = [norm(d) for d in yaml.safe_load_all(s)]
        except yaml.YAMLError as e:
            raise JsonnetRuntimeError(f"std.parseYaml: {e}") from e
        if not docs:
            return None
        return docs if len(docs) > 1 else docs[0]

    def find(value: Any, arr: Any) -> list[int]:
        return [i for i, v in enumerate(arr) if _eq(v, value)]

    def flatmap(f: Any, arr: Any) -> Any:
        if isinstance(arr, str):
            return "".join(call1(f, c) for c in arr)
        out: list[Any] = []
        for x in arr:
            r = call1(f, x)
            if not isinstance(r, list):
                raise JsonnetRuntimeError("std.flatMap fn must return arrays")
            out.extend(r)
        return out

    std: dict[str, Any] = {
        "length": length,
        "type": _typename,
        "toString": _to_string,
        "codepoint": lambda s: ord(s),
        "char": lambda n: chr(int(_num(n))),
        "substr": lambda s, f, l: s[int(_num(f)) : int(_num(f)) + int(_num(l))],
        "startsWith": lambda a, b: a.startswith(b),
        "endsWith": lambda a, b: a.endswith(b),
        "strReplace": lambda s, frm, to: s.replace(frm, to),
        "asciiUpper": lambda s: s.upper(),
        "asciiLower": lambda s: s.lower(),
        "stringChars": lambda s: list(s),
        "split": lambda s, c: s.split(c),
        "splitLimit": lambda s, c, m: s.split(c, int(_num(m)) if m >= 0 else -1),
        "join": lambda sep, arr: _join(sep, arr),
        "format": std_format,
        "map": lambda f, arr: (
            [call1(f, x) for x in arr]
            if isinstance(arr, list)
            else [call1(f, ch) for ch in _want(arr, "array", "std.map")]
        ),
        "mapWithIndex": lambda f, arr: [ev.call(f, [i, x]) for i, x in enumerate(arr)],
        "mapWithKey": lambda f, obj: {k: ev.call(f, [k, v]) for k, v in obj.items()},
        "filter": lambda f, arr: [x for x in arr if _want(call1(f, x), "boolean", "std.filter")],
        "filterMap": lambda pf, mf, arr: [call1(mf, x) for x in arr if call1(pf, x)],
        "flatMap": flatmap,
        "foldl": lambda f, arr, init: fold(f, arr, init, True),
        "foldr": lambda f, arr, init: fold(f, arr, init, False),
        "range": range_,
        "repeat": lambda what, count: what * int(_num(count)),
        "slice": lambda x, a, b, step: x[int(_num(a)) : (None if b is None else int(_num(b))) : (None if step is None else int(_num(step)))],
        "makeArray": lambda n, f: [call1(f, i) for i in range(int(_num(n)))],
        "count": lambda arr, x: sum(1 for v in arr if _eq(v, x)),
        "find": find,
        "member": member,
        "contains": member,
        "reverse": lambda arr: list(reversed(arr)),
        "sort": sort,
        "uniq": uniq,
        "set": set_,
        "setMember": lambda x, arr, keyF=None: member(arr, x),
        "setUnion": lambda a, b, keyF=None: set_(a + b, keyF),
        "setInter": lambda a, b, keyF=None: [x for x in set_(a, keyF) if member(b, x)],
        "setDiff": lambda a, b, keyF=None: [x for x in set_(a, keyF) if not member(b, x)],
        "sum": lambda arr: sum(_num(x) for x in arr),
        "avg": lambda arr: sum(_num(x) for x in arr) / len(arr),
        "all": lambda arr: all(_want(x, "boolean", "std.all") for x in arr),
        "any": lambda arr: any(_want(x, "boolean", "std.any") for x in arr),
        "abs": lambda n: abs(_num(n)),
        "sign": lambda n: 0 if _num(n) == 0 else (1 if n > 0 else -1),
        "max": lambda a, b: max(_num(a), _num(b)),
        "min": lambda a, b: min(_num(a), _num(b)),
        "clamp": lambda x, lo, hi: max(_num(lo), min(_num(x), _num(hi))),
        "pow": lambda a, b: _num(a) ** _num(b),
        "exp": lambda n: math.exp(_num(n)),
        "log": lambda n: math.log(_num(n)),
        "sqrt": lambda n: math.sqrt(_num(n)),
        "floor": lambda n: math.floor(_num(n)),
        "ceil": lambda n: math.ceil(_num(n)),
        "round": lambda n: round(_num(n)),
        "mod": _jsonnet_mod,
        "isString": lambda v: isinstance(v, str),
        "isNumber": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
        "isBoolean": lambda v: isinstance(v, bool),
        "isArray": lambda v: isinstance(v, list),
        "isObject": lambda v: isinstance(v, dict),
        "isFunction": lambda v: isinstance(v, Closure) or callable(v),
        "objectHas": lambda o, f: f in _want(o, "object", "std.objectHas"),
        "objectHasAll": lambda o, f: f in o or f in getattr(o, "hidden", {}),
        "objectFields": lambda o: sorted(o.keys()),
        "objectFieldsAll": lambda o: sorted(set(o.keys()) | set(getattr(o, "hidden", ()))),
        "objectValues": lambda o: [o[k] for k in sorted(o.keys())],
        "objectKeysValues": lambda o: [
            {"key": k, "value": o[k]} for k in sorted(o.keys())
        ],
        "get": lambda o, f, default=None, inc_hidden=True: o.get(f, default),
        "prune": lambda v: _prune(v),
        "parseInt": parse_int,
        "parseJson": parse_json,
        "parseYaml": parse_yaml,
        "manifestJson": lambda v: manifest_json(v, indent=4),
        "manifestJsonEx": lambda v, indent, nl="\n", ksep=": ": manifest_json(
            v, indent=len(indent)
        ),
        "manifestJsonMinified": lambda v: manifest_json(v),
        "escapeStringJson": lambda s: json.dumps(_to_string(s), ensure_ascii=False),
        "assertEqual": lambda a, b: (
            True if _eq(a, b)
            else (_ for _ in ()).throw(
                JsonnetRuntimeError(f"assertEqual failed: {a!r} != {b!r}")
            )
        ),
        "trace": lambda msg, rest: rest,
        "pi": math.pi,
    }

    def ext_var(name: Any) -> Any:
        name = _want(name, "string", "std.extVar")
        if name not in ev.ext_vars:
            raise JsonnetRuntimeError(f"undefined external variable: {name}")
        return ev.ext_vars[name]

    # -- round-7 conformance batch (go-jsonnet std parity sweep) --
    def _keyf_call(keyF: Any):
        if keyF is None:
            return lambda x: x
        return lambda x: call1(keyF, x)

    def min_array(arr: Any, keyF: Any = None, onEmpty: Any = _SENTINEL) -> Any:
        if not arr:
            if onEmpty is _SENTINEL:
                raise JsonnetRuntimeError("std.minArray: empty array")
            return onEmpty
        return min(arr, key=_keyf_call(keyF))

    def max_array(arr: Any, keyF: Any = None, onEmpty: Any = _SENTINEL) -> Any:
        if not arr:
            if onEmpty is _SENTINEL:
                raise JsonnetRuntimeError("std.maxArray: empty array")
            return onEmpty
        return max(arr, key=_keyf_call(keyF))

    def deep_join(arr: Any) -> str:
        if isinstance(arr, str):
            return arr
        if isinstance(arr, list):
            return "".join(deep_join(x) for x in arr)
        raise JsonnetRuntimeError(f"std.deepJoin of {_typename(arr)}")

    def flatten_deep(v: Any) -> list[Any]:
        if isinstance(v, list):
            out: list[Any] = []
            for x in v:
                out.extend(flatten_deep(x))
            return out
        return [v]

    def remove_first(arr: Any, elem: Any) -> list[Any]:
        for i, x in enumerate(arr):
            if _eq(x, elem):
                return arr[:i] + arr[i + 1 :]
        return list(arr)

    def primitive_equals(a: Any, b: Any) -> bool:
        if isinstance(a, (dict, list)) or isinstance(b, (dict, list)):
            raise JsonnetRuntimeError(
                "std.primitiveEquals operates on primitive types"
            )
        return _eq(a, b)

    std.update(
        {
            # strings
            "trim": lambda s: _strip_chars(s, _YAML_WS, both=True),
            "stripChars": lambda s, cs: _strip_chars(s, cs, both=True),
            "lstripChars": lambda s, cs: _strip_chars(s, cs, left=True),
            "rstripChars": lambda s, cs: _strip_chars(s, cs, right=True),
            "findSubstr": _find_substr,
            "splitLimitR": lambda s, c, m: s.rsplit(
                c, int(_num(m)) if m >= 0 else -1
            ),
            "equalsIgnoreCase": lambda a, b: a.lower() == b.lower(),
            "isEmpty": lambda s: len(_want(s, "string", "std.isEmpty")) == 0,
            "escapeStringBash": lambda s: "'" + _to_string(s).replace("'", r"'\''") + "'",
            "escapeStringDollars": lambda s: _to_string(s).replace("$", "$$"),
            "escapeStringPython": lambda s: json.dumps(
                _to_string(s), ensure_ascii=False
            ),
            "lines": lambda arr: "\n".join(list(arr) + [""]),
            # encoding / hashing
            "base64": _base64,
            "base64Decode": lambda s: "".join(chr(b) for b in _base64_bytes(s)),
            "base64DecodeBytes": lambda s: [float(b) for b in _base64_bytes(s)],
            "encodeUTF8": lambda s: [float(b) for b in s.encode("utf-8")],
            "decodeUTF8": lambda arr: bytes(
                int(_num(b)) for b in arr
            ).decode("utf-8", errors="replace"),
            "md5": lambda s: _hexdigest("md5", s),
            "sha1": lambda s: _hexdigest("sha1", s),
            "sha256": lambda s: _hexdigest("sha256", s),
            "sha512": lambda s: _hexdigest("sha512", s),
            "sha3": lambda s: _hexdigest("sha3_512", s),
            "parseHex": lambda s: int(_want(s, "string", "std.parseHex"), 16),
            "parseOctal": lambda s: int(_want(s, "string", "std.parseOctal"), 8),
            # math
            "log2": lambda n: math.log2(_num(n)),
            "log10": lambda n: math.log10(_num(n)),
            "exponent": lambda n: math.frexp(_num(n))[1],
            "mantissa": lambda n: math.frexp(_num(n))[0],
            "hypot": lambda a, b: math.hypot(_num(a), _num(b)),
            "deg2rad": lambda n: math.radians(_num(n)),
            "rad2deg": lambda n: math.degrees(_num(n)),
            "sin": lambda n: math.sin(_num(n)),
            "cos": lambda n: math.cos(_num(n)),
            "tan": lambda n: math.tan(_num(n)),
            "asin": lambda n: math.asin(_num(n)),
            "acos": lambda n: math.acos(_num(n)),
            "atan": lambda n: math.atan(_num(n)),
            "atan2": lambda y, x: math.atan2(_num(y), _num(x)),
            "isInteger": lambda v: isinstance(v, (int, float))
            and not isinstance(v, bool)
            and float(v) == math.floor(v),
            "isDecimal": lambda v: isinstance(v, (int, float))
            and not isinstance(v, bool)
            and float(v) != math.floor(v),
            "isEven": lambda n: _num(n) % 2 == 0,
            "isOdd": lambda n: _num(n) % 2 != 0,
            "xor": lambda a, b: bool(a) != bool(b),
            "xnor": lambda a, b: bool(a) == bool(b),
            # arrays / objects
            "flattenArrays": lambda arrs: [x for a in arrs for x in a],
            "flattenDeepArray": flatten_deep,
            "deepJoin": deep_join,
            "remove": remove_first,
            "removeAt": lambda arr, i: arr[: int(_num(i))] + arr[int(_num(i)) + 1 :],
            "objectRemoveKey": lambda o, k: {
                f: v for f, v in o.items() if f != k
            },
            "minArray": min_array,
            "maxArray": max_array,
            "mergePatch": _merge_patch,
            "primitiveEquals": primitive_equals,
            "equals": _eq,
            "objectHasEx": lambda o, f, inc_hidden: f in o
            or (bool(inc_hidden) and f in getattr(o, "hidden", {})),
            "objectFieldsEx": lambda o, inc_hidden: sorted(
                set(o.keys()) | (set(getattr(o, "hidden", ())) if inc_hidden else set())
            ),
            # JObj.__getitem__ resolves hidden names through the layer
            # chain, so o[k] works for both visible and :: fields
            "objectValuesAll": lambda o: [
                o[k]
                for k in sorted(set(o.keys()) | set(getattr(o, "hidden", ())))
            ],
            "objectKeysValuesAll": lambda o: [
                {"key": k, "value": o[k]}
                for k in sorted(set(o.keys()) | set(getattr(o, "hidden", ())))
            ],
            "id": lambda x: x,
            "extVar": ext_var,
            "escapeStringXml": lambda s: (
                _to_string(s)
                .replace("&", "&amp;")
                .replace("<", "&lt;")
                .replace(">", "&gt;")
                .replace('"', "&quot;")
                .replace("'", "&apos;")
            ),
            # manifestation
            "manifestIni": _manifest_ini,
            "manifestTomlEx": _manifest_toml,
            "manifestToml": lambda v: _manifest_toml(v, "  "),
            "manifestPython": _manifest_python,
            "manifestPythonVars": lambda conf: "".join(
                f"{k} = {_manifest_python(conf[k])}\n" for k in sorted(conf)
            ),
            "manifestXmlJsonml": _manifest_jsonml,
            "manifestYamlDoc": lambda v, indent_array_in_object=False, quote_keys=True: (
                _manifest_yaml(v, bool(indent_array_in_object), bool(quote_keys))
            ),
            "manifestYamlStream": lambda arr, indent_array_in_object=False, c_document_end=True, quote_keys=True: (
                "---\n"
                + "\n---\n".join(
                    _manifest_yaml(v, bool(indent_array_in_object), bool(quote_keys))
                    for v in arr
                )
                + ("\n...\n" if c_document_end else "\n")
            ),
        }
    )
    return std


_SENTINEL = object()

# go-jsonnet's std.trim whitespace set (stripChars with this set).
_YAML_WS = " \t\n\f\r "


def _strip_chars(
    s: Any, chars: Any, both: bool = False, left: bool = False, right: bool = False
) -> str:
    s = _want(s, "string", "std.stripChars")
    cs = _want(chars, "string", "std.stripChars")
    if both or left:
        s = s.lstrip(cs)
    if both or right:
        s = s.rstrip(cs)
    return s


def _find_substr(pat: Any, s: Any) -> list[int]:
    pat = _want(pat, "string", "std.findSubstr")
    s = _want(s, "string", "std.findSubstr")
    if not pat:
        raise JsonnetRuntimeError("std.findSubstr: pattern must not be empty")
    return [i for i in range(len(s) - len(pat) + 1) if s.startswith(pat, i)]


def _base64(v: Any) -> str:
    import base64 as b64

    if isinstance(v, str):
        raw = v.encode("utf-8")
    elif isinstance(v, list):
        raw = bytes(int(_num(b)) for b in v)
    else:
        raise JsonnetRuntimeError(f"std.base64 of {_typename(v)}")
    return b64.b64encode(raw).decode("ascii")


def _base64_bytes(s: Any) -> bytes:
    import base64 as b64

    return b64.b64decode(_want(s, "string", "std.base64Decode"))


def _hexdigest(algo: str, s: Any) -> str:
    import hashlib

    return getattr(hashlib, algo)(
        _want(s, "string", f"std.{algo}").encode("utf-8")
    ).hexdigest()


def _merge_patch(target: Any, patch: Any) -> Any:
    """RFC 7396 JSON Merge Patch (go-jsonnet std.mergePatch)."""
    if not isinstance(patch, dict):
        return patch
    out = dict(target) if isinstance(target, dict) else {}
    for k, v in patch.items():
        if v is None:
            out.pop(k, None)
        else:
            out[k] = _merge_patch(out.get(k), v)
    return out


def _manifest_python(v: Any) -> str:
    if v is None:
        return "None"
    if isinstance(v, bool):
        return "True" if v else "False"
    if isinstance(v, (int, float)):
        return _num_repr(v)
    if isinstance(v, str):
        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, list):
        return "[" + ", ".join(_manifest_python(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{"
            + ", ".join(
                f"{json.dumps(k, ensure_ascii=False)}: {_manifest_python(v[k])}"
                for k in sorted(v)
            )
            + "}"
        )
    raise JsonnetRuntimeError(f"std.manifestPython of {_typename(v)}")


_TOML_BARE_KEY = re.compile(r"^[A-Za-z0-9_-]+$")


def _manifest_toml(value: Any, indent: Any) -> str:
    """go-jsonnet ``std.manifestTomlEx`` semantics (r16, VERDICT r15
    next #7): simple key-values first within each table, then
    ``[table]`` sections for object fields and ``[[table]]``
    array-of-tables sections (an array counts as a table array when
    non-empty and all-objects; any other array renders as a TOML
    inline/multi-line value array).  Keys render bare when they match
    ``[A-Za-z0-9_-]+``, JSON-quoted otherwise; field order is
    ``std.objectFields`` order (sorted).  ``null`` and functions
    error — TOML has no null, exactly as go-jsonnet errors."""
    indent = _want(indent, "string", "std.manifestTomlEx indent")
    if not isinstance(value, dict):
        raise JsonnetRuntimeError(
            f"std.manifestTomlEx: top-level must be an object, got "
            f"{_typename(value)}"
        )

    def esc_str(s: str) -> str:
        return json.dumps(s, ensure_ascii=False)

    def esc_key(k: str) -> str:
        return k if _TOML_BARE_KEY.match(k) else esc_str(k)

    def is_table_array(v: Any) -> bool:
        return (
            isinstance(v, list)
            and len(v) > 0
            and all(isinstance(e, dict) for e in v)
        )

    def is_section(v: Any) -> bool:
        return isinstance(v, dict) or is_table_array(v)

    def path_str(path: list) -> str:
        return "".join(f"[{p!r}]" for p in path)

    def render_value(v: Any, path: list, inline: bool, cindent: str) -> str:
        if v is True:
            return "true"
        if v is False:
            return "false"
        if v is None:
            raise JsonnetRuntimeError(
                'std.manifestTomlEx: tried to manifest "null" at '
                + path_str(path)
            )
        if isinstance(v, (int, float)):
            return _num_repr(v)
        if isinstance(v, str):
            return esc_str(v)
        if isinstance(v, list):
            if not v:
                return "[]"
            new_indent = "" if inline else cindent + indent
            sep = " " if inline else "\n"
            items = ("," + sep).join(
                new_indent + render_value(e, path + [i], True, "")
                for i, e in enumerate(v)
            )
            close = "" if inline else cindent
            return "[" + sep + items + sep + close + "]"
        if isinstance(v, dict):
            body = ", ".join(
                esc_key(k) + " = " + render_value(v[k], path + [k], True, "")
                for k in sorted(v)
            )
            return "{ " + body + " }"
        raise JsonnetRuntimeError(
            "std.manifestTomlEx: tried to manifest "
            f"{_typename(v)} at " + path_str(path)
        )

    def render_table_internal(
        v: dict, path: list, ipath: list, cindent: str
    ) -> str:
        kvp = [
            cindent
            + esc_key(k)
            + " = "
            + render_value(v[k], ipath + [k], False, cindent)
            for k in sorted(v)
            if not is_section(v[k])
        ]
        sections = [
            render_table(v[k], path + [k], ipath + [k], cindent)
            if isinstance(v[k], dict)
            else render_table_array(v[k], path + [k], ipath + [k], cindent)
            for k in sorted(v)
            if is_section(v[k])
        ]
        parts = (["\n".join(kvp)] if kvp else []) + sections
        return "\n\n".join(parts)

    def render_table(v: dict, path: list, ipath: list, cindent: str) -> str:
        header = cindent + "[" + ".".join(esc_key(p) for p in path) + "]"
        if not v:
            return header
        return header + "\n" + render_table_internal(
            v, path, ipath, cindent + indent
        )

    def render_table_array(
        v: list, path: list, ipath: list, cindent: str
    ) -> str:
        name = ".".join(esc_key(p) for p in path)
        out = []
        for i, e in enumerate(v):
            header = cindent + "[[" + name + "]]"
            if e:
                header += "\n" + render_table_internal(
                    e, path, ipath + [i], cindent + indent
                )
            out.append(header)
        return "\n\n".join(out)

    return render_table_internal(value, [], [], "")


def _manifest_ini(ini: Any) -> str:
    def body_lines(body: Any) -> list[str]:
        out: list[str] = []
        for k in sorted(_want(body, "object", "std.manifestIni")):
            v = body[k]
            if isinstance(v, list):
                out.extend(f"{k} = {_to_string(x)}" for x in v)
            else:
                out.append(f"{k} = {_to_string(v)}")
        return out

    lines: list[str] = []
    if "main" in ini:
        lines.extend(body_lines(ini["main"]))
    for name in sorted(ini.get("sections", {})):
        lines.append(f"[{name}]")
        lines.extend(body_lines(ini["sections"][name]))
    return "\n".join(lines + [""])


def _manifest_jsonml(v: Any) -> str:
    """JsonML (['tag', {attrs}?, ...children]) -> XML string."""
    if isinstance(v, str):
        return v
    arr = _want(v, "array", "std.manifestXmlJsonml")
    if not arr or not isinstance(arr[0], str):
        raise JsonnetRuntimeError("std.manifestXmlJsonml: tag name required")
    tag = arr[0]
    attrs: dict = {}
    children = arr[1:]
    if children and isinstance(children[0], dict):
        attrs, children = children[0], children[1:]
    attr_s = "".join(f' {k}="{_to_string(attrs[k])}"' for k in attrs)
    inner = "".join(_manifest_jsonml(c) for c in children)
    return f"<{tag}{attr_s}>{inner}</{tag}>"


def _yaml_scalar(v: Any, quote_keys: bool = True) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return _num_repr(v)
    return json.dumps(v, ensure_ascii=False)


def _manifest_yaml(v: Any, indent_array_in_object: bool, quote_keys: bool) -> str:
    """std.manifestYamlDoc subset: block-style maps/arrays, scalars
    JSON-quoted (always-valid YAML; go-jsonnet only omits quotes for
    provably-safe strings, and quoted output parses identically)."""

    def key(k: str) -> str:
        return json.dumps(k, ensure_ascii=False) if quote_keys else k

    def go(v: Any, indent: str) -> str:
        if isinstance(v, dict):
            if not v:
                return "{}"
            parts = []
            for k in sorted(v):
                x = v[k]
                if isinstance(x, dict) and x:
                    parts.append(f"{indent}{key(k)}:\n{go(x, indent + '  ')}")
                elif isinstance(x, list) and x:
                    pad = indent + "  " if indent_array_in_object else indent
                    parts.append(f"{indent}{key(k)}:\n{go(x, pad)}")
                else:
                    parts.append(f"{indent}{key(k)}: {_yaml_scalar(x, quote_keys)}")
            return "\n".join(parts)
        if isinstance(v, list):
            if not v:
                return "[]"
            parts = []
            for x in v:
                if isinstance(x, (dict, list)) and x:
                    sub = go(x, indent + "  ")
                    parts.append(f"{indent}-\n{sub}")
                else:
                    parts.append(f"{indent}- {_yaml_scalar(x, quote_keys)}")
            return "\n".join(parts)
        return _yaml_scalar(v, quote_keys)

    return go(v, "")


def _join(sep: Any, arr: Any) -> Any:
    if isinstance(sep, str):
        return sep.join(
            _want(x, "string", "std.join") for x in arr if x is not None
        )
    if isinstance(sep, list):
        out: list[Any] = []
        first = True
        for part in arr:
            if part is None:
                continue
            if not first:
                out.extend(sep)
            out.extend(_want(part, "array", "std.join"))
            first = False
        return out
    raise JsonnetRuntimeError(f"std.join separator must be string or array")


def _prune(v: Any) -> Any:
    if isinstance(v, dict):
        out = {k: _prune(x) for k, x in v.items()}
        return {k: x for k, x in out.items() if x not in (None, [], {})}
    if isinstance(v, list):
        return [x for x in (_prune(i) for i in v) if x not in (None, [], {})]
    return v


# ---------------------------------------------------------------------------
# Snippet API (the shape the transform adapter needs)

def file_importer(base_dir: str = ".") -> Callable[[str, Optional[str]], tuple[str, str]]:
    """The go-jsonnet FileImporter behavior the reference's VM ships
    with (stream-jsonnet/main.go:41 MakeVM): the top-level program's
    imports resolve against ``base_dir``; TRANSITIVE imports resolve
    against the IMPORTING file's directory (so a lib in a subdirectory
    importing its sibling works), and the VM caches on the resolved
    absolute path rather than the literal import string.  Wire
    explicitly — executors only see files the deployment distributed
    to them."""

    def _import(path: str, from_dir: Optional[str] = None) -> tuple[str, str]:
        root = from_dir if from_dir else base_dir
        resolved = (
            path if os.path.isabs(path) else os.path.normpath(os.path.join(root, path))
        )
        with open(resolved, "r", encoding="utf-8") as f:
            return os.path.abspath(resolved), f.read()

    return _import


def evaluate_snippet(
    src: str,
    tla: Optional[list[Any]] = None,
    importer: Optional[Callable[[str], str]] = None,
    ext_vars: Optional[dict[str, Any]] = None,
) -> Any:
    """Parse + evaluate a snippet.  If the result is a function and
    ``tla`` is given, call it with those top-level arguments (the
    stream-jsonnet TLA contract, main.go:43-55).  ``ext_vars`` feeds
    ``std.extVar`` (go-jsonnet ``--ext-var``/``ExtVar``)."""
    return evaluate_ast(parse(src), tla, importer=importer, ext_vars=ext_vars)


def _deep_force(v: Any) -> Any:
    """Force every visible field reachable from ``v`` — what jsonnet's
    output manifestation does.  Hidden fields stay lazy (go-jsonnet
    never manifests them either)."""
    if isinstance(v, JObj):
        v._ensure()
        for k in dict.keys(v):
            _deep_force(dict.__getitem__(v, k))
    elif isinstance(v, list):
        for x in v:
            _deep_force(x)
    return v


def evaluate_ast(
    ast: Any,
    tla: Optional[list[Any]] = None,
    importer: Optional[Callable[..., Any]] = None,
    ext_vars: Optional[dict[str, Any]] = None,
) -> Any:
    ev = Evaluator(importer=importer, ext_vars=ext_vars)
    result = ev.eval_ast(ast)
    if isinstance(result, Closure) and tla is not None:
        return _deep_force(ev.call(result, tla))
    return _deep_force(result)
