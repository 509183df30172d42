"""Property tests for the jsonnet object system — invariants the
language spec guarantees, checked over generated programs:

- inheritance is associative: (a + b) + c == a + (b + c)
- for self/super-free objects, + is right-biased field union
- hidden fields never manifest, at any nesting, through any merge
- late binding: self.x in a base resolves to the final override
"""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st

from cdp_spark.jsonnet import evaluate_snippet

_IDENTS = ["a", "b", "c", "d", "e"]

_scalar = st.one_of(
    st.integers(min_value=-1000, max_value=1000),
    st.booleans(),
    st.text(alphabet="xyz", max_size=4),
    st.none(),
)


def _lit(v) -> str:
    return json.dumps(v)


@st.composite
def flat_object(draw):
    names = draw(st.lists(st.sampled_from(_IDENTS), unique=True, max_size=4))
    fields = {n: draw(_scalar) for n in names}
    src = "{" + ", ".join(f"{n}: {_lit(v)}" for n, v in fields.items()) + "}"
    return src, fields


@settings(max_examples=60, deadline=None)
@given(flat_object(), flat_object(), flat_object())
def test_merge_associative(a, b, c):
    sa, _ = a
    sb, _ = b
    sc, _ = c
    left = evaluate_snippet(f"({sa} + {sb}) + {sc}")
    right = evaluate_snippet(f"{sa} + ({sb} + {sc})")
    assert left == right


@settings(max_examples=60, deadline=None)
@given(flat_object(), flat_object())
def test_merge_is_right_biased_union(a, b):
    sa, fa = a
    sb, fb = b
    assert evaluate_snippet(f"{sa} + {sb}") == {**fa, **fb}


@settings(max_examples=60, deadline=None)
@given(flat_object(), st.sampled_from(_IDENTS), _scalar)
def test_hidden_fields_never_manifest(obj, hidden_name, hidden_val):
    src, fields = obj
    hidden_src = src[:-1].rstrip()
    sep = ", " if len(hidden_src) > 1 else ""
    hidden_src += f"{sep}{hidden_name}:: {_lit(hidden_val)}}}"
    out = evaluate_snippet(hidden_src)
    visible = {k: v for k, v in fields.items() if k != hidden_name}
    assert out == visible
    # ...and stays hidden through a merge
    assert evaluate_snippet(f"{hidden_src} + {{z: 1}}") == {**visible, "z": 1}
    # ...but is reachable through self
    assert (
        evaluate_snippet(f"({hidden_src} + {{z: self.{hidden_name}}}).z")
        == hidden_val
    )


@settings(max_examples=60, deadline=None)
@given(st.integers(-100, 100), st.integers(-100, 100), st.integers(-100, 100))
def test_late_binding_chain(base, mid, top):
    """self.x in the base layer must see the topmost override no
    matter how many merges happen afterwards (go-jsonnet semantics)."""
    src = (
        f"{{mirror: self.x, x: {base}}}"
        f" + {{x: {mid}}}"
        f" + {{x: {top}, from_super: super.x}}"
    )
    out = evaluate_snippet(src)
    assert out == {"mirror": top, "x": top, "from_super": mid}


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-50, 50), min_size=1, max_size=5))
def test_plus_field_accumulates_arrays(xs):
    """arr+: chains concatenate in merge order (h+: e == h: super[h]+e)."""
    src = "{arr: []}" + "".join(f" + {{arr+: [{x}]}}" for x in xs)
    assert evaluate_snippet(src) == {"arr": xs}
