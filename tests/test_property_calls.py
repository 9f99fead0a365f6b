"""Hypothesis sweep of the eager plain-Python ``Call`` evaluation surface
(siu/calls.py ``Call.__call__`` — reference parity: siuba/siu/calls.py:158,
where symbols double as plain lambdas like ``list(map(_ * 2, xs))``).

VERDICT r10 item 10: the surface was notebook-port-tested only; this sweep
generates random expression trees over operators × indexing (string keys,
int keys, slices, SYMBOLIC keys) × method calls (args + kwargs) × the
``~~`` escape, and pins each against a hand-built plain-Python lambda —
the same strategy test_property_oracle.py uses for span dedup.

The oracle for every generated pair is the *Python semantics themselves*:
whatever ``lambda c: <literal python>`` computes, evaluating the captured
Symbolic tree against the same context must reproduce, value AND type
(the evaluator routes through the operator module, so bool-vs-int must
match exactly too).
"""

import operator

import hypothesis.strategies as st
from hypothesis import given, settings

from siuba_spark import _
from siuba_spark.siu.calls import Call, strip_symbolic


class Ctx:
    """Evaluation context offering attributes, items, and a method with
    kwargs — everything the node set can touch."""

    def __init__(self, a, b, i, s, xs):
        self.a, self.b, self.i, self.s, self.xs = a, b, i, s, xs
        self._d = {"a": a, "b": b, "i": i, "s": s, "xs": xs}

    def __getitem__(self, k):
        return self._d[k]

    def scale(self, m, add=0):
        return self.a * m + add


ctxs = st.builds(
    Ctx,
    a=st.integers(-5, 5),
    b=st.integers(-5, 5),
    i=st.integers(0, 2),
    s=st.text(alphabet="abxy ", min_size=0, max_size=8),
    xs=st.lists(st.integers(-3, 3), min_size=3, max_size=3),
)

# -- leaves: (symbolic_expression, python_lambda) pairs ---------------------

int_leaves = st.sampled_from([
    (_.a, lambda c: c.a),
    (_.b, lambda c: c.b),
    (_["a"], lambda c: c["a"]),
    (_["b"], lambda c: c["b"]),
    (_["xs"][0], lambda c: c["xs"][0]),
    (_["xs"][_["i"]], lambda c: c["xs"][c["i"]]),   # symbolic key
    (_.xs[_.i], lambda c: c.xs[c.i]),
    (_["s"].count("a"), lambda c: c["s"].count("a")),
    (_.s.find("x"), lambda c: c.s.find("x")),
    (_.scale(2, add=3), lambda c: c.scale(2, add=3)),   # kwargs
    (_.scale(_.b), lambda c: c.scale(c.b)),             # symbolic arg
])

_BINOPS = [
    ("__add__", operator.add), ("__sub__", operator.sub),
    ("__mul__", operator.mul),
    ("__and__", operator.and_), ("__or__", operator.or_),
    ("__xor__", operator.xor),
    ("__lt__", operator.lt), ("__le__", operator.le),
    ("__gt__", operator.gt), ("__ge__", operator.ge),
    ("__eq__", operator.eq), ("__ne__", operator.ne),
]
_UNOPS = [("__neg__", operator.neg), ("__invert__", operator.invert),
          ("__abs__", abs), ("__pos__", operator.pos)]


def _binary(children):
    def build(pair):
        (op, fn), (le, lf), (re_, rf), flip = pair
        if flip:  # r-variant: literal on the left exercises __r*__ capture
            lit = 3
            sym = getattr(operator, op)(lit, re_) if False else None
            # operator.add(3, Symbolic) dispatches to Symbolic.__radd__
            sym = fn(lit, re_)
            return sym, (lambda c, rf=rf, fn=fn: fn(lit, rf(c)))
        return fn(le, re_), (lambda c, lf=lf, rf=rf, fn=fn: fn(lf(c), rf(c)))
    return st.tuples(st.sampled_from(_BINOPS), children, children,
                     st.booleans()).map(build)


def _unary(children):
    def build(pair):
        (op, fn), (e, f) = pair
        # `~` on an invert-rooted Symbolic STRIPS (the reference's ~~
        # escape, pinned separately below) instead of stacking another
        # invert — it would desynchronize the tree from the lambda, so
        # the generator swaps to negation there
        from siuba_spark.siu.calls import UnaryOp
        root = strip_symbolic(e)
        if op == "__invert__" and (
                not isinstance(e, type(_))
                or (isinstance(root, UnaryOp)
                    and root.op == "__invert__")):
            fn = operator.neg
        return fn(e), (lambda c, f=f, fn=fn: fn(f(c)))
    return st.tuples(st.sampled_from(_UNOPS), children).map(build)


int_exprs = st.recursive(
    int_leaves, lambda kids: st.one_of(_binary(kids), _unary(kids)),
    max_leaves=6)

str_exprs = st.sampled_from([
    (_.s.upper(), lambda c: c.s.upper()),
    (_["s"].replace("a", "b"), lambda c: c["s"].replace("a", "b")),
    (_.s + _.s, lambda c: c.s + c.s),
    (_.s[0:3], lambda c: c.s[0:3]),
    (_.s[::-1], lambda c: c.s[::-1]),
    (_["s"][_.i:], lambda c: c["s"][c.i:]),          # symbolic slice bound
    (_.s.strip().lower(), lambda c: c.s.strip().lower()),
])


@settings(max_examples=300, deadline=None)
@given(pair=int_exprs, ctx=ctxs)
def test_eager_int_trees_match_python(pair, ctx):
    expr, fn = pair
    want = fn(ctx)
    got = strip_symbolic(expr)(ctx)
    assert got == want
    assert type(got) is type(want)


@settings(max_examples=150, deadline=None)
@given(pair=str_exprs, ctx=ctxs)
def test_eager_str_trees_match_python(pair, ctx):
    expr, fn = pair
    want = fn(ctx)
    got = strip_symbolic(expr)(ctx)
    assert got == want


@settings(max_examples=150, deadline=None)
@given(pair=int_exprs, ctx=ctxs)
def test_double_invert_escape(pair, ctx):
    """``~~expr``: the reference uses double-invert as the explicit
    "hand me the Call" escape (symbolic.py:71 strips a leading invert
    instead of stacking one).  On an expression whose ROOT is not itself
    ``~``, ``~~expr`` hands back the ORIGINAL Call tree — evaluating it
    reproduces the expression unchanged (``map(~~_.x, points)`` reads
    ``x``, it doesn't bit-flip it)."""
    from siuba_spark.siu.calls import UnaryOp

    expr, fn = pair
    if not isinstance(expr, type(_)):
        return  # generator stacked ~~ itself: already a raw (escaped) Call
    root = strip_symbolic(expr)
    if isinstance(root, UnaryOp) and root.op == "__invert__":
        return  # covered by test_invert_escape_parity_on_invert_root
    esc = ~~expr
    assert isinstance(esc, Call) and not isinstance(esc, type(_))
    assert esc is root
    assert esc(ctx) == fn(ctx)


def test_invert_escape_parity_on_invert_root():
    """Reference-exact corner: ``~`` on a Symbolic whose root is already
    ``~`` STRIPS to the raw Call (symbolic.py:72-73), so ``~~(~_.a)``
    first strips twice down to the bare ``_.a`` Call and the third
    ``~`` hits a raw Call — which, like the reference's Call, defines no
    operator dunders and raises TypeError."""
    import pytest

    inner = ~_.a
    stripped = ~inner
    assert isinstance(stripped, Call) and not isinstance(stripped, type(_))
    with pytest.raises(TypeError):
        ~~(~_.a)
    # and the sanctioned escape still round-trips: ~~_.a is the _.a Call
    esc = ~~_.a
    assert isinstance(esc, Call)

    class C:
        a = 7
    assert esc(C()) == 7


@settings(max_examples=100, deadline=None)
@given(pair=int_exprs, ctx=ctxs)
def test_ready_symbolic_is_directly_callable(pair, ctx):
    """A READY expression (outermost node operator/index/completed method
    call) doubles as a plain lambda: ``(_.a + 1)(ctx)`` — reference
    symbolic.py:30.  A dangling attribute (``_.a``) is NOT ready: calling
    it builds a MethodCall instead (pinned below)."""
    expr, fn = pair
    if isinstance(expr, type(_)) and not expr._ready:
        return  # dangling attribute leaf: calling it builds, not evals
    assert expr(ctx) == fn(ctx)


def test_dangling_attr_call_builds_method_call():
    from siuba_spark.siu.calls import MethodCall

    built = (_.a)(2)       # not evaluation: captures a method call a(2)
    assert isinstance(strip_symbolic(built), MethodCall)

    class C:
        def a(self, x):
            return x * 10
    assert strip_symbolic(built)(C()) == 20


def test_bare_meta_arg_evaluates_identity():
    c = object()
    assert strip_symbolic(_)(c) is c
