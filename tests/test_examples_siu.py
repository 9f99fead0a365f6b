"""Port of the reference's examples-siu.ipynb (the symbolic-expression
tour): symbols as plain-Python lambdas, method-call capture, indexing,
``~~`` escaping, explain/op_vars, and lazy composition.

Divergences from the notebook, each deliberate:
- ``<<`` (lshift) is not a symbolic operator here (the notebook only uses
  it inside an ``explain`` demo); the explain port uses the same shape
  with supported operators.
- ``siuba.meta_hook`` (import-hook lazy wrapping of arbitrary modules) is
  out of surface — a Spark engine exposes ``symbolic_dispatch`` for
  registering JVM-side functions and ``RawCallable``/``call`` for
  driver-side lambdas instead.  The lazy_func cells are ported against
  RawCallable, which is the same idea without the import hook.
"""

from collections import namedtuple

import pytest

from siuba_spark import _, explain
from siuba_spark.siu.calls import RawCallable, Symbolic, strip_symbolic


def test_symbols_evaluate_like_lambdas():
    # cell 2: binary ops over the placeholder evaluate directly
    assert (_ + _)(1) == 2
    d = {"a": 1, "b": 2}
    assert (_["a"] + _["b"])(d) == 3
    assert (_["a"] + 4)(d) == 5


def test_map_binary_and_method_calls():
    data = ["a", "b", "c"]
    # cell 7: binary operation
    assert list(map(_ * 2, data)) == ["aa", "bb", "cc"]
    # cell 8: method call — calling _.upper() yields an evaluatable symbol
    assert list(map(_.upper(), data)) == ["A", "B", "C"]


def test_nested_index():
    # cell 9
    get_ax = _["a"]["x"]
    assert get_ax({"a": {"x": 1}, "b": 2}) == 1


Point = namedtuple("Point", ["x", "y"])
POINTS = [Point(x=0, y=1), Point(x=1, y=2)]


def test_attribute_escaping():
    # cell 11: _.x alone is a dangling attribute (calling it builds a
    # method call) — ~~ escapes to a plain attribute getter
    assert list(map(~~_.x, POINTS)) == [0, 1]
    # cell 12: binary ops need no escaping
    assert list(map(_.x + _.y, POINTS)) == [1, 3]
    # cell 13: contrived complex escape — attribute of a computed value
    assert list(map(~~(_.x + _.y).imag, POINTS)) == [0, 0]


def test_single_invert_still_negates():
    # ~expr (applied once) must remain bitwise NOT, not an escape —
    # plain-Python eval uses the operator module exactly (so ~True is -2,
    # just as the reference's evaluator computes it)
    assert (~_)(0) == -1              # Python ~0
    assert list(map(~(_ > 0), [1, -1])) == [-2, -1]


def test_explain_renders_the_tree():
    # cells 18/20: explain returns a readable rendering of the call tree
    f = _.a + _.b / 2 + _.c ** _.d
    txt = explain(f)
    assert isinstance(txt, str)
    for name in ("a", "b", "c", "d"):
        assert name in txt
    assert "█" in explain((_.a + _.b) / 2) or "/" in explain((_.a + _.b) / 2)


def test_strip_symbolic_and_op_vars():
    # cell 22: symbol -> call -> op_vars
    symbol = _.a[_.b + 1] + _["c"]
    call = strip_symbolic(symbol)
    assert {"a", "b", "c"} <= call.op_vars()
    # the evaluator agrees with the structure (item-access spelling)
    assert strip_symbolic(_["a"][_["b"] + 1] + _["c"])(
        {"a": [7, 8], "b": 0, "c": 10}) == 18


def test_lazy_callable_composition():
    # cells 26/38 (meta_hook / lazy_func), re-expressed with RawCallable:
    # a deferred call whose arguments are themselves symbolic
    lazy_list = Symbolic(
        RawCallable(lambda *xs: list(xs),
                    (strip_symbolic(_), strip_symbolic(_),
                     strip_symbolic(_)), {}),
        ready=True)
    f = _ + lazy_list
    assert f(["a"]) == ["a", ["a"], ["a"], ["a"]]


def test_symbolic_is_not_boolable_or_iterable():
    # the notebook's banned-methods contract
    with pytest.raises(TypeError):
        bool(_.a)
    with pytest.raises(TypeError):
        list(iter(_.a))
