"""Port of the reference's examples-varspec.ipynb (the tidyselect
variable-spec internals: Var / VarList / var_select).  This engine's
equivalent internal surface is ``operators/tidyselect.py::resolve_select``
— same inputs (ordered selection expressions over a column list), same
output semantics (ordered (old, new) pairs with renames and exclusions) —
driven here with the public ``_`` placeholder instead of the reference's
``v`` VarList stand-in."""

import pytest

from siuba_spark import _
from siuba_spark.operators.tidyselect import TidySelectError, resolve_select


def _sel(columns, *args, **kwargs):
    return resolve_select(args, kwargs, columns)


def test_exclusion_then_rename():
    # notebook cell 2: var_select(['a','b','c','d'], -v.d, v.x == v.a)
    out = _sel(["a", "b", "c", "d"], -_.d, _.x == _.a)
    assert out == [("a", "x"), ("b", "b"), ("c", "c")]


def test_startswith_plus_name():
    # cell 4: startswith("home") then a plain name appends
    cols = ["home_phone", "home_address", "other", "misc"]
    out = _sel(cols, _.startswith("home"), _.misc)
    assert out == [("home_phone", "home_phone"),
                   ("home_address", "home_address"), ("misc", "misc")]


def test_label_slice():
    # cell 6: v[v.home_phone:v.home_address] — inclusive label range
    cols = ["home_phone", "home_address", "other", "misc"]
    out = _sel(cols, _["home_phone":"home_address"])
    assert out == [("home_phone", "home_phone"),
                   ("home_address", "home_address")]


def test_full_slice_selects_everything():
    # cell 7: v[:]
    cols = ["home_phone", "home_address", "other", "misc"]
    out = _sel(cols, _[:])
    assert out == [(c, c) for c in cols]


def test_predicate_symbol_reuse():
    # cell 9: f = _.startswith("a"); f(v) — a captured predicate applies
    # to any column universe (here: reuse the same symbol twice)
    f = _.startswith("a")
    assert _sel(["ax", "bx", "ay"], f) == [("ax", "ax"), ("ay", "ay")]
    assert _sel(["b", "abc"], f) == [("abc", "abc")]


def test_unknown_column_raises():
    with pytest.raises(TidySelectError):
        _sel(["a", "b"], _.zzz)
