"""The reference's programming guide (docs/guide_programming.Rmd) run on
this engine: lambda column definitions alongside lazy expressions, pipe
mechanics (implicit Pipeable, explicit ``verb(_, ...)``, reusable verb
values), the Symbolic/Call split, and the documented caveats (`and`,
`in`, trailing-attribute calls)."""

import pandas as pd
import pytest

from siuba_spark import (
    _, Symbolic, collect, filter, group_by, head, mutate, summarize,
)
from siuba_spark.data import mtcars
from siuba_spark.siu.calls import BinaryOp, Call, GetAttr, MetaArg, Lit, \
    strip_symbolic
from tests.helpers import data_frame


# -- 'Column operations': lambdas and lazy expressions are equivalent -------

def test_mutate_accepts_lambda(spark):
    """'pandas assign method / siuba mutate function' — the guide's
    opening example: a lambda column definition works and equals the
    lazy-expression form (here it is called with the symbolic frame, so
    it lowers to the same translated plan)."""
    got = (mtcars >> mutate(demean=lambda d: d.mpg - d.mpg.mean())
           >> collect())
    want = (mtcars >> mutate(demean=_.mpg - _.mpg.mean()) >> collect())
    assert got.demean.round(9).tolist() == want.demean.round(9).tolist()


def test_grouped_mutate_lambda_stays_the_same(spark):
    """'the siuba code ... stays the same as in the ungrouped example'."""
    g = (mtcars >> group_by(_.cyl)
         >> mutate(demean=lambda d: d.hp - d.hp.mean()) >> collect())
    pdf = mtcars >> collect()
    want = pdf.hp - pdf.groupby("cyl").hp.transform("mean")
    assert sorted(g.demean.round(9)) == sorted(want.round(9))


def test_summarize_accepts_lambda(spark):
    got = mtcars >> summarize(hp_mean=lambda d: d.hp.mean()) >> collect()
    want = mtcars >> summarize(avg_hp=_.hp.mean()) >> collect()
    assert got.hp_mean[0] == pytest.approx(want.avg_hp[0], abs=1e-9)


# -- 'Pipe syntax' -----------------------------------------------------------

def test_without_pipe_nested_calls(spark):
    """'without pipe': verbs as plain function calls, dagwood style."""
    got = collect(head(mutate(mtcars, hp_per_cyl=_.hp / _.cyl), 2))
    assert len(got) == 2 and "hp_per_cyl" in got.columns


def test_explicit_pipe_with_symbolic_placeholder(spark):
    """'you can explicitly create a pipe by passing ... Symbolic':
    ``mutate(_, ...)`` builds a pipe instead of executing."""
    p = mutate(_, hp_per_cyl=_.hp / _.cyl)
    got = mtcars >> p >> head(2) >> collect()
    assert got.hp_per_cyl.round(6).tolist() == \
        (got.hp / got.cyl).round(6).tolist()


def test_groups_verbs_operations_as_values(spark):
    """'Groups, verbs, and operations': groupings, verbs, and operations
    are all first-class values that compose."""
    grouping = group_by("cyl")
    verb1, verb2 = mutate, filter
    operation = lambda d: d.hp > d.hp.mean()
    pdf = mtcars >> collect()
    mean_hp = pdf.groupby("cyl").hp.transform("mean")
    m = mtcars >> grouping >> verb1(result=operation) >> collect()
    assert sorted(m.result.tolist()) == sorted((pdf.hp > mean_hp).tolist())
    f = mtcars >> grouping >> verb2(operation) >> collect()
    assert len(f) == int((pdf.hp > mean_hp).sum())


# -- 'Symbolic and Call' -----------------------------------------------------

def test_call_construction_equals_symbolic():
    """'the action data.a + 1 created using only the Call approach' —
    hand-built Calls equal stripped Symbolics."""
    manual = BinaryOp("__add__", GetAttr(MetaArg(), "a"), Lit(1))
    via_sym = strip_symbolic(_.a + 1)
    assert repr(manual) == repr(via_sym)
    assert isinstance(via_sym, Call)


def test_symbolic_strips_to_call():
    sym = _.hp.mean()
    call = strip_symbolic(sym)
    assert isinstance(call, Call) and not isinstance(call, Symbolic)


# -- 'Caveats' ---------------------------------------------------------------

def test_caveat_and_raises():
    """'they can't work with Python methods that are required to return
    booleans' — `_ and 1` must raise, steering to & | ~."""
    with pytest.raises(TypeError, match="truth value"):
        _ and 1


def test_caveat_contains_raises():
    """'One case where this uniquely bites Symbolics is __contains__,
    but siuba is careful to raise an error.'"""
    with pytest.raises(TypeError, match="isin"):
        1 in _


def test_caveat_lambda_fallback_in_filter(spark):
    """'In these cases you can switch back to a lambda' — the lambda
    escape is available in every expression slot."""
    t = data_frame(spark, x=[1, 2, 3])
    out = t >> filter(lambda d: d.x >= 2) >> collect()
    assert sorted(out.x.tolist()) == [2, 3]
