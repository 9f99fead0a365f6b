"""The reference's arrange tutorial (docs/api_table_core/02_arrange.Rmd)
plus the forcats docstring examples (siuba/dply/forcats.py:156-430) run
end-to-end on this engine.

The tutorial's categorical sections are the first doc-level exercise of
the round-6 factor ledger: a pandas Categorical's level order maps to
``.cat.set_categories`` / a recorded forcats order, and ``arrange``
follows it — including after ``fct_rev`` — exactly as the tutorial shows.
"""

import pandas as pd
import pytest

from siuba_spark import (
    _, arrange, collect, fct_collapse, fct_lump, fct_recode, fct_reorder,
    fct_rev, head, mutate, select,
)
from siuba_spark.data import mtcars
from tests.helpers import data_frame


@pytest.fixture(scope="module")
def small_mtcars():
    return mtcars >> select(_.cyl, _.mpg, _.hp)


@pytest.fixture(scope="module")
def pdf(small_mtcars):
    return small_mtcars >> collect()


def test_arrange_single_variable(small_mtcars, pdf):
    got = (small_mtcars >> arrange(_.hp) >> collect()).hp.tolist()
    assert got == sorted(pdf.hp)
    assert got[0] == 52          # Honda Civic, the tutorial's first row
    desc = (small_mtcars >> arrange(-_.hp) >> collect()).hp.tolist()
    assert desc == sorted(pdf.hp, reverse=True)
    assert desc[0] == 335        # Maserati Bora


def test_arrange_multiple_variables(small_mtcars, pdf):
    got = (small_mtcars >> arrange(_.cyl, _.mpg) >> collect())
    want = pdf.sort_values(["cyl", "mpg"])
    assert got.cyl.tolist() == want.cyl.tolist()
    assert got.mpg.tolist() == want.mpg.tolist()
    got2 = (small_mtcars >> arrange(_.cyl, -_.mpg) >> collect())
    want2 = pdf.sort_values(["cyl", "mpg"], ascending=[True, False])
    assert got2.mpg.tolist() == want2.mpg.tolist()
    # cyl=4 block leads with the overall best mpg (Toyota Corolla)
    assert got2.mpg.iloc[0] == 33.9


def test_arrange_expression(small_mtcars, pdf):
    got = (small_mtcars >> arrange(_.hp / _.cyl) >> collect())
    want = pdf.assign(k=pdf.hp / pdf.cyl).sort_values("k")
    assert (got.hp / got.cyl).tolist() == want.k.tolist()


def test_arrange_categorical_series(spark):
    # pd.Categorical(["c","b","a"]): values c..a but LEVELS are the sorted
    # uniques a..c — arrange follows the levels, not the strings' order of
    # appearance.  Dynamic-level analogue: declare the sorted uniques.
    t = (data_frame(spark, x_cat=["c", "b", "a"])
         >> mutate(x_cat=_.x_cat.cat.set_categories(["a", "b", "c"])))
    assert (t >> arrange(_.x_cat) >> collect()).x_cat.tolist() \
        == ["a", "b", "c"]
    # "if we reorder the categories, the arrange will follow"
    rev = t >> mutate(rev_x_cat=fct_rev(_.x_cat))
    assert rev.factors["rev_x_cat"].levels == ("c", "b", "a")
    assert (rev >> arrange(_.rev_x_cat) >> collect()).rev_x_cat.tolist() \
        == ["c", "b", "a"]


def test_fct_reorder_docstring(spark):
    # fct_reorder(['a','a','b'], [4,3,2]) -> Categories ['b', 'a']
    t = data_frame(spark, f=["a", "a", "b"], x=[4.0, 3.0, 2.0])
    assert (t >> mutate(g=fct_reorder(_.f, _.x))).factors["g"].levels \
        == ("b", "a")
    assert (t >> mutate(g=fct_reorder(_.f, _.x, desc=True))
            ).factors["g"].levels == ("a", "b")
    # fct_reorder(['x','x','y'], [4,0,2], np.max) -> Categories ['y', 'x']
    t2 = data_frame(spark, f=["x", "x", "y"], x=[4.0, 0.0, 2.0])
    assert (t2 >> mutate(g=fct_reorder(_.f, _.x, "max"))
            ).factors["g"].levels == ("y", "x")


def test_fct_recode_docstring(spark):
    # fct_recode(['a','b','c'], z='c') -> values a, b, z
    t = data_frame(spark, f=["a", "b", "c"])
    assert (t >> mutate(r=fct_recode(_.f, z="c")) >> collect()
            ).r.tolist() == ["a", "b", "z"]
    # fct_recode(cat, x=['a','b'])
    assert (t >> mutate(r=fct_recode(_.f, x=["a", "b"])) >> collect()
            ).r.tolist() == ["x", "x", "c"]


def test_fct_collapse_docstring(spark):
    t = data_frame(spark, f=["a", "b", "c"])
    assert (t >> mutate(r=fct_collapse(_.f, {"x": "a"})) >> collect()
            ).r.tolist() == ["x", "b", "c"]
    assert (t >> mutate(r=fct_collapse(_.f, {"x": "a"},
                                       group_other="others")) >> collect()
            ).r.tolist() == ["x", "others", "others"]
    assert (t >> mutate(r=fct_collapse(_.f, {"ab": ["a", "b"]})) >> collect()
            ).r.tolist() == ["ab", "ab", "c"]
    # None stays NaN/NULL
    t2 = data_frame(spark, f=["a", "b", None])
    assert (t2 >> mutate(r=fct_collapse(_.f, {"a": ["b"]})) >> collect()
            ).r.tolist()[:2] == ["a", "a"]


def test_fct_lump_docstring(spark):
    # fct_lump(['a','a','b','c'], n=1) -> ['a','a','Other','Other']
    t = data_frame(spark, f=["a", "a", "b", "c"], i=[0, 1, 2, 3])
    got = (t >> mutate(r=fct_lump(_.f, n=1)) >> arrange(_.i) >> collect())
    assert got.r.tolist() == ["a", "a", "Other", "Other"]
    # fct_lump(['a','a','b','b','c','d'], prop=.2) -> a,a,b,b,Other,Other
    t2 = data_frame(spark, f=["a", "a", "b", "b", "c", "d"],
                    i=[0, 1, 2, 3, 4, 5])
    got2 = (t2 >> mutate(r=fct_lump(_.f, prop=0.2)) >> arrange(_.i)
            >> collect())
    assert got2.r.tolist() == ["a", "a", "b", "b", "Other", "Other"]
