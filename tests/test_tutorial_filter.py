"""The reference's filter / mutate / summarize / group_by tutorial pages
(docs/api_table_core/01_filter.Rmd, 05_mutate.Rmd, 07_summarize.Rmd,
08_group_by.Rmd) run end-to-end on this engine against a pandas replay
of each page's mtcars examples.

The filter page states three rules the engine must honor:

* a row is kept only when EVERY condition is true;
* a condition evaluating to NA drops the row (never errors);
* plain functions (lambdas) work alongside siu expressions.
"""

import pandas as pd
import pytest

from siuba_spark import (
    _, arrange, collect, filter, group_by, lag, mutate, row_number, select,
    summarize, ungroup,
)
from siuba_spark.data import mtcars
from tests.helpers import data_frame


@pytest.fixture(scope="module")
def pdf():
    return mtcars >> collect()


# -- 01_filter.Rmd -----------------------------------------------------------

def test_filter_multiple_conditions_are_anded(pdf):
    got = mtcars >> filter(_.cyl == 4, _.gear == 5) >> collect()
    want = pdf[(pdf.cyl == 4) & (pdf.gear == 5)]
    assert len(got) == len(want) == 2
    assert sorted(got.hp.tolist()) == sorted(want.hp.tolist())


def test_filter_or_conditions(pdf):
    got = mtcars >> filter((_.cyl == 4) | (_.gear == 5)) >> collect()
    want = pdf[(pdf.cyl == 4) | (pdf.gear == 5)]
    assert len(got) == len(want)
    assert sorted(got.mpg.tolist()) == sorted(want.mpg.tolist())


def test_filter_drops_na_conditions(spark):
    """'it does not keep a row when a condition results in NA values' —
    the page's df = {x: [True, False, None]} example keeps ONE row."""
    t = data_frame(spark, x=[True, False, None])
    got = t >> filter(_.x) >> collect()
    assert got.x.tolist() == [True]


def test_filter_accepts_lambdas(pdf):
    """'both these forms work' — the lambda escape hatch runs the plain
    function against the table (the engine's py_func/RawCallable path
    would leave the JVM; a lambda over the symbolic frame stays in)."""
    got = (mtcars
           >> filter(lambda d: d.cyl == 4, lambda d: d.gear == 5)
           >> collect())
    want = pdf[(pdf.cyl == 4) & (pdf.gear == 5)]
    assert len(got) == len(want) == 2


def test_grouped_filter_median(pdf):
    """'keep rows where hp is above the median hp for each cyl group'."""
    got = (mtcars >> group_by(_.cyl) >> filter(_.hp > _.hp.median())
           >> ungroup() >> collect())
    med = pdf.groupby("cyl").hp.transform("median")
    want = pdf[pdf.hp > med]
    assert len(got) == len(want)
    assert sorted(got.hp.tolist()) == sorted(want.hp.tolist())


def test_filter_row_number_two_lowest_hp_per_cyl(pdf):
    """'filter to keep the two lowest hp cars per group' — row_number
    over the arrange state; 3 cyl groups -> 6 rows."""
    got = (mtcars >> arrange(_.hp) >> group_by(_.cyl)
           >> filter(row_number(_) <= 2) >> ungroup() >> collect())
    assert len(got) == 6
    want = (pdf.sort_values("hp").groupby("cyl").head(2))
    assert sorted(got.hp.tolist()) == sorted(want.hp.tolist())


def test_filter_lag_shift_comparison(pdf):
    """'keep rows where hp increases by 50 over the previous row' after
    an ascending sort."""
    got = (mtcars >> arrange(_.hp) >> filter(_.hp - lag(_.hp) > 50)
           >> collect())
    s = pdf.sort_values("hp").hp
    want = s[(s - s.shift(1)) > 50]
    assert sorted(got.hp.tolist()) == sorted(want.tolist())


# -- 05_mutate.Rmd -----------------------------------------------------------

def test_mutate_assign_and_chain(pdf):
    small = mtcars >> select(_.mpg, _.cyl, _.hp)
    got = small >> mutate(cyl2=_.cyl * 2, cyl4=_.cyl2 * 2) >> collect()
    assert (got.cyl2 == got.cyl * 2).all()
    assert (got.cyl4 == got.cyl * 4).all()        # kwargs see earlier kwargs
    lit = small >> mutate(misc="hey") >> collect()
    assert (lit.misc == "hey").all()


def test_mutate_grouped_demean(pdf):
    got = (mtcars >> select(_.mpg, _.cyl, _.hp) >> group_by(_.cyl)
           >> mutate(hp_mean=_.hp.mean(), demeaned_hp=_.hp - _.hp_mean)
           >> ungroup() >> collect())
    want_mean = pdf.groupby("cyl").hp.transform("mean")
    merged = got.sort_values(["cyl", "hp"]).reset_index(drop=True)
    want = (pdf.assign(m=want_mean, d=pdf.hp - want_mean)
            .sort_values(["cyl", "hp"]).reset_index(drop=True))
    assert merged.hp_mean.round(6).tolist() == want.m.round(6).tolist()
    assert merged.demeaned_hp.round(6).tolist() == want.d.round(6).tolist()


def test_mutate_grouped_shift(pdf):
    """hp_per_cyl diff vs the previous row WITHIN the cyl group — shift
    needs an explicit order on a distributed table, so the tutorial's
    example gains an arrange."""
    got = (mtcars >> select(_.mpg, _.cyl, _.hp) >> arrange(_.hp)
           >> group_by(_.cyl)
           >> mutate(hp_per_cyl=_.hp / _.cyl,
                     diff=_.hp_per_cyl - _.hp_per_cyl.shift(1))
           >> ungroup() >> collect())
    w = pdf.sort_values("hp").assign(hpc=lambda d: d.hp / d.cyl)
    w["diff"] = w.hpc - w.groupby("cyl").hpc.shift(1)
    a = got.sort_values(["cyl", "hp"])["diff"].fillna(-1).round(6).tolist()
    b = w.sort_values(["cyl", "hp"])["diff"].fillna(-1).round(6).tolist()
    assert a == b


# -- 07_summarize.Rmd --------------------------------------------------------

def test_summarize_over_everything(pdf):
    got = mtcars >> summarize(avg_mpg=_.mpg.mean()) >> collect()
    assert len(got) == 1
    assert got.avg_mpg[0] == pytest.approx(pdf.mpg.mean(), abs=1e-9)


def test_summarize_per_group_and_literal(pdf):
    got = (mtcars >> group_by(_.cyl)
           >> summarize(measure="mean miles per gallon",
                        value=_.mpg.mean())
           >> collect()).sort_values("cyl").reset_index(drop=True)
    want = pdf.groupby("cyl").mpg.mean()
    assert len(got) == 3
    assert (got.measure == "mean miles per gallon").all()
    assert got.value.round(5).tolist() == want.round(5).tolist()


# -- 08_group_by.Rmd ---------------------------------------------------------

def test_group_by_drives_filter_mutate_summarize(pdf):
    g = mtcars >> select(_.cyl, _.gear, _.hp) >> group_by(_.cyl)
    mean_hp = pdf.groupby("cyl").hp.transform("mean")
    f = g >> filter(_.hp > _.hp.mean()) >> ungroup() >> collect()
    assert len(f) == len(pdf[pdf.hp > mean_hp])
    m = g >> mutate(avg_hp=_.hp.mean()) >> ungroup() >> collect()
    assert m.avg_hp.nunique() == 3
    s = g >> summarize(avg_hp=_.hp.mean()) >> collect()
    assert len(s) == 3


def test_group_by_multiple_and_computed(pdf):
    multi = (mtcars >> select(_.cyl, _.gear, _.hp)
             >> group_by(_.cyl, _.gear)
             >> summarize(n_rows=_.hp.size()) >> collect())
    want = pdf.groupby(["cyl", "gear"]).size()
    assert len(multi) == len(want)
    # 'defining a new column for grouping': group_by(high_hp = _.hp > 300)
    hi = (mtcars >> group_by(high_hp=_.hp > 300)
          >> summarize(n_rows=_.hp.size()) >> collect())
    assert dict(zip(hi.high_hp, hi.n_rows)) == \
        {True: int((pdf.hp > 300).sum()), False: int((pdf.hp <= 300).sum())}


def test_ungroup_clears_groups():
    g = mtcars >> group_by(_.cyl)
    assert g.group_by == ("cyl",)
    assert (g >> ungroup()).group_by == ()
