"""The reference's Quickstart tutorial (docs/intro.Rmd) run end-to-end on
this engine — the drop-in-parity proof for a real siuba user: the SAME
pipes, the SAME bundled mtcars dataset, checked against the values the
tutorial prints.

The reference's SQL section (LazyTbl over sqlite) needs no porting: every
siuba_spark table IS a lazy plan, so the in-memory and "SQL" halves of the
tutorial are one and the same pipeline here.  The plotnine section is
display-only and out of scope.
"""

import pytest

from siuba_spark import _, filter, group_by, mutate, summarize
from siuba_spark.data import mtcars


def _rows(tbl):
    return [r.asDict() for r in tbl.df.collect()]


def test_intro_group_by_summarize(spark):
    # (mtcars >> group_by(_.cyl) >> summarize(avg_hp = _.hp.mean()))
    out = {r["cyl"]: r["avg_hp"]
           for r in _rows(mtcars >> group_by(_.cyl)
                          >> summarize(avg_hp=_.hp.mean()))}
    # the classic mtcars means the tutorial prints
    assert out[4] == pytest.approx(82.63636, abs=1e-4)
    assert out[6] == pytest.approx(122.28571, abs=1e-4)
    assert out[8] == pytest.approx(209.21429, abs=1e-4)


def test_intro_filter_lowest_hp_per_group(spark):
    # g_cyl = group_by(mtcars, _.cyl); g_cyl >> filter(_.hp == _.hp.min())
    g_cyl = mtcars >> group_by(_.cyl)
    kept = _rows(g_cyl >> filter(_.hp == _.hp.min()))
    by_cyl = {}
    for r in kept:
        by_cyl.setdefault(r["cyl"], set()).add(r["hp"])
    # per-group minima of the classic dataset: 4cyl=52 (Honda Civic),
    # 6cyl=105 (Valiant), 8cyl=150
    assert by_cyl == {4: {52.0}, 6: {105.0}, 8: {150.0}}
    # 8cyl has a 150-hp tie (Dodge Challenger & AMC Javelin): grouped
    # filter keeps ALL rows matching the group min
    assert sum(1 for r in kept if r["cyl"] == 8) == 2


def test_intro_grouped_mutate_demeaned(spark):
    # (mtcars >> group_by(_.cyl) >> mutate(demeaned = _.hp - _.hp.mean()))
    out = _rows(mtcars >> group_by(_.cyl)
                >> mutate(demeaned=_.hp - _.hp.mean()))
    # tables in, tables out: every input row survives with the new column
    assert len(out) == 32
    means = {4: 82.63636363636364, 6: 122.28571428571429, 8: 209.21428571428572}
    for r in out:
        assert r["demeaned"] == pytest.approx(r["hp"] - means[r["cyl"]], abs=1e-6)
    # grouped means re-demean to ~0 per group
    for cyl in (4, 6, 8):
        vals = [r["demeaned"] for r in out if r["cyl"] == cyl]
        assert sum(vals) == pytest.approx(0.0, abs=1e-6)


def test_intro_mutate_hp_per_cyl(spark):
    # the plotnine section's data step: mutate(hp_per_cyl = _.hp / _.cyl)
    out = _rows(mtcars >> mutate(hp_per_cyl=_.hp / _.cyl))
    for r in out:
        assert r["hp_per_cyl"] == pytest.approx(r["hp"] / r["cyl"])
