"""The reference's joins tutorial page (docs/api_table_two/joins.Rmd)
plus the analysis guide's custom-function section
(docs/guide_analysis.Rmd, 'Custom functions') run on this engine."""

import pandas as pd
import pytest

from siuba_spark import (
    _, anti_join, collect, full_join, inner_join, left_join, mutate,
    semi_join, symbolic_dispatch, tbl,
)


@pytest.fixture()
def frames(spark):
    df1 = tbl(spark.createDataFrame([(1, "a"), (2, "b")], "id long, x string"))
    df2 = tbl(spark.createDataFrame([(2, "l"), (2, "m"), (3, "n")],
                                    "id long, y string"))
    return df1, df2


def _rows(t, *cols):
    pdf = t >> collect()
    return sorted(map(tuple, pdf[list(cols)].itertuples(index=False)))


def test_inner_join_call_and_pipe(frames):
    """Both spellings from the page: inner_join(df1, df2, on=...) and
    the piped df1 >> inner_join(_, df2, on=...)."""
    df1, df2 = frames
    direct = inner_join(df1, df2, on="id")
    assert _rows(direct, "id", "x", "y") == \
        [(2, "b", "l"), (2, "b", "m")]
    piped = df1 >> inner_join(_, df2, on="id")
    assert _rows(piped, "id", "x", "y") == _rows(direct, "id", "x", "y")


def test_left_and_full_join(frames):
    df1, df2 = frames
    left = left_join(df1, df2, on="id") >> collect()
    assert len(left) == 3                       # id=1 survives with NULL y
    assert left[left.id == 1].y.isna().all()
    full = full_join(df1, df2, on="id") >> collect()
    assert sorted(full.id.tolist()) == [1, 2, 2, 3]
    assert full[full.id == 3].x.isna().all()


def test_semi_and_anti_join(frames):
    """The page's semi_join — and the anti_join its own TODO never
    implemented (reference joins.Rmd: '# TODO: implement')."""
    df1, df2 = frames
    assert _rows(semi_join(df1, df2, on="id"), "id", "x") == [(2, "b")]
    assert _rows(anti_join(df1, df2, on="id"), "id", "x") == [(1, "a")]


def test_custom_function_composes_in_expressions(spark):
    """guide_analysis 'Custom functions': a symbolic_dispatch function's
    result is a Symbolic that composes in complex expressions —
    ``add(_.x, _.y) + 100`` inside mutate."""
    @symbolic_dispatch
    def add(x, y):
        return x + y

    t = tbl(spark.createDataFrame([(1, 4), (2, 5), (3, 6)],
                                  "x long, y long"))
    out = t >> mutate(res=add(_.x, _.y) + 100) >> collect()
    assert sorted(out.res.tolist()) == [105, 107, 109]
    # call-with-data duality still holds
    assert add(2, 3) == 5
