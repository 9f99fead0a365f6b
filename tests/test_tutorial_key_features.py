"""Port of the reference key-features guide (docs/key_features.ipynb).

Every code cell with query semantics re-runs against this engine with a
value oracle; the pandas-mechanics cells (assign/loc comparisons, timing
of fast_filter vs dplython) port as the equivalent verb pipelines.
docs/examples.ipynb carries no code cells (markdown gallery only) — noted
in COVERAGE.md.
"""

import pandas as pd
import pytest

from siuba_spark import (
    _, arrange, collect, filter, group_by, mutate, show_query, summarize,
    tbl, unnest,
)
from siuba_spark.siu import op_vars, strip_symbolic


@pytest.fixture()
def my_data(spark):
    return tbl(spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "g string, x long"))


def test_mutate_with_aggregate_broadcasts(my_data):
    # cell 2: mutate(my_data, avg = _.x.mean()) — ungrouped agg becomes a
    # full-frame window (pandas .assign(avg=lambda d: d.x.mean()))
    out = my_data >> mutate(avg=_.x.mean()) >> collect()
    assert out.avg.tolist() == [2.0, 2.0, 2.0]


def test_pipe_mutate_filter(my_data):
    # cell 3: assign + loc filter == mutate + filter
    out = (my_data >> mutate(avg=_.x.mean()) >> filter(_.x != 3)
           >> collect())
    assert sorted(out.x.tolist()) == [1, 2]


def test_pipe_mutate_arrange_desc(my_data):
    # cell 4: my_data >> mutate(y = _.x + 1) >> arrange(_.g, -_.x)
    out = (my_data >> mutate(y=_.x + 1) >> arrange(_.g, -_.x)
           >> collect())
    assert out.y.tolist() == [3, 2, 4]
    assert out.g.tolist() == ["a", "a", "b"]


def test_sequential_kwargs_see_prior_columns(spark):
    # cell 5: mutate(b = _.a + 1, c = _.b + 2) — c reads the b just made
    t = tbl(spark.createDataFrame([(1,), (2,), (3,)], "a long"))
    out = t >> mutate(b=_.a + 1, c=_.b + 2) >> collect()
    assert out.c.tolist() == [4, 5, 6]


def test_summarize_replaces_reset_index(spark):
    # cells 6-8: grouped two-column mean without index juggling
    t = tbl(spark.createDataFrame(
        [(4, 100.0, 30.0), (4, 80.0, 34.0), (6, 120.0, 20.0)],
        "cyl long, hp double, mpg double"))
    out = (t >> group_by(_.cyl)
           >> summarize(hp=_.hp.mean(), mpg=_.mpg.mean())
           >> collect()).sort_values("cyl").reset_index(drop=True)
    assert out.hp.tolist() == [90.0, 120.0]
    assert out.mpg.tolist() == [32.0, 20.0]
    # summarize output is a plain ungrouped frame: columns are flat
    assert list(out.columns) == ["cyl", "hp", "mpg"]


def test_unified_api_grouped_vs_ungrouped_mutate(spark):
    # cells 9-10: the SAME expression demeans globally when ungrouped and
    # per-group when grouped — the key unified-API feature
    t = tbl(spark.createDataFrame(
        [(4, 100.0), (4, 80.0), (6, 120.0)], "cyl long, hp double"))
    ungrouped = t >> mutate(demeaned=_.hp - _.hp.mean()) >> collect()
    grouped = (t >> group_by(_.cyl)
               >> mutate(demeaned=_.hp - _.hp.mean()) >> collect())
    assert sorted(ungrouped.demeaned.round(6).tolist()) == [-20.0, 0.0, 20.0]
    assert sorted(grouped.demeaned.round(6).tolist()) == [-10.0, 0.0, 10.0]


def test_fast_filter_is_plain_grouped_filter(spark):
    # cells 11-15: the reference needs a separate fast_filter for grouped
    # filtering at speed; here grouped filter IS the one code path
    # (window-hoisted min, no Python loop)
    import numpy as np
    np.random.seed(123)
    students = pd.DataFrame({
        "student_id": np.repeat(np.arange(200), 10),
        "course_id": np.random.randint(1, 20, 2000),
        "score": np.random.randint(1, 100, 2000),
    })
    t = tbl(spark.createDataFrame(students))
    out = (t >> group_by(_.student_id)
           >> filter(_.score == _.score.min()) >> collect())
    want = students[students.score
                    == students.groupby("student_id").score.transform("min")]
    assert len(out) == len(want)
    assert (out.sort_values(["student_id", "course_id", "score"])
            .reset_index(drop=True)
            .equals(want.sort_values(["student_id", "course_id", "score"])
                    .reset_index(drop=True)))


def test_show_query_on_grouped_mutate(spark, capsys):
    # cell 18: show_query prints the backend plan for a grouped mutate —
    # here the Spark analyzed/physical plan with the demeaning window
    t = tbl(spark.createDataFrame(
        [(4, 100.0), (6, 120.0)], "cyl long, hp double"))
    res = (t >> group_by(_.cyl)
           >> mutate(demeaned=_.hp - _.hp.mean()) >> show_query())
    printed = capsys.readouterr().out
    assert "demeaned" in printed
    # the grouped aggregate lowers to a window partitioned by cyl
    assert "windowspecdefinition(cyl" in printed.replace(" ", "") \
        or "PartitionBy" in printed or "Window" in printed
    # show_query passes the table through (pipe-transparent)
    assert res is not None


def test_siu_ast_and_op_vars():
    # cells 19-20: the AST surface — build, strip, inspect column usage
    sym = _.a.mean() + _["b"]
    call = strip_symbolic(sym)
    assert sorted(call.op_vars(attr_calls=False)) == ["a", "b"]
    assert sorted(op_vars(sym)) == ["a", "b", "mean"]


def test_split_then_unnest(spark):
    # cell 21: str.split into a list column, unnest to one row per tag
    t = tbl(spark.createDataFrame(
        [(1, "a,b,c"), (2, "d,e"), (3, "f")], "id long, tags string"))
    out = (t >> mutate(split_tags=_.tags.str.split(","))
           >> unnest("split_tags") >> collect())
    got = sorted(zip(out.id.tolist(), out.split_tags.tolist()))
    assert got == [(1, "a"), (1, "b"), (1, "c"), (2, "d"), (2, "e"),
                   (3, "f")]
