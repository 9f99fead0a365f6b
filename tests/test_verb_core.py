"""Per-verb tests for select/rename/mutate/transmute/filter/arrange/
distinct/head/top_n (reference model: siuba/tests/test_verb_*.py —
small literal frames, one behavior per test)."""

import pandas as pd
import pytest

from siuba_spark import (
    _, select, rename, mutate, transmute, filter, arrange, distinct, head,
    top_n, group_by, ungroup, collect, if_else, case_when, desc,
    TranslationError,
)
from .helpers import data_frame, assert_equal_query

DATA = dict(a=[1, 2, 3], b=[9, 8, 7], c=["x", "y", "z"])


# ---- select / rename ------------------------------------------------------

def test_select_names(spark):
    t = data_frame(spark, **DATA)
    assert (t >> select(_.a, _.c)).columns == ["a", "c"]


def test_select_drop(spark):
    t = data_frame(spark, **DATA)
    assert (t >> select(-_.b)).columns == ["a", "c"]
    assert (t >> select(~_.b)).columns == ["a", "c"]


def test_select_rename_kwarg(spark):
    t = data_frame(spark, **DATA)
    out = t >> select(_.a, z=_.c)
    assert out.columns == ["a", "z"]


def test_select_slice_and_predicates(spark):
    t = data_frame(spark, aa=[1], ab=[2], ba=[3])
    assert (t >> select(_.startswith("a"))).columns == ["aa", "ab"]
    assert (t >> select(_.endswith("a"))).columns == ["aa", "ba"]
    assert (t >> select(_["aa":"ab"])).columns == ["aa", "ab"]


def test_select_keeps_group_cols(spark):
    t = data_frame(spark, **DATA) >> group_by(_.c)
    out = t >> select(_.a)
    assert out.columns == ["c", "a"]
    assert out.group_by == ("c",)


def test_rename(spark):
    t = data_frame(spark, **DATA)
    out = t >> rename(z=_.a)
    assert "z" in out.columns and "a" not in out.columns


# ---- mutate / transmute ---------------------------------------------------

def test_mutate_sequential_refs(spark):
    t = data_frame(spark, a=[1, 2])
    out = t >> mutate(b=_.a + 1, c=_.b * 10)
    assert_equal_query(out, pd.DataFrame(dict(a=[1, 2], b=[2, 3], c=[20, 30])))


def test_mutate_overwrite(spark):
    t = data_frame(spark, a=[1, 2])
    assert_equal_query(t >> mutate(a=_.a * 2), pd.DataFrame(dict(a=[2, 4])))


def test_grouped_mutate_broadcast(spark):
    t = data_frame(spark, g=["a", "a", "b"], x=[1.0, 3.0, 10.0])
    out = t >> group_by(_.g) >> mutate(m=_.x.mean()) >> ungroup()
    assert_equal_query(out, pd.DataFrame(dict(
        g=["a", "a", "b"], x=[1.0, 3.0, 10.0], m=[2.0, 2.0, 10.0])))


def test_transmute(spark):
    t = data_frame(spark, **DATA)
    out = t >> transmute(d=_.a + _.b)
    assert out.columns == ["d"]


def test_transmute_keeps_groups(spark):
    t = data_frame(spark, **DATA) >> group_by(_.c)
    assert (t >> transmute(d=_.a)).columns == ["c", "d"]


# ---- filter ---------------------------------------------------------------

def test_filter_multiple_conds_anded(spark):
    t = data_frame(spark, **DATA)
    out = t >> filter(_.a > 1, _.b > 7)
    assert_equal_query(out, pd.DataFrame(dict(a=[2], b=[8], c=["y"])))


def test_grouped_filter_agg_cond(spark):
    t = data_frame(spark, g=["a", "a", "b", "b"], x=[1, 3, 5, 7])
    out = t >> group_by(_.g) >> filter(_.x > _.x.mean())
    assert_equal_query(out, pd.DataFrame(dict(g=["a", "b"], x=[3, 7])))


def test_filter_window_cond_uses_input_table(spark):
    # all conditions evaluate against the input, not sequentially
    t = data_frame(spark, g=["a", "a", "a"], x=[1, 2, 9])
    out = t >> group_by(_.g) >> filter(_.x < 5, _.x > _.x.mean())
    # mean is 4 (over all three rows, incl x=9): keep nothing <5 and >4
    assert len(out.df.collect()) == 0


# ---- arrange --------------------------------------------------------------

def test_arrange_asc_desc(spark):
    t = data_frame(spark, a=[2, 1, 3], b=[1, 2, 3])
    out = t >> arrange(-_.a) >> collect()
    assert list(out.a) == [3, 2, 1]
    out2 = t >> arrange(desc(_.a)) >> collect()
    assert list(out2.a) == [3, 2, 1]


def test_arrange_nulls_last(spark):
    t = data_frame(spark, a=[2.0, None, 1.0])
    out = t >> arrange(_.a) >> collect()
    assert list(out.a[:2]) == [1.0, 2.0] and pd.isna(out.a.iloc[2])
    out2 = t >> arrange(-_.a) >> collect()
    assert list(out2.a[:2]) == [2.0, 1.0] and pd.isna(out2.a.iloc[2])


def test_arrange_feeds_window_order(spark):
    t = data_frame(spark, x=[3, 1, 2])
    out = t >> arrange(_.x) >> mutate(cs=_.x.cumsum())
    got = out.df.toPandas().sort_values("x")
    assert list(got.cs) == [1, 3, 6]


def test_arrange_expression(spark):
    t = data_frame(spark, a=[-3, 1, 2])
    out = t >> arrange(_.a.abs()) >> collect()
    assert list(out.a) == [1, 2, -3]


# ---- distinct / head / top_n ---------------------------------------------

def test_distinct_all(spark):
    t = data_frame(spark, a=[1, 1, 2], b=["x", "x", "y"])
    assert len((t >> distinct()).df.collect()) == 2


def test_distinct_cols(spark):
    t = data_frame(spark, a=[1, 1, 2], b=["x", "y", "y"])
    out = t >> distinct(_.a)
    assert out.columns == ["a"]
    assert len(out.df.collect()) == 2


def test_distinct_computed(spark):
    t = data_frame(spark, a=[1, 2, 3])
    out = t >> distinct(parity=_.a % 2)
    assert_equal_query(out, pd.DataFrame(dict(parity=[0, 1])))


def test_head(spark):
    t = data_frame(spark, a=list(range(10)))
    assert len((t >> head(3)).df.collect()) == 3


def test_top_n_ties_kept(spark):
    t = data_frame(spark, g=["a"] * 4, x=[1, 3, 3, 2])
    out = t >> top_n(1, _.x)
    assert sorted(r.x for r in out.df.collect()) == [3, 3]


def test_top_n_negative_bottom(spark):
    t = data_frame(spark, x=[5, 1, 3])
    out = t >> top_n(-1, _.x)
    assert [r.x for r in out.df.collect()] == [1]


# ---- conditionals ---------------------------------------------------------

def test_if_else_na_condition_is_false(spark):
    # reference: siuba/dply/verbs.py:1085 — NA cond → false branch
    t = data_frame(spark, a=[1.0, None, 3.0])
    out = t >> mutate(r=if_else(_.a > 2, "big", "small"))
    got = out.df.toPandas().sort_values("a", na_position="first")
    assert list(got.r) == ["small", "small", "big"]


def test_case_when_first_match_wins(spark):
    t = data_frame(spark, a=[1, 5, 50])
    out = t >> mutate(band=case_when({_.a < 3: "lo", _.a < 10: "mid", True: "hi"}))
    got = out.df.toPandas().sort_values("a")
    assert list(got.band) == ["lo", "mid", "hi"]


# ---- errors ---------------------------------------------------------------

def test_unknown_method_errors_at_translation(spark):
    t = data_frame(spark, a=[1])
    with pytest.raises(TranslationError):
        t >> mutate(x=_.a.frobnicate())


def test_symbolic_has_no_truth_value(spark):
    with pytest.raises(TypeError):
        bool(_.a > 1)


def test_show_query_prints_plan_and_passes_through(spark, capsys):
    from siuba_spark import show_query
    t = data_frame(spark, a=[1, 2, 3])
    out = t >> mutate(b=_.a + 1) >> show_query()
    captured = capsys.readouterr().out
    # the analyzed logical plan (SQL-analogue) AND the physical plan
    assert "Analyzed Logical Plan" in captured
    assert "Project" in captured
    assert "Physical Plan" in captured
    assert out.df.count() == 3  # pipe keeps flowing (reference returns tbl)


def test_pipe_arbitrary_callable(spark):
    from siuba_spark import pipe
    t = data_frame(spark, a=[1, 2, 3])
    out = t >> pipe(lambda tb: tb.evolve(df=tb.df.limit(2)))
    assert out.df.count() == 2


def test_filter_across_if_all(spark):
    """filter(across(...)) = dplyr if_all: every per-column cond holds."""
    from siuba_spark import Fx, across, filter as sfilter
    t = data_frame(spark, x=[1.0, -1.0, 2.0], y=[5.0, 6.0, -7.0])
    out = t >> sfilter(across(_[_.x, _.y], Fx > 0))
    assert [(r.x, r.y) for r in out.df.collect()] == [(1.0, 5.0)]


def test_if_any_if_all(spark):
    """dplyr if_any/if_all: an Fx predicate over a tidyselection,
    OR/AND-chained into one condition (filter and mutate contexts)."""
    from siuba_spark import Fx, if_all, if_any

    t = data_frame(spark, a=[1.0, None, 3.0], b=[None, None, 6.0],
                   g=["x", "y", "z"])
    any_na = (t >> filter(if_any(_[_.a, _.b], Fx.isna()))).df
    assert sorted(r.g for r in any_na.collect()) == ["x", "y"]
    all_na = (t >> filter(if_all(_[_.a, _.b], Fx.isna()))).df
    assert [r.g for r in all_na.collect()] == ["y"]
    flagged = (t >> mutate(ok=if_all(_[_.a, _.b], Fx.notna()))).df
    assert [r.ok for r in flagged.orderBy("g").collect()] == [False, False, True]


def test_rename_with_and_relocate(spark):
    """dplyr rename_with/relocate (absent from reference): metadata-only
    projection changes."""
    import pytest

    from siuba_spark import TranslationError, relocate, rename_with

    t = data_frame(spark, ab=[1], cd=[2], ef=[3])
    up = (t >> rename_with(str.upper)).df
    assert up.columns == ["AB", "CD", "EF"]
    part = (t >> rename_with(lambda c: c + "_x", _.startswith("a"))).df
    assert part.columns == ["ab_x", "cd", "ef"]
    with pytest.raises(TranslationError, match="duplicate"):
        t >> rename_with(lambda c: "same")

    front = (t >> relocate(_.ef)).df
    assert front.columns == ["ef", "ab", "cd"]
    before = (t >> relocate(_.ef, _before=_.cd)).df
    assert before.columns == ["ab", "ef", "cd"]
    after = (t >> relocate(_.ab, _after=_.cd)).df
    assert after.columns == ["cd", "ab", "ef"]
    with pytest.raises(TranslationError, match="only one"):
        t >> relocate(_.ab, _before=_.cd, _after=_.cd)
    # grouping keys follow renames
    g = (t >> group_by(_.ab) >> rename_with(str.upper))
    assert g.group_by == ("AB",)
    # dplyr renames SIMULTANEOUSLY: chained maps (ab->cd, cd->ef0) are
    # legal — they must not cascade into duplicate columns
    chain = (t >> rename_with(
        lambda c: {"ab": "cd", "cd": "ef0"}.get(c, c))).df
    assert chain.columns == ["cd", "ef0", "ef"]
    # swap via rename() is legal too
    from siuba_spark import rename
    swapped = (t >> rename(cd=_.ab, ab=_.cd)).df
    assert swapped.columns == ["cd", "ab", "ef"]
    assert swapped.collect()[0].cd == 1  # old ab value travels with alias


def test_by_per_operation_grouping(spark):
    """dplyr 1.1 .by= (spelled _by=): temporary grouping for one verb;
    result keeps the table's grouped state; combining with group_by
    raises (dplyr's rule)."""
    import pytest

    from siuba_spark import TranslationError, summarize

    t = data_frame(spark, g=["a", "a", "b"], x=[1.0, 3.0, 2.0])
    m = (t >> mutate(dev=_.x - _.x.mean(), _by="g")).df.orderBy("g", "x").collect()
    assert [r.dev for r in m] == [-1.0, 1.0, 0.0]
    s = (t >> summarize(m=_.x.mean(), _by=_.g)).df.orderBy("g").collect()
    assert [(r.g, r.m) for r in s] == [("a", 2.0), ("b", 2.0)]
    f = (t >> filter(_.x > _.x.mean(), _by="g")).df.collect()
    assert [r.x for r in f] == [3.0]
    # result of _by= mutate is ungrouped (original state)
    assert (t >> mutate(dev=_.x - _.x.mean(), _by="g")).group_by == ()
    with pytest.raises(TranslationError, match="_by"):
        t >> group_by(_.g) >> mutate(d=_.x, _by="g")


def test_distinct_keep_all_honors_arrange_order(spark):
    """distinct(cols, _keep_all=True) after arrange keeps the FIRST row
    per key in arrange order (pandas drop_duplicates keep="first"; the
    reference SQL engine raises NotImplementedError here)."""
    t = data_frame(spark, g=["a", "a", "b", "b"], x=[2, 1, 9, 3],
                   tag=["hi", "lo", "hi", "lo"])
    out = (t >> arrange(_.x) >> distinct(_.g, _keep_all=True)
           >> collect()).sort_values("g").reset_index(drop=True)
    assert out.x.tolist() == [1, 3]        # lowest-x row survives per g
    assert out.tag.tolist() == ["lo", "lo"]
    out2 = (t >> arrange(-_.x) >> distinct(_.g, _keep_all=True)
            >> collect()).sort_values("g").reset_index(drop=True)
    assert out2.x.tolist() == [2, 9]


def test_stale_order_state_skips_sort_at_collect(spark):
    """Deferred arrange: order state referencing a column that a later
    summarize dropped must not break materialization — the sort is
    skipped (SQL's order-undefined-after-aggregation contract), and a
    FRESH arrange on the aggregate re-enables ordering."""
    from siuba_spark import summarize
    t = data_frame(spark, g=["a", "b", "a"], x=[3, 1, 2])
    out = (t >> arrange(_.x) >> group_by(_.g)
           >> summarize(s=_.x.sum()) >> collect())
    assert sorted(out.s.tolist()) == [1, 5]     # materializes fine
    out2 = (t >> arrange(_.x) >> group_by(_.g)
            >> summarize(s=_.x.sum()) >> arrange(-_.s, _.g) >> collect())
    assert out2.g.tolist() == ["a", "b"] and out2.s.tolist() == [5, 1]


def test_rearrange_replaces_order_state(spark):
    t = data_frame(spark, a=[1, 2, 3], b=[30, 10, 20])
    out = t >> arrange(_.a) >> arrange(_.b) >> collect()
    assert out.a.tolist() == [2, 3, 1]


def test_mutate_overwrite_then_reuse_aggregate(spark):
    """WPool invalidation: after a kwarg OVERWRITES a column, a later
    kwarg's identical-looking window aggregate must recompute against the
    NEW values (sequential-kwarg semantics), not reuse the pooled result
    computed on the old column."""
    t = data_frame(spark, g=["a", "a", "b"], x=[1.0, 3.0, 10.0])
    out = (t >> group_by(_.g)
           >> mutate(x=_.x.mean(), y=_.x - _.x.mean())
           >> ungroup() >> collect())
    # x becomes the group mean; y = new_x - mean(new_x) = 0 everywhere
    assert sorted(out.x.tolist()) == [2.0, 2.0, 10.0]
    assert out.y.tolist() == [0.0, 0.0, 0.0]


def test_stale_order_state_warns_at_collect(spark):
    """Two halves of the deferred-arrange materialization contract
    (ADVICE r7 item 3):

    1. A sort key dropped by a later select/rename still ORDERS the
       output — Spark's ResolveMissingReferences recovers the column
       from the child plan, matching dplyr's arrange-then-select row
       order (better than skipping).
    2. When the order state genuinely cannot resolve (degenerate state:
       the frame was swapped under the ledger), the discard is audible
       as a UserWarning, never silent."""
    import warnings

    from siuba_spark import rename, select
    t = data_frame(spark, g=["a", "b", "c"], x=[3, 1, 2])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out = t >> arrange(_.x) >> select(_.g) >> collect()
        assert out.g.tolist() == ["b", "c", "a"]     # sort survived the drop
        ren = t >> arrange(_.x) >> rename(z=_.x) >> select(_.g) >> collect()
        assert ren.g.tolist() == ["b", "c", "a"]     # ...and the rename
    # genuinely unresolvable: order state points at a column no plan
    # below the sort can supply
    arranged = t >> arrange(_.x)
    stale = arranged.evolve(df=spark.createDataFrame([("u",)], "other string"))
    with pytest.warns(UserWarning, match="arrange order discarded"):
        got = stale.ordered_df().collect()
    assert [r.other for r in got] == ["u"]
