"""Port of the reference's examples-dplyr-funcs.ipynb — the original
whole-API walking tour (grouped mutate/filter/summarize, transmute,
select-rename, arrange, if_else/case_when, nest/unnest, count, distinct,
joins, spread/gather, Pipeable, and pipe chains) against a Spark tbl.

Adaptations, each deliberate for a lazy engine:
- the notebook's EAGER pandas forms ``if_else(df.repo == ...)`` /
  ``case_when(df, {...})`` evaluate Series outside a verb; a lazy engine
  expresses both inside ``mutate`` (the notebook itself shows the mutate
  spelling in its final pipe cells, which port verbatim);
- ``df.siu_group_by(...)`` pandas-method-injection spellings are the
  pipe operator here.
"""

import pandas as pd
import pytest

from siuba_spark import (
    _, add_count, arrange, case_when, collect, count, distinct, filter,
    gather, group_by, if_else, join, left_join, mutate, nest, rename,
    select, spread, summarize, tbl, transmute, ungroup, unnest, Pipeable,
)


@pytest.fixture(scope="module")
def df(spark):
    return tbl(spark.createDataFrame(
        [("pandas", "pandas-dev", "python", 17800, 1.0),
         ("dplyr", "tidyverse", "R", 2800, 2.0),
         ("ggplot2", "tidyverse", "R", 3500, 3.0),
         ("plotnine", "has2k1", "python", 1450, None)],
        "repo string, owner string, language string, stars long, x double"))


@pytest.fixture(scope="module")
def follow(spark):
    return tbl(spark.createDataFrame(
        [("pandas", "pandas", True), ("dplyr", "dplyr", False),
         ("ggplot2", None, True), ("plotnine", None, False)],
        "repo string, repo2 string, follow boolean"))


def _rows(t, *cols):
    pdf = t >> collect()
    return sorted(map(tuple, pdf[list(cols)].itertuples(index=False)))


def test_grouped_mutate_and_remutate(df):
    # cells 4-6: mutate over a (language, owner) grouping, then a second
    # mutate over the result, then ungroup
    gdf = df >> group_by(_.language, _.owner)
    out = gdf >> mutate(rel_stars1=_.stars - _.stars.min())
    got = out >> ungroup() >> collect()
    by_repo = dict(zip(got.repo, got.rel_stars1))
    # tidyverse/R group has two repos; every other group is singleton 0
    assert by_repo == {"pandas": 0, "dplyr": 0, "ggplot2": 700,
                       "plotnine": 0}
    out2 = out >> mutate(rel_stars2=_.stars + _.stars) >> ungroup()
    got2 = out2 >> collect()
    assert dict(zip(got2.repo, got2.rel_stars2))["dplyr"] == 5600


def test_plain_and_grouped_filter(df):
    # cell 8
    out = df >> filter(_.stars > 3000, _.stars < 15000)
    assert (out >> collect()).repo.tolist() == ["ggplot2"]
    gout = (df >> group_by(_.language)
            >> filter(_.stars != _.stars.min()) >> ungroup())
    assert sorted((gout >> collect()).repo) == ["ggplot2", "pandas"]


def test_summarize_plain_and_grouped(df):
    # cell 10
    out = df >> summarize(min_stars=_.stars.min()) >> collect()
    assert out.min_stars.tolist() == [1450]
    g = (df >> group_by(_.language)
         >> summarize(ttl_stars=_.stars.sum(), wat=_.stars.min()))
    assert _rows(g, "language", "ttl_stars", "wat") == \
        [("R", 6300, 2800), ("python", 19250, 1450)]


def test_transmute_positional_and_named(df):
    # cell 12: positional string select + named mutate; grouped keeps keys
    out = df >> transmute("repo", rel1=_.stars - _.stars.min())
    assert out.columns == ["repo", "rel1"]
    g = (df >> group_by(_.language)
         >> transmute("repo", rel1=_.stars - _.stars.min()) >> ungroup())
    assert set(g.columns) == {"language", "repo", "rel1"}
    assert dict(_rows(g, "repo", "rel1"))["ggplot2"] == 700


def test_select_rename_plus_exclusion(df):
    # cell 14: select(df, _.y == _.x, -_.language) — the rename starts an
    # include set; the exclusion can only prune that set
    out = df >> select(_.y == _.x, -_.language)
    assert out.columns == ["y"]


def test_arrange_desc_and_computed(df):
    # cell 16
    out = (df >> arrange(-_.owner, _.repo) >> collect()).repo.tolist()
    assert out == ["dplyr", "ggplot2", "pandas", "plotnine"]
    by_len = (df >> arrange(_.owner.str.len()) >> collect()).owner.tolist()
    assert by_len == ["has2k1", "tidyverse", "tidyverse", "pandas-dev"]


def test_if_else_and_case_when(df):
    # cells 18-20, expressed in mutate (lazy form of the eager cells)
    out = (df >> mutate(yn=if_else(_.repo == "dplyr", "yeah", "no"),
                        f=if_else(_.repo.str.contains("d"), _.repo, "wat"),
                        band=case_when({_.stars > 10000: "incredible!",
                                        _.stars > 1000: "pretty good!",
                                        True: "I don't know"}))
           >> collect())
    assert dict(zip(out.repo, out.yn)) == {
        "pandas": "no", "dplyr": "yeah", "ggplot2": "no", "plotnine": "no"}
    assert dict(zip(out.repo, out.f)) == {
        "pandas": "pandas", "dplyr": "dplyr", "ggplot2": "wat",
        "plotnine": "wat"}
    assert dict(zip(out.repo, out.band)) == {
        "pandas": "incredible!", "dplyr": "pretty good!",
        "ggplot2": "pretty good!", "plotnine": "pretty good!"}


def test_nest_unnest_roundtrip(df):
    # cells 22-23
    nested = df >> nest(-_.language, key="data")
    assert nested.columns == ["language", "data"]
    assert (nested >> collect()).shape[0] == 2
    back = nested >> unnest("data")
    assert _rows(back, "repo", "stars") == _rows(df, "repo", "stars")


def test_count_and_add_count(df):
    # cells 25-26
    out = df >> count("language", "owner")
    assert _rows(out, "language", "owner", "n") == \
        [("R", "tidyverse", 2), ("python", "has2k1", 1),
         ("python", "pandas-dev", 1)]
    ac = df >> add_count("language", "owner")
    assert set(ac.columns) == set(df.columns) | {"n"}
    got = dict(_rows(ac, "repo", "n"))
    assert got == {"pandas": 1, "dplyr": 2, "ggplot2": 2, "plotnine": 1}


def test_distinct_variants(df):
    # cells 28-31
    keep_all = df >> distinct(_.language, _keep_all=True)
    assert (keep_all >> collect()).shape == (2, 5)
    plain = df >> distinct("language")
    assert sorted((plain >> collect()).language) == ["R", "python"]
    computed = df >> distinct(lang2=_.language.str.lower())
    assert sorted((computed >> collect()).lang2) == ["python", "r"]
    grouped = (df >> group_by(_.language)
               >> distinct(lang2=_.language.str.upper()) >> ungroup())
    assert _rows(grouped, "language", "lang2") == \
        [("R", "R"), ("python", "PYTHON")]


def test_join_forms(df, follow):
    # cell 33: how= + on= string, on= dict, positional left_join
    inner = join(df, follow, how="inner", on="repo")
    assert sorted((inner >> collect()).repo) == \
        ["dplyr", "ggplot2", "pandas", "plotnine"]
    keyed = join(df, follow, how="inner", on={"repo": "repo2"})
    assert sorted((keyed >> collect()).repo) == ["dplyr", "pandas"]
    lj = left_join(df, follow, "repo")
    got = lj >> collect()
    assert got.shape[0] == 4 and got.follow.notna().all()


def test_spread_then_gather_roundtrip(df):
    # cells 35-36
    wide = df >> select(_.repo, _.owner, _.language, _.stars) \
        >> spread("language", "stars")
    assert set(wide.columns) == {"repo", "owner", "R", "python"}
    long = wide >> gather("key", "value", "R", "python", drop_na=True)
    assert _rows(long, "repo", "key", "value") == \
        [("dplyr", "R", 2800), ("ggplot2", "R", 3500),
         ("pandas", "python", 17800), ("plotnine", "python", 1450)]


def test_pipeable_composition():
    # cell 38: Pipeable(f=...) composes with >> and applies to plain data
    f = Pipeable(f=lambda x: x + 1) >> Pipeable(f=lambda x: f"x is: {x}")
    assert f(2) == "x is: 3"


def test_final_pipe_chains(df):
    # cells 39-40, verbatim shapes (case_when with the explicit `_`
    # placeholder, then a grouped summarize)
    out = (df
           >> mutate(
               new_repo=_.repo + " waattt",
               case=case_when(_, {_.language == "python": "aw yeah",
                                  True: "wat"}))
           >> filter(_.stars > 5000)
           >> collect())
    assert out.new_repo.tolist() == ["pandas waattt"]
    assert out.case.tolist() == ["aw yeah"]

    g = df >> group_by(_.language) >> summarize(wat=_.stars.mean())
    got = dict(_rows(g, "language", "wat"))
    assert got["R"] == 3150.0 and got["python"] == 9625.0
