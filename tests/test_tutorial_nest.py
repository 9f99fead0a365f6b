"""Executable port of the reference's nest doc page
(docs/api_tidy/01_nest.Rmd): exclude-form and include-form nesting, and
the unnest roundtrip — gapminder swapped for a bundled dataset (the doc's
gapminder package isn't vendored; mtcars has the same shape of use)."""

import pandas as pd

from siuba_spark import _, collect, group_by, nest, tbl, unnest
from siuba_spark.data import load


def test_nest_exclude_form_and_unnest_roundtrip(spark):
    cars = load("mtcars", spark)
    nested = cars >> nest(-_.cyl)
    got = nested >> collect()
    assert set(got.columns) == {"cyl", "data"}
    assert len(got) == got.cyl.nunique()
    back = nested >> unnest("data") >> collect()
    want = cars >> collect()
    key = sorted(want.columns)
    pd.testing.assert_frame_equal(
        back[key].sort_values(key).reset_index(drop=True),
        want[key].sort_values(key).reset_index(drop=True),
        check_dtype=False)


def test_nest_include_form(spark):
    df = pd.DataFrame({"group": ["a", "a", "b", "b"],
                       "value": [1, 2, 3, 4]})
    t = tbl(spark.createDataFrame(df))
    out = t >> nest(_.value) >> collect()
    assert set(out.columns) == {"group", "data"}
    vals = {r.group: sorted(x["value"] for x in r.data)
            for _i, r in out.iterrows()}
    assert vals == {"a": [1, 2], "b": [3, 4]}
