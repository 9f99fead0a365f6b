"""Executable port of the reference's pivot docstring examples
(siuba/experimental/pivot/pivot_long.py and pivot_wide.py "Examples"
sections) through the Spark engine — same inputs, same expected frames
(VERDICT r6 item 8; the r5/r6 pattern of test_tutorial_arrange /
test_tutorial_intro).  Row order is not part of the distributed
contract, so expected frames compare after a stable sort."""

import pandas as pd

from siuba_spark import _, collect, pivot_longer, pivot_wider, tbl


def _df(spark, pdf):
    return tbl(spark.createDataFrame(pdf))


def _sorted(df, by):
    return df.sort_values(by).reset_index(drop=True)


# ---- pivot_longer (pivot_long.py:~100-120) --------------------------------

def test_long_basic_names_values_to(spark):
    df = pd.DataFrame({"id": [1, 2], "x": [5, 6], "y": [7, 8]})
    out = (_df(spark, df)
           >> pivot_longer(~_.id, names_to="variable", values_to="number")
           >> collect())
    want = pd.DataFrame({
        "id": [1, 1, 2, 2], "variable": ["x", "y", "x", "y"],
        "number": [5, 7, 6, 8]})
    pd.testing.assert_frame_equal(
        _sorted(out, ["id", "variable"]), _sorted(want, ["id", "variable"]),
        check_dtype=False)


def test_long_names_prefix(spark):
    weeks = pd.DataFrame({"id": [1], "year": [2020], "wk1": [5], "wk2": [6]})
    out = (_df(spark, weeks)
           >> pivot_longer(_.startswith("wk"), names_to="week",
                           names_prefix="wk")
           >> collect())
    want = pd.DataFrame({"id": [1, 1], "year": [2020, 2020],
                         "week": ["1", "2"], "value": [5, 6]})
    pd.testing.assert_frame_equal(
        _sorted(out, ["week"]), _sorted(want, ["week"]), check_dtype=False)


def test_long_names_pattern_multi(spark):
    df2 = pd.DataFrame({"id": [1], "a_x1": [2], "b_x2": [3], "a_y1": [4]})
    out = (_df(spark, df2)
           >> pivot_longer(_["a_x1":"a_y1"],
                           names_to=["condition", "group", "number"],
                           names_pattern="(.*)_(.)(.*)")
           >> collect())
    want = pd.DataFrame({
        "id": [1, 1, 1],
        "condition": ["a", "b", "a"], "group": ["x", "x", "y"],
        "number": ["1", "2", "1"], "value": [2, 3, 4]})
    key = ["condition", "group", "number"]
    pd.testing.assert_frame_equal(
        _sorted(out, key), _sorted(want, key), check_dtype=False)


# ---- pivot_wider (pivot_wide.py:166-230) ----------------------------------

WIDE = pd.DataFrame(
    {"id": ["a", "b", "a"], "name": ["x", "x", "y"], "value": [1, 2, 3]})

MANY = pd.DataFrame({
    "id": [1, 1, 2, 2],
    "var": ["one", "two", "one", "two"],
    "x": [1, 2, 3, 4],
    "y": [6, 7, 8, 9]})


def test_wide_basic_and_fill(spark):
    out = (_df(spark, WIDE)
           >> pivot_wider(names_from=_.name, values_from=_.value)
           >> collect())
    assert list(out.columns) == ["id", "x", "y"]
    got = _sorted(out, ["id"])
    assert got.x.tolist() == [1, 2]
    assert got.y.fillna(-1).tolist() == [3, -1]

    out2 = (_df(spark, WIDE)
            >> pivot_wider(names_from=_.name, values_from=_.value,
                           values_fill=0)
            >> collect())
    got2 = _sorted(out2, ["id"])
    assert got2.y.tolist() == [3, 0]


def test_wide_multi_values_fastest(spark):
    out = (_df(spark, MANY)
           >> pivot_wider(names_from=_.var, values_from=_[_.x, _.y])
           >> collect())
    assert list(out.columns) == ["id", "x_one", "x_two", "y_one", "y_two"]
    got = _sorted(out, ["id"])
    assert got.values.tolist() == [[1, 1, 2, 6, 7], [2, 3, 4, 8, 9]]


def test_wide_names_vary_slowest(spark):
    out = (_df(spark, MANY)
           >> pivot_wider(names_from=_.var, values_from=_[_.x, _.y],
                          names_vary="slowest")
           >> collect())
    assert list(out.columns) == ["id", "x_one", "y_one", "x_two", "y_two"]
    got = _sorted(out, ["id"])
    assert got.values.tolist() == [[1, 1, 6, 2, 7], [2, 3, 8, 4, 9]]


def test_wide_names_sep(spark):
    out = (_df(spark, MANY)
           >> pivot_wider(names_from=_.var, values_from=_[_.x, _.y],
                          names_sep=".")
           >> collect())
    assert list(out.columns) == ["id", "x.one", "x.two", "y.one", "y.two"]


def test_wide_names_glue(spark):
    out = (_df(spark, MANY)
           >> pivot_wider(names_from=_.var, values_from=_[_.x, _.y],
                          names_glue="{variable}_X_{value}")
           >> collect())
    assert list(out.columns) == ["id", "x_X_one", "x_X_two",
                                 "y_X_one", "y_X_two"]


def test_wide_warpbreaks_values_fn_mean(spark):
    from siuba_spark.data import load
    out = (load("warpbreaks", spark)
           >> pivot_wider(names_from=_.wool, values_from=_.breaks,
                          values_fn="mean")
           >> collect())
    got = _sorted(out, ["tension"])
    assert got.tension.tolist() == ["H", "L", "M"]
    assert [round(v, 6) for v in got.A.tolist()] == [24.555556, 44.555556, 24.0]
    assert [round(v, 6) for v in got.B.tolist()] == [18.777778, 28.222222,
                                                     28.777778]
