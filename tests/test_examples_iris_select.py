"""Port of the reference's case-iris-select.ipynb: tidyselect over the
iris frame's awkward real-world column names (spaces and parentheses),
which double as a regression test that select/rename survive columns
Spark would otherwise demand backticks for."""

import pytest

from siuba_spark import _, collect, rename, select, tbl
from siuba_spark.operators.tidyselect import TidySelectError

IRIS_COLS = ["sepal length (cm)", "sepal width (cm)",
             "petal length (cm)", "petal width (cm)", "species"]


@pytest.fixture(scope="module")
def iris(spark):
    rows = [(5.1, 3.5, 1.4, 0.2, "setosa"),
            (4.9, 3.0, 1.4, 0.2, "setosa"),
            (4.7, 3.2, 1.3, 0.2, "setosa"),
            (4.6, 3.1, 1.5, 0.2, "setosa"),
            (5.0, 3.6, 1.4, 0.2, "setosa")]
    df = spark.createDataFrame(rows, IRIS_COLS)
    return tbl(df)


def test_select_startswith_endswith(iris):
    # cell 4: prefix / suffix predicates
    assert (iris >> select(_.startswith("sepal"))).columns == \
        ["sepal length (cm)", "sepal width (cm)"]
    assert (iris >> select(_.endswith("width (cm)"))).columns == \
        ["sepal width (cm)", "petal width (cm)"]


def test_move_species_to_front(iris):
    # cell 4: _.endswith("") selects everything — the "move to front" hack
    got = (iris >> select(_.species, _.endswith(""))).columns
    assert got == ["species"] + [c for c in IRIS_COLS if c != "species"]


def test_move_column_to_back(iris):
    # cell 4: deselect then re-select appends at the back
    got = (iris >> select(-_["sepal length (cm)"],
                          _["sepal length (cm)"])).columns
    assert got == [c for c in IRIS_COLS if c != "sepal length (cm)"] + \
        ["sepal length (cm)"]


def test_positional_range_slice(spark):
    # cells 6-7: V3:V5 label slice over shuffled numeric-suffix columns
    names = [f"V{i}" for i in (3, 4, 7, 1, 9, 8, 5, 2, 6, 10)]
    df = spark.createDataFrame([tuple(range(10))], names)
    got = (tbl(df) >> select(_["V3":"V5"])).columns
    assert got == ["V3", "V4", "V7", "V1", "V9", "V8", "V5"]


def test_exclude_matches(iris):
    # cell 8
    got = (iris >> select(-_.startswith("petal"))).columns
    assert got == ["sepal length (cm)", "sepal width (cm)", "species"]


def test_select_rename_and_rename_verb(iris):
    # cell 9: select can grab AND rename; rename keeps all columns
    got = iris >> select(_.petal_length == _["petal length (cm)"])
    assert got.columns == ["petal_length"]
    vals = (got >> collect()).petal_length.tolist()
    assert vals == [1.4, 1.4, 1.3, 1.5, 1.4]

    ren = iris >> rename(petal_length="petal length (cm)")
    assert ren.columns == ["sepal length (cm)", "sepal width (cm)",
                           "petal_length", "petal width (cm)", "species"]


def test_group_rename_is_an_error(iris):
    # cell 10: the notebook leaves `select(_.obs == _.startswith('s'))`
    # as an open TODO ("should return error?") — this engine resolves it
    # the strict way: renaming a multi-column match raises
    with pytest.raises(TidySelectError):
        iris >> select(_.obs == _.startswith("s"))


def test_num_range(spark):
    # the notebook notes "no num_range capability" — this engine adds
    # the dplyr helper: numeric-order selection of numbered columns,
    # missing members skipped
    names = [f"V{i}" for i in (3, 4, 7, 1, 9, 8, 5, 2, 6, 10)]
    df = spark.createDataFrame([tuple(range(10))], names)
    t = tbl(df)
    assert (t >> select(_.num_range("V", 3, 5))).columns == ["V3", "V4", "V5"]
    assert (t >> select(_.num_range("V", range(9, 12)))).columns == \
        ["V9", "V10"]                       # V11 missing -> skipped
    assert (t >> select(-_.num_range("V", 1, 8))).columns == ["V9", "V10"]
