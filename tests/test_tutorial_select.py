"""The reference's select / rename / transmute tutorial pages
(docs/api_table_core/03_select.Rmd, 04_rename.Rmd, 06_transmute.Rmd) run
end-to-end: column references by name/string/position, exclusion,
select-rename (`_.new == _.old`), slice selection (`_["mpg":"hp"]`,
`_[0:4]`), tidyselect predicate methods (`_.contains`, `_.startswith`),
and transmute's positional-select + named-mutate split."""

import pytest

from siuba_spark import _, collect, rename, select, transmute
from siuba_spark.data import mtcars

COLS = ["mpg", "cyl", "disp", "hp", "drat", "wt", "qsec", "vs", "am",
        "gear", "carb"]


def test_select_by_name_string_position():
    assert (mtcars >> select(_.mpg, _.cyl)).columns == ["mpg", "cyl"]
    assert (mtcars >> select("mpg", "cyl")).columns == ["mpg", "cyl"]
    assert (mtcars >> select(0, 1)).columns == ["mpg", "cyl"]


def test_select_exclusion():
    got = (mtcars >> select(-_.mpg, -_.cyl)).columns
    assert got == [c for c in COLS if c not in ("mpg", "cyl")]


def test_select_rename_equality():
    got = mtcars >> select(_.miles_per_gallon == _.mpg, _.cyl)
    assert got.columns == ["miles_per_gallon", "cyl"]
    pdf = got >> collect()
    orig = mtcars >> collect()
    assert pdf.miles_per_gallon.tolist() == orig.mpg.tolist()


def test_select_slice_forms():
    # _["mpg":"hp"] — inclusive label slice
    assert (mtcars >> select(_["mpg":"hp"])).columns == \
        ["mpg", "cyl", "disp", "hp"]
    # _[0:4] — positional slice, exclusive stop like DataFrame.columns[0:4]
    assert (mtcars >> select(_[0:4])).columns == COLS[0:4]
    # excluded slice
    assert (mtcars >> select(-_["mpg":"hp"])).columns == \
        [c for c in COLS if c not in ("mpg", "cyl", "disp", "hp")]


def test_select_str_predicates():
    has_d = [c for c in COLS if "d" in c]
    assert (mtcars >> select(_.contains("d"))).columns == has_d
    assert (mtcars >> select(-_.contains("d"))).columns == \
        [c for c in COLS if "d" not in c]
    assert (mtcars >> select(_.startswith("c"))).columns == ["cyl", "carb"]


def test_rename_keeps_other_columns():
    small = mtcars >> select(_.mpg, _.cyl, _.hp)
    got = small >> rename(MPG="mpg")
    assert got.columns == ["MPG", "cyl", "hp"]
    # 'equivalent to renaming in a select, while also selecting the rest'
    via_select = small >> select(_.MPG == _.mpg, _.cyl, _.hp)
    assert (got >> collect()).equals(via_select >> collect())


def test_transmute_positional_select_plus_named_mutate():
    got = mtcars >> transmute(_.cyl, _.mpg, hp_per_cyl=_.hp / _.cyl)
    assert got.columns == ["cyl", "mpg", "hp_per_cyl"]
    pdf = got >> collect()
    orig = mtcars >> collect()
    assert pdf.hp_per_cyl.round(6).tolist() == \
        (orig.hp / orig.cyl).round(6).tolist()
