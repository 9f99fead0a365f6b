"""dplyr rows_* family (operators/rows.py — beyond the reference, like the
set operations): keyed insert/append/update/patch/upsert/delete."""

import pytest

from siuba_spark import (
    rows_append, rows_delete, rows_insert, rows_patch, rows_update,
    rows_upsert,
)
from tests.helpers import data_frame


def _rows(t):
    return sorted((r.k, r.a, r.b) for r in t.df.collect())


@pytest.fixture()
def x(spark):
    return data_frame(spark, k=[1, 2, 3], a=["x1", "x2", "x3"],
                      b=[10.0, 20.0, None])


def test_rows_insert(spark, x):
    y = data_frame(spark, k=[4], a=["y4"], b=[40.0])
    assert _rows(x >> rows_insert(y, by="k")) == [
        (1, "x1", 10.0), (2, "x2", 20.0), (3, "x3", None), (4, "y4", 40.0)]
    # conflict="error" (default) raises on existing keys
    dup = data_frame(spark, k=[3, 5], a=["y3", "y5"], b=[1.0, 2.0])
    with pytest.raises(ValueError, match="conflict"):
        x >> rows_insert(dup, by="k")
    # conflict="ignore" drops the conflicting y rows lazily
    assert _rows(x >> rows_insert(dup, by="k", conflict="ignore")) == [
        (1, "x1", 10.0), (2, "x2", 20.0), (3, "x3", None), (5, "y5", 2.0)]
    # missing y columns become NULL; by defaults to y's first column
    part = data_frame(spark, k=[9])
    out = _rows(x >> rows_insert(part))
    assert (9, None, None) in out


def test_rows_append(spark, x):
    y = data_frame(spark, k=[1], a=["again"])
    out = _rows(x >> rows_append(y))
    assert len(out) == 4 and (1, "again", None) in out
    with pytest.raises(ValueError, match="columns not in x"):
        x >> rows_append(data_frame(spark, q=[1]))


def test_rows_update_and_patch(spark, x):
    # update: y's values win on matched rows, INCLUDING NULLs
    y = data_frame(spark, k=[2, 3], a=["new2", None], b=[None, 30.0])
    assert _rows(x >> rows_update(y, by="k")) == [
        (1, "x1", 10.0), (2, "new2", None), (3, None, 30.0)]
    # patch: only x's NULLs are filled
    assert _rows(x >> rows_patch(y, by="k")) == [
        (1, "x1", 10.0), (2, "x2", 20.0), (3, "x3", 30.0)]
    # unmatched="error" (default) raises on unknown keys
    stray = data_frame(spark, k=[99], a=["?"], b=[0.0])
    with pytest.raises(ValueError, match="keys not in x"):
        x >> rows_update(stray, by="k")
    assert _rows(x >> rows_update(stray, by="k", unmatched="ignore")) \
        == _rows(x)


def test_rows_update_duplicate_y_keys(spark, x):
    # dplyr contract: y keys must be unique, else matches would multiply
    dup = data_frame(spark, k=[2, 2], a=["a", "b"], b=[1.0, 2.0])
    with pytest.raises(ValueError, match="unique"):
        x >> rows_update(dup, by="k")


def test_rows_upsert(spark, x):
    y = data_frame(spark, k=[3, 4], a=["up3", "new4"], b=[33.0, 44.0])
    assert _rows(x >> rows_upsert(y, by="k")) == [
        (1, "x1", 10.0), (2, "x2", 20.0), (3, "up3", 33.0),
        (4, "new4", 44.0)]


def test_rows_delete(spark, x):
    y = data_frame(spark, k=[1, 3])
    assert _rows(x >> rows_delete(y, by="k")) == [(2, "x2", 20.0)]
    stray = data_frame(spark, k=[7])
    with pytest.raises(ValueError, match="keys not in x"):
        x >> rows_delete(stray, by="k")
    assert _rows(x >> rows_delete(stray, by="k", unmatched="ignore")) \
        == _rows(x)
    # y's non-key columns are ignored
    noisy = data_frame(spark, k=[2], a=["whatever"])
    assert _rows(x >> rows_delete(noisy, by="k")) == [
        (1, "x1", 10.0), (3, "x3", None)]


def test_rows_update_reserved_names(spark):
    """ADVICE r5: x columns named __m / __y_* / count must not collide
    with the merge's working columns."""
    x = data_frame(spark, count=[1, 2], __m=["a", "b"], __y___m=[1.0, 2.0])
    y = data_frame(spark, count=[2], __m=["B"])
    out = (x >> rows_update(y, by="count")).df.orderBy("count").collect()
    assert [(r["count"], r["__m"], r["__y___m"]) for r in out] == [
        (1, "a", 1.0), (2, "B", 2.0)]


def test_rows_null_keys_match(spark):
    """dplyr NA-matches-NA: a NULL key in y updates the NULL-key x row."""
    from siuba_spark import tbl
    x = tbl(spark.createDataFrame([(1, "x1"), (None, "xN")], "k int, a string"))
    y = tbl(spark.createDataFrame([(None, "upN")], "k int, a string"))
    out = sorted(((r.k is None, r.a) for r in
                  (x >> rows_update(y, by="k")).df.collect()))
    assert out == [(False, "x1"), (True, "upN")]
    # delete via NULL key
    gone = (x >> rows_delete(y, by="k")).df.collect()
    assert [(r.k, r.a) for r in gone] == [(1, "x1")]
    # upsert: the NULL-key y row matches, so the insert half adds nothing
    up = sorted(((r.k is None, r.a) for r in
                 (x >> rows_upsert(y, by="k")).df.collect()))
    assert up == [(False, "x1"), (True, "upN")]
