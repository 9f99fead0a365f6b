"""Tests for the dplyr slice_* family and tidyr separate_rows."""

import pandas as pd
import pytest

from siuba_spark import (
    _, arrange, group_by, slice_head, slice_tail, slice_min, slice_max,
    slice_sample, separate_rows, TranslationError, desc,
)
from .helpers import data_frame, assert_equal_query


@pytest.fixture
def t(spark):
    return data_frame(
        spark,
        g=["a", "a", "a", "b", "b"],
        x=[3.0, 1.0, 2.0, 5.0, 4.0],
        y=[10, 20, 30, 40, 50],
    )


def test_slice_head_tail_grouped(t):
    got = (t >> group_by(_.g) >> slice_head(2, order_by=_.x)).df.toPandas()
    assert sorted(got.x.tolist()) == [1.0, 2.0, 4.0, 5.0]
    got = (t >> group_by(_.g) >> slice_tail(1, order_by=_.x)).df.toPandas()
    assert sorted(got.x.tolist()) == [3.0, 5.0]


def test_slice_head_uses_arrange_state(t):
    got = (t >> arrange(-_.x) >> slice_head(2)).df.toPandas()
    assert sorted(got.x.tolist()) == [4.0, 5.0]


def test_slice_head_without_order_raises(t):
    with pytest.raises(TranslationError):
        (t >> slice_head(2)).df


def test_slice_min_max(t):
    got = (t >> group_by(_.g) >> slice_min(_.x)).df.toPandas()
    assert sorted(got.x.tolist()) == [1.0, 4.0]
    got = (t >> group_by(_.g) >> slice_max(_.x, n=2)).df.toPandas()
    assert sorted(got.x.tolist()) == [2.0, 3.0, 4.0, 5.0]


def test_slice_min_ties(spark):
    t = data_frame(spark, g=["a"] * 4, x=[1.0, 1.0, 2.0, 3.0],
                   y=[1, 2, 3, 4])
    with_ties = (t >> group_by(_.g) >> slice_min(_.x)).df.toPandas()
    assert len(with_ties) == 2
    no_ties = (t >> group_by(_.g) >> slice_min(_.x, with_ties=False)) \
        .df.toPandas()
    assert len(no_ties) == 1
    assert no_ties.y.tolist() == [1]  # deterministic tie-break


def test_slice_sample(t):
    got = (t >> group_by(_.g) >> slice_sample(n=1)).df.toPandas()
    assert got.groupby("g").size().tolist() == [1, 1]
    again = (t >> group_by(_.g) >> slice_sample(n=1)).df.toPandas()
    assert sorted(got.y) == sorted(again.y)  # same seed -> same rows
    with pytest.raises(TranslationError):
        t >> slice_sample()
    with pytest.raises(TranslationError):
        t >> slice_sample(n=1, prop=0.5)


def test_separate_rows_single(spark):
    t = data_frame(spark, id=[1, 2], tags=["a,b,c", "d"])
    got = (t >> separate_rows(_.tags, sep=",")).df.toPandas()
    assert got.tags.tolist() == ["a", "b", "c", "d"]
    assert got.id.tolist() == [1, 1, 1, 2]


def test_separate_rows_multi_lockstep(spark):
    t = data_frame(spark, id=[1], k=["a,b"], v=["1,2"])
    got = (t >> separate_rows(_.k, _.v, sep=",", convert=False)).df.toPandas()
    assert got.k.tolist() == ["a", "b"]
    assert got.v.tolist() == ["1", "2"]


def test_separate_rows_ragged_null_fill(spark):
    t = data_frame(spark, id=[1], k=["a,b,c"], v=["1,2"])
    got = (t >> separate_rows(_.k, _.v, sep=",")).df.toPandas()
    assert got.k.tolist() == ["a", "b", "c"]
    assert got.v.tolist()[:2] == ["1", "2"] and pd.isna(got.v.tolist()[2])


def test_separate_rows_convert_dtype(spark):
    t = data_frame(spark, id=[1], v=["1.5, 2.5"])
    out = (t >> separate_rows(_.v, sep=",\\s*", convert="double")).df
    assert dict(out.dtypes)["v"] == "double"
    assert out.toPandas().v.tolist() == [1.5, 2.5]
    with pytest.raises(TranslationError):
        t >> separate_rows(_.v, convert=True)


def test_separate_rows_no_shuffle(spark):
    t = data_frame(spark, id=[1], v=["a,b"])
    plan = (t >> separate_rows(_.v, sep=",")).df \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_slice_matches_duckdb(spark):
    import duckdb
    df = pd.DataFrame({
        "g": ["a", "a", "a", "b", "b", "b"],
        "x": [3.0, 1.0, 2.0, 6.0, 5.0, 4.0],
    })
    t = data_frame(spark, **{c: df[c].tolist() for c in df.columns})
    exp = duckdb.connect().execute("""
        SELECT g, x FROM (
          SELECT *, rank() OVER (PARTITION BY g ORDER BY x ASC) rk FROM df
        ) WHERE rk <= 2
    """).df()
    assert_equal_query(t >> group_by(_.g) >> slice_min(_.x, n=2), exp)


def test_slice_sample_weight_by(spark):
    """dplyr slice_sample(weight_by=): exact weighted sampling without
    replacement (A-Res u^(1/w) top-n).  Deterministic per seed; zero
    weights never sampled (sample shrinks); negative weights raise;
    heavy weights dominate the draw frequency across seeds."""
    import pytest

    from siuba_spark import _, collect, group_by, slice_sample, tbl

    rows = [("g1", i, 1000.0 if i == 0 else 0.01) for i in range(20)] + \
           [("g2", i, 1.0 if i < 5 else 0.0) for i in range(10)]
    t = tbl(spark.createDataFrame(rows, "g string, rid long, w double"))

    out = (t >> group_by(_.g)
           >> slice_sample(n=3, weight_by=_.w, seed=7) >> collect())
    # determinism: identical seed reproduces the identical sample
    out2 = (t >> group_by(_.g)
            >> slice_sample(n=3, weight_by=_.w, seed=7) >> collect())
    key = ["g", "rid"]
    assert sorted(map(tuple, out[key].values.tolist())) == \
        sorted(map(tuple, out2[key].values.tolist()))
    # g2: only the 5 positive-weight rows are eligible
    g2 = out[out.g == "g2"]
    assert len(g2) == 3 and (g2.rid < 5).all()
    # zero-weight rows never appear even when n exceeds eligibility
    shrunk = (t >> group_by(_.g)
              >> slice_sample(n=8, weight_by=_.w, seed=7) >> collect())
    s2 = shrunk[shrunk.g == "g2"]
    assert len(s2) == 5 and (s2.rid < 5).all()
    # the 1000x-weight row in g1 is drawn in (almost) every seed
    hits = 0
    for seed in range(12):
        s = (t >> group_by(_.g)
             >> slice_sample(n=3, weight_by=_.w, seed=seed) >> collect())
        hits += int(0 in set(s[s.g == "g1"].rid))
    assert hits >= 11, hits
    # negative weights raise at runtime
    bad = tbl(spark.createDataFrame([("g", 1, -1.0)],
                                    "g string, rid long, w double"))
    with pytest.raises(Exception, match="non-negative"):
        (bad >> slice_sample(n=1, weight_by=_.w) >> collect())
