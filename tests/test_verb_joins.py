"""Join semantics tests (reference model: siuba/tests/test_verb_joins.py):
key forms, _x/_y suffixing, full-join key coalesce, semi/anti, theta,
implicit-key inference warning."""

import warnings

import pandas as pd
import pytest

from siuba_spark import (
    _, inner_join, left_join, right_join, full_join, semi_join, anti_join,
    join, SparkTbl,
)
from .helpers import data_frame, assert_equal_query


def test_inner_join_on_name(spark):
    l = data_frame(spark, k=[1, 2, 3], a=["x", "y", "z"])
    r = data_frame(spark, k=[2, 3, 4], b=[20, 30, 40])
    out = l >> inner_join(r, on="k")
    assert_equal_query(out, pd.DataFrame(dict(
        k=[2, 3], a=["y", "z"], b=[20, 30])))


def test_join_mapping_keeps_both_keys(spark):
    l = data_frame(spark, lk=[1, 2], a=["x", "y"])
    r = data_frame(spark, rk=[2, 3], b=[20, 30])
    out = l >> inner_join(r, on={"lk": "rk"})
    assert sorted(out.columns) == ["a", "b", "lk", "rk"]


def test_shared_nonkey_cols_suffixed(spark):
    l = data_frame(spark, k=[1], v=[10])
    r = data_frame(spark, k=[1], v=[99])
    out = l >> inner_join(r, on="k")
    assert sorted(out.columns) == ["k", "v_x", "v_y"]
    row = out.df.collect()[0]
    assert row.v_x == 10 and row.v_y == 99


def test_left_join_nulls(spark):
    l = data_frame(spark, k=[1, 2], a=["x", "y"])
    r = data_frame(spark, k=[1], b=[10])
    out = (l >> left_join(r, on="k")).df.toPandas().sort_values("k")
    assert list(out.b.isna()) == [False, True]


def test_right_join(spark):
    l = data_frame(spark, k=[1], a=["x"])
    r = data_frame(spark, k=[1, 2], b=[10, 20])
    out = l >> right_join(r, on="k")
    assert len(out.df.collect()) == 2


def test_full_join_coalesces_key(spark):
    l = data_frame(spark, k=[1, 2], a=["x", "y"])
    r = data_frame(spark, k=[2, 3], b=[20, 30])
    out = (l >> full_join(r, on="k")).df.toPandas().sort_values("k")
    # single coalesced key column covering both sides
    assert list(out.k) == [1, 2, 3]
    assert "k_x" not in out.columns and "k_y" not in out.columns


def test_semi_join(spark):
    l = data_frame(spark, k=[1, 2, 3])
    r = data_frame(spark, k=[2, 2, 3])  # dup right rows must not duplicate
    out = l >> semi_join(r, on="k")
    assert sorted(r.k for r in out.df.collect()) == [2, 3]


def test_anti_join(spark):
    l = data_frame(spark, k=[1, 2, 3])
    r = data_frame(spark, k=[2])
    out = l >> anti_join(r, on="k")
    assert sorted(r.k for r in out.df.collect()) == [1, 3]


def test_theta_join_sql_on(spark):
    l = data_frame(spark, a=[1, 2, 3])
    r = data_frame(spark, b=[1, 2, 3])
    out = join(l, r, sql_on=lambda lhs, rhs: lhs.a < rhs.b)
    assert len(out.df.collect()) == 3  # (1,2),(1,3),(2,3)


def test_implicit_key_warns(spark):
    l = data_frame(spark, k=[1, 2], a=["x", "y"])
    r = data_frame(spark, k=[2], b=[20])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = l >> inner_join(r)
        assert any("shared columns" in str(x.message) for x in w)
    assert len(out.df.collect()) == 1


def test_null_keys_dont_match_by_default(spark):
    l = data_frame(spark, k=[1.0, None], a=["x", "y"])
    r = data_frame(spark, k=[1.0, None], b=[10, 20])
    out = l >> inner_join(r, on="k")
    assert len(out.df.collect()) == 1  # SQL semantics: NULL != NULL


def test_null_safe_join_matches_nulls(spark):
    l = data_frame(spark, k=[1.0, None], a=["x", "y"])
    r = data_frame(spark, k=[1.0, None], b=[10, 20])
    out = l >> inner_join(r, on="k", null_safe=True)
    assert len(out.df.collect()) == 2  # pandas-merge semantics via <=>


def test_asof_join_backward_matches_duckdb(spark):
    import duckdb
    import pandas as pd
    from siuba_spark import asof_join
    trades = pd.DataFrame({"sym": ["A", "A", "A", "B", "B"],
                           "t": [1.0, 3.0, 7.0, 2.0, 9.0],
                           "qty": [10, 20, 30, 40, 50]})
    quotes = pd.DataFrame({"sym": ["A", "A", "A", "B"],
                           "t": [0.5, 3.0, 6.0, 5.0],
                           "px": [99.0, 101.0, 103.0, 200.0]})
    got = (asof_join(SparkTbl(spark.createDataFrame(trades)),
                     SparkTbl(spark.createDataFrame(quotes)), on="t", by="sym")
           .df.toPandas().sort_values(["sym", "t"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("tr", trades); con.register("q", quotes)
    want = con.execute(
        "SELECT tr.sym AS sym, tr.t AS t, tr.qty AS qty, q.px AS px "
        "FROM tr ASOF LEFT JOIN q ON tr.sym = q.sym AND tr.t >= q.t "
        "ORDER BY 1, 2").df()
    assert got[["sym", "t", "qty"]].equals(want[["sym", "t", "qty"]])
    assert ((got.px.isna() & want.px.isna()) | (got.px == want.px)).all()


def test_asof_join_forward_and_tolerance(spark):
    import pandas as pd
    from siuba_spark import asof_join
    lt = SparkTbl(spark.createDataFrame(
        pd.DataFrame({"k": ["a", "a"], "t": [1.0, 10.0], "x": [1, 2]})))
    rt = SparkTbl(spark.createDataFrame(
        pd.DataFrame({"k": ["a", "a"], "t": [2.0, 3.0], "y": [7.0, 8.0]})))
    fwd = {r.t: r.y for r in asof_join(lt, rt, on="t", by="k",
                                       direction="forward").df.collect()}
    assert fwd == {1.0: 7.0, 10.0: None}
    tol = {r.t: r.y for r in asof_join(lt, rt, on="t", by="k",
                                       tolerance=2.0).df.collect()}
    assert tol == {1.0: None, 10.0: None}  # backward: nothing within 2s back
    tol8 = {r.t: r.y for r in asof_join(lt, rt, on="t", by="k",
                                        tolerance=8.0).df.collect()}
    assert tol8 == {1.0: None, 10.0: 8.0}


def test_asof_join_suffixes_shared_payload(spark):
    import pandas as pd
    from siuba_spark import asof_join
    lt = SparkTbl(spark.createDataFrame(pd.DataFrame({"k": ["a"], "t": [5.0], "v": [1.0]})))
    rt = SparkTbl(spark.createDataFrame(pd.DataFrame({"k": ["a"], "t": [4.0], "v": [9.0]})))
    out = asof_join(lt, rt, on="t", by="k")
    assert sorted(out.columns) == ["k", "t", "v", "v_r"]
    row = out.df.collect()[0]
    assert (row.v, row.v_r) == (1.0, 9.0)


def test_interval_join_matches_duckdb(spark):
    import duckdb
    import pandas as pd
    from siuba_spark import interval_join
    l = pd.DataFrame({"id": [1, 2, 3], "t": [10.0, 50.0, 100.0]})
    r = pd.DataFrame({"rid": [1, 2, 3, 4], "rt": [8.0, 12.0, 55.0, 300.0]})
    out = interval_join(SparkTbl(spark.createDataFrame(l)),
                        SparkTbl(spark.createDataFrame(r)),
                        left_on="t", right_on="rt", lower=-5.0, upper=5.0)
    got = sorted((row.id, row.rid) for row in out.df.collect())
    con = duckdb.connect(); con.register("l", l); con.register("r", r)
    want = sorted(map(tuple, con.execute(
        "SELECT id, rid FROM l JOIN r ON rt BETWEEN t - 5 AND t + 5").fetchall()))
    assert got == want
    # the scale guarantee: an equi hash join on the bin, never nested-loop
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan


def test_interval_join_asymmetric_window_and_by(spark):
    import pandas as pd
    from siuba_spark import interval_join
    l = pd.DataFrame({"k": ["a", "b"], "id": [1, 2], "t": [100.0, 100.0]})
    r = pd.DataFrame({"k": ["a", "a", "b"], "rid": [1, 2, 3],
                      "rt": [95.0, 130.0, 130.0]})
    # backward-only window [-10, 0]: only (a,1)↔(a,95) qualifies
    out = interval_join(SparkTbl(spark.createDataFrame(l)),
                        SparkTbl(spark.createDataFrame(r)),
                        left_on="t", right_on="rt", lower=-10.0, upper=0.0,
                        by="k")
    got = sorted((row.k, row.id, row.rid) for row in out.df.collect())
    assert got == [("a", 1, 1)]


def test_salted_join_matches_plain_join(spark):
    from siuba_spark import inner_join, left_join, salted_join, tbl, _
    l = tbl(spark, "/root/testdata/sf0.001/orders.parquet")
    r = tbl(spark, "/root/testdata/sf0.001/customer.parquet")
    plain = (l >> inner_join(r, on={"o_custkey": "c_custkey"})).df
    salted = salted_join(l, r, on={"o_custkey": "c_custkey"}, salts=8)
    a = sorted(map(tuple, plain.select("o_orderkey", "c_name").collect()))
    b = sorted(map(tuple, salted.df.select("o_orderkey", "c_name").collect()))
    assert a == b
    # left join keeps unmatched left rows exactly once
    lp = (l >> left_join(r, on={"o_custkey": "c_custkey"})).df.count()
    ls = salted_join(l, r, on={"o_custkey": "c_custkey"}, how="left",
                     salts=8).df.count()
    assert lp == ls


def test_salted_join_salt_in_join_keys(spark):
    from siuba_spark import salted_join, tbl
    l = tbl(spark, "/root/testdata/sf0.001/orders.parquet")
    r = tbl(spark, "/root/testdata/sf0.001/customer.parquet")
    out = salted_join(l, r, on={"o_custkey": "c_custkey"}, salts=4)
    plan = out.df._jdf.queryExecution().toString()
    assert "__salt" in plan  # the shuffle key includes the salt
    assert "__salt" not in out.df.columns  # but it never leaks to the user


def test_join_by_keyword_alias(spark):
    from siuba_spark import inner_join, tbl
    l = tbl(spark.createDataFrame([("a", 1)], "k string, x int"))
    r = tbl(spark.createDataFrame([("a", 9)], "k string, y int"))
    out = inner_join(l, r, by="k")
    assert out.df.collect()[0].y == 9
    import pytest as _pt
    with _pt.raises(ValueError, match="not both"):
        inner_join(l, r, on="k", by="k")


def test_asof_join_nearest_matches_pandas(spark):
    """direction='nearest' replays pandas.merge_asof semantics: closest
    |gap| wins, ties go backward, tolerance is absolute."""
    import numpy as np
    import pandas as pd

    from siuba_spark import asof_join
    from siuba_spark.plans.tbl import SparkTbl

    rng = np.random.RandomState(7)
    left = pd.DataFrame({
        "k": rng.choice(["a", "b"], 40),
        "t": np.sort(rng.randint(0, 200, 40)).astype("int64"),
    }).sort_values("t").reset_index(drop=True)
    right = pd.DataFrame({
        "k": rng.choice(["a", "b"], 25),
        "t": np.sort(rng.randint(0, 200, 25)).astype("int64"),
        "y": np.arange(25).astype("int64"),
    }).sort_values("t").reset_index(drop=True)
    # pandas merge_asof needs unique (k,t) on the right for a clean compare
    right = right.drop_duplicates(["k", "t"]).reset_index(drop=True)

    lt = SparkTbl(spark.createDataFrame(left))
    rt = SparkTbl(spark.createDataFrame(right))

    for tol in (None, 10):
        want = pd.merge_asof(left, right, on="t", by="k",
                             direction="nearest",
                             tolerance=tol).sort_values(["k", "t"])
        got = (asof_join(lt, rt, on="t", by="k", direction="nearest",
                         tolerance=tol)
               .df.toPandas().sort_values(["k", "t"]))
        assert got.y.fillna(-1).tolist() == want.y.fillna(-1).tolist(), \
            f"tolerance={tol}"


def test_asof_join_nearest_tie_goes_backward(spark):
    from siuba_spark import asof_join
    from siuba_spark.plans.tbl import SparkTbl

    lt = SparkTbl(spark.createDataFrame([(10,)], "t long"))
    rt = SparkTbl(spark.createDataFrame([(8, "back"), (12, "fwd")],
                                        "t long, y string"))
    got = asof_join(lt, rt, on="t", direction="nearest").df.toPandas()
    assert got.y.tolist() == ["back"]


def test_asof_join_nearest_single_shuffle(spark):
    """nearest carries both directions over ONE exchange (two sorts, same
    partition keys) — not two shuffles."""
    from siuba_spark import asof_join, tbl

    lt = tbl(spark, "/root/testdata/sf0.001/orders.parquet")
    rt = tbl(spark, "/root/testdata/sf0.001/lineitem.parquet")
    out = asof_join(
        lt.evolve(df=lt.df.selectExpr("o_custkey AS k", "o_orderdate AS t")),
        rt.evolve(df=rt.df.selectExpr("l_suppkey AS k", "l_shipdate AS t",
                                      "l_quantity AS q")),
        on="t", by="k", direction="nearest")
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 2  # union sides pre-shuffle
    assert "Exchange SinglePartition" not in plan


def test_set_operations(spark):
    """dplyr union/union_all/intersect/setdiff (SQL set semantics)."""
    from siuba_spark import intersect, setdiff, union, union_all

    a = data_frame(spark, g=["x", "x", "y"], v=[1, 1, 2])
    b = data_frame(spark, v=[1, 3], g=["x", "z"])  # different column order
    assert (a >> union(b)).df.count() == 3          # distinct: x1, y2, z3
    assert (a >> union_all(b)).df.count() == 5
    assert [(r.g, r.v) for r in (a >> intersect(b)).df.collect()] == [("x", 1)]
    sd = sorted((r.g, r.v) for r in (a >> setdiff(b)).df.collect())
    assert sd == [("y", 2)]
    import pytest
    with pytest.raises(ValueError, match="same column"):
        a >> union(data_frame(spark, q=[1]))


def test_cross_and_nest_join(spark):
    from siuba_spark import cross_join, nest_join

    l = data_frame(spark, k=["a", "b", "c"], lv=[1, 2, 3])
    r = data_frame(spark, k=["a", "a", "b"], rv=[10, 20, 30])
    cj = (l >> cross_join(r)).df
    assert cj.count() == 9 and "k_y" in cj.columns

    nj = (l >> nest_join(r, on="k", name="matches")).df.orderBy("k").collect()
    sizes = [len(row.matches) for row in nj]
    assert sizes == [2, 1, 0]  # a->2 matches, b->1, c->empty array
    assert sorted(m.rv for m in nj[0].matches) == [10, 20]

    import pytest
    with pytest.raises(ValueError, match="collides"):
        l >> nest_join(r, on="k", name="lv")  # nested col clashes with left
    with pytest.raises(ValueError, match="no non-key"):
        l >> nest_join(r.df.select("k"), on="k")  # right has no payload

    # setdiff with duplicated left rows: pure set semantics (SQL EXCEPT)
    from siuba_spark import setdiff
    dup_l = data_frame(spark, x=["x", "x", "y"], n=[1, 1, 2])
    dup_r = data_frame(spark, x=["x", "z"], n=[1, 3])
    assert [(r.x, r.n) for r in (dup_l >> setdiff(dup_r)).df.collect()] \
        == [("y", 2)]
