"""Direct behavioral parity: the SAME pipeline run through the reference
engine (siuba on pandas, imported read-only from /root/reference) and
through siuba_spark, compared sort-insensitively — the reference's own
cross-backend bar (siuba/tests/helpers.py:226-246).

This is the strongest parity evidence available: no hand-written oracle,
the reference IS the oracle.
"""

import sys

import pandas as pd
import pytest

sys.path.insert(0, "/root/reference")
siuba = pytest.importorskip("siuba")

import siuba as ref  # noqa: E402
from siuba import _ as R  # noqa: E402

import siuba_spark as ours  # noqa: E402
from siuba_spark import _ as S  # noqa: E402

PDF = pd.DataFrame({
    "g": ["a", "a", "b", "b", "a"],
    "x": [1.0, 4.0, 2.0, 2.0, 7.0],
    "y": [10, 20, 30, 40, 50],
    "s": ["Apple", "banana", "Cherry", "date", "fig"],
})


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reset_index(drop=True)
    cols = sorted(df.columns)
    out = df[cols].sort_values(cols).reset_index(drop=True)
    for c in out.columns:
        if out[c].dtype.kind in "fc":
            out[c] = out[c].round(9)
        elif out[c].dtype.kind in "iu":
            out[c] = out[c].astype("int64")
    return out


def _both(spark, ref_pipe, our_pipe):
    want = PDF >> ref_pipe
    t = ours.tbl(spark.createDataFrame(PDF))
    got = (t >> our_pipe).df.toPandas()
    a, b = _norm(got), _norm(want)
    assert a.columns.tolist() == b.columns.tolist(), (a.columns, b.columns)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_parity_mutate_filter(spark):
    _both(spark,
          ref.mutate(z=R.x * 2 + R.y) >> ref.filter(R.z > 20),
          ours.mutate(z=S.x * 2 + S.y) >> ours.filter(S.z > 20))


def test_parity_grouped_summarize(spark):
    _both(spark,
          ref.group_by(R.g) >> ref.summarize(m=R.x.mean(), s=R.y.sum()),
          ours.group_by(S.g) >> ours.summarize(m=S.x.mean(), s=S.y.sum()))


def test_parity_grouped_mutate_broadcast(spark):
    _both(spark,
          ref.group_by(R.g) >> ref.mutate(dev=R.x - R.x.mean()) >> ref.ungroup(),
          ours.group_by(S.g) >> ours.mutate(dev=S.x - S.x.mean()) >> ours.ungroup())


def test_parity_count_sorted(spark):
    _both(spark,
          ref.count(R.g, sort=True),
          ours.count(S.g, sort=True))


def test_parity_select_rename_distinct(spark):
    _both(spark,
          ref.select(R.g, R.x) >> ref.distinct(),
          ours.select(S.g, S.x) >> ours.distinct())


def test_parity_string_ops(spark):
    _both(spark,
          ref.mutate(u=R.s.str.upper(), n=R.s.str.len()) >> ref.select(R.u, R.n),
          ours.mutate(u=S.s.str.upper(), n=S.s.str.len()) >> ours.select(S.u, S.n))


def test_parity_if_else_case_when(spark):
    _both(spark,
          ref.mutate(band=ref.if_else(R.x > 2, "hi", "lo")),
          ours.mutate(band=ours.if_else(S.x > 2, "hi", "lo")))


def test_parity_join(spark):
    dim = pd.DataFrame({"g": ["a", "b"], "label": ["alpha", "beta"]})
    want = PDF >> ref.inner_join(R, dim, on="g")
    t = ours.tbl(spark.createDataFrame(PDF))
    d = ours.tbl(spark.createDataFrame(dim))
    got = (t >> ours.inner_join(d, on="g")).df.toPandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


def test_parity_gather(spark):
    _both(spark,
          ref.select(R.g, R.x, R.y) >> ref.gather("k", "v", R.x, R.y),
          ours.select(S.g, S.x, S.y) >> ours.gather("k", "v", S.x, S.y))


def test_parity_transmute_across_arrange_head(spark):
    # arrange + head IS order-dependent: compare positionally
    want = (PDF >> ref.arrange(-R.x) >> ref.head(3)
            >> ref.transmute(gx=R.g, big=R.x * 10)).reset_index(drop=True)
    t = ours.tbl(spark.createDataFrame(PDF))
    got = (t >> ours.arrange(-S.x) >> ours.head(3)
           >> ours.transmute(gx=S.g, big=S.x * 10)).df.toPandas()
    pd.testing.assert_frame_equal(got[["gx", "big"]], want[["gx", "big"]],
                                  check_dtype=False)


def test_parity_add_count(spark):
    _both(spark,
          ref.add_count(R.g),
          ours.add_count(S.g))


def test_parity_top_n(spark):
    _both(spark,
          ref.group_by(R.g) >> ref.top_n(1, R.x) >> ref.ungroup(),
          ours.group_by(S.g) >> ours.top_n(1, S.x) >> ours.ungroup())


def test_parity_lead_lag_cumsum(spark):
    from siuba.dply.vector import lead as ref_lead, lag as ref_lag
    # ordered by unique y within groups → deterministic
    want = (PDF >> ref.group_by(R.g) >> ref.arrange(R.y)
            >> ref.mutate(nxt=ref_lead(R.x), prv=ref_lag(R.x), cs=R.x.cumsum())
            >> ref.ungroup())
    t = ours.tbl(spark.createDataFrame(PDF))
    got = (t >> ours.group_by(S.g) >> ours.arrange(S.y)
           >> ours.mutate(nxt=ours.lead(S.x), prv=ours.lag(S.x), cs=S.x.cumsum())
           >> ours.ungroup()).df.toPandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(pd.DataFrame(want)),
                                  check_dtype=False)


def test_parity_row_number_ranks(spark):
    from siuba.dply.vector import min_rank as ref_min_rank, dense_rank as ref_dense_rank
    want = (PDF >> ref.group_by(R.g)
            >> ref.mutate(rk=ref_min_rank(R.x), dr=ref_dense_rank(R.x))
            >> ref.ungroup())
    t = ours.tbl(spark.createDataFrame(PDF))
    got = (t >> ours.group_by(S.g)
           >> ours.mutate(rk=ours.min_rank(S.x), dr=ours.dense_rank(S.x))
           >> ours.ungroup()).df.toPandas()
    # min_rank/dense_rank: int in ours, float in pandas ref — normalize
    pd.testing.assert_frame_equal(_norm(got), _norm(pd.DataFrame(want)),
                                  check_dtype=False)


def test_parity_spread(spark):
    long = pd.DataFrame({"id": [1, 1, 2, 2], "k": ["p", "q", "p", "q"],
                         "v": [1.0, 2.0, 3.0, 4.0]})
    want = long >> ref.spread(R.k, R.v)
    t = ours.tbl(spark.createDataFrame(long))
    got = (t >> ours.spread(S.k, S.v)).df.toPandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(pd.DataFrame(want)),
                                  check_dtype=False)


def test_parity_separate_unite(spark):
    df = pd.DataFrame({"id": [1, 2], "s": ["a-1", "b-2"]})
    want = df >> ref.separate(R.s, into=["l", "r"], sep="-")
    t = ours.tbl(spark.createDataFrame(df))
    got = (t >> ours.separate(S.s, into=["l", "r"], sep="-")).df.toPandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(pd.DataFrame(want)),
                                  check_dtype=False)


def test_parity_fct_lump(spark):
    from siuba.dply.forcats import fct_lump as ref_lump
    df = pd.DataFrame({"v": ["a"] * 5 + ["b"] * 3 + ["c"] * 1 + ["d"] * 1})
    want = (df >> ref.mutate(l=ref_lump(R.v, n=2)) >> ref.count(R.l))
    want["l"] = want["l"].astype(str)  # categorical → plain string for compare
    t = ours.tbl(spark.createDataFrame(df))
    got = (t >> ours.mutate(l=ours.fct_lump(S.v, n=2)) >> ours.count(S.l)).df.toPandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(pd.DataFrame(want)),
                                  check_dtype=False)


def test_parity_nest_unnest_roundtrip(spark):
    want = (PDF >> ref.select(R.g, R.x) >> ref.nest(-R.g)
            >> ref.unnest("data"))
    t = ours.tbl(spark.createDataFrame(PDF))
    got = (t >> ours.select(S.g, S.x) >> ours.nest(-S.g)
           >> ours.unnest("data")).df.toPandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(pd.DataFrame(want)),
                                  check_dtype=False)


def test_parity_across_fx(spark):
    from siuba import Fx as RFx
    from siuba_spark import Fx as SFx
    _both(spark,
          ref.group_by(R.g) >> ref.summarize(ref.across(R[R.x, R.y], {"mn": RFx.min()})),
          ours.group_by(S.g) >> ours.summarize(ours.across(["x", "y"], {"mn": SFx.min()})))


def test_parity_case_when_dict(spark):
    _both(spark,
          ref.mutate(band=ref.case_when(R, {R.x < 2: "lo", R.x < 5: "mid", True: "hi"})),
          ours.mutate(band=ours.case_when({S.x < 2: "lo", S.x < 5: "mid", True: "hi"})))


def test_parity_if_else_null_condition(spark):
    # NULL condition takes the FALSE branch (reference: verbs.py:1085)
    df = pd.DataFrame({"x": [1.0, None, 5.0]})
    want = df >> ref.mutate(r=ref.if_else(R.x > 2, "big", "small"))
    # real SQL NULL, not pandas NaN (Spark/duckdb agree NaN > 2 is true —
    # a float-NaN ordering divergence from pandas; parquet nulls are NULLs)
    t = ours.tbl(spark.createDataFrame([(1.0,), (None,), (5.0,)], "x double"))
    got = (t >> ours.mutate(r=ours.if_else(S.x > 2, "big", "small"))).df.toPandas()
    assert sorted(got.r) == sorted(want.r) == ["big", "small", "small"]


def test_parity_dt_accessor_monday0(spark):
    df = pd.DataFrame({"ts": pd.to_datetime(
        ["2020-01-01", "2020-02-29", "2021-12-31", "2020-06-15"])})
    want = df >> ref.mutate(yr=R.ts.dt.year, mo=R.ts.dt.month,
                            dow=R.ts.dt.dayofweek, doy=R.ts.dt.dayofyear)
    t = ours.tbl(spark.createDataFrame(df))
    got = (t >> ours.mutate(yr=S.ts.dt.year, mo=S.ts.dt.month,
                            dow=S.ts.dt.dayofweek, doy=S.ts.dt.dayofyear)
           ).df.toPandas()
    g = got.sort_values("ts").reset_index(drop=True)
    w = pd.DataFrame(want).sort_values("ts").reset_index(drop=True)
    for c in ["yr", "mo", "dow", "doy"]:
        assert g[c].astype(int).tolist() == w[c].astype(int).tolist(), c


def test_parity_pivot_longer_wider_roundtrip(spark):
    pytest.importorskip("sqlalchemy")  # reference pivot imports it
    from siuba.experimental.pivot import pivot_longer as ref_pl, pivot_wider as ref_pw
    wide = pd.DataFrame({"id": [1, 2], "x_a": [1.0, 2.0], "x_b": [3.0, 4.0]})
    want_long = wide >> ref_pl(~R.id, names_to="k", values_to="v")
    t = ours.tbl(spark.createDataFrame(wide))
    got_long = (t >> ours.pivot_longer(~S.id, names_to="k", values_to="v")).df.toPandas()
    pd.testing.assert_frame_equal(_norm(got_long), _norm(pd.DataFrame(want_long)),
                                  check_dtype=False)
    want_back = want_long >> ref_pw(names_from=R.k, values_from=R.v)
    got_back = (ours.tbl(spark.createDataFrame(got_long))
                >> ours.pivot_wider(names_from=S.k, values_from=S.v)).df.toPandas()
    pd.testing.assert_frame_equal(_norm(got_back), _norm(pd.DataFrame(want_back)),
                                  check_dtype=False)


def test_parity_semi_anti(spark):
    keep = pd.DataFrame({"g": ["a"]})
    want_semi = PDF >> ref.semi_join(R, keep)
    want_anti = PDF >> ref.anti_join(R, keep)
    t = ours.tbl(spark.createDataFrame(PDF))
    k = ours.tbl(spark.createDataFrame(keep))
    got_semi = (t >> ours.semi_join(k, on="g")).df.toPandas()
    got_anti = (t >> ours.anti_join(k, on="g")).df.toPandas()
    pd.testing.assert_frame_equal(_norm(got_semi), _norm(pd.DataFrame(want_semi)),
                                  check_dtype=False)
    pd.testing.assert_frame_equal(_norm(got_anti), _norm(pd.DataFrame(want_anti)),
                                  check_dtype=False)


def test_parity_unite(spark):
    _both(spark,
          ref.unite("gs", R.g, R.s, sep=":") >> ref.select(R.gs, R.x),
          ours.unite("gs", S.g, S.s, sep=":") >> ours.select(S.gs, S.x))


def test_parity_expand_complete(spark):
    df = pd.DataFrame({"a": ["x", "x", "y"], "b": [1, 2, 1], "v": [1.0, 2.0, 3.0]})
    want = df >> ref.complete(R.a, R.b, fill={"v": 0.0})
    t = ours.tbl(spark.createDataFrame(df))
    got = (t >> ours.complete(S.a, S.b, fill={"v": 0.0})).df.toPandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(pd.DataFrame(want)),
                                  check_dtype=False)


def test_parity_str_family(spark):
    _both(spark,
          ref.mutate(a=R.s.str.contains("an"), b=R.s.str.startswith("A"),
                     c=R.s.str.strip().str.lower())
          >> ref.select(R.a, R.b, R.c),
          ours.mutate(a=S.s.str.contains("an"), b=S.s.str.startswith("A"),
                      c=S.s.str.strip().str.lower())
          >> ours.select(S.a, S.b, S.c))


def test_parity_coalesce_na_if_between(spark):
    from siuba.dply.vector import coalesce as rcoal, na_if as rna, between as rbet
    df = pd.DataFrame({"x": [1.0, None, 3.0], "y": [9.0, 8.0, 7.0]})
    want = df >> ref.mutate(c=rcoal(R.x, R.y), n=rna(R.y, 8.0), b=rbet(R.y, 7.5, 9.0))
    t = ours.tbl(spark.createDataFrame([(1.0, 9.0), (None, 8.0), (3.0, 7.0)],
                                       "x double, y double"))
    got = (t >> ours.mutate(c=ours.coalesce(S.x, S.y), n=ours.na_if(S.y, 8.0),
                            b=ours.between(S.y, 7.5, 9.0))).df.toPandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(pd.DataFrame(want)),
                                  check_dtype=False)


def test_parity_infix_methods(spark):
    _both(spark,
          ref.mutate(z1=R.x.add(R.y), z2=R.x.rsub(10.0), z3=R.x.mul(2),
                     z4=R.y.div(4), z5=R.x.ge(2.0)),
          ours.mutate(z1=S.x.add(S.y), z2=S.x.rsub(10.0), z3=S.x.mul(2),
                      z4=S.y.div(4), z5=S.x.ge(2.0)))


def test_parity_mutate_sequential_kwargs(spark):
    # later kwargs reference earlier ones (verbs.py:115-153)
    _both(spark,
          ref.mutate(z=R.x * 2, w=R.z + R.y),
          ours.mutate(z=S.x * 2, w=S.z + S.y))


def test_parity_group_by_kwargs_mutate_semantics(spark):
    _both(spark,
          ref.group_by(gl=R.s.str.len()) >> ref.summarize(m=R.x.mean()),
          ours.group_by(gl=S.s.str.len()) >> ours.summarize(m=S.x.mean()))


def test_parity_group_by_add_stacks(spark):
    _both(spark,
          ref.group_by(R.g) >> ref.group_by(R.y, add=True)
          >> ref.summarize(m=R.x.mean()),
          ours.group_by(S.g) >> ours.group_by(S.y, add=True)
          >> ours.summarize(m=S.x.mean()))


def test_parity_join_suffixes(spark):
    # shared non-key column x → _x/_y suffixes (sql/verbs/join.py:11-53)
    dim = pd.DataFrame({"g": ["a", "b"], "x": [100.0, 200.0]})
    want = PDF >> ref.inner_join(R, dim, on="g")
    t = ours.tbl(spark.createDataFrame(PDF))
    d = ours.tbl(spark.createDataFrame(dim))
    got = (t >> ours.inner_join(d, on="g")).df.toPandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(pd.DataFrame(want)),
                                  check_dtype=False)


def test_parity_full_join(spark):
    lhs = pd.DataFrame({"k": ["a", "b"], "l": [1.0, 2.0]})
    rhs = pd.DataFrame({"k": ["b", "c"], "r": [3.0, 4.0]})
    want = lhs >> ref.full_join(R, rhs, on="k")
    lt = ours.tbl(spark.createDataFrame(lhs))
    rt = ours.tbl(spark.createDataFrame(rhs))
    got = (lt >> ours.full_join(rt, on="k")).df.toPandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(pd.DataFrame(want)),
                                  check_dtype=False)


def test_parity_grouped_quantile(spark):
    _both(spark,
          ref.group_by(R.g) >> ref.summarize(q=R.x.quantile(0.5)),
          ours.group_by(S.g) >> ours.summarize(q=S.x.quantile(0.5)))


def test_parity_fct_recode_collapse(spark):
    from siuba.dply.forcats import fct_recode as rrec, fct_collapse as rcol
    df = pd.DataFrame({"v": ["a", "b", "c", "a"]})
    want = df >> ref.mutate(r=rrec(R.v, z="a"), c=rcol(R.v, {"ab": ["a", "b"]}))
    want["r"] = want["r"].astype(str)
    want["c"] = want["c"].astype(str)
    t = ours.tbl(spark.createDataFrame(df))
    got = (t >> ours.mutate(r=ours.fct_recode(S.v, z="a"),
                            c=ours.fct_collapse(S.v, {"ab": ["a", "b"]}))).df.toPandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(pd.DataFrame(want)),
                                  check_dtype=False)


def test_parity_diff_shift_cummean(spark):
    from siuba.dply.vector import cummean as rcm
    want = (PDF >> ref.group_by(R.g) >> ref.arrange(R.y)
            >> ref.mutate(d=R.x.diff(), sh=R.x.shift(1), cm=rcm(R.x))
            >> ref.ungroup())
    t = ours.tbl(spark.createDataFrame(PDF))
    got = (t >> ours.group_by(S.g) >> ours.arrange(S.y)
           >> ours.mutate(d=S.x.diff(), sh=S.x.shift(1), cm=S.x.cummean())
           >> ours.ungroup()).df.toPandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(pd.DataFrame(want)),
                                  check_dtype=False)


def test_parity_astype(spark):
    _both(spark,
          ref.mutate(xi=R.x.astype(int), ys=R.y.astype(str))
          >> ref.select(R.xi, R.ys),
          ours.mutate(xi=S.x.astype(int), ys=S.y.astype(str))
          >> ours.select(S.xi, S.ys))


def test_parity_select_negation_and_n(spark):
    from siuba.dply.vector import n as rn
    _both(spark,
          ref.select(~R.s) >> ref.mutate(cnt=rn(R)),
          ours.select(~S.s) >> ours.mutate(cnt=ours.n()))


def test_parity_extract_convert(spark):
    df = pd.DataFrame({"id": [1, 2], "s": ["a-1", "b-2"]})
    want = df >> ref.extract(R.s, into=["l", "d"],
                             regex="([a-z])-([0-9])", convert=True)
    t = ours.tbl(spark.createDataFrame(df))
    got = (t >> ours.extract(S.s, into=["l", "d"],
                             regex="([a-z])-([0-9])", convert=True)).df.toPandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(pd.DataFrame(want)),
                                  check_dtype=False)


def test_parity_dt_quarter_dim_month_start(spark):
    df = pd.DataFrame({"ts": pd.to_datetime(
        ["2020-01-01", "2020-02-29", "2021-12-31"])})
    want = df >> ref.mutate(q=R.ts.dt.quarter, dim=R.ts.dt.days_in_month,
                            ms=R.ts.dt.is_month_start)
    t = ours.tbl(spark.createDataFrame(df))
    got = (t >> ours.mutate(q=S.ts.dt.quarter, dim=S.ts.dt.days_in_month,
                            ms=S.ts.dt.is_month_start)).df.toPandas()
    g = got.sort_values("ts").reset_index(drop=True)
    w = pd.DataFrame(want).sort_values("ts").reset_index(drop=True)
    assert g["q"].astype(int).tolist() == w["q"].astype(int).tolist()
    assert g["dim"].astype(int).tolist() == w["dim"].astype(int).tolist()
    assert g["ms"].astype(bool).tolist() == w["ms"].astype(bool).tolist()


# -- forcats level order in arrange (reference: siuba/dply/forcats.py) -----

def _g_seq(res):
    """The sequence of g values after arrange — the observable level order."""
    if hasattr(res, "df"):  # SparkTbl — materialize (applies deferred sort)
        res = res.ordered_df().toPandas()
    return res["g"].tolist()


def test_parity_arrange_fct_reorder(spark):
    import numpy as np
    from siuba.dply.forcats import fct_reorder as ref_fct_reorder
    t = spark.createDataFrame(PDF)
    want = _g_seq(ref.arrange(PDF, ref_fct_reorder(R.g, R.x)))
    got = _g_seq(ours.arrange(ours.tbl(t), ours.fct_reorder(S.g, S.x)))
    assert got == want  # median: a=4, b=2 -> b first


def test_parity_arrange_fct_reorder_desc_and_func(spark):
    import numpy as np
    from siuba.dply.forcats import fct_reorder as ref_fct_reorder
    t = spark.createDataFrame(PDF)
    want = _g_seq(ref.arrange(PDF, ref_fct_reorder(R.g, R.x, np.max, desc=True)))
    got = _g_seq(ours.arrange(ours.tbl(t),
                              ours.fct_reorder(S.g, S.x, "max", desc=True)))
    assert got == want


def test_parity_arrange_fct_infreq(spark):
    from siuba.dply.forcats import fct_infreq as ref_fct_infreq
    t = spark.createDataFrame(PDF)
    want = _g_seq(ref.arrange(PDF.assign(g=ref_fct_infreq(PDF.g)), R.g))
    got = _g_seq(ours.arrange(ours.tbl(t), ours.fct_infreq(S.g)))
    assert got == want  # a (3) before b (2)


def test_parity_arrange_fct_rev(spark):
    from siuba.dply.forcats import fct_rev as ref_fct_rev
    t = spark.createDataFrame(PDF)
    want = _g_seq(ref.arrange(PDF.assign(g=ref_fct_rev(PDF.g)), R.g))
    got = _g_seq(ours.arrange(ours.tbl(t), ours.fct_rev(S.g)))
    assert got == want  # b before a


def test_parity_arrange_fct_inorder(spark):
    from siuba.dply.forcats import fct_inorder as ref_fct_inorder
    pdf = pd.DataFrame({"g": ["z", "m", "z", "a", "m", "z"],
                        "x": [1, 2, 3, 4, 5, 6]})
    t = spark.createDataFrame(pdf)
    want = _g_seq(ref.arrange(pdf.assign(g=ref_fct_inorder(pdf.g)), R.g))
    got = _g_seq(ours.arrange(ours.tbl(t), ours.fct_inorder(S.g)))
    assert got == want  # first-observed: z, m, a


# -- pivot_wider names_glue / values_fn dict (reference: pivot_wide.py) ----

MANY = pd.DataFrame({"id": [1, 1, 2, 2], "var": ["one", "two", "one", "two"],
                     "x": [1, 2, 3, 4], "y": [6, 7, 8, 9]})


def _ref_pivot_wider():
    """Import the reference pivot_wider WITHOUT running the pivot package
    __init__ (it imports sql_pivot_* -> sqlalchemy, absent here): pre-seed
    a stub package module so relative imports resolve against __path__."""
    import importlib
    import sys
    import types
    name = "siuba.experimental.pivot"
    if name not in sys.modules:
        import siuba.experimental  # noqa: F401 -- safe, no sqlalchemy
        pkg = types.ModuleType(name)
        pkg.__path__ = ["/root/reference/siuba/experimental/pivot"]
        sys.modules[name] = pkg
        setattr(sys.modules["siuba.experimental"], "pivot", pkg)
    return importlib.import_module(name + ".pivot_wide").pivot_wider


def test_parity_pivot_wider_names_glue(spark):
    ref_pw = _ref_pivot_wider()
    want = ref_pw(MANY, names_from=R.var, values_from=R[R.x, R.y],
                  names_glue="{variable}_X_{value}")
    t = spark.createDataFrame(MANY)
    got = ours.pivot_wider(ours.tbl(t), names_from="var",
                           values_from=["x", "y"],
                           names_glue="{variable}_X_{value}").df.toPandas()
    assert sorted(got.columns) == sorted(want.columns)
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


def test_parity_pivot_wider_values_fn_dict(spark):
    ref_pw = _ref_pivot_wider()
    dup = pd.DataFrame({"g": ["a", "a", "a", "b"], "k": ["x", "x", "y", "x"],
                        "v": [1.0, 3.0, 5.0, 7.0], "w": [2.0, 4.0, 6.0, 8.0]})
    want = ref_pw(dup, id_cols=R.g, names_from=R.k,
                  values_from=R[R.v, R.w],
                  values_fn={"v": "mean", "w": "max"})
    t = spark.createDataFrame(dup)
    got = ours.pivot_wider(ours.tbl(t), id_cols="g", names_from="k",
                           values_from=["v", "w"],
                           values_fn={"v": "mean", "w": "max"}).df.toPandas()
    assert sorted(got.columns) == sorted(want.columns)
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


def test_parity_build_longer_spec_name_parsing(spark):
    """Spec frames match the reference builder column-for-column on
    names_sep, names_pattern, prefix, and .value parsing."""
    import importlib
    ref_mod = (_ref_pivot_wider(), importlib.import_module(
        "siuba.experimental.pivot.pivot_long"))[1]
    ref_build = ref_mod.build_longer_spec

    wide = pd.DataFrame({"id": [1], "x_1": [1.0], "x_2": [2.0],
                         "y_1": [3.0], "y_2": [4.0]})
    t = ours.tbl(spark.createDataFrame(wide))

    cases = [
        dict(names_to=(".value", "set"), names_sep="_"),
        dict(names_to=("v", "set"), names_sep="_"),
        dict(names_to=("v", "set"), names_pattern=r"(.)_(.)"),
    ]
    for kw in cases:
        want = ref_build(wide, R.x_1, R.x_2, R.y_1, R.y_2, **kw)
        got = ours.build_longer_spec(t, S.x_1, S.x_2, S.y_1, S.y_2, **kw)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True),
            check_dtype=False)

    # names_prefix stripping
    pref = pd.DataFrame({"id": [1], "wk1": [1], "wk2": [2]})
    tp = ours.tbl(spark.createDataFrame(pref))
    want = ref_build(pref, R.wk1, R.wk2, names_to="week", names_prefix="wk")
    got = ours.build_longer_spec(tp, S.wk1, S.wk2, names_to="week",
                                 names_prefix="wk")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_parity_fct_lump_variants(spark):
    from siuba.dply.forcats import fct_lump as ref_lump
    pdf = pd.DataFrame({
        "i": range(7),
        "g": ["a", "a", "a", "b", "b", "c", "d"],
        "w": [1.0, 1.0, 1.0, 5.0, 5.0, 1.0, 1.0],
    })
    t = ours.tbl(spark.createDataFrame(pdf))

    def got(expr):
        out = (t >> ours.mutate(l=expr)).df.toPandas()
        return out.sort_values("i")["l"].tolist()

    # negative n keeps the LEAST frequent levels
    assert got(ours.fct_lump(S.g, n=-2)) == list(ref_lump(pdf.g, n=-2))
    # prop keeps levels above a frequency share
    assert got(ours.fct_lump(S.g, prop=0.3)) == list(ref_lump(pdf.g, prop=0.3))
    # weighted counts
    assert got(ours.fct_lump(S.g, n=1, w=S.w)) == list(ref_lump(pdf.g, n=1, w=pdf.w))


def test_parity_pivot_wider_names_vary_slowest(spark):
    ref_pw = _ref_pivot_wider()
    want = ref_pw(MANY, names_from=R.var, values_from=R[R.x, R.y],
                  names_vary="slowest")
    t = spark.createDataFrame(MANY)
    got = ours.pivot_wider(ours.tbl(t), names_from="var",
                           values_from=["x", "y"],
                           names_vary="slowest").df.toPandas()
    assert got.columns.tolist() == want.columns.tolist()  # exact order parity
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


def test_parity_across_contexts(spark):
    """across() in mutate / summarize / filter matches the reference
    engine (model: reference siuba/tests/test_verb_across.py)."""
    from siuba.dply.across import across as r_across
    from siuba.siu import Fx as RFx
    from siuba_spark import Fx as SFx, across as s_across

    pdf = pd.DataFrame({"g": ["a", "a", "b"], "x": [1.0, 3.0, 10.0],
                        "y": [2.0, 4.0, 20.0]})
    t = ours.tbl(spark.createDataFrame(pdf))

    # mutate
    want = ref.mutate(pdf, r_across(R[R.x, R.y], RFx * 2, names="{col}_dbl"))
    got = (t >> ours.mutate(s_across(S[S.x, S.y], SFx * 2,
                                     names="{col}_dbl"))).df.toPandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)

    # grouped summarize with fn dict
    want = ref.summarize(ref.group_by(pdf, R.g),
                         r_across(R[R.x, R.y], {"m": RFx.mean()}))
    got = (t >> ours.group_by(S.g)
           >> ours.summarize(s_across(S[S.x, S.y], {"m": SFx.mean()}))
           ).df.toPandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)

    # filter (if_all)
    want = ref.filter(pdf, r_across(R[R.x, R.y], RFx > 2))
    got = (t >> ours.filter(s_across(S[S.x, S.y], SFx > 2))).df.toPandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


def test_parity_str_dt_accessor_sweep(spark):
    """~20 .str/.dt ops through BOTH engines on the same frame — pandas
    semantics are the ground truth the DuckDB matrix can't fully pin
    (e.g. Monday-0 weekday, capitalize, zfill)."""
    pdf = pd.DataFrame({
        "i": range(4),
        "s": ["Apple pie", " Banana ", "e33", "date Nut"],
        "t": pd.to_datetime(["2020-01-01 00:00:00", "2020-02-29 23:59:59",
                             "2021-12-31 12:30:45", "2020-06-15 08:05:30"]),
    })
    t = ours.tbl(spark.createDataFrame(pdf))

    exprs = {
        "lo": lambda c: c.s.str.lower(),
        "up": lambda c: c.s.str.upper(),
        "ln": lambda c: c.s.str.len(),
        "st": lambda c: c.s.str.strip(),
        "cap": lambda c: c.s.str.capitalize(),
        "sw": lambda c: c.s.str.startswith("A"),
        "ct": lambda c: c.s.str.contains("[ae]"),
        "sl": lambda c: c.s.str.slice(1, 4),
        "sn": lambda c: c.s.str.slice(-3),
        "sm": lambda c: c.s.str.slice(-5, 6),
        "sm2": lambda c: c.s.str.slice(-20, 3),
        "zf": lambda c: c.s.str.zfill(12),
        "yr": lambda c: c.t.dt.year,
        "mo": lambda c: c.t.dt.month,
        "dw": lambda c: c.t.dt.dayofweek,
        "dy": lambda c: c.t.dt.dayofyear,
        "dm": lambda c: c.t.dt.days_in_month,
        "ms": lambda c: c.t.dt.is_month_start,
        "me": lambda c: c.t.dt.is_month_end,
        "sf": lambda c: c.t.dt.strftime("%Y-%m"),
        "nm": lambda c: c.t.dt.month_name(),
        "dn": lambda c: c.t.dt.day_name(),
    }
    want = ref.mutate(pdf, **{k: f(R) for k, f in exprs.items()})
    got = (t >> ours.mutate(**{k: f(S) for k, f in exprs.items()})) \
        .df.toPandas()
    got = got.sort_values("i").reset_index(drop=True)
    want = want.sort_values("i").reset_index(drop=True)
    for k in exprs:
        a, b = got[k], want[k]
        if b.dtype.kind in "iu":
            a, b = a.astype("int64"), b.astype("int64")
        assert a.tolist() == b.tolist(), (k, a.tolist(), b.tolist())


def test_parity_str_dt_long_tail(spark):
    """Round-3 registry long tail: translate/swapcase/just/center/
    removeprefix/rfind/istitle + dt.is_leap_year/microsecond + timedelta
    field properties — pandas is the ground truth."""
    pdf = pd.DataFrame({
        "i": range(4),
        "s": ["Hello World", "aBc1", "", "xyzx"],
        "t": pd.to_datetime(["2024-02-29 10:30:15.123456", "2023-01-01 00:00:00",
                             "2000-02-29 23:59:59.5", "1999-07-04 12:00:00"],
                            format="mixed"),
        "a": pd.to_datetime(["2024-01-02 03:00:00", "2024-01-01 00:00:00",
                             "2024-03-01 00:00:01", "2023-12-31 23:59:59"],
                            format="mixed"),
        "b": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 01:30:00.5",
                             "2024-02-29 23:59:59", "2024-01-01 00:00:00"],
                            format="mixed"),
    })
    t = ours.tbl(spark.createDataFrame(pdf))
    table = {ord("l"): "L", ord("o"): None}

    exprs = {
        "tr": (lambda c: c.s.str.translate(table),
               lambda c: c.s.str.translate({"l": "L", ord("o"): None})),
        "sw": (lambda c: c.s.str.swapcase(),) * 2,
        "nu": (lambda c: c.s.str.isnumeric(),) * 2,
        "an": (lambda c: c.s.str.isalnum(),) * 2,
        "ti": (lambda c: c.s.str.istitle(),) * 2,
        "rp": (lambda c: c.s.str.removeprefix("He"),) * 2,
        "rs": (lambda c: c.s.str.removesuffix("x"),) * 2,
        "rf": (lambda c: c.s.str.rfind("x"),) * 2,
        "lj": (lambda c: c.s.str.ljust(6, "."),) * 2,
        "rj": (lambda c: c.s.str.rjust(6, "."),) * 2,
        "ce": (lambda c: c.s.str.center(8, "*"),) * 2,
        "ly": (lambda c: c.t.dt.is_leap_year,) * 2,
        "us": (lambda c: c.t.dt.microsecond,) * 2,
        "tdd": (lambda c: (c.a - c.b).dt.days,) * 2,
        "tds": (lambda c: (c.a - c.b).dt.seconds,) * 2,
        "tdu": (lambda c: (c.a - c.b).dt.microseconds,) * 2,
        "mp": (lambda c: c.s.str.len().map({4: "four", 11: "eleven"}),) * 2,
        "sr": (lambda c: c.s.str.slice_replace(1, 3, "XY"),) * 2,
    }
    want = ref.mutate(pdf, **{k: fns[0](R) for k, fns in exprs.items()})
    got = (t >> ours.mutate(**{k: fns[1](S) for k, fns in exprs.items()})) \
        .df.toPandas()
    got = got.sort_values("i").reset_index(drop=True)
    want = want.sort_values("i").reset_index(drop=True)
    for k in exprs:
        a, b = got[k], want[k]
        if b.dtype.kind in "iu":
            a, b = a.astype("int64"), b.astype("int64")
        elif b.dtype.kind == "O":
            b = b.where(b.notna(), None)  # pandas NaN == our NULL
        assert a.tolist() == b.tolist(), (k, a.tolist(), b.tolist())


# -- randomized pipeline fuzzing: both engines, same pipeline --------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hst

_STAGES = {
    "mutate_arith": (lambda C: ref.mutate(z=C.x * 2 + C.y),
                     lambda C: ours.mutate(z=C.x * 2 + C.y)),
    "mutate_abs": (lambda C: ref.mutate(z=(C.x - C.y).abs()),
                   lambda C: ours.mutate(z=(C.x - C.y).abs())),
    "filter_pos": (lambda C: ref.filter(C.x > 0),
                   lambda C: ours.filter(C.x > 0)),
    "filter_xy": (lambda C: ref.filter(C.x <= C.y),
                  lambda C: ours.filter(C.x <= C.y)),
    "grouped_mean": (lambda C: ref.group_by(C.g) >> ref.mutate(m=C.x.mean())
                     >> ref.ungroup(),
                     lambda C: ours.group_by(C.g) >> ours.mutate(m=C.x.mean())
                     >> ours.ungroup()),
    "grouped_sum": (lambda C: ref.group_by(C.g)
                    >> ref.summarize(s=C.x.sum(), n_rows=C.x.count()),
                    lambda C: ours.group_by(C.g)
                    >> ours.summarize(s=C.x.sum(), n_rows=C.x.count())),
    "distinct_g": (lambda C: ref.distinct(C.g), lambda C: ours.distinct(C.g)),
    "select_gx": (lambda C: ref.select(C.g, C.x),
                  lambda C: ours.select(C.g, C.x)),
    "arrange_head": (lambda C: ref.arrange(-C.x, C.g) >> ref.head(5),
                     lambda C: ours.arrange(-C.x, C.g) >> ours.head(5)),
    "if_else_band": (lambda C: ref.mutate(band=ref.if_else(C.x > 0, "pos", "neg")),
                     lambda C: ours.mutate(band=ours.if_else(C.x > 0, "pos", "neg"))),
    "gather_xy": (lambda C: ref.gather("k", "v", C.x, C.y),
                  lambda C: ours.gather("k", "v", C.x, C.y)),
    "unite_gk": (lambda C: ref.unite("gk", C.g),
                 lambda C: ours.unite("gk", C.g)),
    "count_g": (lambda C: ref.count(C.g),
                lambda C: ours.count(C.g)),
    # cross-implementation equivalence: reference top_n(2) == slice_max(n=2)
    # (both keep ties via min-rank semantics)
    "top2_vs_slice_max": (lambda C: ref.top_n(2, C.x),
                          lambda C: ours.slice_max(C.x, n=2)),
    # round-6 widening: branching, grouped filter, window count, NULL intro
    "case_when_sign": (
        lambda C: ref.mutate(s=ref.case_when(
            C, {C.x > 0: "pos", C.x < 0: "neg", True: "zero"})),
        lambda C: ours.mutate(s=ours.case_when(
            {C.x > 0: "pos", C.x < 0: "neg", True: "zero"}))),
    "grouped_filter_max": (
        lambda C: ref.group_by(C.g) >> ref.filter(C.x == C.x.max())
        >> ref.ungroup(),
        lambda C: ours.group_by(C.g) >> ours.filter(C.x == C.x.max())
        >> ours.ungroup()),
    "add_count_g": (lambda C: ref.add_count(C.g),
                    lambda C: ours.add_count(C.g)),
    "na_if_zero": (lambda C: ref.mutate(
        z=__import__("siuba.dply.vector", fromlist=["na_if"]).na_if(C.x, 0)),
        lambda C: ours.mutate(z=ours.na_if(C.x, 0))),
    "transmute_xy": (lambda C: ref.transmute(r=C.x + C.y),
                     lambda C: ours.transmute(r=C.x + C.y)),
    # round-7 widening: double-reference aggregates (exercises WPool CSE),
    # two-sided grouped filter bounds (pooled window conds), coalesce,
    # grouped lead over arrange state
    "double_mean_ref": (
        lambda C: ref.group_by(C.g)
        >> ref.mutate(d=(C.x - C.x.mean()) * (C.x - C.x.mean()))
        >> ref.ungroup(),
        lambda C: ours.group_by(C.g)
        >> ours.mutate(d=(C.x - C.x.mean()) * (C.x - C.x.mean()))
        >> ours.ungroup()),
    "filter_two_bounds": (
        lambda C: ref.group_by(C.g)
        >> ref.filter(C.x >= C.x.min(), C.x > C.x.mean() - 100)
        >> ref.ungroup(),
        lambda C: ours.group_by(C.g)
        >> ours.filter(C.x >= C.x.min(), C.x > C.x.mean() - 100)
        >> ours.ungroup()),
    "coalesce_xy": (
        lambda C: ref.mutate(z=__import__(
            "siuba.dply.vector", fromlist=["coalesce"]).coalesce(C.x, C.y)),
        lambda C: ours.mutate(z=ours.coalesce(C.x, C.y))),
    "grouped_shift": (
        lambda C: ref.arrange(C.x, C.y) >> ref.group_by(C.g)
        >> ref.mutate(p=C.x.shift(1)) >> ref.ungroup(),
        lambda C: ours.arrange(C.x, C.y) >> ours.group_by(C.g)
        >> ours.mutate(p=C.x.shift(1)) >> ours.ungroup()),
}
_TERMINAL = {"grouped_sum", "distinct_g", "select_gx", "arrange_head",
             "gather_xy", "unite_gk", "count_g", "transmute_xy"}


from hypothesis import example


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=hst.lists(
        hst.tuples(hst.sampled_from("abc"),
                   hst.integers(-50, 50), hst.integers(-50, 50)),
        min_size=1, max_size=15),
    ops=hst.lists(hst.sampled_from(sorted(_STAGES)), min_size=1, max_size=3),
)
# pinned reference-pandas-engine quirks (found by this fuzz in round 5):
# 1. if_else after filter: ref if_else builds its result Series on a
#    RangeIndex and pandas re-aligns it against the filtered frame's
#    surviving index (/root/reference/siuba/dply/verbs.py:1083-1086 class
#    of bug) -> NaN for rows whose positional index changed.  The SQL
#    semantics (and this engine) have no row index; we neutralize the
#    quirk by resetting the pandas index between stages.
@example(rows=[("a", 0, 0), ("a", 1, 0)], ops=["filter_pos", "if_else_band"])
# 2. grouped summarize on an EMPTY frame: pandas groupby-apply never calls
#    the agg fn, so the ref returns the ORIGINAL columns (g, x, y); the
#    SQL engines produce the declared empty agg schema (g, s, n_rows).
@example(rows=[("a", 0, 0)], ops=["filter_pos", "grouped_sum"])
def test_fuzz_pipelines_match_reference(spark, rows, ops):
    """Random verb pipelines produce identical results in both engines."""
    # terminal stages change the column set; keep them last only
    ops = [o for o in ops[:-1] if o not in _TERMINAL] + [ops[-1]]
    pdf = pd.DataFrame(rows, columns=["g", "xi", "yi"]).assign(
        x=lambda d: d.xi.astype(float), y=lambda d: d.yi.astype(float)
    )[["g", "x", "y"]]
    t = ours.tbl(spark.createDataFrame(pdf))

    want = pdf
    for o in ops:
        want = want >> _STAGES[o][0](R)
        # neutralize pandas index-alignment quirks (pinned example 1):
        # downstream vector ops in the ref engine mis-align on a
        # post-filter non-contiguous index; SQL rows carry no index.
        if isinstance(want, pd.DataFrame):
            want = want.reset_index(drop=True)
    got = t
    for o in ops:
        got = got >> _STAGES[o][1](S)
    got = got.df.toPandas()

    if len(want) == 0:
        # pandas-engine quirk: grouped mutate on an EMPTY frame does not
        # create the new column (groupby-apply on empty input), while the
        # SQL engines (and this engine) produce a typed empty column.
        # The reference's own SQL tests sidestep empty-group cases; here
        # assert emptiness + that our columns are a superset.
        assert len(got) == 0, (ops,)
        if ops[-1] in ("grouped_sum", "count_g") \
                and list(want.columns) == ["g", "x", "y"]:
            # pinned example 2: ref groupby-apply on empty input returned
            # the untouched input frame; its column set is meaningless.
            return
        assert set(want.columns) <= set(got.columns), (ops,)
        return

    assert sorted(got.columns) == sorted(want.columns), (ops,)
    a, b = _norm(got), _norm(want)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_parity_rank_na_option(spark):
    from siuba.dply.vector import min_rank as ref_min_rank
    pdf = pd.DataFrame({"i": range(4), "x": [2.0, 1.0, None, 2.0]})
    t = ours.tbl(spark.createDataFrame(
        [(0, 2.0), (1, 1.0), (2, None), (3, 2.0)], "i long, x double"))
    for opt in ["keep", "top", "bottom"]:
        want = list(ref_min_rank(pdf.x, na_option=opt))
        got = (t >> ours.mutate(r=ours.min_rank(S.x, na_option=opt))) \
            .df.toPandas().sort_values("i")["r"].tolist()
        assert got == pytest.approx(want, nan_ok=True), opt


def test_parity_between_default(spark):
    from siuba.dply.vector import between as ref_between
    pdf = pd.DataFrame({"i": range(3), "x": [1.0, None, 7.0]})
    t = ours.tbl(spark.createDataFrame(
        [(0, 1.0), (1, None), (2, 7.0)], "i long, x double"))
    want = list(ref_between(pdf.x, 0, 5, default=False))
    got = (t >> ours.mutate(b=ours.between(S.x, 0, 5, default=False))) \
        .df.toPandas().sort_values("i")["b"].tolist()
    assert got == want


# -- round-8 API surface: the reference is the oracle -------------------------

def test_parity_select_positions_and_eq_rename(spark):
    """select(0, 1), select('name'), and the `_.new == _.old` rename form
    (reference select doc examples)."""
    _both(spark,
          ref.select(0, 1),
          ours.select(0, 1))
    _both(spark,
          ref.select(R.gg == R.g, "x"),
          ours.select(S.gg == S.g, "x"))


def test_parity_transmute_positional(spark):
    """transmute positional selects + named mutate (transmute doc)."""
    _both(spark,
          ref.transmute(R.g, R.x, xy=R.x * R.y),
          ours.transmute(S.g, S.x, xy=S.x * S.y))


def test_parity_lambda_columns(spark):
    """lambda column definitions in mutate/filter/summarize (programming
    guide: 'both these forms work')."""
    _both(spark,
          ref.mutate(d=lambda d: d.x - d.x.mean())
          >> ref.filter(lambda d: d.y > 10),
          ours.mutate(d=lambda d: d.x - d.x.mean())
          >> ours.filter(lambda d: d.y > 10))
    _both(spark,
          ref.group_by(R.g) >> ref.summarize(m=lambda d: d.x.mean()),
          ours.group_by(S.g) >> ours.summarize(m=lambda d: d.x.mean()))


def test_parity_explicit_pipe_placeholder(spark):
    """verb(_, ...) explicit pipes (programming guide 'Pipeable class')."""
    want = PDF >> ref.mutate(R, z=R.x + 1)
    t = ours.tbl(spark.createDataFrame(PDF))
    got = (t >> ours.mutate(S, z=S.x + 1)).df.toPandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


def test_parity_symbolic_caveats():
    """Both engines refuse truthiness and containment on symbolics."""
    for sym in (R, S):
        with pytest.raises(TypeError):
            sym and 1
        with pytest.raises(TypeError):
            1 in sym
