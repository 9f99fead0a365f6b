"""Window/vector function tests (reference model:
siuba/tests/test_dply_vector.py): ranks, offsets, cumulatives,
positional, null-handling."""

import math

import pandas as pd
import pytest

from siuba_spark import (
    _, arrange, group_by, mutate, ungroup, row_number, min_rank, dense_rank,
    percent_rank, ntile, lead, lag, nth, first, last, coalesce, na_if,
    between, str_c, floor_date, ceil_date,
)
from .helpers import data_frame


def _col(tbl, name, sort_by=None):
    pdf = tbl.df.toPandas()
    if sort_by:
        pdf = pdf.sort_values(sort_by)
    return list(pdf[name])


def test_row_number_follows_arrange(spark):
    t = data_frame(spark, x=[30, 10, 20])
    out = t >> arrange(_.x) >> mutate(rn=row_number(_))
    assert _col(out, "rn", "x") == [1, 2, 3]


def test_min_rank_ties_and_nulls(spark):
    t = data_frame(spark, x=[1.0, 2.0, 2.0, None])
    out = t >> mutate(r=min_rank(_.x))
    got = out.df.toPandas().sort_values("x", na_position="last")
    assert list(got.r[:3]) == [1, 2, 2]
    assert pd.isna(got.r.iloc[3])  # NULLs unranked, like pandas


def test_dense_rank_desc(spark):
    t = data_frame(spark, x=[10, 20, 20, 30])
    out = t >> mutate(r=dense_rank(-_.x))
    assert _col(out, "r", "x") == [3, 2, 2, 1]


def test_ranks_partition_by_group(spark):
    t = data_frame(spark, g=["a", "a", "b"], x=[2, 1, 5])
    out = t >> group_by(_.g) >> mutate(r=min_rank(_.x)) >> ungroup()
    got = out.df.toPandas().sort_values(["g", "x"])
    assert list(got.r) == [1, 2, 1]


def test_ntile_buckets(spark):
    t = data_frame(spark, x=[1, 2, 3, 4])
    out = t >> arrange(_.x) >> mutate(q=ntile(_, 2))
    assert _col(out, "q", "x") == [1, 1, 2, 2]


def test_lead_lag_default(spark):
    t = data_frame(spark, x=[1, 2, 3])
    out = t >> arrange(_.x) >> mutate(p=lag(_.x), f=lead(_.x))
    got = out.df.toPandas().sort_values("x")
    assert pd.isna(got.p.iloc[0]) and list(got.p[1:]) == [1, 2]
    assert list(got.f[:2]) == [2, 3] and pd.isna(got.f.iloc[2])


def test_lag_n_and_default(spark):
    t = data_frame(spark, x=[1, 2, 3])
    out = t >> arrange(_.x) >> mutate(p=lag(_.x, 2, default=-1))
    assert _col(out, "p", "x") == [-1, -1, 1]


def test_cumulatives(spark):
    t = data_frame(spark, x=[1, 2, 3])
    out = (t >> arrange(_.x)
           >> mutate(cs=_.x.cumsum(), cm=_.x.cummax(), cn=_.x.cummin(),
                     ca=_.x.cummean()))
    got = out.df.toPandas().sort_values("x")
    assert list(got.cs) == [1, 3, 6]
    assert list(got.cm) == [1, 2, 3]
    assert list(got.cn) == [1, 1, 1]
    assert list(got.ca) == [1.0, 1.5, 2.0]


def test_diff_pct_change(spark):
    t = data_frame(spark, x=[1.0, 2.0, 4.0])
    out = t >> arrange(_.x) >> mutate(d=_.x.diff(), p=_.x.pct_change())
    got = out.df.toPandas().sort_values("x")
    assert pd.isna(got.d.iloc[0]) and list(got.d[1:]) == [1.0, 2.0]
    assert list(got.p[1:]) == [1.0, 1.0]


def test_ffill_bfill(spark):
    t = data_frame(spark, i=[1, 2, 3], x=[1.0, None, 3.0])
    out = t >> arrange(_.i) >> mutate(f=_.x.ffill(), b=_.x.bfill())
    got = out.df.toPandas().sort_values("i")
    assert list(got.f) == [1.0, 1.0, 3.0]
    assert list(got.b) == [1.0, 3.0, 3.0]


def test_nth_first_last(spark):
    t = data_frame(spark, i=[1, 2, 3], x=["a", "b", "c"])
    out = (t >> arrange(_.i)
           >> mutate(f=first(_.x), l=last(_.x), n1=nth(_.x, 1)))
    got = out.df.toPandas()
    assert set(got.f) == {"a"} and set(got.l) == {"c"} and set(got.n1) == {"b"}


def test_rank_method_average(spark):
    # pandas .rank(): ties get averaged rank
    t = data_frame(spark, x=[1, 2, 2, 3])
    out = t >> mutate(r=_.x.rank())
    assert _col(out, "r", "x") == [1.0, 2.5, 2.5, 4.0]


def test_coalesce_na_if_between(spark):
    t = data_frame(spark, x=[1.0, None], y=[9.0, 9.0])
    out = t >> mutate(c=coalesce(_.x, _.y), ni=na_if(_.y, 9.0),
                      bw=between(_.y, 5, 10))
    got = out.df.toPandas().sort_values("x", na_position="last")
    assert list(got.c) == [1.0, 9.0]
    assert got.ni.isna().all()
    assert list(got.bw) == [True, True]


def test_str_c(spark):
    t = data_frame(spark, a=["x"], b=[1])
    out = t >> mutate(j=str_c(_.a, _.b, sep="-"))
    assert out.df.collect()[0].j == "x-1"


def test_floor_ceil_date(spark):
    t = data_frame(spark, d=pd.to_datetime(["2024-03-15 13:45:00"]))
    out = t >> mutate(fm=floor_date(_.d, "month").dt.strftime("%Y-%m-%d"),
                      cm=ceil_date(_.d, "month").dt.strftime("%Y-%m-%d"))
    row = out.df.collect()[0]
    assert row.fm == "2024-03-01" and row.cm == "2024-04-01"


def test_str_accessor_chain(spark):
    t = data_frame(spark, s=["  Hello World  "])
    out = t >> mutate(x=_.s.str.strip().str.lower(),
                      n=_.s.str.strip().str.len())
    row = out.df.collect()[0]
    assert row.x == "hello world" and row.n == 11


def test_dt_accessor(spark):
    t = data_frame(spark, d=pd.to_datetime(["2024-01-01"]))  # a Monday
    out = t >> mutate(dow=_.d.dt.dayofweek, y=_.d.dt.year, q=_.d.dt.quarter)
    row = out.df.collect()[0]
    assert row.dow == 0 and row.y == 2024 and row.q == 1  # Monday=0 shim


def test_call_column_level_escape_hatch(spark):
    from pyspark.sql import functions as F
    from siuba_spark import call
    t = data_frame(spark, s=["ab", "cd"])
    out = mutate(t, up=call(lambda c: F.upper(c), _.s))
    assert sorted(r.up for r in out.df.collect()) == ["AB", "CD"]


def test_py_func_pandas_udf_escape_hatch(spark):
    from siuba_spark import py_func
    clip01 = py_func(lambda s: s.clip(0.0, 1.0), returns="double")
    t = data_frame(spark, x=[-0.5, 0.25, 7.0])
    out = mutate(t, x01=clip01(_.x))
    assert sorted(r.x01 for r in out.df.collect()) == [0.0, 0.25, 1.0]


def test_py_func_composes_with_groups(spark):
    # UDF output feeds a grouped aggregate — plan stays one ArrowEval + agg
    from siuba_spark import group_by, py_func, summarize
    neg = py_func(lambda s: -s, returns="double")
    t = data_frame(spark, g=["a", "a", "b"], x=[1.0, 2.0, 3.0])
    out = summarize(group_by(mutate(t, nx=neg(_.x)), _.g), s=_.nx.sum())
    assert {(r.g, r.s) for r in out.df.collect()} == {("a", -3.0), ("b", -3.0)}


def test_dt_round_half_even_matches_pandas(spark):
    """dt.round ties (xx:30:00) round half-to-even on the unit count,
    exactly like pandas Series.dt.round."""
    import pandas as pd
    from siuba_spark import _, mutate, tbl
    ts = pd.Series(pd.to_datetime([
        "2020-01-01 00:30:00", "2020-01-01 01:30:00",  # hour ties
        "2020-01-01 12:00:00", "2020-01-02 12:00:00",  # day ties
        "2020-03-05 10:29:59", "2021-07-31 23:45:00",
    ]))
    pdf = pd.DataFrame({"t": ts})
    t = tbl(spark.createDataFrame(pdf))
    got = (t >> mutate(h=_.t.dt.round("H"), d=_.t.dt.round("D"))).df.toPandas()
    assert got["h"].tolist() == ts.dt.round("h").tolist()
    assert got["d"].tolist() == ts.dt.round("D").tolist()


def test_dt_components_fields(spark):
    import pandas as pd
    from siuba_spark import _, mutate, tbl
    pdf = pd.DataFrame({
        "a": pd.to_datetime(["2020-01-03 04:05:06.25"]),
        "b": pd.to_datetime(["2020-01-01 00:00:00"]),
    })
    t = tbl(spark.createDataFrame(pdf))
    got = (t >> mutate(c=(_.a - _.b).dt.components)).df.toPandas()["c"][0]
    want = (pdf.a - pdf.b).dt.components.iloc[0]
    assert got["days"] == want.days
    assert got["hours"] == want.hours
    assert got["minutes"] == want.minutes
    assert got["seconds"] == want.seconds
    assert got["milliseconds"] == want.milliseconds


def test_total_seconds_matches_pandas(spark):
    import pandas as pd
    from siuba_spark import _, mutate, tbl
    pdf = pd.DataFrame({
        "a": pd.to_datetime(["2020-01-02 03:04:05.5", "2019-12-31 23:00:00.0"]),
        "b": pd.to_datetime(["2020-01-01 00:00:00.0", "2020-01-01 00:00:00.0"]),
    })
    t = tbl(spark.createDataFrame(pdf))
    got = (t >> mutate(s=(_.a - _.b).dt.total_seconds())).df.toPandas()["s"]
    want = (pdf.a - pdf.b).dt.total_seconds()
    assert got.tolist() == want.tolist()  # includes a negative interval


def test_rank_all_methods_match_pandas(spark):
    import pandas as pd
    from siuba_spark import _, group_by, mutate, tbl, ungroup
    pdf = pd.DataFrame({"i": range(7),
                        "g": ["a", "a", "a", "a", "b", "b", "b"],
                        "x": [1.0, 1.0, 2.0, None, 5.0, 5.0, 5.0]})
    # literal tuples + schema so the missing value is a true SQL NULL
    # (pandas NaN is a float VALUE to Spark and ranks last, by design —
    # pdf.itertuples would re-introduce NaN)
    rows = [(0, "a", 1.0), (1, "a", 1.0), (2, "a", 2.0), (3, "a", None),
            (4, "b", 5.0), (5, "b", 5.0), (6, "b", 5.0)]
    t = tbl(spark.createDataFrame(rows, "i long, g string, x double"))
    for method in ["average", "min", "max", "dense", "first"]:
        for asc in (True, False):
            if method == "first" and not asc:
                continue  # encounter order under desc differs by engine
            got = (t >> group_by(_.g)
                   >> mutate(r=_.x.rank(method=method, ascending=asc))
                   >> ungroup()).df.toPandas().sort_values("i")["r"]
            want = pdf.groupby("g")["x"].rank(method=method, ascending=asc)
            assert got.tolist() == pytest.approx(want.tolist(), nan_ok=True), \
                (method, asc)


def test_rank_pct_matches_pandas(spark):
    import pandas as pd
    from siuba_spark import _, group_by, mutate, tbl, ungroup
    pdf = pd.DataFrame({"i": range(5), "g": ["a"] * 3 + ["b"] * 2,
                        "x": [3.0, 1.0, 2.0, 9.0, 8.0]})
    t = tbl(spark.createDataFrame(pdf))
    got = (t >> group_by(_.g) >> mutate(r=_.x.rank(pct=True))
           >> ungroup()).df.toPandas().sort_values("i")["r"]
    want = pdf.groupby("g")["x"].rank(pct=True)
    assert got.tolist() == pytest.approx(want.tolist())


def test_nth_first_last_order_by_in_summarize(spark):
    """nth/first/last with order_by= work inside summarize (the pandas
    reference honors order_by; SQL engines error without it)."""
    from siuba_spark import first, group_by, last, nth, summarize, tbl
    t = tbl(spark.createDataFrame(
        [("a", 3, 30.0), ("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 5.0)],
        "g string, i long, x double"))
    out = (t >> group_by(_.g)
           >> summarize(f=first(_.x, order_by=_.i),
                        l=last(_.x, order_by=_.i),
                        n1=nth(_.x, 1, order_by=_.i))).df
    got = {r.g: (r.f, r.l, r.n1) for r in out.collect()}
    assert got["a"] == (10.0, 30.0, 20.0)
    assert got["b"] == (5.0, 5.0, None)


def test_str_predicates_na_kwarg(spark):
    from siuba_spark import filter as sfilter, tbl
    t = tbl(spark.createDataFrame([(0, "apple"), (1, None), (2, "banana")],
                                  "i long, s string"))
    out = (t >> sfilter(_.s.str.contains("an", na=False))).df
    assert [r.i for r in out.collect()] == [2]
    got = (t >> mutate(sw=_.s.str.startswith("a", na=True))).df.toPandas() \
        .sort_values("i")["sw"].tolist()
    assert got == [True, True, False]


def test_dt_floor_round_multiples_match_pandas(spark):
    import pandas as pd
    from siuba_spark import _, mutate, tbl
    ts = pd.Series(pd.to_datetime([
        "2020-01-01 00:07:30", "2020-01-01 00:22:31", "2020-03-05 17:44:59",
    ]))
    t = tbl(spark.createDataFrame(pd.DataFrame({"t": ts})))
    got = (t >> mutate(f15=_.t.dt.floor("15T"), r15=_.t.dt.round("15T"),
                       f6h=_.t.dt.floor("6H"))).df.toPandas()
    assert got["f15"].tolist() == ts.dt.floor("15min").tolist()
    assert got["r15"].tolist() == ts.dt.round("15min").tolist()
    assert got["f6h"].tolist() == ts.dt.floor("6h").tolist()


def test_dt_components_negative_interval(spark):
    """pandas normalizes so only days is negative:
    Timedelta('-1h').components == (days=-1, hours=23, ...)."""
    import pandas as pd
    from siuba_spark import tbl
    pdf = pd.DataFrame({
        "a": pd.to_datetime(["2020-01-01 00:00:00", "2020-01-01 00:00:00"]),
        "b": pd.to_datetime(["2020-01-01 01:00:00", "2020-01-03 04:05:06.25"],
                            format="mixed"),
    })
    t = tbl(spark.createDataFrame(pdf))
    got = (t >> mutate(c=(_.a - _.b).dt.components)).df.toPandas()["c"]
    want = (pdf.a - pdf.b).dt.components
    for i in range(len(pdf)):
        for f in ("days", "hours", "minutes", "seconds", "milliseconds"):
            assert got[i][f] == getattr(want.iloc[i], f), (i, f)


def test_str_findall_capture_group(spark):
    """pandas findall returns the capture group content when the pattern
    has exactly one group (re.findall semantics)."""
    from siuba_spark import tbl
    pdf = pd.DataFrame({"s": ["a1b2", "x9", "none"]})
    t = tbl(spark.createDataFrame(pdf))
    got = (t >> mutate(m=_.s.str.findall(r"([a-z])\d"))).df.toPandas()["m"]
    want = pdf.s.str.findall(r"([a-z])\d")
    assert [list(g) for g in got] == [list(w) for w in want]
    # no groups: whole match, unchanged
    got0 = (t >> mutate(m=_.s.str.findall(r"[a-z]\d"))).df.toPandas()["m"]
    want0 = pdf.s.str.findall(r"[a-z]\d")
    assert [list(g) for g in got0] == [list(w) for w in want0]
    with pytest.raises(NotImplementedError):
        (t >> mutate(m=_.s.str.findall(r"([a-z])(\d)"))).df.collect()


def test_dt_round_floor_agree_non_utc(spark):
    """dt.round('D') and dt.floor('D')/date_trunc must agree on session-local
    midnights in a non-UTC session (ADVICE r2: round used UTC epoch math)."""
    import pandas as pd
    from siuba_spark import tbl
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        walls = ["2020-06-01 09:00:00", "2020-06-01 15:00:00"]
        pdf = pd.DataFrame({"t": pd.to_datetime(walls)})
        # timestamp literals parse in the session tz, so the Spark wall
        # clock matches pandas' naive wall clock
        t = tbl(spark.sql(" UNION ALL ".join(
            f"SELECT timestamp'{w}' AS t" for w in walls)))
        got = (t >> mutate(
            r=_.t.dt.round("D"), f=_.t.dt.floor("D"),
            f6=_.t.dt.floor("6H"), r6=_.t.dt.round("6H"),
        )).df.toPandas()
        # pandas naive semantics on the same wall clock
        assert got["r"].tolist() == pdf.t.dt.round("D").tolist()
        assert got["f"].tolist() == pdf.t.dt.floor("D").tolist()
        assert got["f6"].tolist() == pdf.t.dt.floor("6h").tolist()
        assert got["r6"].tolist() == pdf.t.dt.round("6h").tolist()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_rank_dense_pct_divides_by_distinct(spark):
    """pandas divides dense ranks by the DISTINCT value count:
    [1,1,2,3].rank('dense', pct=True) == [1/3, 1/3, 2/3, 1.0]."""
    t = data_frame(spark, x=[1.0, 1.0, 2.0, 3.0])
    got = sorted((t >> mutate(r=_.x.rank(method="dense", pct=True))
                  ).df.toPandas()["r"])
    want = sorted(pd.Series([1.0, 1.0, 2.0, 3.0]).rank(method="dense", pct=True))
    assert got == pytest.approx(want)


def test_first_last_desc_string_key_in_summarize(spark):
    """order_by=desc(string_col) in summarize must not use numeric negation
    (CAST_INVALID_INPUT under ANSI); comparator sort handles any type."""
    from siuba_spark import desc, first, group_by, last, summarize
    t = data_frame(spark, g=["a", "a", "b", "b"],
                   s=["x", "z", "m", "k"], v=[1, 2, 3, 4])
    out = (t >> group_by(_.g)
           >> summarize(fv=first(_.v, order_by=desc(_.s)),
                        lv=last(_.v, order_by=desc(_.s)))
           ).df.toPandas().sort_values("g").reset_index(drop=True)
    # group a sorted by s desc: z(2), x(1); group b: m(3), k(4)
    assert out.fv.tolist() == [2, 3]
    assert out.lv.tolist() == [1, 4]


def test_rolling_time_window_range_frame(spark):
    """rolling_*(col, '10S') uses a RANGE frame [t-10s, t] over epoch
    seconds of the arrange key (SQL closed-edge semantics)."""
    import pandas as pd

    from siuba_spark import arrange, group_by, mutate, rolling_sum, tbl, ungroup

    pdf = pd.DataFrame({
        "g": ["a"] * 4,
        "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:00:05",
                              "2024-01-01 00:00:10", "2024-01-01 00:00:21"]),
        "v": [1.0, 2.0, 4.0, 8.0],
    })
    t = tbl(spark.createDataFrame(pdf))
    out = (t >> group_by(_.g) >> arrange(_.ts)
           >> mutate(s=rolling_sum(_.v, "10S")) >> ungroup()
           ).df.toPandas().sort_values("ts")
    # [t-10, t] closed: row3 (t=10) includes t=0,5,10; row4 (t=21) only itself
    assert out.s.tolist() == [1.0, 3.0, 7.0, 8.0]


def test_rolling_time_window_requires_order(spark):
    import pytest as _pytest

    from siuba_spark import group_by, mutate, rolling_mean, tbl
    from siuba_spark.functions.lowering import TranslationError

    t = tbl(spark.createDataFrame([("a", 1.0)], "g string, v double"))
    with _pytest.raises(TranslationError):
        (t >> group_by(_.g) >> mutate(m=rolling_mean(_.v, "1H"))).df


def test_approx_aggs_within_tolerance(spark):
    from siuba_spark import group_by, summarize, tbl

    t = tbl(spark, "/root/testdata/sf0.001/lineitem.parquet")
    r = (t >> group_by(_.l_returnflag)
         >> summarize(exact=_.l_partkey.nunique(),
                      approx=_.l_partkey.approx_nunique(),
                      q=_.l_quantity.quantile(0.5),
                      qa=_.l_quantity.approx_quantile(0.5))
         ).df.toPandas()
    assert ((r.approx - r.exact).abs() / r.exact).max() < 0.1
    assert (r.q - r.qa).abs().max() <= 1.0


def test_cut_matches_pandas(spark):
    import pandas as pd

    from siuba_spark import cut, mutate, tbl

    pdf = pd.DataFrame({"x": [1.0, 5.0, 10.0, 15.0, 25.0, None]})
    t = tbl(spark.createDataFrame(pdf))
    out = (t >> mutate(
        b=cut(_.x, bins=[0, 10, 20], labels=["lo", "hi"]),
        c=cut(_.x, bins=[0, 10, 20]),
        d=cut(_.x, bins=[0, 10, 20], labels=False),
        e=cut(_.x, bins=[0, 10, 20], labels=["lo", "hi"], right=False),
    )).df.toPandas()
    asobj = lambda s: s.astype(object).where(s.notna(), None).tolist()
    assert out.b.tolist() == asobj(pd.cut(pdf.x, [0, 10, 20], labels=["lo", "hi"]))
    assert out.c.tolist() == [None if v == "nan" else v
                              for v in pd.cut(pdf.x, [0, 10, 20]).astype(str)]
    assert out.d.tolist()[:4] == pd.cut(pdf.x, [0, 10, 20], labels=False).tolist()[:4]
    assert out.e.tolist() == asobj(
        pd.cut(pdf.x, [0, 10, 20], labels=["lo", "hi"], right=False))


def test_qcut_matches_pandas(spark):
    import pandas as pd

    from siuba_spark import qcut, tbl

    pdf = pd.DataFrame({"x": [float(i) for i in range(1, 13)]})
    t = tbl(spark.createDataFrame(pdf))
    out = qcut(t, _.x, q=4, out="b", labels=False).df.toPandas().sort_values("x")
    assert out.b.tolist() == pd.qcut(pdf.x, 4, labels=False).tolist()
    out2 = qcut(t, _.x, q=3, out="b", labels=["s", "m", "l"]) \
        .df.toPandas().sort_values("x")
    assert out2.b.tolist() == pd.qcut(pdf.x, 3, labels=["s", "m", "l"]) \
        .astype(object).tolist()


def test_dt_to_period_matches_pandas(spark):
    import pandas as pd

    from siuba_spark import mutate, tbl

    pdf = pd.DataFrame({"ts": pd.to_datetime(
        ["2024-01-15 10:00:00", "2023-11-03 00:00:00", "2000-07-01 23:59:59"])})
    t = tbl(spark.createDataFrame(pdf))
    out = (t >> mutate(m=_.ts.dt.to_period("M"), q=_.ts.dt.to_period("Q"),
                       y=_.ts.dt.to_period("Y"), d=_.ts.dt.to_period("D"))
           ).df.toPandas()
    for f, c in [("M", "m"), ("Q", "q"), ("Y", "y"), ("D", "d")]:
        assert out[c].tolist() == pdf.ts.dt.to_period(f).astype(str).tolist(), f


def test_approx_aggregates_bounds(spark):
    """approx_n_distinct (HLL++) and approx_quantile (Greenwald-Khanna)
    — the sketch-state scale path next to exact nunique/quantile; error
    bounds asserted, plus the grouped-window broadcast context."""
    from siuba_spark import (
        _, approx_n_distinct, approx_quantile, group_by, mutate, summarize,
    )
    from .helpers import data_frame

    vals = [float(i % 97) for i in range(2000)]
    t = data_frame(spark, g=["a", "b"] * 1000, v=vals)
    out = (t >> summarize(nd=approx_n_distinct(_.v),
                          q50=approx_quantile(_.v, 0.5))
           ).df.collect()[0]
    assert abs(out.nd - 97) <= 97 * 0.15
    assert abs(out.q50 - 48.0) <= 2.0
    # method-style spellings and grouped window broadcast
    g = (t >> group_by(_.g)
         >> mutate(nd=approx_n_distinct(_.v, rsd=0.02))
         ).df.select("g", "nd").distinct().collect()
    assert all(abs(r.nd - 97) <= 97 * 0.1 for r in g)


def test_rolling_std_var_median_count(spark):
    """Rolling spread/median/count over the trailing n-row frame, vs
    pandas .rolling."""
    import pandas as pd

    from siuba_spark import (
        _, arrange, group_by, mutate, rolling_count, rolling_median,
        rolling_std, rolling_var, ungroup,
    )
    from .helpers import data_frame

    pdf = pd.DataFrame({
        "g": ["a"] * 5 + ["b"] * 4,
        "i": list(range(5)) + list(range(4)),
        "v": [1.0, 4.0, 2.0, 8.0, 5.0, 10.0, 3.0, None, 7.0]})
    t = data_frame(spark, **{c: pdf[c].tolist() for c in pdf.columns})
    got = (t >> group_by(_.g) >> arrange(_.i)
           >> mutate(s=rolling_std(_.v, 3, min_periods=2),
                     va=rolling_var(_.v, 3, min_periods=2),
                     md=rolling_median(_.v, 3, min_periods=1),
                     ct=rolling_count(_.v, 3, min_periods=1))
           >> ungroup()).df.orderBy("g", "i").toPandas()
    grp = pdf.groupby("g", group_keys=False)
    want_s = grp.apply(lambda d: d.sort_values("i").v.rolling(3, min_periods=2).std())
    want_md = grp.apply(lambda d: d.sort_values("i").v.rolling(3, min_periods=1).median())
    want_ct = grp.apply(lambda d: d.sort_values("i").v.rolling(3, min_periods=1).count())
    assert got.s.round(6).fillna(-1).tolist() == want_s.round(6).fillna(-1).tolist()
    assert got.md.fillna(-1).tolist() == want_md.fillna(-1).tolist()
    assert got.ct.tolist() == want_ct.astype("int64").tolist()


def test_rolling_std_large_magnitude(spark):
    """ADVICE r5: |x| ≥ 1e12 must not overflow the decimal(18,6) exact
    path — the magnitude gate falls back to double var_samp (no ANSI
    error, no silent NULLs)."""
    from siuba_spark import _, arrange, collect, mutate, rolling_std, rolling_var, tbl
    vals = [1e13, 2e13, 3e13, 4.0, 5.0, 6.0]
    t = tbl(spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, x double"))
    out = (t >> arrange(_.i)
           >> mutate(s=rolling_std(_.x, 3), v=rolling_var(_.x, 3))
           >> collect())
    import math
    assert math.isclose(out.s[2], 1e13)          # frame [1e13,2e13,3e13]
    assert math.isclose(out.v[4], 3.0e26)        # frame [3e13,4,5]
    assert math.isclose(out.s[5], 1.0)           # frame [4,5,6] — exact path
    assert out.s[:2].isna().all()


def test_consecutive_id(spark):
    """dplyr 1.1 consecutive_id: 1-based id incrementing whenever any
    argument changes between consecutive rows (arrange order, per group);
    NULL-safe (NA == NA does not increment); first row of every group is
    id 1."""
    from siuba_spark import _, arrange, collect, consecutive_id, group_by, mutate, tbl, ungroup
    rows = [("a", 1, "x"), ("a", 2, "x"), ("a", 3, "y"), ("a", 4, None),
            ("a", 5, None), ("a", 6, "y"), ("b", 1, None), ("b", 2, "z")]
    t = tbl(spark.createDataFrame(rows, "g string, i long, v string"))
    out = (t >> group_by(_.g) >> arrange(_.i)
           >> mutate(cid=consecutive_id(_.v)) >> ungroup()
           >> arrange(_.g, _.i) >> collect())
    assert out.cid.tolist() == [1, 1, 2, 3, 3, 4, 1, 2]
    # multi-column: change in EITHER column increments
    out2 = (t >> group_by(_.g) >> arrange(_.i)
            >> mutate(cid=consecutive_id(_.v, _.i % 2)) >> ungroup()
            >> arrange(_.g, _.i) >> collect())
    assert out2.cid.tolist() == [1, 2, 3, 4, 5, 6, 1, 2]
    # outside mutate: clear error
    import pytest as _pt
    from siuba_spark import summarize
    from siuba_spark.functions.lowering import TranslationError
    with _pt.raises(TranslationError, match="mutate"):
        t >> summarize(x=consecutive_id(_.v))


def test_sql_raw_mutate(spark):
    """Port of the reference's raw-SQL escape tests
    (siuba/tests/test_sql_misc.py:20-29; sql_raw = sql.literal_column at
    siuba/sql/backend.py:372): the fragment is pasted verbatim into the
    projection, both ungrouped and grouped."""
    from siuba_spark import _, collect, group_by, mutate, sql_raw, tbl, ungroup
    t = tbl(spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0)], "x string, y double"))
    out = t >> mutate(z=sql_raw("y + 1")) >> collect()
    assert sorted(out.z.tolist()) == [2.0, 3.0, 4.0]
    out2 = (t >> group_by(_.x) >> mutate(z=sql_raw("y + 1"))
            >> ungroup() >> collect())
    assert sorted(out2.z.tolist()) == [2.0, 3.0, 4.0]
    # composes with native expressions and window fragments
    out3 = (t >> group_by(_.x)
            >> mutate(r=sql_raw("sum(y) over (partition by x)") / _.y)
            >> ungroup() >> collect())
    assert sorted(out3.r.tolist()) == [1.0, 1.5, 3.0]


def test_consecutive_id_no_arrange_is_consistent(spark):
    """ADVICE r6 item 3: without arrange(), both windows (change flag and
    cumulative sum) must share ONE materialized ordering — the run ids
    must be internally consistent (1-based, increment-by-0-or-1 in some
    row order), never e.g. a cumsum over a different permutation than the
    flags were computed in."""
    import warnings as _w

    from siuba_spark import _, consecutive_id, mutate, tbl
    rows = [(i, "v%d" % (i // 7)) for i in range(200)]
    t = tbl(spark.createDataFrame(rows, "i long, v string").repartition(8))
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        out = (t >> mutate(cid=consecutive_id(_.v))).df.collect()
    cids = sorted(r.cid for r in out)
    # consistency: ids form a contiguous 1..K multiset whose total count
    # of distinct values K equals the number of runs the shared ordering
    # produced; inconsistent orderings produce gaps/overshoots
    assert cids[0] == 1
    k = max(cids)
    assert set(cids) == set(range(1, k + 1))


def test_lazy_lam_passes_expression_unlowered(spark):
    """Reference parity: ``Lazy``/``Lam`` (siuba/siu/calls.py:335,
    Lam = Lazy at siu/__init__.py:17) wrap an argument so the receiving
    callable gets the expression OBJECT, not its evaluated Column."""
    from pyspark.sql import functions as F

    from siuba_spark import Lam, Lazy, _, call, collect, mutate, tbl
    from siuba_spark.siu.calls import Call
    assert Lam is Lazy
    t = tbl(spark.createDataFrame([(1.0,), (2.0,)], "x double"))
    seen = {}

    def build(col, node):
        seen["node"] = node          # the un-lowered wrapped object
        return F.col("x") * 10
    out = t >> mutate(y=call(build, _.x, Lazy(_.x))) >> collect()
    assert sorted(out.y) == [10.0, 20.0]
    from siuba_spark.siu.calls import Symbolic, strip_symbolic
    assert isinstance(seen["node"], Symbolic)
    assert isinstance(strip_symbolic(seen["node"]), Call)


def test_str_match_fullmatch(spark):
    """str.match / str.fullmatch (beyond the reference — its SQL dialects
    comment these out, base.py:290): pandas anchor semantics, case=
    flag, NULL propagation."""
    import pandas as pd

    from siuba_spark import _, collect, mutate, tbl
    t = tbl(spark.createDataFrame(
        [("ab1",), ("xy",), ("AB2",), (None,)], "s string"))
    out = (t >> mutate(m=_.s.str.match(r"[a-z]+\d"),
                       fm=_.s.str.fullmatch(r"[a-z]+"),
                       mi=_.s.str.match(r"[a-z]+\d", case=False))
           >> collect())
    ref = pd.Series(["ab1", "xy", "AB2", None])
    assert out.m.fillna(-1).tolist() == \
        ref.str.match(r"[a-z]+\d").fillna(-1).tolist()
    assert out.fm.fillna(-1).tolist() == \
        ref.str.fullmatch(r"[a-z]+").fillna(-1).tolist()
    assert out.mi.fillna(-1).tolist() == \
        ref.str.match(r"[a-z]+\d", case=False).fillna(-1).tolist()


# -- symbolic_dispatch: the public extension point ---------------------------
# (reference: siuba/siu/dispatchers.py:19-83 symbolic_dispatch; the
# call-with-symbol builds a deferred expression, call-with-data executes)

def test_symbolic_dispatch_mutate_and_filter(spark):
    from pyspark.sql import functions as F

    from siuba_spark import filter, symbolic_dispatch

    @symbolic_dispatch
    def taxed(col, rate=0.5):
        return col * (1.0 + rate)

    t = data_frame(spark, x=[1.0, 2.0, 4.0])
    out = _col(t >> mutate(g=taxed(_.x)), "g", sort_by="x")
    assert out == [1.5, 3.0, 6.0]
    # kwargs, symbolic and plain, both reach the implementation
    out2 = _col(t >> mutate(g=taxed(_.x, rate=_.x)), "g", sort_by="x")
    assert out2 == [2.0, 6.0, 20.0]
    flt = (t >> filter(taxed(_.x) > 4)).df.toPandas()
    assert sorted(flt.x.tolist()) == [4.0]
    # call-with-data duality: concrete args execute directly
    assert taxed(10.0) == 15.0
    direct = t.df.select(taxed(F.col("x")).alias("y"))
    assert sorted(r.y for r in direct.collect()) == [1.5, 3.0, 6.0]


def test_symbolic_dispatch_agg_kind_propagates(spark):
    """If a symbolic operand lowers to an aggregate, grouped mutate must
    window it (AggOver broadcast), and summarize must accept it."""
    from siuba_spark import summarize, symbolic_dispatch

    @symbolic_dispatch(name="doubled")
    def _dbl(col):
        return col * 2

    t = data_frame(spark, g=["a", "a", "b"], x=[1.0, 3.0, 5.0])
    out = (t >> group_by(_.g) >> mutate(m2=_dbl(_.x.mean()))
           >> ungroup()).df.toPandas().sort_values("x")
    assert out.m2.tolist() == [4.0, 4.0, 10.0]
    agg = (t >> group_by(_.g) >> summarize(m2=_dbl(_.x.mean()))
           ).df.toPandas().sort_values("g")
    assert agg.m2.tolist() == [4.0, 10.0]


def test_symbolic_dispatch_warns_on_override(spark):
    """Registering over an existing name (yours or a built-in) is legal
    (latest wins, like singledispatch re-registration) but audible."""
    from siuba_spark import symbolic_dispatch

    @symbolic_dispatch(name="my_unique_fn_xyz")
    def _one(col):
        return col + 1

    with pytest.warns(UserWarning, match="overrides the existing"):
        @symbolic_dispatch(name="my_unique_fn_xyz")
        def _two(col):
            return col + 2

    t = data_frame(spark, x=[1])
    assert (t >> mutate(y=_two(_.x))).df.collect()[0].y == 3


def test_str_join_null_element_yields_null(spark):
    """pandas str.join returns NaN when the list contains NaN; bare
    array_join would silently skip the element (ADVICE r9).  A NULL row
    stays NULL; clean lists join normally."""
    from pyspark.sql import functions as F
    t = data_frame(spark, s=["a b", "c", None]).evolve(
        df=data_frame(spark, s=["a b", "c", None]).df.select(
            F.when(F.col("s") == "c",
                   F.array(F.lit("c"), F.lit(None).cast("string")))
            .otherwise(F.split(F.col("s"), " ")).alias("parts")))
    out = t >> mutate(j=_.parts.str.join("|"))
    got = out.df.toPandas().j
    assert got[0] == "a|b"
    assert pd.isna(got[1])   # list containing NULL -> NULL, not "c"
    assert pd.isna(got[2])   # NULL row stays NULL
