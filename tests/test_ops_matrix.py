"""Exhaustive op-matrix tests vs the DuckDB oracle, modeled on the
reference's examples.yml spec strategy (siuba/ops/support/examples.yml +
siuba/tests/test_dply_series_methods.py:36-63): every registered op gets an
example expression evaluated per context (elementwise mutate, grouped
summarize, grouped/ordered window mutate) and compared column-by-column.

All ops of one context run in ONE Spark query and ONE duckdb query —
per-op failures are collected and reported together, so the matrix stays
cheap (~3 jobs) while covering the full surface.
"""

import math

import duckdb
import pandas as pd
import pytest

from siuba_spark import (
    SparkTbl, _, arrange, group_by, mutate, near, summarize, tbl,
)

NEAR_XY = near(_.x, _.x + 1e-12)

ROWS = [
    # i,  g,    x,      y,    s,            t
    (0, "a", 1.5,   1.0, "Apple pie",  "2020-01-01 00:00:00"),
    (1, "a", -2.25, 2.0, " Banana ",   "2020-02-29 23:59:59"),
    (2, "b", 3.0,   2.0, "cherry",     "2021-12-31 12:30:45"),
    (3, "b", None,  3.0, None,         None),
    (4, "a", 2.5,   None, "date Nut",  "2020-06-15 08:05:30"),
    (5, "b", -0.5,  4.0, "e33",        "2020-12-01 06:00:00"),
]
SCHEMA = "i long, g string, x double, y double, s string, t timestamp"


@pytest.fixture(scope="module")
def frames(spark):
    from datetime import datetime
    sdf = spark.createDataFrame(
        [(i, g, x, y, s,
          datetime.strptime(t, "%Y-%m-%d %H:%M:%S") if t else None)
         for i, g, x, y, s, t in ROWS],
        schema=SCHEMA)
    pdf = pd.DataFrame(ROWS, columns=["i", "g", "x", "y", "s", "t"])
    pdf["t"] = pd.to_datetime(pdf["t"])
    con = duckdb.connect()
    con.register("d", pdf)
    return SparkTbl(sdf), con


def _cmp(got: pd.DataFrame, want: pd.DataFrame, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(want)
    failures = []
    for col in want.columns:
        if col in keys:
            continue
        assert col in got.columns, f"missing output column {col}"
        a, b = got[col], want[col]
        try:
            if a.dtype.kind in "fc" or b.dtype.kind in "fc":
                a = pd.to_numeric(a, errors="coerce").round(6)
                b = pd.to_numeric(b, errors="coerce").round(6)
                ok = ((a.isna() & b.isna()) | (a == b)).all()
            else:
                import numpy as np

                def obj(v):
                    if isinstance(v, np.ndarray):
                        return list(v)
                    if v is None or (isinstance(v, float) and math.isnan(v)):
                        return None
                    return v

                a = [obj(v) for v in a.tolist()]
                b = [obj(v) for v in b.tolist()]
                ok = all(x == y or (x is None and y is None) for x, y in zip(a, b))
        except Exception as exc:  # dtype surprises count as failures
            ok = False
        if not ok:
            failures.append((col, list(got[col])[:6], list(want[col])[:6]))
    assert not failures, "op mismatches:\n" + "\n".join(map(str, failures))


# --------------------------------------------------------------------------
# context 1: elementwise mutate (numeric + str + dt ops in one projection)
# --------------------------------------------------------------------------

ELWISE = {
    # numeric
    "op_abs": (_.x.abs(), "abs(x)"),
    "op_round": (_.x.round(1), "round(x, 1)"),
    "op_floor": (_.x.floor(), "floor(x)"),
    "op_ceil": (_.x.ceil(), "ceil(x)"),
    "op_sqrt": (_.x.clip(lower=0).sqrt(), "sqrt(greatest(x, 0))"),
    "op_pow": (_.x.pow(2), "power(x, 2)"),
    "op_exp": (_.x.exp(), "exp(x)"),
    "op_log": (_.x.clip(lower=0.1).log(), "ln(greatest(x, 0.1))"),
    "op_isin": (_.y.isin([1.0, 3.0]), "y IN (1.0, 3.0)"),
    "op_astype_str": (_.y.astype(str), "CAST(y AS VARCHAR)"),
    "op_astype_int": (_.y.fillna(0).astype(int), "CAST(COALESCE(y, 0) AS BIGINT)"),
    "op_fillna": (_.x.fillna(-1.0), "COALESCE(x, -1.0)"),
    "op_isna": (_.x.isna(), "x IS NULL"),
    "op_notna": (_.x.notna(), "x IS NOT NULL"),
    "op_clip": (_.x.clip(-1.0, 2.0), "least(greatest(x, -1.0), 2.0)"),
    "op_between": (_.x.between(0, 2.5), "x BETWEEN 0 AND 2.5"),
    "op_where": (_.x.where(_.x > 0, -9.0), "CASE WHEN x > 0 THEN x ELSE -9.0 END"),
    "op_mask": (_.x.mask(_.x > 0, -9.0), "CASE WHEN x > 0 THEN -9.0 ELSE x END"),
    "op_floordiv": (_.y // 2, "CAST(floor(y / 2) AS DOUBLE)"),
    "op_mod": (_.y % 3, "fmod(y, 3)"),
    "op_neg": (-_.x, "-x"),
    # strings
    "op_lower": (_.s.str.lower(), "lower(s)"),
    "op_upper": (_.s.str.upper(), "upper(s)"),
    "op_len": (_.s.str.len(), "length(s)"),
    "op_strip": (_.s.str.strip(), "trim(s)"),
    "op_lstrip": (_.s.str.lstrip(), "ltrim(s)"),
    "op_rstrip": (_.s.str.rstrip(), "rtrim(s)"),
    "op_capitalize": (_.s.str.capitalize(),
                      "upper(s[1]) || lower(s[2:])"),
    "op_startswith": (_.s.str.startswith("A"), "starts_with(s, 'A')"),
    "op_endswith": (_.s.str.endswith("y"), "ends_with(s, 'y')"),
    "op_contains_re": (_.s.str.contains("[ae]"), "regexp_matches(s, '[ae]')"),
    "op_contains_lit": (_.s.str.contains("an", regex=False), "contains(s, 'an')"),
    "op_replace_re": (_.s.str.replace("[aeiou]", "_"),
                      "regexp_replace(s, '[aeiou]', '_', 'g')"),
    "op_slice": (_.s.str.slice(1, 4), "s[2:4]"),
    "op_get": (_.s.str.get(0), "s[1:1]"),
    "op_cat": (_.s.str.cat(_.g, sep="-"), "concat_ws('-', s, g)"),
    "op_zfill": (_.s.str.zfill(8), "lpad(s, 8, '0')"),
    "op_pad": (_.s.str.pad(10, side="right", fillchar="."), "rpad(s, 10, '.')"),
    "op_islower": (_.s.str.islower(), "s = lower(s) AND length(s) > 0"),
    "op_isdigit": (_.s.str.isdigit(), "regexp_matches(s, '^[0-9]+$')"),
    "op_str_extract": (_.s.str.extract("([0-9]+)"), "regexp_extract(s, '([0-9]+)', 1)"),
    "op_slice_neg": (_.s.str.slice(-3), "s[-3:]"),
    "op_slice_neg2": (_.s.str.slice(-3, -1),
                      "CASE WHEN s IS NULL THEN NULL "
                      "ELSE substr(s, greatest(length(s)-2, 1), 2) END"),
    "op_findall": (_.s.str.findall("[a-z]+"), "regexp_extract_all(s, '[a-z]+')"),
    "op_slice_replace": (_.s.str.slice_replace(1, 3, "XY"),
                         "substr(s, 1, 1) || 'XY' || substr(s, 4)"),
    # stop=None replaces through the end (regression: the tail-start
    # constant must stay INT-ranged, accessors.py slice_replace)
    "op_slice_replace_tail": (_.s.str.slice_replace(2, repl="Z"),
                              "substr(s, 1, 2) || 'Z'"),
    "op_str_join": (_.s.str.split(" ").str.join("|"),
                    "array_to_string(string_split(s, ' '), '|')"),
    "op_split_get": (_.s.str.split(" ").get(0),
                     "string_split(s, ' ')[1]"),
    "op_xor": ((_.x > 0) ^ (_.y > 2), "(x > 0) != (y > 2)"),
    "op_dunder_round": (round(_.x, 1), "round(x, 1)"),
    "op_near": (NEAR_XY, "abs(x - (x + 1e-12)) < 1.4901161193847656e-08"),
    "op_find": (_.s.str.find("e"), "strpos(s, 'e') - 1"),
    "op_repeat": (_.s.str.repeat(2), "repeat(s, 2)"),
    # datetime
    "op_year": (_.t.dt.year, "CAST(year(t) AS INT)"),
    "op_month": (_.t.dt.month, "CAST(month(t) AS INT)"),
    "op_day": (_.t.dt.day, "CAST(day(t) AS INT)"),
    "op_hour": (_.t.dt.hour, "CAST(hour(t) AS INT)"),
    "op_minute": (_.t.dt.minute, "CAST(minute(t) AS INT)"),
    "op_second": (_.t.dt.second, "CAST(second(t) AS INT)"),
    "op_quarter": (_.t.dt.quarter, "CAST(quarter(t) AS INT)"),
    "op_week": (_.t.dt.week, "CAST(weekofyear(t) AS INT)"),
    "op_doy": (_.t.dt.dayofyear, "CAST(dayofyear(t) AS INT)"),
    "op_dow": (_.t.dt.dayofweek, "CAST((dayofweek(t) + 6) % 7 AS INT)"),
    "op_dim": (_.t.dt.days_in_month, "CAST(day(last_day(t)) AS INT)"),
    "op_date": (_.t.dt.date.astype(str), "CAST(CAST(t AS DATE) AS VARCHAR)"),
    "op_mstart": (_.t.dt.is_month_start, "day(t) = 1"),
    "op_mend": (_.t.dt.is_month_end, "CAST(t AS DATE) = last_day(t)"),
    "op_ystart": (_.t.dt.is_year_start, "month(t) = 1 AND day(t) = 1"),
    "op_strftime": (_.t.dt.strftime("%Y-%m"), "strftime(t, '%Y-%m')"),
    "op_total_seconds": ((_.t - _.t.dt.normalize()).dt.total_seconds(),
                         "epoch(t - date_trunc('day', t))"),
    "op_dt_round_h": (_.t.dt.round("H").dt.strftime("%Y-%m-%d %H:%M"),
                      "strftime(make_timestamp(CAST(round(epoch(t)/3600)*3600*1000000 AS BIGINT)), '%Y-%m-%d %H:%M')"),
    "op_month_name": (_.t.dt.month_name(), "monthname(t)"),
    "op_day_name": (_.t.dt.day_name(), "dayname(t)"),
    "op_normalize": (_.t.dt.normalize().dt.strftime("%Y-%m-%d %H:%M"),
                     "strftime(date_trunc('day', t), '%Y-%m-%d %H:%M')"),
    # method-form infix operators (reference ops_infix_methods,
    # siuba/ops/generics.py:38-70)
    "op_m_add": (_.x.add(_.y), "x + y"),
    "op_m_radd": (_.x.radd(1), "1 + x"),
    "op_m_sub": (_.x.sub(_.y), "x - y"),
    "op_m_rsub": (_.x.rsub(10), "10 - x"),
    "op_m_mul": (_.x.multiply(_.y), "x * y"),
    "op_m_div": (_.x.div(_.y), "x / y"),
    "op_m_rdiv": (_.x.rdiv(1), "1 / x"),
    "op_m_mod": (_.y.mod(3), "fmod(y, 3)"),
    "op_m_floordiv": (_.y.floordiv(2), "CAST(floor(y / 2) AS DOUBLE)"),
    "op_m_rpow": (_.y.rpow(2.0), "power(2.0, y)"),
    "op_m_eq": (_.y.eq(2.0), "y = 2.0"),
    "op_m_ne": (_.y.ne(2.0), "y != 2.0"),
    "op_m_lt": (_.y.lt(2.0), "y < 2.0"),
    "op_m_ge": (_.y.ge(2.0), "y >= 2.0"),
}


def test_elwise_matrix(frames):
    t, con = frames
    out = mutate(t, **{k: v[0] for k, v in ELWISE.items()})
    got = out.df.select("i", *ELWISE.keys()).toPandas()
    sql = "SELECT i, " + ", ".join(f"{v[1]} AS {k}" for k, v in ELWISE.items()) + " FROM d"
    want = con.execute(sql).df()
    _cmp(got, want, ["i"])


# --------------------------------------------------------------------------
# context 2: grouped summarize (aggregate lowering)
# --------------------------------------------------------------------------

AGGS = {
    "a_mean": (_.x.mean(), "avg(x)"),
    "a_sum": (_.x.sum(), "sum(x)"),
    "a_min": (_.x.min(), "min(x)"),
    "a_max": (_.x.max(), "max(x)"),
    "a_median": (_.x.median(), "median(x)"),
    "a_std": (_.x.std(), "stddev_samp(x)"),
    "a_var": (_.x.var(), "var_samp(x)"),
    "a_count": (_.x.count(), "count(x)"),
    "a_size": (_.x.size(), "count(*)"),
    "a_q25": (_.x.quantile(0.25), "quantile_cont(x, 0.25)"),
    "a_all": ((_.x > 0).all(), "bool_and(x > 0)"),
    "a_any": ((_.x > 2).any(), "bool_or(x > 2)"),
    "a_prod": (_.y.prod(), "product(y)"),
    "a_sem": (_.x.sem(), "stddev_samp(x) / sqrt(count(x))"),
    "a_nunique": (_.y.nunique(), "count(DISTINCT y)"),
    "a_corr": (_.x.corr(_.y), "corr(x, y)"),
    "a_cov": (_.x.cov(_.y), "covar_samp(x, y)"),
}


def test_agg_matrix(frames):
    t, con = frames
    out = summarize(group_by(t, _.g), **{k: v[0] for k, v in AGGS.items()})
    got = out.df.toPandas()
    sql = ("SELECT g, " + ", ".join(f"{v[1]} AS {k}" for k, v in AGGS.items())
           + " FROM d GROUP BY g")
    want = con.execute(sql).df()
    _cmp(got, want, ["g"])


# --------------------------------------------------------------------------
# context 3: grouped + ordered window mutate (AggOver / RankOver / CumlOver)
# --------------------------------------------------------------------------

WINS = {
    # AggOver: full-partition broadcast
    "w_mean": (_.x.mean(), "avg(x) OVER (PARTITION BY g)"),
    "w_sum": (_.x.sum(), "sum(x) OVER (PARTITION BY g)"),
    "w_max": (_.x.max(), "max(x) OVER (PARTITION BY g)"),
    # RankOver: ordered by the ranked column (y has ties + a NULL)
    # CumlOver: ordered by arrange state (i), running frame
    "w_cumsum": (_.x.cumsum(), "sum(x) OVER (PARTITION BY g ORDER BY i ROWS UNBOUNDED PRECEDING)"),
    "w_cummax": (_.x.cummax(), "max(x) OVER (PARTITION BY g ORDER BY i ROWS UNBOUNDED PRECEDING)"),
    "w_cummin": (_.x.cummin(), "min(x) OVER (PARTITION BY g ORDER BY i ROWS UNBOUNDED PRECEDING)"),
    "w_cummean": (_.x.cummean(), "avg(x) OVER (PARTITION BY g ORDER BY i ROWS UNBOUNDED PRECEDING)"),
    "w_lead": (_.x.shift(-1), "lead(x, 1) OVER (PARTITION BY g ORDER BY i)"),
    "w_lag": (_.x.shift(1), "lag(x, 1) OVER (PARTITION BY g ORDER BY i)"),
    "w_diff": (_.x.diff(), "x - lag(x, 1) OVER (PARTITION BY g ORDER BY i)"),
    "w_pct": (_.y.pct_change(), "y / lag(y, 1) OVER (PARTITION BY g ORDER BY i) - 1"),
    "w_ffill": (_.x.ffill(),
                "last_value(x IGNORE NULLS) OVER (PARTITION BY g ORDER BY i "
                "ROWS UNBOUNDED PRECEDING)"),
    "w_bfill": (_.x.bfill(),
                "first_value(x IGNORE NULLS) OVER (PARTITION BY g ORDER BY i "
                "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"),
    "w_cumcount": (_.x.cumcount(),
                   "count(*) OVER (PARTITION BY g ORDER BY i "
                   "ROWS UNBOUNDED PRECEDING) - 1"),
    "w_cumprod": (_.y.cumprod(),
                  "product(y) OVER (PARTITION BY g ORDER BY i "
                  "ROWS UNBOUNDED PRECEDING)"),
}


RANKS = {
    # y has ties (2.0 ×2) and a NULL — NULLs stay unranked and excluded
    # from percent_rank / cume_dist denominators (reference NULL-partition
    # trick, siuba/sql/dply/vector.py:53-78)
    "r_row_number": ("row_number(_.y)",
                     "row_number() OVER (PARTITION BY g ORDER BY y ASC NULLS LAST)"),
    "r_min_rank": ("min_rank(_.y)",
                   "CASE WHEN y IS NULL THEN NULL ELSE rank() OVER "
                   "(PARTITION BY g, y IS NULL ORDER BY y) END"),
    "r_dense_rank": ("dense_rank(_.y)",
                     "CASE WHEN y IS NULL THEN NULL ELSE dense_rank() OVER "
                     "(PARTITION BY g, y IS NULL ORDER BY y) END"),
    "r_pct_rank": ("percent_rank(_.y)",
                   "CASE WHEN y IS NULL THEN NULL ELSE percent_rank() OVER "
                   "(PARTITION BY g, y IS NULL ORDER BY y) END"),
    "r_cume_dist": ("cume_dist(_.y)",
                    "CASE WHEN y IS NULL THEN NULL ELSE cume_dist() OVER "
                    "(PARTITION BY g, y IS NULL ORDER BY y) END"),
    "r_desc_rank": ("min_rank(-_.y)",
                    "CASE WHEN y IS NULL THEN NULL ELSE rank() OVER "
                    "(PARTITION BY g, y IS NULL ORDER BY y DESC) END"),
    "r_ntile": ("ntile(_.y, 2)",
                "ntile(2) OVER (PARTITION BY g ORDER BY y ASC NULLS LAST)"),
    "r_nth": ("nth(_.x, 1)",
              "nth_value(x, 2) OVER (PARTITION BY g ORDER BY i "
              "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"),
    "r_first": ("first(_.x)",
                "first_value(x) OVER (PARTITION BY g ORDER BY i "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"),
    "r_last": ("last(_.x)",
               "last_value(x) OVER (PARTITION BY g ORDER BY i "
               "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"),
}


def test_rank_matrix(frames):
    import siuba_spark as ss
    ns = {n: getattr(ss, n) for n in (
        "cume_dist", "dense_rank", "first", "last", "min_rank", "nth",
        "ntile", "percent_rank", "row_number")}
    ns["_"] = _
    t, con = frames
    exprs = {k: eval(v[0], ns) for k, v in RANKS.items()}
    out = mutate(arrange(group_by(t, _.g), _.i), **exprs)
    got = out.df.select("i", *RANKS.keys()).toPandas()
    sql = "SELECT i, " + ", ".join(f"{v[1]} AS {k}" for k, v in RANKS.items()) + " FROM d"
    want = con.execute(sql).df()
    _cmp(got, want, ["i"])


def test_window_matrix(frames):
    t, con = frames
    out = mutate(arrange(group_by(t, _.g), _.i), **{k: v[0] for k, v in WINS.items()})
    got = out.df.select("i", *WINS.keys()).toPandas()
    sql = "SELECT i, " + ", ".join(f"{v[1]} AS {k}" for k, v in WINS.items()) + " FROM d"
    want = con.execute(sql).df()
    _cmp(got, want, ["i"])
