"""Property-based cross-engine tests (beyond the reference's strategy —
it has no randomized testing, SURVEY.md §5): hypothesis generates small
frames with nulls / ties / empty-ish groups, and grouped aggregation and
window pipelines must match DuckDB exactly.
"""

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from siuba_spark import SparkTbl, _, arrange, group_by, mutate, summarize

finite_x = st.one_of(
    st.none(),
    st.integers(-1000, 1000).map(lambda v: v / 8.0),  # exact in binary fp
)

rows_st = st.lists(
    st.tuples(st.sampled_from("abc"), finite_x, st.integers(0, 5)),
    min_size=1, max_size=25,
)


def _mk(spark, rows):
    data = [(i, g, x, float(y)) for i, (g, x, y) in enumerate(rows)]
    sdf = spark.createDataFrame(data, schema="i long, g string, x double, y double")
    pdf = pd.DataFrame(data, columns=["i", "g", "x", "y"])
    con = duckdb.connect()
    con.register("d", pdf)
    return SparkTbl(sdf), con


def _eq(got, want, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    assert list(got.columns.sort_values()) == list(want.columns.sort_values())
    assert len(got) == len(want)
    for c in want.columns:
        a = pd.to_numeric(got[c], errors="ignore")
        b = pd.to_numeric(want[c], errors="ignore")
        if getattr(a, "dtype", None) is not None and a.dtype.kind in "fc":
            a, b = a.round(7), pd.to_numeric(b).round(7)
            assert ((a.isna() & b.isna()) | (a == b)).all(), (c, list(a), list(b))
        else:
            assert all(
                x == y or (pd.isna(x) and pd.isna(y))
                for x, y in zip(a, b)
            ), (c, list(a), list(b))


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_st)
def test_grouped_summarize_matches_duckdb(spark, rows):
    t, con = _mk(spark, rows)
    got = (
        summarize(group_by(t, _.g),
                  m=_.x.mean(), s=_.x.sum(), c=_.x.count(),
                  mx=_.x.max(), nu=_.y.nunique(), md=_.x.median())
    ).df.toPandas()
    want = con.execute(
        "SELECT g, avg(x) AS m, sum(x) AS s, count(x) AS c, max(x) AS mx, "
        "count(DISTINCT y) AS nu, median(x) AS md FROM d GROUP BY g"
    ).df()
    _eq(got, want, ["g"])


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_st)
def test_grouped_window_matches_duckdb(spark, rows):
    t, con = _mk(spark, rows)
    got = (
        mutate(arrange(group_by(t, _.g), _.i),
               z=_.x - _.x.mean(), cs=_.x.cumsum(), lg=_.x.shift(1),
               share=_.y / _.y.sum())
    ).df.select("i", "z", "cs", "lg", "share").toPandas()
    want = con.execute(
        "SELECT i, x - avg(x) OVER (PARTITION BY g) AS z, "
        "sum(x) OVER (PARTITION BY g ORDER BY i ROWS UNBOUNDED PRECEDING) AS cs, "
        "lag(x, 1) OVER (PARTITION BY g ORDER BY i) AS lg, "
        "y / sum(y) OVER (PARTITION BY g) AS share FROM d"
    ).df()
    _eq(got, want, ["i"])


join_rows = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(0, 4)), st.integers(0, 9)),
    min_size=0, max_size=12,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(left=join_rows, right=join_rows)
def test_joins_match_duckdb(spark, left, right):
    """Equi-joins on a nullable key (SQL semantics: NULL keys never match)
    and shared non-key column suffixing, vs duckdb."""
    from siuba_spark import anti_join, inner_join, left_join, semi_join

    ldata = [(k, v, float(v) / 2) for k, v in left]
    rdata = [(k, v * 10) for k, v in right]
    lt = SparkTbl(spark.createDataFrame(ldata, "k int, v int, w double")
                  if ldata else spark.createDataFrame([], "k int, v int, w double"))
    rt = SparkTbl(spark.createDataFrame(rdata, "k int, v int")
                  if rdata else spark.createDataFrame([], "k int, v int"))
    con = duckdb.connect()
    con.register("l", pd.DataFrame(ldata, columns=["k", "v", "w"]))
    con.register("r", pd.DataFrame(rdata, columns=["k", "v"]))

    inner = inner_join(lt, rt, on="k").df.toPandas()
    want_inner = con.execute(
        "SELECT l.k, l.v AS v_x, l.w, r.v AS v_y FROM l JOIN r USING (k)").df()
    assert len(inner) == len(want_inner)
    assert sorted(inner.columns) == sorted(want_inner.columns)

    louter = left_join(lt, rt, on="k").df.toPandas()
    n_louter = con.execute(
        "SELECT COUNT(*) c FROM l LEFT JOIN r USING (k)").df()["c"][0]
    assert len(louter) == n_louter

    semi = semi_join(lt, rt, on="k").df.toPandas()
    n_semi = con.execute(
        "SELECT COUNT(*) c FROM l WHERE EXISTS "
        "(SELECT 1 FROM r WHERE r.k = l.k)").df()["c"][0]
    assert len(semi) == n_semi
    assert sorted(semi.columns) == ["k", "v", "w"]  # left cols only

    anti = anti_join(lt, rt, on="k").df.toPandas()
    n_anti = con.execute(
        "SELECT COUNT(*) c FROM l WHERE NOT EXISTS "
        "(SELECT 1 FROM r WHERE r.k = l.k)").df()["c"][0]
    assert len(anti) == n_anti


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.integers(-100, 100), st.integers(-100, 100)),
    min_size=1, max_size=10, unique=True))
def test_gather_spread_roundtrip(spark, rows):
    """spread(gather(df)) reproduces df for unique-id frames."""
    from siuba_spark import gather, spread, _
    data = [(i, float(a), float(b)) for i, (a, b) in enumerate(rows)]
    t = SparkTbl(spark.createDataFrame(data, "id long, p double, q double"))
    back = (t >> gather("k", "v", _.p, _.q) >> spread(_.k, _.v))
    got = back.df.toPandas().sort_values("id").reset_index(drop=True)
    want = pd.DataFrame(data, columns=["id", "p", "q"])
    assert got[["id", "p", "q"]].equals(want)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.integers(0, 5), st.integers(-1000, 1000)),
    min_size=1, max_size=20))
def test_salted_join_equals_plain_join(spark, rows):
    """salted_join is result-identical to join for any key distribution
    (including heavy skew, which the 0-5 key range forces)."""
    from siuba_spark import inner_join, salted_join
    data = [(k, float(v)) for k, v in rows]
    lt = SparkTbl(spark.createDataFrame(data, "k long, v double"))
    rt = SparkTbl(spark.createDataFrame(
        [(k, k * 10) for k in {k for k, _v in rows}], "k long, w long"))
    plain = sorted(map(tuple, inner_join(lt, rt, on="k").df.collect()))
    salted = sorted(map(tuple,
                        salted_join(lt, rt, on="k", salts=4).df.collect()))
    assert plain == salted


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(secs=st.lists(st.integers(0, 10_000_000), min_size=1, max_size=12),
       unit=st.sampled_from(["H", "D"]))
def test_dt_round_matches_pandas_property(spark, secs, unit):
    """dt.round agrees with pandas on arbitrary timestamps, ties included."""
    from siuba_spark import mutate, _
    ts = pd.Series(pd.to_datetime([s * 900 for s in secs], unit="s"))
    t = SparkTbl(spark.createDataFrame(pd.DataFrame({"i": range(len(ts)), "t": ts})))
    got = (t >> mutate(r=_.t.dt.round(unit))).df.toPandas() \
        .sort_values("i")["r"].tolist()
    want = ts.dt.round("h" if unit == "H" else "D").tolist()
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(
    st.lists(st.sampled_from(["a", "bb", "ccc", "dd", "e"]),
             min_size=0, max_size=12),
    min_size=1, max_size=10))
def test_quality_signals_matches_graded_oracle_property(spark, docs):
    """quality_signals agrees with the EXACT graded-query DuckDB oracle on
    random corpora — repetition-heavy by construction (5-word alphabet),
    so most-frequent-2-gram tie-breaks get exercised hard."""
    import duckdb

    import __spark_entry__ as entry
    from siuba_spark.corpus.quality import quality_signals

    pdf = pd.DataFrame({"doc_id": range(len(docs)),
                        "text": [" ".join(d) for d in docs]})
    t = SparkTbl(spark.createDataFrame(pdf))
    got = (quality_signals(t).df
           .select("doc_id", "dup_word_frac", "dup_2gram_frac", "top_2gram",
                   "top_2gram_frac", "mean_word_len", "symbol_word_ratio")
           .toPandas())
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.execute(entry.SQL_QUALITY_SIGNALS).df()
    a = got.sort_values("doc_id").reset_index(drop=True)[sorted(got.columns)]
    b = want.sort_values("doc_id").reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(
    st.lists(st.sampled_from(["x", "yy", "z"]), min_size=0, max_size=8),
    min_size=1, max_size=8))
def test_unigram_logprob_matches_graded_oracle_property(spark, docs):
    import duckdb

    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from siuba_spark.corpus.quality import unigram_logprob

    pdf = pd.DataFrame({"doc_id": range(len(docs)),
                        "text": [" ".join(d) for d in docs]})
    t = SparkTbl(spark.createDataFrame(pdf))
    got = (unigram_logprob(t).df
           .select("doc_id", F.round("avg_logprob", 4).alias("avg_logprob"))
           .toPandas())
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.execute(entry.SQL_UNIGRAM_LOGPROB).df()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = want.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# --- r10: ExactSubstr span dedup vs a pure-Python reference ---------------

docs_tokens_st = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=10),
    min_size=1, max_size=8,
)


def _py_substring_dedup(texts, k):
    """Direct transcription of the verb's contract: first corpus
    occurrence of each k-gram wins (ordered by (id, pos)); every token
    covered by a later duplicate window is cut; empty docs vanish."""
    toks = {i: t.split(" ") if t else [""] for i, t in texts}
    seen = set()
    covered = {i: set() for i, _ in texts}
    for i in sorted(toks):
        ts = toks[i]
        for p in range(len(ts) - k + 1):
            g = tuple(ts[p:p + k])
            if g in seen:
                covered[i].update(range(p, p + k))
            else:
                seen.add(g)
    out = {}
    for i in sorted(toks):
        kept = [t for p, t in enumerate(toks[i]) if p not in covered[i]]
        if kept:
            out[i] = " ".join(kept)
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=docs_tokens_st)
def test_substring_dedup_matches_python_reference(spark, docs):
    from siuba_spark.corpus.dedup import substring_dedup

    texts = [(i, " ".join(ts)) for i, ts in enumerate(docs)]
    t = SparkTbl(spark.createDataFrame(texts, "doc_id long, text string"))
    got = substring_dedup(t, k=3).df.toPandas()
    got_map = dict(zip(got.doc_id, got.text))
    want = _py_substring_dedup(texts, 3)
    assert got_map == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=docs_tokens_st)
def test_substring_incremental_equals_scratch_property(spark, docs):
    from siuba_spark.corpus.dedup import (
        substring_dedup, substring_dedup_incremental)

    texts = [(i, " ".join(ts)) for i, ts in enumerate(docs)]
    mid = len(texts) // 2 or 1
    schema = "doc_id long, text string"
    a = SparkTbl(spark.createDataFrame(texts[:mid], schema))
    out_a, store = substring_dedup_incremental(a, k=3)
    frames = [out_a.df]
    if texts[mid:]:
        b = SparkTbl(spark.createDataFrame(texts[mid:], schema))
        out_b, _s = substring_dedup_incremental(b, store, k=3)
        frames.append(out_b.df)
    inc = frames[0] if len(frames) == 1 else frames[0].unionByName(frames[1])
    got = dict(zip(*(lambda p: (p.doc_id, p.text))(inc.toPandas())))
    t_all = SparkTbl(spark.createDataFrame(texts, schema))
    scratch = substring_dedup(t_all, k=3).df.toPandas()
    assert got == dict(zip(scratch.doc_id, scratch.text))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=docs_tokens_st)
def test_dedup_segments_doc_matches_python_reference(spark, docs):
    from siuba_spark.corpus.quality import dedup_segments

    texts = [(i, " ".join(ts)) for i, ts in enumerate(docs)]
    t = SparkTbl(spark.createDataFrame(texts, "doc_id long, text string"))
    got = dedup_segments(t, sep=" ", scope="doc").df.toPandas()
    got_map = dict(zip(got.doc_id, got.text))
    want = {}
    for i, txt in texts:
        segs = [s for s in txt.split(" ") if s.strip()]
        kept = list(dict.fromkeys(segs))
        if kept:
            want[i] = " ".join(kept)
    assert got_map == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=docs_tokens_st)
def test_dedup_segments_doc_none_matches_python_reference(spark, docs):
    """doc-scope keep='none' (the windowed per-doc path) drops every
    within-doc repeat; cross-doc copies survive."""
    from siuba_spark.corpus.quality import dedup_segments

    texts = [(i, " ".join(ts)) for i, ts in enumerate(docs)]
    t = SparkTbl(spark.createDataFrame(texts, "doc_id long, text string"))
    got = dedup_segments(t, sep=" ", scope="doc", keep="none").df.toPandas()
    got_map = dict(zip(got.doc_id, got.text))
    want = {}
    for i, txt in texts:
        segs = [s for s in txt.split(" ") if s.strip()]
        kept = [s for s in segs if segs.count(s) == 1]
        if kept:
            want[i] = " ".join(kept)
    assert got_map == want
