"""Port of the reference dplyr-FAQ page (docs/dplyr_faq.Rmd).

Two executable FAQ entries: n_distinct vs .nunique() duality, and
columns whose name collides with a method (pandas forces `_['sum']`
indexing; this engine resolves `_.sum` as a column reference because
`_` is a pure AST — both spellings work)."""

from siuba_spark import _, collect, n_distinct, summarize, tbl


def test_n_distinct_both_ways(spark):
    t = tbl(spark.createDataFrame(
        [("a",), ("a",), ("b",)], "somecol string"))
    via_fn = (t >> summarize(n=n_distinct(_.somecol)) >> collect())
    via_method = (t >> summarize(n=_.somecol.nunique()) >> collect())
    assert via_fn.n.tolist() == [2]
    assert via_method.n.tolist() == [2]


def test_method_named_column(spark):
    # pandas needs df['sum'] because df.sum is the method; here `_` is a
    # pure expression AST, so BOTH the FAQ's indexing workaround and the
    # natural attribute access resolve to the column
    t = tbl(spark.createDataFrame([(1,), (2,), (3,)], "sum long"))
    via_index = (t >> summarize(ttl=_["sum"].sum()) >> collect())
    via_attr = (t >> summarize(ttl=_.sum.sum()) >> collect())
    assert via_index.ttl.tolist() == [6]
    assert via_attr.ttl.tolist() == [6]


def test_count_named_column_in_mutate(spark):
    # the same collision class for a WINDOW method name: a column
    # literally called "count" used elementwise and aggregated
    from siuba_spark import group_by, mutate
    t = tbl(spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "g string, count long"))
    out = (t >> group_by(_.g)
           >> mutate(share=_["count"] / _["count"].sum())
           >> collect())
    got = sorted(round(v, 6) for v in out.share.tolist())
    assert got == [round(1 / 3, 6), round(2 / 3, 6), 1.0]
