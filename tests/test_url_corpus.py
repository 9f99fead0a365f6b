"""Tests for the web-corpus URL surface: cap_per_key (per-domain caps),
url_parts / registrable_domain_col, and filter_blocklist.

cap_per_key's scale contract is that its single row_number window + rank
filter is executed with Spark's map-side Partial WindowGroupLimit
(SPARK-37099) — the plan test below pins that physical shape, and the
output must equal the plain ``group_by >> slice_head`` semantics.
"""

import pytest
from pyspark.sql import functions as F

from siuba_spark import SparkTbl, _, group_by, slice_head, tbl
from siuba_spark.corpus.quality import cap_per_key
from siuba_spark.corpus.text import (
    filter_blocklist, registrable_domain_col, url_parts,
)

from .conftest import SF_SMALL
from .helpers import collect_sorted, data_frame


def _docs(spark):
    return tbl(spark.read.parquet(f"{SF_SMALL}/documents.parquet"))


# ---------------------------------------------------------------- cap_per_key

def test_cap_per_key_matches_slice_head(spark):
    docs = _docs(spark)
    got = (docs >> cap_per_key("source", n=7, order_by="doc_id")).df
    want = (docs >> group_by(_.source)
            >> slice_head(7, order_by=_.doc_id)).df
    assert got.count() == want.count()
    assert got.select("doc_id").exceptAll(want.select("doc_id")).count() == 0
    assert want.select("doc_id").exceptAll(got.select("doc_id")).count() == 0


def test_cap_per_key_hot_key(spark):
    # one key holds 90% of the rows: the cap must still keep exactly
    # the n smallest order values of the hot key
    rows = [("hot", i) for i in range(900)] + [("cold", i) for i in range(100)]
    t = SparkTbl(spark.createDataFrame(rows, "k string, v long"))
    out = (cap_per_key(t, "k", n=5, order_by="v")
           .df.groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                                F.max("v").alias("mx"))
           .orderBy("k").collect())
    assert [(r.k, r.n, r.mx) for r in out] == [("cold", 5, 4), ("hot", 5, 4)]


def test_cap_per_key_descending_and_grouped_tbl(spark):
    docs = _docs(spark)
    got = (docs >> group_by(_.source)
           >> cap_per_key(n=3, order_by="doc_id", ascending=False)).df
    # per source: the 3 LARGEST doc_ids
    want = (docs.df.withColumn(
        "rn", F.row_number().over(
            __import__("pyspark").sql.Window.partitionBy("source")
            .orderBy(F.col("doc_id").desc())))
        .filter(F.col("rn") <= 3).drop("rn"))
    assert got.count() == want.count()
    assert got.select("doc_id").exceptAll(want.select("doc_id")).count() == 0


def test_cap_per_key_validation(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="key columns"):
        docs >> cap_per_key(n=5)
    with pytest.raises(ValueError, match="n must be"):
        docs >> cap_per_key("source", n=0)


def test_cap_per_key_has_partial_window_group_limit(spark):
    # the scale contract: InferWindowGroupLimit must inject a map-side
    # Partial top-n per key BEFORE the exchange, bounding a hot key's
    # reduce partition at n * map_partitions rows.  If this physical
    # shape ever regresses (e.g. an extra projection between the window
    # and the rank filter defeats the rule), the window becomes
    # unsplittable under a hot domain — fail loudly here.
    docs = _docs(spark)
    plan = (docs >> cap_per_key("source", n=7, order_by="doc_id")
            ).df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan
    # and the skew watch recognizes the bound: a rank-limit window on a
    # raw string key is exempt (the Partial pass caps the hot task)
    from siuba_spark.plans.tbl import lint_plan
    r = docs >> cap_per_key("source", n=7, order_by="doc_id") >> lint_plan()
    assert r["skew_watch"] == []


# ------------------------------------------------------------------ url_parts

def test_url_parts_components(spark):
    t = data_frame(
        spark,
        url=[
            "https://a.b.example.com/x/y?q=1#frag",
            "http://192.168.0.1/root",
            "https://news.bbc.co.uk/uk",
            "not a url",
            None,
        ],
    )
    out = (url_parts(t, "url", parts=("protocol", "host", "path", "query",
                                      "ref"))
           .df.toPandas())
    assert out.protocol.tolist() == ["https", "http", "https", None, None]
    assert out.host.tolist() == ["a.b.example.com", "192.168.0.1",
                                 "news.bbc.co.uk", None, None]
    assert out.path.tolist() == ["/x/y", "/root", "/uk", None, None]
    assert out["query"].tolist() == ["q=1", None, None, None, None]
    assert out.ref.tolist() == ["frag", None, None, None, None]
    assert out.domain.tolist() == ["example.com", "192.168.0.1",
                                   "bbc.co.uk", None, None]


def test_url_parts_unknown_part_raises(spark):
    t = data_frame(spark, url=["https://x.com/"])
    with pytest.raises(ValueError, match="unknown URL parts"):
        url_parts(t, "url", parts=("hostname",))


def test_registrable_domain_cases(spark):
    t = data_frame(
        spark,
        host=["example.com", "a.b.c.example.com", "shop.amazon.co.jp",
              "co.uk", "localhost", "10.0.0.7", None],
    )
    out = (t.df.withColumn("d", registrable_domain_col(F.col("host")))
           .toPandas())
    assert out.d.tolist() == [
        "example.com", "example.com", "amazon.co.jp",
        "co.uk",       # 2 labels: passthrough, even though it IS a suffix
        "localhost", "10.0.0.7", None,
    ]


def test_url_parts_is_zero_shuffle(spark):
    docs = _docs(spark)
    with_url = docs.df.withColumn(
        "url", F.concat(F.lit("https://"), F.col("source"),
                        F.lit(".example.com/d/"),
                        F.col("doc_id").cast("string")))
    plan = (url_parts(SparkTbl(with_url), "url")
            .df._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


# ----------------------------------------------------------- filter_blocklist

def test_filter_blocklist_exact_and_domain(spark):
    t = data_frame(
        spark,
        doc_id=[1, 2, 3, 4, 5],
        host=["en.bad.com", "de.bad.com", "Bad.com", "good.com",
              "bad.com.good.org"],
    )
    bl = spark.createDataFrame([("bad.com",)], "d string")
    exact = collect_sorted(filter_blocklist(t, bl, col="host", mode="exact"))
    # only the exact (case-insensitive) host match falls
    assert exact.doc_id.tolist() == [1, 2, 4, 5]
    dom = collect_sorted(filter_blocklist(t, bl, col="host", mode="domain"))
    # every subdomain of bad.com falls; bad.com.good.org survives (its
    # registrable domain is good.org — no endswith false positive)
    assert dom.doc_id.tolist() == [4, 5]


def test_filter_blocklist_validation(spark):
    t = data_frame(spark, host=["x.com"])
    bl = spark.createDataFrame([("x.com",)], "d string")
    with pytest.raises(ValueError, match="mode"):
        filter_blocklist(t, bl, col="host", mode="suffix")


def test_filter_blocklist_no_bnlj(spark):
    # the domain mode must stay an equi join — never a BroadcastNestedLoop
    t = _docs(spark)
    with_host = t.df.withColumn(
        "host", F.concat(F.col("lang"), F.lit("."), F.col("source"),
                         F.lit(".example.com")))
    bl = spark.createDataFrame([("example.com",)], "d string")
    plan = (filter_blocklist(SparkTbl(with_host), bl, col="host",
                             mode="domain")
            .df._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoop" not in plan


def test_url_parts_matches_urllib_on_generated_urls(spark):
    """Matrix parity vs Python's own URL parser: 240 seeded-random URLs
    (labelled hosts incl. hyphens/digits, 0-4 path segments, 0-2 query
    pairs, optional fragment) parsed by Spark's try_parse_url must agree
    with urllib.parse component-for-component.  One Spark job for the
    whole matrix (a hypothesis-per-example loop would pay a Spark job
    per draw for the same coverage; the seed makes this reproducible)."""
    import random
    from urllib.parse import urlsplit

    rng = random.Random(42)
    urls = []
    for _i in range(240):
        scheme = rng.choice(["http", "https"])
        labels = [
            "".join(rng.choice("abcz09-") for _ in range(rng.randint(1, 6)))
            .strip("-") or "x"
            for _ in range(rng.randint(1, 4))] + [rng.choice(["com", "org",
                                                              "co", "io"])]
        host = ".".join(labels)
        path = "".join("/" + "".join(rng.choice("abc123._-")
                                     for _ in range(rng.randint(1, 5)))
                       for _ in range(rng.randint(1, 4)))
        query = "&".join(f"k{j}={rng.randint(0, 99)}"
                         for j in range(rng.randint(0, 2)))
        frag = rng.choice(["", "top", "s2"])
        u = f"{scheme}://{host}{path}"
        if query:
            u += "?" + query
        if frag:
            u += "#" + frag
        urls.append((u,))

    t = SparkTbl(spark.createDataFrame(urls, "url string"))
    out = (url_parts(t, "url", parts=("protocol", "host", "path", "query",
                                      "ref"), domain=False)
           .df.toPandas())
    for row in out.itertuples(index=False):
        want = urlsplit(row.url)
        assert row.protocol == want.scheme, row.url
        assert row.host == want.hostname, row.url
        assert row.path == want.path, row.url
        assert (row.query or "") == want.query, row.url
        assert (row.ref or "") == want.fragment, row.url


def test_filter_blocklist_host_granularity_entry_blocks_its_domain(spark):
    """Review fix: a host-granularity blocklist entry in domain mode
    must block its REGISTRABLE DOMAIN (conservative over-block), not
    silently match nothing — the equi-join probes registrable domains,
    so an un-normalized 'ads.tracker.co.uk' entry used to block zero
    rows."""
    t = data_frame(
        spark,
        doc_id=[1, 2, 3],
        host=["cdn.tracker.co.uk", "tracker.co.uk", "safe.co.uk"],
    )
    bl = spark.createDataFrame([("ads.tracker.co.uk",)], "d string")
    dom = collect_sorted(filter_blocklist(t, bl, col="host", mode="domain"))
    assert dom.doc_id.tolist() == [3]


def test_trailing_root_dot_is_not_an_evasion(spark):
    """'bad.example.com.' (trailing root dot — browser-equivalent FQDN)
    must yield the same registrable domain as without the dot, and a
    domain blocklist on 'example.com' must drop it."""
    t = data_frame(spark, doc_id=[1, 2],
                   host=["bad.example.com.", "ok.other.org"])
    out = (t.df.withColumn("d", registrable_domain_col(F.col("host")))
           .orderBy("doc_id").toPandas())
    assert out.d.tolist() == ["example.com", "other.org"]
    bl = spark.createDataFrame([("example.com",)], "d string")
    kept = collect_sorted(filter_blocklist(t, bl, col="host", mode="domain"))
    assert kept.doc_id.tolist() == [2]


def test_cap_per_key_tolerates_unorderable_columns(spark):
    # a map-typed column must not break the deterministic tie-break
    # (maps are not orderable in Spark) — shared fix with slice_min
    df = spark.createDataFrame(
        [("a", 1, {"x": 1}), ("a", 2, {"y": 2}), ("b", 3, {"z": 3})],
        "k string, v long, m map<string,int>")
    out = cap_per_key(SparkTbl(df), "k", n=1, order_by="v").df
    assert sorted(r.v for r in out.collect()) == [1, 3]


def test_skew_watch_adjacency_not_key_based(spark):
    """Review fix: the WindowGroupLimit exemption must apply ONLY to the
    bounded rank-limit window itself — a SECOND, unbounded window over
    the same string key in the same plan stays flagged."""
    from pyspark.sql import Window

    from siuba_spark.plans.tbl import lint_plan

    docs = _docs(spark)
    capped = (docs >> cap_per_key("source", n=7, order_by="doc_id")).df
    w = Window.partitionBy("source").orderBy("doc_id")
    both = SparkTbl(capped.withColumn("csum", F.sum("n_chars").over(w)))
    r = both >> lint_plan()
    assert any("raw string" in x for x in r["skew_watch"]), r["skew_watch"]


def test_registrable_domain_lowercases_host(spark):
    # DNS hostnames are case-insensitive: the exported domain column
    # must treat Example.com and example.com as ONE group-by key
    t = data_frame(spark, host=["Example.COM", "A.Shop.AMAZON.co.JP",
                                "LOCALHOST"])
    out = (t.df.withColumn("d", registrable_domain_col(F.col("host")))
           .toPandas())
    assert out.d.tolist() == ["example.com", "amazon.co.jp", "localhost"]


def test_filter_blocklist_mixed_case_host_is_blocked(spark):
    t = data_frame(spark, host=["Ads.Tracker.COM", "ok.example.com"])
    bl = data_frame(spark, blocked=["tracker.com"])
    out = filter_blocklist(t, bl, col="host", mode="domain").df.toPandas()
    assert out.host.tolist() == ["ok.example.com"]


def test_filter_blocklist_null_probe_passthrough_and_fail_closed(spark):
    t = data_frame(spark, host=["bad.com", "ok.com", None])
    bl = data_frame(spark, blocked=["bad.com"])
    # default: fail-open — the NULL-host row survives both modes
    for mode in ("exact", "domain"):
        out = (filter_blocklist(t, bl, col="host", mode=mode)
               .df.toPandas())
        assert sorted(out.host.fillna("~").tolist()) == ["ok.com", "~"]
    # drop_null_probe=True: fail-closed — the NULL-host row is dropped
    out = (filter_blocklist(t, bl, col="host", mode="exact",
                            drop_null_probe=True).df.toPandas())
    assert out.host.tolist() == ["ok.com"]


def test_cap_per_key_explicit_tie_break(spark):
    rows = [("k", 1, i, "x" * 50) for i in range(20)]
    t = SparkTbl(spark.createDataFrame(
        rows, "k string, v long, i long, body string"))
    # explicit id-like tie-break: deterministic without ordering by body
    out = (cap_per_key(t, "k", n=3, order_by="v", tie_break=["i"])
           .df.orderBy("i").toPandas())
    assert out.i.tolist() == [0, 1, 2]
    # tie_break=() with a unique order_by: no extra sort columns at all
    t2 = SparkTbl(spark.createDataFrame(
        [("k", i, "y") for i in range(9)], "k string, v long, body string"))
    out2 = (cap_per_key(t2, "k", n=2, order_by="v", tie_break=())
            .df.orderBy("v").toPandas())
    assert out2.v.tolist() == [0, 1]


# ---------------------------------------------------------------- PSL rules

def test_psl_wildcard_exception_and_co_il(spark):
    """The real PSL algorithm over the bundled rule file (VERDICT r11
    item 3): wildcard *.ck (any label under .ck is a public suffix),
    its exception !www.ck, the *.kobe.jp / !city.kobe.jp pair, and the
    co.il-class registries the 39-entry curated subset got WRONG —
    before the PSL, sub.bad.co.il collapsed to 'co.il' and a blocklist
    entry for bad.co.il over-blocked ALL of .co.il."""
    cases = {
        # wildcard *.ck: <label>.ck is a public suffix
        "a.b.gov.ck": "b.gov.ck",
        "gov.ck": "gov.ck",          # IS a public suffix: passthrough
        # exception !www.ck: www.ck is registrable despite *.ck
        "www.ck": "www.ck",
        "sub.www.ck": "www.ck",
        # wildcard + exception under kobe.jp
        "x.city.kobe.jp": "city.kobe.jp",
        "city.kobe.jp": "city.kobe.jp",
        "a.b.kobe.jp": "a.b.kobe.jp",   # b.kobe.jp is the suffix
        "b.kobe.jp": "b.kobe.jp",       # IS a public suffix
        # the co.il class (absent from the old curated subset)
        "sub.bad.co.il": "bad.co.il",
        "bad.co.il": "bad.co.il",
        "x.site.co.th": "site.co.th",
        "shop.allegro.com.pl": "allegro.com.pl",
    }
    t = data_frame(spark, host=list(cases))
    out = (t.df.withColumn("d", registrable_domain_col(F.col("host")))
           .toPandas())
    assert dict(zip(out.host, out.d)) == cases


def test_psl_python_twin_agrees_with_expression(spark):
    from siuba_spark.corpus.psl import (
        load_default_rules, registrable_domain_py,
    )
    rules = load_default_rules()
    assert rules is not None
    hosts = ["deep.a.b.c.example.co.uk", "EX.Ample.Com.", "a.co",
             "x.y.gov.ck", "q.city.kawasaki.jp", "me.uk", "a.me.uk",
             "1.2.3.4", "xn--bcher-kva.example", "trailing.dot.co.il."]
    t = data_frame(spark, host=hosts)
    out = (t.df.withColumn("d", registrable_domain_col(F.col("host")))
           .toPandas())
    for h, d in zip(out.host, out.d):
        assert d == registrable_domain_py(h, rules), h


def test_psl_parse_format_and_custom_rules(spark):
    """parse_psl honors the upstream wire format (comments, first-token
    reads, case), and registrable_domain_col accepts explicit rules —
    including depths beyond the bundled file's."""
    from siuba_spark.corpus.psl import parse_psl

    rules = parse_psl("""
// comment line
com
co.uk   trailing junk ignored
*.deep.example
!keep.deep.example
a.b.c.tld
""")
    assert rules.norm_at(2) == frozenset({"co.uk"})
    assert rules.norm_at(4) == frozenset({"a.b.c.tld"})   # depth-4 normal
    assert rules.wild_at(2) == frozenset({"deep.example"})
    assert rules.exc_at(3) == frozenset({"keep.deep.example"})
    cases = {
        "x.q.deep.example": "x.q.deep.example",  # *.deep.example suffix
        "q.deep.example": "q.deep.example",      # IS a public suffix
        "z.keep.deep.example": "keep.deep.example",  # exception
        "w.a.b.c.tld": "w.a.b.c.tld",            # depth-4 normal rule
        "plain.com": "plain.com",                # 1-label rule == default
    }
    t = data_frame(spark, host=list(cases))
    out = (t.df.withColumn(
        "d", registrable_domain_col(F.col("host"), rules=rules))
           .toPandas())
    assert dict(zip(out.host, out.d)) == cases


def test_blocklist_co_il_no_longer_overblocks(spark):
    """Regression pin for VERDICT r11 'what's wrong' item 3: with the
    curated subset, blocking bad.co.il normalized both sides to co.il
    and dropped EVERY .co.il host; with the PSL, only bad.co.il's
    registrable domain falls."""
    t = data_frame(spark, host=["x.bad.co.il", "bad.co.il",
                                "good.co.il", "y.good.co.il"])
    bl = data_frame(spark, blocked=["bad.co.il"])
    out = filter_blocklist(t, bl, col="host", mode="domain").df.toPandas()
    assert sorted(out.host) == ["good.co.il", "y.good.co.il"]


# ------------------------------------------------------------- url_normalize

def test_url_normalize_canonicalization(spark):
    """The C4/RefinedWeb URL canonicalization: case, default ports,
    fragments, tracking params, param order, duplicate slashes, empty
    path, trailing root-dot host, userinfo preservation, and the
    NULL-on-malformed contract."""
    from siuba_spark.corpus.text import url_normalize

    cases = [
        ("HTTPS://WWW.Example.COM:443/a//b/?b=2&a=1&utm_source=x#frag",
         "https://www.example.com/a/b/?a=1&b=2"),
        ("https://www.example.com/a/b/?a=1&b=2",
         "https://www.example.com/a/b/?a=1&b=2"),
        # non-default port survives; fbclid dropped
        ("http://example.com:8080//x?q=1&fbclid=abc",
         "http://example.com:8080/x?q=1"),
        ("http://user:pw@host.co.uk./p", "http://user:pw@host.co.uk/p"),
        ("https://example.com", "https://example.com/"),
        ("https://example.com/?", "https://example.com/"),
        # tracking keys match case-insensitively
        ("https://example.com/p?UTM_Campaign=z&z=9",
         "https://example.com/p?z=9"),
        ("ftp://files.example.com:21/pub", "ftp://files.example.com/pub"),
        ("doc 123", None),
        (None, None),
        ("mailto:someone@example.com", None),  # non-hierarchical: no host
    ]
    t = SparkTbl(spark.createDataFrame([(u,) for u, _ in cases],
                                       "url string"))
    out = {r.url: r.url_norm
           for r in url_normalize(t, "url").df.collect()}
    for u, want in cases:
        assert out[u] == want, (u, out[u], want)


def test_url_normalize_knobs(spark):
    from siuba_spark.corpus.text import url_normalize

    t = SparkTbl(spark.createDataFrame(
        [("https://h.com/p?b=2&a=1&utm_source=x",)], "url string"))
    # drop_params=None keeps tracking params; sort still applies
    out = url_normalize(t, "url", drop_params=None).df.collect()[0]
    assert out.url_norm == "https://h.com/p?a=1&b=2&utm_source=x"
    # sort_query=False keeps the original order
    out = url_normalize(t, "url", sort_query=False).df.collect()[0]
    assert out.url_norm == "https://h.com/p?b=2&a=1"


def test_url_normalize_is_zero_shuffle(spark):
    from siuba_spark.corpus.text import url_normalize

    docs = _docs(spark)
    t = docs.evolve(df=docs.df.withColumn(
        "url", F.concat(F.lit("https://"), F.col("source"),
                        F.lit(".example.com/d/"),
                        F.col("doc_id").cast("string"))))
    plan = (url_normalize(t, "url").df
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_url_normalize_dedup_chain(spark):
    """The composed web-corpus chain (VERDICT r11 item 1): normalize ->
    exact_dedup on the canonical URL -> per-domain cap.  Three spellings
    of one resource collapse to one row (lowest doc_id wins)."""
    from siuba_spark.corpus.dedup import exact_dedup
    from siuba_spark.corpus.quality import cap_per_key
    from siuba_spark.corpus.text import url_normalize, url_parts

    rows = [
        (1, "https://A.com/x?b=2&a=1"),
        (2, "HTTPS://a.COM:443/x?a=1&b=2&utm_source=t"),
        (3, "https://a.com//x?a=1&b=2#sec"),
        (4, "https://a.com/y"),
        (5, "https://b.org/z"),
    ]
    t = SparkTbl(spark.createDataFrame(rows, "doc_id long, url string"))
    t = url_normalize(t, "url")
    t = url_parts(t, "url_norm", parts=("host",))
    t = exact_dedup(t, cols=("url_norm",), keep="min")
    t = cap_per_key(t, "domain", n=1, order_by="doc_id", tie_break=())
    out = sorted((r.doc_id, r.url_norm, r.n_dups)
                 for r in t.df.collect())
    assert out == [(1, "https://a.com/x?a=1&b=2", 3),
                   (5, "https://b.org/z", 1)]
