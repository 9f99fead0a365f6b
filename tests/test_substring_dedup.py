"""Tests for siuba_spark.corpus.dedup.substring_dedup (Lee et al. 2021
ExactSubstr span dedup, word-token edition).

Reference anchor: the reference repo has no suffix-array dedup — this is a
beyond-reference training-pipeline operator; its contract is the paper's
cut semantics re-expressed as fingerprint shuffles (see the verb docstring).
"""

import duckdb
import pytest

from siuba_spark.corpus.dedup import substring_dedup

from .helpers import assert_equal_query, data_frame

SF_SMALL = "/root/testdata/sf0.001"


def _texts(t, **kw):
    out = substring_dedup(t, **kw).df.orderBy("doc_id").toPandas()
    return dict(zip(out.doc_id.tolist(), out.text.tolist()))


def test_cross_doc_span_removed_first_kept(spark):
    t = data_frame(
        spark,
        doc_id=[1, 2, 3],
        text=[
            "a b c d e f g h tail one",
            "head two a b c d e f g h xx",  # copies doc1's 8-token run
            "short doc",                     # < k tokens: untouched
        ],
    )
    got = _texts(t, k=8)
    assert got == {
        1: "a b c d e f g h tail one",
        2: "head two xx",
        3: "short doc",
    }


def test_within_doc_repeat_and_vanish(spark):
    t = data_frame(
        spark,
        doc_id=[1, 2],
        text=["r " * 15 + "r",   # 16 identical tokens: tandem repeat
              "w x y z w x y z w x y z w x y z"],  # period-4 repeat, k=8
    )
    got = _texts(t, k=8)
    # tandem repeat: dup windows start at 1..8 covering 1..15; head survives
    assert got[1] == "r"
    # period-4: dup windows at 4..8 cover 4..15; first window's 0..3 survive
    assert got[2] == "w x y z"


def test_overlapping_spans_merge(spark):
    # doc2 copies two OVERLAPPING 8-runs of doc1 => one merged cut
    t = data_frame(
        spark,
        doc_id=[1, 2],
        text=[
            "p q a b c d e f g h i j k l",
            "z a b c d e f g h i j k l y",  # copies doc1 positions 2..13
        ],
    )
    got = _texts(t, k=8)
    assert got[1] == "p q a b c d e f g h i j k l"
    assert got[2] == "z y"


def test_exact_key_matches_hash_key(spark):
    t = data_frame(
        spark,
        doc_id=[1, 2],
        text=["m n o p q r s t u", "v m n o p q r s t u"],
    )
    assert _texts(t, k=8, key="exact") == _texts(t, k=8, key="hash")


def test_k_validation(spark):
    t = data_frame(spark, doc_id=[1], text=["a b"])
    with pytest.raises(ValueError):
        substring_dedup(t, k=1)
    with pytest.raises(ValueError):
        substring_dedup(t, key="fuzzy")


def test_matches_duckdb_oracle_sf0001(spark):
    """Graded-query twin at sf0.001: same cut as the SQL oracle."""
    k = 8
    t_spark = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    from siuba_spark.plans.tbl import SparkTbl
    out = substring_dedup(SparkTbl(t_spark), k=k).df.select("doc_id", "text")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_SMALL}/documents.parquet')")
    exp = con.execute(f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
    g AS (SELECT doc_id,
            unnest(list_transform(range(1, len(toks) - {k} + 2),
              i -> struct_pack(pos := i,
                  gram := array_to_string(toks[i:i+{k}-1], chr(31))))) AS s
          FROM tok WHERE len(toks) >= {k}),
    ranked AS (SELECT doc_id, s.pos AS pos,
            row_number() OVER (PARTITION BY s.gram
                               ORDER BY doc_id, s.pos) AS rn
          FROM g),
    cov AS (SELECT DISTINCT doc_id, p FROM
            (SELECT doc_id, unnest(range(pos, pos + {k})) AS p
             FROM ranked WHERE rn > 1)),
    tokpos AS (SELECT doc_id, unnest(toks) AS tok,
                      generate_subscripts(toks, 1) AS p FROM tok),
    kept AS (SELECT t.doc_id, t.tok, t.p FROM tokpos t
             LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.p
             WHERE c.p IS NULL)
    SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text
    FROM kept GROUP BY doc_id ORDER BY doc_id
    """).df()
    from siuba_spark.plans.tbl import SparkTbl as _T
    assert_equal_query(_T(out), exp)


def test_incremental_equals_from_scratch(spark):
    """Two snapshots processed through the gram store reproduce the
    from-scratch cut byte-for-byte (monotone-id contract)."""
    from siuba_spark.corpus.dedup import substring_dedup_incremental
    from siuba_spark.plans.tbl import SparkTbl

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    cut = 250
    a = SparkTbl(docs.filter(docs.doc_id < cut))
    b = SparkTbl(docs.filter(docs.doc_id >= cut))

    out_a, store = substring_dedup_incremental(a, k=8)
    out_b, store2 = substring_dedup_incremental(b, store, k=8)
    inc = out_a.df.unionByName(out_b.df).select("doc_id", "text") \
        .orderBy("doc_id").toPandas()

    scratch = substring_dedup(SparkTbl(docs), k=8).df \
        .select("doc_id", "text").orderBy("doc_id").toPandas()
    assert inc.doc_id.tolist() == scratch.doc_id.tolist()
    assert inc.text.tolist() == scratch.text.tolist()

    # the final store equals the from-scratch first-occurrence set
    n_grams = store2.df.count()
    assert store2.df.select("h").distinct().count() == n_grams


def test_incremental_store_schema_and_reuse(spark):
    from siuba_spark.corpus.dedup import substring_dedup_incremental
    t1 = data_frame(spark, doc_id=[1], text=["a b c d e f g h"])
    t2 = data_frame(spark, doc_id=[2], text=["z a b c d e f g h q"])
    out1, store = substring_dedup_incremental(t1, k=8)
    assert store.df.columns == ["h", "doc_id", "pos"]
    assert out1.df.first().text == "a b c d e f g h"
    out2, store2 = substring_dedup_incremental(t2, store, k=8)
    # doc2's copied 8-run is cut against the STORE (cross-snapshot)
    assert out2.df.first().text == "z q"
    assert store2.df.count() > store.df.count()


def test_user_pos_column_survives(spark):
    """Working columns are __-prefixed: an input table with its own
    'pos' (and 'h') column round-trips through the verb."""
    t = data_frame(
        spark, doc_id=[1, 2], pos=[7, 9], h=[1, 2],
        text=["a b c d e f g h tail", "x a b c d e f g h y"],
    )
    out = substring_dedup(t, k=8).df.orderBy("doc_id").toPandas()
    assert list(out.columns) == ["doc_id", "pos", "h", "text"]
    assert out.pos.tolist() == [7, 9]
    assert out.text.tolist() == ["a b c d e f g h tail", "x y"]


def test_regex_metachar_sep_is_literal(spark):
    """sep is a literal string: '|' must round-trip unchanged."""
    t = data_frame(spark, doc_id=[1], text=["hello|world|now"])
    out = substring_dedup(t, k=2, sep="|").df.toPandas()
    assert out.text.tolist() == ["hello|world|now"]


def test_separator_byte_in_tokens_never_aliases(spark):
    """Fingerprints hash the token SLICE, not a separator-joined string:
    tokens containing \\x1f (the old join byte) must not alias distinct
    windows (['a\\x1fb','c'] vs ['a','b\\x1fc']) — ADVICE r10."""
    t = data_frame(spark, doc_id=[1, 2],
                   text=["a\x1fb c", "a b\x1fc"])
    for key in ("hash", "exact"):
        out = substring_dedup(t, k=2, key=key).df.orderBy("doc_id") \
            .toPandas()
        assert out.doc_id.tolist() == [1, 2], key
        assert out.text.tolist() == ["a\x1fb c", "a b\x1fc"], key


def test_store_compact_equivalence_and_shape(spark):
    """substring_store_compact: one row per gram with the earliest
    (id, pos) provenance, and a store polluted with duplicate h rows
    (overlapping snapshot writes) yields the IDENTICAL cut after
    compaction — duplicates never changed decisions, compaction never
    changes them either."""
    from pyspark.sql import functions as F

    from siuba_spark.corpus.dedup import (
        substring_dedup_incremental, substring_store_compact,
    )
    from siuba_spark.plans.tbl import SparkTbl

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    a = SparkTbl(docs.filter(docs.doc_id < 250))
    b = SparkTbl(docs.filter(docs.doc_id >= 250))
    _out_a, store = substring_dedup_incremental(a, k=8)

    # simulate an overlapping re-write: every gram appears twice, the
    # duplicate carrying LATER provenance that compaction must not keep
    dup = store.df.unionByName(
        store.df.withColumn("doc_id", F.col("doc_id") + 10_000))
    n_grams = store.df.count()
    assert dup.count() == 2 * n_grams

    compacted = substring_store_compact(dup)
    assert compacted.df.columns == ["h", "doc_id", "pos"]
    assert compacted.df.count() == n_grams
    # earliest provenance survives: no synthetic +10k ids remain
    assert compacted.df.filter(F.col("doc_id") >= 10_000).count() == 0

    out_dup = substring_dedup_incremental(b, dup, k=8)[0].df \
        .select("doc_id", "text").orderBy("doc_id").toPandas()
    out_cmp = substring_dedup_incremental(b, compacted, k=8)[0].df \
        .select("doc_id", "text").orderBy("doc_id").toPandas()
    assert out_dup.equals(out_cmp)


def test_gram_store_is_bucketing_compatible(spark, tmp_path):
    """The gram-store join is plain equality on ``h``, so a store
    persisted ``bucket_by=["h"]`` merges bucket-local with no store-side
    Exchange — the same store-locality contract exact_dedup_incremental
    got in r11, verified here rather than asserted (the store rename
    h -> __h must project the bucketing through the alias).  Output must
    equal the unbucketed path exactly."""
    import os

    from pyspark.sql import functions as F

    from siuba_spark import tbl
    from siuba_spark.corpus.dedup import substring_dedup_incremental
    from siuba_spark.plans.tbl import write_parquet

    from .conftest import SF_SMALL

    docs = tbl(spark.read.parquet(f"{SF_SMALL}/documents.parquet"))
    a = tbl(docs.df.filter(F.col("doc_id") < 250))
    b = tbl(docs.df.filter(F.col("doc_id") >= 250))
    _out_a, store = substring_dedup_incremental(a, k=8)

    name = f"ss_gram_store_{os.getpid()}"
    write_parquet(store, str(tmp_path / "gstore"), bucket_by=["h"],
                  n_buckets=8, table_name=name)
    back = spark.table(name)

    out_u, _su = substring_dedup_incremental(b, store, k=8)
    out_b, _sb = substring_dedup_incremental(b, back, k=8)
    plan = out_b.df._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan, plan
    from .helpers import assert_scan_joins_without_exchange
    assert_scan_joins_without_exchange(plan, name)
    got = out_b.df.select("doc_id", "text")
    want = out_u.df.select("doc_id", "text")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    spark.sql(f"DROP TABLE IF EXISTS {name}")
