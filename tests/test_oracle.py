"""Driver-mimicking correctness gate: every __spark_entry__.queries() entry
runs on Spark AND (where an oracle exists) as DuckDB SQL over the same
parquet; results must match as an exact multiset (row count, column names,
values) — the same bar as the driver's order-insensitive value-hash.
"""

import math

import pandas as pd
import pytest

import __spark_entry__ as entry

from .conftest import SF_ORACLE

QUERIES = entry.queries()
ORACLES = entry.oracle_sql()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all columns (order-insensitive)."""
    df = df[sorted(df.columns)].copy()
    # normalize ints (int32 vs int64) so sort/compare is stable
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c].dtype):
            df[c] = df[c].astype("float64") if df[c].isna().any() else df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c].dtype):
            df[c] = df[c].astype("boolean")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_ORACLE)
    got = sdf.toPandas()
    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op)
        assert len(got) >= 0
        assert len(got.columns) > 0
        return
    want = duck.execute(ORACLES[name]).df()
    assert len(got) == len(want), f"{name}: rows {len(got)} != oracle {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}")
    # The driver's value-hash is dtype-sensitive (10003 vs 10003.0 differ):
    # catch int-vs-float kind mismatches locally before canon() papers over
    # them. 'i'/'u' are one kind; NaN-bearing int columns arrive as 'f'.
    for c in got.columns:
        gk = got[c].dtype.kind.replace("u", "i")
        wk = want[c].dtype.kind.replace("u", "i")
        if {gk, wk} == {"i", "f"} and not (
            got[c].isna().any() or want[c].isna().any()
        ):
            raise AssertionError(
                f"{name}.{c}: dtype kind {gk} vs oracle {wk} — the driver's "
                "value-hash would fail; CAST the oracle (or alias the Spark "
                "side) so both emit the same numeric kind")
    g, w = canon(got), canon(want)
    try:
        pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
    except AssertionError:
        # distinguish "close but float-fuzzy" (query design bug: needs
        # rounding/decimal trick) from plain wrong
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          rtol=1e-6, atol=1e-9)
            raise AssertionError(
                f"{name}: values match within tolerance but NOT exactly — "
                "the driver's value-hash would fail; add rounding or the "
                "decimal-sum trick to both sides")
        except AssertionError as e:
            if "value-hash would fail" in str(e):
                raise
            raise AssertionError(f"{name}: values differ from oracle") from e


# -- ANN recall gates: approximate methods vs the exact baseline ------------
# (rows-only entries in the driver artifact; this pins their QUALITY)


def _topk_sets(df, k_col="rk"):
    """{query_id: set(nbr_id)} from a topk result pandas frame."""
    out = {}
    for q, grp in df.groupby("query_id"):
        out[q] = set(grp["nbr_id"])
    return out


def _recall(approx: dict, exact: dict) -> float:
    hits = total = 0
    for q, want in exact.items():
        got = approx.get(q, set())
        hits += len(got & want)
        total += len(want)
    return hits / total if total else 1.0


@pytest.fixture(scope="module")
def _ann_frames(spark):
    from siuba_spark import filter as sfilter
    from siuba_spark import tbl
    from siuba_spark.corpus.similarity import (
        brute_force_topk, ivf_topk, lsh_topk,
    )
    from siuba_spark import _
    emb = tbl(spark, f"{SF_ORACLE}/embeddings.parquet")
    queries = emb >> sfilter(_.vec_id < 20)
    exact = brute_force_topk(emb, queries, k=10).df.toPandas()
    lsh = lsh_topk(emb, queries, k=10, n_planes=4, n_tables=12).df.toPandas()
    ivf = ivf_topk(emb, queries, k=10, n_lists=8, n_probes=3).df.toPandas()
    return exact, lsh, ivf


def test_lsh_topk_recall_floor(_ann_frames):
    exact, lsh, _ivf = _ann_frames
    r = _recall(_topk_sets(lsh), _topk_sets(exact))
    assert r >= 0.5, f"lsh_topk recall {r:.3f} below floor (12 tables x 4 planes)"


def test_ivf_topk_recall_floor(_ann_frames):
    exact, _lsh, ivf = _ann_frames
    r = _recall(_topk_sets(ivf), _topk_sets(exact))
    assert r >= 0.6, f"ivf_topk recall {r:.3f} below floor (8 lists, 3 probes)"


def test_ann_methods_perfect_precision_on_scored_pairs(_ann_frames):
    """Approximate methods never mis-score: every (query,nbr) pair they DO
    return carries exactly the same rounded cosine as the exact baseline."""
    exact, lsh, ivf = _ann_frames
    escore = {(r.query_id, r.nbr_id): r.score for r in exact.itertuples()}
    for name, df in (("lsh", lsh), ("ivf", ivf)):
        for r in df.itertuples():
            key = (r.query_id, r.nbr_id)
            if key in escore:
                assert abs(r.score - escore[key]) < 1e-9, (name, key)


def test_hash_features_deterministic_and_countful(spark):
    """Feature hashing: md5-stable buckets, vector sums equal token counts,
    identical across runs (Arrow mapInPandas path)."""
    from pyspark.sql import functions as F

    from siuba_spark import tbl
    from siuba_spark.corpus.text import hash_features

    t = tbl(spark, "/root/testdata/sf0.001/documents.parquet")
    out = hash_features(t, col="text", dim=32, out="f")
    agg = (out.df
           .select(F.aggregate("f", F.lit(0), lambda a, x: a + x).alias("s"),
                   F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n"))
           .agg(F.sum("s").alias("s"), F.sum("n").alias("n")).first())
    assert agg.s == agg.n, (agg.s, agg.n)
    a = out.df.select("doc_id", "f").orderBy("doc_id").collect()
    b = hash_features(t, col="text", dim=32, out="f").df \
        .select("doc_id", "f").orderBy("doc_id").collect()
    assert a == b
