"""semantic_dedup (corpus/similarity.py — SemDeDup, Abbas et al. 2023):
cluster-blocked cosine dedup.  Invariants: duplicates collapse to the
keep-rule representative, pairs are generated INSIDE cells only, and the
composition equals its stages run by hand."""

from siuba_spark import tbl
from siuba_spark.corpus.similarity import semantic_dedup


def _emb(spark, rows):
    return tbl(spark.createDataFrame(rows, "vec_id long, embedding array<double>"))


def test_semantic_dedup_drops_near_identical(spark):
    # ids 0/1 seed the two sample cells -> orthogonal centroids; the
    # near-dups arrive later and land in their seed's cell
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.999, 0.001, 0.0]),   # ~dup of 0, cell 0
        (3, [0.0, 0.998, 0.002]),   # ~dup of 1, cell 1
        (4, [0.6, 0.6, 0.0]),
    ]
    t = _emb(spark, rows)
    kept, pairs = semantic_dedup(t, threshold=0.95, n_lists=2,
                                 centroids="sample", return_pairs=True)
    ids = sorted(r.vec_id for r in kept.df.collect())
    # representatives are the min ids of each near-dup component
    assert 0 in ids and 1 in ids
    assert 2 not in ids and 3 not in ids
    got_pairs = {(r.id_a, r.id_b) for r in pairs.df.collect()}
    assert (0, 2) in got_pairs and (1, 3) in got_pairs


def test_semantic_dedup_pairs_are_cell_blocked(spark):
    """Two identical vectors FORCED into different cells must not pair —
    SemDeDup compares within clusters only (that is the scale contract:
    cost is sum of cell², never corpus²)."""
    # sample centroids = first-2 ids = the two identical vectors -> each
    # seeds its own cell; argmin ties break to the FIRST cell, so put a
    # tiny perturbation on vec 1 to keep it in cell 1
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [1.0, 0.0001]),    # cell 0
        (3, [0.0001, 1.0]),    # cell 1
    ]
    t = _emb(spark, rows)
    _kept, pairs = semantic_dedup(t, threshold=0.5, n_lists=2,
                                  centroids="sample", return_pairs=True)
    got = {(r.id_a, r.id_b) for r in pairs.df.collect()}
    # within-cell near-dups pair; the orthogonal cross-cell ones never do
    assert (0, 2) in got and (1, 3) in got
    assert all(not (a in (0, 2) and b in (1, 3)) and
               not (a in (1, 3) and b in (0, 2)) for a, b in got)


def test_semantic_dedup_keep_max(spark):
    rows = [(0, [1.0, 0.0]), (7, [1.0, 0.000001]), (3, [0.0, 1.0])]
    t = _emb(spark, rows)
    kept = semantic_dedup(t, threshold=0.99, n_lists=1, centroids="sample",
                          keep="max")
    assert sorted(r.vec_id for r in kept.df.collect()) == [3, 7]


def test_vector_mean_groups_and_normalize(spark):
    """vector_mean: element-wise per-group means (decimal-exact sums),
    optional L2 normalization with the NULL-on-zero-norm contract."""
    import math

    from siuba_spark.corpus.similarity import vector_mean
    rows = [("a", [1.0, 2.0]), ("a", [3.0, 4.0]), ("b", [0.0, 0.0])]
    t = tbl(spark.createDataFrame(rows, "g string, embedding array<double>"))
    out = {r.g: list(r.centroid) for r in vector_mean(t, "g").df.collect()}
    assert out == {"a": [2.0, 3.0], "b": [0.0, 0.0]}
    outn = {r.g: list(r.centroid)
            for r in vector_mean(t, "g", normalize=True).df.collect()}
    assert abs(outn["a"][0] - 2 / math.hypot(2, 3)) < 1e-12
    assert outn["b"] == [None, None]


def test_vector_mean_skips_null_elements(spark):
    """NULL elements inside a vector are SKIPPED (non-null denominator,
    the F.avg / pandas-mean contract), not treated as zeros
    (ADVICE r7 item 4)."""
    from siuba_spark.corpus.similarity import vector_mean
    rows = [("a", [1.0, None]), ("a", [3.0, 4.0])]
    t = tbl(spark.createDataFrame(rows, "g string, embedding array<double>"))
    out = {r.g: list(r.centroid) for r in vector_mean(t, "g").df.collect()}
    # position 1: mean over the single non-null value 4.0, not (0+4)/2
    assert out == {"a": [2.0, 4.0]}
