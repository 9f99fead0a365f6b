"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Designed for the 100 TB case:
- exact dedup = one hash-shuffle on the dedup key (no driver state);
- near-dup candidate generation avoids the O(n²) cross join via LSH
  banding (shingle → minhash → band → bucket-join), so cost is
  O(n·H + candidate pairs);
- verification (exact Jaccard) runs only on bucket-collided pairs.
All transformations are built-in array functions — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..plans.pipe import verb
from ..plans.tbl import SparkTbl
from .text import tokens_col

__all__ = [
    "exact_dedup", "add_shingles", "add_minhash", "lsh_candidate_pairs",
    "jaccard_pairs", "minhash_near_dups", "add_simhash",
]


@verb
def exact_dedup(tbl: SparkTbl, cols=("text",), id_col: str = "doc_id",
                keep: str = "min"):
    """Keep one row per duplicate group (lowest id wins) and record the
    group size.  One shuffle on the dedup key."""
    cols = list(cols)
    w = Window.partitionBy(*cols)
    w_rank = w.orderBy(F.col(id_col).asc() if keep == "min" else F.col(id_col).desc())
    df = (tbl.df
          .withColumn("n_dups", F.count(F.lit(1)).over(w))
          .withColumn("__rn", F.row_number().over(w_rank))
          .filter(F.col("__rn") == 1)
          .drop("__rn"))
    return tbl.evolve(df=df)


def shingles_col(toks, k: int = 3):
    """k-word shingles of a token array (array<string>)."""
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k))))


@verb
def add_shingles(tbl: SparkTbl, col: str = "text", k: int = 3, out: str = "shingles"):
    return tbl.evolve(df=tbl.df.withColumn(out, shingles_col(tokens_col(F.col(col)), k)))


def minhash_col(shingles, num_hashes: int = 32):
    """MinHash signature: per seed i, min over shingles of xxhash64(s, i)."""
    return F.array(*[
        F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i))))
        for i in range(num_hashes)
    ])


@verb
def add_minhash(tbl: SparkTbl, shingle_col: str = "shingles",
                num_hashes: int = 32, out: str = "minhash"):
    return tbl.evolve(df=tbl.df.withColumn(out, minhash_col(F.col(shingle_col), num_hashes)))


@verb
def lsh_candidate_pairs(tbl: SparkTbl, id_col: str = "doc_id",
                        sig_col: str = "minhash", bands: int = 8, rows: int = 4):
    """LSH banding: split the signature into `bands` bands of `rows`
    values; docs sharing any (band, band-hash) bucket become candidate
    pairs.  The self-join shuffles on the bucket key only — never the
    full O(n²) cross product."""
    band_entries = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.hash(F.slice(F.col(sig_col), b * rows + 1, rows)).alias("bucket"))
        for b in range(bands)
    ])
    buckets = (tbl.df
               .select(F.col(id_col), F.explode(band_entries).alias("be"))
               .select(id_col, "be.band", "be.bucket"))
    l = buckets.alias("l")
    r = buckets.alias("r")
    pairs = (l.join(r, [F.col(f"l.band") == F.col("r.band"),
                        F.col(f"l.bucket") == F.col("r.bucket"),
                        F.col(f"l.{id_col}") < F.col(f"r.{id_col}")])
             .select(F.col(f"l.{id_col}").alias("id_a"),
                     F.col(f"r.{id_col}").alias("id_b"))
             .distinct())
    return SparkTbl(pairs)


@verb
def jaccard_pairs(tbl: SparkTbl, other=None, id_col: str = "doc_id",
                  set_col: str = "shingles", block_col: str | None = None,
                  threshold: float = 0.0):
    """Exact n-gram Jaccard similarity for document pairs.

    With ``block_col``, pairs are generated within blocks (bounded
    quadratic); without, the caller should pass pre-generated candidate
    pairs instead.  Jaccard = |A∩B| / |A∪B| over distinct shingles."""
    df = tbl.df
    l = df.select(F.col(id_col).alias("id_a"), F.col(set_col).alias("set_a"),
                  *( [F.col(block_col).alias("blk")] if block_col else [] ))
    r = df.select(F.col(id_col).alias("id_b"), F.col(set_col).alias("set_b"),
                  *( [F.col(block_col).alias("blk")] if block_col else [] ))
    cond = [F.col("id_a") < F.col("id_b")]
    joined = l.join(r, (["blk"] if block_col else []) ) if block_col else l.crossJoin(r)
    joined = joined.filter(cond[0])
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size(F.array_union("set_a", "set_b"))
    out = (joined
           .withColumn("jaccard", F.round(inter / union, 4))
           .filter(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", "jaccard"))
    return SparkTbl(out)


@verb
def minhash_near_dups(tbl: SparkTbl, col: str = "text", id_col: str = "doc_id",
                      k: int = 3, num_hashes: int = 32, bands: int = 8,
                      rows: int = 4, threshold: float = 0.7):
    """Full near-dup pipeline: shingle → minhash → LSH buckets → exact
    Jaccard verification of candidates."""
    base = add_shingles(tbl, col=col, k=k)
    sigs = add_minhash(base, num_hashes=num_hashes)
    cands = lsh_candidate_pairs(sigs, id_col=id_col, bands=bands, rows=rows)
    sets_ = base.df.select(F.col(id_col), F.col("shingles"))
    verified = (cands.df
                .join(sets_.select(F.col(id_col).alias("id_a"),
                                   F.col("shingles").alias("set_a")), "id_a")
                .join(sets_.select(F.col(id_col).alias("id_b"),
                                   F.col("shingles").alias("set_b")), "id_b")
                .withColumn("jaccard", F.round(
                    F.size(F.array_intersect("set_a", "set_b"))
                    / F.size(F.array_union("set_a", "set_b")), 4))
                .filter(F.col("jaccard") >= threshold)
                .select("id_a", "id_b", "jaccard"))
    return SparkTbl(verified)


@verb
def add_simhash(tbl: SparkTbl, col: str = "text", bits: int = 16,
                out: str = "simhash"):
    """SimHash document signature (bits ≤ 32): bit j is the sign of the
    sum over tokens of ±1 according to bit j of the token hash.  Built
    from per-bit F.aggregate folds — JVM-side, no UDF."""
    toks = tokens_col(F.col(col))

    def bit_merge(j):
        # factory (not a default-arg lambda): pyspark's higher-order-function
        # introspection requires an exact two-parameter signature
        def merge(acc, x):
            bit = F.shiftright(F.xxhash64(x), j).bitwiseAND(F.lit(1))
            return acc + F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))
        return merge

    bit_cols = []
    for j in range(bits):
        contrib = F.aggregate(toks, F.lit(0).cast("long"), bit_merge(j))
        bit_cols.append(F.when(contrib > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    sig = bit_cols[0]
    for b in bit_cols[1:]:
        sig = sig + b
    return tbl.evolve(df=tbl.df.withColumn(out, sig.cast("long")))
