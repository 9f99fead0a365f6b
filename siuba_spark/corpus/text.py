"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side (built-in functions over arrays) — no Python UDFs in the hot
path, so whole-stage codegen applies and the same plan scales from 500
docs to 100 TB: tokenization/stats are embarrassingly parallel
projections; only explicit aggregations shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..plans.pipe import verb
from ..plans.tbl import SparkTbl

__all__ = [
    "tokenize", "text_stats", "lang_score", "fingerprint", "token_count_bpe",
    "vocab_topk", "tf_idf", "hash_features", "EN_MARKERS",
]

# small English marker/stopword list for the language-score heuristic
EN_MARKERS = [
    "the", "a", "of", "and", "to", "in", "is", "on", "for", "with",
    "order", "window", "table", "row", "group",
]

_PUNCT_RE = r"[\.,;:!\?\-'\"\(\)]"
# BPE-ish token splitter: words, numbers, or single non-space symbols
_BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def tokens_col(col):
    """Whitespace tokens of lowercased text (returns array<string>)."""
    return F.split(F.trim(F.lower(col)), r"\s+")


@verb
def tokenize(tbl: SparkTbl, col: str = "text", out: str = "tokens"):
    return tbl.evolve(df=tbl.df.withColumn(out, tokens_col(F.col(col))))


@verb
def text_stats(tbl: SparkTbl, col: str = "text"):
    """Quality-scoring features: token counts, length stats, punctuation
    and stopword ratios, type-token ratio.  Pure projection — no shuffle.

    The token array is materialized once into a temp column so the split
    runs once per row, not once per derived stat (Catalyst does not CSE
    across withColumn chains reliably)."""
    c = F.col(col)
    toks = F.col("__toks")
    n_tok = F.size(toks)
    df = (tbl.df
          .withColumn("__toks", tokens_col(c))
          .withColumn("n_chars_calc", F.length(c))
          .withColumn("n_tokens", n_tok)
          # sum of token lengths == chars minus whitespace; regexp stays in
          # whole-stage codegen, unlike an interpreted F.aggregate fold
          .withColumn("avg_token_len",
                      F.round(F.length(F.regexp_replace(F.trim(F.lower(c)), r"\s+", ""))
                              / n_tok.cast("double"), 4))
          .withColumn("punct_ratio",
                      F.round((F.length(c) - F.length(F.regexp_replace(c, _PUNCT_RE, "")))
                              / F.length(c), 4))
          .withColumn("stopword_ratio",
                      F.round(F.size(F.filter(toks, lambda x: x.isin(EN_MARKERS))) / n_tok, 4))
          .withColumn("type_token_ratio",
                      F.round(F.size(F.array_distinct(toks)) / n_tok, 4))
          .drop("__toks"))
    return tbl.evolve(df=df)


@verb
def lang_score(tbl: SparkTbl, col: str = "text", markers=None, out: str = "en_score"):
    """n-gram/stopword language-ID heuristic: fraction of tokens that are
    English marker words.  (The synthetic corpus shares one vocabulary
    across langs, so this is scored, not argmax-classified.)"""
    markers = markers or EN_MARKERS
    toks = tokens_col(F.col(col))
    score = F.round(F.size(F.filter(toks, lambda x: x.isin(markers))) / F.size(toks), 4)
    return tbl.evolve(df=tbl.df.withColumn(out, score))


@verb
def fingerprint(tbl: SparkTbl, col: str = "text", out: str = "fingerprint"):
    """Canonical document fingerprint: md5 of the sorted distinct token
    set — identical content modulo word order/duplication collides, which
    is the point (cheap near-dup key)."""
    toks = tokens_col(F.col(col))
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))
    return tbl.evolve(df=tbl.df.withColumn(out, fp))


@verb
def token_count_bpe(tbl: SparkTbl, col: str = "text", out: str = "n_bpe_tokens"):
    """BPE-ish token count: words / numbers / symbols via regexp_extract_all
    (approximates subword tokenizer counts without a vocab)."""
    cnt = F.size(F.regexp_extract_all(F.lower(F.col(col)), F.lit(_BPE_RE), 0))
    return tbl.evolve(df=tbl.df.withColumn(out, cnt))


@verb
def vocab_topk(tbl: SparkTbl, col: str = "text", k: int = 100,
               min_count: int = 1):
    """Corpus vocabulary: top-k whitespace tokens by frequency.

    One explode projection + one count shuffle on the token key (map-side
    partial aggregation applies), then a global top-k — the same plan at
    500 docs and at 100 TB.  Deterministic tie-break on the token string.
    (Beyond the reference — training-pipeline surface.)"""
    toks = tbl.df.select(
        F.explode(tokens_col(F.col(col))).alias("token"))
    counts = (toks.filter(F.col("token") != "")
              .groupBy("token").count()
              .filter(F.col("count") >= min_count))
    return tbl.evolve(
        df=counts.orderBy(F.col("count").desc(), F.col("token")).limit(k),
        order_by=(("count", False), ("token", True)))


@verb
def tf_idf(tbl: SparkTbl, col: str = "text", id_col: str = "doc_id",
           k_per_doc: int = 5, round_to: int = 6):
    """Per-document top-k TF-IDF terms.

    tf = term count / doc token count; idf = ln(N / df).  Three shuffles
    total — (doc,term) count, term document-frequency, and the final
    per-doc top-k window partitioned by document — all on bounded keys.
    The N scalar rides along as a 1-row broadcast cross join (no collect).
    Deterministic: exact integer counts, ln in double, rounded, ties
    broken on the term string."""
    from pyspark.sql import Window

    base = tbl.df.select(
        F.col(id_col),
        F.filter(tokens_col(F.col(col)),
                 lambda t: t != "").alias("__toks"))
    toks = base.select(F.col(id_col), F.explode("__toks").alias("term"))
    term_counts = toks.groupBy(id_col, "term").agg(F.count("*").alias("tc"))
    # doc length and corpus N come from the PROJECTION side, not the
    # exploded term table: doc_len is a per-row array size (no shuffle,
    # no second pass over the explode), and n_docs is a 1-row aggregate
    # over it — the term_counts subtree is scanned once, for df
    doc_lens = base.select(F.col(id_col),
                           F.size("__toks").alias("doc_len")) \
        .filter(F.col("doc_len") > 0)
    doc_freq = term_counts.groupBy("term").agg(
        F.count("*").alias("df"))
    n_docs = doc_lens.agg(F.count("*").alias("n_docs"))
    scored = (term_counts
              .join(doc_lens, id_col)
              .join(doc_freq, "term")
              .join(F.broadcast(n_docs))
              .withColumn("tfidf", F.round(
                  (F.col("tc") / F.col("doc_len"))
                  * F.log(F.col("n_docs") / F.col("df")), round_to)))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term"))
    out = (scored.withColumn("rk", F.row_number().over(w))
           .filter(F.col("rk") <= k_per_doc)
           .select(id_col, "term", "tfidf", "rk"))
    return tbl.evolve(df=out)


@verb
def hash_features(tbl: SparkTbl, col: str = "text", dim: int = 64,
                  out: str = "features"):
    """Feature hashing (the 'hashing trick'): whitespace tokens →
    fixed-``dim`` count vector via a stable md5 bucket hash.

    Runs in Arrow-batched ``mapInPandas`` with numpy ``bincount`` per
    document — the sanctioned vectorized-Python path (hash+bincount has no
    JVM builtin once dim enters the picture; a per-row higher-order-
    function fold would be interpreted and O(tokens·dim)).  Deterministic
    across runs and machines (md5, not Python hash()).  Map-only stage —
    no shuffle at any scale."""
    import hashlib

    from pyspark.sql import types as T

    in_schema = tbl.df.schema
    out_schema = T.StructType(
        list(in_schema.fields)
        + [T.StructField(out, T.ArrayType(T.IntegerType()))])

    def batches(it):
        import numpy as np

        for pdf in it:
            feats = []
            for text in pdf[col]:
                toks = (text or "").lower().split()
                if toks:
                    idx = np.fromiter(
                        (int.from_bytes(
                            hashlib.md5(t.encode()).digest()[:8], "big") % dim
                         for t in toks), dtype=np.int64, count=len(toks))
                    feats.append(np.bincount(idx, minlength=dim).astype("int32"))
                else:
                    feats.append(np.zeros(dim, dtype="int32"))
            pdf[out] = feats
            yield pdf

    return tbl.evolve(df=tbl.df.mapInPandas(batches, out_schema))
