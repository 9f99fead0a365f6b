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
    "EN_MARKERS",
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
