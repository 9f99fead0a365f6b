"""End-to-end training-pipeline integration: the README pipeline runs on
the real documents table, every stage passes the plan lint, and the
output shards round-trip."""

import glob

from pyspark.sql import functions as F

from siuba_spark import _, filter, lint_plan, tbl, write_shards
from siuba_spark.corpus.dedup import drop_near_dups, minhash_near_dups
from siuba_spark.corpus.quality import (
    chunk_tokens, ngram_contamination, quality_signals, scrub_pii,
    stratified_sample, unigram_logprob,
)

SF = "/root/testdata/sf0.01"


def test_full_training_pipeline(spark, tmp_path):
    docs = tbl(spark, f"{SF}/documents.parquet")
    bench = docs >> filter(_.doc_id % 100 == 0)

    clean = (docs
             >> (lambda t: scrub_pii(t))
             >> (lambda t: quality_signals(t))
             >> filter(_.dup_word_frac < 0.95)
             >> (lambda t: ngram_contamination(t, bench, n=8))
             >> filter(_.contamination_frac < 0.5)
             >> (lambda t: unigram_logprob(t)))

    # near-dup removal on the surviving docs
    pairs = minhash_near_dups(clean, col="text", id_col="doc_id",
                              threshold=0.5)
    deduped = drop_near_dups(clean, pairs.df.select("id_a", "id_b"))

    # mixture weighting over the synthetic source ids: keep all of the
    # first ten, downsample the rest
    mixed = stratified_sample(
        deduped, "source",
        frac={f"src{i}": (1.0 if i < 10 else 0.5) for i in range(20)})
    chunked = chunk_tokens(mixed, max_tokens=64, stride=64)

    # plan health at every stage: no cartesians, no row-wise Python, no
    # global-window funnels (BNLJ advisory allowed: 1-row logprob total)
    for stage in (clean, deduped, chunked):
        r = lint_plan(stage)
        hard = [f for f in r["flags"]
                if "BroadcastNestedLoopJoin" not in f]
        assert hard == [], hard

    out = str(tmp_path / "train")
    write_shards(chunked, out, n_shards=4, shuffle_by="doc_id")
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == 4

    back = spark.read.parquet(out)
    n = back.count()
    assert n > 0
    # chunking invariant: every chunk within budget; ids survived the trip
    assert back.filter(F.col("chunk_n_tokens") > 64).count() == 0
    assert back.select("doc_id").distinct().count() <= 500


def test_round7_training_pipeline_composition(spark, tmp_path):
    """End-to-end composition of the round-7 surface: incremental exact
    dedup against a store, semantic dedup of the survivors' embeddings,
    true-BPE token budgets, sequence packing, sharded write — every stage
    a lazy plan, one pipeline."""
    from pyspark.sql import functions as F

    from siuba_spark import _, filter, tbl, write_shards
    from siuba_spark.corpus.bpe import bpe_token_count
    from siuba_spark.corpus.dedup import exact_dedup_incremental
    from siuba_spark.corpus.quality import pack_sequences, token_budget_sample
    from siuba_spark.corpus.similarity import semantic_dedup, vector_mean

    docs = tbl(spark, "/root/testdata/sf0.001/documents.parquet")
    emb = tbl(spark, "/root/testdata/sf0.001/embeddings.parquet")

    # snapshot split + incremental dedup; union of kept == one pass
    a = docs >> filter(_.doc_id < 25)
    b = docs >> filter(_.doc_id >= 25)
    kept_a, store = exact_dedup_incremental(a, None, cols=["text"])
    kept_b, store2 = exact_dedup_incremental(b, store, cols=["text"])
    kept_ids = kept_a.df.select("doc_id").unionByName(
        kept_b.df.select("doc_id"))
    assert kept_ids.count() == store2.df.count()

    # semantic dedup over the kept docs' embeddings
    kept_emb = emb.evolve(df=emb.df.join(
        kept_ids.withColumnRenamed("doc_id", "vec_id"), "vec_id"))
    sem = semantic_dedup(kept_emb, threshold=0.35, n_lists=4,
                         centroids="sample")
    n_sem = sem.df.count()
    assert 0 < n_sem <= kept_ids.count()

    # per-decile centroid export of the survivors
    cents = vector_mean(
        sem.evolve(df=sem.df.withColumn("g", F.col("vec_id") % 3)), "g")
    assert cents.df.count() <= 3

    # BPE-budgeted, packed, sharded training set from the kept docs
    survivors = docs.evolve(df=docs.df.join(kept_ids, "doc_id"))
    # bpe_token_count is column-preserving — no re-join needed
    counted = bpe_token_count(survivors)
    joined = counted.evolve(
        df=counted.df.withColumn("src", (F.col("doc_id") % 2).cast("int")))
    budgeted = token_budget_sample(joined, "src", budget=500,
                                   n_tokens_col="n_bpe_tokens")
    packed = pack_sequences(budgeted, tokens_col="n_bpe_tokens",
                            capacity=128, by="src")
    assert packed.df.filter(F.col("seq_id") < 0).count() == 0
    out = str(tmp_path / "train")
    write_shards(packed, out, n_shards=3, shuffle_by="doc_id")
    back = spark.read.parquet(out)
    assert back.count() == packed.df.count()
