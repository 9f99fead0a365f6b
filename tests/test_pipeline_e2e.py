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
