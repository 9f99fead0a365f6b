"""Benchmark harness: runs headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line with per-query and total wall time.

Each query is forced end-to-end with the noop sink (full computation, no
serialization-to-driver cost), after a warmup pass that absorbs JVM/codegen
startup. Each query is timed three times and the best run is reported: a
single-JVM local bench is noisy (GC pauses from earlier queries land on
whichever query runs next), and min-of-3 reflects steady-state throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        # console progress bars interleave carriage returns with stdout;
        # the r10 driver failed to regex the result line out of that mess
        # (BENCH_r10.json "parsed": null) — keep the stream clean
        .config("spark.ui.showConsoleProgress", "false")
        .appName("siuba_spark-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from siuba_spark import release_all_pins

    HEADLINE = [
        "tpch_q1", "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
        "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q11", "tpch_q12",
        "tpch_q13", "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17",
        "tpch_q18", "tpch_q19", "tpch_q20", "tpch_q21", "tpch_q22",
        "revenue_by_nation", "join_inner",
        "grouped_mutate_zscore", "window_ranks", "lead_lag", "cumsum_running",
        "agg_stats", "pivot_wider", "cube_agg", "json_props",
        "events_tumbling", "events_sessionize",
        "text_stats", "fingerprint", "dedup_exact", "minhash_near_dups",
        "ann_topk", "simhash", "embedding_near_dups_lsh",
        "asof_last_purchase", "interval_join_events", "rolling_window",
        "rolling_time_window", "vocab_topk", "tfidf_topk", "one_hot",
        "hash_split", "cut_qcut_bands", "audio_meta",
        "quality_signals", "scrub_pii", "dedup_segments",
        "ngram_contamination", "unigram_logprob", "stratified_sample",
        "chunk_tokens", "fuzzy_pairs", "video_meta", "pack_sequences",
        # round-5 additions
        "rolling_stats", "set_ops", "ivf_topk_lloyd", "pq_topk",
        "ivf_pq_topk",
        # round-8 additions: the r7/r8 corpus-pipeline surface
        "semantic_dedup", "bpe_token_count_true", "vector_mean",
        "exact_dedup_incremental", "semantic_dedup_incr",
        # round-10 additions: the maintenance/layout surface
        "semantic_store_compact", "cluster_by_roundtrip",
        "bucketed_join_roundtrip", "bpe_train_gate", "lang_id_ngram",
        "embedding_clusters",
        # round-10b additions: ExactSubstr span dedup + byte cleanup
        "substring_dedup", "normalize_text", "dedup_segments_doc",
        "zorder_roundtrip",
        # round-11 additions: gram-store compaction chain + persisted-
        # profile lang-id split + keep='none' corpus segment dedup
        "substring_store_compact", "lang_id_split", "dedup_segments_none",
        # round-11 session-2 additions: the web-corpus URL surface +
        # the bigram LM quality scorer
        "domain_cap", "url_parts_extract", "blocklist_filter",
        "lm_logprob_split", "ccnet_buckets",
        # round-12 additions: URL canonicalization + the composed
        # URL-dedup chain + the trigram LM split
        "url_normalize", "url_dedup_chain", "lm_trigram_split",
        "repetition_signals", "ngram_repetition",
        # round-12 session-2 additions: HTML extraction, mojibake
        # repair, NB classifier split
        "html_extract", "mojibake_fix", "nb_classify_split",
    ]
    # The graded registry twins of these run on the SQL-portable md5_64
    # hash so DuckDB can cross-check them; the bench times the xxhash64
    # PRODUCTION variants (identical plan shape, fastest hash) and reports
    # them under the historical names so cross-round comparisons stay
    # apples-to-apples.
    BENCH_ALIASES = {
        "minhash_near_dups": "minhash_near_dups_prod",
        "simhash": "simhash_prod",
    }
    # single-JVM noise movers get extra repetitions (r2->r3 showed ±40%
    # swings on these at min-of-3 with unchanged plans; tpch_q3 showed a
    # 0.57 vs 0.74 A/A swing on identical code in r4; tpch_q4 had all 3
    # r4 reps swallowed by one GC event — 3.498 s recorded vs 0.711 s
    # re-measured in a clean JVM)
    # ivf_topk_lloyd added r8: two consecutive upward creeps (1.42 ->
    # 1.65 -> 1.88 s) that the tight A/A compare attributed mostly to
    # noise + a removed second collect; extra reps pin it down
    # pack_sequences added r9: flagged 1.23x in the r8 driver run, but a
    # clean-JVM min-of-7 re-measure gave 0.451 s (vs 0.56 r7) — noise;
    # rolling_stats likewise re-measured 0.65 s min-of-7 against the r8
    # driver's 0.87 (r7 0.68) — both stay on extra reps to keep the
    # driver number honest
    # rolling_time_window / interval_join_events added r9: run-b sat
    # 1.37x/1.28x over the r8 artifact with no code cause in the r9
    # diff (clean-JVM min-of-7 = r7 levels); r10 watch set
    # set_ops added r11 (VERDICT r10 item 8): third consecutive round on
    # watch; two back-to-back clean JVMs measured 0.535 vs 0.341 min-of-7
    # on identical code (r8/r9 recordings: 0.339/0.311) — adjudicated
    # noise, pinned with extra reps so the driver number stays honest
    EXTRA_REPS = {"simhash", "pivot_wider", "minhash_near_dups", "tpch_q3",
                  "tpch_q4", "rolling_stats", "ivf_topk_lloyd",
                  "pack_sequences", "rolling_time_window",
                  "interval_join_events", "set_ops",
                  # VERDICT r12 item 9: the r12 profile-persist showed a
                  # 26->23-Exchange plan win but a flat-to-noisy wall
                  # delta (1.75->1.98 driver-to-driver) — min-of-5
                  # adjudicates whether the persist pays at driver
                  # conditions
                  "lang_id_ngram"}
    # ivf_topk_lloyd has flip-flopped three rounds (1.48-2.8 s, run-b and
    # run-c flagging OPPOSITE directions); VERDICT r9 item 5 escalates it
    # to min-of-7 so the r10 compare adjudicates it finally
    MIN7_REPS = {"ivf_topk_lloyd"}
    queries = entry.queries()
    # the xxhash64 simhash twin left the graded registry in round 6 (its
    # driver signal is now the constant-oracle simhash_prod_gate); bench
    # still times the raw production query under the historical name
    queries["simhash_prod"] = entry.q_simhash_prod
    # same pattern for the prod minhash: the registry grades it through
    # the constant-oracle minhash_prod_gate (LSH recall for borderline
    # pairs is probabilistic, so no fixed pair-set oracle exists); bench
    # still times the raw production query
    queries["minhash_near_dups_prod"] = entry.q_minhash_near_dups_prod

    def run(name):
        df = queries[BENCH_ALIASES.get(name, name)](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        release_all_pins()

    # warmup: absorb JVM startup + whole-stage-codegen JIT compilation for
    # every query shape (first execution of a large generated class costs
    # seconds; steady-state throughput is what a long-running cluster sees)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for name in HEADLINE:
        try:
            run(name)
        except Exception:
            pass

    timings = {}
    for name in HEADLINE:
        best = None
        n_reps = 7 if name in MIN7_REPS else 5 if name in EXTRA_REPS else 3
        for _attempt in range(n_reps):
            t0 = time.perf_counter()
            try:
                run(name)
            except Exception as exc:  # keep the bench line intact
                print(f"bench error in {name}: {exc}", file=sys.stderr)
                break
            elapsed = time.perf_counter() - t0
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = round(best, 3) if best is not None else None

    release_all_pins()
    leaked = spark.sparkContext._jsc.getPersistentRDDs().size()
    if leaked:
        print(f"bench warning: {leaked} persistent RDDs leaked", file=sys.stderr)

    # A/A noise band (VERDICT r5 punch 5): re-time three sentinel queries
    # at the END of the session with identical code — the ratio vs their
    # main-loop timing is the empirical same-JVM noise floor, recorded so
    # cross-round comparisons can tell regression from jitter.
    aa = {}
    for name in ("tpch_q3", "agg_stats", "window_ranks"):
        if timings.get(name):
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                try:
                    run(name)
                except Exception:
                    break
                e = time.perf_counter() - t0
                best = e if best is None else min(best, e)
            if best is not None:
                aa[name] = round(best / timings[name], 3)

    total = round(sum(v for v in timings.values() if v is not None), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sfv = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "aa_rerun_ratio": aa,
        "sf": sfv,
    }
    # The driver captures only the LAST 2000 chars of stdout and parses
    # the final complete JSON line out of that tail.  The full 3-decimal
    # record (~2.5 KB compact) overflowed that buffer in r10 and r11
    # ("parsed": null), and the r12 workaround (short summary last,
    # detail in a file) parsed but left the driver's per-query and
    # scaling comparisons EMPTY because the parsed line had no
    # "queries".  r13: the LAST line is the full record with per-query
    # times quantized just enough to fit the tail — precision is
    # degraded largest-value-first (where relative quantization error
    # is smallest: 2 decimals -> 1 decimal, bare integers for values
    # >= 10 s or integral after rounding) until the line is <= 1950
    # chars (the 97-query roster's name keys alone are 1.62 KB, so the
    # 2-decimal form is ~2.09 KB and the fully-degraded floor ~1.97 KB;
    # 1950 leaves headroom for a few "null" error entries and new
    # queries).  Full 3-decimal precision still goes to
    # BENCH_full_last.json and an early stdout line.
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_full_last.json"), "w") as fh:
            json.dump(full, fh, separators=(",", ":"))
    except OSError as exc:  # bench result still prints
        print(f"bench warning: could not write BENCH_full_last.json: "
              f"{exc}", file=sys.stderr)

    def contract_line(q, value):
        return json.dumps({
            "metric": "headline_queries_total_sec",
            "value": value,
            "unit": "sec",
            "queries": q,
            "sf": sfv,
        }, separators=(",", ":"))

    def degrade(v):
        r1 = round(v, 1)
        return int(r1) if (v >= 10 or r1 == int(r1)) else r1

    q2 = {k: (None if v is None else round(v, 2))
          for k, v in timings.items()}
    last = contract_line(q2, round(total, 2))
    if len(last) > 1950:
        # degrade in descending value order; stop as soon as it fits
        for v, k in sorted(((v, k) for k, v in timings.items()
                            if v is not None and v >= 0.05),
                           reverse=True):
            q2[k] = degrade(v)
            last = contract_line(q2, round(total, 1))
            if len(last) <= 1950:
                break
    # hard cap: the driver tail keeps the last 2000 chars, so the line
    # plus its trailing newline must fit 2000 — 1996 leaves slack for a
    # stray carriage return.  (The fully-degraded floor for the current
    # 97-query roster measures 1983-1993 chars run-to-run; only a run
    # with several errored queries, whose "null" entries are a char
    # wider, can overflow into the totals-only fallback.)
    if len(last) > 1996:
        print(f"bench warning: contract line {len(last)} chars exceeds "
              "the driver tail; falling back to totals only",
              file=sys.stderr)
        last = contract_line({}, round(total, 2))
    # flush both streams and start each result at column 0 of a fresh
    # line so stray progress/log carriage returns can't truncate it
    sys.stderr.flush()
    sys.stdout.flush()
    print("\n" + json.dumps(full, separators=(",", ":")), flush=True)
    print(last, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
