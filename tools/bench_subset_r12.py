"""Time a SUBSET of bench queries with bench.py's exact methodology
(warmup pass, min-of-N noop-sink reps) for fast optimization iteration.

    python tools/bench_subset_r12.py q1,q2,... [reps] [sf_dir]

Prints one JSON line {"queries": {...}} — NOT a replacement for bench.py
(the driver contract lives there); this is the inner measurement loop.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main():
    names = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
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
        .config("spark.ui.showConsoleProgress", "false")
        .appName("siuba_spark-bench-subset")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __spark_entry__ as entry
    from siuba_spark import release_all_pins
    qs = entry.queries()
    qs["simhash_prod"] = entry.q_simhash_prod
    qs["minhash_near_dups_prod"] = entry.q_minhash_near_dups_prod

    def run(name):
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        release_all_pins()

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for name in names:        # warmup: codegen/JIT for every shape
        run(name)
    timings = {}
    for name in names:
        best = None
        for _ in range(reps):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            run(name)
            e = time.perf_counter() - t0
            best = e if best is None else min(best, e)
        timings[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"queries": timings}, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
