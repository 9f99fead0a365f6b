"""Physical-plan audit over every registered query: counts the plan nodes
that matter at 100 TB (shuffles, join strategies, windows, cartesian
products, Python evals) and writes PLAN_AUDIT.json.

    python tools/plan_audit.py [sf_dir]

Constructs each query's plan (no execution beyond the bounded pivot-spec /
convert-probe jobs some verbs document) and tallies node occurrences from
the executed-plan string.  The interesting red flags:

- CartesianProduct anywhere (the O(n^2) node — only acceptable never)
- BroadcastNestedLoopJoin outside the documented 1-row theta joins
- an unpartitioned Window (single-reducer funnel)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NODES = {
    "exchanges": r"Exchange hashpartitioning",
    "single_partition_exchanges": r"Exchange SinglePartition",
    "broadcast_hash_joins": r"BroadcastHashJoin",
    "sort_merge_joins": r"SortMergeJoin",
    "shuffled_hash_joins": r"ShuffledHashJoin",
    "broadcast_nested_loop_joins": r"BroadcastNestedLoopJoin",
    "cartesian_products": r"CartesianProduct",
    "windows": r"\bWindow\b",
    "python_evals": r"BatchEvalPython|ArrowEvalPython",
    "map_in_pandas": r"MapInPandas",
    "scans": r"Scan parquet|FileScan",
}


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from siuba_spark import release_all_pins
    from siuba_spark.plans.tbl import _window_skew_watch

    out = {}
    for name, fn in sorted(entry.queries().items()):
        try:
            df = fn(spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
            stats = {k: len(re.findall(p, plan)) for k, p in NODES.items()}
            watch = _window_skew_watch(df._jdf)
            stats["content_keyed_windows"] = len(watch)
            if watch:
                stats["skew_watch"] = sorted({w.split(":")[0] for w in watch})
            out[name] = stats
        except Exception as exc:
            out[name] = {"error": str(exc)[:200]}
        release_all_pins()

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "PLAN_AUDIT.json")
    with open(path, "w") as fh:
        json.dump({"sf_dir": sf, "queries": out}, fh, indent=1)

    cart = [n for n, s in out.items() if s.get("cartesian_products")]
    bnlj = [n for n, s in out.items() if s.get("broadcast_nested_loop_joins")]
    skew = [n for n, s in out.items() if s.get("content_keyed_windows")]
    errs = [n for n, s in out.items() if "error" in s]
    print(f"{len(out)} plans audited -> {path}")
    print("cartesian products:", cart or "none")
    print("nested-loop joins (expect only 1-row theta joins):", bnlj)
    print("content-keyed windows (skew watch):", skew or "none")
    print("errors:", errs or "none")
    sys.exit(1 if cart or errs else 0)


if __name__ == "__main__":
    main()
