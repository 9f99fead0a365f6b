"""Z-order pruning vs file count (VERDICT r10 item 7): the 2·sqrt(P)
Morton bound was asserted from theory plus an 8-trial jitter study at
P=16 files; this rig measures 16-, 64-, and 256-file layouts so the
touched FRACTION can be checked to shrink ~1/sqrt(P) and the graded
entry's ≤3/4 gate confirmed honest (not tight-by-luck) at larger P.

    python tools/zorder_spot.py [sf_dir]

For each P: write the orders table zorder(o_custkey, o_totalprice,
bits=4) clustered into P files, then for EACH column run 8
2%-of-range band filters at jittered offsets and count distinct
``input_file_name()`` values the scan touches.  Prints per-(P, column)
min/median/max touched counts and fractions.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "16g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from siuba_spark import _, cluster_by, tbl

    orders = tbl(spark, f"{sf_dir}/orders.parquet")
    lo_k, hi_k, lo_p, hi_p = orders.df.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice")).first()

    bands = {
        "o_custkey": (lo_k, hi_k),
        "o_totalprice": (lo_p, hi_p),
    }

    base = "/tmp/siuba_spark_zorder_spot"
    shutil.rmtree(base, ignore_errors=True)
    print(f"{'P':>4s} {'column':>14s} {'min':>5s} {'med':>5s} {'max':>5s} "
          f"{'max_frac':>9s}")
    try:
        for p in (16, 64, 256):
            path = os.path.join(base, f"p{p}")
            out = orders >> cluster_by(_.o_custkey, _.o_totalprice,
                                       method="zorder", n_partitions=p)
            out.df.write.mode("overwrite").parquet(path)
            laid = spark.read.parquet(path)
            n_files = (laid.select(F.input_file_name()).distinct().count())
            for col, (lo, hi) in bands.items():
                width = (hi - lo) * 0.02
                touched = []
                for t in range(8):
                    start = lo + (hi - lo) * (0.05 + 0.11 * t)
                    n = (laid.filter((F.col(col) >= start)
                                     & (F.col(col) < start + width))
                         .select(F.input_file_name()).distinct().count())
                    touched.append(n)
                print(f"{n_files:4d} {col:>14s} {min(touched):5d} "
                      f"{int(statistics.median(touched)):5d} "
                      f"{max(touched):5d} {max(touched) / n_files:9.3f}")
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
