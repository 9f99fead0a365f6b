"""Bucketed-join scale spot-run: the shuffle-elimination evidence.

    python tools/bucket_spot.py [mult] [sf_dir]

Measures the orders x customer equi join (the bucketed_join_roundtrip
entry's shape) at 1x and ``mult``x (default 10x) in two layouts:

- plain parquet scans (broadcast disabled so the join cannot cheat at
  toy scale): both sides shuffle on the key — the shuffle bytes GROW
  with the data;
- 8-bucket tables written by ``write_parquet(bucket_by=)``: the scans
  already satisfy the join's required distribution — join-stage shuffle
  bytes stay ZERO at every scale, which is the whole point of bucketing
  for repeated same-key joins at 100 TB (the one-time bucketed-write
  shuffle amortizes across every later join).

Prints a table; SCALE.md records the latest run.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "true")
             .config("spark.ui.retainedStages", "100000")
             .config("spark.ui.retainedJobs", "100000").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    def shuffle_write_bytes():
        import json as _json
        import urllib.request
        try:
            ui = spark.sparkContext.uiWebUrl
            app = spark.sparkContext.applicationId
            with urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app}/stages?status=complete",
                    timeout=10) as r:
                stages = _json.loads(r.read())
            return sum(s.get("shuffleWriteBytes", 0) for s in stages)
        except Exception:
            return None

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")

    def blow_up(df, key):
        copies = [df]
        for i in range(1, mult):
            copies.append(df.withColumn(key, F.col(key)
                                        + F.lit(i * 100_000_000)))
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        return out

    tmp = "/tmp/siuba_spark_bucket_spot"
    rows = []

    def run(tag, o_df, c_df):
        """Time the join+agg and meter its shuffle bytes in both layouts."""
        o_path, c_path = f"{tmp}/{tag}_o", f"{tmp}/{tag}_c"
        o_df.write.mode("overwrite").parquet(o_path)
        c_df.write.mode("overwrite").parquet(c_path)

        def agg(o, c):
            j = o.hint("merge").join(
                c.withColumnRenamed("c_custkey", "o_custkey").hint("merge"),
                "o_custkey")
            return (j.groupBy("c_mktsegment")
                    .agg(F.count(F.lit(1)).alias("n"),
                         F.sum("o_totalprice").alias("t")))

        # plain layout (broadcast off so the join really shuffles)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            po = spark.read.parquet(o_path)
            pc = spark.read.parquet(c_path)
            s0, t0 = shuffle_write_bytes(), time.time()
            agg(po, pc).collect()
            plain_t = time.time() - t0
            plain_b = shuffle_write_bytes() - s0

            # bucketed layout: the one-time write, then the join
            s0, t0 = shuffle_write_bytes(), time.time()
            (po.write.mode("overwrite").bucketBy(8, "o_custkey")
             .sortBy("o_custkey").format("parquet")
             .option("path", f"{o_path}_bkt")
             .saveAsTable(f"bspot_o_{tag}"))
            (pc.write.mode("overwrite").bucketBy(8, "c_custkey")
             .sortBy("c_custkey").format("parquet")
             .option("path", f"{c_path}_bkt")
             .saveAsTable(f"bspot_c_{tag}"))
            write_t = time.time() - t0
            write_b = shuffle_write_bytes() - s0

            bo = spark.table(f"bspot_o_{tag}")
            bc = spark.table(f"bspot_c_{tag}")
            s0, t0 = shuffle_write_bytes(), time.time()
            agg(bo, bc).collect()
            bkt_t = time.time() - t0
            bkt_b = shuffle_write_bytes() - s0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        rows.append((tag, plain_t, plain_b, bkt_t, bkt_b, write_t, write_b))

    # absorb JVM/codegen startup so the x1 plain join isn't measured cold
    (orders.join(cust.withColumnRenamed("c_custkey", "o_custkey"),
                 "o_custkey")
     .groupBy("c_mktsegment").count().collect())

    run("x1", orders, cust)
    run(f"x{mult}", blow_up(orders, "o_custkey"), blow_up(cust, "c_custkey"))

    print(f"\n{'scale':>6} {'plain_s':>8} {'plain_shufMB':>13} "
          f"{'bkt_s':>8} {'bkt_shufMB':>11} {'write_s':>8} {'write_shufMB':>13}")
    for tag, pt, pb, bt, bb, wt, wb in rows:
        mb = lambda b: "n/a" if b is None else f"{b / 1e6:.1f}"
        print(f"{tag:>6} {pt:8.2f} {mb(pb):>13} {bt:8.2f} {mb(bb):>11} "
              f"{wt:8.2f} {mb(wb):>13}")


if __name__ == "__main__":
    main()
