"""Oracle-check a SUBSET of __spark_entry__ queries (fast iteration loop).

    python tools/subset_sweep.py name1 name2 ... [--sf /root/testdata/sf0.01]

Same compare as tools/oracle_sweep.py (the driver's bar) without paying for
the full 140-query run.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle_sweep import TABLES, canon  # noqa: E402  (sibling module)


def main():
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        args = args[:i] + args[i + 2:]
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    import __spark_entry__ as entry
    queries, oracles = entry.queries(), entry.oracle_sql()
    bad = []
    for name in args:
        try:
            got = queries[name](spark, sf).toPandas()
            if name not in oracles:
                print(f"OK(rows-only) {name}: {len(got)}")
                continue
            want = con.execute(oracles[name]).df()
            assert len(got) == len(want), f"rows {len(got)} vs {len(want)}"
            assert sorted(got.columns) == sorted(want.columns), \
                f"cols {sorted(got.columns)} vs {sorted(want.columns)}"
            pd.testing.assert_frame_equal(canon(got), canon(want),
                                          check_dtype=False, check_exact=True)
            print(f"OK {name}: {len(got)}")
        except Exception as exc:
            bad.append(name)
            print(f"FAIL {name}: {str(exc)[:400]}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
