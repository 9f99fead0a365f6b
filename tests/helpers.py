"""Test helpers mirroring the reference's harness
(siuba/tests/helpers.py: data_frame + assert_equal_query with
sort-insensitive compare for lazy engines)."""

import pandas as pd


def data_frame(spark, **cols):
    """Small literal table: data_frame(spark, a=[1,2], b=["x","y"]).

    NaNs are converted to real NULLs — createDataFrame(pandas) would
    otherwise produce NaN doubles, which Spark treats as values (isNull
    False, sorts after every number), not SQL NULLs."""
    from siuba_spark import SparkTbl
    pdf = pd.DataFrame(cols)
    for c in pdf.columns:  # all-null columns: treat as double for inference
        if pdf[c].isna().all():
            pdf[c] = pdf[c].astype("float64")
    if not pdf.isna().any().any():
        return SparkTbl(spark.createDataFrame(pdf))
    clean = pdf.astype(object).where(pd.notna(pdf), None)
    rows = [[v.to_pydatetime() if isinstance(v, pd.Timestamp) else v for v in row]
            for row in clean.values.tolist()]
    schema_src = spark.createDataFrame(pdf).schema
    return SparkTbl(spark.createDataFrame(rows, schema=schema_src))


def collect_sorted(tbl_or_df):
    from siuba_spark import SparkTbl
    df = tbl_or_df.df if isinstance(tbl_or_df, SparkTbl) else tbl_or_df
    pdf = df.toPandas()
    return pdf.sort_values(list(pdf.columns), na_position="last").reset_index(drop=True)


def assert_equal_query(result, expected: pd.DataFrame, check_row_order=False):
    """Sort-insensitive comparison (the reference's sanctioned semantics
    for lazy engines, siuba/tests/helpers.py:226-246)."""
    from siuba_spark import SparkTbl
    df = result.df if isinstance(result, SparkTbl) else result
    got = df.toPandas()
    assert sorted(got.columns) == sorted(expected.columns), (
        f"columns {sorted(got.columns)} != {sorted(expected.columns)}")
    expected = expected[list(got.columns)]
    if not check_row_order:
        got = got.sort_values(list(got.columns), na_position="last").reset_index(drop=True)
        expected = expected.sort_values(list(expected.columns),
                                        na_position="last").reset_index(drop=True)
    else:
        got = got.reset_index(drop=True)
        expected = expected.reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)


def assert_scan_joins_without_exchange(plan: str, scan_marker: str):
    """Assert the scan line containing ``scan_marker`` (e.g. a bucketed
    table name) reaches its join with NO Exchange ancestor in between —
    the bucketed-store locality contract.  Walks the executed plan's
    indentation tree upward from the scan line: an ancestor is the
    nearest line above with strictly smaller tree depth."""
    lines = plan.splitlines()

    def depth(line):
        for i, ch in enumerate(line):
            if ch not in " :+-*(":
                return i
        return len(line)

    idx = [i for i, l in enumerate(lines)
           if scan_marker in l and "Scan" in l and "Bucketed: true" in l]
    assert idx, f"no bucketed scan line for {scan_marker!r} in plan:\n{plan}"
    for start in idx:
        d = depth(lines[start])
        for j in range(start - 1, -1, -1):
            dj = depth(lines[j])
            if dj < d:
                d = dj
                node = lines[j].strip()
                # only SHUFFLE exchanges break the locality contract; a
                # BroadcastExchange means AQE chose to broadcast the
                # (test-SF-tiny) store, which is strictly cheaper — at
                # scale it reverts to the bucket-local SMJ
                assert not ("Exchange" in node
                            and "BroadcastExchange" not in node), (
                    f"shuffle Exchange above the bucketed scan:\n"
                    f"{lines[j]}\nscan: {lines[start]}")
                if "Join" in node:
                    break
