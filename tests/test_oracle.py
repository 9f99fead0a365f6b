"""Driver-mimicking correctness gate: every __spark_entry__.queries() entry
runs on Spark AND (where an oracle exists) as DuckDB SQL over the same
parquet; results must match as an exact multiset (row count, column names,
values) — the same bar as the driver's order-insensitive value-hash.
"""

import math

import pandas as pd
import pytest

import __spark_entry__ as entry

from .conftest import SF_ORACLE

QUERIES = entry.queries()
ORACLES = entry.oracle_sql()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all columns (order-insensitive)."""
    df = df[sorted(df.columns)].copy()
    # normalize ints (int32 vs int64) so sort/compare is stable
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c].dtype):
            df[c] = df[c].astype("float64") if df[c].isna().any() else df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c].dtype):
            df[c] = df[c].astype("boolean")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_ORACLE)
    got = sdf.toPandas()
    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op)
        assert len(got) >= 0
        assert len(got.columns) > 0
        return
    want = duck.execute(ORACLES[name]).df()
    assert len(got) == len(want), f"{name}: rows {len(got)} != oracle {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}")
    # The driver's value-hash is dtype-sensitive (10003 vs 10003.0 differ):
    # catch int-vs-float kind mismatches locally before canon() papers over
    # them. 'i'/'u' are one kind; NaN-bearing int columns arrive as 'f'.
    for c in got.columns:
        gk = got[c].dtype.kind.replace("u", "i")
        wk = want[c].dtype.kind.replace("u", "i")
        if {gk, wk} == {"i", "f"} and not (
            got[c].isna().any() or want[c].isna().any()
        ):
            raise AssertionError(
                f"{name}.{c}: dtype kind {gk} vs oracle {wk} — the driver's "
                "value-hash would fail; CAST the oracle (or alias the Spark "
                "side) so both emit the same numeric kind")
    g, w = canon(got), canon(want)
    try:
        pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
    except AssertionError:
        # distinguish "close but float-fuzzy" (query design bug: needs
        # rounding/decimal trick) from plain wrong
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          rtol=1e-6, atol=1e-9)
            raise AssertionError(
                f"{name}: values match within tolerance but NOT exactly — "
                "the driver's value-hash would fail; add rounding or the "
                "decimal-sum trick to both sides")
        except AssertionError as e:
            if "value-hash would fail" in str(e):
                raise
            raise AssertionError(f"{name}: values differ from oracle") from e
