"""Executable port of the reference's gather/spread doc pages
(docs/api_tidy/02_gather.Rmd, 03_spread.Rmd) — same frames, same calls,
including the negative-selection form the doc leads with."""

import pandas as pd

from siuba_spark import _, collect, gather, spread, tbl

COSTS = pd.DataFrame({
    "id": [1, 2],
    "price_x": [.1, .2],
    "price_y": [.4, .5],
    "price_z": [.7, .8],
})


def _t(spark):
    return tbl(spark.createDataFrame(COSTS))


def _norm(df):
    key = ["id", "measure"]
    return df.sort_values(key).reset_index(drop=True)


WANT_LONG = pd.DataFrame({
    "id": [1, 1, 1, 2, 2, 2],
    "measure": ["price_x", "price_y", "price_z"] * 2,
    "value": [.1, .4, .7, .2, .5, .8],
})


def test_gather_manual_slice_and_negative(spark):
    for sel in (
        lambda: gather("measure", "value", _.price_x, _.price_y, _.price_z),
        lambda: gather("measure", "value", _["price_x":"price_z"]),
        lambda: gather("measure", "value", -_.id),
    ):
        out = _t(spark) >> sel() >> collect()
        pd.testing.assert_frame_equal(_norm(out), _norm(WANT_LONG),
                                      check_dtype=False)


def test_spread_inverts_gather(spark):
    out = (_t(spark)
           >> gather("measure", "value", -_.id)
           >> spread("measure", "value")
           >> collect())
    got = out.sort_values("id").reset_index(drop=True)[COSTS.columns.tolist()]
    pd.testing.assert_frame_equal(got, COSTS, check_dtype=False)
