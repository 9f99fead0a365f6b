"""Bundled datasets (reference: siuba/data) + fast_* compat aliases
(reference: siuba/experimental/pd_groups)."""

import pytest


def test_datasets_load_and_pipe(spark):
    from siuba_spark import _, group_by, summarize
    from siuba_spark.data import load

    mtcars = load("mtcars", spark)
    assert mtcars.df.count() == 32
    assert "mpg" in mtcars.df.columns
    out = (mtcars >> group_by(_.cyl)
           >> summarize(avg_mpg=_.mpg.mean().round(3))).df.orderBy("cyl").collect()
    assert [r.cyl for r in out] == [4, 6, 8]

    cars = load("cars", spark)
    assert cars.df.columns == ["cyl", "mpg", "hp"]
    assert cars.df.count() == 32

    penguins = load("penguins", spark)
    assert penguins.df.count() == 344

    for name in ["band_members", "band_instruments", "band_instruments2",
                 "fish_encounters", "us_rent_income", "warpbreaks",
                 "penguins_raw", "cars_sql"]:
        assert load(name, spark).df.count() > 0

    with pytest.raises(AttributeError, match="No dataset"):
        load("nope", spark)


def test_data_module_getattr(spark):
    """Reference muscle memory: `from siuba_spark.data import mtcars`
    (module __getattr__ binds to the active session)."""
    from siuba_spark.data import mtcars
    assert mtcars.df.count() == 32


def test_fast_aliases_are_native_verbs(spark):
    from siuba_spark.experimental.pd_groups import (
        fast_filter, fast_mutate, fast_summarize,
    )
    from siuba_spark.operators.core import filter as _filter
    from siuba_spark.operators.core import mutate
    from siuba_spark.operators.grouping import summarize

    assert fast_mutate is mutate
    assert fast_filter is _filter
    assert fast_summarize is summarize

    from siuba_spark import _
    from siuba_spark.data import load
    t = load("mtcars", spark)
    out = (t >> fast_mutate(kpl=(_.mpg * 0.425144).round(3))).df
    assert "kpl" in out.columns
