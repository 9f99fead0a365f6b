"""Bundled example datasets, exposed with the reference's import surface
(siuba/data/__init__.py:1-60): ``from siuba_spark.data import mtcars``.

Every attribute loads lazily and returns a :class:`~siuba_spark.plans.tbl.SparkTbl`
bound to the active SparkSession (one is created on local[*] if none is
running — these tables are tutorial-sized, so a default local session is
always adequate).  The data are the classic public datasets the reference
bundles: R's mtcars, palmerpenguins, and tidyr's teaching tables, stored
here as parquet.

Divergences from the reference, both documented:

- the reference returns pandas DataFrames; a Spark-native engine returns
  SparkTbls (pipe-ready: ``mtcars >> group_by(_.cyl) >> summarize(...)``).
  Use ``.df.toPandas()`` for a pandas copy.
- ``cars_sql`` in the reference is a mock-SQLAlchemy LazyTbl used to
  render SQL without a database; here every table IS a lazy Spark plan,
  so ``cars_sql`` is simply ``cars`` (cyl/mpg/hp).
"""

from __future__ import annotations

import os

__all__ = [
    "mtcars",
    "cars",
    "penguins",
    "penguins_raw",
    "cars_sql",
    "band_members",
    "band_instruments",
    "band_instruments2",
    "fish_encounters",
    "us_rent_income",
    "warpbreaks",
]

_DIR = os.path.dirname(os.path.abspath(__file__))


def __dir__():
    return __all__


def _session():
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    return (SparkSession.builder.master("local[*]")
            .appName("siuba_spark-data").getOrCreate())


#: (name, session) -> SparkTbl — repeated module-attribute access (the
#: reference caches its pandas objects) must not re-run reader setup
_CACHE: dict = {}


def load(name: str, spark=None):
    """Load a bundled dataset as a SparkTbl (explicit-session form)."""
    from ..plans.tbl import SparkTbl

    base = {"cars": "mtcars", "cars_sql": "mtcars"}.get(name, name)
    path = os.path.join(_DIR, f"{base}.parquet")
    if name not in __all__ or not os.path.exists(path):
        raise AttributeError(f"No dataset named: {name}")
    spark = spark or _session()
    key = (name, id(spark))
    if key not in _CACHE:
        df = spark.read.parquet(path)
        if name in ("cars", "cars_sql"):
            df = df.select("cyl", "mpg", "hp")
        _CACHE[key] = SparkTbl(df)
    return _CACHE[key]


def __getattr__(name):
    if name not in __all__:
        raise AttributeError(f"No dataset named: {name}")
    return load(name)
