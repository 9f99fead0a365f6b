"""Port of the reference backends guide (docs/backends.ipynb).

The reference demonstrates three backends (fast-grouped pandas, SQL via
LazyTbl+sqlalchemy, plain pandas); here there is ONE backend and the
guide's point inverts: the same verb pipeline IS the fast grouped path
and the SQL path.  Each cell's semantics re-run with value oracles:

- cell 1: fast_mutate with an aggregation, an elementwise column, and a
  mixed elementwise+agg column in ONE call on grouped data;
- cells 2-3: LazyTbl("cars" in a database) + show_query — here the
  catalog table path (`tbl(spark, "<catalog name>")`) plus show_query;
- cells 4-5: ungrouped vs grouped mutate on the same expressions.
"""

import pandas as pd
import pytest

from siuba_spark import (
    _, collect, group_by, mutate, show_query, summarize, tbl,
)

CARS = [(4, 100.0, 30.0), (4, 80.0, 34.0), (6, 120.0, 20.0),
        (6, 140.0, 18.0), (8, 200.0, 12.0)]


@pytest.fixture()
def cars(spark):
    return tbl(spark.createDataFrame(
        CARS, "cyl long, hp double, mpg double"))


def test_mixed_agg_elementwise_compound_in_one_grouped_mutate(cars):
    # backends.ipynb cell 1: aggregation, elementwise, and
    # elementwise+agg columns coexist in one grouped mutate
    out = (cars >> group_by(_.cyl)
           >> mutate(avg_mpg=_.mpg.mean(),
                     hp_per_mpg=_.hp / _.mpg,
                     demeaned=_.hp - _.hp.mean())
           >> collect()).sort_values(["cyl", "hp"]).reset_index(drop=True)
    pdf = pd.DataFrame(CARS, columns=["cyl", "hp", "mpg"])
    g = pdf.groupby("cyl")
    want = pdf.assign(
        avg_mpg=g.mpg.transform("mean"),
        hp_per_mpg=pdf.hp / pdf.mpg,
        demeaned=pdf.hp - g.hp.transform("mean"),
    ).sort_values(["cyl", "hp"]).reset_index(drop=True)
    for c in ("avg_mpg", "hp_per_mpg", "demeaned"):
        assert out[c].round(9).tolist() == want[c].round(9).tolist(), c


def test_catalog_table_backend_with_show_query(spark, cars, capsys):
    # cells 2-3: the reference registers a pandas frame into sqlite and
    # queries through LazyTbl; the Spark analogue registers a catalog
    # temp view and queries through tbl(spark, name) — same pipeline,
    # show_query prints the engine's plan
    cars.df.createOrReplaceTempView("cars_backends")
    q = (tbl(spark, "cars_backends")
         >> group_by(_.cyl)
         >> summarize(avg_mpg=_.mpg.mean()))
    res = q >> show_query()
    printed = capsys.readouterr().out
    assert "avg_mpg" in printed
    out = (res >> collect()).sort_values("cyl").reset_index(drop=True)
    assert out.avg_mpg.tolist() == [32.0, 19.0, 12.0]


def test_same_expressions_ungrouped_vs_grouped(spark):
    # cells 4-5: y = _.x + 1 is identical either way; z = _.x - _.x.mean()
    # switches from the global to the per-group mean
    t = tbl(spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "g string, x long"))
    flat = t >> mutate(y=_.x + 1) >> collect()
    assert flat.y.tolist() == [2, 3, 4]
    grouped = (t >> group_by(_.g)
               >> mutate(y=_.x + 1, z=_.x - _.x.mean()) >> collect())
    got = sorted(zip(grouped.g, grouped.y, grouped.z.round(6)))
    assert got == [("a", 2, -0.5), ("a", 3, 0.5), ("b", 4, 0.0)]
