"""Port of the reference's examples-sql.ipynb and examples-postgres.ipynb
(the SQL-backend walking tours): LazyTbl-style deferred tables, query
inspection via show_query, sequential/replacing mutates, grouped rank
expressions, summarize-after-mutate, count, keyed left joins, and
case_when in mutate and filter.

This engine's LazyTbl analogue is SparkTbl (a deferred plan over any
table source); ``show_query`` is the ``print(tbl.last_op)`` equivalent.
Adaptations, each deliberate:
- the notebooks' cross-type SQL arithmetic (``_.id + _.name`` int+text,
  ``is_mikey + 1`` bool+int) is database-lenient sqlite behavior; both
  postgres and Spark reject them, so the port uses the typed spellings
  (numeric arithmetic, ``.astype(int)``);
- sqlalchemy's ``_.fullname.startswith`` column method is the ``.str``
  accessor here.
"""

import pytest

from siuba_spark import (
    _, arrange, case_when, collect, count, dense_rank, filter, group_by,
    left_join, mutate, select, show_query, summarize, tbl, ungroup,
)

USERS = [(1, "jack", "Jack Jones"), (2, "wendy", "Wendy Williams"),
         (3, "michael", "michael")]
ADDRESSES = [(1, 1, "jack@yahoo.com"), (2, 1, "jack@msn.com"),
             (3, 2, "www@www.org"), (4, 2, "wendy@aol.com"),
             (5, 3, "mikey@banana.com")]


@pytest.fixture(scope="module")
def users(spark):
    return tbl(spark.createDataFrame(
        USERS, "id long, name string, fullname string"))


@pytest.fixture(scope="module")
def addresses(spark):
    return tbl(spark.createDataFrame(
        ADDRESSES, "id long, user_id long, email_address string"))


def test_select_and_show_query(users, capsys):
    # examples-sql cells 1-2: deferred table + select; show_query is the
    # `print(tbl.last_op)` equivalent — the plan text names the column
    out = users >> select(_.fullname, -_.id)
    assert out.columns == ["fullname"]
    out >> show_query()
    printed = capsys.readouterr().out
    assert "fullname" in printed


def test_filter_eq_and_startswith(users):
    # cells 3-4
    out = users >> filter(_.fullname == "michael") >> collect()
    assert out.name.tolist() == ["michael"]
    m = users >> filter(_.fullname.str.startswith("m")) >> collect()
    assert m.name.tolist() == ["michael"]


def test_mutate_sequential_and_replacing(users):
    # cells 5-8: new col, col referencing a prior new col, replacing a
    # col, then referring to the replacement
    out = users >> mutate(wow=_.id + 1, wow2=_.wow + 2) >> collect()
    assert out.wow.tolist() == [2, 3, 4]
    assert out.wow2.tolist() == [4, 5, 6]
    rep = users >> mutate(id=_.id + 1, id2=_.id + 2) >> collect()
    assert rep.id.tolist() == [2, 3, 4]
    assert rep.id2.tolist() == [4, 5, 6]    # sees the REPLACED id


def test_arrange_by_computed(users):
    # cell 9 (adapted to typed arithmetic: sort by a computed key)
    out = users >> arrange(-(_.id * 10)) >> collect()
    assert out.id.tolist() == [3, 2, 1]


def test_dense_rank_mutate_and_grouped_comparison(addresses):
    # postgres cells 2-3
    out = addresses >> mutate(rank=dense_rank(_.id) + 1) >> collect()
    assert sorted(out["rank"]) == [2, 3, 4, 5, 6]
    g = (addresses >> group_by("user_id")
         >> mutate(flag=_.id > dense_rank(_.id) + 1)
         >> ungroup() >> collect())
    # per-user dense_rank restarts at 1: id > rank+1 only where ids are
    # larger than their in-group position + 1
    by_id = dict(zip(g.id, g.flag))
    assert by_id == {1: False, 2: False, 3: True, 4: True, 5: True}


def test_rename_select_then_dependent_mutate(addresses):
    # postgres cell 4: rename via select ==, then a mutate chain whose
    # second column uses the first (bool -> int adapted with astype)
    out = (addresses
           >> select(_.email == _.email_address)
           >> mutate(is_mikey=_.email.str.startswith("mikey"),
                     mikey2=_.is_mikey.astype(int) + 1)
           >> collect())
    assert list(out.columns) == ["email", "is_mikey", "mikey2"]
    assert out.mikey2.tolist() == [1, 1, 1, 1, 2]


def test_grouped_filter_plain_and_ranked(addresses):
    # postgres cells 5-7
    out = addresses >> filter(_.id > 1) >> collect()
    assert sorted(out.id) == [2, 3, 4, 5]
    g = (addresses >> group_by("user_id")
         >> filter(dense_rank(_.id) > 1) >> ungroup() >> collect())
    assert sorted(g.id) == [2, 4]          # second address per user


def test_grouped_summarize_and_mutate_then_summarize(addresses):
    # postgres cells 8-9
    g = (addresses >> group_by("user_id")
         >> summarize(avg_id=_.id.mean()) >> collect())
    assert dict(zip(g.user_id, g.avg_id)) == {1: 1.5, 2: 3.5, 3: 5.0}
    m = (addresses >> mutate(_, id2=_.id + 1)
         >> summarize(_, m_id=_.id2.mean()) >> collect())
    assert m.m_id.tolist() == [4.0]


def test_grouped_count(addresses):
    # postgres cell 10: count within an existing grouping adds the key
    out = (addresses >> group_by("user_id") >> count(_.id) >> collect())
    assert out.shape[0] == 5 and set(out.n) == {1}


def test_left_join_dict_keys(addresses, users):
    # postgres cell 11
    out = (addresses
           >> left_join(_, users, {"user_id": "id"})
           >> collect())
    assert out.shape[0] == 5
    assert set(out.name) == {"jack", "wendy", "michael"}


def test_case_when_mutate_and_filter(addresses):
    # postgres cells 12-13 (the notebook's own TODO items — both work
    # here, including the explicit `_` placeholder form)
    out = (addresses
           >> mutate(label=case_when(_, {_.id > 4: 0, _.id > 1: 1,
                                         True: _.id}))
           >> collect())
    assert dict(zip(out.id, out.label)) == {1: 1, 2: 1, 3: 1, 4: 1, 5: 0}
    f = (addresses
         >> filter(case_when(_, {_.id > 4: True, _.id > 1: False,
                                 True: True}))
         >> collect())
    assert sorted(f.id) == [1, 5]
