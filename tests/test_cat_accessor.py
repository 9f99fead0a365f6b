"""``.cat`` accessor + table-level factor ledger (functions/cat.py;
reference ops registry: siuba/ops/generics.py:323-335 ``ops_cat`` —
pandas-backend-only there, first-class here)."""

import pytest

from siuba_spark import (
    _, arrange, collect, filter, mutate, rename, select, summarize, tbl,
)
from siuba_spark.functions.lowering import TranslationError
from tests.helpers import data_frame


@pytest.fixture()
def t(spark):
    return data_frame(spark, s=["lo", "hi", "mid", "hi", None, "zz"],
                      i=[1, 2, 3, 4, 5, 6])


def test_set_categories_and_codes(t):
    out = (t >> mutate(f=_.s.cat.set_categories(["lo", "mid", "hi"]))
             >> mutate(code=_.f.cat.codes) >> collect())
    by_s = dict(zip(out.s, zip(out.f, out.code)))
    assert by_s["lo"] == ("lo", 0)
    assert by_s["mid"] == ("mid", 1)
    assert by_s["hi"] == ("hi", 2)
    # non-member values -> NULL value, -1 code (pandas: NaN / -1)
    assert by_s["zz"][0] is None and by_s["zz"][1] == -1


def test_codes_chained_inline(t):
    out = (t >> mutate(c=_.s.cat.set_categories(["hi", "lo"]).cat.codes)
             >> collect())
    assert dict(zip(out.s, out.c))["hi"] == 0
    assert dict(zip(out.s, out.c))["lo"] == 1
    assert dict(zip(out.s, out.c))["mid"] == -1


def test_dynamic_codes_sorted_uniques(t):
    # no declared levels: pandas astype('category') rule — sorted uniques
    out = t >> mutate(dc=_.s.cat.codes) >> collect()
    got = dict(zip(out.s, out.dc))
    assert got == {"hi": 0, "lo": 1, "mid": 2, "zz": 3, None: -1}
    # usable inside a larger expression too
    out2 = t >> mutate(dc1=_.s.cat.codes + 10) >> collect()
    assert dict(zip(out2.s, out2.dc1))["hi"] == 10


def test_arrange_by_level_order(t):
    out = (t >> mutate(f=_.s.cat.set_categories(["mid", "hi", "lo"]))
             >> arrange(_.f) >> collect())
    assert [v for v in out.f if v is not None] == ["mid", "hi", "hi", "lo"]
    # NULLs (incl. ex-'zz') last in both directions
    assert list(out.f[-2:]) == [None, None]
    out_d = (t >> mutate(f=_.s.cat.set_categories(["mid", "hi", "lo"]))
               >> arrange(-_.f) >> collect())
    assert [v for v in out_d.f if v is not None] == ["lo", "hi", "hi", "mid"]


def test_categories_and_ordered(t):
    out = (t >> mutate(f=_.s.cat.set_categories(["lo", "hi"], ordered=True))
             >> mutate(cats=_.f.cat.categories, o=_.f.cat.ordered)
             >> collect())
    assert list(out.cats[0]) == ["lo", "hi"] and bool(out.o[0])
    # dynamic categories: sorted distinct aggregate
    agg = t >> summarize(cats=_.s.cat.categories) >> collect()
    assert list(agg.cats[0]) == ["hi", "lo", "mid", "zz"]


def test_rename_reorder_add_remove(t):
    base = t >> mutate(f=_.s.cat.set_categories(["lo", "mid", "hi"]))
    ren = base >> mutate(f=_.f.cat.rename_categories({"lo": "L"}))
    assert ren.factors["f"].levels == ("L", "mid", "hi")
    assert "L" in set((ren >> collect()).f)
    reo = base >> mutate(f=_.f.cat.reorder_categories(["hi", "mid", "lo"]))
    assert reo.factors["f"].levels == ("hi", "mid", "lo")
    with pytest.raises(TranslationError, match="exactly the current"):
        base >> mutate(f=_.f.cat.reorder_categories(["hi", "mid"]))
    add = base >> mutate(f=_.f.cat.add_categories(["xx"]))
    assert add.factors["f"].levels[-1] == "xx"
    rem = base >> mutate(f=_.f.cat.remove_categories(["mid"]))
    assert rem.factors["f"].levels == ("lo", "hi")
    assert None in set((rem >> filter(_.s == "mid") >> collect()).f)


def test_ledger_propagation(t):
    base = t >> mutate(f=_.s.cat.set_categories(["lo", "hi"]))
    assert base.factors["f"].levels == ("lo", "hi")
    # rename verb and select-rename carry the entry under the new name
    assert (base >> rename(g=_.f)).factors["g"].levels == ("lo", "hi")
    assert (base >> select(_.i, g=_.f)).factors["g"].levels == ("lo", "hi")
    # dropping the column prunes the entry
    assert (base >> select(_.i)).factors == {}
    # overwriting with a non-factor expression clears it
    assert (base >> mutate(f=_.s)).factors == {}
    # as_ordered flips the flag, keeps levels
    o = base >> mutate(f=_.f.cat.as_ordered())
    assert o.factors["f"].ordered is True


def test_ledger_survives_count_and_summarize(t):
    """ADVICE r5: count/summarize must carry the factor ledger so a
    following arrange still sorts by level order (order-sensitive)."""
    from siuba_spark import count, group_by
    base = t >> filter(_.s.notna() & (_.s != "zz")) \
             >> mutate(f=_.s.cat.set_categories(["mid", "hi", "lo"]))
    cnt = base >> count(_.f)
    assert cnt.factors["f"].levels == ("mid", "hi", "lo")
    out = cnt >> arrange(_.f) >> collect()
    assert list(out.f) == ["mid", "hi", "lo"]  # level order, not lexicographic
    summ = base >> group_by(_.f) >> summarize(n2=_.i.count())
    assert summ.factors["f"].levels == ("mid", "hi", "lo")
    out2 = summ >> arrange(_.f) >> collect()
    assert list(out2.f) == ["mid", "hi", "lo"]


def test_reframe_by_symbolic(spark):
    """ADVICE r5: _by=_.g (Symbolic) must work in reframe, like summarize."""
    from siuba_spark import reframe
    t = data_frame(spark, g=["a", "a", "b", "b"], x=[1.0, 3.0, 5.0, 9.0])
    out = t >> reframe(q=_.x.quantile([0.0, 1.0]), _by=_.g) >> collect()
    got = sorted(map(tuple, out[["g", "q"]].values.tolist()))
    assert got == [("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 9.0)]


def test_pivot_wider_orders_columns_by_levels(spark):
    from siuba_spark import pivot_wider
    t = data_frame(spark, id=[1, 1, 1], k=["lo", "hi", "mid"],
                   v=[1.0, 2.0, 3.0])
    base = t >> mutate(k=_.k.cat.set_categories(["mid", "hi", "lo"]))
    out = base >> pivot_wider(names_from=_.k, values_from=_.v)
    assert out.columns == ["id", "mid", "hi", "lo"]
    # without levels: string-sorted (existing behavior)
    out2 = t >> pivot_wider(names_from=_.k, values_from=_.v)
    assert out2.columns == ["id", "hi", "lo", "mid"]


def test_errors(t):
    with pytest.raises(TranslationError, match="set_categories"):
        t >> mutate(x=_.s.cat.add_categories(["q"]))
    with pytest.raises(TranslationError, match="no translation"):
        t >> mutate(x=_.s.cat.nope())


def test_fct_level_order_recorded_in_ledger(spark):
    """VERDICT r5 punch 4: data-dependent forcats level orders land in the
    factor ledger, so .cat.codes / arrange / pivot_wider agree with pandas
    everywhere, not just inside arrange."""
    from siuba_spark import fct_infreq, fct_inorder, fct_reorder, fct_rev
    t = data_frame(spark,
                   s=["b", "c", "b", "a", "c", "b"],
                   y=[1.0, 9.0, 2.0, 5.0, 3.0, 4.0])
    m = t >> mutate(f=fct_infreq(_.s))
    assert m.factors["f"].levels == ("b", "c", "a")      # freq desc, tie asc
    out = m >> mutate(c=_.f.cat.codes) >> collect()
    assert sorted(set(zip(out.f, out.c))) == [("a", 2), ("b", 0), ("c", 1)]
    # arrange follows the recorded order
    got = (m >> arrange(_.f) >> collect()).f.tolist()
    assert got == ["b", "b", "b", "c", "c", "a"]
    # reorder by mean(y): b=2.33 < a=5 < c=6
    assert (t >> mutate(f=fct_reorder(_.s, _.y, "mean"))
            ).factors["f"].levels == ("b", "a", "c")
    assert (t >> mutate(f=fct_reorder(_.s, _.y, "mean", True))
            ).factors["f"].levels == ("c", "a", "b")
    assert (t >> mutate(f=fct_inorder(_.s))).factors["f"].levels \
        == ("b", "c", "a")
    # fct_rev: reversed sorted uniques; over a ledger column it is the
    # reversed ledger (no data pass)
    assert (t >> mutate(f=fct_rev(_.s))).factors["f"].levels \
        == ("c", "b", "a")
    assert (m >> mutate(g=fct_rev(_.f))).factors["g"].levels \
        == ("a", "c", "b")
