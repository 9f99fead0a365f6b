"""Column completer for `_.` (experimental/completer.py — the reference's
IPython UX nicety, re-expressed as a custom matcher).  Logic is tested
without a kernel; the install path is exercised against a stub shell and,
when IPython is importable, a real InteractiveShell instance."""

import pytest

from siuba_spark.experimental.completer import (
    column_candidates, find_tbl_name, install_completer,
    rank_columns_first,
)


def test_find_tbl_name_most_recent_mention_wins():
    hist = ["orders = tbl(spark, 'o')", "lineitem.count()", "x = 1"]
    assert find_tbl_name(["orders", "lineitem"], hist) == "lineitem"
    # longest-name tie-break avoids substring aliasing
    hist2 = ["lineitem2 >> select(_.a)"]
    assert find_tbl_name(["lineitem", "lineitem2"], hist2) == "lineitem2"
    # no mention anywhere: first candidate
    assert find_tbl_name(["a", "b"], ["zzz"]) == "a"
    assert find_tbl_name([], ["zzz"]) is None


def test_find_tbl_name_word_boundary_not_substring():
    """A short name must not match inside an unrelated identifier or
    string literal (ADVICE r9: 'item' inside 'lineitems_raw')."""
    hist = ["lineitems_raw = load('x')", "orders >> count()"]
    assert find_tbl_name(["item", "orders"], hist) == "orders"
    # a real word-boundary mention still wins over recency of substrings
    hist2 = ["item = tbl(spark, 'part')", "lineitems_raw.show()"]
    assert find_tbl_name(["item"], hist2) == "item"
    # attribute/method punctuation counts as a boundary
    assert find_tbl_name(["item"], ["item.count()"]) == "item"


def test_rank_columns_first_is_stable():
    out = rank_columns_first(["zz", "l_qty", "aa"], {"l_qty"})
    assert out == ["l_qty", "aa", "zz"]


def test_column_candidates_against_spark_tbl(spark):
    from siuba_spark import tbl
    t = tbl(spark.createDataFrame([(1, 2.0)], "l_orderkey long, l_qty double"))
    ns = {"lt": t, "x": 42, "_private": t}
    assert sorted(column_candidates("l_", ns)) == ["l_orderkey", "l_qty"]
    assert column_candidates("l_q", ns) == ["l_qty"]
    assert column_candidates("zz", ns) == []
    assert column_candidates("l_", {"x": 1}) == []


def test_install_completer_noop_without_shell():
    assert install_completer.__module__ == "siuba_spark.experimental.completer"
    # explicit None shell via a stub get_ipython path: returns False when
    # no shell is active (pytest process)
    try:
        from IPython import get_ipython
        active = get_ipython() is not None
    except ImportError:
        active = False
    if not active:
        assert install_completer() is False


def test_install_on_real_ipython_shell(spark):
    IPython = pytest.importorskip("IPython")
    from IPython.testing.globalipapp import get_ipython as get_test_shell
    shell = get_test_shell()
    assert install_completer(shell) is True
    # idempotent: second install doesn't duplicate the matcher
    assert install_completer(shell) is True
    names = [getattr(m, "__name__", "") for m in shell.Completer.custom_matchers]
    assert names.count("siuba_spark_column_matcher") == 1

    from siuba_spark import tbl
    shell.user_ns["lt"] = tbl(spark.createDataFrame(
        [(1, 2.0)], "l_orderkey long, l_qty double"))
    shell.run_cell("lt")
    text, matches = shell.Completer.complete("_.l_")
    assert "_.l_orderkey" in matches and "_.l_qty" in matches
