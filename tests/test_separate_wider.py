"""tidyr 1.3 separate_wider_delim / _position / _regex
(operators/reshape.py — beyond the reference, which predates tidyr 1.3)."""

import pytest

from siuba_spark import (
    _, collect, separate_wider_delim, separate_wider_position,
    separate_wider_regex, tbl,
)
from tests.helpers import data_frame


@pytest.fixture()
def t(spark):
    return data_frame(spark, x=["a-1-x", "b-2-y", "c-3-z"], keep=[1, 2, 3])


def test_delim_basic(t):
    out = (t >> separate_wider_delim(_.x, "-", ["l", "n", "r"]) >> collect())
    assert list(out.columns) == ["keep", "l", "n", "r"]
    assert out.l.tolist() == ["a", "b", "c"]
    assert out.r.tolist() == ["x", "y", "z"]


def test_delim_none_drops_piece_and_keep_source(t):
    out = (t >> separate_wider_delim(_.x, "-", ["l", None, "r"],
                                     cols_remove=False) >> collect())
    assert "x" in out.columns and "n" not in out.columns


def test_delim_too_many(spark):
    t = data_frame(spark, x=["a-b-c-d"])
    with pytest.raises(ValueError, match="more than"):
        t >> separate_wider_delim(_.x, "-", ["p", "q"])
    merged = (t >> separate_wider_delim(_.x, "-", ["p", "q"],
                                        too_many="merge") >> collect())
    assert merged.q.tolist() == ["b-c-d"]
    dropped = (t >> separate_wider_delim(_.x, "-", ["p", "q"],
                                         too_many="drop") >> collect())
    assert dropped.q.tolist() == ["b"]


def test_delim_too_few(spark):
    t = data_frame(spark, x=["a-b", "c"])
    with pytest.raises(ValueError, match="fewer than"):
        t >> separate_wider_delim(_.x, "-", ["p", "q"])
    out = (t >> separate_wider_delim(_.x, "-", ["p", "q"],
                                     too_few="align_start") >> collect())
    assert out.q.tolist()[1] is None


def test_position(spark):
    t = data_frame(spark, code=["AB123X", "CD456Y"])
    out = (t >> separate_wider_position(
        _.code, {"cc": 2, "_skip": 3, "tag": 1}) >> collect())
    assert out.cc.tolist() == ["AB", "CD"]
    assert out.tag.tolist() == ["X", "Y"]
    assert "_skip" not in out.columns
    short = data_frame(spark, code=["AB1"])
    with pytest.raises(ValueError, match="shorter"):
        short >> separate_wider_position(_.code, {"cc": 2, "tag": 4})


def test_regex(spark):
    t = data_frame(spark, s=["x12-ab", "y34-cd"])
    out = (t >> separate_wider_regex(
        _.s, {"alpha": r"[a-z]", "num": r"\d+", "_sep": "-",
              "suffix": r"[a-z]+"}) >> collect())
    assert out.alpha.tolist() == ["x", "y"]
    assert out.num.tolist() == ["12", "34"]
    assert out.suffix.tolist() == ["ab", "cd"]
    bad = data_frame(spark, s=["nope!"])
    with pytest.raises(ValueError, match="match"):
        bad >> separate_wider_regex(_.s, {"alpha": r"[a-z]+"})
    lax = (bad >> separate_wider_regex(_.s, {"alpha": r"[a-z]+"},
                                       too_few="align_start") >> collect())
    assert lax.alpha.tolist() == [None]


def test_regex_empty_capture_vs_no_match(spark):
    """ADVICE r5: a legitimately empty capture on a MATCHING row stays ""
    (tidyr behavior); only a non-matching row yields NULL."""
    t = data_frame(spark, s=["ab12", "cd", "!!"])
    out = (t >> separate_wider_regex(
        _.s, {"alpha": r"[a-z]+", "num": r"\d*"},
        too_few="align_start") >> collect())
    assert out.alpha.tolist() == ["ab", "cd", None]
    assert out.num.tolist() == ["12", "", None]


# -- tidyr 1.3 longer-direction siblings --------------------------------------

def test_separate_longer_delim(spark):
    from siuba_spark import separate_longer_delim
    t = tbl(spark.createDataFrame(
        [(1, "a.b"), (2, "c"), (3, None)], "id long, x string"))
    out = separate_longer_delim(t, "x", delim=".").df.toPandas()
    got = sorted((r.id, r.x) for _, r in out.iterrows())
    # '.' is a LITERAL delimiter (not regex-any); NULL survives as one row
    assert got == [(1, "a"), (1, "b"), (2, "c"), (3, None)]


def test_separate_longer_position(spark):
    import pandas as pd

    from siuba_spark import separate_longer_position
    t = tbl(spark.createDataFrame(
        [(1, "abcde"), (2, "xy"), (3, None)], "id long, x string"))
    out = separate_longer_position(t, "x", width=2).df.toPandas()
    got = sorted(((r.id, r.x) for _, r in out.iterrows()),
                 key=lambda p: (p[0], str(p[1])))
    assert got == [(1, "ab"), (1, "cd"), (1, "e"), (2, "xy"), (3, None)]


def test_separate_longer_position_newlines_and_empty(spark):
    """ADVICE r8: the chop pattern is DOTALL so embedded newlines are
    preserved, and "" yields zero pieces (dropped) under tidyr's default
    keep_empty=FALSE while keep_empty=True keeps it as one NULL row."""
    from siuba_spark import separate_longer_position
    t = tbl(spark.createDataFrame(
        [(1, "a\nb"), (2, ""), (3, None)], "id long, x string"))
    out = separate_longer_position(t, "x", width=2).df.toPandas()
    got = sorted(((r.id, r.x) for _, r in out.iterrows()),
                 key=lambda p: (p[0], str(p[1])))
    # newline survives inside the first piece; "" row is dropped; NULL kept
    assert got == [(1, "a\n"), (1, "b"), (3, None)]

    kept = separate_longer_position(t, "x", width=2,
                                    keep_empty=True).df.toPandas()
    got2 = sorted(((r.id, r.x) for _, r in kept.iterrows()),
                  key=lambda p: (p[0], str(p[1])))
    assert got2 == [(1, "a\n"), (1, "b"), (2, None), (3, None)]
