"""siu expression formatting: explain / tree / code.

Mirrors the reference formatter's output shape (siuba/siu/format.py —
█─ node boxes, ├─/└─ connectors, `name = █─…` keyword children) over this
engine's node set, plus the TranslationError wiring (lowering.py lower()
annotates the failing subexpression with the same rendering).
"""

import pytest

from siuba_spark import TranslationError, _, explain
from siuba_spark.siu import code, tree


def test_tree_mirrors_reference_formatter_shape():
    # reference Formatter: operators label the box, children hang off
    # ├─/└─ connectors, the final child gets └─
    got = explain(_.x.mean() > 3)
    assert got == (
        "█─>\n"
        "├─█─.mean\n"
        "│ └─█─.\n"
        "│   ├─_\n"
        "│   └─'x'\n"
        "└─3"
    )


def test_tree_kwarg_children_align_like_reference():
    # reference: "k = █─…" with continuation lines padded past "k = "
    got = explain(_.x.round(digits=2) + _.y[0])
    lines = got.splitlines()
    assert lines[0] == "█─+"
    assert any(l.lstrip("│ ├└─").startswith("digits = ") for l in lines)
    # the GetItem box uses the reference's "[" label
    assert "█─[" in got


def test_code_rendering_resembles_source():
    assert explain(_.a + _.b, style="code") == "(_.a + _.b)"
    assert code((_.a + 1).astype("int")) == "(_.a + 1).astype('int')"
    assert code(~_.flag) == "~_.flag"
    assert code(abs(_.x - _.y)) == "abs((_.x - _.y))"
    assert tree(_) == "_"


def test_explain_rejects_unknown_style():
    with pytest.raises(ValueError, match="unknown explain style"):
        explain(_.x, style="fancy")


def test_translation_error_embeds_failing_subtree(spark):
    from siuba_spark import mutate, tbl
    t = tbl(spark.createDataFrame([(1,)], "a long"))
    with pytest.raises(TranslationError) as exc:
        t >> mutate(x=(_.a + 1).no_such_method())
    msg = str(exc.value)
    assert "in expression:" in msg
    # the annotation is the SMALLEST failing subexpression, rendered as
    # the same box tree, and appears exactly once
    assert "█─.no_such_method" in msg
    assert msg.count("in expression:") == 1
