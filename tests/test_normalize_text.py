"""Tests for siuba_spark.corpus.text.normalize_text (byte-level corpus
cleanup: Unicode form, control-strip, whitespace collapse, trim, lower)."""

import duckdb
import pytest

from siuba_spark.corpus.text import normalize_text

from .helpers import data_frame


def test_builtin_pipeline(spark):
    t = data_frame(
        spark,
        doc_id=[1, 2, 3],
        text=["  Hello\x01\x02 \t\t World \x7f ", "a\x0bb", "ok"],
    )
    out = normalize_text(t, lower=True).df.orderBy("doc_id").toPandas()
    assert out.text.tolist() == ["hello world", "ab", "ok"]


def test_null_passthrough_and_out_column(spark):
    t = data_frame(spark, doc_id=[1, 2], text=[None, " X  Y "])
    out = (normalize_text(t, out="clean").df.orderBy("doc_id").toPandas())
    assert out.clean.tolist()[0] is None
    assert out.clean.tolist()[1] == "X Y"
    assert out.text.tolist()[1] == " X  Y "  # original kept


def test_steps_toggle(spark):
    t = data_frame(spark, doc_id=[1], text=["  A \t B\x01  "])
    keep_ws = normalize_text(t, collapse_whitespace=False, trim=False) \
        .df.toPandas().text[0]
    assert keep_ws == "  A \t B  "  # only the control char stripped
    keep_ctl = normalize_text(t, strip_control=False).df.toPandas().text[0]
    assert keep_ctl == "A B\x01"


def test_nfc_matches_duckdb(spark):
    # decomposed e + combining acute vs precomposed e-acute
    t = data_frame(spark, doc_id=[1, 2],
                   text=["e\u0301tude", "caf\u00e9"])
    out = normalize_text(t, form="NFC").df.orderBy("doc_id").toPandas()
    exp = duckdb.connect().execute(
        "SELECT nfc_normalize('e' || chr(769) || 'tude'), "
        "nfc_normalize('caf' || chr(233))").fetchone()
    assert out.text.tolist() == list(exp)
    assert out.text.tolist()[0] == "\u00e9tude"


def test_bad_form_raises(spark):
    t = data_frame(spark, doc_id=[1], text=["x"])
    with pytest.raises(ValueError):
        normalize_text(t, form="NFX")


def test_str_accessor_normalize(spark):
    """_.x.str.normalize('NFC') lowers through the query DSL (reference
    generic siuba/ops/generics.py:175; pandas-only there, Arrow-batched
    here)."""
    from siuba_spark import _, mutate

    t = data_frame(spark, doc_id=[1], text=["étude"])
    out = (t >> mutate(norm=_.text.str.normalize("NFC"))).df.toPandas()
    assert out.norm[0] == "étude"
    with pytest.raises(Exception):
        (t >> mutate(bad=_.text.str.normalize("NFX"))).df.collect()
