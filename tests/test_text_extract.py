"""Tests for the web-corpus extraction/repair surface:
strip_html (HTML -> text, the C4/CommonCrawl step zero),
fix_mojibake (cp1252 byte-repair, ftfy's headline case), and the
nb_train/nb_score multinomial Naive Bayes classifier (the public
analogue of fastText quality/domain filters)."""

import math

import pytest

from siuba_spark.corpus.quality import nb_score, nb_train
from siuba_spark.corpus.text import (
    HTML_ENTITIES, MOJIBAKE_TABLE, _cp1252_mangle, fix_mojibake,
    strip_html,
)

from .helpers import data_frame


# --- strip_html --------------------------------------------------------

def test_strip_html_basic(spark):
    t = data_frame(
        spark, doc_id=[1],
        html=["<html><head><title>T</title><style>p{}</style></head>"
              "<body><script>var x;</script><!-- c -->"
              "<h1>Head</h1><p>One <b>two</b> three.</p>"
              "<p>Four&nbsp;&amp; five.</p></body></html>"])
    out = strip_html(t).df.toPandas().text[0]
    assert out == "Head\n\nOne two three.\n\nFour & five."


def test_strip_html_drops_script_style_head_content(spark):
    t = data_frame(
        spark, doc_id=[1, 2],
        html=["a<script type='x'>SECRET</script>b",
              "a<style>\nSECRET\n</style>b"])
    texts = strip_html(t).df.orderBy("doc_id").toPandas().text.tolist()
    assert texts == ["a b", "a b"]


def test_strip_html_entities_decode_in_order(spark):
    # &amp;lt; must become the literal text "&lt;", NOT "<"
    t = data_frame(spark, doc_id=[1],
                   html=["&amp;lt; &lt; &gt; &quot; &#39; &mdash;"])
    out = strip_html(t).df.toPandas().text[0]
    assert out == "&lt; < > \" ' —"


def test_strip_html_preserves_lone_angle_brackets(spark):
    t = data_frame(spark, doc_id=[1, 2],
                   html=["a < b and c > d", "x <3 y"])
    texts = strip_html(t).df.orderBy("doc_id").toPandas().text.tolist()
    assert texts == ["a < b and c > d", "x <3 y"]


def test_strip_html_block_structure_and_br(spark):
    t = data_frame(
        spark, doc_id=[1],
        html=["<ul><li>one</li><li>two</li></ul><div>z</div>a<br>b"])
    out = strip_html(t).df.toPandas().text[0]
    # block boundaries become newlines, runs capped at one blank line;
    # </div>a yields a single newline (one boundary, no blank line)
    assert out.split("\n\n") == ["one", "two", "z\na\nb"]


def test_strip_html_null_and_plain_passthrough(spark):
    t = data_frame(spark, doc_id=[1, 2], html=[None, "plain text"])
    out = strip_html(t).df.orderBy("doc_id").toPandas()
    assert out.text[0] is None
    assert out.text[1] == "plain text"


def test_strip_html_unclosed_container_degrades(spark):
    # no </script>: content survives (the open tag still strips)
    t = data_frame(spark, doc_id=[1], html=["a<script>x=1 b"])
    assert strip_html(t).df.toPandas().text[0] == "ax=1 b"


def test_strip_html_duckdb_parity(spark, duck):
    """The exact regex pipeline replays in DuckDB (RE2) — the property
    the graded oracle depends on."""
    from siuba_spark.corpus.text import HTML_BLOCK_TAGS, HTML_DROP_TAGS

    html = ("<head><style>p{}</style></head><!-- x --><h2>A &amp; B</h2>"
            "<p>one&nbsp;two</p><ul><li>i</li></ul>a<br/>b & c < d")
    t = data_frame(spark, doc_id=[1], html=[html])
    got = strip_html(t).df.toPandas().text[0]
    c = "?"
    for tag in HTML_DROP_TAGS:
        c = (f"regexp_replace({c}, '(?is)<{tag}\\b[^>]*>.*?</{tag}\\s*>',"
             " ' ', 'g')")
    c = f"regexp_replace({c}, '(?s)<!--.*?-->', ' ', 'g')"
    c = f"regexp_replace({c}, '(?i)<br\\s*/?>', chr(10), 'g')"
    block = "|".join(HTML_BLOCK_TAGS)
    c = (f"regexp_replace({c}, '(?is)</?(?:{block})\\b[^>]*>', chr(10),"
         " 'g')")
    c = f"regexp_replace({c}, '(?s)<[a-zA-Z/!?][^>]*>', '', 'g')"
    for ent, ch in HTML_ENTITIES:
        e, h = ent.replace("'", "''"), ch.replace("'", "''")
        c = f"replace({c}, '{e}', '{h}')"
    c = f"regexp_replace({c}, '[ \\t\\x0B\\f\\r]+', ' ', 'g')"
    c = f"regexp_replace({c}, ' *\\n *', chr(10), 'g')"
    c = f"regexp_replace({c}, '\\n{{3,}}', chr(10)||chr(10), 'g')"
    c = f"regexp_replace({c}, '^\\s+|\\s+$', '', 'g')"
    exp = duck.execute(f"select {c}", [html]).fetchone()[0]
    assert got == exp


# --- fix_mojibake ------------------------------------------------------

def test_mojibake_table_is_generated_and_sorted(spark):
    assert _cp1252_mangle("’") == "â€™"
    assert _cp1252_mangle("é") == "Ã©"
    assert _cp1252_mangle("”") == "â€\x9d"  # cp1252 hole -> latin-1
    lens = [len(bad) for bad, _ in MOJIBAKE_TABLE]
    assert lens == sorted(lens, reverse=True)  # longest-first


def test_fix_mojibake_repairs_classic_cases(spark):
    t = data_frame(
        spark, doc_id=[1],
        text=["Itâ€™s â€œquotedâ€\x9d â€” cafÃ© naÃ¯ve 25Â°C"])
    out = fix_mojibake(t).df.toPandas().text[0]
    assert out == "It’s “quoted” — café naïve 25°C"


def test_fix_mojibake_clean_text_unchanged(spark):
    clean = "It’s already fine — café naïve. ASCII only line."
    t = data_frame(spark, doc_id=[1, 2], text=[clean, None])
    out = fix_mojibake(t).df.orderBy("doc_id").toPandas()
    assert out.text[0] == clean
    assert out.text[1] is None


def test_fix_mojibake_out_column(spark):
    t = data_frame(spark, doc_id=[1], text=["Ã©"])
    out = fix_mojibake(t, out="fixed").df.toPandas()
    assert out.fixed[0] == "é" and out.text[0] == "Ã©"


def test_fix_mojibake_roundtrip_all_table_entries(spark):
    """Corrupt every target char (good -> mangled), repair, compare."""
    goods = "".join(g for _, g in MOJIBAKE_TABLE)
    bads = "".join(_cp1252_mangle(g) for g in goods)
    t = data_frame(spark, doc_id=[1], text=[bads])
    assert fix_mojibake(t).df.toPandas().text[0] == goods


# --- Naive Bayes -------------------------------------------------------

def _toy(spark):
    return data_frame(
        spark, doc_id=[1, 2, 3, 4],
        label=["spam", "spam", "ham", "ham"],
        text=["buy pills now", "buy now", "meeting notes now",
              "project notes"])


def test_nb_train_schema_and_counts(spark):
    m = nb_train(_toy(spark), "label").toPandas()
    pairs = m[m.token.notna()]
    docs = m[m.token.isna()].set_index("label").cnt
    assert docs.to_dict() == {"spam": 2, "ham": 2}
    spam_buy = pairs[(pairs.label == "spam") & (pairs.token == "buy")]
    assert spam_buy.cnt.tolist() == [2]
    assert set(pairs[pairs.label == "ham"].token) == {
        "meeting", "notes", "now", "project"}


def test_nb_train_min_count_prunes_pairs_not_docs(spark):
    m = nb_train(_toy(spark), "label", min_count=2).toPandas()
    pairs = m[m.token.notna()]
    assert set(pairs[pairs.label == "spam"].token) == {"buy", "now"}
    assert len(m[m.token.isna()]) == 2  # priors survive


def test_nb_score_matches_hand_computation(spark):
    toy = _toy(spark)
    model = nb_train(toy, "label")
    score_t = data_frame(spark, doc_id=[10], text=["buy pills"])
    out = nb_score(score_t, model).df.toPandas()
    assert out.nb_label[0] == "spam"
    # hand NB: V=6 (buy pills now meeting notes project); spam tot=5
    v, tot, prior = 6, 5, 0.5
    exp = (math.log(prior) + math.log((2 + 1) / (tot + v))
           + math.log((1 + 1) / (tot + v)))
    assert out.nb_label_logprob[0] == pytest.approx(round(exp, 6),
                                                    abs=1e-6)


def test_nb_score_empty_doc_scores_priors(spark):
    toy = data_frame(spark, doc_id=[1, 2, 3],
                     label=["a", "a", "b"],
                     text=["x y", "y z", "q"])
    model = nb_train(toy, "label")
    out = nb_score(data_frame(spark, doc_id=[10], text=[""]),
                   model).df.toPandas()
    assert out.nb_label[0] == "a"  # higher prior (2/3)
    assert out.nb_label_logprob[0] == pytest.approx(
        round(math.log(2 / 3), 6), abs=1e-6)


def test_nb_score_tie_breaks_on_label(spark):
    toy = data_frame(spark, doc_id=[1, 2], label=["b", "a"],
                     text=["same words", "same words"])
    model = nb_train(toy, "label")
    out = nb_score(data_frame(spark, doc_id=[10], text=["same"]),
                   model).df.toPandas()
    assert out.nb_label[0] == "a"  # identical scores -> label asc


def test_nb_score_alpha_validation(spark):
    toy = _toy(spark)
    model = nb_train(toy, "label")
    with pytest.raises(ValueError, match="alpha"):
        nb_score(toy, model, alpha=0.0)
    with pytest.raises(ValueError):
        nb_train(toy, "label", min_count=0)
