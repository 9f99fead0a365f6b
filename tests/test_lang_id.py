"""Cavnar–Trenkle n-gram language identification (corpus/text.py
lang_profile_train / lang_id): real multilingual classification accuracy,
determinism, edge semantics, and a pure-Python replay of the out-of-place
distance."""

import re
from collections import Counter

from pyspark.sql import functions as F

from siuba_spark import tbl
from siuba_spark.corpus.text import lang_id, lang_profile_train

TRAIN = [
    (0, "en", "the quick brown fox jumps over the lazy dog and the cat"),
    (1, "en", "this is a sentence with the usual english words in it"),
    (2, "en", "where there is a will there is a way they say"),
    (3, "de", "der schnelle braune fuchs springt ueber den faulen hund"),
    (4, "de", "dies ist ein satz mit den ueblichen deutschen woertern"),
    (5, "de", "wo ein wille ist da ist auch ein weg sagt man"),
    (6, "es", "el rapido zorro marron salta sobre el perro perezoso"),
    (7, "es", "esta es una frase con las palabras habituales en espanol"),
    (8, "es", "donde hay una voluntad hay un camino como dicen"),
]

TEST = [
    (10, "en", "the dog and the fox were in the garden with the cat"),
    (11, "de", "der hund und der fuchs waren mit der katze im garten"),
    (12, "es", "el perro y el zorro estaban en el jardin con el gato"),
]


def _py_profile(texts_by_key, n, k):
    """Reference profile builder: top-k char n-grams per key, rank 1..k
    by (count desc, gram asc)."""
    out = {}
    for key, texts in texts_by_key.items():
        c = Counter()
        for t in texts:
            s = re.sub(r"\s+", " ", t.strip().lower())
            c.update(s[i:i + n] for i in range(len(s) - n + 1))
        ranked = sorted(c.items(), key=lambda gc: (-gc[1], gc[0]))[:k]
        out[key] = {g: r + 1 for r, (g, _) in enumerate(ranked)}
    return out


def _py_classify(text, profiles, n, k):
    doc = _py_profile({0: [text]}, n, k)[0]
    best = None
    for lang, prof in sorted(profiles.items()):
        dist = sum(abs(r - prof[g]) if g in prof else k
                   for g, r in doc.items())
        if best is None or dist < best[1]:
            best = (lang, dist)
    return best


def test_lang_id_classifies_real_languages(spark):
    t = tbl(spark.createDataFrame(TRAIN, "doc_id long, lang string, text string"))
    prof = lang_profile_train(t, "lang", "text", n=3, k=64)
    tt = tbl(spark.createDataFrame(TEST, "doc_id long, lang string, text string"))
    out = {r.doc_id: (r.lang_pred, r.lang_pred_dist)
           for r in lang_id(tt, prof, n=3, k=64).df.collect()}
    for doc_id, truth, _text in TEST:
        assert out[doc_id][0] == truth, (doc_id, out[doc_id])


def test_lang_id_matches_python_replay(spark):
    """The Spark distance equals a from-scratch pure-Python CT replay —
    integer-exact, both the argmin language and the distance value."""
    n, k = 3, 32
    t = tbl(spark.createDataFrame(TRAIN, "doc_id long, lang string, text string"))
    prof = lang_profile_train(t, "lang", "text", n=n, k=k)
    by_lang = {}
    for _id, lang, text in TRAIN:
        by_lang.setdefault(lang, []).append(text)
    profiles = _py_profile(by_lang, n, k)
    # profile table itself matches
    got = {(r.lang, r.gram): r.rank for r in prof.collect()}
    want = {(lang, g): r for lang, p in profiles.items()
            for g, r in p.items()}
    assert got == want
    tt = tbl(spark.createDataFrame(TEST, "doc_id long, lang string, text string"))
    out = {r.doc_id: (r.lang_pred, r.lang_pred_dist)
           for r in lang_id(tt, prof, n=n, k=k).df.collect()}
    for doc_id, _truth, text in TEST:
        assert out[doc_id] == _py_classify(text, profiles, n, k)


def test_lang_id_deterministic_and_column_preserving(spark):
    t = tbl(spark.createDataFrame(TRAIN, "doc_id long, lang string, text string"))
    prof = lang_profile_train(t, "lang", "text")
    a = sorted(map(tuple, lang_id(t, prof).df.collect()))
    b = sorted(map(tuple, lang_id(t, prof).df.collect()))
    assert a == b
    cols = lang_id(t, prof).df.columns
    assert cols[:3] == ["doc_id", "lang", "text"]
    assert "lang_pred" in cols and "lang_pred_dist" in cols


def test_lang_id_short_text_gets_null(spark):
    t = tbl(spark.createDataFrame(TRAIN, "doc_id long, lang string, text string"))
    prof = lang_profile_train(t, "lang", "text", n=3, k=16)
    tt = tbl(spark.createDataFrame([(0, "xy"), (1, "")],
                                   "doc_id long, text string"))
    rows = lang_id(tt, prof, n=3, k=16).df.collect()
    assert all(r.lang_pred is None and r.lang_pred_dist is None
               for r in rows)


def test_lang_profile_train_shapes(spark):
    t = tbl(spark.createDataFrame(TRAIN, "doc_id long, lang string, text string"))
    prof = lang_profile_train(t, "lang", "text", n=2, k=8)
    rows = prof.collect()
    assert {r.lang for r in rows} == {"en", "de", "es"}
    per = Counter(r.lang for r in rows)
    assert all(c <= 8 for c in per.values())
    # ranks are 1..count(lang), dense
    for lang in per:
        ranks = sorted(r.rank for r in rows if r.lang == lang)
        assert ranks == list(range(1, per[lang] + 1))


def test_lang_id_plan_broadcasts_profiles(spark):
    """The 100 TB contract: the profile/language sides are broadcast —
    the corpus side never joins against a shuffling relation."""
    t = tbl(spark.createDataFrame(TRAIN, "doc_id long, lang string, text string"))
    prof = lang_profile_train(t, "lang", "text")
    plan = (lang_id(t, prof).df._jdf.queryExecution()
            .executedPlan().toString())
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
