"""Snowball-Russian stemmer + ru_en analyzer chain (F11 parity with
the reference's ru_en ES analyzer, movies.es.schema.json:4-40) —
algorithm goldens hand-derived from the published Snowball Russian
spec, UDF/python equivalence, and mixed ru/en full-text end-to-end
against a pure-Python oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sprint_2_5_spark.functions.stem import porter_stem
from etl_sprint_2_5_spark.functions.stem_ru import (
    ES_ENGLISH_STOPWORDS,
    RUSSIAN_STOPWORDS,
    analyze_ru_en,
    russian_stem,
    stem_term_ru_en,
    tokenize_ru_en,
)
from etl_sprint_2_5_spark.operators.textops import fulltext_score, idf_weight

# (input, stem) pairs hand-traced through the published algorithm
# (snowballstem.org/algorithms/russian/), one per rule family.
RUSSIAN_GOLDENS = [
    # noun endings
    ("книгами", "книг"), ("волнам", "волн"), ("технологии", "технолог"),
    ("дети", "дет"), ("вопросов", "вопрос"),
    # adjective endings (адjectival, participle try)
    ("красивый", "красив"), ("важная", "важн"), ("бегущая", "бегущ"),
    # verb endings, group 1 (а/я kept) and group 2
    ("читала", "чита"), ("читаю", "чита"), ("говорил", "говор"),
    # reflexive + verb
    ("казалось", "каза"),
    # perfective gerund group 1
    ("сделав", "сдела"),
    # derivational ость in R2
    ("активность", "активн"),
    # superlative tidy-up
    ("быстрейший", "быстр"),
    # ё folding
    ("зелёный", "зелен"),
    # no Cyrillic vowel → unchanged
    ("в", "в"),
]


def test_russian_goldens():
    bad = [
        (w, russian_stem(w), want)
        for w, want in RUSSIAN_GOLDENS
        if russian_stem(w) != want
    ]
    assert not bad, bad


def test_stopword_sets():
    # spot-check both lists against the published Snowball/Lucene sets
    for w in ("и", "не", "только", "между", "чтобы"):
        assert w in RUSSIAN_STOPWORDS
    for w in ("the", "and", "with", "such"):
        assert w in ES_ENGLISH_STOPWORDS
    # the chain drops stopwords, stems everything else by script
    assert stem_term_ru_en("по") is None
    assert stem_term_ru_en("The") is None
    assert stem_term_ru_en("Running") == "run"
    assert stem_term_ru_en("Бегущая") == "бегущ"
    # ё folds to е before the stopword check: всё == все (stopword)
    assert stem_term_ru_en("всё") is None


def test_analyze_ru_en_udf_matches_python(spark):
    rows = [
        ("d1", "Бегущая по волнам — running fast"),
        ("d2", "Зелёная миля и The Green Mile"),
        ("d3", ""),
        ("d4", "Only English words here"),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    got = {
        r["id"]: r["a"]
        for r in df.select("id", analyze_ru_en("text").alias("a")).collect()
    }
    raw = {
        r["id"]: r["tk"]
        for r in df.select("id", tokenize_ru_en("text").alias("tk")).collect()
    }
    for i, toks in raw.items():
        want = [s for s in (stem_term_ru_en(t) for t in toks) if s]
        assert got[i] == want, (i, toks, got[i], want)
    # mixed-language doc: ru stopword 'по' dropped, both scripts stemmed
    assert got["d1"] == ["бегущ", "волн", "run", "fast"]
    # en stopword 'the' and ru stopword 'и' dropped
    assert "the" not in got["d2"] and "и" not in got["d2"]


def test_fulltext_ru_en_matches_python_oracle(spark):
    import re

    rows = [
        ("d1", "Бегущая по волнам", "драма"),
        ("d2", "Бегущий человек running", "боевик"),
        ("d3", "nothing relevant here", "misc"),
        ("d4", "Зелёная миля", "драма"),
    ]
    df = spark.createDataFrame(rows, "id string, text string, genre string")
    fields = {"text": 3.0, "genre": 1.0}
    # query mixes scripts and inflections: 'бегущие' stems to 'бегущ',
    # matching d1/d2; 'runs' stems to 'run', matching d2
    got = {
        r["id"]: r["score"]
        for r in fulltext_score(
            df, "id", ("бегущие", "runs"), fields, stem="ru_en"
        ).collect()
    }

    def toks(s):
        s = s.lower().replace("ё", "е")
        return [t for t in re.split(r"[^a-zа-я0-9]+", s) if t]

    def chain(tok_list):
        return [s for s in (stem_term_ru_en(t) for t in tok_list) if s]

    terms = [stem_term_ru_en("бегущие"), stem_term_ru_en("runs")]
    assert terms == ["бегущ", "run"]
    docs = [(i, chain(toks(tx)), chain(toks(g))) for i, tx, g in rows]
    n = len(docs)
    want = {}
    for i, ttk, gtk in docs:
        score = 0.0
        for w, tk, fidx in ((3.0, ttk, 1), (1.0, gtk, 2)):
            for term in terms:
                dfc = sum(1 for d in docs if term in d[fidx])
                score += sum(w * idf_weight(n, dfc) for t in tk if t == term)
        if score:
            want[i] = round(score, 2)
    assert got == want
    assert set(got) == {"d1", "d2"}


def test_fulltext_ru_en_bm25_runs(spark):
    rows = [
        ("d1", "Бегущая по волнам"),
        ("d2", "Бегущий человек бежит и бежит"),
        ("d3", "совсем другое кино"),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    out = fulltext_score(
        df, "id", ("бегущий",), {"text": 1.0}, stem="ru_en", k1=1.2
    ).collect()
    assert {r["id"] for r in out} == {"d1", "d2"}
    for r in out:
        assert r["score"] > 0


def test_fulltext_ru_en_all_stopword_query(spark):
    df = spark.createDataFrame([("d1", "что-нибудь")], "id string, text string")
    out = fulltext_score(df, "id", ("и", "the"), {"text": 1.0}, stem="ru_en")
    assert out.count() == 0


def test_porter_untouched_by_ru_chain():
    # the ascii half of the chain is exactly Porter
    for w in ("running", "hopefulness", "adjustable"):
        assert stem_term_ru_en(w) == porter_stem(w)


def test_russian_stem_properties():
    """Property sweep: every Snowball-Russian step is a DELETION (the
    only rewrite is the ё→е prelude), so the stem must be a prefix of
    the folded word, non-empty for non-empty input, and deterministic."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    cyr = st.text(alphabet="абвгдежзийклмнопрстуфхцчшщъыьэюяё", min_size=1, max_size=24)

    @settings(max_examples=300, deadline=None)
    @given(cyr)
    def check(w):
        s = russian_stem(w)
        folded = w.replace("ё", "е")
        assert folded.startswith(s), (w, s)
        assert len(s) >= 1
        assert russian_stem(w) == s  # deterministic

    check()


def test_ru_en_chain_properties():
    """Mixed-script chain: a dropped token must actually be a
    stopword, and surviving tokens are lowercase. (A surviving STEM
    may coincide with a stopword string — ES drops stopwords BEFORE
    stemming, not after — so no assertion on the output side.)"""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    token = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyzабвгдежзиклмнопрстуфхя0123456789",
        min_size=1,
        max_size=16,
    )

    @settings(max_examples=300, deadline=None)
    @given(token)
    def check(t):
        out = stem_term_ru_en(t)
        if out is None:
            lowered = t.lower().replace("ё", "е")
            assert lowered in RUSSIAN_STOPWORDS or lowered in ES_ENGLISH_STOPWORDS
        else:
            assert out == out.lower()

    check()
