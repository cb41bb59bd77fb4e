"""Porter stemmer (F11 analyzer parity) — algorithm goldens from the
published Porter 1980 examples, UDF/expression equivalence, and the
stemmed full-text opt-in matching a pure-Python oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sprint_2_5_spark.functions.stem import (
    porter_stem,
    stem_tokens,
    tokenize_stemmed,
)
from etl_sprint_2_5_spark.functions.text import tokenize
from etl_sprint_2_5_spark.operators.textops import fulltext_score, idf_weight

# (input, stem) pairs from the worked examples in Porter (1980),
# "An algorithm for suffix stripping", Program 14(3).
PORTER_GOLDENS = [
    # step 1a
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    # step 1b (+ cleanup rules)
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
    ("filing", "file"),
    # step 1c
    ("happy", "happi"), ("sky", "sky"),
    # step 2
    ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("valenci", "valenc"), ("hesitanci", "hesit"),
    ("digitizer", "digit"), ("conformabli", "conform"),
    ("radicalli", "radic"), ("differentli", "differ"), ("vileli", "vile"),
    ("analogousli", "analog"), ("vietnamization", "vietnam"),
    ("predication", "predic"), ("operator", "oper"),
    ("feudalism", "feudal"), ("decisiveness", "decis"),
    ("hopefulness", "hope"), ("callousness", "callous"),
    ("formaliti", "formal"), ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    # step 3
    ("triplicate", "triplic"), ("formative", "form"),
    ("formalize", "formal"), ("electriciti", "electr"),
    ("electrical", "electr"), ("hopeful", "hope"), ("goodness", "good"),
    # step 4
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"),
    ("adjustment", "adjust"), ("dependent", "depend"),
    ("adoption", "adopt"), ("homologou", "homolog"),
    ("communism", "commun"), ("activate", "activ"),
    ("angulariti", "angular"), ("homologous", "homolog"),
    ("effective", "effect"), ("bowdlerize", "bowdler"),
    # step 5
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
    # everyday sanity
    ("running", "run"), ("runs", "run"),
]


def test_porter_goldens():
    bad = [
        (w, porter_stem(w), want)
        for w, want in PORTER_GOLDENS
        if porter_stem(w) != want
    ]
    assert not bad, bad


def test_stem_tokens_udf_matches_python(spark):
    rows = [
        ("d1", "Relational databases are generally hopeful creations"),
        ("d2", "He was running and singing while filing adjustments"),
        ("d3", ""),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    got = {
        r["id"]: r["st"]
        for r in df.select("id", stem_tokens(tokenize("text")).alias("st")).collect()
    }
    raw = {r["id"]: r["tk"] for r in df.select("id", tokenize("text").alias("tk")).collect()}
    for i, toks in raw.items():
        assert got[i] == [porter_stem(t) for t in toks]
    assert df.select(tokenize_stemmed("text").alias("x")).count() == 3


def test_fulltext_stemmed_matches_python_oracle(spark):
    rows = [
        ("d1", "running fast", "sports"),
        ("d2", "the runner runs daily", "sports"),
        ("d3", "nothing relevant here", "misc"),
        ("d4", "run run run", "running"),
    ]
    df = spark.createDataFrame(rows, "id string, text string, source string")
    fields = {"text": 3.0, "source": 1.0}
    got = {
        r["id"]: r["score"]
        for r in fulltext_score(df, "id", ("running",), fields, stem=True).collect()
    }

    # pure-Python oracle of the same formula
    import re

    def toks(s):
        return [t for t in re.sub("[^a-z0-9]+", " ", s.lower()).split() if t]

    term = porter_stem("running")
    docs = [(i, [porter_stem(t) for t in toks(tx)], [porter_stem(t) for t in toks(src)])
            for i, tx, src in rows]
    n = len(docs)
    per_field = {"text": 1, "source": 2}
    want = {}
    for i, ttk, stk in docs:
        score = 0.0
        for fname, w, tk in (("text", 3.0, ttk), ("source", 1.0, stk)):
            dfc = sum(1 for _, a, b in docs if term in (a if fname == "text" else b))
            score += sum(w * idf_weight(n, dfc) for t in tk if t == term)
        if score:
            want[i] = round(score, 2)
    assert got == want
    # 'runs' (d2) and 'run' (d4) matched the stemmed query 'running'
    assert "d2" in got and "d4" in got
