"""Text-analysis operators — language ID, quality scoring, token
counting, full-text scoring (BASELINE.json extension surface +
SURVEY.md §2.7 F11/F12).

All pure Column expressions (codegen'd, no UDFs). The same formulas
are mirrored in the DuckDB oracles, so scores are hash-verified.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.functions.text import tokenize

# Function-word marker lists for n-gram-free language ID. Tiny on
# purpose: the operator contract is "deterministic heuristic vote",
# not a production model (reference delegates analysis to ES analyzers
# — movies.es.schema.json:4-40 ru/en analyzer).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu"),
    "es": ("el", "la", "de", "que", "y", "los", "es", "en", "un", "por"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "dans", "que"),
}

ENGLISH_STOPWORDS = LANG_MARKERS["en"]


def _hits(tokens: Column, words: tuple[str, ...]) -> Column:
    """Number of tokens that are in the word list (with multiplicity)."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Marker-word vote: per language, count marker hits; predict the
    argmax (ties and zero-hit docs → 'und'). Deterministic tie-break:
    highest count wins, earlier language in sorted order wins ties."""
    toks = tokenize(text_col)
    langs = sorted(LANG_MARKERS)
    out = df.select(F.col(id_col), *[
        _hits(toks, LANG_MARKERS[lg]).alias(f"hits_{lg}") for lg in langs
    ])
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier languages override on ties
        pred = F.when(F.col(f"hits_{lg}") == best, F.lit(lg)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    return out.withColumn("pred_lang", pred)


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Composite quality score in [0,1]:

    0.4·min(len/400, 1)  — enough content
    0.4·(distinct/total) — lexical diversity (anti-boilerplate)
    0.2·(1 − stopword_ratio) — information density

    The classic cheap pre-filter for training-data pipelines; exact
    formula mirrored in the oracle."""
    toks = tokenize(text_col)
    n_tok = F.size(toks)
    n_dist = F.size(F.array_distinct(toks))
    len_score = F.least(F.length(F.col(text_col)) / 400.0, F.lit(1.0))
    diversity = F.when(n_tok > 0, n_dist / n_tok).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tok > 0, _hits(toks, ENGLISH_STOPWORDS) / n_tok
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_dist.alias("n_distinct"),
        F.round(
            0.4 * len_score + 0.4 * diversity + 0.2 * (1 - stop_ratio), 4
        ).alias("quality"),
    )


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, chars, and
    the chars/4 LLM-token heuristic."""
    toks = tokenize(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length(F.col(text_col)).alias("n_chars_actual"),
        F.ceil(F.length(F.col(text_col)) / 4.0).cast("long").alias("approx_llm_tokens"),
    )


def fulltext_score(
    df: DataFrame,
    id_col: str,
    terms: tuple[str, ...],
    fields: dict[str, float],
) -> DataFrame:
    """Weighted multi-field term-frequency score — the in-engine
    approximation of the reference's ES multi_match with per-field
    boosts (search_api/api.py:94-100: title^4, description^3, ...).

    score(doc) = Σ_field w_f · Σ_term tf(field, term)

    Divergence from the reference is documented: ES uses BM25
    (length-normalized, idf-weighted); this is a pure tf·boost score,
    which is deterministic and oracle-checkable."""
    def term_tf(toks: Column, term: str) -> Column:
        # NB: the lambda must take exactly one arg — a two-arg lambda
        # is interpreted by Spark as (element, index).
        return F.size(F.filter(toks, lambda t: t == F.lit(term)))

    score = F.lit(0.0)
    for field, weight in fields.items():
        toks = tokenize(field)
        for term in terms:
            score = score + F.lit(weight) * term_tf(toks, term)
    return df.select(F.col(id_col), F.round(score, 2).alias("score"))
