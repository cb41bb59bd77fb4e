"""Text-analysis operators — language ID, quality scoring, token
counting, full-text scoring (BASELINE.json extension surface +
SURVEY.md §2.7 F11/F12).

Pure Column expressions (codegen'd) throughout; the one sanctioned
Python stage is the OPT-IN Porter stemming pass (functions/stem.py,
``stem=True``) — the default chain stays UDF-free, so the same
formulas are mirrored in the DuckDB oracles and hash-verified.
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
    """Two-stage language ID: a SCRIPT check first — a document whose
    chars are ≥10% CJK ideographs is 'zh' (the ascii marker tokenizer
    drops CJK entirely, so no word vote can ever see it) — then the
    marker-word vote over latin-script languages; argmax wins, ties
    break to the alphabetically earlier language, zero hits → 'und'.
    The ratio test is integer arithmetic (cjk·10 ≥ len) so both
    engines decide identically."""
    toks = tokenize(text_col)
    langs = sorted(LANG_MARKERS)
    cjk = F.length(
        F.regexp_replace(F.col(text_col), "[^一-鿿]", "")
    )
    total = F.length(F.col(text_col))
    out = df.select(
        F.col(id_col),
        (cjk * 10 >= F.greatest(total, F.lit(1))).alias("_is_cjk"),
        *[_hits(toks, LANG_MARKERS[lg]).alias(f"hits_{lg}") for lg in langs],
    )
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier languages override on ties
        pred = F.when(F.col(f"hits_{lg}") == best, F.lit(lg)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    pred = F.when(F.col("_is_cjk"), F.lit("zh")).otherwise(pred)
    return out.withColumn("pred_lang", pred).drop("_is_cjk")


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


def hashed_linear_score(
    df: DataFrame, text_col: str, id_col: str, salt: str = "qclf-v1"
) -> DataFrame:
    """fastText-style linear classifier over hashed token features:
    logit(doc) = Σ_t w(h(t)) / (1000 · n_tokens).

    The per-token weight sum runs as ``F.aggregate`` over the token
    array INSIDE the row's projection — no explode, no shuffle: the
    naive explode → groupBy(doc) shape ships every token through an
    exchange (60M rows at sf1 — profiled 10× slower, round 13) to
    recombine rows that were never apart. The weight table is a
    deterministic md5 stand-in (w_int(t) = md5₆₀(salt‖t) mod 2001 −
    1000 ∈ [−1000, 1000]), the same fake-but-pinned convention as the
    multimodal codecs: a trained model swaps in a broadcast
    id→weight map lookup inside the same lambda without touching the
    dataflow.

    The whole computation stays in INTEGERS — weight sums are exact
    and order-independent (double summation would make the shuffle
    order observable), and the score ships as fixed-point
    parts-per-million (``logit_ppm`` = logit·10⁶, truncated): a
    float division + round() here would hit decimal-halfway ties
    where Spark (shortest-repr BigDecimal) and other engines (binary
    value) legitimately disagree by 1 ulp of the rounding grid. The
    offset-then-divide keeps the integer division on positive values,
    where floor and truncate agree across engines."""
    toks = tokenize(text_col)

    def w_int(t):  # noqa: ANN001 - Column lambda
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(salt), t)), 1, 15), 16, 10
            ).cast("long")
            % 2001
            - 1000
        )

    return (
        df.select(
            F.col(id_col),
            F.size(toks).alias("_n"),
            F.aggregate(
                toks, F.lit(0).cast("long"), lambda acc, t: acc + w_int(t)
            ).alias("_sw"),
        )
        .where(F.col("_n") > 0)  # explode semantics: token-free docs drop
        .select(
            F.col(id_col),
            F.col("_n").alias("n_tokens"),
            (
                F.expr("((_sw + 1000 * _n) * 1000000) div (1000 * _n)")
                - F.lit(1000000)
            ).alias("logit_ppm"),
        )
    )


def _analyzer(stem: bool | str):
    """Resolve the `stem` option to a tokenizer: False → plain ascii
    tokenize; True/"en" → Porter chain; "ru_en" → the full reference
    ru_en analyzer chain (functions/stem_ru.py)."""
    if not stem:
        return tokenize
    from etl_sprint_2_5_spark.functions.stem import tokenize_stemmed

    lang = "ru_en" if stem == "ru_en" else "en"
    return lambda c: tokenize_stemmed(c, lang=lang)


def _stem_terms(terms: tuple[str, ...], stem: bool | str) -> tuple[str, ...]:
    """Query-side twin of the token-stream analyzer: stem each term
    with the same chain; ru_en drops stopword terms entirely."""
    if stem == "ru_en":
        from etl_sprint_2_5_spark.functions.stem_ru import stem_term_ru_en

        stemmed = (stem_term_ru_en(t) for t in terms)
    else:
        from etl_sprint_2_5_spark.functions.stem import porter_stem

        stemmed = (porter_stem(t) for t in terms)
    return tuple(dict.fromkeys(t for t in stemmed if t))


def corpus_term_stats(
    df: DataFrame,
    terms: tuple[str, ...],
    fields: tuple[str, ...],
    stem: bool | str = False,
) -> dict:
    """Corpus statistics for idf weighting: one aggregate pass over the
    tokenized fields → ``{"n": N, "df": {(field, term): doc_freq}}``.

    |fields|×|terms| counters (plus one token-length sum per field, for
    BM25 length normalization) in a single-row agg — the "small
    broadcast" of the scoring design. In a serving deployment this is
    computed once at index-build time and reused per query."""
    analyzer = _analyzer(stem)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, field in enumerate(fields):
        toks = analyzer(field)
        aggs.append(F.sum(F.size(toks)).alias(f"_len_{i}"))
        for j, term in enumerate(terms):
            aggs.append(
                F.sum(F.array_contains(toks, term).cast("int")).alias(f"_df_{i}_{j}")
            )
    row = df.agg(*aggs).first()
    n = row["_n"]
    return {
        "n": n,
        "df": {
            (field, term): row[f"_df_{i}_{j}"] or 0
            for i, field in enumerate(fields)
            for j, term in enumerate(terms)
        },
        # avg field length, rounded HALF_UP to 6 (matches the oracle's
        # round(CAST(sum .. AS DOUBLE)/count, 6) — DuckDB rounds half up,
        # Python's round() is half-even, so don't use it here)
        "avglen": {
            field: _round_half_up6((row[f"_len_{i}"] or 0) / n) if n else 0.0
            for i, field in enumerate(fields)
        },
    }


def _round_half_up6(x: float) -> float:
    """Scalar HALF_UP rounding to 6 decimals — the cross-engine pin
    (DuckDB/Spark round() are HALF_UP; Python round() is half-even)."""
    import math

    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def idf_weight(n: int, df_count: int) -> float:
    """BM25-style idf, rounded to 6 decimals so the Spark literal and
    the oracle's ``ln`` agree regardless of libm ulp differences."""
    import math

    return round(math.log(1.0 + (n - df_count + 0.5) / (df_count + 0.5)), 6)


def fulltext_score(
    df: DataFrame,
    id_col: str,
    terms: tuple[str, ...],
    fields: dict[str, float],
    stats: dict | None = None,
    stem: bool | str = False,
    k1: float | None = None,
    b: float = 0.75,
) -> DataFrame:
    """Weighted multi-field tf·idf score — the in-engine approximation
    of the reference's ES multi_match with per-field boosts
    (search_api/api.py:94-100: title^4, description^3, ...; ES scores
    with BM25 = idf-weighted, length-normalized tf).

    score(doc) = Σ_field w_f · Σ_term tf(field, term) · idf(field, term)
    idf(f, t)  = ln(1 + (N − df + 0.5)/(df + 0.5))   [BM25 idf]

    Execution shape: each field is tokenized ONCE and exploded; tokens
    are filtered to the query terms BEFORE the shuffle (the exchange
    carries only matching tokens), then one hash aggregate sums the
    per-token weight w_f·idf_{f,t} from a literal map — tokenization
    can never be re-inlined per term by projection collapse. Only docs
    with ≥1 term hit are returned (both consumers filter score > 0).

    With ``k1=None`` (default) the score is plain tf·idf — no tf
    saturation, no length normalization. Pass ``k1`` (e.g. 1.2) to get
    the FULL BM25 formula the reference's ES deployment runs:

    score(doc) = Σ_f Σ_t w_f · idf_{f,t} ·
                 tf·(k1+1) / (tf + k1·(1 − b + b·len_f/avglen_f))

    where len_f is the doc's token count in field f and avglen_f the
    corpus mean (from the same single stats pass). Still pure Column
    expressions: tokenize once per field, filter to query terms before
    the shuffle (the exchange carries only matching tokens plus one
    int field-length), hash-aggregate tf per (doc, field, term), then
    one literal-map lookup per group computes the saturated
    contribution."""
    from functools import reduce

    if stem:
        # stem the query terms with the same chain the token stream
        # goes through, so 'running' matches 'runs' (and 'бегущая'
        # matches 'бегущий' under ru_en)
        terms = _stem_terms(terms, stem)
    terms = tuple(t for t in terms if t)
    if not terms:
        # empty query (or terms that stem away entirely): no doc can
        # score — return an empty result of the contract schema instead
        # of letting isin()/create_map() blow up on zero arguments
        return df.select(F.col(id_col), F.lit(0.0).alias("score")).limit(0)
    if stats is None:
        stats = corpus_term_stats(df, terms, tuple(fields), stem=stem)
    n = stats["n"]

    if k1 is not None:
        analyzer = _analyzer(stem)
        parts = []
        for field in fields:
            toks = analyzer(field)
            parts.append(
                df.select(
                    F.col(id_col),
                    F.lit(field).alias("_f"),
                    F.size(toks).alias("_len"),
                    F.explode(toks).alias("_t"),
                ).where(F.col("_t").isin(*terms))
            )
        tokens = reduce(lambda a, b_: a.unionByName(b_), parts)
        tf = tokens.groupBy(id_col, "_f", "_t", "_len").agg(
            F.count(F.lit(1)).alias("_tf")
        )
        wk_entries, avglen_entries = [], []
        for field, w in fields.items():
            avglen_entries += [F.lit(field), F.lit(stats["avglen"][field])]
            for term in terms:
                wk_entries += [
                    F.lit(f"{field}|{term}"),
                    F.lit(w * idf_weight(n, stats["df"][(field, term)])),
                ]
        wk = F.element_at(
            F.create_map(*wk_entries), F.concat(F.col("_f"), F.lit("|"), F.col("_t"))
        )
        avglen = F.element_at(F.create_map(*avglen_entries), F.col("_f"))
        # operand order mirrors the oracle SQL exactly (IEEE doubles are
        # deterministic per-op; only the order must match)
        denom = F.col("_tf") + F.lit(k1) * (
            F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("_len") / avglen
        )
        contrib = wk * (F.col("_tf") * F.lit(k1 + 1.0)) / denom
        return tf.groupBy(id_col).agg(F.round(F.sum(contrib), 2).alias("score"))

    if stem == "ru_en":
        from etl_sprint_2_5_spark.functions.stem_ru import tokenize_ru_en

        base_tokenize = tokenize_ru_en
    else:
        base_tokenize = tokenize
    parts = [
        df.select(
            F.col(id_col),
            F.lit(field).alias("_f"),
            F.explode(base_tokenize(field)).alias("_t"),
        )
        for field in fields
    ]
    tokens = reduce(lambda a, b: a.unionByName(b), parts)
    if stem == "ru_en":
        from etl_sprint_2_5_spark.functions.stem_ru import stem_token_ru_en

        # stopword tokens map to NULL and fall out at the isin filter
        tokens = tokens.withColumn("_t", stem_token_ru_en("_t"))
    elif stem:
        from etl_sprint_2_5_spark.functions.stem import stem_token

        tokens = tokens.withColumn("_t", stem_token("_t"))
    tokens = tokens.where(F.col("_t").isin(*terms))
    weight_entries = []
    for field, w in fields.items():
        for term in terms:
            weight_entries += [
                F.lit(f"{field}|{term}"),
                F.lit(w * idf_weight(n, stats["df"][(field, term)])),
            ]
    token_weight = F.element_at(
        F.create_map(*weight_entries), F.concat(F.col("_f"), F.lit("|"), F.col("_t"))
    )
    return tokens.groupBy(id_col).agg(
        F.round(F.sum(token_weight), 2).alias("score")
    )


def unigram_nll(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    cache_registry: list | None = None,
) -> DataFrame:
    """Unigram language-model surprisal per document — the CCNet/Dolma
    'perplexity filter' shape with the corpus's own unigram stats as
    the model.

    Three declarative stages, all bounded:
    1. token counts (one shuffle on token; vocab-sized result);
    2. add-one-smoothed per-token cost, fixed-pointed to ppm:
       cost_ppm = floor(-ln((c+1)/(N+V)) · 1e6 + 0.5) — BIGINT per
       token, so the later per-doc sum is order-independent (a raw
       double sum would be association-ordered and engine-unstable);
    3. broadcast the vocab-sized cost table back onto the token
       stream and aggregate per document (one shuffle on doc id).

    At 100 TB the vocab table is the only state that must fit in
    memory; past broadcast size the same plan degrades to a shuffle
    hash join without changing semantics.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("tok")
    )
    # cache the vocab table (guide §5): it feeds BOTH the corpus
    # constants and the cost table, and without the cache each
    # consumer re-derives it from the token stream — one extra full
    # corpus scan + tokenize per call. It is exactly the state the
    # docstring already requires to be memory-sized; callers that
    # consume the result twice (perplexity bucketing) avoid yet more
    # rescans by caching the doc-sized score frame on their side.
    # Lifecycle: the cache is appended to ``cache_registry`` when the
    # caller passes one, so a query can unpersist it after its final
    # action (registry.materialize_release) instead of leaving the
    # entry to accumulate across a long-lived session.
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).cache()
    if cache_registry is not None:
        cache_registry.append(vocab)
    consts = vocab.agg(
        F.sum("c").alias("n_total"), F.count(F.lit(1)).alias("v")
    )
    costs = vocab.crossJoin(F.broadcast(consts)).select(
        "tok",
        F.floor(
            -F.log(
                (F.col("c") + 1)
                / (F.col("n_total") + F.col("v")).cast("double")
            )
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("cost_ppm"),
    )
    scored = toks.join(F.broadcast(costs), "tok").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("cost_ppm").alias("total_nll_ppm"),
    )
    return scored.select(
        F.col(id_col),
        "n_tokens",
        "total_nll_ppm",
        F.expr("total_nll_ppm div n_tokens").alias("avg_nll_ppm"),
    )


def nfkc_clean(s: str) -> str:
    """The standard pretraining text-cleanup kernel (the step C4 /
    FineWeb / GPT-2-style pipelines run before tokenization): Unicode
    NFKC normalization (fullwidth forms, ligatures, compatibility
    digits/units, combining-sequence composition), control-character
    strip (category Cc — this is the aggressive single-line variant;
    a newline-preserving pipeline would exempt the newline), and
    unicode-whitespace collapse to single ASCII spaces with outer
    trim. Pure per-string CPU — run inside Arrow-batched pandas UDFs
    on the executors (the stemmer precedent: Python only touches the
    string payload, Spark owns the distribution)."""
    import unicodedata

    s = unicodedata.normalize("NFKC", s)
    s = "".join(ch for ch in s if unicodedata.category(ch) != "Cc")
    return " ".join(s.split())
