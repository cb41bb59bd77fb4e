"""Corpus-curation queries (PII scrub, contamination check, repetition
scoring) with exact DuckDB oracles.

The documents fixture is punctuation-free word soup with no contact
data, so the PII and repetition queries AUGMENT the text with a
deterministic, SQL-expressible synthetic tail (same expression in both
engines) — the operator logic (redaction counts, duplicate-line
accounting) is then exercised on true positives and true negatives
instead of vacuous zeros.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.operators.curation import (
    contamination_overlap,
    pii_scrub,
    repetition_stats,
)
from etl_sprint_2_5_spark.plans.registry import query
from etl_sprint_2_5_spark.plans.text_queries import _DUCK_SHINGLES_T, _DUCK_TOKS
from etl_sprint_2_5_spark.sources.parquet import load_table


@query(
    "text_pii_scrub",
    oracle="""
    WITH aug AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 2 = 0
                  THEN text || ' contact ' || source ||
                       '@example.com or call +1 (555) 123-' ||
                       lpad((doc_id % 10000)::VARCHAR, 4, '0')
                  ELSE text END AS text
      FROM documents
    ), scrubbed AS (
      SELECT doc_id, source,
             len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
             regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g') AS t1
      FROM aug
    ), final AS (
      SELECT doc_id, source, n_emails,
             len(regexp_extract_all(t1, '\\+?[0-9][0-9() \\-]{7,}[0-9]')) AS n_phones,
             regexp_replace(t1, '\\+?[0-9][0-9() \\-]{7,}[0-9]', '<PHONE>', 'g') AS scrubbed
      FROM scrubbed
    )
    SELECT source,
           count(*)                                   AS n_docs,
           CAST(sum(n_emails) AS BIGINT)              AS total_emails,
           CAST(sum(n_phones) AS BIGINT)              AS total_phones,
           CAST(sum(length(scrubbed)) AS BIGINT)      AS total_scrubbed_chars
    FROM final
    GROUP BY source
    ORDER BY source
    """,
    covers=("X-curation-pii",),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email+phone redaction rolled up per source. Even doc_ids get a
    deterministic synthetic contact tail (both engines build the same
    string), odd ones stay clean — counts verify redaction fires
    exactly where it should."""
    d = load_table(spark, "documents", sf_dir)
    aug = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact "),
                F.col("source"),
                F.lit("@example.com or call +1 (555) 123-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.col("text")),
    )
    s = pii_scrub(aug, "text", "doc_id").join(
        d.select("doc_id", "source"), "doc_id"
    )
    return (
        s.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_emails").alias("total_emails"),
            F.sum("n_phones").alias("total_phones"),
            F.sum(F.length("scrubbed")).alias("total_scrubbed_chars"),
        )
        .orderBy("source")
    )


@query(
    "contamination_check",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS tk FROM documents
    ), sh AS (
      SELECT doc_id, {_DUCK_SHINGLES_T} AS shingles FROM toks
    ), bench AS (
      SELECT list_distinct(flatten(list(shingles))) AS bs
      FROM sh WHERE doc_id % 97 = 0
    ), scored AS (
      SELECT s.doc_id,
             len(s.shingles) AS n_shingles,
             len(list_intersect(s.shingles, b.bs)) AS n_contaminated
      FROM sh s, bench b
      WHERE s.doc_id % 97 <> 0
    )
    SELECT doc_id, n_shingles, n_contaminated,
           round(n_contaminated / greatest(n_shingles, 1), 4) AS contamination
    FROM scored
    ORDER BY contamination DESC, doc_id
    LIMIT 50
    """,
    covers=("X-curation-contamination",),
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination: word-3-gram overlap of every corpus
    doc against the benchmark docs (doc_id % 97 == 0 plays the eval
    set). The benchmark shingle set broadcasts; the corpus is scored
    map-side with no shuffle."""
    d = load_table(spark, "documents", sf_dir)
    bench = d.where(F.col("doc_id") % 97 == 0)
    corpus = d.where(F.col("doc_id") % 97 != 0)
    out = contamination_overlap(corpus, bench, "text", "doc_id", n=3)
    return (
        out.select(
            "doc_id",
            "n_shingles",
            "n_contaminated",
            F.round(
                F.col("n_contaminated") / F.greatest(F.col("n_shingles"), F.lit(1)),
                4,
            ).alias("contamination"),
        )
        .orderBy(F.desc("contamination"), F.asc("doc_id"))
        .limit(50)
    )


@query(
    "text_repetition",
    oracle="""
    WITH aug AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 3 = 0
                  THEN text || '. boilerplate footer. boilerplate footer. boilerplate footer'
                  ELSE text END AS text
      FROM documents
    ), lines AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(text, '\\. '), x -> len(x) > 0) AS ls
      FROM aug
    ), stats AS (
      SELECT doc_id, source,
             len(ls) AS n_lines,
             len(ls) - len(list_distinct(ls)) AS n_dup_lines,
             round(CASE WHEN len(ls) > 0
                   THEN (len(ls) - len(list_distinct(ls))) / len(ls)
                   ELSE 0.0 END, 4) AS dup_line_frac,
             round(CASE WHEN list_sum(list_transform(ls, x -> length(x))) > 0
                   THEN (list_sum(list_transform(ls, x -> length(x)))
                         - list_sum(list_transform(list_distinct(ls), x -> length(x))))
                        / list_sum(list_transform(ls, x -> length(x)))
                   ELSE 0.0 END, 4) AS dup_char_frac
      FROM lines
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_dup_lines) AS BIGINT) AS total_dup_lines,
           round(avg(dup_line_frac), 4) AS avg_dup_line_frac,
           round(avg(dup_char_frac), 4) AS avg_dup_char_frac
    FROM stats
    GROUP BY source
    ORDER BY source
    """,
    covers=("X-curation-repetition",),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition rollup per source. Every third doc gets
    a deterministic repeated-sentence footer; the duplicate-line and
    duplicate-char fractions must light up exactly there."""
    d = load_table(spark, "documents", sf_dir)
    aug = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(
                    ". boilerplate footer. boilerplate footer. boilerplate footer"
                ),
            ),
        ).otherwise(F.col("text")),
    )
    r = repetition_stats(aug, "text", "doc_id").join(
        d.select("doc_id", "source"), "doc_id"
    )
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_dup_lines").alias("total_dup_lines"),
            F.round(F.avg("dup_line_frac"), 4).alias("avg_dup_line_frac"),
            F.round(F.avg("dup_char_frac"), 4).alias("avg_dup_char_frac"),
        )
        .orderBy("source")
    )
