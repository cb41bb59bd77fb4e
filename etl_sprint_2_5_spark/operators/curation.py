"""Corpus-curation operators for large-scale training-data pipelines:
PII scrubbing, benchmark-contamination checks, and repetition scoring.

No counterpart in the reference (it is a movie-search ETL); these are
the BASELINE.json extension surface's curation tier. All three are
pure Column expressions (codegen'd, shuffle-light) with exact DuckDB
oracle mirrors:

- ``pii_scrub``: email/phone redaction with patterns in the common
  Java-regex/RE2 subset (no backrefs/lookaround), so Spark and the
  oracle rewrite identically;
- ``contamination_overlap``: word-shingle overlap against a BENCHMARK
  blocklist — the blocklist is tiny relative to the corpus (an eval
  set), so it broadcasts and the corpus is filtered map-side, one
  aggregate per doc; the corpus is never shuffled on content;
- ``repetition_stats``: Gopher-style duplicate-line fraction (docs
  dominated by repeated lines/sentences are boilerplate) — per-row
  array arithmetic, no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.functions.text import word_shingles

# Patterns restricted to the Java-regex ∩ RE2 subset (verified against
# DuckDB): character classes, bounded/unbounded repetition only.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+?[0-9][0-9() \\-]{7,}[0-9]"


def pii_scrub(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Redact emails then phone numbers, counting each. Order matters
    (emails first — a phone pattern can partially match inside a
    redacted token otherwise) and is mirrored in the oracle."""
    emails = F.size(F.regexp_extract_all(F.col(text_col), F.lit(EMAIL_RE), F.lit(0)))
    after_email = F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>")
    phones = F.size(F.regexp_extract_all(after_email, F.lit(PHONE_RE), F.lit(0)))
    scrubbed = F.regexp_replace(after_email, PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col),
        emails.alias("n_emails"),
        phones.alias("n_phones"),
        scrubbed.alias("scrubbed"),
    )


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
) -> DataFrame:
    """Per-document count of word n-grams that also appear in the
    benchmark set (train/test contamination detection).

    Shape: the benchmark's distinct shingles form a small table that
    BROADCASTS; the corpus explodes its distinct shingles and counts
    hits through a broadcast hash semi-join — the hash set is built
    ONCE per executor (an array_intersect against a literal array
    would rebuild it per row), and the corpus is never shuffled on
    content, only on doc_id for the final count. At real scale the
    blocklist is shingle HASHES (a few GB for all public benchmarks);
    the join stays a broadcast."""
    bench_shingles = (
        benchmark.select(F.explode(word_shingles(text_col, n)).alias("_s"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # single pass over the corpus: shingle array built once, size
    # carried through the explode so no second scan/codegen of the
    # shingle tree is needed for the totals
    exploded = corpus.select(
        F.col(id_col), F.array_distinct(word_shingles(text_col, n)).alias("_sh")
    ).select(
        F.col(id_col),
        F.size("_sh").alias("n_shingles"),
        F.explode_outer("_sh").alias("_s"),
    )
    return (
        exploded.join(F.broadcast(bench_shingles), "_s", "left")
        .groupBy(id_col)
        .agg(
            F.first("n_shingles").alias("n_shingles"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_contaminated"),
        )
    )


def repetition_stats(
    df: DataFrame, text_col: str, id_col: str, sep: str = "\\. "
) -> DataFrame:
    """Gopher-style repetition signals: fraction of duplicate
    lines/sentences and the fraction of CHARACTERS inside duplicated
    lines (the stronger boilerplate indicator)."""
    lines = F.filter(
        F.split(F.col(text_col), sep), lambda x: F.length(x) > 0
    )
    n_lines = F.size(lines)
    n_dist = F.size(F.array_distinct(lines))
    # chars in duplicate lines = total chars of lines - chars of distinct lines
    total_chars = F.aggregate(
        lines, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    dist_chars = F.aggregate(
        F.array_distinct(lines), F.lit(0), lambda acc, x: acc + F.length(x)
    )
    return df.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        (n_lines - n_dist).alias("n_dup_lines"),
        F.round(
            F.when(n_lines > 0, (n_lines - n_dist) / n_lines).otherwise(0.0), 4
        ).alias("dup_line_frac"),
        F.round(
            F.when(total_chars > 0, (total_chars - dist_chars) / total_chars)
            .otherwise(0.0),
            4,
        ).alias("dup_char_frac"),
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: str = "split-v1",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic dataset split (train/val/test): bucket =
    md5(salt || id) as an integer mod ``buckets``; splits own
    contiguous cumulative-fraction ranges of the bucket space.

    Properties a training pipeline needs and random() can't give:
    stable across runs/retries/engines (md5 is the repo's cross-engine
    hash — the DuckDB oracle reproduces the exact assignment), stable
    under corpus growth (a doc's split never changes when others are
    added), and re-saltable for fresh splits. Adds a ``split`` column.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8), 16, 10)
        .cast("long") % buckets
    )
    expr = None
    acc = 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        acc += frac
        cond = bucket < int(round(acc * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)
