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


def weighted_sample(
    df: DataFrame,
    id_col: str,
    rate: Column,
    salt: str = "mix-v1",
    buckets: int = 10_000,
) -> DataFrame:
    """Domain mixing: deterministic weighted up/down-sampling.

    ``rate`` is a per-row Column (e.g. a CASE over the source column):
    rate 0.5 keeps half the rows, 2.5 emits each row twice plus a half
    chance of a third copy. copies = floor(rate) + [md5-bucket <
    frac·buckets]; each kept row is exploded into ``copy_id`` ∈
    [1..copies]. Same md5 bucketing as hash_split, so the SAME salt
    gives correlated keep-decisions and a fresh salt decorrelates them.

    Deterministic (retry/engine-stable) unlike rand()-based
    df.sample(); no shuffle at all — the explode is a map-side
    generator, which is what lets it run over 100 TB as a pure scan.
    Use binary-exact fractional parts (.5, .25, ...) so the
    frac·buckets comparison can't straddle a float ulp across engines.
    """
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % buckets
    )
    copies = F.floor(rate).cast("long") + (
        bucket < (rate - F.floor(rate)) * buckets
    ).cast("long")
    return (
        df.withColumn("_copies", copies)
        .where(F.col("_copies") >= 1)
        .withColumn("copy_id", F.explode(F.sequence(F.lit(1), F.col("_copies"))))
        .drop("_copies")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    part_cols: tuple[str, ...] = ("source",),
    shards: int = 8,
    salt: str = "pack-v1",
) -> DataFrame:
    """Concat-and-chunk sequence packing: stream documents in a
    deterministic order and cut the stream every ``budget`` tokens; a
    document belongs to the pack where it STARTS (the standard
    pre-tokenization packing for LLM training shards).

    Shape: docs are sharded by md5 (``shards`` per partition group) so
    the window sort parallelism is |part_cols groups| × shards, never
    one global sort; within a shard the order is md5-of-id (stable
    across runs and engines, independent of input row order). One
    shuffle (the window partition), cumulative sum, integer division.
    Adds ``shard``, ``pack_id`` (per shard), ``pack_offset`` (token
    offset where the doc starts inside its pack)."""
    from pyspark.sql import Window

    okey = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    shard = (
        F.conv(F.substring(okey, 1, 8), 16, 10).cast("long") % shards
    )
    out = df.withColumn("_okey", okey).withColumn("shard", shard)
    w = (
        Window.partitionBy(*part_cols, "shard")
        .orderBy("_okey", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    start = cum - F.col(token_col)
    return (
        out.withColumn("pack_id", F.floor(start / budget))
        .withColumn("pack_offset", start - F.col("pack_id") * budget)
        .drop("_okey")
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: tuple[str, ...],
    id_col: str,
    k: int,
    salt: str = "strat-v1",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen by md5 order
    — deterministic stratified sampling (eval-set carving, per-domain
    inspection samples).

    The window input is the NARROW (strata, id) projection — at scale
    you join the k·|strata| winners back to the payload instead of
    sorting wide rows; callers that need more columns than the keys do
    exactly that. Returns strata + id + ``sample_rank``."""
    from pyspark.sql import Window

    okey = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(*strata_cols).orderBy("_okey", id_col)
    return (
        df.select(*strata_cols, id_col)
        .withColumn("_okey", okey)
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
        .drop("_okey")
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


def dsir_scores(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    is_target,
    buckets: int = 256,
    salt: str = "dsir-v1",
    cache_registry: list | None = None,
) -> DataFrame:
    """DSIR-style importance scores (Xie et al. 2023, hashed-n-gram
    construction): per-document sum of log(p_target/p_raw) over
    hashed-unigram buckets, both distributions add-one-smoothed.

    ``is_target`` is a boolean Column marking the target population.
    Per-bucket log-ratios are fixed-pointed to ppm BIGINTs before the
    per-doc sum, so the score is an order-independent integer —
    hash-stable across engines and runs (the unigram_nll trick).

    Scale shape: the bucket table has ``buckets`` rows regardless of
    corpus size (always broadcastable); the token stream shuffles
    once for bucket counts (map-side partial agg) and once for the
    per-doc sum. Returns (id_col, n_tokens, lr_total_ppm)."""
    from etl_sprint_2_5_spark.functions.text import tokenize

    toks = docs.select(
        F.col(id_col),
        F.explode(tokenize(text_col)).alias("tok"),
        is_target.cast("int").alias("ist"),
    )
    bt = toks.select(
        id_col,
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(salt), F.col("tok"))), 1, 8),
                16,
                10,
            ).cast("long")
            % buckets
        ).alias("bucket"),
        "ist",
    )
    # cache: the bucket table is ``buckets`` rows by construction, but
    # it is consumed twice (the distribution totals and the log-ratio
    # projection) and each uncached consumer re-runs the full corpus
    # tokenize+hash pass that feeds it — 3 corpus passes where the
    # algorithm needs 2 (guide §5: fixed-size state, corpus-sized
    # recompute).
    # Lifecycle: appended to ``cache_registry`` when given so the
    # caller can unpersist after its final action (materialize_release)
    counts = bt.groupBy("bucket").agg(
        F.sum("ist").alias("t_c"),
        F.sum(F.lit(1) - F.col("ist")).alias("r_c"),
    ).cache()
    if cache_registry is not None:
        cache_registry.append(counts)
    consts = counts.agg(F.sum("t_c").alias("nt"), F.sum("r_c").alias("nr"))
    lr = counts.crossJoin(F.broadcast(consts)).select(
        "bucket",
        F.floor(
            (
                F.log((F.col("t_c") + 1) / (F.col("nt") + buckets).cast("double"))
                - F.log((F.col("r_c") + 1) / (F.col("nr") + buckets).cast("double"))
            )
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("lr_ppm"),
    )
    return (
        bt.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lr_ppm").alias("lr_total_ppm"),
        )
    )
