"""Unit tests for text expression helpers (tokenize/shingles/ngrams/minhash)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etl_sprint_2_5_spark.functions import text as T


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_tokenize_normalizes(spark):
    v = one(spark, T.tokenize(F.lit("Hello, World!!  foo-bar 42")))
    assert v == ["hello", "world", "foo", "bar", "42"]


def test_word_shingles_exact_count(spark):
    # k tokens, n=3 → k-2 shingles, each 3 consecutive words
    v = one(spark, T.word_shingles(F.lit("a b c d e"), n=3))
    assert v == ["a b c", "b c d", "c d e"]


def test_word_shingles_short_doc_whole_text(spark):
    assert one(spark, T.word_shingles(F.lit("a b"), n=3)) == ["a b"]
    assert one(spark, T.word_shingles(F.lit("solo"), n=3)) == ["solo"]


def test_word_shingles_n2(spark):
    assert one(spark, T.word_shingles(F.lit("x y z"), n=2)) == ["x y", "y z"]


def test_char_ngrams(spark):
    v = one(spark, T.char_ngrams(F.lit("abcde"), n=4))
    assert v == ["abcd", "bcde"]


def test_minhash_matches_python_md5(spark):
    # engine MinHash == min over python md5 of "seed:shingle"
    shingles = ["a b c", "b c d"]
    expected = min(hashlib.md5(f"7:{s}".encode()).hexdigest() for s in shingles)
    got = one(
        spark,
        T.minhash_hex(F.array(*[F.lit(s) for s in shingles]), seed=7),
    )
    assert got == expected


def test_hash_bucket_range_and_determinism(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(100)], ["x"])
    got = df.select(T.hash_bucket("x", seed=1, buckets=8).alias("b"))
    vals = [r["b"] for r in got.collect()]
    assert all(0 <= v < 8 for v in vals)
    again = [r["b"] for r in got.collect()]
    assert vals == again


def test_minhash_int_matches_python(spark):
    import hashlib

    from etl_sprint_2_5_spark.functions.text import MERSENNE31, MINHASH_PERMS

    shingles = ["a b c", "b c d", "x y z"]
    hs = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in shingles]
    a, b = MINHASH_PERMS[3]
    expected = min((a * (h % MERSENNE31) + b) % MERSENNE31 for h in hs)
    got = one(
        spark,
        T.minhash_int(
            T.shingle_hash64(F.array(*[F.lit(s) for s in shingles])), a, b
        ),
    )
    assert got == expected
