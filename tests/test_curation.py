"""Curation operator unit tests (PII scrub, contamination, repetition)
on crafted rows — the registered queries' DuckDB oracles cover the
corpus-level rollups; these pin the row-level semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sprint_2_5_spark.operators.curation import (
    contamination_overlap,
    pii_scrub,
    repetition_stats,
)


def test_pii_scrub_redacts_and_counts(spark):
    rows = [
        ("d1", "write to alice.smith+x@corp.example.org today"),
        ("d2", "call +1 (555) 123-4567 or 020 7946 0958 now"),
        ("d3", "both a@b.co and +44 555 123 4567 here"),
        ("d4", "nothing sensitive"),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    got = {r["id"]: r for r in pii_scrub(df, "text", "id").collect()}
    assert got["d1"]["n_emails"] == 1 and got["d1"]["n_phones"] == 0
    assert "<EMAIL>" in got["d1"]["scrubbed"]
    assert "alice" not in got["d1"]["scrubbed"]
    assert got["d2"]["n_phones"] == 2 and "<PHONE>" in got["d2"]["scrubbed"]
    assert "4567" not in got["d2"]["scrubbed"]
    assert got["d3"]["n_emails"] == 1 and got["d3"]["n_phones"] == 1
    assert got["d4"]["n_emails"] == 0 and got["d4"]["n_phones"] == 0
    assert got["d4"]["scrubbed"] == "nothing sensitive"


def test_contamination_overlap_counts_shared_shingles(spark):
    bench = spark.createDataFrame(
        [("b1", "the quick brown fox jumps over the lazy dog")],
        "id string, text string",
    )
    corpus = spark.createDataFrame(
        [
            ("c1", "the quick brown fox went home"),  # shares 2 leading 3-grams
            ("c2", "completely different words entirely here"),
        ],
        "id string, text string",
    )
    got = {
        r["id"]: r
        for r in contamination_overlap(corpus, bench, "text", "id", n=3).collect()
    }
    assert got["c1"]["n_contaminated"] == 2  # 'the quick brown', 'quick brown fox'
    assert got["c2"]["n_contaminated"] == 0
    assert got["c2"]["n_shingles"] == 3


def test_repetition_stats_flags_boilerplate(spark):
    rows = [
        ("clean", "alpha beta. gamma delta. epsilon zeta"),
        ("spam", "buy now. buy now. buy now. unique bit"),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    got = {r["id"]: r for r in repetition_stats(df, "text", "id").collect()}
    assert got["clean"]["n_dup_lines"] == 0
    assert got["clean"]["dup_line_frac"] == 0.0
    assert got["spam"]["n_lines"] == 4 and got["spam"]["n_dup_lines"] == 2
    assert got["spam"]["dup_line_frac"] == 0.5
    assert got["spam"]["dup_char_frac"] > 0.4


def test_hash_split_deterministic_and_proportional(spark):
    from etl_sprint_2_5_spark.operators.curation import hash_split

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id", fr).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id", fr).collect()}
    assert a == b  # stable across runs
    # stable under corpus growth: the first 5000 keep their split
    bigger = spark.range(0, 8000).withColumnRenamed("id", "doc_id")
    c = {r["doc_id"]: r["split"] for r in hash_split(bigger, "doc_id", fr).collect()}
    assert all(c[k] == v for k, v in a.items())
    # proportions within a few percent at n=5000
    from collections import Counter

    counts = Counter(a.values())
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.03
    assert abs(counts["test"] / 5000 - 0.1) < 0.03
    # different salt reshuffles
    d = {
        r["doc_id"]: r["split"]
        for r in hash_split(df, "doc_id", fr, salt="other").collect()
    }
    assert d != a

    import pytest as _pytest

    with _pytest.raises(ValueError):
        hash_split(df, "doc_id", {"train": 0.5})
