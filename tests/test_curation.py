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


def test_weighted_sample_properties(spark):
    from etl_sprint_2_5_spark.operators.curation import weighted_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(2000)], ["id", "dom"]
    )
    rate = F.when(F.col("dom") == "a", 2.5).otherwise(0.25)
    out = weighted_sample(df, "id", rate).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["dom"], []).append((r["id"], r["copy_id"]))
    # upsampled domain: every doc present at least twice, some thrice
    a_copies = {}
    for i, c in by_dom["a"]:
        a_copies[i] = max(a_copies.get(i, 0), c)
    assert set(a_copies.values()) <= {2, 3}
    assert len(a_copies) == 1000  # no doc dropped at rate 2.5
    frac3 = sum(1 for v in a_copies.values() if v == 3) / 1000
    assert abs(frac3 - 0.5) < 0.06
    # downsampled domain: ~25% kept, single copies
    b_ids = {i for i, c in by_dom["b"]}
    assert all(c == 1 for _, c in by_dom["b"])
    assert abs(len(b_ids) / 1000 - 0.25) < 0.06
    # determinism across runs
    again = weighted_sample(df, "id", rate).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_pack_sequences_properties(spark):
    from etl_sprint_2_5_spark.operators.curation import pack_sequences

    rows = [(i, "s", 10 + (i * 7) % 90) for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "source", "tok"])
    out = pack_sequences(df, "id", "tok", budget=256, shards=4).collect()
    assert len(out) == 500
    for r in out:
        # a doc STARTS inside its pack's budget window
        assert 0 <= r["pack_offset"] < 256
        assert r["pack_id"] >= 0
        assert 0 <= r["shard"] < 4
    # packs are dense per shard: ids 0..max with no gaps
    per_shard = {}
    for r in out:
        per_shard.setdefault(r["shard"], set()).add(r["pack_id"])
    for ids in per_shard.values():
        assert ids == set(range(max(ids) + 1))


def test_stratified_sample_exact_k(spark):
    from etl_sprint_2_5_spark.operators.curation import stratified_sample

    rows = [(i, f"g{i % 7}") for i in range(200)] + [(1000, "tiny")]
    df = spark.createDataFrame(rows, ["id", "g"])
    out = stratified_sample(df, ("g",), "id", k=5).collect()
    per_g = {}
    for r in out:
        per_g.setdefault(r["g"], []).append(r["sample_rank"])
    for g, ranks in per_g.items():
        want = 1 if g == "tiny" else 5
        assert sorted(ranks) == list(range(1, want + 1))
    # deterministic: same ids both runs
    again = stratified_sample(df, ("g",), "id", k=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_corpus_shuffle_shards_is_a_partition(spark):
    """Epoch shuffle output must be a true partition of the corpus:
    every doc exactly once, per-shard positions contiguous from 1,
    and shard sizes balanced within the md5-uniformity bound."""
    from pyspark.sql import functions as F

    from etl_sprint_2_5_spark.plans import load_all
    from etl_sprint_2_5_spark.plans.registry import REGISTRY
    from tests.conftest import SF_SMOKE

    load_all()
    out = REGISTRY["corpus_shuffle_shards"].fn(spark, SF_SMOKE).cache()
    n = out.count()
    assert out.select("doc_id").distinct().count() == n
    per_shard = out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
        F.countDistinct("pos").alias("npos"),
    )
    rows = per_shard.collect()
    assert len(rows) == 8
    for r in rows:
        assert (r["lo"], r["hi"], r["npos"]) == (1, r["n"], r["n"])
    sizes = sorted(r["n"] for r in rows)
    assert sizes[0] >= n // 8 - int(4 * (n / 8) ** 0.5) - 1
    assert sizes[-1] <= n // 8 + int(4 * (n / 8) ** 0.5) + 1
    out.unpersist()


def test_dsir_scores_detect_distribution_shift(spark):
    """On a corpus with REAL signal (the parquet fixture is uniform
    word soup, where selection is correctly hash-noise), DSIR must
    rank raw docs drawn from the target vocabulary above raw docs
    from a disjoint vocabulary — the entire point of importance
    resampling."""
    from pyspark.sql import functions as F

    from etl_sprint_2_5_spark.operators.curation import dsir_scores

    a_vocab = [f"alpha{i}" for i in range(30)]
    b_vocab = [f"beta{i}" for i in range(30)]

    def doc(vocab, seed, n=40):
        return " ".join(vocab[(seed * 7 + k * 13) % len(vocab)] for k in range(n))

    rows = []
    for i in range(20):  # target: pure A-vocabulary
        rows.append((i, "target", doc(a_vocab, i)))
    for i in range(20, 40):  # raw, in-distribution
        rows.append((i, "raw_a", doc(a_vocab, i)))
    for i in range(40, 60):  # raw, out-of-distribution
        rows.append((i, "raw_b", doc(b_vocab, i)))
    d = spark.createDataFrame(rows, "doc_id long, grp string, text string")
    scored = dsir_scores(d, "text", "doc_id", F.col("grp") == "target").join(
        d.select("doc_id", "grp"), "doc_id"
    )
    rowsc = {r["doc_id"]: (r["grp"], r["lr_total_ppm"]) for r in scored.collect()}
    a_scores = [v for g, v in rowsc.values() if g == "raw_a"]
    b_scores = [v for g, v in rowsc.values() if g == "raw_b"]
    assert min(a_scores) > max(b_scores), (
        "in-distribution raw docs must strictly outrank out-of-distribution"
    )


def test_training_shard_pipeline_dedup_fires_and_packs_bound(spark, tmp_path):
    """The composed shard pipeline on a CRAFTED corpus: permuted
    bag-of-words duplicates must collapse to one representative
    (the fixture corpus has no exact dups, so this is where the
    dedup stage is proven live), the split stage must follow the
    salted-md5 rule exactly, and pack token totals must respect the
    2048 budget up to one straddling document."""
    import hashlib

    from etl_sprint_2_5_spark.plans import load_all
    from etl_sprint_2_5_spark.plans.registry import REGISTRY
    from tests.conftest import SF_SMOKE

    load_all()
    rows = []
    for pair in range(5):
        words = [f"w{pair}x{i}" for i in range(25)]  # per-pair vocabulary
        rows.append((2 * pair, " ".join(words), "en", "src0", 100))
        rows.append(
            (2 * pair + 1, " ".join(reversed(words)), "en", "src0", 100)
        )
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")

    out = REGISTRY["training_shard_pipeline"].fn(spark, str(tmp_path)).collect()

    def in_train(doc_id: int) -> bool:
        h = hashlib.md5(f"split-v1{doc_id}".encode()).hexdigest()
        return int(h[:8], 16) % 10000 < 8000

    reps = [i for i in range(0, 10, 2)]  # dedup keeps the even (lower) ids
    expected_docs = sum(1 for i in reps if in_train(i))
    assert sum(r["n_docs"] for r in out) == expected_docs
    assert sum(r["n_tokens"] for r in out) == 25 * expected_docs
    assert all(r["pack_id"] == 0 for r in out)  # far below one budget

    # fixture corpus: packs contiguous per shard, totals bounded by
    # budget + one straddling doc (max fixture doc is 99 tokens)
    real = REGISTRY["training_shard_pipeline"].fn(spark, SF_SMOKE).collect()
    by_shard = {}
    for r in real:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, packs in by_shard.items():
        ids = [p["pack_id"] for p in packs]
        assert ids == list(range(len(ids))), f"shard {shard} gaps: {ids}"
        for p in packs[:-1]:  # all but the trailing partial pack
            assert p["n_tokens"] <= 2048 + 99


def test_dsir_scores_partition_invariant(spark):
    """The ppm fixed-point makes per-doc scores integer sums, so they
    must be bit-identical regardless of how the token stream is
    partitioned — the property that makes the oracle hash gate safe
    on a distributed engine."""
    from pyspark.sql import functions as F

    from etl_sprint_2_5_spark.operators.curation import dsir_scores
    from etl_sprint_2_5_spark.sources.parquet import load_table
    from tests.conftest import SF_SMOKE

    d = load_table(spark, "documents", SF_SMOKE)
    base = {
        r["doc_id"]: (r["n_tokens"], r["lr_total_ppm"])
        for r in dsir_scores(
            d, "text", "doc_id", F.col("source") == "src0"
        ).collect()
    }
    skewed = {
        r["doc_id"]: (r["n_tokens"], r["lr_total_ppm"])
        for r in dsir_scores(
            d.repartition(7, "lang"), "text", "doc_id", F.col("source") == "src0"
        ).collect()
    }
    assert base == skewed
