"""Randomized (seeded, deterministic) property tests for the round-5
operators, over ARBITRARY inputs rather than the fixture corpus:

- _simhash_band_pairs banding is a lossless candidate filter for any
  signature population (32-bit/<=1 and 64-bit two-word/<=3);
- the repeated-substring coverage-union window arithmetic equals an
  interval-union witness for any duplicated-position set.
"""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_band_pairs_lossless_on_random_signatures(spark):
    """1000 random 64-bit signatures (two 32-bit words), including
    planted near-dup pairs at Hamming 0-3 and decoys at 4-6: the
    banded pairing must return EXACTLY the brute-force pairs with
    Hamming <= 3."""
    from etl_sprint_2_5_spark.plans.dedup_queries import _simhash_band_pairs

    rng = random.Random(20260814)
    sigs = {}
    for i in range(700):
        sigs[i] = (rng.getrandbits(32), rng.getrandbits(32))
    next_id = 700
    # planted pairs: flip h in {0..6} random bits of an existing sig
    for h in range(7):
        for _ in range(20):
            base_id = rng.randrange(700)
            lo, hi = sigs[base_id]
            for _bit in range(h):
                b = rng.randrange(64)
                if b < 32:
                    lo ^= 1 << b
                else:
                    hi ^= 1 << (b - 32)
            sigs[next_id] = (lo, hi)
            next_id += 1

    df = spark.createDataFrame(
        [(i, lo, hi) for i, (lo, hi) in sorted(sigs.items())],
        "doc_id long, lo long, hi long",
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in _simhash_band_pairs(df, ("lo", "hi"), 3).collect()
    }
    ids = sorted(sigs)
    want = {}
    for x, a in enumerate(ids):
        la, ha = sigs[a]
        for b in ids[x + 1 :]:
            lb, hb = sigs[b]
            ham = bin(la ^ lb).count("1") + bin(ha ^ hb).count("1")
            if ham <= 3:
                want[(a, b)] = ham
    assert got == want
    assert len(want) >= 40  # the planted pairs actually landed


def test_band_pairs_lossless_single_word(spark):
    """Same property for the 32-bit/<=1 configuration the registered
    simhash_near_pairs query runs."""
    from etl_sprint_2_5_spark.plans.dedup_queries import _simhash_band_pairs

    rng = random.Random(7)
    sigs = {i: rng.getrandbits(32) for i in range(500)}
    for i in range(500, 560):
        s = sigs[rng.randrange(500)]
        if i % 2:
            s ^= 1 << rng.randrange(32)
        sigs[i] = s
    df = spark.createDataFrame(
        sorted(sigs.items()), "doc_id long, s long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in _simhash_band_pairs(df, ("s",), 1).collect()
    }
    ids = sorted(sigs)
    want = {}
    for x, a in enumerate(ids):
        for b in ids[x + 1 :]:
            ham = bin(sigs[a] ^ sigs[b]).count("1")
            if ham <= 1:
                want[(a, b)] = ham
    assert got == want and len(want) >= 20


def test_coverage_union_window_equals_interval_union(spark):
    """The gaps-and-islands coverage sweep used by
    dedup_repeated_substrings: for random duplicated-position sets,
    sum(newly) per doc must equal the exact union of [p, p+K-1]
    intervals."""
    K = 15
    rng = random.Random(99)
    rows, want = [], {}
    for doc in range(200):
        n_pos = rng.randrange(0, 12)
        pos = sorted(rng.sample(range(60), n_pos)) if n_pos else []
        covered = set()
        for p in pos:
            covered.update(range(p, p + K))
        want[doc] = len(covered)
        rows += [(doc, p) for p in pos]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, pos int")
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    end = F.col("pos") + F.lit(K - 1)
    prev_end = F.max(F.col("pos") + F.lit(K - 1)).over(w)
    newly = F.greatest(
        F.lit(0),
        end - F.greatest(F.coalesce(prev_end, F.lit(-1)), F.col("pos") - 1),
    )
    got = {
        r["doc_id"]: r["covered"]
        for r in df.select("doc_id", newly.alias("n"))
        .groupBy("doc_id")
        .agg(F.sum("n").cast("long").alias("covered"))
        .collect()
    }
    for doc, cov in want.items():
        assert got.get(doc, 0) == cov, doc


def test_agg_delta_equals_recompute_on_random_mutations(spark):
    """Randomized (seeded) aggregate-IVM equivalence: for arbitrary
    base tables and arbitrary mutation batches (group moves, measure
    changes, both, and no-op rewrites), state + agg_delta(changes) ==
    from-scratch aggregate over the mutated base — including groups
    that empty out (must vanish) and brand-new groups."""
    import random

    from etl_sprint_2_5_spark.streaming.ivm import agg_delta, merge_agg_state

    rng = random.Random(20260814)
    for trial in range(3):
        buckets = [f"b{i}" for i in range(rng.randint(2, 6))]
        rows = [
            (i, rng.choice(buckets), rng.randint(-50, 500))
            for i in range(rng.randint(20, 120))
        ]
        base = spark.createDataFrame(rows, "id long, bucket string, cents long")
        state = base.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").cast("long").alias("cents"),
        )
        # mutate a random subset: new bucket (possibly brand-new or
        # same), new measure (possibly identical)
        changed_ids = {i for i, _, _ in rows if rng.random() < 0.4}
        new_buckets = buckets + ["fresh"]
        mutated = {
            i: (rng.choice(new_buckets), rng.randint(-50, 500))
            for i in changed_ids
        }
        old = spark.createDataFrame(
            [(b, c) for i, b, c in rows if i in changed_ids],
            "bucket string, cents long",
        )
        new = spark.createDataFrame(
            [mutated[i] for i in sorted(changed_ids)],
            "bucket string, cents long",
        )
        maintained = merge_agg_state(
            state, agg_delta(old, new, ["bucket"], ["cents"]), ["bucket"], ["cents"]
        )
        final_rows = [
            (i, *mutated[i]) if i in changed_ids else (i, b, c)
            for i, b, c in rows
        ]
        want = (
            spark.createDataFrame(final_rows, "id long, bucket string, cents long")
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("cents").cast("long").alias("cents"),
            )
        )
        got = {(r.bucket, r.n_rows, r.cents) for r in maintained.collect()}
        exp = {(r.bucket, r.n_rows, r.cents) for r in want.collect()}
        assert got == exp, f"trial {trial}: {got ^ exp}"
