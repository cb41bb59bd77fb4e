"""Unit tests for dedup operators: LSH banding, in-bucket pair expansion,
SimHash, Arrow cosine."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.operators import dedup as D


def test_pairs_within_bucket(spark):
    df = spark.createDataFrame([(["a", "b", "c"],)], "ids: array<string>")
    got = df.select(D.pairs_within_bucket(F.col("ids")).alias("p")).first()["p"]
    pairs = [(r["id_a"], r["id_b"]) for r in got]
    assert pairs == [("a", "b"), ("a", "c"), ("b", "c")]


def test_pairs_within_bucket_singleton_empty(spark):
    df = spark.createDataFrame([(["a"],)], "ids: array<string>")
    assert df.select(D.pairs_within_bucket(F.col("ids")).alias("p")).first()["p"] == []


def _corpus(spark):
    # two near-identical docs + one unrelated
    rows = [
        ("d1", "the quick brown fox jumps over the lazy dog again and again"),
        ("d2", "the quick brown fox jumps over the lazy dog again and again today"),
        ("d3", "completely different content about spark catalyst optimizer internals"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_lsh_finds_near_dup_pair(spark):
    sh = D.hashed_shingle_sets(_corpus(spark), "text", "doc_id")
    signed = D.minhash_signature(sh, num_hashes=12)
    pairs = D.lsh_candidate_pairs(signed, "doc_id", num_hashes=12, rows_per_band=3)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert ("d1", "d2") in got
    assert ("d1", "d3") not in got and ("d2", "d3") not in got


def test_verify_jaccard_scores(spark):
    sh = D.hashed_shingle_sets(_corpus(spark), "text", "doc_id")
    pairs = spark.createDataFrame([("d1", "d2")], ["id_a", "id_b"])
    out = D.verify_jaccard(pairs, sh, "doc_id", threshold=0.5).collect()
    assert len(out) == 1 and out[0]["jaccard"] > 0.5


def test_max_bucket_cap_drops_degenerate_keys(spark):
    # 5 identical docs → every band bucket has 5 ids; cap of 4 kills all pairs
    rows = [(f"d{i}", "same text everywhere repeated tokens here") for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = D.hashed_shingle_sets(df, "text", "doc_id")
    signed = D.minhash_signature(sh, num_hashes=12)
    capped = D.lsh_candidate_pairs(
        signed, "doc_id", num_hashes=12, rows_per_band=3, max_bucket=4
    )
    assert capped.count() == 0


def test_cosine_pandas_matches_math(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0, 1.0], [1.0, 1.0, 0.0])], "a: array<double>, b: array<double>"
    )
    got = df.select(D.cosine_pandas("a", "b").alias("c")).first()["c"]
    assert math.isclose(got, 0.5, rel_tol=1e-9)


def test_connected_components_shapes(spark):
    """Chain, triangle, and isolated pair — labels are the component
    minimum; a chain needs multiple propagation rounds."""
    from etl_sprint_2_5_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (4, 5),      # chain 1-2-3-4-5
         (10, 11), (11, 12), (10, 12),        # triangle
         (20, 21)],                            # pair
        "id_a long, id_b long",
    )
    got = {r["id"]: r["label"] for r in connected_components(edges).collect()}
    assert {got[i] for i in (1, 2, 3, 4, 5)} == {1}
    assert {got[i] for i in (10, 11, 12)} == {10}
    assert got[20] == 20 and got[21] == 20
    assert len(got) == 10  # only nodes that appear in edges


def test_connected_components_paths_agree(spark):
    """The driver-side union-find (small-frontier path) and the
    distributed min-label loop (local_limit=0 forces it) must emit
    identical (id, label) sets."""
    from etl_sprint_2_5_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12),
         (20, 21), (30, 31), (31, 32), (33, 32), (33, 34)],
        "id_a long, id_b long",
    )
    local = {
        (r["id"], r["label"])
        for r in connected_components(edges).collect()
    }
    dist = {
        (r["id"], r["label"])
        for r in connected_components(edges, local_limit=0).collect()
    }
    assert local == dist and len(local) == 15


def test_connected_components_byte_gate_wide_ids(spark, monkeypatch):
    """Adversarial shape for the driver gate: FEW edges (passes the
    row-count check) but KILOBYTE string ids — the byte-aware gate
    must route to the distributed path instead of collecting MBs onto
    the driver, and the result must still be correct."""
    import etl_sprint_2_5_spark.operators.dedup as D

    wide = [(f"{chr(97 + i)}" * 2000, f"{chr(97 + i + 1)}" * 2000)
            for i in range(0, 6, 2)]  # aa..-bb.., cc..-dd.., ee..-ff..
    edges = spark.createDataFrame(wide, "id_a string, id_b string")

    def boom(*a, **k):
        raise AssertionError("driver union-find ran despite byte budget")

    monkeypatch.setattr(D, "_union_find_local", boom)
    got = {
        (r["id"][:1], r["label"][:1])
        for r in D.connected_components(
            edges, local_byte_limit=1024
        ).collect()
    }
    assert got == {("a", "a"), ("b", "a"), ("c", "c"), ("d", "c"),
                   ("e", "e"), ("f", "e")}

    # same edges under the default 64 MB budget take the driver path
    monkeypatch.undo()
    local = {
        (r["id"][:1], r["label"][:1])
        for r in D.connected_components(edges).collect()
    }
    assert local == got


def test_connected_components_star_parity(spark):
    """large-star/small-star (the adversarial-shape scale path) agrees
    with union-find on chains, triangles, stars, and singleton pairs —
    including a 12-node chain whose diameter stresses contraction."""
    from etl_sprint_2_5_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    chain = [(i, i + 1) for i in range(100, 112)]
    edges = spark.createDataFrame(
        chain
        + [(2, 1), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21),
           (50, 40), (50, 41), (50, 42), (50, 43)],
        "id_a long, id_b long",
    )
    uf = {
        (r["id"], r["label"]) for r in connected_components(edges).collect()
    }
    star = {
        (r["id"], r["label"])
        for r in connected_components_star(edges).collect()
    }
    assert star == uf


def test_capped_postings_drops_hot_shingles(spark):
    """A shingle in more docs than max_df is dropped; the rest survive."""
    rows = [("d1", 10), ("d2", 10), ("d3", 10), ("d1", 77), ("d2", 77)]
    occ = spark.createDataFrame(rows, "doc_id string, s long")
    kept = D.capped_postings(occ, "s", max_df=2)
    got = {(r["doc_id"], r["s"]) for r in kept.collect()}
    assert got == {("d1", 77), ("d2", 77)}  # df(10)=3 > 2 → dropped


def test_inverted_index_jaccard_hot_shingle_bounded(spark):
    """Adversarial hot-shingle fixture: 60 docs share one boilerplate
    shingle. Uncapped, that single posting expands C(60,2)=1770 pairs;
    with the cap active the posting is dropped and pair expansion is
    ZERO — while a genuine 3-copy near-dup group (df=3 ≤ cap) is still
    found. This is the skewed-shuffle guard the 100 TB shape needs."""
    boiler = "click here to accept all cookies"
    rows = [(i, f"{boiler} unique tail {i} alpha beta gamma delta") for i in range(60)]
    # three true near-dups sharing their whole text (no boilerplate)
    rows += [(100 + i, "the quick brown fox jumps over the lazy dog") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = D.hashed_shingle_sets(df, "text", "doc_id")

    capped = D.inverted_index_jaccard(sh, "doc_id", threshold=0.5, max_df=50)
    got = {(r["id_a"], r["id_b"], r["jaccard"]) for r in capped.collect()}
    assert got == {(100, 101, 1.0), (100, 102, 1.0), (101, 102, 1.0)}

    # sanity: uncapped, the boilerplate posting alone co-scores
    # C(60,2) pairs (all below threshold, but the expansion happened)
    sh2 = D.hashed_shingle_sets(df.where(F.col("doc_id") < 100), "text", "doc_id")
    occ = sh2.select("doc_id", F.explode("hs").alias("s"))
    uncapped_pairs = (
        D.capped_postings(occ, "s", max_df=10**9)
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > 50)
        .count()
    )
    assert uncapped_pairs >= 1  # the hot shingle really is hot


def test_inverted_index_jaccard_cap_changes_set_semantics(spark):
    """Sizes are counted over the CAPPED vocabulary: dropping a shared
    hot shingle removes it from numerator AND denominator, so a pair
    identical except for boilerplate still scores 1.0."""
    boiler = "standard legal disclaimer text here"
    rows = [
        (1, f"{boiler} alpha beta gamma delta epsilon"),
        (2, f"{boiler} alpha beta gamma delta epsilon"),
        (3, f"{boiler} totally different body content words"),
        (4, f"{boiler} yet another unrelated document body"),
        (5, f"{boiler} fifth doc so the boiler shingles cross the cap"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = D.hashed_shingle_sets(df, "text", "doc_id")
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.inverted_index_jaccard(
            sh, "doc_id", threshold=0.5, max_df=4
        ).collect()
    }
    assert out[(1, 2)] == 1.0  # identical bodies; boilerplate ignored
    assert all(k == (1, 2) for k in out)  # nothing else reaches 0.5


def test_simhash64_lo_word_equals_32bit_signature(spark):
    """simhash64's LO word votes on the same md5-prefix hash word as
    the 32-bit simhash(), so on every fixture document the LO word
    must equal the integer form of the 32-bit signature bit-for-bit
    (and the HI word must stay in [0, 2^32))."""
    from etl_sprint_2_5_spark.sources.parquet import load_documents_spread

    d = load_documents_spread(spark, "/root/testdata/sf0.001")
    s32 = {
        r["doc_id"]: r["s"]
        for r in D.simhash(d, "text", "doc_id")
        .select(
            "doc_id",
            F.conv(F.reverse(F.col("simhash")), 2, 10).cast("long").alias("s"),
        )
        .collect()
    }
    s64 = {
        r["doc_id"]: (r["sim_lo"], r["sim_hi"])
        for r in D.simhash64(d, "text", "doc_id").collect()
    }
    assert set(s32) == set(s64) and len(s32) > 0
    for doc_id, s in s32.items():
        lo, hi = s64[doc_id]
        assert lo == s, doc_id
        assert 0 <= hi < (1 << 32), doc_id


def test_simhash64_banded_pairing_equals_bruteforce(spark):
    """The 8-band bucketed pairing (simhash64_near_pairs) must find
    EXACTLY the pairs a brute-force all-pairs Hamming scan finds at
    threshold 3 — banding is a lossless candidate filter (3 < 8
    bands) and the bucket cap never fires on the fixture."""
    from etl_sprint_2_5_spark.plans import load_all
    from etl_sprint_2_5_spark.plans.registry import REGISTRY
    from etl_sprint_2_5_spark.sources.parquet import load_documents_spread

    load_all()
    sf = "/root/testdata/sf0.001"
    d = load_documents_spread(spark, sf)
    sigs = {
        r["doc_id"]: (r["sim_lo"], r["sim_hi"])
        for r in D.simhash64(d, "text", "doc_id").collect()
    }
    ids = sorted(sigs)
    want = {}
    for i, a in enumerate(ids):
        la, ha = sigs[a]
        for b in ids[i + 1 :]:
            lb, hb = sigs[b]
            ham = bin(la ^ lb).count("1") + bin(ha ^ hb).count("1")
            if ham <= 3:
                want[(a, b)] = ham
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in REGISTRY["simhash64_near_pairs"].fn(spark, sf).collect()
    }
    assert got == want
    assert len(want) > 0, "fixture should contain 64-bit near-dup pairs"


def test_bloom_membership_no_false_negatives_and_real_fps(spark):
    """Bloom guarantee: an exact duplicate can never be bloom-negative
    (zero false negatives, structurally). The filter is sized so the
    fixture exercises REAL false positives — otherwise the class
    column would be vacuous — and every class label must be
    consistent with its (bloom_hit, exact_hit) pair."""
    from etl_sprint_2_5_spark.plans import load_all
    from etl_sprint_2_5_spark.plans.registry import REGISTRY

    load_all()
    rows = (
        REGISTRY["bloom_membership_filter"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()
    )
    assert rows
    classes = {}
    for r in rows:
        assert not (r["exact_hit"] == 1 and r["bloom_hit"] == 0), (
            "false negative: %s" % r
        )
        want = (
            "true_positive"
            if r["bloom_hit"] == 1 and r["exact_hit"] == 1
            else "false_positive"
            if r["bloom_hit"] == 1
            else "true_negative"
        )
        assert r["class"] == want, r
        classes[r["class"]] = classes.get(r["class"], 0) + 1
    assert classes.get("false_positive", 0) >= 1, classes
    assert classes.get("true_negative", 0) >= 1, classes


def test_bloom_words_merge_across_corpus_splits(spark):
    """The word-table representation is mergeable: building the filter
    over two disjoint corpus halves and bit_or-merging the word rows
    must equal building it over the whole corpus — the property that
    lets corpus snapshots union without a rebuild."""
    from etl_sprint_2_5_spark.plans.dedup_queries import _BLOOM_K, _BLOOM_M
    from etl_sprint_2_5_spark.sources.parquet import load_documents_spread

    d = load_documents_spread(spark, "/root/testdata/sf0.001").select(
        "doc_id", F.md5("text").alias("h")
    )

    def words(df):
        pos = df.select(
            F.explode(
                F.array(*[
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.concat("h", F.lit(f":{i}"))), 1, 15
                            ),
                            16,
                            10,
                        ).cast("long")
                        % _BLOOM_M
                    )
                    for i in range(_BLOOM_K)
                ])
            ).alias("p")
        )
        return {
            r["word"]: r["mask"]
            for r in pos.groupBy((F.col("p") / 32).cast("long").alias("word"))
            .agg(
                F.bit_or(
                    F.expr("shiftleft(1L, cast(p % 32 as int))")
                ).alias("mask")
            )
            .collect()
        }

    whole = words(d)
    a = words(d.where(F.col("doc_id") % 2 == 0))
    b = words(d.where(F.col("doc_id") % 2 == 1))
    merged = dict(a)
    for w, m in b.items():
        merged[w] = merged.get(w, 0) | m
    assert merged == whole


def test_leakage_safe_split_no_cross_side_near_dups(spark):
    """The leakage guarantee: every verified near-dup pair must land
    on ONE side of the split — and the naive per-document hash split
    demonstrably leaks on the same fixture (so the operator is doing
    real work, not vacuously passing)."""
    from etl_sprint_2_5_spark.artifacts import prepared_shingle_index
    from etl_sprint_2_5_spark.operators.curation import hash_split
    from etl_sprint_2_5_spark.plans import load_all
    from etl_sprint_2_5_spark.plans.registry import REGISTRY
    from etl_sprint_2_5_spark.sources.parquet import load_documents_spread

    load_all()
    sf = "/root/testdata/sf0.01"
    split = {
        r["doc_id"]: r["split"]
        for r in REGISTRY["leakage_safe_split"].fn(spark, sf).collect()
    }
    sh = prepared_shingle_index(spark, sf)
    signed = D.minhash_signature(sh, num_hashes=12)
    pairs = D.lsh_candidate_pairs(signed, "doc_id", num_hashes=12, rows_per_band=3)
    verified = [
        (r["id_a"], r["id_b"])
        for r in D.verify_jaccard(pairs, sh, "doc_id", threshold=0.5).collect()
    ]
    assert len(verified) >= 10, "fixture should have near-dup pairs"
    assert all(split[a] == split[b] for a, b in verified)

    naive = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            load_documents_spread(spark, sf).select("doc_id"),
            "doc_id",
            {"train": 0.8, "val": 0.1, "test": 0.1},
        ).collect()
    }
    leaks = sum(1 for a, b in verified if naive[a] != naive[b])
    assert leaks > 0, "naive split did not leak — fixture too easy"


def test_keep_longest_agrees_with_clusters(spark):
    """dedup_keep_longest must partition exactly the dedup_clusters
    membership: same clusters, keeper is the member with max n_chars
    (id tiebreak), dropped = members minus keeper."""
    from etl_sprint_2_5_spark.plans import load_all
    from etl_sprint_2_5_spark.plans.registry import REGISTRY
    from etl_sprint_2_5_spark.sources.parquet import load_documents_spread

    load_all()
    sf = "/root/testdata/sf0.01"
    chars = {
        r["doc_id"]: r["n_chars"]
        for r in load_documents_spread(spark, sf)
        .select("doc_id", "n_chars")
        .collect()
    }
    clusters = {
        r["cluster_rep"]: [int(x) for x in r["members"].split(",")]
        for r in REGISTRY["dedup_clusters"].fn(spark, sf).collect()
    }
    got = {
        r["cluster_rep"]: r
        for r in REGISTRY["dedup_keep_longest"].fn(spark, sf).collect()
    }
    assert set(got) == set(clusters)
    for rep, members in clusters.items():
        r = got[rep]
        best = min(members, key=lambda i: (-chars[i], i))
        assert r["keeper"] == best
        assert r["keeper_chars"] == chars[best]
        dropped = sorted(set(members) - {best})
        assert r["n_dropped"] == len(dropped)
        assert [int(x) for x in r["dropped_ids"].split(",")] == dropped
    # the heuristic must differ from min-id somewhere, or it's vacuous
    assert any(got[rep]["keeper"] != rep for rep in got)


def test_srp_lsh_finds_exactly_the_twins(spark):
    """SRP-LSH at the 16x16 production point: the gated query must
    recover EXACTLY the deterministic twin pairs (cos ~0.999) the
    fixture augmentation plants — full recall through the banding,
    zero false positives past the 0.9 verify — and the band keys must
    be identical across two independent signature computations (the
    gemm is pure int64 arithmetic, no float path)."""
    from pyspark.sql import functions as F

    from etl_sprint_2_5_spark.operators.dedup import srp_band_keys
    from etl_sprint_2_5_spark.operators.quantize import quantize_embeddings
    from etl_sprint_2_5_spark.plans import REGISTRY, load_all
    from tests.conftest import SF_SMOKE

    load_all()
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    twin_ids = [
        r.vec_id for r in e.where(F.col("vec_id") % 50 == 0).collect()
    ]
    want = {(v, v + 1000000) for v in twin_ids}
    rows = REGISTRY["dedup_srp_lsh"].fn(spark, SF_SMOKE).collect()
    got = {(r.id_a, r.id_b) for r in rows}
    assert got == want, (sorted(got), sorted(want))
    assert all(r.cos >= 0.9 for r in rows)
    assert rows and rows[0].n_candidates >= len(want)

    q8 = quantize_embeddings(
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("v")),
        "vec_id",
        "v",
    )
    k1 = sorted(map(repr, srp_band_keys(q8, "vec_id", "qvec").collect()))
    k2 = sorted(map(repr, srp_band_keys(q8, "vec_id", "qvec").collect()))
    assert k1 == k2


def test_embedding_near_dups_max_block_cap(spark):
    """The within-block quadratic is structurally bounded: a block
    over max_block raises IN-TASK naming the block and the cap
    (default), or is dropped wholesale under on_oversize='drop' —
    never silently truncated."""
    from etl_sprint_2_5_spark.operators.dedup import embedding_near_dups

    rows = [(i, [1.0, float(i % 3)], "big") for i in range(6)]
    rows += [(10, [1.0, 0.0], "ok"), (11, [2.0, 0.0], "ok")]
    df = spark.createDataFrame(
        rows, "id long, vec array<double>, blk string"
    )

    # binding cap + error (default): loud, names block and cap
    with pytest.raises(Exception) as ei:
        embedding_near_dups(
            df, "id", "vec", "blk", threshold=0.0, max_block=5
        ).collect()
    msg = str(ei.value)
    assert "max_block=5" in msg and "'big'" in msg

    # drop: oversize block vanishes, bounded block still pairs
    got = embedding_near_dups(
        df, "id", "vec", "blk", threshold=0.0, max_block=5,
        on_oversize="drop",
    ).collect()
    assert [(r.id_a, r.id_b, r.cos) for r in got] == [(10, 11, 1.0)]

    # non-binding cap: identical to uncapped
    base = embedding_near_dups(df, "id", "vec", "blk", threshold=0.0)
    capped = embedding_near_dups(
        df, "id", "vec", "blk", threshold=0.0, max_block=6
    )
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, capped.collect())
    )

    with pytest.raises(ValueError):
        embedding_near_dups(
            df, "id", "vec", "blk", threshold=0.0, on_oversize="maybe"
        )
