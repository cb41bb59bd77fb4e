"""Product-quantization tests: recall of the ADC candidate stage
against brute-force ground truth, bit-equality of the prepared
artifact vs inline training, code-range invariants, and the
exactness claims the oracle relies on (integer codebook, integer ADC
scores, float-free candidate cut)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.operators.pq import (
    PQ_DSUB,
    PQ_K,
    PQ_M,
    adc_topc,
    encode_pq,
    quantize_np,
    train_pq_codebook,
)
from etl_sprint_2_5_spark.operators.quantize import quantize_embeddings
from etl_sprint_2_5_spark.operators.similarity import brute_force_topk
from tests.conftest import SF_SMOKE

K = 5
N_QUERIES = 8


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .cache()
    )


@pytest.fixture(scope="module")
def q8(corpus):
    return quantize_embeddings(corpus, "vec_id", "embedding").select(
        "vec_id", "qvec"
    ).cache()


@pytest.fixture(scope="module")
def codebook(q8):
    return train_pq_codebook(q8, "vec_id", "qvec").cache()


def test_quantize_np_matches_column_expression(corpus, q8):
    rows = corpus.join(q8, "vec_id").orderBy("vec_id").limit(50).collect()
    X = np.array([r["embedding"] for r in rows], dtype="float64")
    expect = np.array([r["qvec"] for r in rows], dtype="int64")
    assert (quantize_np(X) == expect).all()


def test_codebook_shape_and_integer_components(codebook):
    rows = codebook.collect()
    assert {r["m"] for r in rows} == set(range(PQ_M))
    for r in rows:
        assert 0 <= r["code"] < PQ_K
        assert len(r["cv"]) == PQ_DSUB
        assert all(isinstance(v, int) for v in r["cv"])
        assert all(abs(v) <= 127 for v in r["cv"])  # means of int8 values


def test_codes_in_codebook_and_total_coverage(q8, codebook):
    codes = encode_pq(q8, codebook, "vec_id", "qvec")
    n_vec = q8.count()
    assert codes.count() == n_vec
    exploded = codes.select("vec_id", F.posexplode("codes").alias("m", "code"))
    assert exploded.count() == n_vec * PQ_M
    # every emitted (m, code) exists in the codebook
    orphans = exploded.join(codebook, ["m", "code"], "left_anti")
    assert orphans.count() == 0


def test_adc_recall_against_bruteforce(corpus, q8, codebook):
    queries = corpus.orderBy("vec_id").limit(N_QUERIES)
    truth = brute_force_topk(corpus, queries, "vec_id", "embedding", K)
    truth_pairs = {(r["query_id"], r["neighbor_id"]) for r in truth.collect()}

    codes = encode_pq(q8, codebook, "vec_id", "qvec")
    qq8 = q8.where(F.col("vec_id") < N_QUERIES)
    cand = adc_topc(codes, codebook, qq8, "vec_id", "qvec", 40)
    cand_pairs = {(r["query_id"], r["neighbor_id"]) for r in cand.collect()}

    # the 8x-k ADC pool must contain most true top-k neighbors —
    # a coarse 8-codes-per-vector sketch on a 64-dim corpus
    recall = len(truth_pairs & cand_pairs) / len(truth_pairs)
    assert recall >= 0.5, f"ADC pool recall@{K} = {recall:.2f}"


def test_adc_scores_are_exact_code_dots(q8, codebook):
    """The BIGINT ADC score of (query, neighbor) must equal the
    integer dot of the query's int8 vector with the neighbor's
    RECONSTRUCTION (its codebook entries concatenated) — the defining
    ADC identity, checked end-to-end through the operators."""
    codes = encode_pq(q8, codebook, "vec_id", "qvec")
    qq8 = q8.where(F.col("vec_id") < 2)
    cand = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in adc_topc(codes, codebook, qq8, "vec_id", "qvec", 10).collect()
    }
    cb = {(r["m"], r["code"]): np.array(r["cv"]) for r in codebook.collect()}
    code_rows = {r["vec_id"]: r["codes"] for r in codes.collect()}
    qvecs = {r["vec_id"]: np.array(r["qvec"], dtype="int64") for r in qq8.collect()}
    for (qid, nid), score in cand.items():
        recon = np.concatenate([cb[(m, code_rows[nid][m])] for m in range(PQ_M)])
        assert score == int(qvecs[qid] @ recon)


def test_prepared_artifact_bit_identical_to_inline(spark, tmp_path, monkeypatch):
    from etl_sprint_2_5_spark import artifacts

    monkeypatch.setenv(artifacts.ARTIFACT_DIR_ENV, str(tmp_path))
    cb_a, codes_a = artifacts.prepared_pq_index(spark, SF_SMOKE)
    cb_i, codes_i = artifacts.prepared_pq_index(spark, SF_SMOKE, use_artifact=False)

    def snap_cb(df):
        return sorted(
            (r["m"], r["code"], tuple(r["cv"])) for r in df.collect()
        )

    def snap_codes(df):
        return sorted((r["vec_id"], tuple(r["codes"])) for r in df.collect())

    assert snap_cb(cb_a) == snap_cb(cb_i)
    assert snap_codes(codes_a) == snap_codes(codes_i)
    # second call must hit the persisted artifact (no retrain)
    cb_b, _ = artifacts.prepared_pq_index(spark, SF_SMOKE)
    assert snap_cb(cb_b) == snap_cb(cb_a)


def test_ivfpq_respects_probe_cells(spark):
    """Every IVFPQ result must come from one of its query's nprobe=2
    probe cells (the cell restriction is the point of the index), and
    each query returns a full top-k."""
    from etl_sprint_2_5_spark.artifacts import prepared_ivf_centroids
    from etl_sprint_2_5_spark.operators.similarity import assign_cells_gemm
    from etl_sprint_2_5_spark.plans import load_all
    from etl_sprint_2_5_spark.plans.registry import REGISTRY

    load_all()
    out = REGISTRY["ann_ivfpq_topk"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 8 * 5

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    cent = prepared_ivf_centroids(spark, SF_SMOKE)
    cells = {
        r["vec_id"]: r["centroid_id"]
        for r in assign_cells_gemm(e, cent, "vec_id", "embedding").collect()
    }
    probes: dict[int, set] = {}
    for r in assign_cells_gemm(
        e.where(F.col("vec_id") < 8), cent, "vec_id", "embedding", nprobe=2
    ).collect():
        probes.setdefault(r["vec_id"], set()).add(r["centroid_id"])
    for r in out:
        assert cells[r["neighbor_id"]] in probes[r["query_id"]]
