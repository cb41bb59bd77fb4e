"""Product Quantization (PQ) over int8-quantized embeddings — the
classic 100 TB vector-index compression (Jégou, Douze, Schmid 2011:
"Product Quantization for Nearest Neighbor Search").

The vector is split into M contiguous subspaces; each subspace gets a
tiny codebook (K entries) trained by one deterministic Lloyd round;
every corpus vector is stored as M small codes. Here M=8 subspaces of
8 dims with K=16 codes: a 64-dim vector becomes 8 codes — the index
the ADC scan reads is ~8 bytes/vector instead of 256 (float32) — the
32× bandwidth/memory lever that lets one executor hold a billion
vectors' worth of index.

Engine-exactness design (the reason this PQ runs over the int8
quantization from operators/quantize.py rather than raw floats):

- input vectors are the EXACT int8 codes (floor(x·scale+0.5) — pure
  IEEE, reproduced bit-for-bit by the DuckDB oracle);
- encode/train distances are INTEGER squared L2 (BIGINT sums of
  (a-b)² over 8-long int vectors — no float anywhere);
- the Lloyd-round centroid update is the floored integer mean
  floor(sum/count) (double division of ints far below 2^53 is
  correctly rounded, so its floor equals the true floor in every
  engine);
- the ADC candidate score is a BIGINT sum of per-subspace integer
  dot products (query quantized with the same quantizer — the
  symmetric variant, which keeps the whole candidate stage
  order-independent integer arithmetic);
- only the final re-rank of the small candidate pool touches floats,
  under the repo-wide round(cos,6)+id contract.

So unlike the IVF family (pinned via round-6 floats), the PQ index,
codes, and candidate cut are BIT-exact across engines by
construction.

Scale shapes: training is one mapInPandas partial-sums pass (each
Arrow batch emits at most M·K·DSUB partial rows — the shuffle carries
O(partitions·M·K·DSUB) rows, independent of corpus size) + one tiny
agg; encode is one stateless mapInPandas pass with the codebook in
the task closure; the ADC scan reads ONLY (vec_id, codes) and emits a
per-batch partial top-C, so the ranking shuffle carries
(N/batch)·Q·C rows. Nothing is ever all-pairs and no stage moves
full vectors except the bounded final re-rank join.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

PQ_M = 8  # subspaces
PQ_DSUB = 8  # dims per subspace (M * DSUB = 64, the fixture dim)
PQ_K = 16  # codebook entries per subspace
PQ_SEED_MOD = 7  # seeds: first PQ_K vec_ids with vec_id % MOD == REM
PQ_SEED_REM = 3


def quantize_np(X: np.ndarray) -> np.ndarray:
    """The int8 quantizer as numpy — IEEE-identical to
    operators/quantize.py's column expression and the DuckDB oracle:
    q_i = floor(x_i · (127/max|x|) + 0.5), int64."""
    X = X.astype("float64")
    scale = 127.0 / np.abs(X).max(axis=1, keepdims=True)
    return np.floor(X * scale + 0.5).astype("int64")


def _sq_dists(V: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Integer squared-L2 between each row of V (B×DSUB) and each row
    of C (K×DSUB): exact int64 (values bounded by 8·254² < 2^20)."""
    # (v-c)² expanded keeps everything integer matmul-shaped.
    v2 = (V * V).sum(axis=1, keepdims=True)
    c2 = (C * C).sum(axis=1, keepdims=True).T
    return v2 + c2 - 2 * (V @ C.T)


def pq_seed_codebook(q8: DataFrame, id_col: str, qcol: str) -> np.ndarray:
    """Initial codebook: the subvectors of the first PQ_K corpus rows
    with id % PQ_SEED_MOD == PQ_SEED_REM (fixed corpus rows — no RNG,
    mirrored verbatim by the oracle's seed CTE). Returns (M, K, DSUB)
    int64. Bounded collect: PQ_K rows."""
    rows = (
        q8.where(F.col(id_col) % PQ_SEED_MOD == PQ_SEED_REM)
        .orderBy(id_col)
        .limit(PQ_K)
        .select(qcol)
        .collect()
    )
    S = np.array([r[qcol] for r in rows], dtype="int64")  # (K, M*DSUB)
    return np.stack(
        [S[:, m * PQ_DSUB : (m + 1) * PQ_DSUB] for m in range(PQ_M)]
    )  # (M, K, DSUB)


def train_pq_codebook(q8: DataFrame, id_col: str, qcol: str) -> DataFrame:
    """One deterministic Lloyd round: assign every (vector, subspace)
    to its nearest seed (integer squared L2, smallest code on ties),
    then replace each codebook entry with the floored integer mean of
    its members. Codes that lose every member drop out (standard
    dying-cell behavior, mirrored by the oracle).

    Distributed shape: the assignment+partial-sum pass emits at most
    M·K·(DSUB+1) rows per Arrow batch — component sums and counts —
    so the only shuffle is a tiny map-side-combinable agg; the final
    collect is ≤ M·K·DSUB rows regardless of corpus size.

    Returns DataFrame(m int, code int, cv array<bigint>).
    """
    C0 = pq_seed_codebook(q8, id_col, qcol)
    spark = q8.sparkSession

    part_schema = StructType(
        [
            StructField("m", IntegerType()),
            StructField("code", IntegerType()),
            StructField("i", IntegerType()),
            StructField("s", LongType()),
            StructField("n", LongType()),
        ]
    )

    def partial_sums(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf[qcol].values).astype("int64")
            out_m, out_code, out_i, out_s, out_n = [], [], [], [], []
            for m in range(PQ_M):
                Vm = V[:, m * PQ_DSUB : (m + 1) * PQ_DSUB]
                sel = np.argmin(_sq_dists(Vm, C0[m]), axis=1)  # first min = low code
                for code in np.unique(sel):
                    members = Vm[sel == code]
                    sums = members.sum(axis=0)
                    out_m.extend([m] * PQ_DSUB)
                    out_code.extend([int(code)] * PQ_DSUB)
                    out_i.extend(range(PQ_DSUB))
                    out_s.extend(int(x) for x in sums)
                    out_n.extend([len(members)] * PQ_DSUB)
            yield pd.DataFrame(
                {"m": out_m, "code": out_code, "i": out_i, "s": out_s, "n": out_n}
            )

    agg = (
        q8.select(qcol)
        .mapInPandas(partial_sums, part_schema)
        .groupBy("m", "code", "i")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .collect()
    )  # bounded: ≤ M·K·DSUB rows by construction

    cb: dict[tuple[int, int], list[int]] = {}
    for r in agg:
        cv = cb.setdefault((r["m"], r["code"]), [0] * PQ_DSUB)
        # floored integer mean — int(//) matches floor(double-div) exactly
        cv[r["i"]] = int(r["s"] // r["n"])
    schema = StructType(
        [
            StructField("m", IntegerType()),
            StructField("code", IntegerType()),
            StructField("cv", ArrayType(LongType())),
        ]
    )
    rows = [(m, code, cb[(m, code)]) for (m, code) in sorted(cb)]
    return spark.createDataFrame(rows, schema)


def _codebook_np(codebook: DataFrame) -> tuple[np.ndarray, np.ndarray, list]:
    """Collect the (tiny) codebook into per-subspace arrays. Handles
    dropped codes: returns (M, K_m≤K) via padded arrays + code maps."""
    rows = codebook.select("m", "code", "cv").collect()
    per_m: dict[int, list] = {}
    for r in rows:
        per_m.setdefault(r["m"], []).append((r["code"], r["cv"]))
    mats, codes = [], []
    for m in range(PQ_M):
        entries = sorted(per_m.get(m, []))
        codes.append(np.array([c for c, _ in entries], dtype="int64"))
        mats.append(np.array([v for _, v in entries], dtype="int64"))
    return mats, codes, rows


def encode_pq(q8: DataFrame, codebook: DataFrame, id_col: str, qcol: str) -> DataFrame:
    """Encode every vector as M codes against the trained codebook
    (nearest by integer squared L2, smallest code on ties). One
    stateless mapInPandas pass, codebook in the task closure; output
    is the compressed index: (id, codes array<int>)."""
    mats, codes, _ = _codebook_np(codebook)
    id_type = q8.schema[id_col].dataType
    schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("codes", ArrayType(IntegerType())),
        ]
    )

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf[qcol].values).astype("int64")
            out = np.empty((len(V), PQ_M), dtype="int64")
            for m in range(PQ_M):
                Vm = V[:, m * PQ_DSUB : (m + 1) * PQ_DSUB]
                sel = np.argmin(_sq_dists(Vm, mats[m]), axis=1)
                out[:, m] = codes[m][sel]
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "codes": list(out.astype("int32"))}
            )

    return q8.select(id_col, qcol).mapInPandas(enc, schema)


def adc_topc(
    codes_df: DataFrame,
    codebook: DataFrame,
    query_q8: DataFrame,
    id_col: str,
    qcol: str,
    c: int,
    query_cells: dict | None = None,
) -> DataFrame:
    """Symmetric ADC candidate scan: per query, a (M, K) BIGINT lookup
    table of subspace dot products query·codebook-entry; each corpus
    vector's approximate score is the sum of its M table entries —
    the scan touches ONLY the codes column. Per-batch partial top-C
    (score DESC, id ASC) keeps the ranking shuffle at
    (N/batch)·Q·C rows. Returns (query_id, neighbor_id, score).

    ``query_cells`` ({query_id: iterable of centroid ids}) enables the
    IVFPQ composition: codes_df must then carry a ``centroid_id``
    column and each query scores ONLY vectors in its probe cells — at
    100 TB the cell is a write-time partition and the restriction is
    partition pruning, not a filter."""
    mats, codeids, _ = _codebook_np(codebook)
    qrows = sorted(
        query_q8.select(id_col, qcol).collect(), key=lambda r: r[id_col]
    )
    qids = [r[id_col] for r in qrows]
    if not qids:
        # degenerate: no queries → empty result, not a pd.concat([]) crash
        spark = codes_df.sparkSession
        id_type = codes_df.schema[id_col].dataType
        empty_schema = StructType(
            [
                StructField("query_id", id_type),
                StructField("neighbor_id", id_type),
                StructField("score", LongType()),
            ]
        )
        return spark.createDataFrame([], empty_schema)
    Q = np.array([r[qcol] for r in qrows], dtype="int64")  # (Qn, M*DSUB)
    # LUT[m]: (Qn, K_m) — dense code index via searchsorted over codeids[m]
    luts = []
    for m in range(PQ_M):
        Qm = Q[:, m * PQ_DSUB : (m + 1) * PQ_DSUB]
        luts.append(Qm @ mats[m].T)

    id_type = codes_df.schema[id_col].dataType
    schema = StructType(
        [
            StructField("query_id", id_type),
            StructField("neighbor_id", id_type),
            StructField("score", LongType()),
        ]
    )

    cell_sets = (
        {qid: np.array(sorted(cells)) for qid, cells in query_cells.items()}
        if query_cells is not None
        else None
    )

    def scan(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            Ccodes = np.stack(pdf["codes"].values).astype("int64")  # (B, M)
            nids = pdf[id_col].values
            cells = pdf["centroid_id"].values if cell_sets is not None else None
            score = np.zeros((len(Ccodes), len(qids)), dtype="int64")
            for m in range(PQ_M):
                # map stored code -> dense row in mats[m]
                dense = np.searchsorted(codeids[m], Ccodes[:, m])
                score += luts[m].T[dense]  # (B, Qn)
            out = []
            for j, qid in enumerate(qids):
                keep = nids != qid
                if cell_sets is not None:
                    # a query id without probe cells scores nothing
                    # (not a KeyError mid-executor)
                    keep &= np.isin(
                        cells, cell_sets.get(qid, np.empty(0, dtype=cells.dtype))
                    )
                order = np.lexsort((nids[keep], -score[keep, j]))[:c]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": nids[keep][order],
                            "score": score[keep, j][order],
                        }
                    )
                )
            yield pd.concat(out)

    narrow_cols = [id_col, "codes"] + (
        ["centroid_id"] if query_cells is not None else []
    )
    partial = codes_df.select(*narrow_cols).mapInPandas(scan, schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        partial.withColumn("crank", F.row_number().over(w))
        .where(F.col("crank") <= c)
        .select("query_id", "neighbor_id", "score")
    )
