"""Similarity search over embedding columns — BASELINE.json extension.

Two strategies:

- brute-force top-k: exact cosine of Q query vectors (broadcast)
  against the full corpus, per-query top-k by partitioned row_number.
  Cost O(Q·N) — the correctness baseline and fine when Q is small.
- IVF (inverted file): a fixed set of centroid vectors partitions the
  corpus into cells (one broadcast join at build); a query probes
  only its nearest cell(s). Cost O(Q·C + Q·N/C) — the scale path:
  at 100 TB the cell assignment is a write-time partitioning column
  and probing prunes partitions instead of scanning the corpus.

Determinism contract (shared with the DuckDB oracle): ranking uses
round(cos, 6) DESC with the candidate id as tiebreak, so ordering
never depends on sub-round float noise. Scoring is the Arrow-batched
``cosine_pandas`` (numpy over whole batches — ~10× the interpreted
expression fold per pair); its summation-order jitter vs the oracle's
in-order fold is < 1 ulp, absorbed by the round(6) contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.operators.dedup import cosine_pandas


def round6_col(c):
    """round(x, 6) HALF_UP on the BINARY double, as a column expression:
    sign(x)·floor(|x|·1e6 + 0.5)/1e6 — pure IEEE ops, bit-identical to
    the numpy ``_round_half_up6`` the gemm paths use. Spark's
    ``F.round`` instead rounds the shortest DECIMAL repr (BigDecimal
    HALF_UP), which disagrees with the binary rule exactly when a
    value's shortest repr lands on a 6-decimal halfway point — the ties
    the round(6) contract exists to pin. One formula, every path."""
    return F.signum(c) * F.floor(F.abs(c) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Exact top-k neighbors per query vector (self excluded).

    queries is broadcast (small side); the corpus is never shuffled —
    scoring is map-side, only the per-query top-k ranking shuffles on
    query_id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            round6_col(cosine_pandas("_qv", "_cv")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def brute_force_topk_gemm(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """brute_force_topk with the two scale levers applied (property-
    tested equal output):

    - scoring is one V·Qᵀ gemm per Arrow batch (queries ride the task
      closure — they are small by contract, same size bound as the
      broadcast in the pairwise variant);
    - PARTIAL top-k: each batch emits only its own top-k rows per
      query, so the ranking shuffle carries (N/batch)·Q·k rows instead
      of N·Q — the distributed-top-k pattern that keeps the final
      window trivial at any corpus size.

    Same determinism contract (round(cos,6) DESC, neighbor_id ASC);
    the per-batch cut uses the identical ordering, so the global
    winners are exactly the pairwise variant's winners."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import DoubleType, StructField, StructType

    qrows = sorted(queries.select(id_col, vec_col).collect(), key=lambda r: r[id_col])
    qids = [r[id_col] for r in qrows]
    Q = np.array([r[vec_col] for r in qrows], dtype="float64")
    qnorm = np.sqrt((Q * Q).sum(1))

    narrow = corpus.select(id_col, vec_col)
    id_type = narrow.schema[id_col].dataType
    schema = StructType(
        [
            StructField("query_id", id_type),
            StructField("neighbor_id", id_type),
            StructField("cos", DoubleType()),
        ]
    )

    def part(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf[vec_col].values).astype("float64")
            vnorm = np.sqrt((V * V).sum(1))
            sim = _round_half_up6((V @ Q.T) / np.outer(vnorm, qnorm))
            nids = pdf[id_col].values
            out = []
            for j, qid in enumerate(qids):
                keep = nids != qid
                order = np.lexsort((nids[keep], -sim[keep, j]))[:k]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": nids[keep][order],
                            "cos": sim[keep, j][order],
                        }
                    )
                )
            yield pd.concat(out)

    partial = narrow.mapInPandas(part, schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    nprobe: int = 1,
) -> DataFrame:
    """IVF assignment via one broadcast join + per-vector top-nprobe
    ranking (round(cos,6) DESC, centroid_id ASC tiebreak).

    Corpus vectors use nprobe=1 (each lives in exactly one cell);
    QUERY vectors use nprobe>1 for multi-probe search — a query row
    per candidate cell, trading nprobe× probe work for recall on
    vectors near cell boundaries (the standard IVF recall lever)."""
    cent = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("_cev")
    )
    scored = corpus.join(F.broadcast(cent)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("centroid_id"),
        round6_col(cosine_pandas(F.col(vec_col), F.col("_cev"))).alias("_cc"),
    )
    if nprobe == 1:
        # top-1 as a partial-aggregating min(struct): map-side combine
        # collapses the C candidate rows per vector BEFORE the shuffle
        # (the window variant sorts the whole corpus×C expansion).
        # min of (-cc, centroid_id, vec) == (cc DESC, centroid_id ASC);
        # centroid_id is unique per group so the vec field never
        # participates in the comparison.
        packed = scored.groupBy(id_col).agg(
            F.min(
                F.struct(
                    (-F.col("_cc")).alias("nc"),
                    F.col("centroid_id").alias("cid"),
                    F.col(vec_col).alias("v"),
                )
            ).alias("_m")
        )
        return packed.select(
            F.col(id_col),
            F.col("_m.v").alias(vec_col),
            F.col("_m.cid").alias("centroid_id"),
        )
    w = Window.partitionBy(id_col).orderBy(F.desc("_cc"), F.asc("centroid_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= nprobe)
        .select(id_col, vec_col, "centroid_id")
    )


def assign_cells_gemm(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    nprobe: int = 1,
) -> DataFrame:
    """IVF assignment as ONE Arrow gemm pass — no row expansion, no
    shuffle. Produces exactly what assign_cells produces (property-
    tested equal): the centroid matrix is tiny by construction (it
    rode the broadcast join in the pairwise variant), so it ships in
    the task closure; each Arrow batch computes all batch×C cosines as
    a single V·Cᵀ matmul and takes the per-row argmax (or stable-sorted
    top-nprobe).

    Same determinism contract: cosine rounded to 6 HALF_UP, ties break
    to the smallest centroid_id (columns sorted by id + first-max /
    stable sort). Replaces a C×-row broadcast-join expansion PLUS a
    min-struct shuffle with zero shuffles — at 100 TB the corpus is
    scanned once and nothing moves."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import StructField, StructType

    rows = sorted(centroids.select(id_col, vec_col).collect(), key=lambda r: r[id_col])
    cids = np.array([r[id_col] for r in rows])
    C = np.array([r[vec_col] for r in rows], dtype="float64")
    cnorm = np.sqrt((C * C).sum(1))

    narrow = corpus.select(id_col, vec_col)
    schema = StructType(
        list(narrow.schema.fields)
        + [StructField("centroid_id", narrow.schema[id_col].dataType)]
    )

    def part(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf[vec_col].values).astype("float64")
            vnorm = np.sqrt((V * V).sum(1))
            sim = _round_half_up6((V @ C.T) / np.outer(vnorm, cnorm))
            if nprobe == 1:
                sel = np.argmax(sim, axis=1)  # first max == smallest cid
                out = pdf[[id_col, vec_col]].copy()
                out["centroid_id"] = cids[sel]
                yield out
            else:
                order = np.argsort(-sim, axis=1, kind="stable")[:, :nprobe]
                reps = []
                for j in range(order.shape[1]):
                    o = pdf[[id_col, vec_col]].copy()
                    o["centroid_id"] = cids[order[:, j]]
                    reps.append(o)
                yield pd.concat(reps)

    return narrow.mapInPandas(part, schema)


def _round_half_up6(x):
    """round(x, 6) with HALF_UP ties — matches Spark's BigDecimal
    ROUND and DuckDB's round(), unlike numpy's half-even."""
    import numpy as np

    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


def _train_numpy(rows, vec_key, init_rows, id_key, iters):
    """Driver-side Lloyd — bit-compatible with the distributed path:
    cosine rounded to 6 (HALF_UP), first-max == smallest centroid id
    tie-break (columns pre-sorted by id), means rounded to 6. Seed
    vectors come from the init rows themselves (their ids need not
    exist in the corpus — e.g. label-keyed seeds)."""
    import numpy as np

    V = np.array([r[vec_key] for r in rows], dtype="float64")
    vnorm = np.sqrt((V * V).sum(1))
    init_sorted = sorted(init_rows, key=lambda r: r[id_key])
    cids = [r[id_key] for r in init_sorted]
    C = np.array([r[vec_key] for r in init_sorted], dtype="float64")
    for _ in range(iters):
        cnorm = np.sqrt((C * C).sum(1))
        sim = _round_half_up6((V @ C.T) / np.outer(vnorm, cnorm))
        cell = np.argmax(sim, axis=1)  # first max == smallest cid
        keep, newc = [], []
        for j, cid in enumerate(cids):
            members = V[cell == j]
            if len(members):
                keep.append(cid)
                newc.append(_round_half_up6(members.mean(axis=0)))
        cids, C = keep, np.array(newc, dtype="float64")
    return cids, C


def train_ivf_centroids(
    corpus: DataFrame,
    init_centroids: DataFrame,
    id_col: str,
    vec_col: str,
    iters: int = 2,
    driver_limit: int = 200_000,
) -> DataFrame:
    """Deterministic Lloyd (k-means) refinement of the IVF centroids.

    Init comes from FIXED corpus rows (the mod-key seeds), so there is
    no RNG anywhere; each iteration re-assigns by the same
    round(cos,6)+id rule as search and recomputes every centroid as
    the element-wise mean of its members, ROUNDED TO 6 DECIMALS — the
    rounding pins the trained centroids to values the DuckDB oracle's
    unrolled-CTE mirror reproduces exactly, so assignment boundaries
    cannot drift between engines.

    Shapes at scale: assignment is the broadcast join of
    ``assign_cells``; the mean is posexplode → (cell, pos) partial-agg
    — both shuffle O(corpus·dim) ints/doubles, no all-pairs anywhere.
    Cells that lose all members drop out (standard k-means dying-cell
    behavior, mirrored identically in the oracle).

    Execution: corpora up to ``driver_limit`` vectors train DRIVER-SIDE
    in numpy (the faiss convention — IVF training is a sample-bounded
    offline step; 200k × 768 doubles ≈ 1.2 GB is the practical driver
    ceiling, and Spark-job latency would dominate below that). Larger
    corpora fall back to the distributed Lloyd below, which computes
    the identical rounded values (property-tested equal). Either way
    the result is a small LOCAL DataFrame: centroids are tiny, and
    chaining the training plan under every downstream assignment would
    re-execute the Lloyd subtree per consumer and blow up plan depth."""
    probe = corpus.select(
        F.col(id_col), F.col(vec_col)
    ).limit(driver_limit + 1).collect()
    if len(probe) <= driver_limit:
        init_rows = init_centroids.select(id_col, vec_col).collect()
        cids, C = _train_numpy(probe, vec_col, init_rows, id_col, iters)
        from pyspark.sql.types import (
            ArrayType,
            DoubleType,
            StructField,
            StructType,
        )

        schema = StructType(
            [
                StructField(id_col, init_centroids.schema[id_col].dataType),
                StructField(vec_col, ArrayType(DoubleType())),
            ]
        )
        return corpus.sparkSession.createDataFrame(
            [(c, [float(x) for x in vec]) for c, vec in zip(cids, C)], schema
        )

    cent = init_centroids.select(id_col, vec_col)
    for _ in range(iters):
        assigned = assign_cells(corpus, cent, id_col, vec_col)
        cent = (
            assigned.select(
                "centroid_id", F.posexplode(F.col(vec_col)).alias("pos", "v")
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg("v").alias("v"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "v"))),
                    lambda s: round6_col(s["v"]),
                ).alias(vec_col)
            )
            .select(F.col("centroid_id").alias(id_col), vec_col)
        )
    schema = cent.schema
    return corpus.sparkSession.createDataFrame(cent.collect(), schema)


def ivf_topk(
    corpus_cells: DataFrame,
    queries_cells: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """IVF probe: per query, search only vectors sharing its cell.

    Both sides carry a ``centroid_id`` column from assign_cells; the
    join key is the cell — at scale this is a partition-pruned scan,
    not a corpus pass."""
    q = queries_cells.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        "centroid_id",
    )
    c = corpus_cells.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        "centroid_id",
    )
    scored = (
        c.join(F.broadcast(q), "centroid_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            round6_col(cosine_pandas("_qv", "_cv")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
