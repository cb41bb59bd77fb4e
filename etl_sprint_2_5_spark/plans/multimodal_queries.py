"""Multimodal extension queries over the documents table.

The container has no real media corpus, so payloads are the documents'
UTF-8 bytes treated as opaque blobs — which exercises exactly the same
plumbing (binary column, JVM-side stats, Arrow-batched Python decode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.operators import multimodal as M
from etl_sprint_2_5_spark.plans.registry import query
from etl_sprint_2_5_spark.sources.parquet import load_table


@query(
    "multimodal_blob_stats",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           md5(text) AS blob_md5
    FROM documents
    ORDER BY doc_id
    LIMIT 100
    """,
    covers=("X-multimodal-stats",),
)
def multimodal_blob_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side blob routing stats (byte length + content fingerprint)
    on binary payloads — the predicate layer that runs BEFORE any
    Python decode at corpus scale. md5 over utf-8 bytes is identical
    cross-engine."""
    d = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    stats = M.attach_blob_stats(d, "payload")
    return (
        stats.select("doc_id", "byte_len", "blob_md5")
        .orderBy("doc_id")
        .limit(100)
    )


# The deterministic fake codec is pure md5 arithmetic, so the oracle
# can reproduce it in SQL:
# - dims: first/second byte of md5(payload) → 16 + b % 240;
# - 16-dim feature vector: bytes of md5(payload || ':v0'), each mapped
#   b/127.5 - 1.0 and quantized to float32 (Spark stores array<float>);
# - feat_sq_norm: Spark's F.aggregate folds acc + x*x left-to-right
#   with a DOUBLE acc but a FLOAT multiply, so each term is
#   CAST(x*x AS REAL)::DOUBLE and the sum is written left-associative
#   in the same element order.
def _feat_sq_norm_sql() -> str:
    terms = []
    for i in range(16):
        x = f"CAST(('0x'||substr(fh, {2 * i + 1}, 2))::INT / 127.5 - 1.0 AS REAL)"
        terms.append(f"CAST({x} * {x} AS REAL)::DOUBLE")
    return " + ".join(["0.0", *terms])


@query(
    "multimodal_decode_features",
    oracle=f"""
    WITH hashed AS (
      SELECT CAST(doc_id AS VARCHAR) AS id,
             md5(text)               AS dh,
             md5(text || ':v0')      AS fh
      FROM documents
    )
    SELECT id,
           16 + ('0x'||substr(dh, 1, 2))::INT % 240 AS width,
           16 + ('0x'||substr(dh, 3, 2))::INT % 240 AS height,
           round({_feat_sq_norm_sql()}, 4)          AS feat_sq_norm
    FROM hashed
    ORDER BY id
    LIMIT 200
    """,
    covers=("X-multimodal-decode", "X-multimodal-features"),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal path: blob → Arrow-batched decode (stubbed codec,
    deterministic fake dims) → feature extraction (16-dim vector) →
    JVM-side aggregation of the result. The shape under test is the
    plan: binary never leaves the executors, Python sees Arrow batches,
    output schemas are static."""
    d = load_table(spark, "documents", sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    d = M.repartition_by_bytes(d, "payload")
    fused = M.decode_and_features(d, "doc_id", "payload", dim=16)
    return (
        fused
        .select(
            "id",
            "width",
            "height",
            F.round(
                F.aggregate(
                    "features", F.lit(0.0), lambda acc, x: acc + x * x
                ),
                4,
            ).alias("feat_sq_norm"),
        )
        .orderBy("id")
        .limit(200)
    )
