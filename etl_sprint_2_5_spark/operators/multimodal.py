"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode / feature-extract / resize / frame-sample as Arrow-batched
mapInPandas stages (training-data-pipeline extension surface; no
counterpart in the reference, which is text-only).

Design for 100 TB:

- payloads are ``binary`` columns carried NEXT TO typed metadata, so
  every filter/route/group decision (mime, size, dims, duration) is a
  JVM-side predicate on plain columns — the blob bytes only cross into
  Python for the decode/feature stages themselves;
- all Python stages are ``mapInPandas`` over Arrow record batches
  (one (de)serialization per batch, not per row), with explicit output
  schemas so the plan's shape is static;
- blob sizes are heavy-tailed ⇒ ``repartition_by_bytes`` salts large
  partitions by cumulative payload size before the Python stage, so
  one 4 GB video doesn't serialize behind 10k thumbnails on one task.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container.
Each decode stage calls a ``_decode_*_real`` hook that raises
NotImplementedError and falls back to a clearly-marked DETERMINISTIC
FAKE derived from the payload's md5 — the Spark-side plumbing (schema,
batch shape, partitioning, UDF signature) is real and tested; swapping
in the real codec touches only the hook body.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------- schema

BLOB_META = StructType(
    [
        StructField("modality", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("sample_rate", IntegerType()),
    ]
)


def attach_blob_stats(df: DataFrame, blob_col: str) -> DataFrame:
    """JVM-side payload stats: byte length, md5 fingerprint, and magic-
    byte mime sniff — no Python, usable as pushdown-able routing
    predicates before any decode."""
    b = F.col(blob_col)
    magic = F.hex(F.substring(b, 1, 4))
    mime = (
        F.when(magic.startswith("FFD8"), "image/jpeg")
        .when(magic == F.lit("89504E47"), "image/png")
        .when(magic == F.lit("52494646"), "audio/wav")  # RIFF
        .when(F.substring(b, 5, 4).cast("string") == "ftyp", "video/mp4")
        .otherwise("application/octet-stream")
    )
    return df.withColumn("byte_len", F.length(b)).withColumn(
        "blob_md5", F.md5(b)
    ).withColumn("sniffed_mime", mime)


def repartition_by_bytes(
    df: DataFrame, blob_col: str, target_partition_bytes: int = 128 << 20
) -> DataFrame:
    """Balance heavy-tailed payloads: shard rows so each partition
    carries ~target bytes (salt = running bytes ÷ target within a hash
    bucket). At local scale this is a plain repartition; the point is
    the plan survives a corpus where sizes span 6 orders of magnitude."""
    n = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    salt = (F.crc32(F.col(blob_col)) % n).alias("_salt")
    return df.repartition(n, salt)


# ------------------------------------------------------------- fakes/hooks


def _decode_image_real(payload: bytes) -> tuple[int, int, int]:
    """Real codec hook (PIL). Not available in this container."""
    raise NotImplementedError("image codec not installed — deterministic fake in use")


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    """DETERMINISTIC FAKE: dims derived from payload md5 (stable across
    runs/retries, so downstream goldens are exact)."""
    h = hashlib.md5(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240, 3


def _fake_vector(payload: bytes, dim: int) -> list[float]:
    """DETERMINISTIC FAKE feature vector: md5-counter expansion → floats
    in [-1, 1). Replaces the embedding model forward pass."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.md5(payload + counter.to_bytes(4, "big")).digest()
        out.extend(b / 127.5 - 1.0 for b in h)
        counter += 1
    return out[:dim]


# ---------------------------------------------------------------- stages

DECODED_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("decode_ok", StringType()),  # 'real' | 'fake'
    ]
)


def decode_images(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """Decode stage: (id, blob) → image dims. Arrow-batched; real hook
    first, deterministic fake on NotImplementedError."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[blob_col]):
                payload = bytes(payload)
                try:
                    w, h, c = _decode_image_real(payload)
                    mode = "real"
                except NotImplementedError:
                    w, h, c = _fake_dims(payload)
                    mode = "fake"
                rows.append((i, w, h, c, mode))
            yield pd.DataFrame(
                rows, columns=["id", "width", "height", "channels", "decode_ok"]
            )

    return df.select(id_col, blob_col).mapInPandas(run, DECODED_SCHEMA)


FEATURES_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_features(
    df: DataFrame, id_col: str, blob_col: str, dim: int = 16
) -> DataFrame:
    """Feature-extract stage: (id, blob) → fixed-dim float vector
    (the embedding-model stand-in; output schema matches the
    ``embeddings`` table's array<float> so downstream ANN operators
    compose directly)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "features": [
                        _fake_vector(bytes(p), dim) for p in pdf[blob_col]
                    ],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame, id_col: str, blob_col: str, max_side: int = 224
) -> DataFrame:
    """Resize stage: clamp the longer side to ``max_side`` preserving
    aspect; payload re-encode is the deterministic fake (md5 chain of
    the source payload + target dims)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[blob_col]):
                payload = bytes(payload)
                w, h, _ = _fake_dims(payload)
                scale = min(1.0, max_side / max(w, h))
                nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
                fake = hashlib.md5(payload + f":{nw}x{nh}".encode()).digest()
                rows.append((i, nw, nh, fake))
            yield pd.DataFrame(rows, columns=["id", "width", "height", "payload"])

    return df.select(id_col, blob_col).mapInPandas(run, RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    duration_ms_col: str,
    every_ms: int = 1000,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sample stage (video/audio): one output row per sampled
    timestamp — a row-expanding mapInPandas (the UDTF shape). Frame
    payloads are the deterministic fake."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload, dur in zip(
                pdf[id_col], pdf[blob_col], pdf[duration_ms_col]
            ):
                payload = bytes(payload)
                n = min(max_frames, max(1, int(dur) // every_ms))
                for k in range(n):
                    ts = k * every_ms
                    fake = hashlib.md5(payload + ts.to_bytes(8, "big")).digest()
                    rows.append((i, k, ts, fake))
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "ts_ms", "payload"])

    return df.select(id_col, blob_col, duration_ms_col).mapInPandas(
        run, FRAMES_SCHEMA
    )
