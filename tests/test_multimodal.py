"""Multimodal plumbing tests: schemas, Arrow batch shapes, determinism,
and modality routing — with the codec layer stubbed (deterministic
fakes; real hooks raise NotImplementedError by design)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_sprint_2_5_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def blobs(spark):
    rows = [
        ("b1", b"\xff\xd8\xff\xe0" + b"jpegdata" * 50),
        ("b2", b"\x89PNG\r\n\x1a\n" + b"pngdata" * 80),
        ("b3", b"RIFF\x24\x08\x00\x00WAVE" + b"\x00\x01" * 400),
        ("b4", b"\x00\x00\x00\x20ftypisom" + b"mp4data" * 200),
        ("b5", b"plain text payload, no magic"),
    ]
    return spark.createDataFrame(rows, "id string, payload binary").cache()


def test_blob_stats_and_mime_sniff(blobs):
    got = {r["id"]: r for r in M.attach_blob_stats(blobs, "payload").collect()}
    assert got["b1"]["sniffed_mime"] == "image/jpeg"
    assert got["b2"]["sniffed_mime"] == "image/png"
    assert got["b3"]["sniffed_mime"] == "audio/wav"
    assert got["b4"]["sniffed_mime"] == "video/mp4"
    assert got["b5"]["sniffed_mime"] == "application/octet-stream"
    for r in got.values():
        assert r["byte_len"] > 0 and len(r["blob_md5"]) == 32


def test_decode_schema_and_determinism(blobs):
    out = M.decode_images(blobs, "id", "payload")
    assert [f.name for f in out.schema.fields] == [
        "id", "width", "height", "channels", "decode_ok",
    ]
    a = {r["id"]: (r["width"], r["height"]) for r in out.collect()}
    b = {r["id"]: (r["width"], r["height"]) for r in out.collect()}
    assert a == b  # deterministic across recomputation
    assert all(16 <= w < 256 for w, _ in a.values() if w)
    # signature-less payloads fall back to the deterministic fake; a
    # blob CLAIMING a real-codec signature (PNG b2, JPEG b1 — both
    # codecs are REAL now) but failing to parse is quarantined loudly
    # as 'corrupt' (zero dims), never faked-plausible
    modes = {r["id"]: r["decode_ok"] for r in out.collect()}
    assert modes["b1"] == "corrupt"
    assert modes["b2"] == "corrupt"
    assert {m for i, m in modes.items() if i not in ("b1", "b2")} == {"fake"}


def test_real_hook_raises():
    # non-PNG formats still lack a codec in this container
    with pytest.raises(NotImplementedError):
        M._decode_image_real(b"anything")
    # PNG decodes for REAL (operators/png_codec.py)
    from etl_sprint_2_5_spark.operators.png_codec import png_encode
    import numpy as np

    w, h, c = M._decode_image_real(png_encode(np.zeros((3, 7), np.uint8)))
    assert (w, h, c) == (7, 3, 1)


def test_features_match_fake_vector(blobs):
    out = {r["id"]: r["features"] for r in
           M.extract_features(blobs, "id", "payload", dim=16).collect()}
    payloads = {r["id"]: bytes(r["payload"]) for r in blobs.collect()}
    for i, vec in out.items():
        assert len(vec) == 16
        expected = M._fake_vector(payloads[i], 16)
        assert all(abs(a - b) < 1e-6 for a, b in zip(vec, expected))


def test_resize_clamps_long_side(blobs):
    out = M.resize_images(blobs, "id", "payload", max_side=32).collect()
    for r in out:
        assert max(r["width"], r["height"]) <= 32
        assert isinstance(r["payload"], (bytes, bytearray))


def test_frame_sampling_expands_rows(spark):
    rows = [("v1", b"video-bytes-1", 3500), ("v2", b"video-bytes-2", 900)]
    df = spark.createDataFrame(rows, "id string, payload binary, duration_ms long")
    got = M.sample_frames(df, "id", "payload", "duration_ms", every_ms=1000).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["id"], []).append(r)
    assert len(by_id["v1"]) == 3  # 3500ms // 1000
    assert len(by_id["v2"]) == 1  # short clip still yields one frame
    assert [r["ts_ms"] for r in sorted(by_id["v1"], key=lambda r: r["frame_idx"])] == [0, 1000, 2000]
    # frame payload is the documented deterministic fake
    first = sorted(by_id["v1"], key=lambda r: r["frame_idx"])[0]
    assert bytes(first["payload"]) == hashlib.md5(
        b"video-bytes-1" + b":f0"
    ).digest()


def test_repartition_by_bytes_preserves_rows(blobs):
    out = M.repartition_by_bytes(blobs, "payload")
    assert out.count() == blobs.count()


def test_repartition_by_bytes_heavy_tail(spark):
    """Heavy-tailed sizes: no partition may carry more than
    target + max(blob) payload bytes (≤ 2×target here since every blob
    fits the target), and no rows are lost or duplicated."""
    import os

    target = 64 << 10
    # total ~7.6 MB >> n_buckets*target (2 MB) so the salted path (the
    # one carrying the strict bound) is exercised, not the fast path
    rows = [(f"small-{i}", os.urandom(7) * 147) for i in range(4000)]  # ~1 KB each
    rows += [(f"big-{i}", os.urandom(13) * 4736) for i in range(60)]  # ~60 KB each
    df = spark.createDataFrame(rows, "id string, payload binary")

    out = M.repartition_by_bytes(df, "payload", target_partition_bytes=target)
    per_part = (
        out.select(F.spark_partition_id().alias("pid"), F.length("payload").alias("b"))
        .groupBy("pid")
        .agg(F.sum("b").alias("bytes"))
        .collect()
    )
    assert sum(r["bytes"] for r in per_part) == sum(len(p) for _, p in rows)
    assert out.count() == len(rows)
    max_blob = max(len(p) for _, p in rows)
    assert max(r["bytes"] for r in per_part) <= target + max_blob
    assert len(per_part) > 1  # actually spread, not one fat partition
