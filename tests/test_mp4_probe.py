"""Pure-struct ISO-BMFF probe + the video probe stage."""

from __future__ import annotations

import struct

import pytest

from etl_sprint_2_5_spark.operators.mp4_probe import (
    mp4_build_minimal,
    mp4_probe,
)


def test_v0_and_v1_roundtrip():
    for ver, ts, dur in [(0, 600, 4231), (1, 90000, 2**33)]:
        info = mp4_probe(mp4_build_minimal("isom", ts, dur, version=ver))
        assert info["brand"] == "isom"
        assert (info["timescale"], info["duration"]) == (ts, dur)
        assert info["duration_ms"] == dur * 1000 // ts


def test_hand_laid_boxes_with_largesize():
    # moov wrapped in a 64-bit largesize header (size==1 + u64), mvhd
    # v0 laid out field-by-field per the spec — probe vs SPEC, not vs
    # our builder
    mvhd_body = (
        b"\x00\x00\x00\x00"
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", 1000, 2500)
        + b"\x00" * 80
    )
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = (
        struct.pack(">I", 1) + b"moov"
        + struct.pack(">Q", 16 + len(mvhd)) + mvhd
    )
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"mp42" + b"\x00" * 4
    info = mp4_probe(ftyp + moov)
    assert info == {
        "brand": "mp42", "timescale": 1000, "duration": 2500,
        "duration_ms": 2500,
    }


def test_loud_failures():
    good = mp4_build_minimal("isom", 600, 1200)
    with pytest.raises(ValueError, match="ftyp"):
        mp4_probe(b"\x00\x00\x00\x08free" + good)
    # box lying about its size
    bad = bytearray(good)
    bad[16:20] = struct.pack(">I", 10_000_000)  # moov size >> file
    with pytest.raises(ValueError, match="lies|truncated"):
        mp4_probe(bytes(bad))
    with pytest.raises(ValueError, match="moov"):
        mp4_probe(good[:16])  # ftyp only
    zero_ts = mp4_build_minimal("isom", 0, 100)
    with pytest.raises(ValueError, match="timescale"):
        mp4_probe(zero_ts)


def test_video_stage_modes(spark):
    from etl_sprint_2_5_spark.operators import multimodal as M

    rows = [
        ("ok", bytearray(mp4_build_minimal("isom", 600, 3000))),
        ("corrupt", bytearray(b"\x00\x00\x00\x10ftypisom\x00\x00\x00\x00")),
        ("other", bytearray(b"\x1aE\xdf\xa3 webm-ish")),
    ]
    df = spark.createDataFrame(rows, "id string, payload binary")
    got = {r["id"]: r for r in M.probe_video(df, "id", "payload").collect()}
    assert got["ok"]["decode_ok"] == "real"
    assert (got["ok"]["timescale"], got["ok"]["duration_ms"]) == (600, 5000)
    assert got["corrupt"]["decode_ok"] == "corrupt"
    assert got["corrupt"]["duration_ms"] == 0
    assert got["other"]["decode_ok"] == "fake"
