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


def _sampled(**kw):
    from etl_sprint_2_5_spark.operators.mp4_probe import mp4_build_sampled

    args = dict(
        brand="isom",
        timescale=600,
        durs=[100] * 4 + [150] * 4,
        sizes=[16, 17, 18, 19, 20, 21, 22, 23],
        chunking=[3, 2, 2, 1],
        sync=[0, 4],
        payload=lambda i: bytes([i + 1]) * (16 + i),
        chunk_pad=b"PPPP",
    )
    args.update(kw)
    return mp4_build_sampled(**args)


def test_sample_table_walk_against_builder():
    """stts expansion (two runs), stsc 3-then-2 plan with a SHORT
    last chunk, per-sample stsz, pad-separated stco offsets, stss
    sync flags — and extraction at the absolute offsets returns the
    exact payload bytes."""
    from etl_sprint_2_5_spark.operators.mp4_probe import mp4_sample_table

    data = _sampled()
    st = mp4_sample_table(data)
    assert st["timescale"] == 600
    s = st["samples"]
    assert [r[0] for r in s] == list(range(8))
    assert [r[1] for r in s] == [0, 100, 200, 300, 400, 550, 700, 850]
    assert [r[2] for r in s] == [100] * 4 + [150] * 4
    assert [r[4] for r in s] == [0, 0, 0, 1, 1, 2, 2, 3]  # chunks
    assert [r[6] for r in s] == [True, False, False, False,
                                 True, False, False, False]
    for i, _, _, size, _, off, _ in s:
        assert data[off:off + size] == bytes([i + 1]) * size
    # offsets skip the 4-byte pad before every chunk
    assert s[3][5] - (s[2][5] + s[2][3]) == 4


def test_sample_table_v1_and_no_stss():
    """mdhd v1 parses; absent stss ⇒ every sample is a sync sample."""
    from etl_sprint_2_5_spark.operators.mp4_probe import mp4_sample_table

    st = mp4_sample_table(_sampled(version=1, sync=None))
    assert all(r[6] for r in st["samples"])
    assert st["timescale"] == 600


def test_sample_table_co64_matches_stco():
    """co64 (64-bit chunk offsets) yields the identical sample rows
    up to the constant moov-size shift — extraction still lands on
    the exact payload bytes."""
    from etl_sprint_2_5_spark.operators.mp4_probe import mp4_sample_table

    a = _sampled()
    b = _sampled(use_co64=True)
    sa = mp4_sample_table(a)["samples"]
    sb = mp4_sample_table(b)["samples"]
    assert [r[:5] + (r[6],) for r in sa] == [r[:5] + (r[6],) for r in sb]
    shift = sb[0][5] - sa[0][5]
    assert shift == 4 * 4  # four chunks × 4 extra bytes per offset
    assert all(rb[5] - ra[5] == shift for ra, rb in zip(sa, sb))
    for i, _, _, size, _, off, _ in sb:
        assert b[off:off + size] == bytes([i + 1]) * size


def test_sample_table_malformed_quarantines():
    from etl_sprint_2_5_spark.operators.mp4_probe import mp4_sample_table

    good = _sampled()

    # stsz count lies (says 9 samples, stts covers 8)
    stsz_at = good.find(b"stsz")
    bad = bytearray(good)
    bad[stsz_at + 12:stsz_at + 16] = struct.pack(">I", 9)
    with pytest.raises(ValueError):
        mp4_sample_table(bytes(bad))

    # last sample overruns the file
    with pytest.raises(ValueError, match="overruns"):
        mp4_sample_table(good[:-4])

    # stsc first_chunk not ascending
    stsc_at = good.find(b"stsc")
    bad = bytearray(good)
    bad[stsc_at + 12:stsc_at + 16] = struct.pack(">I", 7)
    with pytest.raises(ValueError, match="ascending"):
        mp4_sample_table(bytes(bad))


def test_video_sample_table_stage_lanes(spark):
    """The stage routes: real BMFF → per-sample rows with extracted
    byte sums; non-BMFF → deterministic fake; corrupt BMFF →
    quarantined single row."""
    from etl_sprint_2_5_spark.operators.multimodal import (
        video_sample_table,
    )

    good = _sampled()
    df = spark.createDataFrame(
        [("ok", bytearray(good)),
         ("webm", bytearray(b"\x1aE\xdf\xa3 not bmff")),
         ("bad", bytearray(good[:40]))],
        "id string, payload binary",
    )
    out = video_sample_table(df, "id", "payload").collect()
    by = {}
    for r in out:
        by.setdefault(r.id, []).append(r)
    assert len(by["ok"]) == 8
    assert all(r.decode_ok == "real" for r in by["ok"])
    assert [r.byte_sum for r in sorted(by["ok"], key=lambda r: r.sample_i)] \
        == [(i + 1) * (16 + i) for i in range(8)]
    assert all(r.decode_ok == "fake" for r in by["webm"])
    assert len(by["webm"]) == 3
    assert [r.decode_ok for r in by["bad"]] == ["corrupt"]
    assert by["bad"][0].sample_i == -1
