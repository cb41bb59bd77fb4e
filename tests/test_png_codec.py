"""Pure-stdlib PNG codec (operators/png_codec.py).

Three independent evidence classes — deliberately not just
encode→decode self-consistency (a convention bug shared by both halves
would cancel out):

1. HAND-BUILT byte streams: filtered scanlines written out by hand per
   the PNG spec (Sub/Up/Average/Paeth), with the expected unfiltered
   pixels computed by hand — the decoder is checked against the SPEC,
   not against our encoder.
2. REAL-WORLD PNGs from CPython's own tree (written by real encoders,
   using real filter mixes and palette/RGBA color types).
3. Roundtrip properties across shapes/color types, plus loud-failure
   cases (CRC corruption, truncation, unsupported features).
"""

from __future__ import annotations

import glob
import struct
import zlib

import numpy as np
import pytest

from etl_sprint_2_5_spark.operators.png_codec import png_decode, png_encode


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _hand_png(w, h, color, scanlines: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scanlines))
        + _chunk(b"IEND", b"")
    )


def test_sub_filter_against_spec():
    # grayscale 4x2; row0: filter 1 (Sub) raw deltas 10,5,5,5
    #   → unfiltered 10,15,20,25 (each adds the LEFT pixel)
    # row1: filter 1 raw 100,200,200,200 → 100,44,244,188 (mod 256)
    data = _hand_png(
        4, 2, 0,
        bytes([1, 10, 5, 5, 5]) + bytes([1, 100, 200, 200, 200]),
    )
    img = png_decode(data)
    assert img[:, :, 0].tolist() == [[10, 15, 20, 25], [100, 44, 244, 188]]


def test_up_filter_against_spec():
    # row0: filter 0 raw 1,2,3 → 1,2,3
    # row1: filter 2 (Up) raw 10,20,250 → 11,22,253 (adds row0)
    # row2: filter 2 raw 250,250,10 → 5,16,7 (mod 256)
    data = _hand_png(
        3, 3, 0,
        bytes([0, 1, 2, 3]) + bytes([2, 10, 20, 250])
        + bytes([2, 250, 250, 10]),
    )
    img = png_decode(data)
    assert img[:, :, 0].tolist() == [[1, 2, 3], [11, 22, 253], [5, 16, 7]]


def test_average_filter_against_spec():
    # row0: filter 0 → 10, 20
    # row1: filter 3 (Average) raw a,b:
    #   x0: pred = floor((0 + 10)/2) = 5  → 7+5   = 12
    #   x1: pred = floor((12 + 20)/2)=16  → 4+16  = 20
    data = _hand_png(2, 2, 0, bytes([0, 10, 20]) + bytes([3, 7, 4]))
    img = png_decode(data)
    assert img[:, :, 0].tolist() == [[10, 20], [12, 20]]


def test_paeth_filter_against_spec():
    # row0: filter 0 → 50, 100
    # row1: filter 4 (Paeth) raw r0,r1:
    #   x0: a=0, b=50, c=0  → p=50, pa=50 pb=0 pc=50 → pred=b=50; 3+50=53
    #   x1: a=53, b=100, c=50 → p=103, pa=50 pb=3 pc=53 → pred=b=100;
    #       9+100=109
    data = _hand_png(2, 2, 0, bytes([0, 50, 100]) + bytes([4, 3, 9]))
    img = png_decode(data)
    assert img[:, :, 0].tolist() == [[50, 100], [53, 109]]


def test_multichannel_sub_uses_pixel_stride():
    # RGB 2x1, filter 1: the "left" of channel k is the SAME channel
    # one pixel back (stride 3), not the adjacent byte
    data = _hand_png(2, 1, 2, bytes([1, 10, 20, 30, 1, 2, 3]))
    img = png_decode(data)
    assert img[0].tolist() == [[10, 20, 30], [11, 22, 33]]


_REAL_PNGS = sorted(
    glob.glob(
        "/root/.pyenv/versions/*/lib/python*/idlelib/Icons/idle_32.png"
    )
    + glob.glob(
        "/root/.pyenv/versions/*/lib/python*/test/test_email/data/python.png"
    )
)


@pytest.mark.skipif(not _REAL_PNGS, reason="no real-world PNGs on disk")
def test_real_world_pngs_decode():
    decoded = 0
    for p in _REAL_PNGS:
        try:
            img = png_decode(open(p, "rb").read())
        except ValueError as e:
            # the old 2.x/3.6-era idle icons are 16-bit — out of scope,
            # but the rejection must be the NAMED one, never garbage
            assert "unsupported" in str(e), (p, e)
            continue
        h, w, c = img.shape
        assert 1 <= w <= 4096 and 1 <= h <= 4096 and c in (1, 2, 3, 4)
        # re-encode of the decoded pixels must round-trip losslessly
        assert (png_decode(png_encode(img)) == img).all()
        decoded += 1
    assert decoded >= 3, "too few real-world PNGs actually decoded"


def test_roundtrip_shapes_and_types():
    rng = np.random.default_rng(7)
    for shape in [(1, 1), (5, 3), (8, 8, 1), (6, 9, 2), (7, 4, 3),
                  (10, 10, 4), (33, 17, 3)]:
        a = rng.integers(0, 256, size=shape, dtype=np.uint8)
        b = png_decode(png_encode(a))
        exp = a[:, :, None] if a.ndim == 2 else a
        assert b.shape == exp.shape and (b == exp).all()


def test_loud_failures():
    good = png_encode(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JFIF" + good)
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises((ValueError, zlib.error)):
        png_decode(bytes(corrupt))
    # 16-bit depth rejected by name
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    deep = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="depth"):
        png_decode(deep)


def test_multimodal_hook_decodes_png_for_real():
    from etl_sprint_2_5_spark.operators.multimodal import _decode_image_real

    a = np.zeros((12, 34, 3), np.uint8)
    w, h, c = _decode_image_real(png_encode(a))
    assert (w, h, c) == (34, 12, 3)
    # a JPEG signature now routes to the REAL jpeg codec (round 13),
    # which rejects this garbage as malformed — quarantine lane
    with pytest.raises(ValueError):
        _decode_image_real(b"\xff\xd8\xff\xe0 not a png")
    # a GIF signature now routes to the REAL gif codec (round 15),
    # which rejects this garbage as malformed — quarantine lane
    with pytest.raises(ValueError):
        _decode_image_real(b"GIF89a not supported")
    # signature-less payloads keep the deterministic-fake lane
    with pytest.raises(NotImplementedError):
        _decode_image_real(b"RIFFxxxxWEBP not supported")
