"""Baseline JPEG codec (operators/jpeg_codec.py) against the T.81
spec and real-world files — the round-13 closure of the largest
remaining fake-codec surface (PNG went real in round 12).

Pins: hand-computed Huffman/EXTEND decisions against the spec tables;
bit-exact round-trip of block-flat images at quality=100 (the
closed-form property the gated query rides); bounded error on
arbitrary images; 4:2:0 vs 4:4:4; grayscale; odd (crop-path) dims;
restart-marker decode; CPython's own shipped JPEGs; loud failures
(corrupt → ValueError, lossless SOF3 → NotImplementedError); the
multimodal dispatch routing FF D8 FF payloads to the real codec;
progressive (SOF2) decode bit-identical to the baseline twin across
scan scripts (spectral selection, DC successive approximation,
EOB-run spanning) — real since round 14.
"""

from __future__ import annotations

import glob
import struct

import numpy as np
import pytest

from etl_sprint_2_5_spark.operators.jpeg_codec import (
    HUFF_DC_LUMA,
    ZIGZAG,
    _canonical_codes,
    _encode_codes,
    _extend,
    jpeg_decode,
    jpeg_encode,
    jpeg_encode_progressive,
)


def test_canonical_huffman_against_spec():
    """T.81 Annex K.3.1 DC luminance table: category 0 is the 2-bit
    code 00, categories 1-5 are 3-bit 010..110 — the worked example
    every JPEG spec walkthrough uses."""
    dec = _canonical_codes(*HUFF_DC_LUMA)
    assert dec[2] == {0b00: 0}
    assert dec[3] == {0b010: 1, 0b011: 2, 0b100: 3, 0b101: 4, 0b110: 5}
    enc = _encode_codes(*HUFF_DC_LUMA)
    assert enc[0] == (0b00, 2)
    assert enc[5] == (0b110, 3)


def test_extend_against_spec():
    """T.81 F.2.2.1: t raw bits starting with 0 map to the negative
    branch (v − 2^t + 1)."""
    assert _extend(0, 0) == 0
    assert _extend(1, 1) == 1
    assert _extend(0, 1) == -1
    assert _extend(0b101, 3) == 5
    assert _extend(0b010, 3) == 0b010 - 7  # -5
    assert _extend(0b0111, 4) == -8  # 7 < 2^3 → 7 − 15


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # first diagonal steps of T.81 Figure 5
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]


def test_blockflat_rgb_420_is_bit_exact():
    """The closed-form gate property: R=G=B block-flat images at
    quality=100 survive DCT, 4:2:0 subsampling, and color conversion
    EXACTLY (flat blocks → AC coefficients exactly 0, DC an exact
    integer, chroma exactly 128)."""
    rng = np.random.RandomState(13)
    vals = rng.randint(0, 256, size=(4, 6))
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    rgb = np.stack([img] * 3, axis=2)
    dec = jpeg_decode(jpeg_encode(rgb, quality=100, subsampling="4:2:0"))
    assert np.array_equal(dec, rgb)


def test_arbitrary_image_bounded_error():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(33, 47, 3)).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quality=95, subsampling="4:4:4"))
    assert dec.shape == img.shape
    # random noise is JPEG's worst case; q95 4:4:4 stays well inside
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 40
    assert err.mean() < 6


def test_smooth_image_small_error_420():
    x, y = np.arange(37)[None, :], np.arange(29)[:, None]
    img = np.stack(
        [(x * 3 + y * 2) % 200 + 20, (x + y) % 180 + 30,
         (2 * x + y) % 150 + 50],
        axis=2,
    ).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quality=90))  # default 4:2:0
    assert dec.shape == img.shape  # odd dims → crop path
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 3


def test_grayscale_roundtrip():
    x, y = np.arange(24)[None, :], np.arange(16)[:, None]
    g = ((x * 5 + y * 7) % 256).astype(np.uint8)[:, :, None]
    dec = jpeg_decode(jpeg_encode(g, quality=100))
    assert dec.shape == (16, 24, 1)
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 1


def test_restart_markers_decode():
    """A DRI/RSTn stream must reset DC predictors per interval: build
    one by re-segmenting an encoded stream is brittle, so craft it by
    encoding, then inject DRI=1 + RST markers between MCU codes is
    equally brittle — instead decode a stream we assemble from two
    single-MCU encodes sharing tables. Simpler and spec-true: encode a
    16×16 gray image (4 MCUs at 8×8), then rewrite it with DRI=2 and
    split the entropy stream at the MCU-pair boundary re-encoding by
    hand via the public encoder internals."""
    from etl_sprint_2_5_spark.operators.jpeg_codec import (
        HUFF_AC_LUMA,
        _BitWriter,
        _encode_block,
        _plane_blocks,
        _quality_tables,
    )

    vals = np.array([[10, 200], [60, 140]])
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    luma_q, _ = _quality_tables(100)
    blocks, _, _ = _plane_blocks(img.astype(np.float64), luma_q)
    dc_e, ac_e = _encode_codes(*HUFF_DC_LUMA), _encode_codes(*HUFF_AC_LUMA)

    # entropy: two restart intervals of 2 MCUs each, DC pred resets
    seg_bytes = []
    order = [(0, 0), (0, 1), (1, 0), (1, 1)]
    for half in (order[:2], order[2:]):
        bw = _BitWriter()
        pred = 0
        for pos in half:
            pred = _encode_block(bw, blocks[pos], pred, dc_e, ac_e)
        seg_bytes.append(bw.flush())
    entropy = seg_bytes[0] + b"\xff\xd0" + seg_bytes[1]

    head = bytearray(b"\xff\xd8")
    head += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
    head += bytes(int(luma_q[z]) for z in ZIGZAG)
    head += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 16, 16, 1)
    head += bytes([1, 0x11, 0])
    for tc, (bits, hv) in ((0, HUFF_DC_LUMA), (1, HUFF_AC_LUMA)):
        head += b"\xff\xc4" + struct.pack(">H", 19 + len(hv))
        head += bytes([(tc << 4), *bits, *hv])
    head += b"\xff\xdd" + struct.pack(">HH", 4, 2)  # DRI = 2 MCUs
    head += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00])
    head += b"\x00\x3f\x00"
    dec = jpeg_decode(bytes(head) + entropy + b"\xff\xd9")
    assert np.array_equal(dec[:, :, 0], img)


def test_real_world_jpegs_decode():
    """CPython's own shipped JPEGs (16×16 4:2:0 SOF0 logos) decode to
    their header dims with real pixels, deterministically."""
    paths = sorted(set(
        glob.glob(
            "/root/.pyenv/versions/*/lib/python*/test/**/*.jpg",
            recursive=True,
        )
    ))
    if not paths:
        pytest.skip("no CPython jpeg fixtures on this machine")
    seen = 0
    for p in paths[:4]:
        data = open(p, "rb").read()
        a = jpeg_decode(data)
        b = jpeg_decode(data)
        assert a.shape == (16, 16, 3)
        assert np.array_equal(a, b)
        assert a.min() >= 0 and a.max() <= 255 and a.max() > a.min()
        seen += 1
    assert seen


def test_loud_failures():
    with pytest.raises(ValueError):
        jpeg_decode(b"\x89PNG\r\n\x1a\nnot a jpeg")
    # truncated mid-header → ValueError, never garbage dims
    good = jpeg_encode(np.zeros((8, 8, 1), dtype=np.uint8))
    with pytest.raises(ValueError):
        jpeg_decode(good[:20])
    with pytest.raises(ValueError):
        jpeg_decode(good[:-12])  # entropy stream truncated
    # lossless (SOF3) is VALID jpeg this decoder does not speak →
    # NotImplementedError (deterministic-fake lane, not quarantine).
    # (SOF2 progressive decodes for real since round 14.)
    lossless = bytearray(good)
    sof = lossless.find(b"\xff\xc0")
    lossless[sof + 1] = 0xC3
    with pytest.raises(NotImplementedError):
        jpeg_decode(bytes(lossless))
    # a PROGRESSIVE frame whose scan claims the baseline full band
    # (Ss=0, Se=63) is malformed, not merely unsupported → ValueError
    prog = bytearray(good)
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        jpeg_decode(bytes(prog))


def test_multimodal_hook_decodes_jpeg_for_real():
    from etl_sprint_2_5_spark.operators.multimodal import _decode_image_real

    vals = np.arange(6).reshape(2, 3) * 40
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    rgb = np.stack([img] * 3, axis=2)
    w, h, c = _decode_image_real(jpeg_encode(rgb, quality=100))
    assert (w, h, c) == (24, 16, 3)


def test_fill_bytes_before_markers_decode():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker code — both in the header stream (before SOF0 here) and in
    the entropy stream before an RSTn. Spec-valid padded files must
    decode identically to the unpadded bytes, not quarantine."""
    vals = np.arange(6).reshape(2, 3) * 40
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    rgb = np.stack([img] * 3, axis=2)
    good = jpeg_encode(rgb, quality=100)
    base = jpeg_decode(good)

    # pad before SOF0 (header marker loop)
    sof = good.find(b"\xff\xc0")
    padded = good[:sof] + b"\xff\xff\xff" + good[sof:]
    assert np.array_equal(jpeg_decode(padded), base)

    # pad before EOI (entropy-stream terminator classification)
    assert good.endswith(b"\xff\xd9")
    padded = good[:-2] + b"\xff" + good[-2:]
    assert np.array_equal(jpeg_decode(padded), base)


def test_fill_bytes_before_restart_decode():
    """A fill byte before an RSTn inside the entropy stream is still a
    restart, not end-of-scan (the _split_entropy classification)."""
    from etl_sprint_2_5_spark.operators.jpeg_codec import (
        HUFF_AC_LUMA,
        _BitWriter,
        _encode_block,
        _plane_blocks,
        _quality_tables,
    )

    vals = np.array([[10, 200], [60, 140]])
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    luma_q, _ = _quality_tables(100)
    blocks, _, _ = _plane_blocks(img.astype(np.float64), luma_q)
    dc_e, ac_e = _encode_codes(*HUFF_DC_LUMA), _encode_codes(*HUFF_AC_LUMA)
    seg_bytes = []
    order = [(0, 0), (0, 1), (1, 0), (1, 1)]
    for half in (order[:2], order[2:]):
        bw = _BitWriter()
        pred = 0
        for pos in half:
            pred = _encode_block(bw, blocks[pos], pred, dc_e, ac_e)
        seg_bytes.append(bw.flush())
    # one fill byte padding the RST0 marker
    entropy = seg_bytes[0] + b"\xff\xff\xd0" + seg_bytes[1]

    head = bytearray(b"\xff\xd8")
    head += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
    head += bytes(int(luma_q[z]) for z in ZIGZAG)
    head += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 16, 16, 1)
    head += bytes([1, 0x11, 0])
    for tc, (bits, hv) in ((0, HUFF_DC_LUMA), (1, HUFF_AC_LUMA)):
        head += b"\xff\xc4" + struct.pack(">H", 19 + len(hv))
        head += bytes([(tc << 4), *bits, *hv])
    head += b"\xff\xdd" + struct.pack(">HH", 4, 2)  # DRI = 2 MCUs
    head += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00])
    head += b"\x00\x3f\x00"
    dec = jpeg_decode(bytes(head) + entropy + b"\xff\xd9")
    assert np.array_equal(dec[:, :, 0], img)


def test_scan_order_differs_from_frame_order():
    """A valid SOS may list components in any order; the MCU
    interleave follows the SCAN order but color interpretation must
    follow the FRAME list (JFIF: Y first). Assemble a 4:4:4 8×8
    stream whose scan order is Cr,Cb,Y and check the planes land in
    the right color slots."""
    from etl_sprint_2_5_spark.operators.jpeg_codec import (
        HUFF_AC_CHROMA,
        HUFF_AC_LUMA,
        HUFF_DC_CHROMA,
        _BitWriter,
        _encode_block,
        _plane_blocks,
        _quality_tables,
    )

    y_v, cb_v, cr_v = 77, 160, 100
    luma_q, chroma_q = _quality_tables(100)  # all-ones → flat exact
    planes = {
        1: (np.full((8, 8), y_v, dtype=np.float64), luma_q),
        2: (np.full((8, 8), cb_v, dtype=np.float64), chroma_q),
        3: (np.full((8, 8), cr_v, dtype=np.float64), chroma_q),
    }
    enc = {
        1: (_encode_codes(*HUFF_DC_LUMA), _encode_codes(*HUFF_AC_LUMA)),
        2: (_encode_codes(*HUFF_DC_CHROMA), _encode_codes(*HUFF_AC_CHROMA)),
        3: (_encode_codes(*HUFF_DC_CHROMA), _encode_codes(*HUFF_AC_CHROMA)),
    }
    bw = _BitWriter()
    for cid in (3, 2, 1):  # entropy in SCAN order
        img, q = planes[cid]
        blocks, _, _ = _plane_blocks(img, q)
        _encode_block(bw, blocks[(0, 0)], 0, *enc[cid])

    head = bytearray(b"\xff\xd8")
    for tq, q in ((0, luma_q), (1, chroma_q)):
        head += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        head += bytes(int(q[z]) for z in ZIGZAG)
    head += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 8, 8, 3)
    head += bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])  # FRAME: Y,Cb,Cr
    for tc, th, (bits, hv) in (
        (0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_LUMA),
        (0, 1, HUFF_DC_CHROMA), (1, 1, HUFF_AC_CHROMA),
    ):
        head += b"\xff\xc4" + struct.pack(">H", 19 + len(hv))
        head += bytes([(tc << 4) | th, *bits, *hv])
    head += b"\xff\xda" + struct.pack(">HB", 12, 3)
    head += bytes([3, 0x11, 2, 0x11, 1, 0x00])  # SCAN: Cr,Cb,Y
    head += b"\x00\x3f\x00"
    dec = jpeg_decode(bytes(head) + bw.flush() + b"\xff\xd9")

    cb, cr = cb_v - 128.0, cr_v - 128.0
    expect = np.clip(np.round([
        y_v + 1.402 * cr,
        y_v - 0.344136 * cb - 0.714136 * cr,
        y_v + 1.772 * cb,
    ]), 0, 255).astype(np.uint8)
    assert dec.shape == (8, 8, 3)
    assert np.array_equal(dec[0, 0], expect)
    assert (dec == expect[None, None, :]).all()


# ------------------------------------------------------------- progressive


def test_progressive_bit_identical_to_baseline_twin():
    """jpeg_encode_progressive emits the SAME quantized coefficients
    as jpeg_encode in an SOF2 scan script (T.81 Annex G spectral
    selection), so decoding the progressive file must reproduce the
    baseline decode BIT-EXACTLY — 4:2:0 and 4:4:4, odd (crop-path)
    dims, random worst-case content."""
    rng = np.random.RandomState(14)
    img = rng.randint(0, 256, size=(29, 43, 3)).astype(np.uint8)
    for sub in ("4:2:0", "4:4:4"):
        base = jpeg_decode(jpeg_encode(img, quality=85, subsampling=sub))
        prog = jpeg_decode(
            jpeg_encode_progressive(img, quality=85, subsampling=sub)
        )
        assert np.array_equal(prog, base), sub


def test_progressive_dc_successive_approximation():
    """dc_sa=True sends the DC band as an Al=1 first pass plus a 1-bit
    refinement scan (Ah=1, Al=0) — the successive-approximation
    machinery must reassemble the exact DC values, so the decode still
    matches the baseline twin bit-for-bit."""
    rng = np.random.RandomState(41)
    img = rng.randint(0, 256, size=(24, 16, 3)).astype(np.uint8)
    base = jpeg_decode(jpeg_encode(img, quality=90))
    prog = jpeg_decode(jpeg_encode_progressive(img, quality=90, dc_sa=True))
    assert np.array_equal(prog, base)


def test_progressive_grayscale_and_blockflat_exact():
    """Grayscale SOF2 (single component, non-interleaved DC scan too)
    and the closed-form gate property: block-flat R=G=B at quality=100
    survives the PROGRESSIVE pipeline exactly, same as baseline."""
    x, y = np.arange(24)[None, :], np.arange(16)[:, None]
    g = ((x * 5 + y * 7) % 256).astype(np.uint8)[:, :, None]
    assert np.array_equal(
        jpeg_decode(jpeg_encode_progressive(g, quality=90)),
        jpeg_decode(jpeg_encode(g, quality=90)),
    )
    rng = np.random.RandomState(7)
    vals = rng.randint(0, 256, size=(3, 5))
    flat = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    rgb = np.stack([flat] * 3, axis=2)
    dec = jpeg_decode(
        jpeg_encode_progressive(rgb, quality=100, subsampling="4:2:0")
    )
    assert np.array_equal(dec, rgb)


def test_progressive_eob_runs_span_blocks():
    """A mostly-flat image makes most blocks all-zero in the AC band →
    the encoder emits EOBn runs spanning many blocks (G.1.2.2) and the
    decoder's eobrun carry must skip exactly those blocks. One bright
    block in a sea of flatness pins the alignment."""
    img = np.full((40, 40, 3), 128, dtype=np.uint8)
    img[17:23, 17:23] = [250, 10, 60]  # off-grid feature → AC energy
    base = jpeg_decode(jpeg_encode(img, quality=80, subsampling="4:2:0"))
    prog = jpeg_decode(
        jpeg_encode_progressive(img, quality=80, subsampling="4:2:0")
    )
    assert np.array_equal(prog, base)


def test_ff_run_before_stuffed_byte_quarantines():
    """T.81 B.1.1.2 allows fill bytes before MARKERS only; FF 00 is a
    stuffed data byte, not a marker, so the sequence FF FF 00 has no
    conformant encoding — it must quarantine (ValueError), never be
    silently collapsed to a single data 0xFF."""
    from etl_sprint_2_5_spark.operators.jpeg_codec import (
        _split_entropy_ext,
    )

    # exactly one FF before 00 is the normal stuffed byte
    segs, used = _split_entropy_ext(b"\x12\xff\x00\x34")
    assert segs == [b"\x12\xff\x34"] and used == 4
    with pytest.raises(ValueError):
        _split_entropy_ext(b"\x12\xff\xff\x00\x34")


def _color_jpeg_and_sos():
    vals = np.arange(6).reshape(2, 3) * 40
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    rgb = np.stack([img, img[::-1], img[:, ::-1]], axis=2)
    data = jpeg_encode(rgb, quality=100)
    sos = data.find(b"\xff\xda")
    assert sos > 0
    ns = data[sos + 4]
    assert ns == 3  # Ns, then Ns × (Cs, TdTa), then Ss Se AhAl
    return data, sos


def test_subset_scan_routes_to_fake_lane():
    """A sequential SOS covering a strict subset of frame components
    is a VALID multi-scan sequential stream per T.81 — unsupported,
    so it must raise NotImplementedError (deterministic-fake lane),
    not ValueError (quarantine lane)."""
    data, sos = _color_jpeg_and_sos()
    comp1 = data[sos + 5:sos + 7]
    band = data[sos + 11:sos + 14]
    tail = data[sos + 14:]
    single = (
        data[:sos]
        + b"\xff\xda"
        + struct.pack(">HB", 8, 1)
        + comp1
        + band
        + tail
    )
    with pytest.raises(NotImplementedError, match="multi-scan sequential"):
        jpeg_decode(single)


def test_duplicate_component_in_scan_quarantines():
    """Duplicate component selectors within one SOS violate T.81
    B.2.3 — malformed, so quarantine (ValueError)."""
    data, sos = _color_jpeg_and_sos()
    dup = bytearray(data)
    dup[sos + 9] = dup[sos + 5]  # third selector := first's id
    with pytest.raises(ValueError, match="duplicate component"):
        jpeg_decode(bytes(dup))
