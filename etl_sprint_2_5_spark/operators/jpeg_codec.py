"""Baseline JPEG (ITU-T T.81) codec — pure stdlib + numpy, no PIL /
libjpeg, closing the last image-codec fake surface (PNG became real
in round 12; operators/multimodal._decode_image_real dispatches here
for ``FF D8 FF`` payloads).

Decoder: baseline + extended-sequential DCT, 8-bit precision (SOF0 /
SOF1), plus progressive DCT (SOF2, T.81 Annex G: spectral selection
and successive approximation, DC and AC first/refinement passes, EOB
runs) since round 14; grayscale or 3-component YCbCr with arbitrary
sampling factors (4:4:4 / 4:2:2 / 4:2:0 via per-component
replication), restart markers, 16-bit quant tables. The remaining
coding processes (lossless SOF3, arithmetic SOF9+, hierarchical)
raise ``NotImplementedError`` — a VALID stream this decoder does not
speak routes to the deterministic-fake lane, while a MALFORMED stream
raises ``ValueError`` and quarantines (never fake dims for a
claimed-real payload). Chroma upsampling is pixel
replication (the T.81 sample-expansion reference shape, not libjpeg's
fancy bilinear — decoders legitimately differ here; the exactness
gate uses flat chroma where every convention agrees).

Encoder: baseline SOF0 with the Annex K quantization + Huffman
tables, libjpeg's quality→scale mapping, 4:4:4 or 4:2:0 (2×2 box
chroma subsample). ``quality=100`` yields all-ones quant tables,
which makes BLOCK-FLAT images bit-exact through the whole pipeline
(flat 8×8 → every AC coefficient is exactly 0, the DC coefficient is
an exact multiple of 8, and R=G=B inputs put chroma at exactly 128) —
the property the oracle-gated query exploits for a closed-form
cross-engine checksum of a LOSSY codec. ``jpeg_encode_progressive``
emits the same coefficients as an SOF2 scan script (interleaved DC
scan — optionally split into two successive-approximation passes —
then one full-band AC scan per component), so a progressive file
decodes bit-identically to its baseline twin.

Dataflow stance unchanged from png_codec: codecs run inside Arrow
``mapInPandas`` stages on the executors; this module is the per-blob
kernel, Spark owns the distribution.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

#: zigzag scan order (T.81 Figure 5): zigzag index -> raster index
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: Annex K Table K.1/K.2 base quantization tables (raster order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

#: Annex K typical Huffman tables: (bits[1..16], huffval)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

#: AC table for PROGRESSIVE scans: the Annex K baseline tables carry
#: only EOB (0x00) and ZRL (0xF0) among the size-0 symbols, but a
#: progressive AC scan also needs EOBn (0x10..0xE0, T.81 G.1.2.2) to
#: code EOB runs spanning blocks. Real encoders build optimized
#: per-scan tables; this fixture encoder uses a flat canonical table
#: — every run/size symbol plus all 14 EOBn codes at 8 bits (176
#: symbols ≤ 2^8, Kraft-feasible, all-ones code unused) — trading
#: compression for completeness, which is fine for an encoder whose
#: job is generating spec-true test/oracle fixtures.
HUFF_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    sorted(
        [0x00, 0xF0]
        + [r << 4 for r in range(1, 15)]
        + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    ),
)

# orthonormal 8x8 DCT-II basis: A[u,x] = C(u)/2 * cos((2x+1)uπ/16);
# forward F = A @ B @ A.T, inverse B = A.T @ F @ A (T.81 Annex A.3.3)
_x = np.arange(8)
_A = 0.5 * np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16)
_A[0, :] *= 1 / np.sqrt(2)


def _canonical_codes(bits: list[int], huffval: list[int]):
    """T.81 Annex C code generation: {length: {code: symbol}}."""
    table: dict[int, dict[int, int]] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table.setdefault(ln, {})[code] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _encode_codes(bits: list[int], huffval: list[int]):
    """symbol -> (code, length) for the encoder."""
    enc: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            enc[huffval[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return enc


# ---------------------------------------------------------------- decode


class _BitReader:
    """Entropy-segment bit reader (input already unstuffed)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("jpeg: entropy stream truncated")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, table: dict[int, dict[int, int]]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get(ln, {}).get(code)
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t raw bits to the signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_block(r: _BitReader, dc_tab, ac_tab, pred: int):
    """One 8×8 block of quantized coefficients (zigzag order)."""
    coef = np.zeros(64, dtype=np.int64)
    t = r.read_huff(dc_tab)
    diff = _extend(r.read_bits(t), t)
    pred += diff
    coef[0] = pred
    k = 1
    while k < 64:
        rs = r.read_huff(ac_tab)
        run, size = rs >> 4, rs & 15
        if size == 0:
            if run == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("jpeg: AC run past block end")
        coef[k] = _extend(r.read_bits(size), size)
        k += 1
    return coef, pred


def jpeg_decode(payload: bytes) -> np.ndarray:
    """Decode a baseline JFIF/JPEG byte string → (H, W, C) uint8,
    C = 1 (grayscale) or 3 (RGB). ValueError on malformed input,
    NotImplementedError on valid-but-unsupported coding processes."""
    try:
        return _jpeg_decode_inner(payload)
    except (IndexError, struct.error) as ex:
        # truncated/garbled headers surface as slice/unpack errors —
        # normalize to the quarantine lane's contract
        raise ValueError(f"jpeg: malformed stream ({ex})") from ex


def _jpeg_decode_inner(payload: bytes) -> np.ndarray:
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("jpeg: bad SOI signature")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None  # (H, W, [(cid, h, v, tq)])
    progressive = False
    prog = None  # progressive coefficient store (after first SOS)
    restart = 0
    i = 2
    n = len(payload)
    while i < n - 1:
        if payload[i] != 0xFF:
            raise ValueError("jpeg: marker expected")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad the
        # stream before a marker code — skip to the last 0xFF
        while i + 1 < n and payload[i + 1] == 0xFF:
            i += 1
        if i >= n - 1:
            break
        m = payload[i + 1]
        i += 2
        if m == 0xD8 or (0xD0 <= m <= 0xD7):
            continue
        if m == 0xD9:  # EOI
            if prog is not None and prog["nscans"]:
                return _finish_progressive(prog, qt)
            raise ValueError("jpeg: EOI before scan data")
        if m == 0x01:
            continue
        (seg_len,) = struct.unpack(">H", payload[i:i + 2])
        seg = payload[i + 2:i + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("jpeg: truncated segment")
        if m == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq:  # 16-bit table
                    vals = np.frombuffer(
                        seg[j:j + 128], dtype=">u2"
                    ).astype(np.int64)
                    j += 128
                else:
                    vals = np.frombuffer(
                        seg[j:j + 64], dtype=np.uint8
                    ).astype(np.int64)
                    j += 64
                if vals.size != 64:
                    raise ValueError("jpeg: short DQT")
                qt[tq] = vals
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            if seg[0] != 8:
                raise NotImplementedError("jpeg: 12-bit precision")
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if nc not in (1, 3):
                raise NotImplementedError(f"jpeg: {nc}-component scan")
            comps = []
            for k in range(nc):
                cid, hv, tq_id = seg[6 + 3 * k:9 + 3 * k]
                comps.append((cid, hv >> 4, hv & 15, tq_id))
            if h == 0 or w == 0:
                raise ValueError("jpeg: zero frame dimension")
            frame = (h, w, comps)
            progressive = m == 0xC2
        elif m in (0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: coding process SOF{m - 0xC0} not supported"
            )
        elif m == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1:j + 17])
                cnt = sum(bits)
                huffval = list(seg[j + 17:j + 17 + cnt])
                if len(huffval) != cnt:
                    raise ValueError("jpeg: short DHT")
                huff[(tc, th)] = _canonical_codes(bits, huffval)
                j += 17 + cnt
        elif m == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scan = []
            for k in range(ns):
                cs, tdta = seg[1 + 2 * k], seg[2 + 2 * k]
                scan.append((cs, tdta >> 4, tdta & 15))
            if not progressive:
                return _decode_scan(
                    payload[i + seg_len:], frame, scan, qt, huff, restart
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if prog is None:
                prog = _init_progressive(frame)
            consumed = _decode_progressive_scan(
                payload[i + seg_len:], prog, scan,
                (ss, se, ahal >> 4, ahal & 15), huff, restart,
            )
            i += seg_len + consumed
            continue
        # APPn / COM / others: skip
        i += seg_len
    if prog is not None and prog["nscans"]:
        return _finish_progressive(prog, qt)  # tolerated missing EOI
    raise ValueError("jpeg: no scan data")


def _split_entropy(data: bytes):
    """Entropy stream → unstuffed restart segments (split on RSTn;
    terminated by any other marker)."""
    return _split_entropy_ext(data)[0]


def _split_entropy_ext(data: bytes):
    """Entropy stream → (unstuffed restart segments, bytes consumed).
    ``consumed`` is the offset of the terminating marker's first
    0xFF (or len(data)) — the progressive decoder uses it to resume
    header parsing after each scan. 0xFF runs are scanned to the
    first non-0xFF byte before classifying (T.81 B.1.1.2 allows fill
    bytes before a marker, so 0xFF 0xFF 0xD0 is still a restart)."""
    segs, cur = [], bytearray()
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        j = i + 1
        while j < n and data[j] == 0xFF:  # fill bytes
            j += 1
        m = data[j] if j < n else 0xD9
        if m == 0x00:  # stuffed data byte (exactly one 0xFF 0x00 pair)
            if j != i + 1:
                # T.81 B.1.1.2: fill bytes precede MARKERS only, and
                # FF 00 is not a marker — an FF-run ending in 0x00
                # (e.g. FF FF 00) has no conformant encoding, so it is
                # corruption, not data; refuse rather than guess.
                raise ValueError("jpeg: 0xFF fill run before stuffed byte")
            cur.append(0xFF)
            i = j + 1
        elif 0xD0 <= m <= 0xD7:  # restart
            segs.append(bytes(cur))
            cur = bytearray()
            i = j + 1
        else:  # EOI or next header
            break
    segs.append(bytes(cur))
    return segs, i


# ------------------------------------------------------- progressive decode


def _init_progressive(frame) -> dict:
    """Per-component coefficient store for a SOF2 frame: zigzag-order
    int64 arrays sized to the MCU-padded block grid (interleaved DC
    scans code padding blocks too); non-interleaved scans iterate
    only the true grid (T.81 A.1.1 ceil dims)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    info = {}
    for cid, ch, cv, tq in comps:
        cw = -(-(w * ch) // hmax)
        chh = -(-(h * cv) // vmax)
        info[cid] = {
            "coef": np.zeros((mcuy * cv, mcux * ch, 64), dtype=np.int64),
            "nbw": -(-cw // 8), "nbh": -(-chh // 8),
            "ch": ch, "cv": cv, "tq": tq,
        }
    return {
        "frame": frame, "hmax": hmax, "vmax": vmax,
        "mcux": mcux, "mcuy": mcuy, "c": info, "nscans": 0,
    }


def _decode_progressive_scan(
    data: bytes, prog: dict, scan, band, huff, restart: int
) -> int:
    """One progressive scan (T.81 Annex G): updates the coefficient
    store in place, returns the entropy bytes consumed so the marker
    loop resumes at the next header."""
    ss, se, ah, al = band
    segs, consumed = _split_entropy_ext(data)
    if ss == 0:
        if se != 0:
            raise ValueError("jpeg: progressive DC scan must have Se=0")
        _prog_dc_scan(segs, prog, scan, ah, al, huff, restart)
    else:
        if len(scan) != 1:
            raise ValueError(
                "jpeg: progressive AC scan must be single-component"
            )
        if se > 63 or ss > se:
            raise ValueError("jpeg: bad spectral band")
        _prog_ac_scan(segs, prog, scan[0], ss, se, ah, al, huff, restart)
    prog["nscans"] += 1
    return consumed


def _next_seg(segs, seg_i: int) -> "_BitReader":
    if seg_i >= len(segs):
        raise ValueError("jpeg: missing restart segment")
    return _BitReader(segs[seg_i])


def _prog_dc_scan(segs, prog, scan, ah, al, huff, restart) -> None:
    info = prog["c"]
    tabs = {}
    for cs, td, _ta in scan:
        if cs not in info:
            raise ValueError("jpeg: scan references unknown component")
        if ah == 0:  # first pass needs the DC table; refinement is raw bits
            if (0, td) not in huff:
                raise ValueError("jpeg: missing Huffman table")
            tabs[cs] = huff[(0, td)]

    def one(r, block, cs, pred) -> None:
        if ah == 0:
            t = r.read_huff(tabs[cs])
            pred[cs] += _extend(r.read_bits(t), t)
            block[0] = pred[cs] << al
        elif r.read_bit():
            block[0] |= 1 << al

    seg_i = 0
    r = _next_seg(segs, 0)
    pred = {cs: 0 for cs, *_ in scan}
    if len(scan) == 1:  # non-interleaved: true block grid, raster
        cs = scan[0][0]
        ci = info[cs]
        for bi in range(ci["nbh"] * ci["nbw"]):
            if restart and bi and bi % restart == 0:
                seg_i += 1
                r = _next_seg(segs, seg_i)
                pred = {cs: 0}
            by, bx = divmod(bi, ci["nbw"])
            one(r, ci["coef"][by, bx], cs, pred)
        return
    for mcu in range(prog["mcux"] * prog["mcuy"]):  # interleaved
        if restart and mcu and mcu % restart == 0:
            seg_i += 1
            r = _next_seg(segs, seg_i)
            pred = {cs: 0 for cs in pred}
        my, mx = divmod(mcu, prog["mcux"])
        for cs, _td, _ta in scan:
            ci = info[cs]
            for v in range(ci["cv"]):
                for hh in range(ci["ch"]):
                    one(
                        r,
                        ci["coef"][my * ci["cv"] + v, mx * ci["ch"] + hh],
                        cs, pred,
                    )


def _prog_ac_scan(segs, prog, scomp, ss, se, ah, al, huff, restart) -> None:
    cs, _td, ta = scomp
    info = prog["c"]
    if cs not in info:
        raise ValueError("jpeg: scan references unknown component")
    if (1, ta) not in huff:
        raise ValueError("jpeg: missing Huffman table")
    ac_tab = huff[(1, ta)]
    ci = info[cs]
    seg_i = 0
    r = _next_seg(segs, 0)
    eobrun = 0
    decode = _ac_first if ah == 0 else _ac_refine
    for bi in range(ci["nbh"] * ci["nbw"]):
        if restart and bi and bi % restart == 0:
            seg_i += 1
            r = _next_seg(segs, seg_i)
            eobrun = 0
        by, bx = divmod(bi, ci["nbw"])
        eobrun = decode(r, ci["coef"][by, bx], ss, se, al, ac_tab, eobrun)


def _ac_first(r, block, ss, se, al, ac_tab, eobrun: int) -> int:
    """T.81 G.2.2: first AC pass over the band — runs, EXTEND values
    shifted to the approximation bit, EOB runs spanning blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = r.read_huff(ac_tab)
        run, size = rs >> 4, rs & 15
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << run) - 1  # EOBn: this block + eobrun more
            if run:
                eobrun += r.read_bits(run)
            return eobrun
        k += run
        if k > se:
            raise ValueError("jpeg: AC run past band end")
        block[k] = _extend(r.read_bits(size), size) << al
        k += 1
    return 0


def _ac_refine(r, block, ss, se, al, ac_tab, eobrun: int) -> int:
    """T.81 G.2.3 (libjpeg decode_mcu_AC_refine shape): one
    approximation bit per already-nonzero coefficient, newly-nonzero
    insertions at ±2^Al, EOB runs still carrying correction bits."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = r.read_huff(ac_tab)
            run, size = rs >> 4, rs & 15
            val = 0
            if size == 0:
                if run != 15:  # EOBn
                    eobrun = (1 << run) - 1
                    if run:
                        eobrun += r.read_bits(run)
                    break
                # ZRL: advance past 16 zero-history coefficients
            else:
                if size != 1:
                    raise ValueError("jpeg: refinement size must be 1")
                val = p1 if r.read_bit() else m1
            while k <= se:
                c = int(block[k])
                if c != 0:
                    # correction bit for an already-nonzero coefficient
                    if r.read_bit() and (c & p1) == 0:
                        block[k] = c + (p1 if c > 0 else m1)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if size and k <= se:
                block[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # EOB interval: correction bits only
            c = int(block[k])
            if c != 0 and r.read_bit() and (c & p1) == 0:
                block[k] = c + (p1 if c > 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _finish_progressive(prog: dict, qt: dict) -> np.ndarray:
    """Dequantize + IDCT the accumulated coefficient store (one
    vectorized einsum per component), then the shared upsample/color
    path."""
    h, w, comps = prog["frame"]
    planes = {}
    deq = np.zeros(64, dtype=np.int64)
    for cid, _ch, _cv, tq in comps:
        if tq not in qt:
            raise ValueError("jpeg: missing quant table")
        coef = prog["c"][cid]["coef"]
        bh, bw = coef.shape[:2]
        plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        # per-block two-matmul IDCT in the SAME evaluation order as
        # the sequential path — a progressive file reconstructs
        # bit-identically to a baseline file with equal coefficients
        for by in range(bh):
            for bx in range(bw):
                deq[ZIGZAG] = coef[by, bx] * qt[tq]
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                    _A.T @ deq.reshape(8, 8).astype(np.float64) @ _A
                )
        planes[cid] = plane
    return _compose_image(
        planes, comps, h, w, prog["hmax"], prog["vmax"]
    )


def _decode_scan(data, frame, scan, qt, huff, restart) -> np.ndarray:
    h, w, comps = frame
    if len(scan) != len(comps):
        # A scan over a strict subset of frame components is a VALID
        # multi-scan (non-interleaved) sequential stream per T.81 —
        # unsupported here, so route to the deterministic-fake lane,
        # not the quarantine lane.
        raise NotImplementedError(
            "jpeg: multi-scan sequential not supported"
        )
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    planes, meta = {}, []
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError("jpeg: scan references unknown component")
        _, ch, cv, tq_id = by_id[cs]
        if tq_id not in qt:
            raise ValueError("jpeg: missing quant table")
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("jpeg: missing Huffman table")
        planes[cs] = np.zeros(
            (mcuy * cv * 8, mcux * ch * 8), dtype=np.float64
        )
        meta.append((cs, ch, cv, qt[tq_id], huff[(0, td)], huff[(1, ta)]))

    if len(planes) != len(scan):
        # T.81 B.2.3: component selectors within one SOS must be
        # distinct — a duplicate is a malformed stream (quarantine).
        # (Given the length check above and the known-component check
        # in the loop, distinct selectors always cover the frame.)
        raise ValueError("jpeg: duplicate component in scan")

    segs = _split_entropy(data)
    r = _BitReader(segs[0])
    seg_i = 0
    pred = {cs: 0 for cs, *_ in meta}
    deq = np.zeros(64, dtype=np.int64)
    for mcu in range(mcux * mcuy):
        if restart and mcu and mcu % restart == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("jpeg: missing restart segment")
            r = _BitReader(segs[seg_i])
            pred = {cs: 0 for cs in pred}
        my, mx = divmod(mcu, mcux)
        for cs, ch, cv, q, dc_tab, ac_tab in meta:
            for v in range(cv):
                for hh in range(ch):
                    coef, pred[cs] = _decode_block(
                        r, dc_tab, ac_tab, pred[cs]
                    )
                    deq[ZIGZAG] = coef * q
                    block = _A.T @ deq.reshape(8, 8).astype(np.float64) @ _A
                    y0 = (my * cv + v) * 8
                    x0 = (mx * ch + hh) * 8
                    planes[cs][y0:y0 + 8, x0:x0 + 8] = block
    return _compose_image(planes, comps, h, w, hmax, vmax)


def _compose_image(planes, comps, h, w, hmax, vmax) -> np.ndarray:
    """Upsample per-component sample planes (keyed by component id,
    values level-shift-pending) and color-convert → (H, W, C) uint8.
    Color interpretation follows the FRAME component list (JFIF: Y
    first), not the SOS scan order — a valid stream may list the scan
    components in any order, which only governs the MCU interleave,
    never which plane is luma."""
    out = []
    for cid, ch, cv, _tq in comps:
        p = planes[cid] + 128.0
        # replicate up to full resolution, crop to frame dims
        p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        g = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return g[:, :, None]
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encode


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # 1-fill pad (T.81 F.1.2.3)
        return bytes(self.out)


def _quality_tables(quality: int):
    """libjpeg quality→scaling: 5000/q below 50, 200−2q above;
    quality=100 → all-ones tables (the exactness mode)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    luma = np.clip((QT_LUMA * scale + 50) // 100, 1, 255)
    chroma = np.clip((QT_CHROMA * scale + 50) // 100, 1, 255)
    return luma, chroma


def _encode_size(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(w: _BitWriter, coef: np.ndarray, pred: int,
                  dc_enc, ac_enc) -> int:
    dc = int(coef[0])
    diff = dc - pred
    t = _encode_size(diff)
    w.write(*dc_enc[t])
    if t:
        w.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(coef)[0])) if np.any(coef[1:]) else 0
    for k in range(1, 64):
        v = int(coef[k])
        if v == 0:
            if k > last_nz:
                w.write(*ac_enc[0x00])  # EOB
                break
            run += 1
            continue
        while run > 15:
            w.write(*ac_enc[0xF0])  # ZRL
            run -= 16
        s = _encode_size(v)
        w.write(*ac_enc[run * 16 + s])
        w.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    return dc


def _plane_blocks(plane: np.ndarray, q: np.ndarray):
    """Pad a component plane to 8-multiples (edge replication), then
    forward-DCT + quantize every 8×8 block → dict[(by,bx)] zigzag."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    p = p.astype(np.float64) - 128.0
    out = {}
    qr = q.reshape(8, 8)
    for by in range(ph // 8):
        for bx in range(pw // 8):
            block = p[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
            coefs = np.round((_A @ block @ _A.T) / qr).astype(np.int64)
            out[(by, bx)] = coefs.reshape(64)[ZIGZAG]  # raster → zigzag
    return out, ph // 8, pw // 8


def _frame_components(arr: np.ndarray, quality: int, subsampling: str):
    """Shared encoder prep: RGB→YCbCr, chroma subsample, per-component
    (cid, h, v, tq, plane, qtable, kind) list. Returns
    (h, w, nc, comps, luma_q, chroma_q)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError("jpeg_encode: 1 or 3 channels")
    luma_q, chroma_q = _quality_tables(quality)
    a = arr.astype(np.float64)
    if nc == 3:
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        y = np.round(0.299 * r + 0.587 * g + 0.114 * b)
        cb = np.round(128 - 0.168736 * r - 0.331264 * g + 0.5 * b)
        cr = np.round(128 + 0.5 * r - 0.418688 * g - 0.081312 * b)
        if subsampling == "4:2:0":
            sh, sv = 2, 2
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = np.round(
                (cb[0::2, 0::2] + cb[0::2, 1::2]
                 + cb[1::2, 0::2] + cb[1::2, 1::2]) / 4
            )
            cr = np.round(
                (cr[0::2, 0::2] + cr[0::2, 1::2]
                 + cr[1::2, 0::2] + cr[1::2, 1::2]) / 4
            )
        elif subsampling == "4:4:4":
            sh, sv = 1, 1
        else:
            raise ValueError(f"jpeg_encode: subsampling {subsampling!r}")
        comps = [
            (1, sh, sv, 0, y, luma_q, "l"),
            (2, 1, 1, 1, cb, chroma_q, "c"),
            (3, 1, 1, 1, cr, chroma_q, "c"),
        ]
    else:
        comps = [(1, 1, 1, 0, a[..., 0], luma_q, "l")]
    return h, w, nc, comps, luma_q, chroma_q


def _component_blocks(comps, h: int, w: int):
    """DCT+quantize every component against the MCU-padded grid.
    Returns (blocks[cid] dict keyed (by,bx) → zigzag coefs,
    mcux, mcuy)."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    blocks = {}
    for cid, ch, cv, _tq, plane, q, _kind in comps:
        need_h, need_w = mcuy * cv * 8, mcux * ch * 8
        p = np.pad(
            plane,
            ((0, need_h - plane.shape[0]), (0, need_w - plane.shape[1])),
            mode="edge",
        )
        blocks[cid] = _plane_blocks(p, q)[0]
    return blocks, mcux, mcuy


def jpeg_encode(
    arr: np.ndarray, quality: int = 90, subsampling: str = "4:2:0"
) -> bytes:
    """Encode (H, W, 1|3) uint8 → baseline JFIF bytes. 3-channel input
    is RGB; ``subsampling`` is '4:4:4' or '4:2:0' (ignored for gray)."""
    h, w, nc, comps, luma_q, chroma_q = _frame_components(
        arr, quality, subsampling
    )

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq_id, q in ((0, luma_q), (1, chroma_q))[: 1 if nc == 1 else 2]:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq_id])
        out += bytes(int(q[z]) for z in ZIGZAG)  # zigzag order
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8, h, w,
                                     len(comps))
    for cid, sh_, sv_, tq_id, *_ in comps:
        out += bytes([cid, (sh_ << 4) | sv_, tq_id])
    tables = [
        (0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_LUMA),
    ] + ([(0, 1, HUFF_DC_CHROMA), (1, 1, HUFF_AC_CHROMA)] if nc == 3 else [])
    for tc, th, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([(tc << 4) | th, *bits, *vals])
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for cid, _, _, tq_id, *_ in comps:
        td_ta = 0x00 if tq_id == 0 else 0x11
        out += bytes([cid, td_ta])
    out += b"\x00\x3f\x00"  # Ss/Se/Ah-Al (baseline fixed)

    dc_l, ac_l = _encode_codes(*HUFF_DC_LUMA), _encode_codes(*HUFF_AC_LUMA)
    dc_c, ac_c = (
        _encode_codes(*HUFF_DC_CHROMA), _encode_codes(*HUFF_AC_CHROMA),
    )
    blocks, mcux, mcuy = _component_blocks(comps, h, w)
    pred = {cid: 0 for cid, *_ in comps}
    bw = _BitWriter()
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for cid, ch, cv, _, _, _, kind in comps:
            dce, ace = (dc_l, ac_l) if kind == "l" else (dc_c, ac_c)
            for v in range(cv):
                for hh in range(ch):
                    pred[cid] = _encode_block(
                        bw, blocks[cid][(my * cv + v, mx * ch + hh)],
                        pred[cid], dce, ace,
                    )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_encode_progressive(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:2:0",
    dc_sa: bool = False,
) -> bytes:
    """Encode (H, W, 1|3) uint8 → progressive (SOF2) JFIF bytes.

    Scan script: one interleaved DC scan over all components, then
    one full-band (Ss=1..Se=63) AC scan per component — progressive
    by spectral selection (T.81 Annex G). With ``dc_sa=True`` the DC
    band is sent in two successive-approximation passes instead
    (Al=1 point transform + a 1-bit refinement scan), exercising the
    Ah/Al machinery end-to-end. Coefficients are computed by the same
    DCT/quantize path as ``jpeg_encode``, so a progressive file
    decodes bit-identically to its baseline twin."""
    h, w, nc, comps, luma_q, chroma_q = _frame_components(
        arr, quality, subsampling
    )
    blocks, mcux, mcuy = _component_blocks(comps, h, w)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    dc_l, dc_c = _encode_codes(*HUFF_DC_LUMA), _encode_codes(*HUFF_DC_CHROMA)
    ac_prog = _encode_codes(*HUFF_AC_PROG)  # EOBn-capable, see table note
    meta = [(cid, ch, cv, kind) for cid, ch, cv, _t, _p, _q, kind in comps]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq_id, q in ((0, luma_q), (1, chroma_q))[: 1 if nc == 1 else 2]:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq_id])
        out += bytes(int(q[z]) for z in ZIGZAG)
    out += b"\xff\xc2" + struct.pack(  # SOF2: progressive DCT
        ">HBHHB", 8 + 3 * len(comps), 8, h, w, len(comps)
    )
    for cid, sh_, sv_, tq_id, *_ in comps:
        out += bytes([cid, (sh_ << 4) | sv_, tq_id])
    tables = [
        (0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_PROG),
    ] + ([(0, 1, HUFF_DC_CHROMA)] if nc == 3 else [])
    for tc, th, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([(tc << 4) | th, *bits, *vals])

    def sos(scan_comps, ss, se, ah, al) -> bytes:
        seg = bytearray(
            b"\xff\xda" + struct.pack(
                ">HB", 6 + 2 * len(scan_comps), len(scan_comps)
            )
        )
        for cid, td, ta in scan_comps:
            seg += bytes([cid, (td << 4) | ta])
        seg += bytes([ss, se, (ah << 4) | al])
        return bytes(seg)

    def dc_blocks_mcu_order():
        """(cid, kind, zigzag-coef-array) in interleaved MCU order."""
        for mcu in range(mcux * mcuy):
            my, mx = divmod(mcu, mcux)
            for cid, ch, cv, kind in meta:
                for v in range(cv):
                    for hh in range(ch):
                        yield cid, kind, blocks[cid][
                            (my * cv + v, mx * ch + hh)
                        ]

    # --- DC first scan (interleaved, Ah=0) -----------------------------
    al0 = 1 if dc_sa else 0
    out += sos(
        [(cid, 0 if kind == "l" else 1, 0) for cid, _c, _v, kind in meta],
        0, 0, 0, al0,
    )
    bw = _BitWriter()
    pred = {cid: 0 for cid, *_ in meta}
    for cid, kind, coef in dc_blocks_mcu_order():
        dce = dc_l if kind == "l" else dc_c
        dc = int(coef[0]) >> al0  # point transform (arithmetic shift)
        diff = dc - pred[cid]
        pred[cid] = dc
        t = _encode_size(diff)
        bw.write(*dce[t])
        if t:
            bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    out += bw.flush()

    if dc_sa:  # --- DC refinement scan (Ah=1, Al=0): raw low bits ------
        out += sos([(cid, 0, 0) for cid, _c, _v, _k in meta], 0, 0, 1, 0)
        bw = _BitWriter()
        for _cid, _kind, coef in dc_blocks_mcu_order():
            bw.write(int(coef[0]) & 1, 1)
        out += bw.flush()

    # --- AC scans: full band per component, non-interleaved ------------
    for cid, ch, cv, kind in meta:
        ace = ac_prog
        out += sos([(cid, 0, 0)], 1, 63, 0, 0)
        bw = _BitWriter()
        # true (non-MCU-padded) block grid, T.81 A.1.1 ceil dims
        cw = -(-(w * ch) // hmax)
        chh = -(-(h * cv) // vmax)
        nbw, nbh = -(-cw // 8), -(-chh // 8)
        eobrun = 0

        def flush_eob() -> None:
            nonlocal eobrun
            if eobrun:
                nb = eobrun.bit_length() - 1
                bw.write(*ace[nb << 4])
                if nb:
                    bw.write(eobrun - (1 << nb), nb)
                eobrun = 0

        for bi in range(nbh * nbw):
            coef = blocks[cid][(bi // nbw, bi % nbw)]
            nz = np.nonzero(coef[1:64])[0]
            if nz.size == 0:
                eobrun += 1
                if eobrun == 0x7FFF:  # G.1.2.2 EOB-run ceiling
                    flush_eob()
                continue
            flush_eob()
            last = int(nz[-1]) + 1  # zigzag index of last nonzero
            run = 0
            for k in range(1, last + 1):
                v = int(coef[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    bw.write(*ace[0xF0])  # ZRL
                    run -= 16
                s = _encode_size(v)
                bw.write(*ace[(run << 4) | s])
                bw.write(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
            if last < 63:
                eobrun += 1  # trailing zeros: this block joins an EOB run
        flush_eob()
        out += bw.flush()

    out += b"\xff\xd9"  # EOI
    return bytes(out)
