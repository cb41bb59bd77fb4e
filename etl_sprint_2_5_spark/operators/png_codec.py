"""Pure-stdlib PNG codec (zlib + numpy) — the REAL image codec for the
multimodal decode stage (SURVEY.md round-4 hook,
operators/multimodal.py ``_decode_image_real``), installable-library-
free: the container ships no PIL/imageio, but PNG is just zlib behind
per-scanline filters, both of which numpy + the stdlib express
exactly.

Scope (asserted loudly, never silently wrong): 8-bit depth,
non-interlaced, color types 0 (grayscale), 2 (RGB), 3 (palette →
RGB via PLTE), 4 (gray+alpha), 6 (RGBA) — the overwhelming share of
real-world PNGs; 16-bit, sub-byte palette depths, and Adam7 raise
ValueError naming the unsupported feature.
Decode validates every chunk CRC and the exact decompressed byte
count (H·(1+W·C)), so a corrupt blob fails loudly rather than
yielding garbage dims.

Execution model: the codec is called per-row inside Arrow-batched
``mapInPandas`` stages (operators/multimodal.py) — the scan/shuffle
stays JVM-side and columnar, Python touches only the opaque blobs it
must. Unfiltering is vectorized per SCANLINE (numpy row ops); Sub/
Paeth's intra-row prefix dependency loops over pixels within the row,
bounded by width — the standard shape for a pure-Python inner decode
loop, and the reason production deployments swap in a C codec via the
same one-function hook.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """Encode an 8-bit image array — (H, W) grayscale or (H, W, C) for
    C in {1, 2, 3, 4} — as a valid non-interlaced PNG (filter 0
    scanlines, one zlib IDAT). Lossless by construction."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w, c = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), a.reshape(h, w * c)], axis=1
    ).tobytes()  # filter byte 0 per scanline
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, h: int, w: int, c: int) -> np.ndarray:
    stride = w * c
    if len(raw) != h * (1 + stride):
        raise ValueError(
            f"PNG data length {len(raw)} != expected {h * (1 + stride)}"
        )
    lines = np.frombuffer(raw, np.uint8).reshape(h, 1 + stride)
    out = np.zeros((h, stride), np.uint16)  # u16 scratch: sums < 512
    prev = np.zeros(stride, np.uint16)
    for y in range(h):
        f, line = int(lines[y, 0]), lines[y, 1:].astype(np.uint16)
        if f == 0:
            cur = line
        elif f == 1:  # Sub: + left (same scanline, prefix dependency)
            cur = line.copy()
            for x in range(c, stride):
                cur[x] = (cur[x] + cur[x - c]) & 0xFF
        elif f == 2:  # Up: + previous scanline (vectorized)
            cur = (line + prev) & 0xFF
        elif f == 3:  # Average: + floor((left + up) / 2)
            cur = line.copy()
            for x in range(stride):
                left = cur[x - c] if x >= c else 0
                cur[x] = (cur[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth predictor
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - c]) if x >= c else 0
                b = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = cc
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f} at row {y}")
        out[y] = cur
        prev = cur
    return out.astype(np.uint8).reshape(h, w, c)


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG blob to an (H, W, C) uint8 array. Every chunk CRC
    is verified; unsupported features raise ValueError by name."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        if pos + 12 + length > len(data):
            raise ValueError("truncated PNG chunk")
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if len(ihdr) != 13:
        raise ValueError(f"malformed IHDR length {len(ihdr)}")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (8 only)")
    if color not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color}")
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing its PLTE chunk")
    if interlace != 0:
        raise ValueError("unsupported Adam7-interlaced PNG")
    if comp != 0 or filt != 0:
        raise ValueError("non-standard PNG compression/filter method")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"PNG zlib stream corrupt: {e}") from e
    img = _unfilter(raw, h, w, _CHANNELS[color])
    if color == 3:  # palette indices → RGB lookup
        if int(img.max()) >= len(plte):
            raise ValueError("palette index out of PLTE range")
        img = plte[img[:, :, 0]]
    return img
