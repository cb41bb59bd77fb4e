"""GIF87a/89a codec: real LZW decompression, pure stdlib + numpy.

Closes another slice of the non-PNG/JPEG deterministic-fake image
lane (operators/multimodal.py `_decode_image_real`), the same way PNG
(round 12), baseline JPEG (round 13) and progressive JPEG (round 14)
were closed: implemented from the public specification (GIF89a,
CompuServe 1990-07-31; variable-width LZW per its Appendix F), not a
library the container lacks.

Decode surface: header + logical screen descriptor, global AND local
color tables, extension blocks (graphic control / comment /
application — skipped structurally by sub-block framing), interlaced
row order (the four-pass 8/8/4/2 scheme), and the full LZW dialect —
variable code width growing 3→12 bits with the deferred-clear
convention, the KwKwK self-referential case, mid-stream CLEAR resets.
Malformed streams raise ValueError (quarantine, never fake dims).

Encode surface (fixture builder + the inverse proof): palette-indexed
images with optional interlace, emitting spec LZW with mid-stream
CLEAR on table overflow. Conformance is pinned against the JVM's own
GIF decoder (javax.imageio on the session classpath) in
tests/test_gif_codec.py — our encoder's files decode to identical
RGB through an independent implementation, and our decoder reads
what it reads.

Scale note: like the other codecs this runs per-blob inside Arrow
``mapInPandas`` batches — embarrassingly parallel over binary rows,
no cross-blob state, CPU bounded by pixels not corpus size.
"""

from __future__ import annotations

import numpy as np

_TRAILER = 0x3B
_IMAGE_SEP = 0x2C
_EXTENSION = 0x21

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ----------------------------------------------------------------- LZW


def _lzw_decode(data: bytes, mcs: int, n_pixels: int) -> bytes:
    """GIF variable-width LZW → index bytes. ``mcs`` is the stream's
    minimum code size; stops after n_pixels (spec: EOI may follow)."""
    clear = 1 << mcs
    eoi = clear + 1
    width = mcs + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("gif: LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: first LZW code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: LZW code out of range")
        out += entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("gif: LZW output short of image size")
    return bytes(out[:n_pixels])


def _lzw_encode(indices: bytes, mcs: int) -> bytes:
    clear = 1 << mcs
    eoi = clear + 1
    width = mcs + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def reset() -> tuple[dict, int]:
        return {bytes([i]): i for i in range(clear)}, eoi + 1

    table, nxt = reset()
    emit(clear)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = nxt
        nxt += 1
        if nxt == (1 << width) + 1 and width < 12:
            width += 1
        w = bytes([b])
        if nxt == 4097:  # table full: spec-legal mid-stream reset
            emit(clear)
            width = mcs + 1
            table, nxt = reset()
    if w:
        emit(table[w])
        nxt += 1
        if nxt == (1 << width) + 1 and width < 12:
            width += 1
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------- file


def _u16(data: bytes, pos: int) -> int:
    return data[pos] | (data[pos + 1] << 8)


def _skip_subblocks(data: bytes, pos: int) -> int:
    while True:
        if pos >= len(data):
            raise ValueError("gif: truncated sub-blocks")
        n = data[pos]
        pos += 1 + n
        if n == 0:
            return pos


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("gif: truncated sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos : pos + n])
        if len(chunks[-1]) != n:
            raise ValueError("gif: truncated sub-block payload")
        pos += n


def gif_decode(data: bytes) -> np.ndarray:
    """First image of a GIF87a/89a stream → (H, W, 3) uint8 RGB."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    pos = 6
    pos += 4  # logical screen w/h (image descriptor carries its own)
    packed = data[pos]
    pos += 3  # packed, bg index, aspect
    gct: np.ndarray | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(
            data[pos : pos + 3 * n], dtype=np.uint8
        ).reshape(n, 3)
        if gct.shape[0] != n:
            raise ValueError("gif: truncated global color table")
        pos += 3 * n
    while True:
        if pos >= len(data):
            raise ValueError("gif: no image data before EOF")
        block = data[pos]
        pos += 1
        if block == _EXTENSION:
            pos += 1  # label
            pos = _skip_subblocks(data, pos)
        elif block == _IMAGE_SEP:
            w = _u16(data, pos + 4)
            h = _u16(data, pos + 6)
            ipacked = data[pos + 8]
            pos += 9
            ct = gct
            if ipacked & 0x80:  # local color table wins
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(
                    data[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("gif: no color table in scope")
            interlaced = bool(ipacked & 0x40)
            mcs = data[pos]
            pos += 1
            if not 2 <= mcs <= 11:
                raise ValueError(f"gif: bad LZW min code size {mcs}")
            payload, pos = _read_subblocks(data, pos)
            idx = np.frombuffer(
                _lzw_decode(payload, mcs, w * h), dtype=np.uint8
            ).reshape(h, w)
            if idx.max(initial=0) >= ct.shape[0]:
                raise ValueError("gif: pixel index outside color table")
            if interlaced:
                rows = [
                    r
                    for start, step in _INTERLACE_PASSES
                    for r in range(start, h, step)
                ]
                de = np.empty_like(idx)
                de[rows] = idx
                idx = de
            return ct[idx]
        elif block == _TRAILER:
            raise ValueError("gif: trailer before image data")
        else:
            raise ValueError(f"gif: unknown block 0x{block:02x}")


def gif_encode(
    indices: np.ndarray,
    palette: np.ndarray,
    *,
    interlace: bool = False,
) -> bytes:
    """Encode an (H, W) uint8 index image + (N, 3) uint8 palette as
    GIF89a (global color table padded to a power of two)."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("gif_encode: need (H,W) indices and (N,3) palette")
    if pal.shape[0] > 256:
        raise ValueError("gif_encode: palette larger than 256")
    if idx.max(initial=0) >= pal.shape[0]:
        raise ValueError("gif_encode: index outside palette")
    h, w = idx.shape
    bits = max(1, int(np.ceil(np.log2(max(2, pal.shape[0])))))
    n_ct = 1 << bits
    pad = np.zeros((n_ct - pal.shape[0], 3), dtype=np.uint8)
    ct = np.concatenate([pal, pad], axis=0)

    out = bytearray()
    out += b"GIF89a"
    out += bytes(
        (w & 0xFF, w >> 8, h & 0xFF, h >> 8, 0x80 | (bits - 1), 0, 0)
    )
    out += ct.tobytes()
    ip = 0x40 if interlace else 0x00
    out += bytes((_IMAGE_SEP, 0, 0, 0, 0, w & 0xFF, w >> 8, h & 0xFF, h >> 8, ip))
    if interlace:
        rows = [
            r
            for start, step in _INTERLACE_PASSES
            for r in range(start, h, step)
        ]
        idx = idx[rows]
    mcs = max(2, bits)
    out.append(mcs)
    lzw = _lzw_encode(idx.tobytes(), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out.append(_TRAILER)
    return bytes(out)
