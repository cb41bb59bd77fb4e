"""Pure-stdlib MP4/ISO-BMFF container probe — the REAL video metadata
parser for the multimodal stage family (operators/multimodal.py
``probe_video``): no ffmpeg in the container, but stream METADATA
(the part the pipeline routes/filters/samples on — duration,
timescale, brand) lives in plain length-prefixed boxes that
``struct`` reads exactly. Frame PIXEL decode genuinely needs a codec
library and stays behind the deterministic-fake hook; duration-driven
operators (``sample_frames`` cadence, length filters, cost models)
get REAL numbers from this probe.

Box model: ``[size:u32][type:4cc][payload]``, nested for containers;
``moov``→``mvhd`` carries the movie header (version 0: u32 times,
version 1: u64). 64-bit box sizes (size==1 → u64 largesize) are
handled; a malformed/lying size raises ValueError (loud, never
garbage durations).
"""

from __future__ import annotations

import struct


def _boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box header")
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            hdr = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(
                f"MP4 box {typ!r} lies about its size ({size})"
            )
        yield typ, pos + hdr, pos + size
        pos += size


def mp4_probe(data: bytes) -> dict:
    """Parse an ISO-BMFF blob → ``{"brand", "timescale", "duration",
    "duration_ms"}``. Raises ValueError on a malformed container; the
    caller decides whether a missing moov/mvhd is corrupt (it is —
    every playable file has one)."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file (no ftyp box first)")
    brand = data[8:12].decode("ascii", "replace")
    for typ, a, b in _boxes(data, 0, len(data)):
        if typ != b"moov":
            continue
        for t2, c, d in _boxes(data, a, b):
            if t2 != b"mvhd":
                continue
            if d - c < 4:
                raise ValueError("truncated mvhd")
            version = data[c]
            if version == 0:
                if d - c < 4 + 16:
                    raise ValueError("truncated mvhd v0")
                timescale, duration = struct.unpack(
                    ">II", data[c + 12:c + 20]
                )
            elif version == 1:
                if d - c < 4 + 28:
                    raise ValueError("truncated mvhd v1")
                (timescale,) = struct.unpack(">I", data[c + 20:c + 24])
                (duration,) = struct.unpack(">Q", data[c + 24:c + 32])
            else:
                raise ValueError(f"unknown mvhd version {version}")
            if not timescale:
                raise ValueError("mvhd timescale is zero")
            return {
                "brand": brand,
                "timescale": int(timescale),
                "duration": int(duration),
                "duration_ms": int(duration) * 1000 // int(timescale),
            }
    raise ValueError("MP4 has no moov/mvhd (unplayable or fragmented)")


def mp4_build_minimal(
    brand: str, timescale: int, duration: int, version: int = 0
) -> bytes:
    """Build a minimal well-formed ftyp+moov/mvhd container — the
    fixture half (tests and the gated query generate inputs with it;
    the probe is validated against hand-laid boxes and the spec, not
    against this builder alone)."""
    ftyp = struct.pack(">I", 16) + b"ftyp" + brand.encode("ascii") + b"\x00\x00\x02\x00"
    if version == 0:
        body = (
            b"\x00\x00\x00\x00"  # version 0 + flags
            + struct.pack(">II", 0, 0)  # creation/modification
            + struct.pack(">II", timescale, duration)
            + b"\x00" * 80  # rate/volume/matrix/next_track (ignored)
        )
    else:
        body = (
            b"\x01\x00\x00\x00"
            + struct.pack(">QQ", 0, 0)
            + struct.pack(">I", timescale)
            + struct.pack(">Q", duration)
            + b"\x00" * 80
        )
    mvhd = struct.pack(">I", 8 + len(body)) + b"mvhd" + body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    return ftyp + moov
