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


def _fullbox(data: bytes, a: int, b: int, want: int = 4):
    """(version, flags, payload_start) of a full box; bounds-checked."""
    if b - a < want:
        raise ValueError("truncated MP4 full box")
    return data[a], data[a + 1:a + 4], a + 4


def _u32s(data: bytes, pos: int, n: int, end: int):
    if pos + 4 * n > end:
        raise ValueError("truncated MP4 table")
    return struct.unpack(f">{n}I", data[pos:pos + 4 * n]), pos + 4 * n


def mp4_sample_table(data: bytes) -> dict:
    """Walk the FIRST track's sample tables (ISO 14496-12 §8.6-8.7:
    ``stts`` time-to-sample, ``stsc`` sample-to-chunk, ``stsz`` sizes,
    ``stco``/``co64`` chunk offsets, ``stss`` sync samples) into
    per-sample rows — the part of "video decode" that is pure
    container math and therefore REAL here: decode timestamps, byte
    offsets and sizes inside ``mdat``, chunk membership, and keyframe
    flags. Frame-PIXEL decode still needs a codec library.

    Returns ``{"timescale": int, "samples": [(i, dts, dur, size,
    chunk_i, offset, sync), ...]}`` with dts/dur in media-timescale
    ticks and ``offset`` ABSOLUTE in the file. Raises ValueError on
    any malformed/inconsistent table (count mismatches, samples
    overflowing their chunks, offsets outside the file) — loud, never
    a silently wrong frame slice."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file (no ftyp box first)")

    def _child(a: int, b: int, typ: bytes):
        for t, c, d in _boxes(data, a, b):
            if t == typ:
                return c, d
        raise ValueError(f"MP4 missing {typ.decode()!r} box")

    moov = _child(0, len(data), b"moov")
    trak = _child(*moov, b"trak")
    mdia = _child(*trak, b"mdia")
    mh_a, mh_b = _child(*mdia, b"mdhd")
    ver, _, p = _fullbox(data, mh_a, mh_b)
    if ver == 0:
        if mh_b - p < 16:
            raise ValueError("truncated mdhd v0")
        (timescale,) = struct.unpack(">I", data[p + 8:p + 12])
    elif ver == 1:
        if mh_b - p < 28:
            raise ValueError("truncated mdhd v1")
        (timescale,) = struct.unpack(">I", data[p + 16:p + 20])
    else:
        raise ValueError(f"unknown mdhd version {ver}")
    if not timescale:
        raise ValueError("mdhd timescale is zero")

    minf = _child(*mdia, b"minf")
    stbl_a, stbl_b = _child(*minf, b"stbl")

    boxes = {}
    for t, c, d in _boxes(data, stbl_a, stbl_b):
        boxes.setdefault(t, (c, d))

    def _table(typ: bytes):
        if typ not in boxes:
            raise ValueError(f"MP4 missing {typ.decode()!r} box")
        a, b = boxes[typ]
        _, _, p = _fullbox(data, a, b)
        (n,), p = _u32s(data, p, 1, b)
        return n, p, b

    # stts → per-sample (dts, dur)
    n_ent, p, b = _table(b"stts")
    runs, _ = _u32s(data, p, 2 * n_ent, b)
    dts_dur, t = [], 0
    for i in range(n_ent):
        cnt, delta = runs[2 * i], runs[2 * i + 1]
        for _ in range(cnt):
            dts_dur.append((t, delta))
            t += delta

    # stsz → sizes
    if b"stsz" not in boxes:
        raise ValueError("MP4 missing 'stsz' box")
    a, b = boxes[b"stsz"]
    _, _, p = _fullbox(data, a, b)
    (fixed, n_samples), p = _u32s(data, p, 2, b)
    if fixed:
        sizes = [fixed] * n_samples
    else:
        sizes, _ = _u32s(data, p, n_samples, b)
        sizes = list(sizes)
    if len(dts_dur) != n_samples:
        raise ValueError(
            f"stts covers {len(dts_dur)} samples, stsz says {n_samples}"
        )

    # stco / co64 → chunk offsets
    if b"stco" in boxes:
        n_ch, p, b = _table(b"stco")
        offsets, _ = _u32s(data, p, n_ch, b)
    elif b"co64" in boxes:
        n_ch, p, b = _table(b"co64")
        if p + 8 * n_ch > b:
            raise ValueError("truncated MP4 table")
        offsets = struct.unpack(f">{n_ch}Q", data[p:p + 8 * n_ch])
    else:
        raise ValueError("MP4 missing 'stco' box")

    # stsc → samples-per-chunk, expanded over the stco chunk list
    n_ent, p, b = _table(b"stsc")
    ent, _ = _u32s(data, p, 3 * n_ent, b)
    stsc = [(ent[3 * i], ent[3 * i + 1]) for i in range(n_ent)]
    if stsc != sorted(stsc) or any(fc < 1 for fc, _ in stsc):
        raise ValueError("stsc first_chunk not ascending")

    # stss → sync set (absent ⇒ every sample is sync)
    sync: set[int] | None = None
    if b"stss" in boxes:
        n_sy, p, b = _table(b"stss")
        nums, _ = _u32s(data, p, n_sy, b)
        sync = {v - 1 for v in nums}

    samples, si, ei = [], 0, 0
    for ci in range(n_ch):
        while ei + 1 < len(stsc) and stsc[ei + 1][0] <= ci + 1:
            ei += 1
        spc = stsc[ei][1]
        pos = offsets[ci]
        for _ in range(spc):
            if si >= n_samples:
                break
            size = sizes[si]
            if pos + size > len(data):
                raise ValueError(
                    f"sample {si} overruns the file "
                    f"({pos}+{size} > {len(data)})"
                )
            dts, dur = dts_dur[si]
            is_sync = sync is None or si in sync
            samples.append((si, dts, dur, size, ci, pos, is_sync))
            pos += size
            si += 1
    if si != n_samples:
        raise ValueError(
            f"chunk layout holds {si} samples, stsz says {n_samples}"
        )
    return {"timescale": int(timescale), "samples": samples}


def mp4_build_sampled(
    brand: str,
    timescale: int,
    durs: list[int],
    sizes: list[int],
    chunking: list[int],
    sync: list[int] | None,
    payload,
    chunk_pad: bytes = b"",
    version: int = 0,
    use_co64: bool = False,
) -> bytes:
    """Build a well-formed single-track container WITH sample tables
    and a real ``mdat``: per-sample durations/sizes, an explicit
    samples-per-chunk layout (``chunking``), optional sync list
    (0-based; None omits ``stss``), ``payload(i)`` supplying each
    sample's bytes, and ``chunk_pad`` inserted before every chunk so
    ``stco`` offsets are load-bearing (a parser that infers offsets
    by concatenation reads the pad and fails a byte checksum).
    Fixture half — the parser is validated against hand-laid boxes
    and the spec, not this builder alone."""
    n = len(sizes)
    if sum(chunking) < n:
        raise ValueError("chunking does not cover all samples")

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + typ + body

    def full(typ: bytes, body: bytes, ver: int = 0) -> bytes:
        return box(typ, bytes([ver, 0, 0, 0]) + body)

    # stts runs (compressed)
    runs: list[tuple[int, int]] = []
    for d in durs:
        if runs and runs[-1][1] == d:
            runs[-1] = (runs[-1][0] + 1, d)
        else:
            runs.append((1, d))
    stts = full(b"stts", struct.pack(">I", len(runs)) + b"".join(
        struct.pack(">II", c, d) for c, d in runs
    ))
    # stsc entries (compressed first_chunk runs)
    ents: list[tuple[int, int]] = []
    for ci, spc in enumerate(chunking):
        if not ents or ents[-1][1] != spc:
            ents.append((ci + 1, spc))
    stsc = full(b"stsc", struct.pack(">I", len(ents)) + b"".join(
        struct.pack(">III", fc, spc, 1) for fc, spc in ents
    ))
    stsz = full(b"stsz", struct.pack(">II", 0, n) + b"".join(
        struct.pack(">I", s) for s in sizes
    ))
    stss = b""
    if sync is not None:
        stss = full(b"stss", struct.pack(">I", len(sync)) + b"".join(
            struct.pack(">I", i + 1) for i in sorted(sync)
        ))
    total = sum(durs)
    if version == 0:
        mdhd = full(b"mdhd", struct.pack(">IIII", 0, 0, timescale, total)
                    + b"\x55\xc4\x00\x00")
    else:
        mdhd = full(
            b"mdhd",
            struct.pack(">QQIQ", 0, 0, timescale, total)
            + b"\x55\xc4\x00\x00",
            ver=1,
        )
    hdlr = full(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"v\x00")

    # chunks: consume sizes per the chunking plan
    chunks: list[list[int]] = []
    si = 0
    for spc in chunking:
        take = min(spc, n - si)
        if take <= 0:
            break
        chunks.append(list(range(si, si + take)))
        si += take
    nch = len(chunks)

    def build_moov(offs: list[int]) -> bytes:
        if use_co64:
            stco = full(b"co64", struct.pack(">I", nch) + b"".join(
                struct.pack(">Q", o) for o in offs
            ))
        else:
            stco = full(b"stco", struct.pack(">I", nch) + b"".join(
                struct.pack(">I", o) for o in offs
            ))
        stbl = box(b"stbl", stts + stsc + stsz + stco + stss)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", mdia)
        if version == 0:
            mvhd = full(b"mvhd", struct.pack(">IIII", 0, 0, timescale,
                                             total) + b"\x00" * 80)
        else:
            mvhd = full(b"mvhd", struct.pack(">QQIQ", 0, 0, timescale,
                                             total) + b"\x00" * 80, ver=1)
        return box(b"moov", mvhd + trak)

    ftyp = box(b"ftyp", brand.encode("ascii") + b"\x00\x00\x02\x00")
    moov_len = len(build_moov([0] * nch))
    base = len(ftyp) + moov_len + 8  # mdat payload start
    offs, pos, blobs = [], base, []
    for members in chunks:
        pos += len(chunk_pad)
        offs.append(pos)
        for i in members:
            b = payload(i)
            if len(b) != sizes[i]:
                raise ValueError(f"payload({i}) length != sizes[{i}]")
            blobs.append(b)
            pos += len(b)
    mdat_body = b""
    bi = 0
    for members in chunks:
        mdat_body += chunk_pad
        for _ in members:
            mdat_body += blobs[bi]
            bi += 1
    return ftyp + build_moov(offs) + box(b"mdat", mdat_body)
