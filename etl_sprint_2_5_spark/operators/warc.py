"""WARC/1.1 (ISO 28500) record packing and parsing — the
CommonCrawl-style container for web/text corpora, pure stdlib.

Reference parity note: the reference engine has no WARC surface; this
is part of the large-scale training-data ingest front door (the brief's
"operations a training-data pipeline would need"), alongside JSONL.gz
and ORC interchange in plans/ingest_queries.py.

Format (WARC 1.1, ISO 28500-2017):

    WARC/1.1<CRLF>
    <header-name>: <value><CRLF> ...
    <CRLF>
    <Content-Length bytes of block>
    <CRLF><CRLF>

Shards follow the CommonCrawl convention: each record is an
independent GZIP MEMBER and a shard is the raw concatenation of
members. That convention exists precisely for distributed ingest — a
reader can split a shard at member boundaries and decompress records
independently, without a codec that spans the file. At 100 TB the
Spark shape is: shard files (or binary rows) partitioned across
executors, ``warc_split_members`` + ``warc_parse_record`` inside an
Arrow ``mapInPandas`` stage, never a driver-side loop; the gzip
member walk is sequential WITHIN a shard, so shard size (not corpus
size) bounds task latency — size shards like input splits
(~128-512 MB).

Strictness follows the codec family's three-mode contract
(operators/png_codec.py precedent): malformed framing raises
``ValueError`` — a corrupt record quarantines loudly rather than
yielding plausible fields.
"""

from __future__ import annotations

import gzip
import uuid
import zlib

_CRLF = b"\r\n"
_VERSIONS = (b"WARC/1.1", b"WARC/1.0")


def warc_pack_record(
    uri: str,
    body: bytes,
    warc_type: str = "resource",
    content_type: str = "text/plain; charset=utf-8",
    extra_headers: dict[str, str] | None = None,
    warc_date: str = "1970-01-01T00:00:00Z",
) -> bytes:
    """One spec-true WARC/1.1 record as a standalone gzip member.

    WARC-Record-ID is minted deterministically (uuid5 over the target
    URI) so packing is reproducible end-to-end — the same stance as
    pipeline/normalize.py's minted uuids; pass ``warc_date`` explicitly
    for real wall-clock stamping."""
    headers = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", f"<urn:uuid:{uuid.uuid5(uuid.NAMESPACE_URL, uri)}>"),
        ("WARC-Date", warc_date),
        ("WARC-Target-URI", uri),
        ("Content-Type", content_type),
        ("Content-Length", str(len(body))),
    ]
    for k, v in (extra_headers or {}).items():
        if "\r" in v or "\n" in v:
            raise ValueError(f"warc: header value contains CR/LF: {k}")
        headers.append((k, v))
    rec = bytearray(b"WARC/1.1\r\n")
    for k, v in headers:
        rec += f"{k}: {v}".encode() + _CRLF
    rec += _CRLF
    rec += body
    rec += _CRLF + _CRLF
    # mtime=0 + fixed OS byte keep the member byte-deterministic
    return gzip.compress(bytes(rec), compresslevel=6, mtime=0)


def warc_split_members(shard: bytes) -> list[bytes]:
    """Split a concatenated-gzip-member shard into decompressed
    records (the CommonCrawl layout). Raises on trailing garbage or a
    truncated member — never silently drops tail records."""
    out = []
    rest = shard
    while rest:
        d = zlib.decompressobj(wbits=31)  # 31 = gzip framing
        try:
            rec = d.decompress(rest)
        except zlib.error as exc:
            raise ValueError(f"warc: bad gzip member: {exc}") from exc
        if not d.eof:
            raise ValueError("warc: truncated gzip member")
        out.append(rec + d.flush())
        rest = d.unused_data
    return out


def warc_parse_record(raw: bytes) -> tuple[dict[str, str], bytes]:
    """Parse one decompressed record → (headers, block). Header names
    are returned lower-cased (the spec is case-insensitive); framing
    violations (bad version line, missing Content-Length, short block,
    missing record terminator) raise ``ValueError``."""
    sep = raw.find(_CRLF + _CRLF)
    if sep < 0:
        raise ValueError("warc: no header/block separator")
    head, rest = raw[:sep], raw[sep + 4:]
    lines = head.split(_CRLF)
    if lines[0] not in _VERSIONS:
        raise ValueError(f"warc: bad version line: {lines[0][:20]!r}")
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        k, c, v = ln.partition(b":")
        if not c:
            raise ValueError(f"warc: malformed header line: {ln[:40]!r}")
        headers[k.strip().decode("ascii").lower()] = v.strip().decode("utf-8")
    if "content-length" not in headers:
        raise ValueError("warc: missing Content-Length")
    n = int(headers["content-length"])
    if len(rest) < n + 4:
        raise ValueError("warc: block shorter than Content-Length")
    block, tail = rest[:n], rest[n:n + 4]
    if tail != _CRLF + _CRLF:
        raise ValueError("warc: missing record terminator")
    if rest[n + 4:]:
        raise ValueError("warc: trailing bytes after record terminator")
    return headers, block
