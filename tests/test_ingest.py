"""Ingest front door: WARC/1.1 kernel framing (operators/warc.py) and
the ingest round-trip queries (plans/ingest_queries.py) — spec-level
pins the oracle gate can't see (loud failure lanes, member splitting,
header case-insensitivity) plus the ORC pushdown property the plan
relies on."""

from __future__ import annotations

import gzip

import pytest

from etl_sprint_2_5_spark.operators.warc import (
    warc_pack_record,
    warc_parse_record,
    warc_split_members,
)


def _rec(i: int = 0, body: bytes = b"hello warc") -> bytes:
    return warc_pack_record(
        f"http://corpus.local/docs/{i}",
        body,
        extra_headers={"X-Doc-Lang": "en"},
    )


def test_pack_parse_roundtrip_and_determinism():
    raw = warc_split_members(_rec(7))[0]
    hdr, block = warc_parse_record(raw)
    assert block == b"hello warc"
    assert hdr["warc-target-uri"] == "http://corpus.local/docs/7"
    assert hdr["warc-type"] == "resource"
    assert hdr["x-doc-lang"] == "en"
    assert hdr["content-length"] == str(len(block))
    # deterministic: same input → same bytes (uuid5 id, mtime=0 gzip)
    assert _rec(7) == _rec(7)
    assert hdr["warc-record-id"].startswith("<urn:uuid:")


def test_member_splitting_preserves_order_and_count():
    shard = b"".join(_rec(i, f"doc {i}".encode()) for i in range(5))
    members = warc_split_members(shard)
    assert len(members) == 5
    bodies = [warc_parse_record(m)[1] for m in members]
    assert bodies == [f"doc {i}".encode() for i in range(5)]


def test_header_names_case_insensitive():
    raw = (
        b"WARC/1.0\r\nCONTENT-LENGTH: 2\r\nWarc-Type: resource\r\n"
        b"\r\nok\r\n\r\n"
    )
    hdr, block = warc_parse_record(raw)
    assert block == b"ok" and hdr["warc-type"] == "resource"


def test_loud_failure_lanes():
    good = warc_split_members(_rec())[0]
    # truncated gzip member
    with pytest.raises(ValueError, match="truncated|bad gzip"):
        warc_split_members(_rec()[:-5])
    # trailing garbage after the last member
    with pytest.raises(ValueError, match="bad gzip"):
        warc_split_members(_rec() + b"garbage")
    # bad version line
    with pytest.raises(ValueError, match="version"):
        warc_parse_record(b"HTTP/1.1" + good[8:])
    # block shorter than Content-Length
    with pytest.raises(ValueError, match="shorter"):
        warc_parse_record(good[:-6])
    # missing record terminator
    with pytest.raises(ValueError, match="terminator"):
        warc_parse_record(good[:-4] + b"XXXX")
    # header value smuggling CRLF must be rejected at pack time
    with pytest.raises(ValueError, match="CR/LF"):
        warc_pack_record("u", b"", extra_headers={"X": "a\r\nEvil: y"})
    # missing Content-Length
    with pytest.raises(ValueError, match="Content-Length"):
        warc_parse_record(b"WARC/1.1\r\nWARC-Type: resource\r\n\r\n\r\n\r\n")


def test_gzip_members_are_standard():
    # each member is plain gzip — any standards reader can decompress
    assert gzip.decompress(_rec(3)).startswith(b"WARC/1.1\r\n")


def test_body_with_crlf_and_nonascii_roundtrips():
    body = "päragraph one\r\n\r\nWARC/1.1 lookalike\r\n".encode()
    hdr, block = warc_parse_record(warc_split_members(_rec(1, body))[0])
    assert block == body  # length-framed, not delimiter-framed


def test_ingest_queries_roundtrip_spark(spark):
    """The three gated round-trips under a real session: row counts,
    lossless values on a spot column, and the ORC scan's pushdown +
    pruning visible in the formatted plan."""
    from etl_sprint_2_5_spark.plans import REGISTRY, load_all

    load_all()
    sf = "/root/testdata/sf0.001"

    jl = REGISTRY["jsonl_gz_ingest"].fn(spark, sf).collect()
    wc = REGISTRY["warc_ingest_roundtrip"].fn(spark, sf).collect()
    assert [r.doc_id for r in jl] == [r.doc_id for r in wc]
    assert [r.text for r in jl] == [r.text for r in wc]
    assert all(r.n_chars is not None for r in jl)

    orc = REGISTRY["orc_interchange_roundtrip"].fn(spark, sf)
    rows = orc.collect()
    assert all(100 < r.doc_id <= 350 for r in rows)


def test_orc_readback_pushdown_and_pruning(spark, tmp_path):
    """The property the orc_interchange docstring claims: range + null
    predicates appear in PushedFilters and ReadSchema is pruned to the
    3 projected columns."""
    from pyspark.sql import functions as F

    from etl_sprint_2_5_spark.sources.parquet import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    path = str(tmp_path / "docs_orc")
    docs.write.mode("overwrite").orc(path)
    back = (
        spark.read.orc(path)
        .where((F.col("doc_id") > 10) & F.col("lang").isNotNull())
        .select("doc_id", "lang", "n_chars")
    )
    plan = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "GreaterThan(doc_id,10)" in plan
    assert "IsNotNull(lang)" in plan
    assert "struct<doc_id:bigint,lang:string,n_chars:bigint>" in plan


def test_jsonl_escape_surface_spark(spark, tmp_path):
    """The gate's documents are ASCII word-soup, so the JSON escape
    surface needs its own adversarial pin: quotes, newlines, tabs,
    backslashes, unicode (incl. astral plane), JSON-lookalike text,
    and NULLs must survive json.dumps → gzip → native JSON readback
    byte-for-byte."""
    import gzip
    import json

    nasty = [
        (0, 'plain'),
        (1, 'quote " inside'),
        (2, 'newline\nand\r\ncrlf'),
        (3, 'tab\tbackslash\\ slash/'),
        (4, 'unicode: päragraph — 中文 🚀   '),
        (5, '{"looks": "like json", "n": [1,2]}'),
        (6, ''),
        (7, None),
    ]
    path = tmp_path / "shard.jsonl.gz"
    with gzip.open(path, "wt", encoding="utf-8") as fh:
        for i, t in nasty:
            fh.write(json.dumps({"doc_id": i, "text": t},
                                ensure_ascii=False) + "\n")
    back = (
        spark.read.schema("doc_id long, text string")
        .json(str(tmp_path))
        .orderBy("doc_id")
        .collect()
    )
    assert [(r.doc_id, r.text) for r in back] == nasty


def test_streaming_warc_inbox_root_injectable(spark, tmp_path, monkeypatch):
    """SPARK_GRAFT_INGEST_ROOT relocates the streaming inbox/
    checkpoint/view root (the cluster deployment passes shared
    storage here); the gate itself is unchanged and the staging dir
    is removed on exit."""
    import os

    from etl_sprint_2_5_spark.plans import REGISTRY, load_all

    load_all()
    root = tmp_path / "ingest_root"
    root.mkdir()
    monkeypatch.setenv("SPARK_GRAFT_INGEST_ROOT", str(root))
    seen = []
    real_makedirs = os.makedirs

    def spy(path, *a, **k):
        seen.append(str(path))
        return real_makedirs(path, *a, **k)

    monkeypatch.setattr(os, "makedirs", spy)
    out = REGISTRY["streaming_warc_ingest"].fn(
        spark, "/root/testdata/sf0.001"
    )
    assert out.count() > 0
    inboxes = [p for p in seen if p.endswith("/inbox")]
    assert inboxes and inboxes[0].startswith(str(root))
    assert os.listdir(root) == []  # staging removed on exit


def test_csv_linesep_pin_against_detection_trap(spark, tmp_path):
    """univocity's line-separator auto-detection locks onto the first
    separator-looking bytes — if record 1 holds a QUOTED CRLF, an
    unpinned multiLine read detects '\\r\\n', never finds the real
    '\\n' record ends, and one column swallows the file. The engine
    pins lineSep='\\n'; this reproduces the trap and proves the pin."""
    import gzip

    p = tmp_path / "t.csv.gz"
    rows = b'1,"a\r\nb"\n2,"plain"\n3,"c,d"\n'
    with gzip.open(p, "wb") as fh:
        fh.write(rows)

    def read(**extra):
        r = (
            spark.read.schema("id long, s string")
            .option("multiLine", True)
            .option("quote", '"')
            .option("escape", '"')
        )
        for k, v in extra.items():
            r = r.option(k, v)
        return r.csv(str(tmp_path)).orderBy("id").collect()

    pinned = read(lineSep="\n")
    assert [(r.id, r.s) for r in pinned] == [
        (1, "a\r\nb"), (2, "plain"), (3, "c,d")
    ]
    # the unpinned read must NOT return the same three records — it
    # either errors or mangles (if a Spark upgrade fixes detection,
    # this assert flags the pin for removal)
    try:
        unpinned = read()
        assert [(r.id, r.s) for r in unpinned] != [
            (1, "a\r\nb"), (2, "plain"), (3, "c,d")
        ]
    except Exception:
        pass
